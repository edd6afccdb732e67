"""Batched Hirschberg driver over the device banded kernels.

TPU-native re-expression of bpm_compute_matrix_hirschberg
(bpm_hirschberg.c:33-270): instead of per-pair recursion, a host-side
worklist processes all pairs' subproblems level by level — base cases
(band footprint <= 16 MB, bpm_hirschberg.c:63-65) run batched through the
full banded kernel + traceback, splits run batched forward/reverse
score-only passes, and midpoints are computed on host from the returned
band state (myers_np.hirschberg_split). Leaf CIGARs are assembled
left-to-right by their recursion path.

Failure semantics match the reference's shared right-to-left output
buffer (bpm_hirschberg.c:210-243): the recursion solves the RIGHT half
before the left, so when a split fails with QUICKED_FAIL_NON_CONVERGENCE
the buffer already holds every leaf to the right of the (DFS-first)
failing node — and quicked.c extracts those partial results regardless
of status (quicked.c:299, 154-157). The worklist reproduces this by
continuing the right-of-failure subtree and discarding left-side leaves.
"""

from __future__ import annotations

from quicked_tpu.ops import myers_np
from quicked_tpu.params import HIRSCHBERG_BUFFER_SIZE, QuickedStatus


def hirschberg_batch(texts, patterns, cutoffs):
    """Full alignment of each (text, pattern) under its score bound.

    Returns list of (status, ops_str) in input order. On
    QUICKED_FAIL_NON_CONVERGENCE, ops_str holds the partial right-side
    alignment the reference would leave in its output buffer (possibly
    empty).
    """
    n = len(texts)
    leaves: list[list] = [[] for _ in range(n)]
    status = [QuickedStatus.QUICKED_OK] * n
    # Rightmost failing path per pair. The reference's DFS (right half
    # first) aborts at the lexicographically greatest failing node; only
    # leaves strictly right of it were written before the abort.
    fail_path: dict[int, tuple] = {}
    # task: (pair, path, text, pattern, cutoff); path is the 0/1
    # left/right descent — leaves are prefix-free, so lexicographic path
    # order is left-to-right CIGAR order.
    tasks = [(i, (), texts[i], patterns[i], int(cutoffs[i]))
             for i in range(n)]

    from quicked_tpu.aligner.batch import (banded_align_batch,
                                           banded_score_results)

    while tasks:
        base, split = [], []
        for t in tasks:
            i, path, text, pattern, cutoff = t
            if i in fail_path and path < fail_path[i]:
                # left of the failure: the reference never visits it
                continue
            geo = myers_np.band_geometry(len(pattern), len(text), cutoff)
            if geo.ebb * len(text) * 8 * 2 <= HIRSCHBERG_BUFFER_SIZE:
                base.append(t)
            else:
                split.append(t)

        if base:
            _, ops = banded_align_batch(
                [t[3] for t in base], [t[2] for t in base],
                [t[4] for t in base], only_score=False)
            for t, op in zip(base, ops):
                leaves[t[0]].append((t[1], op))

        tasks = []
        if split:
            pats = [t[3] for t in split]
            txts = [t[2] for t in split]
            cos = [t[4] for t in split]
            mids = [(len(t[2]) + 1) // 2 for t in split]
            mids_r = [len(t[2]) - m for t, m in zip(split, mids)]
            # the forward and reverse half passes are independent and
            # share geometry, so they merge into ONE score batch: a
            # single kernel dispatch per level (halves the per-level
            # dispatch+upload cost on device venues), and on the host
            # venue the native batch kernel splits its thread pool
            # across the 2N lanes itself (intra = threads/lanes,
            # bpm_hirschberg.c:84-100's concurrency without
            # oversubscription)
            both = banded_score_results(
                pats + [p[::-1] for p in pats],
                txts + [t[::-1] for t in txts],
                cos + cos, text_finish=mids + mids_r)
            fwd, rev = both[:len(split)], both[len(split):]
            for t, f, r, mid in zip(split, fwd, rev, mids):
                i, path, text, pattern, cutoff = t
                sp = myers_np.hirschberg_split_fast(
                    f.pv64, f.mv64, f.first, f.last, f.scores_k,
                    r.pv64, r.mv64, r.first, r.last, r.scores_k,
                    f.prolog, len(pattern), len(text))
                if sp is None:
                    status[i] = QuickedStatus.QUICKED_FAIL_NON_CONVERGENCE
                    if path >= fail_path.get(i, path):
                        fail_path[i] = path
                    continue
                pll, score_l, score_r = sp
                tasks.append((i, path + (0,), text[:mid], pattern[:pll],
                              int(score_l)))
                tasks.append((i, path + (1,), text[mid:], pattern[pll:],
                              int(score_r)))

    out = []
    for i in range(n):
        if status[i] != QuickedStatus.QUICKED_OK:
            fp = fail_path.get(i, ())
            kept = [(p, op) for p, op in leaves[i] if p > fp]
            out.append((status[i],
                        "".join(op for _, op in sorted(kept))))
        else:
            ops = "".join(op for _, op in sorted(leaves[i]))
            out.append((QuickedStatus.QUICKED_OK, ops))
    return out
