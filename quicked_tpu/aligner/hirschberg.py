"""Batched Hirschberg driver over the device banded kernels.

TPU-native re-expression of bpm_compute_matrix_hirschberg
(bpm_hirschberg.c:33-270): instead of per-pair recursion, a host-side
worklist processes all pairs' subproblems level by level — base cases
(band footprint <= 16 MB, bpm_hirschberg.c:63-65) run batched through the
full banded kernel + traceback, splits run batched forward/reverse
score-only passes, and midpoints are computed on host from the returned
band state (myers_np.hirschberg_split). Leaf CIGARs are assembled
left-to-right by their recursion path.
"""

from __future__ import annotations

from quicked_tpu.ops import myers_np
from quicked_tpu.params import HIRSCHBERG_BUFFER_SIZE, QuickedStatus


def hirschberg_batch(texts, patterns, cutoffs):
    """Full alignment of each (text, pattern) under its score bound.

    Returns list of (status, ops_str|None) in input order.
    """
    n = len(texts)
    leaves: list[list] = [[] for _ in range(n)]
    status = [QuickedStatus.QUICKED_OK] * n
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
            if status[i] != QuickedStatus.QUICKED_OK:
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
            fwd = banded_score_results(pats, txts, cos, text_finish=mids)
            rev = banded_score_results([p[::-1] for p in pats],
                                       [t[::-1] for t in txts], cos,
                                       text_finish=mids_r)
            for t, f, r, mid in zip(split, fwd, rev, mids):
                i, path, text, pattern, cutoff = t
                geo = myers_np.band_geometry(len(pattern), len(text), cutoff)
                sp = myers_np.hirschberg_split(f, r, len(pattern), len(text),
                                               geo)
                if sp is None:
                    status[i] = QuickedStatus.QUICKED_FAIL_NON_CONVERGENCE
                    continue
                pll, score_l, score_r = sp
                tasks.append((i, path + (0,), text[:mid], pattern[:pll],
                              int(score_l)))
                tasks.append((i, path + (1,), text[mid:], pattern[pll:],
                              int(score_r)))

    out = []
    for i in range(n):
        if status[i] != QuickedStatus.QUICKED_OK:
            out.append((status[i], None))
        else:
            ops = "".join(op for _, op in sorted(leaves[i]))
            out.append((QuickedStatus.QUICKED_OK, ops))
    return out
