"""Systolic (skewed) deep-band BandEd score kernel — step model.

The carry-scan kernel (banded_cscan_jax/pallas) resolves each column's
block-to-block Myers carry chain with a 3-state map prefix scan: ~2x the
advance arithmetic plus a log-depth compose per column. This module
models the systolic alternative: band block-row k runs exactly one
column behind block-row k-1, so the carry entering k at column c is the
carry k-1 produced one step earlier — one plane shift per step, ONE
advance per cell, no scan.

Two ideas make the schedule legal and cheap:

1. **Absolute-row frame.** The reference's per-chunk band shift
   (bpm_banded.c:264-301: state[i] = state[i+1] every 64 columns) is
   pure frame bookkeeping when state is indexed by the shifted PEQ row
   k = column_block + band_block (batch_prep.py's layout): the shifted
   slots' data never moves in k-terms, the band window [first_abs,
   last_abs] just sweeps upward by 0..2 rows per chunk. A systolic
   kernel over k-indexed slots therefore needs NO per-chunk data
   movement at all — band maintenance reduces to scalar edge events.
   (Slots are recentered by 128 rows as the sweep approaches the top of
   the resident window.)

2. **Staggered maintenance events.** Each row processes its 64-column
   chunk on its own clock (one bubble step per chunk, cycle CY = 65
   steps), so the per-chunk cut/shift decisions (bpm_banded.c:889-922)
   fire as scalar events when the capture rows cross the chunk
   boundary: E1(nb) when row first_abs+1 finishes chunk nb (decides
   first(nb+1)), E2(nb) when row last_abs finishes it (decides
   last(nb+1) and performs the scores[last+1] write). The bottom
   decision's `first + 2 < last` predicate references last(nb), which
   the top machine has not decided yet when the band is deeper than one
   chunk of skew; the model tracks exact bounds (last never increases,
   drops at most 1 per chunk) and raises an ABORT flag in the rare
   ambiguous case — callers fall back to the carry-scan kernel, so
   bit-exactness is preserved unconditionally.

Exactness contract (parity-tested against banded_jax.run_banded):
- scores_by_k: every entry exact.
- first/last: exact.
- pv/mv planes: exact on [first, last] (the region hirschberg_split
  reads, myers_np.py:720-736) and above `last` (reset values). Below
  `first` the sequential kernels hold shift-history garbage that a
  frame-stationary kernel cannot (and need not) reproduce.

This file is the bit-exact numpy reference for the Pallas kernel
(banded_sysband_pallas.py); it mirrors the kernel's plane program
(flat slot arrays, masked updates, shift cascades, scalar event
machines, recentering) so the Mosaic port is mechanical.
"""

from __future__ import annotations

import numpy as np

from quicked_tpu.ops.batch_prep import BandedBatch

W = 64
CY = W + 1          # per-row chunk cycle: 64 columns + 1 bubble step
RECENTER = 128      # recenter granularity (one 128-lane plane row)

U64 = np.uint64
ONES64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def resident_rows(ebb: int) -> int:
    """Resident-window depth in RECENTER-lane rows: EBB+2 band rows +
    the recenter slab + early-trigger slack (fresh top slots must sit
    >= RECENTER rows above the band top so the chars cascade warms them
    before activation). The kernel's window sizing MUST match the
    model's — the recenter-delayed abort depends on this slack."""
    return -(-(ebb + 2 + 3 * RECENTER + 4) // RECENTER)


def total_steps(nb: int, ns: int) -> int:
    """Step count covering the last event E2(NB-1) at ~la + CY*(NB-1)
    + 63 with la up to NB + EBB: the skew adds ~NB + NS on top of the
    CY*NB columns, plus drain slack."""
    return CY * nb + nb + ns + 2 * CY


def advance64(eq, lm, pv, mv, phin, mhin):
    """BPM_ADVANCE_BLOCK (bpm_commons.h:49-68) on whole u64 words,
    vectorized over slots. phin/mhin are u64 0/1 carries."""
    one = np.uint64(1)
    xv = eq | mv
    eq2 = eq | mhin
    t = eq2 & pv
    s = (t + pv) & ONES64
    xh = (s ^ pv) | eq2
    ph = mv | ~(xh | pv)
    mh = pv & xh
    phout = ((ph & lm) != 0).astype(U64)
    mhout = ((mh & lm) != 0).astype(U64)
    ph = ((ph << one) | phin) & ONES64
    mh = ((mh << one) | mhin) & ONES64
    pv_n = mh | ~(xv | ph)
    mv_n = ph & xv
    return pv_n, mv_n, phout, mhout


def _shift_down(x, fill):
    """y[s] = x[s-1]; y[0] = fill."""
    y = np.empty_like(x)
    y[1:] = x[:-1]
    y[0] = fill
    return y


def _col_of(u):
    """Column processed at local step u >= 0 (u = t - k): 64 columns
    then one bubble per cycle. For u < 0 (not started) returns u."""
    if u < 0:
        return u
    return W * (u // CY) + min(u % CY, W - 1)


class SysbandAbort(Exception):
    """Raised when the bottom-edge decision would need a last(nb) the
    top machine has not produced (narrow-band ambiguity)."""


def run_sysband_pair(batch: BandedBatch, j: int, ns_rows: int | None = None,
                     probe=None):
    """Run the systolic model for lane j of a prepared score-only batch.

    Returns the per-lane slice of run_banded's output dict:
    scores_by_k (K+1,), pv/mv u64 (EBB,), first, last. Raises
    SysbandAbort on the narrow-band ambiguity.
    """
    assert not batch.full
    EBB, NB, K = batch.EBB, batch.NB, batch.K
    cutoff = int(batch.cutoff[j])
    prolog = int(batch.prolog[j])
    nbr = int(batch.nbr[j])
    finish_v = int(batch.finish_v[j])
    tfinish = int(batch.tfinish[j])
    first0 = int(batch.first0[j])
    last0 = int(batch.last0[j])
    tf64 = tfinish // W          # chunks with do_shift true
    text = batch.text[:, j].astype(np.int64)

    # resident window: EBB+2 rows of band + recenter slab + one slab of
    # early-trigger slack (so fresh top slots sit >= 128 rows above the
    # band top and the chars cascade warms them long before activation)
    if ns_rows is None:
        ns_rows = resident_rows(EBB)
    NS = ns_rows * RECENTER

    # u64 views of the prepared shifted-frame planes, padded above K
    def u64_rows(lo, hi, n):
        out = lo[:n].astype(U64) | (hi[:n].astype(U64) << np.uint64(32))
        return out

    peq64 = np.empty((K, 5), dtype=U64)
    peq64[:, :] = (batch.peq_lo[:, :, j].astype(U64)
                   | (batch.peq_hi[:, :, j].astype(U64) << np.uint64(32)))
    lm64 = (batch.lm_lo[:, j].astype(U64)
            | (batch.lm_hi[:, j].astype(U64) << np.uint64(32)))
    LM_DEFAULT = np.uint64(0x8000000000000000)

    def peq_resident(base):
        out = np.full((NS, 5), ONES64, dtype=U64)
        hi = min(base + NS, K)
        if hi > base:
            out[: hi - base] = peq64[base:hi]
        return out

    def lm_resident(base):
        out = np.full(NS, LM_DEFAULT, dtype=U64)
        hi = min(base + NS, K)
        if hi > base:
            out[: hi - base] = lm64[base:hi]
        return out

    def formula(k):
        return (k - prolog + 1) * W

    base = 0
    peq_res = peq_resident(base)
    lm_res = lm_resident(base)

    k_arr = np.arange(NS, dtype=np.int64)           # absolute row per slot
    pv = np.full(NS, ONES64, dtype=U64)
    mv = np.zeros(NS, dtype=U64)
    srow = formula(k_arr).astype(np.int64)
    chars = np.zeros(NS, dtype=np.int64)
    chars[0] = text[0] if NB * W > 0 else 0         # row 0 at t=0: col 0
    pho = np.zeros(NS, dtype=U64)
    mho = np.zeros(NS, dtype=U64)
    phase = (-k_arr) % CY
    col = -k_arr.copy()
    # the active band of a row's current chunk is the AND of two
    # independently-evolving edges (they can be inverted — first0 >
    # last0 — while the prolog opens the band): act_bot = k >= first_abs
    # (only ever cleared: first_abs is non-decreasing), act_top =
    # k <= last_abs (only ever set: last_abs is non-decreasing)
    act_bot = k_arr >= first0
    act_top = k_arr <= last0
    isf = k_arr == first0

    # scalar machines
    nbB, fsB = 0, first0          # bottom: next chunk to decide; first(nbB)
    nbT, lsT = 0, last0           # top: next chunk to decide; last(nbT)
    cl1 = 0                       # c_last1 captured at E2(nbT) - 1
    first_ring = {0: first0}
    last_ring = {0: last0}
    max_spread = 0
    pending = []                  # (t_apply, kind, row)

    dropped_out = formula(np.arange(K + 1, dtype=np.int64)).astype(np.int64)

    def flush_rows(lo_row, hi_row):
        lo_row = max(lo_row, 0)
        hi_row = min(hi_row, K + 1)
        if hi_row > lo_row:
            dropped_out[lo_row:hi_row] = srow[lo_row - base:hi_row - base]

    T_end = total_steps(NB, NS)

    for t in range(T_end):
        # ---- apply pending mask edits scheduled for this step ----
        if pending:
            rest = []
            for (ta, kind, row) in pending:
                if ta != t:
                    rest.append((ta, kind, row))
                    continue
                s = row - base
                if 0 <= s < NS:
                    if kind == "deact":
                        act_bot[s] = False
                        isf[s] = False
                    elif kind == "act":
                        act_top[s] = True
                    elif kind == "isf":
                        isf[s] = True
            pending = rest

        # ---- advance (every resident slot; writes masked) ----
        bubble = phase == W
        advancing = (~bubble) & (col >= 0) & (col < tfinish)
        eq = peq_res[np.arange(NS), np.clip(chars, 0, 4)]
        hin_p = _shift_down(pho, np.uint64(0))
        hin_m = _shift_down(mho, np.uint64(0))
        phin = np.where(isf, np.uint64(1), hin_p)
        mhin = np.where(isf, np.uint64(0), hin_m)
        pv_n, mv_n, phout, mhout = advance64(eq, lm_res, pv, mv, phin, mhin)
        wr = advancing & act_bot & act_top
        pv = np.where(wr, pv_n, pv)
        mv = np.where(wr, mv_n, mv)
        srow = srow + np.where(wr, phout.astype(np.int64)
                               - mhout.astype(np.int64), 0)
        pho, mho = phout, mhout   # garbage outside `advancing` never read

        if probe is not None:
            probe(t, locals())

        # ---- bottom machine: E1 ----
        if nbB < NB and t == fsB + nbB + 1 + CY * nbB + W - 1:  # E1(nbB)
            faB = nbB + fsB
            ds_b = (nbB + 1) * W <= tfinish
            if nbB <= nbT:
                last_b = last_ring[nbB]
                b_pred = fsB + 2 < last_b
                known = True
            else:
                lb = lsT - (nbB - nbT)
                if fsB + 2 < lb:
                    b_pred, known = True, True
                elif fsB + 2 >= lsT:
                    b_pred, known = False, True
                else:
                    b_pred, known = False, False
            if ds_b:
                if not known:
                    raise SysbandAbort(
                        f"chunk {nbB}: first+2 vs last ambiguous "
                        f"(first={fsB}, last in [{lsT - (nbB - nbT)},"
                        f"{lsT}])")
                if b_pred:
                    s = faB + 1 - base
                    c_first1 = int(srow[s]) if 0 <= s < NS else 0
                    a_pred = (finish_v > W * (fsB + 1)) and \
                        ((c_first1 + (finish_v - W * (fsB + 1))) > cutoff)
                else:
                    a_pred = False
                cut_lower = a_pred and b_pred
                inc = cut_lower and nbB >= prolog
                dec = (not cut_lower) and nbB < prolog
                new_fs = fsB + (1 if inc else 0) - (1 if dec else 0)
                delta_abs = 1 + new_fs - fsB        # 0 (dec), 1, 2 (inc)
                if delta_abs >= 1:
                    pending.append((t + 1, "deact", faB))
                    if delta_abs == 1:
                        pending.append((t + 2, "isf", faB + 1))
                if delta_abs == 2:
                    pending.append((t + 2, "deact", faB + 1))
                    pending.append((t + 3, "isf", faB + 2))
            else:
                new_fs = fsB
            first_ring[nbB + 1] = new_fs
            nbB += 1
            fsB = new_fs
            max_spread = max(max_spread, abs(nbB - nbT))
            # retire ring entries the other machine no longer needs
            floor_nb = min(nbB, nbT) - 1
            for nb_old in [n for n in first_ring if n < floor_nb]:
                del first_ring[nb_old]
            for nb_old in [n for n in last_ring if n < floor_nb]:
                del last_ring[nb_old]

        # ---- top machine: captures + E2 ----
        if nbT < NB:
            laT = nbT + lsT
            ds_t = (nbT + 1) * W <= tfinish

            def f_cmp(thr, nb_q=None):
                """Exact 3-way of `first(nb_q) <= thr`: True/False/None.
                When the bottom machine has not decided chunk nb_q yet
                (the inverted-band prolog phase), first(nb_q) is bounded
                by fsB +- |nb_q - nbB| (one step per chunk)."""
                if nb_q is None:
                    nb_q = nbT
                if nb_q <= nbB:
                    return first_ring[nb_q] <= thr
                dist = nb_q - nbB
                if fsB + dist <= thr:
                    return True
                if fsB - dist > thr:
                    return False
                return None

            if t == laT - 1 + CY * nbT + W - 1:       # F(laT-1, nbT)
                m = f_cmp(lsT - 1)
                if ds_t and m is None:
                    raise SysbandAbort(
                        f"chunk {nbT}: c_last1 mask ambiguous")
                s = laT - 1 - base
                cl1 = int(srow[s]) if (ds_t and m and 0 <= s < NS) else 0
            if t == laT + CY * nbT + W - 1:           # E2(nbT)
                if ds_t:
                    m = f_cmp(lsT)
                    # cut_higher's width predicate uses the UPDATED
                    # first (bpm_banded.c applies the lower cut before
                    # computing the higher one): first(nbT+1) + 2 < last
                    bt = f_cmp(lsT - 3, nb_q=nbT + 1)
                    if m is None or bt is None:
                        raise SysbandAbort(
                            f"chunk {nbT}: top decision ambiguous")
                    s = laT - base
                    c_last = int(srow[s]) if (m and 0 <= s < NS) else 0
                    cut_higher = bt and (W * (lsT - 1) > finish_v) \
                        and ((cl1 + (W * (lsT - 1) - finish_v)) > cutoff)
                    clamp = (nbT - prolog + lsT) >= nbr
                    sw = laT + 1 - base
                    if sw >= NS:
                        raise SysbandAbort(
                            f"chunk {nbT}: band outran the resident "
                            f"window (laT+1={laT + 1}, base={base})")
                    if sw >= 0:
                        srow[sw] = c_last + W
                    new_ls = lsT - (1 if (cut_higher or clamp) else 0)
                    if new_ls == lsT:
                        # top edge advances: row laT+1 is <= last_abs
                        # from its chunk nbT+1 on
                        pending.append((t + 3, "act", laT + 1))
                else:
                    new_ls = lsT
                last_ring[nbT + 1] = new_ls
                nbT += 1
                lsT = new_ls

        # ---- cascades + clocks (state for step t+1) ----
        u0 = t + 1 - base
        c0 = _col_of(u0)
        entry = int(text[c0]) if 0 <= c0 < NB * W else 0
        chars = _shift_down(chars, entry)
        col = col + ((phase != W) | (col < 0)).astype(np.int64)
        phase = (phase + 1) % CY

        # ---- recenter ----
        laT_now = nbT + lsT
        nb_floor = min(nbB, nbT)
        # nb_floor <= nbB always, and the bottom machine has written
        # first_ring[nb] for every nb <= nbB — direct indexing asserts
        # the invariant (the kernel mirrors this: fring[nb_floor % RING])
        f_floor = first_ring[nb_floor]
        # early trigger: recenter while the band top is still >= 128
        # rows below the window top, so the fresh slots' chars warm via
        # the cascade (<= 128 steps) long before the top edge reaches
        # them (>= 128 chunks x 65 steps) — no per-lane text seed needed
        if (laT_now + 1 - base >= NS - 1 - RECENTER
                and base + RECENTER <= tf64
                and nb_floor + f_floor > base + RECENTER - 1):
            if laT_now + 1 - base > NS - 1 - RECENTER:
                # the guards delayed past the early-trigger point: the
                # fresh top slots would sit < 128 rows above the band
                # top and the chars cascade could not warm them in time.
                # Cannot happen with the default window sizing.
                raise SysbandAbort(
                    f"recenter delayed: band top within {RECENTER} rows "
                    f"of the window top (laT={laT_now}, base={base})")
            flush_rows(base, base + RECENTER)
            for arr in (pv, mv, srow, chars, pho, mho, phase, col,
                        act_bot, act_top, isf):
                arr[:-RECENTER] = arr[RECENTER:].copy()
            base += RECENTER
            k_new = np.arange(base + NS - RECENTER, base + NS,
                              dtype=np.int64)
            pv[-RECENTER:] = ONES64
            mv[-RECENTER:] = 0
            srow[-RECENTER:] = formula(k_new)
            u_new = t + 1 - k_new
            phase[-RECENTER:] = u_new % CY
            # rows entering with an already-positive local clock carry
            # the bubble discount (one bubble per 65-step cycle). The
            # incremental rule leaves col one-PAST at bubble phase (it
            # increments on phase 63->64 and holds on 64->0), so the
            # seed must NOT clamp to the cycle's last column.
            col_new = np.where(
                u_new < 0, u_new,
                W * (u_new // CY) + u_new % CY)
            col[-RECENTER:] = col_new
            # chars need no seed: the upward cascade carries correct
            # values from the slot below within 128 steps, and the
            # early trigger guarantees >= 128 chunks before these rows
            # activate
            chars[-RECENTER:] = 0
            act_bot[-RECENTER:] = True    # far above the bottom edge
            act_top[-RECENTER:] = False   # top edge has not reached them
            isf[-RECENTER:] = False
            peq_res = peq_resident(base)
            lm_res = lm_resident(base)

    # ---- collect ----
    flush_rows(base, base + NS)
    e = NB - tf64     # chunks whose frame advance moved no data: the
    # pv/mv binding shifts up by e rows, while for scores the per-chunk
    # scw roll is exactly the binding shift, so scores_by_k[k] is the
    # frozen row k for every k — no shift
    scores_by_k = dropped_out.copy()
    src = np.arange(NB, K + 1)
    ok = (src >= base) & (src < base + NS)
    vals = np.where(ok, srow[np.clip(src - base, 0, NS - 1)],
                    formula(src))
    scores_by_k[NB:] = vals

    pv_out = np.full(EBB, ONES64, dtype=U64)
    mv_out = np.zeros(EBB, dtype=U64)
    rows = np.arange(EBB, dtype=np.int64) + tf64
    okp = (rows >= base) & (rows < base + NS)
    idx = np.clip(rows - base, 0, NS - 1)
    pv_out = np.where(okp, pv[idx], pv_out)
    mv_out = np.where(okp, mv[idx], mv_out)

    return dict(scores_by_k=scores_by_k, pv64=pv_out, mv64=mv_out,
                first=fsB, last=lsT, max_spread=max_spread, base=base)


def run_banded_sysband_np(batch: BandedBatch):
    """Model driver over a batch: same dict shape as
    banded_jax.run_banded (full=False), with u64 planes split back to
    u32 pairs. Raises SysbandAbort if any lane aborts."""
    B = batch.B
    K = batch.K
    n = len(batch.enc_patterns) if batch.enc_patterns is not None else B
    # padded lanes (j >= n) follow the run_banded / banded_native
    # convention: the init formula (k - prolog + 1)*64 and first0/last0
    k_idx = np.arange(K + 1, dtype=np.int64)[:, None]
    scores = (k_idx - batch.prolog[None, :].astype(np.int64) + 1) * W
    pv64 = np.full((batch.EBB, B), ONES64, dtype=U64)
    mv64 = np.zeros((batch.EBB, B), dtype=U64)
    first = batch.first0.astype(np.int32).copy()
    last = batch.last0.astype(np.int32).copy()
    for j in range(n):
        out = run_sysband_pair(batch, j)
        scores[:, j] = out["scores_by_k"]
        pv64[:, j] = out["pv64"]
        mv64[:, j] = out["mv64"]
        first[j] = out["first"]
        last[j] = out["last"]
    m32 = np.uint64(0xFFFFFFFF)
    return dict(
        scores_by_k=scores,
        pv_lo=(pv64 & m32).astype(np.uint32),
        pv_hi=(pv64 >> np.uint64(32)).astype(np.uint32),
        mv_lo=(mv64 & m32).astype(np.uint32),
        mv_hi=(mv64 >> np.uint64(32)).astype(np.uint32),
        first=first, last=last)
