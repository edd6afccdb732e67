"""Pallas TPU kernels: batched BandEd score-only and full-matrix
(traceback) variants, pairs-as-lanes.

The Mosaic fast paths for the sequential banded kernels
(banded_jax.banded_scan_impl). Same dataflow, same arithmetic, bit-exact
outputs; the Pallas advantages over the XLA scan:

  - the band state (Pv/Mv/scores window/first/last) lives in VMEM
    scratch across the whole text sweep — no carried-scan shuffling;
  - the PEQ/level-mask band window is DMA'd from HBM once per 64-column
    text block (the sliding shifted-frame window, batch_prep.py);
  - the per-column block loop runs with *dynamic bounds*
    [min(first), max(last)] over the lane tile — dead band rows are
    skipped entirely (the C reference's first_block_v..last_block_v
    loop, bpm_banded.c:830-886), which a static-shape XLA scan cannot do;
  - (full variant) per-column band snapshots stream straight from VMEM
    to the HBM traceback planes in double-buffered 8-column chunks,
    mirroring bpm_compute_matrix_banded_cutoff's stored columns
    (bpm_banded.c:199-316) — the traceback itself is the host C walk
    (native.traceback_banded) over the (T, EBB, LANES) planes.

Grid: (pair_tiles, NB) with NB innermost — each pair tile's state
persists in scratch across its NB text blocks. Lane tile = 1024 pairs
for score (8 sublanes x 128 lanes of u32), 256 for full (the HBM planes
are NB*64 x EBB x LANES per tile; smaller tiles bound the padding
waste when the per-lane footprint approaches the Hirschberg budget).

Reuses banded_jax._maintenance (pure jnp) for the per-64-column band
cut/shift so the kernels cannot drift. The stored 64th column of each
block reflects the post-maintenance state, exactly like the reference
(bpm_banded.c:279-287 operate on the stored column).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quicked_tpu.ops import u64
from quicked_tpu.ops.banded_jax import _maintenance
from quicked_tpu.ops.batch_prep import BandedBatch

W = 64
CH = 8        # snapshot chunk: columns per output DMA (full variant)
U32 = jnp.uint32
I32 = jnp.int32
LANES = 1024       # score-variant pairs per tile
LANES_FULL_MIN = 128   # Mosaic lane-dim floor (last dim 128-divisible)
ALPH = 8      # alphabet axis padded 5 -> 8 (Mosaic sublane tiling)


def _kernel(peq_lo_hbm, peq_hi_hbm, lm_lo_hbm, lm_hi_hbm,   # ANY (HBM)
            text_ref, init_ref, cutoff_ref, prolog_ref, nbr_ref,
            finishv_ref, tfinish_ref, first0_ref, last0_ref,  # VMEM in
            *refs,
            EBB: int, NB: int, K: int, LANES: int, FULL: bool):
    if FULL:
        (scores_out, pv_lo_out, pv_hi_out, mv_lo_out, mv_hi_out,
         first_out, last_out,
         mat_pv_lo, mat_pv_hi, mat_mv_lo, mat_mv_hi,     # ANY (HBM) out
         pv_lo, pv_hi, mv_lo, mv_hi, scw, fl,
         peq_win_lo, peq_win_hi, lm_win_lo, lm_win_hi, sems,
         snap_pv_lo, snap_pv_hi, snap_mv_lo, snap_mv_hi,
         snap_sems) = refs
    else:
        (scores_out, pv_lo_out, pv_hi_out, mv_lo_out, mv_hi_out,
         first_out, last_out,
         pv_lo, pv_hi, mv_lo, mv_hi, scw, fl,
         peq_win_lo, peq_win_hi, lm_win_lo, lm_win_hi, sems) = refs
    p = pl.program_id(0)
    nb = pl.program_id(1)

    @pl.when(nb == 0)
    def _init():
        pv_lo[:] = jnp.full((EBB, LANES), 0xFFFFFFFF, U32)
        pv_hi[:] = jnp.full((EBB, LANES), 0xFFFFFFFF, U32)
        mv_lo[:] = jnp.zeros((EBB, LANES), U32)
        mv_hi[:] = jnp.zeros((EBB, LANES), U32)
        scw[:] = init_ref[0]
        fl[0, :] = first0_ref[0, 0]
        fl[1, :] = last0_ref[0, 0]

    # Stream this block's PEQ/level-mask band window from HBM. DMA row
    # offsets must be provably 8-aligned: fetch the window at the
    # aligned start nb8 = 8*(nb//8) with 8 rows of slack, and index
    # rows at off = nb - nb8 inside the kernel.
    nb8 = pl.multiple_of((nb // 8) * 8, 8)
    off = nb - nb8
    copies = [
        pltpu.make_async_copy(peq_lo_hbm.at[p, pl.ds(nb8, EBB + 8)],
                              peq_win_lo, sems.at[0]),
        pltpu.make_async_copy(peq_hi_hbm.at[p, pl.ds(nb8, EBB + 8)],
                              peq_win_hi, sems.at[1]),
        pltpu.make_async_copy(lm_lo_hbm.at[p, pl.ds(nb8, EBB + 8)],
                              lm_win_lo, sems.at[2]),
        pltpu.make_async_copy(lm_hi_hbm.at[p, pl.ds(nb8, EBB + 8)],
                              lm_win_hi, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    first = fl[0, :]
    last = fl[1, :]
    tfinish = tfinish_ref[0, 0]
    # dynamic live-band bounds across the lane tile
    blk_lo = jnp.min(first)
    blk_hi = jnp.max(last)

    if FULL:
        snaps = (snap_pv_lo, snap_pv_hi, snap_mv_lo, snap_mv_hi)
        mats = (mat_pv_lo, mat_pv_hi, mat_mv_lo, mat_mv_hi)

        def _snap_copies(slot, ch):
            row0 = pl.multiple_of(nb * W + ch * CH, 8)
            return [pltpu.make_async_copy(
                        s.at[slot], m.at[p, pl.ds(row0, CH)],
                        snap_sems.at[slot, q])
                    for q, (s, m) in enumerate(zip(snaps, mats))]

    def advance_col(j):
        """Advance one text column j (0..63) over the live band. Text
        arrives PACKED (4 chars per little-endian i32 word — a 4x
        staging-upload cut; chars are 0..4 so the word is always
        non-negative and the arithmetic shift is safe)."""
        c = (text_ref[0, j // 4, :] >> (8 * (j % 4))) & 0xFF
        t_global = nb * W + j
        col_act = t_global < tfinish
        # the char-class compares are block-row-invariant: compute the
        # 4 select masks ONCE per column here instead of per band block
        # inside blk_body (the fori_loop body re-traces its contents,
        # so Mosaic cannot hoist them itself)
        sels = [c == a for a in range(1, 5)]

        def blk_body(i, carry):
            phin, mhin = carry
            row_lo = peq_win_lo[off + i]      # (ALPH, LANES)
            row_hi = peq_win_hi[off + i]
            eq_lo = row_lo[0]
            eq_hi = row_hi[0]
            for a in range(1, 5):
                sel = sels[a - 1]
                eq_lo = jnp.where(sel, row_lo[a], eq_lo)
                eq_hi = jnp.where(sel, row_hi[a], eq_hi)
            is_first = i == first
            phin_eff = jnp.where(is_first, jnp.ones((LANES,), U32), phin)
            mhin_eff = jnp.where(is_first, jnp.zeros((LANES,), U32), mhin)
            npv_lo, npv_hi, nmv_lo, nmv_hi, phout, mhout = \
                u64.advance_block64(eq_lo, eq_hi, lm_win_lo[off + i],
                                    lm_win_hi[off + i], pv_lo[i], pv_hi[i],
                                    mv_lo[i], mv_hi[i], phin_eff,
                                    mhin_eff)
            act = col_act & (i >= first) & (i <= last)
            pv_lo[i] = jnp.where(act, npv_lo, pv_lo[i])
            pv_hi[i] = jnp.where(act, npv_hi, pv_hi[i])
            mv_lo[i] = jnp.where(act, nmv_lo, mv_lo[i])
            mv_hi[i] = jnp.where(act, nmv_hi, mv_hi[i])
            scw[i] = jnp.where(
                act, scw[i] + phout.astype(I32) - mhout.astype(I32),
                scw[i])
            return phout, mhout

        jax.lax.fori_loop(blk_lo, blk_hi + 1, blk_body,
                          (jnp.ones((LANES,), U32),
                           jnp.zeros((LANES,), U32)))

    def advance_cols4(q):
        """Advance text columns [4q, 4q+4) over the live band in ONE
        band sweep (score variant only). Within a 64-column block
        first/last are fixed (maintenance runs between blocks), so the
        four columns share the same live-row window; batching them
        amortizes the dominant VMEM traffic — the (ALPH, LANES) PEQ
        row reads and the Pv/Mv state write-backs — 4x, leaving one
        row-read + one state read/write per 4 columns. Bit-exact: the
        per-column dataflow is just run back-to-back in-register, with
        each column's tfinish mask applied before the next column
        consumes the state."""
        w_lo = text_ref[0, q, :]
        chars = [(w_lo >> (8 * jj)) & 0xFF for jj in range(4)]
        col_acts = [nb * W + 4 * q + jj < tfinish for jj in range(4)]
        selss = [[c == a for a in range(1, 5)] for c in chars]

        def blk_body(i, carry):
            phins, mhins = carry
            row_lo = peq_win_lo[off + i]      # (ALPH, LANES)
            row_hi = peq_win_hi[off + i]
            lmw_lo = lm_win_lo[off + i]
            lmw_hi = lm_win_hi[off + i]
            is_first = i == first
            act_band = (i >= first) & (i <= last)
            cpv_lo, cpv_hi = pv_lo[i], pv_hi[i]
            cmv_lo, cmv_hi = mv_lo[i], mv_hi[i]
            csc = scw[i]
            phouts, mhouts = [], []
            for jj in range(4):
                eq_lo = row_lo[0]
                eq_hi = row_hi[0]
                for a in range(1, 5):
                    sel = selss[jj][a - 1]
                    eq_lo = jnp.where(sel, row_lo[a], eq_lo)
                    eq_hi = jnp.where(sel, row_hi[a], eq_hi)
                phin_eff = jnp.where(is_first, jnp.ones((LANES,), U32),
                                     phins[jj])
                mhin_eff = jnp.where(is_first, jnp.zeros((LANES,), U32),
                                     mhins[jj])
                npv_lo, npv_hi, nmv_lo, nmv_hi, phout, mhout = \
                    u64.advance_block64(eq_lo, eq_hi, lmw_lo, lmw_hi,
                                        cpv_lo, cpv_hi, cmv_lo, cmv_hi,
                                        phin_eff, mhin_eff)
                act = col_acts[jj] & act_band
                cpv_lo = jnp.where(act, npv_lo, cpv_lo)
                cpv_hi = jnp.where(act, npv_hi, cpv_hi)
                cmv_lo = jnp.where(act, nmv_lo, cmv_lo)
                cmv_hi = jnp.where(act, nmv_hi, cmv_hi)
                csc = jnp.where(
                    act, csc + phout.astype(I32) - mhout.astype(I32),
                    csc)
                phouts.append(phout)
                mhouts.append(mhout)
            pv_lo[i], pv_hi[i] = cpv_lo, cpv_hi
            mv_lo[i], mv_hi[i] = cmv_lo, cmv_hi
            scw[i] = csc
            return tuple(phouts), tuple(mhouts)

        ones = jnp.ones((LANES,), U32)
        zeros = jnp.zeros((LANES,), U32)
        jax.lax.fori_loop(blk_lo, blk_hi + 1, blk_body,
                          ((ones,) * 4, (zeros,) * 4))

    if not FULL:
        jax.lax.fori_loop(0, W // 4,
                          lambda q, _: (advance_cols4(q), 0)[1], 0)
    else:
        # chunked sweep with snapshot streaming; column 63's snapshot is
        # written after band maintenance (the reference shifts the
        # stored column in place, bpm_banded.c:279-287)
        def chunk_body(ch, _):
            slot = ch % 2

            @pl.when(ch >= 2)
            def _reclaim():
                # the DMA that used this slot two chunks ago
                for cp in _snap_copies(slot, ch - 2):
                    cp.wait()

            def col_body(jj, _):
                j = ch * CH + jj
                advance_col(j)

                @pl.when(j < W - 1)
                def _store():
                    snap_pv_lo[slot, jj] = pv_lo[:]
                    snap_pv_hi[slot, jj] = pv_hi[:]
                    snap_mv_lo[slot, jj] = mv_lo[:]
                    snap_mv_hi[slot, jj] = mv_hi[:]
                return 0

            jax.lax.fori_loop(0, CH, col_body, 0)

            @pl.when(ch < (W // CH) - 1)
            def _flush():
                for cp in _snap_copies(slot, ch):
                    cp.start()
            return 0

        jax.lax.fori_loop(0, W // CH, chunk_body, 0)

    # band maintenance (shared jnp implementation, banded_jax.py)
    pvs = (pv_lo[:], pv_hi[:])
    mvs = (mv_lo[:], mv_hi[:])
    scw_v = scw[:]
    srows = scw_v[:EBB]

    def cap(at):
        # per-lane row select as a masked reduction (Mosaic's gather
        # lowering doesn't cover take_along_axis here)
        at_c = jnp.clip(at, 0, EBB - 1)
        rows = jax.lax.broadcasted_iota(I32, (EBB, 1), 0)
        return jnp.where(rows == at_c[None, :], srows, 0).sum(axis=0)

    captures = (cap(first + 1), cap(last - 1), cap(last))
    batch_consts = (cutoff_ref[0, 0], prolog_ref[0, 0], nbr_ref[0, 0],
                    finishv_ref[0, 0], tfinish)
    pvs, mvs, scw_v, first_n, last_n = _maintenance(
        pvs, mvs, scw_v, first, last, captures, nb, batch_consts, EBB,
        full_variant=FULL)
    # dropped row + scores-window roll
    scores_out[0, nb, :] = scw_v[0]
    new_k = nb + 1 + EBB
    new_row = ((new_k - prolog_ref[0, 0] + 1) * W).astype(I32)
    scw[:] = jnp.concatenate([scw_v[1:], new_row[None, :]], axis=0)
    pv_lo[:], pv_hi[:] = pvs
    mv_lo[:], mv_hi[:] = mvs
    fl[0, :] = first_n
    fl[1, :] = last_n

    if FULL:
        # column 63's stored state = post-maintenance band
        last_ch = W // CH - 1
        snap_pv_lo[last_ch % 2, CH - 1] = pv_lo[:]
        snap_pv_hi[last_ch % 2, CH - 1] = pv_hi[:]
        snap_mv_lo[last_ch % 2, CH - 1] = mv_lo[:]
        snap_mv_hi[last_ch % 2, CH - 1] = mv_hi[:]
        for cp in _snap_copies(last_ch % 2, last_ch):
            cp.start()
        # drain both slots before the next grid step reuses them
        for cp in _snap_copies((last_ch - 1) % 2, last_ch - 1):
            cp.wait()
        for cp in _snap_copies(last_ch % 2, last_ch):
            cp.wait()

    @pl.when(nb == NB - 1)
    def _finish():
        scores_out[0, pl.ds(NB, EBB + 1), :] = scw[:]
        pv_lo_out[0] = pv_lo[:]
        pv_hi_out[0] = pv_hi[:]
        mv_lo_out[0] = mv_lo[:]
        mv_hi_out[0] = mv_hi[:]
        first_out[0, 0] = fl[0, :]
        last_out[0, 0] = fl[1, :]


@partial(jax.jit,
         static_argnames=("EBB", "NB", "K", "LANES", "FULL", "interpret"))
def _pallas_banded(peq_lo, peq_hi, lm_lo, lm_hi, text, init_scores,
                   cutoff, prolog, nbr, finish_v, tfinish, first0, last0,
                   *, EBB: int, NB: int, K: int, LANES: int,
                   FULL: bool = False, interpret: bool = False):
    P = text.shape[0]
    grid = (P, NB)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    # lane vectors travel as (P, 1, LANES) so the block's trailing two
    # dims equal the array's (Mosaic block-shape divisibility rule)
    lanevec = pl.BlockSpec((1, 1, LANES), lambda p, nb: (p, 0, 0),
                           memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((P, K + 1, LANES), jnp.int32),   # scores
        jax.ShapeDtypeStruct((P, EBB, LANES), jnp.uint32),    # pv_lo
        jax.ShapeDtypeStruct((P, EBB, LANES), jnp.uint32),
        jax.ShapeDtypeStruct((P, EBB, LANES), jnp.uint32),
        jax.ShapeDtypeStruct((P, EBB, LANES), jnp.uint32),
        jax.ShapeDtypeStruct((P, 1, LANES), jnp.int32),       # first
        jax.ShapeDtypeStruct((P, 1, LANES), jnp.int32),       # last
    ]
    out_specs = [
        pl.BlockSpec((1, K + 1, LANES), lambda p, nb: (p, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, EBB, LANES), lambda p, nb: (p, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, EBB, LANES), lambda p, nb: (p, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, EBB, LANES), lambda p, nb: (p, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, EBB, LANES), lambda p, nb: (p, 0, 0),
                     memory_space=pltpu.VMEM),
        lanevec,
        lanevec,
    ]
    scratch = [
        pltpu.VMEM((EBB, LANES), jnp.uint32),   # pv_lo
        pltpu.VMEM((EBB, LANES), jnp.uint32),
        pltpu.VMEM((EBB, LANES), jnp.uint32),
        pltpu.VMEM((EBB, LANES), jnp.uint32),
        pltpu.VMEM((EBB + 1, LANES), jnp.int32),  # scw
        pltpu.VMEM((2, LANES), jnp.int32),        # first/last
        pltpu.VMEM((EBB + 8, ALPH, LANES), jnp.uint32),  # peq window
        pltpu.VMEM((EBB + 8, ALPH, LANES), jnp.uint32),
        pltpu.VMEM((EBB + 8, LANES), jnp.uint32),     # lm window
        pltpu.VMEM((EBB + 8, LANES), jnp.uint32),
        pltpu.SemaphoreType.DMA((4,)),
    ]
    if FULL:
        T = NB * W
        out_shapes += [
            jax.ShapeDtypeStruct((P, T, EBB, LANES), jnp.uint32)
            for _ in range(4)
        ]
        out_specs += [hbm] * 4
        scratch += [
            pltpu.VMEM((2, CH, EBB, LANES), jnp.uint32)  # snapshot slots
            for _ in range(4)
        ]
        scratch += [pltpu.SemaphoreType.DMA((2, 4))]
    return pl.pallas_call(
        partial(_kernel, EBB=EBB, NB=NB, K=K, LANES=LANES, FULL=FULL),
        grid=grid,
        interpret=interpret,
        in_specs=[
            hbm, hbm, hbm, hbm,                                # peq/lm
            pl.BlockSpec((1, W // 4, LANES), lambda p, nb: (p, nb, 0),
                         memory_space=pltpu.VMEM),     # text (packed 4/word)
            pl.BlockSpec((1, EBB + 1, LANES), lambda p, nb: (p, 0, 0),
                         memory_space=pltpu.VMEM),              # init
            lanevec, lanevec, lanevec, lanevec, lanevec,       # consts
            lanevec, lanevec,                                  # first0/last0
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
    )(peq_lo, peq_hi, lm_lo, lm_hi, text, init_scores, cutoff, prolog,
      nbr, finish_v, tfinish, first0, last0)


def _tile_lanes(a: np.ndarray, lanes: int) -> np.ndarray:
    """(..., B) -> (P, ..., lanes): lanes pre-tiled for the grid."""
    B = a.shape[-1]
    P = B // lanes
    moved = np.moveaxis(a.reshape(a.shape[:-1] + (P, lanes)), -2, 0)
    return np.ascontiguousarray(moved)


def _untile_lanes(a: np.ndarray) -> np.ndarray:
    """(P, ..., lanes) -> (..., B)."""
    moved = np.moveaxis(a, 0, -2)
    return np.ascontiguousarray(
        moved.reshape(moved.shape[:-2] + (moved.shape[-2] * moved.shape[-1],)))


def pallas_available() -> bool:
    import jax

    return jax.devices()[0].platform == "tpu"


# v5e VMEM is ~16 MB/core; leave headroom for Mosaic's own temporaries.
VMEM_BUDGET = 15 * 2 ** 20


def _lanes_for(EBB8: int, NB: int, snapshot_rows: int, floor: int) -> int:
    """Widest lane tile whose VMEM footprint fits. Shared model for
    both kernel variants: scratch rows once, block-spec'd rows twice
    (Mosaic double-buffers pipelined blocks across grid steps);
    `snapshot_rows` adds the full variant's staging buffers.

    Measured on v5e (B=16384, L=5 kbp, EBB8=16): lane tile 2048 is +13%
    over 1024 (fewer, wider Mosaic instructions); 4096 fails to compile
    (VMEM)."""
    scratch_rows = ((EBB8 + 8) * 18      # peq windows (2x8) + lm (2x1)
                    + EBB8 * 4           # pv/mv band state
                    + (EBB8 + 1) + 2     # scw + first/last
                    + snapshot_rows)
    block_rows = (16                     # text (packed 4 chars/word)
                  + (EBB8 + 1)           # init_scores
                  + 8                    # lane-vector consts
                  + (NB + EBB8 + 1)      # scores out
                  + EBB8 * 4 + 2)        # pv/mv out + first/last out
    rows = scratch_rows + 2 * block_rows
    for lanes in (2048, 1024, 512, 256):
        if rows * 4 * lanes <= VMEM_BUDGET:
            return lanes
    return floor


def score_lanes(EBB8: int, NB: int) -> int:
    """Widest lane tile whose VMEM footprint fits the score kernel."""
    return _lanes_for(EBB8, NB, snapshot_rows=0, floor=128)


def full_lanes(EBB8: int, NB: int) -> int:
    """Widest lane tile whose VMEM footprint fits the FULL kernel.

    The full variant adds the double-buffered snapshot staging rows
    (2 slots x CH columns x EBB8 x 4 planes) on top of the score
    kernel's footprint; the traceback planes themselves live in HBM
    (ANY memory space) and don't count. Short-read batches (EBB8=8)
    fit 2048 lanes — the old fixed 256-lane tile starved the VPU
    (PERFORMANCE.md workload-3 device lane)."""
    return _lanes_for(EBB8, NB, snapshot_rows=2 * CH * EBB8 * 4,
                      floor=LANES_FULL_MIN)


def stage_batch(batch: BandedBatch, lanes: int | None = None):
    """Host prep + device transfer for the Pallas kernel: returns
    (device_args dict, statics dict). Staging once lets callers time or
    repeat kernel executions without re-uploading (the production
    pipeline streams batches; bench.py times compute only)."""
    B = batch.B
    EBB8_pre = -(-batch.EBB // 8) * 8
    if lanes is None:
        if batch.full:
            # Traceback planes in HBM scale with the PADDED lane count:
            # clamp to the batch's pow2 width so small full batches
            # (deep bands, long texts) honor the caller's byte budget
            # (aligner/batch.py chunks on FULL_FILL_BYTES_BUDGET)
            # instead of allocating a full lane tile of planes.
            b_p2 = max(LANES_FULL_MIN, 1 << max(B - 1, 0).bit_length())
            lanes = min(full_lanes(EBB8_pre, batch.NB), b_p2)
        else:
            b_p2 = max(256, 1 << max(B - 1, 0).bit_length())
            lanes = min(score_lanes(EBB8_pre, batch.NB), b_p2)
    # Mosaic DMA slices must be 8-row aligned: round the band window up
    # and extend the shifted-frame arrays accordingly (the extra rows are
    # never live — per-lane last0 < EBB — and the scores window extension
    # follows the same (k - prolog + 1)*64 init formula, so the dataflow
    # is unchanged row-for-row).
    EBB = batch.EBB
    EBB8 = -(-EBB // 8) * 8
    extra = EBB8 - EBB

    def padded(a, fill=0):
        need = lanes * (-(-max(B, 1) // lanes)) - a.shape[-1]
        if need <= 0:
            return a
        widths = [(0, 0)] * (a.ndim - 1) + [(0, need)]
        return np.pad(a, widths, constant_values=fill)

    def pad_rows(a):
        # + 8 rows: the kernel DMAs aligned windows of EBB8 + 8 rows
        return np.pad(a, [(0, extra + 8)] + [(0, 0)] * (a.ndim - 1))

    init_scores = batch.init_scores
    if extra:
        k_ext = np.arange(EBB + 1, EBB8 + 1, dtype=np.int32)[:, None]
        ext = ((k_ext - batch.prolog[None, :] + 1) * 64).astype(np.int32)
        init_scores = np.concatenate([init_scores, ext], axis=0)

    # lane-tile pad fills (one source of truth): inert geometry for the
    # dead lanes — cutoff/nbr at their minima and an empty live range
    # (first0 > last0) so blk_lo = min(first) ignores them
    pad_fills = {"cutoff": 65, "nbr": 1, "first0": EBB8 - 1}
    # pack 4 text chars (values 0..4) per little-endian i32 word: text
    # is the dominant staging upload (4 bytes/char unpacked) and the
    # kernel unpacks with one shift+mask per column
    t8 = np.ascontiguousarray(batch.text.T.astype(np.uint8))
    text_packed = t8.view("<u4").astype(np.int32).T
    args_2d = dict(
        peq_lo=pad_rows(batch.peq_lo), peq_hi=pad_rows(batch.peq_hi),
        lm_lo=pad_rows(batch.lm_lo), lm_hi=pad_rows(batch.lm_hi),
        text=text_packed, init_scores=init_scores,
        cutoff=batch.cutoff, prolog=batch.prolog, nbr=batch.nbr,
        finish_v=batch.finish_v, tfinish=batch.tfinish,
        first0=batch.first0, last0=batch.last0)
    args_2d = {k: padded(v, pad_fills.get(k, 0))
               for k, v in args_2d.items()}
    tiled_np = {k: _tile_lanes(v, lanes) for k, v in args_2d.items()}
    for k, v in list(tiled_np.items()):
        if v.ndim == 2:   # lane vectors
            tiled_np[k] = v[:, None, :]
    tiled = {k: jnp.asarray(v) for k, v in tiled_np.items()}
    # pad the PEQ alphabet axis 5 -> 8 for Mosaic sublane tiling ON
    # DEVICE (a host-side pad would upload 3/8 of the PEQ planes — the
    # dominant staging bytes now that text packs 4 chars/word — as
    # zeros); one-off copy at stage time
    for k in ("peq_lo", "peq_hi"):
        a = tiled[k]
        tiled[k] = jnp.pad(a, [(0, 0), (0, 0), (0, ALPH - a.shape[2]),
                               (0, 0)])
    statics = dict(EBB8=EBB8, EBB=EBB, NB=batch.NB, K=batch.K, B=B,
                   LANES=lanes, FULL=batch.full)
    return tiled, statics


def run_staged(tiled, statics, interpret: bool | None = None):
    """Execute the kernel on staged device args; returns device arrays
    (the output tuple, lane-tiled)."""
    return _pallas_banded(
        tiled["peq_lo"], tiled["peq_hi"], tiled["lm_lo"], tiled["lm_hi"],
        tiled["text"], tiled["init_scores"], tiled["cutoff"],
        tiled["prolog"], tiled["nbr"], tiled["finish_v"],
        tiled["tfinish"], tiled["first0"], tiled["last0"],
        EBB=statics["EBB8"], NB=statics["NB"],
        K=statics["NB"] + statics["EBB8"],
        LANES=statics["LANES"], FULL=statics["FULL"],
        interpret=(not pallas_available()) if interpret is None
        else interpret)


def collect_outputs(out, statics):
    """Untile the kernel outputs back to the (…, B) host layout. The
    full variant's traceback planes stay lane-tiled (they are consumed
    per (tile, lane) by the host traceback — untiling would copy the
    whole matrix)."""
    EBB8, EBB, B, K = (statics["EBB8"], statics["EBB"], statics["B"],
                       statics["K"])
    names = ("scores_by_k", "pv_lo", "pv_hi", "mv_lo", "mv_hi",
             "first", "last")
    # one batched transfer: per-output np.asarray pays a device round
    # trip each, which dominates the collect on high-latency links
    import jax

    host_out = jax.device_get(list(out[:7]))
    res = {}
    for name, arr in zip(names, host_out):
        host = _untile_lanes(arr)
        if name == "scores_by_k":
            host = host[:K + 1]
        elif name in ("first", "last"):
            host = host[0]
        elif host.shape[0] == EBB8:
            host = host[:EBB]
        res[name] = host[..., :B]
    if statics["FULL"]:
        res["mats_tiled"] = jax.device_get(list(out[7:11]))
        res["lanes"] = statics["LANES"]
    return res


def run_banded_pallas(batch: BandedBatch, interpret: bool | None = None):
    """Execute the Pallas kernel; same output dict as
    banded_jax.run_banded (score mode), plus lane-tiled
    (P, T, EBB8, LANES) traceback planes under "mats_tiled" for full
    batches. Lane count is padded to the lane tile."""
    tiled, statics = stage_batch(batch)
    out = run_staged(tiled, statics, interpret)
    return collect_outputs(out, statics)
