"""Wavefront banded kernel: anti-diagonal pipelining for long reads.

The pairs-as-lanes kernel (banded_jax.py) is ideal when the batch is
large; for the long-read regime (few pairs, band of hundreds of blocks)
its (B,)-wide ops starve the VPU. This kernel re-expresses the
reference's AVX2 diagonal pipeline (bpm_banded.c:423-616, 8/4-deep) at
depth 64: all 64 columns of a text block are in flight simultaneously,
lane j computing band block i = t - j at wavefront step t, so every op
is (64, B)-wide.

Dataflow per step (bit-exact vs the sequential kernel — identical
dependencies and arithmetic, only reordered across independent cells):
  - Pv/Mv pipeline: lane j consumes the value lane j-1 produced at the
    previous step (same block, previous column); lane 0 consumes the
    stored inter-block band state row t; lane 63 emits the new state.
  - PH/MH carries stay in-lane (same column, previous block), reset to
    (1, 0) when a lane enters its first live block.
  - Raw PEQ/level-mask rows flow down the same pipeline (each lane
    selects Eq by its own text character), so no per-step gathers.
  - Inactive cells (outside [first, last] or past tfinish) pass their
    input through, so band state outside the live band and beyond the
    last processed column is preserved exactly.

Band maintenance every 64 columns reuses banded_jax._maintenance
unchanged. Score-only: this kernel serves the Hirschberg score passes
and the cascade's stage 3 for long pairs; full-traceback fills go
through the pairs-as-lanes kernel's sub-16MB base cases.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from quicked_tpu.ops import u64
from quicked_tpu.ops.banded_jax import _maintenance
from quicked_tpu.ops.batch_prep import BandedBatch

W = 64
U32 = jnp.uint32
I32 = jnp.int32


def _select_eq_rows(chars, peq_lo, peq_hi):
    """Per-lane 5-way PEQ select: peq_* (W, 5, B), chars (W, B)."""
    eq_lo = peq_lo[:, 0]
    eq_hi = peq_hi[:, 0]
    for c in range(1, 5):
        sel = chars == c
        eq_lo = jnp.where(sel, peq_lo[:, c], eq_lo)
        eq_hi = jnp.where(sel, peq_hi[:, c], eq_hi)
    return eq_lo, eq_hi


def _wavefront_block(pv, mv, peq_win, lm_win, scw, tchars, col_active,
                     first, last, EBB):
    """One 64-column text block as EBB+63 wavefront steps.

    pv/mv: (lo, hi) tuples of (EBB, B) inter-block band state.
    peq_win: (lo, hi) of (EBB, 5, B); lm_win: (lo, hi) of (EBB, B).
    tchars: (64, B) i32; col_active: (64, B) bool.
    Returns (pv, mv, srows, captures): updated state, per-row score
    deltas applied to scw[:EBB], and the maintenance captures.
    """
    B = tchars.shape[1]
    STEPS = EBB + W - 1
    lane_j = jax.lax.broadcasted_iota(I32, (W, B), 0)
    zeros = jnp.zeros((W, B), U32)

    def step(carry, t):
        (o_pv_lo, o_pv_hi, o_mv_lo, o_mv_hi, ph, mh,
         p_peq_lo, p_peq_hi, p_lm_lo, p_lm_hi) = carry
        t_c = jnp.minimum(t, EBB - 1)

        # shift pipelines down one lane; inject state/PEQ/mask row t
        def shift_in(pipe, src):
            inj = jax.lax.dynamic_slice(
                src, (t_c,) + (0,) * (src.ndim - 1),
                (1,) + src.shape[1:])
            return jnp.concatenate([inj, pipe[:-1]], axis=0)

        i_pv_lo = shift_in(o_pv_lo, pv[0])
        i_pv_hi = shift_in(o_pv_hi, pv[1])
        i_mv_lo = shift_in(o_mv_lo, mv[0])
        i_mv_hi = shift_in(o_mv_hi, mv[1])
        p_peq_lo = shift_in(p_peq_lo, peq_win[0])
        p_peq_hi = shift_in(p_peq_hi, peq_win[1])
        p_lm_lo = shift_in(p_lm_lo, lm_win[0])
        p_lm_hi = shift_in(p_lm_hi, lm_win[1])

        i_blk = t - lane_j
        active = col_active & (i_blk >= first[None, :]) & \
            (i_blk <= last[None, :])
        is_first = i_blk == first[None, :]
        ph_eff = jnp.where(is_first, jnp.ones((W, B), U32), ph)
        mh_eff = jnp.where(is_first, zeros, mh)

        eq_lo, eq_hi = _select_eq_rows(tchars, p_peq_lo, p_peq_hi)
        npv_lo, npv_hi, nmv_lo, nmv_hi, phout, mhout = u64.advance_block64(
            eq_lo, eq_hi, p_lm_lo, p_lm_hi,
            i_pv_lo, i_pv_hi, i_mv_lo, i_mv_hi, ph_eff, mh_eff)

        o_pv_lo = jnp.where(active, npv_lo, i_pv_lo)
        o_pv_hi = jnp.where(active, npv_hi, i_pv_hi)
        o_mv_lo = jnp.where(active, nmv_lo, i_mv_lo)
        o_mv_hi = jnp.where(active, nmv_hi, i_mv_hi)
        ph = jnp.where(active, phout, ph)
        mh = jnp.where(active, mhout, mh)

        delta = jnp.where(active,
                          phout.astype(I32) - mhout.astype(I32), 0)
        tail = (o_pv_lo[W - 1], o_pv_hi[W - 1],
                o_mv_lo[W - 1], o_mv_hi[W - 1])
        carry_out = (o_pv_lo, o_pv_hi, o_mv_lo, o_mv_hi, ph, mh,
                     p_peq_lo, p_peq_hi, p_lm_lo, p_lm_hi)
        return carry_out, (delta, tail)

    carry0 = (zeros, zeros, zeros, zeros, zeros, zeros,
              jnp.zeros((W, 5, B), U32), jnp.zeros((W, 5, B), U32),
              zeros, zeros)
    _, (deltas, tails) = jax.lax.scan(step, carry0,
                                      jnp.arange(STEPS, dtype=I32))
    # deltas: (STEPS, W, B); row i's total = sum_j deltas[i + j, j]
    idx = (jnp.arange(EBB, dtype=I32)[:, None]
           + jnp.arange(W, dtype=I32)[None, :])          # (EBB, W)
    idx = jnp.broadcast_to(idx[:, :, None], (EBB, W, B))
    row_delta = jnp.take_along_axis(deltas, idx, axis=0).sum(axis=1)

    # new band state: lane 63's outputs at steps 63..63+EBB-1
    new_pv = (tails[0][W - 1:W - 1 + EBB], tails[1][W - 1:W - 1 + EBB])
    new_mv = (tails[2][W - 1:W - 1 + EBB], tails[3][W - 1:W - 1 + EBB])

    srows = scw[:EBB] + row_delta

    def cap(at):
        at_c = jnp.clip(at, 0, EBB - 1)
        return jnp.take_along_axis(srows, at_c[None, :], axis=0)[0]

    captures = (cap(first + 1), cap(last - 1), cap(last))
    return new_pv, new_mv, srows, captures


def wavefront_scan_impl(peq_lo, peq_hi, lm_lo, lm_hi, text, init_scores,
                        cutoff, prolog, nbr, finish_v, tfinish, first0,
                        last0, *, EBB: int, NB: int):
    """Score-only banded scan with the wavefront inner loop. Same
    signature/returns as banded_jax.banded_scan_impl (full=False)."""
    B = text.shape[1]
    batch_consts = (cutoff, prolog, nbr, finish_v, tfinish)
    text_blocks = text.reshape(NB, W, B)

    pv0 = (jnp.full((EBB, B), 0xFFFFFFFF, U32),) * 2
    mv0 = (jnp.zeros((EBB, B), U32),) * 2

    def outer(carry, xs):
        pv, mv, scw, first, last = carry
        nb, tblock = xs
        peq_win = (jax.lax.dynamic_slice(peq_lo, (nb, 0, 0), (EBB, 5, B)),
                   jax.lax.dynamic_slice(peq_hi, (nb, 0, 0), (EBB, 5, B)))
        lm_win = (jax.lax.dynamic_slice(lm_lo, (nb, 0), (EBB, B)),
                  jax.lax.dynamic_slice(lm_hi, (nb, 0), (EBB, B)))
        cols = nb * W + jax.lax.broadcasted_iota(I32, (W, B), 0)
        col_active = cols < tfinish[None, :]
        tchars = tblock  # (W, B)

        pv, mv, srows, captures = _wavefront_block(
            pv, mv, peq_win, lm_win, scw, tchars, col_active,
            first, last, EBB)
        scw = jnp.concatenate([srows, scw[EBB:]], axis=0)
        pv, mv, scw, first, last = _maintenance(
            pv, mv, scw, first, last, captures, nb, batch_consts, EBB,
            full_variant=False)
        dropped = scw[0]
        new_k = nb + 1 + EBB
        new_row = ((new_k - prolog + 1) * W).astype(I32)
        scw = jnp.concatenate([scw[1:], new_row[None, :]], axis=0)
        return (pv, mv, scw, first, last), dropped

    carry0 = (pv0, mv0, init_scores, first0, last0)
    (pv, mv, scw, first, last), dropped = jax.lax.scan(
        outer, carry0, (jnp.arange(NB, dtype=I32), text_blocks))
    scores_by_k = jnp.concatenate([dropped, scw], axis=0)
    return dict(scores_by_k=scores_by_k,
                pv_lo=pv[0], pv_hi=pv[1], mv_lo=mv[0], mv_hi=mv[1],
                first=first, last=last)


_wavefront_scan = partial(jax.jit, static_argnames=("EBB", "NB"))(
    wavefront_scan_impl)


def run_banded_wavefront(batch: BandedBatch):
    """Execute the wavefront score-only kernel for a prepared batch."""
    assert not batch.full, "wavefront kernel is score-only"
    args = [batch.peq_lo, batch.peq_hi, batch.lm_lo, batch.lm_hi,
            batch.text, batch.init_scores, batch.cutoff, batch.prolog,
            batch.nbr, batch.finish_v, batch.tfinish, batch.first0,
            batch.last0]
    out = _wavefront_scan(*[jnp.asarray(a) for a in args],
                          EBB=batch.EBB, NB=batch.NB)
    return jax.device_get(out)  # one batched transfer for the dict
