"""Pallas TPU kernel: systolic (skewed) deep-band BandEd score pass.

Mosaic port of ops/banded_sysband_np.py (the bit-exact step model —
read its docstring for the algorithm): band block-row k runs one column
behind row k-1 in an absolute-row frame, so each step is ONE Myers
advance per resident slot plus a handful of plane shifts — no carry
scan, no per-chunk band shifts, no per-chunk DMA. Band maintenance is
two scalar event machines (bottom edge / top edge) firing on exact step
counts, with single-row masked plane edits.

Layout (one pair per grid row, grid (B, NSEG)):
- Resident slots: flat (R, 128) planes; slot s holds absolute band row
  base + s. base advances by 128 at recenter (one plane-row shift +
  one (ALPH, 128) PEQ-tile DMA).
- PEQ lives in HBM as (B, KT, ALPH, 128) u32 pairs with the LEVEL MASK
  stored at alphabet slot 5 (and 6/7 padding), so the per-recenter
  refill is a single contiguous [b, kt] tile per plane — 8 sublanes,
  satisfying the whole-tile DMA rule.
- Text lives in HBM as (B, TT, 128) i32 tiles with FOUR chars packed
  per word (byte c%4 of word c//4) — quarters the host->device upload
  (the dominant per-call cost on high-latency links) and the entry
  refill DMA count; a (8, 128) VMEM entry buffer feeds the per-step
  chars-cascade entry scalar (masked-reduce word extract + byte
  shift), refilled by DMA when the entry column leaves its
  4096-column window.
- Scalar machines (bottom/top edges, pending edits, rings) live in an
  SMEM scratch vector; first/last rings are SMEM arrays of RING
  entries.

Exactness contract and the rare narrow-band ABORT (host falls back to
the carry-scan kernel) are inherited from the model; the abort flag is
returned per pair.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quicked_tpu.ops.banded_cscan_pallas import (
    flat_shift_down,
    _lane_idx,
    _row_idx,
)
from quicked_tpu.ops import u64
from quicked_tpu.ops.batch_prep import BandedBatch

W = 64
CY = W + 1
LN = 128
ALPH = 8          # 5 letters + level mask at slot 5 + 2 pad
U32 = jnp.uint32
I32 = jnp.int32

# SMEM scalar-state indices
S_BASE, S_NBB, S_FSB, S_NBT, S_LST, S_CL1 = 0, 1, 2, 3, 4, 5
S_BD_T, S_BD_ROW, S_BD_CASE = 6, 7, 8
S_TP_T, S_TP_ROW = 9, 10
S_ABORT, S_ENT = 11, 12
S_N = 16


def _kernel(peq_lo_hbm, peq_hi_hbm, text_hbm,                 # ANY (HBM)
            cutoff_ref, prolog_ref, nbr_ref, finishv_ref,
            tfinish_ref, first0_ref, last0_ref,               # SMEM in
            scores_out, pv_lo_out, pv_hi_out, mv_lo_out, mv_hi_out,
            first_out, last_out, base_out, abort_out,         # out
            pv_lo, pv_hi, mv_lo, mv_hi, srow, chars, pho, mho,
            phase, col, act_bot, act_top, isf,
            slab_lo, slab_hi, ent_buf,
            raw_peq_lo, raw_peq_hi, raw_ent,
            sc, fring, lring, sems,
            *, R: int, EBB: int, NB: int, K: int, DR: int, TT: int,
            KT: int, RING: int, SEG: int, NSEG: int):
    b = pl.program_id(0)
    nseg = pl.program_id(1)
    NS = R * LN
    cutoff = cutoff_ref[0, 0, 0]
    prolog = prolog_ref[0, 0, 0]
    nbr = nbr_ref[0, 0, 0]
    finish_v = finishv_ref[0, 0, 0]
    tfinish = tfinish_ref[0, 0, 0]
    first0 = first0_ref[0, 0, 0]
    last0 = last0_ref[0, 0, 0]
    tf64 = tfinish // W

    blk = _row_idx((R, LN)) * LN + _lane_idx((R, LN))   # slot index plane
    erow = _row_idx((8, LN))
    elane = _lane_idx((8, LN))
    drow = _row_idx((DR, LN))

    def fetch_ent(tile8):
        """DMA packed-text tiles [tile8, tile8+8) into the entry buffer
        (each (8, 128) tile holds 4096 chars, 4 per i32 word)."""
        t8 = pl.multiple_of(8 * (tile8 // 8), 8)
        cp = pltpu.make_async_copy(
            text_hbm.at[b, pl.ds(t8, 8)], raw_ent, sems.at[2])
        cp.start()
        cp.wait()
        ent_buf[:] = raw_ent[:]

    def fetch_peq_row(kt):
        """DMA PEQ tile kt ((ALPH,128) lo/hi) into the slabs' top row."""
        cps = [pltpu.make_async_copy(peq_lo_hbm.at[b, kt], raw_peq_lo,
                                     sems.at[0]),
               pltpu.make_async_copy(peq_hi_hbm.at[b, kt], raw_peq_hi,
                                     sems.at[1])]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()

    @pl.when(nseg == 0)
    def _init():
        k0 = blk                      # base = 0: absolute row == slot
        pv_lo[:] = jnp.full((R, LN), 0xFFFFFFFF, U32)
        pv_hi[:] = jnp.full((R, LN), 0xFFFFFFFF, U32)
        mv_lo[:] = jnp.zeros((R, LN), U32)
        mv_hi[:] = jnp.zeros((R, LN), U32)
        srow[:] = (k0 - prolog + 1) * W
        pho[:] = jnp.zeros((R, LN), U32)
        mho[:] = jnp.zeros((R, LN), U32)
        # (-k) mod 65 without vector idiv: k//65 via multiply-shift.
        # m = ceil(2^23/65) = 129056, e = 65m - 2^23 = 32: exact for
        # k < 2^23/e = 262144, and k*m stays below 2^31 for k <= 16639
        # (the staging assert bounds NS accordingly). Round 2 used
        # (k*2017)>>17, exact only to k < 3971, which capped EBB at
        # 3500 and sent 1.5 Mbp+ pairs to the carry-scan fallback.
        q65 = (k0 * 129056) >> 23
        r65 = k0 - CY * q65
        phase[:] = jnp.where(r65 == 0, 0, CY - r65)
        col[:] = -k0
        act_bot[:] = (k0 >= first0).astype(U32)
        act_top[:] = (k0 <= last0).astype(U32)
        isf[:] = (k0 == first0).astype(U32)
        sc[S_BASE] = 0
        sc[S_NBB] = 0
        sc[S_FSB] = first0
        sc[S_NBT] = 0
        sc[S_LST] = last0
        sc[S_CL1] = 0
        sc[S_BD_T] = -10
        sc[S_BD_ROW] = 0
        sc[S_BD_CASE] = 0
        sc[S_TP_T] = -10
        sc[S_TP_ROW] = 0
        sc[S_ABORT] = 0
        sc[S_ENT] = 0
        # rings are indexed by nb % RING; entry 0 is chunk 0
        fring[0] = first0
        lring[0] = last0
        fetch_ent(0)
        # initial PEQ window: tiles 0..R-1
        for r in range(R):
            fetch_peq_row(r)
            m = _row_idx((ALPH, R, LN)) == r
            slab_lo[:] = jnp.where(m, raw_peq_lo[:][:, None, :], slab_lo[:])
            slab_hi[:] = jnp.where(m, raw_peq_hi[:][:, None, :], slab_hi[:])
        # chars slot 0 must hold text[0] at t = 0 (byte 0 of word 0)
        e0 = jnp.sum(jnp.where((erow == 0) & (elane == 0),
                               ent_buf[:], 0)) & 0xFF
        chars[:] = jnp.where(blk == 0, e0, jnp.zeros((R, LN), I32))

    def row_sel(target_slot, plane_val, ref):
        """ref := plane_val at slot target_slot (single-slot masked)."""
        ref[:] = jnp.where(blk == target_slot, plane_val, ref[:])

    def read_srow(slot):
        """Scalar read of srow[slot] via masked reduction."""
        return jnp.sum(jnp.where(blk == slot, srow[:], 0))

    def step(j, _):
        t = nseg * SEG + j
        base = sc[S_BASE]

        # ---- pending mask edits scheduled for this step ----
        bd_t = sc[S_BD_T]
        bd_row = sc[S_BD_ROW]
        bd_case = sc[S_BD_CASE]

        @pl.when((t == bd_t + 1) & (bd_case >= 1))
        def _bd1():
            m = blk == bd_row - base
            act_bot[:] = jnp.where(m, jnp.uint32(0), act_bot[:])
            isf[:] = jnp.where(m, jnp.uint32(0), isf[:])

        @pl.when(t == bd_t + 2)
        def _bd2():
            m = blk == bd_row + 1 - base

            @pl.when(bd_case == 1)
            def _set():
                isf[:] = jnp.where(m, jnp.uint32(1), isf[:])

            @pl.when(bd_case == 2)
            def _clr():
                act_bot[:] = jnp.where(m, jnp.uint32(0), act_bot[:])
                isf[:] = jnp.where(m, jnp.uint32(0), isf[:])

        @pl.when((t == bd_t + 3) & (bd_case == 2))
        def _bd3():
            m = blk == bd_row + 2 - base
            isf[:] = jnp.where(m, jnp.uint32(1), isf[:])

        @pl.when(t == sc[S_TP_T])
        def _tp():
            m = blk == sc[S_TP_ROW] - base
            act_top[:] = jnp.where(m, jnp.uint32(1), act_top[:])

        # ---- advance ----
        bubble = phase[:] == W
        advancing = (~bubble) & (col[:] >= 0) & (col[:] < tfinish)
        ch = chars[:]
        eq_lo = slab_lo[0]
        eq_hi = slab_hi[0]
        for a in range(1, 5):
            sel = ch == a
            eq_lo = jnp.where(sel, slab_lo[a], eq_lo)
            eq_hi = jnp.where(sel, slab_hi[a], eq_hi)
        lm_lo = slab_lo[5]
        lm_hi = slab_hi[5]
        hin_p = flat_shift_down(pho[:], 1, jnp.uint32(0))
        hin_m = flat_shift_down(mho[:], 1, jnp.uint32(0))
        isfm = isf[:] != 0
        phin = jnp.where(isfm, jnp.uint32(1), hin_p)
        mhin = jnp.where(isfm, jnp.uint32(0), hin_m)
        npv_lo, npv_hi, nmv_lo, nmv_hi, phout, mhout = u64.advance_block64(
            eq_lo, eq_hi, lm_lo, lm_hi,
            pv_lo[:], pv_hi[:], mv_lo[:], mv_hi[:], phin, mhin)
        wr = advancing & (act_bot[:] != 0) & (act_top[:] != 0)
        pv_lo[:] = jnp.where(wr, npv_lo, pv_lo[:])
        pv_hi[:] = jnp.where(wr, npv_hi, pv_hi[:])
        mv_lo[:] = jnp.where(wr, nmv_lo, mv_lo[:])
        mv_hi[:] = jnp.where(wr, nmv_hi, mv_hi[:])
        srow[:] = srow[:] + jnp.where(
            wr, phout.astype(I32) - mhout.astype(I32), 0)
        pho[:] = phout
        mho[:] = mhout

        # ---- bottom machine: E1(nbB) ----
        nbB = sc[S_NBB]
        fsB = sc[S_FSB]

        @pl.when((nbB < NB) & (t == 66 * nbB + fsB + 64))
        def _e1():
            nbT = sc[S_NBT]
            lsT = sc[S_LST]
            faB = nbB + fsB
            ds_b = (nbB + 1) * W <= tfinish
            exact = nbB <= nbT
            last_b = lring[nbB % RING]          # valid when exact
            lb = lsT - (nbB - nbT)
            b_true = jnp.where(exact, fsB + 2 < last_b, fsB + 2 < lb)
            b_false = jnp.where(exact, ~(fsB + 2 < last_b),
                                fsB + 2 >= lsT)
            ambiguous = (~b_true) & (~b_false)

            @pl.when(ds_b & ambiguous)
            def _ab():
                sc[S_ABORT] = 1

            c_first1 = read_srow(faB + 1 - sc[S_BASE])
            a_pred = (finish_v > W * (fsB + 1)) & \
                ((c_first1 + (finish_v - W * (fsB + 1))) > cutoff)
            cut_lower = a_pred & b_true
            inc = ds_b & cut_lower & (nbB >= prolog)
            dec = ds_b & (~cut_lower) & (nbB < prolog)
            new_fs = fsB + inc.astype(I32) - dec.astype(I32)
            delta_abs = 1 + new_fs - fsB

            @pl.when(ds_b)
            def _sched():
                sc[S_BD_T] = t
                sc[S_BD_ROW] = faB
                sc[S_BD_CASE] = delta_abs

            fring[(nbB + 1) % RING] = new_fs
            sc[S_NBB] = nbB + 1
            sc[S_FSB] = new_fs

        # ---- top machine: c_last1 capture + E2(nbT) ----
        nbT = sc[S_NBT]
        lsT = sc[S_LST]

        @pl.when((nbT < NB) & (t == 66 * nbT + lsT + 62))
        def _cl1():
            laT = nbT + lsT
            ds_t = (nbT + 1) * W <= tfinish
            # mask: first(nbT) <= lsT - 1 (3-way; ambiguity -> abort)
            nbB_ = sc[S_NBB]
            fsB_ = sc[S_FSB]
            exact = nbT <= nbB_
            f_ex = fring[nbT % RING]
            dist = nbT - nbB_
            m_true = jnp.where(exact, f_ex <= lsT - 1,
                               fsB_ + dist <= lsT - 1)
            m_false = jnp.where(exact, f_ex > lsT - 1,
                                fsB_ - dist > lsT - 1)

            @pl.when(ds_t & (~m_true) & (~m_false))
            def _ab():
                sc[S_ABORT] = 1

            v = read_srow(laT - 1 - sc[S_BASE])
            sc[S_CL1] = jnp.where(ds_t & m_true, v, 0)

        @pl.when((nbT < NB) & (t == 66 * nbT + lsT + 63))
        def _e2():
            laT = nbT + lsT
            ds_t = (nbT + 1) * W <= tfinish
            nbB_ = sc[S_NBB]
            fsB_ = sc[S_FSB]

            def f_cmp3(thr, nb_q):
                exact = nb_q <= nbB_
                f_ex = fring[jnp.where(exact, nb_q % RING, 0)]
                dist = nb_q - nbB_
                tt = jnp.where(exact, f_ex <= thr, fsB_ + dist <= thr)
                ff = jnp.where(exact, f_ex > thr, fsB_ - dist > thr)
                return tt, ff

            m_t, m_f = f_cmp3(lsT, nbT)
            bt_t, bt_f = f_cmp3(lsT - 3, nbT + 1)

            @pl.when(ds_t & (((~m_t) & (~m_f)) | ((~bt_t) & (~bt_f))))
            def _ab():
                sc[S_ABORT] = 1

            base_ = sc[S_BASE]
            c_last = jnp.where(ds_t & m_t,
                               read_srow(laT - base_), 0)
            cut_higher = bt_t & (W * (lsT - 1) > finish_v) & \
                ((sc[S_CL1] + (W * (lsT - 1) - finish_v)) > cutoff)
            clamp = (nbT - prolog + lsT) >= nbr

            @pl.when(ds_t & (laT + 1 - base_ >= NS))
            def _ab2():
                sc[S_ABORT] = 1

            @pl.when(ds_t)
            def _w():
                row_sel(laT + 1 - base_, c_last + W, srow)

            new_ls = lsT - (ds_t & (cut_higher | clamp)).astype(I32)

            @pl.when(ds_t & (new_ls == lsT))
            def _act():
                sc[S_TP_T] = t + 3
                sc[S_TP_ROW] = laT + 1

            lring[(nbT + 1) % RING] = new_ls
            sc[S_NBT] = nbT + 1
            sc[S_LST] = new_ls

        # ---- cascades + clocks (state for step t+1) ----
        base_now = sc[S_BASE]
        u0 = t + 1 - base_now
        c0 = W * (u0 // CY) + jnp.minimum(u0 % CY, W - 1)
        c0 = jnp.clip(c0, 0, NB * W - 1)

        # entry-buffer refill when c0 leaves the current 4096-col window
        # (packed: word c0//4 holds chars 4w..4w+3 in its bytes)
        c4 = c0 // 4
        tile8 = 8 * ((c4 // LN) // 8)

        @pl.when(tile8 != sc[S_ENT])
        def _refill():
            fetch_ent(jnp.clip(tile8, 0, TT - 8))
            sc[S_ENT] = tile8

        er = (c4 // LN) - sc[S_ENT]
        el = c4 % LN
        word = jnp.sum(jnp.where((erow == er) & (elane == el),
                                 ent_buf[:], 0))
        entry = (word >> (8 * (c0 % 4))) & 0xFF
        chars[:] = jnp.where(blk == 0, entry,
                             flat_shift_down(chars[:], 1, 0))
        col_now = col[:]
        ph_now = phase[:]
        col[:] = col_now + ((ph_now != W) | (col_now < 0)).astype(I32)
        phase[:] = jnp.where(ph_now == W, 0, ph_now + 1)

        # ---- recenter ----
        nbT_ = sc[S_NBT]
        lsT_ = sc[S_LST]
        nbB_ = sc[S_NBB]
        nb_floor = jnp.minimum(nbB_, nbT_)
        # nb_floor <= nbB always and fring[nb] is live for every nb in
        # (nb_floor - RING, nbB] (spread < RING) — mirror the model's
        # first_ring[nb_floor] exactly
        f_floor = fring[nb_floor % RING]
        laT1 = nbT_ + lsT_ + 1
        trig = (laT1 - base_now >= NS - 1 - LN) & \
            (base_now + LN <= tf64) & \
            (nb_floor + f_floor > base_now + LN - 1)

        @pl.when(trig & (laT1 - base_now > NS - 1 - LN))
        def _ab3():
            sc[S_ABORT] = 1

        @pl.when(trig)
        def _recenter():
            # flush the dropped slab: rows [base, base+128) = srow row 0
            dr = base_now // LN
            bot = jnp.sum(jnp.where(_row_idx((R, LN)) == 0, srow[:], 0),
                          axis=0, keepdims=True)      # (1, LN)
            scores_out[0] = jnp.where(drow == dr, bot, scores_out[0])
            new_base = base_now + LN
            k_new = new_base + (R - 1) * LN + _lane_idx((1, LN))
            # clocks of the fresh top row: the local clock is
            # u_new = t + 1 - k_new directly (the model's seed), and
            # phase/col derive from the current top row (absolute rows
            # differ by exactly 128 local steps) — no vector idiv:
            #   phase_new = (phase_top - 128) mod 65 = (phase_top+2)%65
            #   col_new = col_top - 128 + bb with col(u) = u - u//65 and
            #   bb = count of multiples of 65 in (u_new, u_top] = 1 iff
            #   phase_top in {63, 64} else 2 (u_new >= 0; else col=u_new)
            def top_row(ref):
                return jnp.sum(
                    jnp.where(_row_idx((R, LN)) == R - 1, ref[:], 0),
                    axis=0, keepdims=True)

            ph_top = top_row(phase)
            col_top = top_row(col)
            u_new = t + 1 - k_new
            ph_new = ph_top + 2
            ph_new = jnp.where(ph_new >= CY, ph_new - CY, ph_new)
            bb = jnp.where((ph_top == 63) | (ph_top == W), 1, 2)
            col_new = jnp.where(u_new < 0, u_new, col_top - LN + bb)

            def shift_plane(ref, new_row):
                x = ref[:]
                ref[:] = jnp.concatenate([x[1:], new_row], axis=0)

            shift_plane(pv_lo, jnp.full((1, LN), 0xFFFFFFFF, U32))
            shift_plane(pv_hi, jnp.full((1, LN), 0xFFFFFFFF, U32))
            shift_plane(mv_lo, jnp.zeros((1, LN), U32))
            shift_plane(mv_hi, jnp.zeros((1, LN), U32))
            shift_plane(srow, (k_new - prolog + 1) * W)
            shift_plane(chars, jnp.zeros((1, LN), I32))
            shift_plane(pho, jnp.zeros((1, LN), U32))
            shift_plane(mho, jnp.zeros((1, LN), U32))
            shift_plane(phase, ph_new)
            shift_plane(col, col_new)
            shift_plane(act_bot, jnp.ones((1, LN), U32))
            shift_plane(act_top, jnp.zeros((1, LN), U32))
            shift_plane(isf, jnp.zeros((1, LN), U32))
            # PEQ slabs: roll rows down one, fetch tile new_base/128+R-1
            fetch_peq_row(jnp.clip(new_base // LN + R - 1, 0, KT - 1))
            sl = slab_lo[:]
            sh = slab_hi[:]
            top = _row_idx((ALPH, R, LN)) == R - 1
            slab_lo[:] = jnp.where(
                top, raw_peq_lo[:][:, None, :],
                jnp.concatenate([sl[:, 1:], sl[:, :1]], axis=1))
            slab_hi[:] = jnp.where(
                top, raw_peq_hi[:][:, None, :],
                jnp.concatenate([sh[:, 1:], sh[:, :1]], axis=1))
            sc[S_BASE] = new_base

        return 0

    jax.lax.fori_loop(0, SEG, step, 0)

    @pl.when(nseg == NSEG - 1)
    def _finish():
        base = sc[S_BASE]
        # flush every resident row into the scores plane
        for r in range(R):
            rowv = jnp.sum(
                jnp.where(_row_idx((R, LN)) == r, srow[:], 0),
                axis=0, keepdims=True)
            scores_out[0] = jnp.where(drow == base // LN + r, rowv,
                                      scores_out[0])
        pv_lo_out[0] = pv_lo[:]
        pv_hi_out[0] = pv_hi[:]
        mv_lo_out[0] = mv_lo[:]
        mv_hi_out[0] = mv_hi[:]
        first_out[0, 0, 0] = sc[S_FSB]
        last_out[0, 0, 0] = sc[S_LST]
        base_out[0, 0, 0] = base
        abort_out[0, 0, 0] = sc[S_ABORT]


@partial(jax.jit, static_argnames=("R", "EBB", "NB", "K", "DR", "TT",
                                   "KT", "RING", "SEG", "NSEG",
                                   "interpret"))
def _pallas_sysband(peq_lo, peq_hi, text_t, cutoff, prolog, nbr,
                    finish_v, tfinish, first0, last0,
                    *, R: int, EBB: int, NB: int, K: int, DR: int,
                    TT: int, KT: int, RING: int, SEG: int, NSEG: int,
                    interpret: bool = False):
    B = cutoff.shape[0]
    grid = (B, NSEG)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    smem = pl.BlockSpec((1, 1, 1), lambda b, s: (b, 0, 0),
                        memory_space=pltpu.SMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((B, DR, LN), jnp.int32),        # scores
        jax.ShapeDtypeStruct((B, R, LN), jnp.uint32),        # pv_lo
        jax.ShapeDtypeStruct((B, R, LN), jnp.uint32),
        jax.ShapeDtypeStruct((B, R, LN), jnp.uint32),
        jax.ShapeDtypeStruct((B, R, LN), jnp.uint32),
        jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),          # first
        jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),          # last
        jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),          # base
        jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),          # abort
    )
    vout = lambda shp: pl.BlockSpec((1,) + shp, lambda b, s: (b, 0, 0),
                                    memory_space=pltpu.VMEM)
    out_specs = (
        vout((DR, LN)),
        vout((R, LN)), vout((R, LN)), vout((R, LN)), vout((R, LN)),
        smem, smem, smem, smem,
    )
    return pl.pallas_call(
        partial(_kernel, R=R, EBB=EBB, NB=NB, K=K, DR=DR, TT=TT, KT=KT,
                RING=RING, SEG=SEG, NSEG=NSEG),
        grid=grid,
        interpret=interpret,
        in_specs=[hbm, hbm, hbm,
                  smem, smem, smem, smem, smem, smem, smem],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((R, LN), jnp.uint32),    # pv_lo
            pltpu.VMEM((R, LN), jnp.uint32),
            pltpu.VMEM((R, LN), jnp.uint32),
            pltpu.VMEM((R, LN), jnp.uint32),
            pltpu.VMEM((R, LN), jnp.int32),     # srow
            pltpu.VMEM((R, LN), jnp.int32),     # chars
            pltpu.VMEM((R, LN), jnp.uint32),    # pho
            pltpu.VMEM((R, LN), jnp.uint32),    # mho
            pltpu.VMEM((R, LN), jnp.int32),     # phase
            pltpu.VMEM((R, LN), jnp.int32),     # col
            pltpu.VMEM((R, LN), jnp.uint32),    # act_bot
            pltpu.VMEM((R, LN), jnp.uint32),    # act_top
            pltpu.VMEM((R, LN), jnp.uint32),    # isf
            pltpu.VMEM((ALPH, R, LN), jnp.uint32),   # slab_lo
            pltpu.VMEM((ALPH, R, LN), jnp.uint32),   # slab_hi
            pltpu.VMEM((8, LN), jnp.int32),     # ent_buf
            pltpu.VMEM((ALPH, LN), jnp.uint32),  # raw peq lo
            pltpu.VMEM((ALPH, LN), jnp.uint32),  # raw peq hi
            pltpu.VMEM((8, LN), jnp.int32),     # raw ent
            pltpu.SMEM((S_N,), jnp.int32),      # scalar state
            pltpu.SMEM((RING,), jnp.int32),     # first ring
            pltpu.SMEM((RING,), jnp.int32),     # last ring
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )(peq_lo, peq_hi, text_t, cutoff, prolog, nbr, finish_v, tfinish,
      first0, last0)


def stage_sysband_batch(batch: BandedBatch):
    """Host prep: PEQ+level-mask tiles (lm at alphabet slot 5), text
    tiles, per-pair scalars, and the static geometry."""
    from quicked_tpu.ops.banded_sysband_np import resident_rows, total_steps

    B, EBB, NB, K = batch.B, batch.EBB, batch.NB, batch.K
    R = resident_rows(EBB)
    NS = R * LN
    # the init-phase multiply-shift (k*129056)>>23 needs k*m < 2^31,
    # i.e. k <= 16639 (exactness itself holds to 262144)
    assert NS <= 16512, f"sysband resident window too deep (NS={NS})"
    KT = -(-(K + 1) // LN) + R + 2
    DR = -(-(K + 1) // LN) + R + 1
    # text tiles hold 4 packed chars per i32 word
    n_words = -(-(NB * W) // 4)
    TT = max(-(-n_words // LN) // 8 * 8 + 8, 8)
    RING = 1 << max(int(np.ceil(np.log2(NS // CY + 8))), 4)
    T_end = total_steps(NB, NS)
    SEG = 512
    NSEG = -(-T_end // SEG)

    # (K, 5, B) -> (B, KT, ALPH, 128) with lm at slot 5
    def tile(src_peq, src_lm, fill_peq, fill_lm):
        arr = np.full((B, KT * LN, ALPH), fill_peq, dtype=np.uint32)
        arr[:, :, 5] = fill_lm
        arr[:, :, 6:] = 0
        m = min(K, KT * LN)
        arr[:, :m, :5] = np.transpose(src_peq, (2, 0, 1))[:, :m, :]
        arr[:, :m, 5] = src_lm[:m].T
        return np.ascontiguousarray(
            arr.reshape(B, KT, LN, ALPH).transpose(0, 1, 3, 2))

    peq_lo = tile(batch.peq_lo, batch.lm_lo, 0xFFFFFFFF, 0)
    peq_hi = tile(batch.peq_hi, batch.lm_hi, 0xFFFFFFFF, 0x80000000)

    # pack 4 chars (values 0..4) into each little-endian i32 word
    flat8 = np.zeros((B, TT * LN * 4), dtype=np.uint8)
    flat8[:, :NB * W] = batch.text.T.astype(np.uint8)
    text_t = flat8.view("<u4").astype(np.int32).reshape(B, TT, LN)

    def col(v):
        return jnp.asarray(np.asarray(v, dtype=np.int32).reshape(B, 1, 1))

    args = dict(
        peq_lo=jnp.asarray(peq_lo), peq_hi=jnp.asarray(peq_hi),
        text_t=jnp.asarray(text_t),
        cutoff=col(batch.cutoff), prolog=col(batch.prolog),
        nbr=col(batch.nbr), finish_v=col(batch.finish_v),
        tfinish=col(batch.tfinish), first0=col(batch.first0),
        last0=col(batch.last0))
    statics = dict(R=R, EBB=EBB, NB=NB, K=K, DR=DR, TT=TT, KT=KT,
                   RING=RING, SEG=SEG, NSEG=NSEG)
    return args, statics


def collect_sysband(out, batch: BandedBatch, statics):
    """Assemble kernel outputs into run_banded's score-only dict.
    Returns (dict, aborted_lanes boolean array)."""
    R, DR, NB, K = (statics["R"], statics["DR"], statics["NB"],
                    statics["K"])
    B, EBB = batch.B, batch.EBB
    # one batched transfer: per-output np.asarray costs a tunnel round
    # trip each (9x ~30 ms dominates the collect on high-latency links)
    (scores_p, pv_lo_p, pv_hi_p, mv_lo_p, mv_hi_p,
     first, last, base, abort) = jax.device_get(list(out))
    base = base.reshape(B)
    tf64 = batch.tfinish.astype(np.int64) // W
    prolog = batch.prolog.astype(np.int64)

    k_idx = np.arange(K + 1, dtype=np.int64)
    formula = ((k_idx[:, None] - prolog[None, :] + 1) * W).astype(np.int64)
    flat_scores = scores_p.reshape(B, DR * LN)[:, :K + 1].T.astype(np.int64)
    resident_hi = base[None, :] + R * LN
    scores_by_k = np.where(k_idx[:, None] < resident_hi,
                           flat_scores, formula).astype(np.int32)

    # pv/mv: final shifted slot i reads absolute row tf64 + i
    rows = np.arange(EBB, dtype=np.int64)[:, None] + tf64[None, :]
    sidx = rows - base[None, :]
    ok = (sidx >= 0) & (sidx < R * LN)
    sidx_c = np.clip(sidx, 0, R * LN - 1)

    def gather(p, fill):
        flatp = p.reshape(B, R * LN)
        v = np.take_along_axis(flatp, sidx_c.T.astype(np.int64), axis=1).T
        return np.where(ok, v, fill).astype(np.uint32)

    return dict(
        scores_by_k=scores_by_k,
        pv_lo=gather(pv_lo_p, 0xFFFFFFFF),
        pv_hi=gather(pv_hi_p, 0xFFFFFFFF),
        mv_lo=gather(mv_lo_p, 0),
        mv_hi=gather(mv_hi_p, 0),
        first=first.reshape(B).astype(np.int32),
        last=last.reshape(B).astype(np.int32),
    ), abort.reshape(B) != 0


def run_banded_sysband_pallas(batch: BandedBatch,
                              interpret: bool | None = None):
    """Execute the systolic deep-band kernel; falls back to the
    carry-scan kernel for lanes that abort (narrow-band ambiguity).
    Same output dict as banded_jax.run_banded (full=False), with the
    model's pv/mv contract (exact on [first, last])."""
    assert not batch.full, "systolic kernel is score-only"
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    args, statics = stage_sysband_batch(batch)
    out = _pallas_sysband(
        args["peq_lo"], args["peq_hi"], args["text_t"], args["cutoff"],
        args["prolog"], args["nbr"], args["finish_v"], args["tfinish"],
        args["first0"], args["last0"], interpret=interpret, **statics)
    res, aborted = collect_sysband(out, batch, statics)
    if aborted.any():
        # Whole-batch fallback: aborts are rare (no generator input
        # found triggers one) and this regime's batches are small
        # (CSCAN_MAX_B lanes), so a lane-sliced sub-batch isn't worth
        # the staging complexity.
        from quicked_tpu.ops.banded_cscan_pallas import (
            run_banded_cscan_pallas,
        )
        fb = run_banded_cscan_pallas(batch, interpret=interpret)
        for k in ("scores_by_k", "pv_lo", "pv_hi", "mv_lo", "mv_hi"):
            res[k][:, aborted] = fb[k][:, aborted]
        res["first"][aborted] = fb["first"][aborted]
        res["last"][aborted] = fb["last"][aborted]
    return res
