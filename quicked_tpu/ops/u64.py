"""64-bit word emulation on 32-bit lanes (TPU-native).

The reference's Myers blocks are 64-bit words (bpm_commons.h:31-36). TPU
VPU lanes are 32-bit, so every 64-bit word is carried as an (lo, hi) pair
of uint32 arrays. All helpers are shape-polymorphic pure jnp functions and
work identically inside Pallas kernels and in plain XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32
ONES = jnp.uint32(0xFFFFFFFF)


def ones_like(x):
    return jnp.full_like(x, ONES)


def add64(alo, ahi, blo, bhi):
    """64-bit add with carry between the halves (wrapping)."""
    slo = alo + blo
    carry = (slo < alo).astype(U32)
    shi = ahi + bhi + carry
    return slo, shi


def advance_block64(eq_lo, eq_hi, mask_lo, mask_hi,
                    pv_lo, pv_hi, mv_lo, mv_hi, phin, mhin):
    """Myers advance-block on emulated 64-bit words
    (BPM_ADVANCE_BLOCK, bpm_commons.h:49-68).

    phin/mhin are 0/1 uint32 carries entering bit 0.
    Returns (pv_lo, pv_hi, mv_lo, mv_hi, phout, mhout).
    """
    xv_lo = eq_lo | mv_lo
    xv_hi = eq_hi | mv_hi
    _eq_lo = eq_lo | mhin
    _eq_hi = eq_hi
    t_lo = _eq_lo & pv_lo
    t_hi = _eq_hi & pv_hi
    s_lo, s_hi = add64(t_lo, t_hi, pv_lo, pv_hi)
    xh_lo = (s_lo ^ pv_lo) | _eq_lo
    xh_hi = (s_hi ^ pv_hi) | _eq_hi
    ph_lo = mv_lo | ~(xh_lo | pv_lo)
    ph_hi = mv_hi | ~(xh_hi | pv_hi)
    mh_lo = pv_lo & xh_lo
    mh_hi = pv_hi & xh_hi
    phout = (((ph_lo & mask_lo) | (ph_hi & mask_hi)) != 0).astype(U32)
    mhout = (((mh_lo & mask_lo) | (mh_hi & mask_hi)) != 0).astype(U32)
    # 64-bit shift left by one with carry-in
    ph_hi = (ph_hi << 1) | (ph_lo >> 31)
    ph_lo = (ph_lo << 1) | phin
    mh_hi = (mh_hi << 1) | (mh_lo >> 31)
    mh_lo = (mh_lo << 1) | mhin
    pv_lo_n = mh_lo | ~(xv_lo | ph_lo)
    pv_hi_n = mh_hi | ~(xv_hi | ph_hi)
    mv_lo_n = ph_lo & xv_lo
    mv_hi_n = ph_hi & xv_hi
    return pv_lo_n, pv_hi_n, mv_lo_n, mv_hi_n, phout, mhout


def select_eq(char_enc, peq_block_lo, peq_block_hi):
    """Per-lane 5-way PEQ select: peq_block_* have a leading alphabet axis
    of size 5; char_enc is an int32 lane vector."""
    eq_lo = peq_block_lo[0]
    eq_hi = peq_block_hi[0]
    for c in range(1, 5):
        sel = char_enc == c
        eq_lo = jnp.where(sel, peq_block_lo[c], eq_lo)
        eq_hi = jnp.where(sel, peq_block_hi[c], eq_hi)
    return eq_lo, eq_hi
