"""Parity: the Pallas BandEd score kernel vs the XLA scan kernel.

On CPU this runs the Pallas interpreter (bit-exact semantics of the
Mosaic kernel); on a real TPU the compiled kernel is exercised by
bench/verify runs.
"""

import numpy as np

from quicked_tpu import generate
from quicked_tpu.ops.banded_jax import run_banded
from quicked_tpu.ops.banded_pallas import LANES, run_banded_pallas
from quicked_tpu.ops.batch_prep import prepare_banded_batch


def _pairs(n, length, error, seed, length_diff=1.0):
    return list(generate.generate_pairs(n, length, error=error, seed=seed,
                                        length_diff=length_diff))


def test_pallas_banded_score_parity_interpret():
    pairs = _pairs(6, 200, 0.1, 1) + _pairs(2, 300, 0.15, 2, 1.2)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [max(len(p), len(t)) * 40 // 100 for p, t in pairs]
    batch = prepare_banded_batch(pats, txts, cutoffs, full=False)
    seq = run_banded(batch)
    pal = run_banded_pallas(batch, interpret=True)
    for k in pal:
        np.testing.assert_array_equal(seq[k], pal[k], err_msg=k)


def test_pallas_banded_full_parity_interpret():
    """Full-matrix variant: every stored band column must equal the XLA
    scan's snapshots, and the traceback CIGARs must match the model."""
    pairs = _pairs(5, 200, 0.12, 7) + _pairs(2, 300, 0.2, 8, 1.15)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [max(len(p), len(t)) * 30 // 100 for p, t in pairs]
    batch = prepare_banded_batch(pats, txts, cutoffs, full=True)
    seq = run_banded(batch)
    pal = run_banded_pallas(batch, interpret=True)
    for k in ("scores_by_k", "pv_lo", "pv_hi", "mv_lo", "mv_hi",
              "first", "last"):
        np.testing.assert_array_equal(seq[k], pal[k], err_msg=k)
    # snapshot planes: untile and compare against the scan's matrices
    from quicked_tpu.ops.banded_pallas import _untile_lanes
    lanes = pal["lanes"]
    B, EBB = batch.B, batch.EBB
    for name, tiled in zip(("mat_pv_lo", "mat_pv_hi", "mat_mv_lo",
                            "mat_mv_hi"), pal["mats_tiled"]):
        host = _untile_lanes(tiled)[:, :EBB, :B]
        np.testing.assert_array_equal(seq[name], host, err_msg=name)


def test_pallas_full_traceback_matches_model():
    from quicked_tpu import native
    from quicked_tpu.aligner.batch import _traceback_tiled
    from quicked_tpu.ops import myers_np

    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")
    pairs = _pairs(4, 180, 0.15, 9)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [70] * 4
    batch = prepare_banded_batch(pats, txts, cutoffs, full=True)
    pal = run_banded_pallas(batch, interpret=True)
    sub = list(range(4))
    ops = _traceback_tiled(pal["mats_tiled"], pal["lanes"], batch, sub,
                           pats, txts)
    for i in range(4):
        _, expect = myers_np.banded_align(pats[i], txts[i],
                                          int(cutoffs[i]))
        assert ops[i] == expect


def test_pallas_full_device_traceback_matches_model():
    """The on-device traceback lane (fill + column-scan walk, planes
    never leave the device): scores and CIGARs vs the exact model."""
    from quicked_tpu.aligner.batch import _raw_bytes, _run_device_full_tb
    from quicked_tpu.ops import myers_np

    pairs = _pairs(4, 180, 0.15, 9) + _pairs(2, 120, 0.05, 10, 1.2)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [max(len(p), len(t)) * 30 // 100 for p, t in pairs]
    batch = prepare_banded_batch(pats, txts, cutoffs, full=True)
    praws = [_raw_bytes(p).tobytes() for p in pats]
    traws = [_raw_bytes(t).tobytes() for t in txts]
    sc, ops = _run_device_full_tb(batch, praws, traws, len(pairs))
    for i in range(len(pairs)):
        exp_sc, expect = myers_np.banded_align(pats[i], txts[i],
                                               int(cutoffs[i]))
        assert ops[i] == expect, i
        assert sc[i] == exp_sc, i


def test_pallas_lane_padding():
    # fewer pairs than one lane tile: padding must not disturb results
    assert LANES == 1024
    pairs = _pairs(3, 150, 0.1, 3)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [60] * 3
    batch = prepare_banded_batch(pats, txts, cutoffs, full=False)
    seq = run_banded(batch)
    pal = run_banded_pallas(batch, interpret=True)
    np.testing.assert_array_equal(seq["scores_by_k"], pal["scores_by_k"])


def test_full_lanes_vmem_model():
    """full_lanes: widest tile within VMEM, monotone in EBB8/NB, never
    below the Mosaic lane floor; the short-read geometry gets the wide
    tile (the fixed 256-lane tile starved the VPU, PERFORMANCE.md)."""
    from quicked_tpu.ops.banded_pallas import (LANES_FULL_MIN, VMEM_BUDGET,
                                               full_lanes)

    assert full_lanes(8, 2) == 2048
    assert full_lanes(128, 64) <= 512
    last = 1 << 30
    for ebb8 in (8, 16, 32, 64, 128):
        lanes = full_lanes(ebb8, 16)
        assert LANES_FULL_MIN <= lanes <= 2048
        assert lanes <= last            # monotone non-increasing
        last = lanes
