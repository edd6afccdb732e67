"""Systolic deep-band model parity (ops/banded_sysband_np.py).

The model must reproduce banded_jax.run_banded bit-exactly on
scores_by_k, first/last, and the in-band pv/mv planes ([first, last] —
the region hirschberg_split reads). Below-first plane content is
shift-history garbage in the sequential kernels and is excluded by
contract (see the module docstring).
"""

import numpy as np
import pytest

from quicked_tpu import generate
from quicked_tpu.ops.batch_prep import prepare_banded_batch
from quicked_tpu.ops.banded_jax import run_banded
from quicked_tpu.ops.banded_sysband_np import run_sysband_pair


def _assert_parity(batch, out, lane=0):
    ref = run_banded(batch)
    np.testing.assert_array_equal(out["scores_by_k"],
                                  ref["scores_by_k"][:, lane])
    assert out["first"] == ref["first"][lane]
    assert out["last"] == ref["last"][lane]
    f, l = int(ref["first"][lane]), int(ref["last"][lane])
    ref_pv = (ref["pv_lo"][:, lane].astype(np.uint64)
              | (ref["pv_hi"][:, lane].astype(np.uint64) << np.uint64(32)))
    ref_mv = (ref["mv_lo"][:, lane].astype(np.uint64)
              | (ref["mv_hi"][:, lane].astype(np.uint64) << np.uint64(32)))
    sl = slice(max(f, 0), min(l + 1, batch.EBB))
    np.testing.assert_array_equal(out["pv64"][sl], ref_pv[sl])
    np.testing.assert_array_equal(out["mv64"][sl], ref_mv[sl])


def _pair(length, seed, error=0.1):
    return list(generate.generate_pairs(1, length, error=error,
                                        seed=seed))[0]


@pytest.mark.parametrize("cutoff", [150, 300])
def test_sysband_basic(cutoff):
    p, t = _pair(2000, 5)
    batch = prepare_banded_batch([p], [t], [cutoff], full=False)
    _assert_parity(batch, run_sysband_pair(batch, 0))


def test_sysband_inverted_prolog():
    # text longer than pattern: first0 > last0, the dec phase opens the
    # band and the top machine runs ahead of the bottom
    p, t = _pair(2000, 5)
    batch = prepare_banded_batch([p[:1500]], [t], [400], full=False)
    _assert_parity(batch, run_sysband_pair(batch, 0))


def test_sysband_text_finish():
    p, t = _pair(2000, 5)
    batch = prepare_banded_batch([p], [t], [300], full=False,
                                 text_finish=[999])
    _assert_parity(batch, run_sysband_pair(batch, 0))


def test_sysband_bucket_padded():
    p, t = _pair(2000, 5)
    batch = prepare_banded_batch([p], [t], [300], full=False,
                                 min_nb=64, min_ebb=16)
    _assert_parity(batch, run_sysband_pair(batch, 0))


def test_sysband_recenter_small_window():
    # a long run with the default window triggers recenters (base > 0)
    # while the multi-chunk skew is in flight
    p, t = _pair(25000, 11)
    batch = prepare_banded_batch([p], [t], [4500], full=False)
    out = run_sysband_pair(batch, 0)
    assert out["base"] > 0, "test meant to exercise recentering"
    _assert_parity(batch, out)


@pytest.mark.slow
def test_sysband_deep_spread():
    # EBB > 130: the bottom machine runs multiple chunks ahead of the
    # top (max_spread > 1) with recenters
    # pattern long relative to the band so the top edge clears the
    # early-recenter threshold before the endgame clamp pins it
    p, t = _pair(50000, 31)
    batch = prepare_banded_batch([p], [t], [10000], full=False)
    out = run_sysband_pair(batch, 0)
    assert out["max_spread"] > 1 and out["base"] > 0
    _assert_parity(batch, out)


def test_init_phase_multiply_shift_exact_to_overflow_bound():
    """The kernel's vector-idiv-free (-k) mod 65 (init phase ring) must
    match exact arithmetic over the whole representable range: m =
    ceil(2^23/65) = 129056 is exact for k < 262144 and k*m stays below
    2^31 for k <= 16639 — the staging assert (NS <= 16512) keeps every
    resident slot index inside that bound. Round 2's (k*2017)>>17 was
    exact only to k < 3971, which capped SYSBAND_MAX_EBB at 3500."""
    import numpy as np

    k = np.arange(16640, dtype=np.int64)
    prod = k * 129056
    assert prod.max() < 2 ** 31          # no i32 overflow in the kernel
    q65 = (k * 129056) >> 23
    np.testing.assert_array_equal(q65, k // 65)
    r65 = k - 65 * q65
    phase = np.where(r65 == 0, 0, 65 - r65)
    np.testing.assert_array_equal(phase, (-k) % 65)
