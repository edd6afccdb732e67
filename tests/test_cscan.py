"""Parity: the carry-map-scan deep-band kernels vs the sequential scan.

banded_cscan_jax resolves each column's inter-block carry chain with an
associative 3-state map scan; banded_cscan_pallas is its Mosaic
implementation (flat (R, 128) block layout, two-tier Hillis-Steele).
Both must match banded_jax.run_banded bit-for-bit.
"""

import numpy as np

from quicked_tpu import generate
from quicked_tpu.ops.banded_jax import run_banded
from quicked_tpu.ops.banded_cscan_jax import run_banded_cscan
from quicked_tpu.ops.banded_cscan_pallas import run_banded_cscan_pallas
from quicked_tpu.ops.batch_prep import prepare_banded_batch

KEYS = ("scores_by_k", "pv_lo", "pv_hi", "mv_lo", "mv_hi", "first",
        "last")


def _batch(n, L, e, cutoff, seed, fins=None, ld=1.0):
    pairs = list(generate.generate_pairs(n, L, error=e, seed=seed,
                                         length_diff=ld))
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    return prepare_banded_batch(pats, txts, [cutoff] * n, full=False,
                                text_finish=fins)


def _assert_same(a, b):
    for k in KEYS:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_cscan_jax_parity():
    for batch in [
        _batch(4, 300, 0.15, 120, 1),
        _batch(2, 1000, 0.2, 300, 2, ld=1.15),
        _batch(1, 4000, 0.25, 4000, 3),     # deep band
    ]:
        _assert_same(run_banded(batch), run_banded_cscan(batch))


def test_cscan_jax_parity_half_pass():
    pairs = list(generate.generate_pairs(2, 2000, error=0.2, seed=5))
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    fins = [len(t) // 2 for _, t in pairs]
    batch = prepare_banded_batch(pats, txts, [600] * 2, full=False,
                                 text_finish=fins)
    _assert_same(run_banded(batch), run_banded_cscan(batch))


def test_cscan_pallas_interpret_parity():
    for batch in [
        _batch(2, 300, 0.15, 120, 7),               # R = 1
        _batch(1, 3000, 0.25, 3000, 8),             # R = 1, EBB 48
        _batch(1, 12000, 0.3, 10000, 9),            # R = 2 (EBB 158)
    ]:
        _assert_same(run_banded(batch),
                     run_banded_cscan_pallas(batch, interpret=True))


def test_cscan_pallas_interpret_half_pass():
    pairs = list(generate.generate_pairs(2, 3000, error=0.2, seed=11))
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    fins = [len(t) // 2 for _, t in pairs]
    batch = prepare_banded_batch(pats, txts, [2000] * 2, full=False,
                                 text_finish=fins)
    _assert_same(run_banded(batch),
                 run_banded_cscan_pallas(batch, interpret=True))
