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
