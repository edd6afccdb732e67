"""Parity: wavefront (anti-diagonal pipelined) banded kernel vs the
sequential pairs-as-lanes kernel — identical outputs bit for bit."""

import numpy as np
import pytest

from quicked_tpu import generate
from quicked_tpu.ops.banded_jax import run_banded
from quicked_tpu.ops.banded_wavefront_jax import run_banded_wavefront
from quicked_tpu.ops.batch_prep import prepare_banded_batch


def _pairs(n, length, error, seed, length_diff=1.0):
    return list(generate.generate_pairs(n, length, error=error, seed=seed,
                                        length_diff=length_diff))


@pytest.mark.parametrize("length,error,seed,ldiff,bw", [
    (200, 0.1, 1, 1.0, 40),
    (500, 0.15, 2, 1.0, 30),
    (300, 0.1, 3, 1.2, 40),
    (1000, 0.1, 4, 1.0, 15),
    (129, 0.2, 5, 0.8, 50),
])
def test_wavefront_equals_sequential(length, error, seed, ldiff, bw):
    pairs = _pairs(4, length, error, seed, length_diff=ldiff)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [max(len(p), len(t)) * bw // 100 for p, t in pairs]
    batch = prepare_banded_batch(pats, txts, cutoffs, full=False,
                                 min_nb=16, min_ebb=16, pad_to_b=8)
    seq = run_banded(batch)
    wav = run_banded_wavefront(batch)
    for k in wav:
        np.testing.assert_array_equal(seq[k], wav[k], err_msg=k)


def test_wavefront_text_finish():
    pairs = _pairs(3, 600, 0.1, 8)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [90] * 3
    fins = [len(t) // 2 for t in txts]
    batch = prepare_banded_batch(pats, txts, cutoffs, full=False,
                                 text_finish=fins, min_nb=16, min_ebb=16,
                                 pad_to_b=8)
    seq = run_banded(batch)
    wav = run_banded_wavefront(batch)
    for k in wav:
        np.testing.assert_array_equal(seq[k], wav[k], err_msg=k)
