"""Sharded-execution tests on a virtual 8-device CPU mesh: shard
equivalence (N-device result == 1-device result, bit-exact) and the
driver entry points."""

import numpy as np

from quicked_tpu import generate
from quicked_tpu.ops.banded_jax import run_banded
from quicked_tpu.ops.batch_prep import prepare_banded_batch
from quicked_tpu.ops.windowed_jax import prepare_windowed_batch, run_windowed_score
from quicked_tpu.parallel.mesh import (
    make_mesh,
    run_banded_sharded,
    run_windowed_sharded,
)


def _pairs(n, length, error, seed):
    return list(generate.generate_pairs(n, length, error=error, seed=seed))


def test_banded_sharded_equals_single():
    pairs = _pairs(16, 200, 0.1, 1)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [max(len(p), len(t)) * 40 // 100 for p, t in pairs]
    batch = prepare_banded_batch(pats, txts, cutoffs, full=False,
                                 pad_to_b=16)
    single = run_banded(batch)
    mesh = make_mesh(8)
    sharded = run_banded_sharded(batch, mesh)
    for k in single:
        np.testing.assert_array_equal(single[k], sharded[k], err_msg=k)


def test_banded_sharded_non_divisible_lanes():
    # B=10 on 8 devices: shard_lanes pads internally, and the outputs
    # come back stripped to the caller's lane count, bit-exact
    pairs = _pairs(10, 180, 0.1, 3)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [max(len(p), len(t)) * 40 // 100 for p, t in pairs]
    batch = prepare_banded_batch(pats, txts, cutoffs, full=False)
    single = run_banded(batch)
    sharded = run_banded_sharded(batch, make_mesh(8))
    for k in single:
        assert np.asarray(sharded[k]).shape == np.asarray(single[k]).shape
        np.testing.assert_array_equal(single[k], sharded[k], err_msg=k)


def test_windowed_sharded_equals_single():
    pairs = _pairs(16, 250, 0.12, 2)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    batch = prepare_windowed_batch(pats, txts, window_size=2, pad_to_b=16)
    s1, h1 = run_windowed_score(batch, 40, 2, 1)
    mesh = make_mesh(8)
    s2, h2 = run_windowed_sharded(batch, 40, 2, 1, mesh)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(h1, h2)


def test_graft_entry_single_chip():
    import __graft_entry__ as ge
    import jax

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert "scores_by_k" in out


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
