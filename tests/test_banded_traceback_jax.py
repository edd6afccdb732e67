"""Parity: the device column-scan banded traceback (records + host
expansion) vs the spec walk (traceback_np.banded_traceback_pair) on
planes produced by the XLA banded full kernel."""

import numpy as np
import pytest

from quicked_tpu import generate
from quicked_tpu.ops.banded_jax import run_banded
from quicked_tpu.ops.banded_traceback_jax import (expand_records,
                                                  prep_raw_frames,
                                                  traceback_records)
from quicked_tpu.ops.batch_prep import prepare_banded_batch
from quicked_tpu.ops.traceback_np import banded_traceback_pair


def _run_device_tb(pairs, cutoffs, min_nb=4, min_ebb=4):
    """Shared pow2 shapes (one compile across the matrix)."""
    import jax.numpy as jnp

    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    b = prepare_banded_batch(pats, txts, cutoffs, full=True, pad_to_b=8,
                             min_nb=min_nb, min_ebb=min_ebb)
    out = run_banded(b)
    T = out["mat_pv_lo"].shape[0]
    PP = 32 * ((max(len(p) for p in pats) + 31) // 32)
    praw, traw = prep_raw_frames([p.encode() for p in pats],
                                 [t.encode() for t in txts], T, PP,
                                 pad_to_b=b.B)
    runs, opcs, v_f, h_f = traceback_records(
        jnp.asarray(out["mat_pv_lo"]), jnp.asarray(out["mat_pv_hi"]),
        jnp.asarray(out["mat_mv_lo"]), jnp.asarray(out["mat_mv_hi"]),
        jnp.asarray(praw), jnp.asarray(traw),
        jnp.asarray(b.plen.astype(np.int32)),
        jnp.asarray(b.tlen.astype(np.int32)),
        jnp.asarray(b.prolog.astype(np.int32)),
        EBB=b.EBB, PP=PP)
    got = expand_records(runs, opcs, v_f, h_f, n=len(pairs))
    want = [banded_traceback_pair(
        out["mat_pv_lo"][:, :, i], out["mat_pv_hi"][:, :, i],
        out["mat_mv_lo"][:, :, i], out["mat_mv_hi"][:, :, i],
        np.frombuffer(pats[i].encode(), dtype=np.uint8),
        np.frombuffer(txts[i].encode(), dtype=np.uint8),
        int(b.prolog[i])) for i in range(len(pairs))]
    return got, want


@pytest.mark.parametrize("length,error,seed,ldiff", [
    (100, 0.02, 1, 1.0),
    (100, 0.2, 2, 1.0),
    (200, 0.1, 3, 0.85),
    (200, 0.1, 4, 1.2),
    (500, 0.05, 5, 1.0),
    (64, 0.4, 6, 1.0),
])
def test_device_traceback_parity(length, error, seed, ldiff):
    pairs = list(generate.generate_pairs(6, length, error=error, seed=seed,
                                         length_diff=ldiff))
    cutoffs = [max(max(len(p), len(t)) * 25 // 100,
                   abs(len(p) - len(t)) + 1) for p, t in pairs]
    got, want = _run_device_tb(pairs, cutoffs)
    assert got == want


def test_device_traceback_indel_heavy():
    """Long D/I runs (run clamping, band-frame crossings) + N chars."""
    rng = np.random.default_rng(17)
    pairs = []
    for k in range(2):
        pl = int(rng.integers(120, 300))
        dl = int(rng.integers(20, 60))
        p = "".join(rng.choice(list("ACGT"), pl))
        cut = int(rng.integers(0, pl - dl))
        pairs.append((p, p[:cut] + p[cut + dl:]))       # big deletion
        pairs.append((p[:cut] + p[cut + dl:], p))       # big insertion
    p = "".join(rng.choice(list("ACGTN"), 150))
    pairs.append((p, p.replace("A", "N")))              # N raw-compare
    cutoffs = [max(max(len(p), len(t)) * 40 // 100,
                   abs(len(p) - len(t)) + 1) for p, t in pairs]
    got, want = _run_device_tb(pairs, cutoffs)
    assert got == want


def test_expand_records_empty_and_pads():
    runs = np.zeros((4, 3), dtype=np.int32)
    opcs = np.zeros((4, 3), dtype=np.int8)
    opcs[2, 0] = 1
    runs[2, 0] = 2
    v_f = np.array([-1, 3, -1], dtype=np.int32)
    h_f = np.array([-1, -1, 1], dtype=np.int32)
    got = expand_records(runs, opcs, v_f, h_f)
    # lane 0: one M at column 2 preceded by its 2-deep D run
    assert got[0] == "MDD"
    assert got[1] == "DDDD"
    assert got[2] == "II"


def test_expand_colruns_c_matches_numpy():
    """The C record expander (qh_expand_colruns_batch) vs the numpy
    packed path on randomized records."""
    from quicked_tpu import native
    from quicked_tpu.ops.banded_traceback_jax import records_to_packed

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    n, T = 257, 96
    runs = rng.integers(0, 5, (n, T)).astype(np.uint16)
    runs[rng.random((n, T)) < 0.7] = 0
    opcs = rng.choice(np.array([0, 1, 3, 4], np.int8), (n, T))
    v_f = rng.integers(-1, 40, n).astype(np.int32)
    h_f = rng.integers(-1, 40, n).astype(np.int32)
    want = records_to_packed(runs.astype(np.int32), opcs, v_f, h_f)
    got = native.expand_colruns(runs, opcs, v_f, h_f)
    assert got is not None
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    np.testing.assert_array_equal(got[2], want[2])
