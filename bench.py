#!/usr/bin/env python
"""Headline benchmark: batched BandEd score-only throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is TPU aligned-bases/s divided by the CPU reference
(align_benchmark -a edit-banded, single thread) on the same dataset,
measured on this host when the oracle binary is available (BASELINE.md
measurement protocol).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Batch size amortizes the fixed dispatch/tunnel overhead (~33 ms) and
# lane-tile width sets Mosaic instruction efficiency. Measured on v5e
# (L=5 kbp, 15% band): 330 Mb/s @ B=4096/lanes=1024 -> 599 @ 16384/2048
# -> 681 @ 32768/2048 (marginal kernel rate ~0.79 Gb/s; lanes=4096
# exceeds VMEM). stage_batch picks the lane tile from its VMEM model.
N_PAIRS = 32768
LENGTH = 5000
ERROR = 0.10
BANDWIDTH = 15
REPS = 3


def _parity_check(batch, scores_by_k):
    """Compare the timed kernel's final scores against an INDEPENDENT
    path (the host C kernel; falls back to the exact numpy model on a
    lane subsample) — the compiled-kernel gate: a Mosaic miscompile
    would ship fast wrong answers with a green CPU-interpret suite."""
    import numpy as np

    from quicked_tpu.ops.batch_prep import extract_final_scores

    got = extract_final_scores(batch, scores_by_k)
    n = len(batch.enc_patterns)
    from quicked_tpu import native
    if native.available():
        from quicked_tpu.utils.host_threads import map_lanes

        want = np.zeros(n, dtype=np.int64)

        def one(b):
            want[b] = native.banded_score(
                batch.enc_patterns[b], batch.enc_texts[b],
                int(batch.cutoff[b]), int(batch.tlen[b]),
                int(batch.tfinish[b]))

        map_lanes(one, n)
        return bool(np.array_equal(got[:n], want))
    from quicked_tpu.ops import myers_np

    idx = range(0, n, max(n // 32, 1))
    for b in idx:
        ref = myers_np.banded_score(
            myers_np.compile_pattern(batch.enc_patterns[b]),
            batch.enc_texts[b], int(batch.cutoff[b]))
        if int(got[b]) != ref.score:
            return False
    return True


def _tpu_rate(pairs):
    import numpy as np

    from quicked_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(os.path.join(REPO, ".jax_cache"))

    from quicked_tpu.ops.banded_pallas import (collect_outputs,
                                               pallas_available,
                                               run_staged, stage_batch)
    from quicked_tpu.ops.batch_prep import prepare_banded_batch

    cutoffs = [max(len(p), len(t)) * BANDWIDTH // 100 for p, t in pairs]
    batch = prepare_banded_batch([p for p, _ in pairs],
                                 [t for _, t in pairs], cutoffs, full=False,
                                 pad_to_b=N_PAIRS)
    parity = None
    if pallas_available():
        tiled, statics = stage_batch(batch)

        def run():
            out = run_staged(tiled, statics, interpret=False)
            # materialize a small output: forces full execution (through
            # the dev tunnel, block_until_ready alone under-reports)
            np.asarray(out[5])
            return out

        def check_parity(out):
            res = collect_outputs(out, statics)
            return _parity_check(batch, res["scores_by_k"])
    else:
        # CPU fallback: the native C kernel (ops/banded_native.py)
        from quicked_tpu.ops.banded_native import (native_available,
                                                   run_banded_native)

        import jax.numpy as jnp

        from quicked_tpu.ops.banded_jax import _banded_scan

        args = [jnp.asarray(a) for a in (
            batch.peq_lo, batch.peq_hi, batch.lm_lo, batch.lm_hi,
            batch.text, batch.init_scores, batch.cutoff, batch.prolog,
            batch.nbr, batch.finish_v, batch.tfinish, batch.first0,
            batch.last0)]

        def run_scan():
            out = _banded_scan(*args, EBB=batch.EBB, NB=batch.NB,
                               full=False)
            np.asarray(out["first"])
            return out

        if native_available():
            def run():
                return run_banded_native(batch)

            def check_parity(out):
                # native timed lane: cross-check vs the XLA scan
                scan = run_scan()
                return bool(np.array_equal(
                    np.asarray(out["scores_by_k"]),
                    np.asarray(scan["scores_by_k"])))
        else:
            run = run_scan

            def check_parity(out):
                return _parity_check(batch, np.asarray(out["scores_by_k"]))

    out = run()  # compile + warmup
    parity = check_parity(out)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    bases = sum(max(len(p), len(t)) for p, t in pairs)
    return bases / best, parity


def _cpu_rate(pairs):
    bench = os.path.join(REPO, ".oracle", "bin", "align_benchmark")
    if not os.path.exists(bench):
        try:
            sys.path.insert(0, os.path.join(REPO, "tests"))
            from tests import oracle

            bench = oracle.oracle_path("align_benchmark")
        except Exception:
            bench = None
    if not bench or not os.path.exists(bench):
        return None
    from quicked_tpu import seqio

    with tempfile.TemporaryDirectory() as td:
        seq = os.path.join(td, "bench.seq")
        seqio.write_seq_pairs(seq, pairs)
        t0 = time.perf_counter()
        subprocess.run([bench, "-a", "edit-banded", "--bandwidth",
                        str(BANDWIDTH), "-i", seq, "-q"],
                       check=True, capture_output=True, timeout=3600)
        dt = time.perf_counter() - t0
    bases = sum(max(len(p), len(t)) for p, t in pairs)
    return bases / dt


def _device_healthy(timeout_s: float = 150.0, attempts: int = 2) -> bool:
    """Probe the accelerator with a trivial computation under a timeout —
    this environment's TPU tunnel can wedge; fall back to CPU then. Two
    attempts: the first may just be warming a cold tunnel."""
    code = ("import jax, jax.numpy as jnp, numpy as np;"
            "np.asarray(jax.jit(lambda a: (a * 2).sum())(jnp.arange(128)));"
            "print('ok')")
    for _ in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=timeout_s)
            if "ok" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def _workload_rows():
    """End-to-end BASELINE workload rows (benchmarks/run_workloads.py),
    run IN THIS PROCESS (one TPU client at a time — a second axon
    process would contend for the tunnel). Failures yield error rows:
    a routing regression must surface in the artifact, not blank it.
    A tunnel that wedges MID-workload still hangs this process (a
    subprocess-per-workload would be a second TPU client, and SIGALRM
    can't interrupt a blocked device call) — the caller's timeout is
    the backstop; QUICKED_TPU_BENCH_WORKLOADS=0 skips the rows."""
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    import run_workloads

    rows = []
    for w in (1, 2, 3, 4, 5):
        try:
            rows.append(run_workloads.run_workload(w))
        except Exception as e:
            rows.append({"workload": str(w), "error": repr(e)[:200]})
    return rows


def main(workload_lines: bool = False):
    from quicked_tpu import generate

    platform = None
    if not _device_healthy():
        print("accelerator probe timed out; benching on CPU backend",
              file=sys.stderr)
        import jax

        jax.config.update("jax_platforms", "cpu")
        platform = "cpu"

    pairs = list(generate.generate_pairs(N_PAIRS, LENGTH, error=ERROR,
                                         seed=7))
    tpu, parity = _tpu_rate(pairs)
    try:
        cpu = _cpu_rate(pairs)
    except Exception as e:  # oracle failures must not kill the bench
        print(f"cpu baseline failed: {e}", file=sys.stderr)
        cpu = None
    vs = (tpu / cpu) if cpu else 0.0
    out = {
        "metric": "banded_score_bases_per_s",
        "value": round(tpu, 1),
        "unit": "bases/s",
        "vs_baseline": round(vs, 3),
        "parity": parity,
    }
    # pinned denominator (benchmarks/pin_baseline.py): the same-run CPU
    # rate above is re-measured on a possibly-contended host every run
    # and wobbled cross-round headlines 40%; the pinned quiet-host rate
    # makes trends comparable. Both are reported.
    try:
        with open(os.path.join(REPO, "BASELINE.json")) as f:
            pinned_rate = json.load(f).get("pinned_cpu_rate_bases_per_s")
        if pinned_rate:
            out["vs_baseline_pinned"] = round(tpu / pinned_rate, 3)
    except Exception:
        pass
    if platform:
        out["platform_fallback"] = platform
    # End-to-end workload rows ride the same single JSON line (the
    # driver contract) unless disabled; --workloads prints them as
    # separate lines instead for human sweeps.
    if os.environ.get("QUICKED_TPU_BENCH_WORKLOADS", "1") == "1":
        rows = _workload_rows()
        if workload_lines:
            for r in rows:
                print(json.dumps(r), flush=True)
        else:
            out["workloads"] = rows
    print(json.dumps(out))


if __name__ == "__main__":
    main(workload_lines="--workloads" in sys.argv[1:])
