#!/usr/bin/env python
"""BASELINE.md workload benchmarks (the five north-star configs).

Each workload prints one JSON line with TPU throughput and, when the
compiled C reference is available, the CPU single-thread comparison on
the same dataset.

  1 single     — one short pair, score+CIGAR latency
  2 ont        — the bundled ONT MinION pair (>=500 kbp), quicked
  3 short      — 100 bp x N pairs @ 2% err, full alignment (quicked)
  4 long       — 10-100 kbp @ 10% err, Hirschberg regime (quicked)
  5 mixed      — mixed-length stream, quicked (single host; multi-host
                 runs shard this by process)

Usage: python benchmarks/run_workloads.py [--workload N] [--scale F]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ONT = "/root/reference/tests/test_data/ONT.MiniION.1.seq"


def _cpu_time(pairs, algorithm="quicked", extra=()):
    """Single-thread C reference wall time. NOTE: includes process exec
    + .seq parsing + output — comparable to _run_quicked only when the
    alignment dominates (large workloads); for tiny ones the JSON's
    speedup_vs_cpu mostly measures exec overhead."""
    from quicked_tpu import seqio

    bench = os.path.join(REPO, ".oracle", "bin", "align_benchmark")
    if not os.path.exists(bench):
        return None
    with tempfile.TemporaryDirectory() as td:
        seq = os.path.join(td, "w.seq")
        seqio.write_seq_pairs(seq, pairs)
        t0 = time.perf_counter()
        subprocess.run([bench, "-a", algorithm, "-i", seq, "-q",
                        *extra], check=True, capture_output=True,
                       timeout=3600)
        return time.perf_counter() - t0


def _run_quicked(pairs):
    from quicked_tpu.aligner.cascade import quicked_cascade_batch

    t0 = time.perf_counter()
    res = quicked_cascade_batch(pairs)
    dt = time.perf_counter() - t0
    n_ok = sum(1 for s in res.status if int(s) >= 0)
    return dt, n_ok


def _report(name, pairs, dt, cpu_dt, extra=None):
    bases = sum(max(len(p), len(t)) for p, t in pairs)
    out = {
        "workload": name,
        "pairs": len(pairs),
        "bases": bases,
        "tpu_s": round(dt, 3),
        "pairs_per_s": round(len(pairs) / dt, 2),
        "bases_per_s": round(bases / dt, 1),
    }
    if cpu_dt:
        out["cpu_s"] = round(cpu_dt, 3)
        out["speedup_vs_cpu"] = round(cpu_dt / dt, 2)
    if extra:
        out.update(extra)
    print(json.dumps(out))


def w1_single():
    from quicked_tpu import generate

    pairs = list(generate.generate_pairs(1, 300, error=0.05, seed=1))
    _run_quicked(pairs)            # warm
    dt, _ = _run_quicked(pairs)
    _report("1-single-pair", pairs, dt, _cpu_time(pairs))


def w2_ont():
    from quicked_tpu import seqio

    if not os.path.exists(ONT):
        print(json.dumps({"workload": "2-ont", "skipped": "no data"}))
        return
    pairs = list(seqio.read_seq_pairs(ONT))
    _run_quicked(pairs)            # warm (compiles; PERFORMANCE.md
    dt, _ = _run_quicked(pairs)    # methodology reports warm numbers)
    _report("2-ont-minion", pairs, dt, _cpu_time(pairs))


def w3_short(scale):
    from quicked_tpu import generate

    n = int(100_000 * scale)
    pairs = list(generate.generate_pairs(n, 100, error=0.02, seed=3))
    _run_quicked(pairs[:min(n, 1024)])   # warm the bucket compiles
    dt, _ = _run_quicked(pairs)
    _report("3-short-100bp", pairs, dt, _cpu_time(pairs))


def w4_long(scale):
    from quicked_tpu import generate

    n = max(int(16 * scale), 2)
    pairs = list(generate.generate_pairs(n, 30_000, error=0.10, seed=4))
    _run_quicked(pairs)            # warm
    dt, _ = _run_quicked(pairs)
    _report("4-long-30kbp", pairs, dt, _cpu_time(pairs))


def w5_mixed(scale):
    from quicked_tpu import generate

    rngs = [(int(2000 * scale), 150, 0.03), (int(500 * scale), 1000, 0.08),
            (int(50 * scale), 10_000, 0.12)]
    pairs = []
    for i, (n, L, e) in enumerate(rngs):
        pairs += list(generate.generate_pairs(max(n, 1), L, error=e,
                                              seed=50 + i))
    _run_quicked(pairs)            # warm
    dt, _ = _run_quicked(pairs)
    _report("5-mixed-stream", pairs, dt, _cpu_time(pairs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", type=int, default=None,
                    choices=(1, 2, 3, 4, 5),
                    help="run one workload (1-5); default: all")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="scale factor on dataset sizes")
    ap.add_argument("--platform", default=None,
                    choices=("cpu", "tpu", "axon"),
                    help="force the JAX platform (default: environment);"
                         " 'tpu' maps to the axon plugin when present")
    args = ap.parse_args()

    if args.platform:
        from quicked_tpu.utils.platform import force_platform
        force_platform(args.platform)

    from quicked_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    runs = {1: w1_single, 2: w2_ont,
            3: lambda: w3_short(args.scale),
            4: lambda: w4_long(args.scale),
            5: lambda: w5_mixed(args.scale)}
    todo = [args.workload] if args.workload else [1, 2, 3, 4, 5]
    for w in todo:
        runs[w]()


if __name__ == "__main__":
    main()
