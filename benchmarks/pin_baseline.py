#!/usr/bin/env python
"""Pin the C-reference denominators into BASELINE.json.

Measures, on a QUIET host, median-of-N single-thread wall times of the
compiled reference (`.oracle/bin/align_benchmark -a quicked`) on every
BASELINE workload dataset plus the headline edit-banded rate on the
bench.py dataset, and writes them under `pinned_cpu_s` /
`pinned_cpu_rate_bases_per_s`. bench.py and run_workloads.py then
report BOTH `speedup_vs_cpu` (same-run, the decisive comparator) and
`speedup_vs_cpu_pinned` (stable cross-round trend) — VERDICT r4 #4: the
re-measured-every-run denominator wobbled the headline 40% between
rounds while the kernel itself held flat.

Run manually when the host or the reference build changes:
    python benchmarks/pin_baseline.py [--reps N]
"""

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import run_workloads  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    args = ap.parse_args()

    path = os.path.join(REPO, "BASELINE.json")
    with open(path) as f:
        base = json.load(f)

    pinned = {}
    pinned_bases = {}
    for w, name in run_workloads.WORKLOAD_NAMES.items():
        pairs = run_workloads.WORKLOAD_PAIRS[w]()
        if pairs is None:
            continue
        ts = [run_workloads._cpu_time(pairs) for _ in range(args.reps)]
        if ts[0] is None:
            print("oracle binary missing; aborting", file=sys.stderr)
            return 1
        med = statistics.median(ts)
        pinned[name] = round(med, 3)
        # dataset identity: a --scale run must not divide the pinned
        # wall time by a differently-sized workload
        pinned_bases[name] = sum(max(len(p), len(t)) for p, t in pairs)
        print(f"{name}: median {med:.3f}s  "
              f"spread {max(ts) - min(ts):.3f}s", file=sys.stderr)

    # headline denominator: bench.py's dataset + algorithm (edit-banded)
    import bench
    pairs = list(__import__("quicked_tpu.generate", fromlist=["g"])
                 .generate_pairs(bench.N_PAIRS, bench.LENGTH,
                                 error=bench.ERROR, seed=7))
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = bench._cpu_rate(pairs)
        if r is None:
            print("oracle binary missing for headline; skipping",
                  file=sys.stderr)
            break
        rates.append(r)
        print(f"headline edit-banded: {r / 1e6:.1f} Mb/s "
              f"({time.perf_counter() - t0:.1f}s)", file=sys.stderr)
    out = {"pinned_cpu_s": pinned, "pinned_cpu_bases": pinned_bases}
    if rates:
        out["pinned_cpu_rate_bases_per_s"] = round(
            statistics.median(rates), 1)
    out["pinned_host"] = {
        "cores": os.cpu_count(),
        "date": time.strftime("%Y-%m-%d"),
    }
    base.update(out)
    with open(path, "w") as f:
        json.dump(base, f, indent=2)
        f.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
