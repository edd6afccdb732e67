#!/usr/bin/env python
"""Staged on-chip validation + rate measurement of the systolic
deep-band Mosaic kernel (ops/banded_sysband_pallas.py).

Runs a small->large ladder of cases IN ONE PROCESS (CLAUDE.md rule 6:
bisect Mosaic faults with many tiny kernels per process), asserting
bit-parity of scores/first/last vs the XLA-scan reference on every
case, then times the largest case (materializing outputs — honest
timing through the dev tunnel).

Usage:  timeout 900 python benchmarks/sysband_onchip.py [--upto N]
Prints one status line per case, then a JSON summary line.
A case index can be given with --upto to stop early (bisection).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def build_cases():
    from quicked_tpu import generate
    from quicked_tpu.ops.batch_prep import prepare_banded_batch

    def pair(length, seed, error=0.1):
        return list(generate.generate_pairs(1, length, error=error,
                                            seed=seed))[0]

    cases = []
    # 1: minimal geometry (EBB small, no recenter)
    p, t = pair(2000, 5)
    cases.append(("small-2k", prepare_banded_batch([p], [t], [300],
                                                   full=False)))
    # 2: batch of 2, inverted prolog + truncated pattern
    p2, t2 = pair(800, 7, error=0.2)
    cases.append(("batch2", prepare_banded_batch(
        [p[:1500], p2], [t, t2], [400, 200], full=False)))
    # 3: text_finish mid-block
    cases.append(("tfinish", prepare_banded_batch(
        [p], [t], [300], full=False, text_finish=[999])))
    # 4: recenter exercised (25 kbp, cutoff 4.5k)
    p3, t3 = pair(25000, 11)
    cases.append(("recenter-25k", prepare_banded_batch(
        [p3], [t3], [4500], full=False)))
    # 5: deep band, moderate length (EBB ~ 470)
    p4, t4 = pair(60000, 13)
    cases.append(("deep-60k", prepare_banded_batch(
        [p4], [t4], [30000], full=False)))
    # 6: EBB beyond round-2's 3500 cap (the widened multiply-shift init:
    # NS ~ 6700 resident slots > the old 3968 bound). text_finish keeps
    # the host-C parity reference affordable; the deep window init is
    # what changed.
    p6, t6 = pair(2_700_000, 19, error=0.05)
    cases.append(("deepband-6k", prepare_banded_batch(
        [p6], [t6], [400000], full=False, text_finish=[60000])))
    # 7: ONT-scale stage-3 geometry (~500 kbp, cutoff ~76k -> EBB ~1190)
    p5, t5 = pair(500000, 17, error=0.05)
    cases.append(("ont-500k", prepare_banded_batch(
        [p5], [t5], [76000], full=False)))
    return cases


def check(name, batch, timed_reps=0):
    import jax

    from quicked_tpu.ops.banded_jax import run_banded
    from quicked_tpu.ops.banded_sysband_pallas import (
        run_banded_sysband_pallas,
        stage_sysband_batch,
        _pallas_sysband,
        collect_sysband,
    )

    assert jax.devices()[0].platform == "tpu", jax.devices()
    t0 = time.perf_counter()
    out = run_banded_sysband_pallas(batch, interpret=False)
    wall = time.perf_counter() - t0

    # Independent reference: the host C kernel (fast, no device);
    # fall back to the XLA scan when the native lib is unavailable.
    from quicked_tpu.ops.banded_native import (native_available,
                                               run_banded_native)

    if native_available() and batch.enc_patterns is not None:
        ref = run_banded_native(batch)
    else:
        ref = run_banded(batch)
    n = len(batch.enc_patterns)
    for j in range(n):
        np.testing.assert_array_equal(out["scores_by_k"][:, j],
                                      ref["scores_by_k"][:, j])
        assert out["first"][j] == ref["first"][j], name
        assert out["last"][j] == ref["last"][j], name
        f, l = int(ref["first"][j]), int(ref["last"][j])
        sl = slice(max(f, 0), min(l + 1, batch.EBB))
        for k in ("pv_lo", "pv_hi", "mv_lo", "mv_hi"):
            np.testing.assert_array_equal(out[k][sl, j], ref[k][sl, j])

    best = None
    if timed_reps:
        args, statics = stage_sysband_batch(batch)
        jargs = (args["peq_lo"], args["peq_hi"], args["text_t"],
                 args["cutoff"], args["prolog"], args["nbr"],
                 args["finish_v"], args["tfinish"], args["first0"],
                 args["last0"])

        def run():
            o = _pallas_sysband(*jargs, interpret=False, **statics)
            np.asarray(o[0])  # materialize (honest through the tunnel)
            return o

        run()  # warm (compiled already from the parity run)
        best = float("inf")
        for _ in range(timed_reps):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
    return wall, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--upto", type=int, default=99)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from quicked_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(os.path.join(REPO, ".jax_cache"))

    cases = build_cases()
    results = {}
    for i, (name, batch) in enumerate(cases):
        if i >= args.upto:
            break
        timed = args.reps if i == len(cases) - 1 else 0
        wall, best = check(name, batch, timed_reps=timed)
        adv = float(np.sum(batch.tfinish.astype(np.int64)
                           * (batch.cutoff.astype(np.int64) // 64 + 1)))
        line = {"case": name, "parity": True,
                "first_wall_s": round(wall, 3)}
        if best is not None:
            line["best_s"] = round(best, 4)
            line["adv_per_s"] = round(adv / best, 1)
            results["timed"] = line
        print(json.dumps(line), flush=True)
        results[name] = True
    print(json.dumps({"summary": "ok", "cases": len(results)}))


if __name__ == "__main__":
    main()
