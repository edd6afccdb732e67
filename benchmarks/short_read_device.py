#!/usr/bin/env python
"""Workload-3 device lane, kernel-level: short-read (100 bp) FULL
alignment through the on-chip kernels.

BASELINE workload 3 (100k x 100 bp @ 2% err, full QuickEd incl.
CIGARs) routes to the host C lane on this dev host because every
device dispatch pays the tunnel's latency + upload. This benchmark
measures what the DEVICE lane delivers at kernel level (inputs staged
once, one small output materialized per rep — transfer-excluded):

  1. banded FULL fill (Pallas, traceback planes to HBM) pairs/s
  2. windowed score bound (stage-1) pairs/s
  3. host traceback rate over collected planes (the post-kernel stage)
  4. the 1-thread C reference rate on the same pairs (the denominator)
  5. a PCIe-class end-to-end projection from the venue model's own
     terms (staging + plane readback at PCIe bandwidth + traceback)

Kernel timing is MARGINAL: R queued executions minus one (async
dispatch drains on the final materialize), which cancels the per-call
dispatch + readback latency — through the dev tunnel that latency is
~35 ms, 30x the short-read kernel itself, and single-run timing
measured only the tunnel (the round-2 honest-timing rule, extended).

Prints one JSON line per measurement. One TPU process at a time; run
under timeout (CLAUDE.md tunnel rules).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAIRS = 32768
LENGTH = 100
ERROR = 0.02
BANDWIDTH = 15
REPS = 3
PCIE_BYTES_PER_S = 10e9          # conservative PCIe gen4 x8 class
SUB = 512                        # parity / traceback sub-batch


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import numpy as np

    from quicked_tpu import generate
    from quicked_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    assert jax.devices()[0].platform == "tpu", jax.devices()

    from quicked_tpu.ops.banded_pallas import (collect_outputs, run_staged,
                                               stage_batch)
    from quicked_tpu.ops.batch_prep import (extract_final_scores,
                                            prepare_banded_batch)

    pairs = list(generate.generate_pairs(N_PAIRS, LENGTH, error=ERROR,
                                         seed=3))
    pats = [p for p, _ in pairs]
    txts = [t for _, t in pairs]
    cutoffs = [max(len(p), len(t)) * BANDWIDTH // 100 for p, t in pairs]

    # ---- 1. FULL fill kernel (traceback planes to HBM), staged once
    batch = prepare_banded_batch(pats, txts, cutoffs, full=True,
                                 pad_to_b=N_PAIRS)
    log(f"full batch: B={batch.B} NB={batch.NB} EBB={batch.EBB}")
    t0 = time.perf_counter()
    tiled, statics = stage_batch(batch)
    for v in tiled.values():
        v.block_until_ready()
    stage_s = time.perf_counter() - t0
    log(f"staged in {stage_s:.2f}s (compile next)")
    t0 = time.perf_counter()
    out = run_staged(tiled, statics)
    np.asarray(out[5])
    log(f"first full run (compile+exec) {time.perf_counter() - t0:.2f}s")

    def marginal(run_once, reps=10):
        def timed(k):
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                outs = [run_once() for _ in range(k)]
                np.asarray(outs[-1])    # drain the async queue
                best = min(best, time.perf_counter() - t0)
            return best
        t1, tr = timed(1), timed(reps)
        return max((tr - t1) / (reps - 1), 1e-9), t1

    best, one_s = marginal(lambda: run_staged(tiled, statics)[5])
    log(f"full fill: marginal {best*1e3:.2f} ms, single-call {one_s:.3f}s"
        " (dispatch-dominated through the tunnel)")
    fill_pairs_s = N_PAIRS / best
    ebb8 = statics["EBB8"]
    plane_bytes = (batch.NB * 64 * ebb8 * 16) * N_PAIRS
    adv = float(N_PAIRS) * batch.NB * 64 * ebb8
    print(json.dumps({
        "metric": "w3_device_full_fill",
        "pairs": N_PAIRS, "length": LENGTH,
        "kernel_s": round(best, 5),
        "single_call_s": round(one_s, 4),
        "pairs_per_s": round(fill_pairs_s, 1),
        "adv_per_s": round(adv / best, 3),
        "plane_bytes": plane_bytes,
        "plane_write_gbps": round(plane_bytes / best / 1e9, 1),
    }), flush=True)

    # ---- parity + host traceback rate on a sub-batch
    sub_batch = prepare_banded_batch(pats[:SUB], txts[:SUB],
                                     cutoffs[:SUB], full=True,
                                     pad_to_b=SUB)
    st, ss = stage_batch(sub_batch)
    sout = run_staged(st, ss)
    res = collect_outputs(sout, ss)
    dev_scores = extract_final_scores(sub_batch, res["scores_by_k"])
    from quicked_tpu import native
    from quicked_tpu.aligner.batch import _traceback_tiled
    ops = _traceback_tiled(res["mats_tiled"], res["lanes"], sub_batch,
                           list(range(SUB)), pats[:SUB], txts[:SUB])
    tb_s = float("inf")              # warm first: the initial call pays
    for _ in range(3):               # the 128 MB heap prefault + faults
        t0 = time.perf_counter()
        ops = _traceback_tiled(res["mats_tiled"], res["lanes"], sub_batch,
                               list(range(SUB)), pats[:SUB], txts[:SUB])
        tb_s = min(tb_s, time.perf_counter() - t0)
    from quicked_tpu.ops.banded_native import run_banded_full_native
    ref_sc, ref_ops = run_banded_full_native(pats[:SUB], txts[:SUB],
                                             cutoffs[:SUB])
    parity = bool(np.array_equal(dev_scores[:SUB], ref_sc)) and \
        list(ops) == list(ref_ops)
    print(json.dumps({
        "metric": "w3_parity_and_traceback",
        "sub_pairs": SUB,
        "parity": parity,
        "traceback_pairs_per_s": round(SUB / tb_s, 1),
    }), flush=True)

    # ---- 1b. ON-DEVICE traceback lane: fill + records kernel chained.
    # Planes stay in HBM; readback is (d_run u16, op i8) per column.
    from quicked_tpu.aligner.batch import _raw_bytes, _run_device_full_tb
    from quicked_tpu.ops import banded_traceback_jax as btj

    T = statics["NB"] * 64
    maxp = max(len(p) for p in pats)
    PP = max(32, 1 << max(maxp - 1, 1).bit_length())
    praw_np, traw_np = btj.prep_raw_frames(
        [_raw_bytes(p).tobytes() for p in pats],
        [_raw_bytes(t).tobytes() for t in txts], T, PP,
        pad_to_b=batch.B)
    praw_d, traw_d = jnp.asarray(praw_np), jnp.asarray(traw_np)
    plen_d = jnp.asarray(batch.plen.astype(np.int32))
    tlen_d = jnp.asarray(batch.tlen.astype(np.int32))
    prolog_d = jnp.asarray(batch.prolog.astype(np.int32))

    def fill_tb_once():
        o = run_staged(tiled, statics)
        r = btj._records_from_tiled(
            o[7], o[8], o[9], o[10], praw_d, traw_d, plen_d, tlen_d,
            prolog_d, EBB=statics["EBB8"], PP=PP)
        return r[0]

    t0 = time.perf_counter()
    np.asarray(fill_tb_once())
    log(f"first fill+records run (compile+exec) "
        f"{time.perf_counter() - t0:.2f}s")
    tbbest, tbone = marginal(fill_tb_once)
    rec = btj._records_from_tiled(
        out[7], out[8], out[9], out[10], praw_d, traw_d, plen_d, tlen_d,
        prolog_d, EBB=statics["EBB8"], PP=PP)
    rec_np = jax.device_get(list(rec))
    rec_bytes = sum(int(np.asarray(r).nbytes) for r in rec_np)
    from quicked_tpu import native
    t0 = time.perf_counter()
    packed = native.expand_colruns(rec_np[0], rec_np[1], rec_np[2],
                                   rec_np[3]) if native.available() \
        else None
    if packed is None:
        packed = btj.records_to_packed(rec_np[0].astype(np.int32),
                                       rec_np[1], rec_np[2], rec_np[3],
                                       n=N_PAIRS)
    flat, starts, lens = packed
    pack_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _buf = flat.tobytes()
    ops_dev = [_buf[s:s + l].decode("ascii")
               for s, l in zip(starts.tolist(), lens.tolist())]
    expand_s = pack_s + (time.perf_counter() - t0)
    # parity of the full on-device lane on the sub-batch
    sc_tb, ops_tb = _run_device_full_tb(
        sub_batch, [_raw_bytes(p).tobytes() for p in pats[:SUB]],
        [_raw_bytes(t).tobytes() for t in txts[:SUB]], SUB)
    tb_parity = bool(np.array_equal(sc_tb[:SUB], ref_sc)) and \
        list(ops_tb) == list(ref_ops)
    print(json.dumps({
        "metric": "w3_device_fill_plus_records",
        "pairs": N_PAIRS,
        "kernel_s": round(tbbest, 5),
        "single_call_s": round(tbone, 4),
        "pairs_per_s": round(N_PAIRS / tbbest, 1),
        "records_bytes": rec_bytes,
        "expand_host_s": round(expand_s, 4),
        "parity": tb_parity,
    }), flush=True)

    # ---- 2. windowed score bound kernel (stage-1), staged arrays
    from quicked_tpu.ops.windowed_jax import (_windowed_scan,
                                              hew_cell_threshold,
                                              prepare_windowed_batch)
    wbatch = prepare_windowed_batch(pats, txts, window_size=2,
                                    pad_to_b=N_PAIRS)
    hew_cells = np.full(wbatch.B, hew_cell_threshold(2, 1, 40),
                        dtype=np.int32)
    wargs = [jnp.asarray(a) for a in (
        wbatch.peq_lo, wbatch.peq_hi, wbatch.text_enc, wbatch.text_raw,
        wbatch.pat_raw, wbatch.plen, wbatch.tlen, wbatch.num_words,
        hew_cells)]
    for a in wargs:
        a.block_until_ready()
    score, hew = _windowed_scan(*wargs, WS=2, OVL=1)
    np.asarray(score)
    wbest, wone = marginal(lambda: _windowed_scan(*wargs, WS=2, OVL=1)[0],
                           reps=4)
    print(json.dumps({
        "metric": "w3_device_windowed_bound",
        "pairs": N_PAIRS,
        "kernel_s": round(wbest, 5),
        "single_call_s": round(wone, 4),
        "pairs_per_s": round(N_PAIRS / wbest, 1),
    }), flush=True)

    # ---- 3. the 1-thread C reference on the same pairs
    from quicked_tpu import seqio
    bench = os.path.join(REPO, ".oracle", "bin", "align_benchmark")
    cpu_s = None
    if os.path.exists(bench):
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            seq = os.path.join(td, "w3.seq")
            seqio.write_seq_pairs(seq, pairs)
            t0 = time.perf_counter()
            subprocess.run([bench, "-a", "quicked", "-i", seq, "-q"],
                           check=True, capture_output=True, timeout=3600)
            cpu_s = time.perf_counter() - t0
        print(json.dumps({
            "metric": "w3_c_reference_1thread",
            "pairs": N_PAIRS, "wall_s": round(cpu_s, 3),
            "pairs_per_s": round(N_PAIRS / cpu_s, 1),
        }), flush=True)

    # ---- 4. PCIe-class end-to-end projection (venue-model terms)
    bytes_up = (batch.peq_lo.nbytes + batch.peq_hi.nbytes
                + batch.lm_lo.nbytes + batch.lm_hi.nbytes
                + batch.text.nbytes // 4)      # text stages packed
    traceback_s = N_PAIRS / (SUB / tb_s)   # measured threaded C rate
    proj = (0.001                                   # dispatch
            + bytes_up / PCIE_BYTES_PER_S           # stage in
            + best                                  # fill kernel
            + plane_bytes / PCIE_BYTES_PER_S        # planes out
            + traceback_s)                          # host traceback
    row = {
        "metric": "w3_device_lane_pcie_projection",
        "pairs": N_PAIRS,
        "projected_s": round(proj, 4),
        "projected_pairs_per_s": round(N_PAIRS / proj, 1),
        "terms": {
            "stage_bytes": bytes_up,
            "fill_kernel_s": round(best, 4),
            "plane_readback_s": round(plane_bytes / PCIE_BYTES_PER_S, 4),
            "traceback_s": round(traceback_s, 4),
        },
    }
    if cpu_s:
        row["vs_c_1thread"] = round(cpu_s / proj, 2)
        row["kernel_vs_c_1thread"] = round(
            (N_PAIRS / best) / (N_PAIRS / cpu_s), 2)
    print(json.dumps(row), flush=True)

    # ---- 4b. PCIe projection of the ON-DEVICE traceback lane: planes
    # never cross the link; records + raw frames do.
    raw_up = praw_np.nbytes + traw_np.nbytes
    proj_tb = (0.002                                  # two dispatches
               + (bytes_up + raw_up) / PCIE_BYTES_PER_S
               + tbbest                               # fill + records
               + rec_bytes / PCIE_BYTES_PER_S
               + expand_s)                            # host expansion
    row = {
        "metric": "w3_device_tb_lane_pcie_projection",
        "pairs": N_PAIRS,
        "projected_s": round(proj_tb, 4),
        "projected_pairs_per_s": round(N_PAIRS / proj_tb, 1),
        "terms": {
            "stage_bytes": bytes_up + raw_up,
            "fill_records_kernel_s": round(tbbest, 4),
            "records_readback_s": round(rec_bytes / PCIE_BYTES_PER_S, 4),
            "expand_s": round(expand_s, 4),
        },
    }
    if cpu_s:
        row["vs_c_1thread"] = round(cpu_s / proj_tb, 2)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
