"""Multi-host data-parallel alignment driver.

The reference's only scale-out is OpenMP threads over pairs
(align_benchmark.c:232-306). Here the same independence is exploited
across processes/hosts: each JAX process takes a strided shard of the
input stream, aligns it locally through the batch engine (its local
devices form the local mesh), writes an indexed shard file, and the
coordinator merges shards into the input-ordered output — the ordered
result merge of BASELINE.md's north star.

Launch: one process per host with the standard JAX distributed
environment (jax.distributed.initialize args or
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), all
writing to a shared filesystem. Degenerates to a plain single-process
run when no distributed environment is configured.
"""

from __future__ import annotations

import glob
import os

from quicked_tpu import seqio
from quicked_tpu.params import QuickedParams


def maybe_initialize_distributed() -> tuple[int, int]:
    """Initialize jax.distributed when configured; returns
    (process_index, process_count)."""
    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS") and \
            os.environ.get("JAX_NUM_PROCESSES"):
        try:
            jax.distributed.initialize()
        except RuntimeError:
            pass  # already initialized
    return jax.process_index(), jax.process_count()


def distributed_align(input_path: str, output_path: str,
                      params: QuickedParams | None = None,
                      batch_size: int = 10000,
                      process_index: int | None = None,
                      process_count: int | None = None) -> int:
    """Align a .seq stream across processes; ordered TSV merge on the
    coordinator. Returns pairs processed by this process."""
    from quicked_tpu.aligner.batch import align_batch_full

    params = params or QuickedParams()
    if process_index is None or process_count is None:
        process_index, process_count = maybe_initialize_distributed()

    shard_path = f"{output_path}.shard{process_index:05d}"
    # stale-run hygiene: a leftover .done (e.g. from a previous run with
    # a different process_count) would satisfy the merge barrier early
    if os.path.exists(shard_path + ".done"):
        os.remove(shard_path + ".done")
    if process_index == 0:
        # the coordinator also clears shards beyond this run's count so
        # the merge can't pick up a wider previous run's leftovers
        for stale in glob.glob(f"{output_path}.shard*"):
            idx = stale[len(output_path) + len(".shard"):].split(".")[0]
            if idx.isdigit() and int(idx) >= process_count:
                os.remove(stale)
    n_local = 0
    with open(shard_path, "w") as out:
        batch, batch_ids = [], []

        def flush():
            nonlocal n_local
            if not batch:
                return
            res = align_batch_full(batch, params)
            for k, gid in enumerate(batch_ids):
                if int(res.status[k]) < 0:
                    out.write(f"{gid}\tERROR\tERROR\n")
                else:
                    cig = res.cigar[k] if res.cigar[k] is not None else "-"
                    out.write(f"{gid}\t{res.score[k]}\t{cig}\n")
            n_local += len(batch)
            batch.clear()
            batch_ids.clear()

        for gid, pair in enumerate(seqio.read_seq_pairs(input_path)):
            if gid % process_count != process_index:
                continue
            batch.append(pair)
            batch_ids.append(gid)
            if len(batch) >= batch_size:
                flush()
        flush()

    # completion marker for the shard-file barrier
    open(shard_path + ".done", "w").close()
    if process_index == 0:
        _wait_for_shards(output_path, process_count)
        _merge_shards(output_path, process_count)
    return n_local


def _wait_for_shards(output_path: str, process_count: int,
                     timeout_s: float = 3600.0) -> None:
    """File-based barrier on the shared filesystem: the coordinator
    merges only after every process has marked its shard complete."""
    import time

    expected = [f"{output_path}.shard{i:05d}.done"
                for i in range(process_count)]
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        n_done = sum(os.path.exists(p) for p in expected)
        if n_done >= process_count:
            return
        time.sleep(0.5)
    n_done = sum(os.path.exists(p) for p in expected)
    raise TimeoutError(
        f"distributed merge: only {n_done}"
        f"/{process_count} shards completed within {timeout_s}s")


def _merge_shards(output_path: str, process_count: int) -> None:
    """Input-ordered streaming k-way merge of per-process shard files.

    Each shard is written in ascending global-id order (the strided
    reader), so a heap over one head line per shard merges N shards in
    O(total) time and O(process_count) memory — sized for the 10M-pair
    distributed workload, where materialising all rows (scores + CIGARs)
    in memory would not fit.
    """
    import heapq

    shards = [f"{output_path}.shard{i:05d}" for i in range(process_count)]
    files = [open(p) for p in shards]
    heap = []
    for fi, f in enumerate(files):
        line = f.readline()
        if line:
            gid, rest = line.split("\t", 1)
            heap.append((int(gid), fi, rest))
    heapq.heapify(heap)
    with open(output_path, "w") as out:
        while heap:
            _, fi, rest = heapq.heappop(heap)
            out.write(rest)
            line = files[fi].readline()
            if line:
                gid, rest = line.split("\t", 1)
                heapq.heappush(heap, (int(gid), fi, rest))
    for f, p in zip(files, shards):
        f.close()
        os.remove(p)
        if os.path.exists(p + ".done"):
            os.remove(p + ".done")
