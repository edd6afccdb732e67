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

    deadline = time.time() + timeout_s
    while time.time() < deadline:
        done = glob.glob(f"{output_path}.shard*.done")
        if len(done) >= process_count:
            return
        time.sleep(0.5)
    raise TimeoutError(
        f"distributed merge: only {len(glob.glob(f'{output_path}.shard*.done'))}"
        f"/{process_count} shards completed within {timeout_s}s")


def _merge_shards(output_path: str, process_count: int) -> None:
    """Input-ordered merge of per-process shard files (k-way by id)."""
    rows = []
    for shard in sorted(glob.glob(f"{output_path}.shard*")):
        if shard.endswith(".done"):
            os.remove(shard)
            continue
        with open(shard) as f:
            for line in f:
                gid, rest = line.split("\t", 1)
                rows.append((int(gid), rest))
        os.remove(shard)
    rows.sort()
    with open(output_path, "w") as out:
        for _, rest in rows:
            out.write(rest)
