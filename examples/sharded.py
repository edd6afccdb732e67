"""Data-parallel alignment over all visible devices: lanes sharded over
a jax.sharding.Mesh with shard_map (no reference counterpart — replaces
host threads with chips)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

from quicked_tpu import generate
from quicked_tpu.ops.batch_prep import extract_final_scores, prepare_banded_batch
from quicked_tpu.parallel.mesh import make_mesh, run_banded_sharded

mesh = make_mesh()
n = max(8, 2 * mesh.devices.size)
pairs = list(generate.generate_pairs(n, 300, error=0.1, seed=12))

cutoffs = [max(len(p), len(t)) * 40 // 100 for p, t in pairs]
batch = prepare_banded_batch([p for p, _ in pairs], [t for _, t in pairs],
                             cutoffs, full=False, pad_to_b=n)
out = run_banded_sharded(batch, mesh)
scores = extract_final_scores(batch, out["scores_by_k"][:, :n])
print(f"devices: {mesh.devices.size}; scores: {np.asarray(scores)}")
