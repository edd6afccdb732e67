"""The FULL alignment pipeline on a device mesh: inside use_mesh every
batched kernel call the engine makes — cascade windowed bounds, banded
score passes, full fills — runs sharded over the mesh, bit-exact with
single-device execution (no reference counterpart — the reference's
scale-out is OpenMP threads over pairs, align_benchmark.c:232-306).
Also shows the venue counters and the memory report (the mm_allocator
occupancy analogue, mm_allocator.c:573-604)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from quicked_tpu import generate
from quicked_tpu.aligner import batch as engine
from quicked_tpu.aligner.cascade import quicked_cascade_batch
from quicked_tpu.params import QuickedParams
from quicked_tpu.parallel.mesh import make_mesh, use_mesh
from quicked_tpu.utils import memreport

pairs = list(generate.generate_pairs(12, 400, error=0.08, seed=21))

single = quicked_cascade_batch(pairs, QuickedParams())

mesh = make_mesh()
before = engine.venue_snapshot()
with use_mesh(mesh):
    meshed = quicked_cascade_batch(pairs, QuickedParams())
after = engine.venue_snapshot()

assert list(single.score) == list(meshed.score)
assert single.cigar == meshed.cigar
venues = {k: after[k] - before.get(k, 0) for k in after
          if after[k] != before.get(k, 0)}
print(f"devices: {mesh.devices.size}; venues under mesh: {venues}")
print(f"scores: {list(meshed.score)[:6]}... (bit-exact vs single-device)")
memreport.print_report(sys.stdout)
