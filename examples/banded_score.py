"""BANDED algorithm, score-only mode (examples/banded_score.c parity)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from quicked_tpu.api import QuickedAligner
from quicked_tpu.params import QuickedAlgo, QuickedParams

params = QuickedParams(algo=QuickedAlgo.BANDED, bandwidth=10,
                       only_score=True)
aligner = QuickedAligner(params)

pattern = "ACGT"
text = "ACTT"

print(f"Aligning '{pattern}' and '{text}' using Banded (score only)")
aligner.align(pattern, text)
print(f"Score: {aligner.get_score()}")
print(f"CIGAR: {aligner.get_cigar()}")   # "NULL": no CIGAR computed
