"""Basic example: align two sequences with the default QUICKED algorithm
(examples/basic.c parity)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from quicked_tpu.api import QuickedAligner

aligner = QuickedAligner()          # default params: QUICKED algorithm

pattern = "ACGT"
text = "ACTT"

print(f"Aligning '{pattern}' and '{text}' using Quicked")
aligner.align(pattern, text)
print(f"Score: {aligner.get_score()}")
print(f"CIGAR: {aligner.get_cigar()}")
