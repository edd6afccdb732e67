"""Python-binding example — mirrors the reference's
examples/bindings/basic.py (which imports the pybind11 module
``pyquicked``; here the repo-root shim provides the same surface)."""

from pyquicked import QuickedAligner, QuickedException

pattern = "ACGT"  # Pattern sequence
text = "ACTT"     # Text sequence
score = -1        # Alignment score
cigar = ""        # CIGAR string

try:
    aligner = QuickedAligner()    # Sensible default parameters (QUICKED)
    aligner.align(pattern, text)  # Align the sequences!
    score = aligner.getScore()    # Get the score
    cigar = aligner.getCigar()    # Get the CIGAR string
except QuickedException as e:
    print(e)

print(f"Score: {score}")
print(f"Cigar: {cigar}")
