"""Sanitizer driver for the native C kernels (no JAX imports).

Run under an ASAN/UBSAN build of libquicked_host.so (CI `sanitize` job):

    gcc -O1 -g -fsanitize=address,undefined -fno-sanitize=shift -shared \
        -fPIC -o quicked_tpu/native/libquicked_host.so \
        quicked_tpu/native/src/quicked_host.c -lasan -lubsan
    LD_PRELOAD=$(gcc -print-file-name=libasan.so) \
        ASAN_OPTIONS=detect_leaks=0 python tests/sanitize_native.py

JAX/XLA cannot run under an ASAN preload (its allocator trips the
interceptors), so this drives every native entry point directly with
randomized and edge-shaped inputs and cross-checks cheap invariants;
bit-exactness vs the kernels is covered by the regular suite.
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from quicked_tpu import generate, native  # noqa: E402
from quicked_tpu.ops import myers_np  # noqa: E402


def main():
    assert native.available(), "native lib failed to load"
    rng = np.random.default_rng(11)

    # cigar machinery
    ops = "MMMXMMIMMDDMMM" * 51
    assert native.cigar_score_edit(ops) == sum(1 for o in ops if o != "M")
    native.cigar_sprint(ops, True)
    native.cigar_sprint(ops, False)
    native.cigar_sam(ops)
    assert native.cigar_check("MXM", b"GAT", b"GTT")
    assert not native.cigar_check("MMM", b"GAT", b"GTT")
    native.encode_dna(b"ACGTNacgtn\x00\xff")

    # .seq batch reader incl. truncated record
    data = b">ACGT\n<ACGA\n>GG\n<GGT\n>TRUNC"
    pairs, consumed = native.read_seq_batch(data, 10)
    assert pairs == [("ACGT", "ACGA"), ("GG", "GGT")]
    assert consumed == 21

    # banded score + full align across sizes incl. 64-multiples and
    # length-skewed pairs (band-edge shapes)
    for n, (L, e) in enumerate([(64, 0.05), (100, 0.2), (128, 0.1),
                                (1000, 0.1), (2048, 0.25), (5000, 0.08)]):
        for p, t in generate.generate_pairs(3, L, error=e, seed=n):
            pe = native.encode_dna(p.encode())
            te = native.encode_dna(t.encode())
            cutoff = max(len(p), len(t)) * 15 // 100
            st = native.banded_score(pe, te, cutoff, len(t), len(t),
                                     want_state=True)
            ref = myers_np.banded_score(myers_np.compile_pattern(p),
                                        te, cutoff)
            assert st["score"] == ref.score, (L, e, st["score"], ref.score)
            sc2, ops2 = native.banded_align_full(pe, p.encode(), te,
                                                 t.encode(), cutoff)
            assert native.cigar_check(ops2, p.encode(), t.encode())
            assert native.cigar_score_edit(ops2) == sc2

    # Hirschberg half-pass shapes: text_finish < text_len
    p, t = next(iter(generate.generate_pairs(1, 4096, error=0.1, seed=9)))
    pe, te = native.encode_dna(p.encode()), native.encode_dna(t.encode())
    native.banded_score(pe, te, 614, len(t), len(t) // 2, want_state=True)

    # windowed score/full at the supported window sizes + bound checks
    for ws in (2, 9, 16):
        for p, t in generate.generate_pairs(2, 700, error=0.15, seed=ws):
            pe = native.encode_dna(p.encode())
            te = native.encode_dna(t.encode())
            sc, hew = native.windowed_score(pe, p.encode(), te, t.encode(),
                                            ws, 1, 40)
            assert sc >= 0 and hew >= 0
            ops3 = native.windowed_full(pe, p.encode(), te, t.encode(), ws, 1)
            assert native.cigar_check(ops3, p.encode(), t.encode())
    for bad_ws in (17, 64):
        try:
            native.windowed_score(np.zeros(4, np.uint8), b"AAAA",
                                  np.zeros(4, np.uint8), b"AAAA",
                                  bad_ws, 1, 40)
        except ValueError:
            pass
        else:
            raise AssertionError("ws > 16 not rejected")

    # random fuzz: short junk sequences through every aligner entry
    for _ in range(50):
        lp = int(rng.integers(1, 80))
        lt = int(rng.integers(1, 80))
        p = bytes(rng.integers(65, 91, lp, dtype=np.uint8))
        t = bytes(rng.integers(65, 91, lt, dtype=np.uint8))
        pe, te = native.encode_dna(p), native.encode_dna(t)
        native.banded_score(pe, te, 65, lt, lt, want_state=True)
        sc4, ops4 = native.banded_align_full(pe, p, te, t, 65)
        assert native.cigar_check(ops4, p, t)
        native.windowed_score(pe, p, te, t, 2, 1, 40)
        native.windowed_full(pe, p, te, t, 2, 1)

    print("sanitize_native: OK")


if __name__ == "__main__":
    main()
