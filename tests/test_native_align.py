"""Native single-pair API (qh_align / qh_hirschberg) vs the exact model."""

import pytest

from quicked_tpu import dna, generate, native
from quicked_tpu.cigar import Cigar
from quicked_tpu.ops import myers_np
from quicked_tpu.api import _align_one_np
from quicked_tpu.params import QuickedAlgo, QuickedParams

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C toolchain")


def test_native_hirschberg_matches_model(monkeypatch):
    for L, e, bw, budget in [(3000, 0.1, 15, 1 << 16),
                             (5000, 0.25, 5, 1 << 18)]:
        for seed in range(2):
            (p, t), = generate.generate_pairs(1, L, error=e, seed=seed)
            cutoff = max(len(p), len(t)) * bw // 100
            monkeypatch.setattr(myers_np, "HIRSCHBERG_BUFFER", budget)
            st_m, ops_m = myers_np.hirschberg(t, p, cutoff)
            st_c, ops_c = native.hirschberg(dna.encode(p), p.encode(),
                                            dna.encode(t), t.encode(),
                                            cutoff, budget)
            assert int(st_m) == st_c
            assert ops_m == ops_c


def test_native_align_one_all_algos():
    algos = [(0, QuickedAlgo.QUICKED), (1, QuickedAlgo.BANDED),
             (2, QuickedAlgo.WINDOWED), (3, QuickedAlgo.HIRSCHBERG)]
    for seed in range(2):
        (p, t), = generate.generate_pairs(1, 400, error=0.12,
                                          seed=seed + 20)
        for code, algo in algos:
            modes = (False, True) if code in (1, 2) else (False,)
            for oscore in modes:
                st_c, sc_c, ops_c = native.align_one(
                    code, p.encode(), t.encode(), only_score=oscore)
                st_m, sc_m, cig_m = _align_one_np(p, t, QuickedParams(
                    algo=algo, only_score=oscore, use_kernels=False))
                cig_c = (Cigar(operations=ops_c).sprint(True)
                         if ops_c else None)
                assert sc_c == sc_m, (algo, oscore)
                assert (cig_c or None) == (cig_m or None), (algo, oscore)


def test_native_align_one_empty():
    st, _, _ = native.align_one(0, b"", b"ACGT")
    assert st == -4   # QUICKED_EMPTY_SEQUENCE


def test_native_align_one_window_too_deep():
    # the C WindowEd kernels hold at most 16 window blocks on the
    # stack (QH_WS_MAX); window-consuming algos must error cleanly
    # instead of overflowing (quicked_host.c qh_align guard)
    for code in (0, 2):   # QUICKED, WINDOWED
        st, _, _ = native.align_one(code, b"ACGT" * 50, b"ACGA" * 50,
                                    window_size=17)
        assert st == -10   # QUICKED_UNIMPLEMENTED
    # non-window algos ignore the window params (reference parity)
    st, sc, _ = native.align_one(1, b"ACGT" * 50, b"ACGA" * 50,
                                 window_size=17, only_score=True)
    assert st == 0 and sc >= 0
