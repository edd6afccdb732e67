"""L0 unit tests: DNA encoding, CIGAR utilities, IO, generator."""

import io

import numpy as np
import pytest

from quicked_tpu import dna, seqio, generate
from quicked_tpu.cigar import Cigar
from quicked_tpu.params import QuickedStatus, check_error, status_msg


def test_dna_encode():
    enc = dna.encode("ACGTNacgtnZ@")
    assert list(enc) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 4, 4]
    assert dna.decode(enc[:5]) == "ACGTN"


def test_status():
    assert check_error(QuickedStatus.QUICKED_EMPTY_SEQUENCE)
    assert not check_error(QuickedStatus.QUICKED_WIP)
    assert "empty sequence" in status_msg(QuickedStatus.QUICKED_EMPTY_SEQUENCE)


def test_cigar_roundtrip():
    c = Cigar.from_rle("5M1X2I3D")
    assert c.operations == "MMMMMXIIDDD"
    assert c.score_edit() == 6
    assert c.sprint(True) == "5M1X2I3D"
    assert c.sprint(False) == "1X2I3D"
    assert c.sprint_sam(False) == "6M2I3D"
    assert c.sprint_sam(True) == "5=1X2I3D"
    # leading-mismatch quirk: the reference latches the first op BEFORE
    # the X->M mapping (cigar.c:210), so a leading X run stays X even
    # with show_mismatches=False
    assert Cigar(operations="XMM").sprint_sam(False) == "1X2M"
    assert Cigar(operations="XXMM").sprint_sam(False) == "1X3M"
    assert Cigar(operations="MXM").sprint_sam(False) == "3M"


def test_cigar_check():
    #   pattern GAT, text GTT -> M X M
    c = Cigar(operations="MXM")
    assert c.check_alignment("GAT", "GTT")
    assert not c.check_alignment("GAT", "GAT")  # X where chars equal
    assert not Cigar(operations="MM").check_alignment("GAT", "GTT")


def test_cigar_check_non_ascii():
    # Distinct non-ASCII characters must not validate as M: the native
    # fast path encodes ascii-with-replace (collapsing them to '?'), so
    # non-ASCII input must take the true char-compare path.
    c = Cigar(operations="M")
    assert not c.check_alignment("é", "ü")
    assert c.check_alignment("é", "é")


def test_native_windowed_rejects_wide_window():
    import pytest

    from quicked_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    import numpy as np
    e = np.zeros(4, dtype=np.uint8)
    with pytest.raises(ValueError):
        native.windowed_score(e, b"AAAA", e, b"AAAA", 17, 1, 40)
    with pytest.raises(ValueError):
        native.windowed_full(e, b"AAAA", e, b"AAAA", 17, 1)


def test_cigar_cmp():
    a = Cigar(operations="MMX")
    b = Cigar(operations="MMX")
    assert a.cmp(b) == 0 and a == b
    assert a.cmp(Cigar(operations="MMI")) != 0


def test_seqio_roundtrip():
    buf = io.StringIO()
    pairs = [("ACGT", "ACGG"), ("TTTT", "TTAT")]
    seqio.write_seq_pairs(buf, pairs)
    buf.seek(0)
    assert list(seqio.read_seq_pairs(buf)) == pairs


def test_generator_properties():
    pairs = list(generate.generate_pairs(20, 100, error=0.1, seed=7))
    assert len(pairs) == 20
    for pat, text in pairs:
        assert len(text) == 100
        assert set(pat) <= set("ACGT")
        # pattern is derived from text with ~10 errors
        assert abs(len(pat) - 100) <= 10


def test_generator_length_diff():
    pairs = list(generate.generate_pairs(5, 100, error=0.0, length_diff=1.5,
                                         seed=1))
    for pat, text in pairs:
        assert len(text) == 150
        assert len(pat) == 100
        assert pat in text  # extracted, no errors


def test_only_score_nulls_cigar_every_algo():
    # extract_results (quicked.c:34-56): only_score keeps the cigar
    # NULL for EVERY algorithm, and the score matches the full run's
    from quicked_tpu import generate
    from quicked_tpu.api import align_pair
    from quicked_tpu.params import QuickedAlgo, QuickedParams

    (p, t), = generate.generate_pairs(1, 300, error=0.1, seed=41)
    for algo in (QuickedAlgo.QUICKED, QuickedAlgo.BANDED,
                 QuickedAlgo.HIRSCHBERG, QuickedAlgo.WINDOWED):
        for use_kernels in (False, True):
            params = QuickedParams(algo=algo, use_kernels=use_kernels)
            _, s_full, c_full = align_pair(p, t, params)
            _, s_only, c_only = align_pair(
                p, t, params.replace(only_score=True))
            assert c_only is None, (algo, use_kernels, c_only)
            assert c_full is not None, (algo, use_kernels)
            assert s_only == s_full, (algo, use_kernels)
