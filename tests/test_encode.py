"""Codec and packing unit tests (reference semantics: binning.c:69-145)."""

import numpy as np
import pytest

import jax.numpy as jnp

from genome_assembly_tpu.ops import encode


def test_code_order_matches_reference():
    # T=0, G=1, C=2, A=3 (binning.c:69-111)
    assert encode.encode_str("TGCA").tolist() == [0, 1, 2, 3]
    assert encode.decode_str(np.array([0, 1, 2, 3])) == "TGCA"


def test_unknown_chars_score_as_A():
    # getval default returns 3 (binning.c:107-109)
    assert encode.encode_str("N").tolist() == [3]
    assert encode.score_str("NN") == 15


def test_score_matches_reference_examples():
    # README.md:45-48: higher score = lexicographically smaller string
    assert encode.score_str("T") == 0
    assert encode.score_str("A") == 3
    assert encode.score_str("AA") > encode.score_str("AT")
    assert encode.score_str("CTTT") == 2 * 64  # the extension start mmer, score 128
    assert encode.score_str("CTTT") == 128


def test_windowed_scores_match_score_str():
    s = "ACGTTGCAATCGGCTA"
    codes = jnp.asarray(encode.encode_str(s))[None, :]
    for m in (1, 3, 4, 7):
        got = np.asarray(encode.windowed_scores(codes, m))[0]
        want = [encode.score_str(s[i : i + m]) for i in range(len(s) - m + 1)]
        assert got.tolist() == want


@pytest.mark.parametrize("k", [6, 16, 17, 21, 31])
def test_pack_kmers_roundtrip(k):
    rng = np.random.default_rng(0)
    codes_np = rng.integers(0, 4, size=(3, 40), dtype=np.uint8)
    hi, lo = encode.pack_kmers(jnp.asarray(codes_np), k)
    hi, lo = np.asarray(hi), np.asarray(lo)
    for b in range(3):
        for i in range(40 - k + 1):
            window = encode.decode_str(codes_np[b, i : i + k])
            packed = encode.split_to_int(hi[b, i], lo[b, i], k)
            assert encode.unpack_int(packed, k) == window
            assert packed == encode.score_str(window)


@pytest.mark.parametrize("k", [6, 16, 21, 31])
def test_complement_packed(k):
    rng = np.random.default_rng(1)
    codes_np = rng.integers(0, 4, size=(2, 36), dtype=np.uint8)
    hi, lo = encode.pack_kmers(jnp.asarray(codes_np), k)
    chi, clo = encode.complement_packed(hi, lo, k)
    comp_codes = 3 - codes_np
    whi, wlo = encode.pack_kmers(jnp.asarray(comp_codes), k)
    assert np.array_equal(np.asarray(chi), np.asarray(whi))
    assert np.array_equal(np.asarray(clo), np.asarray(wlo))


def test_split_int_roundtrip():
    for k in (1, 15, 16, 17, 31):
        v = (1 << (2 * k)) - 5
        hi, lo = encode.int_to_split(v, k)
        assert encode.split_to_int(hi, lo, k) == v
