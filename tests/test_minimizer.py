"""Differential tests: JAX scans vs the executable Python spec."""

import numpy as np
import pytest

import jax.numpy as jnp

from genome_assembly_tpu.io import reads as reads_io
from genome_assembly_tpu.ops import encode, minimizer
from genome_assembly_tpu.parity import model


def _random_reads(rng, n, lo, hi):
    return [
        "".join(rng.choice(list("ACGT"), size=rng.integers(lo, hi + 1)))
        for _ in range(n)
    ]


def _records_from_scan(records, read_batch, k, m):
    """Decode device WindowRecords into (read_id, window) -> (sig, kmer)."""
    mmer = np.asarray(records.mmer)
    khi = np.asarray(records.kmer_hi)
    klo = np.asarray(records.kmer_lo)
    valid = np.asarray(records.valid)
    out = {}
    for b in range(mmer.shape[0]):
        rid = int(read_batch.read_ids[b])
        for i in range(mmer.shape[1]):
            if not valid[b, i]:
                continue
            sig = encode.unpack_int(int(mmer[b, i]), m)
            kmer = encode.unpack_int(
                encode.split_to_int(khi[b, i], klo[b, i], k), k
            )
            out[(rid, i)] = (sig, kmer)
    return out


@pytest.mark.parametrize("k,m", [(6, 3), (8, 4), (31, 4), (21, 7), (14, 7)])
def test_parity_scan_matches_model(k, m):
    rng = np.random.default_rng(42)
    reads = _random_reads(rng, 40, max(k, 10), 64)
    # include edge cases: exactly k, shorter than k, empty
    reads += ["".join(rng.choice(list("ACGT"), size=k)), "ACG"[: min(3, k - 1)], ""]
    (batch,) = reads_io.batch_reads(reads, max_len=64)
    got = _records_from_scan(
        minimizer.parity_scan(
            jnp.asarray(batch.codes), jnp.asarray(batch.lengths), k=k, m=m
        ),
        batch,
        k,
        m,
    )
    want = {
        (rec.read_id, rec.window): (rec.signature, rec.kmer)
        for rec in model.scan_reads(reads, k, m)
    }
    assert got == want


def test_parity_scan_stale_signature_quirk():
    """A read engineered so the stale-signature quirk changes the result.

    With k=6, m=3: at window 0 the signature is chosen; windows that still
    contain it must NOT rescan even if a better m-mer enters on the right
    (binning.c:993-1021 dead branch)."""
    k, m = 6, 3
    # At window 2 the stale signature (chosen at position 4 during window 1's
    # rescan) persists even though the m-mer entering at position 5 would win
    # a fresh scan.
    read = "TGGCCAAAATGT"
    recs = model.scan_read(read, 0, k, m)
    (batch,) = reads_io.batch_reads([read], max_len=32)
    got = _records_from_scan(
        minimizer.parity_scan(
            jnp.asarray(batch.codes), jnp.asarray(batch.lengths), k=k, m=m
        ),
        batch,
        k,
        m,
    )
    want = {(r.read_id, r.window): (r.signature, r.kmer) for r in recs}
    assert got == want
    # sanity: the quirk actually bites here -- some window's signature differs
    # from what a fresh full rescan would choose.
    mask = (1 << (2 * m)) - 1
    diverged = False
    for r in recs:
        window = read[r.window : r.window + k]
        best = max(
            range(len(window) - m + 1),
            key=lambda p: max(
                encode.score_str(window[p : p + m]),
                mask - encode.score_str(window[p : p + m]),
            ),
        )
        if r.window + best != r.sig_pos:
            diverged = True
    assert diverged


def test_model_complement_is_not_reversed():
    # SURVEY.md 2.1.1: complement without reversal (README.md:56-62 example)
    assert model.complement_str("AAGTCC") == "TTCAGG"


@pytest.mark.parametrize("k,m", [(6, 3), (31, 4), (21, 7)])
def test_fast_scan_canonical(k, m):
    rng = np.random.default_rng(3)
    reads = _random_reads(rng, 20, k, 64)
    (batch,) = reads_io.batch_reads(reads, max_len=64)
    rec = minimizer.fast_scan(
        jnp.asarray(batch.codes), jnp.asarray(batch.lengths), k=k, m=m
    )
    khi, klo = np.asarray(rec.kmer_hi), np.asarray(rec.kmer_lo)
    wmin = np.asarray(rec.mmer)
    valid = np.asarray(rec.valid)
    comp = str.maketrans("ACGT", "TGCA")
    mask = (1 << (2 * m)) - 1
    for b, read in enumerate(reads):
        for i in range(len(read) - k + 1):
            assert valid[b, i]
            window = read[i : i + k]
            rc = window.translate(comp)[::-1]
            fwd_v = encode.score_str(window)
            rc_v = encode.score_str(rc)
            want = min(fwd_v, rc_v)
            got = encode.split_to_int(khi[b, i], klo[b, i], k)
            assert got == want, (read, i)
            # minimizer: min over m-windows of min(mmer, true RC) -- a
            # strand-symmetric key (same for the window and its RC)
            want_m = min(
                min(
                    encode.score_str(sub),
                    encode.score_str(sub.translate(comp)[::-1]),
                )
                for p in range(k - m + 1)
                for sub in [window[p : p + m]]
            )
            assert int(wmin[b, i]) == want_m
            rc_window = window.translate(comp)[::-1]
            want_m_rc = min(
                min(
                    encode.score_str(sub),
                    encode.score_str(sub.translate(comp)[::-1]),
                )
                for p in range(k - m + 1)
                for sub in [rc_window[p : p + m]]
            )
            assert want_m == want_m_rc
