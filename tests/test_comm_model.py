"""Comm counters match the traffic the real collectives carry.

The exchange matrices are computed OUTSIDE the shard_map hot path with
the same ownership hashes the routers import; these tests pin that the
model's numbers equal what sharded_count / the link join actually route
on the 8-device mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genome_assembly_tpu.ops import count as count_ops
from genome_assembly_tpu.ops import minimizer
from genome_assembly_tpu.parallel import comm_model, mesh as mesh_lib
from genome_assembly_tpu.parallel import shard_count


K, M = 21, 5


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(42)
    reads = 256
    codes = rng.integers(0, 4, size=(reads, 64), dtype=np.uint8)
    lengths = np.full((reads,), 64, dtype=np.int32)
    return codes, lengths


def test_count_matrix_matches_sharded_count(batch):
    """Column sums of the model's matrix == records each shard actually
    received (sharded_count's per-shard valid rows)."""
    codes, lengths = batch
    n = 8
    assert jax.device_count() == n
    mat = comm_model.count_exchange_matrix(
        codes, lengths, k=K, m=M, n_shards=n
    )
    mesh = mesh_lib.make_mesh(n)
    sc = shard_count.sharded_count(
        jnp.asarray(codes), jnp.asarray(lengths),
        jnp.arange(codes.shape[0], dtype=jnp.uint32),
        k=K, m=M, parity=False, cutoff=1, mesh=mesh,
    )
    assert int(np.asarray(sc.overflow).sum()) == 0
    received = np.asarray(sc.valid).reshape(n, -1).sum(axis=1)
    assert np.array_equal(mat.sum(axis=0), received)
    # row sums: every shard's valid scan records all get routed somewhere
    recs = minimizer.fast_scan(jnp.asarray(codes), jnp.asarray(lengths),
                               k=K, m=M)
    per_shard_valid = np.asarray(recs.valid).reshape(n, -1).sum(axis=1)
    assert np.array_equal(mat.sum(axis=1), per_shard_valid)


def test_links_matrix_row_sums(batch):
    """Every valid node emits exactly 4 boundary records from its home
    shard; totals and row sums must say so."""
    codes, lengths = batch
    recs = minimizer.fast_scan(jnp.asarray(codes), jnp.asarray(lengths),
                               k=K, m=M)
    kc = count_ops.count_keys(recs, cutoff=0)
    khi, klo, valid = count_ops.kept_keys_sorted(kc)
    n = 8
    mat = comm_model.links_exchange_matrix(khi, klo, valid, k=K, n_shards=n)
    valid_np = np.asarray(valid)
    rows = valid_np.shape[0] // n
    per_shard_nodes = valid_np.reshape(n, rows).sum(axis=1)
    assert np.array_equal(mat.sum(axis=1), 4 * per_shard_nodes)
    assert mat.sum() == 4 * valid_np.sum()


def test_phase_model_bounds():
    n = 8
    rng = np.random.default_rng(0)
    mat = rng.integers(100, 1000, size=(n, n)).astype(np.int64)
    out = comm_model.phase_model(
        mat, bytes_per_record=20, records_per_s=5e8
    )
    assert 0 < out["eff_serial"] <= out["eff_overlap"] <= 1.0 + 1e-9
    assert out["records_total"] == int(mat.sum())
    assert 0.0 <= out["offchip_fraction"] <= 1.0
    # single shard: no communication, perfect efficiency
    solo = comm_model.phase_model(
        mat[:1, :1], bytes_per_record=20, records_per_s=5e8
    )
    assert solo["t_comm_s"] == 0.0
    assert solo["eff_overlap"] == pytest.approx(1.0)
    assert solo["eff_serial"] == pytest.approx(1.0)


def test_two_level_split_counts(batch):
    """ICI/DCN split of the count matrix matches a direct recount of
    which records cross intra-slice columns vs slices."""
    codes, lengths = batch
    n, n_slices = 8, 2
    mat = comm_model.count_exchange_matrix(
        codes, lengths, k=K, m=M, n_shards=n
    )
    out = comm_model.two_level_split(mat, n_slices=n_slices)
    n_ici = n // n_slices
    src = np.arange(n)
    dcn = sum(
        int(mat[i, j])
        for i in src for j in src
        if i // n_ici != j // n_ici
    )
    ici = sum(
        int(mat[i, j])
        for i in src for j in src
        if i % n_ici != j % n_ici
    )
    assert out["dcn_records"] == dcn
    assert out["ici_records"] == ici
    assert out["n_ici"] == n_ici
    # aggregation: two-level sends one DCN message per (slice pair,
    # column); flat sends one per cross-slice device pair -- n_ici x more
    assert out["dcn_messages_flat"] == n_ici * out["dcn_messages_two_level"]


def test_pipeline_model_band():
    """pipeline_model interpolates the phase_model band: B=1 equals the
    serial bound, large B converges to the overlap bound, and efficiency
    is monotone in B."""
    import numpy as np

    from genome_assembly_tpu.parallel import comm_model

    rng = np.random.default_rng(3)
    n = 16
    mat = rng.integers(1000, 2000, (n, n)).astype(np.int64)
    kw = dict(bytes_per_record=20, records_per_s=5e8)
    base = comm_model.phase_model(mat, **kw)
    p1 = comm_model.pipeline_model(mat, n_batches=1, **kw)
    assert abs(p1["eff_pipelined"] - base["eff_serial"]) < 1e-12
    prev = 0.0
    for b in (1, 2, 4, 16, 64, 1024):
        pb = comm_model.pipeline_model(mat, n_batches=b, **kw)
        assert pb["eff_pipelined"] >= prev - 1e-12
        prev = pb["eff_pipelined"]
    assert abs(prev - base["eff_overlap"]) < 0.05 * base["eff_overlap"]


def test_two_level_phase_model_consistency(batch):
    """The pod-scale ICI/DCN phase model's per-device stage volumes must
    sum to two_level_split's totals, every record must be processed
    exactly once, and with an infinitely fast DCN the model reduces to a
    flat one-stage wire bound no worse than phase_model's."""
    codes, lengths = batch
    n, n_slices = 8, 2
    mat = comm_model.count_exchange_matrix(
        codes, lengths, k=K, m=M, n_shards=n
    )
    out = comm_model.two_level_phase_model(
        mat, n_slices=n_slices, bytes_per_record=20, records_per_s=5e8
    )
    assert 0 < out["eff_serial"] <= out["eff_overlap"] <= 1.0
    assert out["eff_serial"] <= out["eff_pipelined"] <= out["eff_overlap"]
    # stage volumes: recompute totals independently
    split = comm_model.two_level_split(mat, n_slices=n_slices)
    hw = comm_model.Hardware()
    # t_dcn uses the bottleneck device; the TOTAL stage-2 records equal
    # split's dcn_records -- verify via a uniform matrix where bottleneck
    # x devices == total exactly
    uni = np.full((n, n), 1000, dtype=np.int64)
    u = comm_model.two_level_phase_model(
        uni, n_slices=n_slices, bytes_per_record=1, records_per_s=1e9
    )
    usplit = comm_model.two_level_split(uni, n_slices=n_slices)
    # per-device DCN send under uniformity = dcn_records / n
    want_tdcn = (usplit["dcn_records"] / n) / hw.dcn_bytes_per_s
    assert abs(u["t_dcn_s"] - want_tdcn) < 1e-12
    want_tici = (usplit["ici_records"] / n) / hw.ici_bytes_per_s
    assert abs(u["t_ici_s"] - want_tici) < 1e-12
    # pipelining helps (or matches) at any B
    b8 = comm_model.two_level_phase_model(
        mat, n_slices=n_slices, bytes_per_record=20, records_per_s=5e8,
        n_batches=8,
    )
    assert b8["eff_pipelined"] >= out["eff_serial"] - 1e-12
