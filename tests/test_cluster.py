"""Distributed KMeans (functions/cluster.py): serial-reference equivalence,
block-count invariance, empty-cluster carryover, tie-break determinism."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from phenobert_ray.functions import cluster as clu


def _serial_kmeans(emb: np.ndarray, vec_ids: np.ndarray, k: int, iters: int):
    """Single-process reference of the exact same fixed-point algorithm,
    with the cost computed the NAIVE way (explicit Σ (R·q − M)² per
    cluster, no matmul expansion) to cross-check the expanded form."""
    q = np.floor(emb.astype(np.float64) * clu.QUANT + 0.5).astype(np.int64)
    order = np.argsort(vec_ids)
    q, vec_ids = q[order], vec_ids[order]
    M = clu.R * q[vec_ids < k][np.argsort(vec_ids[vec_ids < k])]

    def naive_assign(M_):
        cost = ((clu.R * q[:, None, :] - M_[None, :, :]) ** 2).sum(axis=2)
        return np.argmin(cost, axis=1)

    for _ in range(iters):
        a = naive_assign(M)
        M_new = M.copy()
        for c in range(k):
            m = a == c
            if m.any():
                M_new[c] = clu._rounded_div(
                    q[m].sum(axis=0), np.int64(m.sum())
                )
        M = M_new
    return vec_ids, naive_assign(M), M


def _write_emb(dirpath, emb: np.ndarray, vec_ids: np.ndarray):
    t = pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in emb], pa.list_(pa.float32())
            ),
            "label": pa.array(np.zeros(len(emb), dtype=np.int32)),
        }
    )
    pq.write_table(t, f"{dirpath}/embeddings.parquet")
    return str(dirpath)


def test_kmeans_matches_serial_reference(sf_small):
    t = pq.read_table(
        f"{sf_small}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    emb = np.stack(t.column("embedding").to_numpy(zero_copy_only=False))
    vids = t.column("vec_id").to_numpy()
    want_ids, want_a, _ = _serial_kmeans(emb, vids, clu.K_CLUSTERS, clu.ITERS)
    got = clu.kmeans_assign(sf_small).to_pandas().sort_values("vec_id")
    assert got["vec_id"].to_numpy().tolist() == want_ids.tolist()
    assert got["cluster"].to_numpy().tolist() == want_a.tolist()
    # sanity: more than one cluster actually populated
    assert got["cluster"].nunique() > 1


def test_kmeans_block_count_invariance(tmp_path):
    rng = np.random.default_rng(7)
    emb = rng.normal(scale=0.3, size=(97, clu.DIM)).astype(np.float32)
    d = _write_emb(tmp_path, emb, np.arange(97))
    base = clu.kmeans_assign(d, k=4, iters=2).to_pandas().sort_values("vec_id")

    import ray

    # same data, many tiny blocks: identical assignments
    qds_many = ray.data.read_parquet(
        f"{d}/embeddings.parquet", override_num_blocks=13
    )
    # go through the public path but with a re-sharded file layout instead:
    sub = tmp_path / "many"
    sub.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(97), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in emb], pa.list_(pa.float32())
                ),
            }
        ),
        f"{sub}/embeddings.parquet",
        row_group_size=8,
    )
    again = clu.kmeans_assign(str(sub), k=4, iters=2).to_pandas().sort_values("vec_id")
    assert base["cluster"].tolist() == again["cluster"].tolist()
    assert qds_many.count() == 97


def test_kmeans_empty_cluster_keeps_seed(tmp_path):
    # seeds 0 and 1 are IDENTICAL points: every point ties and goes to
    # cluster 0, so cluster 1 is empty from round 1 and must carry its
    # seed centroid through every update (coalesce path), with no crash
    # and no drift
    emb = np.full((12, clu.DIM), 0.25, dtype=np.float32)
    d = _write_emb(tmp_path, emb, np.arange(12))
    qds, M = clu._fit(d, k=2, iters=3)
    q_seed = np.floor(np.float64(0.25) * clu.QUANT + 0.5)
    assert (M[1] == clu.R * q_seed).all()  # empty cluster kept its seed
    got = clu.kmeans_assign(d, k=2, iters=3).to_pandas()
    assert set(got["cluster"].unique()) == {0}


def test_kmeans_tie_breaks_to_smallest_cluster(tmp_path):
    # two identical seeds: every equidistant point must pick the smaller id
    emb = np.zeros((10, clu.DIM), dtype=np.float32)
    emb[:, 0] = 0.2  # all points identical => all costs tie across both seeds
    d = _write_emb(tmp_path, emb, np.arange(10))
    got = clu.kmeans_assign(d, k=2, iters=2).to_pandas()
    assert set(got["cluster"].unique()) == {0}


def test_kmeans_bound_guard():
    with pytest.raises(ValueError):
        clu._check_bounds(np.array([2**27], dtype=np.int64))


def test_rounded_div_matches_duckdb_semantics():
    import duckdb

    s = np.array([-7, -5, -1, 0, 1, 5, 7, -1000, 999], dtype=np.int64)
    n = np.array([3, 2, 4, 5, 4, 2, 3, 7, 11], dtype=np.int64)
    got = clu._rounded_div(s, n)
    for si, ni, gi in zip(s, n, got):
        (want,) = duckdb.sql(
            f"""SELECT CASE WHEN {si} < 0
                 THEN -((2 * {clu.R} * ({-si}) + {ni}) // (2 * {ni}))
                 ELSE (2 * {clu.R} * {si} + {ni}) // (2 * {ni}) END"""
        ).fetchone()
        assert gi == want, (si, ni, gi, want)


def test_pca_recovers_planted_direction(tmp_path):
    rng = np.random.default_rng(11)
    d = rng.normal(size=clu.DIM)
    d /= np.linalg.norm(d)
    t = rng.normal(scale=0.3, size=(200, 1))
    noise = rng.normal(scale=0.01, size=(200, clu.DIM))
    emb = (t * d + noise).astype(np.float32)
    dirpath = _write_emb(tmp_path, emb, np.arange(200))
    got = clu.pca_top_direction(dirpath, iters=8).to_pandas().sort_values("dim")
    v = got["v"].to_numpy(dtype=np.float64)
    cos = abs(v @ d) / (np.linalg.norm(v) * np.linalg.norm(d))
    assert cos > 0.99


def test_pca_zero_variance_gives_zero_vector(tmp_path):
    emb = np.full((10, clu.DIM), 0.1, dtype=np.float32)
    dirpath = _write_emb(tmp_path, emb, np.arange(10))
    got = clu.pca_top_direction(dirpath).to_pandas()
    assert (got["v"] == 0).all()


def test_pca_fixed_point_is_bounded(sf_small):
    got = clu.pca_top_direction(sf_small).to_pandas()
    assert len(got) == clu.DIM
    assert got["v"].abs().max() == clu.PCA_SCALE  # rescale pins max to ±SCALE


def test_kmeans_checkpoint_resume_is_bit_exact(tmp_path, sf_small):
    # run 1 round with checkpointing, then resume to 3; must equal a
    # straight 3-round fit exactly (integer state => bit-exact resume)
    ck = str(tmp_path / "ck")
    clu._fit(sf_small, iters=1, checkpoint_dir=ck)
    import os

    assert os.path.exists(f"{ck}/round_1.npy")
    _, m_resumed = clu._fit(sf_small, iters=3, checkpoint_dir=ck)
    assert os.path.exists(f"{ck}/round_3.npy")
    _, m_straight = clu._fit(sf_small, iters=3)
    assert (m_resumed == m_straight).all()
    # assignments identical too
    a = clu.kmeans_assign(sf_small, iters=3, checkpoint_dir=ck).to_pandas()
    b = clu.kmeans_assign(sf_small, iters=3).to_pandas()
    assert a.sort_values("vec_id")["cluster"].tolist() == \
        b.sort_values("vec_id")["cluster"].tolist()


def test_kmeans_checkpoint_shape_guard(tmp_path, sf_small):
    ck = str(tmp_path / "ck2")
    clu._fit(sf_small, k=2, iters=1, checkpoint_dir=ck)
    with pytest.raises(ValueError):
        clu._fit(sf_small, k=4, iters=1, checkpoint_dir=ck)


def test_pq_codes_match_per_subspace_serial(sf_small):
    t = pq.read_table(
        f"{sf_small}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    emb = np.stack(t.column("embedding").to_numpy(zero_copy_only=False))
    vids = t.column("vec_id").to_numpy()
    got = clu.pq_encode(sf_small).to_pandas().sort_values("vec_id")
    q = np.floor(emb.astype(np.float64) * clu.QUANT + 0.5).astype(np.int64)
    order = np.argsort(vids)
    q = q[order]
    sub = clu.DIM // clu.PQ_SUB
    for s in range(clu.PQ_SUB):
        qs = q[:, s * sub : (s + 1) * sub]
        M = clu.R * qs[:clu.PQ_K].copy()
        for _ in range(clu.PQ_ITERS):
            cost = ((clu.R * qs[:, None, :] - M[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(cost, axis=1)
            M_new = M.copy()
            for c in range(clu.PQ_K):
                m = a == c
                if m.any():
                    M_new[c] = clu._rounded_div(
                        qs[m].sum(axis=0), np.int64(m.sum())
                    )
            M = M_new
        cost = ((clu.R * qs[:, None, :] - M[None, :, :]) ** 2).sum(axis=2)
        want = np.argmin(cost, axis=1)
        assert got[f"code_{s}"].to_numpy().tolist() == want.tolist()
        assert len(set(want)) > 1  # codebook actually used


def test_pq_rejects_non_dividing_subspaces(sf_small):
    with pytest.raises(ValueError, match="must divide"):
        clu.pq_encode(sf_small, n_sub=3)
