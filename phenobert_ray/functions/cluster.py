"""Distributed KMeans (Lloyd's) over the ``embeddings`` table — the
unsupervised clustering operator of the LLM-data family (document
clustering for mixture balancing, SemDeDup-style cluster-then-dedup,
IVF codebook training).  Unlike ``ann.kmeans_ivf`` (which fits centroids
on a bounded sample), this is the FULL iterative fit: every vector
participates in every round.

Input contract: ``vec_id`` is a PRIMARY KEY (vector ids are generated,
not crawled).  The family's quantized SQL oracles key their sample /
seed / join steps on vec_id, so duplicate ids make engine and oracle
legitimately disagree on which row a given id denotes (probed, review
r4 w9) — unlike the documents table, where row-distinct semantics are
defined and oracled (see textstats._bpe_units_sql).

Shape at 100 TB:
- the quantized projection (vec_id, q[64], q2) is materialized ONCE —
  it is the iteration working set (~0.5 KB/vec, no floats, no text),
  exactly like PageRank's edge projection; the raw table is read once.
- each round is ONE combiner-first exchange: blocks assign locally
  against the broadcast centroid matrix (k×64 ints via ``ray.put``,
  read once per worker) and emit ≤ k×65 partial rows per block
  (per-cluster per-dim coordinate sums + counts); ``two_phase_groupby``
  merges them and the driver only ever holds the k×65 centroid state.
  Nothing driver-side grows with block count or corpus size.
- assignment is a blocked int64 matmul (B×64 @ 64×k) — vectorized,
  no per-row loop.

Exactness (the reason everything is integers): true Lloyd centroids are
RATIONAL (Σx / n), and comparing exact rationals across clusters with
different denominators doesn't vectorize into int64.  Instead centroids
live on a fixed-point grid at 1/R of a quantization step:

    point  q  = floor(f·QUANT + 0.5)                (identical in DuckDB)
    M_c       = round_half_away(R·Σq / n)           (exact int division)
    cost(x,c) = Σ_dim (R·q − M_c)²                  (pure int64)

so both engines argmin over IDENTICAL integers — no float summation-
order hazard, bit-exact assignments, SQL-oracle-able as chained CTEs
(one CTE pair per Lloyd round, the PageRank oracle pattern).  Ties
break to the smallest cluster id in both engines (np.argmin first-hit
== ORDER BY cost, cluster).  Empty clusters keep their previous
centroid (coalesce in both engines).  Division rounds half away from
zero on the absolute value, sidestepping the DuckDB-truncates /
numpy-floors divergence on negatives.

int64 bounds: cost terms are ≤ 64·(2R·max|q|)² — independent of
cluster size n (the reason fixed-point beats the n²-scaled-rational
formulation, whose cross-cluster comparison is also just wrong: the
scale factor differs per cluster).  Safe while max|q| < 2²²;
``_check_bounds`` raises past it.  The sum 2R·|Σq| stays < 2⁶³ up to
n ≈ 10¹⁴ members per cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

DIM = 64
QUANT = 1000
R = 16  # centroid sub-resolution: 1/R of a quantization step
K_CLUSTERS = 8
ITERS = 3


def _read_emb(sf_dir: str):
    from ..stages.shuffle import drop_null_rows

    # null contract: incomplete rows dropped at the read (see drop_null_rows)
    return drop_null_rows(ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ))


def _quantize_block(t: pa.Table) -> pa.Table:
    e = np.stack(t.column("embedding").to_numpy(zero_copy_only=False)).astype(
        np.float64
    )
    q = np.floor(e * QUANT + 0.5).astype(np.int64)
    return pa.table(
        {
            "vec_id": t.column("vec_id"),
            "q": pa.FixedSizeListArray.from_arrays(
                pa.array(q.reshape(-1), type=pa.int64()), DIM
            ),
        }
    )


def _block_mats(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    v = t.column("vec_id").to_numpy()
    q = (
        t.column("q")
        .combine_chunks()
        .flatten()
        .to_numpy(zero_copy_only=False)
        .reshape(-1, DIM)
    )
    return v, q


def _quantized(sf_dir: str):
    """The materialized integer projection — the iteration working set
    shared by the kmeans / PCA / PQ fits.  Coalesced to a row-proportional
    block count (footer estimate; no-op at scale) BEFORE materializing:
    every Lloyd/PCA round re-runs an exchange over these blocks, so the
    per-block fixed cost is paid ``iters`` times."""
    from ..stages.shuffle import coalesce_for_exchange, table_rows

    return coalesce_for_exchange(
        _read_emb(sf_dir).map_batches(_quantize_block, batch_format="pyarrow"),
        table_rows(sf_dir, "embeddings"),
    ).materialize()


def _check_bounds(q: np.ndarray) -> None:
    # the binding term is ‖M_c‖² ≤ DIM·(R·max|q|)², which must stay under
    # 2⁶³: max|q| < sqrt(2⁶³/64)/16 ≈ 2²⁴·⁵.  2²² leaves >2 bits of margin
    # and also covers the PCA block Gram (block_rows·max|q|² per cell).
    # (A review repro showed the earlier 2²⁶ guard admitted silent int64
    # wraparound from ~2²³·⁵ — numpy wraps, the HUGEINT oracle doesn't.)
    if np.abs(q).max(initial=0) >= 2**22:
        raise ValueError(
            "integer-exact kmeans bound exceeded (|q| too large); lower "
            "QUANT or switch to the float cost path (see module docstring)"
        )


def _assign(q: np.ndarray, M: np.ndarray) -> np.ndarray:
    """argmin_c Σ (R·q − M_c)², first-hit tie-break (smallest cluster).

    Expanded to R²·q2 − 2R·(q·M_c) + ‖M_c‖² so the block does ONE int64
    matmul instead of k dense subtractions; the R²·q2 term is common to
    every cluster and dropped from the argmin."""
    dot = q @ M.T  # (B, k) int64 matmul
    cost = (M * M).sum(axis=1)[None, :] - 2 * R * dot
    return np.argmin(cost, axis=1)


def _rounded_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """round_half_away(R·s / n) in pure ints, DuckDB-agreeing on negatives."""
    return np.sign(s) * ((2 * R * np.abs(s) + n) // (2 * n))


def _fit(
    sf_dir: str,
    k: int = K_CLUSTERS,
    iters: int = ITERS,
    checkpoint_dir: str | None = None,
):
    """Returns (qds, M): the materialized quantized projection plus the
    final fixed-point centroid matrix (k, DIM).  Thin wrapper over the
    single code path :func:`_fit_multi` (n_sub=1) so the full-space fit
    and the PQ subspace fits can never diverge.

    With ``checkpoint_dir``, each completed Lloyd round persists its
    (tiny, exact-integer) centroid state as ``round_{r}.npy`` — the
    iterative-operator face of the pipeline's lineage/resume contract
    (pipelines/annotate.py does it per output shard; here the unit of
    recovery is the ROUND, because rounds are the expensive thing).  A
    killed fit resumes from the last completed round bit-exactly: the
    state is integers, so resumed and straight-through runs are
    indistinguishable (tests/test_cluster.py pins this)."""
    qds = _quantized(sf_dir)
    Ms, _ = _fit_multi(qds, 1, DIM, k, iters, checkpoint_dir=checkpoint_dir)
    return qds, Ms[0]


def kmeans_assign(
    sf_dir: str,
    k: int = K_CLUSTERS,
    iters: int = ITERS,
    checkpoint_dir: str | None = None,
):
    """(vec_id, cluster) — each vector's cluster under the centroids after
    ``iters`` full Lloyd updates (one extra streaming assignment pass).
    Cluster labels are the SEED vec_ids (oracle parity: ``vec_id AS
    cluster``), which equals 0..k−1 only when ids below k are contiguous."""
    qds = _quantized(sf_dir)
    Ms, seed_vids = _fit_multi(qds, 1, DIM, k, iters,
                               checkpoint_dir=checkpoint_dir)
    M = Ms[0]
    if M.shape[0] == 0:  # empty table
        return ray.data.from_arrow(
            pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "cluster": pa.array([], pa.int64())}
            )
        )
    ref = ray.put((M, seed_vids))

    def final(t: pa.Table) -> pa.Table:
        M_, vids = ray.get(ref)
        v, q = _block_mats(t)
        _check_bounds(q)
        a = _assign(q, M_)
        return pa.table(
            {"vec_id": pa.array(v), "cluster": pa.array(vids[a])}
        )

    return qds.map_batches(final, batch_format="pyarrow")


def _kmeans_sql(k: int = K_CLUSTERS, iters: int = ITERS) -> str:
    """Chained-CTE Lloyd rounds (the PageRank oracle pattern): identical
    integer costs, identical tie-break, identical rounded division,
    identical empty-cluster coalesce."""
    head = f"""
    WITH q AS (
      SELECT vec_id, i - 1 AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * {QUANT} + 0.5) AS BIGINT) AS qv
      FROM (SELECT vec_id, embedding, unnest(range(1, {DIM} + 1)) AS i
            FROM embeddings)
    ),
    c0 AS (SELECT vec_id AS cluster, dim, {R} * qv AS m
           FROM q WHERE vec_id < {k})"""
    body = ""
    for t in range(1, iters + 2):  # iters updates + 1 final assignment
        p = t - 1
        body += f""",
    a{t} AS (
      SELECT vec_id, cluster FROM (
        SELECT d.vec_id, d.cluster,
               row_number() OVER (PARTITION BY d.vec_id
                                  ORDER BY d.cost, d.cluster) AS rn
        FROM (
          SELECT q.vec_id, c.cluster,
                 sum(({R} * q.qv - c.m) * ({R} * q.qv - c.m)) AS cost
          FROM q JOIN c{p} c USING (dim) GROUP BY q.vec_id, c.cluster
        ) d
      ) WHERE rn = 1
    )"""
        if t <= iters:
            body += f""",
    c{t} AS (
      SELECT c.cluster, c.dim, coalesce(u.m, c.m) AS m
      FROM c{p} c LEFT JOIN (
        SELECT a.cluster, q.dim,
               CASE WHEN sum(q.qv) < 0
                    THEN -((2 * {R} * (-sum(q.qv)) + count(*)) // (2 * count(*)))
                    ELSE (2 * {R} * sum(q.qv) + count(*)) // (2 * count(*))
               END AS m
        FROM a{t} a JOIN q ON q.vec_id = a.vec_id
        GROUP BY a.cluster, q.dim
      ) u USING (cluster, dim)
    )"""
    return head + body + f"""
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM a{iters + 1}
    """


PCA_ITERS = 3
PCA_SCALE = 1000  # eigenvector fixed-point resolution


def pca_top_direction(sf_dir: str, iters: int = PCA_ITERS):
    """(dim, v) — the dominant principal direction of the embedding
    covariance, by power iteration in EXACT fixed-point arithmetic (the
    embedding-analytics operator behind whitening, ABTT 'all-but-the-top'
    post-processing, and drift monitoring).

    Distributed shape: ONE combiner exchange.  Each block computes its
    local Gram matrix (a 64×64 int64 ``q.T @ q`` — one matmul), local
    coordinate sums and row count, and emits ≤ 2145 scalar rows (upper
    triangle + sums + count); ``two_phase_groupby`` merges them and the
    driver holds only the 64×64 scatter matrix.  The power iterations
    then touch NO corpus data — they run on the driver over the tiny
    matrix (exactly where a 64×64 loop belongs; the cluster's job was
    the corpus-sized sum).

    Exactness: the scatter matrix about the mean is computed without
    rationals as  C = N·Σqqᵀ − (Σq)(Σq)ᵀ  (= N² × covariance — scale
    does not change the direction).  Iterations rescale to ±PCA_SCALE
    with the same round-half-away integer division as kmeans, carried in
    arbitrary-precision Python ints (HUGEINT in the DuckDB oracle — the
    matvec exceeds int64 by design), so the oracle reproduces every
    iterate bit-for-bit, sign convention included (v₀ = all-ones)."""
    from ..stages.shuffle import two_phase_groupby

    iu, ju = np.triu_indices(DIM)

    def partial(t: pa.Table) -> pa.Table:
        _, q = _block_mats(t)
        _check_bounds(q)
        G = q.T @ q  # (DIM, DIM) int64
        i = np.concatenate([iu, np.arange(DIM), [-1]])
        j = np.concatenate([ju, np.full(DIM, -1), [-1]])
        s = np.concatenate([G[iu, ju], q.sum(axis=0), [len(q)]])
        return pa.table(
            {
                "i": pa.array(i, pa.int64()),
                "j": pa.array(j, pa.int64()),
                "s": pa.array(s, pa.int64()),
            }
        )

    merged = two_phase_groupby(
        _read_emb(sf_dir).map_batches(_quantize_block, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow"),
        keys=["i", "j"],
        aggs={"s": ("s", "sum", "sum")},
    ).to_pandas()  # ≤ 2145 rows — the scatter matrix, never the data

    if len(merged) == 0:  # empty embeddings table: the oracle's u1 CTE
        # joins an empty scatter matrix and yields zero rows — match it
        # instead of emitting 64 all-zero rows (review r4 wave 8)
        return ray.data.from_arrow(
            pa.table({"dim": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64())})
        )

    G = np.zeros((DIM, DIM), dtype=object)
    m = np.zeros(DIM, dtype=object)
    N = 0
    for i, j, s in merged.itertuples(index=False):
        if i == -1:
            N = int(s)
        elif j == -1:
            m[int(i)] = int(s)
        else:
            G[int(i), int(j)] = int(s)
            G[int(j), int(i)] = int(s)
    C = [[N * int(G[i][j]) - int(m[i]) * int(m[j]) for j in range(DIM)]
         for i in range(DIM)]

    v = [PCA_SCALE] * DIM
    for _ in range(iters):
        u = [sum(C[i][j] * v[j] for j in range(DIM)) for i in range(DIM)]
        mx = max(abs(x) for x in u)
        if mx == 0:
            v = [0] * DIM
            break
        v = [
            -((2 * PCA_SCALE * (-x) + mx) // (2 * mx))
            if x < 0
            else (2 * PCA_SCALE * x + mx) // (2 * mx)
            for x in u
        ]

    import pandas as pd

    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "dim": np.arange(DIM, dtype=np.int64),
                "v": np.array(v, dtype=np.int64),
            }
        )
    )


def _pca_ctes(iters: int = PCA_ITERS) -> str:
    head = f"""
    WITH q AS (
      SELECT vec_id, i - 1 AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * {QUANT} + 0.5) AS BIGINT) AS qv
      FROM (SELECT vec_id, embedding, unnest(range(1, {DIM} + 1)) AS i
            FROM embeddings)
    ),
    g AS (
      SELECT a.dim AS i, b.dim AS j, sum(a.qv * b.qv) AS g
      FROM q a JOIN q b USING (vec_id) GROUP BY 1, 2
    ),
    mm AS (SELECT dim AS i, sum(qv) AS m FROM q GROUP BY dim),
    nn AS (SELECT count(DISTINCT vec_id) AS n FROM q),
    c AS (
      SELECT g.i, g.j,
             CAST(nn.n * g.g - ma.m * mb.m AS HUGEINT) AS c
      FROM g JOIN mm ma ON ma.i = g.i JOIN mm mb ON mb.i = g.j CROSS JOIN nn
    ),
    v0 AS (SELECT unnest(range({DIM})) AS dim, CAST({PCA_SCALE} AS HUGEINT) AS v)"""
    body = ""
    for t in range(1, iters + 1):
        p = t - 1
        body += f""",
    u{t} AS (
      SELECT c.i AS dim, sum(c.c * v.v) AS u
      FROM c JOIN v{p} v ON v.dim = c.j GROUP BY c.i
    ),
    mx{t} AS (SELECT max(abs(u)) AS mx FROM u{t}),
    v{t} AS (
      SELECT dim,
             CASE WHEN mx.mx = 0 THEN CAST(0 AS HUGEINT)
                  WHEN u < 0
                    THEN -((2 * {PCA_SCALE} * (-u) + mx.mx) // (2 * mx.mx))
                  ELSE (2 * {PCA_SCALE} * u + mx.mx) // (2 * mx.mx)
             END AS v
      FROM u{t} CROSS JOIN mx{t} AS mx
    )"""
    return head + body


def _pca_sql(iters: int = PCA_ITERS) -> str:
    return _pca_ctes(iters) + f"""
    SELECT CAST(dim AS BIGINT) AS dim, CAST(v AS BIGINT) AS v FROM v{iters}
    """


def pca_project(sf_dir: str, iters: int = PCA_ITERS):
    """(vec_id, proj) — every embedding's exact integer projection onto the
    dominant principal direction (fixed-point units QUANT×PCA_SCALE): the
    apply half of the PCA pair — outlier scoring along the top component,
    the subtraction step of all-but-the-top post-processing.

    One extra streaming pass: the 64-int direction vector is broadcast
    (``ray.put``) and each block does a single int64 matvec; no exchange
    at all beyond the fit's own."""
    v_df = pca_top_direction(sf_dir, iters).to_pandas()
    if len(v_df) == 0:  # empty table → typed empty, matching the oracle
        return ray.data.from_arrow(
            pa.table({"vec_id": pa.array([], pa.int64()),
                      "proj": pa.array([], pa.int64())})
        )
    v_df = v_df.sort_values("dim")
    v = v_df["v"].to_numpy(dtype=np.int64)
    ref = ray.put(v)

    def project(t: pa.Table) -> pa.Table:
        v_ = ray.get(ref)
        vid, q = _block_mats(t)
        _check_bounds(q)
        return pa.table(
            {"vec_id": pa.array(vid), "proj": pa.array(q @ v_, type=pa.int64())}
        )

    return (
        _read_emb(sf_dir)
        .map_batches(_quantize_block, batch_format="pyarrow")
        .map_batches(project, batch_format="pyarrow")
    )


def _pca_project_sql(iters: int = PCA_ITERS) -> str:
    return _pca_ctes(iters) + f"""
    SELECT q.vec_id, CAST(sum(q.qv * v.v) AS BIGINT) AS proj
    FROM q JOIN v{iters} v ON v.dim = q.dim
    GROUP BY q.vec_id
    """


PQ_SUB = 4  # subspaces
PQ_SUBDIM = DIM // PQ_SUB
PQ_K = 16  # codes per subspace (a 16-byte-ish code at production sizes)
PQ_ITERS = 2


def _fit_multi(qds, n_sub: int, sub: int, k: int, iters: int,
               checkpoint_dir: str | None = None):
    """All ``n_sub`` subspace Lloyd fits batched into ONE combiner
    exchange per round (partial rows keyed (sub, cluster, dim), relative
    dims) — the fits never interact, so batching them per round costs
    nothing and cuts the exchange count n_sub-fold.  This is the ONLY
    Lloyd implementation; :func:`_fit` is the n_sub=1 wrapper.

    With ``checkpoint_dir``, each completed round atomically persists
    the stacked (n_sub, k, sub) centroid state as ``round_{r}.npy`` and
    a killed fit resumes from the last completed round bit-exactly."""
    import os

    import pyarrow.compute as pc

    from ..stages.shuffle import two_phase_groupby

    seed_df = qds.map_batches(
        lambda t: t.filter(pc.less(t.column("vec_id"), k)),
        batch_format="pyarrow",
    ).to_pandas()
    if len(seed_df) == 0:
        return (
            [np.zeros((0, sub), dtype=np.int64) for _ in range(n_sub)],
            np.zeros(0, dtype=np.int64),
        )
    k = min(k, len(seed_df))
    order = np.argsort(seed_df["vec_id"].to_numpy())
    # public cluster LABELS are the seed rows' vec_ids (the oracle seeds
    # `vec_id AS cluster`): with gaps in the ids below k the internal
    # 0..k−1 indices and the oracle labels diverge — reproduced 22/40
    # mismatched assignments on a sparse-id table (review r4 wave 8).
    # Internals stay index-based; callers map through seed_vids at output.
    seed_vids = (
        seed_df["vec_id"].to_numpy().astype(np.int64)[order][:k].copy()
    )
    S0 = (
        np.stack(seed_df["q"].to_numpy())
        .astype(np.int64)[order]
        .reshape(len(seed_df), DIM)[:k]
    )
    _check_bounds(S0)
    Ms = [R * S0[:, s * sub : (s + 1) * sub].copy() for s in range(n_sub)]

    start_round = 0
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        for r in range(iters, 0, -1):
            p = os.path.join(checkpoint_dir, f"round_{r}.npy")
            if os.path.exists(p):
                stacked = np.load(p)
                if stacked.shape == (k, sub) and n_sub == 1:
                    # pre-unification single-fit checkpoints were (k, DIM)
                    stacked = stacked[None, :, :]
                if stacked.shape != (n_sub, k, sub):
                    raise ValueError(
                        f"checkpoint {p} shape {stacked.shape} != "
                        f"({n_sub}, {k}, {sub})"
                    )
                Ms = [stacked[s].copy() for s in range(n_sub)]
                start_round = r
                break

    for rnd in range(start_round, iters):
        ref = ray.put(Ms)

        def partial(t: pa.Table, _ref=ref, _k=k) -> pa.Table:
            Ms_ = ray.get(_ref)
            _, q = _block_mats(t)
            _check_bounds(q)
            rows_sub, rows_c, rows_d, rows_s = [], [], [], []
            for s, M_ in enumerate(Ms_):
                qs = q[:, s * sub : (s + 1) * sub]
                a = _assign(qs, M_)
                cnt = np.bincount(a, minlength=_k).astype(np.int64)
                present = np.flatnonzero(cnt)
                for c in present:
                    rows_sub.append(np.full(sub, s, dtype=np.int64))
                    rows_c.append(np.full(sub, c, dtype=np.int64))
                    rows_d.append(np.arange(sub, dtype=np.int64))
                    rows_s.append(qs[a == c].sum(axis=0))
                rows_sub.append(np.full(len(present), s, dtype=np.int64))
                rows_c.append(present.astype(np.int64))
                rows_d.append(np.full(len(present), -1, dtype=np.int64))
                rows_s.append(cnt[present])
            return pa.table(
                {
                    "sub": pa.array(np.concatenate(rows_sub)),
                    "cluster": pa.array(np.concatenate(rows_c)),
                    "dim": pa.array(np.concatenate(rows_d)),
                    "s": pa.array(np.concatenate(rows_s)),
                }
            )

        merged = two_phase_groupby(
            qds.map_batches(partial, batch_format="pyarrow"),
            # bucket key must be "cluster" (two_phase_groupby buckets on
            # keys[0]): keying on "sub" collapses the full-space fit
            # (n_sub=1) into ONE merge bucket — review-caught regression
            keys=["cluster", "sub", "dim"],
            aggs={"s": ("s", "sum", "sum")},
        ).to_pandas()  # ≤ n_sub × k × (sub+1) rows

        for s in range(n_sub):
            ms = merged[merged["sub"] == s]
            cnts = ms[ms["dim"] == -1]
            n_by_c = np.zeros(k, dtype=np.int64)
            n_by_c[cnts["cluster"].to_numpy(dtype=np.int64)] = cnts[
                "s"
            ].to_numpy(dtype=np.int64)
            sums = ms[ms["dim"] >= 0]
            S = np.zeros((k, sub), dtype=np.int64)
            S[
                sums["cluster"].to_numpy(dtype=np.int64),
                sums["dim"].to_numpy(dtype=np.int64),
            ] = sums["s"].to_numpy(dtype=np.int64)
            nonempty = n_by_c > 0
            M_new = Ms[s].copy()
            M_new[nonempty] = _rounded_div(S[nonempty], n_by_c[nonempty, None])
            Ms[s] = M_new
        if checkpoint_dir:
            # tmp must end in .npy (np.save appends it otherwise); the
            # rename makes the checkpoint atomic
            tmp = os.path.join(checkpoint_dir, f".round_{rnd + 1}.tmp.npy")
            np.save(tmp, np.stack(Ms))
            os.replace(
                tmp, os.path.join(checkpoint_dir, f"round_{rnd + 1}.npy")
            )

    return Ms, seed_vids


def pq_encode(sf_dir: str, n_sub: int = PQ_SUB, k: int = PQ_K,
              iters: int = PQ_ITERS):
    """(vec_id, code_0..code_{n_sub−1}) — product quantization (Jégou et
    al. 2011): split the 64 dims into ``n_sub`` subspaces, fit an
    independent fixed-point Lloyd codebook per subspace, and emit each
    vector's per-subspace code — the compressed representation billion-
    vector ANN indexes store instead of raw floats.

    The quantized projection materializes ONCE and ALL subspace fits
    share a single combiner exchange per round (rows keyed
    (sub, cluster, dim) — the fits are independent, so batching them per
    round costs nothing and cuts the exchange count n_sub-fold: 3
    exchanges instead of 12 here); encoding is one final streaming pass
    doing ``n_sub`` small int matmuls per block.  Same bit-exact integer
    contract as ``kmeans_assign``, so the whole codebook + encoding is
    SQL-oracle-checkable (chained CTEs per subspace)."""
    if DIM % n_sub != 0:
        raise ValueError(
            f"n_sub={n_sub} must divide DIM={DIM}: a remainder would "
            "silently exclude trailing dims from every code"
        )
    sub = DIM // n_sub
    qds = _quantized(sf_dir)
    Ms, seed_vids = _fit_multi(qds, n_sub, sub, k, iters)
    if Ms[0].shape[0] == 0:  # empty table
        return ray.data.from_arrow(
            pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 **{f"code_{s}": pa.array([], pa.int64())
                    for s in range(n_sub)}}
            )
        )
    ref = ray.put((Ms, seed_vids))

    def codes(t: pa.Table) -> pa.Table:
        Ms_, vids = ray.get(ref)
        v, q = _block_mats(t)
        _check_bounds(q)
        cols = {"vec_id": pa.array(v)}
        for s in range(n_sub):
            a = _assign(q[:, s * sub : (s + 1) * sub], Ms_[s])
            # codes are the seed rows' vec_ids, like kmeans labels
            cols[f"code_{s}"] = pa.array(vids[a])
        return pa.table(cols)

    return qds.map_batches(codes, batch_format="pyarrow")


def _pq_sql(n_sub: int = PQ_SUB, k: int = PQ_K, iters: int = PQ_ITERS) -> str:
    """Per-subspace chained-CTE Lloyd rounds over the SHARED q CTE; the
    subspace restriction is just a dim-range filter on the centroid rows
    (cost joins on dim only touch subspace dims)."""
    sub = DIM // n_sub
    head = f"""
    WITH q AS (
      SELECT vec_id, i - 1 AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * {QUANT} + 0.5) AS BIGINT) AS qv
      FROM (SELECT vec_id, embedding, unnest(range(1, {DIM} + 1)) AS i
            FROM embeddings)
    )"""
    body = ""
    for s in range(n_sub):
        lo, hi = s * sub, (s + 1) * sub
        body += f""",
    c0_{s} AS (SELECT vec_id AS cluster, dim, {R} * qv AS m FROM q
               WHERE vec_id < {k} AND dim >= {lo} AND dim < {hi})"""
        for t in range(1, iters + 2):
            p = t - 1
            body += f""",
    a{t}_{s} AS (
      SELECT vec_id, cluster FROM (
        SELECT d.vec_id, d.cluster,
               row_number() OVER (PARTITION BY d.vec_id
                                  ORDER BY d.cost, d.cluster) AS rn
        FROM (
          SELECT q.vec_id, c.cluster,
                 sum(({R} * q.qv - c.m) * ({R} * q.qv - c.m)) AS cost
          FROM q JOIN c{p}_{s} c USING (dim) GROUP BY q.vec_id, c.cluster
        ) d
      ) WHERE rn = 1
    )"""
            if t <= iters:
                body += f""",
    c{t}_{s} AS (
      SELECT c.cluster, c.dim, coalesce(u.m, c.m) AS m
      FROM c{p}_{s} c LEFT JOIN (
        SELECT a.cluster, q.dim,
               CASE WHEN sum(q.qv) < 0
                    THEN -((2 * {R} * (-sum(q.qv)) + count(*)) // (2 * count(*)))
                    ELSE (2 * {R} * sum(q.qv) + count(*)) // (2 * count(*))
               END AS m
        FROM a{t}_{s} a JOIN q ON q.vec_id = a.vec_id
        WHERE q.dim >= {lo} AND q.dim < {hi}
        GROUP BY a.cluster, q.dim
      ) u USING (cluster, dim)
    )"""
    selects = ",\n           ".join(
        f"CAST(a{iters + 1}_{s}.cluster AS BIGINT) AS code_{s}"
        for s in range(n_sub)
    )
    joins = "\n    ".join(
        f"JOIN a{iters + 1}_{s} ON a{iters + 1}_{s}.vec_id = a{iters + 1}_0.vec_id"
        for s in range(1, n_sub)
    )
    return head + body + f"""
    SELECT a{iters + 1}_0.vec_id AS vec_id,
           {selects}
    FROM a{iters + 1}_0
    {joins}
    """


def queries():
    return {
        "kmeans_assign": kmeans_assign,
        "pca_top_direction": pca_top_direction,
        "pca_project": pca_project,
        "pq_encode": pq_encode,
    }


def oracles():
    return {
        "kmeans_assign": _kmeans_sql(),
        "pca_top_direction": _pca_sql(),
        "pca_project": _pca_project_sql(),
        "pq_encode": _pq_sql(),
    }
