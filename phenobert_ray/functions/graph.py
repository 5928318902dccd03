"""Distributed connected components over an edge Dataset — the final step
of the near-dup dedup story (pair verification → duplicate CLUSTERS), and
the engine's iterative-graph-algorithm / partitioned-hash-join
demonstration.

Algorithm: min-label propagation WITH pointer jumping.  labels start as
node ids; each round every node takes the min label among itself and its
neighbors (one adjacency-sized exchange), then labels chase their own
pointers (``label ← label[label]``, one label-table-sized exchange) —
path compression doubles the propagation distance per round, so
convergence needs O(log diameter) rounds instead of O(diameter)
(template-heavy corpora form giant sparse components where the
difference is 10× wall-clock).  The propagation exchange:

  messages = adjacency ⋈ labels on neighbor   (hash join: both sides
             bucketed on the join key, joined per bucket with pandas)
  labels'  = min by node over (labels ∪ messages)

Convergence is detected with a driver-side scalar (Σ labels strictly
decreases until fixpoint) — no full materialization.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray

from ..stages.shuffle import default_num_buckets, from_pandas_clean, two_phase_groupby



def _symmetric_expand(src_col: str, dst_col: str, out_src: str, out_dst: str):
    """Batch fn: canonical (a<b) edge list → both-direction adjacency rows
    (one helper for CC/pagerank/k-core — three verbatim copies before,
    review r4)."""

    def f(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        out = pd.concat(
            [
                df.rename(columns={src_col: out_src, dst_col: out_dst})[[out_src, out_dst]],
                df.rename(columns={dst_col: out_src, src_col: out_dst})[[out_src, out_dst]],
            ],
            ignore_index=True,
        )
        return from_pandas_clean(out)

    return f

def connected_components(pairs_ds, max_rounds: int = 20,
                         num_buckets: int | None = None,
                         pointer_jumping: bool | None = None,
                         small_graph_edges: int = 100_000):
    """pairs (doc_a, doc_b) → Dataset[(doc_id, cluster_id)] where
    cluster_id = min node id of the component.

    pointer_jumping: None (default) = adaptive — the compression pass
    stays off for the first 4 rounds (small-diameter graphs converge
    before it could help; the extra per-round exchange is pure overhead
    there — measured 3× on a 203-node run) and switches on from round 5,
    where an unconverged graph has a large diameter and pointer jumping
    is what makes convergence O(log d) (it cut a 100k-node template graph
    from un-finishable to ~3 min).

    The bucket count is sized to the EDGE count, not the cluster: an
    iterative algorithm pays per-bucket task overhead every round, so a
    small graph on many buckets is dominated by scheduling (measured
    ~6 s/round for 1.6k edges at P=32).

    small_graph_edges: below this bound the whole edge set runs
    union-find in ONE remote task (a map_groups on a constant key — in
    the cluster, not the driver; 100k int64 pairs ≈ 3 MB, trivially one
    worker's heap) instead of paying per-round exchange overhead that
    dominates small graphs.  The distributed rounds engage beyond the
    bound — the 1M- and 10M-edge bench regressions pin that path.  Pass
    0 to force the distributed path (tests do)."""
    P = num_buckets

    # symmetric adjacency (node, nbr)
    to_adj = _symmetric_expand("doc_a", "doc_b", "node", "nbr")

    adjacency = pairs_ds.map_batches(to_adj, batch_format="pyarrow").materialize()
    n_adj = adjacency.count()
    if not P:
        # n_adj is the SYMMETRIC adjacency (2× edges).  An iterative
        # algorithm pays per-bucket scheduling EVERY round, so cap P at the
        # core count (A/B at 1M edges / 32 cpus: P=128 → 380 s, P=64 →
        # 203 s, P=8..32 → 80-145 s) — until per-bucket adjacency
        # (~4M rows ≈ 64 MB) forces more buckets at real scale
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8))
        P = max(
            min(cpus, max(4, (n_adj // 2) // 1_000)),
            n_adj // 4_000_000,
        )

    # empty edge set (corpus with zero near-dup pairs): Ray's aggregate
    # returns None on an empty dataset, so short-circuit with an empty,
    # correctly-typed result instead of crashing in label_sum
    if n_adj == 0:
        import ray as _ray

        return _ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                }
            )
        )

    # coalesce a fragmented edge set BEFORE the iterative rounds: upstream
    # producers (e.g. the minhash verify join) can emit thousands of tiny
    # blocks, and every round's map stage schedules one task per block —
    # measured at 400k edges / 2000 blocks the rounds go from 11 s to
    # un-finishable (>10 min).  One cheap coalescing pass over int64 pairs
    # bounds per-round task count at P regardless of producer shape.
    if adjacency.num_blocks() > 2 * P:
        adjacency = adjacency.repartition(P).materialize()

    if n_adj <= 2 * small_graph_edges:
        import numpy as _np

        def uf(df: pd.DataFrame) -> pd.DataFrame:
            parent: dict = {}

            def find(x):
                r = x
                while parent[r] != r:
                    r = parent[r]
                while parent[x] != r:
                    parent[x], x = r, parent[x]
                return r

            for a, b in zip(df["node"], df["nbr"]):
                if a not in parent:
                    parent[a] = a
                if b not in parent:
                    parent[b] = b
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[rb] = ra
            comp: dict = {}
            for v in parent:
                comp.setdefault(find(v), []).append(v)
            rows_n, rows_c = [], []
            for members in comp.values():
                m = min(members)
                rows_n.extend(members)
                rows_c.extend([m] * len(members))
            return from_pandas_clean(
                pd.DataFrame({"doc_id": rows_n, "cluster_id": rows_c})
            )

        tagged = adjacency.map_batches(
            lambda b: b.append_column(
                "g", pa.array(_np.zeros(b.num_rows, dtype=_np.int64))
            ),
            batch_format="pyarrow",
        )
        return tagged.groupby("g").map_groups(uf, batch_format="pandas")

    # labels: every node starts as its own cluster
    labels = two_phase_groupby(
        adjacency.map_batches(
            lambda b: b.select(["node"]).append_column(
                "label", b.column("node")
            ),
            batch_format="pyarrow",
        ),
        keys=["node"],
        aggs={"label": ("label", "min", "min")},
        num_buckets=P,
    ).materialize()

    def label_sum(lds) -> int:
        """Σ labels as an exact PYTHON int: per-block int64 partial sums
        computed IN-CLUSTER (safe — block_rows × max_id ≪ 2^63) added
        driver-side with arbitrary precision, so the convergence sentinel
        cannot wrap at 10^12-node scale the way a single int64 all-to-all
        Sum could.  Only one scalar per block crosses to the driver — the
        label table itself never does."""
        import pyarrow.compute as pc

        def part(b: pa.Table) -> pa.Table:
            s = pc.sum(b.column("label")).as_py() if b.num_rows else 0
            return pa.table({"s": pa.array([s or 0], pa.int64())})

        total = 0
        for b in lds.map_batches(part, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            if b.num_rows:
                total += int(pc.sum(b.column("s")).as_py())
        return total

    # unified (bucket, side, key, val) rows for the per-bucket hash join —
    # ONE tagger so the bucketing scheme can never diverge between the
    # propagation and compression joins:
    #   side 0 (probe side): key = join key, val = payload
    #   side 1 (labels):     key = node,     val = label
    def _tag_rows(key_col: str, val_col: str, side: int):
        def tag(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            out = pd.DataFrame(
                {"key": df[key_col].astype("int64"),
                 "val": df[val_col].astype("int64")}
            )
            out["side"] = side
            out["bucket"] = (
                pd.util.hash_pandas_object(out["key"], index=False).to_numpy() % P
            ).astype("int64")
            return from_pandas_clean(out)

        return tag

    adj_rows = _tag_rows("nbr", "node", 0)
    lab_rows = _tag_rows("node", "label", 1)

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["side"] == 0]
        right = df[df["side"] == 1]
        j = left.merge(right, on="key")
        out = pd.DataFrame(
            {"node": j["val_x"].astype("int64"), "label": j["val_y"].astype("int64")}
        )
        # combiner: the downstream merge min-reduces per node anyway, so
        # collapse the edge-sized join output to ≤ unique-nodes rows
        # BEFORE it re-enters the node-keyed exchange
        return out.groupby("node", as_index=False, sort=False)["label"].min()

    def compress(lds):
        """labels ← labels[labels]: rows (key=label, node) ⋈ (key=node,
        label) per bucket — the pointer-jumping step over the SMALL label
        table (label_of_label ≤ label by the min-propagation invariant,
        so the chase only ever improves)."""

        ptr_rows = _tag_rows("label", "node", 0)
        tagged = lds.map_batches(ptr_rows, batch_format="pyarrow").union(
            lds.map_batches(lab_rows, batch_format="pyarrow")
        )
        chased = tagged.groupby("bucket").map_groups(
            join_bucket, batch_format="pandas"
        )
        # roots (label == node) produce their own chase row, so every node
        # keeps a label; min-merge with the previous labels for safety.
        return coalesce(
            two_phase_groupby(
                lds.union(chased),
                keys=["node"],
                aggs={"label": ("label", "min", "min")},
                num_buckets=P,
            )
        )

    def coalesce(lds):
        """materialize, and repartition only when the union+sort lineage
        has actually ballooned the block count (it multiplies ~6× per
        round; unchecked, per-block overhead dominates by round 3 — but a
        repartition every round is itself a whole extra exchange, ~2s of
        pure overhead on small graphs)."""
        m = lds.materialize()
        if m.num_blocks() > 16:
            m = m.repartition(P).materialize()
        return m

    prev = label_sum(labels)
    converged = False
    for rd in range(max_rounds):
        jump = pointer_jumping if pointer_jumping is not None else rd >= 4
        tagged = adjacency.map_batches(adj_rows, batch_format="pyarrow").union(
            labels.map_batches(lab_rows, batch_format="pyarrow")
        )
        messages = tagged.groupby("bucket").map_groups(
            join_bucket, batch_format="pandas"
        )
        labels = coalesce(
            two_phase_groupby(
                labels.union(messages),
                keys=["node"],
                aggs={"label": ("label", "min", "min")},
                num_buckets=P,
            )
        )
        cur = label_sum(labels)
        if cur == prev:
            # propagation-stable ⇒ label[n] ≤ label[nbr] on every edge in
            # both directions ⇒ labels constant per component = minima;
            # skipping compress here saves a whole label-table exchange on
            # the (always-reached) final round
            converged = True
            break
        prev = cur
        if jump:
            labels = compress(labels)
            prev = label_sum(labels)

    if not converged:
        # a component needing more rounds would get WRONG cluster ids;
        # fail loudly rather than return silently-truncated propagation
        raise RuntimeError(
            f"connected_components: did not converge within "
            f"max_rounds={max_rounds}; with pointer jumping rounds needed "
            f"≈ log2(largest component diameter) — raise max_rounds"
        )

    return labels.map_batches(
        lambda b: b.rename_columns(["doc_id", "cluster_id"]), batch_format="pyarrow"
    )


def triangles(edges_ds, num_partitions: int | None = None):
    """(hpo_a, hpo_b, hpo_c), a < b < c — distributed triangle enumeration
    over a canonical (a < b) undirected edge list, via two hash joins:

      wedges    = E(a, b) ⋈ E(a, c) on a, keeping b < c  (each wedge is
                  anchored at its minimum node, so it is built exactly once)
      triangles = wedges ⋈ E on (b, c)                   (closing edge)

    Both joins are native ``Dataset.join`` hash exchanges partitioned on
    the join key; nothing is broadcast and no adjacency list is ever
    assembled in one place.  Skew note: a hub node of degree d contributes
    C(d, 2) wedges — the classic bound; cap or sample hub wedges upstream
    if a corpus has degree hot-spots (the co-occurrence graph here is
    phenotype-vocabulary-sized, so d is small)."""
    from ..stages.shuffle import join_num_partitions

    parts = num_partitions or join_num_partitions()
    wedge_schema = pa.schema([("hpo_a", pa.string()), ("hpo_b", pa.string()),
                              ("hpo_c", pa.string())])
    # an empty edge list feeds column-less blocks into the FIRST join's
    # aggregator (review r4, reproduced).  Pinning the edge list is fine
    # here: both joins exchange it in full anyway, and triangle inputs
    # are graph-edge-sized, not corpus-sized.
    edges_ds = edges_ds.materialize()
    if edges_ds.count() == 0:
        return ray.data.from_arrow(wedge_schema.empty_table())

    def rename(cols):
        def f(b: pa.Table) -> pa.Table:
            return b.select(["hpo_a", "hpo_b"]).rename_columns(cols)

        return f

    e = edges_ds.map_batches(rename(["hpo_a", "hpo_b"]), batch_format="pyarrow")
    e2 = edges_ds.map_batches(rename(["wa", "hpo_c"]), batch_format="pyarrow")
    wedges = e.join(e2, "inner", parts, on=("hpo_a",), right_on=("wa",))

    def keep_ordered(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.less(b.column("hpo_b"), b.column("hpo_c")))
        return b.select(["hpo_a", "hpo_b", "hpo_c"])

    wedges = wedges.map_batches(keep_ordered, batch_format="pyarrow")
    # wedge-free graphs (paths, stars filtered by b<c, empty edge lists)
    # leave every wedge partition empty; the second join's aggregator
    # rejects the column-less blocks (the documented footgun) — same
    # two-part guard shipping_priority uses on its chained joins: a
    # materialize+count short-circuit for the fully-empty side (the
    # fixer never sees empty blocks, so normalization alone cannot type
    # an all-empty dataset) plus normalize_empty_blocks for the
    # empty-PARTITION case inside a non-empty set (review r4, reproduced)
    from ..stages.shuffle import normalize_empty_blocks

    wedges = wedges.materialize()
    if wedges.count() == 0:
        return ray.data.from_arrow(wedge_schema.empty_table())
    wedges = normalize_empty_blocks(wedges, wedge_schema, parts)
    closing = edges_ds.map_batches(rename(["ca", "cb"]), batch_format="pyarrow")
    tri = wedges.join(
        closing, "inner", parts, on=("hpo_b", "hpo_c"), right_on=("ca", "cb")
    )
    tri = tri.map_batches(
        lambda b: b.select(["hpo_a", "hpo_b", "hpo_c"]), batch_format="pyarrow"
    )
    return normalize_empty_blocks(tri, wedge_schema, parts)


def pagerank(edges_ds, iters: int = 3, damping: float = 0.85,
             num_buckets: int | None = None):
    """(hpo_id, rank) — PageRank on the undirected graph (each canonical
    a<b edge walked in both directions), a FIXED number of synchronous
    iterations from the uniform start, ranks rounded to 6 dp — exactly
    reproducible in SQL, so the iterative path is hash-checkable (unlike
    convergence-loop formulations).

    Same execution shape as connected_components: per iteration ONE
    tagged-union bucketed hash join (adjacency rows ⋈ rank/deg rows per
    bucket, with an in-bucket per-destination partial sum as combiner)
    plus ONE node-keyed two-phase exchange that sums contributions and
    re-attaches degrees.  No native-join aggregator actors are spawned —
    an iterative algorithm pays actor/bucket startup EVERY round, the same
    lesson the CC bucket-count cap records.  Nothing node- or edge-sized
    reaches the driver (N comes from one scalar count); dangling nodes
    don't occur, since every node in an edge list has degree ≥ 1."""
    import numpy as np
    import ray as _ray

    both_dirs = _symmetric_expand("hpo_a", "hpo_b", "src", "dst")

    adj = edges_ds.map_batches(both_dirs, batch_format="pyarrow").materialize()
    n_adj = adj.count()
    if n_adj == 0:
        return _ray.data.from_arrow(
            pa.table(
                {
                    "hpo_id": pa.array([], pa.string()),
                    "rank": pa.array([], pa.float64()),
                }
            )
        )
    cpus = int(_ray.cluster_resources().get("CPU", 8))
    P = num_buckets or min(cpus, max(4, n_adj // 1_000))

    deg = two_phase_groupby(
        adj, keys=["src"], aggs={"deg": (None, "size", "sum")}, num_buckets=P
    ).materialize()
    n_nodes = deg.count()
    base = (1.0 - damping) / n_nodes

    def _bucket_of(s: pd.Series) -> pd.Series:
        return (pd.util.hash_pandas_object(s, index=False).to_numpy() % P).astype(
            "int64"
        )

    def tag_adj(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        out = pd.DataFrame(
            {
                "key": df["src"].astype(str),
                "dst": df["dst"].astype(str),
                "c": np.nan,
                "side": np.int64(0),
            }
        )
        out["bucket"] = _bucket_of(out["key"])
        return from_pandas_clean(out)

    adj_tagged = adj.map_batches(tag_adj, batch_format="pyarrow").materialize()

    def init_ranks(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df["src"].astype(str),
                "deg": df["deg"].astype("int64"),
                "rank": np.full(len(df), 1.0 / n_nodes),
            }
        )

    rankdeg = deg.map_batches(init_ranks, batch_format="pandas").materialize()

    def tag_rank(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "key": df["src"].astype(str),
                "dst": "",
                "c": (df["rank"] / df["deg"]).astype("float64"),
                "side": np.int64(1),
            }
        )
        out["bucket"] = _bucket_of(out["key"])
        return from_pandas_clean(out)

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["side"] == 0]
        right = df[df["side"] == 1]
        j = left[["key", "dst"]].merge(right[["key", "c"]], on="key")
        # combiner: collapse the edge-sized join output to ≤ unique-dst
        # rows before the node-keyed exchange
        out = j.groupby("dst", as_index=False, sort=False)["c"].sum()
        out = out.rename(columns={"dst": "node"})
        out["deg"] = np.nan
        return from_pandas_clean(out[["node", "c", "deg"]])

    def deg_rows(df: pd.DataFrame):
        return from_pandas_clean(
            pd.DataFrame(
                {
                    "node": df["src"].astype(str),
                    "c": 0.0,
                    "deg": df["deg"].astype("float64"),
                }
            )
        )

    for _ in range(iters):
        tagged = adj_tagged.union(
            rankdeg.map_batches(tag_rank, batch_format="pandas")
        )
        contrib = tagged.groupby("bucket").map_groups(
            join_bucket, batch_format="pandas"
        )
        merged = two_phase_groupby(
            contrib.union(deg.map_batches(deg_rows, batch_format="pandas")),
            keys=["node"],
            aggs={"c": ("c", "sum", "sum"), "deg": ("deg", "max", "max")},
            num_buckets=P,
        )

        def next_ranks(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "src": df["node"].astype(str),
                    "deg": df["deg"].astype("int64"),
                    "rank": base + damping * df["c"].astype("float64"),
                }
            )

        rankdeg = merged.map_batches(next_ranks, batch_format="pandas").materialize()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"hpo_id": df["src"], "rank": df["rank"].round(6)}
        )

    return rankdeg.map_batches(finish, batch_format="pandas")


def kcore_nodes(edges_ds, k: int = 2, rounds: int = 3):
    """(hpo_id, degree) — nodes surviving ``rounds`` fixed peeling rounds
    of k-core decomposition (drop nodes with alive-degree < k each round),
    with their final degree within the surviving subgraph.  The
    graph-densification operator of KG curation: the k-core is the
    noise-robust backbone of the co-mention graph.

    Fixed-round semantics (like :func:`pagerank`) so the whole run is
    SQL-expressible as chained CTEs; full peeling converges when a round
    removes nothing — callers can raise ``rounds`` until stable.

    Scale shape: edges are the corpus-sized side and stay in the cluster —
    each round is ONE two-phase degree exchange over the (alive-filtered)
    edge projection, materialized once.  The alive set is a subset of the
    NODE universe, which for a phenotype KG is the ontology (bounded,
    ~16k), so the per-round driver state and the broadcast filter are
    O(ontology), never O(corpus)."""
    import ray as _ray

    both_dirs = _symmetric_expand("hpo_a", "hpo_b", "src", "dst")

    adj = edges_ds.map_batches(both_dirs, batch_format="pyarrow").materialize()

    empty = pa.table(
        {"hpo_id": pa.array([], pa.string()),
         "degree": pa.array([], pa.int64())}
    )
    if adj.count() == 0:
        return _ray.data.from_arrow(empty)

    def degrees(alive_ref):
        def flt(b: pa.Table) -> pa.Table:
            alive = _ray.get(alive_ref)
            df = b.to_pandas()
            if alive is not None:
                df = df[df["src"].isin(alive) & df["dst"].isin(alive)]
            return from_pandas_clean(df[["src"]])

        deg = two_phase_groupby(
            adj.map_batches(flt, batch_format="pyarrow"),
            keys=["src"],
            aggs={"deg": (None, "size", "sum")},
        ).to_pandas()  # O(node universe) = O(ontology) — bounded
        if "src" not in deg.columns:  # zero alive-alive edges → no schema
            deg = pd.DataFrame(
                {"src": pd.Series([], dtype=str),
                 "deg": pd.Series([], dtype="int64")}
            )
        return deg

    alive = None  # None = every node
    for _ in range(rounds):
        deg = degrees(_ray.put(alive))
        alive = set(deg.loc[deg["deg"] >= k, "src"])
        if not alive:
            return _ray.data.from_arrow(empty)

    final = degrees(_ray.put(alive))
    final = final.set_index("src")["deg"]
    out = pd.DataFrame(
        {
            "hpo_id": sorted(alive),
            "degree": [int(final.get(h, 0)) for h in sorted(alive)],
        }
    )
    return _ray.data.from_pandas(out)
