"""Benchmark harness (driver contract).

Default mode: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and prints ONE JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "turns": T, "turns_per_sec": R}

``--scaling``: runs the headline KG pipeline twice in fresh subprocesses at
num_cpus=8 and num_cpus=32 on the same input and reports both throughputs
plus scaling efficiency = (T_8/T_32)/(32/8).

The turns table is amplified ``$GRAFT_BENCH_REPLICATE`` × (default 20) by
replicating the documents table with offset doc_ids — deterministic, so
every run sees the identical workload (the small-sf stand-in for the
10^12-turn table).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_dir() -> str:
    return os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cpus() -> int:
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _replicate() -> int:
    return int(os.environ.get("GRAFT_BENCH_REPLICATE", "20"))


def _scaling_replicate() -> int:
    # the scaling levels need enough work to amortize session/exchange
    # startup at 32 cpus (≥ 10s of steady-state), hence a larger corpus
    return int(os.environ.get("GRAFT_SCALING_REPLICATE", "200"))


def amplified_turns(sf_dir: str, replicate: int):
    """documents ×R with offset doc_ids → turns (deterministic).

    Replica texts get a unique suffix token so the amplified corpus behaves
    like UNIQUE web data: without it the annotate stage's per-worker memo
    (a real optimization for genuinely-duplicated turns) trivializes the
    replicated benchmark and the numbers stop projecting to 10^12 unique
    turns."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from phenobert_ray.transcripts import synthesize_turns_batch

    OFFSET = 10_000_000

    def amplify(batch: pa.Table) -> pa.Table:
        parts = []
        for r in range(replicate):
            t = batch.set_column(
                0, "doc_id", pc.add(batch.column("doc_id"), r * OFFSET)
            )
            t = t.set_column(
                t.schema.get_field_index("text"),
                "text",
                pc.binary_join_element_wise(
                    t.column("text"), f"uniq{r}", " "
                ),
            )
            parts.append(t)
        return pa.concat_tables(parts)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # the base table is one small file → one block; split it BEFORE the
    # amplify/annotate fan-out so the actor pool actually has work units
    # (at 100 TB the input has thousands of fragments and this is a no-op)
    n_blocks = int(ray.cluster_resources().get("CPU", 8)) * 6
    ds = ds.repartition(n_blocks)
    if replicate > 1:
        ds = ds.map_batches(amplify, batch_format="pyarrow")
    return ds.map_batches(synthesize_turns_batch, batch_format="pyarrow")


def run_headline(sf_dir: str, replicate: int, passes: int = 3) -> dict:
    """The flagship KG build: turns → annotate → dedupe shuffle → triples →
    parquet sink.  Returns timing + row counts."""
    import shutil

    import ray

    from phenobert_ray.assets.mini_hpo import mini_dag
    from phenobert_ray.pipelines.triples import write_kg
    from phenobert_ray.stages.annotate import annotate_turns

    from phenobert_ray.config import PipelineConfig

    out = "/tmp/bench_triples"
    dag = mini_dag()
    # Ray bundles the fused amplify→synthesize→annotate chain by INPUT rows
    # of the chain (= base doc rows, r1 notes #5).  A/B-measured in one
    # session at 32 cpus: batch 128 (≈40 tasks) edges out 256 (≈20 tasks)
    # 40-41k vs 36-43k turns/s, while 52 (≈96 small tasks) LOSES 25% to
    # per-task overhead — fewer, bigger tasks win once the kernel is fast.
    cfg = PipelineConfig(annotate_batch_size=128)
    # warmup: spin up worker processes + imports on every core so the
    # measurement reflects steady-state throughput, not cold start
    annotate_turns(amplified_turns(sf_dir, 1), dag, cfg).count()
    turns = amplified_turns(sf_dir, replicate)
    n_turns = turns.count()
    # multi-pass: this host shows multi-x external CPU-pressure spikes (see
    # BENCH_local_r2.json).  The headline metric is the MEDIAN pass (robust
    # to a single spike without the optimistic bias of best-of-N, ADVICE
    # r2); all samples are persisted so readers can judge variance.
    # --scaling sets passes=1 (it already repeats whole child processes
    # per level).
    samples = []
    for _ in range(passes):
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        write_kg(annotate_turns(amplified_turns(sf_dir, replicate), dag, cfg), dag, out)
        samples.append(time.time() - t0)
    srt = sorted(samples)
    dt = srt[len(srt) // 2] if len(srt) % 2 else sum(srt[len(srt) // 2 - 1:len(srt) // 2 + 1]) / 2
    return {
        "sec": dt,
        "sec_min": min(samples),
        "samples": [round(s, 3) for s in samples],
        "turns": n_turns,
        "turns_per_sec": n_turns / dt,
    }


def run_queries(sf_dir: str) -> dict:
    """Secondary per-operator timings (un-amplified sf tables)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as E

    picks = [
        "extract_mentions",
        "kg_triples",
        "inverted_index",
        "eval_micro",
        "doc_stats",
        "exact_dedup",
        "minhash_lsh_pairs",
        "ngram_jaccard_pairs",
        "simhash_dup_pairs",
        "embedding_dup_pairs",
        "ann_topk",
        "lang_id",
        "sessionize",
        "window_agg",
        # r3c: curation family (functions/curation.py) — decontaminate is
        # the interesting one (benchmark-gram broadcast + one streaming
        # corpus pass); pii_redact is the regex-kernel bound pure map
        "decontaminate",
        "pii_redact",
        # r3d: relevance search (two-pass broadcast-stats), interval join
        # (chunked non-equi), distributed total-order rank
        "bm25_topk",
        "range_join",
        "global_sort_rank",
        # r3e: ExactSubstr-style duplicated-substring spans (two linear
        # exchanges, no pair product), bigram-LM perplexity scoring
        # (fit exchange + broadcast model + streaming score), DSIR
        # importance selection (O(B) model broadcast), and the iterative
        # BPE merge loop (4 rounds × one streaming pass each)
        "duplicate_spans",
        "lm_perplexity",
        "dsir_importance",
        "bpe_train_merges",
        # r3e second wave: rule bundle (pure map), MOSS sketch (pure map),
        # RAG chunking (pure map), semantic dedup (bounded kmeans + one
        # cell exchange), cluster-granular split (posting + CC + tag-union)
        "gopher_rules",
        "winnowing_fingerprints",
        "chunk_documents",
        "semdedup",
        "leakage_safe_split",
        # r3f: full iterative Lloyd fit (one k x 65-row exchange per
        # round), exact fixed-point PCA (one scatter-matrix exchange),
        # Bloom incremental screen (m-bounded build + streaming probe),
        # Count-Min sketch (two tiny exchanges), transcript role matrix
        "kmeans_assign",
        "pca_top_direction",
        "bloom_incremental_dedup",
        "cms_probe_counts",
        "role_transition_counts",
        # r3f second wave: PQ codebooks (4 subspace fits over one shared
        # projection), per-key running totals (chunked prefix-sum window),
        # sort-blocked dedup, C4 boilerplate profiling, chained 3-way
        # join top-k, keep-latest compaction, DAG rollup
        "pq_encode",
        "running_user_spend",
        "snm_candidate_pairs",
        "boilerplate_sentences",
        "shipping_priority",
        "compact_latest_events",
        "hpo_ancestor_rollup",
        "corpus_diff",
        "ntile_by_source",
        # r5 late wave: per-source TF-IDF ranking (vocab-bounded double
        # exchange), probe-set fuzzy join (broadcast small side, one
        # vectorized merge per batch), quality-aware near-dup collapse
        # (packed-argmax exchange over the CC output), OR index probe
        "tfidf_top_terms",
        "fuzzy_match_probe",
        "dedup_keep_best",
        "index_search_or",
        # r5 late wave 2: hierarchical rollup (leaf combiner exchange),
        # conversion funnel (chunk transition-table + per-user fold),
        # ExactSubstr rewrite (span/doc tagged-union exchange), weekly
        # retention matrix (three bounded exchanges)
        "rollup_token_stats",
        "funnel_stages",
        "strip_duplicate_spans",
        "retention_cohorts",
        # r5 late wave 3: Q1 scan-heavy partial agg, Q5 broadcast+shuffle
        # mixed join, chunk-folded Markov transitions, exact counting-
        # exchange median, top session-opening paths
        "pricing_summary",
        "top_nation_revenue",
        "event_transitions",
        "grouped_median",
        "session_paths",
        "orders_with_returns",
        "weekly_active_users",
        "cooccurrence_pmi",
        "hpo_information_content",
        "media_resize_stats",
        "order_skyline",
        "grouped_mode",
    ]
    qs = E.queries()

    # production-shape variants timed alongside the queries() surface
    # (not registered as driver queries — semantics pytest-pinned equal):
    # bpe at 64 merges = VERDICT r3 item 7's bar (no per-round re-derive)
    def _bpe64(sf):
        from phenobert_ray.functions.textstats import (
            bpe_train_merges_materialized,
        )

        return bpe_train_merges_materialized(sf, n_merges=64)

    extra = {"bpe_train_merges64_materialized": _bpe64}
    out = {}
    for name in picks + list(extra):
        t0 = time.time()
        res = extra[name](sf_dir) if name in extra else qs[name](sf_dir)
        # consume lazily-built datasets
        if hasattr(res, "count"):
            res.count()
        out[name] = round(time.time() - t0, 3)
    return out


def run_cc_scale(n_edges: int, chain: int = 256) -> dict:
    """Connected-components scale regression (VERDICT r2 #9): a
    deterministic graph of length-``chain`` cycles — diameter chain/2, so
    convergence NEEDS the pointer-jumping + coalescing path — generated
    distributed, clustered, and validated distributed (the expected
    cluster of node n is its cycle head (n // chain) * chain; nothing
    cluster-sized ever reaches the driver)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from phenobert_ray.functions.graph import connected_components

    def edges(batch: pa.Table) -> pa.Table:
        i = batch.column("id").to_numpy()
        # close each cycle at chain boundaries AND at the corpus edge so no
        # node id ≥ n_edges leaks out of the final partial cycle
        nxt = np.where(
            ((i + 1) % chain == 0) | (i + 1 == n_edges), (i // chain) * chain, i + 1
        )
        return pa.table(
            {
                "doc_a": pa.array(i, pa.int64()),
                "doc_b": pa.array(nxt, pa.int64()),
            }
        )

    ds = ray.data.range(n_edges).map_batches(edges, batch_format="pyarrow")
    t0 = time.time()
    clusters = connected_components(ds, max_rounds=24)

    def check(b: pa.Table) -> pa.Table:
        node = b.column("doc_id").to_numpy()
        bad = int((b.column("cluster_id").to_numpy() != (node // chain) * chain).sum())
        return pa.table(
            {
                "bad": pa.array([bad], pa.int64()),
                "n": pa.array([b.num_rows], pa.int64()),
            }
        )

    agg = clusters.map_batches(check, batch_format="pyarrow").sum(["bad", "n"])
    dt = time.time() - t0
    return {
        "sec": round(dt, 2),
        "edges": n_edges,
        "chain_len": chain,
        "edges_per_sec": round(n_edges / dt, 1),
        "nodes_checked": int(agg["sum(n)"]),
        "mislabeled": int(agg["sum(bad)"]),
        "validated": int(agg["sum(bad)"]) == 0 and int(agg["sum(n)"]) == n_edges,
    }


def run_pack_scale(n_docs: int) -> dict:
    """Sequence-packing scale regression: pins the distributed ordered
    prefix-sum (pack_sequences' two-phase scan).  A synthetic corpus with
    n_tokens(doc) = 1 + doc % 37 is generated DISTRIBUTED (written as
    partitioned parquet), packed, and validated DISTRIBUTED against the
    closed form  start(d) = d + 666*(d//37) + r*(r-1)/2  (r = d % 37,
    0+1+...+36 = 666) — no driver-side state grows with n_docs."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray

    from phenobert_ray.functions.curation import pack_sequences

    out_dir = "/tmp/pack_scale"
    shutil.rmtree(out_dir, ignore_errors=True)
    templ = np.array([" ".join(["w"] * (1 + k)) for k in range(37)], dtype=object)

    def gen(batch: pa.Table) -> pa.Table:
        d = batch.column("id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "text": pa.array(templ[d % 37]),
                "source": pa.array(np.full(len(d), "s", dtype=object)),
            }
        )

    ray.data.range(n_docs).map_batches(gen, batch_format="pyarrow").write_parquet(
        f"{out_dir}/documents.parquet"
    )

    t0 = time.time()
    packed = pack_sequences(out_dir, n_buckets=max(64, n_docs // 500_000))

    def check(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy()
        r = d % 37
        expect = d + 666 * (d // 37) + (r * (r - 1)) // 2
        bad = int((b.column("start_offset").to_numpy() != expect).sum())
        bad += int((b.column("n_tokens").to_numpy() != 1 + r).sum())
        return pa.table(
            {
                "bad": pa.array([bad], pa.int64()),
                "n": pa.array([b.num_rows], pa.int64()),
            }
        )

    agg = packed.map_batches(check, batch_format="pyarrow").sum(["bad", "n"])
    dt = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "sec": round(dt, 2),
        "docs": n_docs,
        "docs_per_sec": round(n_docs / dt, 1),
        "docs_checked": int(agg["sum(n)"]),
        "mismatched": int(agg["sum(bad)"]),
        "validated": int(agg["sum(bad)"]) == 0 and int(agg["sum(n)"]) == n_docs,
    }


def run_rank_scale(n_docs: int) -> dict:
    """Global sort-rank scale regression: pins the order-preserving
    composite-bucket rank path (distributed ORDER BY).  Same synthetic
    corpus as --pack-scale (n_tokens = 1 + doc % 37) — the closed-form
    rank of doc d among (n_tokens DESC, doc_id ASC) is
        rank(d) = (#docs with nt > nt(d)) + (#same-nt docs with id < d) + 1
    with both counts exact from n_docs and d, validated DISTRIBUTED."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray

    from phenobert_ray.functions.textstats import global_sort_rank

    out_dir = "/tmp/rank_scale"
    shutil.rmtree(out_dir, ignore_errors=True)
    templ = np.array([" ".join(["w"] * (1 + k)) for k in range(37)], dtype=object)

    def gen(batch: pa.Table) -> pa.Table:
        d = batch.column("id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "text": pa.array(templ[d % 37]),
                "source": pa.array(np.full(len(d), "s", dtype=object)),
            }
        )

    ray.data.range(n_docs).map_batches(gen, batch_format="pyarrow").write_parquet(
        f"{out_dir}/documents.parquet"
    )

    t0 = time.time()
    ranked = global_sort_rank(out_dir, n_id_buckets=64)

    def check(b: pa.Table) -> pa.Table:
        import numpy as np

        d = b.column("doc_id").to_numpy()
        r = d % 37  # n_tokens - 1
        # docs with residue k: count = n_docs//37 + (k < n_docs % 37)
        base, rem = divmod(n_docs, 37)
        counts = base + (np.arange(37) < rem).astype(np.int64)
        # longer docs first: residues > r(d) all rank earlier
        csum_desc = np.concatenate(([0], counts[::-1].cumsum()))  # by 36..0
        before = csum_desc[36 - r]  # docs with residue > r
        same_before = d // 37  # same residue, smaller doc_id
        expect = before + same_before + 1
        bad = int((b.column("rank").to_numpy() != expect).sum())
        bad += int((b.column("n_tokens").to_numpy() != 1 + r).sum())
        return pa.table(
            {
                "bad": pa.array([bad], pa.int64()),
                "n": pa.array([b.num_rows], pa.int64()),
            }
        )

    agg = ranked.map_batches(check, batch_format="pyarrow").sum(["bad", "n"])
    dt = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "sec": round(dt, 2),
        "docs": n_docs,
        "docs_per_sec": round(n_docs / dt, 1),
        "docs_checked": int(agg["sum(n)"]),
        "mismatched": int(agg["sum(bad)"]),
        "validated": int(agg["sum(bad)"]) == 0 and int(agg["sum(n)"]) == n_docs,
    }


def run_kmeans_scale(n_vecs: int, k: int = 8) -> dict:
    """Distributed-KMeans scale regression: pins the iterative Lloyd path
    (quantized projection materialize + one combiner exchange per round)
    at millions of vectors.  Synthetic corpus with ``k`` well-separated
    planted clusters — vec v belongs to planted cluster v % k, whose
    center lights dims ≡ −c (mod k) at 0.4 with ±0.01 deterministic
    jitter — and seed vectors 0..k−1 each sit in a distinct planted
    cluster, so after 3 rounds every assignment must equal v % k,
    validated DISTRIBUTED (nothing vec-sized reaches the driver)."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray

    from phenobert_ray.functions.cluster import DIM, kmeans_assign

    out_dir = "/tmp/kmeans_scale"
    shutil.rmtree(out_dir, ignore_errors=True)

    def gen(batch: pa.Table) -> pa.Table:
        v = batch.column("id").to_numpy()
        c = v % k
        dims = np.arange(DIM)
        centers = ((dims[None, :] + np.arange(k)[:, None]) % k == 0) * 0.4
        jitter = (((v[:, None] * 31 + dims[None, :]) % 7) - 3) * 0.003
        e = (centers[c] + jitter).astype(np.float32)
        return pa.table(
            {
                "vec_id": pa.array(v, pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(e.reshape(-1), type=pa.float32()), DIM
                ),
            }
        )

    ray.data.range(n_vecs).map_batches(gen, batch_format="pyarrow").write_parquet(
        f"{out_dir}/embeddings.parquet"
    )

    t0 = time.time()
    assigned = kmeans_assign(out_dir, k=k, iters=3)

    def check(b: pa.Table) -> pa.Table:
        v = b.column("vec_id").to_numpy()
        bad = int((b.column("cluster").to_numpy() != v % k).sum())
        return pa.table(
            {
                "bad": pa.array([bad], pa.int64()),
                "n": pa.array([b.num_rows], pa.int64()),
            }
        )

    import pandas as pd

    res = assigned.map_batches(check, batch_format="pyarrow").to_pandas()
    sec = time.time() - t0
    bad, n = int(res["bad"].sum()), int(res["n"].sum())
    return {
        "n_vecs": n_vecs,
        "sec": round(sec, 1),
        "vecs_per_sec": round(n_vecs / sec, 1),
        "mismatched": bad,
        "rows_checked": n,
        "validated": bad == 0 and n == n_vecs,
    }


def run_events_scale(n_events: int) -> dict:
    """Events-family long-haul: sessionize + range_join + window_agg +
    running_user_spend over a closed-form corpus, every expectation
    validated DISTRIBUTED (nothing driver-side grows with n_events).

    Corpus: K = 20 events per user; event j of user u at
    t(j) = BASE + j·20min + (j//5)·2h, value = j euros, type = purchase
    when j % 5 == 0 else view.  Consequences, all exact:
    - sessionize(gap 30min): gaps inside a 5-event block are 20min, the
      block boundary jump is 2h20m → user sessions are exactly the blocks
      s = j//5: n_events = 5, sum = (25s+10)·100 cents, start = t(5s),
      end = t(5s+4).  BASE is 23:00 UTC so session 0 straddles the 24h
      split chunk → the boundary-merge phase engages for EVERY user.
    - range_join(6h): purchase s sees its own 4 views plus all 4 of
      block s+1 (Δ = 3h40m < 6h; block s+2 at 7h20m is out) →
      n_views = 8 and 100·(40s+40) cents, except the last block (4 views,
      100·(20s+10) cents).
    - window_agg: per-window closed forms are messy; the TOTALS are not —
      Σ n_events = n_events, Σ cents = users · 100·K(K−1)/2.
    - running_user_spend: running at event j = 100·j(j+1)/2 exactly."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray

    from phenobert_ray.functions.events import (range_join, running_user_spend,
                                                sessionize, window_agg)

    K = 20
    n_events -= n_events % K
    n_users = n_events // K
    out_dir = "/tmp/events_scale"
    shutil.rmtree(out_dir, ignore_errors=True)
    BASE = np.datetime64("2024-01-01T23:00:00", "us")

    def gen(batch: pa.Table) -> pa.Table:
        e = batch.column("id").to_numpy()
        u = e // K
        j = e % K
        ts = BASE + ((j * 1200 + (j // 5) * 7200) * 1_000_000).astype(
            "timedelta64[us]"
        )
        return pa.table(
            {
                "event_id": pa.array(e, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(u, pa.int64()),
                "event_type": pa.array(
                    np.where(j % 5 == 0, "purchase", "view"), pa.string()
                ),
                "value": pa.array(j.astype(np.float64), pa.float64()),
            }
        )

    ray.data.range(n_events).map_batches(gen, batch_format="pyarrow").write_parquet(
        f"{out_dir}/events.parquet"
    )

    t0 = time.time()
    checks: dict[str, tuple[int, int]] = {}  # name -> (bad, rows)

    def tally(name: str, ds, fn):
        agg = ds.map_batches(fn, batch_format="pyarrow").sum(["bad", "n"])
        checks[name] = (int(agg["sum(bad)"]), int(agg["sum(n)"]))

    def chk_sessions(b: pa.Table) -> pa.Table:
        s = b.column("session_idx").to_numpy()
        ne = b.column("n_events").to_numpy()
        cents = b.column("sum_value_cents").to_numpy()
        start = b.column("start_ts").to_numpy().astype("datetime64[us]")
        j0 = 5 * s
        exp_start = BASE + ((j0 * 1200 + (j0 // 5) * 7200) * 1_000_000).astype(
            "timedelta64[us]"
        )
        bad = int(((ne != 5) | (cents != (25 * s + 10) * 100)
                   | (start != exp_start)).sum())
        return pa.table({"bad": pa.array([bad], pa.int64()),
                         "n": pa.array([b.num_rows], pa.int64())})

    tally("sessions", sessionize(out_dir, split_hours=24), chk_sessions)
    t_sess = time.time() - t0

    def chk_range(b: pa.Table) -> pa.Table:
        e = b.column("event_id").to_numpy()
        s = (e % K) // 5
        last = s == (K // 5 - 1)
        nv = b.column("n_views").to_numpy()
        cents = b.column("sum_view_cents").to_numpy()
        exp_nv = np.where(last, 4, 8)
        exp_c = np.where(last, (20 * s + 10) * 100, (40 * s + 40) * 100)
        bad = int(((nv != exp_nv) | (cents != exp_c)).sum())
        return pa.table({"bad": pa.array([bad], pa.int64()),
                         "n": pa.array([b.num_rows], pa.int64())})

    t1 = time.time()
    tally("range", range_join(out_dir), chk_range)
    t_range = time.time() - t1

    def chk_window(b: pa.Table) -> pa.Table:
        # totals-only invariant (summed across all windows at the end)
        return pa.table(
            {"bad": pa.array([0], pa.int64()),
             "n": pa.array([int(b.column("n_events").to_numpy().sum())],
                           pa.int64()),
             "c": pa.array([int(b.column("sum_value_cents").to_numpy().sum())],
                           pa.int64())}
        )

    t2 = time.time()
    wagg = (window_agg(out_dir)
            .map_batches(chk_window, batch_format="pyarrow").sum(["n", "c"]))
    exp_total_cents = n_users * 100 * (K * (K - 1) // 2)
    checks["window"] = (
        int(int(wagg["sum(n)"]) != n_events)
        + int(int(wagg["sum(c)"]) != exp_total_cents),
        int(wagg["sum(n)"]),
    )
    t_window = time.time() - t2

    def chk_running(b: pa.Table) -> pa.Table:
        e = b.column("event_id").to_numpy()
        j = e % K
        run = b.column("running_cents").to_numpy()
        bad = int((run != 100 * j * (j + 1) // 2).sum())
        return pa.table({"bad": pa.array([bad], pa.int64()),
                         "n": pa.array([b.num_rows], pa.int64())})

    t3 = time.time()
    tally("running", running_user_spend(out_dir), chk_running)
    t_running = time.time() - t3

    dt = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    expected_rows = {
        "sessions": n_users * (K // 5),
        "range": n_users * (K // 5),
        "window": n_events,
        "running": n_events,
    }
    bad_total = sum(b for b, _ in checks.values())
    rows_ok = all(checks[k][1] == expected_rows[k] for k in expected_rows)
    return {
        "sec": round(dt, 2),
        "sec_sessionize": round(t_sess, 2),
        "sec_range_join": round(t_range, 2),
        "sec_window_agg": round(t_window, 2),
        "sec_running": round(t_running, 2),
        "events": n_events,
        "events_per_sec": round(n_events / dt, 1),
        "rows_checked": {k: v[1] for k, v in checks.items()},
        "mismatched": bad_total,
        "validated": bad_total == 0 and rows_ok,
    }


def run_spans_scale(n_docs: int) -> dict:
    """duplicate_spans scale regression: pins the ExactSubstr path (posting
    mark + gaps-and-islands) with a closed-form expectation.  Docs come in
    PAIRS: doc d = 5 unique-prefix tokens + a 12-token region shared with
    its pair partner (family f = d // 2) + 5 unique-suffix tokens, all
    tokens id-tagged so NO gram crosses families.  With L = 8 every doc
    has EXACTLY one duplicated span [5, 16] of 12 tokens — validated
    DISTRIBUTED; no driver state grows with n_docs."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray

    from phenobert_ray.functions.dedup import duplicate_spans

    out_dir = "/tmp/spans_scale"
    shutil.rmtree(out_dir, ignore_errors=True)

    def gen(batch: pa.Table) -> pa.Table:
        d = batch.column("id").to_numpy()
        texts = [
            " ".join(
                [f"u{i}x{j}" for j in range(5)]
                + [f"f{i // 2}x{j}" for j in range(12)]
                + [f"v{i}x{j}" for j in range(5)]
            )
            for i in d
        ]
        return pa.table(
            {"doc_id": pa.array(d, pa.int64()), "text": pa.array(texts)}
        )

    ray.data.range(n_docs).map_batches(gen, batch_format="pyarrow").write_parquet(
        f"{out_dir}/documents.parquet"
    )

    t0 = time.time()
    spans = duplicate_spans(out_dir)

    def check(b: pa.Table) -> pa.Table:
        bad = int((b.column("span_start").to_numpy() != 5).sum())
        bad += int((b.column("span_end").to_numpy() != 16).sum())
        bad += int((b.column("n_tokens").to_numpy() != 12).sum())
        return pa.table(
            {
                "bad": pa.array([bad], pa.int64()),
                "n": pa.array([b.num_rows], pa.int64()),
            }
        )

    agg = spans.map_batches(check, batch_format="pyarrow").sum(["bad", "n"])
    dt = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "sec": round(dt, 2),
        "docs": n_docs,
        "docs_per_sec": round(n_docs / dt, 1),
        "spans_checked": int(agg["sum(n)"]),
        "mismatched": int(agg["sum(bad)"]),
        "validated": int(agg["sum(bad)"]) == 0 and int(agg["sum(n)"]) == n_docs,
    }


def run_index_scale(n_convs: int) -> dict:
    """Inverted-index long-haul (S7/A5): sharded postings build + scalar
    rollup + distributed AND-search over a closed-form annotation corpus.

    Conv c carries 5 non-negated mentions {(c+j) % H, j=0..4} plus (odd c)
    one NEGATED mention of (c+7) % H — a DISTINCT hpo, so a broken
    negation filter inflates counts instead of hiding behind the
    (hpo, conv) dedup.  Closed forms with cnt(r) = C//H + (r < C%H):
    n_convs(h) = Σ_{j=0..4} cnt((h−j) mod H); Σ_h n_convs = 5C; the AND
    probe {HP:0, HP:1} matches exactly convs with c % H ∈
    {0, H−1, H−2, H−3}.  Postings are validated DISTRIBUTED (sorted,
    counted, membership-by-residue, shard key recomputed); only the
    H-row scalar table and the probe COUNT reach the driver."""
    import numpy as np
    import pyarrow as pa
    import ray

    from phenobert_ray.sources.inverted_index import (
        NUM_POSTING_SHARDS,
        build_inverted_index,
        index_scalars,
        search_convs_with_all,
    )

    H = 1000
    C = n_convs

    def gen(batch: pa.Table) -> pa.Table:
        c = batch.column("id").to_numpy()
        convs, hpos, negs = [], [], []
        for j in range(5):
            convs.append(c)
            hpos.append((c + j) % H)
            negs.append(np.zeros(len(c), dtype=bool))
        odd = c[c % 2 == 1]
        convs.append(odd)
        hpos.append((odd + 7) % H)
        negs.append(np.ones(len(odd), dtype=bool))
        cc = np.concatenate(convs)
        hh = np.concatenate(hpos)
        return pa.table(
            {
                "conv_id": pa.array(
                    np.char.add("conv-", cc.astype(str)), pa.string()
                ),
                "hpo_id": pa.array(
                    ["HP:%07d" % h for h in hh], pa.string()
                ),
                "negated": pa.array(np.concatenate(negs), pa.bool_()),
            }
        )

    anns = ray.data.range(C).map_batches(gen, batch_format="pyarrow")

    base, rem = divmod(C, H)

    def cnt(r: np.ndarray) -> np.ndarray:
        return base + (r < rem).astype(np.int64)

    t0 = time.time()
    idx = build_inverted_index(anns)

    def check_rows(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas()
        bad = 0
        total = 0
        for h, shard, n, convs in zip(
            df["hpo_id"], df["shard"], df["n_convs"], df["convs"]
        ):
            lst = list(convs)
            total += len(lst)
            if len(lst) != n or lst != sorted(set(lst)):
                bad += 1
                continue
            cs = np.array([int(x.split("-")[1]) for x in lst])
            # membership: (h − c) mod H must be in {0..4}
            hi = int(h.split(":")[1])
            if ((hi - cs) % H > 4).any():
                bad += 1
            sh = (pd.util.hash_pandas_object(
                pd.Series(lst), index=False) % NUM_POSTING_SHARDS).astype("int64")
            if (sh != shard).any():
                bad += 1
        return pa.table({"bad": pa.array([bad], pa.int64()),
                         "n": pa.array([total], pa.int64())})

    agg = idx.map_batches(check_rows, batch_format="pyarrow").sum(["bad", "n"])
    bad = int(agg["sum(bad)"])
    postings_total = int(agg["sum(n)"])
    t_build = time.time() - t0

    sc = index_scalars(anns).to_pandas()  # H rows — bounded
    hvals = np.array([int(h.split(":")[1]) for h in sc["hpo_id"]])
    expect_n = sum(cnt((hvals - j) % H) for j in range(5))
    scalars_ok = (len(sc) == H
                  and (sc["n_convs"].to_numpy() == expect_n).all())

    probe = search_convs_with_all(anns, ["HP:0000000", "HP:0000001"])

    def check_probe(b: pa.Table) -> pa.Table:
        cs = np.array([int(x.split("-")[1])
                       for x in b.column("conv_id").to_pylist()])
        ok = np.isin(cs % H, [0, H - 1, H - 2, H - 3])
        return pa.table({"bad": pa.array([int((~ok).sum())], pa.int64()),
                         "n": pa.array([len(cs)], pa.int64())})

    pagg = probe.map_batches(check_probe, batch_format="pyarrow").sum(["bad", "n"])
    expect_probe = int(cnt(np.array([0, H - 1, H - 2, H - 3])).sum())
    dt = time.time() - t0
    ok = (bad == 0 and postings_total == 5 * C and scalars_ok
          and int(pagg["sum(bad)"]) == 0
          and int(pagg["sum(n)"]) == expect_probe)
    return {
        "sec": round(dt, 2),
        "sec_build": round(t_build, 2),
        "convs": C,
        "annotations": 5 * C + C // 2,
        "postings_checked": postings_total,
        "scalar_rows": int(len(sc)),
        "probe_hits": int(pagg["sum(n)"]),
        "mismatched": bad + int(pagg["sum(bad)"]) + int(not scalars_ok),
        "convs_per_sec": round(C / dt, 1),
        "validated": ok,
    }


def run_skew_scale(n_turns: int) -> dict:
    """Hot-key regression: EVERY turn of the corpus belongs to ONE
    conversation — the pathological skew the two-phase dedup exchange's
    combiner story claims to absorb (stages/shuffle.py docstring; a naive
    groupby(conv_id) would serialize the whole corpus into one reducer).
    Each turn carries the same dictionary mentions plus a turn-unique junk
    token (so the annotate memo never trivializes the workload), making
    the expected dedup result CLOSED-FORM: one row per non-negated
    distinct HPO, n_mentions = per-turn count × n_turns, first_turn 0,
    max_score 1.0 — a |vocab|-sized frame checked exactly driver-side.
    What the regression pins distributed: per-block combiner collapse +
    the composite-key exchange under total key skew, with driver RSS
    reported to show nothing corpus-sized lands on one node."""
    import resource

    import numpy as np
    import pyarrow as pa
    import ray

    from phenobert_ray.assets.mini_hpo import mini_dag
    from phenobert_ray.linker import annotate_text
    from phenobert_ray.pipelines.triples import dedup_conv_hpo
    from phenobert_ray.stages.annotate import annotate_turns

    dag = mini_dag()
    EPOCH = 1_767_225_600_000_000  # 2026-01-01 µs

    def gen(batch: pa.Table) -> pa.Table:
        i = batch.column("id").to_numpy()
        texts = [
            f"febrile seizure seizure and microcephaly noted u{x}" for x in i
        ]
        return pa.table(
            {
                "conv_id": pa.array(["hot-0"] * len(i), pa.string()),
                "turn_idx": pa.array(i.astype(np.int32), pa.int32()),
                "role": pa.array(
                    np.where(i % 2 == 0, "user", "assistant"), pa.string()
                ),
                "text": pa.array(texts, pa.string()),
                "tool": pa.array([""] * len(i), pa.string()),
                "ts": pa.array(
                    (EPOCH + i).astype("datetime64[us]"), pa.timestamp("us")
                ),
            }
        )

    turns = ray.data.range(n_turns).map_batches(gen, batch_format="pyarrow")
    t0 = time.time()
    got = dedup_conv_hpo(annotate_turns(turns, dag)).to_pandas()
    dt = time.time() - t0

    # closed form from ONE serial per-turn annotate (uniq token unmatched)
    from collections import Counter

    per_turn = Counter(
        a.hpo_id
        for a in annotate_text(
            "febrile seizure seizure and microcephaly noted u0", dag)
        if not a.negated
    )
    got = got.set_index("hpo_id")
    bad = 0
    if set(got.index) != set(per_turn) or (got["conv_id"] != "hot-0").any():
        bad += 1
    else:
        for h, c in per_turn.items():
            if (int(got.loc[h, "n_mentions"]) != c * n_turns
                    or int(got.loc[h, "first_turn"]) != 0
                    or float(got.loc[h, "max_score"]) != 1.0):
                bad += 1
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    return {
        "sec": round(dt, 2),
        "turns": n_turns,
        "turns_per_sec": round(n_turns / dt, 1),
        "distinct_hpos": len(per_turn),
        "rows_checked": int(len(got)),
        "mismatched": bad,
        "driver_rss_gb": round(rss_gb, 2),
        "validated": bad == 0,
    }


def run_ann_scale(n_vecs: int) -> dict:
    """ann_topk long-haul regression: the brute-force cosine top-k path
    (broadcast query matrix → per-block matmul partials → in-cluster tree
    merge) at millions of corpus vectors, with a closed-form expectation.

    Queries are vec_id < 8 (one-hot direction e_q).  Corpus vec i ≥ 8 of
    class q = i % 8 is e_q + 0.25·(i//8)·e_{8+q}: cos(query q, vec 8m+q)
    = 1/√(1+(m/4)²) strictly decreases in m and is exactly 0 across
    classes, so query q's top-5 is exactly [8+q, 16+q, 24+q, 32+q, 40+q].
    The RESULT is k × queries = 40 rows by construction (a constant), so
    the exact-frame check is honest driver-side work; what the regression
    pins distributed is the partial top-k + merge over every block."""
    import shutil

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from phenobert_ray.functions.ann import K, N_QUERIES, ann_topk
    from phenobert_ray.functions.cluster import DIM

    out_dir = "/tmp/ann_scale"
    shutil.rmtree(out_dir, ignore_errors=True)

    def gen(batch: pa.Table) -> pa.Table:
        i = batch.column("id").to_numpy()
        q = i % N_QUERIES
        e = np.zeros((len(i), DIM), dtype=np.float32)
        e[np.arange(len(i)), q] = 1.0
        corpus = i >= N_QUERIES
        e[corpus, N_QUERIES + q[corpus]] = 0.25 * (i[corpus] // N_QUERIES)
        return pa.table(
            {
                "vec_id": pa.array(i, pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(e.reshape(-1), type=pa.float32()), DIM
                ),
                "label": pa.array(q.astype(np.int32), pa.int32()),
            }
        )

    ray.data.range(n_vecs).map_batches(gen, batch_format="pyarrow").write_parquet(
        f"{out_dir}/embeddings.parquet"
    )

    t0 = time.time()
    got = (
        ann_topk(out_dir)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    dt = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    expect = pd.DataFrame(
        [
            (q, r, N_QUERIES * r + q)
            for q in range(N_QUERIES)
            for r in range(1, K + 1)
        ],
        columns=["query_id", "rank", "neighbor_id"],
    ).astype("int64")
    ok = got.equals(expect)
    return {
        "sec": round(dt, 2),
        "vecs": n_vecs,
        "vecs_per_sec": round(n_vecs / dt, 1),
        "rows_checked": len(got),
        "mismatched": 0 if ok else int((got.to_numpy() != expect.to_numpy()).sum())
        if got.shape == expect.shape else -1,
        "validated": ok,
    }


def run_dedup_scale(n_docs: int) -> dict:
    """Near-dup dedup long-haul regression (VERDICT r3 item 6): the full
    flagship chain minhash LSH → exact-Jaccard verify → connected
    components at ≥1M docs, with a closed-form expectation validated
    DISTRIBUTED (no driver state grows with n_docs).

    Corpus: docs come in families of 3 (family f = d // 3).  Members 0
    and 1 share identical 12-token family-tagged text (signature equality
    ⇒ every band collides ⇒ guaranteed candidate; Jaccard exactly 1.0 ⇒
    survives any threshold).  Member 2 is 12 doc-unique tokens — no gram
    crosses families, so it must never pair.  Expected: pairs = exactly
    (3f, 3f+1, jac=1.0) per family; CC = 2 rows per family, both rooted
    at 3f.  The edge count (n_docs/3) exceeds the CC single-task bound,
    so the distributed pointer-jumping rounds engage — this pins the
    production path end to end."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray

    from phenobert_ray.functions.dedup import minhash_lsh_pairs
    from phenobert_ray.functions.graph import connected_components

    n_docs -= n_docs % 3
    out_dir = "/tmp/dedup_scale"
    shutil.rmtree(out_dir, ignore_errors=True)

    def gen(batch: pa.Table) -> pa.Table:
        d = batch.column("id").to_numpy()
        texts = [
            " ".join(f"f{i // 3}x{j}" for j in range(12))
            if i % 3 < 2
            else " ".join(f"u{i}x{j}" for j in range(12))
            for i in d
        ]
        return pa.table(
            {"doc_id": pa.array(d, pa.int64()), "text": pa.array(texts)}
        )

    ray.data.range(n_docs).map_batches(gen, batch_format="pyarrow").write_parquet(
        f"{out_dir}/documents.parquet"
    )

    t0 = time.time()
    pairs = minhash_lsh_pairs(out_dir)

    def check_pairs(b: pa.Table) -> pa.Table:
        a = b.column("doc_a").to_numpy()
        bb = b.column("doc_b").to_numpy()
        jac = b.column("jac").to_numpy()
        bad = int((a % 3 != 0).sum() + (bb != a + 1).sum() + (jac != 1.0).sum())
        return pa.table({"bad": pa.array([bad], pa.int64()),
                         "n": pa.array([b.num_rows], pa.int64())})

    # one materialized pass: the pair set feeds both the validator and CC
    pairs = pairs.materialize()
    pagg = pairs.map_batches(check_pairs, batch_format="pyarrow").sum(["bad", "n"])
    t_pairs = time.time() - t0

    cc = connected_components(pairs.select_columns(["doc_a", "doc_b"]))

    def check_cc(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy()
        c = b.column("cluster_id").to_numpy()
        bad = int((c != d - d % 3).sum() + (d % 3 > 1).sum())
        return pa.table({"bad": pa.array([bad], pa.int64()),
                         "n": pa.array([b.num_rows], pa.int64())})

    cagg = cc.map_batches(check_cc, batch_format="pyarrow").sum(["bad", "n"])
    dt = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    n_fam = n_docs // 3
    ok = (
        int(pagg["sum(bad)"]) == 0 and int(pagg["sum(n)"]) == n_fam
        and int(cagg["sum(bad)"]) == 0 and int(cagg["sum(n)"]) == 2 * n_fam
    )
    return {
        "sec": round(dt, 2),
        "sec_pairs": round(t_pairs, 2),
        "docs": n_docs,
        "docs_per_sec": round(n_docs / dt, 1),
        "pairs_checked": int(pagg["sum(n)"]),
        "cc_rows_checked": int(cagg["sum(n)"]),
        "mismatched": int(pagg["sum(bad)"]) + int(cagg["sum(bad)"]),
        "validated": ok,
    }


def run_fuzzy_scale(n_docs: int) -> dict:
    """Fuzzy probe-join long-haul: fuzzy_match_probe at ≥1M docs with a
    closed-form expectation validated DISTRIBUTED.

    Corpus: probes are the registry ids (d % 101 == 0, d < 101000 — the
    operator's own bounded-registry rule), each with 10 probe-unique
    tokens.  A non-probe doc d with d % 5 == 1 carries 9 tokens of its
    partner probe q(d) = (d mod n_probes)·101 plus one unique token —
    Jaccard exactly 9/11 ≥ 4/5, a guaranteed match; every other doc is
    10 unique tokens, a guaranteed non-match.  Expected output is exactly
    {(q(d), d, 9, 11)} ∪ {(p, p, 10, 10) self-matches}; the validator
    recomputes the rule per emitted row in-cluster and the driver compares
    two scalars (row count, bad count)."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray

    from phenobert_ray.functions.search import PROBE_ID_CAP, PROBE_MOD, fuzzy_match_probe

    out_dir = "/tmp/fuzzy_scale"
    shutil.rmtree(out_dir, ignore_errors=True)
    n_probes = min((n_docs + PROBE_MOD - 1) // PROBE_MOD,
                   PROBE_ID_CAP // PROBE_MOD)

    def gen(batch: pa.Table) -> pa.Table:
        d = batch.column("id").to_numpy()
        texts = []
        for i in d:
            if i % PROBE_MOD == 0 and i < PROBE_ID_CAP:
                texts.append(" ".join(f"p{i}t{j}" for j in range(10)))
            elif i % 5 == 1:
                q = (i % n_probes) * PROBE_MOD
                texts.append(
                    " ".join(f"p{q}t{j}" for j in range(9)) + f" u{i}")
            else:
                texts.append(" ".join(f"u{i}t{j}" for j in range(10)))
        return pa.table(
            {"doc_id": pa.array(d, pa.int64()), "text": pa.array(texts)}
        )

    ray.data.range(n_docs).map_batches(gen, batch_format="pyarrow").write_parquet(
        f"{out_dir}/documents.parquet"
    )

    t0 = time.time()
    out = fuzzy_match_probe(out_dir)

    def check(b: pa.Table) -> pa.Table:
        p = b.column("probe_id").to_numpy()
        d = b.column("doc_id").to_numpy()
        ni = b.column("n_inter").to_numpy()
        nu = b.column("n_union").to_numpy()
        # "probe doc" = the registry rule INCLUDING the id cap: a doc ≥
        # the cap with d%101==0 is an ordinary doc and may family-match
        is_probe_doc = (d % PROBE_MOD == 0) & (d < PROBE_ID_CAP)
        is_self = (p == d) & is_probe_doc & (ni == 10) & (nu == 10)
        is_fam = ((d % 5 == 1) & ~is_probe_doc
                  & (p == (d % n_probes) * PROBE_MOD)
                  & (ni == 9) & (nu == 11))
        bad = int((~(is_self | is_fam)).sum())
        return pa.table({"bad": pa.array([bad], pa.int64()),
                         "n": pa.array([b.num_rows], pa.int64())})

    agg = out.map_batches(check, batch_format="pyarrow").sum(["bad", "n"])
    dt = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    # expected family matches: d%5==1 and d is not a registry probe
    # (O(n/5) driver arithmetic, independent of the engine under test)
    n_fam = sum(1 for d in range(1, n_docs, 5)
                if not (d % PROBE_MOD == 0 and d < PROBE_ID_CAP))
    expected = n_fam + n_probes
    ok = int(agg["sum(bad)"]) == 0 and int(agg["sum(n)"]) == expected
    return {
        "sec": round(dt, 2),
        "docs": n_docs,
        "docs_per_sec": round(n_docs / dt, 1),
        "rows_checked": int(agg["sum(n)"]),
        "rows_expected": expected,
        "mismatched": int(agg["sum(bad)"]),
        "validated": ok,
    }


def run_keepbest_scale(n_docs: int) -> dict:
    """Keep-best near-dup collapse long-haul: dedup_keep_best at ≥500k
    docs with a closed-form expectation validated DISTRIBUTED.

    Corpus: families of 3 (f = d // 3).  Members 0 and 1 share identical
    12-token family-tagged text (Jaccard 1.0 ⇒ a guaranteed pair) with
    n_chars = 100 + member, member 2 is unique and must never cluster.
    Expected: exactly one row per family — cluster 3f keeps doc 3f+1
    (the larger n_chars beats the smaller doc_id), best_n_chars = 101,
    n_members = 2.  Pins the cluster⋈n_chars hash join and the
    packed-argmax exchange on top of the CC path."""
    import shutil

    import pyarrow as pa
    import ray

    from phenobert_ray.functions.dedup import dedup_keep_best

    n_docs -= n_docs % 3
    out_dir = "/tmp/keepbest_scale"
    shutil.rmtree(out_dir, ignore_errors=True)

    def gen(batch: pa.Table) -> pa.Table:
        d = batch.column("id").to_numpy()
        texts = [
            " ".join(f"f{i // 3}x{j}" for j in range(12))
            if i % 3 < 2
            else " ".join(f"u{i}x{j}" for j in range(12))
            for i in d
        ]
        return pa.table({
            "doc_id": pa.array(d, pa.int64()),
            "text": pa.array(texts),
            "n_chars": pa.array(100 + (d % 3), pa.int64()),
        })

    ray.data.range(n_docs).map_batches(gen, batch_format="pyarrow").write_parquet(
        f"{out_dir}/documents.parquet"
    )

    t0 = time.time()
    out = dedup_keep_best(out_dir)

    def check(b: pa.Table) -> pa.Table:
        c = b.column("cluster_id").to_numpy()
        k = b.column("keep_doc_id").to_numpy()
        bn = b.column("best_n_chars").to_numpy()
        nm = b.column("n_members").to_numpy()
        bad = int(((c % 3 != 0) | (k != c + 1) | (bn != 101)
                   | (nm != 2)).sum())
        return pa.table({"bad": pa.array([bad], pa.int64()),
                         "n": pa.array([b.num_rows], pa.int64())})

    agg = out.map_batches(check, batch_format="pyarrow").sum(["bad", "n"])
    dt = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    n_fam = n_docs // 3
    ok = int(agg["sum(bad)"]) == 0 and int(agg["sum(n)"]) == n_fam
    return {
        "sec": round(dt, 2),
        "docs": n_docs,
        "docs_per_sec": round(n_docs / dt, 1),
        "clusters_checked": int(agg["sum(n)"]),
        "clusters_expected": n_fam,
        "mismatched": int(agg["sum(bad)"]),
        "validated": ok,
    }


def run_funnel_scale(n_events: int) -> dict:
    """Conversion-funnel long-haul: funnel_stages at ≥5M events with a
    closed-form expectation validated DISTRIBUTED, every stage completion
    in its OWN time chunk (the cross-chunk fold is the novel machinery).

    Corpus: 10 events per user (event_id = 10u + j), each event in its
    own 6h chunk (ts = (30u + 3j)·CHUNK + j).  By u % 4:
      0 → view@j0, click@j3, purchase@j5 (full conversion, 3 rows);
      1 → click@j0 (pre-view, unusable), view@j2, click@j4 (2 rows);
      2 → view@j0 only (1 row);
      3 → no funnel events (0 rows);
    every other slot is an 'error' event the funnel ignores.  Expected
    output = 1.5 rows/user, each row's (stage, ts, event_id) a pure
    function of event_id — recomputed per emitted row in-cluster."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray

    from phenobert_ray.functions.events import RUN_CHUNK_US, funnel_stages

    n_events -= n_events % 40  # whole users, u%4 classes balanced
    n_users = n_events // 10
    out_dir = "/tmp/funnel_scale"
    shutil.rmtree(out_dir, ignore_errors=True)

    # (u%4, j) → stage kind; everything else is noise
    stage_of = {(0, 0): "view", (0, 3): "click", (0, 5): "purchase",
                (1, 0): "click", (1, 2): "view", (1, 4): "click",
                (2, 0): "view"}
    expect_of = {(0, 0): "view", (0, 3): "click", (0, 5): "purchase",
                 (1, 2): "view", (1, 4): "click", (2, 0): "view"}

    def gen(batch: pa.Table) -> pa.Table:
        e = batch.column("id").to_numpy()
        u, j = e // 10, e % 10
        ts = (30 * u + 3 * j) * RUN_CHUNK_US + j
        types = [stage_of.get((int(uu) % 4, int(jj)), "error")
                 for uu, jj in zip(u, j)]
        return pa.table({
            "event_id": pa.array(e, pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(u, pa.int64()),
            "event_type": pa.array(types),
            "value": pa.array(np.ones(len(e))),
            "props": pa.array(["{}"] * len(e)),
        })

    ray.data.range(n_events).map_batches(gen, batch_format="pyarrow").write_parquet(
        f"{out_dir}/events.parquet"
    )

    t0 = time.time()
    out = funnel_stages(out_dir)

    stage_id = {"view": 0, "click": 1, "purchase": 2}
    lut = np.full((4, 10), -1, dtype=np.int64)
    for (cls, j), st in expect_of.items():
        lut[cls, j] = stage_id[st]

    def check(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy()
        eid = b.column("event_id").to_numpy()
        ts = b.column("ts").to_numpy().astype("int64")
        got_k = np.array([stage_id[s] for s in b.column("stage").to_pylist()],
                         dtype=np.int64)
        u, j = eid // 10, eid % 10
        want_ts = (30 * u + 3 * j) * RUN_CHUNK_US + j
        bad = int((uid != u).sum() + (ts != want_ts).sum()
                  + (lut[u % 4, j] != got_k).sum())
        return pa.table({"bad": pa.array([bad], pa.int64()),
                         "n": pa.array([b.num_rows], pa.int64())})

    agg = out.map_batches(check, batch_format="pyarrow").sum(["bad", "n"])
    dt = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    expected = (n_users // 4) * 6  # 3 + 2 + 1 + 0 per class of four users
    ok = int(agg["sum(bad)"]) == 0 and int(agg["sum(n)"]) == expected
    return {
        "sec": round(dt, 2),
        "events": n_events,
        "events_per_sec": round(n_events / dt, 1),
        "rows_checked": int(agg["sum(n)"]),
        "rows_expected": expected,
        "mismatched": int(agg["sum(bad)"]),
        "validated": ok,
    }


def run_transitions_scale(n_events: int) -> dict:
    """Markov-transition long-haul: event_transitions at ≥5M events with
    an EXACT closed-form expectation (4 output rows), half the users
    within-chunk and half with every event in its OWN 6h chunk so the
    cross-chunk summary fold carries half of all transitions.

    Corpus: 10 events per user (event_id = 10u + j), type cycle
    a→b→c→d→a…; even users pack all 10 events into one chunk, odd users
    spread one event per chunk.  Per user the 9 transitions are exactly
    a→b ×3, b→c ×2, c→d ×2, d→a ×2 — independent of the chunk layout,
    so any boundary mis-fold (lost, doubled or misordered cross-chunk
    pairs) shifts a count."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray

    from phenobert_ray.functions.events import (
        RUN_CHUNK_US,
        event_transitions,
    )

    n_events -= n_events % 20  # whole users, even/odd classes balanced
    n_users = n_events // 10
    out_dir = "/tmp/transitions_scale"
    shutil.rmtree(out_dir, ignore_errors=True)

    types4 = np.array(["a", "b", "c", "d"], dtype=object)

    def gen(batch: pa.Table) -> pa.Table:
        e = batch.column("id").to_numpy()
        u, j = e // 10, e % 10
        # even users: one chunk; odd users: one chunk per event
        # (25·CHUNK per user keeps users' chunk ranges disjoint)
        ts = np.where(u % 2 == 0, 25 * u * RUN_CHUNK_US + j,
                      (25 * u + 2 * j) * RUN_CHUNK_US + j)
        return pa.table({
            "event_id": pa.array(e, pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(u, pa.int64()),
            "event_type": pa.array(types4[j % 4]),
            "value": pa.array(np.ones(len(e))),
            "props": pa.array(["{}"] * len(e)),
        })

    ray.data.range(n_events).map_batches(gen, batch_format="pyarrow").write_parquet(
        f"{out_dir}/events.parquet"
    )

    t0 = time.time()
    got = event_transitions(out_dir).to_pandas()  # ≤ 16 rows: driver-safe
    dt = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    got_map = {(f, t): int(n) for f, t, n in zip(
        got["type_from"], got["type_to"], got["n"])}
    want = {("a", "b"): 3 * n_users, ("b", "c"): 2 * n_users,
            ("c", "d"): 2 * n_users, ("d", "a"): 2 * n_users}
    mism = sum(1 for k in set(got_map) | set(want)
               if got_map.get(k) != want.get(k))
    return {
        "sec": round(dt, 2),
        "events": n_events,
        "events_per_sec": round(n_events / dt, 1),
        "rows_checked": len(got),
        "rows_expected": len(want),
        "mismatched": mism,
        "validated": mism == 0,
    }


def run_paths_scale(n_events: int) -> dict:
    """Session-paths long-haul: session_paths at ≥4M events with an exact
    3-row closed-form expectation; a third of the users open a session
    that STRADDLES the 24h chunk boundary (the head-recombination fold is
    what's under test).

    Corpus: 4 events per user (event_id = 4u + j).  By u % 3:
      0 → a,b,c,d one minute apart mid-chunk → one session, path a>b>c;
      1 → w 10 min BEFORE a day boundary, x,y,z 5/6/7 min after → one
          boundary-straddling session, path w>x>y;
      2 → four events 4 h apart (same chunk, gap > 30 min) → four
          single-event sessions, path e each.
    Expected: {a>b>c: U/3, w>x>y: U/3, e: 4U/3}."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray

    from phenobert_ray.functions.events import session_paths

    n_events -= n_events % 12  # whole users, u%3 classes balanced
    n_users = n_events // 4
    out_dir = "/tmp/paths_scale"
    shutil.rmtree(out_dir, ignore_errors=True)

    DAY = 24 * 3600 * 1_000_000
    MIN = 60 * 1_000_000

    type_of = np.array([["a", "b", "c", "d"],
                        ["w", "x", "y", "z"],
                        ["e", "e", "e", "e"]], dtype=object)

    def gen(batch: pa.Table) -> pa.Table:
        e = batch.column("id").to_numpy()
        u, j = e // 4, e % 4
        cls = u % 3
        base = (50 * u + 1) * DAY  # a day boundary per user, users apart
        ts = np.where(
            cls == 0, base + 60 * MIN + j * MIN,
            np.where(cls == 1,
                     base + np.where(j == 0, -10 * MIN, (4 + j) * MIN),
                     base + 60 * MIN + j * 240 * MIN))
        return pa.table({
            "event_id": pa.array(e, pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(u, pa.int64()),
            "event_type": pa.array(type_of[cls, j]),
            "value": pa.array(np.ones(len(e))),
            "props": pa.array(["{}"] * len(e)),
        })

    ray.data.range(n_events).map_batches(gen, batch_format="pyarrow").write_parquet(
        f"{out_dir}/events.parquet"
    )

    t0 = time.time()
    got = session_paths(out_dir).to_pandas()  # ≤ top-20 rows: driver-safe
    dt = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    got_map = {p: int(n) for p, n in zip(got["path"], got["n_sessions"])}
    want = {"a>b>c": n_users // 3, "w>x>y": n_users // 3,
            "e": 4 * (n_users // 3)}
    mism = sum(1 for k in set(got_map) | set(want)
               if got_map.get(k) != want.get(k))
    return {
        "sec": round(dt, 2),
        "events": n_events,
        "events_per_sec": round(n_events / dt, 1),
        "rows_checked": len(got),
        "rows_expected": len(want),
        "mismatched": mism,
        "validated": mism == 0,
    }


def run_median_scale(n_events: int) -> dict:
    """Exact-grouped-median long-haul: ≥10M events, 3 types, 1001
    distinct cent values per type — the counting exchange carries 3,003
    rows regardless of event count, and the closed-form median is exact.

    Corpus: type t = e % 3, value v = ((e // 3) % 1001) / 100 within
    each type, so each type holds ceil/floor-uniform counts over cents
    0..1000: median cents = 500 exactly when the type's count is odd OR
    the two middles straddle 500 evenly — with n_events a multiple of
    3·1001 every cent value appears equally often per type, so BOTH
    middle order statistics are 500 and median_x2 = 1000."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray

    from phenobert_ray.functions.events import grouped_median

    n_events -= n_events % (3 * 1001)
    out_dir = "/tmp/median_scale"
    shutil.rmtree(out_dir, ignore_errors=True)

    types3 = np.array(["alpha", "beta", "gamma"], dtype=object)

    def gen(batch: pa.Table) -> pa.Table:
        e = batch.column("id").to_numpy()
        return pa.table({
            "event_id": pa.array(e, pa.int64()),
            "ts": pa.array(e.astype("datetime64[us]")),
            "user_id": pa.array(e % 1000, pa.int64()),
            "event_type": pa.array(types3[e % 3]),
            "value": pa.array(((e // 3) % 1001) / 100.0),
            "props": pa.array(["{}"] * len(e)),
        })

    ray.data.range(n_events).map_batches(gen, batch_format="pyarrow").write_parquet(
        f"{out_dir}/events.parquet"
    )

    t0 = time.time()
    got = grouped_median(out_dir).to_pandas()  # 3 rows: driver-safe
    dt = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    per_type = n_events // 3
    got_map = {e: (int(n), int(m)) for e, n, m in zip(
        got["event_type"], got["n_rows"], got["median_x2_cents"])}
    want = {t: (per_type, 1000) for t in types3}
    mism = sum(1 for k in set(got_map) | set(want)
               if got_map.get(k) != want.get(k))
    return {
        "sec": round(dt, 2),
        "events": n_events,
        "events_per_sec": round(n_events / dt, 1),
        "rows_checked": len(got),
        "rows_expected": len(want),
        "mismatched": mism,
        "validated": mism == 0,
    }


def run_wau_scale(n_events: int) -> dict:
    """Weekly-active-users long-haul: 2 events per user (same day — the
    distinct collapse halves the stream), user u active on day u % 50.
    Expected: n_active(day t) = (U / 50) · min(t + 1, 7) for the 50
    active days — every window count is exact and the whole 50-row
    result is compared on the driver."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray

    from phenobert_ray.functions.events import DAY_US, weekly_active_users

    D = 50
    n_events -= n_events % (2 * D)  # whole users, uniform day residues
    n_users = n_events // 2
    out_dir = "/tmp/wau_scale"
    shutil.rmtree(out_dir, ignore_errors=True)

    def gen(batch: pa.Table) -> pa.Table:
        e = batch.column("id").to_numpy()
        u, j = e // 2, e % 2
        ts = (u % D) * DAY_US + u + j * 1000
        return pa.table({
            "event_id": pa.array(e, pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(u, pa.int64()),
            "event_type": pa.array(np.where(j == 0, "view", "click")),
            "value": pa.array(np.ones(len(e))),
            "props": pa.array(["{}"] * len(e)),
        })

    ray.data.range(n_events).map_batches(gen, batch_format="pyarrow").write_parquet(
        f"{out_dir}/events.parquet"
    )

    t0 = time.time()
    got = weekly_active_users(out_dir).to_pandas()  # 50 rows: driver-safe
    dt = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    per_day = n_users // D
    got_map = {int(d): int(n) for d, n in zip(got["day"], got["n_active"])}
    want = {t: per_day * min(t + 1, 7) for t in range(D)}
    mism = sum(1 for k in set(got_map) | set(want)
               if got_map.get(k) != want.get(k))
    return {
        "sec": round(dt, 2),
        "events": n_events,
        "events_per_sec": round(n_events / dt, 1),
        "rows_checked": len(got),
        "rows_expected": len(want),
        "mismatched": mism,
        "validated": mism == 0,
    }


def run_tfidf_scale(n_docs: int) -> dict:
    """TF-IDF long-haul: tfidf_top_terms at ≥1M docs against an exactly
    derivable expected table.

    Corpus: 32 sources (s = d % 32), n_docs a multiple of 96 so residues
    are uniform per source.  Every doc holds 1×'alpha', (2 if s even else
    1)×'beta', and (d % 3)×'sig{s}'.  Per source: tf(alpha) = n/32,
    tf(beta) = (2|1)·n/32, tf(sig_s) = n/32 (0+1+2 per 3 docs); df(alpha)
    = df(beta) = 32, df(sig_s) = 1, N = 32.  The expected 96-row result
    (3 terms/source, score ties broken term-asc) is built analytically
    and compared exactly — the output is k×sources-bounded, so the
    driver-side compare is O(1) in n_docs."""
    import math
    import shutil

    import pandas as pd
    import pyarrow as pa
    import ray

    from phenobert_ray.functions.search import tfidf_top_terms

    n_docs -= n_docs % 96
    out_dir = "/tmp/tfidf_scale"
    shutil.rmtree(out_dir, ignore_errors=True)

    def gen(batch: pa.Table) -> pa.Table:
        d = batch.column("id").to_numpy()
        texts = []
        for i in d:
            s = i % 32
            parts = ["alpha"] + ["beta"] * (2 if s % 2 == 0 else 1)
            parts += [f"sig{s}"] * (i % 3)
            texts.append(" ".join(parts))
        return pa.table({
            "text": pa.array(texts),
            "source": pa.array([f"src{i % 32}" for i in d]),
        })

    ray.data.range(n_docs).map_batches(gen, batch_format="pyarrow").write_parquet(
        f"{out_dir}/documents.parquet"
    )

    t0 = time.time()
    got = (tfidf_top_terms(out_dir).to_pandas()
           .sort_values(["source", "rank"]).reset_index(drop=True))
    dt = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)

    per = n_docs // 32
    i_one = math.floor((math.log(33.0 / 33.0) + 1.0) * 1e9 + 0.5)
    i_sig = math.floor((math.log(33.0 / 2.0) + 1.0) * 1e9 + 0.5)
    rows = []
    for s in range(32):
        tf_beta = (2 if s % 2 == 0 else 1) * per
        cand = [("alpha", per, 32, per * i_one),
                ("beta", tf_beta, 32, tf_beta * i_one),
                (f"sig{s}", per, 1, per * i_sig)]
        cand.sort(key=lambda r: (-r[3], r[0]))
        for rank, (term, tf, df, sc) in enumerate(cand, 1):
            rows.append((f"src{s}", rank, term, tf, df, sc))
    want = pd.DataFrame(rows, columns=["source", "rank", "term", "tf",
                                       "df", "score_nano"])
    want = want.sort_values(["source", "rank"]).reset_index(drop=True)
    ok = got.astype({"rank": "int64"}).equals(
        want.astype({c: got[c].dtype for c in want.columns}))
    return {
        "sec": round(dt, 2),
        "docs": n_docs,
        "docs_per_sec": round(n_docs / dt, 1),
        "rows_checked": len(got),
        "rows_expected": len(want),
        "mismatched": 0 if ok else int(
            (got.values != want.values).any(axis=1).sum()),
        "validated": bool(ok),
    }


def child_main(num_cpus: int) -> None:
    """Fresh-process headline run at a given parallelism (for --scaling)."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    r = run_headline(_sf_dir(), _scaling_replicate(), passes=1)
    ray.shutdown()
    print(json.dumps({"num_cpus": num_cpus, **r}))


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    if "--child" in sys.argv:
        child_main(int(sys.argv[sys.argv.index("--child") + 1]))
        return

    # table-driven scale-regression flags: identical contract for all six
    # (fresh ray session -> runner -> one JSON line -> nonzero exit when the
    # distributed validation failed)
    scale_flags = {
        "--cc-scale": ("GRAFT_CC_EDGES", 10_000_000, run_cc_scale,
                       "cc_scale_edges_per_sec", "edges_per_sec", "edges/sec"),
        "--pack-scale": ("GRAFT_PACK_DOCS", 5_000_000, run_pack_scale,
                         "pack_scale_docs_per_sec", "docs_per_sec", "docs/sec"),
        "--rank-scale": ("GRAFT_RANK_DOCS", 5_000_000, run_rank_scale,
                         "rank_scale_docs_per_sec", "docs_per_sec", "docs/sec"),
        "--kmeans-scale": ("GRAFT_KMEANS_VECS", 2_000_000, run_kmeans_scale,
                           "kmeans_scale_vecs_per_sec", "vecs_per_sec",
                           "vecs/sec"),
        "--spans-scale": ("GRAFT_SPANS_DOCS", 2_000_000, run_spans_scale,
                          "spans_scale_docs_per_sec", "docs_per_sec",
                          "docs/sec"),
        "--index-scale": ("GRAFT_INDEX_CONVS", 2_000_000, run_index_scale,
                          "index_scale_convs_per_sec", "convs_per_sec",
                          "convs/sec"),
        "--skew-scale": ("GRAFT_SKEW_TURNS", 2_000_000, run_skew_scale,
                         "skew_scale_turns_per_sec", "turns_per_sec",
                         "turns/sec"),
        "--ann-scale": ("GRAFT_ANN_VECS", 2_000_000, run_ann_scale,
                        "ann_scale_vecs_per_sec", "vecs_per_sec",
                        "vecs/sec"),
        "--dedup-scale": ("GRAFT_DEDUP_DOCS", 1_200_000, run_dedup_scale,
                          "dedup_scale_docs_per_sec", "docs_per_sec",
                          "docs/sec"),
        "--events-scale": ("GRAFT_EVENTS_N", 10_000_000, run_events_scale,
                           "events_scale_events_per_sec", "events_per_sec",
                           "events/sec"),
        "--fuzzy-scale": ("GRAFT_FUZZY_DOCS", 1_000_000, run_fuzzy_scale,
                          "fuzzy_scale_docs_per_sec", "docs_per_sec",
                          "docs/sec"),
        "--tfidf-scale": ("GRAFT_TFIDF_DOCS", 2_000_000, run_tfidf_scale,
                          "tfidf_scale_docs_per_sec", "docs_per_sec",
                          "docs/sec"),
        "--keepbest-scale": ("GRAFT_KEEPBEST_DOCS", 600_000,
                             run_keepbest_scale,
                             "keepbest_scale_docs_per_sec", "docs_per_sec",
                             "docs/sec"),
        "--funnel-scale": ("GRAFT_FUNNEL_EVENTS", 5_000_000,
                           run_funnel_scale,
                           "funnel_scale_events_per_sec", "events_per_sec",
                           "events/sec"),
        "--transitions-scale": ("GRAFT_TRANSITIONS_EVENTS", 5_000_000,
                                run_transitions_scale,
                                "transitions_scale_events_per_sec",
                                "events_per_sec", "events/sec"),
        "--paths-scale": ("GRAFT_PATHS_EVENTS", 4_000_000,
                          run_paths_scale,
                          "paths_scale_events_per_sec",
                          "events_per_sec", "events/sec"),
        "--wau-scale": ("GRAFT_WAU_EVENTS", 5_000_000,
                        run_wau_scale,
                        "wau_scale_events_per_sec",
                        "events_per_sec", "events/sec"),
        "--median-scale": ("GRAFT_MEDIAN_EVENTS", 10_000_000,
                           run_median_scale,
                           "median_scale_events_per_sec",
                           "events_per_sec", "events/sec"),
    }
    flag = next((f for f in scale_flags if f in sys.argv), None)
    if flag is not None:
        import ray

        env, default, runner, metric, rate_key, unit = scale_flags[flag]
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=_cpus(), include_dashboard=False)
        r = runner(int(os.environ.get(env, str(default))))
        print(json.dumps({"metric": metric, "value": r[rate_key],
                          "unit": unit, **r, "num_cpus": _cpus()}))
        ray.shutdown()
        if not r["validated"]:
            sys.exit(1)
        return

    if "--scaling" in sys.argv:
        # this host shows large run-to-run timing variance (up to 3x on an
        # identical workload); run N fresh-process runs per level, report
        # the MEDIAN (ADVICE r2: min-of-N biases efficiency optimistically)
        # and persist every sample so readers can judge the spread
        repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))
        results = {}
        all_samples = {}
        for n in (8, 32):
            runs = []
            for _ in range(repeats):
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child", str(n)],
                    capture_output=True,
                    text=True,
                    check=True,
                )
                runs.append(json.loads(p.stdout.strip().splitlines()[-1]))
            runs.sort(key=lambda r: r["sec"])
            mid = len(runs) // 2
            med = runs[mid] if len(runs) % 2 else {
                **runs[mid],
                "sec": (runs[mid - 1]["sec"] + runs[mid]["sec"]) / 2,
                "turns_per_sec": runs[mid]["turns"]
                / ((runs[mid - 1]["sec"] + runs[mid]["sec"]) / 2),
            }
            results[n] = med
            all_samples[n] = [round(r["sec"], 2) for r in runs]
        t8, t32 = results[8]["sec"], results[32]["sec"]
        eff = (t8 / t32) / (32 / 8)
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency_8_to_32_cpus",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "throughput_8": round(results[8]["turns_per_sec"], 1),
                    "throughput_32": round(results[32]["turns_per_sec"], 1),
                    "sec_8": round(t8, 2),
                    "sec_32": round(t32, 2),
                    "samples_8": all_samples[8],
                    "samples_32": all_samples[32],
                    "turns": results[32]["turns"],
                    "sf": _sf_dir(),
                }
            )
        )
        return

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=_cpus(), include_dashboard=False)
    head = run_headline(_sf_dir(), _replicate())
    queries = run_queries(_sf_dir())
    total = round(head["sec"] + sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "kg_pipeline_plus_operator_suite_runtime",
                "value": total,
                "unit": "sec",
                "queries": {"kg_headline": round(head["sec"], 3), **queries},
                "headline_samples": head["samples"],
                "sf": _sf_dir(),
                "num_cpus": _cpus(),
                "turns": head["turns"],
                "turns_per_sec": round(head["turns_per_sec"], 1),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
