"""BM25 ranking + per-source z-score (functions/search.py): serial
brute-force oracles over the real sf0.001 documents table."""

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from phenobert_ray.functions.search import (
    BM25_B,
    BM25_K1,
    QUERY_TERMS,
    bm25_topk,
    zscore_by_source,
)


def _brute_bm25(docs: pd.DataFrame, k: int) -> pd.DataFrame:
    toks = docs["text"].str.split(" ")
    dl = toks.str.len().to_numpy(dtype=np.float64)
    n = len(docs)
    avgdl = dl.sum() / n
    total = np.zeros(n, dtype=np.int64)
    for t in QUERY_TERMS:
        tf = toks.map(lambda ws: ws.count(t)).to_numpy(dtype=np.float64)
        df_t = int((tf > 0).sum())
        idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        contrib = idf * (tf * (BM25_K1 + 1.0)
                         / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / avgdl))))
        total += np.floor(contrib * 1e9 + 0.5).astype(np.int64)
    out = pd.DataFrame({"doc_id": docs["doc_id"], "score_nano": total})
    out = out[out["score_nano"] > 0]
    out = out.sort_values(["score_nano", "doc_id"],
                          ascending=[False, True]).head(k)
    out = out.reset_index(drop=True)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out


def test_bm25_matches_serial_bruteforce(sf_small):
    got = bm25_topk(sf_small, k=15).to_pandas()
    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()
    want = _brute_bm25(docs, 15)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_bm25_rank_is_deterministic_and_sorted(sf_small):
    a = bm25_topk(sf_small).to_pandas()
    b = bm25_topk(sf_small).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    s = a["score_nano"].to_numpy()
    assert (np.diff(s) <= 0).all()
    # doc_id strictly increases within equal-score runs
    ties = a[a.duplicated("score_nano", keep=False)]
    for _, g in ties.groupby("score_nano"):
        assert g["doc_id"].is_monotonic_increasing


def test_zscore_matches_pandas_window(sf_small):
    got = zscore_by_source(sf_small).to_pandas().sort_values("doc_id")
    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()
    nt = docs["text"].str.split(" ").str.len().astype("int64")
    df = pd.DataFrame(
        {"doc_id": docs["doc_id"], "source": docs["source"], "x": nt}
    )
    g = df.groupby("source")["x"]
    mean = g.transform("mean")
    std = g.transform(lambda s: s.std(ddof=0))
    want_z = np.where(std > 0, (df["x"] - mean) / std, 0.0)
    got = got.set_index("doc_id")
    assert np.allclose(
        got.loc[df["doc_id"], "z"].to_numpy(), want_z, atol=2e-6
    )
    assert (got.loc[df["doc_id"], "n_tokens"].to_numpy() == nt.to_numpy()).all()


def test_zscore_constant_source_gets_zero(tmp_path):
    # synthetic table with one zero-variance source
    import pyarrow as pa

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": ["a b c", "a b c", "a b", "a b c d"],
            "source": ["flat", "flat", "vary", "vary"],
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = zscore_by_source(str(tmp_path)).to_pandas().set_index("doc_id")
    assert got.loc[0, "z"] == 0.0 and got.loc[1, "z"] == 0.0
    assert got.loc[2, "z"] == -1.0 and got.loc[3, "z"] == 1.0


def test_global_sort_rank_matches_serial(sf_small):
    from phenobert_ray.functions.textstats import global_sort_rank

    got = (global_sort_rank(sf_small).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()
    nt = docs["text"].str.split(" ").str.len().astype("int64")
    exp = (
        pd.DataFrame({"doc_id": docs["doc_id"], "n_tokens": nt})
        .sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    exp["rank"] = np.arange(1, len(exp) + 1, dtype=np.int64)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # ranks are a permutation of 1..N — no gaps, no dupes across buckets
    assert sorted(got["rank"]) == list(range(1, len(exp) + 1))


def test_global_sort_rank_tie_skew(tmp_path):
    """A corpus where EVERY doc has the same token count: the id sub-split
    must spread the single hot length across buckets and still produce the
    exact doc_id-ordered ranking."""
    import pyarrow as pa

    from phenobert_ray.functions.textstats import global_sort_rank

    n = 2000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n)[::-1].copy(), pa.int64()),
            "text": ["w x y z"] * n,
            "source": ["s"] * n,
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = (global_sort_rank(str(tmp_path), n_id_buckets=8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert (got["rank"].to_numpy() == got["doc_id"].to_numpy() + 1).all()


def test_label_centroids_matches_numpy(sf_small):
    from phenobert_ray.functions.ann import label_centroids

    got = label_centroids(sf_small).to_pandas()
    emb = pq.read_table(f"{sf_small}/embeddings.parquet").to_pandas()
    for lbl, g in emb.groupby("label"):
        M = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        want = np.round(M.mean(axis=0), 6)
        mine = (got[got["label"] == lbl].sort_values("dim")["centroid"]
                .to_numpy())
        # engine means are integer-micro-quantized (≤5e-7 off the float
        # mean) then 6-decimal rounded (≤5e-7): 2e-6 covers both
        assert np.allclose(mine, want, atol=2e-6)
        assert (got[got["label"] == lbl]["n_vecs"] == len(g)).all()


def test_hopping_window_agg_covers_tumbling(sf_small):
    """Every event is in exactly width/hop windows: total n_events is
    2x the tumbling count, and each hopping window equals the sum of the
    two tumbling windows it spans."""
    from phenobert_ray.functions.events import hopping_window_agg, window_agg

    hop = hopping_window_agg(sf_small).to_pandas()
    tum = window_agg(sf_small).to_pandas()
    assert hop["n_events"].sum() == 2 * tum["n_events"].sum()
    t = tum.set_index(["window_start", "event_type"])["n_events"]
    for _, r in hop.head(50).iterrows():
        a = t.get((r["window_start"], r["event_type"]), 0)
        b = t.get((r["window_start"] + pd.Timedelta(hours=1), r["event_type"]), 0)
        assert r["n_events"] == a + b


def test_hll_estimate_accuracy(sf_small):
    from phenobert_ray.functions.textstats import hll_distinct_by_source

    got = hll_distinct_by_source(sf_small).to_pandas().set_index("source")
    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()
    exact = docs.groupby("source")["text"].nunique()
    for src, n in exact.items():
        est = got.loc[src, "est"]
        # small cardinalities sit in the linear-counting regime: tight
        assert abs(est - n) / n < 0.1, (src, est, n)


def test_hll_large_cardinality(tmp_path):
    """20k distinct texts, one source: the raw-estimate branch (not linear
    counting) must land within ~4 sigma (sigma = 1.04/sqrt(1024))."""
    import pyarrow as pa

    from phenobert_ray.functions.textstats import hll_distinct_by_source

    n = 20_000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": [f"doc number {i} payload" for i in range(n)],
            "source": ["big"] * n,
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = hll_distinct_by_source(str(tmp_path)).to_pandas()
    est = float(got.loc[0, "est"])
    assert abs(est - n) / n < 4 * 1.04 / np.sqrt(1024)


def test_bpe_pair_counts_matches_serial(sf_small):
    from collections import Counter

    from phenobert_ray.functions.textstats import bpe_pair_counts

    got = bpe_pair_counts(sf_small, k=12).to_pandas()
    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()
    c = Counter()
    for t in docs["text"]:
        ws = t.split(" ")
        c.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:12]
    assert list(zip(got["pair"], got["n"])) == want


# ---------------------------------------------------------------------------
# TF-IDF top terms + fuzzy probe join (round 5)


def _brute_tfidf(docs: pd.DataFrame, k: int) -> pd.DataFrame:
    rows = {}
    for src, text in zip(docs["source"], docs["text"]):
        for w in text.split(" "):
            if w:
                rows[(src, w)] = rows.get((src, w), 0) + 1
    df_t = {}
    for (src, w) in rows:
        df_t[w] = df_t.get(w, 0) + 1
    n_sources = len({s for s, _ in rows})
    out = []
    for (src, w), tf in rows.items():
        idf_nano = math.floor(
            (math.log((1.0 + n_sources) / (1.0 + df_t[w])) + 1.0) * 1e9 + 0.5)
        out.append((src, w, tf, df_t[w], tf * idf_nano))
    frame = pd.DataFrame(out, columns=["source", "term", "tf", "df",
                                       "score_nano"])
    frame = frame.sort_values(["source", "score_nano", "term"],
                              ascending=[True, False, True])
    frame = frame.groupby("source", sort=True).head(k).reset_index(drop=True)
    frame["rank"] = frame.groupby("source").cumcount() + 1
    return frame[["source", "rank", "term", "tf", "df", "score_nano"]]


def test_tfidf_top_terms_matches_serial(sf_small):
    from phenobert_ray.functions.search import tfidf_top_terms

    got = (tfidf_top_terms(sf_small, k=5).to_pandas()
           .sort_values(["source", "rank"]).reset_index(drop=True))
    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()
    want = _brute_tfidf(docs, 5)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_tfidf_rank_contract(sf_small):
    """ranks are 1..k per source, scores non-increasing, term-asc ties."""
    from phenobert_ray.functions.search import TFIDF_TOPK, tfidf_top_terms

    got = tfidf_top_terms(sf_small).to_pandas()
    for _, g in got.groupby("source"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= TFIDF_TOPK
        s = g["score_nano"].to_numpy()
        assert (np.diff(s) <= 0).all()


def test_fuzzy_match_probe_matches_serial(sf_small):
    from phenobert_ray.functions.search import (
        FUZZY_DEN,
        FUZZY_NUM,
        PROBE_ID_CAP,
        PROBE_MOD,
        fuzzy_match_probe,
    )

    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()
    tok = {d: {w for w in t.split(" ") if w}
           for d, t in zip(docs["doc_id"], docs["text"])}
    probes = [d for d in docs["doc_id"]
              if d % PROBE_MOD == 0 and d < PROBE_ID_CAP]
    want = set()
    for p in probes:
        for d, ts in tok.items():
            inter = len(tok[p] & ts)
            union = len(tok[p] | ts)
            if FUZZY_DEN * inter >= FUZZY_NUM * union:
                want.add((p, d, inter, union))
    got = fuzzy_match_probe(sf_small).to_pandas()
    got_set = set(zip(got["probe_id"], got["doc_id"],
                      got["n_inter"], got["n_union"]))
    assert got_set == want
    assert len(got) == len(got_set)  # no duplicate emission


def test_fuzzy_match_probe_empty_token_sets(tmp_path):
    """jaccard(∅,∅)=1 convention: an all-whitespace probe matches exactly
    the all-whitespace docs (n_inter = n_union = 0), nothing else."""
    import pyarrow as pa

    from phenobert_ray.functions.search import fuzzy_match_probe

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": ["   ", "word word", "", "word other"],
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    got = fuzzy_match_probe(str(tmp_path)).to_pandas()
    got_set = set(zip(got["probe_id"], got["doc_id"],
                      got["n_inter"], got["n_union"]))
    assert got_set == {(0, 0, 0, 0), (0, 2, 0, 0)}


def test_rollup_token_stats_matches_serial(sf_small):
    """ROLLUP levels: leaf (source, lang), per-source subtotal, grand
    total — each must equal the obvious pandas aggregation."""
    from phenobert_ray.functions.textstats import ROLLUP_ALL, rollup_token_stats

    got = rollup_token_stats(sf_small).to_pandas()
    docs = pq.read_table(f"{sf_small}/documents.parquet",
                         columns=["text", "source", "lang"]).to_pandas()
    docs["n_tokens"] = docs["text"].str.split(" ").str.len()
    leaf = docs.groupby(["source", "lang"]).agg(
        n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum"))
    g_leaf = got[(got["source"] != ROLLUP_ALL) & (got["lang"] != ROLLUP_ALL)]
    assert len(g_leaf) == len(leaf)
    for (s, l), row in leaf.iterrows():
        m = g_leaf[(g_leaf["source"] == s) & (g_leaf["lang"] == l)]
        assert len(m) == 1
        assert int(m["n_docs"].iloc[0]) == row["n_docs"]
        assert int(m["n_tokens"].iloc[0]) == row["n_tokens"]
    g_src = got[(got["source"] != ROLLUP_ALL) & (got["lang"] == ROLLUP_ALL)]
    src = docs.groupby("source").agg(n_docs=("n_tokens", "size"),
                                     n_tokens=("n_tokens", "sum"))
    assert len(g_src) == len(src)
    for s, row in src.iterrows():
        m = g_src[g_src["source"] == s]
        assert int(m["n_docs"].iloc[0]) == row["n_docs"]
        assert int(m["n_tokens"].iloc[0]) == row["n_tokens"]
    g_tot = got[(got["source"] == ROLLUP_ALL) & (got["lang"] == ROLLUP_ALL)]
    assert len(g_tot) == 1
    assert int(g_tot["n_docs"].iloc[0]) == len(docs)
    assert int(g_tot["n_tokens"].iloc[0]) == docs["n_tokens"].sum()
