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
        total += np.rint(contrib * 1e9).astype(np.int64)
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
