"""Regressions pinned by the adversarial-input oracle gate (round 4).

Each test reproduces a failure `tools/make_adversarial_sf.py` +
`tools/verify_local.py` exposed: pathological-but-valid inputs where the
engine crashed or silently diverged from the DuckDB oracle.  The full
sweep is re-runnable any time with

    python tools/make_adversarial_sf.py /tmp/sfadv
    python tools/verify_local.py /tmp/sfadv
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _events_dir(tmp_path_factory, name, rows):
    d = tmp_path_factory.mktemp(name)
    pq.write_table(pa.table(rows), str(d / "events.parquet"))
    return str(d)


def _docs_dir(tmp_path_factory, name, texts, sources=None):
    d = tmp_path_factory.mktemp(name)
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(sources or ["s"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_props_stats_digit_free_props(tmp_path_factory):
    """'{}' / '{"k": null}' / junk props crashed the whole query
    (str.extract -> NaN -> astype int64); unparsable rows must be
    dropped, parsable ones aggregated."""
    from phenobert_ray.functions.events import props_stats

    base = np.datetime64("2024-01-01T00:00:00", "us")
    d = _events_dir(
        tmp_path_factory, "pstats",
        {
            "event_id": np.arange(5, dtype=np.int64),
            "ts": np.array([base] * 5, dtype="datetime64[us]"),
            "user_id": np.zeros(5, dtype=np.int64),
            "event_type": np.array(["a", "a", "a", "b", "b"], dtype=object),
            "value": np.zeros(5),
            "props": np.array(
                ['{"k": 3}', "{}", '{"k": null}', "not json", '{"k": 7}'],
                dtype=object,
            ),
        },
    )
    got = props_stats(d).to_pandas().set_index("event_type")
    assert int(got.loc["a", "n"]) == 1 and int(got.loc["a", "sum_k"]) == 3
    assert int(got.loc["b", "n"]) == 1 and int(got.loc["b", "max_k"]) == 7


def test_window_agg_exact_cents_with_extremes(tmp_path_factory):
    """±1e12 next to 0.005 in one window: a raw double sum is
    accumulation-order-dependent ((1e12 + 0.005) − 1e12 ≠ 0.005); the
    integer-cents sum is exact regardless of distribution order."""
    from phenobert_ray.functions.events import window_agg

    base = np.datetime64("2024-01-01T00:00:00", "us")
    vals = np.array([1e12, 0.005, -1e12, 99.995])
    d = _events_dir(
        tmp_path_factory, "wagg",
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": np.array([base + np.timedelta64(i, "s") for i in range(4)],
                           dtype="datetime64[us]"),
            "user_id": np.zeros(4, dtype=np.int64),
            "event_type": np.array(["x"] * 4, dtype=object),
            "value": vals,
            "props": np.array(['{"k": 1}'] * 4, dtype=object),
        },
    )
    got = window_agg(d).to_pandas()
    assert len(got) == 1
    want = int(np.floor(vals * 100 + 0.5).astype(np.int64).sum())
    assert int(got.loc[0, "sum_value_cents"]) == want
    assert int(got.loc[0, "n_events"]) == 4


def test_range_join_cents_respect_view_order(tmp_path_factory):
    """The cents prefix sum must be built over the LEXSORTED view order
    (a refactor summed the unsorted array: right n_views, wrong sums
    whenever file order != ts order — caught at sf0.01)."""
    from phenobert_ray.functions.events import range_join

    base = np.datetime64("2024-05-01T00:00:00", "us")
    h = np.timedelta64(3_600_000_000, "us")
    # views written in REVERSED time order; window covers only the first 2
    d = _events_dir(
        tmp_path_factory, "rjorder",
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": np.array([base + 5 * h, base + 2 * h, base + 1 * h, base],
                           dtype="datetime64[us]"),
            "event_type": np.array(
                ["view", "view", "view", "purchase"], dtype=object
            ),
            "user_id": np.zeros(4, dtype=np.int64),
            "value": np.array([800.0, 40.0, 2.0, 0.0]),
            "props": np.array(['{"k": 1}'] * 4, dtype=object),
        },
    )
    got = range_join(d, window_hours=3).to_pandas()
    assert len(got) == 1
    assert int(got.loc[0, "n_views"]) == 2  # +1h, +2h in (0, 3h]
    assert int(got.loc[0, "sum_view_cents"]) == 4200


def test_mixture_sample_arbitrary_source_names(tmp_path_factory):
    """int(source[3:]) crashed on any non-'srcN' source name; rates now
    derive from md5(source) and membership is the exact documented
    predicate."""
    from phenobert_ray.functions.curation import (MIX_RATES, _MIX_TH,
                                                  mixture_sample)

    sources = ["web-crawl/2025", "", "hot", "solo", "src3"]
    d = _docs_dir(tmp_path_factory, "mix",
                  [f"doc {i}" for i in range(5)], sources)
    got = mixture_sample(d).to_pandas()
    exp = set()
    for did, src in enumerate(sources):
        idx = int(hashlib.md5(src.encode()).hexdigest()[:8], 16) % len(MIX_RATES)
        if hashlib.md5(str(did).encode()).hexdigest() < _MIX_TH[idx]:
            exp.add(did)
    assert set(got["doc_id"]) == exp


def test_snm_rank_monotone_on_unicode_keys(tmp_path_factory):
    """Bucket ids must be monotone in lexicographic key order for ANY
    code points: with radix 257 a large second code point ('a🔥…')
    outranked a later first char ('b …'), mis-ranking the corpus."""
    from phenobert_ray.functions.dedup import snm_candidate_pairs

    texts = [
        "a\U0001F525 fire starts this text",
        "b plain ascii follows it",
        "病人有头痛 cjk first char",
        " leading space sorts first",
        "é accent vs ascii",
        "a\U0001F525 fire starts this text",  # exact dup of 0
    ]
    d = _docs_dir(tmp_path_factory, "snmuni", texts)
    got = (snm_candidate_pairs(d, w=len(texts))  # full window: all pairs
           .to_pandas())
    # serial reference: rank by (key, doc_id) with Python's code-point order
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    df["key"] = df["text"].str.slice(0, 12)
    df = df.sort_values(["key", "doc_id"]).reset_index(drop=True)
    df["r"] = np.arange(1, len(df) + 1)
    exp = set()
    for i in range(len(df)):
        for j in range(i + 1, len(df)):
            exp.add((int(df.loc[i, "doc_id"]), int(df.loc[j, "doc_id"]),
                     int(df.loc[j, "r"] - df.loc[i, "r"]),
                     texts[df.loc[i, "doc_id"]] == texts[df.loc[j, "doc_id"]]))
    assert set(zip(got["doc_a"], got["doc_b"], got["gap"], got["is_dup"])) == exp


def test_label_centroids_mixed_magnitudes_deterministic(tmp_path_factory):
    """One label holding 1e3-scale and 1e-8-scale vectors: the micro-
    quantized integer sum is partition-order-proof (a double partial sum
    was not); exactness pinned against the serial integer reference."""
    from phenobert_ray.functions.ann import label_centroids

    rng = np.random.default_rng(7)
    vecs = [rng.normal(size=8) * 1e3, rng.normal(size=8) * 1e-8,
            rng.normal(size=8)]
    d = tmp_path_factory.mktemp("centmix")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array([v.astype(np.float32).tolist()
                                       for v in vecs],
                                      pa.list_(pa.float32())),
                "label": pa.array([1, 1, 1], pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    got = (label_centroids(str(d)).to_pandas()
           .sort_values("dim")["centroid"].to_numpy())
    M = np.stack([v.astype(np.float32) for v in vecs]).astype(np.float64)
    s = np.floor(M * 1e6 + 0.5).astype(np.int64).sum(axis=0)
    want = np.sign(s / 1e6 / 3) * np.floor(np.abs(s / 1e6 / 3) * 1e6 + 0.5) / 1e6
    assert (got == want).all()


@pytest.mark.parametrize("q", ["sessionize", "hopping_window_agg"])
def test_cents_columns_are_int64(sf_small, q):
    """The whole events family publishes exact integer cent sums."""
    from phenobert_ray.functions import events as ev

    got = ev.queries()[q](sf_small).to_pandas()
    assert got["sum_value_cents"].dtype == np.int64


# ---------------------------------------------------------------------------
# the read-boundary null contract (stages/shuffle.py drop_null_rows):
# engine(T) == engine(T with rows null-in-projected-columns removed)

def _null_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("sfnull")
    base = np.datetime64("2024-01-01T00:00:00", "us")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array(["hello world", None, "the fast scan", "x", None],
                         pa.string()),
        "lang": pa.array(["en", None, "en", "es", "zh"], pa.string()),
        "source": pa.array(["s1", "s1", None, "s2", None], pa.string()),
        "n_chars": pa.array([11, None, 13, 1, None], pa.int64()),
    }), str(d / "documents.parquet"))
    pq.write_table(pa.table({
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "ts": pa.array([base, base, None, base + np.timedelta64(5, "s")],
                       pa.timestamp("us")),
        "user_id": pa.array([1, None, 1, 2], pa.int64()),
        "event_type": pa.array(["view", "purchase", None, "view"],
                               pa.string()),
        "value": pa.array([1.0, None, 3.0, None], pa.float64()),
        "props": pa.array(['{"k": 1}', None, '{"k": 2}', '{"k": 3}'],
                          pa.string()),
    }), str(d / "events.parquet"))
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[0.1] * 64, None, [0.2] * 64],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 1, None], pa.int32()),
    }), str(d / "embeddings.parquet"))
    return d


def _twin(src_dir, tmp_path_factory, table, cols):
    """Copy of src_dir with `table` pre-filtered to non-null `cols` —
    the contract's reference result."""
    import shutil

    d = tmp_path_factory.mktemp("sftwin")
    for f in src_dir.iterdir():
        shutil.copy(str(f), str(d / f.name))
    t = pq.read_table(str(src_dir / f"{table}.parquet"))
    keep = np.ones(t.num_rows, dtype=bool)
    for c in cols:
        keep &= t.column(c).is_valid().to_numpy(zero_copy_only=False)
    pq.write_table(t.filter(pa.array(keep)), str(d / f"{table}.parquet"))
    return str(d)


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("qname,table,cols", [
    ("exact_dedup", "documents", ("doc_id", "text")),
    # doc_stats no longer projects `source` (review r4 w8: over-projection
    # dropped null-source docs the oracle counts)
    ("doc_stats", "documents", ("doc_id", "text")),
    ("kg_triples", "documents", ("doc_id", "text")),
    ("window_agg", "events", ("ts", "event_type", "value")),
    ("props_stats", "events", ("event_type", "props")),
    ("kmeans_assign", "embeddings", ("vec_id", "embedding")),
    ("ann_topk", "embeddings", ("vec_id", "embedding")),
    ("label_centroids", "embeddings", ("vec_id", "embedding", "label")),
])
def test_null_rows_dropped_at_read(tmp_path_factory, qname, table, cols):
    """Null-bearing tables neither crash nor leak incomplete rows: the
    result equals running on a table pre-filtered to the operator's
    projected columns (and nulls in UNprojected columns never drop a
    row — the twin filters only `cols`)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    src = _null_sf(tmp_path_factory)
    q = E.queries()[qname]
    got = q(str(src))
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    want = q(_twin(src, tmp_path_factory, table, cols))
    want = want if isinstance(want, pd.DataFrame) else want.to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_null_unprojected_column_never_drops_doc(tmp_path_factory):
    """review r4 w8: text-only operators over-projected `source`, so a doc
    with NULL source vanished from lang_id/doc_stats while its tokens still
    reached top_tokens — inconsistent corpus views.  A null in a column an
    operator does not use must never drop the row."""
    d = tmp_path_factory.mktemp("nullsrc")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["zzz qqq", "aaa bbb"], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
                "source": pa.array([None, "s"], pa.string()),
                "n_chars": pa.array([7, 7], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    from phenobert_ray.functions.textstats import (
        cms_probe_counts,
        doc_stats,
        lang_id,
        token_count_by_source,
    )

    assert sorted(lang_id(str(d)).to_pandas()["doc_id"]) == [0, 1]
    assert sorted(doc_stats(str(d)).to_pandas()["doc_id"]) == [0, 1]
    # cms: probe tokens and sketch counts must see the SAME corpus —
    # the null-source doc's tokens count (est == true_n == 1, not 0)
    cms = cms_probe_counts(str(d)).to_pandas().set_index("token")
    assert cms.loc["zzz", "true_n"] == 1 and cms.loc["zzz", "est"] >= 1
    # token_count_by_source DOES project source: the null-source row is
    # incomplete FOR IT and drops, per the read-boundary contract
    tc = token_count_by_source(str(d)).to_pandas()
    assert tc["source"].tolist() == ["s"] and int(tc["n_docs"].iloc[0]) == 1


def test_cms_cell_memo_keyed_by_width(tmp_path_factory):
    """review r4 w8: the per-worker cell memo ignored the sketch width, so
    a second call with a different w reused cells computed mod the first w."""
    from phenobert_ray.functions.textstats import _cms_cell

    a = _cms_cell(0, "collision-probe", 512)
    b = _cms_cell(0, "collision-probe", 256)
    assert b < 256
    assert b == int(hashlib.md5(b"0|collision-probe").hexdigest()[:16], 16) % 256


def test_bpe_regex_ascii_whitespace_parity(tmp_path_factory):
    """review r4 w8: Python \\s is Unicode-aware, RE2's is ASCII-only — a
    NBSP diverged engine vs oracle; the explicit ASCII class must make
    both engines split identically."""
    import duckdb

    from phenobert_ray.functions.textstats import _BPE_RE_SRC, bpe_token_count

    d = tmp_path_factory.mktemp("nbsp")
    texts = ["a b", "x   y", "plain text"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 3, pa.string()),
                "source": pa.array(["s"] * 3, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = bpe_token_count(str(d)).to_pandas().set_index("doc_id")["n_bpe_tokens"]
    con = duckdb.connect()
    want = con.execute(
        f"SELECT len(regexp_extract_all(t, '{_BPE_RE_SRC}')) "
        "FROM (VALUES (?), (?), (?)) v(t)", texts
    ).fetchall()
    for i in range(3):
        assert got[i] == want[i][0], (i, got[i], want[i][0])


def test_search_convs_with_all_empty_ids(mini, sf_small):
    """review r4 w8: hpo_ids=[] crashed the exchange (aggs={}); vacuous
    AND = every conv with a non-negated mention."""
    from phenobert_ray.sources.inverted_index import search_convs_with_all
    from phenobert_ray.stages.annotate import annotate_turns
    from phenobert_ray.transcripts import read_turns

    anns = annotate_turns(read_turns(sf_small), mini)
    rows = anns.select_columns(["conv_id", "negated"]).to_pandas()
    want = sorted(set(rows.loc[~rows["negated"], "conv_id"]))
    got = sorted(search_convs_with_all(
        annotate_turns(read_turns(sf_small), mini), []
    ).to_pandas()["conv_id"])
    assert got == want


def test_token_count_by_source_empty_corpus(tmp_path_factory):
    """review r4 w8: empty corpus returned a column-less frame (KeyError in
    any consumer); must be typed-empty like the file's other operators."""
    d = tmp_path_factory.mktemp("emptydocs")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    from phenobert_ray.functions.textstats import token_count_by_source

    ds = token_count_by_source(str(d))
    # ray's to_pandas drops columns on ANY empty dataset; the guard makes
    # the DATASET schema (what write_parquet and schema-sensitive
    # consumers see) typed instead of raising/column-less
    assert [f.name for f in ds.schema().base_schema] == [
        "source", "n_docs", "total_tokens"]
    assert ds.count() == 0


def _mini_docs(tmp_path_factory, name, doc_ids, texts, sources=None):
    d = tmp_path_factory.mktemp(name)
    n = len(doc_ids)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(sources or ["s"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_zero_pair_results_keep_schema(tmp_path_factory):
    """review r4 w9: a corpus with NO near-duplicates (legitimate input) made
    every pair-shaped operator return a dataset whose schema Ray dropped —
    write_parquet and in-cluster consumers saw column-less blocks.
    typed_result must pin Dataset.schema() (to_pandas stays Ray-limited)."""
    from phenobert_ray.functions.dedup import (
        duplicate_spans,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_dup_pairs,
    )

    d = _mini_docs(
        tmp_path_factory, "nopairs", [0, 1, 2, 3],
        ["alpha beta gamma delta", "epsilon zeta eta theta",
         "iota kappa lam mu", "nu xi omicron pi"],
    )
    for fn, cols in [
        (minhash_lsh_pairs, ["doc_a", "doc_b", "jac"]),
        (ngram_jaccard_pairs, ["doc_a", "doc_b", "jac"]),
        (simhash_dup_pairs, ["doc_a", "doc_b", "hamming"]),
        (duplicate_spans, ["doc_id", "span_start", "span_end", "n_tokens"]),
    ]:
        ds = fn(d)
        assert ds.count() == 0, fn.__name__
        assert [f.name for f in ds.schema().base_schema] == cols, fn.__name__


def test_duplicate_doc_ids_row_distinct_oracles(tmp_path_factory):
    """review r4 w9: the fingerprint and BPE oracles keyed their per-row
    sequence unrolling on doc_id, so duplicate ids (a re-crawled corpus)
    cross-joined the recursive roll (11 rows from 7 inputs) and interleaved
    token streams; both are row-distinct now, matching the engines."""
    import duckdb

    d = _mini_docs(
        tmp_path_factory, "dupkeys", [0, 0, 1, 1, 2],
        ["alpha beta gamma", "delta epsilon", "same text", "same text",
         "join window hash join"],
    )
    from phenobert_ray.functions.textstats import bpe_encode, fingerprint, oracles

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    got_fp = fingerprint(d).to_pandas().sort_values(
        ["doc_id", "fp"]).reset_index(drop=True)
    want_fp = con.execute(oracles()["fingerprint"]).df().sort_values(
        ["doc_id", "fp"]).reset_index(drop=True)
    assert len(got_fp) == 5
    pd.testing.assert_frame_equal(
        got_fp.astype({"fp": "uint64"}), want_fp.astype({"fp": "uint64"}))

    got_be = bpe_encode(d).to_pandas().sort_values(
        ["doc_id", "n_units"]).reset_index(drop=True)
    want_be = con.execute(oracles()["bpe_encode"]).df().sort_values(
        ["doc_id", "n_units"]).reset_index(drop=True)
    assert len(got_be) == 5
    pd.testing.assert_frame_equal(
        got_be.astype("int64"), want_be.astype("int64"))


def test_running_user_spend_range_frame_ties(tmp_path_factory):
    """review r4 w9: rows tied on the FULL window order key (duplicate
    (ts, event_id) — re-ingested streams) are SQL window PEERS under the
    default RANGE frame: every peer sees the sum through the last peer.
    The plain row-cumsum gave tied rows different running totals."""
    import numpy as np

    d = tmp_path_factory.mktemp("dupev")
    base = np.datetime64("2024-01-01T00:00:00", "us")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([0, 1, 1, 2], pa.int64()),
                "ts": pa.array(
                    [base, base + np.timedelta64(600, "s"),
                     base + np.timedelta64(600, "s"),
                     base + np.timedelta64(1200, "s")],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1, 1, 1, 1], pa.int64()),
                "event_type": pa.array(["view"] * 4, pa.string()),
                "value": pa.array([10.0, 1.0, 2.0, 3.0], pa.float64()),
                "props": pa.array(['{"n": 1}'] * 4, pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    from phenobert_ray.functions.events import running_user_spend

    got = running_user_spend(str(d)).to_pandas().sort_values(
        ["event_id", "cents"]).reset_index(drop=True)
    # the two event_id=1 peers BOTH see 10+1+2 = 13.00
    assert got["running_cents"].tolist() == [1000, 1300, 1300, 1600]


def test_all_empty_sf_returns_typed_results(tmp_path_factory):
    """review r4 w9: over an ALL-EMPTY scale factor (a legitimate quiet
    time-slice partition) 48 queries returned schema-less empties (Ray
    can't type a dataset whose every block is empty).  The query surface
    now guards zero-row primary tables with its result-schema registry;
    spot-check one query per family against the registry."""
    import pyarrow.parquet as _pq

    import __ray_entry__ as E

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("emptysf")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        tbl = _pq.read_table(f"{src}/{t}.parquet")
        _pq.write_table(tbl.schema.empty_table(), str(d / f"{t}.parquet"))
    qs = E.queries()
    for name in ["extract_mentions", "sessionize", "doc_stats",
                 "revenue_by_segment", "inverted_index", "exact_dedup",
                 "label_centroids", "render_conversations"]:
        res = qs[name](str(d))
        want = [c for c, _ in E._EMPTY_RESULT_SCHEMAS[name][1]]
        got = [f.name for f in res.schema().base_schema]
        assert got == want, (name, got, want)
        assert res.count() == 0, name


def test_search_convs_with_any_or_semantics(mini, sf_small):
    """OR-probe = union of the per-id conv sets; empty id list = empty
    result (⋃ over ∅), the dual of the AND probe's universe."""
    from phenobert_ray.sources.inverted_index import (
        search_convs_with_all,
        search_convs_with_any,
    )
    from phenobert_ray.stages.annotate import annotate_turns
    from phenobert_ray.transcripts import read_turns

    ids = ["HP:0002373", "HP:0002069"]
    anns = annotate_turns(read_turns(sf_small), mini)
    rows = anns.select_columns(["conv_id", "hpo_id", "negated"]).to_pandas()
    rows = rows[~rows["negated"]]
    want = sorted(set(rows.loc[rows["hpo_id"].isin(ids), "conv_id"]))
    got = sorted(search_convs_with_any(
        annotate_turns(read_turns(sf_small), mini), ids
    ).to_pandas()["conv_id"])
    assert got == want
    # OR ⊇ AND on the same ids
    both = set(search_convs_with_all(
        annotate_turns(read_turns(sf_small), mini), ids
    ).to_pandas()["conv_id"])
    assert both <= set(got)
    # vacuous OR
    assert search_convs_with_any(
        annotate_turns(read_turns(sf_small), mini), []
    ).count() == 0
