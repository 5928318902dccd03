"""Degenerate-input robustness: a pathological 4-doc documents table (a
1-token doc, an exact duplicate pair, a benchmark-slice doc at doc_id 0)
must flow through every documents-family operator without crashing — tiny
and empty groups/blocks are where group-merge and exchange code breaks
first at scale."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TINY = pd.DataFrame(
    {
        # doc_id 0 is the benchmark slice (0 % BENCH_MOD == 0)
        "doc_id": pd.array([0, 1, 2, 3], dtype="int64"),
        "text": [
            "x",  # single token: no 2/3-grams at all
            "the fast table scan the fast table scan",
            "the fast table scan the fast table scan",  # exact dup of 1
            "le la les le la les le la",  # french markers
        ],
        # mixture_sample derives keep rates from md5(source) % 4
        # (md5('src3') % 4 == 3 → rate 1.0 keeps everything; 'src7' → 0.75)
        "source": ["src3", "src3", "src3", "src7"],
    }
)


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tinydocs")
    pq.write_table(pa.Table.from_pandas(TINY), str(d / "documents.parquet"))
    return str(d)


def _run(fn, tiny_dir):
    res = fn(tiny_dir)
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def test_textstats_family_on_tiny(tiny_dir):
    from phenobert_ray.functions import textstats as t

    assert len(_run(t.doc_stats, tiny_dir)) == 4
    assert len(_run(t.quality_score, tiny_dir)) == 4
    assert len(_run(t.lang_id, tiny_dir)) == 4
    assert len(_run(t.fingerprint, tiny_dir)) == 4
    q = _run(t.token_quantiles_by_source, tiny_dir)
    assert set(q["source"]) == {"src3", "src7"}


def test_dedup_family_on_tiny(tiny_dir):
    from phenobert_ray.functions import dedup as d

    ex = _run(d.exact_dedup, tiny_dir)
    assert len(ex) == 3  # docs 1+2 collapse
    assert int(ex.set_index("text_md5")["n_dups"].max()) == 2
    mh = _run(d.minhash_lsh_pairs, tiny_dir)
    assert set(zip(mh["doc_a"], mh["doc_b"])) == {(1, 2)}
    sh = _run(d.simhash_signatures, tiny_dir)
    assert len(sh) == 4


def test_curation_family_on_tiny(tiny_dir):
    from phenobert_ray.functions import curation as c

    dec = _run(c.decontaminate, tiny_dir)
    assert len(dec) == 3  # doc 0 is the benchmark slice
    assert not dec["contaminated"].any()  # 'x' shares no 3-gram with others
    rep = _run(c.repetition_stats, tiny_dir).set_index("doc_id")
    assert rep.loc[0, "dup_3gram_frac"] == 0.0  # no grams at all
    assert rep.loc[1, "dup_3gram_frac"] > 0.5
    pk = _run(c.pack_sequences, tiny_dir).sort_values("doc_id")
    assert list(pk["start_offset"]) == [0, 1, 9, 17]
    assert len(_run(c.pii_redact, tiny_dir)) == 4
    ss = _run(c.stratified_sample, tiny_dir)
    assert len(ss) == 4  # all docs fit under the per-source cap
    import hashlib as hl

    from phenobert_ray.functions.curation import MIX_RATES

    mix = _run(c.mixture_sample, tiny_dir)
    exp = {
        did for did, src in zip([0, 1, 2, 3], ["src3", "src3", "src3", "src7"])
        if int(hl.md5(str(did).encode()).hexdigest(), 16)
        < MIX_RATES[int(hl.md5(src.encode()).hexdigest()[:8], 16)
                    % len(MIX_RATES)] * 2**128
    }
    assert set(mix["doc_id"]) == exp  # src3 → rate 1.0 keeps 0,1,2
    cur = _run(c.curate_corpus, tiny_dir)
    assert len(cur) <= 3  # never emits the benchmark doc


def test_r3d_ops_on_tiny(tiny_dir):
    """BM25 / z-score / rank / HLL on the pathological 4-doc corpus."""
    from phenobert_ray.functions import textstats as t
    from phenobert_ray.functions.search import bm25_topk, zscore_by_source

    # none of the 4 docs contains a BM25 query term: the result must be
    # EMPTY without crashing.  (Columns are unavoidably dropped: Ray 2.49
    # cannot round-trip a typed fully-empty dataset — even
    # ray.data.from_pandas(typed_empty).to_pandas() returns a column-less
    # frame, and map_batches is skipped for empty blocks, so no stage can
    # retype them.  Documented boundary, guarded in bm25_topk._typed.)
    bm = _run(bm25_topk, tiny_dir)
    assert len(bm) == 0

    z = _run(zscore_by_source, tiny_dir)
    assert len(z) == 4
    # src7 has a single doc -> zero variance -> z = 0
    assert float(z.set_index("doc_id").loc[3, "z"]) == 0.0

    r = _run(t.global_sort_rank, tiny_dir)
    assert sorted(r["rank"]) == [1, 2, 3, 4]

    h = _run(t.hll_distinct_by_source, tiny_dir)
    h = h.set_index("source")
    # 4 docs, 3 distinct texts in src3 (two dups), 1 in src7; tiny
    # cardinalities are exact under linear counting
    assert abs(float(h.loc["src3", "est"]) - 2.0) < 0.1
    assert abs(float(h.loc["src7", "est"]) - 1.0) < 0.1


def test_range_join_no_views(tmp_path_factory):
    """Purchases but ZERO views: every window aggregates to zero, and the
    empty-side bucket path must not crash."""
    import numpy as np

    from phenobert_ray.functions.events import range_join

    base = np.datetime64("2024-06-01T00:00:00", "us")
    rows = {
        "event_id": np.arange(3, dtype=np.int64),
        "user_id": np.array([1, 1, 2], dtype=np.int64),
        "ts": base + (np.arange(3) * 3_600_000_000).astype("timedelta64[us]"),
        "event_type": np.array(["purchase"] * 3, dtype=object),
        "value": np.zeros(3),
    }
    d = tmp_path_factory.mktemp("noviews")
    pq.write_table(pa.table(rows), str(d / "events.parquet"))
    got = range_join(str(d)).to_pandas()
    assert len(got) == 3
    assert (got["n_views"] == 0).all()
    assert (got["sum_view_cents"] == 0).all()


def test_label_centroids_single_vector_labels(tmp_path_factory):
    import numpy as np

    from phenobert_ray.functions.ann import label_centroids

    d = tmp_path_factory.mktemp("onevec")
    vecs = [np.arange(4, dtype=np.float32) + i for i in range(3)]
    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([0, 1, 2], pa.int32()),
        }
    )
    pq.write_table(t, str(d / "embeddings.parquet"))
    got = label_centroids(str(d)).to_pandas()
    assert len(got) == 12  # 3 labels x 4 dims
    for i in range(3):
        mine = got[got["label"] == i].sort_values("dim")["centroid"].to_numpy()
        assert (mine == vecs[i].astype(np.float64)).all()


def test_r3e_ops_on_tiny(tiny_dir):
    """The r3e family on the pathological 4-doc table: single-token doc
    (no grams, no bigrams), an exact-dup pair (cross-doc spans over the
    FULL text), and per-source singletons."""
    from phenobert_ray.functions import curation as c
    from phenobert_ray.functions import dedup as d
    from phenobert_ray.functions import lm
    from phenobert_ray.functions import textstats as t

    spans = _run(d.duplicate_spans, tiny_dir)
    # docs 1+2 (8 tokens each, L=8): one full-width span each
    assert set(zip(spans["doc_id"], spans["span_start"], spans["span_end"])) \
        == {(1, 0, 7), (2, 0, 7)}
    ppl = _run(lm.lm_perplexity, tiny_dir).set_index("doc_id")
    assert 0 not in ppl.index          # 1-token doc has no bigram
    assert set(ppl.index) == {1, 2, 3}
    assert (ppl.loc[[1, 2]].values == ppl.loc[[2, 1]].values).all()
    dsir = _run(c.dsir_importance, tiny_dir).set_index("doc_id")
    assert 0 not in dsir.index and len(dsir) == 3
    merges = _run(t.bpe_train_merges, tiny_dir)
    assert len(merges) == 4 and merges.loc[0, "n"] >= 2
    gr = _run(c.gopher_rules, tiny_dir).set_index("doc_id")
    assert len(gr) == 4 and not gr["ok_word_count"].any()  # all < 50 words
    win = _run(t.winnowing_fingerprints, tiny_dir)
    # doc 0 has no 4-grams; docs 1-3 (8 tokens → 5 grams = w) each select
    assert set(win["doc_id"]) == {1, 2, 3}
    ch = _run(c.chunk_documents, tiny_dir).set_index(["doc_id", "chunk_idx"])
    assert ch.loc[(0, 0), "chunk_text"] == "x"
    assert len(ch) == 4                  # every short doc = exactly 1 chunk
    ls = _run(d.leakage_safe_split, tiny_dir).set_index("doc_id")
    assert len(ls) == 4
    assert ls.loc[1, "split"] == ls.loc[2, "split"]  # dup pair same side
    assert ls.loc[1, "group_key"] == ls.loc[2, "group_key"] == 1


def test_semdedup_two_vectors(tmp_path_factory):
    """A 2-vector table (fewer rows than cells): no crash, identical
    vectors collapse."""
    import numpy as np

    from phenobert_ray.functions.dedup import semdedup

    d = tmp_path_factory.mktemp("sem2")
    v = [0.5] * 8
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1], pa.int64()),
                "embedding": pa.array([v, v], pa.list_(pa.float32())),
                "label": pa.array([0, 0], pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    got = semdedup(str(d), n_cells=8).to_pandas().set_index("vec_id")
    assert got.loc[0, "keep"] and not got.loc[1, "keep"]
    assert (got["group_id"] == 0).all()
    del np


@pytest.fixture(scope="module")
def tiny_emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tinyemb")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(
                    [[0.1] * 64, [0.2] * 64, [0.3] * 64],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0, 0, 0], pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([7], pa.int64()),
                "text": ["single doc only"],
                "source": ["s"],
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_r3f_ops_on_degenerate(tiny_emb_dir):
    from phenobert_ray.functions import cluster as clu
    from phenobert_ray.functions.dedup import (
        bloom_incremental_dedup,
        snm_candidate_pairs,
    )
    from phenobert_ray.functions.textstats import cms_probe_counts

    # fewer vectors than k: codebook degrades to the seeds that exist,
    # same as the oracle's vec_id < k CTE
    km = clu.kmeans_assign(tiny_emb_dir).to_pandas()
    assert len(km) == 3 and set(km["cluster"]) <= {0, 1, 2}
    pqc = clu.pq_encode(tiny_emb_dir).to_pandas()
    assert len(pqc) == 3
    assert len(clu.pca_top_direction(tiny_emb_dir).to_pandas()) == clu.DIM
    # doc_id 7: empty SNM windows beyond 1 doc, empty bloom base (doc 7
    # is incoming), empty CMS probe set (doc_id < 5 absent)
    assert len(snm_candidate_pairs(tiny_emb_dir).to_pandas()) == 0
    bl = bloom_incremental_dedup(tiny_emb_dir).to_pandas()
    assert len(bl) == 1 and not bl["maybe_dup"].iloc[0]
    assert len(cms_probe_counts(tiny_emb_dir).to_pandas()) == 0


@pytest.fixture(scope="module")
def empty_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("emptydocs")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_review_repros_stay_fixed(empty_docs_dir, tmp_path_factory):
    """Crash classes a code review confirmed (zero-row / edge-topology
    paths): star-graph kcore peeling, empty-corpus SNM / snapshot diff,
    and a chained join whose filter empties a side."""
    import ray

    from phenobert_ray.functions.curation import corpus_diff
    from phenobert_ray.functions.dedup import snm_candidate_pairs
    from phenobert_ray.functions.graph import kcore_nodes

    # hub whose neighbors are all degree-1: a round leaves alive nodes but
    # zero alive-alive edges
    edges = pa.table({"hpo_a": ["a", "a", "a"], "hpo_b": ["b", "c", "d"]})
    assert len(kcore_nodes(ray.data.from_arrow(edges), k=2).to_pandas()) == 0

    assert len(snm_candidate_pairs(empty_docs_dir).to_pandas()) == 0
    assert len(corpus_diff(empty_docs_dir).to_pandas()) == 0

    # Q3 with a segment no customer has: both chained joins must
    # short-circuit to an empty, typed result
    import pandas as pd

    d2 = tmp_path_factory.mktemp("q3nomatch")
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1], pa.int64()),
                "c_name": ["a"],
                "c_nationkey": pa.array([0], pa.int32()),
                "c_acctbal": pa.array([1.0]),
                "c_mktsegment": ["MACHINERY"],
            }
        ),
        str(d2 / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([10], pa.int64()),
                "o_custkey": pa.array([1], pa.int64()),
                "o_orderstatus": ["O"],
                "o_totalprice": pa.array([5.0]),
                "o_orderdate": pa.array(
                    [pd.Timestamp("1996-01-01")], pa.timestamp("us")
                ),
                "o_orderpriority": ["1-URGENT"],
            }
        ),
        str(d2 / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([10], pa.int64()),
                "l_partkey": pa.array([1], pa.int64()),
                "l_suppkey": pa.array([1], pa.int64()),
                "l_linenumber": pa.array([1], pa.int32()),
                "l_quantity": pa.array([1.0]),
                "l_extendedprice": pa.array([9.0]),
                "l_discount": pa.array([0.1]),
                "l_tax": pa.array([0.0]),
                "l_returnflag": ["N"],
                "l_linestatus": ["O"],
                "l_shipdate": pa.array(
                    [pd.Timestamp("1999-01-01")], pa.timestamp("us")
                ),
            }
        ),
        str(d2 / "lineitem.parquet"),
    )
    from phenobert_ray.functions.relational import shipping_priority

    got = shipping_priority(str(d2))
    assert got.count() == 0
    # NB: to_pandas() drops columns on 0-row datasets; assert on schema
    assert got.schema().names == ["l_orderkey", "o_orderdate", "revenue_cpct"]


def test_assign_overflow_guard_rejects_unsafe_range():
    """The 2^26 guard admitted silent int64 wraparound from ~2^23.5
    (review-confirmed); the bound is now 2^22 with >2 bits of margin."""
    import numpy as np

    from phenobert_ray.functions import cluster as clu

    with pytest.raises(ValueError):
        clu._check_bounds(np.array([2**22], dtype=np.int64))
    clu._check_bounds(np.array([2**22 - 1], dtype=np.int64))  # ok


def test_triangles_wedge_free_and_empty_graphs():
    """Path graphs and empty edge lists leave every wedge partition empty;
    the chained joins must return 0 triangles, not crash the hash-join
    aggregator on column-less blocks (review r4, reproduced)."""
    import pandas as pd
    import ray

    from phenobert_ray.functions.graph import triangles

    path = pd.DataFrame({"hpo_a": ["1", "2"], "hpo_b": ["2", "3"]})
    assert triangles(ray.data.from_pandas(path)).count() == 0
    empty = pd.DataFrame({"hpo_a": pd.Series([], dtype=str),
                          "hpo_b": pd.Series([], dtype=str)})
    assert triangles(ray.data.from_pandas(empty)).count() == 0
    tri = pd.DataFrame({"hpo_a": ["1", "1", "2"], "hpo_b": ["2", "3", "3"]})
    got = triangles(ray.data.from_pandas(tri)).to_pandas()
    assert got.values.tolist() == [["1", "2", "3"]]


def test_ann_queries_on_empty_embeddings(tmp_path):
    """An empty embeddings table returns a typed empty result from every
    ann_* query and semdedup instead of crashing np.stack([]) (review r4)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from phenobert_ray.functions.ann import (ann_ivf_topk, ann_kmeans_topk,
                                             ann_lsh_topk, ann_topk)
    from phenobert_ray.functions.dedup import semdedup

    src = pads.dataset("/root/testdata/sf0.001/embeddings.parquet")
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(src.schema.empty_table(), d / "embeddings.parquet")
    for fn in (ann_topk, ann_ivf_topk, ann_lsh_topk, ann_kmeans_topk):
        res = fn(str(d))
        assert res.count() == 0
        assert set(res.schema().names) == {"query_id", "rank", "neighbor_id"}
    sd = semdedup(str(d))
    assert sd.count() == 0


def test_shingle_dedup_short_docs_match_oracle(tmp_path):
    """Docs with fewer than k tokens emit NO shingles — identical 2-token
    docs must NOT near-dup-pair (the SQL oracles' range() emits nothing
    for them; exact_dedup owns that case) (review r4)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from phenobert_ray.functions.dedup import (minhash_lsh_pairs,
                                               ngram_jaccard_pairs, shingles)

    assert shingles("one two", 3) == set()
    # identical LONG docs: every band matches, so minhash must find the
    # (2,3) pair while the identical SHORT docs never pair on either side
    texts = ["tiny doc", "tiny doc",
             "alpha beta gamma delta epsilon zeta",
             "alpha beta gamma delta epsilon zeta"]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "source": pa.array(["s"] * 4, pa.string())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    import __ray_entry__ as E
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    for name, fn in (("ngram_jaccard_pairs", ngram_jaccard_pairs),
                     ("minhash_lsh_pairs", minhash_lsh_pairs)):
        mine = fn(str(d)).to_pandas().sort_values(
            ["doc_a", "doc_b"]).reset_index(drop=True)
        oracle = con.execute(E.oracle_sql()[name]).df().sort_values(
            ["doc_a", "doc_b"]).reset_index(drop=True)
        assert len(mine) == len(oracle), name
        assert mine["doc_a"].tolist() == oracle["doc_a"].tolist(), name
        # the short identical docs never pair; the long near-dups do
        assert 0 not in set(mine["doc_a"]) and 1 not in set(mine["doc_b"]), name
        assert [2] == sorted(set(mine["doc_a"])), name


def test_contrastive_pairs_needs_three_docs(tmp_path):
    """With only the two pair members in the corpus no valid negative
    exists; engine and oracle both emit zero triplets (review r4 — the
    bump chain previously returned a pair member as the negative)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from phenobert_ray.functions.dedup import contrastive_pairs

    texts = ["alpha beta gamma delta epsilon zeta",
             "alpha beta gamma delta epsilon eta"]
    t = pa.table({"doc_id": pa.array(range(2), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "source": pa.array(["s"] * 2, pa.string())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    assert contrastive_pairs(str(d)).count() == 0

    import __ray_entry__ as E
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    assert len(con.execute(E.oracle_sql()["contrastive_pairs"]).df()) == 0


def test_lsh_probe_bits_beyond_two():
    """n_probe_bits=3 must actually probe hamming-3 buckets (the old
    builder silently capped at 2, review r4): candidates found at
    n_probe_bits=N_PLANES (all buckets) must equal the exact search."""
    from phenobert_ray.functions.ann import (N_PLANES, ann_lsh_topk,
                                             ann_topk)

    sf = "/root/testdata/sf0.001"
    exact = ann_topk(sf).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    full_probe = ann_lsh_topk(sf, n_probe_bits=N_PLANES).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    # probing every bucket = brute force: results must match exactly
    assert full_probe.values.tolist() == exact.values.tolist()


def test_gopher_alpha_counts_ascii_only(tmp_path):
    """n_alpha_words must match the oracle's [A-Za-z] regex: tokens of
    non-Latin script count as alphabetic under unicode isalpha() but not
    under the SQL, flipping keep on multilingual corpora (review r4)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from phenobert_ray.functions.curation import gopher_rules

    base = "the quick brown fox jumps over the lazy dog again and again " * 8
    ru = ("привет мир " * 40 + "the a of ") + base[:100]
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([base.strip(), ru.strip()], pa.string()),
                  "source": pa.array(["s", "s"], pa.string())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    import __ray_entry__ as E
    mine = gopher_rules(str(d)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    oracle = con.execute(E.oracle_sql()["gopher_rules"]).df().sort_values(
        "doc_id").reset_index(drop=True)
    for col in mine.columns:
        assert mine[col].tolist() == oracle[col].tolist(), col


def test_range_join_overflow_guard(tmp_path):
    """A composite searchsorted key that would wrap int64 must raise, not
    silently cross-match other users' windows (review r4)."""
    import pytest as _pytest

    from phenobert_ray.functions.events import range_join

    # window of ~2^62 µs makes span astronomically large: with >= 2
    # (user, chunk) groups in one bucket, gid*span wraps
    with _pytest.raises(Exception, match="overflow|2\\^63"):
        range_join("/root/testdata/sf0.001",
                   window_hours=2 ** 62 // 3_600_000_000).count()


def test_dialog_windows_single_turn_only_corpus(tmp_path):
    """A corpus whose every conversation has ONE turn yields zero pairs
    with a typed schema, not Arrow-null columns (review r4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from phenobert_ray.functions.sft import dialog_windows

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["only one sentence here."], pa.string()),
                  "source": pa.array(["s"], pa.string())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    res = dialog_windows(str(d))
    df = res.to_pandas()
    assert len(df) == 0


def test_decontaminate_benchmark_only_corpus(tmp_path):
    """Every doc in the benchmark slice (doc_id % 97 == 0): flag() must
    emit a typed empty result, not null-schema blocks (review r4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from phenobert_ray.functions.curation import decontaminate

    ids = [0, 97, 194]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(["alpha beta gamma delta"] * 3, pa.string()),
                  "source": pa.array(["s"] * 3, pa.string())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    res = decontaminate(str(d))
    assert res.count() == 0


def test_two_phase_groupby_all_filtered_blocks_stay_typed():
    """Blocks fully emptied by pre_filter must emit typed empty tables —
    the exchange's own partial() previously produced Arrow-null key
    columns (reproduced, review r4)."""
    import ray

    from phenobert_ray.stages.shuffle import two_phase_groupby

    df1 = pd.DataFrame({"conv_id": ["a", "b"], "hpo_id": ["H1", "H2"],
                        "negated": [True, True]})
    df2 = pd.DataFrame({"conv_id": ["c"], "hpo_id": ["H1"],
                        "negated": [False]})
    ds = ray.data.from_pandas([df1, df2])
    out = two_phase_groupby(
        ds, keys=["conv_id", "hpo_id"],
        aggs={"n": (None, "size", "sum")},
        pre_filter=lambda df: df[~df["negated"]],
    )
    got = out.to_pandas()
    assert got.values.tolist() == [["c", "H1", 1]]
    # fully-filtered dataset: typed empty, schema preserved
    ds_all = ray.data.from_pandas([df1])
    out_all = two_phase_groupby(
        ds_all, keys=["conv_id", "hpo_id"],
        aggs={"n": (None, "size", "sum")},
        pre_filter=lambda df: df[~df["negated"]],
    )
    assert out_all.count() == 0
    # NB: schema() is None here — groupby().map_groups emits no blocks at
    # all for a fully-empty input on Ray 2.49 (same documented boundary
    # as bm25_topk._typed); the typed-empty partial fixes the MIXED case
    # (typed + filtered blocks in one dataset), which is the crash class.


def test_two_phase_groupby_keeps_null_keys():
    """SQL GROUP BY emits a NULL-keyed group; pandas' groupby default
    silently dropped those rows from every aggregate (review r4)."""
    import ray

    from phenobert_ray.stages.shuffle import two_phase_groupby

    df = pd.DataFrame({"source": ["s1", None, None], "v": [1, 2, 3]})
    out = two_phase_groupby(
        ray.data.from_pandas(df), keys=["source"],
        aggs={"total": ("v", "sum", "sum"), "n": (None, "size", "sum")},
    ).to_pandas()
    assert len(out) == 2  # s1 plus the NULL group
    null_row = out[out["source"].isna()]
    assert int(null_row["total"].iloc[0]) == 5
    assert int(null_row["n"].iloc[0]) == 2


# --- review wave 8 (textstats / cluster / relational degenerate paths) ---


def test_doc_stats_rounding_tie_matches_duckdb(tmp_path):
    """stop_ratio = 1/128 lands exactly on a 7th-decimal tie (7812.5e-6);
    pandas .round(6) is half-even (0.007812), DuckDB round() half-away
    (0.007813) — the engine must use the half-away bridge (reproduced)."""
    import duckdb

    from phenobert_ray.functions import textstats as t

    text = " ".join(["the"] + [f"w{i}" for i in range(127)])
    pq.write_table(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([text]), "source": pa.array(["s"]),
                  "n_chars": pa.array([len(text)], pa.int64())}),
        str(tmp_path / "documents.parquet"),
    )
    eng = t.doc_stats(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    ora = con.execute(t.oracles()["doc_stats"]).df()
    assert eng["stop_ratio"].iloc[0] == ora["stop_ratio"].iloc[0] == 0.007813


def test_kmeans_labels_are_seed_vec_ids_on_sparse_ids(tmp_path):
    """Cluster labels must be the seed rows' vec_ids (the oracle seeds
    `vec_id AS cluster`): with gaps in the ids below k, index labels
    diverged on 22/40 rows (reproduced, review wave 8)."""
    import duckdb
    import numpy as np

    from phenobert_ray.functions import cluster as clu

    rng = np.random.default_rng(0)
    vids = np.array([0, 2, 4, 6, 9, 11, 13, 15] + list(range(20, 52)),
                    dtype=np.int64)
    emb = rng.normal(size=(len(vids), 64)).astype(np.float32)
    pq.write_table(
        pa.table({"vec_id": vids,
                  "embedding": pa.FixedSizeListArray.from_arrays(
                      pa.array(emb.reshape(-1)), 64)}),
        str(tmp_path / "embeddings.parquet"),
    )
    eng = (clu.kmeans_assign(str(tmp_path)).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    ora = (con.execute(clu.oracles()["kmeans_assign"]).df()
           .sort_values("vec_id").reset_index(drop=True))
    assert set(eng["cluster"]) <= {0, 2, 4, 6}  # labels ARE seed vec_ids
    assert (eng["cluster"].to_numpy() == ora["cluster"].to_numpy()).all()


def test_shipping_priority_zero_match_join_is_typed_empty(tmp_path):
    """Non-empty sides whose join produces ZERO rows: Ray's to_pandas
    drops the schema from all-empty blocks and the top-k sort KeyErrored
    (reproduced, review wave 8)."""
    import numpy as np

    from phenobert_ray.functions import relational as rel

    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2], pa.int64()),
                  "c_mktsegment": pa.array(["BUILDING", "BUILDING"])}),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table({"o_orderkey": pa.array([10, 11], pa.int64()),
                  "o_custkey": pa.array([1, 2], pa.int64()),
                  "o_orderdate": pa.array(
                      [np.datetime64("1997-01-01", "us")] * 2)}),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(  # lineitem references orderkeys the join never sees
        pa.table({"l_orderkey": pa.array([99], pa.int64()),
                  "l_extendedprice": pa.array([10.0]),
                  "l_discount": pa.array([0.0]),
                  "l_shipdate": pa.array(
                      [np.datetime64("1998-06-01", "us")])}),
        str(tmp_path / "lineitem.parquet"),
    )
    out = rel.shipping_priority(str(tmp_path))
    assert out.count() == 0
    assert {f.name for f in out.schema().base_schema} == {
        "l_orderkey", "o_orderdate", "revenue_cpct"}


def test_pca_on_empty_embeddings_is_typed_empty(tmp_path):
    """Empty embeddings: the oracle's matvec CTE yields zero rows, so 64
    all-zero engine rows were a rows-count divergence (reproduced)."""
    from phenobert_ray.functions import cluster as clu

    pq.write_table(
        pa.table({"vec_id": pa.array([], pa.int64()),
                  "embedding": pa.array([], pa.list_(pa.float32(), 64))}),
        str(tmp_path / "embeddings.parquet"),
    )
    top = clu.pca_top_direction(str(tmp_path))
    assert top.count() == 0
    assert {f.name for f in top.schema().base_schema} == {"dim", "v"}
    proj = clu.pca_project(str(tmp_path))
    assert proj.count() == 0
    assert {f.name for f in proj.schema().base_schema} == {"vec_id", "proj"}


# --- review wave 9: the empty-corpus sweep (all queries × empty tables) ---


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """Empty copies of every testdata table, schemas preserved."""
    import os

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("emptysf")
    for f in os.listdir(src):
        t = pq.read_table(os.path.join(src, f))
        pq.write_table(t.schema.empty_table(), str(d / f))
    return str(d)


def test_empty_corpus_sweep_queries_dont_crash(empty_sf_dir):
    """A fully-empty corpus crashed 12 queries (reproduced, review wave
    9): three native joins whose zero-row side ships schema-less
    partitions the hash aggregator cannot finalize, int(None) on empty
    Dataset aggregates, and KeyErrors on schema-less to_pandas frames.
    Every oracle returns 0 rows; the engine must too."""
    from phenobert_ray.functions import ann, curation, dedup, lm
    from phenobert_ray.functions import relational as rel
    from phenobert_ray.functions import search, textstats

    fns = [
        ann.knn_label_vote, rel.revenue_by_priority,
        rel.customers_without_urgent, search.bm25_topk,
        curation.dsir_importance, curation.pack_sequences,
        lm.lm_perplexity, textstats.cms_probe_counts, textstats.top_tokens,
        textstats.bpe_pair_counts, textstats.bpe_encode,
        dedup.documents_deduped,
    ]
    for fn in fns:
        out = fn(empty_sf_dir)
        assert out.count() == 0, fn.__name__


def test_anti_join_with_zero_urgent_orders(tmp_path):
    """A corpus with NO urgent orders (a normal input, not a degenerate
    one) emptied the probe side of the anti-join and crashed the hash
    aggregator's finalize (reproduced, review wave 9): the result must be
    every customer."""
    from phenobert_ray.functions import relational as rel

    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2], pa.int64()),
                  "c_mktsegment": pa.array(["A", "B"])}),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table({"o_orderkey": pa.array([5], pa.int64()),
                  "o_custkey": pa.array([1], pa.int64()),
                  "o_orderpriority": pa.array(["3-MEDIUM"])}),
        str(tmp_path / "orders.parquet"),
    )
    out = rel.customers_without_urgent(str(tmp_path)).to_pandas()
    assert sorted(out["c_custkey"]) == [1, 2]


def test_coalesce_for_exchange_scale_guard():
    """The exchange coalescer is strictly a SMALL-data optimization: a big
    row estimate must leave the dataset's natural block layout untouched
    (coalescing 100 TB into few blocks would serialize the exchange),
    while a small estimate caps the block count row-proportionally."""
    import pyarrow as pa
    import ray

    import phenobert_ray.stages.shuffle as S

    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(range(1000), pa.int64())})
    ).repartition(20).materialize()
    assert ds.num_blocks() == 20

    # big estimate -> the SAME dataset object back, zero added passes
    big = S.coalesce_for_exchange(ds, 10**12)
    assert big is ds

    # the 4-CPU test session's default (8) equals the coalesce floor, so
    # small inputs are already no-ops here; pin the small-data behavior
    # under a 32-CPU-shaped cap (the helper reads the cap at call time)
    orig = S.default_num_buckets
    S.default_num_buckets = lambda: 32
    try:
        small = S.coalesce_for_exchange(ds, 1000).materialize()
        assert small.num_blocks() == 8 and small.count() == 1000
        mid = S.coalesce_for_exchange(ds, 12 * 200_000).materialize()
        assert mid.num_blocks() == 12
        assert S.coalesce_for_exchange(ds, 32 * 200_000) is ds
    finally:
        S.default_num_buckets = orig


def test_empty_sf_registry_schemas_full_sweep(empty_sf_dir):
    """Every _EMPTY_RESULT_SCHEMAS entry stays consistent with its live
    query: on an all-empty sf the guard must return a typed 0-row result
    whose column names match the registry exactly (catches schema drift
    when a query's output columns change without the registry), and no
    registry entry may name a nonexistent query."""
    import __ray_entry__ as E

    qs = E.queries()
    assert set(E._EMPTY_RESULT_SCHEMAS) <= set(qs)
    for name, (tables, fields) in sorted(E._EMPTY_RESULT_SCHEMAS.items()):
        res = qs[name](empty_sf_dir)
        want = [c for c, _ in fields]
        got = [f.name for f in res.schema().base_schema]
        assert got == want, (name, got, want)
        assert res.count() == 0, name
