"""Curation operators (functions/curation.py): brute-force pytest oracles on
the sf0.001 table, plus the invariants each op promises downstream consumers
(no benchmark rows in the decontaminate output, no PII survives redaction,
per-source sample caps hold on skewed inputs)."""

import re
from collections import Counter

import pandas as pd
import pyarrow.parquet as pq
import pytest

from phenobert_ray.functions.curation import (
    BENCH_MOD,
    EMAIL_RE,
    IP_RE,
    N_GRAM,
    PACK_CAPACITY,
    PHONE_RE,
    SAMPLE_PER_SOURCE,
    decontaminate,
    doc_gram_hashes,
    pack_sequences,
    pii_redact,
    repetition_stats,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(sf_small):
    t = pq.read_table(
        f"{sf_small}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return t.to_pandas().set_index("doc_id")


def test_decontaminate_matches_bruteforce(sf_small, docs):
    got = decontaminate(sf_small).to_pandas().set_index("doc_id")
    bench = set()
    for d, row in docs.iterrows():
        if d % BENCH_MOD == 0:
            bench.update(doc_gram_hashes(row["text"]).tolist())
    for d, row in docs.iterrows():
        if d % BENCH_MOD == 0:
            assert d not in got.index  # benchmark rows never emitted
            continue
        n = sum(int(h in bench) for h in doc_gram_hashes(row["text"]).tolist())
        assert got.loc[d, "n_shared"] == n
        assert bool(got.loc[d, "contaminated"]) == (n > 0)


def test_decontaminate_counts_positions_not_distinct(sf_small):
    # a doc repeating a benchmark gram 3x must report 3, not 1 —
    # positions are what training-token accounting needs
    text = next(
        t
        for d, t in pq.read_table(f"{sf_small}/documents.parquet")
        .to_pandas()
        .set_index("doc_id")["text"]
        .items()
        if d % BENCH_MOD == 0
    )
    toks = text.split(" ")[:N_GRAM]
    tripled = " ".join(toks * 3)
    hs = doc_gram_hashes(tripled).tolist()
    assert hs.count(hs[0]) >= 3


def test_pii_redact_scrubs_everything(sf_small):
    got = pii_redact(sf_small).to_pandas()
    assert len(got) > 0
    pats = [re.compile(p) for p in (EMAIL_RE, PHONE_RE, IP_RE)]
    for clean in got["clean_text"]:
        for p in pats:
            assert not p.search(clean), clean
    # every synthesized doc carries >=1 email, >=1 phone, >=1 ip
    assert (got["n_emails"] >= 1).all()
    assert (got["n_phones"] >= 1).all()
    assert (got["n_ips"] >= 1).all()
    # the %3 / %5 extras are counted
    extra = got.set_index(got["doc_id"])
    assert (extra.loc[extra.index % 3 == 0, "n_emails"] >= 2).all()


def test_repetition_stats_bruteforce(sf_small, docs):
    got = repetition_stats(sf_small).to_pandas().set_index("doc_id")
    for d, row in docs.head(25).iterrows():
        toks = row["text"].split(" ")
        c3 = Counter(tuple(toks[j : j + 3]) for j in range(len(toks) - 2))
        c2 = Counter(tuple(toks[j : j + 2]) for j in range(len(toks) - 1))
        dup3 = (
            sum(v for v in c3.values() if v > 1) / sum(c3.values())
            if c3
            else 0.0
        )
        top2 = max(c2.values()) / sum(c2.values()) if c2 else 0.0
        assert got.loc[d, "dup_3gram_frac"] == pytest.approx(dup3, abs=1e-6)
        assert got.loc[d, "top_2gram_frac"] == pytest.approx(top2, abs=1e-6)


def test_repetition_flags_template_doc():
    # a pathological repeated-template doc must score near 1.0 on both
    import ray

    from phenobert_ray.functions import curation as cur

    df = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["buy now " * 50, "all distinct words here truly"],
        }
    )
    import tempfile

    import pyarrow as pa

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(pa.Table.from_pandas(df), f"{td}/documents.parquet")
        got = cur.repetition_stats(td).to_pandas().set_index("doc_id")
    assert got.loc[1, "dup_3gram_frac"] > 0.95
    assert got.loc[1, "top_2gram_frac"] > 0.3
    assert got.loc[2, "dup_3gram_frac"] == 0.0
    del ray  # fixture owns the session


def test_stratified_sample_caps_and_determinism(sf_small, docs):
    got = stratified_sample(sf_small).to_pandas()
    sizes = docs.groupby("source").size()
    per = got.groupby("source").size()
    for src, n_src in sizes.items():
        assert per.get(src, 0) == min(SAMPLE_PER_SOURCE, n_src)
    # sampled ids belong to their claimed source
    merged = got.merge(
        docs.reset_index()[["doc_id", "source"]],
        on="doc_id",
        suffixes=("", "_true"),
    )
    assert (merged["source"] == merged["source_true"]).all()
    # deterministic across runs
    again = stratified_sample(sf_small).to_pandas()
    a = got.sort_values(["source", "doc_id"]).reset_index(drop=True)
    b = again.sort_values(["source", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pack_sequences_is_an_exact_ordered_scan(sf_small, docs):
    got = pack_sequences(sf_small).to_pandas().sort_values("doc_id")
    # brute-force serial scan
    acc = 0
    by_id = {}
    for d in sorted(docs.index):
        n = len(docs.loc[d, "text"].split(" "))
        by_id[d] = (n, acc)
        acc += n
    assert len(got) == len(docs)
    for _, r in got.iterrows():
        n, start = by_id[r["doc_id"]]
        assert r["n_tokens"] == n
        assert r["start_offset"] == start
        assert r["first_pack"] == start // PACK_CAPACITY
        assert r["last_pack"] == (start + n - 1) // PACK_CAPACITY
        assert r["n_packs"] == r["last_pack"] - r["first_pack"] + 1
    # stream contiguity: total packed tokens == sum of doc tokens
    assert got["start_offset"].iloc[-1] + got["n_tokens"].iloc[-1] == acc


def test_pack_sequences_bucket_count_invariant_and_gapped_ids(tmp_path):
    # the scan result must not depend on the bucket partitioning, and
    # doc_ids with large gaps (range >> count) must still land correctly
    import numpy as np
    import pyarrow as pa

    rng = np.random.RandomState(7)
    ids = np.sort(rng.choice(10_000_000, size=300, replace=False)).astype("int64")
    df = pd.DataFrame(
        {
            "doc_id": ids,
            "text": [" ".join(["w"] * (1 + int(i % 37))) for i in ids],
            "source": ["s"] * len(ids),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
    a = (
        pack_sequences(str(tmp_path), n_buckets=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        pack_sequences(str(tmp_path), n_buckets=50)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # serial check on the gapped ids
    acc = 0
    for i, (_, r) in enumerate(a.iterrows()):
        assert r["start_offset"] == acc
        acc += r["n_tokens"]


def test_mixture_sample_rates_and_determinism(sf_small, docs):
    import hashlib as hl

    from phenobert_ray.functions.curation import MIX_RATES, mixture_sample

    def rate_of(src: str) -> float:
        # the hash-of-source-name contract (total on ANY source vocabulary;
        # the old int(src[3:]) parse crashed on non-'srcN' names)
        return MIX_RATES[
            int(hl.md5(src.encode()).hexdigest()[:8], 16) % len(MIX_RATES)
        ]

    got = mixture_sample(sf_small).to_pandas()
    # exact membership: kept iff md5(doc_id) under the source's threshold
    for _, r in got.iterrows():
        h = int(hl.md5(str(r["doc_id"]).encode()).hexdigest(), 16)
        assert h < rate_of(r["source"]) * 2**128
    # rate-1.0 sources keep everything; empirical rates near nominal
    sizes = docs.groupby("source").size()
    kept = got.groupby("source").size()
    for src, n in sizes.items():
        rate = rate_of(src)
        k = kept.get(src, 0)
        if rate >= 1.0:
            assert k == n
        else:
            assert abs(k / n - rate) < 0.35  # small-n Bernoulli tolerance
    # deterministic
    again = mixture_sample(sf_small).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True),
    )


def test_grouped_topk_bruteforce(sf_small, docs):
    from phenobert_ray.functions.textstats import longest_docs_by_source

    got = longest_docs_by_source(sf_small).to_pandas()
    d = docs.reset_index()
    d["n_tokens"] = d["text"].str.split(" ").str.len()
    for src, g in d.groupby("source"):
        want = g.sort_values(["n_tokens", "doc_id"], ascending=[False, True]).head(3)
        mine = got[got["source"] == src].sort_values("rank")
        assert list(mine["doc_id"]) == list(want["doc_id"])
        assert list(mine["n_tokens"]) == list(want["n_tokens"])
        assert list(mine["rank"]) == list(range(1, len(want) + 1))


def test_curate_corpus_matches_serial_cascade(sf_small, docs):
    import hashlib as hl

    from phenobert_ray.functions.curation import (
        MIN_TOKENS,
        MIN_TTR,
        PREFIX_K,
        curate_corpus,
    )

    got = curate_corpus(sf_small).to_pandas().sort_values("doc_id")
    bench = set()
    for d, row in docs.iterrows():
        if d % BENCH_MOD == 0:
            bench.update(doc_gram_hashes(row["text"]).tolist())
    markers = {
        "de": {"der", "die", "und"},
        "en": {"the", "a"},
        "es": {"el", "los", "las"},
        "fr": {"le", "la", "les"},
    }
    kept = {}
    for d in sorted(docs.index):
        if d % BENCH_MOD == 0:
            continue
        t = docs.loc[d, "text"].split(" ")
        n = len(t)
        if n < MIN_TOKENS or len(set(t)) / n < MIN_TTR:
            continue
        c = {k: sum(1 for w in t if w in m) for k, m in markers.items()}
        mx = max(c.values())
        if not (mx > 0 and c["en"] == mx and c["de"] < c["en"]):
            continue
        if any(h in bench for h in doc_gram_hashes(docs.loc[d, "text"]).tolist()):
            continue
        h = hl.md5(" ".join(t[:PREFIX_K]).encode()).hexdigest()
        if h not in kept:  # ids ascend, so first seen = min doc_id
            kept[h] = (d, docs.loc[d, "source"], n)
    want = sorted(kept.values())
    assert list(zip(got["doc_id"], got["source"], got["n_tokens"])) == want
    assert 0 < len(got) < len(docs)  # cascade neither all-pass nor all-fail


def test_stratified_sample_skewed_source(tmp_path):
    # one source dominating the table still yields exactly n rows for it,
    # and the combiner means no group ever exceeds blocks*n rows pre-merge
    import numpy as np
    import pyarrow as pa

    n = 5000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "source": ["hot"] * (n - 3) + ["cold"] * 3,
            "text": ["x"] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
    got = stratified_sample(str(tmp_path)).to_pandas()
    per = got.groupby("source").size()
    assert per["hot"] == SAMPLE_PER_SOURCE
    assert per["cold"] == 3


# ---------------------------------------------------------------------------
# dsir_importance (hashed-bigram importance resampling)


def test_dsir_importance_vs_bruteforce(sf_small):
    """Serial reference: same md5-bucketed bigram features, same add-one
    models, same nanounit terms; and the aggregate sanity property that
    target-source docs score higher on average than the rest."""
    import math

    import numpy as np

    import pyarrow.parquet as pq_

    from phenobert_ray.functions.curation import (
        DSIR_B,
        DSIR_TARGET_SOURCES,
        doc_gram_hashes,
        dsir_importance,
    )

    df = pq_.read_table(f"{sf_small}/documents.parquet").to_pandas()
    B = DSIR_B
    bucket_lists = {
        r.doc_id: (doc_gram_hashes(r.text, 2) % np.uint64(B)).astype(int)
        for r in df.itertuples()
    }
    tgt_docs = set(df[df.source.isin(DSIR_TARGET_SOURCES)].doc_id)
    t_vec = np.zeros(B, dtype=np.int64)
    q_vec = np.zeros(B, dtype=np.int64)
    for d, bs in bucket_lists.items():
        np.add.at(q_vec, bs, 1)
        if d in tgt_docs:
            np.add.at(t_vec, bs, 1)
    T, R = int(t_vec.sum()), int(q_vec.sum())
    ln = lambda k: math.floor(math.log(k) * 1e9 + 0.5)
    term = np.array(
        [ln(int(t) + 1) - ln(int(q) + 1) - ln(T + B) + ln(R + B)
         for t, q in zip(t_vec, q_vec)],
        dtype=np.int64,
    )
    got = dsir_importance(sf_small).to_pandas().set_index("doc_id")
    for d, bs in bucket_lists.items():
        if not len(bs):
            assert d not in got.index
            continue
        assert got.loc[d, "logw_nano"] == int(term[bs].sum())
        assert got.loc[d, "n_grams"] == len(bs)
        assert bool(got.loc[d, "selected"]) == (int(term[bs].sum()) > 0)
    in_t = got.loc[[d for d in got.index if d in tgt_docs], "logw_nano"]
    out_t = got.loc[[d for d in got.index if d not in tgt_docs], "logw_nano"]
    assert in_t.mean() > out_t.mean()


def test_gopher_rules_boundaries(tmp_path):
    """Pin the rule boundaries: 49 vs 50 words, mean word length exactly
    3 and exactly 10, 1 vs 2 stopword hits, alpha fraction exactly 0.8."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from phenobert_ray.functions.curation import gopher_rules

    texts = {
        0: " ".join(["the"] * 49),                      # too short (49 < 50)
        1: " ".join(["the"] * 50),                      # 50 words, mwl=3 ok
        2: " ".join(["ab"] * 50),                       # mwl=2 < 3 fails
        3: " ".join(["abcdefghij"] * 48 + ["the", "of"]),   # mwl=10 ok
        4: " ".join(["abcdefghijk"] * 49 + ["the"]),    # mwl>10, 1 stop hit
        5: " ".join(["the", "of"] + ["w1"] * 8 * 6),    # alpha 2/50=.04 fail?
        6: " ".join(["the", "of"] + ["word"] * 48),     # all rules pass
    }
    d = tmp_path / "gopher"
    d.mkdir()
    pq_.write_table(
        pa.table({"doc_id": list(texts), "text": list(texts.values())}),
        str(d / "documents.parquet"),
    )
    got = gopher_rules(str(d)).to_pandas().set_index("doc_id")
    assert not got.loc[0, "ok_word_count"] and got.loc[1, "ok_word_count"]
    assert got.loc[1, "ok_mean_word_len"]          # exactly 3
    assert not got.loc[2, "ok_mean_word_len"]      # 2 < 3
    assert got.loc[3, "ok_mean_word_len"]          # ≤ 10 boundary holds
    assert not got.loc[4, "ok_mean_word_len"]      # > 10
    assert not got.loc[4, "ok_stopwords"] and got.loc[3, "ok_stopwords"]
    # doc 5: words 'w1' contain alpha 'w' → alpha frac = 1.0, passes
    assert got.loc[5, "ok_alpha_frac"]
    assert got.loc[6, "keep"]
    assert not got.loc[0, "keep"] and got.loc[1, "keep"]


def test_chunk_documents_shapes(tmp_path):
    """Chunk boundaries: exact multiple, short tail, and tiny doc; chunks
    reassemble to the original text at stride == width (no overlap)."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from phenobert_ray.functions.curation import chunk_documents

    texts = {
        0: " ".join(f"w{i}" for i in range(64)),   # exactly 2 full windows
        1: " ".join(f"w{i}" for i in range(33)),   # 32 + tail of 9
        2: "solo",
    }
    d = tmp_path / "chunks"
    d.mkdir()
    pq_.write_table(
        pa.table({"doc_id": list(texts), "text": list(texts.values())}),
        str(d / "documents.parquet"),
    )
    got = chunk_documents(str(d)).to_pandas()
    g0 = got[got.doc_id == 0]
    assert list(g0["start_tok"]) == [0, 24, 48]
    assert list(g0["n_chunk_tokens"]) == [32, 32, 16]
    g1 = got[got.doc_id == 1].set_index("chunk_idx")
    assert g1.loc[0, "n_chunk_tokens"] == 32 and g1.loc[1, "n_chunk_tokens"] == 9
    # overlap region identical between consecutive chunks
    assert g1.loc[0, "chunk_text"].split(" ")[24:] == \
        g1.loc[1, "chunk_text"].split(" ")[:8]
    g2 = got[got.doc_id == 2]
    assert len(g2) == 1 and g2.iloc[0]["chunk_text"] == "solo"
    # stride == width reassembles exactly
    nochunk = chunk_documents(str(d), width=16, stride=16).to_pandas()
    j = " ".join(nochunk[nochunk.doc_id == 0].sort_values("chunk_idx")["chunk_text"])
    assert j == texts[0]


def test_boilerplate_detects_template_sentences(sf_small):
    from phenobert_ray.functions.curation import boilerplate_sentences

    got = boilerplate_sentences(sf_small).to_pandas()
    # the synthesized turns share 'patient shows X today.' templates —
    # the op must actually fire on a healthy majority of turns
    assert (got["n_boiler"] > 0).mean() > 0.5
    # cleaned tokens never exceed total tokens and boiler <= sentences
    assert (got["n_boiler"] <= got["n_sentences"]).all()
    assert (got["n_clean_tokens"] >= 0).all()


def test_boilerplate_no_repeats_is_noop(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from phenobert_ray.functions.curation import boilerplate_sentences

    # all-unique sentences: nothing qualifies, clean == full token count
    texts = [f"completely unique sentence number {i} here" for i in range(40)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(40), pa.int64()),
                "text": texts,
                "source": ["s"] * 40,
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    got = boilerplate_sentences(str(tmp_path)).to_pandas()
    assert (got["n_boiler"] == 0).all()


def test_corpus_diff_statuses(sf_small):
    from phenobert_ray.functions.curation import corpus_diff

    got = corpus_diff(sf_small).to_pandas()
    t = pq.read_table(f"{sf_small}/documents.parquet", columns=["doc_id"])
    ids = t["doc_id"].to_pylist()
    want_removed = {i for i in ids if i % 13 == 0}
    want_added = {i + 1_000_000 for i in ids if i % 17 == 0}
    # edited docs that were not deleted
    want_changed = {i for i in ids if i % 11 == 0 and i % 13 != 0}
    by = got.groupby("status")["doc_id"].apply(set).to_dict()
    assert by.get("removed", set()) == want_removed
    assert by.get("added", set()) == want_added
    assert by.get("changed", set()) == want_changed
    # unchanged docs are absent
    assert len(got) == len(want_removed) + len(want_added) + len(want_changed)
