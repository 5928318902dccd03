"""Synthesize a pathological scale-factor directory for the oracle gate.

Same 10 tables / schemas as /root/testdata/sf* (TESTDATA.md), but every
value distribution is chosen to be hostile: unicode (CJK, emoji, RTL,
combining marks, special-casing), empty strings, whitespace runs, exact
and near duplicate texts, key skew (one hot source / user / custkey),
singleton groups, orphan foreign keys, rounding-tie money values,
boundary timestamps (exact window edges, Q3 cutoff ties), zero vectors
and duplicate embeddings, ties everywhere two rows can tie.

Usage:  python tools/make_adversarial_sf.py [out_dir]   (default /tmp/sfadv)

Then:   python tools/verify_local.py /tmp/sfadv

Everything is deterministic (fixed seed); doc_ids stay non-negative and
below 1e9 so the synthetic-turns timestamp arithmetic stays in pandas'
datetime64[ns] range (the documented contract of the turns synth).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260819


def _rng():
    return np.random.default_rng(SEED)


# --- documents ---------------------------------------------------------

UNICODE_TEXTS = [
    "",  # empty
    " ",  # single space -> ['', '']
    "a",  # single ascii token
    "the the the the the",  # all stopwords, all dup tokens
    "naïve café résumé coöperate façade",  # latin accents
    "ß İ I ı SS ss",  # special-casing landmines (turkish I, sharp s)
    "患者 は 頭痛 と 発熱 を 訴える",  # CJK spaced
    "病人有头痛和发热症状没有分词",  # CJK unspaced (one huge token)
    "🔥 emoji 🚀 in 🧬 text 🤖",  # emoji tokens
    "مرحبا بالعالم هذا نص عربي",  # RTL arabic
    "Привет мир это русский текст",  # cyrillic
    "é combining acute vs é precomposed",  # combining marks
    "tab\tinside and\nnewline inside one token",  # control chars in tokens
    "it's quoted 'text' with \"double\" quotes; semicolons, commas",
    "a  b   c    d",  # multi-space runs -> empty tokens
    "word " * 200,  # trailing space -> empty final token
    "join window hash vector join window hash vector",  # all bm25 terms
    "join join join join join join join join join join",  # tf skew
]


def make_documents(out: str) -> None:
    rng = _rng()
    doc_ids, texts, langs, sources = [], [], [], []

    def add(did, text, lang, source):
        doc_ids.append(did)
        texts.append(text)
        langs.append(lang)
        sources.append(source)

    nxt = 0
    # unicode block, hot source
    for t in UNICODE_TEXTS:
        add(nxt, t, "xx", "hot"); nxt += 1
    # exact duplicates (same text, many ids) — dedup families
    for i in range(20):
        add(nxt, "exact duplicate corpus text for dedup checks", "en", "hot")
        nxt += 1
    # near duplicates: one token perturbed
    base = ("the quick brown fox jumps over the lazy dog while counting "
            "tokens and hashing shingles for the minhash band exchange")
    words = base.split(" ")
    for i in range(15):
        w = list(words)
        w[i % len(w)] = f"tok{i}"
        add(nxt, " ".join(w), "en", "hot"); nxt += 1
    # permutation near-dups (same bag of words, different order)
    for i in range(5):
        w = list(words)
        rng.shuffle(w)
        add(nxt, " ".join(w), "en", "hot"); nxt += 1
    # one long doc
    add(nxt, " ".join(f"w{j % 97}" for j in range(5000)), "en", "solo-long")
    nxt += 1
    # singleton sources + empty-string source name
    add(nxt, "lonely document in its own source", "en", "solo"); nxt += 1
    add(nxt, "document whose source is the empty string", "en", ""); nxt += 1
    # identical token-count groups (zscore zero-variance sources)
    for i in range(8):
        add(nxt, f"alpha beta gamma delta epsilon zeta{i}", "en", "constlen")
        nxt += 1
    # bulk: zipf-ish vocabulary, random lengths incl. len-1
    vocab = np.array([f"v{i}" for i in range(50)] + list("abcdefg"))
    for i in range(250):
        n = int(rng.integers(1, 60))
        idx = (rng.zipf(1.7, size=n) - 1) % len(vocab)
        add(nxt, " ".join(vocab[idx]), rng.choice(["en", "es", "zh", ""]),
            rng.choice(["hot", "s1", "s2"], p=[0.7, 0.2, 0.1]))
        nxt += 1
    # doc_id gaps + large ids (keep < 1e9 per the turns-ts contract),
    # appended at the end so ids stay unique
    for k, off in enumerate([10_000, 1_000_000, 500_000_000]):
        add(off + k, f"gap document number {k} with sparse id", "en", "s1")

    n_chars = [len(t) for t in texts]
    tbl = pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    })
    # shuffle row order in the file (nothing may assume sorted doc_id)
    perm = _rng().permutation(len(doc_ids))
    pq.write_table(tbl.take(pa.array(perm)), f"{out}/documents.parquet")


# --- embeddings --------------------------------------------------------

EMB_DIM = 64


def make_embeddings(out: str) -> None:
    rng = _rng()
    vecs, labels = [], []
    # zero vector (cosine denominators), duplicate vectors, negations
    vecs.append(np.zeros(EMB_DIM)); labels.append(0)
    base = rng.normal(size=EMB_DIM)
    for _ in range(5):
        vecs.append(base.copy()); labels.append(1)          # exact dups
    vecs.append(-base); labels.append(2)                     # antipode
    vecs.append(base * 1e-8); labels.append(1)               # tiny norm
    # large-but-in-contract norm: the integer-exact cluster family
    # documents |value| < ~4194 with QUANT=1000 (cluster.py docstring)
    # and fails LOUDLY past it (pinned in tests) — stay inside here so
    # the oracle comparison, not the guard, is what this input exercises
    vecs.append(base * 1e3); labels.append(1)                # huge norm
    near = base.copy(); near[0] += 1e-7
    vecs.append(near); labels.append(1)                      # near-dup
    # a second zero vector (zero-zero cosine pair)
    vecs.append(np.zeros(EMB_DIM)); labels.append(-1)        # negative label
    # clustered bulk: 3 tight clusters + uniform noise
    for c in range(3):
        center = rng.normal(size=EMB_DIM) * 2
        for _ in range(60):
            vecs.append(center + rng.normal(size=EMB_DIM) * 0.05)
            labels.append(c)
    for _ in range(50):
        vecs.append(rng.normal(size=EMB_DIM)); labels.append(9)
    arr = np.asarray(vecs, dtype=np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array(list(arr), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet")


# --- events ------------------------------------------------------------

def make_events(out: str) -> None:
    rng = _rng()
    rows = []
    eid = 0
    base = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(3600, "s")

    def add(ts, uid, etype, value, props):
        nonlocal eid
        rows.append((eid, ts, uid, etype, value, props)); eid += 1

    # hot user: 400 events, many identical timestamps (asof/window ties)
    for i in range(400):
        ts = base + (i // 4) * np.timedelta64(601, "s")  # 4-way ts ties
        add(ts, 1, ["click", "view", "error", "signup"][i % 4],
            float(i % 7) * 10.0, '{"k": %d}' % (i % 5))
    # exact hour-boundary timestamps (window bucket edges)
    for i in range(24):
        add(base + i * H, 2, "click", 0.0, '{"k": 0}')
    # single-event users
    for u in range(100, 140):
        add(base + np.timedelta64(u, "s"), u, "view", -5.5, '{"k": 1}')
    # value extremes, ties in value, zero values
    for i in range(30):
        add(base + np.timedelta64(7200 + i, "s"), 3, "purchase",
            [0.0, 1e12, -1e12, 0.005, 99.995][i % 5], '{"k": %d}' % (10 ** (i % 4)))
    # digit-free / weird props (JSON-ish garbage) — semi-structured edge
    add(base, 4, "meta", 1.0, "{}")
    add(base + np.timedelta64(1, "s"), 4, "meta", 2.0, '{"k": null}')
    add(base + np.timedelta64(2, "s"), 4, "", 3.0, "not json at all")
    # out-of-order event ids vs ts (events later in file, earlier in time)
    for i in range(50):
        add(base - np.timedelta64(i, "s"), 5, "click", float(i), '{"k": 2}')

    rows_arr = list(zip(*rows))
    tbl = pa.table({
        "event_id": pa.array(rows_arr[0], pa.int64()),
        "ts": pa.array(np.array(rows_arr[1], dtype="datetime64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(rows_arr[2], pa.int64()),
        "event_type": pa.array(rows_arr[3], pa.string()),
        "value": pa.array(rows_arr[4], pa.float64()),
        "props": pa.array(rows_arr[5], pa.string()),
    })
    perm = rng.permutation(len(rows))
    pq.write_table(tbl.take(pa.array(perm)), f"{out}/events.parquet")


# --- TPC-H-ish ---------------------------------------------------------

SEGMENTS = ["BUILDING", "FURNITURE", "", "AUTOMOBILE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def make_tpch(out: str) -> None:
    rng = _rng()
    # region / nation: tiny, one region with no nations
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1, 2], pa.int32()),
        "r_name": pa.array(["AFRICA", "AMERICA", "EMPTYREGION"], pa.string()),
    }), f"{out}/region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2, 3], pa.int32()),
        "n_name": pa.array(["N0", "N1", "N2", "N3"], pa.string()),
        "n_regionkey": pa.array([0, 0, 1, 1], pa.int32()),
    }), f"{out}/nation.parquet")

    # customer: 120 rows; empty-string segment; customers w/o orders;
    # acctbal ties and negatives; skew: half in BUILDING
    n_cust = 120
    ck = np.arange(n_cust, dtype=np.int64)
    seg = np.array([SEGMENTS[0] if i < 60 else SEGMENTS[1 + i % 3]
                    for i in range(n_cust)], dtype=object)
    bal = np.where(ck % 10 == 0, -100.0, np.round(rng.uniform(0, 9999, n_cust), 2))
    bal[5] = bal[6] = 1234.56  # exact ties
    pq.write_table(pa.table({
        "c_custkey": pa.array(ck),
        "c_name": pa.array([f"Customer#{i:09d}" for i in ck], pa.string()),
        "c_nationkey": pa.array((ck % 4).astype(np.int32), pa.int32()),
        "c_acctbal": pa.array(bal, pa.float64()),
        "c_mktsegment": pa.array(list(seg), pa.string()),
    }), f"{out}/customer.parquet")

    # orders: 600 rows; orphan custkeys (>= n_cust); totalprice rounding
    # ties (x.005 / x.995); orderdate exactly ON the Q3 cutoff; hot
    # customer 7 owns 100 orders
    n_ord = 600
    ok = np.arange(n_ord, dtype=np.int64)
    cust = rng.integers(0, n_cust + 20, n_ord).astype(np.int64)  # orphans
    cust[:100] = 7  # hot key
    price = np.round(rng.uniform(100, 200000, n_ord), 2)
    price[:10] = [100.005, 99.995, 0.005, 0.0, 12345.675, 1.015, 2.025,
                  3.035, 4.045, 5.055]  # tie-rule probes
    dates = (np.datetime64("1996-01-01", "us")
             + rng.integers(0, 1500, n_ord) * np.timedelta64(1, "D"))
    dates[:5] = np.datetime64("1998-01-01", "us")  # exactly Q3_DATE
    status = np.where(ok % 3 == 0, "F", "O").astype(object)
    prio = np.array([PRIORITIES[i % 5] for i in ok], dtype=object)
    prio[200:300] = "1-URGENT"  # urgent skew
    pq.write_table(pa.table({
        "o_orderkey": pa.array(ok),
        "o_custkey": pa.array(cust),
        "o_orderstatus": pa.array(list(status), pa.string()),
        "o_totalprice": pa.array(price, pa.float64()),
        "o_orderdate": pa.array(dates, pa.timestamp("us")),
        "o_orderpriority": pa.array(list(prio), pa.string()),
    }), f"{out}/orders.parquet")

    # lineitem: 2000 rows; orphan orderkeys; shipdate ties at the cutoff;
    # discount 0.0 and 1.0; price ties; hot orderkey 0 with 50 lines
    n_li = 2000
    lok = rng.integers(0, n_ord + 50, n_li).astype(np.int64)  # orphans
    lok[:50] = 0
    lprice = np.round(rng.uniform(900, 105000, n_li), 2)
    lprice[:6] = [0.005, 100.005, 99.995, 0.0, 55.555, 1.005]
    disc = np.round(rng.uniform(0, 0.1, n_li), 2)
    disc[:4] = [0.0, 1.0, 0.005, 0.995]
    ship = (np.datetime64("1996-06-01", "us")
            + rng.integers(0, 1500, n_li) * np.timedelta64(1, "D"))
    ship[:5] = np.datetime64("1998-01-01", "us")  # exactly Q3_DATE (excluded)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(lok),
        "l_partkey": pa.array(rng.integers(0, 60, n_li).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(0, 10, n_li).astype(np.int64)),
        "l_linenumber": pa.array((np.arange(n_li) % 7).astype(np.int32),
                                 pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 50, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(lprice, pa.float64()),
        "l_discount": pa.array(disc, pa.float64()),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2),
                          pa.float64()),
        "l_returnflag": pa.array([["A", "N", "R"][i % 3] for i in range(n_li)],
                                 pa.string()),
        "l_linestatus": pa.array([["F", "O"][i % 2] for i in range(n_li)],
                                 pa.string()),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    }), f"{out}/lineitem.parquet")

    # part / supplier: small; duplicate names, empty type
    n_part = 60
    pk = np.arange(n_part, dtype=np.int64)
    pq.write_table(pa.table({
        "p_partkey": pa.array(pk),
        "p_name": pa.array(["dup widget"] * 5
                           + [f"part {i}" for i in range(n_part - 5)],
                           pa.string()),
        "p_brand": pa.array([f"Brand#{i % 3}" for i in pk], pa.string()),
        "p_type": pa.array(["ECONOMY", "", "STANDARD"][0:1] * n_part,
                           pa.string()),
        "p_size": pa.array((pk % 50).astype(np.int32), pa.int32()),
        "p_retailprice": pa.array(np.round(900 + pk * 0.1, 2), pa.float64()),
    }), f"{out}/part.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(10, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i}" for i in range(10)], pa.string()),
        "s_nationkey": pa.array((np.arange(10) % 4).astype(np.int32),
                                pa.int32()),
        "s_acctbal": pa.array(np.round(np.linspace(-10, 5000, 10), 2),
                              pa.float64()),
    }), f"{out}/supplier.parquet")


def fragment(out: str, n_frags: int = 3) -> None:
    """Rewrite every table as a DIRECTORY of ``n_frags`` parquet fragments
    with rows dealt round-robin — the multi-file layout a real 100 TB
    corpus arrives in.  Round-robin dealing guarantees no fragment holds a
    contiguous or sorted slice, so any operator that silently assumes
    file-order == row-order or single-fragment input diverges from its
    oracle (DuckDB globs the directory)."""
    import glob as _glob

    for f in sorted(_glob.glob(f"{out}/*.parquet")):
        if os.path.isdir(f):
            continue
        t = pq.read_table(f)
        os.remove(f)
        os.makedirs(f, exist_ok=True)
        idx = np.arange(t.num_rows)
        for i in range(n_frags):
            part = t.take(pa.array(idx[idx % n_frags == i]))
            pq.write_table(part, f"{f}/frag-{i}.parquet")


def main(out: str = "/tmp/sfadv", fragments: bool = False) -> None:
    os.makedirs(out, exist_ok=True)
    make_documents(out)
    make_embeddings(out)
    make_events(out)
    make_tpch(out)
    if fragments:
        fragment(out)
    print(f"wrote adversarial tables to {out}"
          + (" (fragmented)" if fragments else ""))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(args[0] if args else "/tmp/sfadv",
         fragments="--fragments" in sys.argv)
