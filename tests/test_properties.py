"""Property-based invariants (hypothesis) for the text chain and linker.

These guard the SURVEY.md §7 "hard parts": offset validity under the
length-preserving canonicalization, determinism, and overlap-resolution
sanity — for arbitrary text, not just fixtures."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from phenobert_ray.linker import annotate_text
from phenobert_ray.textops import (
    canonicalize_for_segmentation,
    normalize_type_notation,
    process_str,
    sentence_spans,
    token_spans,
)

# printable-ish text incl. accents, punctuation, newlines
TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " .,;:()[]/-_'\"\n\téàüñ‘’",
    max_size=400,
)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_canonicalization_length_preserving(s):
    assert len(canonicalize_for_segmentation(s)) == len(s)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_spans_are_valid_slices(s):
    canon = canonicalize_for_segmentation(s)
    for a, b in sentence_spans(canon):
        assert 0 <= a < b <= len(canon)
        assert canon[a:b].strip()
    for a, b in token_spans(canon):
        assert 0 <= a < b <= len(canon)


@given(TEXT)
@settings(max_examples=100, deadline=None)
def test_process_str_stable_and_lower(s):
    toks = process_str(s)
    assert toks == process_str(s)
    assert all(t == t.lower() for t in toks)
    assert all(" " not in t and "\t" not in t for t in toks)


@given(s=TEXT)
@settings(max_examples=100, deadline=None)
def test_annotate_offsets_and_determinism(mini_session_dag, s):
    anns1 = annotate_text(s, mini_session_dag)
    anns2 = annotate_text(s, mini_session_dag)
    assert [a.__dict__ for a in anns1] == [a.__dict__ for a in anns2]
    starts = [a.start for a in anns1]
    assert starts == sorted(starts)  # L8 ordering
    for a in anns1:
        assert 0 <= a.start < a.end <= len(s)
        assert s[a.start:a.end] == a.mention
        assert a.hpo_id.startswith("HP:")


@given(s=st.text(alphabet="abcdefg .", max_size=120))
@settings(max_examples=100, deadline=None)
def test_no_annotations_without_dict_vocab(mini_session_dag, s):
    # text over a vocabulary disjoint from the mini ontology can never match
    assert annotate_text(s, mini_session_dag) == []


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 4), st.integers(0, 100),
                  st.floats(0, 1, allow_nan=False)),
        min_size=0, max_size=200,
    )
)
@settings(max_examples=25, deadline=None)
def test_two_phase_groupby_matches_pandas(rows):
    """The bucketed exchange must agree with a plain pandas groupby for any
    key distribution (including empty / all-hot-key inputs)."""
    import pandas as pd
    import ray as _ray

    from phenobert_ray.stages.shuffle import two_phase_groupby

    df = pd.DataFrame(rows, columns=["k1", "k2", "v", "w"])
    ds = _ray.data.from_pandas(df) if len(df) else _ray.data.from_pandas(
        pd.DataFrame({"k1": pd.Series([], dtype="int64"),
                      "k2": pd.Series([], dtype="int64"),
                      "v": pd.Series([], dtype="int64"),
                      "w": pd.Series([], dtype="float64")})
    )
    got = two_phase_groupby(
        ds,
        keys=["k1", "k2"],
        aggs={"mn": ("v", "min", "min"), "mx": ("v", "max", "max"),
              "sw": ("w", "sum", "sum"), "n": (None, "size", "sum")},
        num_buckets=4,
    ).to_pandas()
    if df.empty:
        assert len(got) == 0
        return
    got = got.sort_values(["k1", "k2"]).reset_index(drop=True)
    exp = (
        df.groupby(["k1", "k2"], as_index=False)
        .agg(mn=("v", "min"), mx=("v", "max"), sw=("w", "sum"), n=("v", "size"))
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k1", "k2", "mn", "mx", "sw", "n"]], exp, check_dtype=False
    )


@given(
    st.lists(
        st.lists(st.integers(-2000, 2000), min_size=8, max_size=8),
        min_size=1,
        max_size=20,
    ),
    st.lists(
        st.lists(st.integers(-32000, 32000), min_size=8, max_size=8),
        min_size=2,
        max_size=5,
    ),
)
@settings(max_examples=200, deadline=None)
def test_kmeans_assign_expansion_matches_naive(qrows, mrows):
    # the matmul-expanded integer cost must argmin identically to the
    # naive per-cluster subtraction, first-hit ties included
    import numpy as np

    from phenobert_ray.functions import cluster as clu

    q = np.array(qrows, dtype=np.int64)
    M = np.array(mrows, dtype=np.int64)
    # emulate an 8-dim problem by monkey-free direct kernel use: _assign
    # only uses shapes, R and the matmul — dims need not be 64
    naive = ((clu.R * q[:, None, :] - M[None, :, :]) ** 2).sum(axis=2)
    want = np.argmin(naive, axis=1)
    got = clu._assign(q, M)
    assert (got == want).all()


@given(st.integers(-10**12, 10**12), st.integers(1, 10**9))
@settings(max_examples=300, deadline=None)
def test_rounded_div_is_half_away_exact(s, n):
    from fractions import Fraction

    import numpy as np

    from phenobert_ray.functions import cluster as clu

    got = int(clu._rounded_div(np.array([s], dtype=np.int64),
                               np.array([n], dtype=np.int64))[0])
    x = Fraction(clu.R * s, n)
    frac = abs(x) - abs(x).numerator // abs(x).denominator
    mag = abs(x).numerator // abs(x).denominator + (1 if 2 * frac >= 1 else 0)
    want = mag if x >= 0 else -mag
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10),
                  st.sampled_from(["a", "b", "c"])),
        min_size=1, max_size=60,
    )
)
@settings(max_examples=8, deadline=None)
def test_event_transitions_matches_pandas(rows):
    """Chunk-folded transition counts must agree with a serial lag-based
    count for ANY (user, ts, type) distribution — including same-ts ties
    (event_id breaks them) and chunk-boundary straddles (ts spans up to
    ~2 chunks)."""
    import tempfile

    import pandas as pd
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from phenobert_ray.functions.events import (
        RUN_CHUNK_US,
        event_transitions,
    )

    tmp = tempfile.mkdtemp()
    n = len(rows)
    ts = [u_t_y[1] * (RUN_CHUNK_US // 4) for u_t_y in rows]
    t = _pa.table({
        "event_id": _pa.array(range(n), _pa.int64()),
        "ts": _pa.array(pd.to_datetime(ts, unit="us").values,
                        _pa.timestamp("us")),
        "user_id": _pa.array([r[0] for r in rows], _pa.int64()),
        "event_type": _pa.array([r[2] for r in rows]),
        "value": _pa.array([1.0] * n),
        "props": _pa.array(["{}"] * n),
    })
    _pq.write_table(t, f"{tmp}/events.parquet")
    res = event_transitions(tmp)
    got = res.to_pandas()
    if not len(got) and not len(got.columns):
        # Ray drops the columns of ANY zero-row dataset in to_pandas;
        # the driver gate rebuilds from schema() (typed_result) — mirror
        got = res.schema().base_schema.empty_table().to_pandas()
    assert list(got.columns) == ["type_from", "type_to", "n"]
    got_map = {(f, t_): int(x) for f, t_, x in zip(
        got["type_from"], got["type_to"], got["n"])}
    df = pd.DataFrame({"u": [r[0] for r in rows], "ts": ts,
                       "e": range(n), "t": [r[2] for r in rows]})
    df = df.sort_values(["u", "ts", "e"])
    same = df["u"].eq(df["u"].shift())
    want = (pd.DataFrame({"f": df["t"].shift()[same], "t": df["t"][same]})
            .groupby(["f", "t"]).size().to_dict())
    assert got_map == want


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["x", "y"]),
                  st.floats(-1e6, 1e6, allow_nan=False)),
        min_size=1, max_size=80,
    )
)
@settings(max_examples=8, deadline=None)
def test_grouped_median_matches_serial(rows):
    """Counting-exchange median must equal the serial two-middle-order-
    statistics rule for any value multiset, including heavy duplicates
    and negatives."""
    import tempfile

    import numpy as np
    import pandas as pd
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from phenobert_ray.functions.events import grouped_median

    tmp = tempfile.mkdtemp()
    n = len(rows)
    t = _pa.table({
        "event_id": _pa.array(range(n), _pa.int64()),
        "ts": _pa.array(pd.to_datetime(range(n), unit="us").values,
                        _pa.timestamp("us")),
        "user_id": _pa.array([1] * n, _pa.int64()),
        "event_type": _pa.array([r[0] for r in rows]),
        "value": _pa.array([r[1] for r in rows], _pa.float64()),
        "props": _pa.array(["{}"] * n),
    })
    _pq.write_table(t, f"{tmp}/events.parquet")
    got = grouped_median(tmp).to_pandas()
    got_map = {e: (int(c), int(m)) for e, c, m in zip(
        got["event_type"], got["n_rows"], got["median_x2_cents"])}
    want = {}
    df = pd.DataFrame({"e": [r[0] for r in rows],
                       "c": np.floor(np.array([r[1] for r in rows])
                                     * 100 + 0.5).astype("int64")})
    for e, g in df.groupby("e"):
        c = np.sort(g["c"].to_numpy())
        m = len(c)
        want[e] = (m, int(c[(m + 1) // 2 - 1]) + int(c[(m + 2) // 2 - 1]))
    assert got_map == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 12),
                  st.sampled_from(["a", "b", "c"])),
        min_size=1, max_size=50,
    )
)
@settings(max_examples=8, deadline=None)
def test_session_paths_matches_pandas(rows):
    """Chunked session-path counting must agree with a serial gap-rule
    fold for any (user, ts, type) distribution — ts spans ~3 chunk
    widths at quarter-chunk granularity, so sessions straddle chunk
    boundaries and same-ts ties exercise event_id ordering."""
    import tempfile

    import pandas as pd
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from phenobert_ray.functions.events import session_paths

    CHUNK = 24 * 3600 * 1_000_000  # split_hours=24 default
    GAP = 30 * 60 * 1_000_000
    tmp = tempfile.mkdtemp()
    n = len(rows)
    # quarter-chunk steps, plus a small per-index jitter below the gap
    ts = [r[1] * (CHUNK // 4) + (i % 3) for i, r in enumerate(rows)]
    t = _pa.table({
        "event_id": _pa.array(range(n), _pa.int64()),
        "ts": _pa.array(pd.to_datetime(ts, unit="us").values,
                        _pa.timestamp("us")),
        "user_id": _pa.array([r[0] for r in rows], _pa.int64()),
        "event_type": _pa.array([r[2] for r in rows]),
        "value": _pa.array([1.0] * n),
        "props": _pa.array(["{}"] * n),
    })
    _pq.write_table(t, f"{tmp}/events.parquet")
    got = session_paths(tmp).to_pandas()
    got_map = dict(zip(got["path"], got["n_sessions"].astype(int)))

    df = pd.DataFrame({"u": [r[0] for r in rows], "ts": ts,
                       "e": range(n), "t": [r[2] for r in rows]})
    df = df.sort_values(["u", "ts", "e"])
    brk = ~((df["ts"] - df["ts"].shift() <= GAP)
            & df["u"].eq(df["u"].shift()))
    df["sid"] = brk.cumsum()
    want: dict = {}
    for _, g in df.groupby("sid"):
        p = ">".join(g["t"].head(3))
        want[p] = want.get(p, 0) + 1
    # ≤ 9 distinct paths possible (|types|≤3, K=3 over ≤3 symbols is
    # bounded well under the top-20 cutoff), so the whole map must match
    assert got_map == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 15)),
        min_size=1, max_size=60,
    )
)
@settings(max_examples=8, deadline=None)
def test_weekly_active_users_matches_serial(rows):
    """Replicate-then-dedup window counts must equal the serial trailing
    7-day distinct count for any (user, day) multiset."""
    import tempfile

    import pandas as pd
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from phenobert_ray.functions.events import DAY_US, weekly_active_users

    tmp = tempfile.mkdtemp()
    n = len(rows)
    ts = [r[1] * DAY_US + i for i, r in enumerate(rows)]
    t = _pa.table({
        "event_id": _pa.array(range(n), _pa.int64()),
        "ts": _pa.array(pd.to_datetime(ts, unit="us").values,
                        _pa.timestamp("us")),
        "user_id": _pa.array([r[0] for r in rows], _pa.int64()),
        "event_type": _pa.array(["view"] * n),
        "value": _pa.array([1.0] * n),
        "props": _pa.array(["{}"] * n),
    })
    _pq.write_table(t, f"{tmp}/events.parquet")
    got = weekly_active_users(tmp).to_pandas()
    got_map = {int(d): int(x) for d, x in zip(got["day"], got["n_active"])}
    days = sorted({r[1] for r in rows})
    want = {
        d: len({u for u, dd in rows if d - 6 <= dd <= d}) for d in days
    }
    assert got_map == want
