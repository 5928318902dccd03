"""Event-stream operators over the ``events`` table: sessionization and
tumbling-window aggregation — the "windowed aggregate" custom-operator case
of the brief (Ray Data has no native window op; both are expressed as
composition of map_batches + one bucketed exchange, per SURVEY.md §2
"Custom operators" option (a)).

Partitioning assumption (documented per the brief): all events of one
``user_id`` fit in one bucket's worth of worker memory — true by
construction for session analytics; pathological single users would need a
secondary time-split."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..stages.shuffle import from_pandas_clean


def _read_events(sf_dir: str, columns=None):
    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=columns or ["event_id", "ts", "user_id", "event_type", "value"],
    )


def sessionize(sf_dir: str, gap_minutes: int = 30, num_buckets: int | None = None):
    """Per-user sessions with a ``gap_minutes`` inactivity break.

    (user_id, session_idx, n_events, start_ts, end_ts, sum_value) — one
    shuffle on hash(user_id) % P, then fully vectorized session assignment
    per bucket (sort + diff + cumsum; no per-user Python loop)."""
    from ..stages.shuffle import default_num_buckets

    P = num_buckets or default_num_buckets()
    gap = np.timedelta64(gap_minutes * 60 * 1_000_000, "us")

    def bucketize(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["bucket"] = (
            pd.util.hash_pandas_object(df["user_id"], index=False).to_numpy() % P
        ).astype("int64")
        return from_pandas_clean(df)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        same_user = df["user_id"].eq(df["user_id"].shift())
        brk = (df["ts"].diff() > gap) & same_user
        df["session_idx"] = brk.groupby(df["user_id"].values).cumsum().astype("int64")
        g = df.groupby(["user_id", "session_idx"], as_index=False).agg(
            n_events=("event_id", "size"),
            start_ts=("ts", "min"),
            end_ts=("ts", "max"),
            sum_value=("value", "sum"),
        )
        g["sum_value"] = g["sum_value"].round(6)
        return g

    return (
        _read_events(sf_dir)
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def window_agg(sf_dir: str):
    """Tumbling 1-hour windows per event_type:
    (window_start, event_type, n_events, sum_value) — block-local partials
    then the bucketed merge (no raw event ever crosses the exchange)."""
    from ..stages.shuffle import two_phase_groupby

    def add_window(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["window_start"] = df["ts"].dt.floor("h")
        return from_pandas_clean(df[["window_start", "event_type", "value"]])

    out = two_phase_groupby(
        _read_events(sf_dir, ["ts", "event_type", "value"]).map_batches(
            add_window, batch_format="pyarrow"
        ),
        keys=["window_start", "event_type"],
        aggs={
            "n_events": (None, "size", "sum"),
            "sum_value": ("value", "sum", "sum"),
        },
    )

    def roundv(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["sum_value"] = df["sum_value"].round(6)
        return from_pandas_clean(df)

    return out.map_batches(roundv, batch_format="pyarrow")


def queries():
    return {"sessionize": sessionize, "window_agg": window_agg,
            "asof_join": asof_join, "props_stats": props_stats}


def oracles():
    return {
        "asof_join": """
        WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        v AS (SELECT event_id AS view_event_id, user_id, ts AS view_ts
              FROM events WHERE event_type = 'view'),
        j AS (
          SELECT p.event_id, p.user_id, p.ts, v.view_event_id, v.view_ts,
                 row_number() OVER (PARTITION BY p.event_id
                                    ORDER BY v.view_ts DESC, v.view_event_id DESC) AS rn
          FROM p JOIN v ON v.user_id = p.user_id AND v.view_ts < p.ts
        )
        SELECT p.event_id, p.user_id, p.ts,
               coalesce(j.view_event_id, -1) AS view_event_id, j.view_ts
        FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j USING (event_id, user_id, ts)
        """,
        "props_stats": """
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(max(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS BIGINT) AS max_k
        FROM events GROUP BY event_type
        """,
        "sessionize": """
        WITH e AS (
          SELECT user_id, event_id, ts, value,
                 CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, ts, value,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
          FROM e
        )
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               count(*) AS n_events, min(ts) AS start_ts, max(ts) AS end_ts,
               round(sum(value), 6) AS sum_value
        FROM s GROUP BY user_id, session_idx
        """,
        "window_agg": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n_events, round(sum(value), 6) AS sum_value
        FROM events GROUP BY 1, 2
        """,
    }


def asof_join(sf_dir: str, num_buckets: int | None = None):
    """As-of join (custom operator per the brief — Ray Data has none):
    for each ``purchase`` event, the latest strictly-prior ``view`` event of
    the same user.  One exchange on hash(user_id); within a bucket the join
    is a vectorized sorted-merge (``pandas.merge_asof``) — never a cross
    product.  Output: (event_id, user_id, ts, view_event_id, view_ts);
    purchases with no prior view keep nulls (-1 sentinel for ids).

    Partitioning assumption: one user's events fit in a bucket (same as
    sessionize)."""
    from ..stages.shuffle import default_num_buckets

    P = num_buckets or default_num_buckets()

    def bucketize(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["event_type"].isin(["purchase", "view"])]
        df["bucket"] = (
            pd.util.hash_pandas_object(df["user_id"], index=False).to_numpy() % P
        ).astype("int64")
        return from_pandas_clean(df[["event_id", "ts", "user_id", "event_type", "bucket"]])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left = (
            df[df.event_type == "purchase"]
            .sort_values(["ts", "event_id"])
            .rename(columns={})
        )
        right = (
            df[df.event_type == "view"]
            .sort_values(["ts", "event_id"])
            .rename(columns={"event_id": "view_event_id", "ts": "view_ts"})
        )
        if left.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "ts": pd.Series([], dtype="datetime64[us]"),
                    "view_event_id": pd.Series([], dtype="int64"),
                    "view_ts": pd.Series([], dtype="datetime64[us]"),
                }
            )
        j = pd.merge_asof(
            left[["event_id", "user_id", "ts"]],
            right[["view_event_id", "user_id", "view_ts"]],
            left_on="ts",
            right_on="view_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=False,
        )
        j["view_event_id"] = j["view_event_id"].fillna(-1).astype("int64")
        return j[["event_id", "user_id", "ts", "view_event_id", "view_ts"]]

    return (
        _read_events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def props_stats(sf_dir: str):
    """Semi-structured extraction: parse the JSON ``props`` column
    (``{"k": <int>}``) and aggregate per event_type —
    (event_type, n, sum_k, max_k).  Vectorized regex extraction per block +
    the bucketed merge."""
    from ..stages.shuffle import two_phase_groupby

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "props"])

    def extract(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["k"] = df["props"].str.extract(r"(\d+)", expand=False).astype("int64")
        return from_pandas_clean(df[["event_type", "k"]])

    return two_phase_groupby(
        ds.map_batches(extract, batch_format="pyarrow"),
        keys=["event_type"],
        aggs={
            "n": (None, "size", "sum"),
            "sum_k": ("k", "sum", "sum"),
            "max_k": ("k", "max", "max"),
        },
    )
