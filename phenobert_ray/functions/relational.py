"""Broadcast-join demo over the TPC-H-ish tables: revenue by market
segment (orders ⋈ customer).

The customer side is small → ``ray.put`` once and probed inside
``map_batches`` (SURVEY.md §2.5: broadcast instead of a shuffle join);
revenue is aggregated in exact integer cents so the result is
hash-comparable with the SQL oracle (no float-summation-order drift)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..stages.shuffle import from_pandas_clean, two_phase_groupby


def revenue_by_segment(sf_dir: str):
    """(c_mktsegment, n_orders, revenue_cents)."""
    import pyarrow.dataset as pads

    cust = pads.dataset(f"{sf_dir}/customer.parquet").to_table(
        columns=["c_custkey", "c_mktsegment"]
    )
    lut_ref = ray.put(
        dict(zip(cust.column("c_custkey").to_pylist(),
                 cust.column("c_mktsegment").to_pylist()))
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def tag(b: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        df = b.to_pandas()
        df["c_mktsegment"] = df["o_custkey"].map(lut)
        df["cents"] = np.rint(df["o_totalprice"].to_numpy() * 100).astype("int64")
        return from_pandas_clean(df[["c_mktsegment", "cents"]])

    return two_phase_groupby(
        orders.map_batches(tag, batch_format="pyarrow"),
        keys=["c_mktsegment"],
        aggs={
            "n_orders": (None, "size", "sum"),
            "revenue_cents": ("cents", "sum", "sum"),
        },
    )


def queries():
    return {"revenue_by_segment": revenue_by_segment}


def oracles():
    return {
        "revenue_by_segment": """
        SELECT c.c_mktsegment, count(*) AS n_orders,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment
        """,
    }
