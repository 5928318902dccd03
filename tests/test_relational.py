"""Relational joins (functions/relational.py): pandas brute-force oracles
for the broadcast join and the big×big shuffle join."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from phenobert_ray.functions.relational import (
    customers_without_urgent,
    revenue_by_priority,
    revenue_by_segment,
)


def test_broadcast_join_bruteforce(sf_small):
    got = revenue_by_segment(sf_small).to_pandas().set_index("c_mktsegment")
    o = pq.read_table(f"{sf_small}/orders.parquet").to_pandas()
    c = pq.read_table(f"{sf_small}/customer.parquet").to_pandas()
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    m["cents"] = np.floor(m["o_totalprice"] * 100 + 0.5).astype("int64")
    want = m.groupby("c_mktsegment").agg(
        n_orders=("o_custkey", "size"), revenue_cents=("cents", "sum")
    )
    assert got["n_orders"].to_dict() == want["n_orders"].to_dict()
    assert got["revenue_cents"].to_dict() == want["revenue_cents"].to_dict()


def test_broadcast_join_fallback_matches(sf_small):
    # broadcast_max_rows=0 forces the native-join plan; it must agree with
    # the broadcast plan bit-for-bit
    a = (
        revenue_by_segment(sf_small)
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    b = (
        revenue_by_segment(sf_small, broadcast_max_rows=0)
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_broadcast_join_no_driver_side_read(sf_small, monkeypatch):
    # The driver may read parquet FOOTERS (count_rows) but never the table
    # itself: guard pyarrow.dataset.dataset in this (driver) process so any
    # to_table() here raises. The lookup builder runs in a Ray worker
    # process, which this monkeypatch cannot reach — so success proves the
    # customer table never materialized on the driver.
    import pyarrow.dataset as pads

    real = pads.dataset

    class Guard:
        def __init__(self, ds):
            self._ds = ds

        def to_table(self, *a, **k):
            raise AssertionError("driver-side full-table read")

        def __getattr__(self, name):
            return getattr(self._ds, name)

    monkeypatch.setattr(pads, "dataset", lambda *a, **k: Guard(real(*a, **k)))
    got = revenue_by_segment(sf_small).to_pandas()
    assert len(got) > 0 and {"c_mktsegment", "n_orders", "revenue_cents"} <= set(
        got.columns
    )


def test_shuffle_join_bruteforce(sf_small):
    got = revenue_by_priority(sf_small).to_pandas().set_index("o_orderpriority")
    li = pq.read_table(f"{sf_small}/lineitem.parquet").to_pandas()
    o = pq.read_table(f"{sf_small}/orders.parquet").to_pandas()
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m["rev"] = np.floor(m["l_extendedprice"] * 100 + 0.5).astype("int64") * (
        100 - np.floor(m["l_discount"] * 100 + 0.5).astype("int64")
    )
    want = m.groupby("o_orderpriority").agg(
        n_lines=("l_orderkey", "size"), revenue_cpct=("rev", "sum")
    )
    assert got["n_lines"].to_dict() == want["n_lines"].to_dict()
    assert got["revenue_cpct"].to_dict() == want["revenue_cpct"].to_dict()
    # inner-join sanity: every lineitem has an order at every sf
    assert int(got["n_lines"].sum()) == len(li)


def test_anti_join_bruteforce(sf_small):
    got = customers_without_urgent(sf_small).to_pandas()
    c = pq.read_table(f"{sf_small}/customer.parquet").to_pandas()
    o = pq.read_table(f"{sf_small}/orders.parquet").to_pandas()
    urgent = set(o.loc[o["o_orderpriority"] == "1-URGENT", "o_custkey"])
    want = c[~c["c_custkey"].isin(urgent)]
    assert set(got["c_custkey"]) == set(want["c_custkey"])
    assert len(got) == len(want)
    seg = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    assert all(seg[k] == s for k, s in zip(got["c_custkey"], got["c_mktsegment"]))


def test_shipping_priority_bruteforce(sf_small):
    # two CHAINED native joins on the 4-CPU test session — the two-pool
    # sizing scenario join_num_partitions documents must not deadlock
    from phenobert_ray.functions.relational import (
        Q3_DATE,
        Q3_SEGMENT,
        Q3_TOPK,
        shipping_priority,
    )

    got = shipping_priority(sf_small).to_pandas()
    c = pq.read_table(f"{sf_small}/customer.parquet").to_pandas()
    o = pq.read_table(f"{sf_small}/orders.parquet").to_pandas()
    li = pq.read_table(f"{sf_small}/lineitem.parquet").to_pandas()
    cutoff = pd.Timestamp(Q3_DATE)
    keys = set(c.loc[c["c_mktsegment"] == Q3_SEGMENT, "c_custkey"])
    o = o[(o["o_custkey"].isin(keys)) & (o["o_orderdate"] < cutoff)]
    m = li[li["l_shipdate"] > cutoff].merge(
        o, left_on="l_orderkey", right_on="o_orderkey"
    )
    m["rev"] = np.floor(m["l_extendedprice"] * 100 + 0.5).astype("int64") * (
        100 - np.floor(m["l_discount"] * 100 + 0.5).astype("int64")
    )
    want = (
        m.groupby(["l_orderkey", "o_orderdate"], as_index=False)["rev"]
        .sum()
        .sort_values(["rev", "l_orderkey"], ascending=[False, True])
        .head(Q3_TOPK)
        .reset_index(drop=True)
    )
    assert got["l_orderkey"].tolist() == want["l_orderkey"].tolist()
    assert got["revenue_cpct"].tolist() == want["rev"].tolist()


def test_broadcast_join_empty_customer(sf_small, tmp_path):
    """An empty customer table must produce an empty inner-join result,
    not an IndexError from keys[-1] on a zero-length array (review r4)."""
    import pyarrow as pa
    import shutil

    d = tmp_path / "sf"
    d.mkdir()
    shutil.copyfile(f"{sf_small}/orders.parquet", d / "orders.parquet")
    empty = pq.read_table(f"{sf_small}/customer.parquet").schema.empty_table()
    pq.write_table(empty, d / "customer.parquet")
    got = revenue_by_segment(str(d)).to_pandas()
    assert len(got) == 0
