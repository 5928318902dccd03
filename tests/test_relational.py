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


def test_pricing_summary_bruteforce(sf_small):
    from phenobert_ray.functions.relational import (
        Q1_SHIP_CUTOFF,
        pricing_summary,
    )

    got = (pricing_summary(sf_small).to_pandas()
           .set_index(["l_returnflag", "l_linestatus"]).sort_index())
    li = pq.read_table(f"{sf_small}/lineitem.parquet").to_pandas()
    li = li[li["l_shipdate"] <= pd.Timestamp(Q1_SHIP_CUTOFF)]
    qty = np.floor(li["l_quantity"] * 100 + 0.5).astype("int64")
    price = np.floor(li["l_extendedprice"] * 100 + 0.5).astype("int64")
    disc = np.floor(li["l_discount"] * 100 + 0.5).astype("int64")
    tax = np.floor(li["l_tax"] * 100 + 0.5).astype("int64")
    li = li.assign(qty_c=qty, base_c=price, disc_cpct=price * (100 - disc),
                   charge=price * (100 - disc) * (100 + tax))
    want = li.groupby(["l_returnflag", "l_linestatus"]).agg(
        n_rows=("qty_c", "size"), sum_qty_cents=("qty_c", "sum"),
        sum_base_cents=("base_c", "sum"), sum_disc_cpct=("disc_cpct", "sum"),
        sum_charge_cpct2=("charge", "sum")).sort_index()
    assert got.to_dict() == want.to_dict()


def test_pricing_summary_overflow_guard(tmp_path, sf_small):
    """A group whose charge sum COULD exceed int64 fails loudly instead
    of wrapping (n_rows × max|charge| ≥ 2⁶³)."""
    import shutil

    import pyarrow as pa

    import pytest as _pytest

    from phenobert_ray.functions.relational import pricing_summary

    for t in ("customer", "orders", "region", "nation", "part",
              "supplier", "events", "documents", "embeddings"):
        shutil.copy(f"{sf_small}/{t}.parquet", tmp_path / f"{t}.parquet")
    # price 9e14 → charge ≈ 9e16·100·100 = 9e20 > 2^63 with n_rows=2
    big = pa.table({
        "l_orderkey": pa.array([1, 2], pa.int64()),
        "l_partkey": pa.array([1, 1], pa.int64()),
        "l_suppkey": pa.array([1, 1], pa.int64()),
        "l_linenumber": pa.array([1, 1], pa.int32()),
        "l_quantity": pa.array([1.0, 1.0], pa.float64()),
        "l_extendedprice": pa.array([9e14, 9e14], pa.float64()),
        "l_discount": pa.array([0.0, 0.0], pa.float64()),
        "l_tax": pa.array([0.0, 0.0], pa.float64()),
        "l_returnflag": pa.array(["A", "A"], pa.string()),
        "l_linestatus": pa.array(["F", "F"], pa.string()),
        "l_shipdate": pa.array(
            np.array(["1996-01-01", "1996-01-01"], dtype="datetime64[us]"),
            pa.timestamp("us")),
    })
    pq.write_table(big, tmp_path / "lineitem.parquet")
    with _pytest.raises(Exception, match="int64"):
        pricing_summary(str(tmp_path)).to_pandas()


def _q5_bruteforce(sf_dir):
    from phenobert_ray.functions.relational import (
        Q5_DATE_HI,
        Q5_DATE_LO,
        Q5_REGION,
    )

    c = pq.read_table(f"{sf_dir}/customer.parquet").to_pandas()
    o = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    li = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pandas()
    s = pq.read_table(f"{sf_dir}/supplier.parquet").to_pandas()
    n = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    r = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    o = o[(o["o_orderdate"] >= pd.Timestamp(Q5_DATE_LO))
          & (o["o_orderdate"] < pd.Timestamp(Q5_DATE_HI))]
    m = (c.merge(o, left_on="c_custkey", right_on="o_custkey")
         .merge(li, left_on="o_orderkey", right_on="l_orderkey")
         .merge(s, left_on="l_suppkey", right_on="s_suppkey"))
    m = m[m["s_nationkey"] == m["c_nationkey"]]
    m = (m.merge(n, left_on="s_nationkey", right_on="n_nationkey")
         .merge(r, left_on="n_regionkey", right_on="r_regionkey"))
    m = m[m["r_name"] == Q5_REGION]
    m["rev"] = np.floor(m["l_extendedprice"] * 100 + 0.5).astype("int64") * (
        100 - np.floor(m["l_discount"] * 100 + 0.5).astype("int64"))
    return (m.groupby("n_name").agg(n_lines=("rev", "size"),
                                    revenue_cpct=("rev", "sum"))
            .sort_index())


def test_top_nation_revenue_bruteforce(sf_small):
    from phenobert_ray.functions.relational import top_nation_revenue

    got = (top_nation_revenue(sf_small).to_pandas()
           .set_index("n_name").sort_index())
    want = _q5_bruteforce(sf_small)
    assert got.to_dict() == want.to_dict()


def test_top_nation_revenue_customer_fallback(sf_small):
    """broadcast_max_rows=0 forces the native orders⋈customer join for
    the customer side; result must equal the broadcast plan's."""
    from phenobert_ray.functions.relational import top_nation_revenue

    # supplier shares the bound; the fallback is customer-only by design
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        top_nation_revenue(sf_small, broadcast_max_rows=0)

    got = (top_nation_revenue(sf_small, broadcast_max_rows=200)
           .to_pandas().set_index("n_name").sort_index())
    want = _q5_bruteforce(sf_small)
    assert got.to_dict() == want.to_dict()


def test_orders_with_returns_bruteforce(sf_small):
    """Semi-join semantics: an order with MANY returned lines counts
    once; orders with none don't count."""
    from phenobert_ray.functions.relational import (
        Q4_DATE_HI,
        Q4_DATE_LO,
        orders_with_returns,
    )

    got = (orders_with_returns(sf_small).to_pandas()
           .set_index("o_orderpriority").sort_index())
    o = pq.read_table(f"{sf_small}/orders.parquet").to_pandas()
    li = pq.read_table(f"{sf_small}/lineitem.parquet").to_pandas()
    o = o[(o["o_orderdate"] >= pd.Timestamp(Q4_DATE_LO))
          & (o["o_orderdate"] < pd.Timestamp(Q4_DATE_HI))]
    rset = set(li.loc[li["l_returnflag"] == "R", "l_orderkey"])
    o = o[o["o_orderkey"].isin(rset)]
    want = o.groupby("o_orderpriority").size()
    assert got["n_orders"].to_dict() == want.to_dict()


def test_q1_q4_q5_zero_match_results_stay_typed(sf_small, tmp_path):
    """Nonempty inputs whose filters match NOTHING must yield typed
    0-row results (schema() survives), not column-less datasets — the
    zero-transition lesson (hypothesis, events family) applied to the
    relational family."""
    import shutil

    import pyarrow as pa

    from phenobert_ray.functions.relational import (
        orders_with_returns,
        pricing_summary,
        top_nation_revenue,
    )

    for t in ("customer", "region", "nation", "part", "supplier",
              "events", "documents", "embeddings"):
        shutil.copy(f"{sf_small}/{t}.parquet", tmp_path / f"{t}.parquet")
    # lineitem: shipped AFTER the Q1 cutoff, never returned, suppkey
    # orphaned (no Q5 supplier match)
    li = pa.table({
        "l_orderkey": pa.array([1, 2], pa.int64()),
        "l_partkey": pa.array([1, 1], pa.int64()),
        "l_suppkey": pa.array([10**6, 10**6], pa.int64()),
        "l_linenumber": pa.array([1, 1], pa.int32()),
        "l_quantity": pa.array([1.0, 2.0], pa.float64()),
        "l_extendedprice": pa.array([10.0, 20.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0], pa.float64()),
        "l_tax": pa.array([0.0, 0.0], pa.float64()),
        "l_returnflag": pa.array(["N", "N"], pa.string()),
        "l_linestatus": pa.array(["O", "O"], pa.string()),
        "l_shipdate": pa.array(
            np.array(["2099-01-01", "2099-06-01"], dtype="datetime64[us]"),
            pa.timestamp("us")),
    })
    pq.write_table(li, tmp_path / "lineitem.parquet")
    # orders: all outside the Q4/Q5 date windows
    o = pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([0, 1], pa.int64()),
        "o_orderstatus": pa.array(["O", "O"], pa.string()),
        "o_totalprice": pa.array([10.0, 20.0], pa.float64()),
        "o_orderdate": pa.array(
            np.array(["2099-01-01", "2099-06-01"], dtype="datetime64[us]"),
            pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "5-LOW"], pa.string()),
    })
    pq.write_table(o, tmp_path / "orders.parquet")

    sf = str(tmp_path)
    for fn, cols in (
        (pricing_summary, ["l_returnflag", "l_linestatus", "n_rows",
                           "sum_qty_cents", "sum_base_cents",
                           "sum_disc_cpct", "sum_charge_cpct2"]),
        (top_nation_revenue, ["n_name", "n_lines", "revenue_cpct"]),
        (orders_with_returns, ["o_orderpriority", "n_orders"]),
    ):
        res = fn(sf)
        assert res.count() == 0, fn.__name__
        got = [f.name for f in res.schema().base_schema]
        assert got == cols, (fn.__name__, got)


def test_order_skyline_bruteforce(sf_small):
    """Pareto frontier per priority equals the O(n²) dominance check,
    duplicates-both-kept semantics included."""
    from phenobert_ray.functions.relational import order_skyline

    got = order_skyline(sf_small).to_pandas()
    o = pq.read_table(f"{sf_small}/orders.parquet").to_pandas()
    o = o.assign(
        cents=np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64"),
        ts_us=o["o_orderdate"].astype("int64"))
    want = set()
    for p, g in o.groupby("o_orderpriority"):
        pts = list(zip(g["cents"], g["ts_us"]))
        for a, b in pts:
            dominated = any(
                xa >= a and xb >= b and (xa > a or xb > b)
                for xa, xb in pts)
            if not dominated:
                want.add((p, a, b))
    got_set = set(zip(got["o_orderpriority"], got["cents"], got["ts_us"]))
    assert got_set == want
    assert len(got) == len(got_set)  # duplicates only when data has twins


def test_order_skyline_duplicates_and_block_splits(tmp_path, sf_small):
    """Twin frontier points are BOTH kept; splitting the data across many
    blocks must not let dominated points survive the two-phase plan."""
    import shutil

    import pyarrow as pa

    from phenobert_ray.functions.relational import order_skyline

    for t in ("customer", "lineitem", "region", "nation", "part",
              "supplier", "events", "documents", "embeddings"):
        shutil.copy(f"{sf_small}/{t}.parquet", tmp_path / f"{t}.parquet")
    D = np.datetime64("2000-01-01", "us")
    day = np.timedelta64(1, "D")
    rows = [
        # twins on the frontier
        ("A", 100.0, D + 5 * day), ("A", 100.0, D + 5 * day),
        # dominated by the twins (lower price, earlier)
        ("A", 50.0, D + 1 * day),
        # frontier corner: cheaper but latest
        ("A", 60.0, D + 9 * day),
        # other priority: its own frontier
        ("B", 10.0, D),
    ]
    t = pa.table({
        "o_orderkey": pa.array(range(len(rows)), pa.int64()),
        "o_custkey": pa.array([0] * len(rows), pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
        "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
        "o_orderdate": pa.array(
            np.array([r[2] for r in rows], dtype="datetime64[us]"),
            pa.timestamp("us")),
        "o_orderpriority": pa.array([r[0] for r in rows], pa.string()),
    })
    pq.write_table(t, tmp_path / "orders.parquet")
    got = order_skyline(str(tmp_path)).to_pandas()
    pts = sorted(zip(got["o_orderpriority"], got["cents"],
                     got["ts_us"].astype("int64")))
    d_us = lambda k: int((D + k * day).astype("int64"))
    assert pts == sorted([
        ("A", 10000, d_us(5)), ("A", 10000, d_us(5)),
        ("A", 6000, d_us(9)), ("B", 1000, d_us(0)),
    ])
