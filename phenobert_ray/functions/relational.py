"""Broadcast-join demo over the TPC-H-ish tables: revenue by market
segment (orders ⋈ customer).

The customer side is small → ``ray.put`` once and probed inside
``map_batches`` (SURVEY.md §2.5: broadcast instead of a shuffle join);
revenue is aggregated in exact integer cents so the result is
hash-comparable with the SQL oracle (no float-summation-order drift)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..stages.shuffle import from_pandas_clean, two_phase_groupby


# Broadcast bound for the customer side of revenue_by_segment: above this
# the dimension table no longer fits comfortably in every worker's heap as
# a sorted (int64 key, int32 code) pair (~12 B/row + the tiny category
# list) and the plan falls back to the native hash join.  2M rows ≈ 24 MB
# broadcast — cheap to ship once per worker, far below object-store limits.
BROADCAST_MAX_ROWS = 2_000_000


def _segment_lut(path: str):
    """Build the custkey→segment lookup — runs as a Ray TASK, so the full
    customer table is read in a *worker*; the driver only ever holds the
    ObjectRef.  Returns numpy arrays (sorted keys, int32 codes, category
    strings) — zero-copy out of the object store, probed with
    ``np.searchsorted`` (no per-row Python dict)."""
    import pyarrow.dataset as pads

    t = pads.dataset(path).to_table(columns=["c_custkey", "c_mktsegment"])
    keys = t.column("c_custkey").to_numpy().astype(np.int64, copy=False)
    seg = t.column("c_mktsegment").combine_chunks().dictionary_encode()
    codes = seg.indices.to_numpy().astype(np.int32, copy=False)
    cats = np.asarray(seg.dictionary.to_pylist(), dtype=object)
    order = np.argsort(keys, kind="stable")
    return keys[order], codes[order], cats


def revenue_by_segment(sf_dir: str, broadcast_max_rows: int = BROADCAST_MAX_ROWS):
    """(c_mktsegment, n_orders, revenue_cents).

    Customer is the classic broadcast side — but it *grows with scale
    factor*, so the broadcast is bounded: the driver checks only the
    parquet row count (footer metadata, no data read), and either
    (a) builds the lookup inside a Ray task and broadcasts sorted numpy
    arrays, or (b) above ``broadcast_max_rows``, joins natively like
    :func:`revenue_by_priority`."""
    import pyarrow.dataset as pads

    cust_path = f"{sf_dir}/customer.parquet"
    # metadata-only row count (parquet footers) — no table data on the driver
    n_cust = pads.dataset(cust_path).count_rows()

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def cents_col(b: pa.Table) -> np.ndarray:
        # floor(x*100+0.5): tie-rule-proof vs the SQL side (repo convention)
        return np.floor(b.column("o_totalprice").to_numpy() * 100 + 0.5).astype(
            "int64"
        )

    if n_cust <= broadcast_max_rows:
        lut_ref = ray.remote(num_cpus=1)(_segment_lut).remote(cust_path)

        def tag(b: pa.Table) -> pa.Table:
            keys, codes, cats = ray.get(lut_ref)
            ck = b.column("o_custkey").to_numpy()
            if len(keys) == 0:  # empty customer table → inner join is empty
                hit = np.zeros(len(ck), dtype=bool)
                idx = np.zeros(len(ck), dtype=np.int64)
            else:
                idx = np.searchsorted(keys, ck)
                idx = np.minimum(idx, len(keys) - 1)
                # orphan FK → dropped, like the inner join
                hit = keys[idx] == ck
            seg = cats[codes[idx[hit]]]
            return pa.table(
                {
                    "c_mktsegment": pa.array(seg, pa.string()),
                    "cents": pa.array(cents_col(b)[hit], pa.int64()),
                }
            )

        tagged = orders.map_batches(tag, batch_format="pyarrow")
    else:
        from ..stages.shuffle import join_num_partitions, table_rows

        def project(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "o_custkey": b.column("o_custkey"),
                    "cents": pa.array(cents_col(b), pa.int64()),
                }
            )

        cust = ray.data.read_parquet(
            cust_path, columns=["c_custkey", "c_mktsegment"]
        )
        tagged = orders.map_batches(project, batch_format="pyarrow").join(
            cust,
            "inner",
            join_num_partitions(table_rows(sf_dir, "orders")),
            on=("o_custkey",),
            right_on=("c_custkey",),
        )

    return two_phase_groupby(
        tagged,
        keys=["c_mktsegment"],
        aggs={
            "n_orders": (None, "size", "sum"),
            "revenue_cents": ("cents", "sum", "sum"),
        },
    )


def revenue_by_priority(sf_dir: str):
    """(o_orderpriority, n_lines, revenue_cpct) — lineitem ⋈ orders on
    orderkey, the BIG×BIG hash-shuffle join (4 lineitems per order at any
    sf — neither side broadcastable at scale), via Ray's native
    ``Dataset.join``; then a two-phase grouped sum.

    Revenue is kept in exact integer 'cent-percent' units —
    floor(price·100+0.5) × (100 − floor(discount·100+0.5)) — so both engines sum
    the same BIGINTs and the result is hash-comparable (no float
    summation-order drift).  Only 3 of lineitem's 11 and 2 of orders' 6
    columns leave storage."""
    import pyarrow.dataset as pads

    from ..stages.shuffle import join_num_partitions

    # a join side with ZERO rows ships schema-less partitions the hash
    # aggregator cannot finalize (same failure Q3 documents); footer row
    # counts are metadata-only, so the short-circuit costs no data read
    if (pads.dataset(f"{sf_dir}/lineitem.parquet").count_rows() == 0
            or pads.dataset(f"{sf_dir}/orders.parquet").count_rows() == 0):
        return ray.data.from_arrow(pa.table(
            {"o_orderpriority": pa.array([], pa.string()),
             "n_lines": pa.array([], pa.int64()),
             "revenue_cpct": pa.array([], pa.int64())}))

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def line_cents(b: pa.Table) -> pa.Table:
        price = b.column("l_extendedprice").to_numpy()
        disc = b.column("l_discount").to_numpy()
        rev = np.floor(price * 100 + 0.5).astype("int64") * (
            100 - np.floor(disc * 100 + 0.5).astype("int64")
        )
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "rev_cpct": pa.array(rev, pa.int64()),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    from ..stages.shuffle import table_rows

    joined = line.map_batches(line_cents, batch_format="pyarrow").join(
        orders,
        "inner",
        join_num_partitions(table_rows(sf_dir, "lineitem")),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    return two_phase_groupby(
        joined,
        keys=["o_orderpriority"],
        aggs={
            "n_lines": (None, "size", "sum"),
            "revenue_cpct": ("rev_cpct", "sum", "sum"),
        },
    )


def customers_without_urgent(sf_dir: str):
    """(c_custkey, c_mktsegment) — customers with NO '1-URGENT' order: the
    distributed anti-join (native ``Dataset.join`` left_anti).  The probe
    side is filtered AND projected to its single key column at the read —
    the anti-join exchange moves one int64 per urgent order, nothing
    else."""
    import pyarrow.dataset as pads

    from ..stages.shuffle import join_num_partitions

    if pads.dataset(f"{sf_dir}/customer.parquet").count_rows() == 0:
        # empty LEFT side: zero rows in every partition crashes the hash
        # aggregator's finalize (metadata-only probe, like Q3's guards)
        return ray.data.from_arrow(pa.table(
            {"c_custkey": pa.array([], pa.int64()),
             "c_mktsegment": pa.array([], pa.string())}))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )

    def urgent_keys(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.equal(b.column("o_orderpriority"), "1-URGENT")
        return b.filter(keep).select(["o_custkey"])

    urgent = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(urgent_keys, batch_format="pyarrow").materialize()
    if urgent.count() == 0:
        # a corpus with NO urgent orders is a perfectly normal input, and
        # the filter-emptied probe side crashed the join the same way
        # (reproduced, review wave 9); anti-join vs ∅ is the left side.
        # materialize+count is the measured-cheaper probe (Q3's A/B): the
        # urgent side is a single int64 column read once either way.
        return cust
    from ..stages.shuffle import table_rows

    return cust.join(
        urgent,
        "left_anti",
        join_num_partitions(
            max(table_rows(sf_dir, "customer"), urgent.count())),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-01-01"
Q3_TOPK = 10


def shipping_priority(sf_dir: str):
    """(l_orderkey, o_orderdate, revenue_cpct) — the TPC-H Q3 shape: top
    unshipped orders by revenue for one market segment (orders placed
    before the cutoff, lineitems shipped after it).  TWO chained native
    hash joins — customer⋈orders then ⋈lineitem — running their
    aggregator pools CONCURRENTLY, which is exactly the two-pool sizing
    scenario ``join_num_partitions`` documents; every join side is seeded
    with one NEGATIVE-key sentinel row per hash partition
    (``hash_cover_keys``) so no aggregator partition ever finalizes
    empty-handed — fully streaming, no empty-side probe barriers (VERDICT
    r4 item 5: this used to cost two materialize()+count() passes).  The
    cust/orders sentinels share match keys (set A) so the intermediate
    join's output partitions are covered too (their rows carry set-B
    orderkeys); lineitem uses a third disjoint set C, so no sentinel ever
    matches in the second join and none reaches the output.  Sentinels
    can't collide with data because the TPC-H tables' key domain is
    non-negative (schema-level contract, like their NOT NULL contract).

    Top-k is two-phase (per-bucket head then one tiny global head, the
    top_tokens pattern); revenue rides in exact integer cent-percent
    units so the hash matches the oracle."""
    import pyarrow.compute as pc

    from ..stages.shuffle import (
        hash_cover_keys,
        join_num_partitions,
        table_rows,
        with_sentinel_rows,
    )

    cutoff = np.datetime64(Q3_DATE, "us")
    # lineitem is the probe side and the size driver; its footer count is
    # a free upper bound that right-sizes both aggregator pools
    P = join_num_partitions(table_rows(sf_dir, "lineitem"))
    cov_a, cov_b, cov_c = hash_cover_keys(P, n_sets=3)

    cust = with_sentinel_rows(
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        ).map_batches(
            lambda b: b.filter(pc.equal(b.column("c_mktsegment"), Q3_SEGMENT))
            .select(["c_custkey"]),
            batch_format="pyarrow",
        ),
        pa.table({"c_custkey": pa.array(cov_a, pa.int64())}),
    )
    orders = with_sentinel_rows(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ).map_batches(
            lambda b: b.filter(
                pc.less(b.column("o_orderdate"), pa.scalar(cutoff))
            ),
            batch_format="pyarrow",
        ),
        pa.table(
            {
                "o_orderkey": pa.array(cov_b, pa.int64()),
                "o_custkey": pa.array(cov_a, pa.int64()),
                "o_orderdate": pa.array([None] * len(cov_a),
                                        pa.timestamp("us")),
            }
        ),
    )

    empty_out = pa.table(
        {
            "l_orderkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "revenue_cpct": pa.array([], pa.int64()),
        }
    )

    # j1's sentinel rows (one per partition: A matched A, carrying B
    # orderkeys) ride out of the join itself — no extra union needed
    j1 = orders.join(
        cust,
        "inner",
        P,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def line_rev(b: pa.Table) -> pa.Table:
        keep = pc.greater(b.column("l_shipdate"), pa.scalar(cutoff))
        b = b.filter(keep)
        price = b.column("l_extendedprice").to_numpy()
        disc = b.column("l_discount").to_numpy()
        # floor(x*100 + 0.5) on both sides: tie-rule-proof (np.rint is
        # half-to-even, SQL round() half-away — exact .5 would diverge)
        rev = np.floor(price * 100 + 0.5).astype("int64") * (
            100 - np.floor(disc * 100 + 0.5).astype("int64")
        )
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "rev_cpct": pa.array(rev, pa.int64()),
            }
        )

    line = with_sentinel_rows(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount",
                     "l_shipdate"],
        ).map_batches(line_rev, batch_format="pyarrow"),
        pa.table(
            {
                "l_orderkey": pa.array(cov_c, pa.int64()),
                "rev_cpct": pa.array([0] * len(cov_c), pa.int64()),
            }
        ),
    )

    j2 = line.join(
        j1,
        "inner",
        P,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    grouped = two_phase_groupby(
        j2.map_batches(
            lambda b: b.select(["l_orderkey", "o_orderdate", "rev_cpct"]),
            batch_format="pyarrow",
        ),
        keys=["l_orderkey", "o_orderdate"],
        aggs={"revenue_cpct": ("rev_cpct", "sum", "sum")},
    )

    def bucket_head(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas().sort_values(
            ["revenue_cpct", "l_orderkey"], ascending=[False, True]
        ).head(Q3_TOPK)
        return from_pandas_clean(df)

    out = grouped.map_batches(bucket_head, batch_format="pyarrow").to_pandas()
    if out.empty:
        # both sides non-empty but ZERO matching orderkeys: the grouped
        # dataset is all-empty blocks and Ray's to_pandas drops the schema
        # (cols=[]), so sort_values KeyErrored (reproduced, review r4 w8)
        return ray.data.from_arrow(empty_out)
    out = (
        out.sort_values(["revenue_cpct", "l_orderkey"], ascending=[False, True])
        .head(Q3_TOPK)
        .reset_index(drop=True)
    )
    out["o_orderdate"] = out["o_orderdate"].astype("datetime64[us]")
    return ray.data.from_pandas(out[["l_orderkey", "o_orderdate", "revenue_cpct"]])


def _pct_units(col, name: str, op: str, bound: float = 9e16) -> np.ndarray:
    """floor(x·100 + 0.5) as int64 with the _cents-style LOUD guard:
    NaN/inf or |x| past the int64-unit range would otherwise WRAP in the
    float→int64 cast — and a wrapped INT64_MIN even defeats a post-cast
    ``np.abs(...) > bound`` check (np.abs(INT64_MIN) is still negative,
    review wave 3), so the validation must happen on the FLOAT."""
    v = np.asarray(col.to_numpy() if hasattr(col, "to_numpy") else col,
                   dtype=np.float64)
    bad = ~np.isfinite(v) | (np.abs(v) > bound)
    if bad.any():
        raise ValueError(
            f"{op}: {int(bad.sum())} {name} value(s) are NaN/inf or exceed "
            f"|x| <= {bound:g} (int64-unit safety); clean the column "
            "upstream")
    return np.floor(v * 100 + 0.5).astype(np.int64)


Q1_SHIP_CUTOFF = "1998-09-02"


def pricing_summary(sf_dir: str):
    """The TPC-H Q1 shape: (l_returnflag, l_linestatus, n_rows,
    sum_qty_cents, sum_base_cents, sum_disc_cpct, sum_charge_cpct2) over
    lineitems shipped on or before the cutoff — the canonical scan-heavy
    partial aggregation: one projected/filtered pass over the fact table,
    per-batch combiner, then a two-phase groupby over ≤ |flag|×|status|
    keys.  Nothing but (groups × blocks) scalar partials ever crosses the
    wire; at 100 TB the exchange payload is independent of row count.

    Exact integer units (the repo money convention): qty/base in cents,
    disc_price in cent·pct (price_c × (100−disc_p)), charge in cent·pct²
    (× (100+tax_p)) — both engines sum identical BIGINTs, no float
    summation-order drift.  Overflow is guarded HONESTLY, not assumed:
    min/max per-row charge ride the same exchange, and the finish stage
    fails loudly unless n_rows × max|charge| < 2⁶³ for every group (if
    the true sum cannot overflow, no intermediate wrap occurred —
    partials are sub-sums of nonwrapping totals); DuckDB's HUGEINT
    promotion would otherwise diverge silently from a wrapped int64
    (the label_centroids lesson, ADVICE r4)."""
    import pyarrow.compute as pc

    cutoff = np.datetime64(Q1_SHIP_CUTOFF, "us")

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b.column("l_shipdate"), pa.scalar(cutoff)))
        # _pct_units validates the FLOATS (finite + range) before the
        # int64 cast — a wrapped cast would even defeat a post-cast
        # np.abs check (review wave 3); the per-row product bound below
        # then guarantees the charge multiply can't wrap either:
        # |price_c| ≤ 2⁴⁶ and pct factors ≤ 255 bound it by 2⁶²
        qty = _pct_units(b.column("l_quantity"), "l_quantity",
                         "pricing_summary")
        price = _pct_units(b.column("l_extendedprice"), "l_extendedprice",
                           "pricing_summary", bound=float(1 << 46) / 100)
        disc = _pct_units(b.column("l_discount"), "l_discount",
                          "pricing_summary", bound=1.55)
        tax = _pct_units(b.column("l_tax"), "l_tax",
                         "pricing_summary", bound=1.55)
        disc_price = price * (100 - disc)
        charge = disc_price * (100 + tax)
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "qty_c": pa.array(qty, pa.int64()),
            "base_c": pa.array(price, pa.int64()),
            "disc_cpct": pa.array(disc_price, pa.int64()),
            "charge": pa.array(charge, pa.int64()),
        })

    g = two_phase_groupby(
        line.map_batches(project, batch_format="pyarrow"),
        keys=["l_returnflag", "l_linestatus"],
        aggs={
            "n_rows": (None, "size", "sum"),
            "sum_qty_cents": ("qty_c", "sum", "sum"),
            "sum_base_cents": ("base_c", "sum", "sum"),
            "sum_disc_cpct": ("disc_cpct", "sum", "sum"),
            "sum_charge_cpct2": ("charge", "sum", "sum"),
            "_min_charge": ("charge", "min", "min"),
            "_max_charge": ("charge", "max", "max"),
        },
    )

    out_schema = pa.schema([
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("n_rows", pa.int64()), ("sum_qty_cents", pa.int64()),
        ("sum_base_cents", pa.int64()), ("sum_disc_cpct", pa.int64()),
        ("sum_charge_cpct2", pa.int64()),
    ])

    def finish(b: pa.Table) -> pa.Table:
        # tiny table (≤ groups rows); guard in Python ints (no np wrap)
        for n, lo, hi in zip(b.column("n_rows").to_pylist(),
                             b.column("_min_charge").to_pylist(),
                             b.column("_max_charge").to_pylist()):
            if int(n) * max(abs(int(lo)), abs(int(hi))) >= (1 << 63):
                raise ValueError(
                    "pricing_summary: a group's charge sum may exceed "
                    "int64; use a split hi/lo accumulator at this scale")
        return b.select(out_schema.names)

    from ..stages.shuffle import typed_result

    return typed_result(
        g.map_batches(finish, batch_format="pyarrow"), out_schema)


Q5_REGION = "AFRICA"
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1998-01-01"


def _nation_luts(sf_dir: str, region: str):
    """Region-filtered dimension lookups, built inside a Ray TASK (the
    driver holds only the ObjectRef): nations of ``region`` with names,
    s_suppkey→s_nationkey and c_custkey→c_nationkey restricted to those
    nations, each as sorted numpy key/value pairs for searchsorted
    probes.  Uniqueness of supp/cust keys is the schema-level PK
    contract (same as the tables' NOT NULL contract)."""
    import pyarrow.dataset as pads

    nat = pads.dataset(f"{sf_dir}/nation.parquet").to_table()
    reg = pads.dataset(f"{sf_dir}/region.parquet").to_table()
    rkeys = {
        rk for rk, rn in zip(reg.column("r_regionkey").to_pylist(),
                             reg.column("r_name").to_pylist())
        if rn == region
    }
    nat_key, nat_name = [], []
    for nk, nn, nr in zip(nat.column("n_nationkey").to_pylist(),
                          nat.column("n_name").to_pylist(),
                          nat.column("n_regionkey").to_pylist()):
        if nr in rkeys:
            nat_key.append(nk)
            nat_name.append(nn)
    nat_in = np.asarray(sorted(nat_key), dtype=np.int64)
    names = {k: n for k, n in zip(nat_key, nat_name)}

    def fk_lut(table: str, key_col: str, nat_col: str):
        t = pads.dataset(f"{sf_dir}/{table}.parquet").to_table(
            columns=[key_col, nat_col])
        k = t.column(key_col).to_numpy().astype(np.int64, copy=False)
        v = t.column(nat_col).to_numpy().astype(np.int64, copy=False)
        keep = np.isin(v, nat_in)
        k, v = k[keep], v[keep]
        order = np.argsort(k, kind="stable")
        return k[order], v[order]

    return fk_lut("supplier", "s_suppkey", "s_nationkey"), \
        fk_lut("customer", "c_custkey", "c_nationkey"), names


def _probe_sorted(keys: np.ndarray, vals: np.ndarray, probe: np.ndarray):
    """Inner-join-semantics probe: (hit_mask, value_at_hit)."""
    if len(keys) == 0:
        return np.zeros(len(probe), dtype=bool), np.zeros(
            len(probe), dtype=np.int64)
    idx = np.minimum(np.searchsorted(keys, probe), len(keys) - 1)
    hit = keys[idx] == probe
    return hit, vals[idx]


def top_nation_revenue(sf_dir: str,
                       broadcast_max_rows: int = BROADCAST_MAX_ROWS):
    """The TPC-H Q5 shape: (n_name, n_lines, revenue_cpct) — revenue from
    lineitems where the SUPPLIER and the ordering CUSTOMER share a nation
    inside ``Q5_REGION``, orders placed within the date window.  The
    mixed broadcast+shuffle join plan:

    - nation/region/supplier/customer are region-filtered into sorted
      numpy lookups inside one Ray task and broadcast (``ray.put``-style
      ObjectRef read once per worker) — the small sides NEVER shuffle;
    - orders (date-filtered → (o_orderkey, cust_nat)) ⋈ lineitem
      (→ (l_orderkey, supp_nat, rev_cpct)) is the one BIG×BIG hash
      exchange, sentinel-covered on both sides (``hash_cover_keys``, two
      disjoint sets so no sentinel survives the join);
    - the nation-equality filter and the tiny per-nation groupby run on
      the join output.

    The customer lookup grows with scale factor, so it is BOUNDED like
    :func:`revenue_by_segment`: above ``broadcast_max_rows`` the plan
    falls back to a native orders⋈customer hash join for that side
    (footer-count check only).  Supplier is 10× smaller by schema ratio
    and uses the same bound with the same fallback."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from ..stages.shuffle import (
        hash_cover_keys,
        join_num_partitions,
        table_rows,
        typed_result,
        with_sentinel_rows,
    )

    lo = np.datetime64(Q5_DATE_LO, "us")
    hi = np.datetime64(Q5_DATE_HI, "us")
    out_schema = pa.schema([
        ("n_name", pa.string()), ("n_lines", pa.int64()),
        ("revenue_cpct", pa.int64()),
    ])

    luts_ref = ray.remote(num_cpus=1)(_nation_luts).remote(sf_dir, Q5_REGION)

    P = join_num_partitions(table_rows(sf_dir, "lineitem"))
    cov_a, cov_b = hash_cover_keys(P, n_sets=2)

    n_cust = pads.dataset(f"{sf_dir}/customer.parquet").count_rows()
    n_supp = pads.dataset(f"{sf_dir}/supplier.parquet").count_rows()

    def orders_bcast(b: pa.Table) -> pa.Table:
        (_, _), (ck, cn), _ = ray.get(luts_ref)
        keep = pc.and_(pc.greater_equal(b.column("o_orderdate"),
                                        pa.scalar(lo)),
                       pc.less(b.column("o_orderdate"), pa.scalar(hi)))
        b = b.filter(keep)
        hit, nat = _probe_sorted(ck, cn, b.column("o_custkey").to_numpy())
        return pa.table({
            "o_orderkey": b.column("o_orderkey").filter(pa.array(hit)),
            "cust_nat": pa.array(nat[hit], pa.int64()),
        })

    if n_cust <= broadcast_max_rows:
        orders = ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ).map_batches(orders_bcast, batch_format="pyarrow")
    else:
        # scale fallback: customer joins natively (projected to 2 cols)
        def orders_proj(b: pa.Table) -> pa.Table:
            keep = pc.and_(pc.greater_equal(b.column("o_orderdate"),
                                            pa.scalar(lo)),
                           pc.less(b.column("o_orderdate"), pa.scalar(hi)))
            return b.filter(keep).select(["o_orderkey", "o_custkey"])

        def cust_proj(b: pa.Table) -> pa.Table:
            (_, _), (_, _), names = ray.get(luts_ref)
            nat_in = pa.array(sorted(names), pa.int32())
            keep = pc.is_in(b.column("c_nationkey"), value_set=nat_in)
            return b.filter(keep)

        cov_c, cov_d = hash_cover_keys(P, n_sets=2)
        oside = with_sentinel_rows(
            ray.data.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_orderkey", "o_custkey", "o_orderdate"],
            ).map_batches(orders_proj, batch_format="pyarrow"),
            pa.table({"o_orderkey": pa.array(cov_d, pa.int64()),
                      "o_custkey": pa.array(cov_c, pa.int64())}))
        cside = with_sentinel_rows(
            ray.data.read_parquet(
                f"{sf_dir}/customer.parquet",
                columns=["c_custkey", "c_nationkey"],
            ).map_batches(cust_proj, batch_format="pyarrow"),
            pa.table({"c_custkey": pa.array(cov_c, pa.int64()),
                      "c_nationkey": pa.array([-1] * len(cov_c),
                                              pa.int32())}))
        joined_oc = oside.join(cside, "inner", P, on=("o_custkey",),
                               right_on=("c_custkey",))

        def oc_finish(b: pa.Table) -> pa.Table:
            # drop the cover-C sentinel matches (negative orderkeys)
            keep = pc.greater_equal(b.column("o_orderkey"), 0)
            b = b.filter(keep)
            return pa.table({
                "o_orderkey": b.column("o_orderkey"),
                "cust_nat": pc.cast(b.column("c_nationkey"), pa.int64()),
            })

        orders = joined_oc.map_batches(oc_finish, batch_format="pyarrow")

    def line_proj(b: pa.Table) -> pa.Table:
        (sk, sn), (_, _), _ = ray.get(luts_ref)
        hit, nat = _probe_sorted(sk, sn, b.column("l_suppkey").to_numpy())
        b = b.filter(pa.array(hit))
        # loud NaN/range validation BEFORE the int64 cast (review wave 3)
        price = _pct_units(b.column("l_extendedprice"), "l_extendedprice",
                           "top_nation_revenue", bound=float(1 << 54) / 100)
        disc = _pct_units(b.column("l_discount"), "l_discount",
                          "top_nation_revenue", bound=1.55)
        rev = price * (100 - disc)
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "supp_nat": pa.array(nat[hit], pa.int64()),
            "rev_cpct": pa.array(rev, pa.int64()),
        })

    if n_supp > broadcast_max_rows:
        raise NotImplementedError(
            "top_nation_revenue: supplier side exceeds the broadcast "
            "bound; add the native-join fallback (mirror the customer "
            "branch) for this deployment")

    line = with_sentinel_rows(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount"],
        ).map_batches(line_proj, batch_format="pyarrow"),
        pa.table({"l_orderkey": pa.array(cov_a, pa.int64()),
                  "supp_nat": pa.array([-1] * len(cov_a), pa.int64()),
                  "rev_cpct": pa.array([0] * len(cov_a), pa.int64())}))
    orders = with_sentinel_rows(
        orders,
        pa.table({"o_orderkey": pa.array(cov_b, pa.int64()),
                  "cust_nat": pa.array([-1] * len(cov_b), pa.int64())}))

    j = line.join(orders, "inner", P, on=("l_orderkey",),
                  right_on=("o_orderkey",))

    def same_nation(b: pa.Table) -> pa.Table:
        names_map = ray.get(luts_ref)[2]
        nkeys = np.asarray(sorted(names_map), dtype=np.int64)
        nnames = np.asarray([names_map[k] for k in sorted(names_map)],
                            dtype=object)
        keep = pc.and_(pc.equal(b.column("supp_nat"), b.column("cust_nat")),
                       pc.greater_equal(b.column("supp_nat"), 0))
        b = b.filter(keep)
        nat = b.column("supp_nat").to_numpy()
        # vectorized id→name: every surviving nat is in-region by
        # construction (the FK lookups were region-filtered)
        return pa.table({
            "n_name": pa.array(nnames[np.searchsorted(nkeys, nat)],
                               pa.string()),
            "rev_cpct": b.column("rev_cpct"),
        })

    g = two_phase_groupby(
        j.map_batches(same_nation, batch_format="pyarrow"),
        keys=["n_name"],
        aggs={"n_lines": (None, "size", "sum"),
              "revenue_cpct": ("rev_cpct", "sum", "sum")},
    )

    def order_cols(b: pa.Table) -> pa.Table:
        return b.select(out_schema.names)

    return typed_result(
        g.map_batches(order_cols, batch_format="pyarrow"), out_schema)


Q4_DATE_LO = "1996-01-01"
Q4_DATE_HI = "1998-01-01"


def orders_with_returns(sf_dir: str):
    """The TPC-H Q4 shape: (o_orderpriority, n_orders) — orders placed in
    the window with AT LEAST ONE returned lineitem (l_returnflag = 'R'),
    i.e. the distributed SEMI-join (native ``Dataset.join`` left_semi:
    matched-or-not, never multiplied, so a hot order with 10^6 return
    lines still contributes exactly once).  The probe side is filtered
    AND projected to its single key column at the read — the exchange
    moves one int64 per returned lineitem.  Both sides are sentinel-
    covered (disjoint key sets, so no sentinel ever matches and none can
    reach the semi output) — fully streaming, no empty-side probe
    barriers.  Counting is the usual two-phase groupby over ≤ |priority|
    keys."""
    import pyarrow.compute as pc

    from ..stages.shuffle import (
        hash_cover_keys,
        join_num_partitions,
        table_rows,
        typed_result,
        with_sentinel_rows,
    )

    lo = np.datetime64(Q4_DATE_LO, "us")
    hi = np.datetime64(Q4_DATE_HI, "us")
    out_schema = pa.schema([("o_orderpriority", pa.string()),
                            ("n_orders", pa.int64())])

    P = join_num_partitions(table_rows(sf_dir, "lineitem"))
    cov_a, cov_b = hash_cover_keys(P, n_sets=2)

    def orders_proj(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b.column("o_orderdate"),
                                        pa.scalar(lo)),
                       pc.less(b.column("o_orderdate"), pa.scalar(hi)))
        return b.filter(keep).select(["o_orderkey", "o_orderpriority"])

    orders = with_sentinel_rows(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
        ).map_batches(orders_proj, batch_format="pyarrow"),
        pa.table({"o_orderkey": pa.array(cov_a, pa.int64()),
                  "o_orderpriority": pa.array([""] * len(cov_a),
                                              pa.string())}))

    def returned_keys(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("l_returnflag"), "R")
        return b.filter(keep).select(["l_orderkey"])

    returned = with_sentinel_rows(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag"],
        ).map_batches(returned_keys, batch_format="pyarrow"),
        pa.table({"l_orderkey": pa.array(cov_b, pa.int64())}))

    j = orders.join(returned, "left_semi", P, on=("o_orderkey",),
                    right_on=("l_orderkey",))

    g = two_phase_groupby(
        j.map_batches(
            lambda b: b.select(["o_orderpriority"]),
            batch_format="pyarrow"),
        keys=["o_orderpriority"],
        aggs={"n_orders": (None, "size", "sum")},
    )
    return typed_result(g, out_schema)


def _skyline_2d(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized 2-D Pareto frontier within each o_orderpriority group:
    keep rows NOT dominated (x ≥ on both dims, > on at least one) by any
    row of the same group.  Kept iff b equals its a-group max AND every
    strictly-larger-a group's max b is < b (dominance with ≥b requires
    only >a).  Sort + two groupbys — no pairwise product."""
    if df.empty:
        return df
    df = df.sort_values(["o_orderpriority", "cents", "ts_us"],
                        ascending=[True, False, False])
    g = df.groupby(["o_orderpriority", "cents"], sort=False)["ts_us"]
    groupmax = g.transform("max")
    # prefix max of ts over strictly-larger cents within the priority:
    # first row per (priority, cents) carries the running max so far
    firsts = df.loc[g.transform("cumcount") == 0,
                    ["o_orderpriority", "cents", "ts_us"]].copy()
    # within each cents group the FIRST row (ts desc) is the group max,
    # so shift(1).cummax() is exactly "max ts over strictly-larger cents"
    firsts["gm"] = firsts.groupby("o_orderpriority", sort=False)[
        "ts_us"].transform(lambda s: s.shift(1).cummax())
    gm_map = firsts.set_index(["o_orderpriority", "cents"])["gm"]
    df = df.merge(
        gm_map.rename("prev_max").reset_index(),
        on=["o_orderpriority", "cents"], how="left")
    keep = (df["ts_us"] == groupmax.to_numpy()) & (
        df["prev_max"].isna() | (df["prev_max"] < df["ts_us"]))
    return df.loc[keep.to_numpy(),
                  ["o_orderpriority", "cents", "ts_us"]]


def order_skyline(sf_dir: str):
    """(o_orderpriority, cents, ts_us) — the 2-D SKYLINE (Pareto
    frontier) per priority class: orders not dominated in
    (totalprice, orderdate) by any same-priority order — "the most
    expensive AND most recent" frontier, the multi-criteria-optimality
    query shape.

    Scale shape — the non-trivial ALGEBRAIC combiner: a globally
    non-dominated point is non-dominated in every subset containing it,
    so per-block local skylines are a superset-preserving reduction;
    survivors (bounded by the frontier size × blocks, typically ≪ rows)
    re-exchange on priority and one per-group pass finishes exactly.
    Duplicated frontier points are all kept (a twin does not strictly
    dominate), matching the SQL NOT EXISTS semantics."""
    from ..stages.shuffle import (
        from_pandas_clean,
        two_phase_groupby,  # noqa: F401  (module convention import)
        typed_result,
    )

    out_schema = pa.schema([
        ("o_orderpriority", pa.string()), ("cents", pa.int64()),
        ("ts_us", pa.int64()),
    ])

    def local(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_orderpriority": b.column("o_orderpriority").to_pandas(),
            "cents": _pct_units(b.column("o_totalprice"), "o_totalprice",
                                "order_skyline"),
            "ts_us": b.column("o_orderdate").to_numpy().astype("int64"),
        })
        out = _skyline_2d(df)
        if not len(out):
            return out_schema.empty_table()
        return from_pandas_clean(out).cast(out_schema)

    # modulus snapshotted ONCE on the driver (the ADVICE-r4 lesson: a
    # per-batch modulus splits one priority's survivors across buckets
    # and dominated rows survive the final pass — reproduced here on the
    # adversarial tables before the fix)
    from ..stages.shuffle import default_num_buckets

    P = default_num_buckets()

    def bucket(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["bucket"] = (pd.util.hash_pandas_object(
            df["o_orderpriority"], index=False).to_numpy() % P
        ).astype("int64")
        return from_pandas_clean(df)

    def finish(df: pd.DataFrame) -> pa.Table:
        if df.empty or "o_orderpriority" not in df.columns:
            return out_schema.empty_table()
        out = _skyline_2d(df[["o_orderpriority", "cents", "ts_us"]])
        if not len(out):
            return out_schema.empty_table()
        return from_pandas_clean(out).cast(out_schema)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice", "o_orderdate"],
    )
    return typed_result(
        orders.map_batches(local, batch_format="pyarrow")
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(finish, batch_format="pandas"),
        out_schema,
    )


def queries():
    return {
        "revenue_by_segment": revenue_by_segment,
        "revenue_by_priority": revenue_by_priority,
        "customers_without_urgent": customers_without_urgent,
        "shipping_priority": shipping_priority,
        "pricing_summary": pricing_summary,
        "top_nation_revenue": top_nation_revenue,
        "orders_with_returns": orders_with_returns,
        "order_skyline": order_skyline,
    }


def oracles():
    return {
        "pricing_summary": f"""
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_qty_cents,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_base_cents,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                        * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                    AS BIGINT) AS sum_disc_cpct,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                        * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                        * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT)))
                    AS BIGINT) AS sum_charge_cpct2
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{Q1_SHIP_CUTOFF} 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """,
        "order_skyline": """
        WITH s AS (
          SELECT o_orderpriority AS p,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                 epoch_us(o_orderdate) AS ts_us
          FROM orders
        )
        SELECT a.p AS o_orderpriority, a.cents, a.ts_us FROM s a
        WHERE NOT EXISTS (
          SELECT 1 FROM s x
          WHERE x.p = a.p AND x.cents >= a.cents AND x.ts_us >= a.ts_us
            AND (x.cents > a.cents OR x.ts_us > a.ts_us))
        """,
        "orders_with_returns": f"""
        SELECT o.o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '{Q4_DATE_LO} 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '{Q4_DATE_HI} 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
        GROUP BY o.o_orderpriority
        """,
        "top_nation_revenue": f"""
        SELECT n.n_name, count(*) AS n_lines,
               CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                        * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
                    AS BIGINT) AS revenue_cpct
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
                       AND s.s_nationkey = c.c_nationkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = '{Q5_REGION}'
          AND o.o_orderdate >= TIMESTAMP '{Q5_DATE_LO} 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '{Q5_DATE_HI} 00:00:00'
        GROUP BY n.n_name
        """,
        "shipping_priority": f"""
        SELECT l.l_orderkey, o.o_orderdate,
               CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                        * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
                    AS BIGINT) AS revenue_cpct
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = '{Q3_SEGMENT}'
          AND o.o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
          AND l.l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue_cpct DESC, l.l_orderkey ASC
        LIMIT {Q3_TOPK}
        """,
        "revenue_by_segment": """
        SELECT c.c_mktsegment, count(*) AS n_orders,
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment
        """,
        "revenue_by_priority": """
        SELECT o.o_orderpriority, count(*) AS n_lines,
               CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                        * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
                    AS BIGINT) AS revenue_cpct
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority
        """,
        "customers_without_urgent": """
        SELECT c.c_custkey, c.c_mktsegment FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
        """,
    }
