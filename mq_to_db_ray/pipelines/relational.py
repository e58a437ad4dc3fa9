"""Relational join suite over the TPC-H-shaped tables (lineitem, orders,
customer) — the operator family the events/documents suites never need:
a BIG × BIG equi-join where both sides are corpus-sized at 100 TB and
neither fits a broadcast.

Three shapes, each the canonical scale answer to its join class:

* :func:`pricing_summary`  — scan-aggregate with a PREDICATE PUSHED TO THE
  READ (row-group pruning), the R1/TPC-H-Q1 shape;
* :func:`order_fulfillment` — big × big co-partitioned join: both sides
  hash-partition by the join key so every (order, its lines) pair meets in
  exactly one task, pre-aggregated per batch BEFORE the exchange (lines
  collapse ~4:1 to per-order partials); the reference engine delegates this
  class to PostgreSQL (reference storage/sql writer, `sql.go`) — here it is
  a first-class distributed operator;
* :func:`segment_sales` — dimension-table broadcast join (`ray.put` once,
  searchsorted per batch — the T17 convention) for the small-side class.

Exactness convention: money columns are doubles, so every aggregated money
value is floored to int64 FIRST (``floor`` is exact on both numpy and
DuckDB doubles) and quantities cast to int64 — all oracle comparisons are
bit-exact integers, never float sums."""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data import Dataset

from ..stages.shuffle import adaptive_width, hash_partition_merge


@lru_cache(maxsize=64)
def _rel_k(sf_dir: str, table: str) -> int:
    """Footer-derived fan-out for a TPC-H table (memoized per table)."""
    return adaptive_width(f"{sf_dir}/{table}.parquet", 50_000)


def _month_id(ts_us: np.ndarray) -> np.ndarray:
    """Months since 1970-01 for epoch-microsecond timestamps (calendar-exact
    via numpy's datetime64 unit conversion, matching date_trunc('month'))."""
    return ts_us.astype("datetime64[us]").astype("datetime64[M]").astype(np.int64)


def _month_ts(month_id: np.ndarray) -> pa.Array:
    us = month_id.astype("datetime64[M]").astype("datetime64[us]").astype(np.int64)
    return pa.array(us, pa.int64()).cast(pa.timestamp("us"))


def pricing_summary(sf_dir: str, cutoff: str = "2001-09-01") -> Dataset:
    """R1: pricing summary (the TPC-H Q1 shape) — per (l_returnflag,
    l_linestatus) over lines shipped on or before ``cutoff``: line count,
    exact quantity total, and the floored base-price total.

    Scale shape: the WHERE clause is a pyarrow expression handed to
    ``read_parquet`` so row groups beyond the cutoff never leave storage
    (predicate + column pruning at the read — the audit rule's "prune at
    the read" in its purest form); each batch collapses to <= 6 partial
    rows (3 flags x 2 statuses) and only those ride the tiny merge."""
    cutoff_ts = pa.scalar(np.datetime64(cutoff, "us").item(), pa.timestamp("us"))
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
        filter=(pc.field("l_shipdate") <= cutoff_ts),
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty": pc.cast(b["l_quantity"], pa.int64()),
                "price": pc.cast(pc.floor(b["l_extendedprice"]), pa.int64()),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"], use_threads=False).aggregate(
            [("qty", "count"), ("qty", "sum"), ("price", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "n_lines", "sum_qty", "sum_price_floor"]
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "l_linestatus": pa.array([], pa.string()),
                    "n_lines": pa.array([], pa.int64()),
                    "sum_qty": pa.array([], pa.int64()),
                    "sum_price_floor": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["l_returnflag", "l_linestatus"], use_threads=False).aggregate(
            [("n_lines", "sum"), ("sum_qty", "sum"), ("sum_price_floor", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "n_lines", "sum_qty", "sum_price_floor"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("l_returnflag").map_groups(merge, batch_format="pyarrow")


@lru_cache(maxsize=64)
def _priority_rank(sf_dir: str) -> tuple[str, ...]:
    """Sorted distinct o_orderpriority values (tiny-cardinality broadcast
    rank — the events_src_list convention)."""
    return tuple(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet", columns=["o_orderpriority"]
            ).unique("o_orderpriority")
        )
    )


def order_fulfillment(sf_dir: str) -> Dataset:
    """R2: order-fulfillment board — per (o_orderpriority, order month):
    orders with at least one line item, total line count, exact quantity
    total, and floored line revenue — the lineitem >< orders BIG x BIG
    equi-join neither side of which can broadcast at 100 TB.

    Scale shape — co-partitioned join, pre-aggregated before the exchange:
      1. lineitem batches collapse ~4:1 to per-order partials
         (orderkey, n_lines, qty, revenue) — one Arrow group_by each;
         orders batches reduce to (orderkey, priority-rank, month-id);
      2. BOTH streams union under one schema (role-tagged columns, the
         near_dedup_keep convention) and hash-partition by ORDERKEY: every
         order meets all its line partials in exactly one task, where line
         partials collapse per key (one lexsort), attach their order's
         (priority, month) via one searchsorted, and re-reduce to
         (priority, month, n_orders, n_lines, qty, revenue) partials;
      3. one k=1 merge sums O(priorities x months) rows.
    Priority identity is an exact broadcast rank, never a hash."""
    pr = _priority_rank(sf_dir)
    prs = pa.array(list(pr), pa.string())

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_extendedprice"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def line_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "qty": pc.cast(b["l_quantity"], pa.int64()),
                "rev": pc.cast(pc.floor(b["l_extendedprice"]), pa.int64()),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate(
            [("qty", "count"), ("qty", "sum"), ("rev", "sum")]
        )
        g = g.rename_columns(["k", "nl", "qty", "rev"])
        return g.append_column(
            "pr", pa.array(np.full(g.num_rows, -1, np.int64))
        ).append_column("mo", pa.array(np.zeros(g.num_rows, np.int64)))

    def order_partial(b: pa.Table) -> pa.Table:
        code = pc.cast(pc.index_in(b["o_orderpriority"], value_set=prs), pa.int64())
        ts_us = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        n = len(ts_us)
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "nl": pa.array(np.zeros(n, np.int64)),
                "qty": pa.array(np.zeros(n, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
                "pr": code,
                "mo": pa.array(_month_id(ts_us)),
            }
        )

    def join_fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "pr": pa.array([], pa.int64()),
                "mo": pa.array([], pa.int64()),
                "n_orders": pa.array([], pa.int64()),
                "n_lines": pa.array([], pa.int64()),
                "sum_qty": pa.array([], pa.int64()),
                "revenue_floor": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["pr"].combine_chunks().to_numpy(zero_copy_only=False)
        is_order = role >= 0
        o = t.filter(pa.array(is_order))
        l = t.filter(pa.array(~is_order))
        if o.num_rows == 0 or l.num_rows == 0:
            return empty
        # collapse line partials to one row per orderkey
        lg = l.group_by("k", use_threads=False).aggregate(
            [("nl", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        lk = lg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = o["k"].combine_chunks().to_numpy(zero_copy_only=False)
        oorder = np.argsort(ok, kind="stable")
        ok_s = ok[oorder]
        pos = np.searchsorted(ok_s, lk)
        pos = np.clip(pos, 0, len(ok_s) - 1)
        hit = ok_s[pos] == lk
        opr = o["pr"].combine_chunks().to_numpy(zero_copy_only=False)[oorder][pos]
        omo = o["mo"].combine_chunks().to_numpy(zero_copy_only=False)[oorder][pos]
        nl = lg["nl_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        qt = lg["qty_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        rv = lg["rev_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        cells = pa.table(
            {
                "pr": pa.array(opr[hit], pa.int64()),
                "mo": pa.array(omo[hit], pa.int64()),
                "n_orders": pa.array(np.ones(int(hit.sum()), np.int64)),
                "n_lines": pa.array(nl[hit]),
                "sum_qty": pa.array(qt[hit]),
                "revenue_floor": pa.array(rv[hit]),
            }
        )
        g = cells.group_by(["pr", "mo"], use_threads=False).aggregate(
            [
                ("n_orders", "sum"),
                ("n_lines", "sum"),
                ("sum_qty", "sum"),
                ("revenue_floor", "sum"),
            ]
        )
        return g.rename_columns(
            ["pr", "mo", "n_orders", "n_lines", "sum_qty", "revenue_floor"]
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "order_month": pa.array([], pa.timestamp("us")),
                    "n_orders": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "sum_qty": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["pr", "mo"], use_threads=False).aggregate(
            [
                ("n_orders", "sum"),
                ("n_lines", "sum"),
                ("sum_qty", "sum"),
                ("revenue_floor", "sum"),
            ]
        )
        pi = pa.array(
            g["pr"].combine_chunks().to_numpy(zero_copy_only=False), pa.int64()
        )
        mo = g["mo"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderpriority": prs.take(pi),
                "order_month": _month_ts(mo),
                "n_orders": pc.cast(g["n_orders_sum"], pa.int64()),
                "n_lines": pc.cast(g["n_lines_sum"], pa.int64()),
                "sum_qty": pc.cast(g["sum_qty_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["revenue_floor_sum"], pa.int64()),
            }
        )

    both = lines.map_batches(line_partial, batch_format="pyarrow").union(
        ords.map_batches(order_partial, batch_format="pyarrow")
    )
    cells = hash_partition_merge(both, "k", join_fold, k=_rel_k(sf_dir, "lineitem"))
    return hash_partition_merge(cells, "pr", merge, k=1)


def _copartition_attach(
    fact: "Dataset", dim: "Dataset", fold, k: int
) -> Dataset:
    """Role-tagged union co-partition (the order_fulfillment shape): both
    streams hash-partition by the shared int64 key column ``k``so each
    partition holds a key's dim row(s) AND fact partials; ``fold`` settles
    the join + reduction in place.  This is the scale answer for
    FACT >< DIM when the dim GROWS WITH THE CORPUS (customers, suppliers,
    parts all scale with SF in TPC-H — at 100 TB none of them is a
    broadcastable small side; only fixed-cardinality satellites like
    nation/region compose at the driver)."""
    return hash_partition_merge(fact.union(dim), "k", fold, k=k)


def segment_sales(sf_dir: str) -> Dataset:
    """R3: market-segment sales — per (c_mktsegment, order year): order
    count and floored order-value total — the customer >< orders join.

    Scale shape: customers GROW WITH THE CORPUS (SF x 150k: billions of
    rows at 100 TB), so the dim is NOT broadcast — both streams
    co-partition by CUSTKEY (the R2 role-union shape) with orders
    pre-reduced to (custkey, year) partials per batch; only the distinct
    SEGMENT VALUE list (a handful of strings) broadcasts as an exact
    rank.  Per-partition attach is one searchsorted; output partials are
    O(segments x years)."""
    segs: list[str] = sorted(
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_mktsegment"])
        .unique("c_mktsegment")
    )
    seg_arr = pa.array(segs, pa.string())

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        code = pc.cast(pc.index_in(b["c_mktsegment"], value_set=seg_arr), pa.int64())
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "seg": code,
                "yr": pa.array(np.zeros(n, np.int64)),
                "n": pa.array(np.zeros(n, np.int64)),
                "tp": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        yr = ts_us.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "yr": pa.array(yr),
                "tp": pc.cast(pc.floor(b["o_totalprice"]), pa.int64()),
            }
        )
        g = t.group_by(["k", "yr"], use_threads=False).aggregate(
            [("tp", "count"), ("tp", "sum")]
        )
        g = g.rename_columns(["k", "yr", "n", "tp"])
        return g.append_column(
            "seg", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "seg", "yr", "n", "tp"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "seg": pa.array([], pa.int64()),
                "yr": pa.array([], pa.int64()),
                "n_orders": pa.array([], pa.int64()),
                "sum_total_floor": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["seg"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dseg = d["seg"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        cells = pa.table(
            {
                "seg": pa.array(dseg[pos][hit], pa.int64()),
                "yr": pc.cast(f["yr"], pa.int64()).filter(pa.array(hit)),
                "n_orders": pc.cast(f["n"], pa.int64()).filter(pa.array(hit)),
                "sum_total_floor": pc.cast(f["tp"], pa.int64()).filter(
                    pa.array(hit)
                ),
            }
        )
        g = cells.group_by(["seg", "yr"], use_threads=False).aggregate(
            [("n_orders", "sum"), ("sum_total_floor", "sum")]
        )
        return g.rename_columns(["seg", "yr", "n_orders", "sum_total_floor"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "order_year": pa.array([], pa.timestamp("us")),
                    "n_orders": pa.array([], pa.int64()),
                    "sum_total_floor": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["seg", "yr"], use_threads=False).aggregate(
            [("n_orders", "sum"), ("sum_total_floor", "sum")]
        )
        si = pa.array(
            g["seg"].combine_chunks().to_numpy(zero_copy_only=False), pa.int64()
        )
        yr = g["yr"].combine_chunks().to_numpy(zero_copy_only=False)
        us = yr.astype("datetime64[Y]").astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "c_mktsegment": seg_arr.take(si),
                "order_year": pa.array(us, pa.int64()).cast(pa.timestamp("us")),
                "n_orders": pc.cast(g["n_orders_sum"], pa.int64()),
                "sum_total_floor": pc.cast(g["sum_total_floor_sum"], pa.int64()),
            }
        )

    fact = ords.map_batches(fact_partial, batch_format="pyarrow")
    dim = cust.map_batches(dim_partial, batch_format="pyarrow")
    cells = _copartition_attach(fact, dim, fold, k=_rel_k(sf_dir, "orders"))
    return hash_partition_merge(cells, "seg", merge, k=1)


def region_revenue(sf_dir: str) -> Dataset:
    """R4: supplier-region revenue — per (region name, ship year): line
    count and floored revenue through lineitem -> supplier -> nation ->
    region.

    Scale shape: suppliers GROW WITH THE CORPUS (SF x 10k), so the
    supplier hop is a CO-PARTITIONED join by SUPPKEY (the R2 role-union
    shape) with lineitem pre-reduced to (suppkey, year) partials per
    batch; only the FIXED-cardinality satellites compose at the driver
    (nation 25 rows, region 5 — true broadcast material), collapsing to
    a nationkey -> region-rank map each supplier dim row carries."""
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    reg = rd.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    reg = reg.sort_values("r_name").reset_index(drop=True)
    names = pa.array(reg["r_name"].tolist(), pa.string())
    rk_to_rank = dict(zip(reg["r_regionkey"].astype(int), range(len(reg))))
    nk_rank = np.full(int(nat["n_nationkey"].max()) + 1, -1, np.int64)
    for nk, rk in zip(nat["n_nationkey"], nat["n_regionkey"]):
        nk_rank[int(nk)] = rk_to_rank[int(rk)]

    sup = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "supplier"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        nk = (
            pc.cast(b["s_nationkey"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["s_suppkey"], pa.int64()),
                "rg": pa.array(nk_rank[nk], pa.int64()),
                "yr": pa.array(np.zeros(n, np.int64)),
                "nl": pa.array(np.zeros(n, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["l_shipdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        yr = ts_us.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_suppkey"], pa.int64()),
                "yr": pa.array(yr),
                "rev": pc.cast(pc.floor(b["l_extendedprice"]), pa.int64()),
            }
        )
        g = t.group_by(["k", "yr"], use_threads=False).aggregate(
            [("rev", "count"), ("rev", "sum")]
        )
        g = g.rename_columns(["k", "yr", "nl", "rev"])
        return g.append_column(
            "rg", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "rg", "yr", "nl", "rev"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "rg": pa.array([], pa.int64()),
                "yr": pa.array([], pa.int64()),
                "n_lines": pa.array([], pa.int64()),
                "revenue_floor": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["rg"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        drg = d["rg"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        cells = pa.table(
            {
                "rg": pa.array(drg[pos][hit], pa.int64()),
                "yr": pc.cast(f["yr"], pa.int64()).filter(pa.array(hit)),
                "n_lines": pc.cast(f["nl"], pa.int64()).filter(pa.array(hit)),
                "revenue_floor": pc.cast(f["rev"], pa.int64()).filter(
                    pa.array(hit)
                ),
            }
        )
        g = cells.group_by(["rg", "yr"], use_threads=False).aggregate(
            [("n_lines", "sum"), ("revenue_floor", "sum")]
        )
        return g.rename_columns(["rg", "yr", "n_lines", "revenue_floor"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "r_name": pa.array([], pa.string()),
                    "ship_year": pa.array([], pa.timestamp("us")),
                    "n_lines": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["rg", "yr"], use_threads=False).aggregate(
            [("n_lines", "sum"), ("revenue_floor", "sum")]
        )
        ri = pa.array(
            g["rg"].combine_chunks().to_numpy(zero_copy_only=False), pa.int64()
        )
        yr = g["yr"].combine_chunks().to_numpy(zero_copy_only=False)
        us = yr.astype("datetime64[Y]").astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "r_name": names.take(ri),
                "ship_year": pa.array(us, pa.int64()).cast(pa.timestamp("us")),
                "n_lines": pc.cast(g["n_lines_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["revenue_floor_sum"], pa.int64()),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = sup.map_batches(dim_partial, batch_format="pyarrow")
    cells = _copartition_attach(fact, dim, fold, k=_rel_k(sf_dir, "lineitem"))
    return hash_partition_merge(cells, "rg", merge, k=1)


def brand_volume(sf_dir: str, top_k: int = 10) -> Dataset:
    """R5: top-k part brands by shipped quantity — per brand: exact Σqty,
    line count, and DISTINCT part count, top-k by quantity (ties brand
    ASC so the answer is unique).

    Scale shape: parts GROW WITH THE CORPUS (SF x 200k), so the part dim
    is NOT broadcast — both streams co-partition by PARTKEY (the R2
    role-union shape) with lineitem pre-reduced to per-part partials;
    only the distinct BRAND VALUE list broadcasts as an exact rank.  The
    per-partition fold decides each matched part's totals locally (so
    the DISTINCT part count is exact by co-location) and re-reduces to
    per-brand partials; k=1 merge takes the tie-broken top-k."""
    brands: list[str] = sorted(
        rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_brand"]).unique(
            "p_brand"
        )
    )
    b_arr = pa.array(brands, pa.string())

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        code = pc.cast(pc.index_in(b["p_brand"], value_set=b_arr), pa.int64())
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "br": code,
                "nl": pa.array(np.zeros(n, np.int64)),
                "qty": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "qty": pc.cast(b["l_quantity"], pa.int64()),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate(
            [("qty", "count"), ("qty", "sum")]
        )
        g = g.rename_columns(["k", "nl", "qty"])
        return g.append_column(
            "br", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "br", "nl", "qty"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "br": pa.array([], pa.int64()),
                "n_parts": pa.array([], pa.int64()),
                "n_lines": pa.array([], pa.int64()),
                "sum_qty": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["br"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        # collapse fact partials to one row per partkey (batches overlap)
        fg = f.group_by("k", use_threads=False).aggregate(
            [("nl", "sum"), ("qty", "sum")]
        )
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dbr = d["br"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        cells = pa.table(
            {
                "br": pa.array(dbr[pos][hit], pa.int64()),
                "n_parts": pa.array(np.ones(int(hit.sum()), np.int64)),
                "n_lines": pc.cast(fg["nl_sum"], pa.int64()).filter(
                    pa.array(hit)
                ),
                "sum_qty": pc.cast(fg["qty_sum"], pa.int64()).filter(
                    pa.array(hit)
                ),
            }
        )
        g = cells.group_by("br", use_threads=False).aggregate(
            [("n_parts", "sum"), ("n_lines", "sum"), ("sum_qty", "sum")]
        )
        return g.rename_columns(["br", "n_parts", "n_lines", "sum_qty"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "p_brand": pa.array([], pa.string()),
                    "n_parts": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "sum_qty": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("br", use_threads=False).aggregate(
            [("n_parts", "sum"), ("n_lines", "sum"), ("sum_qty", "sum")]
        )
        br = g["br"].combine_chunks().to_numpy(zero_copy_only=False)
        qt = g["sum_qty_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((br, -qt))[: min(top_k, len(br))]
        take = pa.array(order, pa.int64())
        return pa.table(
            {
                "p_brand": b_arr.take(pa.array(br[order], pa.int64())),
                "n_parts": pc.cast(g["n_parts_sum"], pa.int64()).take(take),
                "n_lines": pc.cast(g["n_lines_sum"], pa.int64()).take(take),
                "sum_qty": pc.cast(g["sum_qty_sum"], pa.int64()).take(take),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = part.map_batches(dim_partial, batch_format="pyarrow")
    cells = _copartition_attach(fact, dim, fold, k=_rel_k(sf_dir, "lineitem"))
    return hash_partition_merge(cells, "br", merge, k=1)


def order_count_distribution(sf_dir: str) -> Dataset:
    """R6: customer order-count distribution (the TPC-H Q13 shape) — for
    each order count c INCLUDING ZERO: how many customers placed exactly c
    orders.  The LEFT-OUTER-join histogram: customers with no orders must
    appear in the c=0 bucket, so an inner co-partitioned join (R2/R3) is
    not enough — the dim side drives.

    Scale shape: customers GROW WITH THE CORPUS (SF x 150k), so no side
    broadcasts.  Orders pre-reduce per batch to (custkey, n) partials; both
    streams co-partition by CUSTKEY (role-tagged union), where each
    customer key meets ALL its order partials in one task: the fold sums
    partials per key, attaches count-or-ZERO to every dim row via one
    searchsorted, and immediately re-reduces to (n_orders, n_customers)
    histogram partials — per-customer rows never leave their partition
    (E36's aggregate-of-aggregates shape on the customer axis).  One k=1
    merge sums O(max orders per customer) rows."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "n": pa.array(np.full(n, -1, np.int64)),  # -1 marks dim rows
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"k": pc.cast(b["o_custkey"], pa.int64())})
        g = t.group_by("k", use_threads=False).aggregate([("k", "count")])
        return g.rename_columns(["k", "n"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "n_orders": pa.array([], pa.int64()),
                "n_customers": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = n < 0
        dk = k[is_dim]
        if len(dk) == 0:
            return empty  # orders for custkeys absent from customer: dropped
        fk, fn = k[~is_dim], n[~is_dim]
        # collapse fact partials (batches overlap) to one total per key
        fku, inv = np.unique(fk, return_inverse=True)
        tot = np.zeros(len(fku), np.int64)
        np.add.at(tot, inv, fn)
        pos = np.searchsorted(fku, dk)
        pos_c = np.clip(pos, 0, max(len(fku) - 1, 0))
        cnt = np.where(
            (len(fku) > 0) & (fku[pos_c] == dk), tot[pos_c], 0
        ).astype(np.int64)
        vals, freq = np.unique(cnt, return_counts=True)
        return pa.table(
            {
                "n_orders": pa.array(vals, pa.int64()),
                "n_customers": pa.array(freq.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_orders": pa.array([], pa.int64()),
                    "n_customers": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("n_orders", use_threads=False).aggregate(
            [("n_customers", "sum")]
        )
        return g.rename_columns(["n_orders", "n_customers"])

    both = ords.map_batches(fact_partial, batch_format="pyarrow").union(
        cust.map_batches(dim_partial, batch_format="pyarrow")
    )
    cells = hash_partition_merge(both, "k", fold, k=_rel_k(sf_dir, "orders"))
    return hash_partition_merge(cells, "n_orders", merge, k=1)


def top_revenue_orders(
    sf_dir: str,
    segment: str | None = None,
    cutoff: str = "1998-01-01",
    top_k: int = 10,
) -> Dataset:
    """R7: top-k open-order revenue (the TPC-H Q3 shape) — among orders
    placed by SEGMENT customers BEFORE the cutoff, ranked by the floored
    revenue of their lines shipped AFTER the cutoff: the "largest
    unshipped orders" board.  Segment defaults to the alphabetically
    first c_mktsegment (the E51 convention — no hardcoded literal).
    Ties break by o_orderkey ASC so the answer is unique; revenue =
    Σ floor(l_extendedprice·(1−l_discount)) is exact int64 (floor is
    exact on doubles and both engines evaluate the identical IEEE
    product).

    Scale shape — two chained co-partitioned hops, each the R2
    role-union shape, with every predicate PUSHED TO THE READ:
      1. CUSTKEY hop: segment customers (filter at the read, keys only)
         × date-filtered orders → surviving (orderkey, orderdate) rows;
      2. ORDERKEY hop: shipdate-filtered lineitem pre-reduced to
         per-order floored-revenue partials × the hop-1 survivors; the
         fold attaches revenue, keeps its LOCAL top-k (one lexsort), so
         only O(partitions × k) candidate rows reach the k=1 merge.
    Customers, orders and lines all grow with the corpus; nothing
    broadcasts but the segment VALUE string."""
    if segment is None:
        segment = min(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]
            ).unique("c_mktsegment")
        )
    cutoff_ts = pa.scalar(np.datetime64(cutoff, "us").item(), pa.timestamp("us"))

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"],
        filter=(pc.field("c_mktsegment") == segment),
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") < cutoff_ts),
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") > cutoff_ts),
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    # ---- hop 1: orderkeys of segment customers' pre-cutoff orders ----
    def cust_partial(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "okey": pa.array(np.full(n, -1, np.int64)),  # dim marker
                "dt": pa.array(np.zeros(n, np.int64)),
            }
        )

    def order_row(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "okey": pc.cast(b["o_orderkey"], pa.int64()),
                "dt": b["o_orderdate"].cast(pa.int64()),
            }
        )

    def fold_cust(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"okey": pa.array([], pa.int64()), "dt": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        ok = t["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = ok < 0
        dk = np.unique(t["k"].combine_chunks().to_numpy(zero_copy_only=False)[is_dim])
        if len(dk) == 0:
            return empty
        f = t.filter(pa.array(~is_dim))
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk, fk), 0, len(dk) - 1)
        hit = dk[pos] == fk
        return pa.table(
            {
                "okey": pc.cast(f["okey"], pa.int64()).filter(pa.array(hit)),
                "dt": pc.cast(f["dt"], pa.int64()).filter(pa.array(hit)),
            }
        )

    surviving = hash_partition_merge(
        ords.map_batches(order_row, batch_format="pyarrow").union(
            cust.map_batches(cust_partial, batch_format="pyarrow")
        ),
        "k",
        fold_cust,
        k=_rel_k(sf_dir, "orders"),
    )

    # ---- hop 2: attach line revenue, local top-k per partition ----
    def line_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False)
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        t = pa.table(
            {
                "okey": pc.cast(b["l_orderkey"], pa.int64()),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by("okey", use_threads=False).aggregate([("rev", "sum")])
        g = g.rename_columns(["okey", "rev"])
        return g.append_column("dt", pa.array(np.zeros(g.num_rows, np.int64)))

    def order_survivor(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "okey": b["okey"],
                "rev": pa.array(np.full(n, -1, np.int64)),  # dim marker
                "dt": b["dt"],
            }
        )

    def fold_rev(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.int64()),
                "revenue_floor": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        rv = t["rev"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = rv < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fg = f.group_by("okey", use_threads=False).aggregate([("rev", "sum")])
        fk = fg["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        fr = fg["rev_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        dk = d["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        dd = d["dt"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s, dd_s = dk[order], dd[order]
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        ok, dt, rev = fk[hit], dd_s[pos][hit], fr[hit]
        keep = np.lexsort((ok, -rev))[: min(len(ok), top_k)]
        return pa.table(
            {
                "o_orderkey": pa.array(ok[keep], pa.int64()),
                "o_orderdate": pa.array(dt[keep], pa.int64()),
                "revenue_floor": pa.array(rev[keep], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                    "revenue_floor": pa.array([], pa.int64()),
                }
            )
        ok = t["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        dt = t["o_orderdate"].combine_chunks().to_numpy(zero_copy_only=False)
        rv = t["revenue_floor"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.lexsort((ok, -rv))[: min(len(ok), top_k)]
        return pa.table(
            {
                "o_orderkey": pa.array(ok[keep], pa.int64()),
                "o_orderdate": pa.array(dt[keep], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "revenue_floor": pa.array(rv[keep], pa.int64()),
            }
        )

    both = lines.map_batches(line_partial, batch_format="pyarrow").union(
        surviving.map_batches(order_survivor, batch_format="pyarrow")
    )
    cand = hash_partition_merge(both, "okey", fold_rev, k=_rel_k(sf_dir, "lineitem"))
    return hash_partition_merge(cand, "o_orderkey", merge, k=1)


def priority_discount_orders(sf_dir: str, min_discount: float = 0.09) -> Dataset:
    """R8: discounted-order priority board (the TPC-H Q4 EXISTS shape) —
    per o_orderpriority: orders with AT LEAST ONE line discounted above
    ``min_discount``.  A distributed SEMI-join: the fact side's job is
    pure existence, so everything narrows to distinct keys before any
    exchange (R2 counts lines; R8 dedupes them).

    Scale shape: the discount predicate is PUSHED TO THE READ (row
    groups without a qualifying line never leave storage) and each line
    batch collapses to its DISTINCT orderkeys (one np.unique — the
    information-theoretic floor of an existence probe); orders reduce to
    (orderkey, priority-rank).  Both streams co-partition by ORDERKEY;
    the fold re-dedupes the key set (batches overlap) and bincounts
    matched orders straight to per-priority partials.  Priority identity
    is an exact broadcast rank, never a hash (events_src_list
    convention)."""
    pr = _priority_rank(sf_dir)
    prs = pa.array(list(pr), pa.string())

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey"],
        filter=(pc.field("l_discount") > min_discount),
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def line_partial(b: pa.Table) -> pa.Table:
        ok = np.unique(
            pc.cast(b["l_orderkey"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pa.array(ok, pa.int64()),
                "pr": pa.array(np.full(len(ok), -1, np.int64)),
            }
        )

    def order_partial(b: pa.Table) -> pa.Table:
        code = pc.cast(pc.index_in(b["o_orderpriority"], value_set=prs), pa.int64())
        return pa.table({"k": pc.cast(b["o_orderkey"], pa.int64()), "pr": code})

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"pr": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        prc = t["pr"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        is_line = prc < 0
        lk = np.unique(k[is_line])
        if len(lk) == 0:
            return empty
        ok, opr = k[~is_line], prc[~is_line]
        pos = np.clip(np.searchsorted(lk, ok), 0, len(lk) - 1)
        hit = lk[pos] == ok
        cnt = np.bincount(opr[hit], minlength=len(prs)).astype(np.int64)
        keep = cnt > 0
        return pa.table(
            {
                "pr": pa.array(np.flatnonzero(keep).astype(np.int64)),
                "n": pa.array(cnt[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("pr", use_threads=False).aggregate([("n", "sum")])
        pi = pa.array(
            g["pr"].combine_chunks().to_numpy(zero_copy_only=False), pa.int64()
        )
        return pa.table(
            {
                "o_orderpriority": prs.take(pi),
                "n_orders": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    both = lines.map_batches(line_partial, batch_format="pyarrow").union(
        ords.map_batches(order_partial, batch_format="pyarrow")
    )
    cells = hash_partition_merge(both, "k", fold, k=_rel_k(sf_dir, "lineitem"))
    return hash_partition_merge(cells, "pr", merge, k=1)


def returned_revenue_customers(sf_dir: str, top_k: int = 20) -> Dataset:
    """R9: top-k customers by RETURNED revenue (the TPC-H Q10 shape) —
    the customers whose returned lines (l_returnflag = 'R') cost the
    most floored revenue Σfloor(extprice·(1−disc)), with c_name
    attached; ties break by c_custkey ASC so the answer is unique.
    Exact int64 (3-way join + ORDER BY LIMIT oracle).

    Scale shape — R7's two chained co-partitioned hops pointed the other
    way (fact → customer attribute attach instead of customer filter →
    fact): the returnflag predicate is PUSHED TO THE READ; line batches
    pre-reduce to per-order revenue partials; the ORDERKEY hop attaches
    each order's custkey and re-reduces to (custkey, revenue) partials;
    the CUSTKEY hop co-partitions those with the customer dim (which
    GROWS WITH THE CORPUS — never broadcast), sums per customer, attaches
    the name, and keeps its LOCAL top-k so only O(partitions × k)
    candidate rows reach the k=1 merge."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_returnflag") == "R"),
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )

    # ---- hop 1 (ORDERKEY): returned-line revenue -> per-custkey partials
    def line_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False)
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        t = pa.table(
            {"k": pc.cast(b["l_orderkey"], pa.int64()), "rev": pa.array(rev)}
        )
        g = t.group_by("k", use_threads=False).aggregate([("rev", "sum")])
        g = g.rename_columns(["k", "rev"])
        return g.append_column(
            "ck", pa.array(np.full(g.num_rows, -1, np.int64))
        )

    def order_row(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "rev": pa.array(np.zeros(n, np.int64)),
                "ck": pc.cast(b["o_custkey"], pa.int64()),
            }
        )

    def fold_order(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"k": pa.array([], pa.int64()), "rev": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        ck = t["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        is_order = ck >= 0
        o = t.filter(pa.array(is_order))
        l = t.filter(pa.array(~is_order))
        if o.num_rows == 0 or l.num_rows == 0:
            return empty
        lg = l.group_by("k", use_threads=False).aggregate([("rev", "sum")])
        lk = lg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        lr = lg["rev_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = o["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ok, kind="stable")
        ok_s = ok[order]
        ock = o["ck"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        pos = np.clip(np.searchsorted(ok_s, lk), 0, len(ok_s) - 1)
        hit = ok_s[pos] == lk
        cells = pa.table(
            {
                "k": pa.array(ock[pos][hit], pa.int64()),
                "rev": pa.array(lr[hit], pa.int64()),
            }
        )
        g = cells.group_by("k", use_threads=False).aggregate([("rev", "sum")])
        return g.rename_columns(["k", "rev"])

    per_cust = hash_partition_merge(
        lines.map_batches(line_partial, batch_format="pyarrow").union(
            ords.map_batches(order_row, batch_format="pyarrow")
        ),
        "k",
        fold_order,
        k=_rel_k(sf_dir, "lineitem"),
    )

    # ---- hop 2 (CUSTKEY): attach c_name, local top-k ----
    def fact_tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": b["k"],
                "rev": b["rev"],
                "nm": pa.array([""] * b.num_rows, pa.string()),
            }
        )

    def dim_tag(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "rev": pa.array(np.full(n, -1, np.int64)),
                "nm": b["c_name"],
            }
        )

    def fold_cust(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "c_name": pa.array([], pa.string()),
                "revenue_floor": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        rv = t["rev"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = rv < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fg = f.group_by("k", use_threads=False).aggregate([("rev", "sum")])
        fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fr = fg["rev_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dn = d["nm"].combine_chunks().take(pa.array(order, pa.int64()))
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        keep = np.lexsort((fk[hit], -fr[hit]))[: min(int(hit.sum()), top_k)]
        hidx = np.flatnonzero(hit)[keep]
        return pa.table(
            {
                "c_custkey": pa.array(fk[hidx], pa.int64()),
                "c_name": dn.take(pa.array(pos[hidx], pa.int64())),
                "revenue_floor": pa.array(fr[hidx], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "c_name": pa.array([], pa.string()),
                    "revenue_floor": pa.array([], pa.int64()),
                }
            )
        ck = t["c_custkey"].combine_chunks().to_numpy(zero_copy_only=False)
        rv = t["revenue_floor"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.lexsort((ck, -rv))[: min(len(ck), top_k)]
        take = pa.array(keep, pa.int64())
        return pa.table(
            {
                "c_custkey": pa.array(ck[keep], pa.int64()),
                "c_name": t["c_name"].combine_chunks().take(take),
                "revenue_floor": pa.array(rv[keep], pa.int64()),
            }
        )

    cand = hash_partition_merge(
        per_cust.map_batches(fact_tag, batch_format="pyarrow").union(
            cust.map_batches(dim_tag, batch_format="pyarrow")
        ),
        "k",
        fold_cust,
        k=_rel_k(sf_dir, "orders"),
    )
    return hash_partition_merge(cand, "c_custkey", merge, k=1)


def brand_supplier_diversity(sf_dir: str) -> Dataset:
    """R10: brand supplier diversity (the TPC-H Q16 question on the
    available tables) — per p_brand: the EXACT number of distinct
    suppliers that shipped its parts, plus total line count — the
    supply-chain-concentration board (one brand / one supplier = risk).
    Exact int64 (join + count(DISTINCT) oracle).

    Scale shape — a join feeding a distinct-cardinality, both sides
    corpus-sized, in two exchanges each NARROWER than its input:
      1. PARTKEY hop (R2 role-union): line batches pre-reduce to
         distinct (partkey, suppkey) pairs + per-part line counts; the
         fold attaches each part's brand rank and emits (brand, supp)
         membership rows + per-brand line-count partials;
      2. SUPPKEY hop: all copies of a supplier co-locate, so each
         (brand, supp) pair dedupes EXACTLY in its partition (E38's
         aggregate-of-aggregates rule) and re-reduces to per-brand
         (n_suppliers, n_lines) partials; k=1 merge.
    Only the brand VALUE list broadcasts (exact rank, never a hash)."""
    brands: list[str] = sorted(
        rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_brand"]).unique(
            "p_brand"
        )
    )
    b_arr = pa.array(brands, pa.string())

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        code = pc.cast(pc.index_in(b["p_brand"], value_set=b_arr), pa.int64())
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "br": code,
                "supp": pa.array(np.full(n, -1, np.int64)),
                "nl": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "supp": pc.cast(b["l_suppkey"], pa.int64()),
            }
        )
        g = t.group_by(["k", "supp"], use_threads=False).aggregate(
            [("supp", "count")]
        )
        g = g.rename_columns(["k", "supp", "nl"])
        return g.append_column(
            "br", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "br", "supp", "nl"])

    def fold_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "br": pa.array([], pa.int64()),
                "supp": pa.array([], pa.int64()),
                "nl": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        br = t["br"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = br >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dbr = d["br"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fs = f["supp"].combine_chunks().to_numpy(zero_copy_only=False)
        fn = f["nl"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        bb, ss, nn = dbr[pos][hit], fs[hit], fn[hit]
        # distinct (brand, supp) membership within this partition
        packed = bb * (1 << 40) + ss
        vals, first = np.unique(packed, return_index=True)
        memb = pa.table(
            {
                "br": pa.array(bb[first], pa.int64()),
                "supp": pa.array(ss[first], pa.int64()),
                "nl": pa.array(np.zeros(len(first), np.int64)),
            }
        )
        nlb = np.zeros(len(b_arr), np.int64)
        np.add.at(nlb, bb, nn)
        keep = nlb > 0
        cnts = pa.table(
            {
                "br": pa.array(np.flatnonzero(keep).astype(np.int64)),
                "supp": pa.array(np.full(int(keep.sum()), -1, np.int64)),
                "nl": pa.array(nlb[keep]),
            }
        )
        return pa.concat_tables([memb, cnts])

    def fold_supp(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "br": pa.array([], pa.int64()),
                "nsup": pa.array([], pa.int64()),
                "nl": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ss = t["supp"].combine_chunks().to_numpy(zero_copy_only=False)
        br = t["br"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = t["nl"].combine_chunks().to_numpy(zero_copy_only=False)
        is_cnt = ss < 0
        nl = np.zeros(len(b_arr), np.int64)
        np.add.at(nl, br[is_cnt], nn[is_cnt])
        bb, s2 = br[~is_cnt], ss[~is_cnt]
        packed = bb * (1 << 40) + s2
        ub = np.unique(packed) // (1 << 40)
        nsup = np.bincount(ub, minlength=len(b_arr)).astype(np.int64)
        keep = (nsup > 0) | (nl > 0)
        return pa.table(
            {
                "br": pa.array(np.flatnonzero(keep).astype(np.int64)),
                "nsup": pa.array(nsup[keep]),
                "nl": pa.array(nl[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "p_brand": pa.array([], pa.string()),
                    "n_suppliers": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("br", use_threads=False).aggregate(
            [("nsup", "sum"), ("nl", "sum")]
        )
        bi = pa.array(
            g["br"].combine_chunks().to_numpy(zero_copy_only=False), pa.int64()
        )
        return pa.table(
            {
                "p_brand": b_arr.take(bi),
                "n_suppliers": pc.cast(g["nsup_sum"], pa.int64()),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
            }
        )

    both = lines.map_batches(fact_partial, batch_format="pyarrow").union(
        part.map_batches(dim_partial, batch_format="pyarrow")
    )
    memb = hash_partition_merge(both, "k", fold_part, k=_rel_k(sf_dir, "lineitem"))
    per_brand = hash_partition_merge(
        memb, "supp", fold_supp, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(per_brand, "br", merge, k=1)


def local_supplier_volume(sf_dir: str) -> Dataset:
    """R11: local-supplier volume (the TPC-H Q5 shape) — per nation:
    line count + floored revenue Σfloor(extprice·(1−disc)) of lines
    where the ORDERING CUSTOMER and the SUPPLYING SUPPLIER share that
    nation — the join-with-a-cross-side-predicate that distinguishes Q5
    from every plain star join: the filter compares attributes arriving
    through two DIFFERENT join paths, so no single hop can apply it.
    Exact int64 (4-way join + nation-equality WHERE oracle).

    Scale shape — three chained co-partitioned hops, every stream
    pre-reduced before its exchange; the nation attributes ride as
    int64 columns until they MEET at the orderkey hop:
      1. CUSTKEY hop: customer (custkey → nationkey) × orders →
         (orderkey, cust_nation) rows;
      2. SUPPKEY hop: supplier (suppkey → nationkey) × lineitem
         pre-reduced per (suppkey, orderkey) → (orderkey, supp_nation,
         n_lines, rev) partials;
      3. ORDERKEY hop: both sides meet, the equality filter applies
         IN PLACE, and rows collapse to per-nation partials; k=1 merge.
    Customers, suppliers, orders and lines all grow with the corpus;
    only nation (25 rows, fixed) composes at the driver for the final
    name attach."""
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat = nat.sort_values("n_nationkey").reset_index(drop=True)
    names = pa.array(nat["n_name"].tolist(), pa.string())
    nk_pos = {int(k): i for i, k in enumerate(nat["n_nationkey"])}

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    sup = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "supplier"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    # ---- hop 1 (CUSTKEY): orderkey -> customer nation ----
    def cust_dim(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "okey": pa.array(np.full(n, -1, np.int64)),
                "nat": pc.cast(b["c_nationkey"], pa.int64()),
            }
        )

    def order_row(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "okey": pc.cast(b["o_orderkey"], pa.int64()),
                "nat": pa.array(np.full(n, -1, np.int64)),
            }
        )

    def fold_cust(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"okey": pa.array([], pa.int64()), "nat": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        ok = t["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = ok < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dn = d["nat"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        return pa.table(
            {
                "okey": pc.cast(f["okey"], pa.int64()).filter(pa.array(hit)),
                "nat": pa.array(dn[pos][hit], pa.int64()),
            }
        )

    cust_side = hash_partition_merge(
        ords.map_batches(order_row, batch_format="pyarrow").union(
            cust.map_batches(cust_dim, batch_format="pyarrow")
        ),
        "k",
        fold_cust,
        k=_rel_k(sf_dir, "orders"),
    )

    # ---- hop 2 (SUPPKEY): (orderkey, supplier nation, nl, rev) ----
    def supp_dim(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["s_suppkey"], pa.int64()),
                "okey": pa.array(np.full(n, -1, np.int64)),
                "nat": pc.cast(b["s_nationkey"], pa.int64()),
                "nl": pa.array(np.zeros(n, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def line_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False)
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_suppkey"], pa.int64()),
                "okey": pc.cast(b["l_orderkey"], pa.int64()),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by(["k", "okey"], use_threads=False).aggregate(
            [("rev", "count"), ("rev", "sum")]
        )
        g = g.rename_columns(["k", "okey", "nl", "rev"])
        return g.append_column(
            "nat", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "okey", "nat", "nl", "rev"])

    def fold_supp(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "okey": pa.array([], pa.int64()),
                "nat": pa.array([], pa.int64()),
                "nl": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ok = t["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = ok < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dn = d["nat"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        out = pa.table(
            {
                "okey": pc.cast(f["okey"], pa.int64()).filter(pa.array(hit)),
                "nat": pa.array(dn[pos][hit], pa.int64()),
                "nl": pc.cast(f["nl"], pa.int64()).filter(pa.array(hit)),
                "rev": pc.cast(f["rev"], pa.int64()).filter(pa.array(hit)),
            }
        )
        g = out.group_by(["okey", "nat"], use_threads=False).aggregate(
            [("nl", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["okey", "nat", "nl", "rev"])

    supp_side = hash_partition_merge(
        lines.map_batches(line_partial, batch_format="pyarrow").union(
            sup.map_batches(supp_dim, batch_format="pyarrow")
        ),
        "k",
        fold_supp,
        k=_rel_k(sf_dir, "lineitem"),
    )

    # ---- hop 3 (ORDERKEY): nations meet, equality filter in place ----
    def cust_tag(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "okey": b["okey"],
                "nat": b["nat"],
                "nl": pa.array(np.full(n, -1, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fold_order(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "nat": pa.array([], pa.int64()),
                "n_lines": pa.array([], pa.int64()),
                "revenue_floor": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        nl = t["nl"].combine_chunks().to_numpy(zero_copy_only=False)
        is_cust = nl < 0
        c = t.filter(pa.array(is_cust))
        f = t.filter(pa.array(~is_cust))
        if c.num_rows == 0 or f.num_rows == 0:
            return empty
        ck = c["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        ck_s = ck[order]
        cn = c["nat"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = f["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        fn = f["nat"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ck_s, fk), 0, len(ck_s) - 1)
        hit = (ck_s[pos] == fk) & (cn[pos] == fn)
        cells = pa.table(
            {
                "nat": pa.array(fn[hit], pa.int64()),
                "n_lines": pc.cast(f["nl"], pa.int64()).filter(pa.array(hit)),
                "revenue_floor": pc.cast(f["rev"], pa.int64()).filter(
                    pa.array(hit)
                ),
            }
        )
        g = cells.group_by("nat", use_threads=False).aggregate(
            [("n_lines", "sum"), ("revenue_floor", "sum")]
        )
        return g.rename_columns(["nat", "n_lines", "revenue_floor"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "n_lines": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("nat", use_threads=False).aggregate(
            [("n_lines", "sum"), ("revenue_floor", "sum")]
        )
        nk = g["nat"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = pa.array([nk_pos[int(k)] for k in nk], pa.int64())
        return pa.table(
            {
                "n_name": names.take(pos),
                "n_lines": pc.cast(g["n_lines_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["revenue_floor_sum"], pa.int64()),
            }
        )

    both = supp_side.union(
        cust_side.map_batches(cust_tag, batch_format="pyarrow")
    )
    cells = hash_partition_merge(both, "okey", fold_order, k=_rel_k(sf_dir, "lineitem"))
    return hash_partition_merge(cells, "nat", merge, k=1)


def promo_revenue_share(sf_dir: str) -> Dataset:
    """R12: promo revenue share (the TPC-H Q14 shape) — per ship month:
    line count, floored promo revenue (lines whose part is p_type =
    'PROMO'), floored total revenue, and the promo share in permille
    (1000·promo // total) — the classic "what fraction of this month's
    business came through the campaign" board, and the first R-series
    entry whose MEASURE depends on a DIM attribute (R5 groups by one;
    R12 conditions a sum on one), so the flag must physically travel to
    the fact rows before any aggregate can close.  Exact int64
    (lineitem >< part + CASE-sum oracle; permille floors via //).

    Scale shape — parts GROW WITH THE CORPUS, so the flag travels by
    CO-PARTITION, never broadcast (the R5 role-union shape): part rows
    reduce to (partkey, promo-bit); lineitem batches pre-reduce to
    (partkey, month, n, floored-rev) partials — the month axis is ~12
    values/year so the pre-reduce still collapses ~4:1 — and the
    per-partition fold attaches each part's bit with one searchsorted,
    re-reducing to (month, n, promo_rev, total_rev) partials; the k=1
    merge sums O(months) rows and emits the permille."""
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_type"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        promo = pc.cast(pc.equal(b["p_type"], "PROMO"), pa.int64())
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "pr": promo,  # dim role: 0/1 promo bit
                "m": pa.array(np.zeros(n, np.int64)),
                "nl": pa.array(np.zeros(n, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        ts_us = (
            b["l_shipdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "m": pa.array(_month_id(ts_us)),
                "nl": pa.array(np.ones(len(rev), np.int64)),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by(["k", "m"], use_threads=False).aggregate(
            [("nl", "sum"), ("rev", "sum")]
        )
        g = g.rename_columns(["k", "m", "nl", "rev"])
        return g.append_column(
            "pr", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "pr", "m", "nl", "rev"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "m": pa.array([], pa.int64()),
                "nl": pa.array([], pa.int64()),
                "prev": pa.array([], pa.int64()),
                "trev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["pr"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fg = f.group_by(["k", "m"], use_threads=False).aggregate(
            [("nl", "sum"), ("rev", "sum")]
        )
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dpr = d["pr"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        rev = pc.cast(fg["rev_sum"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        promo_bit = dpr[pos]
        cells = pa.table(
            {
                "m": fg["m"].filter(pa.array(hit)),
                "nl": pc.cast(fg["nl_sum"], pa.int64()).filter(pa.array(hit)),
                "prev": pa.array((rev * promo_bit)[hit]),
                "trev": pa.array(rev[hit]),
            }
        )
        g = cells.group_by("m", use_threads=False).aggregate(
            [("nl", "sum"), ("prev", "sum"), ("trev", "sum")]
        )
        return g.rename_columns(["m", "nl", "prev", "trev"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "month": pa.array([], pa.timestamp("us")),
                    "n_lines": pa.array([], pa.int64()),
                    "promo_rev": pa.array([], pa.int64()),
                    "total_rev": pa.array([], pa.int64()),
                    "promo_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("m", use_threads=False).aggregate(
            [("nl", "sum"), ("prev", "sum"), ("trev", "sum")]
        )
        mm = g["m"].combine_chunks().to_numpy(zero_copy_only=False)
        pr = g["prev_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        tr = g["trev_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "month": _month_ts(mm),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
                "promo_rev": pa.array(pr),
                "total_rev": pa.array(tr),
                "promo_permille": pa.array(
                    (1000 * pr) // np.maximum(tr, 1)
                ),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = part.map_batches(dim_partial, batch_format="pyarrow")
    cells = _copartition_attach(fact, dim, fold, k=_rel_k(sf_dir, "lineitem"))
    return hash_partition_merge(cells, "m", merge, k=1)


def top_supplier_revenue(
    sf_dir: str,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
    top_k: int = 10,
) -> Dataset:
    """R13: top suppliers by windowed revenue (the TPC-H Q15 shape) — the
    top_k suppliers by floored revenue Σfloor(extprice·(1−disc)) over
    lines SHIPPED inside [start, end), with s_name attached; ties break
    by s_suppkey ASC and a 1-based rank rides along so the answer is
    unique.  Exact int64 (windowed GROUP BY + row_number LIMIT oracle).

    Scale shape — R9's two-sided discipline pointed at the supplier dim:
    the ship-date window is PUSHED TO THE READ (row groups outside the
    quarter never leave storage — at a 7-year retention that is ~24x
    less I/O than filtering after); line batches pre-reduce to
    per-suppkey (n, rev) partials; suppliers GROW WITH THE CORPUS so the
    name attaches by SUPPKEY CO-PARTITION (never broadcast), where each
    partition also keeps only its LOCAL top-k (counts are final
    in-partition by co-location, so local top-k is a valid combiner) and
    O(partitions × k) candidate rows reach the k=1 rank merge."""
    import datetime as _dt

    lo = _dt.datetime.fromisoformat(start)
    hi = _dt.datetime.fromisoformat(end)

    sup = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        override_num_blocks=_rel_k(sf_dir, "supplier"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(lo, pa.timestamp("us")))
            & (pc.field("l_shipdate") < pa.scalar(hi, pa.timestamp("us")))
        ),
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["s_suppkey"], pa.int64()),
                "name": b["s_name"],
                "nl": pa.array(np.full(n, -1, np.int64)),  # dim role
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_suppkey"], pa.int64()),
                "nl": pa.array(np.ones(len(rev), np.int64)),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate(
            [("nl", "sum"), ("rev", "sum")]
        )
        g = g.rename_columns(["k", "nl", "rev"])
        return g.append_column(
            "name", pa.array([""] * g.num_rows, pa.string())
        ).select(["k", "name", "nl", "rev"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.array([], pa.int64()),
                "name": pa.array([], pa.string()),
                "nl": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["nl"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fg = f.group_by("k", use_threads=False).aggregate(
            [("nl", "sum"), ("rev", "sum")]
        )
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dnames = d["name"].combine_chunks().take(
            pa.array(order, pa.int64())
        )
        fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, max(len(dk_s) - 1, 0))
        hit = dk_s[pos] == fk
        rev = pc.cast(fg["rev_sum"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        nl = pc.cast(fg["nl_sum"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        fk_h, rev_h, nl_h = fk[hit], rev[hit], nl[hit]
        pos_h = pos[hit]
        keep = np.lexsort((fk_h, -rev_h))[: min(top_k, len(fk_h))]
        return pa.table(
            {
                "k": pa.array(fk_h[keep], pa.int64()),
                "name": dnames.take(pa.array(pos_h[keep], pa.int64())),
                "nl": pa.array(nl_h[keep], pa.int64()),
                "rev": pa.array(rev_h[keep], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "s_suppkey": pa.array([], pa.int64()),
                    "s_name": pa.array([], pa.string()),
                    "n_lines": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        kk = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = t["rev"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.lexsort((kk, -rev))[: min(top_k, len(kk))]
        take = pa.array(keep, pa.int64())
        return pa.table(
            {
                "s_suppkey": pa.array(kk[keep], pa.int64()),
                "s_name": t["name"].combine_chunks().take(take),
                "n_lines": t["nl"].combine_chunks().take(take),
                "revenue_floor": pa.array(rev[keep], pa.int64()),
                "rank": pa.array(
                    np.arange(1, len(keep) + 1, dtype=np.int64)
                ),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = sup.map_batches(dim_partial, batch_format="pyarrow")
    cells = _copartition_attach(fact, dim, fold, k=_rel_k(sf_dir, "supplier"))
    return hash_partition_merge(cells, "k", merge, k=1)


def large_orders(
    sf_dir: str, min_qty: int = 120, top_k: int = 20
) -> Dataset:
    """R14: large-order drill-down (the TPC-H Q18 shape) — the top_k
    orders by total line quantity among orders with Σqty ≥ min_qty, with
    the ordering customer's name attached (qty DESC, orderkey ASC,
    1-based rank — unique answer).  The HAVING-over-a-join shape: the
    filter is on an AGGREGATE of the fact table, so no read-time
    predicate can apply it — it must close after the per-order fold.
    Exact int64 (HAVING + 3-way join + row_number LIMIT oracle;
    o_totalprice floors to int64, quantities cast exactly).

    Scale shape — two chained co-partitioned hops, a local top-k
    combiner between them:
      1. ORDERKEY hop: line batches pre-reduce to per-order (n, qty)
         partials; orders ride as (orderkey, custkey, date, floored
         total); all an order's lines co-locate, so Σqty is FINAL in
         partition — the HAVING filter and a LOCAL top-k both apply
         there, and only O(partitions × k) candidates continue;
      2. CUSTKEY hop: candidates co-partition with the customer dim
         (which GROWS WITH THE CORPUS — never broadcast) for the name
         attach; the k=1 merge re-ranks the surviving candidates."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )

    def fact_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "qty": pc.cast(b["l_quantity"], pa.int64()),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate([("qty", "sum")])
        g = g.rename_columns(["k", "qty"])
        n = g.num_rows
        return pa.table(
            {
                "k": g["k"],
                "ck": pa.array(np.full(n, -1, np.int64)),  # fact role
                "dt": pa.array(np.zeros(n, np.int64)),
                "tot": pa.array(np.zeros(n, np.int64)),
                "qty": g["qty"],
            }
        )

    def order_partial(b: pa.Table) -> pa.Table:
        tot = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "ck": pc.cast(b["o_custkey"], pa.int64()),
                "dt": pc.cast(b["o_orderdate"], pa.int64()),
                "tot": pa.array(tot),
                "qty": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def fold1(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.array([], pa.int64()),
                "name": pa.array([], pa.string()),
                "okey": pa.array([], pa.int64()),
                "dt": pa.array([], pa.int64()),
                "tot": pa.array([], pa.int64()),
                "qty": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fg = f.group_by("k", use_threads=False).aggregate([("qty", "sum")])
        fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        qty = pc.cast(fg["qty_sum"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        big = qty >= min_qty
        fk, qty = fk[big], qty[big]
        if len(fk) == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        fk, qty, pos = fk[hit], qty[hit], pos[hit]
        keep = np.lexsort((fk, -qty))[: min(top_k, len(fk))]
        take_d = pa.array(order[pos[keep]], pa.int64())
        return pa.table(
            {
                "k": d["ck"].combine_chunks().take(take_d),  # custkey
                "name": pa.array([""] * len(keep), pa.string()),
                "okey": pa.array(fk[keep], pa.int64()),
                "dt": d["dt"].combine_chunks().take(take_d),
                "tot": d["tot"].combine_chunks().take(take_d),
                "qty": pa.array(qty[keep], pa.int64()),
            }
        )

    def cust_partial(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "name": b["c_name"],
                "okey": pa.array(np.full(n, -1, np.int64)),  # dim role
                "dt": pa.array(np.zeros(n, np.int64)),
                "tot": pa.array(np.zeros(n, np.int64)),
                "qty": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fold2(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "ck": pa.array([], pa.int64()),
                "name": pa.array([], pa.string()),
                "okey": pa.array([], pa.int64()),
                "dt": pa.array([], pa.int64()),
                "tot": pa.array([], pa.int64()),
                "qty": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, max(len(dk_s) - 1, 0))
        hit = dk_s[pos] == fk
        take_f = pa.array(np.flatnonzero(hit), pa.int64())
        take_d = pa.array(order[pos[hit]], pa.int64())
        return pa.table(
            {
                "ck": pa.array(fk[hit], pa.int64()),
                "name": d["name"].combine_chunks().take(take_d),
                "okey": f["okey"].combine_chunks().take(take_f),
                "dt": f["dt"].combine_chunks().take(take_f),
                "tot": f["tot"].combine_chunks().take(take_f),
                "qty": f["qty"].combine_chunks().take(take_f),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "c_name": pa.array([], pa.string()),
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                    "total_floor": pa.array([], pa.int64()),
                    "sum_qty": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        ok = t["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        qty = t["qty"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.lexsort((ok, -qty))[: min(top_k, len(ok))]
        take = pa.array(keep, pa.int64())
        return pa.table(
            {
                "c_custkey": t["ck"].combine_chunks().take(take),
                "c_name": t["name"].combine_chunks().take(take),
                "o_orderkey": pa.array(ok[keep], pa.int64()),
                "o_orderdate": t["dt"]
                .combine_chunks()
                .take(take)
                .cast(pa.timestamp("us")),
                "total_floor": t["tot"].combine_chunks().take(take),
                "sum_qty": pa.array(qty[keep], pa.int64()),
                "rank": pa.array(
                    np.arange(1, len(keep) + 1, dtype=np.int64)
                ),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = orders.map_batches(order_partial, batch_format="pyarrow")
    cand = _copartition_attach(fact, dim, fold1, k=_rel_k(sf_dir, "lineitem"))
    cdim = cust.map_batches(cust_partial, batch_format="pyarrow")
    named = _copartition_attach(
        cand, cdim, fold2, k=_rel_k(sf_dir, "customer")
    )
    return hash_partition_merge(named, "okey", merge, k=1)


def nation_trade_volume(sf_dir: str) -> Dataset:
    """R15: bilateral trade volume (the TPC-H Q7 shape) — per (supplier
    nation, customer nation, ship year) with the two nations DIFFERENT:
    line count + floored revenue Σfloor(extprice·(1−disc)) — the
    cross-border complement of R11 (same three-hop machinery, the
    cross-side predicate flipped from equality to inequality, and the
    result keyed by the nation PAIR instead of collapsing onto one
    side).  Exact int64 (4-way join + <> WHERE + year GROUP BY oracle).

    Scale shape — R11's three chained co-partitioned hops verbatim, with
    the ship YEAR riding the supplier-side partials from the first
    pre-reduce on; the pair axis multiplies the output domain
    (nations² × years — still driver-tiny), never the exchanged rows:
      1. CUSTKEY hop: customer (custkey → nationkey) × orders →
         (orderkey, cust_nation);
      2. SUPPKEY hop: supplier × lineitem pre-reduced per (suppkey,
         orderkey, year) → (orderkey, supp_nation, year, nl, rev);
      3. ORDERKEY hop: nations meet, the INEQUALITY filter applies in
         place, rows collapse to (snat, cnat, year) partials; k=1
         merge attaches both names from the 25-row broadcast."""
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat = nat.sort_values("n_nationkey").reset_index(drop=True)
    names = pa.array(nat["n_name"].tolist(), pa.string())
    nk_pos = {int(k): i for i, k in enumerate(nat["n_nationkey"])}

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    sup = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "supplier"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_suppkey",
            "l_shipdate",
            "l_extendedprice",
            "l_discount",
        ],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    # ---- hop 1 (CUSTKEY): orderkey -> customer nation ----
    def cust_dim(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "okey": pa.array(np.full(n, -1, np.int64)),
                "nat": pc.cast(b["c_nationkey"], pa.int64()),
            }
        )

    def order_row(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "okey": pc.cast(b["o_orderkey"], pa.int64()),
                "nat": pa.array(np.full(n, -1, np.int64)),
            }
        )

    def fold_cust(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"okey": pa.array([], pa.int64()), "nat": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        ok = t["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = ok < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dn = d["nat"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        return pa.table(
            {
                "okey": pc.cast(f["okey"], pa.int64()).filter(pa.array(hit)),
                "nat": pa.array(dn[pos][hit], pa.int64()),
            }
        )

    cust_side = hash_partition_merge(
        ords.map_batches(order_row, batch_format="pyarrow").union(
            cust.map_batches(cust_dim, batch_format="pyarrow")
        ),
        "k",
        fold_cust,
        k=_rel_k(sf_dir, "orders"),
    )

    # ---- hop 2 (SUPPKEY): (orderkey, supp nation, year, nl, rev) ----
    def supp_dim(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["s_suppkey"], pa.int64()),
                "okey": pa.array(np.full(n, -1, np.int64)),
                "nat": pc.cast(b["s_nationkey"], pa.int64()),
                "yr": pa.array(np.zeros(n, np.int64)),
                "nl": pa.array(np.zeros(n, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def line_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        ts_us = (
            b["l_shipdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        yr = (
            ts_us.astype("datetime64[us]")
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        t = pa.table(
            {
                "k": pc.cast(b["l_suppkey"], pa.int64()),
                "okey": pc.cast(b["l_orderkey"], pa.int64()),
                "yr": pa.array(yr),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by(["k", "okey", "yr"], use_threads=False).aggregate(
            [("rev", "count"), ("rev", "sum")]
        )
        g = g.rename_columns(["k", "okey", "yr", "nl", "rev"])
        return g.append_column(
            "nat", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "okey", "nat", "yr", "nl", "rev"])

    def fold_supp(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "okey": pa.array([], pa.int64()),
                "nat": pa.array([], pa.int64()),
                "yr": pa.array([], pa.int64()),
                "nl": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ok = t["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = ok < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dn = d["nat"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        out = pa.table(
            {
                "okey": pc.cast(f["okey"], pa.int64()).filter(pa.array(hit)),
                "nat": pa.array(dn[pos][hit], pa.int64()),
                "yr": pc.cast(f["yr"], pa.int64()).filter(pa.array(hit)),
                "nl": pc.cast(f["nl"], pa.int64()).filter(pa.array(hit)),
                "rev": pc.cast(f["rev"], pa.int64()).filter(pa.array(hit)),
            }
        )
        g = out.group_by(["okey", "nat", "yr"], use_threads=False).aggregate(
            [("nl", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["okey", "nat", "yr", "nl", "rev"])

    supp_side = hash_partition_merge(
        lines.map_batches(line_partial, batch_format="pyarrow").union(
            sup.map_batches(supp_dim, batch_format="pyarrow")
        ),
        "k",
        fold_supp,
        k=_rel_k(sf_dir, "lineitem"),
    )

    # ---- hop 3 (ORDERKEY): nations meet; inequality filter in place ----
    def cust_tag(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "okey": b["okey"],
                "nat": b["nat"],
                "yr": pa.array(np.zeros(n, np.int64)),
                "nl": pa.array(np.full(n, -1, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fold_order(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "snat": pa.array([], pa.int64()),
                "cnat": pa.array([], pa.int64()),
                "yr": pa.array([], pa.int64()),
                "nl": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        nl = t["nl"].combine_chunks().to_numpy(zero_copy_only=False)
        is_cust = nl < 0
        c = t.filter(pa.array(is_cust))
        f = t.filter(pa.array(~is_cust))
        if c.num_rows == 0 or f.num_rows == 0:
            return empty
        ck = c["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        ck_s = ck[order]
        cn = c["nat"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = f["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        fn = f["nat"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ck_s, fk), 0, len(ck_s) - 1)
        hit = (ck_s[pos] == fk) & (cn[pos] != fn)  # cross-border only
        cells = pa.table(
            {
                "snat": pa.array(fn[hit], pa.int64()),
                "cnat": pa.array(cn[pos][hit], pa.int64()),
                "yr": pc.cast(f["yr"], pa.int64()).filter(pa.array(hit)),
                "nl": pc.cast(f["nl"], pa.int64()).filter(pa.array(hit)),
                "rev": pc.cast(f["rev"], pa.int64()).filter(pa.array(hit)),
            }
        )
        g = cells.group_by(["snat", "cnat", "yr"], use_threads=False).aggregate(
            [("nl", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["snat", "cnat", "yr", "nl", "rev"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "supp_nation": pa.array([], pa.string()),
                    "cust_nation": pa.array([], pa.string()),
                    "l_year": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["snat", "cnat", "yr"], use_threads=False).aggregate(
            [("nl", "sum"), ("rev", "sum")]
        )
        sn = g["snat"].combine_chunks().to_numpy(zero_copy_only=False)
        cn = g["cnat"].combine_chunks().to_numpy(zero_copy_only=False)
        spos = pa.array([nk_pos[int(k)] for k in sn], pa.int64())
        cpos = pa.array([nk_pos[int(k)] for k in cn], pa.int64())
        return pa.table(
            {
                "supp_nation": names.take(spos),
                "cust_nation": names.take(cpos),
                "l_year": pc.cast(g["yr"], pa.int64()),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    both = supp_side.union(
        cust_side.map_batches(cust_tag, batch_format="pyarrow")
    )
    cells = hash_partition_merge(
        both, "okey", fold_order, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "snat", merge, k=1)


BANDED_ARMS: tuple[tuple[str, int, int], ...] = (
    ("Brand#1", 1, 11),
    ("Brand#2", 10, 20),
    ("Brand#3", 20, 30),
)


def banded_revenue(
    sf_dir: str, arms: tuple[tuple[str, int, int], ...] = BANDED_ARMS
) -> Dataset:
    """R16: banded disjunctive-predicate revenue (the TPC-H Q19 shape) —
    per arm (brand, qty-band): line count + floored revenue of lines
    whose part matches the arm's BRAND and whose quantity falls in the
    arm's BAND — the OR-of-ANDs predicate that spans BOTH join sides
    (brand lives on the part, quantity on the line), so no single-table
    filter and no post-join conjunction can express it; one dense row
    per arm ALWAYS.  Exact int64 (disjunctive CASE join oracle).

    Scale shape — R12's co-partition with the predicate DECOMPOSED: the
    quantity test is line-local so each line batch pre-reduces to
    (partkey, band-mask, n, rev) partials (a line can satisfy several
    arms' bands — the mask keeps them all); parts reduce to (partkey,
    brand-arm); the per-partition fold attaches the arm with one
    searchsorted and keeps rows whose mask BIT matches their part's arm
    — the conjunction closes exactly where the two sides meet; k=1
    merge sums O(arms) rows and densifies."""
    brands = pa.array([a[0] for a in arms], pa.string())

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        arm = pc.cast(pc.index_in(b["p_brand"], value_set=brands), pa.int64())
        arm = pc.fill_null(arm, -2)  # parts outside every arm
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "arm": arm,  # >= -2 marks the dim role
                "mask": pa.array(np.zeros(n, np.int64)),
                "nl": pa.array(np.zeros(n, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        qty = b["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        mask = np.zeros(len(qty), np.int64)
        for i, (_br, lo, hi) in enumerate(arms):
            mask |= ((qty >= lo) & (qty <= hi)).astype(np.int64) << i
        keep = mask > 0  # lines in no band never leave the batch
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )[keep]
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)[
            keep
        ]
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()).filter(
                    pa.array(keep)
                ),
                "mask": pa.array(mask[keep]),
                "nl": pa.array(np.ones(int(keep.sum()), np.int64)),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by(["k", "mask"], use_threads=False).aggregate(
            [("nl", "sum"), ("rev", "sum")]
        )
        g = g.rename_columns(["k", "mask", "nl", "rev"])
        return g.append_column(
            "arm", pa.array(np.full(g.num_rows, -3, np.int64))  # fact role
        ).select(["k", "arm", "mask", "nl", "rev"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "arm": pa.array([], pa.int64()),
                "nl": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["arm"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= -2
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        darm = d["arm"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        arm = darm[pos]
        mask = f["mask"].combine_chunks().to_numpy(zero_copy_only=False)
        hit = (
            (dk_s[pos] == fk)
            & (arm >= 0)
            & ((mask >> np.maximum(arm, 0)) & 1).astype(bool)
        )
        cells = pa.table(
            {
                "arm": pa.array(arm[hit], pa.int64()),
                "nl": pc.cast(f["nl"], pa.int64()).filter(pa.array(hit)),
                "rev": pc.cast(f["rev"], pa.int64()).filter(pa.array(hit)),
            }
        )
        g = cells.group_by("arm", use_threads=False).aggregate(
            [("nl", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["arm", "nl", "rev"])

    def merge(t: pa.Table) -> pa.Table:
        nl = np.zeros(len(arms), np.int64)
        rev = np.zeros(len(arms), np.int64)
        if t.num_rows:
            g = t.group_by("arm", use_threads=False).aggregate(
                [("nl", "sum"), ("rev", "sum")]
            )
            aa = g["arm"].combine_chunks().to_numpy(zero_copy_only=False)
            nl[aa] = g["nl_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            rev[aa] = g["rev_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "p_brand": brands,
                "qty_lo": pa.array([a[1] for a in arms], pa.int64()),
                "qty_hi": pa.array([a[2] for a in arms], pa.int64()),
                "n_lines": pa.array(nl),
                "revenue_floor": pa.array(rev),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = part.map_batches(dim_partial, batch_format="pyarrow")
    cells = _copartition_attach(fact, dim, fold, k=_rel_k(sf_dir, "lineitem"))
    return hash_partition_merge(cells, "arm", merge, k=1)


def market_share(
    sf_dir: str, region: str = "AMERICA", nation: str = "NATION_1"
) -> Dataset:
    """R17: supplier market share (the TPC-H Q8 shape) — per order year,
    over lines bought by CUSTOMERS of ``region``: total floored revenue,
    the slice supplied by SUPPLIERS of ``nation``, and the share in
    permille — "how much of that market do our suppliers hold", the
    share-of-a-join dual of R12 (there the measure splits on a part
    attribute; here on an attribute of the OTHER side of the same
    order).  Exact int64 (4-way join + region IN-filter + CASE-sum +
    year GROUP BY oracle).

    Scale shape — R15's three co-partitioned hops with the REGION
    filter pushed into the first dim partial (customers outside the
    region never enter the exchange — at 5 regions that is ~80% of the
    customer dim gone before any shuffle) and the order YEAR riding the
    customer side (Q8 groups by ORDER date, not ship date):
      1. CUSTKEY hop: region-filtered customers × orders →
         (orderkey, year);
      2. SUPPKEY hop: suppliers reduced to a nation BIT × lineitem
         pre-reduced per (suppkey, orderkey) → (orderkey, bit, rev);
      3. ORDERKEY hop: the semi-join closes (only region orders
         survive), rows collapse to (year, total, nation_rev)
         partials; k=1 merge emits the permille."""
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = rd.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    rk = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    region_nations = set(
        int(k) for k in nat.loc[nat["n_regionkey"] == rk, "n_nationkey"]
    )
    xkey = int(nat.loc[nat["n_name"] == nation, "n_nationkey"].iloc[0])

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    sup = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "supplier"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    rn_arr = pa.array(sorted(region_nations), pa.int64())

    # ---- hop 1 (CUSTKEY): region orders -> (orderkey, year) ----
    def cust_dim(b: pa.Table) -> pa.Table:
        keep = pc.is_in(pc.cast(b["c_nationkey"], pa.int64()), value_set=rn_arr)
        kept = b.filter(keep)
        n = kept.num_rows
        return pa.table(
            {
                "k": pc.cast(kept["c_custkey"], pa.int64()),
                "okey": pa.array(np.full(n, -1, np.int64)),
                "yr": pa.array(np.zeros(n, np.int64)),
            }
        )

    def order_row(b: pa.Table) -> pa.Table:
        ts_us = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        yr = (
            ts_us.astype("datetime64[us]")
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        return pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "okey": pc.cast(b["o_orderkey"], pa.int64()),
                "yr": pa.array(yr),
            }
        )

    def fold_cust(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"okey": pa.array([], pa.int64()), "yr": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        ok = t["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = ok < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = np.sort(d["k"].combine_chunks().to_numpy(zero_copy_only=False))
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk, fk), 0, len(dk) - 1)
        hit = dk[pos] == fk  # semi-join: region customers only
        return pa.table(
            {
                "okey": pc.cast(f["okey"], pa.int64()).filter(pa.array(hit)),
                "yr": pc.cast(f["yr"], pa.int64()).filter(pa.array(hit)),
            }
        )

    cust_side = hash_partition_merge(
        ords.map_batches(order_row, batch_format="pyarrow").union(
            cust.map_batches(cust_dim, batch_format="pyarrow")
        ),
        "k",
        fold_cust,
        k=_rel_k(sf_dir, "orders"),
    )

    # ---- hop 2 (SUPPKEY): (orderkey, nation bit, rev) ----
    def supp_dim(b: pa.Table) -> pa.Table:
        n = b.num_rows
        xb = pc.cast(
            pc.equal(pc.cast(b["s_nationkey"], pa.int64()), xkey), pa.int64()
        )
        return pa.table(
            {
                "k": pc.cast(b["s_suppkey"], pa.int64()),
                "okey": pa.array(np.full(n, -1, np.int64)),
                "xb": xb,
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def line_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_suppkey"], pa.int64()),
                "okey": pc.cast(b["l_orderkey"], pa.int64()),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by(["k", "okey"], use_threads=False).aggregate(
            [("rev", "sum")]
        )
        g = g.rename_columns(["k", "okey", "rev"])
        return g.append_column(
            "xb", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "okey", "xb", "rev"])

    def fold_supp(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "okey": pa.array([], pa.int64()),
                "xb": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ok = t["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = ok < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dx = d["xb"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        out = pa.table(
            {
                "okey": pc.cast(f["okey"], pa.int64()).filter(pa.array(hit)),
                "xb": pa.array(dx[pos][hit], pa.int64()),
                "rev": pc.cast(f["rev"], pa.int64()).filter(pa.array(hit)),
            }
        )
        g = out.group_by(["okey", "xb"], use_threads=False).aggregate(
            [("rev", "sum")]
        )
        return g.rename_columns(["okey", "xb", "rev"])

    supp_side = hash_partition_merge(
        lines.map_batches(line_partial, batch_format="pyarrow").union(
            sup.map_batches(supp_dim, batch_format="pyarrow")
        ),
        "k",
        fold_supp,
        k=_rel_k(sf_dir, "lineitem"),
    )

    # ---- hop 3 (ORDERKEY): semi-join on region orders; year attaches ----
    def cust_tag(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "okey": b["okey"],
                "xb": pa.array(np.full(n, -9, np.int64)),  # cust role
                "rev": b["yr"],  # year rides the rev lane
            }
        )

    def fold_order(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "yr": pa.array([], pa.int64()),
                "tot": pa.array([], pa.int64()),
                "xrev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        xb = t["xb"].combine_chunks().to_numpy(zero_copy_only=False)
        is_cust = xb == -9
        c = t.filter(pa.array(is_cust))
        f = t.filter(pa.array(~is_cust))
        if c.num_rows == 0 or f.num_rows == 0:
            return empty
        ck = c["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        ck_s = ck[order]
        cyr = c["rev"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = f["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        fx = f["xb"].combine_chunks().to_numpy(zero_copy_only=False)
        frev = f["rev"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ck_s, fk), 0, len(ck_s) - 1)
        hit = ck_s[pos] == fk
        cells = pa.table(
            {
                "yr": pa.array(cyr[pos][hit], pa.int64()),
                "tot": pa.array(frev[hit], pa.int64()),
                "xrev": pa.array((frev * fx)[hit], pa.int64()),
            }
        )
        g = cells.group_by("yr", use_threads=False).aggregate(
            [("tot", "sum"), ("xrev", "sum")]
        )
        return g.rename_columns(["yr", "tot", "xrev"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_year": pa.array([], pa.int64()),
                    "total_rev": pa.array([], pa.int64()),
                    "nation_rev": pa.array([], pa.int64()),
                    "share_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("yr", use_threads=False).aggregate(
            [("tot", "sum"), ("xrev", "sum")]
        )
        tot = g["tot_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        xr = g["xrev_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_year": pc.cast(g["yr"], pa.int64()),
                "total_rev": pa.array(tot),
                "nation_rev": pa.array(xr),
                "share_permille": pa.array(
                    (1000 * xr) // np.maximum(tot, 1)
                ),
            }
        )

    both = supp_side.union(
        cust_side.map_batches(cust_tag, batch_format="pyarrow")
    )
    cells = hash_partition_merge(
        both, "okey", fold_order, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "yr", merge, k=1)


def lapsed_customers(sf_dir: str, cutoff: str = "2000-01-01") -> Dataset:
    """R18: lapsed-customer board (the TPC-H Q22 anti-join shape,
    churn-flavored) — per nation: customers, customers LAPSED (last
    order strictly before ``cutoff``, or never ordered at all — the
    NOT-EXISTS lane), and the lapsed customers' floored account-balance
    total — "how much balance sits with customers we have lost"; one
    dense row per nation ALWAYS.  Exact int64 (LEFT JOIN max-orderdate +
    CASE oracle).

    Scale shape — the co-partitioned ANTI/semi join: orders pre-reduce
    per batch to per-custkey LAST-order partials (max is the combiner,
    so the exchange carries one row per (batch, custkey), never
    orders); customers ride as (custkey, nation, floored bal) dim rows;
    the CUSTKEY hop settles each customer's true last order — or its
    ABSENCE, decidable only under co-location — and reduces straight to
    per-nation partials; the k=1 merge densifies over the 25-row nation
    broadcast."""
    import datetime as _dt

    cut_us = int(
        np.datetime64(_dt.datetime.fromisoformat(cutoff), "us").astype(
            np.int64
        )
    )

    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat = nat.sort_values("n_nationkey").reset_index(drop=True)
    names = pa.array(nat["n_name"].tolist(), pa.string())
    nkeys = nat["n_nationkey"].to_numpy().astype(np.int64)
    nk_pos = {int(k): i for i, k in enumerate(nkeys)}

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def cust_dim(b: pa.Table) -> pa.Table:
        bal = np.floor(
            b["c_acctbal"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "nat": pc.cast(b["c_nationkey"], pa.int64()),
                "bal": pa.array(bal),
                "m": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        )

    def order_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "m": b["o_orderdate"].cast(pa.int64()),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate([("m", "max")])
        g = g.rename_columns(["k", "m"])
        n = g.num_rows
        return pa.table(
            {
                "k": g["k"],
                "nat": pa.array(np.full(n, -1, np.int64)),  # fact role
                "bal": pa.array(np.zeros(n, np.int64)),
                "m": g["m"],
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "nat": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "lapsed": pa.array([], pa.int64()),
                "lbal": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["nat"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        if d.num_rows == 0:
            return empty
        f = t.filter(pa.array(~is_dim))
        # collapse order partials to each custkey's true last order
        last = np.zeros(0, np.int64)
        fk = np.zeros(0, np.int64)
        if f.num_rows:
            fg = f.group_by("k", use_threads=False).aggregate([("m", "max")])
            fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
            last = fg["m_max"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.argsort(fk, kind="stable")
            fk, last = fk[order], last[order]
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dn = d["nat"].combine_chunks().to_numpy(zero_copy_only=False)
        db = d["bal"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(fk):
            pos = np.clip(np.searchsorted(fk, dk), 0, len(fk) - 1)
            has = fk[pos] == dk
            lastd = np.where(has, last[pos], np.int64(-(1 << 62)))
        else:
            lastd = np.full(len(dk), -(1 << 62), np.int64)
        lapsed = (lastd < cut_us).astype(np.int64)  # never-ordered lapses too
        cells = pa.table(
            {
                "nat": pa.array(dn, pa.int64()),
                "n": pa.array(np.ones(len(dn), np.int64)),
                "lapsed": pa.array(lapsed),
                "lbal": pa.array(lapsed * db),
            }
        )
        g = cells.group_by("nat", use_threads=False).aggregate(
            [("n", "sum"), ("lapsed", "sum"), ("lbal", "sum")]
        )
        return g.rename_columns(["nat", "n", "lapsed", "lbal"])

    def merge(t: pa.Table) -> pa.Table:
        n = np.zeros(len(nkeys), np.int64)
        lap = np.zeros(len(nkeys), np.int64)
        lbal = np.zeros(len(nkeys), np.int64)
        if t.num_rows:
            g = t.group_by("nat", use_threads=False).aggregate(
                [("n", "sum"), ("lapsed", "sum"), ("lbal", "sum")]
            )
            kk = g["nat"].combine_chunks().to_numpy(zero_copy_only=False)
            idx = np.array([nk_pos[int(x)] for x in kk], np.int64)
            n[idx] = g["n_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            lap[idx] = g["lapsed_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            lbal[idx] = g["lbal_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "n_name": names,
                "n_customers": pa.array(n),
                "n_lapsed": pa.array(lap),
                "lapsed_bal_floor": pa.array(lbal),
            }
        )

    fact = ords.map_batches(order_partial, batch_format="pyarrow")
    dim = cust.map_batches(cust_dim, batch_format="pyarrow")
    cells = _copartition_attach(fact, dim, fold, k=_rel_k(sf_dir, "customer"))
    return hash_partition_merge(cells, "nat", merge, k=1)


def ltv_digit_bands(sf_dir: str) -> Dataset:
    """R19: lifetime-value magnitude histogram — per DECIMAL-DIGIT count
    of each customer's floored lifetime revenue Σfloor(extprice·(1−disc))
    (digits = order of magnitude + 1; revenue 0 → 1 digit): customer
    count and that band's revenue total — the LTV distribution board a
    revenue team reads as "how many 5-figure customers do we have"
    (R9 names the top 20; R19 shapes the whole base).  Digit bands
    instead of log2/log10 floats so the boundary is EXACT (an integer
    compare against powers of ten, never a float log at 10^k); exact
    int64 (length(CAST(rev AS VARCHAR)) oracle).

    Scale shape — two chained co-partitioned pre-reduces (R9's path
    without the name attach): lineitem → per-order revenue partials →
    ORDERKEY hop attaches custkey and re-reduces to per-customer
    partials → CUSTKEY hop settles each customer's exact lifetime total
    and bincounts its digits IN PLACE — O(partitions × ~10) band rows
    reach the k=1 merge; the customer dim never ships (digits need no
    attribute)."""
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    # ---- hop 1 (ORDERKEY): per-order revenue -> custkey ----
    def line_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate([("rev", "sum")])
        g = g.rename_columns(["k", "rev"])
        return g.append_column(
            "ck", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "ck", "rev"])

    def order_dim(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "ck": pc.cast(b["o_custkey"], pa.int64()),
                "rev": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def fold_order(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"ck": pa.array([], pa.int64()), "rev": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        role = t["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fg = f.group_by("k", use_threads=False).aggregate([("rev", "sum")])
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dck = d["ck"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        out = pa.table(
            {
                "ck": pa.array(dck[pos][hit], pa.int64()),
                "rev": pc.cast(fg["rev_sum"], pa.int64()).filter(
                    pa.array(hit)
                ),
            }
        )
        g = out.group_by("ck", use_threads=False).aggregate([("rev", "sum")])
        return g.rename_columns(["ck", "rev"])

    cust_rev = hash_partition_merge(
        lines.map_batches(line_partial, batch_format="pyarrow").union(
            ords.map_batches(order_dim, batch_format="pyarrow")
        ),
        "k",
        fold_order,
        k=_rel_k(sf_dir, "lineitem"),
    )

    # ---- hop 2 (CUSTKEY): exact lifetime totals -> digit bands ----
    POW10 = np.array([10**i for i in range(1, 19)], np.int64)

    def fold_cust(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "dg": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "rev": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("ck", use_threads=False).aggregate([("rev", "sum")])
        rev = g["rev_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        digits = np.searchsorted(POW10, rev, side="right") + 1
        cells = pa.table(
            {
                "dg": pa.array(digits.astype(np.int64)),
                "n": pa.array(np.ones(len(rev), np.int64)),
                "rev": pa.array(rev),
            }
        )
        g2 = cells.group_by("dg", use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        return g2.rename_columns(["dg", "n", "rev"])

    # width keyed on orders (the customer dim itself never ships here)
    bands = hash_partition_merge(
        cust_rev, "ck", fold_cust, k=_rel_k(sf_dir, "orders")
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_digits": pa.array([], pa.int64()),
                    "n_customers": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("dg", use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        return pa.table(
            {
                "n_digits": pc.cast(g["dg"], pa.int64()),
                "n_customers": pc.cast(g["n_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(bands, "dg", merge, k=1)


def fulfillment_latency(
    sf_dir: str, qs: tuple[int, ...] = (500, 900)
) -> Dataset:
    """R20: fulfillment-latency quantiles — per order priority: line
    count + discrete p50/p90 of each line's floor-day ship delay
    (l_shipdate − o_orderdate) — the SLA distribution behind R2's
    volume board (R2 counts what shipped; R20 how LATE it shipped,
    priority by priority).  Exact int64 under the quantile_disc rank
    rule (epoch_us floor-div + quantile_disc oracle; priority identity
    is the exact broadcast rank).

    Scale shape — R2's co-partitioned ORDERKEY join with E81's
    bounded-domain histogram tail: line batches pre-reduce to
    (orderkey, ship_ts, n) cells (same-day lines of an order collapse);
    orders ride as (orderkey, priority-rank, orderdate); the fold's
    searchsorted attach turns cells into (priority, gap_days, n)
    partials — the value domain is the RETENTION WINDOW in days, never
    the line count — and every priority's quantiles read off one cumsum
    in the k=1 merge."""
    pris = _priority_rank(sf_dir)
    pri_arr = pa.array(list(pris), pa.string())

    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def order_dim(b: pa.Table) -> pa.Table:
        pr = pc.cast(
            pc.index_in(b["o_orderpriority"], value_set=pri_arr), pa.int64()
        )
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "pr": pr,
                "t": b["o_orderdate"].cast(pa.int64()),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),  # dim role
            }
        )

    def line_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "t": b["l_shipdate"].cast(pa.int64()),
            }
        )
        g = t.group_by(["k", "t"], use_threads=False).aggregate(
            [("t", "count")]
        )
        g = g.rename_columns(["k", "t", "n"])
        return g.append_column(
            "pr", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "pr", "t", "n"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "pr": pa.array([], pa.int64()),
                "gap": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        nn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        is_fact = nn > 0
        d = t.filter(pa.array(~is_fact))
        f = t.filter(pa.array(is_fact))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dpr = d["pr"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        dt = d["t"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        ft = f["t"].combine_chunks().to_numpy(zero_copy_only=False)
        fn = f["n"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        gap = (ft[hit] - dt[pos][hit]) // 86_400_000_000
        cells = pa.table(
            {
                "pr": pa.array(dpr[pos][hit], pa.int64()),
                "gap": pa.array(gap, pa.int64()),
                "n": pa.array(fn[hit], pa.int64()),
            }
        )
        g = cells.group_by(["pr", "gap"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["pr", "gap", "n"])

    names = tuple(f"p{q // 10}_days" for q in qs)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "n_lines": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in names},
                }
            )
        g = t.group_by(["pr", "gap"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        pp = g["pr"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = g["gap"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((vv, pp))
        p2, v2, f2 = pp[order], vv[order], ff[order]
        news = np.empty(len(order), dtype=bool)
        news[0] = True
        news[1:] = p2[1:] != p2[:-1]
        starts = np.flatnonzero(news)
        ends = np.append(starts[1:], len(order))
        out = {"p": [], "n": [], **{c: [] for c in names}}
        for a, b in zip(starts, ends):
            vals, freq = v2[a:b], f2[a:b]
            nt = int(freq.sum())
            cum = np.cumsum(freq)
            out["p"].append(int(p2[a]))
            out["n"].append(nt)
            for q, c in zip(qs, names):
                thr = (nt * q + 999) // 1000
                out[c].append(int(vals[np.searchsorted(cum, thr)]))
        return pa.table(
            {
                "o_orderpriority": pri_arr.take(
                    pa.array(out["p"], pa.int64())
                ),
                "n_lines": pa.array(out["n"], pa.int64()),
                **{c: pa.array(out[c], pa.int64()) for c in names},
            }
        )

    fact = lines.map_batches(line_partial, batch_format="pyarrow")
    dim = ords.map_batches(order_dim, batch_format="pyarrow")
    cells = _copartition_attach(fact, dim, fold, k=_rel_k(sf_dir, "lineitem"))
    return hash_partition_merge(cells, "pr", merge, k=1)


def order_gap_quantiles(
    sf_dir: str, qs: tuple[int, ...] = (500, 900)
) -> Dataset:
    """R21: repeat-order gap quantiles — over every customer's
    consecutive orders in (o_orderdate, o_orderkey) order: gap count +
    discrete p50/p90 of the floor-day gap — the purchase-cadence number
    behind R18's lapse cutoff (R18 applies a fixed threshold; R21 says
    what threshold the base's own rhythm justifies).  One row ALWAYS.
    Exact int64 under the quantile_disc rank rule (lag + quantile_disc
    oracle).

    Scale shape — E81's order-dependent machinery on the CUSTKEY axis:
    orders ship as narrow (custkey, date, orderkey) rows on ONE
    custkey-hash exchange; each partition lexsorts its complete
    customers once, adjacent same-customer gaps floor to DAYS and reduce
    to (gap, freq) partials — the value domain is the retention window
    in days; the k=1 merge reads both quantiles off one cumsum."""
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ck": pc.cast(b["o_custkey"], pa.int64()),
                "t": b["o_orderdate"].cast(pa.int64()),
                "o": pc.cast(b["o_orderkey"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"gap": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        ck = t["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t["o"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((oo, tt, ck))
        c2, t2 = ck[order], tt[order]
        same = c2[1:] == c2[:-1]
        if not same.any():
            return empty
        gap = ((t2[1:] - t2[:-1]) // 86_400_000_000)[same]
        vals, freq = np.unique(gap, return_counts=True)
        return pa.table(
            {
                "gap": pa.array(vals, pa.int64()),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    names = tuple(f"p{q // 10}_days" for q in qs)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_gaps": pa.array([0], pa.int64()),
                    **{c: pa.array([0], pa.int64()) for c in names},
                }
            )
        g = t.group_by("gap", use_threads=False).aggregate([("n", "sum")])
        vv = g["gap"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(vv, kind="stable")
        vv, ff = vv[order], ff[order]
        nt = int(ff.sum())
        cum = np.cumsum(ff)
        out = {"n_gaps": pa.array([nt], pa.int64())}
        for q, c in zip(qs, names):
            thr = (nt * q + 999) // 1000
            out[c] = pa.array(
                [int(vv[np.searchsorted(cum, thr)])], pa.int64()
            )
        return pa.table(out)

    narrowed = ords.map_batches(narrow, batch_format="pyarrow")
    cells = hash_partition_merge(
        narrowed, "ck", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "gap", merge, k=1)


def order_value_lines_gram(sf_dir: str) -> Dataset:
    """R22: order-value ↔ line-count Gram board — over orders with at
    least one line: n, Σx, Σy, Σxy, Σx², Σy² for x = floor(o_totalprice)
    and y = line count — the exact-int64 sufficient statistics of the
    value↔breadth correlation (Pearson off-line: does order value scale
    with line count, or do a few big-ticket single-line orders carry the
    book) — T67's zero-wide-exchange Gram pattern on the relational
    axis.  One row ALWAYS.  Exact int64 (SUM-of-products oracle; int64
    bound documented: x ≤ ~10⁶, x² ≤ 10¹², safe to ~9·10⁶ orders per
    partition-sum — the driver-scale tables are far below).

    Scale shape — ONE co-partitioned hop then pure counters: lineitem
    pre-reduces to per-order line counts; orders ride as (orderkey,
    floored total); the ORDERKEY hop settles each order's exact (x, y)
    and reduces IN PLACE to one 6-counter row per partition; k=1 sums."""
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def order_dim(b: pa.Table) -> pa.Table:
        x = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "x": pa.array(x),
                "y": pa.array(np.full(b.num_rows, -1, np.int64)),  # dim
            }
        )

    def line_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"k": pc.cast(b["l_orderkey"], pa.int64())})
        g = t.group_by("k", use_threads=False).aggregate([("k", "count")])
        g = g.rename_columns(["k", "y"])
        return g.append_column(
            "x", pa.array(np.zeros(g.num_rows, np.int64))
        ).select(["k", "x", "y"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "one": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sx": pa.array([], pa.int64()),
                "sy": pa.array([], pa.int64()),
                "sxy": pa.array([], pa.int64()),
                "sx2": pa.array([], pa.int64()),
                "sy2": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        yy = t["y"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = yy < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fg = f.group_by("k", use_threads=False).aggregate([("y", "sum")])
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dx = d["x"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fy = pc.cast(fg["y_sum"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        x, y = dx[pos][hit], fy[hit]
        return pa.table(
            {
                "one": pa.array([0], pa.int64()),
                "n": pa.array([int(hit.sum())], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
                "sx2": pa.array([int((x * x).sum())], pa.int64()),
                "sy2": pa.array([int((y * y).sum())], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        cols = ["n", "sx", "sy", "sxy", "sx2", "sy2"]
        out = {}
        for c, name in zip(
            cols, ["n_orders", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"]
        ):
            out[name] = pa.array(
                [int(pc.sum(t[c]).as_py() or 0) if t.num_rows else 0],
                pa.int64(),
            )
        return pa.table(out)

    fact = lines.map_batches(line_partial, batch_format="pyarrow")
    dim = ords.map_batches(order_dim, batch_format="pyarrow")
    cells = _copartition_attach(fact, dim, fold, k=_rel_k(sf_dir, "lineitem"))
    return hash_partition_merge(cells, "one", merge, k=1)


def discount_revenue(
    sf_dir: str,
    start: str = "1996-01-01",
    end: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: int = 24,
) -> Dataset:
    """R23: forgone-discount revenue (the TPC-H Q6 shape) — line count
    and floored Σ(extprice·discount) over lines shipped in [start, end)
    with discount in [disc_lo, disc_hi] and quantity < max_qty — "how
    much revenue would dropping these discounts recover", the purest
    READ-PREDICATE aggregate in the suite: every predicate column lives
    on the fact table, so the ENTIRE filter pushes to the parquet
    scanner (row groups failing any conjunct never leave storage) and
    what remains is one floor-sum.  One row ALWAYS.  Exact int64
    (filtered CASE-free SUM oracle).

    Scale shape — zero exchanges: filter at the read, one floored
    partial per batch, k=1 sum of O(batches) counter rows."""
    import datetime as _dt

    lo = _dt.datetime.fromisoformat(start)
    hi = _dt.datetime.fromisoformat(end)
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(lo, pa.timestamp("us")))
            & (pc.field("l_shipdate") < pa.scalar(hi, pa.timestamp("us")))
            & (pc.field("l_discount") >= disc_lo)
            & (pc.field("l_discount") <= disc_hi)
            & (pc.field("l_quantity") < max_qty)
        ),
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * dis).astype(np.int64)
        return pa.table(
            {
                "one": pa.array([0], pa.int64()),
                "n": pa.array([len(rev)], pa.int64()),
                "rev": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n = int(pc.sum(t["n"]).as_py() or 0) if t.num_rows else 0
        rev = int(pc.sum(t["rev"]).as_py() or 0) if t.num_rows else 0
        return pa.table(
            {
                "n_lines": pa.array([n], pa.int64()),
                "discount_rev_floor": pa.array([rev], pa.int64()),
            }
        )

    partials = lines.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "one", merge, k=1)


def monthly_customers(sf_dir: str) -> Dataset:
    """R24: monthly-active-customer curve — per order month: orders and
    DISTINCT ordering customers — the relational MAU (E62's stickiness
    numbers asked of the order book; orders/customers per month is the
    repeat-intensity a growth review opens with).  Exact int64
    (count(DISTINCT) oracle).

    Scale shape — E23's distinct-count discipline on the CUSTKEY axis
    with order counters riding the same exchange: per batch one lexsort
    dedupes to (month, custkey) pairs + per-(batch, month) counter rows;
    ONE custkey-hash exchange dedupes pairs exactly (a customer's months
    co-locate) and re-reduces to per-month (orders, customers) partials;
    k=1 merge of O(months) rows."""
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ck = pc.cast(b["o_custkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        mm = _month_id(ts_us)
        mv, mc = np.unique(mm, return_counts=True)
        order = np.lexsort((mm, ck))
        c2, m2 = ck[order], mm[order]
        new = np.empty(len(order), dtype=bool)
        if len(order):
            new[0] = True
            new[1:] = (c2[1:] != c2[:-1]) | (m2[1:] != m2[:-1])
        return pa.table(
            {
                # counter rows spread by month (ck = -1-month)
                "ck": pa.array(
                    np.concatenate([-1 - mv, c2[new]])
                ),
                "m": pa.array(np.concatenate([mv, m2[new]])),
                "n": pa.array(
                    np.concatenate(
                        [mc.astype(np.int64), np.zeros(int(new.sum()), np.int64)]
                    )
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "m": pa.array([], pa.int64()),
                    "no": pa.array([], pa.int64()),
                    "nc": pa.array([], pa.int64()),
                }
            )
        ck = t["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        mm = t["m"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        is_ctr = ck < 0
        ords_tbl = pa.table(
            {"m": pa.array(mm[is_ctr]), "no": pa.array(nn[is_ctr])}
        ).group_by("m", use_threads=False).aggregate([("no", "sum")])
        c2, m2 = ck[~is_ctr], mm[~is_ctr]
        order = np.lexsort((m2, c2))
        c2, m2 = c2[order], m2[order]
        new = np.empty(len(order), dtype=bool)
        if len(order):
            new[0] = True
            new[1:] = (c2[1:] != c2[:-1]) | (m2[1:] != m2[:-1])
        uv, uc = np.unique(m2[new], return_counts=True)
        a = pa.table(
            {
                "m": pc.cast(ords_tbl["m"], pa.int64()),
                "no": pc.cast(ords_tbl["no_sum"], pa.int64()),
                "nc": pa.array(
                    np.zeros(ords_tbl.num_rows, np.int64)
                ),
            }
        )
        b2 = pa.table(
            {
                "m": pa.array(uv, pa.int64()),
                "no": pa.array(np.zeros(len(uv), np.int64)),
                "nc": pa.array(uc.astype(np.int64)),
            }
        )
        return pa.concat_tables([a, b2])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "month": pa.array([], pa.timestamp("us")),
                    "n_orders": pa.array([], pa.int64()),
                    "n_customers": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("m", use_threads=False).aggregate(
            [("no", "sum"), ("nc", "sum")]
        )
        mm = g["m"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "month": _month_ts(mm),
                "n_orders": pc.cast(g["no_sum"], pa.int64()),
                "n_customers": pc.cast(g["nc_sum"], pa.int64()),
            }
        )

    partials = ords.map_batches(partial, batch_format="pyarrow")
    per_cust = hash_partition_merge(
        partials, "ck", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(per_cust, "m", merge, k=1)


def yearly_growth(sf_dir: str) -> Dataset:
    """R25: year-over-year order-book growth — per order year: orders,
    floored o_totalprice revenue, and the YoY revenue delta (first year
    → 0) — E53's dod/wow drift discipline on the relational axis, the
    one-line answer to "is the book growing".  Exact int64 (year GROUP
    BY + lag oracle).

    Scale shape — ZERO wide exchange: per batch one floor + one Arrow
    group_by reduce orders to (year, n, rev) partials over a ≤
    retention-years domain; the k=1 merge sums O(batches × years) rows
    and takes the lag over the tiny sorted year axis in place."""
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        yr = (
            ts_us.astype("datetime64[us]")
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        rev = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "yr": pa.array(yr),
                "n": pa.array(np.ones(len(yr), np.int64)),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by("yr", use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["yr", "n", "rev"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_year": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                    "yoy_delta": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("yr", use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        yy = g["yr"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        rr = g["rev_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(yy, kind="stable")
        yy, nn, rr = yy[order], nn[order], rr[order]
        delta = np.zeros(len(rr), np.int64)
        delta[1:] = rr[1:] - rr[:-1]
        return pa.table(
            {
                "o_year": pa.array(yy.astype(np.int64)),
                "n_orders": pa.array(nn.astype(np.int64)),
                "revenue_floor": pa.array(rr.astype(np.int64)),
                "yoy_delta": pa.array(delta),
            }
        )

    partials = ords.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "yr", merge, k=1)


def nation_top_customers(sf_dir: str, top_k: int = 3) -> Dataset:
    """R26: per-nation top customers by lifetime floored revenue
    Σfloor(extprice·(1−disc)) — the GROUPED top-k of R9's global board
    (every nation's podium, rank 1..k, ties → custkey ASC) with c_name
    attached.  Exact int64 (two-hop revenue chain + PARTITION BY
    row_number oracle).

    Scale shape — R19's two co-partitioned pre-reduce hops with R9's
    local-top-k combiner applied PER NATION: the CUSTKEY hop settles
    each customer's exact lifetime total AND its nation/name (dim rows
    co-partition — customers grow with the corpus, never broadcast), so
    each partition keeps only its local per-nation top-k and
    O(partitions × nations × k) candidates reach the k=1 rank merge;
    nation names attach from the 25-row broadcast."""
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat = nat.sort_values("n_nationkey").reset_index(drop=True)
    names = pa.array(nat["n_name"].tolist(), pa.string())
    nk_pos = {int(k): i for i, k in enumerate(nat["n_nationkey"])}

    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )

    # ---- hop 1 (ORDERKEY): per-customer revenue partials ----
    def line_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate([("rev", "sum")])
        g = g.rename_columns(["k", "rev"])
        return g.append_column(
            "ck", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "ck", "rev"])

    def order_dim(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "ck": pc.cast(b["o_custkey"], pa.int64()),
                "rev": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def fold_order(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.array([], pa.int64()),
                "name": pa.array([], pa.string()),
                "nat": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fg = f.group_by("k", use_threads=False).aggregate([("rev", "sum")])
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dck = d["ck"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        out = pa.table(
            {
                "k": pa.array(dck[pos][hit], pa.int64()),  # custkey
                "rev": pc.cast(fg["rev_sum"], pa.int64()).filter(
                    pa.array(hit)
                ),
            }
        )
        g = out.group_by("k", use_threads=False).aggregate([("rev", "sum")])
        g = g.rename_columns(["k", "rev"])
        n = g.num_rows
        return pa.table(
            {
                "k": g["k"],
                "name": pa.array([""] * n, pa.string()),
                "nat": pa.array(np.full(n, -1, np.int64)),  # fact role
                "rev": g["rev"],
            }
        )

    cust_rev = hash_partition_merge(
        lines.map_batches(line_partial, batch_format="pyarrow").union(
            ords.map_batches(order_dim, batch_format="pyarrow")
        ),
        "k",
        fold_order,
        k=_rel_k(sf_dir, "lineitem"),
    )

    # ---- hop 2 (CUSTKEY): totals + name/nation; local per-nation top-k ----
    def cust_dim(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "name": b["c_name"],
                "nat": pc.cast(b["c_nationkey"], pa.int64()),
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fold_cust(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "ck": pa.array([], pa.int64()),
                "name": pa.array([], pa.string()),
                "nat": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["nat"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fg = f.group_by("k", use_threads=False).aggregate([("rev", "sum")])
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = pc.cast(fg["rev_sum"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        fk_h, rev_h, pos_h = fk[hit], rev[hit], pos[hit]
        dnat = d["nat"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        nat_h = dnat[pos_h]
        # local per-nation top-k (totals are final by co-location)
        sel = np.lexsort((fk_h, -rev_h, nat_h))
        n2 = nat_h[sel]
        new = np.empty(len(sel), dtype=bool)
        if len(sel):
            new[0] = True
            new[1:] = n2[1:] != n2[:-1]
        gid = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        within = np.arange(len(sel)) - starts[gid]
        keep = sel[within < top_k]
        dnames = d["name"].combine_chunks().take(
            pa.array(order[pos_h[keep]], pa.int64())
        )
        return pa.table(
            {
                "ck": pa.array(fk_h[keep], pa.int64()),
                "name": dnames,
                "nat": pa.array(nat_h[keep], pa.int64()),
                "rev": pa.array(rev_h[keep], pa.int64()),
            }
        )

    cand = hash_partition_merge(
        cust_rev.union(cust.map_batches(cust_dim, batch_format="pyarrow")),
        "k",
        fold_cust,
        k=_rel_k(sf_dir, "customer"),
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "rank": pa.array([], pa.int64()),
                    "c_custkey": pa.array([], pa.int64()),
                    "c_name": pa.array([], pa.string()),
                    "revenue_floor": pa.array([], pa.int64()),
                }
            )
        ck = t["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        nt = t["nat"].combine_chunks().to_numpy(zero_copy_only=False)
        rv = t["rev"].combine_chunks().to_numpy(zero_copy_only=False)
        sel = np.lexsort((ck, -rv, nt))
        n2 = nt[sel]
        new = np.empty(len(sel), dtype=bool)
        new[0] = True
        new[1:] = n2[1:] != n2[:-1]
        gid = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        within = np.arange(len(sel)) - starts[gid]
        keep = sel[within < top_k]
        rank = (within[within < top_k] + 1).astype(np.int64)
        take = pa.array(keep, pa.int64())
        npos = pa.array([nk_pos[int(x)] for x in nt[keep]], pa.int64())
        return pa.table(
            {
                "n_name": names.take(npos),
                "rank": pa.array(rank),
                "c_custkey": pa.array(ck[keep], pa.int64()),
                "c_name": t["name"].combine_chunks().take(take),
                "revenue_floor": pa.array(rv[keep], pa.int64()),
            }
        )

    return hash_partition_merge(cand, "nat", merge, k=1)


def linenumber_profile(sf_dir: str) -> Dataset:
    """R27: line-position profile — per l_linenumber (the line's ordinal
    WITHIN its order): line count, exact Σqty, floored revenue — T84's
    positional-bias probe on the relational axis (position 1 exists for
    every order; the tail positions profile basket depth, and a measure
    drifting with position flags an entry-order artifact).  Exact int64
    (single-table GROUP BY oracle).

    Scale shape — ZERO wide exchange: one floor + one Arrow group_by
    per batch reduce lines to ≤ max-position partial rows; k=1 merge."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        t = pa.table(
            {
                "ln": pc.cast(b["l_linenumber"], pa.int64()),
                "n": pa.array(np.ones(len(rev), np.int64)),
                "qty": pc.cast(b["l_quantity"], pa.int64()),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by("ln", use_threads=False).aggregate(
            [("n", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["ln", "n", "qty", "rev"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "l_linenumber": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "sum_qty": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("ln", use_threads=False).aggregate(
            [("n", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        return pa.table(
            {
                "l_linenumber": pc.cast(g["ln"], pa.int64()),
                "n_lines": pc.cast(g["n_sum"], pa.int64()),
                "sum_qty": pc.cast(g["qty_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    partials = lines.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "ln", merge, k=1)


def status_year_matrix(sf_dir: str) -> Dataset:
    """R28: order-status × year matrix — per (o_orderstatus, order
    year): orders + floored o_totalprice revenue — the fulfillment-state
    drift board (a rising F share = the book is aging through; P stuck
    = a processing stall), completing the orders table's column
    coverage.  Exact int64 (two-key GROUP BY oracle).

    Scale shape — ZERO wide exchange: status is a tiny exact broadcast
    rank (the R2 priority convention), one floor + one bit-packed
    np.unique per batch reduce orders to (status, year, n, rev)
    partials over a ≤ statuses × years domain; k=1 merge."""
    stats = tuple(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet", columns=["o_orderstatus"]
            ).unique("o_orderstatus")
        )
    )
    st_arr = pa.array(list(stats), pa.string())

    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["o_orderstatus"], value_set=st_arr), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ts_us = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        yr = (
            ts_us.astype("datetime64[us]")
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        rev = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "st": pa.array(code),
                "yr": pa.array(yr),
                "n": pa.array(np.ones(len(yr), np.int64)),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by(["st", "yr"], use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["st", "yr", "n", "rev"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_orderstatus": pa.array([], pa.string()),
                    "o_year": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["st", "yr"], use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        return pa.table(
            {
                "o_orderstatus": st_arr.take(g["st"].combine_chunks()),
                "o_year": pc.cast(g["yr"], pa.int64()),
                "n_orders": pc.cast(g["n_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    partials = ords.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "st", merge, k=1)


def shipping_priority(
    sf_dir: str, segment: str = "BUILDING",
    cutoff: str = "1998-06-01", top_k: int = 10,
) -> Dataset:
    """R29: shipping-priority board (the TPC-H Q3 shape) — the top-k
    orders by floored unshipped revenue Σfloor(extprice·(1−disc)) among
    orders PLACED before the cutoff by customers of one market segment
    whose lines SHIP after it — the classic 3-way customer ⋈ orders ⋈
    lineitem chain where all three legs grow with the corpus and none
    can broadcast; ties break by o_orderkey ASC so the answer is
    unique.  Exact int64 (3-way join + ORDER BY LIMIT oracle).

    Scale shape — THREE chained co-partitioned hops, each narrower than
    its input: the segment and date predicates are PUSHED TO THE READS;
    the CUSTKEY hop semi-joins order rows against the segment's
    customers (customer GROWS WITH THE CORPUS — never broadcast); line
    batches pre-reduce to per-order floored-revenue partials; the
    ORDERKEY hop meets them with surviving orders, sums per order,
    attaches o_orderdate, and keeps its LOCAL top-k so only
    O(partitions × k) candidate rows reach the k=1 rank merge."""
    cut_us = int(np.datetime64(cutoff, "us").astype(np.int64))

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"],
        filter=(pc.field("c_mktsegment") == segment),
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") < pa.scalar(cut_us, pa.timestamp("us"))),
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") > pa.scalar(cut_us, pa.timestamp("us"))),
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    # ---- hop 1 (CUSTKEY): semi-join orders against segment customers ----
    def cust_row(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "ck": pc.cast(b["c_custkey"], pa.int64()),
                "ok": pa.array(np.full(n, -1, np.int64)),
                "od": pa.array(np.zeros(n, np.int64)),
            }
        )

    def order_row(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ck": pc.cast(b["o_custkey"], pa.int64()),
                "ok": pc.cast(b["o_orderkey"], pa.int64()),
                "od": b["o_orderdate"].cast(pa.int64()),
            }
        )

    def fold_cust(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"ok": pa.array([], pa.int64()), "od": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        ok = t["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        ck = t["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        seg = np.unique(ck[ok < 0])
        rows = ok >= 0
        if len(seg) == 0 or not rows.any():
            return empty
        pos = np.clip(np.searchsorted(seg, ck[rows]), 0, len(seg) - 1)
        hit = seg[pos] == ck[rows]
        keep = np.flatnonzero(rows)[hit]
        o = t.take(pa.array(keep, pa.int64()))
        return pa.table({"ok": o["ok"], "od": o["od"]})

    kept_orders = hash_partition_merge(
        cust.map_batches(cust_row, batch_format="pyarrow").union(
            ords.map_batches(order_row, batch_format="pyarrow")
        ),
        "ck",
        fold_cust,
        k=_rel_k(sf_dir, "orders"),
    )

    # ---- hop 2 (ORDERKEY): revenue partials meet surviving orders ----
    def line_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        t = pa.table(
            {"ok": pc.cast(b["l_orderkey"], pa.int64()), "rev": pa.array(rev)}
        )
        g = t.group_by("ok", use_threads=False).aggregate([("rev", "sum")])
        g = g.rename_columns(["ok", "rev"])
        return g.append_column(
            "od", pa.array(np.full(g.num_rows, -1, np.int64))
        )

    def surv_row(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ok": b["ok"],
                "rev": pa.array(np.zeros(b.num_rows, np.int64)),
                "od": b["od"],
            }
        )

    def fold_order(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "revenue_floor": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        od = t["od"].combine_chunks().to_numpy(zero_copy_only=False)
        is_order = od >= 0
        o = t.filter(pa.array(is_order))
        l = t.filter(pa.array(~is_order))
        if o.num_rows == 0 or l.num_rows == 0:
            return empty
        lg = l.group_by("ok", use_threads=False).aggregate([("rev", "sum")])
        lk = lg["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        lr = lg["rev_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        okk = o["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(okk, kind="stable")
        ok_s = okk[order]
        od_s = o["od"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        pos = np.clip(np.searchsorted(ok_s, lk), 0, len(ok_s) - 1)
        hit = ok_s[pos] == lk
        keys = lk[hit]
        revs = lr[hit]
        dates = od_s[pos][hit]
        # local top-k: revenue DESC, orderkey ASC
        sel = np.lexsort((keys, -revs))[:top_k]
        return pa.table(
            {
                "o_orderkey": pa.array(keys[sel], pa.int64()),
                "o_orderdate": pa.array(dates[sel], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "revenue_floor": pa.array(revs[sel], pa.int64()),
            }
        )

    candidates = hash_partition_merge(
        lines.map_batches(line_partial, batch_format="pyarrow").union(
            kept_orders.map_batches(surv_row, batch_format="pyarrow")
        ),
        "ok",
        fold_order,
        k=_rel_k(sf_dir, "lineitem"),
    )

    def rank_merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                    "revenue_floor": pa.array([], pa.int64()),
                }
            )
        keys = t["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        revs = t["revenue_floor"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        sel = np.lexsort((keys, -revs))[:top_k]
        return t.take(pa.array(sel, pa.int64()))

    return hash_partition_merge(
        candidates, "o_orderkey", rank_merge, k=1
    )


def small_qty_revenue(sf_dir: str) -> Dataset:
    """R30: small-quantity revenue board (the TPC-H Q17 question) — per
    p_brand: lines whose quantity is STRICTLY below one fifth of that
    part's average ordered quantity, and their floored revenue — the
    fragmented-order exposure a fulfillment planner prices against bulk
    discounts.  The per-part average is compared exactly in integers:
    qty < avg/5  ⇔  5·qty·cnt < Σqty (quantities are integral doubles),
    so no float division enters the predicate.  One dense row per brand
    ALWAYS.  Exact int64 (per-part aggregate join + integer-compare
    oracle).

    Scale shape — ONE wide exchange where Q17's correlated subquery
    would rescan: the brand axis is a tiny exact broadcast rank (25
    values — the R2 priority convention) but part itself GROWS WITH THE
    CORPUS, so (partkey, brand-code) rows ride the same PARTKEY
    hash-exchange as the narrow (partkey, qty, rev) line rows; each
    partition holds every line of its parts, decides each part's
    Σqty/cnt locally, filters its own lines with one vectorized
    compare, and folds straight to per-brand (n, rev) partials; k=1
    densifying merge."""
    brands = tuple(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/part.parquet", columns=["p_brand"]
            ).unique("p_brand")
        )
    )
    br_arr = pa.array(list(brands), pa.string())
    nb = len(brands)

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def part_row(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "pk": pc.cast(b["p_partkey"], pa.int64()),
                "q": pa.array(np.zeros(n, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
                "br": pc.cast(
                    pc.index_in(b["p_brand"], value_set=br_arr), pa.int64()
                ),
            }
        )

    def line_row(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        qty = b["l_quantity"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        return pa.table(
            {
                "pk": pc.cast(b["l_partkey"], pa.int64()),
                "q": pa.array(qty),
                "rev": pa.array(rev),
                "br": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "br": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        br = t["br"].combine_chunks().to_numpy(zero_copy_only=False)
        pk = t["pk"].combine_chunks().to_numpy(zero_copy_only=False)
        qq = t["q"].combine_chunks().to_numpy(zero_copy_only=False)
        rv = t["rev"].combine_chunks().to_numpy(zero_copy_only=False)
        is_part = br >= 0
        ppk = pk[is_part]
        pbr = br[is_part]
        lrows = ~is_part
        if not is_part.any() or not lrows.any():
            return empty
        porder = np.argsort(ppk, kind="stable")
        ppk_s, pbr_s = ppk[porder], pbr[porder]
        lpk, lq, lrev = pk[lrows], qq[lrows], rv[lrows]
        # per-part Σqty and line count, local to this partition
        u, inv = np.unique(lpk, return_inverse=True)
        sq = np.zeros(len(u), np.int64)
        np.add.at(sq, inv, lq)
        cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
        keep = 5 * lq * cnt[inv] < sq[inv]
        if not keep.any():
            return empty
        kpk, krev = lpk[keep], lrev[keep]
        pos = np.clip(np.searchsorted(ppk_s, kpk), 0, len(ppk_s) - 1)
        hit = ppk_s[pos] == kpk
        kbr = pbr_s[pos][hit]
        krev = krev[hit]
        n = np.bincount(kbr, minlength=nb).astype(np.int64)
        rev = np.zeros(nb, np.int64)
        np.add.at(rev, kbr, krev)
        live = np.flatnonzero(n)
        return pa.table(
            {
                "br": pa.array(live.astype(np.int64)),
                "n": pa.array(n[live]),
                "rev": pa.array(rev[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n = np.zeros(nb, np.int64)
        rev = np.zeros(nb, np.int64)
        if t.num_rows:
            g = t.group_by("br", use_threads=False).aggregate(
                [("n", "sum"), ("rev", "sum")]
            )
            bb = g["br"].combine_chunks().to_numpy(zero_copy_only=False)
            n[bb] = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            rev[bb] = g["rev_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "p_brand": br_arr,
                "n_lines": pa.array(n),
                "revenue_floor": pa.array(rev),
            }
        )

    both = parts.map_batches(part_row, batch_format="pyarrow").union(
        lines.map_batches(line_row, batch_format="pyarrow")
    )
    partials = hash_partition_merge(
        both, "pk", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(partials, "br", merge, k=1)


def rich_customer_activity(sf_dir: str) -> Dataset:
    """R31: top-balance cohort activity (the TPC-H Q22 decision inputs
    without its anti-join, which is vacuous on this generator — every
    customer orders) — per nation: customers whose floored account
    balance is STRICTLY above the global average, their floored balance
    mass, and their order count + floored order revenue — the
    wallet-share board ("does the money actually transact, and where").
    The global average is compared exactly in integers:
    bal > S/N ⇔ bal·N > S with bal = floor(c_acctbal), so no float
    division enters the predicate (R30's rule on the global axis).
    One dense row per nation ALWAYS.  Exact int64 (global-aggregate
    threshold + join oracle).

    Scale shape — a GLOBAL threshold that costs one tiny pre-pass, then
    ONE co-partitioned exchange: the (N, ΣBal) pair folds from
    per-batch partials to two driver ints (never the balances);
    customer rows filter to the rich cohort in the first narrow map
    (before anything shuffles) and ride the
    CUSTKEY hash-exchange with narrow (custkey, price) order rows;
    each partition joins locally and reduces to per-nation partials;
    nation names come from the 25-row broadcast; k=1 densifying
    merge."""
    cust_bal = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_acctbal"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )

    def bal_partial(b: pa.Table) -> pa.Table:
        bal = np.floor(
            b["c_acctbal"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(bal)], pa.int64()),
                "s": pa.array([int(bal.sum())], pa.int64()),
            }
        )

    tiny = cust_bal.map_batches(bal_partial, batch_format="pyarrow").take_all()
    n_tot = sum(r["n"] for r in tiny)
    s_tot = sum(r["s"] for r in tiny)

    nations = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()
    nations.sort(key=lambda r: r["n_nationkey"])
    nat_keys = np.array([r["n_nationkey"] for r in nations], np.int64)
    nat_names = pa.array([r["n_name"] for r in nations], pa.string())
    nn = len(nat_keys)

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def rich_row(b: pa.Table) -> pa.Table:
        bal = np.floor(
            b["c_acctbal"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        keep = bal * n_tot > s_tot
        t = b.filter(pa.array(keep))
        nk = np.searchsorted(
            nat_keys,
            t["c_nationkey"].combine_chunks().to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "ck": pc.cast(t["c_custkey"], pa.int64()),
                "nk": pa.array(nk.astype(np.int64)),
                "bal": pa.array(bal[keep]),
                "price": pa.array(np.full(t.num_rows, -1, np.int64)),
            }
        )

    def order_row(b: pa.Table) -> pa.Table:
        price = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        n = b.num_rows
        return pa.table(
            {
                "ck": pc.cast(b["o_custkey"], pa.int64()),
                "nk": pa.array(np.full(n, -1, np.int64)),
                "bal": pa.array(np.zeros(n, np.int64)),
                "price": pa.array(price),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "nk": pa.array([], pa.int64()),
                "nc": pa.array([], pa.int64()),
                "sb": pa.array([], pa.int64()),
                "no": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        nk = t["nk"].combine_chunks().to_numpy(zero_copy_only=False)
        ck = t["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        bal = t["bal"].combine_chunks().to_numpy(zero_copy_only=False)
        pr = t["price"].combine_chunks().to_numpy(zero_copy_only=False)
        is_cust = nk >= 0
        if not is_cust.any():
            return empty
        cck, cnk, cbal = ck[is_cust], nk[is_cust], bal[is_cust]
        corder = np.argsort(cck, kind="stable")
        cck_s, cnk_s = cck[corder], cnk[corder]
        nc = np.bincount(cnk, minlength=nn).astype(np.int64)
        sb = np.zeros(nn, np.int64)
        np.add.at(sb, cnk, cbal)
        no = np.zeros(nn, np.int64)
        rev = np.zeros(nn, np.int64)
        orows = ~is_cust
        if orows.any() and len(cck_s):
            ock, opr = ck[orows], pr[orows]
            pos = np.clip(np.searchsorted(cck_s, ock), 0, len(cck_s) - 1)
            hit = cck_s[pos] == ock
            onk = cnk_s[pos][hit]
            no += np.bincount(onk, minlength=nn).astype(np.int64)
            np.add.at(rev, onk, opr[hit])
        live = np.flatnonzero(nc + no)
        return pa.table(
            {
                "nk": pa.array(live.astype(np.int64)),
                "nc": pa.array(nc[live]),
                "sb": pa.array(sb[live]),
                "no": pa.array(no[live]),
                "rev": pa.array(rev[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nc = np.zeros(nn, np.int64)
        sb = np.zeros(nn, np.int64)
        no = np.zeros(nn, np.int64)
        rev = np.zeros(nn, np.int64)
        if t.num_rows:
            g = t.group_by("nk", use_threads=False).aggregate(
                [("nc", "sum"), ("sb", "sum"), ("no", "sum"), ("rev", "sum")]
            )
            kk = g["nk"].combine_chunks().to_numpy(zero_copy_only=False)
            for dst, col in (
                (nc, "nc_sum"),
                (sb, "sb_sum"),
                (no, "no_sum"),
                (rev, "rev_sum"),
            ):
                dst[kk] = g[col].combine_chunks().to_numpy(
                    zero_copy_only=False
                )
        return pa.table(
            {
                "n_name": nat_names,
                "n_customers": pa.array(nc),
                "acctbal_floor": pa.array(sb),
                "n_orders": pa.array(no),
                "revenue_floor": pa.array(rev),
            }
        )

    both = cust.map_batches(rich_row, batch_format="pyarrow").union(
        ords.map_batches(order_row, batch_format="pyarrow")
    )
    partials = hash_partition_merge(
        both, "ck", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(partials, "nk", merge, k=1)


def supplier_concentration(sf_dir: str) -> Dataset:
    """R32: supplier-fulfillment concentration — per nation: suppliers
    registered, lines shipped, floored line revenue, and the BUSIEST
    single supplier's line count — the supply-base redundancy board
    (one supplier carrying most of a nation's volume = a single point
    of failure R15's bilateral trade matrix can't see).  Suppliers with
    zero lines still count (LEFT-JOIN semantics); one dense row per
    nation ALWAYS.  Exact int64 (LEFT JOIN + two-level GROUP BY + max
    oracle).

    Scale shape — ONE co-partitioned exchange: line batches pre-reduce
    ~4:1 to per-supplier (n, rev) partials, supplier dim rows (suppkey,
    nation-code) ride the same SUPPKEY hash-exchange (supplier GROWS
    WITH THE CORPUS — never broadcast); each partition holds every
    partial of its suppliers, so per-supplier totals — and therefore
    the local max — settle exactly and fold IN PLACE to per-nation
    (n_supp, lines, rev, max) partials; nation names from the 25-row
    broadcast; k=1 densifying merge (max-of-maxes is associative
    because supplier totals are whole within one partition)."""
    nations = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()
    nations.sort(key=lambda r: r["n_nationkey"])
    nat_keys = np.array([r["n_nationkey"] for r in nations], np.int64)
    nat_names = pa.array([r["n_name"] for r in nations], pa.string())
    nn = len(nat_keys)

    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "supplier"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def supp_row(b: pa.Table) -> pa.Table:
        nk = np.searchsorted(
            nat_keys,
            b["s_nationkey"].combine_chunks().to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "sk": pc.cast(b["s_suppkey"], pa.int64()),
                "nk": pa.array(nk.astype(np.int64)),
                "n": pa.array(np.full(b.num_rows, -1, np.int64)),
                "rev": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def line_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        t = pa.table(
            {
                "sk": pc.cast(b["l_suppkey"], pa.int64()),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by("sk", use_threads=False).aggregate(
            [("one", "sum"), ("rev", "sum")]
        )
        g = g.rename_columns(["sk", "n", "rev"])
        return g.append_column(
            "nk", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["sk", "nk", "n", "rev"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "nk": pa.array([], pa.int64()),
                "nsupp": pa.array([], pa.int64()),
                "nl": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        sk = t["sk"].combine_chunks().to_numpy(zero_copy_only=False)
        nk = t["nk"].combine_chunks().to_numpy(zero_copy_only=False)
        n_ = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        rv = t["rev"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = n_ < 0
        if not is_dim.any():
            return empty
        dsk, dnk = sk[is_dim], nk[is_dim]
        order = np.argsort(dsk, kind="stable")
        dsk_s, dnk_s = dsk[order], dnk[order]
        # per-supplier line totals from the fact partials
        fsk, fn, frv = sk[~is_dim], n_[~is_dim], rv[~is_dim]
        u, inv = np.unique(fsk, return_inverse=True)
        tot_n = np.zeros(len(u), np.int64)
        tot_r = np.zeros(len(u), np.int64)
        np.add.at(tot_n, inv, fn)
        np.add.at(tot_r, inv, frv)
        pos = (
            np.clip(np.searchsorted(dsk_s, u), 0, max(len(dsk_s) - 1, 0))
            if len(dsk_s)
            else np.zeros(len(u), np.int64)
        )
        hit = dsk_s[pos] == u if len(dsk_s) else np.zeros(len(u), bool)
        unk = dnk_s[pos][hit]
        nsupp = np.bincount(dnk, minlength=nn).astype(np.int64)
        nl = np.zeros(nn, np.int64)
        rev = np.zeros(nn, np.int64)
        mx = np.zeros(nn, np.int64)
        np.add.at(nl, unk, tot_n[hit])
        np.add.at(rev, unk, tot_r[hit])
        np.maximum.at(mx, unk, tot_n[hit])
        live = np.flatnonzero(nsupp + nl)
        return pa.table(
            {
                "nk": pa.array(live.astype(np.int64)),
                "nsupp": pa.array(nsupp[live]),
                "nl": pa.array(nl[live]),
                "rev": pa.array(rev[live]),
                "mx": pa.array(mx[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nsupp = np.zeros(nn, np.int64)
        nl = np.zeros(nn, np.int64)
        rev = np.zeros(nn, np.int64)
        mx = np.zeros(nn, np.int64)
        if t.num_rows:
            g = t.group_by("nk", use_threads=False).aggregate(
                [("nsupp", "sum"), ("nl", "sum"), ("rev", "sum"), ("mx", "max")]
            )
            kk = g["nk"].combine_chunks().to_numpy(zero_copy_only=False)
            nsupp[kk] = g["nsupp_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            nl[kk] = g["nl_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            rev[kk] = g["rev_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            mx[kk] = g["mx_max"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "n_name": nat_names,
                "n_suppliers": pa.array(nsupp),
                "n_lines": pa.array(nl),
                "revenue_floor": pa.array(rev),
                "top_supplier_lines": pa.array(mx),
            }
        )

    both = supp.map_batches(supp_row, batch_format="pyarrow").union(
        lines.map_batches(line_partial, batch_format="pyarrow")
    )
    partials = hash_partition_merge(
        both, "sk", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(partials, "nk", merge, k=1)


def nation_year_profit(sf_dir: str) -> Dataset:
    """R33: supplier-nation profit matrix (the TPC-H Q9 question minus
    partsupp's supply cost, which this schema does not carry) — per
    (supplier nation, order year): lines and floored revenue — where
    the supply side EARNS over time, the seller-side dual of R3's
    customer-segment sales.  Exact int64 (3-way join + two-key GROUP BY
    oracle).

    Scale shape — two chained co-partitioned hops, each output narrower
    than its input: the ORDERKEY hop meets per-batch line partials
    (orderkey, suppkey, rev — pre-grouped ~2:1) with (orderkey, year)
    order rows and re-keys to (suppkey, year) partials; the SUPPKEY hop
    meets those with supplier dim rows (supplier GROWS WITH THE CORPUS
    — never broadcast) and folds to (nation, year) partials over a
    ≤ nations × years domain; nation names from the 25-row broadcast;
    k=1 merge."""
    nations = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()
    nations.sort(key=lambda r: r["n_nationkey"])
    nat_keys = np.array([r["n_nationkey"] for r in nations], np.int64)
    nat_names = pa.array([r["n_name"] for r in nations], pa.string())

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "supplier"),
    )

    # ---- hop 1 (ORDERKEY): attach the order year to line partials ----
    def line_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        t = pa.table(
            {
                "ok": pc.cast(b["l_orderkey"], pa.int64()),
                "sk": pc.cast(b["l_suppkey"], pa.int64()),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by(["ok", "sk"], use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["ok", "sk", "n", "rev"])

    def order_row(b: pa.Table) -> pa.Table:
        ts_us = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        yr = (
            ts_us.astype("datetime64[us]").astype("datetime64[Y]").astype(
                np.int64
            )
            + 1970
        )
        n = b.num_rows
        return pa.table(
            {
                "ok": pc.cast(b["o_orderkey"], pa.int64()),
                "sk": pa.array(np.full(n, -1, np.int64)),
                "n": pa.array(np.zeros(n, np.int64)),
                "rev": pa.array(yr),  # year rides the rev slot on dim rows
            }
        )

    def fold_order(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "sk": pa.array([], pa.int64()),
                "yr": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        sk = t["sk"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = t["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        nn_ = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        rv = t["rev"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = sk < 0
        if not is_dim.any():
            return empty
        dok, dyr = ok[is_dim], rv[is_dim]
        order = np.argsort(dok, kind="stable")
        dok_s, dyr_s = dok[order], dyr[order]
        fok, fsk, fn, frv = ok[~is_dim], sk[~is_dim], nn_[~is_dim], rv[~is_dim]
        if not len(fok):
            return empty
        pos = np.clip(np.searchsorted(dok_s, fok), 0, len(dok_s) - 1)
        hit = dok_s[pos] == fok
        cells = pa.table(
            {
                "sk": pa.array(fsk[hit], pa.int64()),
                "yr": pa.array(dyr_s[pos][hit], pa.int64()),
                "n": pa.array(fn[hit], pa.int64()),
                "rev": pa.array(frv[hit], pa.int64()),
            }
        )
        g = cells.group_by(["sk", "yr"], use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["sk", "yr", "n", "rev"])

    per_supp_year = hash_partition_merge(
        lines.map_batches(line_partial, batch_format="pyarrow").union(
            ords.map_batches(order_row, batch_format="pyarrow")
        ),
        "ok",
        fold_order,
        k=_rel_k(sf_dir, "lineitem"),
    )

    # ---- hop 2 (SUPPKEY): attach the supplier nation ----
    def fact_tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "sk": b["sk"],
                "yr": b["yr"],
                "n": b["n"],
                "rev": b["rev"],
                "nk": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        )

    def dim_tag(b: pa.Table) -> pa.Table:
        nk = np.searchsorted(
            nat_keys,
            b["s_nationkey"].combine_chunks().to_numpy(zero_copy_only=False),
        )
        n = b.num_rows
        return pa.table(
            {
                "sk": pc.cast(b["s_suppkey"], pa.int64()),
                "yr": pa.array(np.zeros(n, np.int64)),
                "n": pa.array(np.zeros(n, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
                "nk": pa.array(nk.astype(np.int64)),
            }
        )

    def fold_supp(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "nk": pa.array([], pa.int64()),
                "yr": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        nk = t["nk"].combine_chunks().to_numpy(zero_copy_only=False)
        sk = t["sk"].combine_chunks().to_numpy(zero_copy_only=False)
        yr = t["yr"].combine_chunks().to_numpy(zero_copy_only=False)
        nn_ = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        rv = t["rev"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = nk >= 0
        if not is_dim.any():
            return empty
        dsk, dnk = sk[is_dim], nk[is_dim]
        order = np.argsort(dsk, kind="stable")
        dsk_s, dnk_s = dsk[order], dnk[order]
        fsk, fyr, fn, frv = sk[~is_dim], yr[~is_dim], nn_[~is_dim], rv[~is_dim]
        if not len(fsk):
            return empty
        pos = np.clip(np.searchsorted(dsk_s, fsk), 0, len(dsk_s) - 1)
        hit = dsk_s[pos] == fsk
        cells = pa.table(
            {
                "nk": pa.array(dnk_s[pos][hit], pa.int64()),
                "yr": pa.array(fyr[hit], pa.int64()),
                "n": pa.array(fn[hit], pa.int64()),
                "rev": pa.array(frv[hit], pa.int64()),
            }
        )
        g = cells.group_by(["nk", "yr"], use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["nk", "yr", "n", "rev"])

    per_nation_year = hash_partition_merge(
        per_supp_year.map_batches(fact_tag, batch_format="pyarrow").union(
            supp.map_batches(dim_tag, batch_format="pyarrow")
        ),
        "sk",
        fold_supp,
        k=_rel_k(sf_dir, "orders"),
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "o_year": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["nk", "yr"], use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        return pa.table(
            {
                "n_name": nat_names.take(g["nk"].combine_chunks()),
                "o_year": pc.cast(g["yr"], pa.int64()),
                "n_lines": pc.cast(g["n_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(per_nation_year, "nk", merge, k=1)


def shipmode_priority(sf_dir: str) -> Dataset:
    """R34: line-status priority split (the TPC-H Q12 question keyed on
    the status columns this schema carries instead of shipmode) — per
    (l_returnflag, l_linestatus) over lines shipped in [1996, 1998):
    lines on URGENT/HIGH-priority orders vs lines on lower-priority
    orders — the critical-path exposure board (a status cell dominated
    by high-priority lines is where late shipping costs the most;
    reference parity: this is the one TPC-H question shape the suite
    had not yet expressed).  Exact int64 (join + CASE-sum oracle).

    Scale shape — ONE co-partitioned ORDERKEY exchange (R2's rule):
    the ship-date window is pushed to the read; line batches pre-reduce
    to (orderkey, status-cell, n) cells via one Arrow group_by; order
    rows ride the same exchange carrying only a 0/1 high-priority flag
    (orders grow with the corpus — never broadcast); each partition
    joins with one searchsorted and folds to (cell, n_high, n_low)
    partials over a ≤ |returnflag| × |linestatus| domain; status names
    from two tiny broadcast rank lists; k=1 densifying merge."""
    lo = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi = np.datetime64("1998-01-01", "us").astype(np.int64)

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_linestatus", "l_shipdate"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    rf_list = pa.array(sorted(li.unique("l_returnflag")), pa.string())
    ls_list = pa.array(sorted(li.unique("l_linestatus")), pa.string())
    n_ls = len(ls_list)

    def line_cells(b: pa.Table) -> pa.Table:
        sd = (
            b["l_shipdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        keep = (sd >= lo) & (sd < hi)
        b = b.filter(pa.array(keep))
        rf = (
            pc.cast(pc.index_in(b["l_returnflag"], value_set=rf_list), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ls = (
            pc.cast(pc.index_in(b["l_linestatus"], value_set=ls_list), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "ok": pc.cast(b["l_orderkey"], pa.int64()),
                "cell": pa.array(rf * n_ls + ls),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["ok", "cell"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["ok", "cell", "n"])

    def order_flag(b: pa.Table) -> pa.Table:
        high = pc.is_in(
            b["o_orderpriority"],
            value_set=pa.array(["1-URGENT", "2-HIGH"]),
        )
        return pa.table(
            {
                "ok": pc.cast(b["o_orderkey"], pa.int64()),
                "cell": pa.array(np.full(b.num_rows, -1, np.int64)),
                "n": pc.cast(high, pa.int64()),
            }
        )

    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "nh": pa.array([], pa.int64()),
                "nl": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ok = t["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = cell < 0
        if not is_dim.any():
            return empty
        dok, dhi = ok[is_dim], nn[is_dim]
        order = np.argsort(dok, kind="stable")
        dok_s, dhi_s = dok[order], dhi[order]
        fok, fcell, fn = ok[~is_dim], cell[~is_dim], nn[~is_dim]
        if not len(fok):
            return empty
        pos = np.clip(np.searchsorted(dok_s, fok), 0, len(dok_s) - 1)
        hit = dok_s[pos] == fok
        high = dhi_s[pos][hit].astype(bool)
        fcell, fn = fcell[hit], fn[hit]
        nc = len(rf_list) * n_ls
        nh = np.bincount(fcell[high], weights=fn[high], minlength=nc)
        nl = np.bincount(fcell[~high], weights=fn[~high], minlength=nc)
        live = np.flatnonzero(nh + nl)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "nh": pa.array(nh[live].astype(np.int64)),
                "nl": pa.array(nl[live].astype(np.int64)),
            }
        )

    per_cell = hash_partition_merge(
        li.map_batches(line_cells, batch_format="pyarrow").union(
            ords.map_batches(order_flag, batch_format="pyarrow")
        ),
        "ok",
        fold,
        k=_rel_k(sf_dir, "lineitem"),
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "l_linestatus": pa.array([], pa.string()),
                    "n_high_lines": pa.array([], pa.int64()),
                    "n_low_lines": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("cell", use_threads=False).aggregate(
            [("nh", "sum"), ("nl", "sum")]
        )
        cell = g["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": rf_list.take(
                    pa.array(cell // n_ls, pa.int64())
                ),
                "l_linestatus": ls_list.take(
                    pa.array(cell % n_ls, pa.int64())
                ),
                "n_high_lines": pc.cast(g["nh_sum"], pa.int64()),
                "n_low_lines": pc.cast(g["nl_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(per_cell, "cell", merge, k=1)


def order_size_profile(sf_dir: str) -> Dataset:
    """R35: order fan-out profile — per order SIZE (exact number of
    lineitem rows in the order): orders of that size and their floored
    total revenue — the basket-depth histogram (R6 counts orders per
    customer, R27 profiles line POSITION; R35 says how deep baskets go
    and where the revenue mass sits — the skew read that sizes the
    per-order work unit every ORDERKEY co-partitioned join assumes is
    bounded).  Exact int64 (two-level GROUP BY oracle).

    Scale shape — ONE co-partitioned ORDERKEY exchange and NO dim side
    at all: line batches pre-reduce to (orderkey, n, rev) partials via
    one Arrow group_by; the orderkey partition holds every line of an
    order, so its exact size and revenue settle locally and fold
    straight to (size, n_orders, rev) partials over a ≤ max-basket
    domain; k=1 merge."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def line_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        t = pa.table(
            {
                "ok": pc.cast(b["l_orderkey"], pa.int64()),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by("ok", use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["ok", "n", "rev"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "size": pa.array([], pa.int64()),
                    "no": pa.array([], pa.int64()),
                    "rev": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("ok", use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        # int64 all the way: a float bincount would round above 2^53
        sized = pa.table(
            {
                "size": g["n_sum"],
                "no": pa.array(np.ones(g.num_rows, np.int64)),
                "rev": g["rev_sum"],
            }
        )
        h = sized.group_by("size", use_threads=False).aggregate(
            [("no", "sum"), ("rev", "sum")]
        )
        return pa.table(
            {
                "size": pc.cast(h["size"], pa.int64()),
                "no": pc.cast(h["no_sum"], pa.int64()),
                "rev": pc.cast(h["rev_sum"], pa.int64()),
            }
        )

    per_size = hash_partition_merge(
        li.map_batches(line_partial, batch_format="pyarrow"),
        "ok",
        fold,
        k=_rel_k(sf_dir, "lineitem"),
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "order_size": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("size", use_threads=False).aggregate(
            [("no", "sum"), ("rev", "sum")]
        )
        return pa.table(
            {
                "order_size": pc.cast(g["size"], pa.int64()),
                "n_orders": pc.cast(g["no_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(per_size, "size", merge, k=1)


def brand_segment_matrix(sf_dir: str) -> Dataset:
    """R36: market-segment × brand revenue matrix — per (c_mktsegment,
    p_brand): lines + floored revenue — the full-star cross-section
    (WHO buys WHAT): the only suite question that threads BOTH
    corpus-sized dimension chains at once (customer→orders→lineitem
    and part→lineitem), R5's segment axis crossed with R13's brand
    axis.  Exact int64 (4-way join + two-key GROUP BY oracle).

    Scale shape — THREE chained co-partitioned hops, every exchanged
    stream narrower than its input and no corpus-sized broadcast:
    the CUSTKEY hop tags order rows with a tiny segment code (customer
    grows with the corpus — rides the exchange as dim rows); the
    ORDERKEY hop meets per-batch line cells (orderkey, partkey, n, rev
    — pre-grouped) with the tagged orders and re-keys to (partkey, seg)
    partials; the PARTKEY hop meets those with part dim rows carrying a
    brand code and folds to a ≤ segments × brands domain; only the two
    tiny value rank lists broadcast; k=1 densifying merge."""
    segs = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]
            ).unique("c_mktsegment")
        ),
        pa.string(),
    )
    brands = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/part.parquet", columns=["p_brand"]
            ).unique("p_brand")
        ),
        pa.string(),
    )
    n_seg, n_brand = len(segs), len(brands)

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )

    # ---- hop 1 (CUSTKEY): tag orders with the segment code ----
    def cust_dim(b: pa.Table) -> pa.Table:
        seg = pc.cast(
            pc.index_in(b["c_mktsegment"], value_set=segs), pa.int64()
        )
        return pa.table(
            {
                "ck": pc.cast(b["c_custkey"], pa.int64()),
                "ok": pa.array(np.full(b.num_rows, -1, np.int64)),
                "seg": seg,
            }
        )

    def order_fact(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ck": pc.cast(b["o_custkey"], pa.int64()),
                "ok": pc.cast(b["o_orderkey"], pa.int64()),
                "seg": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        )

    def fold_cust(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"ok": pa.array([], pa.int64()), "seg": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        ck = t["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = t["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        sg = t["seg"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = ok < 0
        if not is_dim.any():
            return empty
        dck, dsg = ck[is_dim], sg[is_dim]
        order = np.argsort(dck, kind="stable")
        dck_s, dsg_s = dck[order], dsg[order]
        fck, fok = ck[~is_dim], ok[~is_dim]
        if not len(fck):
            return empty
        pos = np.clip(np.searchsorted(dck_s, fck), 0, len(dck_s) - 1)
        hit = dck_s[pos] == fck
        return pa.table(
            {
                "ok": pa.array(fok[hit], pa.int64()),
                "seg": pa.array(dsg_s[pos][hit], pa.int64()),
            }
        )

    tagged_orders = hash_partition_merge(
        ords.map_batches(order_fact, batch_format="pyarrow").union(
            cust.map_batches(cust_dim, batch_format="pyarrow")
        ),
        "ck",
        fold_cust,
        k=_rel_k(sf_dir, "orders"),
    )

    # ---- hop 2 (ORDERKEY): meet line cells with tagged orders ----
    def line_cells(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        t = pa.table(
            {
                "ok": pc.cast(b["l_orderkey"], pa.int64()),
                "pk": pc.cast(b["l_partkey"], pa.int64()),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by(["ok", "pk"], use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["ok", "pk", "n", "rev"])

    def order_dim2(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "ok": b["ok"],
                "pk": pa.array(np.full(n, -1, np.int64)),
                "n": pa.array(np.zeros(n, np.int64)),
                "rev": pc.cast(b["seg"], pa.int64()),  # seg rides rev
            }
        )

    def fold_order(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "pk": pa.array([], pa.int64()),
                "seg": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ok = t["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        pk = t["pk"].combine_chunks().to_numpy(zero_copy_only=False)
        nn_ = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        rv = t["rev"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = pk < 0
        if not is_dim.any():
            return empty
        dok, dsg = ok[is_dim], rv[is_dim]
        order = np.argsort(dok, kind="stable")
        dok_s, dsg_s = dok[order], dsg[order]
        fok, fpk, fn, frv = ok[~is_dim], pk[~is_dim], nn_[~is_dim], rv[~is_dim]
        if not len(fok):
            return empty
        pos = np.clip(np.searchsorted(dok_s, fok), 0, len(dok_s) - 1)
        hit = dok_s[pos] == fok
        cells = pa.table(
            {
                "pk": pa.array(fpk[hit], pa.int64()),
                "seg": pa.array(dsg_s[pos][hit], pa.int64()),
                "n": pa.array(fn[hit], pa.int64()),
                "rev": pa.array(frv[hit], pa.int64()),
            }
        )
        g = cells.group_by(["pk", "seg"], use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["pk", "seg", "n", "rev"])

    per_part_seg = hash_partition_merge(
        li.map_batches(line_cells, batch_format="pyarrow").union(
            tagged_orders.map_batches(order_dim2, batch_format="pyarrow")
        ),
        "ok",
        fold_order,
        k=_rel_k(sf_dir, "lineitem"),
    )

    # ---- hop 3 (PARTKEY): attach the brand code ----
    def fact_tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pk": b["pk"],
                "seg": b["seg"],
                "n": b["n"],
                "rev": b["rev"],
                "br": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        )

    def part_dim(b: pa.Table) -> pa.Table:
        br = pc.cast(pc.index_in(b["p_brand"], value_set=brands), pa.int64())
        n = b.num_rows
        return pa.table(
            {
                "pk": pc.cast(b["p_partkey"], pa.int64()),
                "seg": pa.array(np.zeros(n, np.int64)),
                "n": pa.array(np.zeros(n, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
                "br": br,
            }
        )

    def fold_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        pk = t["pk"].combine_chunks().to_numpy(zero_copy_only=False)
        sg = t["seg"].combine_chunks().to_numpy(zero_copy_only=False)
        nn_ = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        rv = t["rev"].combine_chunks().to_numpy(zero_copy_only=False)
        br = t["br"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = br >= 0
        if not is_dim.any():
            return empty
        dpk, dbr = pk[is_dim], br[is_dim]
        order = np.argsort(dpk, kind="stable")
        dpk_s, dbr_s = dpk[order], dbr[order]
        fpk, fsg, fn, frv = pk[~is_dim], sg[~is_dim], nn_[~is_dim], rv[~is_dim]
        if not len(fpk):
            return empty
        pos = np.clip(np.searchsorted(dpk_s, fpk), 0, len(dpk_s) - 1)
        hit = dpk_s[pos] == fpk
        cells = pa.table(
            {
                "cell": pa.array(
                    fsg[hit] * n_brand + dbr_s[pos][hit], pa.int64()
                ),
                "n": pa.array(fn[hit], pa.int64()),
                "rev": pa.array(frv[hit], pa.int64()),
            }
        )
        g = cells.group_by("cell", use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["cell", "n", "rev"])

    per_cell = hash_partition_merge(
        per_part_seg.map_batches(fact_tag, batch_format="pyarrow").union(
            part.map_batches(part_dim, batch_format="pyarrow")
        ),
        "pk",
        fold_part,
        k=_rel_k(sf_dir, "part"),
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "p_brand": pa.array([], pa.string()),
                    "n_lines": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("cell", use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        cell = g["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_mktsegment": segs.take(
                    pa.array(cell // n_brand, pa.int64())
                ),
                "p_brand": brands.take(pa.array(cell % n_brand, pa.int64())),
                "n_lines": pc.cast(g["n_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(per_cell, "cell", merge, k=1)


def repeat_purchase(sf_dir: str) -> Dataset:
    """R37: repeat-purchase board — per p_brand: distinct (customer,
    part) pairs with ≥1 line, pairs with ≥2 lines (REPEAT buys), total
    lines — the loyalty/consumables read (a brand whose line volume
    comes from repeat pairs sells staples; one-shot pairs sell
    durables), and the only suite question whose GROUP key is itself a
    corpus-sized PAIR (customer × part both grow with scale).  Exact
    int64 (per-pair count + HAVING-free CASE oracle).

    Scale shape — THREE exchanges, the middle one keyed by a PAIR HASH
    (the T4 convention: the 8-byte hash only routes — identity is the
    exact (custkey, partkey) columns riding alongside, so a collision
    co-locates two pairs but can never merge them): the ORDERKEY hop
    rewrites line cells to (custkey, partkey, n) with orders riding as
    dim rows; the PAIR hop settles each pair's exact line count and
    re-reduces IN PLACE to per-part (pairs, repeats, lines) partials;
    the PARTKEY hop attaches the brand code (part dim rides the
    exchange — never broadcast) and folds to a ≤ brands domain; k=1
    merge."""
    brands = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/part.parquet", columns=["p_brand"]
            ).unique("p_brand")
        ),
        pa.string(),
    )
    n_brand = len(brands)

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )

    # ---- hop 1 (ORDERKEY): attach custkey to line cells ----
    def line_cells(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "ok": pc.cast(b["l_orderkey"], pa.int64()),
                "pk": pc.cast(b["l_partkey"], pa.int64()),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["ok", "pk"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["ok", "pk", "n"])

    def order_dim(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ok": pc.cast(b["o_orderkey"], pa.int64()),
                "pk": pa.array(np.full(b.num_rows, -1, np.int64)),
                "n": pc.cast(b["o_custkey"], pa.int64()),  # ck rides n
            }
        )

    MUL = np.uint64(0xBF58476D1CE4E5B9)

    def fold_order(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "h": pa.array([], pa.int64()),
                "ck": pa.array([], pa.int64()),
                "pk": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ok = t["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        pk = t["pk"].combine_chunks().to_numpy(zero_copy_only=False)
        nn_ = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = pk < 0
        if not is_dim.any():
            return empty
        dok, dck = ok[is_dim], nn_[is_dim]
        order = np.argsort(dok, kind="stable")
        dok_s, dck_s = dok[order], dck[order]
        fok, fpk, fn = ok[~is_dim], pk[~is_dim], nn_[~is_dim]
        if not len(fok):
            return empty
        pos = np.clip(np.searchsorted(dok_s, fok), 0, len(dok_s) - 1)
        hit = dok_s[pos] == fok
        ck, pk2, n2 = dck_s[pos][hit], fpk[hit], fn[hit]
        h = (
            (ck.astype(np.uint64) * MUL) ^ (pk2.astype(np.uint64) + MUL)
        ) * MUL
        h ^= h >> np.uint64(31)
        g = pa.table(
            {
                "h": pa.array(h.view(np.int64)),
                "ck": pa.array(ck, pa.int64()),
                "pk": pa.array(pk2, pa.int64()),
                "n": pa.array(n2, pa.int64()),
            }
        ).group_by(["h", "ck", "pk"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["h", "ck", "pk", "n"])

    pair_cells = hash_partition_merge(
        li.map_batches(line_cells, batch_format="pyarrow").union(
            ords.map_batches(order_dim, batch_format="pyarrow")
        ),
        "ok",
        fold_order,
        k=_rel_k(sf_dir, "lineitem"),
    )

    # ---- hop 2 (PAIR HASH): settle each pair's exact line count ----
    def fold_pair(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "pk": pa.array([], pa.int64()),
                    "pairs": pa.array([], pa.int64()),
                    "rep": pa.array([], pa.int64()),
                    "lines": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["ck", "pk"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        pk = g["pk"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        out = pa.table(
            {
                "pk2": pa.array(pk, pa.int64()),
                "pairs": pa.array(np.ones(len(pk), np.int64)),
                "rep": pa.array((n >= 2).astype(np.int64)),
                "lines": pa.array(n.astype(np.int64)),
            }
        )
        g2 = out.group_by("pk2", use_threads=False).aggregate(
            [("pairs", "sum"), ("rep", "sum"), ("lines", "sum")]
        )
        return g2.rename_columns(["pk", "pairs", "rep", "lines"])

    per_part = hash_partition_merge(
        pair_cells, "h", fold_pair, k=_rel_k(sf_dir, "lineitem")
    )

    # ---- hop 3 (PARTKEY): attach the brand code ----
    def fact_tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pk": b["pk"],
                "pairs": b["pairs"],
                "rep": b["rep"],
                "lines": b["lines"],
                "br": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        )

    def part_dim(b: pa.Table) -> pa.Table:
        br = pc.cast(pc.index_in(b["p_brand"], value_set=brands), pa.int64())
        n = b.num_rows
        return pa.table(
            {
                "pk": pc.cast(b["p_partkey"], pa.int64()),
                "pairs": pa.array(np.zeros(n, np.int64)),
                "rep": pa.array(np.zeros(n, np.int64)),
                "lines": pa.array(np.zeros(n, np.int64)),
                "br": br,
            }
        )

    def fold_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "br": pa.array([], pa.int64()),
                "pairs": pa.array([], pa.int64()),
                "rep": pa.array([], pa.int64()),
                "lines": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        pk = t["pk"].combine_chunks().to_numpy(zero_copy_only=False)
        pr = t["pairs"].combine_chunks().to_numpy(zero_copy_only=False)
        rp = t["rep"].combine_chunks().to_numpy(zero_copy_only=False)
        ln = t["lines"].combine_chunks().to_numpy(zero_copy_only=False)
        br = t["br"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = br >= 0
        if not is_dim.any():
            return empty
        dpk, dbr = pk[is_dim], br[is_dim]
        order = np.argsort(dpk, kind="stable")
        dpk_s, dbr_s = dpk[order], dbr[order]
        fpk = pk[~is_dim]
        if not len(fpk):
            return empty
        pos = np.clip(np.searchsorted(dpk_s, fpk), 0, len(dpk_s) - 1)
        hit = dpk_s[pos] == fpk
        g = pa.table(
            {
                "br2": pa.array(dbr_s[pos][hit], pa.int64()),
                "pairs": pa.array(pr[~is_dim][hit], pa.int64()),
                "rep": pa.array(rp[~is_dim][hit], pa.int64()),
                "lines": pa.array(ln[~is_dim][hit], pa.int64()),
            }
        ).group_by("br2", use_threads=False).aggregate(
            [("pairs", "sum"), ("rep", "sum"), ("lines", "sum")]
        )
        return g.rename_columns(["br", "pairs", "rep", "lines"])

    per_brand = hash_partition_merge(
        per_part.map_batches(fact_tag, batch_format="pyarrow").union(
            part.map_batches(part_dim, batch_format="pyarrow")
        ),
        "pk",
        fold_part,
        k=_rel_k(sf_dir, "part"),
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "p_brand": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                    "n_repeat_pairs": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("br", use_threads=False).aggregate(
            [("pairs", "sum"), ("rep", "sum"), ("lines", "sum")]
        )
        return pa.table(
            {
                "p_brand": brands.take(g["br"].combine_chunks()),
                "n_pairs": pc.cast(g["pairs_sum"], pa.int64()),
                "n_repeat_pairs": pc.cast(g["rep_sum"], pa.int64()),
                "n_lines": pc.cast(g["lines_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(per_brand, "br", merge, k=1)


def sales_opportunity(sf_dir: str) -> Dataset:
    """R38: global sales-opportunity board (the TPC-H Q22 shape — Q22 is
    the last canonical query shape the suite lacked that this schema can
    express; Q2/Q11/Q16/Q20 need partsupp, Q4/Q21 need commit/receipt
    dates) — per nation: positive-balance customers whose balance sits
    ABOVE the global positive-balance mean, those among them who NEVER
    ordered (the opportunity set), and the opportunity set's balance
    total in cents.  Above-mean is decided by exact int64
    cross-multiplication (cents · n_pos > Σ_pos cents) so NO division
    happens on either side; bound documented: 10^6-cent balances ×
    10^10 customers ≈ 10^16 ≪ 2^63.  One dense row per nation ALWAYS.
    Exact int64 (scalar-subquery + NOT EXISTS + nation LEFT JOIN
    oracle).

    Scale shape — a broadcast scalar plus R18's co-partitioned anti
    join: pass 1 is a two-int global aggregate (Σcents, n over positive
    balances) folded from one partial row per batch and broadcast as a
    plain Python constant (never re-shipped per batch — it rides the
    closure); pass 2 re-uses the custkey exchange — orders pre-reduce
    per batch to DISTINCT-custkey partials (EXISTS needs presence, not
    counts, so the exchange carries one row per (batch, custkey)),
    customer dim rows carry (nation, cents), and each custkey's
    partition decides above-mean AND never-ordered locally — absence is
    decidable only under co-location — reducing straight to per-nation
    triples; the k=1 merge densifies over the 25-row nation broadcast.

    Reference parity: the validate→store decision lane
    (internal/storage/storage.go:21 Store interface) as a set-membership
    predicate over a co-partitioned key exchange."""
    from ..stages.shuffle import hash_partition_merge

    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat = nat.sort_values("n_nationkey").reset_index(drop=True)
    names = pa.array(nat["n_name"].tolist(), pa.string())
    nkeys = nat["n_nationkey"].to_numpy().astype(np.int64)
    nk_pos = {int(k): i for i, k in enumerate(nkeys)}

    # pass 1: global positive-balance mean as exact (Σcents, n) ints
    def bal_partial(b: pa.Table) -> pa.Table:
        cents = np.floor(
            100.0
            * b["c_acctbal"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        pos = cents[cents > 0]
        return pa.table(
            {
                "tot": pa.array([int(pos.sum())], pa.int64()),
                "n": pa.array([len(pos)], pa.int64()),
            }
        )

    parts = (
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_acctbal"])
        .map_batches(bal_partial, batch_format="pyarrow")
        .take_all()
    )
    tot_pos = sum(int(r["tot"]) for r in parts)
    n_pos = sum(int(r["n"]) for r in parts)

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def cust_dim(b: pa.Table) -> pa.Table:
        cents = np.floor(
            100.0
            * b["c_acctbal"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "nat": pc.cast(b["c_nationkey"], pa.int64()),
                "cents": pa.array(cents),
            }
        )

    def order_partial(b: pa.Table) -> pa.Table:
        k = np.unique(
            pc.cast(b["o_custkey"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pa.array(k, pa.int64()),
                "nat": pa.array(np.full(len(k), -1, np.int64)),  # fact role
                "cents": pa.array(np.zeros(len(k), np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "nat": pa.array([], pa.int64()),
                "above": pa.array([], pa.int64()),
                "opp": pa.array([], pa.int64()),
                "occ": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["nat"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        if d.num_rows == 0:
            return empty
        fk = np.unique(
            t.filter(pa.array(~is_dim))["k"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dn = d["nat"].combine_chunks().to_numpy(zero_copy_only=False)
        dc = d["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(fk):
            pos = np.clip(np.searchsorted(fk, dk), 0, len(fk) - 1)
            has = fk[pos] == dk
        else:
            has = np.zeros(len(dk), dtype=bool)
        above = ((dc > 0) & (dc * n_pos > tot_pos)).astype(np.int64)
        opp = above * (~has).astype(np.int64)
        cells = pa.table(
            {
                "nat": pa.array(dn, pa.int64()),
                "above": pa.array(above),
                "opp": pa.array(opp),
                "occ": pa.array(opp * dc),
            }
        )
        g = cells.group_by("nat", use_threads=False).aggregate(
            [("above", "sum"), ("opp", "sum"), ("occ", "sum")]
        )
        return g.rename_columns(["nat", "above", "opp", "occ"])

    def merge(t: pa.Table) -> pa.Table:
        above = np.zeros(len(nkeys), np.int64)
        opp = np.zeros(len(nkeys), np.int64)
        occ = np.zeros(len(nkeys), np.int64)
        if t.num_rows:
            g = t.group_by("nat", use_threads=False).aggregate(
                [("above", "sum"), ("opp", "sum"), ("occ", "sum")]
            )
            kk = g["nat"].combine_chunks().to_numpy(zero_copy_only=False)
            idx = np.array([nk_pos[int(x)] for x in kk], np.int64)
            above[idx] = g["above_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            opp[idx] = g["opp_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            occ[idx] = g["occ_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "n_name": names,
                "n_above_avg": pa.array(above),
                "n_opportunity": pa.array(opp),
                "opp_cents": pa.array(occ),
            }
        )

    both = cust.map_batches(
        cust_dim, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        ords.map_batches(
            order_partial, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    per_cust = hash_partition_merge(
        both, "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(per_cust, "nat", merge, k=1)


def pricing_margin(sf_dir: str) -> Dataset:
    """R39: list-vs-realized pricing board — per p_brand: shipped lines,
    lines carrying a discount (floor(1000·l_discount) > 0), the LIST
    value of everything shipped (Σ list_cents × qty) and the REALIZED
    value (Σ floor(100·l_extendedprice)) — the pricing-power read the
    revenue boards skip (R5 counts volume, R19 bands by value, R36
    crosses brand with segment; R39 asks what each brand's shipped units
    were WORTH at list vs what the lines actually booked — the
    realization-rate table pricing teams trend).  One dense row per
    brand ALWAYS (brands come from the part dim, zero-line brands show
    zeros).  Exact int64: quantities are integral by schema, cents floor
    before any arithmetic, and list value multiplies cents × qty per
    part so Σ(list·qty) = list·Σqty within a part — no division anywhere
    (bound: 10⁷ list cents × 50 qty × 10¹² lines ≈ 10²⁰ would overflow,
    but per-BRAND totals at 100 TB sit near 10¹⁶ ≪ 2⁶³, same budget as
    R36; join + CASE + SUM oracle).

    Scale shape — ONE co-partitioned PARTKEY exchange (the R5 role-union
    shape; parts grow with the corpus so the dim is never broadcast):
    line batches pre-reduce to (partkey, n, n_disc, Σqty, Σext) partials
    — the discount flag is batch-local so everything is a plain sum —
    and part dim rows ride the same exchange carrying (brand code, list
    cents); the partition attaches with one searchsorted, multiplies
    list·Σqty per part, and re-reduces to per-brand partials over a
    ≤ brands domain; only the brand value list broadcasts; k=1
    densifying merge."""
    brands: list[str] = sorted(
        rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_brand"]).unique(
            "p_brand"
        )
    )
    b_arr = pa.array(brands, pa.string())
    nb = len(brands)

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_retailprice"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        code = pc.cast(pc.index_in(b["p_brand"], value_set=b_arr), pa.int64())
        lc = np.floor(
            100.0
            * b["p_retailprice"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        z = np.zeros(b.num_rows, np.int64)
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "br": code,
                "lc": pa.array(lc),
                "n": pa.array(z),
                "nd": pa.array(z),
                "qty": pa.array(z),
                "ext": pa.array(z),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        ext = np.floor(
            100.0
            * b["l_extendedprice"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        disc = (
            np.floor(
                1000.0
                * b["l_discount"]
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            > 0
        ).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "nd": pa.array(disc),
                "qty": pc.cast(b["l_quantity"], pa.int64()),
                "ext": pa.array(ext),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate(
            [("nd", "count"), ("nd", "sum"), ("qty", "sum"), ("ext", "sum")]
        )
        g = g.rename_columns(["k", "n", "nd", "qty", "ext"])
        m1 = pa.array(np.full(g.num_rows, -1, np.int64))
        z = pa.array(np.zeros(g.num_rows, np.int64))
        return pa.table(
            {
                "k": g["k"],
                "br": m1,
                "lc": z,
                "n": pc.cast(g["n"], pa.int64()),
                "nd": pc.cast(g["nd"], pa.int64()),
                "qty": pc.cast(g["qty"], pa.int64()),
                "ext": pc.cast(g["ext"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "br": pa.array([], pa.int64()),
                "n_lines": pa.array([], pa.int64()),
                "n_disc_lines": pa.array([], pa.int64()),
                "list_cents": pa.array([], pa.int64()),
                "realized_cents": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["br"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fg = f.group_by("k", use_threads=False).aggregate(
            [("n", "sum"), ("nd", "sum"), ("qty", "sum"), ("ext", "sum")]
        )
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dbr = d["br"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        dlc = d["lc"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        qty = fg["qty_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        cells = pa.table(
            {
                "br": pa.array(dbr[pos][hit], pa.int64()),
                "n_lines": pc.cast(fg["n_sum"], pa.int64()).filter(
                    pa.array(hit)
                ),
                "n_disc_lines": pc.cast(fg["nd_sum"], pa.int64()).filter(
                    pa.array(hit)
                ),
                "list_cents": pa.array(
                    (dlc[pos] * qty)[hit].astype(np.int64)
                ),
                "realized_cents": pc.cast(fg["ext_sum"], pa.int64()).filter(
                    pa.array(hit)
                ),
            }
        )
        g = cells.group_by("br", use_threads=False).aggregate(
            [
                ("n_lines", "sum"),
                ("n_disc_lines", "sum"),
                ("list_cents", "sum"),
                ("realized_cents", "sum"),
            ]
        )
        return g.rename_columns(
            ["br", "n_lines", "n_disc_lines", "list_cents", "realized_cents"]
        )

    def merge(t: pa.Table) -> pa.Table:
        n_lines = np.zeros(nb, np.int64)
        n_disc = np.zeros(nb, np.int64)
        listc = np.zeros(nb, np.int64)
        realc = np.zeros(nb, np.int64)
        if t.num_rows:
            g = t.group_by("br", use_threads=False).aggregate(
                [
                    ("n_lines", "sum"),
                    ("n_disc_lines", "sum"),
                    ("list_cents", "sum"),
                    ("realized_cents", "sum"),
                ]
            )
            br = g["br"].combine_chunks().to_numpy(zero_copy_only=False)
            n_lines[br] = g["n_lines_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            n_disc[br] = g["n_disc_lines_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            listc[br] = g["list_cents_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            realc[br] = g["realized_cents_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "p_brand": b_arr,
                "n_lines": pa.array(n_lines),
                "n_disc_lines": pa.array(n_disc),
                "list_cents": pa.array(listc),
                "realized_cents": pa.array(realc),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = part.map_batches(dim_partial, batch_format="pyarrow")
    cells = _copartition_attach(fact, dim, fold, k=_rel_k(sf_dir, "lineitem"))
    return hash_partition_merge(cells, "br", merge, k=1)


def supplier_risk(sf_dir: str) -> Dataset:
    """R40: supplier-risk exposure board — per nation: suppliers,
    NEGATIVE-balance suppliers (floor(100·s_acctbal) < 0), and the lines
    + revenue cents flowing through those negative-balance suppliers —
    the supply-side counterpart of R31's rich-customer activity board
    (R10 counts supplier diversity per brand, R15 trades nation against
    nation; R40 asks how much shipped revenue depends on financially
    distressed suppliers — the continuity-risk table procurement
    reviews).  One dense row per nation ALWAYS (zeros where a nation has
    no distressed suppliers).  Exact int64 (cents floored before the
    sign test, join + CASE + SUM oracle).

    Scale shape — ONE co-partitioned SUPPKEY exchange (suppliers grow
    with the corpus — SF × 10k — so the dim is never broadcast; only the
    fixed 25-row nation satellite composes at the driver): line batches
    pre-reduce to (suppkey, n, Σext_cents) partials, supplier dim rows
    ride the same exchange carrying (nationkey, neg flag); each
    partition attaches with one searchsorted — a supplier's lines meet
    its one dim row under co-location — and re-reduces IN PLACE to
    per-nation quadruples; k=1 densifying merge over the nation
    broadcast."""
    from ..stages.shuffle import hash_partition_merge

    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat = nat.sort_values("n_nationkey").reset_index(drop=True)
    names = pa.array(nat["n_name"].tolist(), pa.string())
    nkeys = nat["n_nationkey"].to_numpy().astype(np.int64)
    npos = {int(k): i for i, k in enumerate(nkeys)}
    nn = len(nkeys)

    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey", "s_acctbal"],
        override_num_blocks=_rel_k(sf_dir, "supplier"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        cents = np.floor(
            100.0
            * b["s_acctbal"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        nk = (
            pc.cast(b["s_nationkey"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        pos = np.vectorize(npos.__getitem__, otypes=[np.int64])(nk) if len(
            nk
        ) else nk
        z = np.zeros(b.num_rows, np.int64)
        return pa.table(
            {
                "k": pc.cast(b["s_suppkey"], pa.int64()),
                "nat": pa.array(pos),
                "neg": pa.array((cents < 0).astype(np.int64)),
                "n": pa.array(z),
                "rev": pa.array(z),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        ext = np.floor(
            100.0
            * b["l_extendedprice"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_suppkey"], pa.int64()),
                "rev": pa.array(ext),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate(
            [("rev", "count"), ("rev", "sum")]
        )
        g = g.rename_columns(["k", "n", "rev"])
        m1 = pa.array(np.full(g.num_rows, -1, np.int64))
        return pa.table(
            {
                "k": g["k"],
                "nat": m1,
                "neg": pa.array(np.zeros(g.num_rows, np.int64)),
                "n": pc.cast(g["n"], pa.int64()),
                "rev": pc.cast(g["rev"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "nat": pa.array([], pa.int64()),
                "n_suppliers": pa.array([], pa.int64()),
                "n_negbal": pa.array([], pa.int64()),
                "neg_lines": pa.array([], pa.int64()),
                "neg_rev_cents": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["nat"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        if d.num_rows == 0:
            return empty
        f = t.filter(pa.array(~is_dim))
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dnat = d["nat"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        dneg = d["neg"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        n_sup = np.zeros(nn, np.int64)
        n_neg = np.zeros(nn, np.int64)
        neg_ln = np.zeros(nn, np.int64)
        neg_rv = np.zeros(nn, np.int64)
        np.add.at(n_sup, dnat, 1)
        np.add.at(n_neg, dnat, dneg)
        if f.num_rows:
            fg = f.group_by("k", use_threads=False).aggregate(
                [("n", "sum"), ("rev", "sum")]
            )
            fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
            fn = fg["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            fr = fg["rev_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
            hit = (dk_s[pos] == fk) & (dneg[pos] > 0)
            np.add.at(neg_ln, dnat[pos][hit], fn[hit])
            np.add.at(neg_rv, dnat[pos][hit], fr[hit])
        live = np.flatnonzero(n_sup)
        return pa.table(
            {
                "nat": pa.array(live.astype(np.int64)),
                "n_suppliers": pa.array(n_sup[live]),
                "n_negbal": pa.array(n_neg[live]),
                "neg_lines": pa.array(neg_ln[live]),
                "neg_rev_cents": pa.array(neg_rv[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n_sup = np.zeros(nn, np.int64)
        n_neg = np.zeros(nn, np.int64)
        neg_ln = np.zeros(nn, np.int64)
        neg_rv = np.zeros(nn, np.int64)
        if t.num_rows:
            nt = t["nat"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                n_sup,
                nt,
                t["n_suppliers"].combine_chunks().to_numpy(
                    zero_copy_only=False
                ),
            )
            np.add.at(
                n_neg,
                nt,
                t["n_negbal"].combine_chunks().to_numpy(
                    zero_copy_only=False
                ),
            )
            np.add.at(
                neg_ln,
                nt,
                t["neg_lines"].combine_chunks().to_numpy(
                    zero_copy_only=False
                ),
            )
            np.add.at(
                neg_rv,
                nt,
                t["neg_rev_cents"].combine_chunks().to_numpy(
                    zero_copy_only=False
                ),
            )
        return pa.table(
            {
                "n_name": names,
                "n_suppliers": pa.array(n_sup),
                "n_negbal": pa.array(n_neg),
                "neg_lines": pa.array(neg_ln),
                "neg_rev_cents": pa.array(neg_rv),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = supp.map_batches(dim_partial, batch_format="pyarrow")
    cells = _copartition_attach(fact, dim, fold, k=_rel_k(sf_dir, "lineitem"))
    return hash_partition_merge(cells, "nat", merge, k=1)


def tax_board(sf_dir: str) -> Dataset:
    """R41: tax-exposure board (the TPC-H Q1 charge leg this schema can
    price exactly) — per (l_returnflag, l_linestatus): lines, TAXED
    lines (floor(1000·l_tax) > 0), floored revenue cents, and tax cents
    = Σ (rev_cents · tax_permille) // 1000 with the floor taken PER LINE
    — the liability board R1's pricing summary omits (l_tax was the one
    lineitem measure no suite question touched).  Per-line flooring
    keeps every term int64-exact on both sides (a float Σ ext·tax is
    not); bound: 10⁶ cents × 10³ permille = 10⁹ per line, Σ over 10¹⁰
    lines ≈ 10¹⁶ ≪ 2⁶³ AFTER the //1000 (R36's budget).  GROUP BY shape
    (≤ 3 flags × 2 statuses cells, never vacuous).  Exact int64
    (CASE + SUM of per-line floored products oracle).

    Scale shape — ZERO wide exchange (R1's profile): one floor kernel +
    one int64 product per batch, one Arrow group_by reduces lines to
    ≤ 6 partial rows each; the string-keyed final merge is R1's
    groupby.map_groups convention over those tiny partials."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_tax"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        cents = np.floor(
            100.0
            * b["l_extendedprice"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        taxpm = np.floor(
            1000.0
            * b["l_tax"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "n": pa.array(np.ones(len(cents), np.int64)),
                "taxed": pa.array((taxpm > 0).astype(np.int64)),
                "rev": pa.array(cents),
                "tax": pa.array((cents * taxpm) // 1000),
            }
        )
        g = t.group_by(
            ["l_returnflag", "l_linestatus"], use_threads=False
        ).aggregate(
            [("n", "sum"), ("taxed", "sum"), ("rev", "sum"), ("tax", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "n", "taxed", "rev", "tax"]
        )

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(
            ["l_returnflag", "l_linestatus"], use_threads=False
        ).aggregate(
            [("n", "sum"), ("taxed", "sum"), ("rev", "sum"), ("tax", "sum")]
        )
        return g.rename_columns(
            [
                "l_returnflag",
                "l_linestatus",
                "n_lines",
                "taxed_lines",
                "rev_cents",
                "tax_cents",
            ]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("l_returnflag").map_groups(
        merge, batch_format="pyarrow"
    )


def size_bands(sf_dir: str) -> Dataset:
    """R42: part size-band logistics board — per size band
    b = (p_size − 1) // 10 over the TPC-H p_size domain [1, 50] (five
    dense bands ALWAYS): catalog parts, their floored retail cents, and
    the shipped lines + exact quantity flowing through the band — the
    physical-logistics cut (small parts ship in volume, large parts in
    bulk) none of the brand/type boards slice (p_size was the one part
    attribute no suite question touched).  Exact int64 (integer-divide
    band + dim scan + join + SUM oracle; densified via generate_series
    LEFT JOIN on both sides).

    Scale shape — ONE co-partitioned PARTKEY exchange (R39's role-union
    profile; parts grow with the corpus — SF × 200k — so the dim never
    broadcasts): line batches pre-reduce to (partkey, n, Σqty) partials,
    part dim rows ride the same exchange carrying (band, retail cents);
    each partition attaches with one searchsorted and re-reduces
    straight to the ≤ 5-band domain; k=1 densifying merge."""
    nb = 5

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_size", "p_retailprice"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        size = (
            pc.cast(b["p_size"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        cents = np.floor(
            100.0
            * b["p_retailprice"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "band": pa.array((size - 1) // 10),
                "retail": pa.array(cents),
                "n": pa.array(np.full(len(size), -1, np.int64)),
                "qty": pa.array(np.zeros(len(size), np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        qty = (
            pc.cast(b["l_quantity"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "one": pa.array(np.ones(len(qty), np.int64)),
                "qty": pa.array(qty),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate(
            [("one", "sum"), ("qty", "sum")]
        )
        g = g.rename_columns(["k", "n", "qty"])
        m1 = pa.array(np.full(g.num_rows, -1, np.int64))
        return pa.table(
            {
                "k": g["k"],
                "band": m1,
                "retail": pa.array(np.zeros(g.num_rows, np.int64)),
                "n": pc.cast(g["n"], pa.int64()),
                "qty": pc.cast(g["qty"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "band": pa.array([], pa.int64()),
                "n_parts": pa.array([], pa.int64()),
                "retail_cents": pa.array([], pa.int64()),
                "n_lines": pa.array([], pa.int64()),
                "sum_qty": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        band = t["band"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = band >= 0
        d = t.filter(pa.array(is_dim))
        if d.num_rows == 0:
            return empty
        f = t.filter(pa.array(~is_dim))
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dband = band[is_dim][order]
        dret = d["retail"].combine_chunks().to_numpy(zero_copy_only=False)[
            order
        ]
        n_parts = np.zeros(nb, np.int64)
        retail = np.zeros(nb, np.int64)
        n_lines = np.zeros(nb, np.int64)
        sum_qty = np.zeros(nb, np.int64)
        np.add.at(n_parts, dband, 1)
        np.add.at(retail, dband, dret)
        if f.num_rows:
            fg = f.group_by("k", use_threads=False).aggregate(
                [("n", "sum"), ("qty", "sum")]
            )
            fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
            fn = fg["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            fq = fg["qty_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
            hit = dk_s[pos] == fk
            np.add.at(n_lines, dband[pos][hit], fn[hit])
            np.add.at(sum_qty, dband[pos][hit], fq[hit])
        live = np.flatnonzero(n_parts)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "n_parts": pa.array(n_parts[live]),
                "retail_cents": pa.array(retail[live]),
                "n_lines": pa.array(n_lines[live]),
                "sum_qty": pa.array(sum_qty[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        acc = np.zeros((4, nb), np.int64)
        if t.num_rows:
            band = t["band"].combine_chunks().to_numpy(zero_copy_only=False)
            for i, c in enumerate(
                ["n_parts", "retail_cents", "n_lines", "sum_qty"]
            ):
                np.add.at(
                    acc[i],
                    band,
                    t[c].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "band": pa.array(np.arange(nb, dtype=np.int64)),
                "n_parts": pa.array(acc[0]),
                "retail_cents": pa.array(acc[1]),
                "n_lines": pa.array(acc[2]),
                "sum_qty": pa.array(acc[3]),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = parts.map_batches(dim_partial, batch_format="pyarrow")
    cells = _copartition_attach(fact, dim, fold, k=_rel_k(sf_dir, "lineitem"))
    return hash_partition_merge(cells, "band", merge, k=1)


def segment_priority_matrix(sf_dir: str) -> Dataset:
    """R43: market-segment × order-priority matrix — per (c_mktsegment,
    o_orderpriority): orders and floored o_totalprice revenue — the
    demand-mix cross R3 (segment × year) and R4 (priority × discount)
    each see one axis of: a segment whose priority mix skews URGENT
    buys expedited capacity; one skewing LOW is batchable — the
    fulfillment-planning cross only the customer ⋈ orders join can
    draw.  One dense row per (segment, priority) cell ALWAYS.  Exact
    int64 (join + two-key GROUP BY + CROSS JOIN densify oracle).

    Scale shape — ONE co-partitioned CUSTKEY exchange (R3's role-union;
    customers grow with the corpus — never broadcast): order batches
    pre-reduce to (custkey, priority-rank, n, rev) partials, customer
    dim rows ride carrying the segment rank; per-partition searchsorted
    attach re-reduces straight to the ≤ segments × priorities grid
    (two tiny exact value lists broadcast); k=1 densifying merge."""
    segs: list[str] = sorted(
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_mktsegment"])
        .unique("c_mktsegment")
    )
    seg_arr = pa.array(segs, pa.string())
    prios = list(_priority_rank(sf_dir))
    prio_arr = pa.array(prios, pa.string())
    nseg, npr = len(segs), len(prios)

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        seg = pc.cast(
            pc.index_in(b["c_mktsegment"], value_set=seg_arr), pa.int64()
        )
        z = pa.array(np.zeros(b.num_rows, np.int64))
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "seg": seg,
                "pr": pa.array(np.full(b.num_rows, -1, np.int64)),
                "n": z,
                "rev": z,
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        pr = pc.cast(
            pc.index_in(b["o_orderpriority"], value_set=prio_arr), pa.int64()
        )
        rev = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "pr": pr,
                "n": pa.array(np.ones(len(rev), np.int64)),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by(["k", "pr"], use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        g = g.rename_columns(["k", "pr", "n", "rev"])
        return pa.table(
            {
                "k": g["k"],
                "seg": pa.array(np.full(g.num_rows, -1, np.int64)),
                "pr": g["pr"],
                "n": pc.cast(g["n"], pa.int64()),
                "rev": pc.cast(g["rev"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        seg = t["seg"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = seg >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dseg = seg[is_dim][order]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fpr = f["pr"].combine_chunks().to_numpy(zero_copy_only=False)
        fn = f["n"].combine_chunks().to_numpy(zero_copy_only=False)
        fr = f["rev"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        cell = dseg[pos][hit] * npr + fpr[hit]
        nacc = np.zeros(nseg * npr, np.int64)
        racc = np.zeros(nseg * npr, np.int64)
        np.add.at(nacc, cell, fn[hit])
        np.add.at(racc, cell, fr[hit])
        live = np.flatnonzero(nacc)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "n": pa.array(nacc[live]),
                "rev": pa.array(racc[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nacc = np.zeros(nseg * npr, np.int64)
        racc = np.zeros(nseg * npr, np.int64)
        if t.num_rows:
            cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nacc,
                cell,
                t["n"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                racc,
                cell,
                t["rev"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        idx = np.arange(nseg * npr, dtype=np.int64)
        return pa.table(
            {
                "c_mktsegment": seg_arr.take(pa.array(idx // npr)),
                "o_orderpriority": prio_arr.take(pa.array(idx % npr)),
                "n_orders": pa.array(nacc),
                "revenue_floor": pa.array(racc),
            }
        )

    fact = ords.map_batches(fact_partial, batch_format="pyarrow")
    dim = cust.map_batches(dim_partial, batch_format="pyarrow")
    cells = _copartition_attach(fact, dim, fold, k=_rel_k(sf_dir, "orders"))
    return hash_partition_merge(cells, "cell", merge, k=1)


def balance_activity_stats(sf_dir: str) -> Dataset:
    """R44: balance↔activity sufficient statistics — per c_mktsegment:
    customers, Σbal, Σbal², Σorders, Σorders², Σbal·orders with bal =
    floor(c_acctbal) in WHOLE dollars — the exact-int64 normal
    equations of the "do rich customers order more" regression (Pearson
    /OLS off-line), E97's sufficient-statistic discipline on the
    relational axis (R31 thresholds rich customers; R44 keeps the whole
    joint second moment).  Dollars, not cents, for the SQUARED terms'
    int64 budget: (10⁴ dollars)² × 10¹⁰ customers ≈ 10¹⁸ < 2⁶³, where
    cents² would overflow 1000× over.  One dense row per segment ALWAYS
    (GROUP BY over the customer-defined segment set, never vacuous).
    Exact int64 (LEFT JOIN + SUM of products oracle; floor(negative)
    rounds toward −∞ identically in numpy and DuckDB).

    Scale shape — ONE co-partitioned CUSTKEY exchange (R3's role-union;
    customers grow with the corpus): order batches pre-reduce to
    (custkey, n) count partials, customer dim rows ride carrying
    (segment rank, bal); each partition settles every customer's exact
    order count (a customer's partials all co-locate), forms the six
    products locally, and re-reduces to one row per segment; k=1
    densifying merge (only the tiny segment value list broadcasts)."""
    segs: list[str] = sorted(
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_mktsegment"])
        .unique("c_mktsegment")
    )
    seg_arr = pa.array(segs, pa.string())
    nseg = len(segs)

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        seg = pc.cast(
            pc.index_in(b["c_mktsegment"], value_set=seg_arr), pa.int64()
        )
        bal = np.floor(
            b["c_acctbal"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "seg": seg,
                "bal": pa.array(bal),
                "n": pa.array(np.zeros(len(bal), np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate([("one", "sum")])
        g = g.rename_columns(["k", "n"])
        return pa.table(
            {
                "k": g["k"],
                "seg": pa.array(np.full(g.num_rows, -1, np.int64)),
                "bal": pa.array(np.zeros(g.num_rows, np.int64)),
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "seg": pa.array([], pa.int64()),
                "n_customers": pa.array([], pa.int64()),
                "sum_bal": pa.array([], pa.int64()),
                "sum_bal2": pa.array([], pa.int64()),
                "sum_orders": pa.array([], pa.int64()),
                "sum_orders2": pa.array([], pa.int64()),
                "sum_bal_orders": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        seg = t["seg"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = seg >= 0
        d = t.filter(pa.array(is_dim))
        if d.num_rows == 0:
            return empty
        f = t.filter(pa.array(~is_dim))
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dseg = seg[is_dim][order]
        dbal = d["bal"].combine_chunks().to_numpy(zero_copy_only=False)[
            order
        ]
        cnt = np.zeros(len(dk_s), np.int64)
        if f.num_rows:
            fg = f.group_by("k", use_threads=False).aggregate([("n", "sum")])
            fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
            fn = fg["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
            hit = dk_s[pos] == fk
            np.add.at(cnt, pos[hit], fn[hit])
        acc = np.zeros((6, nseg), np.int64)
        np.add.at(acc[0], dseg, 1)
        np.add.at(acc[1], dseg, dbal)
        np.add.at(acc[2], dseg, dbal * dbal)
        np.add.at(acc[3], dseg, cnt)
        np.add.at(acc[4], dseg, cnt * cnt)
        np.add.at(acc[5], dseg, dbal * cnt)
        live = np.flatnonzero(acc[0])
        return pa.table(
            {
                "seg": pa.array(live.astype(np.int64)),
                "n_customers": pa.array(acc[0][live]),
                "sum_bal": pa.array(acc[1][live]),
                "sum_bal2": pa.array(acc[2][live]),
                "sum_orders": pa.array(acc[3][live]),
                "sum_orders2": pa.array(acc[4][live]),
                "sum_bal_orders": pa.array(acc[5][live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        acc = np.zeros((6, nseg), np.int64)
        if t.num_rows:
            seg = t["seg"].combine_chunks().to_numpy(zero_copy_only=False)
            for i, c in enumerate(
                [
                    "n_customers",
                    "sum_bal",
                    "sum_bal2",
                    "sum_orders",
                    "sum_orders2",
                    "sum_bal_orders",
                ]
            ):
                np.add.at(
                    acc[i],
                    seg,
                    t[c].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "c_mktsegment": seg_arr,
                "n_customers": pa.array(acc[0]),
                "sum_bal": pa.array(acc[1]),
                "sum_bal2": pa.array(acc[2]),
                "sum_orders": pa.array(acc[3]),
                "sum_orders2": pa.array(acc[4]),
                "sum_bal_orders": pa.array(acc[5]),
            }
        )

    fact = ords.map_batches(fact_partial, batch_format="pyarrow")
    dim = cust.map_batches(dim_partial, batch_format="pyarrow")
    cells = _copartition_attach(fact, dim, fold, k=_rel_k(sf_dir, "orders"))
    return hash_partition_merge(cells, "seg", merge, k=1)


def seasonality(sf_dir: str) -> Dataset:
    """R45: order-seasonality profile — per calendar month 1-12 across
    ALL years: orders, floored o_totalprice revenue, and the DISTINCT
    years contributing (so a month's totals are readable as
    per-year-normalizable) — the month-of-year demand curve R3/R28 cut
    by year and R24 by month-SEQUENCE but nothing folds across years
    (inventory pre-positioning reads the fold, not the sequence).  One
    dense row per month ALWAYS.  Exact int64 (month()/year() GROUP BY +
    generate_series densify oracle).

    Scale shape — ZERO wide exchange: month and year are batch-local
    kernels; per batch one packed np.unique reduces orders to
    (month, year, n, rev) partials over a ≤ 12 × years domain; the k=1
    merge settles distinct-year counts exactly (every (month, year)
    cell co-locates) and densifies."""
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        months = ts.astype("datetime64[us]").astype("datetime64[M]")
        yr = months.astype("datetime64[Y]").astype(np.int64) + 1970
        mo = months.astype(np.int64) % 12 + 1
        rev = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        key = yr * 16 + mo
        t = pa.table(
            {
                "k": pa.array(key),
                "n": pa.array(np.ones(len(key), np.int64)),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["k", "n", "rev"])

    def merge(t: pa.Table) -> pa.Table:
        n_ord = np.zeros(13, np.int64)
        rev = np.zeros(13, np.int64)
        n_yr = np.zeros(13, np.int64)
        if t.num_rows:
            g = t.group_by("k", use_threads=False).aggregate(
                [("n", "sum"), ("rev", "sum")]
            )
            k = g["k"].combine_chunks().to_numpy(zero_copy_only=False)
            mo = k % 16
            np.add.at(
                n_ord,
                mo,
                g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                rev,
                mo,
                g["rev_sum"].combine_chunks().to_numpy(
                    zero_copy_only=False
                ),
            )
            np.add.at(n_yr, mo, 1)
        m = np.arange(1, 13, dtype=np.int64)
        return pa.table(
            {
                "month": pa.array(m),
                "n_orders": pa.array(n_ord[1:]),
                "revenue_floor": pa.array(rev[1:]),
                "n_years": pa.array(n_yr[1:]),
            }
        )

    partials = ords.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "k", merge, k=1)


def returns_trend(sf_dir: str) -> Dataset:
    """R46: returns trend board — per ship YEAR: lines, RETURNED lines
    (l_returnflag = 'R'), floored revenue cents, returned revenue cents
    — the quality-regression trend R1 freezes into one flag cut (a
    rising returned-revenue share year over year is a supplier-quality
    or product-mix drift; the year axis is what the review meeting
    plots).  GROUP BY shape over observed ship years (never vacuous —
    every year present has lines).  Exact int64 (year() + CASE + SUM
    oracle).

    Scale shape — ZERO wide exchange (R1's profile): year and flag are
    batch-local kernels; one floor + one np.add.at over the ≤ years
    domain reduces each batch to a handful of partials; k=1 merge."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_returnflag", "l_extendedprice"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts = (
            b["l_shipdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        yr = (
            ts.astype("datetime64[us]").astype("datetime64[Y]").astype(
                np.int64
            )
            + 1970
        )
        cents = np.floor(
            100.0
            * b["l_extendedprice"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        ret = (
            pc.equal(b["l_returnflag"], "R")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        t = pa.table(
            {
                "yr": pa.array(yr),
                "n": pa.array(np.ones(len(yr), np.int64)),
                "nr": pa.array(ret),
                "rev": pa.array(cents),
                "rrev": pa.array(cents * ret),
            }
        )
        g = t.group_by("yr", use_threads=False).aggregate(
            [("n", "sum"), ("nr", "sum"), ("rev", "sum"), ("rrev", "sum")]
        )
        return g.rename_columns(["yr", "n", "nr", "rev", "rrev"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "ship_year": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "returned_lines": pa.array([], pa.int64()),
                    "rev_cents": pa.array([], pa.int64()),
                    "returned_rev_cents": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("yr", use_threads=False).aggregate(
            [("n", "sum"), ("nr", "sum"), ("rev", "sum"), ("rrev", "sum")]
        )
        return g.rename_columns(
            [
                "ship_year",
                "n_lines",
                "returned_lines",
                "rev_cents",
                "returned_rev_cents",
            ]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "yr", merge, k=1)


def top_parts(sf_dir: str, top_k: int = 10) -> Dataset:
    """R47: top-k parts by discounted revenue (R9's Q10 shape pointed at
    the part axis) — the top_k parts by Σ floor(extprice·(1−disc)) with
    p_brand attached and line counts, ties p_partkey ASC, 1-based rank —
    the SKU drill-down behind R5's brand volume totals (the brand board
    says WHICH BRAND earns; the buyer negotiating a part contract needs
    WHICH PART).  Exact int64 (join + ORDER BY LIMIT oracle).

    Scale shape — ONE co-partitioned PARTKEY exchange + local top-k
    (R9's discipline): line batches pre-reduce to (partkey, n, rev)
    partials; part dim rows ride the exchange carrying the brand rank;
    each partition settles exact per-part totals, attaches the brand,
    and emits only its LOCAL top-k candidates — O(partitions × k) rows
    reach the k=1 merge's final sort; parts never broadcast, the full
    per-part total list never lands on one node."""
    brands: list[str] = sorted(
        rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_brand"])
        .unique("p_brand")
    )
    brand_arr = pa.array(brands, pa.string())

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        br = pc.cast(
            pc.index_in(b["p_brand"], value_set=brand_arr), pa.int64()
        )
        z = pa.array(np.zeros(b.num_rows, np.int64))
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "br": br,
                "n": z,
                "rev": z,
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        disc = b["l_discount"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        rev = np.floor(ext * (1.0 - disc)).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "one": pa.array(np.ones(len(rev), np.int64)),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate(
            [("one", "sum"), ("rev", "sum")]
        )
        g = g.rename_columns(["k", "n", "rev"])
        return pa.table(
            {
                "k": g["k"],
                "br": pa.array(np.full(g.num_rows, -1, np.int64)),
                "n": pc.cast(g["n"], pa.int64()),
                "rev": pc.cast(g["rev"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.array([], pa.int64()),
                "br": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        br = t["br"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = br >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dbr = br[is_dim][order]
        fg = f.group_by("k", use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fn = fg["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        fr = fg["rev_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        fk, fn, fr, fb = fk[hit], fn[hit], fr[hit], dbr[pos[hit]]
        # local top-k candidates: rev DESC, partkey ASC
        sel = np.lexsort((fk, -fr))[:top_k]
        return pa.table(
            {
                "k": pa.array(fk[sel].astype(np.int64)),
                "br": pa.array(fb[sel].astype(np.int64)),
                "n": pa.array(fn[sel].astype(np.int64)),
                "rev": pa.array(fr[sel].astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "p_partkey": pa.array([], pa.int64()),
                    "p_brand": pa.array([], pa.string()),
                    "n_lines": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        br = t["br"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = t["rev"].combine_chunks().to_numpy(zero_copy_only=False)
        sel = np.lexsort((k, -rev))[:top_k]
        return pa.table(
            {
                "p_partkey": pa.array(k[sel].astype(np.int64)),
                "p_brand": brand_arr.take(
                    pa.array(br[sel].astype(np.int64))
                ),
                "n_lines": pa.array(n[sel].astype(np.int64)),
                "revenue_floor": pa.array(rev[sel].astype(np.int64)),
                "rank": pa.array(
                    np.arange(1, len(sel) + 1, dtype=np.int64)
                ),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = parts.map_batches(dim_partial, batch_format="pyarrow")
    cells = _copartition_attach(fact, dim, fold, k=_rel_k(sf_dir, "lineitem"))
    return hash_partition_merge(cells, "k", merge, k=1)


def integrity_audit(sf_dir: str) -> Dataset:
    """R48: orderkey referential-integrity audit — ONE row: orders,
    lineitems, ORPHAN lines (orderkey not in orders) and CHILDLESS
    orders (no lines) — the relational sibling of the engine's reject
    lane and E114's id audit (the reference acks a message only after
    its row lands — `SURVEY.md §2.1 M6`; a star schema's equivalent
    invariant is referential closure, and this board is the check a
    loader runs before committing an epoch).  Exact int64 (two-sided
    anti-join count oracle).

    Scale shape — ONE co-partitioned ORDERKEY exchange (both sides grow
    with the corpus): line batches pre-reduce to (orderkey, n) partials,
    order keys ride as dim rows; each partition decides presence BOTH
    ways with one searchsorted (absence is decidable only under
    co-location — R18's anti-join rule) and reduces to a single
    4-tuple; k=1 merge sums O(partitions) rows."""
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "role": pa.array(np.zeros(b.num_rows, np.int64)),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate([("one", "sum")])
        g = g.rename_columns(["k", "n"])
        return pa.table(
            {
                "k": g["k"],
                "role": pa.array(np.ones(g.num_rows, np.int64)),
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "z": pa.array([], pa.int64()),
                    "no": pa.array([], pa.int64()),
                    "nl": pa.array([], pa.int64()),
                    "orphan": pa.array([], pa.int64()),
                    "childless": pa.array([], pa.int64()),
                }
            )
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        dk = np.sort(k[is_dim])
        fk = k[~is_dim]
        fn = n[~is_dim]
        # settle per-order line counts across batch partials
        fu, inv = np.unique(fk, return_inverse=True)
        fc = np.zeros(len(fu), np.int64)
        np.add.at(fc, inv, fn)
        if len(dk):
            pos = np.clip(np.searchsorted(dk, fu), 0, len(dk) - 1)
            in_orders = dk[pos] == fu
        else:
            in_orders = np.zeros(len(fu), bool)
        orphan = int(fc[~in_orders].sum())
        if len(fu):
            pos2 = np.clip(np.searchsorted(fu, dk), 0, len(fu) - 1)
            has_lines = fu[pos2] == dk
        else:
            has_lines = np.zeros(len(dk), bool)
        childless = int((~has_lines).sum())
        return pa.table(
            {
                "z": pa.array([0], pa.int64()),
                "no": pa.array([int(is_dim.sum())], pa.int64()),
                "nl": pa.array([int(fn.sum())], pa.int64()),
                "orphan": pa.array([orphan], pa.int64()),
                "childless": pa.array([childless], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        def s(c):
            if t.num_rows == 0:
                return 0
            return int(
                t[c].combine_chunks().to_numpy(zero_copy_only=False).sum()
            )

        return pa.table(
            {
                "n_orders": pa.array([s("no")], pa.int64()),
                "n_lineitems": pa.array([s("nl")], pa.int64()),
                "n_orphan_lines": pa.array([s("orphan")], pa.int64()),
                "n_childless_orders": pa.array([s("childless")], pa.int64()),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = ords.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "z", merge, k=1)


def brand_momentum(sf_dir: str) -> Dataset:
    """R49: brand revenue momentum — per (p_brand, ship year): lines,
    floored discounted revenue, and the YoY DELTA vs the brand's
    previous observed year (0 for its first year — R25's lag
    convention) — R25's yearly-growth window cut per brand (the
    category manager's question is which BRAND is gaining, not whether
    the book grew).  GROUP BY shape over observed (brand, year) cells.
    Exact int64 (join + two-key GROUP BY + lag window oracle).

    Scale shape — ONE co-partitioned PARTKEY exchange (R39's
    role-union; parts grow with the corpus): line batches pre-reduce to
    (partkey, year, n, rev) partials, part dim rows ride carrying the
    brand rank; per-partition searchsorted attach re-reduces to the
    ≤ brands × years domain; the k=1 merge settles cell totals and
    applies the lag along each brand's year axis (a driver-side
    O(brands × years) window, never corpus-sized)."""
    brands: list[str] = sorted(
        rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_brand"])
        .unique("p_brand")
    )
    brand_arr = pa.array(brands, pa.string())
    nb = len(brands)

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        br = pc.cast(
            pc.index_in(b["p_brand"], value_set=brand_arr), pa.int64()
        )
        z = pa.array(np.zeros(b.num_rows, np.int64))
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "br": br,
                "yr": pa.array(np.full(b.num_rows, -1, np.int64)),
                "n": z,
                "rev": z,
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        ts = (
            b["l_shipdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        yr = (
            ts.astype("datetime64[us]").astype("datetime64[Y]").astype(
                np.int64
            )
            + 1970
        )
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        disc = b["l_discount"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        rev = np.floor(ext * (1.0 - disc)).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "yr": pa.array(yr),
                "one": pa.array(np.ones(len(yr), np.int64)),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by(["k", "yr"], use_threads=False).aggregate(
            [("one", "sum"), ("rev", "sum")]
        )
        g = g.rename_columns(["k", "yr", "n", "rev"])
        return pa.table(
            {
                "k": g["k"],
                "br": pa.array(np.full(g.num_rows, -1, np.int64)),
                "yr": g["yr"],
                "n": pc.cast(g["n"], pa.int64()),
                "rev": pc.cast(g["rev"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        br = t["br"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = br >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dbr = br[is_dim][order]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fyr = f["yr"].combine_chunks().to_numpy(zero_copy_only=False)
        fn = f["n"].combine_chunks().to_numpy(zero_copy_only=False)
        fr = f["rev"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        cell = dbr[pos][hit] * 4096 + fyr[hit]
        t2 = pa.table(
            {
                "cell": pa.array(cell.astype(np.int64)),
                "n": pa.array(fn[hit]),
                "rev": pa.array(fr[hit]),
            }
        )
        g = t2.group_by("cell", use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["cell", "n", "rev"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "p_brand": pa.array([], pa.string()),
                    "ship_year": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                    "yoy_delta": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("cell", use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        cell = g["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = g["rev_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        br = cell // 4096
        yr = cell % 4096
        order = np.lexsort((yr, br))
        bro, yro, no, revo = br[order], yr[order], n[order], rev[order]
        delta = np.zeros(len(order), np.int64)
        same = np.zeros(len(order), bool)
        same[1:] = bro[1:] == bro[:-1]
        delta[same] = revo[same] - revo[np.flatnonzero(same) - 1]
        return pa.table(
            {
                "p_brand": brand_arr.take(
                    pa.array(bro.astype(np.int64))
                ),
                "ship_year": pa.array(yro.astype(np.int64)),
                "n_lines": pa.array(no.astype(np.int64)),
                "revenue_floor": pa.array(revo.astype(np.int64)),
                "yoy_delta": pa.array(delta),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = parts.map_batches(dim_partial, batch_format="pyarrow")
    cells = _copartition_attach(fact, dim, fold, k=_rel_k(sf_dir, "lineitem"))
    return hash_partition_merge(cells, "cell", merge, k=1)


def revenue_pareto(
    sf_dir: str, targets: tuple[int, ...] = (500, 800, 900, 990)
) -> Dataset:
    """R50: customer revenue-concentration Pareto — for each target p
    (permille of ALL floored order revenue): the MINIMAL number of
    customers whose lifetime order value covers that share, plus total
    customers-with-orders and total revenue — E61's whale curve on the
    revenue axis (the account-management headcount question: how many
    relationships cover 99% of the book).  Unique under ties (equal
    revenues add equal mass — order-free), exact int64
    (row_number-over-revenue-DESC + running-sum oracle, E61's shape).

    Scale shape — E61's machinery verbatim with revenue as the mass:
    order batches pre-reduce to (custkey, Σfloor(totalprice)) partials;
    ONE custkey-hash exchange settles exact per-customer revenue and
    re-reduces to (revenue, n_customers) histogram partials (distinct
    revenue values, NOT customers, bound the exchange); the k=1 merge
    sorts the histogram once and reads every target off two cumulative
    sums (`events._pareto_from_hist`)."""
    from .events import _pareto_from_hist

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        rev = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "v": pa.array(rev),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate([("v", "sum")])
        return g.rename_columns(["k", "v"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "v": pa.array([], pa.int64()),
                    "f": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("k", use_threads=False).aggregate([("v", "sum")])
        h = g.group_by("v_sum", use_threads=False).aggregate(
            [("v_sum", "count")]
        )
        return h.rename_columns(["v", "f"])

    names = tuple(f"customers_p{p // 10}" for p in targets)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "total_customers": pa.array([0], pa.int64()),
                    "total_revenue": pa.array([0], pa.int64()),
                    **{c: pa.array([0], pa.int64()) for c in names},
                }
            )
        g = t.group_by("v", use_threads=False).aggregate([("f", "sum")])
        vals = g["v"].combine_chunks().to_numpy(zero_copy_only=False)
        freq = g["f_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        counts, n_units, total = _pareto_from_hist(vals, freq, targets)
        out = {
            "total_customers": pa.array([n_units], pa.int64()),
            "total_revenue": pa.array([total], pa.int64()),
        }
        for c, v in zip(names, counts):
            out[c] = pa.array([int(v)], pa.int64())
        return pa.table(out)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    hist = hash_partition_merge(
        partials, "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(hist, "v", merge, k=1)


def dead_stock(sf_dir: str) -> Dataset:
    """R51: dead-stock board (TPC-H Q20's "excess inventory" question
    asked of this schema) — per brand: catalog parts, parts NEVER
    referenced by any lineitem, the floored retail value of that dead
    stock, and its permille share of the catalog — the
    assortment-pruning read next to R47's top-parts concentration (R47
    ranks what sells; R51 prices what never did — the capital the
    catalog holds in SKUs the order book has never touched).  One
    dense row per brand ALWAYS (all brands exist in part).  Exact
    int64 (two-sided NOT EXISTS + floor + permille divide oracle).

    Scale shape — ONE co-partitioned PARTKEY exchange (both sides grow
    with the corpus; parts in TPC-H scale 1:5 with lines): line
    batches pre-reduce to distinct partkeys per batch, part rows ride
    as dim rows carrying (brand, floor(retail)); absence is decidable
    only under co-location (R18's anti-join rule), so each partition
    decides dead-ness with one searchsorted and reduces to ≤ brands
    partial rows; the string-keyed final merge is R1's
    groupby.map_groups convention over O(partitions × brands) rows."""
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_retailprice"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        rv = np.floor(
            b["p_retailprice"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        ).astype(np.int64)
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "role": pa.array(np.zeros(b.num_rows, np.int64)),
                "brand": b["p_brand"],
                "rv": pa.array(rv),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        ks = np.unique(
            pc.cast(b["l_partkey"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        m = len(ks)
        return pa.table(
            {
                "k": pa.array(ks, pa.int64()),
                "role": pa.array(np.ones(m, np.int64)),
                "brand": pa.array([""] * m, pa.string()),
                "rv": pa.array(np.zeros(m, np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "brand": pa.array([], pa.string()),
                    "np_": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "dv": pa.array([], pa.int64()),
                }
            )
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        fk = np.unique(k[~is_dim])
        dk = k[is_dim]
        rv = t["rv"].combine_chunks().to_numpy(zero_copy_only=False)[
            is_dim
        ]
        brand = t["brand"].combine_chunks().filter(
            pa.array(is_dim)
        )
        if len(fk):
            pos = np.clip(np.searchsorted(fk, dk), 0, len(fk) - 1)
            dead = fk[pos] != dk
        else:
            dead = np.ones(len(dk), bool)
        g = pa.table(
            {
                "brand": brand,
                "np_": pa.array(np.ones(len(dk), np.int64)),
                "nd": pa.array(dead.astype(np.int64)),
                "dv": pa.array(np.where(dead, rv, 0)),
            }
        ).group_by("brand", use_threads=False).aggregate(
            [("np_", "sum"), ("nd", "sum"), ("dv", "sum")]
        )
        return g.rename_columns(["brand", "np_", "nd", "dv"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("brand", use_threads=False).aggregate(
            [("np_", "sum"), ("nd", "sum"), ("dv", "sum")]
        )
        np_ = g["np__sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nd = g["nd_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        dv = g["dv_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "brand": g["brand"],
                "n_parts": pa.array(np_.astype(np.int64)),
                "n_dead": pa.array(nd.astype(np.int64)),
                "dead_value": pa.array(dv.astype(np.int64)),
                "dead_permille": pa.array(
                    (1000 * nd // np.maximum(np_, 1)).astype(np.int64)
                ),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = parts.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return cells.groupby("brand").map_groups(
        merge, batch_format="pyarrow"
    )


def part_competition(sf_dir: str) -> Dataset:
    """R52: part supplier-competition histogram — for each supplier
    count s (including 0): catalog parts served by exactly s distinct
    suppliers and their floored retail value — the supply-chain
    RESILIENCE distribution (R10 asks how many suppliers a BRAND has;
    R51 prices the never-ordered tail; R52 asks how much of the
    catalog sits one supplier failure away from stock-out — the
    single-source-risk mass a procurement review hedges first).
    Aggregate-of-aggregates (E36's rule) over a per-part distinct
    count; s = 0 rows come from R51's anti-join side, so the board is
    the whole catalog partitioned by contestedness.  Exact int64
    (count(DISTINCT) + LEFT JOIN + two-level GROUP BY oracle).

    Scale shape — ONE co-partitioned PARTKEY exchange (both sides
    corpus-scaled): line batches pre-reduce to distinct (partkey,
    suppkey) pairs (one Arrow group_by — the combiner), part rows ride
    as dim rows carrying floor(retail); each partition re-dedupes its
    pairs exactly (the cell settles under co-location), reads each
    part's supplier count off one np.unique, decides absence with one
    searchsorted (R18's anti-join rule) and re-reduces IN PLACE to
    (s, n_parts, value) partials over the tiny observed-s domain; k=1
    merge sums.  Reference parity: the consumer-pool sizing question
    (`internal/consumer/consumer.go` worker fan-out) asked of the
    supply graph."""
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_retailprice"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        rv = np.floor(
            b["p_retailprice"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        ).astype(np.int64)
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "role": pa.array(np.zeros(b.num_rows, np.int64)),
                "sup": pa.array(np.zeros(b.num_rows, np.int64)),
                "rv": pa.array(rv),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "sup": pc.cast(b["l_suppkey"], pa.int64()),
            }
        )
        g = t.group_by(["k", "sup"], use_threads=False).aggregate(
            [("sup", "count")]
        )
        m = g.num_rows
        return pa.table(
            {
                "k": g["k"],
                "role": pa.array(np.ones(m, np.int64)),
                "sup": g["sup"],
                "rv": pa.array(np.zeros(m, np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "ns": pa.array([], pa.int64()),
                    "np_": pa.array([], pa.int64()),
                    "val": pa.array([], pa.int64()),
                }
            )
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        sup = t["sup"].combine_chunks().to_numpy(zero_copy_only=False)
        rv = t["rv"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        dk, drv = k[is_dim], rv[is_dim]
        fk, fs = k[~is_dim], sup[~is_dim]
        # cross-batch dedupe of (partkey, suppkey) pairs, then the
        # per-part distinct-supplier count off one unique pass
        if len(fk):
            order = np.lexsort((fs, fk))
            fk, fs = fk[order], fs[order]
            keep = np.ones(len(fk), bool)
            keep[1:] = (fk[1:] != fk[:-1]) | (fs[1:] != fs[:-1])
            fk = fk[keep]
            uk, ucnt = np.unique(fk, return_counts=True)
        else:
            uk = np.zeros(0, np.int64)
            ucnt = np.zeros(0, np.int64)
        if len(uk):
            pos = np.clip(np.searchsorted(uk, dk), 0, len(uk) - 1)
            ns = np.where(uk[pos] == dk, ucnt[pos], 0).astype(np.int64)
        else:
            ns = np.zeros(len(dk), np.int64)
        vals, inv = np.unique(ns, return_inverse=True)
        val = np.zeros(len(vals), np.int64)
        np.add.at(val, inv, drv)
        return pa.table(
            {
                "ns": pa.array(vals.astype(np.int64)),
                "np_": pa.array(np.bincount(inv).astype(np.int64)),
                "val": pa.array(val),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_suppliers": pa.array([0], pa.int64()),
                    "n_parts": pa.array([0], pa.int64()),
                    "catalog_value": pa.array([0], pa.int64()),
                }
            )
        g = t.group_by("ns", use_threads=False).aggregate(
            [("np_", "sum"), ("val", "sum")]
        )
        return pa.table(
            {
                "n_suppliers": pc.cast(g["ns"], pa.int64()),
                "n_parts": pc.cast(g["np__sum"], pa.int64()),
                "catalog_value": pc.cast(g["val_sum"], pa.int64()),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = parts.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "ns", merge, k=1)


def value_recon(sf_dir: str) -> Dataset:
    """R53: order-value reconciliation audit — per o_orderstatus:
    orders, CHILDLESS orders (no lines — R48's finding priced), the
    total absolute delta between the order header's floored
    o_totalprice and the sum of its lines' floored charges
    floor(extprice·(1−disc)·(1+tax)), and the discrete p50/p90 of the
    per-order RELATIVE delta in permille of the header price — the
    monetary closure check a loader runs after R48's referential one
    (the reference acks a message only after the row lands, M6; a
    star-schema epoch commits only when header and detail money
    reconcile — this board says by how much they don't, and whether
    the gap is a few bad orders or systemic).  Per-line flooring makes
    both sides exact int64 (floor-per-line + LEFT JOIN + permille +
    quantile_disc oracle); the permille domain is bounded by the
    line-to-header price ratio (≲ a few thousand distinct values), so
    the T21 histogram rule applies.

    Scale shape — ONE co-partitioned ORDERKEY exchange (R48's shape
    with money riding): line batches pre-reduce to per-order
    Σfloor(charge) int64 partials; order headers ride as dim rows
    carrying (status, floor(totalprice)); each partition settles its
    orders' line sums exactly, computes per-order |delta| and permille
    and re-reduces IN PLACE to (status, permille) histogram partials
    with n/childless/Σ|delta| riding; the string-keyed final merge
    (R1's groupby.map_groups convention) reads the quantiles off one
    cumsum per status."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        tp = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        ).astype(np.int64)
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "role": pa.array(np.zeros(b.num_rows, np.int64)),
                "status": b["o_orderstatus"],
                "v": pa.array(tp),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        ep = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        di = b["l_discount"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        tx = b["l_tax"].combine_chunks().to_numpy(zero_copy_only=False)
        charge = np.floor(ep * (1 - di) * (1 + tx)).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "v": pa.array(charge),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate([("v", "sum")])
        m = g.num_rows
        return pa.table(
            {
                "k": g["k"],
                "role": pa.array(np.ones(m, np.int64)),
                "status": pa.array([""] * m, pa.string()),
                "v": pc.cast(g["v_sum"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "status": pa.array([], pa.string()),
                    "pm": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "nc": pa.array([], pa.int64()),
                    "ad": pa.array([], pa.int64()),
                }
            )
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        dk, tp = k[is_dim], v[is_dim]
        status = t["status"].combine_chunks().filter(pa.array(is_dim))
        fk, fv = k[~is_dim], v[~is_dim]
        if len(fk):
            uk, inv = np.unique(fk, return_inverse=True)
            us = np.zeros(len(uk), np.int64)
            np.add.at(us, inv, fv)
            pos = np.clip(np.searchsorted(uk, dk), 0, len(uk) - 1)
            hit = uk[pos] == dk
            s = np.where(hit, us[pos], 0)
        else:
            hit = np.zeros(len(dk), bool)
            s = np.zeros(len(dk), np.int64)
        ad = np.abs(tp - s)
        pm = 1000 * ad // np.maximum(tp, 1)
        g = pa.table(
            {
                "status": status,
                "pm": pa.array(pm),
                "n": pa.array(np.ones(len(dk), np.int64)),
                "nc": pa.array((~hit).astype(np.int64)),
                "ad": pa.array(ad),
            }
        ).group_by(["status", "pm"], use_threads=False).aggregate(
            [("n", "sum"), ("nc", "sum"), ("ad", "sum")]
        )
        return g.rename_columns(["status", "pm", "n", "nc", "ad"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["status", "pm"], use_threads=False).aggregate(
            [("n", "sum"), ("nc", "sum"), ("ad", "sum")]
        )
        pm = g["pm"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(pm, kind="stable")
        pm, n = pm[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])
        out = {
            "status": g["status"][:1],
            "n_orders": pa.array([total], pa.int64()),
            "n_childless": pa.array(
                [int(pc.sum(g["nc_sum"]).as_py() or 0)], pa.int64()
            ),
            "sum_abs_delta": pa.array(
                [int(pc.sum(g["ad_sum"]).as_py() or 0)], pa.int64()
            ),
        }
        for name, q in (("p50_permille", 500), ("p90_permille", 900)):
            thr = (total * q + 999) // 1000
            pos = int(np.searchsorted(cum, thr, side="left"))
            out[name] = pa.array([int(pm[pos])], pa.int64())
        return pa.table(out)

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = orders.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return cells.groupby("status").map_groups(
        merge, batch_format="pyarrow"
    )


def first_order_value(sf_dir: str) -> Dataset:
    """R54: first-order predictiveness board — per c_mktsegment:
    customers with ≥1 order, REPEAT customers (≥2), the floored
    o_totalprice of each customer's FIRST order (earliest o_orderdate,
    ties broken by o_orderkey ASC — deterministic under the 32
    same-day tie groups in the data) summed per segment, lifetime
    floored order value, and the first-order permille of lifetime —
    the acquisition-quality read (a segment whose first orders carry
    most of its lifetime value buys once and churns; a low permille
    funds retention spend) next to R37's brand-loyalty pairs and R19's
    LTV digit bands, neither of which attributes value to ORDER RANK.
    Exact int64 (row_number window + JOIN + permille oracle).

    Scale shape — ONE co-partitioned CUSTKEY exchange (orders and
    customers both corpus-scaled): order batches pre-reduce per
    customer to (n, Σfloor, argmin-(date, orderkey) carry with its
    value) partials — the first-order value is a lexicographic-min
    REDUCTION, so it rides the same exchange as the sums; customer
    rows ride as dim rows carrying the segment; each partition settles
    every customer exactly (one lexsort, first-row-per-key wins) and
    re-reduces IN PLACE to per-segment partials; string-keyed final
    merge (R1's convention)."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderdate", "o_orderkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )

    def fact_partial(b: pa.Table) -> pa.Table:
        k = pc.cast(b["o_custkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        v = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        ).astype(np.int64)
        d = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ok = pc.cast(b["o_orderkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((ok, d, k))
        k, v, d, ok = k[order], v[order], d[order], ok[order]
        first = np.ones(len(k), bool)
        first[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(first)
        uk = k[starts]
        n = np.diff(np.r_[starts, len(k)]).astype(np.int64)
        sums = np.add.reduceat(v, starts) if len(k) else np.zeros(0, np.int64)
        return pa.table(
            {
                "k": pa.array(uk),
                "role": pa.array(np.ones(len(uk), np.int64)),
                "seg": pa.array([""] * len(uk), pa.string()),
                "n": pa.array(n),
                "sv": pa.array(sums.astype(np.int64)),
                "fd": pa.array(d[starts]),
                "fo": pa.array(ok[starts]),
                "fv": pa.array(v[starts]),
            }
        )

    def dim_partial(b: pa.Table) -> pa.Table:
        m = b.num_rows
        z = pa.array(np.zeros(m, np.int64))
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "role": z,
                "seg": b["c_mktsegment"],
                "n": z,
                "sv": z,
                "fd": z,
                "fo": z,
                "fv": z,
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "seg": pa.array([], pa.string()),
                    "nc": pa.array([], pa.int64()),
                    "nr": pa.array([], pa.int64()),
                    "sf": pa.array([], pa.int64()),
                    "sl": pa.array([], pa.int64()),
                }
            )
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        ft = t.filter(pa.array(~is_dim))
        dt = t.filter(pa.array(is_dim))
        k = ft["k"].combine_chunks().to_numpy(zero_copy_only=False)
        n = ft["n"].combine_chunks().to_numpy(zero_copy_only=False)
        sv = ft["sv"].combine_chunks().to_numpy(zero_copy_only=False)
        fd = ft["fd"].combine_chunks().to_numpy(zero_copy_only=False)
        fo = ft["fo"].combine_chunks().to_numpy(zero_copy_only=False)
        fv = ft["fv"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((fo, fd, k))
        k, n, sv, fd, fo, fv = (
            a[order] for a in (k, n, sv, fd, fo, fv)
        )
        first = np.ones(len(k), bool)
        first[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(first)
        uk = k[starts]
        nn = np.zeros(len(uk), np.int64)
        ss = np.zeros(len(uk), np.int64)
        gid = np.cumsum(first) - 1
        np.add.at(nn, gid, n)
        np.add.at(ss, gid, sv)
        firstv = fv[starts]
        dk = dt["k"].combine_chunks().to_numpy(zero_copy_only=False)
        seg = dt["seg"].combine_chunks()
        if len(uk):
            pos = np.clip(np.searchsorted(uk, dk), 0, len(uk) - 1)
            hit = uk[pos] == dk
        else:
            pos = np.zeros(len(dk), np.int64)
            hit = np.zeros(len(dk), bool)
        live = np.flatnonzero(hit)
        if not len(live):
            return pa.table(
                {
                    "seg": pa.array([], pa.string()),
                    "nc": pa.array([], pa.int64()),
                    "nr": pa.array([], pa.int64()),
                    "sf": pa.array([], pa.int64()),
                    "sl": pa.array([], pa.int64()),
                }
            )
        p = pos[live]
        g = pa.table(
            {
                "seg": seg.take(pa.array(live.astype(np.int64))),
                "nc": pa.array(np.ones(len(live), np.int64)),
                "nr": pa.array((nn[p] >= 2).astype(np.int64)),
                "sf": pa.array(firstv[p]),
                "sl": pa.array(ss[p]),
            }
        ).group_by("seg", use_threads=False).aggregate(
            [("nc", "sum"), ("nr", "sum"), ("sf", "sum"), ("sl", "sum")]
        )
        return g.rename_columns(["seg", "nc", "nr", "sf", "sl"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("seg", use_threads=False).aggregate(
            [("nc", "sum"), ("nr", "sum"), ("sf", "sum"), ("sl", "sum")]
        )
        sf = int(pc.sum(g["sf_sum"]).as_py() or 0)
        sl = int(pc.sum(g["sl_sum"]).as_py() or 0)
        return pa.table(
            {
                "segment": g["seg"][:1],
                "n_customers": pc.cast(g["nc_sum"], pa.int64())[:1],
                "n_repeat": pc.cast(g["nr_sum"], pa.int64())[:1],
                "sum_first": pa.array([sf], pa.int64()),
                "sum_lifetime": pa.array([sl], pa.int64()),
                "first_permille": pa.array(
                    [1000 * sf // max(sl, 1)], pa.int64()
                ),
            }
        )

    fact = orders.map_batches(fact_partial, batch_format="pyarrow")
    dim = cust.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return cells.groupby("seg").map_groups(merge, batch_format="pyarrow")


def supplier_balance_corr(sf_dir: str) -> Dataset:
    """R55: supplier credit-volume correlation board — per nation:
    suppliers, Σ shipped lines, Σ floor(100·s_acctbal) cents, and the
    exact int64 cross moments Σ bal·lines, Σ lines², Σ bal² — Pearson
    "does credit-worthiness track shipped volume" offline, the
    CONTINUOUS read next to R40's negative-balance exposure split
    (R40 prices the already-distressed tail; R55 asks whether balance
    predicts volume across the whole book — a strong negative
    correlation means the busiest suppliers are draining credit, the
    early-warning version of R40).  Suppliers with zero lines count
    with lines = 0 (absence decided under co-location — R18's rule).
    One row per nation with ≥1 supplier; exact int64 (floor-cents +
    LEFT JOIN + SUM oracle; bal² ≲ 4·10¹² per supplier — ~10⁶
    suppliers/nation within int64).

    Scale shape — ONE co-partitioned SUPPKEY exchange (lines and
    suppliers both corpus-scaled): line batches pre-reduce to
    (suppkey, n) partials; supplier rows ride carrying (nationkey,
    bal cents); each partition settles per-supplier line counts
    exactly, computes the products, and re-reduces IN PLACE to
    per-nation partials; the k=1 merge sums and attaches the 25
    broadcast nation names (the only driver-composed dim)."""
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat = nat.sort_values("n_nationkey").reset_index(drop=True)
    names = pa.array(nat["n_name"].tolist(), pa.string())
    keys = np.array(nat["n_nationkey"], np.int64)

    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey", "s_acctbal"],
        override_num_blocks=_rel_k(sf_dir, "supplier"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def fact_partial(b: pa.Table) -> pa.Table:
        k, cnt = np.unique(
            pc.cast(b["l_suppkey"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        m = len(k)
        return pa.table(
            {
                "k": pa.array(k.astype(np.int64)),
                "role": pa.array(np.ones(m, np.int64)),
                "nk": pa.array(np.zeros(m, np.int64)),
                "v": pa.array(cnt.astype(np.int64)),
            }
        )

    def dim_partial(b: pa.Table) -> pa.Table:
        bal = np.floor(
            100
            * b["s_acctbal"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        ).astype(np.int64)
        return pa.table(
            {
                "k": pc.cast(b["s_suppkey"], pa.int64()),
                "role": pa.array(np.zeros(b.num_rows, np.int64)),
                "nk": pc.cast(b["s_nationkey"], pa.int64()),
                "v": pa.array(bal),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ["nk", "nsupp", "sl", "sb", "sxy", "sxx", "syy"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        nk = t["nk"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        dk, dnk, bal = k[is_dim], nk[is_dim], v[is_dim]
        fk, fn = k[~is_dim], v[~is_dim]
        if len(fk):
            uk, inv = np.unique(fk, return_inverse=True)
            un = np.zeros(len(uk), np.int64)
            np.add.at(un, inv, fn)
            pos = np.clip(np.searchsorted(uk, dk), 0, len(uk) - 1)
            nl = np.where(uk[pos] == dk, un[pos], 0)
        else:
            nl = np.zeros(len(dk), np.int64)
        uvals, ginv = np.unique(dnk, return_inverse=True)
        acc = {c: np.zeros(len(uvals), np.int64) for c in cols[1:]}
        np.add.at(acc["nsupp"], ginv, 1)
        np.add.at(acc["sl"], ginv, nl)
        np.add.at(acc["sb"], ginv, bal)
        np.add.at(acc["sxy"], ginv, bal * nl)
        np.add.at(acc["sxx"], ginv, nl * nl)
        np.add.at(acc["syy"], ginv, bal * bal)
        out = {"nk": pa.array(uvals.astype(np.int64))}
        out.update({c: pa.array(acc[c]) for c in cols[1:]})
        return pa.table(out)

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("nk", use_threads=False).aggregate(
            [
                ("nsupp", "sum"),
                ("sl", "sum"),
                ("sb", "sum"),
                ("sxy", "sum"),
                ("sxx", "sum"),
                ("syy", "sum"),
            ]
        )
        nk = g["nk"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, nk)
        return pa.table(
            {
                "nation": names.take(pa.array(pos.astype(np.int64))),
                "n_suppliers": pc.cast(g["nsupp_sum"], pa.int64()),
                "sum_lines": pc.cast(g["sl_sum"], pa.int64()),
                "sum_bal": pc.cast(g["sb_sum"], pa.int64()),
                "sum_xy": pc.cast(g["sxy_sum"], pa.int64()),
                "sum_xx": pc.cast(g["sxx_sum"], pa.int64()),
                "sum_yy": pc.cast(g["syy_sum"], pa.int64()),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = supp.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "nk", merge, k=1)


def brand_lifecycle(sf_dir: str) -> Dataset:
    """R56: brand lifecycle board — per p_brand: first and last ship
    YEAR, distinct active years, and total shipped lines — the catalog
    introduction/retirement read (R49 asks which brand is GROWING year
    over year; R56 when each brand entered and left the book at all —
    a brand with a long span but few active years ships in bursts, the
    assortment-planning dual of R51's never-sold tail).  One row per
    brand with ≥1 line; exact int64 (join + year() + min/max/
    count(DISTINCT) oracle).

    Scale shape — ONE co-partitioned PARTKEY exchange (R49's shape):
    line batches pre-reduce to (partkey, ship-year, n) partials via
    one packed np.unique (the year axis is calendar-bounded); part
    rows ride carrying the brand rank; each partition attaches brands
    with one searchsorted and re-reduces IN PLACE to the ≤ brands ×
    years domain; the string-keyed final merge (R1's convention)
    settles cell totals and folds min/max/distinct along each brand's
    year axis — O(brands × years × partitions) rows, never
    corpus-sized."""
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def fact_partial(b: pa.Table) -> pa.Table:
        k = (
            pc.cast(b["l_partkey"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        y = (
            pc.cast(pc.year(b["l_shipdate"]), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = k * 8192 + y
        vals, cnt = np.unique(packed, return_counts=True)
        m = len(vals)
        return pa.table(
            {
                "k": pa.array((vals // 8192).astype(np.int64)),
                "role": pa.array(np.ones(m, np.int64)),
                "brand": pa.array([""] * m, pa.string()),
                "y": pa.array((vals % 8192).astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def dim_partial(b: pa.Table) -> pa.Table:
        m = b.num_rows
        z = pa.array(np.zeros(m, np.int64))
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "role": z,
                "brand": b["p_brand"],
                "y": z,
                "n": z,
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "brand": pa.array([], pa.string()),
                    "y": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        dk = k[is_dim]
        brand = t["brand"].combine_chunks().filter(pa.array(is_dim))
        fk = k[~is_dim]
        fy = t["y"].combine_chunks().to_numpy(zero_copy_only=False)[
            ~is_dim
        ]
        fn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)[
            ~is_dim
        ]
        if not len(fk):
            return pa.table(
                {
                    "brand": pa.array([], pa.string()),
                    "y": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        # lines reference existing parts (R48 audits violations)
        bidx = order[pos]
        g = pa.table(
            {
                "brand": brand.take(pa.array(bidx.astype(np.int64))),
                "y": pa.array(fy),
                "n": pa.array(fn),
            }
        ).group_by(["brand", "y"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["brand", "y", "n"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["brand", "y"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        y = g["y"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "brand": g["brand"][:1],
                "first_year": pa.array([int(y.min())], pa.int64()),
                "last_year": pa.array([int(y.max())], pa.int64()),
                "n_years": pa.array([len(np.unique(y))], pa.int64()),
                "n_lines": pa.array([int(n.sum())], pa.int64()),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = parts.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return cells.groupby("brand").map_groups(
        merge, batch_format="pyarrow"
    )


def shipment_spread(sf_dir: str) -> Dataset:
    """R57: intra-order shipment-spread quantiles — per
    o_orderpriority: multi-line orders (≥2 lines) and discrete
    p50/p90/max of the calendar-day spread between the order's FIRST
    and LAST line shipment — fulfillment COHERENCE (R20 measures how
    late lines ship after the order date; R57 how far apart one
    order's lines straggle — a priority class whose spread grows is
    split-shipping its orders, the picking-consolidation knob).
    Exact int64 under the quantile_disc rank rule (per-order min/max
    + date_diff('day') + quantile_disc oracle; priority identity is
    the exact broadcast rank — R20's convention).

    Scale shape — ONE co-partitioned ORDERKEY exchange (R2's shape
    with a min/max carry): line batches pre-reduce per order to
    (n, min ship-day, max ship-day) partials — spread is a
    min/max REDUCTION so it rides the same exchange as the count;
    order headers ride carrying the priority rank; each partition
    settles every order exactly and re-reduces IN PLACE to
    (priority, spread-days) histogram partials (day domain
    calendar-bounded — T21's histogram rule); quantiles read off one
    cumsum per priority in the k=1 merge."""
    pris = _priority_rank(sf_dir)
    pri_arr = pa.array(list(pris), pa.string())
    npri = len(pris)
    DAY_US = 86_400_000_000

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def fact_partial(b: pa.Table) -> pa.Table:
        k = (
            pc.cast(b["l_orderkey"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        d = (
            b["l_shipdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            // DAY_US
        )
        order = np.argsort(k, kind="stable")
        k, d = k[order], d[order]
        first = np.ones(len(k), bool)
        first[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(first)
        gid = np.cumsum(first) - 1
        m = len(starts)
        n = np.diff(np.r_[starts, len(k)]).astype(np.int64)
        mn = np.full(m, np.iinfo(np.int64).max)
        mx = np.full(m, -1, np.int64)
        np.minimum.at(mn, gid, d)
        np.maximum.at(mx, gid, d)
        return pa.table(
            {
                "k": pa.array(k[starts]),
                "role": pa.array(np.ones(m, np.int64)),
                "p": pa.array(np.zeros(m, np.int64)),
                "n": pa.array(n),
                "mn": pa.array(mn),
                "mx": pa.array(mx),
            }
        )

    def dim_partial(b: pa.Table) -> pa.Table:
        m = b.num_rows
        z = pa.array(np.zeros(m, np.int64))
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "role": z,
                "p": pc.cast(
                    pc.index_in(b["o_orderpriority"], value_set=pri_arr),
                    pa.int64(),
                ),
                "n": z,
                "mn": z,
                "mx": z,
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"ps": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        dk = k[is_dim]
        dp = t["p"].combine_chunks().to_numpy(zero_copy_only=False)[
            is_dim
        ]
        fk = k[~is_dim]
        fn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)[
            ~is_dim
        ]
        fmn = t["mn"].combine_chunks().to_numpy(zero_copy_only=False)[
            ~is_dim
        ]
        fmx = t["mx"].combine_chunks().to_numpy(zero_copy_only=False)[
            ~is_dim
        ]
        if not len(fk):
            return pa.table(
                {"ps": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        uk, inv = np.unique(fk, return_inverse=True)
        n = np.zeros(len(uk), np.int64)
        mn = np.full(len(uk), np.iinfo(np.int64).max)
        mx = np.full(len(uk), -1, np.int64)
        np.add.at(n, inv, fn)
        np.minimum.at(mn, inv, fmn)
        np.maximum.at(mx, inv, fmx)
        pos = np.clip(np.searchsorted(uk, dk), 0, len(uk) - 1)
        hit = (uk[pos] == dk) & (n[pos] >= 2)
        live = np.flatnonzero(hit)
        if not len(live):
            return pa.table(
                {"ps": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        p = live
        spread = mx[pos[p]] - mn[pos[p]]
        ps = dp[p] * (1 << 40) + spread
        vals, cnt = np.unique(ps, return_counts=True)
        return pa.table(
            {
                "ps": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = {
            "priority": [], "n_orders": [], "p50_days": [],
            "p90_days": [], "max_days": [],
        }
        if t.num_rows:
            g = t.group_by("ps", use_threads=False).aggregate(
                [("n", "sum")]
            )
            ps = g["ps"].combine_chunks().to_numpy(zero_copy_only=False)
            n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.argsort(ps, kind="stable")
            ps, n = ps[order], n[order]
            pr = ps >> 40
            sp = ps & ((1 << 40) - 1)
            for pi in np.unique(pr):
                m = pr == pi
                sv, nv = sp[m], n[m]
                cum = np.cumsum(nv)
                total = int(cum[-1])
                out["priority"].append(pris[int(pi)])
                out["n_orders"].append(total)
                for key, q in (("p50_days", 500), ("p90_days", 900)):
                    thr = (total * q + 999) // 1000
                    out[key].append(
                        int(sv[np.searchsorted(cum, thr, side="left")])
                    )
                out["max_days"].append(int(sv[-1]))
        return pa.table(
            {
                "priority": pa.array(out["priority"], pa.string()),
                "n_orders": pa.array(
                    np.array(out["n_orders"], np.int64)
                ),
                "p50_days": pa.array(
                    np.array(out["p50_days"], np.int64)
                ),
                "p90_days": pa.array(
                    np.array(out["p90_days"], np.int64)
                ),
                "max_days": pa.array(
                    np.array(out["max_days"], np.int64)
                ),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = orders.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "ps", merge, k=1)


def brand_dependency(sf_dir: str) -> Dataset:
    """R58: brand supplier-dependency board — per p_brand: shipped
    lines, distinct suppliers, the TOP supplier's line count (ties →
    smallest s_suppkey) and its permille share of the brand's volume —
    the single-point-of-failure read R10's diversity count hides (a
    brand with 40 suppliers where one carries 800‰ is still
    one-supplier-fragile; R52 histograms contestedness per PART, R58
    names each brand's concentration) — the grouped-argmax shape on a
    two-hop join.  One dense row per brand with ≥1 line; exact int64
    (two-hop join + row_number over (count DESC, suppkey ASC) +
    permille oracle).

    Scale shape — TWO chained co-partitioned exchanges, each narrower
    than its input (R10's shape with an argmax finish): the PARTKEY
    hop attaches brand ranks to per-batch (partkey, suppkey, n)
    partials; the SUPPKEY hop settles each (brand, supplier) total
    exactly (all of a supplier's cells co-locate), keeps one LOCAL
    best candidate per brand plus (lines, distinct-supplier) partials;
    the k=1 merge picks the best of O(partitions × brands)
    candidates.  No supplier list lands on one node."""
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    brands = pa.array(
        sorted(parts.unique("p_brand")), pa.string()
    )
    nb = len(brands)

    def fact_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "sup": pc.cast(b["l_suppkey"], pa.int64()),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["k", "sup"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["k", "sup", "n"])
        return pa.table(
            {
                "k": g["k"],
                "role": pa.array(np.ones(g.num_rows, np.int64)),
                "sup": g["sup"],
                "n": g["n"],
            }
        )

    def dim_partial(b: pa.Table) -> pa.Table:
        code = pc.cast(
            pc.index_in(b["p_brand"], value_set=brands), pa.int64()
        )
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "role": pa.array(np.zeros(b.num_rows, np.int64)),
                "sup": code,
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def hop1(t: pa.Table) -> pa.Table:
        """PARTKEY partition: attach brand code to (suppkey, n) cells."""
        if t.num_rows == 0:
            return pa.table(
                {
                    "sup": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        sup = t["sup"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        dk, db = k[is_dim], sup[is_dim]
        fk, fs, fn = k[~is_dim], sup[~is_dim], n[~is_dim]
        if not len(fk) or not len(dk):
            return pa.table(
                {
                    "sup": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        order = np.argsort(dk, kind="stable")
        dk_s, db_s = dk[order], db[order]
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        return pa.table(
            {
                "sup": pa.array(fs),
                "b": pa.array(db_s[pos]),
                "n": pa.array(fn),
            }
        )

    def hop2(t: pa.Table) -> pa.Table:
        """SUPPKEY partition: settle (brand, supplier) totals; local
        argmax per brand + lines/distinct partials."""
        cols = ["b", "nl", "nsup", "top_n", "top_sup"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["sup", "b"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        sup = g["sup"].combine_chunks().to_numpy(zero_copy_only=False)
        b = g["b"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nl = np.zeros(nb, np.int64)
        nsup = np.zeros(nb, np.int64)
        np.add.at(nl, b, n)
        np.add.at(nsup, b, 1)
        order = np.lexsort((sup, -n, b))
        b_o = b[order]
        first = np.ones(len(b_o), bool)
        first[1:] = b_o[1:] != b_o[:-1]
        sel = order[first]
        live = b[sel]
        return pa.table(
            {
                "b": pa.array(live.astype(np.int64)),
                "nl": pa.array(nl[live]),
                "nsup": pa.array(nsup[live]),
                "top_n": pa.array(n[sel]),
                "top_sup": pa.array(sup[sel]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nl = np.zeros(nb, np.int64)
        nsup = np.zeros(nb, np.int64)
        top_n = np.zeros(nb, np.int64)
        top_sup = np.full(nb, np.iinfo(np.int64).max)
        if t.num_rows:
            b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nl, b,
                t["nl"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                nsup, b,
                t["nsup"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            tn = t["top_n"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            tsu = t["top_sup"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            for bi, ni, si in zip(b, tn, tsu):
                if ni > top_n[bi] or (
                    ni == top_n[bi] and si < top_sup[bi]
                ):
                    top_n[bi] = ni
                    top_sup[bi] = si
        live = np.flatnonzero(nl)
        return pa.table(
            {
                "brand": brands.take(pa.array(live.astype(np.int64))),
                "n_lines": pa.array(nl[live]),
                "n_suppliers": pa.array(nsup[live]),
                "top_lines": pa.array(top_n[live]),
                "top_permille": pa.array(
                    1000 * top_n[live] // np.maximum(nl[live], 1)
                ),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = parts.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", hop1, k=_rel_k(sf_dir, "lineitem")
    )
    bs = hash_partition_merge(
        cells, "sup", hop2, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(bs, "b", merge, k=1)


def cohort_repurchase(sf_dir: str) -> Dataset:
    """R59: cohort repurchase-retention board — per FIRST-ORDER YEAR
    cohort: customers acquired that year, those who placed a second
    order within 365 calendar days of the first, and the retention
    permille — acquisition-cohort quality over time (R24 counts
    monthly actives, R21 gaps between any repeat pair, R54 prices the
    first order; R59 asks whether the customers a given YEAR brought
    in ever came back — the cohort curve every growth review opens
    with).  First/second order = (o_orderdate, o_orderkey) lexical
    rank (deterministic under same-day ties).  One row per cohort
    year; exact int64 (double row_number window + day-diff + permille
    oracle).

    Scale shape — ONE co-partitioned CUSTKEY exchange (R54's
    argmin carry extended to the first TWO): order batches pre-reduce
    per customer to (n, best (date, key), second-best (date, key))
    partials — a top-2 lexicographic-min is still a reduction, so it
    rides the same exchange; each partition settles every customer
    exactly (one lexsort over partial candidates), decides cohort
    year and the 365-day test locally, and re-reduces IN PLACE to
    (cohort, n, retained) partials; k=1 merge."""
    DAY_US = 86_400_000_000

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        k = (
            pc.cast(b["o_custkey"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        d = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ok = (
            pc.cast(b["o_orderkey"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((ok, d, k))
        k, d, ok = k[order], d[order], ok[order]
        first = np.ones(len(k), bool)
        first[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(first)
        n = np.diff(np.r_[starts, len(k)]).astype(np.int64)
        second = np.minimum(starts + 1, len(k) - 1)
        has2 = n >= 2
        return pa.table(
            {
                "k": pa.array(k[starts]),
                "n": pa.array(n),
                "d1": pa.array(d[starts]),
                "o1": pa.array(ok[starts]),
                "d2": pa.array(
                    np.where(has2, d[second], np.iinfo(np.int64).max)
                ),
                "o2": pa.array(
                    np.where(has2, ok[second], np.iinfo(np.int64).max)
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cohort": pa.array([], pa.int64()),
                    "nc": pa.array([], pa.int64()),
                    "nr": pa.array([], pa.int64()),
                }
            )
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        d1 = t["d1"].combine_chunks().to_numpy(zero_copy_only=False)
        o1 = t["o1"].combine_chunks().to_numpy(zero_copy_only=False)
        d2 = t["d2"].combine_chunks().to_numpy(zero_copy_only=False)
        o2 = t["o2"].combine_chunks().to_numpy(zero_copy_only=False)
        # merge partial candidates: per customer the global top-2 of
        # the union of (first, second) candidates — one lexsort over
        # the stacked candidate rows
        ck = np.r_[k, k]
        cd = np.r_[d1, d2]
        co = np.r_[o1, o2]
        cn = np.r_[n, np.zeros(len(k), np.int64)]
        order = np.lexsort((co, cd, ck))
        ck, cd, co, cn = ck[order], cd[order], co[order], cn[order]
        first = np.ones(len(ck), bool)
        first[1:] = ck[1:] != ck[:-1]
        starts = np.flatnonzero(first)
        gid = np.cumsum(first) - 1
        total = np.zeros(len(starts), np.int64)
        np.add.at(total, gid, cn)
        f_d = cd[starts]
        second = np.minimum(starts + 1, len(ck) - 1)
        s_d = np.where(
            (total >= 2), cd[second], np.iinfo(np.int64).max
        )
        year = (
            f_d.astype("datetime64[us]")
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        retained = (
            (s_d != np.iinfo(np.int64).max)
            & ((s_d // DAY_US - f_d // DAY_US) <= 365)
        ).astype(np.int64)
        uvals, inv = np.unique(year, return_inverse=True)
        nc = np.bincount(inv).astype(np.int64)
        nr = np.zeros(len(uvals), np.int64)
        np.add.at(nr, inv, retained)
        return pa.table(
            {
                "cohort": pa.array(uvals.astype(np.int64)),
                "nc": pa.array(nc),
                "nr": pa.array(nr),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("cohort", use_threads=False).aggregate(
            [("nc", "sum"), ("nr", "sum")]
        )
        nc = g["nc_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nr = g["nr_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cohort": pc.cast(g["cohort"], pa.int64()),
                "n_customers": pa.array(nc.astype(np.int64)),
                "n_retained": pa.array(nr.astype(np.int64)),
                "retained_permille": pa.array(
                    1000 * nr.astype(np.int64)
                    // np.maximum(nc.astype(np.int64), 1)
                ),
            }
        )

    partials = orders.map_batches(partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        partials, "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "cohort", merge, k=1)


def discount_ladder(sf_dir: str) -> Dataset:
    """R60: discount ladder — per discount band (floor(l_discount·100)
    cents): lines, exact quantity, realized revenue
    Σfloor(extendedprice·(1−discount)) and FORGONE revenue
    Σfloor(extendedprice·discount) — the pricing-power board (TPC-H
    Q19's discount predicate turned into the full ladder: a band
    whose forgone revenue rivals its realized revenue is margin
    leaking through promotions; R49's Pareto ranks parts, R60 prices
    the DISCOUNT POLICY itself).  Exact int64 (floor-before-sum money
    convention; band edges computed in IEEE double on both sides so
    floor(d·100) agrees bit-for-bit with the oracle).

    Scale shape — R1's scan-aggregate over a ~11-band bounded domain:
    one Arrow group_by per batch pre-reduces to (band, n, Σqty, Σrev,
    Σforgone) partials; the k=1 merge folds O(partitions × bands)
    rows and emits the ladder in band order.  Zero data shuffles;
    only three money columns leave the read."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        d = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        ep = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        q = b["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "b": pa.array(np.floor(d * 100).astype(np.int64)),
                "n": pa.array(np.ones(len(d), np.int64)),
                "q": pa.array(np.floor(q).astype(np.int64)),
                "rev": pa.array(np.floor(ep * (1.0 - d)).astype(np.int64)),
                "fg": pa.array(np.floor(ep * d).astype(np.int64)),
            }
        )
        g = t.group_by("b", use_threads=False).aggregate(
            [("n", "sum"), ("q", "sum"), ("rev", "sum"), ("fg", "sum")]
        )
        return g.rename_columns(["b", "n", "q", "rev", "fg"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    c: pa.array([], pa.int64())
                    for c in (
                        "disc_cents", "n_lines", "sum_qty",
                        "revenue", "forgone",
                    )
                }
            )
        g = t.group_by("b", use_threads=False).aggregate(
            [("n", "sum"), ("q", "sum"), ("rev", "sum"), ("fg", "sum")]
        )
        g = g.rename_columns(["b", "n", "q", "rev", "fg"])
        g = g.sort_by("b")
        return pa.table(
            {
                "disc_cents": g["b"],
                "n_lines": g["n"],
                "sum_qty": g["q"],
                "revenue": g["rev"],
                "forgone": g["fg"],
            }
        )

    partials = li.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "b", merge, k=1)


def waiting_suppliers(sf_dir: str, sla_days: int = 90) -> Dataset:
    """R61: waiting-suppliers blame board (the TPC-H Q21 shape on this
    schema's columns) — per supplier nation: multi-supplier orders
    where EXACTLY ONE supplier breached the ship SLA (any line shipped
    > ``sla_days`` after o_orderdate — the unambiguous-blame case Q21
    isolates), distinct suppliers implicated, and the worst offender
    (most blamed orders, ties → smallest s_suppkey) with its permille
    of the nation's blame — R20 prices the latency distribution, R58
    names concentration; R61 ATTRIBUTES lateness to the one supplier
    who held an otherwise-on-time order hostage, the procurement
    scorecard Q21 exists for.  One dense row per nation ALWAYS; exact
    int64 (floor-day delay + HAVING count-distinct + row_number
    oracle).

    Scale shape — TWO chained co-partitioned exchanges, each narrower
    than its input (R58's chain with a per-order ADJUDICATION in the
    middle): line batches pre-reduce to (orderkey, suppkey,
    max-shipdate) partials — breach is a MAX reduction since
    o_orderdate is constant per order — and headers ride carrying the
    date; the ORDERKEY hop settles each order whole (one lexsort:
    distinct suppliers, late suppliers, the blame verdict) and emits
    only (suppkey, blames) cells; the SUPPKEY hop attaches
    s_nationkey to settled blame totals and keeps one LOCAL best per
    nation; the k=1 merge folds O(partitions × 25) rows.  Only nation
    (25 rows, fixed) composes at the driver."""
    DAY_US = 86_400_000_000

    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat = nat.sort_values("n_nationkey").reset_index(drop=True)
    names = pa.array(nat["n_name"].tolist(), pa.string())
    nkeys = np.asarray(nat["n_nationkey"], np.int64)
    nn = len(nkeys)

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "supplier"),
    )

    def line_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "sup": pc.cast(b["l_suppkey"], pa.int64()),
                "d": b["l_shipdate"].cast(pa.int64()),
            }
        )
        g = t.group_by(["k", "sup"], use_threads=False).aggregate(
            [("d", "max")]
        )
        g = g.rename_columns(["k", "sup", "d"])
        return pa.table(
            {
                "k": g["k"],
                "role": pa.array(np.ones(g.num_rows, np.int64)),
                "sup": g["sup"],
                "d": g["d"],
            }
        )

    def order_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "role": pa.array(np.zeros(b.num_rows, np.int64)),
                "sup": pa.array(np.zeros(b.num_rows, np.int64)),
                "d": b["o_orderdate"].cast(pa.int64()),
            }
        )

    def hop1(t: pa.Table) -> pa.Table:
        """ORDERKEY partition: settle each order's supplier set, decide
        blame, reduce to (suppkey, blames) cells."""
        empty = pa.table(
            {
                "sup": pa.array([], pa.int64()),
                "role": pa.array([], pa.int64()),
                "nk": pa.array([], pa.int64()),
                "bl": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        sup = t["sup"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["d"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        dk, dd = k[is_dim], d[is_dim]
        fk, fs, fd = k[~is_dim], sup[~is_dim], d[~is_dim]
        if not len(fk) or not len(dk):
            return empty
        # settle (order, supplier) max shipdate across batch partials
        g = (
            pa.table(
                {"k": pa.array(fk), "sup": pa.array(fs), "d": pa.array(fd)}
            )
            .group_by(["k", "sup"], use_threads=False)
            .aggregate([("d", "max")])
        )
        fk = g["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fs = g["sup"].combine_chunks().to_numpy(zero_copy_only=False)
        fd = g["d_max"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s, dd_s = dk[order], dd[order]
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        late = ((fd - dd_s[pos]) // DAY_US) > sla_days
        # per order: distinct suppliers, late suppliers, the late one
        o2 = np.argsort(fk, kind="stable")
        fk, fs, late = fk[o2], fs[o2], late[o2]
        first = np.ones(len(fk), bool)
        first[1:] = fk[1:] != fk[:-1]
        starts = np.flatnonzero(first)
        nsup = np.diff(np.r_[starts, len(fk)])
        nlate = np.add.reduceat(late.astype(np.int64), starts)
        blamed = (nsup >= 2) & (nlate == 1)
        if not blamed.any():
            return empty
        # the unique late supplier per blamed order: max of sup*late
        # within the group is that supplier (late rows only)
        pick = np.maximum.reduceat(
            np.where(late, fs, np.int64(-1)), starts
        )[blamed]
        vals, cnt = np.unique(pick, return_counts=True)
        return pa.table(
            {
                "sup": pa.array(vals.astype(np.int64)),
                "role": pa.array(np.ones(len(vals), np.int64)),
                "nk": pa.array(np.zeros(len(vals), np.int64)),
                "bl": pa.array(cnt.astype(np.int64)),
            }
        )

    def supp_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "sup": pc.cast(b["s_suppkey"], pa.int64()),
                "role": pa.array(np.zeros(b.num_rows, np.int64)),
                "nk": pc.cast(b["s_nationkey"], pa.int64()),
                "bl": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def hop2(t: pa.Table) -> pa.Table:
        """SUPPKEY partition: settle per-supplier blame totals, attach
        nation, keep a local argmax per nation."""
        cols = ["nk", "nbl", "nsup", "top_bl", "top_sup"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        sup = t["sup"].combine_chunks().to_numpy(zero_copy_only=False)
        nk = t["nk"].combine_chunks().to_numpy(zero_copy_only=False)
        bl = t["bl"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        dk, dn = sup[is_dim], nk[is_dim]
        fs, fb = sup[~is_dim], bl[~is_dim]
        if not len(fs) or not len(dk):
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = (
            pa.table({"sup": pa.array(fs), "bl": pa.array(fb)})
            .group_by("sup", use_threads=False)
            .aggregate([("bl", "sum")])
        )
        fs = g["sup"].combine_chunks().to_numpy(zero_copy_only=False)
        fb = g["bl_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s, dn_s = dk[order], dn[order]
        pos = np.clip(np.searchsorted(dk_s, fs), 0, len(dk_s) - 1)
        fn = np.searchsorted(nkeys, dn_s[pos])
        nbl = np.zeros(nn, np.int64)
        nsup = np.zeros(nn, np.int64)
        np.add.at(nbl, fn, fb)
        np.add.at(nsup, fn, 1)
        order2 = np.lexsort((fs, -fb, fn))
        fn_o = fn[order2]
        first = np.ones(len(fn_o), bool)
        first[1:] = fn_o[1:] != fn_o[:-1]
        sel = order2[first]
        live = fn[sel]
        return pa.table(
            {
                "nk": pa.array(live.astype(np.int64)),
                "nbl": pa.array(nbl[live]),
                "nsup": pa.array(nsup[live]),
                "top_bl": pa.array(fb[sel]),
                "top_sup": pa.array(fs[sel]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nbl = np.zeros(nn, np.int64)
        nsup = np.zeros(nn, np.int64)
        top_bl = np.zeros(nn, np.int64)
        top_sup = np.full(nn, np.iinfo(np.int64).max)
        if t.num_rows:
            nk = t["nk"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nbl, nk,
                t["nbl"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                nsup, nk,
                t["nsup"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            tb = t["top_bl"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            tsu = t["top_sup"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            for ni, bi, si in zip(nk, tb, tsu):
                if bi > top_bl[ni] or (
                    bi == top_bl[ni] and si < top_sup[ni]
                ):
                    top_bl[ni] = bi
                    top_sup[ni] = si
        top_sup = np.where(nbl > 0, top_sup, 0)
        return pa.table(
            {
                "nation": names,
                "n_blame_orders": pa.array(nbl),
                "n_suppliers": pa.array(nsup),
                "top_suppkey": pa.array(top_sup),
                "top_blames": pa.array(top_bl),
                "top_permille": pa.array(
                    1000 * top_bl // np.maximum(nbl, 1)
                ),
            }
        )

    fact = lines.map_batches(line_partial, batch_format="pyarrow")
    dim = orders.map_batches(order_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", hop1, k=_rel_k(sf_dir, "lineitem")
    )
    dim2 = supp.map_batches(supp_partial, batch_format="pyarrow")
    per_sup = hash_partition_merge(
        cells.union(dim2), "sup", hop2, k=_rel_k(sf_dir, "supplier")
    )
    return hash_partition_merge(per_sup, "nk", merge, k=1)


def brand_cross_sell(sf_dir: str) -> Dataset:
    """R62: brand cross-sell basket matrix — for each unordered brand
    pair (brand_a < brand_b): orders whose lines span BOTH brands —
    the market-basket board (R58 asks who supplies a brand, R52 how
    contested a part is; R62 which brands actually sell TOGETHER —
    the co-merchandising/bundling signal, and the relational twin of
    E66's event-type co-occurrence).  Exact int64 (DISTINCT
    (order, brand) + self-join + count oracle).

    Scale shape — TWO chained co-partitioned exchanges that finish in
    a BITSET domain: the PARTKEY hop attaches brand codes to
    deduplicated (partkey, order) cells (R12's co-partition — parts
    grow with the corpus, never broadcast); the ORDERKEY hop lands
    each order's brand cells whole, collapses them to ONE uint64
    bitmask per order (≤64 brands, asserted), dedupes masks with
    np.unique, and expands pairs per DISTINCT mask — the loop is
    bounded by distinct baskets, the accumulator by brands², so the
    k=1 merge folds O(k × brands²) rows however many orders exist."""
    brands = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/part.parquet", columns=["p_brand"]
            ).unique("p_brand")
        ),
        pa.string(),
    )
    nb = len(brands)
    if nb > 64:
        raise ValueError(
            "brand_cross_sell: >64 brands — bitset basket packing needs "
            "a wider mask"
        )

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )

    def fact_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "x": pc.cast(b["l_orderkey"], pa.int64()),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["k", "x"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {
                "k": g["k"],
                "role": pa.array(np.ones(g.num_rows, np.int64)),
                "x": g["x"],
            }
        )

    def dim_partial(b: pa.Table) -> pa.Table:
        code = pc.cast(
            pc.index_in(b["p_brand"], value_set=brands), pa.int64()
        )
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "role": pa.array(np.zeros(b.num_rows, np.int64)),
                "x": code,
            }
        )

    def hop1(t: pa.Table) -> pa.Table:
        """PARTKEY partition: attach brand code, dedupe (order, brand)."""
        empty = pa.table(
            {"ok": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        x = t["x"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        dk, db = k[is_dim], x[is_dim]
        fk, fo = k[~is_dim], x[~is_dim]
        if not len(fk) or not len(dk):
            return empty
        order = np.argsort(dk, kind="stable")
        dk_s, db_s = dk[order], db[order]
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        ob = np.unique(fo * 64 + db_s[pos])
        return pa.table(
            {
                "ok": pa.array((ob // 64).astype(np.int64)),
                "b": pa.array((ob % 64).astype(np.int64)),
            }
        )

    def hop2(t: pa.Table) -> pa.Table:
        """ORDERKEY partition: basket bitmasks -> pair counts."""
        if t.num_rows == 0:
            return pa.table(
                {
                    "pr": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ok = t["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        bb = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
        ob = np.unique(ok * 64 + bb)
        okk = ob // 64
        bit = np.uint64(1) << (ob % 64).astype(np.uint64)
        first = np.ones(len(ob), bool)
        first[1:] = okk[1:] != okk[:-1]
        starts = np.flatnonzero(first)
        masks = np.bitwise_or.reduceat(bit, starts)
        mv, mc = np.unique(masks, return_counts=True)
        acc = np.zeros((nb, nb), np.int64)
        for m, c in zip(mv, mc):
            bits = np.flatnonzero(
                (m >> np.arange(nb, dtype=np.uint64)) & np.uint64(1)
            )
            if len(bits) >= 2:
                a, bq = np.triu_indices(len(bits), k=1)
                acc[bits[a], bits[bq]] += c
        pr = np.flatnonzero(acc.ravel())
        return pa.table(
            {
                "pr": pa.array(pr.astype(np.int64)),
                "n": pa.array(acc.ravel()[pr]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "brand_a": pa.array([], pa.string()),
                    "brand_b": pa.array([], pa.string()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("pr", use_threads=False).aggregate([("n", "sum")])
        g = g.rename_columns(["pr", "n"]).sort_by("pr")
        pr = g["pr"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "brand_a": brands.take(
                    pa.array((pr // nb).astype(np.int64))
                ),
                "brand_b": brands.take(
                    pa.array((pr % nb).astype(np.int64))
                ),
                "n_orders": g["n"],
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = parts.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", hop1, k=_rel_k(sf_dir, "lineitem")
    )
    pairs = hash_partition_merge(
        cells, "ok", hop2, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(pairs, "pr", merge, k=1)


def segment_value_quantiles(sf_dir: str) -> Dataset:
    """R63: segment order-value quantiles — per c_mktsegment: orders
    and the discrete p50/p90/p99/max of floor(o_totalprice) — the
    ticket-size distribution behind R19's LTV digit bands (R19 bands
    CUSTOMER lifetime value; R63 the per-ORDER ticket the pricing
    page is designed around, tail included — a segment whose p99 is
    30× its p50 needs a quote flow, not a cart).  Exact int64 under
    the quantile_disc rank rule (floor-before-quantile money
    convention + quantile_disc oracle).

    Scale shape — ONE co-partitioned CUSTKEY exchange (R17's shape
    with a histogram finish): order batches pre-reduce to (custkey,
    floor-value, n) partials, customers ride carrying the segment;
    each partition attaches segments with one searchsorted and
    re-reduces IN PLACE to (segment, value) histogram cells — bounded
    by segments × distinct whole-dollar prices (a price-list domain,
    never corpus-bounded); the k=1 merge reads the quantiles off one
    cumsum per segment."""
    segs = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]
            ).unique("c_mktsegment")
        ),
        pa.string(),
    )
    nseg = len(segs)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )

    def fact_partial(b: pa.Table) -> pa.Table:
        v = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        ).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "v": pa.array(v),
                "n": pa.array(np.ones(len(v), np.int64)),
            }
        )
        g = t.group_by(["k", "v"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["k", "v", "n"])
        return pa.table(
            {
                "k": g["k"],
                "role": pa.array(np.ones(g.num_rows, np.int64)),
                "v": g["v"],
                "n": g["n"],
            }
        )

    def dim_partial(b: pa.Table) -> pa.Table:
        code = pc.cast(
            pc.index_in(b["c_mktsegment"], value_set=segs), pa.int64()
        )
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "role": pa.array(np.zeros(b.num_rows, np.int64)),
                "v": code,
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"sv": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        dk, dseg = k[is_dim], v[is_dim]
        fk, fv, fn = k[~is_dim], v[~is_dim], n[~is_dim]
        if not len(fk) or not len(dk):
            return empty
        order = np.argsort(dk, kind="stable")
        dk_s, dseg_s = dk[order], dseg[order]
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        sv = dseg_s[pos] * (1 << 32) + fv
        g = (
            pa.table({"sv": pa.array(sv), "n": pa.array(fn)})
            .group_by("sv", use_threads=False)
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["sv", "n"])

    def merge(t: pa.Table) -> pa.Table:
        n_orders = np.zeros(nseg, np.int64)
        p50 = np.zeros(nseg, np.int64)
        p90 = np.zeros(nseg, np.int64)
        p99 = np.zeros(nseg, np.int64)
        mx = np.zeros(nseg, np.int64)
        if t.num_rows:
            g = t.group_by("sv", use_threads=False).aggregate(
                [("n", "sum")]
            )
            sv = g["sv"].combine_chunks().to_numpy(zero_copy_only=False)
            n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.argsort(sv, kind="stable")
            sv, n = sv[order], n[order]
            s = sv >> 32
            v = sv & 0xFFFFFFFF
            first = np.ones(len(sv), bool)
            first[1:] = s[1:] != s[:-1]
            starts = np.flatnonzero(first)
            ends = np.r_[starts[1:], len(sv)]
            cum = np.cumsum(n)
            base = np.where(starts > 0, cum[starts - 1], 0)
            tot = cum[ends - 1] - base
            keys = s[starts]
            n_orders[keys] = tot
            for dst, q in ((p50, 500), (p90, 900), (p99, 990)):
                thr = (tot * q + 999) // 1000
                dst[keys] = v[
                    np.searchsorted(cum, base + thr, side="left")
                ]
            mx[keys] = v[ends - 1]
        return pa.table(
            {
                "segment": segs,
                "n_orders": pa.array(n_orders),
                "p50_value": pa.array(p50),
                "p90_value": pa.array(p90),
                "p99_value": pa.array(p99),
                "max_value": pa.array(mx),
            }
        )

    fact = orders.map_batches(fact_partial, batch_format="pyarrow")
    dim = cust.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "sv", merge, k=1)


def unit_price_spread(sf_dir: str) -> Dataset:
    """R64: unit-price dispersion board — per p_brand: parts with ≥1
    line sold, parts whose realized UNIT price varies across lines,
    and the discrete p50/p90 of each part's spread permille
    (1000·(max−min)//max of floor(100·extendedprice/quantity) cents)
    — the pricing-consistency audit (R31's margin board compares
    realized to LIST price; R64 asks whether the SAME part sells at
    the same unit price at all — wide spread is regional pricing,
    stale catalogs or fat-finger entries, and is invisible to every
    aggregate that sums revenue first).  Exact int64: unit cents are
    floored IEEE doubles computed with the same expression order on
    both sides; spread is an integer permille under the
    quantile_disc rank rule.

    Scale shape — ONE co-partitioned PARTKEY exchange (R12's shape
    with MIN/MAX riding): line batches pre-reduce to (partkey,
    min-unit, max-unit) partials — the spread is a min/max REDUCTION
    so nothing else travels; part rows ride carrying the brand; each
    partition settles every part exactly, computes the spread
    permille, and re-reduces IN PLACE to (brand, permille) histogram
    cells — the permille domain is [0, 1000] so the k=1 merge folds
    ≤ k × brands × 1001 rows however many parts exist."""
    brands = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/part.parquet", columns=["p_brand"]
            ).unique("p_brand")
        ),
        pa.string(),
    )
    nb = len(brands)

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_quantity"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )

    def fact_partial(b: pa.Table) -> pa.Table:
        ep = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        q = b["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        up = np.floor(100 * ep / q).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "lo": pa.array(up),
                "hi": pa.array(up),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate(
            [("lo", "min"), ("hi", "max")]
        )
        g = g.rename_columns(["k", "lo", "hi"])
        return pa.table(
            {
                "k": g["k"],
                "role": pa.array(np.ones(g.num_rows, np.int64)),
                "lo": g["lo"],
                "hi": g["hi"],
            }
        )

    def dim_partial(b: pa.Table) -> pa.Table:
        code = pc.cast(
            pc.index_in(b["p_brand"], value_set=brands), pa.int64()
        )
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "role": pa.array(np.zeros(b.num_rows, np.int64)),
                "lo": code,
                "hi": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"bs": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        lo = t["lo"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = t["hi"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        dk, db = k[is_dim], lo[is_dim]
        fk, flo, fhi = k[~is_dim], lo[~is_dim], hi[~is_dim]
        if not len(fk) or not len(dk):
            return empty
        g = (
            pa.table(
                {"k": pa.array(fk), "lo": pa.array(flo), "hi": pa.array(fhi)}
            )
            .group_by("k", use_threads=False)
            .aggregate([("lo", "min"), ("hi", "max")])
        )
        fk = g["k"].combine_chunks().to_numpy(zero_copy_only=False)
        flo = g["lo_min"].combine_chunks().to_numpy(zero_copy_only=False)
        fhi = g["hi_max"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s, db_s = dk[order], db[order]
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        spm = 1000 * (fhi - flo) // np.maximum(fhi, 1)
        bs = db_s[pos] * 1024 + spm
        vals, cnt = np.unique(bs, return_counts=True)
        return pa.table(
            {
                "bs": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n_parts = np.zeros(nb, np.int64)
        n_var = np.zeros(nb, np.int64)
        p50 = np.zeros(nb, np.int64)
        p90 = np.zeros(nb, np.int64)
        if t.num_rows:
            g = t.group_by("bs", use_threads=False).aggregate(
                [("n", "sum")]
            )
            bs = g["bs"].combine_chunks().to_numpy(zero_copy_only=False)
            n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.argsort(bs, kind="stable")
            bs, n = bs[order], n[order]
            b = bs // 1024
            spm = bs % 1024
            first = np.ones(len(bs), bool)
            first[1:] = b[1:] != b[:-1]
            starts = np.flatnonzero(first)
            ends = np.r_[starts[1:], len(bs)]
            cum = np.cumsum(n)
            base = np.where(starts > 0, cum[starts - 1], 0)
            tot = cum[ends - 1] - base
            keys = b[starts]
            n_parts[keys] = tot
            np.add.at(n_var, b, np.where(spm > 0, n, 0))
            for dst, q in ((p50, 500), (p90, 900)):
                thr = (tot * q + 999) // 1000
                dst[keys] = spm[
                    np.searchsorted(cum, base + thr, side="left")
                ]
        live = np.flatnonzero(n_parts)
        return pa.table(
            {
                "brand": brands.take(pa.array(live.astype(np.int64))),
                "n_parts": pa.array(n_parts[live]),
                "n_varying": pa.array(n_var[live]),
                "p50_spread": pa.array(p50[live]),
                "p90_spread": pa.array(p90[live]),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = parts.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "bs", merge, k=1)


def fill_rate(sf_dir: str, sla_days: int = 30) -> Dataset:
    """R65: order fill-rate board — per (order month, o_orderpriority):
    orders with ≥1 line, orders FILLED (every line shipped within
    ``sla_days`` of o_orderdate — an all-lines predicate, i.e. the
    max-delay reduction), and the filled permille — the completion
    SLA next to R2's volume grid and R20's latency quantiles (R20
    prices how late LINES ship; R65 how often whole ORDERS land
    inside the promise — the number on the ops dashboard, month by
    month, priority by priority).  Exact int64 (per-order
    max(l_shipdate) + floor-day diff + permille oracle).

    Scale shape — ONE co-partitioned ORDERKEY exchange (R61's
    max-shipdate reduction without the blame adjudication): line
    batches pre-reduce to (orderkey, max-shipdate) partials, headers
    ride carrying (orderdate, priority rank); each partition settles
    every order's worst line exactly and re-reduces IN PLACE to
    (month, priority) cells — a calendar × 5 domain; k=1 merge."""
    prios = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet", columns=["o_orderpriority"]
            ).unique("o_orderpriority")
        ),
        pa.string(),
    )
    npr = len(prios)
    DAY_US = 86_400_000_000

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def line_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "d": b["l_shipdate"].cast(pa.int64()),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate([("d", "max")])
        g = g.rename_columns(["k", "d"])
        return pa.table(
            {
                "k": g["k"],
                "role": pa.array(np.ones(g.num_rows, np.int64)),
                "d": g["d"],
                "pr": pa.array(np.zeros(g.num_rows, np.int64)),
            }
        )

    def order_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "role": pa.array(np.zeros(b.num_rows, np.int64)),
                "d": b["o_orderdate"].cast(pa.int64()),
                "pr": pc.cast(
                    pc.index_in(b["o_orderpriority"], value_set=prios),
                    pa.int64(),
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "mp": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "nf": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["d"].combine_chunks().to_numpy(zero_copy_only=False)
        pr = t["pr"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        dk, dd, dpr = k[is_dim], d[is_dim], pr[is_dim]
        fk, fd = k[~is_dim], d[~is_dim]
        if not len(fk) or not len(dk):
            return empty
        g = (
            pa.table({"k": pa.array(fk), "d": pa.array(fd)})
            .group_by("k", use_threads=False)
            .aggregate([("d", "max")])
        )
        fk = g["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fd = g["d_max"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s, dd_s, dpr_s = dk[order], dd[order], dpr[order]
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        filled = ((fd - dd_s[pos]) // DAY_US) <= sla_days
        month = _month_id(dd_s[pos])
        mp = (month * npr + dpr_s[pos]).astype(np.int64)
        t2 = pa.table(
            {
                "mp": pa.array(mp),
                "n": pa.array(np.ones(len(mp), np.int64)),
                "nf": pa.array(filled.astype(np.int64)),
            }
        )
        g2 = t2.group_by("mp", use_threads=False).aggregate(
            [("n", "sum"), ("nf", "sum")]
        )
        return g2.rename_columns(["mp", "n", "nf"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_month": pa.array([], pa.timestamp("us")),
                    "priority": pa.array([], pa.string()),
                    "n_orders": pa.array([], pa.int64()),
                    "n_filled": pa.array([], pa.int64()),
                    "filled_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("mp", use_threads=False).aggregate(
            [("n", "sum"), ("nf", "sum")]
        )
        g = g.rename_columns(["mp", "n", "nf"]).sort_by("mp")
        mp = g["mp"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        nf = g["nf"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_month": _month_ts(mp // npr),
                "priority": prios.take(
                    pa.array((mp % npr).astype(np.int64))
                ),
                "n_orders": pa.array(n),
                "n_filled": pa.array(nf),
                "filled_permille": pa.array(1000 * nf // n),
            }
        )

    fact = lines.map_batches(line_partial, batch_format="pyarrow")
    dim = orders.map_batches(order_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "mp", merge, k=1)


def brand_return_rate(sf_dir: str) -> Dataset:
    """R66: brand return-rate board — per p_brand: lines, RETURNED
    lines (l_returnflag = 'R'), the returned permille, and the floored
    discounted revenue walking back out the door — the product-quality
    read (R9's Q10 names the customers who return things, R28's
    status-year matrix the trend; R66 blames the PRODUCT LINE — a
    brand returning at 3× the catalog average is a defect or a
    listing-accuracy problem, and the returned-revenue column sizes
    the write-off).  Exact int64 (CASE-sum + floor-before-sum money
    convention + permille oracle).

    Scale shape — ONE co-partitioned PARTKEY exchange (R12's shape):
    line batches pre-reduce to (partkey, n, returned, returned-rev)
    partials — the flag collapses per part BEFORE the exchange; part
    rows ride carrying the brand; each partition re-reduces IN PLACE
    to per-brand partials; k=1 merge of O(k × brands) rows."""
    brands = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/part.parquet", columns=["p_brand"]
            ).unique("p_brand")
        ),
        pa.string(),
    )
    nb = len(brands)

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_partkey", "l_returnflag", "l_extendedprice", "l_discount"
        ],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )

    def fact_partial(b: pa.Table) -> pa.Table:
        ret = pc.equal(b["l_returnflag"], "R")
        r = (
            ret.combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ep = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        d = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ep * (1.0 - d)).astype(np.int64) * r
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "n": pa.array(np.ones(len(r), np.int64)),
                "nr": pa.array(r),
                "rrev": pa.array(rev),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate(
            [("n", "sum"), ("nr", "sum"), ("rrev", "sum")]
        )
        g = g.rename_columns(["k", "n", "nr", "rrev"])
        return pa.table(
            {
                "k": g["k"],
                "role": pa.array(np.ones(g.num_rows, np.int64)),
                "n": g["n"],
                "nr": g["nr"],
                "rrev": g["rrev"],
            }
        )

    def dim_partial(b: pa.Table) -> pa.Table:
        code = pc.cast(
            pc.index_in(b["p_brand"], value_set=brands), pa.int64()
        )
        z = pa.array(np.zeros(b.num_rows, np.int64))
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "role": z,
                "n": code,
                "nr": z,
                "rrev": z,
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ["b", "n", "nr", "rrev"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        nr = t["nr"].combine_chunks().to_numpy(zero_copy_only=False)
        rrev = t["rrev"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        dk, db = k[is_dim], n[is_dim]
        fk, fn, fnr, frv = k[~is_dim], n[~is_dim], nr[~is_dim], rrev[~is_dim]
        if not len(fk) or not len(dk):
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        order = np.argsort(dk, kind="stable")
        dk_s, db_s = dk[order], db[order]
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        bcode = db_s[pos]
        bn = np.zeros(nb, np.int64)
        bnr = np.zeros(nb, np.int64)
        brv = np.zeros(nb, np.int64)
        np.add.at(bn, bcode, fn)
        np.add.at(bnr, bcode, fnr)
        np.add.at(brv, bcode, frv)
        live = np.flatnonzero(bn)
        return pa.table(
            {
                "b": pa.array(live.astype(np.int64)),
                "n": pa.array(bn[live]),
                "nr": pa.array(bnr[live]),
                "rrev": pa.array(brv[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        bn = np.zeros(nb, np.int64)
        bnr = np.zeros(nb, np.int64)
        brv = np.zeros(nb, np.int64)
        if t.num_rows:
            b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
            for dst, col in ((bn, "n"), (bnr, "nr"), (brv, "rrev")):
                np.add.at(
                    dst, b,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        live = np.flatnonzero(bn)
        return pa.table(
            {
                "brand": brands.take(pa.array(live.astype(np.int64))),
                "n_lines": pa.array(bn[live]),
                "n_returned": pa.array(bnr[live]),
                "returned_permille": pa.array(
                    1000 * bnr[live] // np.maximum(bn[live], 1)
                ),
                "returned_revenue": pa.array(brv[live]),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = parts.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "b", merge, k=1)


def nation_balance_quantiles(sf_dir: str) -> Dataset:
    """R67: nation balance quantiles — per customer nation: customers,
    discrete p50/p90 of floor(c_acctbal), and customers in the red —
    the receivables-health board (R44 correlates balance with
    activity, R56 bands supplier credit; R67 maps WHERE the negative
    balances live — a nation whose p50 sits near zero with a fat
    negative tail is a collections problem localized enough to route
    to one regional team).  Exact int64 under the quantile_disc rank
    rule (floor on the signed double — exact on both sides).

    Scale shape — R1's scan-aggregate with a histogram finish and the
    ONE sanctioned broadcast (nation, 25 fixed rows, composed at the
    driver): customer batches attach the nation position with one
    searchsorted and pre-reduce to (nation, floor-balance) histogram
    cells — the balance domain is a bounded ledger range, never
    corpus-sized; the k=1 merge reads quantiles and the negative
    count off one cumsum per nation.  ZERO wide exchange; two columns
    leave the read."""
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat = nat.sort_values("n_nationkey").reset_index(drop=True)
    names = pa.array(nat["n_name"].tolist(), pa.string())
    nkeys = np.asarray(nat["n_nationkey"], np.int64)
    nn = len(nkeys)
    OFF = 1 << 20  # balances are a bounded ledger range; keep packing +ve

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_acctbal"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )

    def partial(b: pa.Table) -> pa.Table:
        nk = (
            pc.cast(b["c_nationkey"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        fb = np.floor(
            b["c_acctbal"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        pos = np.searchsorted(nkeys, nk)
        vals, cnt = np.unique(
            pos * (1 << 32) + (fb + OFF), return_counts=True
        )
        return pa.table(
            {
                "nb": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n_cust = np.zeros(nn, np.int64)
        p50 = np.zeros(nn, np.int64)
        p90 = np.zeros(nn, np.int64)
        nneg = np.zeros(nn, np.int64)
        if t.num_rows:
            g = t.group_by("nb", use_threads=False).aggregate(
                [("n", "sum")]
            )
            nb = g["nb"].combine_chunks().to_numpy(zero_copy_only=False)
            n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.argsort(nb, kind="stable")
            nb, n = nb[order], n[order]
            k = nb >> 32
            v = (nb & 0xFFFFFFFF) - OFF
            first = np.ones(len(nb), bool)
            first[1:] = k[1:] != k[:-1]
            starts = np.flatnonzero(first)
            ends = np.r_[starts[1:], len(nb)]
            cum = np.cumsum(n)
            base = np.where(starts > 0, cum[starts - 1], 0)
            tot = cum[ends - 1] - base
            keys = k[starts]
            n_cust[keys] = tot
            for dst, q in ((p50, 500), (p90, 900)):
                thr = (tot * q + 999) // 1000
                dst[keys] = v[
                    np.searchsorted(cum, base + thr, side="left")
                ]
            np.add.at(nneg, k, np.where(v < 0, n, 0))
        live = np.flatnonzero(n_cust)
        return pa.table(
            {
                "nation": names.take(pa.array(live.astype(np.int64))),
                "n_customers": pa.array(n_cust[live]),
                "p50_balance": pa.array(p50[live]),
                "p90_balance": pa.array(p90[live]),
                "n_negative": pa.array(nneg[live]),
            }
        )

    partials = cust.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "nb", merge, k=1)


def new_vs_repeat(sf_dir: str) -> Dataset:
    """R68: new-vs-repeat monthly mix — per order month: orders, orders
    that are a customer's FIRST ever (rank 1 by (o_orderdate,
    o_orderkey) — deterministic under same-day ties), and the
    new-customer permille — the acquisition-mix trendline (R59 asks
    whether a cohort ever RETURNS, R24 counts monthly actives; R68
    reads the health of the top of the funnel month by month — a
    new_permille sliding toward zero is a business coasting on its
    base).  Exact int64 (row_number window + month GROUP BY +
    permille oracle).

    Scale shape — ONE co-partitioned CUSTKEY exchange (R54's
    argmin-carry): order batches pre-reduce per customer to (n-orders
    per month carried as cells, local best (date, orderkey)) — here
    the month cells ride raw since a customer's orders are few; each
    partition holds every order of its customers, finds the global
    first with one lexsort, and re-reduces IN PLACE to (month, n,
    n_new) cells — a calendar-bounded domain; k=1 merge."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "d": b["o_orderdate"].cast(pa.int64()),
                "ok": pc.cast(b["o_orderkey"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ["m", "n", "nnew"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["d"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = t["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, d, k))
        k, d, ok = k[order], d[order], ok[order]
        first = np.ones(len(k), bool)
        first[1:] = k[1:] != k[:-1]
        month = _month_id(d)
        t2 = pa.table(
            {
                "m": pa.array(month.astype(np.int64)),
                "n": pa.array(np.ones(len(k), np.int64)),
                "nnew": pa.array(first.astype(np.int64)),
            }
        )
        g = t2.group_by("m", use_threads=False).aggregate(
            [("n", "sum"), ("nnew", "sum")]
        )
        return g.rename_columns(["m", "n", "nnew"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_month": pa.array([], pa.timestamp("us")),
                    "n_orders": pa.array([], pa.int64()),
                    "n_new": pa.array([], pa.int64()),
                    "new_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("m", use_threads=False).aggregate(
            [("n", "sum"), ("nnew", "sum")]
        )
        g = g.rename_columns(["m", "n", "nnew"]).sort_by("m")
        m = g["m"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        nnew = g["nnew"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_month": _month_ts(m),
                "n_orders": pa.array(n),
                "n_new": pa.array(nnew),
                "new_permille": pa.array(1000 * nnew // n),
            }
        )

    fact = orders.map_batches(partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact, "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "m", merge, k=1)


def order_fragmentation(sf_dir: str) -> Dataset:
    """R69: order supplier-fragmentation histogram — per
    distinct-supplier count k: orders sourced from exactly k
    suppliers, their lines, and their floored discounted revenue —
    the consolidation board (R61 blames the one late supplier in a
    fragmented order; R69 measures how much of the book is EXPOSED to
    that failure mode at all — revenue sitting in k≥3 orders is
    revenue whose delivery date is the max of three independent
    clocks, the logistics argument for supplier consolidation).
    Exact int64 (count(DISTINCT l_suppkey) per order + histogram
    oracle).

    Scale shape — ONE co-partitioned ORDERKEY exchange: line batches
    pre-reduce to (orderkey, suppkey, lines, revenue) partials; each
    partition settles every order whole (one lexsort: distinct
    suppliers, line/revenue sums) and re-reduces IN PLACE to a
    (k, orders, lines, revenue) histogram — k is bounded by suppliers
    per order, a handful; the k=1 merge folds O(partitions × max-k)
    rows."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
        ],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ep = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        d = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ep * (1.0 - d)).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "sup": pc.cast(b["l_suppkey"], pa.int64()),
                "nl": pa.array(np.ones(len(rev), np.int64)),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by(["k", "sup"], use_threads=False).aggregate(
            [("nl", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["k", "sup", "nl", "rev"])

    def fold(t: pa.Table) -> pa.Table:
        cols = ["ns", "n", "nl", "rev"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["k", "sup"], use_threads=False).aggregate(
            [("nl", "sum"), ("rev", "sum")]
        )
        k = g["k"].combine_chunks().to_numpy(zero_copy_only=False)
        nl = g["nl_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = g["rev_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, nl, rev = k[order], nl[order], rev[order]
        first = np.ones(len(k), bool)
        first[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(first)
        nsup = np.diff(np.r_[starts, len(k)]).astype(np.int64)
        onl = np.add.reduceat(nl, starts)
        orev = np.add.reduceat(rev, starts)
        t2 = pa.table(
            {
                "ns": pa.array(nsup),
                "n": pa.array(np.ones(len(nsup), np.int64)),
                "nl": pa.array(onl.astype(np.int64)),
                "rev": pa.array(orev.astype(np.int64)),
            }
        )
        g2 = t2.group_by("ns", use_threads=False).aggregate(
            [("n", "sum"), ("nl", "sum"), ("rev", "sum")]
        )
        return g2.rename_columns(["ns", "n", "nl", "rev"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    c: pa.array([], pa.int64())
                    for c in ("n_suppliers", "n_orders", "n_lines", "revenue")
                }
            )
        g = t.group_by("ns", use_threads=False).aggregate(
            [("n", "sum"), ("nl", "sum"), ("rev", "sum")]
        )
        g = g.rename_columns(["ns", "n", "nl", "rev"]).sort_by("ns")
        return pa.table(
            {
                "n_suppliers": g["ns"],
                "n_orders": g["n"],
                "n_lines": g["nl"],
                "revenue": g["rev"],
            }
        )

    fact = lines.map_batches(partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact, "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "ns", merge, k=1)


def value_latency_stats(sf_dir: str) -> Dataset:
    """R70: value-vs-latency sufficient statistics — per
    o_orderpriority: orders, and the exact integer sufficient stats
    (Σv, Σd, Σvd, Σv², Σd²) of v = floor(o_totalprice) against d =
    the order's WORST line ship delay in floor days — "do expensive
    orders ship faster?", answered the R44 way: the engine emits
    exact sums, the analyst derives the correlation to any precision
    downstream (R20 gives the latency distribution, R65 the SLA hit
    rate; R70 tests whether MONEY bends the queue — discrimination
    the ops review has to either defend or fix).  Exact int64 (the
    cross-moment sums fit int64 up to ~10⁷ orders per priority at
    TPC-H price scales; beyond that the merge is the one place to
    widen to object dtype, as T45 does).

    Scale shape — ONE co-partitioned ORDERKEY exchange (R65's
    max-shipdate reduction with the header carrying the money): line
    batches pre-reduce to (orderkey, max-shipdate) partials; each
    partition settles every order's worst line, forms (v, d) pairs
    locally and re-reduces IN PLACE to per-priority moment partials
    (6 ints per priority); k=1 merge of O(partitions × 5) rows."""
    prios = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet", columns=["o_orderpriority"]
            ).unique("o_orderpriority")
        ),
        pa.string(),
    )
    npr = len(prios)
    DAY_US = 86_400_000_000

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=[
            "o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority"
        ],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def line_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "d": b["l_shipdate"].cast(pa.int64()),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate([("d", "max")])
        g = g.rename_columns(["k", "d"])
        return pa.table(
            {
                "k": g["k"],
                "role": pa.array(np.ones(g.num_rows, np.int64)),
                "d": g["d"],
                "v": pa.array(np.zeros(g.num_rows, np.int64)),
                "pr": pa.array(np.zeros(g.num_rows, np.int64)),
            }
        )

    def order_partial(b: pa.Table) -> pa.Table:
        v = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        ).astype(np.int64)
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "role": pa.array(np.zeros(b.num_rows, np.int64)),
                "d": b["o_orderdate"].cast(pa.int64()),
                "v": pa.array(v),
                "pr": pc.cast(
                    pc.index_in(b["o_orderpriority"], value_set=prios),
                    pa.int64(),
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ["p", "n", "sv", "sd", "svd", "sv2", "sd2"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["d"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        pr = t["pr"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        dk, dd, dv, dpr = k[is_dim], d[is_dim], v[is_dim], pr[is_dim]
        fk, fd = k[~is_dim], d[~is_dim]
        if not len(fk) or not len(dk):
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = (
            pa.table({"k": pa.array(fk), "d": pa.array(fd)})
            .group_by("k", use_threads=False)
            .aggregate([("d", "max")])
        )
        fk = g["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fd = g["d_max"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        delay = (fd - dd[order][pos]) // DAY_US
        val = dv[order][pos]
        p = dpr[order][pos]
        out = np.zeros((npr, 6), np.int64)
        np.add.at(out[:, 0], p, 1)
        np.add.at(out[:, 1], p, val)
        np.add.at(out[:, 2], p, delay)
        np.add.at(out[:, 3], p, val * delay)
        np.add.at(out[:, 4], p, val * val)
        np.add.at(out[:, 5], p, delay * delay)
        live = np.flatnonzero(out[:, 0])
        return pa.table(
            {
                "p": pa.array(live.astype(np.int64)),
                "n": pa.array(out[live, 0]),
                "sv": pa.array(out[live, 1]),
                "sd": pa.array(out[live, 2]),
                "svd": pa.array(out[live, 3]),
                "sv2": pa.array(out[live, 4]),
                "sd2": pa.array(out[live, 5]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = np.zeros((npr, 6), np.int64)
        if t.num_rows:
            p = t["p"].combine_chunks().to_numpy(zero_copy_only=False)
            for j, col in enumerate(("n", "sv", "sd", "svd", "sv2", "sd2")):
                np.add.at(
                    out[:, j], p,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        live = np.flatnonzero(out[:, 0])
        return pa.table(
            {
                "priority": prios.take(pa.array(live.astype(np.int64))),
                "n_orders": pa.array(out[live, 0]),
                "sum_v": pa.array(out[live, 1]),
                "sum_d": pa.array(out[live, 2]),
                "sum_vd": pa.array(out[live, 3]),
                "sum_v2": pa.array(out[live, 4]),
                "sum_d2": pa.array(out[live, 5]),
            }
        )

    fact = lines.map_batches(line_partial, batch_format="pyarrow")
    dim = orders.map_batches(order_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "p", merge, k=1)


def customer_months_hist(sf_dir: str) -> Dataset:
    """R71: customer active-months histogram — per distinct-active-
    month count k: customers who ordered in exactly k different
    calendar months, their orders and floored order value — the
    engagement-depth histogram (R13's order-count distribution counts
    ORDERS per customer; R71 counts the CADENCE — a base that orders
    9 times in one month and never again is a promotion artifact, 9
    months out of 12 is a habit; the k-axis is what a retention
    budget is allocated against).  Exact int64 (count(DISTINCT
    month) per customer + histogram oracle).

    Scale shape — ONE co-partitioned CUSTKEY exchange: order batches
    pre-reduce to (custkey, month, n, Σfloor-value) cells (a
    customer's months collapse per batch first); each partition
    settles every customer whole (one lexsort: distinct months,
    order/value sums) and re-reduces IN PLACE to a (k, customers,
    orders, value) histogram — k is bounded by the calendar; k=1
    merge."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        d = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        v = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        ).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "m": pa.array(_month_id(d).astype(np.int64)),
                "n": pa.array(np.ones(len(v), np.int64)),
                "v": pa.array(v),
            }
        )
        g = t.group_by(["k", "m"], use_threads=False).aggregate(
            [("n", "sum"), ("v", "sum")]
        )
        return g.rename_columns(["k", "m", "n", "v"])

    def fold(t: pa.Table) -> pa.Table:
        cols = ["nm", "nc", "no", "rev"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["k", "m"], use_threads=False).aggregate(
            [("n", "sum"), ("v", "sum")]
        )
        k = g["k"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        v = g["v_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, n, v = k[order], n[order], v[order]
        first = np.ones(len(k), bool)
        first[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(first)
        nm = np.diff(np.r_[starts, len(k)]).astype(np.int64)
        no = np.add.reduceat(n, starts)
        rev = np.add.reduceat(v, starts)
        t2 = pa.table(
            {
                "nm": pa.array(nm),
                "nc": pa.array(np.ones(len(nm), np.int64)),
                "no": pa.array(no.astype(np.int64)),
                "rev": pa.array(rev.astype(np.int64)),
            }
        )
        g2 = t2.group_by("nm", use_threads=False).aggregate(
            [("nc", "sum"), ("no", "sum"), ("rev", "sum")]
        )
        return g2.rename_columns(["nm", "nc", "no", "rev"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    c: pa.array([], pa.int64())
                    for c in (
                        "n_months", "n_customers", "n_orders", "revenue"
                    )
                }
            )
        g = t.group_by("nm", use_threads=False).aggregate(
            [("nc", "sum"), ("no", "sum"), ("rev", "sum")]
        )
        g = g.rename_columns(["nm", "nc", "no", "rev"]).sort_by("nm")
        return pa.table(
            {
                "n_months": g["nm"],
                "n_customers": g["nc"],
                "n_orders": g["no"],
                "revenue": g["rev"],
            }
        )

    fact = orders.map_batches(partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact, "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "nm", merge, k=1)


def nation_priority_mix(sf_dir: str) -> Dataset:
    """R72: nation × priority mix — per (customer nation, order
    priority): orders and the permille within the nation — the
    regional urgency profile (R35's segment × priority matrix reads
    urgency by MARKET SEGMENT; R72 by GEOGRAPHY — a nation skewing
    1-URGENT is either a market that pays for speed or a regional
    sales team gaming the queue, and either way the fulfillment
    network should know).  One row per populated (nation, priority)
    cell; exact int64 (join + two-key GROUP BY + window-total
    permille oracle).

    Scale shape — ONE co-partitioned CUSTKEY exchange (R17's shape):
    order batches pre-reduce to (custkey, priority-rank, n) partials,
    customers ride carrying the nationkey; each partition attaches
    nations with one searchsorted and re-reduces IN PLACE to a ≤ 25×5
    grid; the k=1 merge settles nation totals and emits permilles.
    Only nation (25 fixed rows) composes at the driver."""
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat = nat.sort_values("n_nationkey").reset_index(drop=True)
    names = pa.array(nat["n_name"].tolist(), pa.string())
    nkeys = np.asarray(nat["n_nationkey"], np.int64)
    nn = len(nkeys)
    prios = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet", columns=["o_orderpriority"]
            ).unique("o_orderpriority")
        ),
        pa.string(),
    )
    npr = len(prios)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )

    def fact_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "pr": pc.cast(
                    pc.index_in(b["o_orderpriority"], value_set=prios),
                    pa.int64(),
                ),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["k", "pr"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["k", "pr", "n"])
        return pa.table(
            {
                "k": g["k"],
                "role": pa.array(np.ones(g.num_rows, np.int64)),
                "pr": g["pr"],
                "n": g["n"],
            }
        )

    def dim_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "role": pa.array(np.zeros(b.num_rows, np.int64)),
                "pr": pc.cast(b["c_nationkey"], pa.int64()),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"np_": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pr = t["pr"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        dk, dn = k[is_dim], pr[is_dim]
        fk, fpr, fn = k[~is_dim], pr[~is_dim], n[~is_dim]
        if not len(fk) or not len(dk):
            return empty
        order = np.argsort(dk, kind="stable")
        dk_s, dn_s = dk[order], dn[order]
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        npos = np.searchsorted(nkeys, dn_s[pos])
        grid = np.zeros(nn * npr, np.int64)
        np.add.at(grid, npos * npr + fpr, fn)
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "np_": pa.array(live.astype(np.int64)),
                "n": pa.array(grid[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid = np.zeros(nn * npr, np.int64)
        if t.num_rows:
            i = t["np_"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                grid, i,
                t["n"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        tot = grid.reshape(nn, npr).sum(axis=1)
        live = np.flatnonzero(grid)
        nk = live // npr
        return pa.table(
            {
                "nation": names.take(pa.array(nk.astype(np.int64))),
                "priority": prios.take(
                    pa.array((live % npr).astype(np.int64))
                ),
                "n_orders": pa.array(grid[live]),
                "permille": pa.array(
                    1000 * grid[live] // np.maximum(tot[nk], 1)
                ),
            }
        )

    fact = orders.map_batches(fact_partial, batch_format="pyarrow")
    dim = cust.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "np_", merge, k=1)


def weekday_profile(sf_dir: str) -> Dataset:
    """R73: weekday demand profile — per ISO day-of-week 1=Mon..7=Sun:
    orders, floored o_totalprice revenue, and the permille of total
    order volume — the weekly ordering rhythm (R45 folds demand across
    months-of-year for inventory pre-positioning; R73 folds it across
    the WEEK for staffing and batch-window placement — a B2B book
    flatlines on weekends, a consumer book peaks there, and the
    permille column says which book this is).  One dense row per
    isodow ALWAYS; exact int64, calendar-free epoch math (1970-01-01
    is a Thursday: ``isodow = ((days + 3) % 7) + 1``), so the engine
    and DuckDB's ``isodow()`` agree by construction (E52's rule).

    Scale shape — ZERO wide exchange: isodow is one batch-local
    modulo, money floors exactly per row (the §2.3b convention), and
    per batch np.add.at reduces orders to a dense 7-cell grid; the k=1
    merge sums grids and emits permilles."""
    DAY_US = 86_400_000_000

    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ts = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        dw = ((ts // DAY_US + 3) % 7).astype(np.int64)
        rev = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        ).astype(np.int64)
        n = np.zeros(7, np.int64)
        r = np.zeros(7, np.int64)
        np.add.at(n, dw, 1)
        np.add.at(r, dw, rev)
        return pa.table(
            {
                "d": pa.array(np.arange(7, dtype=np.int64)),
                "n": pa.array(n),
                "rev": pa.array(r),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n = np.zeros(7, np.int64)
        r = np.zeros(7, np.int64)
        if t.num_rows:
            d = t["d"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                n, d,
                t["n"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                r, d,
                t["rev"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        tot = max(int(n.sum()), 1)
        return pa.table(
            {
                "isodow": pa.array(np.arange(1, 8, dtype=np.int64)),
                "n_orders": pa.array(n),
                "revenue_floor": pa.array(r),
                "permille": pa.array(1000 * n // tot),
            }
        )

    partials = ords.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "d", merge, k=1)


def type_revenue(sf_dir: str) -> Dataset:
    """R74: part-type commerce board — per p_type: lines, floored
    quantity, floored discounted revenue, and the permille of lines
    returned (l_returnflag = 'R') — the product-category P&L row (R12
    conditions ONE sum on the PROMO bit; R74 gives every type its full
    row: volume, money, and the return rate that says whether a
    category's revenue is real or coming back — a type pairing high
    revenue with a fat return permille is a quality problem wearing a
    sales costume).  One dense row per p_type ALWAYS; exact int64
    (join + CASE-sum + permille oracle; money floors per line, the
    §2.3b convention).

    Scale shape — parts GROW WITH THE CORPUS, so the type travels by
    CO-PARTITION, never broadcast (R12's role-union shape): part rows
    reduce to (partkey, type-rank); lineitem batches pre-reduce to
    (partkey, returnflag-bit, n, qty, rev) partials; the per-partition
    fold attaches each part's rank with one searchsorted and
    re-reduces IN PLACE to a ≤ types × 4 grid; the k=1 merge settles
    the grid and emits permilles.  Only the ~6-value type list
    broadcasts."""
    types = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/part.parquet", columns=["p_type"]
            ).unique("p_type")
        ),
        pa.string(),
    )
    nt = len(types)

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_type"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_partkey", "l_quantity", "l_extendedprice",
            "l_discount", "l_returnflag",
        ],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "ty": pc.cast(
                    pc.index_in(b["p_type"], value_set=types), pa.int64()
                ),
                "ret": pa.array(np.zeros(n, np.int64)),
                "nl": pa.array(np.zeros(n, np.int64)),
                "qty": pa.array(np.zeros(n, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        qty = np.floor(
            b["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        ret = pc.cast(pc.equal(b["l_returnflag"], "R"), pa.int64())
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "ret": ret,
                "nl": pa.array(np.ones(len(rev), np.int64)),
                "qty": pa.array(qty),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by(["k", "ret"], use_threads=False).aggregate(
            [("nl", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        g = g.rename_columns(["k", "ret", "nl", "qty", "rev"])
        return g.append_column(
            "ty", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "ty", "ret", "nl", "qty", "rev"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "ty": pa.array([], pa.int64()),
                "nl": pa.array([], pa.int64()),
                "qty": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
                "nret": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dty = d["ty"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        ty = dty[pos]
        ret = f["ret"].combine_chunks().to_numpy(zero_copy_only=False)
        nl = f["nl"].combine_chunks().to_numpy(zero_copy_only=False)
        qty = f["qty"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = f["rev"].combine_chunks().to_numpy(zero_copy_only=False)
        g_nl = np.zeros(nt, np.int64)
        g_qty = np.zeros(nt, np.int64)
        g_rev = np.zeros(nt, np.int64)
        g_ret = np.zeros(nt, np.int64)
        tyh = ty[hit]
        np.add.at(g_nl, tyh, nl[hit])
        np.add.at(g_qty, tyh, qty[hit])
        np.add.at(g_rev, tyh, rev[hit])
        np.add.at(g_ret, tyh, (nl * ret)[hit])
        live = np.flatnonzero(g_nl)
        return pa.table(
            {
                "ty": pa.array(live.astype(np.int64)),
                "nl": pa.array(g_nl[live]),
                "qty": pa.array(g_qty[live]),
                "rev": pa.array(g_rev[live]),
                "nret": pa.array(g_ret[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        g_nl = np.zeros(nt, np.int64)
        g_qty = np.zeros(nt, np.int64)
        g_rev = np.zeros(nt, np.int64)
        g_ret = np.zeros(nt, np.int64)
        if t.num_rows:
            ty = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
            for grid, col in (
                (g_nl, "nl"), (g_qty, "qty"),
                (g_rev, "rev"), (g_ret, "nret"),
            ):
                np.add.at(
                    grid, ty,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "p_type": types,
                "n_lines": pa.array(g_nl),
                "qty_floor": pa.array(g_qty),
                "revenue_floor": pa.array(g_rev),
                "returned_permille": pa.array(
                    1000 * g_ret // np.maximum(g_nl, 1)
                ),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = part.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "ty", merge, k=1)


def supplier_type_diversity(sf_dir: str) -> Dataset:
    """R75: supplier generalism histogram — for each distinct-type
    count d (0..|types|): suppliers whose shipped lines span exactly d
    distinct part TYPES, with their total lines and floored discounted
    revenue — R52 flipped across the join (R52 asks how many suppliers
    compete for a PART; R75 asks how many product categories a
    SUPPLIER carries — the specialist/generalist split that prices a
    supplier failure: losing a 1-type specialist stops one category,
    losing a 6-type generalist dents all of them).  Suppliers with no
    shipped lines sit in the d = 0 row; one dense row for EVERY d
    ALWAYS.  Exact int64 (count-DISTINCT join + generate_series
    densifier oracle; money floors per line, the §2.3b convention).

    Scale shape — R74's co-partition chain with a second key hop:
    parts reduce to (partkey, type-rank) and lineitem batches
    pre-reduce to (partkey, suppkey, nl, rev) partials; the
    partkey-hash fold attaches each part's rank with one searchsorted
    and re-reduces to distinct (suppkey, type, nl, rev) rows; the
    suppkey-hash fold (supplier dim unioned in for the zero row)
    settles each supplier's exact type set and collapses IN PLACE to a
    ≤ |types|+1 histogram; k=1 densifying merge.  Nothing broadcasts
    but the ~6-value type list."""
    types = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/part.parquet", columns=["p_type"]
            ).unique("p_type")
        ),
        pa.string(),
    )
    nt = len(types)

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_type"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey"],
        override_num_blocks=_rel_k(sf_dir, "supplier"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "ty": pc.cast(
                    pc.index_in(b["p_type"], value_set=types), pa.int64()
                ),
                "sk": pa.array(np.full(n, -1, np.int64)),
                "nl": pa.array(np.zeros(n, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "sk": pc.cast(b["l_suppkey"], pa.int64()),
                "nl": pa.array(np.ones(len(rev), np.int64)),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by(["k", "sk"], use_threads=False).aggregate(
            [("nl", "sum"), ("rev", "sum")]
        )
        g = g.rename_columns(["k", "sk", "nl", "rev"])
        return g.append_column(
            "ty", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "ty", "sk", "nl", "rev"])

    def attach_fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "sk": pa.array([], pa.int64()),
                "ty": pa.array([], pa.int64()),
                "nl": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dty = d["ty"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        g = pa.table(
            {
                "sk": f["sk"].combine_chunks().filter(pa.array(hit)),
                "ty": pa.array(dty[pos][hit]),
                "nl": f["nl"].combine_chunks().filter(pa.array(hit)),
                "rev": f["rev"].combine_chunks().filter(pa.array(hit)),
            }
        ).group_by(["sk", "ty"], use_threads=False).aggregate(
            [("nl", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["sk", "ty", "nl", "rev"])

    def supp_partial(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "sk": pc.cast(b["s_suppkey"], pa.int64()),
                "ty": pa.array(np.full(n, -1, np.int64)),
                "nl": pa.array(np.zeros(n, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def hist_fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "dv": pa.array([], pa.int64()),
                "nsup": pa.array([], pa.int64()),
                "nl": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        sk = t["sk"].combine_chunks().to_numpy(zero_copy_only=False)
        ty = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
        nl = t["nl"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = t["rev"].combine_chunks().to_numpy(zero_copy_only=False)
        usk = np.unique(sk)
        idx = np.searchsorted(usk, sk)
        # distinct types per supplier: unique (supplier, type) pairs with
        # ty >= 0 (dim rows carry -1 and count nothing)
        real = ty >= 0
        pair = np.unique(idx[real] * (nt + 1) + ty[real])
        dv = np.bincount((pair // (nt + 1)).astype(np.int64), minlength=len(usk))
        s_nl = np.zeros(len(usk), np.int64)
        s_rev = np.zeros(len(usk), np.int64)
        np.add.at(s_nl, idx, nl)
        np.add.at(s_rev, idx, rev)
        g_ns = np.zeros(nt + 1, np.int64)
        g_nl = np.zeros(nt + 1, np.int64)
        g_rev = np.zeros(nt + 1, np.int64)
        np.add.at(g_ns, dv, 1)
        np.add.at(g_nl, dv, s_nl)
        np.add.at(g_rev, dv, s_rev)
        live = np.flatnonzero(g_ns)
        return pa.table(
            {
                "dv": pa.array(live.astype(np.int64)),
                "nsup": pa.array(g_ns[live]),
                "nl": pa.array(g_nl[live]),
                "rev": pa.array(g_rev[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        g_ns = np.zeros(nt + 1, np.int64)
        g_nl = np.zeros(nt + 1, np.int64)
        g_rev = np.zeros(nt + 1, np.int64)
        if t.num_rows:
            dv = t["dv"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                g_ns, dv,
                t["nsup"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                g_nl, dv,
                t["nl"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                g_rev, dv,
                t["rev"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "n_types": pa.array(np.arange(nt + 1, dtype=np.int64)),
                "n_suppliers": pa.array(g_ns),
                "n_lines": pa.array(g_nl),
                "revenue_floor": pa.array(g_rev),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = part.map_batches(dim_partial, batch_format="pyarrow")
    per_supp = hash_partition_merge(
        fact.union(dim), "k", attach_fold, k=_rel_k(sf_dir, "lineitem")
    )
    sup_dim = supp.map_batches(supp_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        per_supp.union(sup_dim), "sk", hist_fold,
        k=_rel_k(sf_dir, "lineitem"),
    )
    return hash_partition_merge(cells, "dv", merge, k=1)


def priority_loyalty(sf_dir: str) -> Dataset:
    """R76: priority-loyalty board — per order priority: customers who
    placed ≥1 order at it, customers for whom it is their ONLY priority
    (every one of their orders carries it), and the exclusive permille
    — E124's audience-ownership question asked of the order stream (a
    priority whose users are mostly exclusive is a real service tier
    with a distinct clientele; one with near-zero exclusivity is a
    per-order whim, and R34's Q12 split should not be read as customer
    segmentation).  One dense row per priority present ALWAYS.  Exact
    int64 (distinct-pair + per-customer count-DISTINCT oracle).

    Scale shape — ONE customer-hash exchange, pre-reduced per batch:
    order batches lexsort-compact to distinct (custkey, priority-rank)
    pairs; each customer's partition holds their full priority set, so
    exclusivity settles locally and collapses IN PLACE to a ≤ |prios|
    (n_any, n_exclusive) grid; k=1 densifying merge.  Only the ~5-value
    priority list broadcasts."""
    prios = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet", columns=["o_orderpriority"]
            ).unique("o_orderpriority")
        ),
        pa.string(),
    )
    np_ = len(prios)

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        cu = pc.cast(b["o_custkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        pr = (
            pc.cast(
                pc.index_in(b["o_orderpriority"], value_set=prios), pa.int64()
            )
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        pairs = np.unique(cu * np_ + pr)
        return pa.table(
            {
                "cust": pa.array(pairs // np_, pa.int64()),
                "pr": pa.array(pairs % np_, pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "pr": pa.array([], pa.int64()),
                    "n_any": pa.array([], pa.int64()),
                    "n_excl": pa.array([], pa.int64()),
                }
            )
        cu = t["cust"].combine_chunks().to_numpy(zero_copy_only=False)
        pr = t["pr"].combine_chunks().to_numpy(zero_copy_only=False)
        pairs = np.unique(cu * np_ + pr)
        c2, p2 = pairs // np_, pairs % np_
        ucust, idx = np.unique(c2, return_inverse=True)
        kcount = np.bincount(idx)
        n_any = np.bincount(p2, minlength=np_)
        excl = kcount[idx] == 1
        n_excl = np.bincount(p2[excl], minlength=np_)
        live = np.flatnonzero(n_any)
        return pa.table(
            {
                "pr": pa.array(live.astype(np.int64)),
                "n_any": pa.array(n_any[live].astype(np.int64)),
                "n_excl": pa.array(n_excl[live].astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n_any = np.zeros(np_, np.int64)
        n_excl = np.zeros(np_, np.int64)
        if t.num_rows:
            pr = t["pr"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                n_any, pr,
                t["n_any"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                n_excl, pr,
                t["n_excl"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "o_orderpriority": prios,
                "n_customers": pa.array(n_any),
                "n_exclusive": pa.array(n_excl),
                "exclusive_permille": pa.array(
                    1000 * n_excl // np.maximum(n_any, 1)
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials, "cust", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "pr", merge, k=1)


def nation_segment_matrix(sf_dir: str) -> Dataset:
    """R77: nation × market-segment customer matrix — per (n_name,
    c_mktsegment): registered customers, their lifetime order count and
    floored order-value total — the geographic × behavioral base map
    (R3 crosses segment with TIME, R26 podiums customers within a
    nation; R77 is the static base: which segments live where, and
    whether a nation's order volume comes from the segment its
    customer registry suggests).  Customers without orders count in
    n_customers with zero volume; one row per (nation, segment) pair
    with ≥1 customer.  Exact int64 (two-dim star join + LEFT JOIN
    oracle; o_totalprice floors per order).

    Scale shape — R3's custkey co-partition with a two-level cell id:
    the 25-row nation name list and ~5-value segment list broadcast;
    customer rows reduce to (custkey, nation·|seg|+segment) dim
    partials, order batches pre-reduce to (custkey, n, rev) partials;
    the custkey-hash fold attaches each customer's cell with one
    searchsorted and collapses IN PLACE to a ≤ 25·|seg| grid; k=1
    merge emits the live cells."""
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat = nat.sort_values("n_nationkey")
    nkeys = nat["n_nationkey"].to_numpy().astype(np.int64)
    nnames = pa.array(nat["n_name"].tolist(), pa.string())
    segs = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]
            ).unique("c_mktsegment")
        ),
        pa.string(),
    )
    nn, nsg = len(nkeys), len(segs)
    ncell = nn * nsg

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_mktsegment"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        nk = pc.cast(b["c_nationkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        ni = np.searchsorted(nkeys, nk)
        sg = (
            pc.cast(pc.index_in(b["c_mktsegment"], value_set=segs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "cell": pa.array(ni * nsg + sg, pa.int64()),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
                "rev": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        rev = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "n": pa.array(np.ones(len(rev), np.int64)),
                "rev": pa.array(rev),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate(
            [("n", "sum"), ("rev", "sum")]
        )
        g = g.rename_columns(["k", "n", "rev"])
        return g.append_column(
            "cell", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "cell", "n", "rev"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "ncust": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        if d.num_rows == 0:
            return empty
        f = t.filter(pa.array(~is_dim))
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dcell = d["cell"].combine_chunks().to_numpy(zero_copy_only=False)[
            order
        ]
        g_nc = np.zeros(ncell, np.int64)
        g_n = np.zeros(ncell, np.int64)
        g_rev = np.zeros(ncell, np.int64)
        np.add.at(g_nc, dcell, 1)
        if f.num_rows:
            fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
            hit = dk_s[pos] == fk
            cell = dcell[pos][hit]
            np.add.at(
                g_n, cell,
                f["n"].combine_chunks().to_numpy(zero_copy_only=False)[hit],
            )
            np.add.at(
                g_rev, cell,
                f["rev"].combine_chunks().to_numpy(zero_copy_only=False)[hit],
            )
        live = np.flatnonzero(g_nc)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "ncust": pa.array(g_nc[live]),
                "n": pa.array(g_n[live]),
                "rev": pa.array(g_rev[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        g_nc = np.zeros(ncell, np.int64)
        g_n = np.zeros(ncell, np.int64)
        g_rev = np.zeros(ncell, np.int64)
        if t.num_rows:
            cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
            for grid, col in ((g_nc, "ncust"), (g_n, "n"), (g_rev, "rev")):
                np.add.at(
                    grid, cell,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        live = np.flatnonzero(g_nc)
        return pa.table(
            {
                "n_name": pc.take(nnames, pa.array(live // nsg)),
                "c_mktsegment": pc.take(segs, pa.array(live % nsg)),
                "n_customers": pa.array(g_nc[live]),
                "n_orders": pa.array(g_n[live]),
                "revenue_floor": pa.array(g_rev[live]),
            }
        )

    fact = orders.map_batches(fact_partial, batch_format="pyarrow")
    dim = cust.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "cell", merge, k=1)


def discount_qty_matrix(sf_dir: str) -> Dataset:
    """R78: quantity-band × discount-cent interaction matrix — per
    (floor(l_quantity)//10 band, floor(100·l_discount) cents): lines,
    exact floored quantity, realized revenue Σfloor(ext·(1−disc)) —
    the pricing-POLICY audit neither marginal can show (R60's ladder
    says how much sits at each discount rung, R16 bands quantity per
    brand; R78 asks whether discounts are volume-driven — a clean
    policy shows mass marching down-right, discounts concentrated on
    fat quantity bands; a flat matrix means discounting is clerk whim
    and R31's margin story is noise).  One row per OCCUPIED cell.
    Exact int64 (two integer-divide keys + scan-aggregate oracle;
    money floors per line, the §2.3b convention).

    Scale shape — ZERO-join scan-reduce, the R1 shape: each lineitem
    batch collapses to ≤ (bands × 11) cell partials with one packed
    np.unique; the k=1 merge folds O(batches × cells) rows.  Nothing
    broadcasts, nothing corpus-sized moves."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    NC = 101  # discount cents domain 0..100

    def partial(b: pa.Table) -> pa.Table:
        qty = np.floor(
            b["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        cents = np.floor(100.0 * dis).astype(np.int64)
        band = qty // 10
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        cell = band * NC + cents
        u, idx = np.unique(cell, return_inverse=True)
        nl = np.bincount(idx)
        qsum = np.zeros(len(u), np.int64)
        rsum = np.zeros(len(u), np.int64)
        np.add.at(qsum, idx, qty)
        np.add.at(rsum, idx, rev)
        return pa.table(
            {
                "cell": pa.array(u),
                "nl": pa.array(nl.astype(np.int64)),
                "qty": pa.array(qsum),
                "rev": pa.array(rsum),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "qty_band": pa.array([], pa.int64()),
                    "discount_cents": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "qty_floor": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("cell", use_threads=False).aggregate(
            [("nl", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        cell = g["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "qty_band": pa.array(cell // NC),
                "discount_cents": pa.array(cell % NC),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
                "qty_floor": pc.cast(g["qty_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    partials = lines.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "cell", merge, k=1)


def price_adherence_hist(sf_dir: str) -> Dataset:
    """R79: list-price adherence histogram — per adherence band
    floor(10 · extendedprice/(quantity · p_retailprice)) (tenths of
    the realized-to-list unit-price ratio): lines, exact floored
    quantity, realized revenue — the DISTRIBUTION the aggregate boards
    integrate away (R39 nets list-vs-realized per brand, R64 spreads
    within a part; R79 shows the whole adherence curve: mass at band
    10 is list-price discipline, a left shoulder is discounting, and
    anything ABOVE 10 is selling over list — a repricing-lag flag).
    One row per occupied band.  Exact int64 (the ratio is ONE double
    division both engines compute identically — no float sums — and
    the band floor is the only rounding; money floors per line).

    Scale shape — the order_fulfillment big × big co-partition: parts
    reduce to (partkey, retail-price) dim rows and lineitem rows ship
    (partkey, qty, ext, rev) — one narrow exchange, no broadcast
    (parts grow with the corpus, R74's rule); the partkey-hash fold
    computes each line's band with one searchsorted + one vectorized
    division and collapses IN PLACE to O(bands) partials; k=1 merge."""
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_retailprice"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "role": pa.array(np.zeros(n, np.int64)),
                "qty": pc.cast(b["p_retailprice"], pa.float64()),
                "ext": pa.array(np.zeros(n)),
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        qty = b["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - dis)).astype(np.int64)
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "role": pa.array(np.ones(n, np.int64)),
                "qty": pa.array(qty),
                "ext": pa.array(ext),
                "rev": pa.array(rev),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "band": pa.array([], pa.int64()),
                "nl": pa.array([], pa.int64()),
                "qf": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role == 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        drp = d["qty"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        rp = drp[pos]
        qty = f["qty"].combine_chunks().to_numpy(zero_copy_only=False)
        ext = f["ext"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = f["rev"].combine_chunks().to_numpy(zero_copy_only=False)
        # ONE double division, associated exactly as the oracle writes it
        band = np.floor(10.0 * (ext / (qty * rp))).astype(np.int64)
        band = band[hit]
        u, idx = np.unique(band, return_inverse=True)
        nl = np.bincount(idx)
        qf = np.zeros(len(u), np.int64)
        rs = np.zeros(len(u), np.int64)
        np.add.at(qf, idx, np.floor(qty[hit]).astype(np.int64))
        np.add.at(rs, idx, rev[hit])
        return pa.table(
            {
                "band": pa.array(u),
                "nl": pa.array(nl.astype(np.int64)),
                "qf": pa.array(qf),
                "rev": pa.array(rs),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "adherence_band": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "qty_floor": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("band", use_threads=False).aggregate(
            [("nl", "sum"), ("qf", "sum"), ("rev", "sum")]
        )
        return pa.table(
            {
                "adherence_band": pc.cast(g["band"], pa.int64()),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
                "qty_floor": pc.cast(g["qf_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = part.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "band", merge, k=1)


def dominant_line_hist(sf_dir: str) -> Dataset:
    """R80: dominant-line concentration histogram — per order compute
    the quantity share of its single LARGEST line (band =
    floor(10*maxq/totq), integer-exact as 10*maxq//totq since TPC-H
    quantities are integral), then per band: orders, lines, and exact
    total quantity — the basket-concentration board (R35 says how DEEP
    baskets go, R69 how many suppliers they touch; R80 says whether an
    order's demand is one dominant line plus garnish (band 9-10) or
    spread evenly (band ~10/nl) — the skew read for per-order work
    units in any line-level allocator).  Band 10 = single-line or
    fully-dominant orders; dense small output (≤10 bands).  Exact
    int64 throughout (two-level GROUP BY oracle).

    Scale shape — the price_adherence two-exchange shape without the
    dimension side: per batch one np.unique over orderkey reduces
    lines to (okey, nl, totq, maxq) cells; ONE orderkey-hash exchange
    settles each order exactly once (sum nl/totq, max maxq — all
    associative), computes its band, and collapses to (band, n_orders,
    n_lines, qty) cells; k=1 band merge.  Lines never shuffle raw —
    only per-order cells move, and the band axis is ≤10 rows."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        q = np.floor(
            b["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        u, idx = np.unique(ok, return_inverse=True)
        nl = np.bincount(idx).astype(np.int64)
        tq = np.zeros(len(u), np.int64)
        np.add.at(tq, idx, q)
        mq = np.zeros(len(u), np.int64)
        np.maximum.at(mq, idx, q)
        return pa.table(
            {
                "okey": pa.array(u.astype(np.int64)),
                "nl": pa.array(nl),
                "totq": pa.array(tq),
                "maxq": pa.array(mq),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in ("band", "no", "nl", "q")}
            )
        g = t.group_by("okey", use_threads=False).aggregate(
            [("nl", "sum"), ("totq", "sum"), ("maxq", "max")]
        )
        nl = g["nl_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        tq = g["totq_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        mq = g["maxq_max"].combine_chunks().to_numpy(zero_copy_only=False)
        band = 10 * mq // tq
        u, idx = np.unique(band, return_inverse=True)
        no = np.bincount(idx).astype(np.int64)
        nls = np.zeros(len(u), np.int64)
        np.add.at(nls, idx, nl)
        qs = np.zeros(len(u), np.int64)
        np.add.at(qs, idx, tq)
        return pa.table(
            {
                "band": pa.array(u),
                "no": pa.array(no),
                "nl": pa.array(nls),
                "q": pa.array(qs),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "dominance_band": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "qty_floor": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("band", use_threads=False).aggregate(
            [("no", "sum"), ("nl", "sum"), ("q", "sum")]
        )
        return pa.table(
            {
                "dominance_band": pc.cast(g["band"], pa.int64()),
                "n_orders": pc.cast(g["no_sum"], pa.int64()),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
                "qty_floor": pc.cast(g["q_sum"], pa.int64()),
            }
        )

    cells = lines.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = hash_partition_merge(
        cells, "okey", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(folded, "band", merge, k=1)


def order_bursts(sf_dir: str) -> Dataset:
    """R81: same-day order-burst histogram — per (customer, orderdate)
    cell count the orders placed (the burst size), then per burst size:
    bursts (customer-days), distinct customers that ever hit that size,
    orders inside such bursts, and their exact value floor — the
    intra-day purchase-intensity read none of the cadence boards cover
    (R21 measures the DAYS between consecutive orders — its floor-day
    gap collapses same-day pairs to gap 0 without saying how wide the
    pile-up is; R52 counts supplier competition per part; R81 asks how
    often a customer fires N orders into ONE calendar day — the
    batch-entry / split-order signature that inflates any per-order
    funnel metric and the burst axis a same-day dedup pass would key
    on).  Dense small output (burst sizes are tiny integers); exact
    int64 (two-level GROUP BY + COUNT DISTINCT oracle).

    Scale shape — R80's two-exchange cell profile on the CUSTKEY axis:
    per batch one Arrow group_by((custkey, date)) reduces orders to
    (ck, dt, n, v) cells; ONE custkey-hash exchange settles each
    customer-day exactly once (sums are associative) AND — because a
    customer's every cell lands in the same partition — counts distinct
    customers per size locally, so the per-partition (size, bursts,
    customers, orders, value) partials sum exactly in the k=1 merge;
    raw orders never shuffle, only per-day cells move."""
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        v = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "ck": pc.cast(b["o_custkey"], pa.int64()),
                "dt": b["o_orderdate"].cast(pa.int64()),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
                "v": pa.array(v),
            }
        )
        return t.group_by(["ck", "dt"], use_threads=False).aggregate(
            [("n", "sum"), ("v", "sum")]
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("sz", "nb", "nc", "no", "v")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["ck", "dt"], use_threads=False).aggregate(
            [("n_sum", "sum"), ("v_sum", "sum")]
        )
        ck = g["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        sz = g["n_sum_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = g["v_sum_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        u, idx = np.unique(sz, return_inverse=True)
        nb = np.bincount(idx).astype(np.int64)
        no = np.zeros(len(u), np.int64)
        np.add.at(no, idx, sz)
        vs = np.zeros(len(u), np.int64)
        np.add.at(vs, idx, vv)
        # distinct customers per size: a customer's cells are ALL in
        # this partition (custkey-hash exchange), so local distinct
        # (size, ck) pairs sum exactly across partitions.
        order = np.lexsort((ck, sz))
        s_s, c_s = sz[order], ck[order]
        new_pair = np.empty(len(order), dtype=bool)
        if len(order):
            new_pair[0] = True
            new_pair[1:] = (s_s[1:] != s_s[:-1]) | (c_s[1:] != c_s[:-1])
        nc = np.zeros(len(u), np.int64)
        np.add.at(nc, np.searchsorted(u, s_s[new_pair]), 1)
        return pa.table(
            {
                "sz": pa.array(u),
                "nb": pa.array(nb),
                "nc": pa.array(nc),
                "no": pa.array(no),
                "v": pa.array(vs),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "burst_size",
            "n_bursts",
            "n_customers",
            "n_orders",
            "value_floor",
        )
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("sz", use_threads=False).aggregate(
            [("nb", "sum"), ("nc", "sum"), ("no", "sum"), ("v", "sum")]
        )
        return pa.table(
            {
                "burst_size": pc.cast(g["sz"], pa.int64()),
                "n_bursts": pc.cast(g["nb_sum"], pa.int64()),
                "n_customers": pc.cast(g["nc_sum"], pa.int64()),
                "n_orders": pc.cast(g["no_sum"], pa.int64()),
                "value_floor": pc.cast(g["v_sum"], pa.int64()),
            }
        )

    cells = ords.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = hash_partition_merge(
        cells, "ck", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(folded, "sz", merge, k=1)



def name_token_demand(sf_dir: str) -> Dataset:
    """R82: part name-token demand board — explode every part name into
    its whitespace words and, per word: parts carrying it, shipped
    lines, exact quantity, and floored revenue Σfloor(extprice·(1−disc))
    — the MERCHANDISING-VOCABULARY read no other board touches (R74
    slices demand by p_type, R49/R56 by brand; R82 reads the free-text
    name axis itself — the "which adjectives sell" board, and the
    relational twin of T41's word-frequency spectrum: TPC-H Q9-style
    analyses filter parts BY NAME WORD, and this board is exactly that
    filter's selectivity table).  Dense small output (the name
    vocabulary); exact int64 (unnest + LEFT JOIN + GROUP BY oracle;
    duplicate words inside one name count once per occurrence on both
    sides).

    Scale shape — ONE partkey-hash co-partition: part batches explode
    names to (partkey, word) cells (words ride the exchange as exact
    strings — the vocabulary is tiny but unknown, T118's convention);
    line batches pre-reduce per partkey with one Arrow group_by; in
    partition every part's line totals attach to its word rows by one
    searchsorted, collapsing IN PLACE to per-word partials — only
    O(partitions × vocabulary) rows reach the k=1 merge; lines never
    shuffle raw."""
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def part_cells(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["p_name"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        pk = (
            pc.cast(b["p_partkey"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        n = len(flat)
        return pa.table(
            {
                "k": pa.array(pk[parent], pa.int64()),
                "w": flat,
                "nl": pa.array(np.zeros(n, np.int64)),
                "qty": pa.array(np.zeros(n, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def line_cells(b: pa.Table) -> pa.Table:
        ep = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dc = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "w": pa.array([""] * b.num_rows, pa.string()),
                "nl": pa.array(np.ones(b.num_rows, np.int64)),
                "qty": pa.array(
                    np.floor(
                        b["l_quantity"]
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                ),
                "rev": pa.array(np.floor(ep * (1.0 - dc)).astype(np.int64)),
            }
        )
        g = t.group_by(["k", "w"], use_threads=False).aggregate(
            [("nl", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["k", "w", "nl", "qty", "rev"])

    def join_fold(t: pa.Table) -> pa.Table:
        cols = ("w", "np_", "nl", "qty", "rev", "g")
        if t.num_rows == 0:
            return pa.table(
                {
                    "w": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in cols[1:]},
                }
            )
        wcol = t["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        is_part = pc.not_equal(wcol, "").to_numpy(zero_copy_only=False)
        p = t.filter(pa.array(is_part))
        l = t.filter(pa.array(~is_part))
        lg = l.group_by("k", use_threads=False).aggregate(
            [("nl", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        lk = lg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        lorder = np.argsort(lk, kind="stable")
        lk_s = lk[lorder]
        pk = p["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = (
            np.clip(np.searchsorted(lk_s, pk), 0, max(len(lk_s) - 1, 0))
            if len(lk_s)
            else np.zeros(len(pk), np.int64)
        )
        hit = (lk_s[pos] == pk) if len(lk_s) else np.zeros(len(pk), bool)
        def attach(col: str) -> np.ndarray:
            vals = (
                lg[col].combine_chunks().to_numpy(zero_copy_only=False)[lorder]
                if len(lk_s)
                else np.zeros(0, np.int64)
            )
            out = np.zeros(len(pk), np.int64)
            out[hit] = vals[pos[hit]]
            return out
        cells = pa.table(
            {
                "w": p["w"],
                "np_": pa.array(np.ones(len(pk), np.int64)),
                "nl": pa.array(attach("nl_sum")),
                "qty": pa.array(attach("qty_sum")),
                "rev": pa.array(attach("rev_sum")),
            }
        )
        g = cells.group_by("w", use_threads=False).aggregate(
            [("np_", "sum"), ("nl", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        g = g.rename_columns(["w", "np_", "nl", "qty", "rev"])
        return g.append_column(
            "g", pa.array(np.zeros(g.num_rows, np.int64))
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("word", "n_parts", "n_lines", "qty_floor", "revenue_floor")
        if t.num_rows == 0:
            return pa.table(
                {
                    "word": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        t = t.drop_columns(["g"]) if "g" in t.column_names else t
        g = t.group_by("w", use_threads=False).aggregate(
            [("np_", "sum"), ("nl", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        return pa.table(
            {
                "word": g["w"],
                "n_parts": pc.cast(g["np__sum"], pa.int64()),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
                "qty_floor": pc.cast(g["qty_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    tagged = parts.map_batches(
        part_cells, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        lines.map_batches(
            line_cells, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    cells = hash_partition_merge(
        tagged, "k", join_fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "g", merge, k=1)


def dim_name_audit(sf_dir: str) -> Dataset:
    """R83: dimension name-key coherence audit — for the customer and
    supplier dims, parse the trailing digit run out of each row's name
    and compare it to the row's key: rows, parse failures (no trailing
    digits), parsed-but-mismatched rows, and the largest absolute
    key↔name deviation — the R48 referential-integrity discipline
    pointed at the DIMENSIONS' denormalized name column (every report
    that prints c_name/s_name assumes the embedded id IS the key; a
    re-keyed load, a truncated format width or a shifted offset breaks
    that silently, and no existing audit would notice).  One dense row
    per dim ALWAYS, zero-valued when the load was honest.  Exact int64
    (regexp_extract + TRY_CAST compare oracle; leading zeros cast away
    identically on both sides).

    Scale shape — ZERO wide exchange: two column-pruned dim reads
    (key + name only); per batch one RE2 extract + one int cast + one
    compare reduce to a single counter row; O(batches) partials ride
    the k=1 merge."""
    def make_partial(dim_code: int, key_col: str, name_col: str):
        def partial(b: pa.Table) -> pa.Table:
            k = (
                pc.cast(b[key_col], pa.int64())
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            ext = pc.extract_regex(b[name_col], r"(?P<d>[0-9]+)$")
            if isinstance(ext, pa.ChunkedArray):
                ext = ext.combine_chunks()
            valid = pc.is_valid(ext).to_numpy(zero_copy_only=False)
            digits = pc.struct_field(ext, "d")
            parsed = np.zeros(len(k), np.int64)
            if valid.any():
                parsed[valid] = (
                    pc.cast(digits.drop_null(), pa.int64())
                    .to_numpy(zero_copy_only=False)
                )
            dev = np.abs(parsed - k)
            mism = valid & (dev != 0)
            return pa.table(
                {
                    "d": pa.array([dim_code], pa.int64()),
                    "nr": pa.array([len(k)], pa.int64()),
                    "pf": pa.array([int((~valid).sum())], pa.int64()),
                    "nm": pa.array([int(mism.sum())], pa.int64()),
                    "mx": pa.array(
                        [int(dev[valid].max()) if valid.any() else 0],
                        pa.int64(),
                    ),
                }
            )

        return partial

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    ).map_batches(
        make_partial(0, "c_custkey", "c_name"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    sup = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        override_num_blocks=_rel_k(sf_dir, "supplier"),
    ).map_batches(
        make_partial(1, "s_suppkey", "s_name"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    names = pa.array(["customer", "supplier"], pa.string())

    def merge(t: pa.Table) -> pa.Table:
        out = ("dim", "n_rows", "n_parse_fail", "n_mismatch", "max_abs_dev")
        if t.num_rows == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by("d", use_threads=False).aggregate(
            [("nr", "sum"), ("pf", "sum"), ("nm", "sum"), ("mx", "max")]
        )
        dd = g["d"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dd)
        return pa.table(
            {
                "dim": names.take(pa.array(dd[order], pa.int64())),
                "n_rows": pc.cast(g["nr_sum"], pa.int64()).take(
                    pa.array(order, pa.int64())
                ),
                "n_parse_fail": pc.cast(g["pf_sum"], pa.int64()).take(
                    pa.array(order, pa.int64())
                ),
                "n_mismatch": pc.cast(g["nm_sum"], pa.int64()).take(
                    pa.array(order, pa.int64())
                ),
                "max_abs_dev": pc.cast(g["mx_max"], pa.int64()).take(
                    pa.array(order, pa.int64())
                ),
            }
        )

    return hash_partition_merge(cust.union(sup), "d", merge, k=1)


def line_sequence_audit(sf_dir: str) -> Dataset:
    """R84: line-sequence integrity audit — per order, l_linenumber
    must be exactly the dense sequence 1..n_lines; classify every
    order as OK, DUP (a linenumber repeats) or GAP (distinct but not
    the dense 1..n range) and report corpus totals plus the global max
    linenumber — the R48 referential-integrity discipline on the
    WITHIN-order sequence column (R27 profiles line positions
    statistically; R84 asserts the invariant every per-line ordinal
    join, "first line" heuristic and line-diff reconciler silently
    assumes; a partial reload or dropped-line compaction shows up here
    first).  ONE dense row ALWAYS; exact int64 (two-level GROUP BY +
    COUNT DISTINCT oracle).

    Scale shape — R80's two-exchange cell profile: per batch one
    np.unique over (orderkey, linenumber) reduces lines to occurrence
    cells (duplicates survive as counts); ONE orderkey-hash exchange
    settles each order exactly once — count, distinct count, min and
    max are all computable from the settled cells in partition — and
    collapses to one classification row per partition; k=1 merge sums
    O(parts) rows.  Raw lines never shuffle, only distinct cells."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        ln = (
            pc.cast(b["l_linenumber"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        pairs = np.stack([ok, ln], axis=1)
        u, cnt = np.unique(pairs, axis=0, return_counts=True)
        return pa.table(
            {
                "okey": pa.array(u[:, 0].astype(np.int64)),
                "ln": pa.array(u[:, 1].astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("g", "no", "nl", "ok_", "dup", "gap", "mx")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["okey", "ln"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        ok = g["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        ln = g["ln"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        u, idx = np.unique(ok, return_inverse=True)
        nd = np.bincount(idx).astype(np.int64)       # distinct linenos
        nl = np.zeros(len(u), np.int64)              # total lines
        np.add.at(nl, idx, n)
        mn = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, idx, ln)
        mx = np.zeros(len(u), np.int64)
        np.maximum.at(mx, idx, ln)
        is_ok = (nd == nl) & (mn == 1) & (mx == nl)
        is_dup = nd < nl
        is_gap = (nd == nl) & ~is_ok
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "no": pa.array([len(u)], pa.int64()),
                "nl": pa.array([int(nl.sum())], pa.int64()),
                "ok_": pa.array([int(is_ok.sum())], pa.int64()),
                "dup": pa.array([int(is_dup.sum())], pa.int64()),
                "gap": pa.array([int(is_gap.sum())], pa.int64()),
                "mx": pa.array([int(mx.max())], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "n_orders",
            "n_lines",
            "ok_orders",
            "dup_orders",
            "gap_orders",
            "max_linenumber",
        )
        if t.num_rows == 0:
            return pa.table({c: pa.array([0], pa.int64()) for c in out})
        return pa.table(
            {
                "n_orders": pa.array(
                    [int(pc.sum(t["no"]).as_py())], pa.int64()
                ),
                "n_lines": pa.array(
                    [int(pc.sum(t["nl"]).as_py())], pa.int64()
                ),
                "ok_orders": pa.array(
                    [int(pc.sum(t["ok_"]).as_py())], pa.int64()
                ),
                "dup_orders": pa.array(
                    [int(pc.sum(t["dup"]).as_py())], pa.int64()
                ),
                "gap_orders": pa.array(
                    [int(pc.sum(t["gap"]).as_py())], pa.int64()
                ),
                "max_linenumber": pa.array(
                    [int(pc.max(t["mx"]).as_py())], pa.int64()
                ),
            }
        )

    cells = lines.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = hash_partition_merge(
        cells, "okey", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(folded, "g", merge, k=1)


def assortment_depth(sf_dir: str) -> Dataset:
    """R85: assortment-depth matrix (the TPC-H Q16 question) — per
    (brand, size band of 10): catalog parts, parts that actually
    shipped, DISTINCT suppliers that shipped them, and shipped lines —
    how many suppliers can actually source each corner of the catalog
    (R52 histograms competition per PART, R58 measures one brand's
    volume concentration; R85 answers Q16's procurement question on
    the brand × size grid: a cell with many parts but few suppliers is
    a single-source risk, the inverse is commodity depth).  Dense
    small output (brands × 5 bands); exact int64 (two-hop join +
    COUNT DISTINCT oracle).

    Scale shape — two chained bounded exchanges, lines never shuffle
    raw: line batches pre-reduce to distinct (partkey, suppkey, n)
    cells and meet the part dim's (partkey → brand, band) rows on ONE
    partkey-hash exchange (union-tag + searchsorted attach); the
    resulting (brand, band, suppkey) cells — bounded by
    parts × suppliers-per-part, already corpus-small — settle distinct
    suppliers per grid cell on ONE (brand, band)-hash exchange; k=1
    merge sums O(cells) rows."""
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    brands = pa.array(
        sorted(
            rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_brand"])
            .unique("p_brand")
        ),
        pa.string(),
    )

    def part_cells(b: pa.Table) -> pa.Table:
        size = (
            pc.cast(b["p_size"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "sk": pa.array(np.full(b.num_rows, -1, np.int64)),
                "bb": pc.cast(
                    pc.index_in(b["p_brand"], value_set=brands), pa.int64()
                ),
                "band": pa.array((size - 1) // 10),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def line_cells(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].combine_chunks().to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].combine_chunks().to_numpy(zero_copy_only=False)
        pairs = np.stack([pk, sk], axis=1)
        u, cnt = np.unique(pairs, axis=0, return_counts=True)
        n = len(u)
        return pa.table(
            {
                "k": pa.array(u[:, 0].astype(np.int64)),
                "sk": pa.array(u[:, 1].astype(np.int64)),
                "bb": pa.array(np.full(n, -1, np.int64)),
                "band": pa.array(np.zeros(n, np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def join_fold(t: pa.Table) -> pa.Table:
        cols = ("cell", "bb", "band", "sk", "np_", "ns_", "nl")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        bbv = t["bb"].combine_chunks().to_numpy(zero_copy_only=False)
        is_part = bbv >= 0
        p = t.filter(pa.array(is_part))
        l = t.filter(pa.array(~is_part))
        pk = p["k"].combine_chunks().to_numpy(zero_copy_only=False)
        porder = np.argsort(pk, kind="stable")
        pk_s = pk[porder]
        pbb = p["bb"].combine_chunks().to_numpy(zero_copy_only=False)[porder]
        pband = p["band"].combine_chunks().to_numpy(zero_copy_only=False)[
            porder
        ]
        # line side: settle (partkey, suppkey) across batches
        lg = l.group_by(["k", "sk"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        lk = lg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        lsk = lg["sk"].combine_chunks().to_numpy(zero_copy_only=False)
        ln = lg["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = (
            np.clip(np.searchsorted(pk_s, lk), 0, max(len(pk_s) - 1, 0))
            if len(pk_s)
            else np.zeros(len(lk), np.int64)
        )
        hit = (pk_s[pos] == lk) if len(pk_s) else np.zeros(len(lk), bool)
        # per shipped (brand, band, suppkey): lines; plus per part: shipped?
        cell_b = pbb[pos[hit]]
        cell_d = pband[pos[hit]]
        shipped_pk = lk[hit]
        # catalog rows: every part contributes n_parts (and whether it
        # shipped: distinct shipped partkeys among lk)
        sp = np.unique(shipped_pk)
        part_shipped = (
            np.zeros(len(pk_s), bool)
            if len(pk_s)
            else np.zeros(0, bool)
        )
        if len(pk_s):
            ppos = np.searchsorted(sp, pk_s)
            ppos = np.clip(ppos, 0, max(len(sp) - 1, 0))
            part_shipped = (sp[ppos] == pk_s) if len(sp) else part_shipped
        # emit two row kinds: per-(brand,band,suppkey) line cells and
        # per-(brand,band) catalog/shipped-part counters (sk = -1)
        cat_key = pbb * 8 + pband
        u_cat, cat_idx = np.unique(cat_key, return_inverse=True)
        np_cat = np.bincount(cat_idx).astype(np.int64)
        sp_cat = np.zeros(len(u_cat), np.int64)
        np.add.at(sp_cat, cat_idx, part_shipped.astype(np.int64))
        return pa.table(
            {
                "cell": pa.array(
                    np.concatenate([cell_b * 8 + cell_d, u_cat])
                ),
                "bb": pa.array(
                    np.concatenate([cell_b, u_cat // 8])
                ),
                "band": pa.array(
                    np.concatenate([cell_d, u_cat % 8])
                ),
                "sk": pa.array(
                    np.concatenate(
                        [lsk[hit], np.full(len(u_cat), -1, np.int64)]
                    )
                ),
                "np_": pa.array(
                    np.concatenate(
                        [np.zeros(int(hit.sum()), np.int64), np_cat]
                    )
                ),
                "ns_": pa.array(
                    np.concatenate(
                        [np.zeros(int(hit.sum()), np.int64), sp_cat]
                    )
                ),
                "nl": pa.array(
                    np.concatenate([ln[hit], np.zeros(len(u_cat), np.int64)])
                ),
            }
        )

    def cell_fold(t: pa.Table) -> pa.Table:
        cols = ("bb", "band", "np_", "ns_", "nsup", "nl")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        sk = t["sk"].combine_chunks().to_numpy(zero_copy_only=False)
        is_line = sk >= 0
        l = t.filter(pa.array(is_line))
        c = t.filter(pa.array(~is_line))
        # distinct suppliers per (brand, band) — all of a cell's rows
        # are co-located on the cell-hash exchange
        lg = l.group_by(["cell", "sk"], use_threads=False).aggregate(
            [("nl", "sum")]
        )
        lcell = lg["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        lnl = lg["nl_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        u_l, l_idx = (
            np.unique(lcell, return_inverse=True)
            if len(lcell)
            else (np.zeros(0, np.int64), np.zeros(0, np.int64))
        )
        nsup = np.bincount(l_idx, minlength=len(u_l)).astype(np.int64)
        nl_sum = np.zeros(len(u_l), np.int64)
        np.add.at(nl_sum, l_idx, lnl)
        cg = c.group_by("cell", use_threads=False).aggregate(
            [("np_", "sum"), ("ns_", "sum")]
        )
        ccell = cg["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        cnp = cg["np__sum"].combine_chunks().to_numpy(zero_copy_only=False)
        cns = cg["ns__sum"].combine_chunks().to_numpy(zero_copy_only=False)
        allc = np.union1d(u_l, ccell)
        out_np = np.zeros(len(allc), np.int64)
        out_ns = np.zeros(len(allc), np.int64)
        out_nsup = np.zeros(len(allc), np.int64)
        out_nl = np.zeros(len(allc), np.int64)
        if len(ccell):
            out_np[np.searchsorted(allc, ccell)] = cnp
            out_ns[np.searchsorted(allc, ccell)] = cns
        if len(u_l):
            out_nsup[np.searchsorted(allc, u_l)] = nsup
            out_nl[np.searchsorted(allc, u_l)] = nl_sum
        return pa.table(
            {
                "bb": pa.array(allc // 8),
                "band": pa.array(allc % 8),
                "np_": pa.array(out_np),
                "ns_": pa.array(out_ns),
                "nsup": pa.array(out_nsup),
                "nl": pa.array(out_nl),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "brand",
            "size_band",
            "n_parts",
            "n_shipped_parts",
            "n_suppliers",
            "n_lines",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "brand": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by(["bb", "band"], use_threads=False).aggregate(
            [("np_", "sum"), ("ns_", "sum"), ("nsup", "sum"), ("nl", "sum")]
        )
        return pa.table(
            {
                "brand": brands.take(g["bb"]),
                "size_band": pc.cast(g["band"], pa.int64()),
                "n_parts": pc.cast(g["np__sum"], pa.int64()),
                "n_shipped_parts": pc.cast(g["ns__sum"], pa.int64()),
                "n_suppliers": pc.cast(g["nsup_sum"], pa.int64()),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
            }
        )

    tagged = parts.map_batches(
        part_cells, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        lines.map_batches(
            line_cells, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    cells = hash_partition_merge(
        tagged, "k", join_fold, k=_rel_k(sf_dir, "lineitem")
    )
    folded = hash_partition_merge(
        cells, "cell", cell_fold, k=_rel_k(sf_dir, "part")
    )
    return hash_partition_merge(folded, "bb", merge, k=1)


def sourcing_geography(sf_dir: str) -> Dataset:
    """R86: sourcing-geography matrix — per (supplier nation, part
    brand): shipped lines, exact quantity, and floored revenue
    Σfloor(extprice·(1−disc)) — WHERE each brand is actually made (R4
    rolls supplier revenue to the REGION with no product axis, R58
    measures one brand's supplier concentration, R15 crosses the two
    CUSTOMER-side nations; R86 is the supply-side product map: a brand
    sourced from one nation is a tariff/embargo single point of
    failure, and the matrix is Q8's market-share numerator before the
    share divide).  Dense small output (nations × brands); exact int64
    (two-hop join + GROUP BY oracle).

    Scale shape — R15's chained co-partition discipline, two hops:
      1. SUPPKEY hop: line batches pre-reduce per (suppkey, partkey)
         with one Arrow group_by and meet the supplier dim's
         (suppkey → nationkey) rows (union-tag + searchsorted attach;
         the supplier dim GROWS WITH THE CORPUS — never broadcast);
      2. PARTKEY hop: the (partkey, nation, nl, qty, rev) cells meet
         the part dim's (partkey → brand) rows the same way and
         collapse IN PLACE to (nation, brand) partials;
    k=1 merge sums O(nations × brands) rows; names attach from the
    25-row nation broadcast."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_suppkey",
            "l_partkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    sup = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "supplier"),
    )
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat = nat.sort_values("n_nationkey").reset_index(drop=True)
    nat_names = pa.array(nat["n_name"].tolist(), pa.string())
    nat_keys = np.sort(nat["n_nationkey"].to_numpy().astype(np.int64))
    brands = pa.array(
        sorted(
            rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_brand"])
            .unique("p_brand")
        ),
        pa.string(),
    )

    def line_hop1(b: pa.Table) -> pa.Table:
        ep = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dc = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "k": pc.cast(b["l_suppkey"], pa.int64()),
                "pk": pc.cast(b["l_partkey"], pa.int64()),
                "nat": pa.array(np.full(b.num_rows, -1, np.int64)),
                "nl": pa.array(np.ones(b.num_rows, np.int64)),
                "qty": pa.array(
                    np.floor(
                        b["l_quantity"]
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                ),
                "rev": pa.array(np.floor(ep * (1.0 - dc)).astype(np.int64)),
            }
        )
        g = t.group_by(["k", "pk", "nat"], use_threads=False).aggregate(
            [("nl", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["k", "pk", "nat", "nl", "qty", "rev"])

    def sup_hop1(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["s_suppkey"], pa.int64()),
                "pk": pa.array(np.full(n, -1, np.int64)),
                "nat": pc.cast(b["s_nationkey"], pa.int64()),
                "nl": pa.array(np.zeros(n, np.int64)),
                "qty": pa.array(np.zeros(n, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fold1(t: pa.Table) -> pa.Table:
        cols = ("k", "pk", "nat", "nl", "qty", "rev")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        natv = t["nat"].combine_chunks().to_numpy(zero_copy_only=False)
        is_sup = natv >= 0
        s = t.filter(pa.array(is_sup))
        l = t.filter(pa.array(~is_sup))
        if s.num_rows == 0 or l.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        lg = l.group_by(["k", "pk"], use_threads=False).aggregate(
            [("nl", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        lk = lg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        sk = s["k"].combine_chunks().to_numpy(zero_copy_only=False)
        sorder = np.argsort(sk, kind="stable")
        sk_s = sk[sorder]
        pos = np.clip(np.searchsorted(sk_s, lk), 0, len(sk_s) - 1)
        hit = sk_s[pos] == lk
        snat = s["nat"].combine_chunks().to_numpy(zero_copy_only=False)[
            sorder
        ][pos]
        hitarr = pa.array(hit)
        return pa.table(
            {
                "k": pa.array(lg["pk"].combine_chunks().to_numpy(
                    zero_copy_only=False
                )[hit], pa.int64()),
                "pk": pa.array(np.full(int(hit.sum()), -2, np.int64)),
                "nat": pa.array(snat[hit], pa.int64()),
                "nl": pc.cast(lg["nl_sum"], pa.int64()).filter(hitarr),
                "qty": pc.cast(lg["qty_sum"], pa.int64()).filter(hitarr),
                "rev": pc.cast(lg["rev_sum"], pa.int64()).filter(hitarr),
            }
        )

    def part_hop2(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "pk": pc.cast(
                    pc.index_in(b["p_brand"], value_set=brands), pa.int64()
                ),
                "nat": pa.array(np.full(n, -1, np.int64)),
                "nl": pa.array(np.zeros(n, np.int64)),
                "qty": pa.array(np.zeros(n, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fold2(t: pa.Table) -> pa.Table:
        cols = ("nat", "bb", "nl", "qty", "rev")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        pkv = t["pk"].combine_chunks().to_numpy(zero_copy_only=False)
        is_part = pkv >= 0
        p = t.filter(pa.array(is_part))
        l = t.filter(pa.array(~is_part))
        if p.num_rows == 0 or l.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        lk = l["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pk = p["k"].combine_chunks().to_numpy(zero_copy_only=False)
        porder = np.argsort(pk, kind="stable")
        pk_s = pk[porder]
        pos = np.clip(np.searchsorted(pk_s, lk), 0, len(pk_s) - 1)
        hit = pk_s[pos] == lk
        bb = p["pk"].combine_chunks().to_numpy(zero_copy_only=False)[porder][
            pos
        ]
        cells = pa.table(
            {
                "nat": pa.array(
                    l["nat"].combine_chunks().to_numpy(zero_copy_only=False)[
                        hit
                    ],
                    pa.int64(),
                ),
                "bb": pa.array(bb[hit], pa.int64()),
                "nl": pc.cast(l["nl"], pa.int64()).filter(pa.array(hit)),
                "qty": pc.cast(l["qty"], pa.int64()).filter(pa.array(hit)),
                "rev": pc.cast(l["rev"], pa.int64()).filter(pa.array(hit)),
            }
        )
        g = cells.group_by(["nat", "bb"], use_threads=False).aggregate(
            [("nl", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["nat", "bb", "nl", "qty", "rev"])

    def merge(t: pa.Table) -> pa.Table:
        out = ("nation", "brand", "n_lines", "qty_floor", "revenue_floor")
        if t.num_rows == 0:
            return pa.table(
                {
                    "nation": pa.array([], pa.string()),
                    "brand": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[2:]},
                }
            )
        g = t.group_by(["nat", "bb"], use_threads=False).aggregate(
            [("nl", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        natv = g["nat"].combine_chunks().to_numpy(zero_copy_only=False)
        npos = np.searchsorted(nat_keys, natv)
        return pa.table(
            {
                "nation": nat_names.take(pa.array(npos, pa.int64())),
                "brand": brands.take(g["bb"]),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
                "qty_floor": pc.cast(g["qty_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    hop1 = hash_partition_merge(
        lines.map_batches(
            line_hop1, batch_format="pyarrow", zero_copy_batch=True
        ).union(
            sup.map_batches(
                sup_hop1, batch_format="pyarrow", zero_copy_batch=True
            )
        ),
        "k",
        fold1,
        k=_rel_k(sf_dir, "lineitem"),
    )
    hop2 = hash_partition_merge(
        hop1.union(
            parts.map_batches(
                part_hop2, batch_format="pyarrow", zero_copy_batch=True
            )
        ),
        "k",
        fold2,
        k=_rel_k(sf_dir, "lineitem"),
    )
    return hash_partition_merge(hop2, "nat", merge, k=1)


def latency_drift(sf_dir: str) -> Dataset:
    """R87: fulfillment-latency drift board — per (ship year, order
    priority): lines, Σdays, Σdays² with days = floor-days between
    order date and ship date — the exact-int64 sufficient statistics
    of the SLA TREND (R20 gives the static latency quantiles, R70
    couples latency with VALUE, R65 grades a fixed SLA; R87 asks
    whether fulfillment is getting faster or slower year over year,
    per priority class — mean and variance per cell read straight off
    the sums, and two cells difference into an exact A/B).  Dense
    small output (years × 5 priorities); exact int64 (join +
    epoch-floor-divide + GROUP BY oracle).

    Scale shape — ONE orderkey-hash co-partition, lines pre-reduced:
    lines collapse per batch to (okey, ship-day, n) cells (lines of an
    order sharing a ship date merge before the exchange); orders ride
    as (okey, order-day, priority); the fold attaches via one
    searchsorted, computes each cell's gap ONCE, weights by n, and
    collapses IN PLACE to (year, priority) partials; the k=1 merge
    sums O(years × priorities) rows."""
    pr = _priority_rank(sf_dir)
    prs = pa.array(list(pr), pa.string())

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def line_cells(b: pa.Table) -> pa.Table:
        sd = (
            b["l_shipdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "d": pa.array(sd // 86_400_000_000, pa.int64()),
                "yr": pa.array(
                    sd.astype("datetime64[us]")
                    .astype("datetime64[Y]")
                    .astype(np.int64)
                    + 1970
                ),
                "pr": pa.array(np.full(b.num_rows, -1, np.int64)),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["k", "d", "yr", "pr"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["k", "d", "yr", "pr", "n"])

    def order_cells(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "d": pa.array(od // 86_400_000_000, pa.int64()),
                "yr": pa.array(np.zeros(b.num_rows, np.int64)),
                "pr": pc.cast(
                    pc.index_in(b["o_orderpriority"], value_set=prs),
                    pa.int64(),
                ),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("yr", "pr", "nl", "sd", "sdd")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        prv = t["pr"].combine_chunks().to_numpy(zero_copy_only=False)
        is_order = prv >= 0
        o = t.filter(pa.array(is_order))
        l = t.filter(pa.array(~is_order))
        if o.num_rows == 0 or l.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        lk = l["k"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = o["k"].combine_chunks().to_numpy(zero_copy_only=False)
        oorder = np.argsort(ok, kind="stable")
        ok_s = ok[oorder]
        pos = np.clip(np.searchsorted(ok_s, lk), 0, len(ok_s) - 1)
        hit = ok_s[pos] == lk
        od = o["d"].combine_chunks().to_numpy(zero_copy_only=False)[oorder][
            pos
        ]
        opr = o["pr"].combine_chunks().to_numpy(zero_copy_only=False)[
            oorder
        ][pos]
        gap = (
            l["d"].combine_chunks().to_numpy(zero_copy_only=False) - od
        )[hit]
        yr = l["yr"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        n = l["n"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        cells = pa.table(
            {
                "yr": pa.array(yr, pa.int64()),
                "pr": pa.array(opr[hit], pa.int64()),
                "nl": pa.array(n, pa.int64()),
                "sd": pa.array(n * gap, pa.int64()),
                "sdd": pa.array(n * gap * gap, pa.int64()),
            }
        )
        g = cells.group_by(["yr", "pr"], use_threads=False).aggregate(
            [("nl", "sum"), ("sd", "sum"), ("sdd", "sum")]
        )
        return g.rename_columns(["yr", "pr", "nl", "sd", "sdd"])

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "ship_year",
            "o_orderpriority",
            "n_lines",
            "sum_days",
            "sum_days_sq",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "ship_year": pa.array([], pa.int64()),
                    "o_orderpriority": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[2:]},
                }
            )
        g = t.group_by(["yr", "pr"], use_threads=False).aggregate(
            [("nl", "sum"), ("sd", "sum"), ("sdd", "sum")]
        )
        return pa.table(
            {
                "ship_year": pc.cast(g["yr"], pa.int64()),
                "o_orderpriority": prs.take(g["pr"]),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
                "sum_days": pc.cast(g["sd_sum"], pa.int64()),
                "sum_days_sq": pc.cast(g["sdd_sum"], pa.int64()),
            }
        )

    tagged = lines.map_batches(
        line_cells, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        ords.map_batches(
            order_cells, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    cells = hash_partition_merge(
        tagged, "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "yr", merge, k=1)


def segment_value_trend(sf_dir: str) -> Dataset:
    """R88: segment value-trend sufficient statistics — per market
    segment, over all orders: n, Σm, Σm², Σv, Σv², Σm·v with m = the
    order's month index (year·12 + month−1) and v = floor(totalprice)
    — the exact-int64 normal equations of the ticket-size-vs-time
    regression per segment ("is BUILDING's basket inflating faster
    than AUTOMOBILE's"), the relational twin of E97's payload trend
    (R25 counts order-book GROWTH, R63 gives static value quantiles,
    R68 splits new-vs-repeat; none trends the ticket size itself).
    One dense row per segment ALWAYS.  Int64 bound documented: m ≤
    ~25k (two millennia of months), v ≤ 10⁶ → Σm·v holds ~4·10⁸
    orders/segment.  Exact int64 (join + extract-month + SUM oracle).

    Scale shape — ONE custkey-hash co-partition: order batches
    pre-reduce to (custkey, m, v) triples... they stay narrow rows;
    customers ride as (custkey → segment); the fold attaches segment
    by one searchsorted and collapses IN PLACE to six sums per
    segment; O(parts × segments) partials reach the k=1 merge."""
    segs = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]
            ).unique("c_mktsegment")
        ),
        pa.string(),
    )
    nseg = len(segs)

    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )

    def order_rows(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        dt = od.astype("datetime64[us]")
        yr = dt.astype("datetime64[Y]").astype(np.int64) + 1970
        mo = dt.astype("datetime64[M]").astype(np.int64) % 12
        return pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "m": pa.array(yr * 12 + mo, pa.int64()),
                "v": pa.array(
                    np.floor(
                        b["o_totalprice"]
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                ),
                "seg": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        )

    def cust_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "m": pa.array(np.zeros(n, np.int64)),
                "v": pa.array(np.zeros(n, np.int64)),
                "seg": pc.cast(
                    pc.index_in(b["c_mktsegment"], value_set=segs), pa.int64()
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("seg", "n", "sm", "smm", "sv", "svv", "smv")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        segv = t["seg"].combine_chunks().to_numpy(zero_copy_only=False)
        is_cust = segv >= 0
        c = t.filter(pa.array(is_cust))
        o = t.filter(pa.array(~is_cust))
        if c.num_rows == 0 or o.num_rows == 0:
            return pa.table({c2: pa.array([], pa.int64()) for c2 in cols})
        ok = o["k"].combine_chunks().to_numpy(zero_copy_only=False)
        ck = c["k"].combine_chunks().to_numpy(zero_copy_only=False)
        corder = np.argsort(ck, kind="stable")
        ck_s = ck[corder]
        pos = np.clip(np.searchsorted(ck_s, ok), 0, len(ck_s) - 1)
        hit = ck_s[pos] == ok
        seg = c["seg"].combine_chunks().to_numpy(zero_copy_only=False)[
            corder
        ][pos][hit]
        m = o["m"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        v = o["v"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        out = {"seg": np.arange(nseg, dtype=np.int64)}
        out["n"] = np.bincount(seg, minlength=nseg).astype(np.int64)
        for name, arr in (
            ("sm", m),
            ("smm", m * m),
            ("sv", v),
            ("svv", v * v),
            ("smv", m * v),
        ):
            acc = np.zeros(nseg, np.int64)
            np.add.at(acc, seg, arr)
            out[name] = acc
        return pa.table({c2: pa.array(a) for c2, a in out.items()})

    def merge(t: pa.Table) -> pa.Table:
        names = (
            "c_mktsegment",
            "n_orders",
            "sum_m",
            "sum_m_sq",
            "sum_v",
            "sum_v_sq",
            "sum_m_v",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in names[1:]},
                }
            )
        g = t.group_by("seg", use_threads=False).aggregate(
            [(c, "sum") for c in ("n", "sm", "smm", "sv", "svv", "smv")]
        )
        ss = g["seg"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        cols = {
            name: g[f"{src}_sum"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)[order]
            for name, src in zip(
                names[1:], ("n", "sm", "smm", "sv", "svv", "smv")
            )
        }
        keep = cols["n_orders"] > 0
        return pa.table(
            {
                "c_mktsegment": segs.take(
                    pa.array(ss[order][keep], pa.int64())
                ),
                **{
                    c: pa.array(a[keep], pa.int64())
                    for c, a in cols.items()
                },
            }
        )

    tagged = ords.map_batches(
        order_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        cust.map_batches(
            cust_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    cells = hash_partition_merge(
        tagged, "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "seg", merge, k=1)


def weekday_rhythm(sf_dir: str) -> Dataset:
    """R89: weekday-rhythm matrix — per (order weekday, ship weekday):
    lines and exact Σfloor-day latency — the operational-cadence grid
    (R73 profiles demand by ORDER weekday alone, R87 trends latency by
    YEAR; R89 crosses the two clock faces: a hot Friday→Monday cell is
    a warehouse that sleeps weekends, a flat matrix is 24/7 robotics —
    and each cell's mean latency divides straight out of the sums).
    Weekday convention: 0 = Monday (epoch day 0, 1970-01-01, was a
    Thursday → (day + 3) % 7).  Dense small output (≤49 cells); exact
    int64 (epoch-floor arithmetic + GROUP BY oracle — the day-floor
    subtraction convention R87 documents).

    Scale shape — R87's ONE orderkey-hash co-partition verbatim: line
    batches pre-reduce to (okey, ship-day, n) cells, orders ride as
    (okey, order-day), the fold attaches by searchsorted, derives both
    weekdays and the gap with three modulos, and collapses IN PLACE to
    49-cell partials; the k=1 merge sums O(parts × 49) rows."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def line_cells(b: pa.Table) -> pa.Table:
        sd = (
            b["l_shipdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "d": pa.array(sd, pa.int64()),
                "is_o": pa.array(np.zeros(b.num_rows, np.int64)),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["k", "d", "is_o"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["k", "d", "is_o", "n"])

    def order_cells(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "d": pa.array(od, pa.int64()),
                "is_o": pa.array(np.ones(b.num_rows, np.int64)),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("cell", "nl", "sg")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        iso = t["is_o"].combine_chunks().to_numpy(zero_copy_only=False)
        o = t.filter(pa.array(iso == 1))
        l = t.filter(pa.array(iso == 0))
        if o.num_rows == 0 or l.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        lk = l["k"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = o["k"].combine_chunks().to_numpy(zero_copy_only=False)
        oorder = np.argsort(ok, kind="stable")
        ok_s = ok[oorder]
        pos = np.clip(np.searchsorted(ok_s, lk), 0, len(ok_s) - 1)
        hit = ok_s[pos] == lk
        od = o["d"].combine_chunks().to_numpy(zero_copy_only=False)[oorder][
            pos
        ][hit]
        ld = l["d"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        n = l["n"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        odow = (od + 3) % 7
        sdow = (ld + 3) % 7
        gap = ld - od
        cell = odow * 7 + sdow
        nl = np.zeros(49, np.int64)
        np.add.at(nl, cell, n)
        sg = np.zeros(49, np.int64)
        np.add.at(sg, cell, n * gap)
        keep = np.flatnonzero(nl)
        return pa.table(
            {
                "cell": pa.array(keep),
                "nl": pa.array(nl[keep]),
                "sg": pa.array(sg[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("order_dow", "ship_dow", "n_lines", "sum_gap_days")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("cell", use_threads=False).aggregate(
            [("nl", "sum"), ("sg", "sum")]
        )
        cell = g["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "order_dow": pa.array(cell // 7, pa.int64()),
                "ship_dow": pa.array(cell % 7, pa.int64()),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
                "sum_gap_days": pc.cast(g["sg_sum"], pa.int64()),
            }
        )

    tagged = lines.map_batches(
        line_cells, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        ords.map_batches(
            order_cells, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    cells = hash_partition_merge(
        tagged, "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "cell", merge, k=1)


def basket_coupling(sf_dir: str) -> Dataset:
    """R90: basket width-value coupling statistics — per order
    priority, over all orders with at least one line: n, Σw, Σw², Σv,
    Σv², Σw·v with w = the order's line count and v =
    floor(totalprice) — the exact-int64 inputs of the "do wide baskets
    cost more" regression per priority class (R35 histograms width
    alone, R63 quantiles value alone, R70 couples value with LATENCY;
    the width-value covariance is the basket-economics number a
    per-line pricing model or a picking-cost allocator divides out,
    and comparing slopes across priorities reads procurement
    behavior).  One dense row per priority ALWAYS.  Int64 bound
    documented: w ≤ 10³, v ≤ 10⁶ → Σw·v holds ~10¹⁰ orders/class.
    Exact int64 (join + GROUP BY oracle).

    Scale shape — ONE orderkey-hash co-partition: line batches
    pre-reduce to (okey, nl) cells; orders ride as (okey, priority,
    v); the fold settles each order's width, forms the five products
    once, and collapses IN PLACE to per-priority sums; the k=1 merge
    sums O(parts × priorities) rows."""
    pr = _priority_rank(sf_dir)
    prs = pa.array(list(pr), pa.string())
    npr = len(prs)

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def line_cells(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        u, cnt = np.unique(ok, return_counts=True)
        return pa.table(
            {
                "k": pa.array(u.astype(np.int64)),
                "w": pa.array(cnt.astype(np.int64)),
                "pr": pa.array(np.full(len(u), -1, np.int64)),
                "v": pa.array(np.zeros(len(u), np.int64)),
            }
        )

    def order_cells(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "w": pa.array(np.zeros(b.num_rows, np.int64)),
                "pr": pc.cast(
                    pc.index_in(b["o_orderpriority"], value_set=prs),
                    pa.int64(),
                ),
                "v": pa.array(
                    np.floor(
                        b["o_totalprice"]
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("pr", "n", "sw", "sww", "sv", "svv", "swv")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        prv = t["pr"].combine_chunks().to_numpy(zero_copy_only=False)
        is_order = prv >= 0
        o = t.filter(pa.array(is_order))
        l = t.filter(pa.array(~is_order))
        if o.num_rows == 0 or l.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        lg = l.group_by("k", use_threads=False).aggregate([("w", "sum")])
        lk = lg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        lw = lg["w_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = o["k"].combine_chunks().to_numpy(zero_copy_only=False)
        oorder = np.argsort(ok, kind="stable")
        ok_s = ok[oorder]
        pos = np.clip(np.searchsorted(ok_s, lk), 0, len(ok_s) - 1)
        hit = ok_s[pos] == lk
        opr = o["pr"].combine_chunks().to_numpy(zero_copy_only=False)[
            oorder
        ][pos][hit]
        ov = o["v"].combine_chunks().to_numpy(zero_copy_only=False)[
            oorder
        ][pos][hit]
        w = lw[hit]
        out = {"pr": np.arange(npr, dtype=np.int64)}
        out["n"] = np.bincount(opr, minlength=npr).astype(np.int64)
        for name, arr in (
            ("sw", w),
            ("sww", w * w),
            ("sv", ov),
            ("svv", ov * ov),
            ("swv", w * ov),
        ):
            acc = np.zeros(npr, np.int64)
            np.add.at(acc, opr, arr)
            out[name] = acc
        return pa.table({c: pa.array(a) for c, a in out.items()})

    def merge(t: pa.Table) -> pa.Table:
        names = (
            "o_orderpriority",
            "n_orders",
            "sum_w",
            "sum_w_sq",
            "sum_v",
            "sum_v_sq",
            "sum_w_v",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in names[1:]},
                }
            )
        g = t.group_by("pr", use_threads=False).aggregate(
            [(c, "sum") for c in ("n", "sw", "sww", "sv", "svv", "swv")]
        )
        ss = g["pr"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        cols = {
            name: g[f"{src}_sum"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)[order]
            for name, src in zip(
                names[1:], ("n", "sw", "sww", "sv", "svv", "swv")
            )
        }
        keep = cols["n_orders"] > 0
        return pa.table(
            {
                "o_orderpriority": prs.take(
                    pa.array(ss[order][keep], pa.int64())
                ),
                **{
                    c: pa.array(a[keep], pa.int64())
                    for c, a in cols.items()
                },
            }
        )

    tagged = lines.map_batches(
        line_cells, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        ords.map_batches(
            order_cells, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    cells = hash_partition_merge(
        tagged, "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "pr", merge, k=1)


def ship_dom_profile(sf_dir: str) -> Dataset:
    """R91: ship day-of-month profile — per calendar day-of-month
    (1..31): shipped lines, exact quantity, and floored revenue — the
    billing-cycle signature on the fulfillment side (R73 profiles
    ORDER demand by weekday, R45 order seasonality by month; R91 reads
    the intra-month loading of SHIPMENTS: a spike at 28-31 is
    quota-driven month-end loading — the classic hockey-stick every
    capacity planner de-peaks — and a flat profile is pull-based
    flow).  Dense small output (≤31 rows); exact int64
    (extract(day) + GROUP BY oracle).

    Scale shape — ZERO wide exchange: day-of-month is a bounded axis;
    each batch reduces with one calendar decompose + one bincount to
    31-cell partials; O(batches × 31) rows ride the k=1 merge."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_quantity", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        sd = (
            b["l_shipdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        dt = sd.astype("datetime64[us]")
        dom = (
            dt.astype("datetime64[D]").astype(np.int64)
            - dt.astype("datetime64[M]").astype("datetime64[D]").astype(
                np.int64
            )
            + 1
        )
        q = np.floor(
            b["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        ep = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dc = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ep * (1.0 - dc)).astype(np.int64)
        nl = np.bincount(dom, minlength=32).astype(np.int64)
        qs = np.zeros(32, np.int64)
        np.add.at(qs, dom, q)
        rs = np.zeros(32, np.int64)
        np.add.at(rs, dom, rev)
        keep = np.flatnonzero(nl)
        return pa.table(
            {
                "dom": pa.array(keep),
                "nl": pa.array(nl[keep]),
                "qty": pa.array(qs[keep]),
                "rev": pa.array(rs[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("day_of_month", "n_lines", "qty_floor", "revenue_floor")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("dom", use_threads=False).aggregate(
            [("nl", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        return pa.table(
            {
                "day_of_month": pc.cast(g["dom"], pa.int64()),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
                "qty_floor": pc.cast(g["qty_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    partials = lines.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "dom", merge, k=1)


def orderbook_aging(sf_dir: str) -> Dataset:
    """R92: order-book aging board — per order status: orders, and the
    discrete p50/p90 of the order's AGE in floor-days relative to the
    corpus's last order date — the backlog read (R28 counts status ×
    YEAR, R2 grades fulfillment, R20 measures shipped latency; R92
    asks how stale each status bucket is AS OF the book's own horizon:
    an 'O' bucket whose p90 age rivals 'F's is a pipeline that stopped
    closing orders — the aging WIP every operations review opens
    with).  One dense row per status ALWAYS; exact int64 under the
    quantile_disc rank rule (max-date CTE + floor-day age +
    quantile_disc oracle).

    Scale shape — a two-pass bounded-domain histogram: a tiny max
    reduction pins the horizon (one scalar crosses the driver); each
    batch then bincounts (status, age-day) cells — the age axis is the
    book's day span — and ONE k=1 merge reads both quantiles off a
    cumsum per status; raw orders never shuffle."""
    stats = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet", columns=["o_orderstatus"]
            ).unique("o_orderstatus")
        ),
        pa.string(),
    )
    nst = len(stats)

    mx = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
    ).max("o_orderdate")
    horizon = int(
        pa.scalar(mx).cast(pa.timestamp("us")).cast(pa.int64()).as_py()
        // 86_400_000_000
    )

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["o_orderstatus"], value_set=stats), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        age = horizon - (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        t = pa.table(
            {
                "st": pa.array(code),
                "age": pa.array(age, pa.int64()),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["st", "age"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["st", "age", "n"])

    def merge(t: pa.Table) -> pa.Table:
        out = ("o_orderstatus", "n_orders", "p50_age_days", "p90_age_days")
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_orderstatus": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by(["st", "age"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        st = g["st"].combine_chunks().to_numpy(zero_copy_only=False)
        age = g["age"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        rows = {"o_orderstatus": [], "n_orders": [], "p50_age_days": [],
                "p90_age_days": []}
        for si in np.unique(st):
            sel = st == si
            a, c = age[sel], n[sel]
            order = np.argsort(a)
            a, c = a[order], c[order]
            tot = int(c.sum())
            cum = np.cumsum(c)
            p50 = int(a[np.searchsorted(cum, (tot * 500 + 999) // 1000)])
            p90 = int(a[np.searchsorted(cum, (tot * 900 + 999) // 1000)])
            rows["o_orderstatus"].append(si)
            rows["n_orders"].append(tot)
            rows["p50_age_days"].append(p50)
            rows["p90_age_days"].append(p90)
        return pa.table(
            {
                "o_orderstatus": stats.take(
                    pa.array(rows["o_orderstatus"], pa.int64())
                ),
                "n_orders": pa.array(rows["n_orders"], pa.int64()),
                "p50_age_days": pa.array(rows["p50_age_days"], pa.int64()),
                "p90_age_days": pa.array(rows["p90_age_days"], pa.int64()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "st", merge, k=1)


def supplier_recency(sf_dir: str) -> Dataset:
    """R93: supplier recency histogram — band every supplier by the
    log2 of days since its LAST shipment (relative to the corpus's
    last ship date; band -1 = registered but NEVER shipped; band 0 =
    shipped on the horizon day) and count suppliers and their lifetime
    lines per band — the supply-base LIVENESS read (R32 concentrates
    volume per nation, R56 spans brand lifecycles; R93 asks which
    suppliers have quietly gone dark: the fat high bands are churned
    capacity procurement still counts on paper, the -1 band is
    onboarding that never activated).  Dense small output (≤~16
    bands); exact int64 (max-date CTEs + LEFT JOIN + bit-shift band
    oracle).

    Scale shape — ONE suppkey-hash co-partition: line batches
    pre-reduce to (suppkey, last-ship-day, n) cells via one np.unique
    max; supplier dim rows ride the same exchange (LEFT-JOIN
    semantics — zero-line suppliers band at -1); each supplier settles
    locally and bincounts into band partials; the k=1 merge sums
    O(parts × bands) rows."""
    mx = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_shipdate"]
    ).max("l_shipdate")
    horizon = int(
        pa.scalar(mx).cast(pa.timestamp("us")).cast(pa.int64()).as_py()
        // 86_400_000_000
    )

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    sup = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey"],
        override_num_blocks=_rel_k(sf_dir, "supplier"),
    )

    def line_cells(b: pa.Table) -> pa.Table:
        sk = b["l_suppkey"].combine_chunks().to_numpy(zero_copy_only=False)
        d = (
            b["l_shipdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        u, idx = np.unique(sk, return_inverse=True)
        last = np.zeros(len(u), np.int64)
        np.maximum.at(last, idx, d)
        nl = np.bincount(idx).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(u.astype(np.int64)),
                "last": pa.array(last),
                "nl": pa.array(nl),
                "dim": pa.array(np.zeros(len(u), np.int64)),
            }
        )

    def sup_cells(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["s_suppkey"], pa.int64()),
                "last": pa.array(np.full(n, -1, np.int64)),
                "nl": pa.array(np.zeros(n, np.int64)),
                "dim": pa.array(np.ones(n, np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("band", "nsup", "nl")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        dim = t["dim"].combine_chunks().to_numpy(zero_copy_only=False)
        s = t.filter(pa.array(dim == 1))
        l = t.filter(pa.array(dim == 0))
        sk = np.unique(
            s["k"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        if len(sk) == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        lk = l["k"].combine_chunks().to_numpy(zero_copy_only=False)
        llast = l["last"].combine_chunks().to_numpy(zero_copy_only=False)
        lnl = l["nl"].combine_chunks().to_numpy(zero_copy_only=False)
        last = np.full(len(sk), -1, np.int64)
        nl = np.zeros(len(sk), np.int64)
        if len(lk):
            pos = np.searchsorted(sk, lk)
            pos = np.clip(pos, 0, len(sk) - 1)
            hit = sk[pos] == lk
            np.maximum.at(last, pos[hit], llast[hit])
            np.add.at(nl, pos[hit], lnl[hit])
        age = horizon - last
        # band = bit length of age (exact: searchsorted against powers
        # of two — DuckDB's length(bin(age)))
        powers2 = np.int64(1) << np.arange(1, 41)
        blen = np.searchsorted(powers2, age, side="right") + 1
        band = np.where(last < 0, -1, np.where(age <= 0, 0, blen))
        u, idx = np.unique(band, return_inverse=True)
        nsup = np.bincount(idx).astype(np.int64)
        nls = np.zeros(len(u), np.int64)
        np.add.at(nls, idx, nl)
        return pa.table(
            {
                "band": pa.array(u),
                "nsup": pa.array(nsup),
                "nl": pa.array(nls),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("recency_band", "n_suppliers", "n_lines")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("band", use_threads=False).aggregate(
            [("nsup", "sum"), ("nl", "sum")]
        )
        return pa.table(
            {
                "recency_band": pc.cast(g["band"], pa.int64()),
                "n_suppliers": pc.cast(g["nsup_sum"], pa.int64()),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
            }
        )

    tagged = lines.map_batches(
        line_cells, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        sup.map_batches(
            sup_cells, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    cells = hash_partition_merge(
        tagged, "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "band", merge, k=1)


def weekday_loyalty(sf_dir: str) -> Dataset:
    """R94: weekday-loyalty histogram — per customer compute the share
    of their orders placed on their MODAL weekday, band it by
    100-permille deciles (band = 1000·modal/total // 100 → 1..10), and
    count customers and orders per band — the habit-strength read (R73
    aggregates demand by weekday across everyone — it cannot see that
    two flat-profile populations differ: one of uniform individuals,
    one of perfectly loyal individuals spread across days; R94
    separates them, and the high bands are the predictable-reorder
    audience a replenishment campaign targets; single-order customers
    band at 10 by construction — read the band jointly with
    n_orders).  Dense small output (≤10 bands); exact int64
    (per-customer weekday counts + max/total + GROUP BY oracle;
    weekday = (epoch-day + 3) % 7, R89's convention).

    Scale shape — ONE custkey-hash exchange over pre-reduced cells:
    batches bincount (custkey, dow) locally; a customer's 7 cells
    co-locate, so the modal share settles in partition and bincounts
    IN PLACE to band partials; the k=1 merge sums O(parts × 10)
    rows."""
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ck = (
            pc.cast(b["o_custkey"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        dow = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            // 86_400_000_000
            + 3
        ) % 7
        key = ck * 7 + dow
        u, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "ck": pa.array(u // 7),
                "dow": pa.array(u % 7),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("band", "nc", "no")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["ck", "dow"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        ck = g["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        u, idx = np.unique(ck, return_inverse=True)
        tot = np.zeros(len(u), np.int64)
        np.add.at(tot, idx, n)
        mx = np.zeros(len(u), np.int64)
        np.maximum.at(mx, idx, n)
        band = 1000 * mx // tot // 100
        ub, bidx = np.unique(band, return_inverse=True)
        nc = np.bincount(bidx).astype(np.int64)
        no = np.zeros(len(ub), np.int64)
        np.add.at(no, bidx, tot)
        return pa.table(
            {
                "band": pa.array(ub),
                "nc": pa.array(nc),
                "no": pa.array(no),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("loyalty_band", "n_customers", "n_orders")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("band", use_threads=False).aggregate(
            [("nc", "sum"), ("no", "sum")]
        )
        return pa.table(
            {
                "loyalty_band": pc.cast(g["band"], pa.int64()),
                "n_customers": pc.cast(g["nc_sum"], pa.int64()),
                "n_orders": pc.cast(g["no_sum"], pa.int64()),
            }
        )

    cells = ords.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = hash_partition_merge(
        cells, "ck", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(folded, "band", merge, k=1)


def reactivation_trend(sf_dir: str, lapse_days: int = 180) -> Dataset:
    """R95: reactivation trend board — per calendar year of the RETURN
    order: orders that ended a customer silence longer than
    ``lapse_days`` (consecutive-order gap in floor-days, R21's
    convention), total repeat orders, and the win-back permille — the
    resurrection read (R21 distributes the gaps, R59 tracks cohort
    retention, R68 splits new-vs-repeat; R95 counts the moments a
    lapsed customer actually CAME BACK, by when they did — the
    time-series a win-back campaign is graded against, and rising
    reactivations with flat acquisition is a re-engagement-driven
    business).  Dense small output (years); exact int64 (lag-window +
    gap filter + year GROUP BY oracle; ties break by orderkey).

    Scale shape — ONE custkey-hash exchange of narrow (custkey, day,
    okey) rows: each partition lexsorts its complete customers once,
    adjacent same-customer gaps classify in place, and (year,
    n_repeat, n_react) partials fold k=1 — R21's machinery with the
    year attribution kept on the RETURN side."""
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def narrow(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "ck": pc.cast(b["o_custkey"], pa.int64()),
                "d": pa.array(od // 86_400_000_000, pa.int64()),
                "yr": pa.array(
                    od.astype("datetime64[us]")
                    .astype("datetime64[Y]")
                    .astype(np.int64)
                    + 1970
                ),
                "ok": pc.cast(b["o_orderkey"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("yr", "nrep", "nreact")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        ck = t["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["d"].combine_chunks().to_numpy(zero_copy_only=False)
        yr = t["yr"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = t["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, d, ck))
        cks, ds_, yrs = ck[order], d[order], yr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = cks[1:] == cks[:-1]
        pd_ = np.empty(n, dtype=np.int64)
        pd_[0] = 0
        pd_[1:] = ds_[:-1]
        gap = ds_ - pd_
        react = has_prev & (gap > lapse_days)
        u, idx = np.unique(yrs, return_inverse=True)
        nrep = np.zeros(len(u), np.int64)
        np.add.at(nrep, idx, has_prev.astype(np.int64))
        nreact = np.zeros(len(u), np.int64)
        np.add.at(nreact, idx, react.astype(np.int64))
        keep = np.flatnonzero(nrep)
        return pa.table(
            {
                "yr": pa.array(u[keep]),
                "nrep": pa.array(nrep[keep]),
                "nreact": pa.array(nreact[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("order_year", "n_repeat_orders", "n_reactivations",
               "reactivation_permille")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("yr", use_threads=False).aggregate(
            [("nrep", "sum"), ("nreact", "sum")]
        )
        yr = g["yr"].combine_chunks().to_numpy(zero_copy_only=False)
        nrep = g["nrep_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nreact = g["nreact_sum"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "order_year": pa.array(yr, pa.int64()),
                "n_repeat_orders": pa.array(nrep, pa.int64()),
                "n_reactivations": pa.array(nreact, pa.int64()),
                "reactivation_permille": pa.array(
                    1000 * nreact // np.maximum(nrep, 1), pa.int64()
                ),
            }
        )

    cells = hash_partition_merge(
        ords.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True),
        "ck",
        fold,
        k=_rel_k(sf_dir, "orders"),
    )
    return hash_partition_merge(cells, "yr", merge, k=1)


def nation_demand_trend(sf_dir: str) -> Dataset:
    """R96: nation demand-trend matrix — per (customer nation, order
    year): orders and exact floored order value — the geographic
    growth ledger (R25 tracks the GLOBAL book year over year, R77
    crosses nation with SEGMENT statically, R24 counts monthly actives
    corpus-wide; R96 is the by-market time series a regional P&L reads
    line by line — two adjacent cells difference into an exact YoY,
    and a nation rising while the global line is flat is share
    shift, not growth).  Dense small output (nations × years); exact
    int64 (two-hop join + extract(year) + GROUP BY oracle).

    Scale shape — ONE custkey-hash co-partition (the R88 shape with
    year kept on the order side): order batches ride as (custkey,
    year, v) rows, customers as (custkey → nationkey); the fold
    attaches the nation by one searchsorted and collapses IN PLACE to
    (nation, year) partials; the k=1 merge attaches names from the
    25-row nation broadcast."""
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat = nat.sort_values("n_nationkey").reset_index(drop=True)
    nat_names = pa.array(nat["n_name"].tolist(), pa.string())
    nat_keys = np.sort(nat["n_nationkey"].to_numpy().astype(np.int64))

    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )

    def order_rows(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "yr": pa.array(
                    od.astype("datetime64[us]")
                    .astype("datetime64[Y]")
                    .astype(np.int64)
                    + 1970
                ),
                "v": pa.array(
                    np.floor(
                        b["o_totalprice"]
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                ),
                "nk": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        )

    def cust_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "yr": pa.array(np.zeros(n, np.int64)),
                "v": pa.array(np.zeros(n, np.int64)),
                "nk": pc.cast(b["c_nationkey"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("nk", "yr", "no", "sv")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        nk = t["nk"].combine_chunks().to_numpy(zero_copy_only=False)
        is_cust = nk >= 0
        c = t.filter(pa.array(is_cust))
        o = t.filter(pa.array(~is_cust))
        if c.num_rows == 0 or o.num_rows == 0:
            return pa.table({c2: pa.array([], pa.int64()) for c2 in cols})
        ok = o["k"].combine_chunks().to_numpy(zero_copy_only=False)
        ck = c["k"].combine_chunks().to_numpy(zero_copy_only=False)
        corder = np.argsort(ck, kind="stable")
        ck_s = ck[corder]
        pos = np.clip(np.searchsorted(ck_s, ok), 0, len(ck_s) - 1)
        hit = ck_s[pos] == ok
        nkv = c["nk"].combine_chunks().to_numpy(zero_copy_only=False)[
            corder
        ][pos][hit]
        yr = o["yr"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        v = o["v"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        cells = pa.table(
            {
                "nk": pa.array(nkv, pa.int64()),
                "yr": pa.array(yr, pa.int64()),
                "no": pa.array(np.ones(len(yr), np.int64)),
                "sv": pa.array(v, pa.int64()),
            }
        )
        g = cells.group_by(["nk", "yr"], use_threads=False).aggregate(
            [("no", "sum"), ("sv", "sum")]
        )
        return g.rename_columns(["nk", "yr", "no", "sv"])

    def merge(t: pa.Table) -> pa.Table:
        out = ("nation", "order_year", "n_orders", "value_floor")
        if t.num_rows == 0:
            return pa.table(
                {
                    "nation": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by(["nk", "yr"], use_threads=False).aggregate(
            [("no", "sum"), ("sv", "sum")]
        )
        nkv = g["nk"].combine_chunks().to_numpy(zero_copy_only=False)
        npos = np.searchsorted(nat_keys, nkv)
        return pa.table(
            {
                "nation": nat_names.take(pa.array(npos, pa.int64())),
                "order_year": pc.cast(g["yr"], pa.int64()),
                "n_orders": pc.cast(g["no_sum"], pa.int64()),
                "value_floor": pc.cast(g["sv_sum"], pa.int64()),
            }
        )

    tagged = ords.map_batches(
        order_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        cust.map_batches(
            cust_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    cells = hash_partition_merge(
        tagged, "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "nk", merge, k=1)


def brand_price_positioning(sf_dir: str) -> Dataset:
    """R97: brand price-positioning matrix — per (brand, log2 band of
    the floored catalog retail price): catalog parts, shipped lines,
    and exact quantity — where each brand prices its catalog and
    whether demand follows (R79 audits realized price against list
    PER LINE, R74 slices commerce by p_type, R49 trends brand revenue;
    R97 is the price-ARCHITECTURE map: a brand whose parts sit two
    bands above its peers but whose lines cluster in its cheapest band
    is positioned premium and selling discount — the merchandising
    mismatch read).  Dense small output (brands × ≤~12 bands); exact
    int64 (LEFT JOIN + bin-length band + GROUP BY oracle).

    Scale shape — R85's ONE partkey-hash co-partition: part dim rows
    carry (brand, band); line batches pre-reduce per partkey; the
    fold attaches by searchsorted (LEFT-JOIN semantics — unshipped
    parts keep their catalog cell) and collapses IN PLACE to (brand,
    band) partials; the k=1 merge sums O(parts × cells) rows."""
    brands = pa.array(
        sorted(
            rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_brand"])
            .unique("p_brand")
        ),
        pa.string(),
    )

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_retailprice"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def part_cells(b: pa.Table) -> pa.Table:
        rp = np.floor(
            b["p_retailprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        powers2 = np.int64(1) << np.arange(1, 41)
        band = np.where(
            rp <= 0, 0, np.searchsorted(powers2, rp, side="right") + 1
        )
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "bb": pc.cast(
                    pc.index_in(b["p_brand"], value_set=brands), pa.int64()
                ),
                "band": pa.array(band, pa.int64()),
                "nl": pa.array(np.zeros(b.num_rows, np.int64)),
                "qty": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def line_cells(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].combine_chunks().to_numpy(zero_copy_only=False)
        q = np.floor(
            b["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        u, idx = np.unique(pk, return_inverse=True)
        nl = np.bincount(idx).astype(np.int64)
        qs = np.zeros(len(u), np.int64)
        np.add.at(qs, idx, q)
        n = len(u)
        return pa.table(
            {
                "k": pa.array(u.astype(np.int64)),
                "bb": pa.array(np.full(n, -1, np.int64)),
                "band": pa.array(np.zeros(n, np.int64)),
                "nl": pa.array(nl),
                "qty": pa.array(qs),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("bb", "band", "np_", "nl", "qty")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        bbv = t["bb"].combine_chunks().to_numpy(zero_copy_only=False)
        is_part = bbv >= 0
        p = t.filter(pa.array(is_part))
        l = t.filter(pa.array(~is_part))
        if p.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        pk = p["k"].combine_chunks().to_numpy(zero_copy_only=False)
        porder = np.argsort(pk, kind="stable")
        pk_s = pk[porder]
        pbb = p["bb"].combine_chunks().to_numpy(zero_copy_only=False)[porder]
        pband = p["band"].combine_chunks().to_numpy(zero_copy_only=False)[
            porder
        ]
        nl_acc = np.zeros(len(pk_s), np.int64)
        qty_acc = np.zeros(len(pk_s), np.int64)
        if l.num_rows:
            lg = l.group_by("k", use_threads=False).aggregate(
                [("nl", "sum"), ("qty", "sum")]
            )
            lk = lg["k"].combine_chunks().to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(pk_s, lk), 0, len(pk_s) - 1)
            hit = pk_s[pos] == lk
            np.add.at(
                nl_acc,
                pos[hit],
                lg["nl_sum"].combine_chunks().to_numpy(
                    zero_copy_only=False
                )[hit],
            )
            np.add.at(
                qty_acc,
                pos[hit],
                lg["qty_sum"].combine_chunks().to_numpy(
                    zero_copy_only=False
                )[hit],
            )
        key = pbb * 64 + pband
        u, idx = np.unique(key, return_inverse=True)
        np_ = np.bincount(idx).astype(np.int64)
        nl = np.zeros(len(u), np.int64)
        np.add.at(nl, idx, nl_acc)
        qty = np.zeros(len(u), np.int64)
        np.add.at(qty, idx, qty_acc)
        return pa.table(
            {
                "bb": pa.array(u // 64),
                "band": pa.array(u % 64),
                "np_": pa.array(np_),
                "nl": pa.array(nl),
                "qty": pa.array(qty),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("brand", "price_band", "n_parts", "n_lines", "qty_floor")
        if t.num_rows == 0:
            return pa.table(
                {
                    "brand": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by(["bb", "band"], use_threads=False).aggregate(
            [("np_", "sum"), ("nl", "sum"), ("qty", "sum")]
        )
        return pa.table(
            {
                "brand": brands.take(g["bb"]),
                "price_band": pc.cast(g["band"], pa.int64()),
                "n_parts": pc.cast(g["np__sum"], pa.int64()),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
                "qty_floor": pc.cast(g["qty_sum"], pa.int64()),
            }
        )

    tagged = parts.map_batches(
        part_cells, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        lines.map_batches(
            line_cells, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    cells = hash_partition_merge(
        tagged, "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "bb", merge, k=1)


def discount_latency(sf_dir: str) -> Dataset:
    """R98: discount-latency board — per discount cent (0..10): lines,
    Σdays, Σdays² with days = the line's order→ship floor-day latency
    (R87's convention) — does discounting buy speed, or pay for
    delay?  (R60 ladders discount by REVENUE, R87 trends latency by
    YEAR, R23 prices forgone discounts; R98 couples the two
    operational levers directly: per-cent mean latency divides out of
    the sums, and a ladder where deep discounts ship slower is
    clearance inventory, not service tiering).  Dense small output
    (≤11 rows); exact int64 (join + floor-day + GROUP BY oracle).

    Scale shape — R87's ONE orderkey-hash co-partition with the
    discount cent riding the line cells: batches pre-reduce lines per
    (okey, ship-day, cent); orders ride (okey, order-day); the fold
    attaches, differences, and collapses IN PLACE to 11-cell partials;
    the k=1 merge sums O(parts × 11) rows."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def line_cells(b: pa.Table) -> pa.Table:
        sd = (
            b["l_shipdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        cent = np.rint(
            b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "d": pa.array(sd, pa.int64()),
                "cent": pa.array(cent),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
                "is_o": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["k", "d", "cent", "is_o"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["k", "d", "cent", "is_o", "n"])

    def order_cells(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "d": pa.array(od, pa.int64()),
                "cent": pa.array(np.zeros(b.num_rows, np.int64)),
                "is_o": pa.array(np.ones(b.num_rows, np.int64)),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("cent", "nl", "sd", "sdd")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        iso = t["is_o"].combine_chunks().to_numpy(zero_copy_only=False)
        o = t.filter(pa.array(iso == 1))
        l = t.filter(pa.array(iso == 0))
        if o.num_rows == 0 or l.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        lk = l["k"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = o["k"].combine_chunks().to_numpy(zero_copy_only=False)
        oorder = np.argsort(ok, kind="stable")
        ok_s = ok[oorder]
        pos = np.clip(np.searchsorted(ok_s, lk), 0, len(ok_s) - 1)
        hit = ok_s[pos] == lk
        od = o["d"].combine_chunks().to_numpy(zero_copy_only=False)[oorder][
            pos
        ][hit]
        gap = l["d"].combine_chunks().to_numpy(zero_copy_only=False)[hit] - od
        cent = l["cent"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        n = l["n"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        nl = np.zeros(11, np.int64)
        np.add.at(nl, cent, n)
        sd = np.zeros(11, np.int64)
        np.add.at(sd, cent, n * gap)
        sdd = np.zeros(11, np.int64)
        np.add.at(sdd, cent, n * gap * gap)
        keep = np.flatnonzero(nl)
        return pa.table(
            {
                "cent": pa.array(keep),
                "nl": pa.array(nl[keep]),
                "sd": pa.array(sd[keep]),
                "sdd": pa.array(sdd[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("discount_cent", "n_lines", "sum_days", "sum_days_sq")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("cent", use_threads=False).aggregate(
            [("nl", "sum"), ("sd", "sum"), ("sdd", "sum")]
        )
        return pa.table(
            {
                "discount_cent": pc.cast(g["cent"], pa.int64()),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
                "sum_days": pc.cast(g["sd_sum"], pa.int64()),
                "sum_days_sq": pc.cast(g["sdd_sum"], pa.int64()),
            }
        )

    tagged = lines.map_batches(
        line_cells, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        ords.map_batches(
            order_cells, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    cells = hash_partition_merge(
        tagged, "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "cent", merge, k=1)


def spend_persistence(sf_dir: str) -> Dataset:
    """R99: spend-persistence sufficient statistics — per market
    segment, over every customer's CONSECUTIVE order pairs (ordered by
    (floor-day, orderkey)): n, Σx, Σx², Σy, Σy², Σx·y with x = the
    earlier order's floored value and y = the later's — the exact
    lag-1 autocovariance of individual spend ("does last ticket
    predict the next"), the predictability read none of the value
    boards carry (R54 compares the FIRST order against the lifetime,
    R88 trends the segment MEAN over time, R21 spaces the orders; R99
    measures habit at the pair level — a high-r segment supports
    per-customer budget forecasts, a zero-r one only cohort ones).
    One dense row per segment ALWAYS.  Int64 bound documented: v ≤
    ~10⁶ → Σx·y holds ~9·10⁶ pairs/segment per shard.  Exact int64
    (lag-window + join + GROUP BY oracle).

    Scale shape — ONE custkey-hash co-partition: orders ride as
    (custkey, day, okey, v) rows, customers as (custkey → segment);
    each partition lexsorts its complete customers once, adjacent
    same-customer pairs form in place, attach the segment by one
    searchsorted, and collapse to six sums per segment; the k=1 merge
    sums O(parts × segments) rows."""
    segs = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]
            ).unique("c_mktsegment")
        ),
        pa.string(),
    )
    nseg = len(segs)

    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )

    def order_rows(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "d": pa.array(od // 86_400_000_000, pa.int64()),
                "ok": pc.cast(b["o_orderkey"], pa.int64()),
                "v": pa.array(
                    np.floor(
                        b["o_totalprice"]
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                ),
                "seg": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        )

    def cust_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "d": pa.array(np.zeros(n, np.int64)),
                "ok": pa.array(np.zeros(n, np.int64)),
                "v": pa.array(np.zeros(n, np.int64)),
                "seg": pc.cast(
                    pc.index_in(b["c_mktsegment"], value_set=segs), pa.int64()
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("seg", "n", "sx", "sxx", "sy", "syy", "sxy")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        segv = t["seg"].combine_chunks().to_numpy(zero_copy_only=False)
        is_cust = segv >= 0
        c = t.filter(pa.array(is_cust))
        o = t.filter(pa.array(~is_cust))
        if c.num_rows == 0 or o.num_rows == 0:
            return pa.table({c2: pa.array([], pa.int64()) for c2 in cols})
        ck = o["k"].combine_chunks().to_numpy(zero_copy_only=False)
        d = o["d"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = o["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        v = o["v"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, d, ck))
        cks, vs = ck[order], v[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = cks[1:] == cks[:-1]
        pv = np.empty(n, dtype=np.int64)
        pv[0] = 0
        pv[1:] = vs[:-1]
        # attach segment per pair (by the customer key)
        dk = c["k"].combine_chunks().to_numpy(zero_copy_only=False)
        corder = np.argsort(dk, kind="stable")
        dk_s = dk[corder]
        dseg = c["seg"].combine_chunks().to_numpy(zero_copy_only=False)[
            corder
        ]
        pos = np.clip(np.searchsorted(dk_s, cks), 0, len(dk_s) - 1)
        hit = dk_s[pos] == cks
        pair = has_prev & hit
        seg = dseg[pos]
        x = np.where(pair, pv, 0)
        y = np.where(pair, vs, 0)
        segc = np.where(pair, seg, 0)
        out = {"seg": np.arange(nseg, dtype=np.int64)}
        out["n"] = np.bincount(seg[pair], minlength=nseg).astype(np.int64)
        for name, arr in (
            ("sx", x),
            ("sxx", x * x),
            ("sy", y),
            ("syy", y * y),
            ("sxy", x * y),
        ):
            acc = np.zeros(nseg, np.int64)
            np.add.at(acc, segc, arr)
            out[name] = acc
        return pa.table({c2: pa.array(a) for c2, a in out.items()})

    def merge(t: pa.Table) -> pa.Table:
        names = (
            "c_mktsegment",
            "n_pairs",
            "sum_x",
            "sum_x_sq",
            "sum_y",
            "sum_y_sq",
            "sum_xy",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in names[1:]},
                }
            )
        g = t.group_by("seg", use_threads=False).aggregate(
            [(c, "sum") for c in ("n", "sx", "sxx", "sy", "syy", "sxy")]
        )
        ss = g["seg"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        cols = {
            name: g[f"{src}_sum"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)[order]
            for name, src in zip(
                names[1:], ("n", "sx", "sxx", "sy", "syy", "sxy")
            )
        }
        return pa.table(
            {
                "c_mktsegment": segs.take(pa.array(ss[order], pa.int64())),
                **{c: pa.array(a, pa.int64()) for c, a in cols.items()},
            }
        )

    tagged = ords.map_batches(
        order_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        cust.map_batches(
            cust_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    cells = hash_partition_merge(
        tagged, "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "seg", merge, k=1)


def supplier_coshipment(sf_dir: str) -> Dataset:
    """R100: supplier co-shipment spectrum — form every unordered
    supplier PAIR that ships inside the same order, count each pair's
    co-orders across the corpus, and histogram the pairs by the bit
    length of that count — the supply-network EDGE-weight spectrum
    (R69 counts how many suppliers an order touches, R52 how many
    compete per part, R32 concentrates volume per nation; R100 reads
    the co-fulfillment graph itself: a fat high band means recurring
    supplier consortia — routing/consolidation opportunities — while
    an all-band-1 spectrum means pairings are incidental).  Dense
    small output (≤~20 bands); exact int64 (per-order DISTINCT pair
    self-join + two-level GROUP BY oracle).

    Scale shape — per-order pair fan-out is bounded by R69's
    fragmentation (suppliers/order ≤ lines/order, single digits):
    the okey-hash exchange settles each order's distinct supplier set
    and emits its pairs; ONE pair-hash exchange settles each pair's
    co-order count and bincounts IN PLACE to band partials; the k=1
    merge sums O(parts × bands) rows."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].combine_chunks().to_numpy(zero_copy_only=False)
        key = np.stack([ok, sk], axis=1)
        u = np.unique(key, axis=0)
        return pa.table(
            {
                "okey": pa.array(u[:, 0].astype(np.int64)),
                "sk": pa.array(u[:, 1].astype(np.int64)),
            }
        )

    def pair_fold(t: pa.Table) -> pa.Table:
        cols = ("pair", "n")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        ok = t["okey"].combine_chunks().to_numpy(zero_copy_only=False)
        sk = t["sk"].combine_chunks().to_numpy(zero_copy_only=False)
        key = np.unique(ok * (1 << 24) + sk)  # suppkey < 2^24 by schema
        oks, sks = key >> 24, key & ((1 << 24) - 1)
        brk = np.empty(len(oks), dtype=bool)
        if len(oks):
            brk[0] = True
            brk[1:] = oks[1:] != oks[:-1]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(oks))
        pairs = []
        for a, b_ in zip(starts, ends):
            s = sks[a:b_]
            if len(s) > 1:
                ii, jj = np.meshgrid(s, s, indexing="ij")
                sel = ii < jj
                pairs.append(ii[sel] * (1 << 24) + jj[sel])
        if not pairs:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        pk = np.concatenate(pairs)
        u, cnt = np.unique(pk, return_counts=True)
        return pa.table(
            {"pair": pa.array(u), "n": pa.array(cnt.astype(np.int64))}
        )

    def band_fold(t: pa.Table) -> pa.Table:
        cols = ("band", "np_", "nco")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("pair", use_threads=False).aggregate([("n", "sum")])
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        powers2 = np.int64(1) << np.arange(1, 41)
        band = np.searchsorted(powers2, n, side="right") + 1
        u, idx = np.unique(band, return_inverse=True)
        np_ = np.bincount(idx).astype(np.int64)
        nco = np.zeros(len(u), np.int64)
        np.add.at(nco, idx, n)
        return pa.table(
            {
                "band": pa.array(u),
                "np_": pa.array(np_),
                "nco": pa.array(nco),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("cooccur_band", "n_pairs", "n_coorders")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("band", use_threads=False).aggregate(
            [("np_", "sum"), ("nco", "sum")]
        )
        return pa.table(
            {
                "cooccur_band": pc.cast(g["band"], pa.int64()),
                "n_pairs": pc.cast(g["np__sum"], pa.int64()),
                "n_coorders": pc.cast(g["nco_sum"], pa.int64()),
            }
        )

    cells = lines.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    order_pairs = hash_partition_merge(
        cells, "okey", pair_fold, k=_rel_k(sf_dir, "lineitem")
    )
    pair_counts = hash_partition_merge(
        order_pairs, "pair", band_fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(pair_counts, "band", merge, k=1)


def gap_spend_coupling(sf_dir: str) -> Dataset:
    """R101: gap-spend coupling board — over every customer's
    consecutive order pairs, band the gap (bit length of the floor-day
    interval; band 0 = same-day) and report per band: pairs, the
    RETURN order's Σvalue and Σvalue² — does absence make baskets
    bigger?  (R21 distributes the gaps, R99 couples consecutive
    VALUES, R95 counts long-gap returns by year; R101 crosses the gap
    with the spend it preceded: pent-up-demand businesses show value
    rising with the band, subscription-like flows stay flat — the
    elasticity a win-back discount budget is sized against.)  Dense
    small output (≤~15 bands); exact int64 (lag-window + bin-length
    band + GROUP BY oracle; ties break by orderkey).

    Scale shape — R95's ONE custkey-hash exchange verbatim: each
    partition lexsorts its complete customers once, adjacent pairs
    band in place, and (band, n, Σv, Σv²) partials fold k=1."""
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def narrow(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "ck": pc.cast(b["o_custkey"], pa.int64()),
                "d": pa.array(od // 86_400_000_000, pa.int64()),
                "ok": pc.cast(b["o_orderkey"], pa.int64()),
                "v": pa.array(
                    np.floor(
                        b["o_totalprice"]
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("band", "n", "sv", "svv")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        ck = t["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["d"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = t["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, d, ck))
        cks, ds_, vs = ck[order], d[order], v[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = cks[1:] == cks[:-1]
        pd_ = np.empty(n, dtype=np.int64)
        pd_[0] = 0
        pd_[1:] = ds_[:-1]
        gap = np.where(has_prev, ds_ - pd_, 0)
        powers2 = np.int64(1) << np.arange(1, 41)
        band = np.where(
            gap <= 0, 0, np.searchsorted(powers2, gap, side="right") + 1
        )
        sel = has_prev
        bb = band[sel]
        vv = vs[sel]
        u, idx = np.unique(bb, return_inverse=True)
        cnt = np.bincount(idx).astype(np.int64)
        sv = np.zeros(len(u), np.int64)
        np.add.at(sv, idx, vv)
        svv = np.zeros(len(u), np.int64)
        np.add.at(svv, idx, vv * vv)
        return pa.table(
            {
                "band": pa.array(u),
                "n": pa.array(cnt),
                "sv": pa.array(sv),
                "svv": pa.array(svv),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("gap_band", "n_pairs", "sum_v", "sum_v_sq")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("band", use_threads=False).aggregate(
            [("n", "sum"), ("sv", "sum"), ("svv", "sum")]
        )
        return pa.table(
            {
                "gap_band": pc.cast(g["band"], pa.int64()),
                "n_pairs": pc.cast(g["n_sum"], pa.int64()),
                "sum_v": pc.cast(g["sv_sum"], pa.int64()),
                "sum_v_sq": pc.cast(g["svv_sum"], pa.int64()),
            }
        )

    cells = hash_partition_merge(
        ords.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True),
        "ck",
        fold,
        k=_rel_k(sf_dir, "orders"),
    )
    return hash_partition_merge(cells, "band", merge, k=1)


def discount_return(sf_dir: str) -> Dataset:
    """R102: discount-return board — per discount cent (0..10): lines,
    RETURNED lines (l_returnflag = 'R'), the return permille, and the
    returned revenue floor — are discounted goods returned more?
    (R66 blames the BRAND, R46 trends returns over TIME, R98 couples
    discount with shipping SPEED; R102 couples it with the return
    outcome — a ladder where return rates climb with the discount is
    clearance offloading defects, flat is genuine price promotion; the
    margin model needs to know which.)  Dense small output (≤11
    rows); exact int64 (FILTER-count + GROUP BY oracle).

    Scale shape — ZERO wide exchange: the discount-cent axis is
    bounded; each batch reduces with one compare + three bincounts to
    11-cell partials; O(batches × 11) rows ride the k=1 merge."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_discount",
            "l_returnflag",
            "l_extendedprice",
        ],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        cent = np.rint(
            b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        ret = pc.equal(b["l_returnflag"], "R").to_numpy(
            zero_copy_only=False
        )
        ep = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dc = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ep * (1.0 - dc)).astype(np.int64)
        nl = np.bincount(cent, minlength=11).astype(np.int64)
        nr = np.bincount(cent[ret], minlength=11).astype(np.int64)
        rrev = np.zeros(11, np.int64)
        np.add.at(rrev, cent[ret], rev[ret])
        keep = np.flatnonzero(nl)
        return pa.table(
            {
                "cent": pa.array(keep),
                "nl": pa.array(nl[keep]),
                "nr": pa.array(nr[keep]),
                "rrev": pa.array(rrev[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "discount_cent",
            "n_lines",
            "n_returned",
            "return_permille",
            "returned_rev_floor",
        )
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("cent", use_threads=False).aggregate(
            [("nl", "sum"), ("nr", "sum"), ("rrev", "sum")]
        )
        cent = g["cent"].combine_chunks().to_numpy(zero_copy_only=False)
        nl = g["nl_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nr = g["nr_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        rr = g["rrev_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "discount_cent": pa.array(cent, pa.int64()),
                "n_lines": pa.array(nl, pa.int64()),
                "n_returned": pa.array(nr, pa.int64()),
                "return_permille": pa.array(
                    1000 * nr // np.maximum(nl, 1), pa.int64()
                ),
                "returned_rev_floor": pa.array(rr, pa.int64()),
            }
        )

    partials = lines.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "cent", merge, k=1)


def value_priority_matrix(sf_dir: str) -> Dataset:
    """R103: value-priority alignment matrix — per (log2 band of the
    floored order value, order priority): orders — do big orders
    actually get urgent priorities?  (R43 crosses priority with
    SEGMENT, R63 quantiles value per segment, R87 trends priority
    latency; R103 is the service-alignment read itself: mass on the
    high-value × low-priority corner is money waiting in the slow
    lane, the first slide of any fulfillment review.)  Dense small
    output (≤~12 bands × 5 priorities); exact int64 (bin-length band
    + GROUP BY oracle).

    Scale shape — ZERO wide exchange: both axes are bounded; each
    batch reduces with one band computation + one bincount to cell
    partials; O(batches × cells) rows ride the k=1 merge."""
    pr = _priority_rank(sf_dir)
    prs = pa.array(list(pr), pa.string())
    npr = len(prs)

    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_totalprice", "o_orderpriority"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        v = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        code = (
            pc.cast(
                pc.index_in(b["o_orderpriority"], value_set=prs), pa.int64()
            )
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        powers2 = np.int64(1) << np.arange(1, 41)
        band = np.where(
            v <= 0, 0, np.searchsorted(powers2, v, side="right") + 1
        )
        key = band * npr + code
        cnt = np.bincount(key, minlength=64 * npr).astype(np.int64)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {
                "band": pa.array(keep // npr),
                "pr": pa.array(keep % npr),
                "n": pa.array(cnt[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("value_band", "o_orderpriority", "n_orders")
        if t.num_rows == 0:
            return pa.table(
                {
                    "value_band": pa.array([], pa.int64()),
                    "o_orderpriority": pa.array([], pa.string()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["band", "pr"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {
                "value_band": pc.cast(g["band"], pa.int64()),
                "o_orderpriority": prs.take(g["pr"]),
                "n_orders": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    partials = ords.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "band", merge, k=1)


def brand_repertoire(sf_dir: str) -> Dataset:
    """R104: brand-repertoire histogram — per customer, count the
    DISTINCT brands they have ever bought, and histogram the customer
    base by that repertoire size (plus their total lines per band) —
    the variety-seeking read (R62 maps which brand PAIRS share
    baskets, R6 distributes order counts, R37 repeat purchases; R104
    asks how wide each customer's brand world is: a base massed at
    repertoire 1-2 is loyal/captive — cross-sell is the play — while
    a wide-repertoire base shops the catalog and responds to price).
    Dense small output (≤#brands bands); exact int64 (three-way join
    + COUNT DISTINCT + histogram oracle).

    Scale shape — two chained co-partition hops, then a custkey
    settle: lines pre-reduce per (partkey, orderkey); the PARTKEY hop
    attaches the brand; the ORDERKEY hop attaches the customer; the
    resulting distinct (custkey, brand) cells settle per customer on
    ONE custkey-hash exchange — a customer's cells co-locate, so the
    repertoire size bincounts IN PLACE; the k=1 merge sums
    O(parts × bands) rows."""
    brands = pa.array(
        sorted(
            rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_brand"])
            .unique("p_brand")
        ),
        pa.string(),
    )
    nb = len(brands)

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_orderkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def line_cells(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        key = np.stack([pk, ok], axis=1)
        u, cnt = np.unique(key, axis=0, return_counts=True)
        n = len(u)
        return pa.table(
            {
                "k": pa.array(u[:, 0].astype(np.int64)),
                "aux": pa.array(u[:, 1].astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
                "tag": pa.array(np.zeros(n, np.int64)),
            }
        )

    def part_cells(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "aux": pc.cast(
                    pc.index_in(b["p_brand"], value_set=brands), pa.int64()
                ),
                "n": pa.array(np.zeros(n, np.int64)),
                "tag": pa.array(np.ones(n, np.int64)),
            }
        )

    def hop1(t: pa.Table) -> pa.Table:
        """Attach brand per partkey; emit (orderkey, brand, n) cells."""
        cols = ("k", "aux", "n", "tag")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        p = t.filter(pa.array(tag == 1))
        l = t.filter(pa.array(tag == 0))
        if p.num_rows == 0 or l.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        pk = p["k"].combine_chunks().to_numpy(zero_copy_only=False)
        porder = np.argsort(pk, kind="stable")
        pk_s = pk[porder]
        pb = p["aux"].combine_chunks().to_numpy(zero_copy_only=False)[porder]
        lk = l["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(pk_s, lk), 0, len(pk_s) - 1)
        hit = pk_s[pos] == lk
        okey = l["aux"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        nl = l["n"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        brand = pb[pos[hit]]
        # pre-reduce (orderkey, brand)
        key = np.stack([okey, brand], axis=1)
        u, idx = np.unique(key, axis=0, return_inverse=True)
        ncell = np.zeros(len(u), np.int64)
        np.add.at(ncell, idx, nl)
        return pa.table(
            {
                "k": pa.array(u[:, 0].astype(np.int64)),
                "aux": pa.array(u[:, 1].astype(np.int64)),
                "n": pa.array(ncell),
                "tag": pa.array(np.zeros(len(u), np.int64)),
            }
        )

    def order_cells(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "aux": pc.cast(b["o_custkey"], pa.int64()),
                "n": pa.array(np.zeros(n, np.int64)),
                "tag": pa.array(np.ones(n, np.int64)),
            }
        )

    def hop2(t: pa.Table) -> pa.Table:
        """Attach custkey per orderkey; emit (custkey, brand, n) cells."""
        cols = ("ck", "brand", "n")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        tag = t["tag"].combine_chunks().to_numpy(zero_copy_only=False)
        o = t.filter(pa.array(tag == 1))
        l = t.filter(pa.array(tag == 0))
        if o.num_rows == 0 or l.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        ok = o["k"].combine_chunks().to_numpy(zero_copy_only=False)
        oorder = np.argsort(ok, kind="stable")
        ok_s = ok[oorder]
        oc = o["aux"].combine_chunks().to_numpy(zero_copy_only=False)[oorder]
        lk = l["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ok_s, lk), 0, len(ok_s) - 1)
        hit = ok_s[pos] == lk
        ck = oc[pos[hit]]
        brand = l["aux"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        nl = l["n"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        key = np.stack([ck, brand], axis=1)
        u, idx = np.unique(key, axis=0, return_inverse=True)
        ncell = np.zeros(len(u), np.int64)
        np.add.at(ncell, idx, nl)
        return pa.table(
            {
                "ck": pa.array(u[:, 0].astype(np.int64)),
                "brand": pa.array(u[:, 1].astype(np.int64)),
                "n": pa.array(ncell),
            }
        )

    def cust_fold(t: pa.Table) -> pa.Table:
        cols = ("band", "nc", "nl")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["ck", "brand"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        ck = g["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        u, idx = np.unique(ck, return_inverse=True)
        rep = np.bincount(idx).astype(np.int64)
        tot = np.zeros(len(u), np.int64)
        np.add.at(tot, idx, n)
        ub, bidx = np.unique(rep, return_inverse=True)
        nc = np.bincount(bidx).astype(np.int64)
        nls = np.zeros(len(ub), np.int64)
        np.add.at(nls, bidx, tot)
        return pa.table(
            {
                "band": pa.array(ub),
                "nc": pa.array(nc),
                "nl": pa.array(nls),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("n_brands", "n_customers", "n_lines")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("band", use_threads=False).aggregate(
            [("nc", "sum"), ("nl", "sum")]
        )
        return pa.table(
            {
                "n_brands": pc.cast(g["band"], pa.int64()),
                "n_customers": pc.cast(g["nc_sum"], pa.int64()),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
            }
        )

    tagged1 = lines.map_batches(
        line_cells, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        parts.map_batches(
            part_cells, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    ob_cells = hash_partition_merge(
        tagged1, "k", hop1, k=_rel_k(sf_dir, "lineitem")
    )
    tagged2 = ob_cells.union(
        ords.map_batches(
            order_cells, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    cb_cells = hash_partition_merge(
        tagged2, "k", hop2, k=_rel_k(sf_dir, "orders")
    )
    folded = hash_partition_merge(
        cb_cells, "ck", cust_fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(folded, "band", merge, k=1)


def return_seasonality(sf_dir: str) -> Dataset:
    """R105: return-seasonality profile — per calendar MONTH-OF-YEAR
    of the ship date (1..12): lines, returned lines, the return
    permille, and returned revenue floor — the folded seasonal return
    curve (R46 trends returns along the calendar TIMELINE — it shows
    whether returns are growing; R105 folds all years onto one
    January-to-December wheel and shows WHEN they recur: the
    post-holiday January spike and the summer lull are planning
    inputs a reverse-logistics capacity model keys on, invisible in
    the unfolded trend).  Dense small output (≤12 rows); exact int64
    (extract(month) + FILTER counts oracle).

    Scale shape — ZERO wide exchange: the month axis is bounded; one
    calendar decompose + three bincounts per batch; O(batches × 12)
    partials ride the k=1 merge."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_shipdate",
            "l_returnflag",
            "l_extendedprice",
            "l_discount",
        ],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        sd = (
            b["l_shipdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        mo = (
            sd.astype("datetime64[us]").astype("datetime64[M]")
            .astype(np.int64)
            % 12
        ) + 1
        ret = pc.equal(b["l_returnflag"], "R").to_numpy(
            zero_copy_only=False
        )
        ep = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dc = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ep * (1.0 - dc)).astype(np.int64)
        nl = np.bincount(mo, minlength=13).astype(np.int64)
        nr = np.bincount(mo[ret], minlength=13).astype(np.int64)
        rr = np.zeros(13, np.int64)
        np.add.at(rr, mo[ret], rev[ret])
        keep = np.flatnonzero(nl)
        return pa.table(
            {
                "mo": pa.array(keep),
                "nl": pa.array(nl[keep]),
                "nr": pa.array(nr[keep]),
                "rr": pa.array(rr[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "ship_month",
            "n_lines",
            "n_returned",
            "return_permille",
            "returned_rev_floor",
        )
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("mo", use_threads=False).aggregate(
            [("nl", "sum"), ("nr", "sum"), ("rr", "sum")]
        )
        mo = g["mo"].combine_chunks().to_numpy(zero_copy_only=False)
        nl = g["nl_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nr = g["nr_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        rr = g["rr_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "ship_month": pa.array(mo, pa.int64()),
                "n_lines": pa.array(nl, pa.int64()),
                "n_returned": pa.array(nr, pa.int64()),
                "return_permille": pa.array(
                    1000 * nr // np.maximum(nl, 1), pa.int64()
                ),
                "returned_rev_floor": pa.array(rr, pa.int64()),
            }
        )

    partials = lines.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "mo", merge, k=1)


def quantity_spectrum(sf_dir: str) -> Dataset:
    """R106: quantity spectrum — per exact floored line quantity:
    lines and floored revenue — the raw demand-quantization read (R78
    bands quantities by tens, R30 asks Q17's below-average question,
    R80 measures intra-order dominance; R106 shows the unbinned
    lattice itself: spikes at 1/6/12/24 are pack sizes and case
    logic, a flat 1..50 is synthetic uniformity — the shape every
    inventory-unit decision and every "is this data real" gut check
    reads first).  Dense small output (distinct quantities); exact
    int64 (GROUP BY oracle).

    Scale shape — ZERO wide exchange: the quantity domain is bounded;
    one floor + two bincounts per batch; O(batches × domain) partials
    ride the k=1 merge."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        q = np.floor(
            b["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        ep = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dc = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ep * (1.0 - dc)).astype(np.int64)
        u, idx = np.unique(q, return_inverse=True)
        nl = np.bincount(idx).astype(np.int64)
        rv = np.zeros(len(u), np.int64)
        np.add.at(rv, idx, rev)
        return pa.table(
            {
                "q": pa.array(u),
                "nl": pa.array(nl),
                "rev": pa.array(rv),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("quantity", "n_lines", "revenue_floor")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("q", use_threads=False).aggregate(
            [("nl", "sum"), ("rev", "sum")]
        )
        return pa.table(
            {
                "quantity": pc.cast(g["q"], pa.int64()),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    partials = lines.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "q", merge, k=1)


def part_dependence(sf_dir: str) -> Dataset:
    """R107: part-dependence histogram — per SHIPPED part compute the
    line share of its single busiest supplier (decile band =
    1000·top/total // 100), and count parts and lines per band — the
    dependence DEPTH read (R52 histograms how many suppliers compete
    per part — a count; R85 counts suppliers per catalog corner; R107
    measures how concentrated the volume actually is: a part with 5
    suppliers but a 95% top share is still single-sourced in
    practice, and the band-10 mass is the true no-alternative
    exposure procurement carries).  Single-supplier parts band at 10
    by construction.  Dense small output (≤10 bands); exact int64
    (two-level GROUP BY + max/total oracle).

    Scale shape — ONE partkey-hash exchange over pre-reduced
    (partkey, suppkey, n) cells: a part's cells co-locate, so its
    total and top-supplier share settle locally and bincount IN
    PLACE; the k=1 merge sums O(parts × 10) rows."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].combine_chunks().to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].combine_chunks().to_numpy(zero_copy_only=False)
        key = np.stack([pk, sk], axis=1)
        u, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "pk": pa.array(u[:, 0].astype(np.int64)),
                "sk": pa.array(u[:, 1].astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("band", "np_", "nl")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["pk", "sk"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        pk = g["pk"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        u, idx = np.unique(pk, return_inverse=True)
        tot = np.zeros(len(u), np.int64)
        np.add.at(tot, idx, n)
        top = np.zeros(len(u), np.int64)
        np.maximum.at(top, idx, n)
        band = 1000 * top // tot // 100
        ub, bidx = np.unique(band, return_inverse=True)
        np_ = np.bincount(bidx).astype(np.int64)
        nl = np.zeros(len(ub), np.int64)
        np.add.at(nl, bidx, tot)
        return pa.table(
            {
                "band": pa.array(ub),
                "np_": pa.array(np_),
                "nl": pa.array(nl),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("dependence_band", "n_parts", "n_lines")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("band", use_threads=False).aggregate(
            [("np_", "sum"), ("nl", "sum")]
        )
        return pa.table(
            {
                "dependence_band": pc.cast(g["band"], pa.int64()),
                "n_parts": pc.cast(g["np__sum"], pa.int64()),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
            }
        )

    cells = lines.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = hash_partition_merge(
        cells, "pk", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(folded, "band", merge, k=1)


def frequency_ticket_coupling(sf_dir: str) -> Dataset:
    """R108: frequency-ticket coupling board — band every customer by
    the bit length of their lifetime order count and report per band:
    customers, orders, Σvalue, Σvalue² — do frequent buyers spend
    less per order?  (R6 distributes order counts, R19 lifetime value,
    R63 ticket quantiles by segment; R108 crosses frequency with
    ticket size: mean ticket per band divides out, and a declining
    curve is basket-splitting behaviour — frequency KPIs inflate while
    revenue stands still — the distinction a loyalty program must
    price.)  Dense small output (≤~12 bands); exact int64 (two-level
    GROUP BY + bin-length oracle).

    Scale shape — ONE custkey-hash exchange over pre-reduced
    (custkey, n, Σv, Σv²) cells: a customer's cells co-locate, so
    their count band settles locally and folds IN PLACE; the k=1
    merge sums O(parts × bands) rows."""
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False)
        v = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        u, idx = np.unique(ck, return_inverse=True)
        n = np.bincount(idx).astype(np.int64)
        sv = np.zeros(len(u), np.int64)
        np.add.at(sv, idx, v)
        svv = np.zeros(len(u), np.int64)
        np.add.at(svv, idx, v * v)
        return pa.table(
            {
                "ck": pa.array(u.astype(np.int64)),
                "n": pa.array(n),
                "sv": pa.array(sv),
                "svv": pa.array(svv),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("band", "nc", "no", "sv", "svv")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("ck", use_threads=False).aggregate(
            [("n", "sum"), ("sv", "sum"), ("svv", "sum")]
        )
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        sv = g["sv_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        svv = g["svv_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        powers2 = np.int64(1) << np.arange(1, 41)
        band = np.searchsorted(powers2, n, side="right") + 1
        u, idx = np.unique(band, return_inverse=True)
        nc = np.bincount(idx).astype(np.int64)
        no = np.zeros(len(u), np.int64)
        np.add.at(no, idx, n)
        svb = np.zeros(len(u), np.int64)
        np.add.at(svb, idx, sv)
        svvb = np.zeros(len(u), np.int64)
        np.add.at(svvb, idx, svv)
        return pa.table(
            {
                "band": pa.array(u),
                "nc": pa.array(nc),
                "no": pa.array(no),
                "sv": pa.array(svb),
                "svv": pa.array(svvb),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "frequency_band",
            "n_customers",
            "n_orders",
            "sum_v",
            "sum_v_sq",
        )
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("band", use_threads=False).aggregate(
            [("nc", "sum"), ("no", "sum"), ("sv", "sum"), ("svv", "sum")]
        )
        return pa.table(
            {
                "frequency_band": pc.cast(g["band"], pa.int64()),
                "n_customers": pc.cast(g["nc_sum"], pa.int64()),
                "n_orders": pc.cast(g["no_sum"], pa.int64()),
                "sum_v": pc.cast(g["sv_sum"], pa.int64()),
                "sum_v_sq": pc.cast(g["svv_sum"], pa.int64()),
            }
        )

    cells = ords.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = hash_partition_merge(
        cells, "ck", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(folded, "band", merge, k=1)


def balance_ticket_coupling(sf_dir: str) -> Dataset:
    """R109: balance-ticket coupling statistics — per market segment,
    over all orders: n, Σb, Σb², Σv, Σv², Σb·v with b = the ordering
    customer's floored account balance and v = the order's floored
    value — does account health predict ticket size?  (R44 couples
    balance with order COUNTS, R55 supplier balance with volume, R63
    quantiles value per segment; R109 is the credit-risk regression
    input itself: a negative balance-value covariance means indebted
    customers place the big orders — the receivables exposure a
    credit limit policy is sized against.)  One dense row per segment
    ALWAYS.  Int64 bound documented: |b| ≤ 10⁴, v ≤ 10⁶ → Σb·v holds
    ~9·10⁸ orders/segment.  Exact int64 (join + GROUP BY oracle).

    Scale shape — R88's ONE custkey-hash co-partition: orders ride as
    (custkey, v), customers as (custkey, segment, b); the fold
    attaches both via one searchsorted and collapses IN PLACE to six
    sums per segment; the k=1 merge sums O(parts × segments) rows."""
    segs = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]
            ).unique("c_mktsegment")
        ),
        pa.string(),
    )
    nseg = len(segs)

    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )

    def order_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "v": pa.array(
                    np.floor(
                        b["o_totalprice"]
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                ),
                "seg": pa.array(np.full(n, -1, np.int64)),
                "bal": pa.array(np.zeros(n, np.int64)),
            }
        )

    def cust_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "v": pa.array(np.zeros(n, np.int64)),
                "seg": pc.cast(
                    pc.index_in(b["c_mktsegment"], value_set=segs), pa.int64()
                ),
                "bal": pa.array(
                    np.floor(
                        b["c_acctbal"]
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("seg", "n", "sb", "sbb", "sv", "svv", "sbv")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        segv = t["seg"].combine_chunks().to_numpy(zero_copy_only=False)
        is_cust = segv >= 0
        c = t.filter(pa.array(is_cust))
        o = t.filter(pa.array(~is_cust))
        if c.num_rows == 0 or o.num_rows == 0:
            return pa.table({c2: pa.array([], pa.int64()) for c2 in cols})
        ck = c["k"].combine_chunks().to_numpy(zero_copy_only=False)
        corder = np.argsort(ck, kind="stable")
        ck_s = ck[corder]
        cseg = c["seg"].combine_chunks().to_numpy(zero_copy_only=False)[
            corder
        ]
        cbal = c["bal"].combine_chunks().to_numpy(zero_copy_only=False)[
            corder
        ]
        ok = o["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ck_s, ok), 0, len(ck_s) - 1)
        hit = ck_s[pos] == ok
        seg = cseg[pos][hit]
        bal = cbal[pos][hit]
        v = o["v"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        out = {"seg": np.arange(nseg, dtype=np.int64)}
        out["n"] = np.bincount(seg, minlength=nseg).astype(np.int64)
        for name, arr in (
            ("sb", bal),
            ("sbb", bal * bal),
            ("sv", v),
            ("svv", v * v),
            ("sbv", bal * v),
        ):
            acc = np.zeros(nseg, np.int64)
            np.add.at(acc, seg, arr)
            out[name] = acc
        return pa.table({c2: pa.array(a) for c2, a in out.items()})

    def merge(t: pa.Table) -> pa.Table:
        names = (
            "c_mktsegment",
            "n_orders",
            "sum_b",
            "sum_b_sq",
            "sum_v",
            "sum_v_sq",
            "sum_b_v",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in names[1:]},
                }
            )
        g = t.group_by("seg", use_threads=False).aggregate(
            [(c, "sum") for c in ("n", "sb", "sbb", "sv", "svv", "sbv")]
        )
        ss = g["seg"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        cols = {
            name: g[f"{src}_sum"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)[order]
            for name, src in zip(
                names[1:], ("n", "sb", "sbb", "sv", "svv", "sbv")
            )
        }
        keep = cols["n_orders"] > 0
        return pa.table(
            {
                "c_mktsegment": segs.take(
                    pa.array(ss[order][keep], pa.int64())
                ),
                **{
                    c: pa.array(a[keep], pa.int64())
                    for c, a in cols.items()
                },
            }
        )

    tagged = ords.map_batches(
        order_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        cust.map_batches(
            cust_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    cells = hash_partition_merge(
        tagged, "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "seg", merge, k=1)


def latency_drilldown(sf_dir: str, topk: int = 5) -> Dataset:
    """R110: slowest-shipment drill-down — the topk lines by
    order→ship floor-day latency, each identified by (orderkey,
    linenumber) with its ship date; ties break by (orderkey,
    linenumber) ascending — record retrieval for the fulfillment
    post-mortem (R20/R87 distribute and trend the latency; R110 names
    the actual worst shipments someone clicks into — the E89/R14
    drill-down discipline on the latency axis).  Exact int64 + unique
    answer set (ORDER BY gap DESC, okey, lineno LIMIT oracle).

    Scale shape — the argtop-k combiner over the R87 okey
    co-partition: the fold attaches order dates, computes each line's
    gap, and keeps its partition's topk (a partition loser can never
    enter the global topk); O(parts × k) candidates reach the k=1
    merge."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_shipdate"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def line_rows(b: pa.Table) -> pa.Table:
        sd = (
            b["l_shipdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "ln": pc.cast(b["l_linenumber"], pa.int64()),
                "d": pa.array(sd // 86_400_000_000, pa.int64()),
                "is_o": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def order_rows(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "ln": pa.array(np.zeros(b.num_rows, np.int64)),
                "d": pa.array(od // 86_400_000_000, pa.int64()),
                "is_o": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("k", "ln", "gap", "sd")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        iso = t["is_o"].combine_chunks().to_numpy(zero_copy_only=False)
        o = t.filter(pa.array(iso == 1))
        l = t.filter(pa.array(iso == 0))
        if o.num_rows == 0 or l.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        lk = l["k"].combine_chunks().to_numpy(zero_copy_only=False)
        lln = l["ln"].combine_chunks().to_numpy(zero_copy_only=False)
        ld = l["d"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = o["k"].combine_chunks().to_numpy(zero_copy_only=False)
        oorder = np.argsort(ok, kind="stable")
        ok_s = ok[oorder]
        od = o["d"].combine_chunks().to_numpy(zero_copy_only=False)[oorder]
        pos = np.clip(np.searchsorted(ok_s, lk), 0, len(ok_s) - 1)
        hit = ok_s[pos] == lk
        gap = ld[hit] - od[pos[hit]]
        kk = lk[hit]
        lnn = lln[hit]
        sd = ld[hit]
        order = np.lexsort((lnn, kk, -gap))[:topk]
        return pa.table(
            {
                "k": pa.array(kk[order]),
                "ln": pa.array(lnn[order]),
                "gap": pa.array(gap[order]),
                "sd": pa.array(sd[order]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("o_orderkey", "l_linenumber", "gap_days", "l_shipdate")
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "l_linenumber": pa.array([], pa.int64()),
                    "gap_days": pa.array([], pa.int64()),
                    "l_shipdate": pa.array([], pa.timestamp("us")),
                }
            )
        kk = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        ln = t["ln"].combine_chunks().to_numpy(zero_copy_only=False)
        gap = t["gap"].combine_chunks().to_numpy(zero_copy_only=False)
        sd = t["sd"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ln, kk, -gap))[:topk]
        return pa.table(
            {
                "o_orderkey": pa.array(kk[order], pa.int64()),
                "l_linenumber": pa.array(ln[order], pa.int64()),
                "gap_days": pa.array(gap[order], pa.int64()),
                "l_shipdate": pa.array(
                    sd[order] * 86_400_000_000, pa.int64()
                ).cast(pa.timestamp("us")),
            }
        )

    tagged = lines.map_batches(
        line_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        ords.map_batches(
            order_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    cells = hash_partition_merge(
        tagged, "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "k", merge, k=1)


def brand_naming_matrix(sf_dir: str) -> Dataset:
    """R111: brand naming matrix — per (name word, brand): catalog
    parts carrying that word — which brands use which vocabulary (R82
    sums DEMAND per name word corpus-wide; R111 is the catalog-side
    positioning map: a word owned by one brand is trademark-like
    naming, a word spread across all brands is generic taxonomy — and
    the matrix is the lookup a brand-aware search ranker or a
    white-label detector reads).  Dense small output (vocabulary ×
    brands); exact int64 (unnest + GROUP BY oracle).

    Scale shape — ZERO wide exchange beyond the k=1 merge: the part
    dim streams column-pruned; each batch explodes names and reduces
    to (word, brand) cells via one Arrow group_by; O(batches ×
    vocabulary × brands) partials ride the merge."""
    brands = pa.array(
        sorted(
            rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_brand"])
            .unique("p_brand")
        ),
        pa.string(),
    )

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_name", "p_brand"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["p_name"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        code = (
            pc.cast(pc.index_in(b["p_brand"], value_set=brands), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "w": flat,
                "bb": pa.array(code[parent], pa.int64()),
                "n": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        g = t.group_by(["w", "bb"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["w", "bb", "n"])

    def merge(t: pa.Table) -> pa.Table:
        out = ("word", "brand", "n_parts")
        if t.num_rows == 0:
            return pa.table(
                {
                    "word": pa.array([], pa.string()),
                    "brand": pa.array([], pa.string()),
                    "n_parts": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["w", "bb"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {
                "word": g["w"],
                "brand": brands.take(g["bb"]),
                "n_parts": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    partials = parts.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "bb", merge, k=1)


def reconciliation_drift(sf_dir: str) -> Dataset:
    """R112: reconciliation drift board — per order YEAR: orders,
    CHILDLESS orders, orders whose floored header price differs from
    the sum of their lines' floored charges
    floor(extprice·(1−disc)·(1+tax)) (R53's closure rule), and the
    total absolute delta — the audit TREND (R53 grades the closure per
    status once; R112 asks whether the books are getting worse: a
    delta mass rising by year is a loader regression or a schema
    change mid-history, invisible in the pooled audit).  Dense small
    output (years); exact int64 (R53's per-line floor rule + year
    GROUP BY oracle).

    Scale shape — ONE orderkey-hash co-partition: line batches
    pre-reduce per orderkey to floored-charge sums; orders ride with
    (year, floored header); the fold differences each order once and
    collapses IN PLACE to per-year partials; the k=1 merge sums
    O(parts × years) rows."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def line_cells(b: pa.Table) -> pa.Table:
        ep = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dc = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        tx = b["l_tax"].combine_chunks().to_numpy(zero_copy_only=False)
        charge = np.floor(ep * (1.0 - dc) * (1.0 + tx)).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "v": pa.array(charge),
                "yr": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        )
        g = t.group_by(["k", "yr"], use_threads=False).aggregate(
            [("v", "sum")]
        )
        return g.rename_columns(["k", "yr", "v"])

    def order_cells(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "yr": pa.array(
                    od.astype("datetime64[us]")
                    .astype("datetime64[Y]")
                    .astype(np.int64)
                    + 1970
                ),
                "v": pa.array(
                    np.floor(
                        b["o_totalprice"]
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("yr", "no", "nchild", "nmis", "adelta")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        yrv = t["yr"].combine_chunks().to_numpy(zero_copy_only=False)
        o = t.filter(pa.array(yrv >= 0))
        l = t.filter(pa.array(yrv < 0))
        if o.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        ok = o["k"].combine_chunks().to_numpy(zero_copy_only=False)
        oy = o["yr"].combine_chunks().to_numpy(zero_copy_only=False)
        ov = o["v"].combine_chunks().to_numpy(zero_copy_only=False)
        lsum = np.zeros(len(ok), np.int64)
        haslines = np.zeros(len(ok), bool)
        if l.num_rows:
            lg = l.group_by("k", use_threads=False).aggregate([("v", "sum")])
            lk = lg["k"].combine_chunks().to_numpy(zero_copy_only=False)
            lv = lg["v_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            oorder = np.argsort(ok, kind="stable")
            ok_s = ok[oorder]
            pos = np.clip(np.searchsorted(ok_s, lk), 0, len(ok_s) - 1)
            hit = ok_s[pos] == lk
            np.add.at(lsum, oorder[pos[hit]], lv[hit])
            haslines[oorder[pos[hit]]] = True
        delta = np.abs(ov - lsum)
        u, idx = np.unique(oy, return_inverse=True)
        no = np.bincount(idx).astype(np.int64)
        nchild = np.zeros(len(u), np.int64)
        np.add.at(nchild, idx, (~haslines).astype(np.int64))
        mism = haslines & (delta != 0)
        nmis = np.zeros(len(u), np.int64)
        np.add.at(nmis, idx, mism.astype(np.int64))
        ad = np.zeros(len(u), np.int64)
        np.add.at(ad, idx, np.where(haslines, delta, 0))
        return pa.table(
            {
                "yr": pa.array(u),
                "no": pa.array(no),
                "nchild": pa.array(nchild),
                "nmis": pa.array(nmis),
                "adelta": pa.array(ad),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "order_year",
            "n_orders",
            "n_childless",
            "n_mismatched",
            "abs_delta_total",
        )
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("yr", use_threads=False).aggregate(
            [("no", "sum"), ("nchild", "sum"), ("nmis", "sum"),
             ("adelta", "sum")]
        )
        return pa.table(
            {
                "order_year": pc.cast(g["yr"], pa.int64()),
                "n_orders": pc.cast(g["no_sum"], pa.int64()),
                "n_childless": pc.cast(g["nchild_sum"], pa.int64()),
                "n_mismatched": pc.cast(g["nmis_sum"], pa.int64()),
                "abs_delta_total": pc.cast(g["adelta_sum"], pa.int64()),
            }
        )

    tagged = lines.map_batches(
        line_cells, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        ords.map_batches(
            order_cells, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    cells = hash_partition_merge(
        tagged, "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "yr", merge, k=1)


def line_order_coherence(sf_dir: str) -> Dataset:
    """R113: line-order coherence audit — within each multi-line
    order, walk the lines in l_linenumber order and count adjacent
    pairs whose ship date RETREATS: multi-line orders, fully coherent
    orders (no retreat), adjacent pairs, and inversions — does the
    line sequence mean anything operationally?  (R84 audits the
    linenumber VALUES for density, R57 spreads the ship dates; R113
    crosses them: if linenumbers were assigned in fulfillment order,
    inversions ≈ 0 and "first line" heuristics are safe; a ~500‰
    inversion rate means the sequence is entry order only — E147's
    clock-vs-sequence discipline inside the order.)  ONE dense row
    ALWAYS; exact int64 (lag-over-linenumber oracle).

    Scale shape — ONE orderkey-hash exchange of narrow (okey, lineno,
    ship-day) rows: each partition lexsorts its complete orders once,
    adjacent same-order pairs classify in place; the k=1 merge sums
    O(parts) counter rows."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_shipdate"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def narrow(b: pa.Table) -> pa.Table:
        sd = (
            b["l_shipdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "ln": pc.cast(b["l_linenumber"], pa.int64()),
                "d": pa.array(sd // 86_400_000_000, pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("g", "nmo", "ncoh", "np_", "ninv")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        k = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        ln = t["ln"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["d"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((d, ln, k))
        ks, ds_ = k[order], d[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pd_ = np.empty(n, dtype=np.int64)
        pd_[0] = 0
        pd_[1:] = ds_[:-1]
        inv = has_prev & (ds_ < pd_)
        u, idx = np.unique(ks, return_inverse=True)
        nl = np.bincount(idx).astype(np.int64)
        ninv_o = np.zeros(len(u), np.int64)
        np.add.at(ninv_o, idx, inv.astype(np.int64))
        multi = nl > 1
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "nmo": pa.array([int(multi.sum())], pa.int64()),
                "ncoh": pa.array(
                    [int((multi & (ninv_o == 0)).sum())], pa.int64()
                ),
                "np_": pa.array([int((nl[multi] - 1).sum())], pa.int64()),
                "ninv": pa.array([int(ninv_o.sum())], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "n_multi_orders",
            "n_coherent_orders",
            "n_pairs",
            "n_inversions",
        )
        if t.num_rows == 0:
            return pa.table({c: pa.array([0], pa.int64()) for c in out})
        src = ("nmo", "ncoh", "np_", "ninv")
        return pa.table(
            {
                name: pa.array([int(pc.sum(t[c]).as_py())], pa.int64())
                for name, c in zip(out, src)
            }
        )

    cells = hash_partition_merge(
        lines.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True),
        "k",
        fold,
        k=_rel_k(sf_dir, "lineitem"),
    )
    return hash_partition_merge(cells, "g", merge, k=1)


def segment_weekday_matrix(sf_dir: str) -> Dataset:
    """R114: segment weekday matrix — per (market segment, order
    weekday): orders and floored value — WHO drives each day's demand
    (R73 profiles the weekday wheel for everyone at once, R94 scores
    individual weekday loyalty, R43 crosses segment with priority;
    R114 decomposes the wheel by segment: a BUILDING hump on weekdays
    against a HOUSEHOLD weekend is two businesses sharing one order
    book, and staffing/promo calendars split exactly along this
    matrix).  Dense small output (segments × 7); exact int64 (join +
    (epoch-day+3)%7 + GROUP BY oracle — R89's weekday convention).

    Scale shape — R88's ONE custkey-hash co-partition with the
    weekday riding the order side; cells fold in place; the k=1 merge
    sums O(parts × segments × 7) rows."""
    segs = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]
            ).unique("c_mktsegment")
        ),
        pa.string(),
    )
    nseg = len(segs)

    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )

    def order_rows(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "dow": pa.array(
                    (od // 86_400_000_000 + 3) % 7, pa.int64()
                ),
                "v": pa.array(
                    np.floor(
                        b["o_totalprice"]
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                ),
                "seg": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        )

    def cust_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "dow": pa.array(np.zeros(n, np.int64)),
                "v": pa.array(np.zeros(n, np.int64)),
                "seg": pc.cast(
                    pc.index_in(b["c_mktsegment"], value_set=segs), pa.int64()
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("cell", "no", "sv")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        segv = t["seg"].combine_chunks().to_numpy(zero_copy_only=False)
        is_cust = segv >= 0
        c = t.filter(pa.array(is_cust))
        o = t.filter(pa.array(~is_cust))
        if c.num_rows == 0 or o.num_rows == 0:
            return pa.table({c2: pa.array([], pa.int64()) for c2 in cols})
        ck = c["k"].combine_chunks().to_numpy(zero_copy_only=False)
        corder = np.argsort(ck, kind="stable")
        ck_s = ck[corder]
        cseg = c["seg"].combine_chunks().to_numpy(zero_copy_only=False)[
            corder
        ]
        ok = o["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ck_s, ok), 0, len(ck_s) - 1)
        hit = ck_s[pos] == ok
        seg = cseg[pos][hit]
        dow = o["dow"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        v = o["v"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        key = seg * 7 + dow
        no = np.bincount(key, minlength=nseg * 7).astype(np.int64)
        sv = np.zeros(nseg * 7, np.int64)
        np.add.at(sv, key, v)
        keep = np.flatnonzero(no)
        return pa.table(
            {
                "cell": pa.array(keep),
                "no": pa.array(no[keep]),
                "sv": pa.array(sv[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("c_mktsegment", "order_dow", "n_orders", "value_floor")
        if t.num_rows == 0:
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by("cell", use_threads=False).aggregate(
            [("no", "sum"), ("sv", "sum")]
        )
        cell = g["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_mktsegment": segs.take(pa.array(cell // 7, pa.int64())),
                "order_dow": pa.array(cell % 7, pa.int64()),
                "n_orders": pc.cast(g["no_sum"], pa.int64()),
                "value_floor": pc.cast(g["sv_sum"], pa.int64()),
            }
        )

    tagged = ords.map_batches(
        order_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        cust.map_batches(
            cust_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    cells = hash_partition_merge(
        tagged, "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "cell", merge, k=1)


def activity_intensity_trend(sf_dir: str) -> Dataset:
    """R115: activity-intensity trend — per order YEAR: orders, ACTIVE
    customers (≥1 order), and orders per thousand actives — growth
    decomposed into breadth × intensity (R24 counts monthly actives,
    R25 the order book's YoY; R115 divides them: a book growing on
    flat actives is the same base ordering harder — retention
    economics — while actives growing on flat intensity is
    acquisition; the two need opposite investments).  Dense small
    output (years); exact int64 (COUNT DISTINCT + GROUP BY oracle).

    Scale shape — ONE (year, custkey)-hash exchange over distinct
    cells (batches pre-reduce with one np.unique and carry order
    counts): a (year, customer)'s cells co-locate, so distinct actives
    sum exactly; the k=1 merge sums O(parts × years) rows."""
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        yr = (
            od.astype("datetime64[us]").astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        ck = (
            pc.cast(b["o_custkey"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        key = np.stack([yr, ck], axis=1)
        u, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "yc": pa.array(u[:, 0] * (1 << 40) + u[:, 1]),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("yr", "no", "nc")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("yc", use_threads=False).aggregate([("n", "sum")])
        yc = g["yc"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        yr = yc >> 40
        u, idx = np.unique(yr, return_inverse=True)
        no = np.zeros(len(u), np.int64)
        np.add.at(no, idx, n)
        nc = np.bincount(idx).astype(np.int64)
        return pa.table(
            {"yr": pa.array(u), "no": pa.array(no), "nc": pa.array(nc)}
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("order_year", "n_orders", "n_active_customers",
               "orders_per_k")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("yr", use_threads=False).aggregate(
            [("no", "sum"), ("nc", "sum")]
        )
        yr = g["yr"].combine_chunks().to_numpy(zero_copy_only=False)
        no = g["no_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nc = g["nc_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "order_year": pa.array(yr, pa.int64()),
                "n_orders": pa.array(no, pa.int64()),
                "n_active_customers": pa.array(nc, pa.int64()),
                "orders_per_k": pa.array(
                    1000 * no // np.maximum(nc, 1), pa.int64()
                ),
            }
        )

    cells = ords.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = hash_partition_merge(cells, "yc", fold, k=_rel_k(sf_dir, "orders"))
    return hash_partition_merge(folded, "yr", merge, k=1)


def supply_geography_trend(sf_dir: str) -> Dataset:
    """R116: supply-geography trend — per (supplier nation, ship
    year): lines, exact quantity, and floored revenue — the
    supply-side growth ledger pairing R96's demand-side one (R4 rolls
    supplier revenue to the REGION once, R86 maps nation × brand
    statically; R116 adds the time axis on the maker's side: a nation
    whose share of shipped quantity climbs year over year is supply
    migrating — the sourcing-strategy chart, and the denominator for
    any "nearshoring" claim).  Dense small output (nations × years);
    exact int64 (join + extract(year) + GROUP BY oracle).

    Scale shape — ONE suppkey-hash co-partition (R86's hop 1 with the
    year riding the line cells): line batches pre-reduce per
    (suppkey, year); the supplier dim rides (suppkey → nationkey);
    the fold attaches and collapses IN PLACE; names attach from the
    25-row nation broadcast at the k=1 merge."""
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat = nat.sort_values("n_nationkey").reset_index(drop=True)
    nat_names = pa.array(nat["n_name"].tolist(), pa.string())
    nat_keys = np.sort(nat["n_nationkey"].to_numpy().astype(np.int64))

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_quantity",
                 "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    sup = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "supplier"),
    )

    def line_cells(b: pa.Table) -> pa.Table:
        sd = (
            b["l_shipdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        yr = (
            sd.astype("datetime64[us]").astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        ep = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dc = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "k": pc.cast(b["l_suppkey"], pa.int64()),
                "yr": pa.array(yr, pa.int64()),
                "nat": pa.array(np.full(b.num_rows, -1, np.int64)),
                "nl": pa.array(np.ones(b.num_rows, np.int64)),
                "qty": pa.array(
                    np.floor(
                        b["l_quantity"]
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                ),
                "rev": pa.array(np.floor(ep * (1.0 - dc)).astype(np.int64)),
            }
        )
        g = t.group_by(["k", "yr", "nat"], use_threads=False).aggregate(
            [("nl", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["k", "yr", "nat", "nl", "qty", "rev"])

    def sup_cells(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b["s_suppkey"], pa.int64()),
                "yr": pa.array(np.zeros(n, np.int64)),
                "nat": pc.cast(b["s_nationkey"], pa.int64()),
                "nl": pa.array(np.zeros(n, np.int64)),
                "qty": pa.array(np.zeros(n, np.int64)),
                "rev": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("nat", "yr", "nl", "qty", "rev")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        natv = t["nat"].combine_chunks().to_numpy(zero_copy_only=False)
        is_sup = natv >= 0
        s = t.filter(pa.array(is_sup))
        l = t.filter(pa.array(~is_sup))
        if s.num_rows == 0 or l.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        sk = s["k"].combine_chunks().to_numpy(zero_copy_only=False)
        sorder = np.argsort(sk, kind="stable")
        sk_s = sk[sorder]
        snat = s["nat"].combine_chunks().to_numpy(zero_copy_only=False)[
            sorder
        ]
        lk = l["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(sk_s, lk), 0, len(sk_s) - 1)
        hit = sk_s[pos] == lk
        cells = pa.table(
            {
                "nat": pa.array(snat[pos][hit], pa.int64()),
                "yr": pa.array(
                    l["yr"].combine_chunks().to_numpy(zero_copy_only=False)[
                        hit
                    ],
                    pa.int64(),
                ),
                "nl": pc.cast(l["nl"], pa.int64()).filter(pa.array(hit)),
                "qty": pc.cast(l["qty"], pa.int64()).filter(pa.array(hit)),
                "rev": pc.cast(l["rev"], pa.int64()).filter(pa.array(hit)),
            }
        )
        g = cells.group_by(["nat", "yr"], use_threads=False).aggregate(
            [("nl", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        return g.rename_columns(["nat", "yr", "nl", "qty", "rev"])

    def merge(t: pa.Table) -> pa.Table:
        out = ("nation", "ship_year", "n_lines", "qty_floor",
               "revenue_floor")
        if t.num_rows == 0:
            return pa.table(
                {
                    "nation": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by(["nat", "yr"], use_threads=False).aggregate(
            [("nl", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        natv = g["nat"].combine_chunks().to_numpy(zero_copy_only=False)
        npos = np.searchsorted(nat_keys, natv)
        return pa.table(
            {
                "nation": nat_names.take(pa.array(npos, pa.int64())),
                "ship_year": pc.cast(g["yr"], pa.int64()),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
                "qty_floor": pc.cast(g["qty_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    tagged = lines.map_batches(
        line_cells, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        sup.map_batches(
            sup_cells, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    cells = hash_partition_merge(
        tagged, "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "nat", merge, k=1)


def price_ending_spectrum(sf_dir: str) -> Dataset:
    """R117: price-ending spectrum — per last-two-cent ending of the
    order value (00..99): orders and value mass — charm pricing made
    visible (E132 audits event-payload last digits; on the commerce
    book the ending distribution is a pricing-POLICY read: mass at 99
    is psychological pricing, at 00 round-number invoicing, uniform
    endings mean computed totals — and a shift in the spectrum is a
    repricing event no mean tracks).  Dense small output (≤100 rows);
    exact int64 (modulo GROUP BY oracle).

    Scale shape — ZERO wide exchange: one modulo + two bincounts per
    batch; O(batches × 100) partials ride the k=1 merge."""
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        end = cents % 100
        no = np.bincount(end, minlength=100).astype(np.int64)
        sv = np.zeros(100, np.int64)
        np.add.at(sv, end, cents)
        keep = np.flatnonzero(no)
        return pa.table(
            {
                "e": pa.array(keep),
                "no": pa.array(no[keep]),
                "sv": pa.array(sv[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("cent_ending", "n_orders", "cents_total")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("e", use_threads=False).aggregate(
            [("no", "sum"), ("sv", "sum")]
        )
        return pa.table(
            {
                "cent_ending": pc.cast(g["e"], pa.int64()),
                "n_orders": pc.cast(g["no_sum"], pa.int64()),
                "cents_total": pc.cast(g["sv_sum"], pa.int64()),
            }
        )

    partials = ords.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "e", merge, k=1)


def daily_demand_spectrum(sf_dir: str) -> Dataset:
    """R118: daily-demand spectrum — band every calendar day by the
    bit length of its order count and report days and orders per band
    — demand volatility as a histogram (R73/R45 profile MEAN demand by
    weekday/season; R118 distributes the days themselves: a tight
    band is steady flow a fixed crew handles, a spread spectrum with
    a fat top band is spike-driven demand that needs surge capacity —
    the staffing-model selector).  Dense small output (≤~20 bands);
    exact int64 (per-day counts + bin-length GROUP BY oracle).

    Scale shape — ONE day-hash exchange over per-batch (day, n)
    cells: a day's partials co-locate and settle, then band-bincount
    IN PLACE; the k=1 merge sums O(parts × bands) rows."""
    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        u, cnt = np.unique(day, return_counts=True)
        return pa.table(
            {"d": pa.array(u), "n": pa.array(cnt.astype(np.int64))}
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("band", "nd", "no")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("d", use_threads=False).aggregate([("n", "sum")])
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        powers2 = np.int64(1) << np.arange(1, 41)
        band = np.searchsorted(powers2, n, side="right") + 1
        u, idx = np.unique(band, return_inverse=True)
        nd = np.bincount(idx).astype(np.int64)
        no = np.zeros(len(u), np.int64)
        np.add.at(no, idx, n)
        return pa.table(
            {"band": pa.array(u), "nd": pa.array(nd), "no": pa.array(no)}
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("volume_band", "n_days", "n_orders")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("band", use_threads=False).aggregate(
            [("nd", "sum"), ("no", "sum")]
        )
        return pa.table(
            {
                "volume_band": pc.cast(g["band"], pa.int64()),
                "n_days": pc.cast(g["nd_sum"], pa.int64()),
                "n_orders": pc.cast(g["no_sum"], pa.int64()),
            }
        )

    cells = ords.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = hash_partition_merge(cells, "d", fold, k=_rel_k(sf_dir, "orders"))
    return hash_partition_merge(folded, "band", merge, k=1)


def supplier_credit_map(sf_dir: str) -> Dataset:
    """R119: supplier credit-risk map — per nation: suppliers,
    NEGATIVE-balance suppliers, the risk permille, the worst floored
    balance, and the net floored balance — the supply-side credit
    exposure (R67 quantiles CUSTOMER balances per nation, R55 couples
    supplier balance with volume, R93 supplier liveness; R119 locates
    where the distressed capacity sits geographically — a nation
    whose suppliers skew negative is a financing-fragility cluster
    the sourcing strategy should hedge before R116's trend tilts
    toward it).  One dense row per nation with suppliers ALWAYS;
    exact int64 (FILTER counts + min + GROUP BY oracle).

    Scale shape — ZERO wide exchange beyond the k=1 merge: the
    supplier dim streams column-pruned; per batch one floor + four
    bincounts by nation; O(batches × nations) partials fold k=1 with
    the 25-row nation broadcast for names."""
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat = nat.sort_values("n_nationkey").reset_index(drop=True)
    nat_names = pa.array(nat["n_name"].tolist(), pa.string())
    nat_keys = np.sort(nat["n_nationkey"].to_numpy().astype(np.int64))

    sup = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_nationkey", "s_acctbal"],
        override_num_blocks=_rel_k(sf_dir, "supplier"),
    )

    def partial(b: pa.Table) -> pa.Table:
        nk = (
            pc.cast(b["s_nationkey"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        bal = np.floor(
            b["s_acctbal"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        u, idx = np.unique(nk, return_inverse=True)
        ns_ = np.bincount(idx).astype(np.int64)
        neg = np.zeros(len(u), np.int64)
        np.add.at(neg, idx, (bal < 0).astype(np.int64))
        mn = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, idx, bal)
        net = np.zeros(len(u), np.int64)
        np.add.at(net, idx, bal)
        return pa.table(
            {
                "nk": pa.array(u),
                "ns": pa.array(ns_),
                "neg": pa.array(neg),
                "mn": pa.array(mn),
                "net": pa.array(net),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "nation",
            "n_suppliers",
            "n_negative",
            "risk_permille",
            "worst_balance",
            "net_balance",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "nation": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by("nk", use_threads=False).aggregate(
            [("ns", "sum"), ("neg", "sum"), ("mn", "min"), ("net", "sum")]
        )
        nk = g["nk"].combine_chunks().to_numpy(zero_copy_only=False)
        ns_ = g["ns_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        neg = g["neg_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        mn = g["mn_min"].combine_chunks().to_numpy(zero_copy_only=False)
        net = g["net_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        npos = np.searchsorted(nat_keys, nk)
        return pa.table(
            {
                "nation": nat_names.take(pa.array(npos, pa.int64())),
                "n_suppliers": pa.array(ns_, pa.int64()),
                "n_negative": pa.array(neg, pa.int64()),
                "risk_permille": pa.array(
                    1000 * neg // np.maximum(ns_, 1), pa.int64()
                ),
                "worst_balance": pa.array(mn, pa.int64()),
                "net_balance": pa.array(net, pa.int64()),
            }
        )

    partials = sup.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "nk", merge, k=1)


def segment_balance_profile(sf_dir: str) -> Dataset:
    """R120: segment balance profile — per market segment: customers,
    NEGATIVE-balance customers, the debt permille, worst and net
    floored balances — the demand-side credit twin of R119 (R67
    quantiles balances per NATION, R109 couples balance with ticket
    size; R120 maps where the indebted demand sits commercially: a
    segment skewing negative is growth bought on credit — its R88
    value trend should be risk-discounted before anyone celebrates
    it).  One dense row per segment ALWAYS; exact int64 (FILTER
    counts + min + GROUP BY oracle).

    Scale shape — ZERO wide exchange beyond the k=1 merge: the
    customer dim streams column-pruned; one floor + four bincounts
    per batch; O(batches × segments) partials fold k=1."""
    segs = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]
            ).unique("c_mktsegment")
        ),
        pa.string(),
    )
    nseg = len(segs)

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_mktsegment", "c_acctbal"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["c_mktsegment"], value_set=segs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        bal = np.floor(
            b["c_acctbal"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        nc = np.bincount(code, minlength=nseg).astype(np.int64)
        neg = np.bincount(code[bal < 0], minlength=nseg).astype(np.int64)
        mn = np.full(nseg, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, code, bal)
        net = np.zeros(nseg, np.int64)
        np.add.at(net, code, bal)
        keep = np.flatnonzero(nc)
        return pa.table(
            {
                "s": pa.array(keep),
                "nc": pa.array(nc[keep]),
                "neg": pa.array(neg[keep]),
                "mn": pa.array(mn[keep]),
                "net": pa.array(net[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "c_mktsegment",
            "n_customers",
            "n_negative",
            "debt_permille",
            "worst_balance",
            "net_balance",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("nc", "sum"), ("neg", "sum"), ("mn", "min"), ("net", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        nc = g["nc_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        neg = g["neg_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        mn = g["mn_min"].combine_chunks().to_numpy(zero_copy_only=False)
        net = g["net_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        ss, nc, neg, mn, net = (
            ss[order], nc[order], neg[order], mn[order], net[order]
        )
        return pa.table(
            {
                "c_mktsegment": segs.take(pa.array(ss, pa.int64())),
                "n_customers": pa.array(nc, pa.int64()),
                "n_negative": pa.array(neg, pa.int64()),
                "debt_permille": pa.array(
                    1000 * neg // np.maximum(nc, 1), pa.int64()
                ),
                "worst_balance": pa.array(mn, pa.int64()),
                "net_balance": pa.array(net, pa.int64()),
            }
        )

    partials = cust.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def priority_migration(sf_dir: str) -> Dataset:
    """R121: priority-migration matrix — over every customer's
    CONSECUTIVE order pairs ((floor-day, orderkey) order): count
    transitions (previous priority → next priority) — the
    service-tier flow map (R76 scores priority LOYALTY as
    exclusivity, R43 crosses priority with segment statically; R121
    shows the movement itself: a matrix massed above the diagonal is
    a base escalating toward urgency — capacity should follow — and
    the diagonal mass is R76's loyalty expressed as flows).  Dense
    small output (priorities²); exact int64 (lag-window + GROUP BY
    oracle).

    Scale shape — R95's ONE custkey-hash exchange: each partition
    lexsorts its complete customers once, adjacent pairs emit
    (from, to) cells via one bincount; the k=1 merge sums
    O(parts × priorities²) rows."""
    pr = _priority_rank(sf_dir)
    prs = pa.array(list(pr), pa.string())
    npr = len(prs)

    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey",
                 "o_orderpriority"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def narrow(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "ck": pc.cast(b["o_custkey"], pa.int64()),
                "d": pa.array(od // 86_400_000_000, pa.int64()),
                "ok": pc.cast(b["o_orderkey"], pa.int64()),
                "pr": pc.cast(
                    pc.index_in(b["o_orderpriority"], value_set=prs),
                    pa.int64(),
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("cell", "n")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        ck = t["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["d"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = t["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        prv = t["pr"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, d, ck))
        cks, prs_ = ck[order], prv[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = cks[1:] == cks[:-1]
        pp = np.empty(n, dtype=np.int64)
        pp[0] = 0
        pp[1:] = prs_[:-1]
        pair = has_prev
        cell = pp[pair] * npr + prs_[pair]
        cnt = np.bincount(cell, minlength=npr * npr).astype(np.int64)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {"cell": pa.array(keep), "n": pa.array(cnt[keep])}
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "from_priority": pa.array([], pa.string()),
                    "to_priority": pa.array([], pa.string()),
                    "n_transitions": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("cell", use_threads=False).aggregate([("n", "sum")])
        cell = g["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "from_priority": prs.take(
                    pa.array(cell // npr, pa.int64())
                ),
                "to_priority": prs.take(pa.array(cell % npr, pa.int64())),
                "n_transitions": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    cells = hash_partition_merge(
        ords.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True),
        "ck",
        fold,
        k=_rel_k(sf_dir, "orders"),
    )
    return hash_partition_merge(cells, "cell", merge, k=1)


def position_quantity_profile(sf_dir: str) -> Dataset:
    """R122: position-quantity profile — per l_linenumber: lines,
    exact quantity, and floored revenue — does entry order encode
    size?  (R27 profiles how many orders REACH each position, R113
    tests whether the sequence tracks fulfillment; R122 reads the
    SIZE gradient along it: a falling quantity curve means people
    enter their main item first — position-1 revenue share is then a
    cheap basket-head predictor — while a flat curve says position is
    pure bookkeeping).  Dense small output (≤7 positions); exact
    int64 (GROUP BY oracle).

    Scale shape — ZERO wide exchange: the position axis is bounded;
    one bincount trio per batch; O(batches × positions) partials
    fold k=1."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_linenumber", "l_quantity", "l_extendedprice",
                 "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ln = (
            pc.cast(b["l_linenumber"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        q = np.floor(
            b["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        ep = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dc = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ep * (1.0 - dc)).astype(np.int64)
        u, idx = np.unique(ln, return_inverse=True)
        nl = np.bincount(idx).astype(np.int64)
        qs = np.zeros(len(u), np.int64)
        np.add.at(qs, idx, q)
        rs = np.zeros(len(u), np.int64)
        np.add.at(rs, idx, rev)
        return pa.table(
            {
                "pos": pa.array(u),
                "nl": pa.array(nl),
                "qty": pa.array(qs),
                "rev": pa.array(rs),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("l_linenumber", "n_lines", "qty_floor", "revenue_floor")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("pos", use_threads=False).aggregate(
            [("nl", "sum"), ("qty", "sum"), ("rev", "sum")]
        )
        return pa.table(
            {
                "l_linenumber": pc.cast(g["pos"], pa.int64()),
                "n_lines": pc.cast(g["nl_sum"], pa.int64()),
                "qty_floor": pc.cast(g["qty_sum"], pa.int64()),
                "revenue_floor": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    partials = lines.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "pos", merge, k=1)


def type_price_volume(sf_dir: str) -> Dataset:
    """R123: price↔volume coupling stats per part type (round 5) — per
    p_type: lines and the exact integer sufficient statistics (Σq, Σv,
    Σq·v, Σq², Σv²) of q = floor(l_quantity) vs v = floor(discounted line
    revenue) — the demand-curve read next to R74's P&L row ("do big-ticket
    types move in big lots or single units"): the Pearson correlation and
    the regression slope both derive downstream to any precision, the R44
    discipline (R70 couples VALUE with LATENCY per priority, R56 spreads
    UNIT price per part; R123 couples the money with the LOT SIZE per
    category — negative coupling is bulk-discount economics, positive is
    premium bundling).  One dense row per p_type ALWAYS; exact int64
    (join + SUM-of-products oracle; v² ≈ 10^10/line bounds the sums to
    ~10^8 lines/type before the k=1 merge must widen to object dtype —
    T45's documented escape).

    Scale shape — R74's co-partition verbatim with a moment payload:
    parts GROW WITH THE CORPUS so the type travels by CO-PARTITION,
    never broadcast; lineitem batches pre-reduce to per-partkey
    6-moment partials (cross-products formed per LINE, then summed —
    associative); the PARTKEY fold attaches type ranks with one
    searchsorted and re-reduces IN PLACE to a ≤ types × 6 grid; the
    k=1 merge densifies.  Only the ~6-value type list broadcasts."""
    from ..stages.shuffle import hash_partition_merge

    types = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/part.parquet", columns=["p_type"]
            ).unique("p_type")
        ),
        pa.string(),
    )
    nt = len(types)
    MOMS = ("nl", "sq", "sv", "sqv", "sq2", "sv2")

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_type"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "k": pc.cast(b["p_partkey"], pa.int64()),
            "ty": pc.cast(
                pc.index_in(b["p_type"], value_set=types), pa.int64()
            ),
        }
        cols.update({m: pa.array(np.zeros(n, np.int64)) for m in MOMS})
        return pa.table(cols)

    def fact_partial(b: pa.Table) -> pa.Table:
        ext = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dis = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        q = np.floor(
            b["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        v = np.floor(ext * (1.0 - dis)).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "nl": pa.array(np.ones(len(q), np.int64)),
                "sq": pa.array(q),
                "sv": pa.array(v),
                "sqv": pa.array(q * v),
                "sq2": pa.array(q * q),
                "sv2": pa.array(v * v),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate(
            [(m, "sum") for m in MOMS]
        )
        g = g.rename_columns(["k", *MOMS])
        return g.append_column(
            "ty", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "ty", *MOMS])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"ty": pa.array([], pa.int64())}
            | {m: pa.array([], pa.int64()) for m in MOMS}
        )
        if t.num_rows == 0:
            return empty
        role = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dty = d["ty"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        ty = dty[pos][hit]
        grids = {m: np.zeros(nt, np.int64) for m in MOMS}
        for m in MOMS:
            np.add.at(
                grids[m], ty,
                f[m].combine_chunks().to_numpy(zero_copy_only=False)[hit],
            )
        live = np.flatnonzero(grids["nl"])
        return pa.table(
            {"ty": pa.array(live.astype(np.int64))}
            | {m: pa.array(grids[m][live]) for m in MOMS}
        )

    def merge(t: pa.Table) -> pa.Table:
        grids = {m: np.zeros(nt, np.int64) for m in MOMS}
        if t.num_rows:
            ty = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
            for m in MOMS:
                np.add.at(
                    grids[m], ty,
                    t[m].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "p_type": types,
                "n_lines": pa.array(grids["nl"]),
                "sum_q": pa.array(grids["sq"]),
                "sum_v": pa.array(grids["sv"]),
                "sum_qv": pa.array(grids["sqv"]),
                "sum_q2": pa.array(grids["sq2"]),
                "sum_v2": pa.array(grids["sv2"]),
            }
        )

    fact = lines.map_batches(fact_partial, batch_format="pyarrow")
    dim = part.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "ty", merge, k=1)


def customer_peak_share(sf_dir: str) -> Dataset:
    """R124: customer peak-order-share bands — per (market segment,
    decile band of 1000·max(order value)//Σ(order value)): customers in
    the band and their total lifetime orders — "is a customer's spend a
    habit or one big event" as a distribution (R11's Pareto ranks
    CUSTOMERS by total, R85 tracks spend persistence across years,
    R103's first-order board reads only the ENTRY point; R124 reads the
    internal shape of each wallet: band 10 is the single-order /
    one-whale mass where LTV models built on repeat behavior are
    unsupported, bands 1-3 are metronome repeat buyers).  One row per
    OCCUPIED (segment, band) cell; band = share_permille // 100 with
    share 1000 → band 10 (11 bands).  Exact int64 (per-order floor →
    per-customer max/sum → banded two-level GROUP BY oracle; money
    floors per order, the §2.3b convention; greatest(s,1) guards the
    degenerate all-zero wallet in BOTH lanes).

    Scale shape — R77's custkey co-partition verbatim with a max/sum
    payload: customers GROW WITH THE CORPUS so the segment travels by
    CO-PARTITION, never broadcast (only the ~5-value segment list
    ships); order batches pre-reduce to per-custkey (max, sum, n)
    partials — max and sum are both associative so partials combine
    exactly in the fold; the custkey-hash fold attaches each customer's
    segment with one searchsorted, bands the wallet, and collapses IN
    PLACE to a ≤ segments × 11 grid; k=1 densifying merge.

    Reference parity: per-key aggregate-of-aggregates over the staged
    store, the cascade's rollup→cascade discipline
    (/root/reference/internal/storage/pgsql.go:1 lifecycle) applied to
    the relational adapter."""
    segs = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]
            ).unique("c_mktsegment")
        ),
        pa.string(),
    )
    nsg = len(segs)
    nb = 11
    ncell = nsg * nb

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        sg = (
            pc.cast(pc.index_in(b["c_mktsegment"], value_set=segs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        z = np.zeros(b.num_rows, np.int64)
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "seg": pa.array(sg.astype(np.int64)),
                "mx": pa.array(z),
                "s": pa.array(z),
                "n": pa.array(z),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        rv = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "mx": pa.array(rv),
                "s": pa.array(rv),
                "n": pa.array(np.ones(len(rv), np.int64)),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate(
            [("mx", "max"), ("s", "sum"), ("n", "sum")]
        )
        g = g.rename_columns(["k", "mx", "s", "n"])
        return g.append_column(
            "seg", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "seg", "mx", "s", "n"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "nc": pa.array([], pa.int64()),
                "no": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["seg"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fg = f.group_by("k", use_threads=False).aggregate(
            [("mx", "max"), ("s", "sum"), ("n", "sum")]
        )
        fg = fg.rename_columns(["k", "mx", "s", "n"])
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk, kind="stable")
        dk_s = dk[order]
        dseg = role[is_dim][order]
        fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        seg = dseg[pos][hit]
        mx = fg["mx"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        s = fg["s"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        n = fg["n"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        band = np.minimum(
            (1000 * mx) // np.maximum(s, 1) // 100, nb - 1
        )
        cell = seg * nb + band
        g_nc = np.zeros(ncell, np.int64)
        g_no = np.zeros(ncell, np.int64)
        np.add.at(g_nc, cell, 1)
        np.add.at(g_no, cell, n)
        live = np.flatnonzero(g_nc)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "nc": pa.array(g_nc[live]),
                "no": pa.array(g_no[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        g_nc = np.zeros(ncell, np.int64)
        g_no = np.zeros(ncell, np.int64)
        if t.num_rows:
            cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                g_nc, cell,
                t["nc"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                g_no, cell,
                t["no"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(g_nc)
        return pa.table(
            {
                "c_mktsegment": pc.take(segs, pa.array(live // nb)),
                "band": pa.array((live % nb).astype(np.int64)),
                "n_customers": pa.array(g_nc[live]),
                "n_orders": pa.array(g_no[live]),
            }
        )

    fact = orders.map_batches(fact_partial, batch_format="pyarrow")
    dim = cust.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "cell", merge, k=1)


def cadence_lumpiness(sf_dir: str) -> Dataset:
    """R125: customer cadence-lumpiness bands — per (market segment,
    decile band of 1000·max(day gap)//active span): repeat customers in
    the band and their total lifetime orders — the SHAPE of a
    customer's calendar next to the cadence boards' magnitudes (R21
    quantiles the corpus's gap sizes, R81 counts same-DAY bursts, R99
    autocovaries consecutive VALUES; R125 asks whether a customer's
    active days spread evenly across their tenure or cluster around one
    long hiatus: band 10 = a single gap owns the whole span — two
    bursts with a desert between, the churn-and-winback signature;
    low bands = metronome cadence, only reachable with many evenly
    spaced active days since max_gap ≥ span/n_gaps).  Customers with
    ≥ 2 DISTINCT active days only (a span of zero has no shape);
    gaps measured between consecutive distinct floor-days.  One row per
    OCCUPIED (segment, band) cell; exact int64 (distinct floor-day +
    lag window + HAVING ≥ 2 + banded GROUP BY oracle).

    Scale shape — R124's custkey co-partition with a day-set payload:
    order batches pre-reduce to distinct (custkey, day, n_orders)
    cells (the only growth axis is ACTIVE DAYS per customer, bounded
    by tenure); the custkey-hash fold holds every day cell of a
    customer, so max-gap/span settle locally with one lexsort + one
    maximum.reduceat (no per-customer loop), attach the segment by
    searchsorted, and collapse IN PLACE to a ≤ segments × 11 grid;
    k=1 densifying merge.  Only the ~5-value segment list broadcasts."""
    segs = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]
            ).unique("c_mktsegment")
        ),
        pa.string(),
    )
    nsg = len(segs)
    nb = 11
    ncell = nsg * nb
    DAY_US = 86_400_000_000

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        sg = (
            pc.cast(pc.index_in(b["c_mktsegment"], value_set=segs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "d": pa.array(np.full(b.num_rows, -1, np.int64)),
                "seg": pa.array(sg.astype(np.int64)),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        ts_us = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        )
        t = pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "d": pa.array(ts_us // DAY_US, pa.int64()),
                "n": pa.array(np.ones(len(ts_us), np.int64)),
            }
        )
        g = t.group_by(["k", "d"], use_threads=False).aggregate([("n", "sum")])
        g = g.rename_columns(["k", "d", "n"])
        return g.append_column(
            "seg", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "d", "seg", "n"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "nc": pa.array([], pa.int64()),
                "no": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        dcol = t["d"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = dcol < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        # combine day cells across source batches
        fg = f.group_by(["k", "d"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        fg = fg.rename_columns(["k", "d", "n"])
        kk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dd = fg["d"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = fg["n"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((dd, kk))
        kk, dd, nn = kk[order], dd[order], nn[order]
        nrow = len(kk)
        change = np.empty(nrow, dtype=bool)
        change[0] = True
        change[1:] = kk[1:] != kk[:-1]
        starts = np.flatnonzero(change)
        lasts = np.append(starts[1:], nrow) - 1
        m_days = np.diff(np.append(starts, nrow))
        n_ord = np.add.reduceat(nn, starts)
        gaps = np.zeros(nrow, np.int64)
        if nrow > 1:
            same = kk[1:] == kk[:-1]
            gaps[:-1] = np.where(same, dd[1:] - dd[:-1], 0)
        mx = np.maximum.reduceat(gaps, starts)
        span = dd[lasts] - dd[starts]
        elig = m_days >= 2
        ck = kk[starts]
        # attach segment
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dseg = d["seg"].combine_chunks().to_numpy(zero_copy_only=False)
        o2 = np.argsort(dk, kind="stable")
        dk_s, dseg_s = dk[o2], dseg[o2]
        pos = np.clip(np.searchsorted(dk_s, ck), 0, len(dk_s) - 1)
        hit = (dk_s[pos] == ck) & elig
        seg = dseg_s[pos][hit]
        band = np.minimum(
            1000 * mx[hit] // np.maximum(span[hit], 1) // 100, nb - 1
        )
        cell = seg * nb + band
        g_nc = np.zeros(ncell, np.int64)
        g_no = np.zeros(ncell, np.int64)
        np.add.at(g_nc, cell, 1)
        np.add.at(g_no, cell, n_ord[hit])
        live = np.flatnonzero(g_nc)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "nc": pa.array(g_nc[live]),
                "no": pa.array(g_no[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        g_nc = np.zeros(ncell, np.int64)
        g_no = np.zeros(ncell, np.int64)
        if t.num_rows:
            cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                g_nc, cell,
                t["nc"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                g_no, cell,
                t["no"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(g_nc)
        return pa.table(
            {
                "c_mktsegment": pc.take(segs, pa.array(live // nb)),
                "band": pa.array((live % nb).astype(np.int64)),
                "n_customers": pa.array(g_nc[live]),
                "n_orders": pa.array(g_no[live]),
            }
        )

    fact = orders.map_batches(fact_partial, batch_format="pyarrow")
    dim = cust.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "cell", merge, k=1)


def entry_brand_loyalty(sf_dir: str) -> Dataset:
    """R126: entry-brand loyalty — per market segment: customers with ≥ 2
    brand-resolvable orders, those whose FIRST and LAST order (by
    (orderdate, orderkey)) share the same MODAL brand (each order's most
    line-frequent brand, ties to the lexicographically smallest — a
    deterministic, engine-agnostic rule), and the loyal permille — does
    the brand that ACQUIRED a customer keep them, the lifecycle question
    none of the brand or loyalty boards answer (R52's repertoire counts
    brands per customer, R62 cross-sells brand PAIRS, R76 scores
    priority exclusivity, R54 compares first-order VALUE; R126 follows
    the brand axis through time: high loyalty means acquisition brand is
    destiny and brand-level CAC math holds, low means the entry brand is
    a revolving door).  One row per segment with ≥ 1 eligible customer;
    exact int64 (three-hop join + per-order row_number modal + first/
    last_value window + permille oracle).

    Scale shape — THREE narrow hash exchanges, every hop pre-reduced,
    nothing corpus-sized broadcast (parts, orders and customers all GROW
    with the corpus and travel by co-partition; only the ~25-value brand
    LIST ships): (1) partkey hop — lineitem batches carry (partkey,
    orderkey) only; each partition attaches brand ranks by searchsorted
    and pre-reduces to (orderkey, brand, lines) cells; (2) orderkey hop
    — each order's modal brand settles with one lexsort over
    (ok, −count, brand-rank) group heads, then attaches (custkey, date)
    from the co-partitioned orders dim; (3) custkey hop — each
    customer's orders sort once by (date, orderkey), first/last modal
    brands read off the group boundaries, the segment attaches by
    searchsorted, and the partition collapses IN PLACE to a ≤ segments
    (n, n_loyal) grid; k=1 densifying merge."""
    brands = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/part.parquet", columns=["p_brand"]
            ).unique("p_brand")
        ),
        pa.string(),
    )
    nbr = len(brands)
    segs = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]
            ).unique("c_mktsegment")
        ),
        pa.string(),
    )
    nsg = len(segs)

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_orderkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )

    # ---- hop 1: partkey — brand-tag each line, reduce to (ok, b, n) ----
    def part_dim(b: pa.Table) -> pa.Table:
        br = (
            pc.cast(pc.index_in(b["p_brand"], value_set=brands), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "ok": pa.array(np.full(b.num_rows, -1, np.int64)),
                "b": pa.array(br.astype(np.int64)),
            }
        )

    def line_fact(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "ok": pc.cast(b["l_orderkey"], pa.int64()),
                "b": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        )

    def fold1(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        okc = t["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = okc < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        db = d["b"].combine_chunks().to_numpy(zero_copy_only=False)
        o = np.argsort(dk, kind="stable")
        dk_s, db_s = dk[o], db[o]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fok = f["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        br = db_s[pos][hit]
        ok2 = fok[hit]
        packed, cnt = np.unique(ok2 * nbr + br, return_counts=True)
        return pa.table(
            {
                "k": pa.array(packed // nbr),
                "b": pa.array(packed % nbr),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    hop1 = hash_partition_merge(
        lines.map_batches(line_fact, batch_format="pyarrow").union(
            part.map_batches(part_dim, batch_format="pyarrow")
        ),
        "k",
        fold1,
        k=_rel_k(sf_dir, "lineitem"),
    )

    # ---- hop 2: orderkey — modal brand per order + (custkey, date) ----
    def order_dim(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "b": pa.array(np.full(b.num_rows, -1, np.int64)),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
                "ck": pc.cast(b["o_custkey"], pa.int64()),
                "dt": b["o_orderdate"].cast(pa.int64()),
            }
        )

    def hop1_as_fact(b: pa.Table) -> pa.Table:
        neg = np.full(b.num_rows, -1, np.int64)
        return pa.table(
            {
                "k": b["k"],
                "b": b["b"],
                "n": b["n"],
                "ck": pa.array(neg),
                "dt": pa.array(neg),
            }
        )

    def fold2(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.array([], pa.int64()),
                "dt": pa.array([], pa.int64()),
                "o": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ckc = t["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = ckc >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fk0 = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fb0 = f["b"].combine_chunks().to_numpy(zero_copy_only=False)
        fn0 = f["n"].combine_chunks().to_numpy(zero_copy_only=False)
        # combine (ok, brand) cells arriving from different hop-1
        # partkey partitions (an order's lines span many parts)
        packed, inv = np.unique(fk0 * nbr + fb0, return_inverse=True)
        fn = np.zeros(len(packed), np.int64)
        np.add.at(fn, inv, fn0)
        fk, fb = packed // nbr, packed % nbr
        o2 = np.lexsort((fb, -fn, fk))
        head = np.empty(len(o2), dtype=bool)
        head[0] = True
        fk_o = fk[o2]
        head[1:] = fk_o[1:] != fk_o[:-1]
        mok = fk_o[head]
        mbr = fb[o2][head]
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        o3 = np.argsort(dk, kind="stable")
        dk_s = dk[o3]
        dck = d["ck"].combine_chunks().to_numpy(zero_copy_only=False)[o3]
        ddt = d["dt"].combine_chunks().to_numpy(zero_copy_only=False)[o3]
        pos = np.clip(np.searchsorted(dk_s, mok), 0, len(dk_s) - 1)
        hit = dk_s[pos] == mok
        return pa.table(
            {
                "k": pa.array(dck[pos][hit]),
                "dt": pa.array(ddt[pos][hit]),
                "o": pa.array(mok[hit]),
                "b": pa.array(mbr[hit]),
            }
        )

    hop2 = hash_partition_merge(
        hop1.map_batches(hop1_as_fact, batch_format="pyarrow").union(
            orders.map_batches(order_dim, batch_format="pyarrow")
        ),
        "k",
        fold2,
        k=_rel_k(sf_dir, "orders"),
    )

    # ---- hop 3: custkey — first vs last modal brand, per segment ----
    def cust_dim(b: pa.Table) -> pa.Table:
        sg = (
            pc.cast(pc.index_in(b["c_mktsegment"], value_set=segs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        neg = np.full(b.num_rows, -1, np.int64)
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "dt": pa.array(neg),
                "o": pa.array(neg),
                "b": pa.array(sg.astype(np.int64)),
            }
        )

    def fold3(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "seg": pa.array([], pa.int64()),
                "nc": pa.array([], pa.int64()),
                "nl": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        dtc = t["dt"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = dtc < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fdt = f["dt"].combine_chunks().to_numpy(zero_copy_only=False)
        fo = f["o"].combine_chunks().to_numpy(zero_copy_only=False)
        fb = f["b"].combine_chunks().to_numpy(zero_copy_only=False)
        o2 = np.lexsort((fo, fdt, fk))
        k2, b2 = fk[o2], fb[o2]
        head = np.empty(len(o2), dtype=bool)
        head[0] = True
        head[1:] = k2[1:] != k2[:-1]
        starts = np.flatnonzero(head)
        lasts = np.append(starts[1:], len(o2)) - 1
        n_ord = np.diff(np.append(starts, len(o2)))
        elig = n_ord >= 2
        ck = k2[starts][elig]
        loyal = (b2[starts] == b2[lasts])[elig]
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dsg = d["b"].combine_chunks().to_numpy(zero_copy_only=False)
        o3 = np.argsort(dk, kind="stable")
        dk_s, dsg_s = dk[o3], dsg[o3]
        pos = np.clip(np.searchsorted(dk_s, ck), 0, len(dk_s) - 1)
        hit = dk_s[pos] == ck
        seg = dsg_s[pos][hit]
        nc = np.bincount(seg, minlength=nsg)
        nl = np.bincount(seg[loyal[hit]], minlength=nsg)
        live = np.flatnonzero(nc)
        return pa.table(
            {
                "seg": pa.array(live.astype(np.int64)),
                "nc": pa.array(nc[live].astype(np.int64)),
                "nl": pa.array(nl[live].astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nc = np.zeros(nsg, np.int64)
        nl = np.zeros(nsg, np.int64)
        if t.num_rows:
            sg = t["seg"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nc, sg,
                t["nc"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                nl, sg,
                t["nl"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(nc)
        return pa.table(
            {
                "c_mktsegment": pc.take(segs, pa.array(live)),
                "n_customers": pa.array(nc[live]),
                "n_loyal": pa.array(nl[live]),
                "loyal_permille": pa.array(
                    1000 * nl[live] // np.maximum(nc[live], 1)
                ),
            }
        )

    cells = hash_partition_merge(
        hop2.union(cust.map_batches(cust_dim, batch_format="pyarrow")),
        "k",
        fold3,
        k=_rel_k(sf_dir, "orders"),
    )
    return hash_partition_merge(cells, "seg", merge, k=1)


def discount_discipline(sf_dir: str) -> Dataset:
    """R127: discount discipline per part type — per p_type: parts with
    ≥ 2 lineitem lines, parts among them whose lines carry ≥ 2 DISTINCT
    discount cents (floor(100·l_discount), the §2.3b cent convention),
    the variable permille, and the total lines — is discounting a FIXED
    POLICY per part or a per-deal negotiation, the governance read none
    of the discount boards carry (R60 ladders the corpus's rungs, R78
    crosses discount with QUANTITY, R31 prices the margin, R79 couples
    discount with RETURNS; R127 holds the PART fixed and asks whether
    the same SKU trades at one discount or many — a high variable share
    means the ladder is negotiated per order and per-SKU margin
    forecasts are noise).  One row per p_type with ≥ 1 eligible part;
    exact int64 (cent-floor + per-part count/count-DISTINCT + HAVING +
    permille oracle).

    Scale shape — ONE partkey co-partition, both sides pre-reduced
    (parts GROW with the corpus: the type travels by co-partition,
    only the fixed ~150-value type LIST broadcasts): lineitem batches
    collapse to distinct (partkey, cent, n) cells with one packed
    np.unique; the partkey-hash fold re-combines cells, counts each
    part's lines and distinct cents off one sorted boundary pass,
    attaches the type rank by searchsorted, and collapses IN PLACE to
    a ≤ |types| grid; k=1 densifying merge."""
    types = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/part.parquet", columns=["p_type"]
            ).unique("p_type")
        ),
        pa.string(),
    )
    nty = len(types)

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_type"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        ty = (
            pc.cast(pc.index_in(b["p_type"], value_set=types), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "dc": pa.array(np.full(b.num_rows, -1, np.int64)),
                "ty": pa.array(ty.astype(np.int64)),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        pk = pc.cast(b["l_partkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dc = np.floor(
            100.0
            * b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        packed, cnt = np.unique(pk * 101 + dc, return_counts=True)
        return pa.table(
            {
                "k": pa.array(packed // 101),
                "dc": pa.array(packed % 101),
                "ty": pa.array(np.full(len(packed), -1, np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "ty": pa.array([], pa.int64()),
                "np_": pa.array([], pa.int64()),
                "nv": pa.array([], pa.int64()),
                "nl": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        tyc = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = tyc >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fdc = f["dc"].combine_chunks().to_numpy(zero_copy_only=False)
        fn = f["n"].combine_chunks().to_numpy(zero_copy_only=False)
        # combine (part, cent) cells across source batches
        packed, inv = np.unique(fk * 101 + fdc, return_inverse=True)
        nn = np.zeros(len(packed), np.int64)
        np.add.at(nn, inv, fn)
        pk2 = packed // 101
        head = np.empty(len(packed), dtype=bool)
        head[0] = True
        head[1:] = pk2[1:] != pk2[:-1]
        starts = np.flatnonzero(head)
        n_disc = np.diff(starts, append=len(packed))
        n_lines = np.add.reduceat(nn, starts)
        pk_u = pk2[starts]
        elig = n_lines >= 2
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dty = tyc[is_dim]
        o = np.argsort(dk, kind="stable")
        dk_s, dty_s = dk[o], dty[o]
        pos = np.clip(np.searchsorted(dk_s, pk_u), 0, len(dk_s) - 1)
        hit = (dk_s[pos] == pk_u) & elig
        ty2 = dty_s[pos][hit]
        var = (n_disc >= 2)[hit]
        g_np = np.bincount(ty2, minlength=nty)
        g_nv = np.bincount(ty2[var], minlength=nty)
        g_nl = np.bincount(ty2, weights=n_lines[hit], minlength=nty).astype(
            np.int64
        )
        live = np.flatnonzero(g_np)
        return pa.table(
            {
                "ty": pa.array(live.astype(np.int64)),
                "np_": pa.array(g_np[live].astype(np.int64)),
                "nv": pa.array(g_nv[live].astype(np.int64)),
                "nl": pa.array(g_nl[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        g_np = np.zeros(nty, np.int64)
        g_nv = np.zeros(nty, np.int64)
        g_nl = np.zeros(nty, np.int64)
        if t.num_rows:
            ty = t["ty"].combine_chunks().to_numpy(zero_copy_only=False)
            for grid, col in ((g_np, "np_"), (g_nv, "nv"), (g_nl, "nl")):
                np.add.at(
                    grid, ty,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        live = np.flatnonzero(g_np)
        return pa.table(
            {
                "p_type": pc.take(types, pa.array(live)),
                "n_parts": pa.array(g_np[live]),
                "n_variable": pa.array(g_nv[live]),
                "variable_permille": pa.array(
                    1000 * g_nv[live] // np.maximum(g_np[live], 1)
                ),
                "n_lines": pa.array(g_nl[live]),
            }
        )

    cells = hash_partition_merge(
        lines.map_batches(fact_partial, batch_format="pyarrow").union(
            part.map_batches(dim_partial, batch_format="pyarrow")
        ),
        "k",
        fold,
        k=_rel_k(sf_dir, "lineitem"),
    )
    return hash_partition_merge(cells, "ty", merge, k=1)


def return_by_size(sf_dir: str) -> Dataset:
    """R128: returns by quantity band — per floor(l_quantity)//10 band:
    lines, RETURNED lines (l_returnflag = 'R'), the returned permille,
    and the floored discounted revenue of the returned lines — do big
    lots come back more than single units, the size dimension none of
    the returns boards carry (R53 rates returns per BRAND, R79 couples
    them with DISCOUNT, R86 with SEASON, R64 names returned CUSTOMERS;
    R128 reads the logistics axis: a permille rising with band means
    bulk handling damages goods or bulk buyers over-order — either way
    reverse-logistics cost scales superlinearly with lot size).  One
    row per OCCUPIED band; exact int64 (integer-divide band +
    CASE-count + floored discounted revenue oracle; money floors per
    line, the §2.3b convention).

    Scale shape — ZERO-join scan-reduce, the R1 shape: each lineitem
    batch collapses to ≤ bands cell partials with one packed np.unique
    (quantity bands are single digits); the k=1 merge folds
    O(batches × bands) rows.  Nothing broadcasts, nothing corpus-sized
    moves."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_returnflag", "l_extendedprice",
                 "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        q = np.floor(
            b["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        band = q // 10
        ret = pc.equal(b["l_returnflag"], "R").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        ep = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dc = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ep * (1.0 - dc)).astype(np.int64)
        ub, inv = np.unique(band, return_inverse=True)
        n = np.bincount(inv)
        nr = np.bincount(inv[ret], minlength=len(ub))
        rrev = np.bincount(
            inv[ret], weights=rev[ret], minlength=len(ub)
        ).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(ub),
                "n": pa.array(n.astype(np.int64)),
                "nr": pa.array(nr.astype(np.int64)),
                "rrev": pa.array(rrev),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "n_returned": pa.array([], pa.int64()),
                    "returned_permille": pa.array([], pa.int64()),
                    "returned_revenue": pa.array([], pa.int64()),
                }
            )
        band = t["band"].combine_chunks().to_numpy(zero_copy_only=False)
        ub, inv = np.unique(band, return_inverse=True)
        n = np.zeros(len(ub), np.int64)
        nr = np.zeros(len(ub), np.int64)
        rrev = np.zeros(len(ub), np.int64)
        for acc, col in ((n, "n"), (nr, "nr"), (rrev, "rrev")):
            np.add.at(
                acc, inv,
                t[col].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "band": pa.array(ub),
                "n_lines": pa.array(n),
                "n_returned": pa.array(nr),
                "returned_permille": pa.array(1000 * nr // np.maximum(n, 1)),
                "returned_revenue": pa.array(rrev),
            }
        )

    partials = lines.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "band", merge, k=1)


def size_quantity_coupling(sf_dir: str) -> Dataset:
    """R129: part-size × lot-size coupling — per p_size: shipped parts,
    lines, and the exact integer sufficient statistics (Σq, Σq²) of
    q = floor(l_quantity) — do SMALL parts move in BIG lots, the
    physical-handling read none of the size or quantity boards carry
    (R66 bands the catalog by size, R72 spectra quantity corpus-wide,
    R123 couples quantity with MONEY per type; R129 couples the part's
    PHYSICAL size with its lot size: mean and variance derive off-line
    to any precision, the R44 discipline — a negative size-lot trend is
    the palletization signal a warehouse planner bins picking lanes
    by).  One row per p_size with ≥ 1 shipped line; exact int64
    (partkey join + SUM/SUM-of-squares oracle).

    Scale shape — R127's partkey co-partition verbatim with a moment
    payload (parts GROW with the corpus: size travels by co-partition;
    nothing broadcasts — p_size is already an integer): lineitem
    batches pre-reduce to per-partkey (n, Σq, Σq²) partials (squares
    formed per LINE then summed — associative); the partkey-hash fold
    attaches sizes by searchsorted, counts distinct shipped parts, and
    collapses IN PLACE to a ≤ 50-row size grid; k=1 densifying merge."""
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_size"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    NSZ = 64  # p_size is 1..50 in the reference generator; headroom

    def dim_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b["p_partkey"], pa.int64()),
                "sz": pc.cast(b["p_size"], pa.int64()),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
                "sq": pa.array(np.zeros(b.num_rows, np.int64)),
                "sq2": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        q = np.floor(
            b["l_quantity"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["l_partkey"], pa.int64()),
                "n": pa.array(np.ones(len(q), np.int64)),
                "sq": pa.array(q),
                "sq2": pa.array(q * q),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate(
            [("n", "sum"), ("sq", "sum"), ("sq2", "sum")]
        )
        g = g.rename_columns(["k", "n", "sq", "sq2"])
        return g.append_column(
            "sz", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "sz", "n", "sq", "sq2"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "sz": pa.array([], pa.int64()),
                "np_": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sq": pa.array([], pa.int64()),
                "sq2": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        szc = t["sz"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = szc >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fg = f.group_by("k", use_threads=False).aggregate(
            [("n", "sum"), ("sq", "sum"), ("sq2", "sum")]
        )
        fg = fg.rename_columns(["k", "n", "sq", "sq2"])
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dsz = szc[is_dim]
        o = np.argsort(dk, kind="stable")
        dk_s, dsz_s = dk[o], dsz[o]
        fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        sz = dsz_s[pos][hit]
        g_np = np.bincount(sz, minlength=NSZ)
        g_n = np.zeros(NSZ, np.int64)
        g_sq = np.zeros(NSZ, np.int64)
        g_sq2 = np.zeros(NSZ, np.int64)
        for acc, col in ((g_n, "n"), (g_sq, "sq"), (g_sq2, "sq2")):
            np.add.at(
                acc, sz,
                fg[col].combine_chunks().to_numpy(zero_copy_only=False)[hit],
            )
        live = np.flatnonzero(g_np)
        return pa.table(
            {
                "sz": pa.array(live.astype(np.int64)),
                "np_": pa.array(g_np[live].astype(np.int64)),
                "n": pa.array(g_n[live]),
                "sq": pa.array(g_sq[live]),
                "sq2": pa.array(g_sq2[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        g_np = np.zeros(NSZ, np.int64)
        g_n = np.zeros(NSZ, np.int64)
        g_sq = np.zeros(NSZ, np.int64)
        g_sq2 = np.zeros(NSZ, np.int64)
        if t.num_rows:
            sz = t["sz"].combine_chunks().to_numpy(zero_copy_only=False)
            for acc, col in (
                (g_np, "np_"), (g_n, "n"), (g_sq, "sq"), (g_sq2, "sq2")
            ):
                np.add.at(
                    acc, sz,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        live = np.flatnonzero(g_np)
        return pa.table(
            {
                "p_size": pa.array(live.astype(np.int64)),
                "n_parts": pa.array(g_np[live]),
                "n_lines": pa.array(g_n[live]),
                "sum_qty": pa.array(g_sq[live]),
                "sum_qty2": pa.array(g_sq2[live]),
            }
        )

    cells = hash_partition_merge(
        lines.map_batches(fact_partial, batch_format="pyarrow").union(
            part.map_batches(dim_partial, batch_format="pyarrow")
        ),
        "k",
        fold,
        k=_rel_k(sf_dir, "lineitem"),
    )
    return hash_partition_merge(cells, "sz", merge, k=1)


def weekday_shift_matrix(sf_dir: str) -> Dataset:
    """R130: order-weekday × ship-weekday matrix — per (dayofweek of
    o_orderdate, dayofweek of l_shipdate), DuckDB's Sunday=0 convention:
    lines and the exact floor-day latency total — the WEEKLY OPERATING
    CYCLE read none of the calendar boards carry (R102 profiles order
    weekdays alone, R67 ship day-of-MONTH, R20/R87 latency magnitudes;
    R130 crosses the two clocks: a strong diagonal means same-weekday
    fulfillment — a weekly batch cycle; a Friday→Monday ridge is the
    weekend hole; mean latency per cell derives off-line and separates
    "slow because queued over a weekend" from "slow everywhere").
    One row per OCCUPIED cell (≤ 49); exact int64 (dayofweek + floor-day
    difference + two-key GROUP BY oracle).

    Scale shape — ONE orderkey co-partition, both sides pre-reduced
    (orders GROW with the corpus — the order date travels by
    co-partition, nothing broadcasts): lineitem batches collapse to
    (orderkey, ship-day, n) cells with one packed np.unique; the
    orderkey-hash fold attaches each order's date by searchsorted,
    derives both weekdays with one modular shift ((day + 4) % 7 —
    the epoch was a Thursday), and collapses IN PLACE to a ≤ 49-cell
    grid; k=1 densifying merge."""
    DAY_US = 86_400_000_000

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "d": pa.array(od, pa.int64()),
                "n": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        sd = (
            b["l_shipdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        ok = pc.cast(b["l_orderkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        base = int(sd.min()) if len(sd) else 0
        packed, cnt = np.unique(ok * (1 << 20) + (sd - base), return_counts=True)
        return pa.table(
            {
                "k": pa.array(packed >> 20),
                "d": pa.array((packed & ((1 << 20) - 1)) + base, pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sd": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        nc = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = nc < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dd = d["d"].combine_chunks().to_numpy(zero_copy_only=False)
        o = np.argsort(dk, kind="stable")
        dk_s, dd_s = dk[o], dd[o]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fd = f["d"].combine_chunks().to_numpy(zero_copy_only=False)
        fn = nc[~is_dim]
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        od = dd_s[pos][hit]
        sd_ = fd[hit]
        n = fn[hit]
        cell = ((od + 4) % 7) * 7 + (sd_ + 4) % 7
        days = sd_ - od
        g_n = np.zeros(49, np.int64)
        g_d = np.zeros(49, np.int64)
        np.add.at(g_n, cell, n)
        np.add.at(g_d, cell, days * n)
        live = np.flatnonzero(g_n)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "n": pa.array(g_n[live]),
                "sd": pa.array(g_d[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        g_n = np.zeros(49, np.int64)
        g_d = np.zeros(49, np.int64)
        if t.num_rows:
            cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                g_n, cell,
                t["n"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                g_d, cell,
                t["sd"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(g_n)
        return pa.table(
            {
                "order_dow": pa.array((live // 7).astype(np.int64)),
                "ship_dow": pa.array((live % 7).astype(np.int64)),
                "n_lines": pa.array(g_n[live]),
                "sum_days": pa.array(g_d[live]),
            }
        )

    cells = hash_partition_merge(
        lines.map_batches(fact_partial, batch_format="pyarrow").union(
            orders.map_batches(dim_partial, batch_format="pyarrow")
        ),
        "k",
        fold,
        k=_rel_k(sf_dir, "lineitem"),
    )
    return hash_partition_merge(cells, "cell", merge, k=1)


def fragmentation_latency(sf_dir: str) -> Dataset:
    """R131: fragmentation-latency coupling — per distinct-supplier count
    k of an order: orders sourced from exactly k suppliers, their
    lines, and the exact floor-day total of each order's intra-order
    ship SPREAD (max shipdate − min shipdate) — does multi-sourcing
    stretch fulfilment, the cross R69 and R57 each hold one axis of
    (R69 histograms fragmentation with REVENUE, R57 quantiles spread
    per PRIORITY; R131 couples them: mean spread per k derives
    off-line, and a spread that grows with k prices the consolidation
    R69's board only counts — the one-slow-supplier tail R61 blames,
    aggregated to a policy number).  One row per occurring k; exact
    int64 (per-order count-DISTINCT + max/min shipdate + floor-day
    difference oracle).

    Scale shape — ONE orderkey hash exchange over a THREE-column slice
    (orderkey, suppkey, ship-day), no dimension side at all: lineitem
    batches pre-reduce to distinct (orderkey, suppkey) cells carrying
    per-cell line counts and min/max ship-days (all associative); the
    orderkey fold re-combines cells, counts suppliers and folds the
    spread off one sorted boundary pass, and collapses IN PLACE to a
    ≤ 64-row k grid; k=1 densifying merge."""
    DAY_US = 86_400_000_000
    NK = 64

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ok = pc.cast(b["l_orderkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        sk = pc.cast(b["l_suppkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        sd = (
            b["l_shipdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        t = pa.table(
            {
                "k": pa.array(ok),
                "s": pa.array(sk),
                "n": pa.array(np.ones(len(ok), np.int64)),
                "mn": pa.array(sd, pa.int64()),
                "mx": pa.array(sd, pa.int64()),
            }
        )
        g = t.group_by(["k", "s"], use_threads=False).aggregate(
            [("n", "sum"), ("mn", "min"), ("mx", "max")]
        )
        return g.rename_columns(["k", "s", "n", "mn", "mx"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "ks": pa.array([], pa.int64()),
                "no": pa.array([], pa.int64()),
                "nl": pa.array([], pa.int64()),
                "sp": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        g = t.group_by(["k", "s"], use_threads=False).aggregate(
            [("n", "sum"), ("mn", "min"), ("mx", "max")]
        )
        g = g.rename_columns(["k", "s", "n", "mn", "mx"])
        ok = g["k"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ok, kind="stable")
        ok_s = ok[order]
        n = g["n"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        mn = g["mn"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        mx = g["mx"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        head = np.empty(len(ok_s), dtype=bool)
        head[0] = True
        head[1:] = ok_s[1:] != ok_s[:-1]
        starts = np.flatnonzero(head)
        ksup = np.diff(starts, append=len(ok_s))
        nl = np.add.reduceat(n, starts)
        spread = np.maximum.reduceat(mx, starts) - np.minimum.reduceat(
            mn, starts
        )
        kk = np.minimum(ksup, NK - 1)
        g_no = np.zeros(NK, np.int64)
        g_nl = np.zeros(NK, np.int64)
        g_sp = np.zeros(NK, np.int64)
        np.add.at(g_no, kk, 1)
        np.add.at(g_nl, kk, nl)
        np.add.at(g_sp, kk, spread)
        live = np.flatnonzero(g_no)
        return pa.table(
            {
                "ks": pa.array(live.astype(np.int64)),
                "no": pa.array(g_no[live]),
                "nl": pa.array(g_nl[live]),
                "sp": pa.array(g_sp[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        g_no = np.zeros(NK, np.int64)
        g_nl = np.zeros(NK, np.int64)
        g_sp = np.zeros(NK, np.int64)
        if t.num_rows:
            ks = t["ks"].combine_chunks().to_numpy(zero_copy_only=False)
            for acc, col in ((g_no, "no"), (g_nl, "nl"), (g_sp, "sp")):
                np.add.at(
                    acc, ks,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        live = np.flatnonzero(g_no)
        return pa.table(
            {
                "n_suppliers": pa.array(live.astype(np.int64)),
                "n_orders": pa.array(g_no[live]),
                "n_lines": pa.array(g_nl[live]),
                "sum_spread_days": pa.array(g_sp[live]),
            }
        )

    partials = lines.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials, "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "ks", merge, k=1)


def return_by_position(sf_dir: str) -> Dataset:
    """R132: returns by line position — per l_linenumber: lines, RETURNED
    lines (l_returnflag = 'R'), the returned permille, and the floored
    discounted revenue of the returned lines — are the lines APPENDED
    LAST to an order the ones that come back, the buyer's-remorse
    gradient none of the returns or position boards carry (R27 profiles
    position VOLUME, R97 audits position coherence, R128 crosses
    returns with LOT SIZE; R132 crosses them with ORDER POSITION: a
    permille rising with linenumber means the marginal add-on item is
    the marginal regret — checkout upsells, while a flat profile clears
    the merchandising hypothesis in one scan).  One row per occurring
    linenumber; exact int64 (CASE-count + permille + floored revenue
    oracle; money floors per line, the §2.3b convention).

    Scale shape — ZERO-join scan-reduce (R1 shape): each lineitem batch
    collapses to ≤ max-linenumber cells with one packed np.unique; the
    k=1 merge folds O(batches × positions) rows."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_linenumber", "l_returnflag", "l_extendedprice",
                 "l_discount"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ln = pc.cast(b["l_linenumber"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        ret = pc.equal(b["l_returnflag"], "R").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        ep = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dc = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        rev = np.floor(ep * (1.0 - dc)).astype(np.int64)
        ul, inv = np.unique(ln, return_inverse=True)
        n = np.bincount(inv)
        nr = np.bincount(inv[ret], minlength=len(ul))
        rrev = np.bincount(
            inv[ret], weights=rev[ret], minlength=len(ul)
        ).astype(np.int64)
        return pa.table(
            {
                "pos": pa.array(ul),
                "n": pa.array(n.astype(np.int64)),
                "nr": pa.array(nr.astype(np.int64)),
                "rrev": pa.array(rrev),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "l_linenumber": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "n_returned": pa.array([], pa.int64()),
                    "returned_permille": pa.array([], pa.int64()),
                    "returned_revenue": pa.array([], pa.int64()),
                }
            )
        pos = t["pos"].combine_chunks().to_numpy(zero_copy_only=False)
        up, inv = np.unique(pos, return_inverse=True)
        n = np.zeros(len(up), np.int64)
        nr = np.zeros(len(up), np.int64)
        rrev = np.zeros(len(up), np.int64)
        for acc, col in ((n, "n"), (nr, "nr"), (rrev, "rrev")):
            np.add.at(
                acc, inv,
                t[col].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "l_linenumber": pa.array(up),
                "n_lines": pa.array(n),
                "n_returned": pa.array(nr),
                "returned_permille": pa.array(1000 * nr // np.maximum(n, 1)),
                "returned_revenue": pa.array(rrev),
            }
        )

    partials = lines.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "pos", merge, k=1)


def intra_order_redundancy(sf_dir: str) -> Dataset:
    """R133: intra-order redundancy audit — one corpus row: orders with
    ≥ 1 line, orders containing a REPEATED part (the same partkey on
    ≥ 2 lines), orders where a repeated part ships from ≥ 2 DISTINCT
    suppliers (true dual-sourcing inside one order), total lines
    involved in repeats, and the dual-sourcing permille over repeat
    orders — basket pathology vs deliberate redundancy, the intra-order
    read none of the order-shape boards carry (R69 counts suppliers per
    ORDER, R35 basket depth, R97 position coherence; R133 looks at the
    PART level inside the basket: a repeated part on one supplier is a
    split line — quantity-cap or pricing-tier artifact; the same part
    from two suppliers is deliberate hedging, and the ratio separates
    ERP noise from procurement policy).  Exactly one row ALWAYS; exact
    int64 (per-(order, part) count/count-DISTINCT + HAVING + EXISTS
    aggregation oracle).

    Scale shape — ONE orderkey hash exchange over (orderkey, partkey,
    suppkey): batches pre-reduce to distinct (orderkey, partkey,
    suppkey, n) cells; each order's partition settles repeats and
    supplier multiplicity with one sorted boundary pass and collapses
    to FIVE integers; the k=1 merge sums them."""
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "p": pc.cast(b["l_partkey"], pa.int64()),
                "s": pc.cast(b["l_suppkey"], pa.int64()),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["k", "p", "s"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["k", "p", "s", "n"])

    def fold(t: pa.Table) -> pa.Table:
        cols = ("no", "nrep", "ndual", "nl_rep")
        if t.num_rows == 0:
            return pa.table(
                {"g": pa.array([], pa.int64())}
                | {c: pa.array([], pa.int64()) for c in cols}
            )
        g = t.group_by(["k", "p", "s"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["k", "p", "s", "n"])
        ok = g["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pp = g["p"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((pp, ok))
        k2, p2, n2 = ok[order], pp[order], nn[order]
        # (order, part) groups: suppliers per pair = group size,
        # lines per pair = sum n
        pair_head = np.empty(len(k2), dtype=bool)
        pair_head[0] = True
        pair_head[1:] = (k2[1:] != k2[:-1]) | (p2[1:] != p2[:-1])
        pstarts = np.flatnonzero(pair_head)
        n_sup = np.diff(pstarts, append=len(k2))
        n_lines_pair = np.add.reduceat(n2, pstarts)
        pair_ok = k2[pstarts]
        rep = n_lines_pair >= 2
        dual = n_sup >= 2
        # per order: any repeated pair / any dual pair
        ohead = np.empty(len(pair_ok), dtype=bool)
        ohead[0] = True
        ohead[1:] = pair_ok[1:] != pair_ok[:-1]
        ostarts = np.flatnonzero(ohead)
        any_rep = np.maximum.reduceat(rep.astype(np.int64), ostarts)
        any_dual = np.maximum.reduceat(dual.astype(np.int64), ostarts)
        no = len(ostarts)
        nrep = int(any_rep.sum())
        ndual = int(any_dual.sum())
        nl_rep = int(n_lines_pair[rep].sum())
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "no": pa.array([no], pa.int64()),
                "nrep": pa.array([nrep], pa.int64()),
                "ndual": pa.array([ndual], pa.int64()),
                "nl_rep": pa.array([nl_rep], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        tot = {c: 0 for c in ("no", "nrep", "ndual", "nl_rep")}
        if t.num_rows:
            for c in tot:
                tot[c] = int(
                    t[c].combine_chunks().to_numpy(zero_copy_only=False).sum()
                )
        return pa.table(
            {
                "n_orders": pa.array([tot["no"]], pa.int64()),
                "n_repeat_part_orders": pa.array([tot["nrep"]], pa.int64()),
                "n_dual_source_orders": pa.array([tot["ndual"]], pa.int64()),
                "n_repeat_lines": pa.array([tot["nl_rep"]], pa.int64()),
                "dual_permille": pa.array(
                    [1000 * tot["ndual"] // max(tot["nrep"], 1)], pa.int64()
                ),
            }
        )

    partials = lines.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials, "k", fold, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(cells, "g", merge, k=1)


def price_points(sf_dir: str) -> Dataset:
    """R134: price-point architecture per brand — per p_brand: catalog
    parts, DISTINCT retail price points (floor-cent, the §2.3b cent
    convention), parts SHARING a price point with another part of the
    brand (price collisions), and the collision permille — is the
    brand priced on a deliberate grid or continuously, the pricing
    ARCHITECTURE read none of the price boards carry (R56 spreads unit
    price per part, R93 audits list-vs-realized adherence, R117 counts
    ending digits; R134 counts the GRID itself: a luxury brand shows
    few points and heavy collisions — tiering; commodity catalogs show
    points ≈ parts — cost-plus continuous pricing; the number prices a
    price-grid migration).  One row per brand ALWAYS; exact int64
    (cent-floor + per-(brand, cent) count + collision aggregation
    oracle).

    Scale shape — ONE narrow hash exchange of PRE-REDUCED (brand-rank,
    cent, n) cells keyed by CENT (collisions settle where the cent's
    cells co-locate; the ~25-value brand list broadcasts, parts never
    move twice): batches collapse with one packed np.unique; the cent
    fold re-combines cells and emits per-brand (points, parts,
    collision-parts) partials; k=1 densifying merge."""
    brands = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/part.parquet", columns=["p_brand"]
            ).unique("p_brand")
        ),
        pa.string(),
    )
    nbr = len(brands)

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_brand", "p_retailprice"],
        override_num_blocks=_rel_k(sf_dir, "part"),
    )

    def partial(b: pa.Table) -> pa.Table:
        br = (
            pc.cast(pc.index_in(b["p_brand"], value_set=brands), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        cent = np.floor(
            100.0
            * b["p_retailprice"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        ).astype(np.int64)
        packed, cnt = np.unique(cent * nbr + br, return_counts=True)
        return pa.table(
            {
                "cent": pa.array(packed // nbr),
                "br": pa.array(packed % nbr),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "br": pa.array([], pa.int64()),
                    "np_": pa.array([], pa.int64()),
                    "pts": pa.array([], pa.int64()),
                    "coll": pa.array([], pa.int64()),
                }
            )
        cent = t["cent"].combine_chunks().to_numpy(zero_copy_only=False)
        br = t["br"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        packed, inv = np.unique(cent * nbr + br, return_inverse=True)
        n = np.zeros(len(packed), np.int64)
        np.add.at(n, inv, nn)
        bru = packed % nbr
        g_parts = np.bincount(bru, weights=n, minlength=nbr).astype(np.int64)
        g_pts = np.bincount(bru, minlength=nbr)
        coll = n >= 2
        g_coll = np.bincount(
            bru[coll], weights=n[coll], minlength=nbr
        ).astype(np.int64)
        live = np.flatnonzero(g_parts)
        return pa.table(
            {
                "br": pa.array(live.astype(np.int64)),
                "np_": pa.array(g_parts[live]),
                "pts": pa.array(g_pts[live].astype(np.int64)),
                "coll": pa.array(g_coll[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        g_parts = np.zeros(nbr, np.int64)
        g_pts = np.zeros(nbr, np.int64)
        g_coll = np.zeros(nbr, np.int64)
        if t.num_rows:
            br = t["br"].combine_chunks().to_numpy(zero_copy_only=False)
            for acc, col in (
                (g_parts, "np_"), (g_pts, "pts"), (g_coll, "coll")
            ):
                np.add.at(
                    acc, br,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "p_brand": brands,
                "n_parts": pa.array(g_parts),
                "n_price_points": pa.array(g_pts),
                "n_collision_parts": pa.array(g_coll),
                "collision_permille": pa.array(
                    1000 * g_coll // np.maximum(g_parts, 1)
                ),
            }
        )

    partials = part.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials, "cent", fold, k=_rel_k(sf_dir, "part")
    )
    return hash_partition_merge(cells, "br", merge, k=1)


def part_reach(sf_dir: str) -> Dataset:
    """R135: part demand-reach bands — per bit-length band of each
    shipped part's DISTINCT-CUSTOMER count (length(bin(x)), band 1 =
    single-customer parts): parts in the band and their total lines —
    how BROADLY demand for a part spreads, the customer-axis breadth
    none of the part boards carry (R52 counts SUPPLIERS per part, R107
    scores supplier dependence, R30 ranks parts by VOLUME; R135 asks
    who buys: a band-1-heavy catalog is bespoke/special-order
    inventory whose demand dies with one account — the assortment-risk
    read volume ranks hide, since a top-volume part can still be a
    single-whale part).  One row per occupied band; exact int64
    (two-hop join + per-part count-DISTINCT + length(bin) oracle).

    Scale shape — TWO narrow hash exchanges, both pre-reduced: (1)
    orderkey hop — lineitem batches reduce to (orderkey, partkey, n)
    cells, the co-partitioned orders dim attaches custkey by
    searchsorted, emitting (partkey, custkey, n) cells; (2) partkey
    hop — cells re-combine per (part, customer), each part's distinct
    customers and line total settle off one sorted boundary pass, the
    band is one vectorized frexp bit length, and the partition
    collapses to a ≤ 64-row grid; k=1 densifying merge."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "p": pa.array(np.full(b.num_rows, -1, np.int64)),
                "c": pc.cast(b["o_custkey"], pa.int64()),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "p": pc.cast(b["l_partkey"], pa.int64()),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["k", "p"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["k", "p", "n"])
        return g.append_column(
            "c", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "p", "c", "n"])

    def fold1(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "p": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        pcol = t["p"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = pcol < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dc = d["c"].combine_chunks().to_numpy(zero_copy_only=False)
        o = np.argsort(dk, kind="stable")
        dk_s, dc_s = dk[o], dc[o]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fp = f["p"].combine_chunks().to_numpy(zero_copy_only=False)
        fn = f["n"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        return pa.table(
            {
                "p": pa.array(fp[hit]),
                "c": pa.array(dc_s[pos][hit]),
                "n": pa.array(fn[hit]),
            }
        )

    def fold2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "np_": pa.array([], pa.int64()),
                    "nl": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["p", "c"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["p", "c", "n"])
        pp = g["p"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        o = np.argsort(pp, kind="stable")
        pp_s, nn_s = pp[o], nn[o]
        head = np.empty(len(pp_s), dtype=bool)
        head[0] = True
        head[1:] = pp_s[1:] != pp_s[:-1]
        starts = np.flatnonzero(head)
        ncust = np.diff(starts, append=len(pp_s))
        nl = np.add.reduceat(nn_s, starts)
        band = np.frexp(ncust.astype(np.float64))[1].astype(np.int64)
        grid_p = np.zeros(64, np.int64)
        grid_l = np.zeros(64, np.int64)
        np.add.at(grid_p, np.minimum(band, 63), 1)
        np.add.at(grid_l, np.minimum(band, 63), nl)
        live = np.flatnonzero(grid_p)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "np_": pa.array(grid_p[live]),
                "nl": pa.array(grid_l[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid_p = np.zeros(64, np.int64)
        grid_l = np.zeros(64, np.int64)
        if t.num_rows:
            bb = t["band"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                grid_p, bb,
                t["np_"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                grid_l, bb,
                t["nl"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(grid_p)
        return pa.table(
            {
                "reach_band": pa.array(live.astype(np.int64)),
                "n_parts": pa.array(grid_p[live]),
                "n_lines": pa.array(grid_l[live]),
            }
        )

    cells = hash_partition_merge(
        lines.map_batches(fact_partial, batch_format="pyarrow").union(
            orders.map_batches(dim_partial, batch_format="pyarrow")
        ),
        "k",
        fold1,
        k=_rel_k(sf_dir, "lineitem"),
    )
    banded = hash_partition_merge(
        cells, "p", fold2, k=_rel_k(sf_dir, "lineitem")
    )
    return hash_partition_merge(banded, "band", merge, k=1)


def latency_return_coupling(sf_dir: str) -> Dataset:
    """R136: latency ↔ return coupling — per ship YEAR, split lines by
    returnflag = 'R' vs not: lines and the exact floor-day latency
    totals (Σdays, Σdays² — ship date minus order date) for each class
    — DO SLOW SHIPMENTS COME BACK, the causal-flavored cross R87 and
    the returns boards each hold one axis of (R87 drifts latency over
    years with no outcome, R53/R86/R128/R132 rate returns by
    brand/season/size/position with no latency; R136 conditions the
    latency distribution on the OUTCOME, per year: a persistent
    mean-latency gap between returned and kept lines is the
    logistics-causes-returns evidence, and its TREND says whether the
    problem is getting fixed).  One row per (year, returned) class
    with ≥ 1 line; exact int64 (orderkey join + floor-day difference +
    CASE-split SUM/SUM² oracle).

    Scale shape — R130's orderkey co-partition verbatim with a moment
    payload: lineitem batches pre-reduce to (orderkey, ship-day,
    returned, n) cells; the orderkey fold attaches order dates by
    searchsorted, forms days per CELL (then weights by n — exact,
    deltas are cell-constant), and collapses IN PLACE to a
    ≤ years × 2 grid; k=1 densifying merge."""
    DAY_US = 86_400_000_000

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_returnflag"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "d": pa.array(od, pa.int64()),
                "r": pa.array(np.full(b.num_rows, -1, np.int64)),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        sd = (
            b["l_shipdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        ok = pc.cast(b["l_orderkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        ret = (
            pc.equal(b["l_returnflag"], "R")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        base = int(sd.min()) if len(sd) else 0
        packed, cnt = np.unique(
            (ok * (1 << 21) + (sd - base) * 2 + ret), return_counts=True
        )
        return pa.table(
            {
                "k": pa.array(packed >> 21),
                "d": pa.array(((packed & ((1 << 21) - 1)) >> 1) + base,
                              pa.int64()),
                "r": pa.array(packed & 1),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sd": pa.array([], pa.int64()),
                "sd2": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        rc = t["r"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = rc < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dd = d["d"].combine_chunks().to_numpy(zero_copy_only=False)
        o = np.argsort(dk, kind="stable")
        dk_s, dd_s = dk[o], dd[o]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fd = f["d"].combine_chunks().to_numpy(zero_copy_only=False)
        fr = rc[~is_dim]
        fn = f["n"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        od = dd_s[pos][hit]
        sdy = fd[hit]
        days = sdy - od
        yr = (
            sdy.astype("datetime64[D]")
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        r = fr[hit]
        n = fn[hit]
        key = (yr - 1970) * 2 + r
        W = int(key.max()) + 1 if len(key) else 1
        gn = np.zeros(W, np.int64)
        gd = np.zeros(W, np.int64)
        gd2 = np.zeros(W, np.int64)
        np.add.at(gn, key, n)
        np.add.at(gd, key, days * n)
        np.add.at(gd2, key, days * days * n)
        live = np.flatnonzero(gn)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "n": pa.array(gn[live]),
                "sd": pa.array(gd[live]),
                "sd2": pa.array(gd2[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "ship_year": pa.array([], pa.int64()),
                    "returned": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "sum_days": pa.array([], pa.int64()),
                    "sum_days2": pa.array([], pa.int64()),
                }
            )
        cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        W = int(cell.max()) + 1
        gn = np.zeros(W, np.int64)
        gd = np.zeros(W, np.int64)
        gd2 = np.zeros(W, np.int64)
        for acc, col in ((gn, "n"), (gd, "sd"), (gd2, "sd2")):
            np.add.at(
                acc, cell,
                t[col].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(gn)
        return pa.table(
            {
                "ship_year": pa.array((live // 2 + 1970).astype(np.int64)),
                "returned": pa.array((live % 2).astype(np.int64)),
                "n_lines": pa.array(gn[live]),
                "sum_days": pa.array(gd[live]),
                "sum_days2": pa.array(gd2[live]),
            }
        )

    cells = hash_partition_merge(
        lines.map_batches(fact_partial, batch_format="pyarrow").union(
            orders.map_batches(dim_partial, batch_format="pyarrow")
        ),
        "k",
        fold,
        k=_rel_k(sf_dir, "lineitem"),
    )
    return hash_partition_merge(cells, "cell", merge, k=1)


def month_end_loading(sf_dir: str) -> Dataset:
    """R137: month-end loading trend — per order YEAR: orders, orders
    dated in the LAST THREE calendar days of their month, the
    month-end permille, and the floored value totals of both
    populations — the quota-stuffing detector (R67 profiles ship
    DAY-OF-MONTH shape, R7/R96 seasonality by month; R137 isolates the
    fiscal-pressure signature: a month-end permille well above the
    ~100‰ calendar baseline means orders are being pulled forward to
    make monthly numbers, its value twin says whether the stuffing is
    big-ticket, and the YEAR axis shows whether the incentive design
    changed).  One row per order year ALWAYS; exact int64 (last_day
    calendar predicate + CASE-split counts/sums oracle).

    Scale shape — ZERO-join scan-reduce (R1 shape): the month-end
    predicate is vectorized numpy datetime64 calendar math (day →
    month → next-month-start − 1), each batch collapses to a ≤ years
    grid; the k=1 merge folds O(batches × years) rows."""
    DAY_US = 86_400_000_000

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        ).astype("datetime64[D]")
        rv = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        month = day.astype("datetime64[M]")
        last_day = (month + 1).astype("datetime64[D]") - 1
        is_end = day >= (last_day - 2)
        yr = day.astype("datetime64[Y]").astype(np.int64) + 1970
        yi = yr - yr.min() if len(yr) else yr
        W = int(yi.max()) + 1 if len(yi) else 1
        n = np.bincount(yi, minlength=W)
        ne = np.bincount(yi[is_end], minlength=W)
        v = np.bincount(yi, weights=rv, minlength=W).astype(np.int64)
        ve = np.bincount(yi[is_end], weights=rv[is_end],
                         minlength=W).astype(np.int64)
        base = int(yr.min()) if len(yr) else 0
        live = np.flatnonzero(n)
        return pa.table(
            {
                "yr": pa.array((live + base).astype(np.int64)),
                "n": pa.array(n[live].astype(np.int64)),
                "ne": pa.array(ne[live].astype(np.int64)),
                "v": pa.array(v[live]),
                "ve": pa.array(ve[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "order_year": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                    "n_month_end": pa.array([], pa.int64()),
                    "month_end_permille": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                    "month_end_revenue": pa.array([], pa.int64()),
                }
            )
        yr = t["yr"].combine_chunks().to_numpy(zero_copy_only=False)
        uy, inv = np.unique(yr, return_inverse=True)
        n = np.zeros(len(uy), np.int64)
        ne = np.zeros(len(uy), np.int64)
        v = np.zeros(len(uy), np.int64)
        ve = np.zeros(len(uy), np.int64)
        for acc, col in ((n, "n"), (ne, "ne"), (v, "v"), (ve, "ve")):
            np.add.at(
                acc, inv,
                t[col].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "order_year": pa.array(uy),
                "n_orders": pa.array(n),
                "n_month_end": pa.array(ne),
                "month_end_permille": pa.array(
                    1000 * ne // np.maximum(n, 1)
                ),
                "revenue_floor": pa.array(v),
                "month_end_revenue": pa.array(ve),
            }
        )

    partials = orders.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "yr", merge, k=1)


def span_spend_coupling(sf_dir: str) -> Dataset:
    """R138: tenure-span ↔ spend coupling — per market segment, over
    customers with ≥ 2 orders: n and the exact integer sufficient
    statistics (Σx, Σx², Σy, Σy², Σx·y) with x = the customer's active
    SPAN in floor-days (last order date − first) and y = their floored
    lifetime order value — does LONGEVITY buy revenue, the
    relationship-length read none of the customer boards couple (R85
    autocovaries CONSECUTIVE tickets, R101 couples gap length with the
    NEXT ticket, R11 ranks by total alone; R138 regresses lifetime
    value on lifetime LENGTH: slope ≈ 0 with big Σy spread means value
    is decided at acquisition, not retention — and that inverts the
    retention-spend playbook).  One row per segment with ≥ 1 eligible
    customer; exact int64 (per-customer min/max date + SUM-of-products
    oracle; money floors per order, the §2.3b convention).

    Scale shape — R124's custkey co-partition with a span payload:
    order batches pre-reduce to per-custkey (min-day, max-day, value,
    n) partials (all associative); the custkey fold combines, forms
    x·y per CUSTOMER, attaches the segment by searchsorted, and
    collapses IN PLACE to a ≤ segments moment grid; k=1 densifying
    merge.  Only the ~5-value segment list broadcasts."""
    DAY_US = 86_400_000_000

    segs = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]
            ).unique("c_mktsegment")
        ),
        pa.string(),
    )
    nsg = len(segs)

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        sg = (
            pc.cast(pc.index_in(b["c_mktsegment"], value_set=segs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        z = np.zeros(b.num_rows, np.int64)
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "seg": pa.array(sg.astype(np.int64)),
                "mn": pa.array(z),
                "mx": pa.array(z),
                "v": pa.array(z),
                "n": pa.array(z),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        day = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        rv = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "mn": pa.array(day, pa.int64()),
                "mx": pa.array(day, pa.int64()),
                "v": pa.array(rv),
                "n": pa.array(np.ones(len(rv), np.int64)),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate(
            [("mn", "min"), ("mx", "max"), ("v", "sum"), ("n", "sum")]
        )
        g = g.rename_columns(["k", "mn", "mx", "v", "n"])
        return g.append_column(
            "seg", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "seg", "mn", "mx", "v", "n"])

    def fold(t: pa.Table) -> pa.Table:
        cols = ("n", "sx", "sx2", "sy", "sy2", "sxy")
        empty = pa.table(
            {"seg": pa.array([], pa.int64())}
            | {c: pa.array([], pa.int64()) for c in cols}
        )
        if t.num_rows == 0:
            return empty
        role = t["seg"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fg = f.group_by("k", use_threads=False).aggregate(
            [("mn", "min"), ("mx", "max"), ("v", "sum"), ("n", "sum")]
        )
        fg = fg.rename_columns(["k", "mn", "mx", "v", "n"])
        fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        mn = fg["mn"].combine_chunks().to_numpy(zero_copy_only=False)
        mx = fg["mx"].combine_chunks().to_numpy(zero_copy_only=False)
        v = fg["v"].combine_chunks().to_numpy(zero_copy_only=False)
        n = fg["n"].combine_chunks().to_numpy(zero_copy_only=False)
        elig = n >= 2
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dseg = role[is_dim]
        o = np.argsort(dk, kind="stable")
        dk_s, dseg_s = dk[o], dseg[o]
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = (dk_s[pos] == fk) & elig
        seg = dseg_s[pos][hit]
        x = (mx - mn)[hit]
        y = v[hit]
        grids = {
            "n": np.ones(len(x), np.int64),
            "sx": x,
            "sx2": x * x,
            "sy": y,
            "sy2": y * y,
            "sxy": x * y,
        }
        acc = {c: np.zeros(nsg, np.int64) for c in cols}
        for c in cols:
            np.add.at(acc[c], seg, grids[c])
        live = np.flatnonzero(acc["n"])
        data = {"seg": pa.array(live.astype(np.int64))}
        for c in cols:
            data[c] = pa.array(acc[c][live])
        return pa.table(data)

    def merge(t: pa.Table) -> pa.Table:
        cols = ("n", "sx", "sx2", "sy", "sy2", "sxy")
        acc = {c: np.zeros(nsg, np.int64) for c in cols}
        if t.num_rows:
            seg = t["seg"].combine_chunks().to_numpy(zero_copy_only=False)
            for c in cols:
                np.add.at(
                    acc[c], seg,
                    t[c].combine_chunks().to_numpy(zero_copy_only=False),
                )
        live = np.flatnonzero(acc["n"])
        out = {
            "c_mktsegment": pc.take(segs, pa.array(live)),
            "n_customers": pa.array(acc["n"][live]),
            "sum_span": pa.array(acc["sx"][live]),
            "sum_span2": pa.array(acc["sx2"][live]),
            "sum_value": pa.array(acc["sy"][live]),
            "sum_value2": pa.array(acc["sy2"][live]),
            "sum_span_value": pa.array(acc["sxy"][live]),
        }
        return pa.table(out)

    fact = orders.map_batches(fact_partial, batch_format="pyarrow")
    dim = cust.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "seg", merge, k=1)


def trade_distance_latency(sf_dir: str) -> Dataset:
    """R139: trade-distance latency — classify every lineitem by the
    geographic DISTANCE between its customer and its supplier (0 = same
    nation, 1 = same region different nation, 2 = cross-region) and
    report per class: lines and the exact floor-day latency statistics
    (Σdays, Σdays² of ship − order) — DOES CROSS-REGION SOURCING COST
    DAYS, the logistics question R28's trade-flow matrix and the
    latency boards keep apart (R28 counts who trades with whom, R20/R87
    how long shipping takes; R139 conditions latency on the trade
    DISTANCE: a near-zero day gap between classes means the supply
    chain is distance-blind — inventory is pre-positioned — while a
    steep gradient prices every cross-region line R28 counts).  Exactly
    three-or-fewer rows; exact int64 (three-hop star join + CASE
    distance + CASE-split SUM/SUM² oracle).

    Scale shape — THREE narrow hash exchanges, every hop pre-reduced,
    nothing corpus-sized broadcast (suppliers/customers/orders GROW and
    travel by co-partition; only the 25-row nation → region map ships):
    (1) orderkey hop — lineitem batches reduce to (ok, suppkey,
    ship-day) cells with line counts; the orders dim attaches
    (custkey, order-day); (2) custkey hop — the customer dim attaches
    the customer's nation rank; (3) suppkey hop — the supplier dim
    attaches the supplier's nation, both nations map to regions
    through the broadcast 25-row table, the class and day moments form
    per CELL, and the partition collapses to a ≤ 3-row grid; k=1
    densifying merge."""
    DAY_US = 86_400_000_000

    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas().sort_values("n_nationkey")
    nkeys = nat["n_nationkey"].to_numpy().astype(np.int64)
    nregion = nat["n_regionkey"].to_numpy().astype(np.int64)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "supplier"),
    )

    # ---- hop 1: orderkey ----
    def o_dim(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "sk": pa.array(np.full(b.num_rows, -1, np.int64)),
                "d": pa.array(od, pa.int64()),
                "ck": pc.cast(b["o_custkey"], pa.int64()),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def l_fact(b: pa.Table) -> pa.Table:
        sd = (
            b["l_shipdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "sk": pc.cast(b["l_suppkey"], pa.int64()),
                "d": pa.array(sd, pa.int64()),
                "n": pa.array(np.ones(len(sd), np.int64)),
            }
        )
        g = t.group_by(["k", "sk", "d"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["k", "sk", "d", "n"])
        return g.append_column(
            "ck", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "sk", "d", "ck", "n"])

    def fold1(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.array([], pa.int64()),
                "sk": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sd": pa.array([], pa.int64()),
                "sd2": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        skc = t["sk"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = skc < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dck = d["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        ddt = d["d"].combine_chunks().to_numpy(zero_copy_only=False)
        o = np.argsort(dk, kind="stable")
        dk_s, dck_s, ddt_s = dk[o], dck[o], ddt[o]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fsk = skc[~is_dim]
        fd = f["d"].combine_chunks().to_numpy(zero_copy_only=False)
        fn = f["n"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        days = fd[hit] - ddt_s[pos][hit]
        n = fn[hit]
        # pre-reduce to (custkey, suppkey) moment cells
        ck2 = dck_s[pos][hit]
        sk2 = fsk[hit]
        tt = pa.table(
            {
                "k": pa.array(ck2),
                "sk": pa.array(sk2),
                "n": pa.array(n),
                "sd": pa.array(days * n),
                "sd2": pa.array(days * days * n),
            }
        )
        g = tt.group_by(["k", "sk"], use_threads=False).aggregate(
            [("n", "sum"), ("sd", "sum"), ("sd2", "sum")]
        )
        return g.rename_columns(["k", "sk", "n", "sd", "sd2"])

    hop1 = hash_partition_merge(
        lines.map_batches(l_fact, batch_format="pyarrow").union(
            orders.map_batches(o_dim, batch_format="pyarrow")
        ),
        "k",
        fold1,
        k=_rel_k(sf_dir, "lineitem"),
    )

    # ---- hop 2: custkey ----
    def c_dim(b: pa.Table) -> pa.Table:
        neg = np.full(b.num_rows, -1, np.int64)
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "sk": pa.array(neg),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
                "sd": pc.cast(b["c_nationkey"], pa.int64()),
                "sd2": pa.array(neg),
            }
        )

    def fold2(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.array([], pa.int64()),
                "cn": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sd": pa.array([], pa.int64()),
                "sd2": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        skc = t["sk"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = skc < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dn = d["sd"].combine_chunks().to_numpy(zero_copy_only=False)
        o = np.argsort(dk, kind="stable")
        dk_s, dn_s = dk[o], dn[o]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        f2 = f.filter(pa.array(hit))
        return pa.table(
            {
                "k": f2["sk"],
                "cn": pa.array(dn_s[pos][hit]),
                "n": f2["n"],
                "sd": f2["sd"],
                "sd2": f2["sd2"],
            }
        )

    hop2 = hash_partition_merge(
        hop1.union(cust.map_batches(c_dim, batch_format="pyarrow")),
        "k",
        fold2,
        k=_rel_k(sf_dir, "orders"),
    )

    # ---- hop 3: suppkey ----
    def s_dim(b: pa.Table) -> pa.Table:
        neg = np.full(b.num_rows, -1, np.int64)
        return pa.table(
            {
                "k": pc.cast(b["s_suppkey"], pa.int64()),
                "cn": pa.array(neg),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
                "sd": pc.cast(b["s_nationkey"], pa.int64()),
                "sd2": pa.array(neg),
            }
        )

    def fold3(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cls": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sd": pa.array([], pa.int64()),
                "sd2": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        cnc = t["cn"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = cnc < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dn = d["sd"].combine_chunks().to_numpy(zero_copy_only=False)
        o = np.argsort(dk, kind="stable")
        dk_s, dn_s = dk[o], dn[o]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        sn = dn_s[pos][hit]
        cn = cnc[~is_dim][hit]
        cr = nregion[np.searchsorted(nkeys, cn)]
        sr = nregion[np.searchsorted(nkeys, sn)]
        cls = np.where(cn == sn, 0, np.where(cr == sr, 1, 2))
        n = f["n"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        sd = f["sd"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        sd2 = f["sd2"].combine_chunks().to_numpy(zero_copy_only=False)[hit]
        gn = np.zeros(3, np.int64)
        gd = np.zeros(3, np.int64)
        gd2 = np.zeros(3, np.int64)
        np.add.at(gn, cls, n)
        np.add.at(gd, cls, sd)
        np.add.at(gd2, cls, sd2)
        live = np.flatnonzero(gn)
        return pa.table(
            {
                "cls": pa.array(live.astype(np.int64)),
                "n": pa.array(gn[live]),
                "sd": pa.array(gd[live]),
                "sd2": pa.array(gd2[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        gn = np.zeros(3, np.int64)
        gd = np.zeros(3, np.int64)
        gd2 = np.zeros(3, np.int64)
        if t.num_rows:
            cls = t["cls"].combine_chunks().to_numpy(zero_copy_only=False)
            for acc, col in ((gn, "n"), (gd, "sd"), (gd2, "sd2")):
                np.add.at(
                    acc, cls,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        live = np.flatnonzero(gn)
        return pa.table(
            {
                "trade_distance": pa.array(live.astype(np.int64)),
                "n_lines": pa.array(gn[live]),
                "sum_days": pa.array(gd[live]),
                "sum_days2": pa.array(gd2[live]),
            }
        )

    banded = hash_partition_merge(
        hop2.union(supp.map_batches(s_dim, batch_format="pyarrow")),
        "k",
        fold3,
        k=_rel_k(sf_dir, "orders"),
    )
    return hash_partition_merge(banded, "cls", merge, k=1)


def supplier_spread_bands(sf_dir: str) -> Dataset:
    """R140: supplier latency-spread bands — per supplier with ≥ 2
    lines, compute the RANGE of their floor-day ship latencies (max −
    min of shipdate − orderdate over every line they ever shipped) and
    histogram suppliers per bit-length band of that range (band 0 =
    perfectly consistent — every line took exactly as long): suppliers
    and lines per band — delivery CONSISTENCY as a population read
    (R61 blames the one late supplier per order, R57 spreads within
    one ORDER, R87 drifts the mean over years; R140 asks how the
    supplier base distributes between metronomes and lotteries — the
    procurement-risk histogram an SLA policy is written against).
    One row per occupied band; exact int64 (orderkey join + per-
    supplier max/min latency + HAVING ≥ 2 + length(bin) oracle).

    Scale shape — TWO narrow exchanges, both pre-reduced: (1) orderkey
    hop — lineitem (ok, suppkey, ship-day) cells meet the orders dim,
    emitting per-(supplier) PARTIAL (min-lat, max-lat, n) rows per
    partition; (2) suppkey hop — partials combine with min/max/sum
    scatters, the band is one vectorized frexp on the range, and the
    partition collapses to a ≤ 64-row grid; k=1 densifying merge."""
    DAY_US = 86_400_000_000

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def o_dim(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "sk": pa.array(np.full(b.num_rows, -1, np.int64)),
                "d": pa.array(od, pa.int64()),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def l_fact(b: pa.Table) -> pa.Table:
        sd = (
            b["l_shipdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        t = pa.table(
            {
                "k": pc.cast(b["l_orderkey"], pa.int64()),
                "sk": pc.cast(b["l_suppkey"], pa.int64()),
                "d": pa.array(sd, pa.int64()),
                "n": pa.array(np.ones(len(sd), np.int64)),
            }
        )
        g = t.group_by(["k", "sk", "d"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["k", "sk", "d", "n"])

    def fold1(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.array([], pa.int64()),
                "mn": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        skc = t["sk"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = skc < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dd = d["d"].combine_chunks().to_numpy(zero_copy_only=False)
        o = np.argsort(dk, kind="stable")
        dk_s, dd_s = dk[o], dd[o]
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fsk = skc[~is_dim]
        fd = f["d"].combine_chunks().to_numpy(zero_copy_only=False)
        fn = f["n"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        lat = fd[hit] - dd_s[pos][hit]
        sk2 = fsk[hit]
        n = fn[hit]
        usk, inv = np.unique(sk2, return_inverse=True)
        mn = np.full(len(usk), np.int64(2**62))
        mx = np.full(len(usk), np.int64(-(2**62)))
        np.minimum.at(mn, inv, lat)
        np.maximum.at(mx, inv, lat)
        nn = np.zeros(len(usk), np.int64)
        np.add.at(nn, inv, n)
        return pa.table(
            {
                "k": pa.array(usk),
                "mn": pa.array(mn),
                "mx": pa.array(mx),
                "n": pa.array(nn),
            }
        )

    def fold2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "ns": pa.array([], pa.int64()),
                    "nl": pa.array([], pa.int64()),
                }
            )
        kk = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        mn_c = t["mn"].combine_chunks().to_numpy(zero_copy_only=False)
        mx_c = t["mx"].combine_chunks().to_numpy(zero_copy_only=False)
        nc = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        usk, inv = np.unique(kk, return_inverse=True)
        mn = np.full(len(usk), np.int64(2**62))
        mx = np.full(len(usk), np.int64(-(2**62)))
        nn = np.zeros(len(usk), np.int64)
        np.minimum.at(mn, inv, mn_c)
        np.maximum.at(mx, inv, mx_c)
        np.add.at(nn, inv, nc)
        elig = nn >= 2
        rng = (mx - mn)[elig]
        band = np.where(
            rng == 0, 0,
            np.frexp(rng.astype(np.float64))[1].astype(np.int64),
        )
        grid_s = np.zeros(64, np.int64)
        grid_l = np.zeros(64, np.int64)
        np.add.at(grid_s, np.minimum(band, 63), 1)
        np.add.at(grid_l, np.minimum(band, 63), nn[elig])
        live = np.flatnonzero(grid_s)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "ns": pa.array(grid_s[live]),
                "nl": pa.array(grid_l[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid_s = np.zeros(64, np.int64)
        grid_l = np.zeros(64, np.int64)
        if t.num_rows:
            bb = t["band"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                grid_s, bb,
                t["ns"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                grid_l, bb,
                t["nl"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(grid_s)
        return pa.table(
            {
                "spread_band": pa.array(live.astype(np.int64)),
                "n_suppliers": pa.array(grid_s[live]),
                "n_lines": pa.array(grid_l[live]),
            }
        )

    cells = hash_partition_merge(
        lines.map_batches(l_fact, batch_format="pyarrow").union(
            orders.map_batches(o_dim, batch_format="pyarrow")
        ),
        "k",
        fold1,
        k=_rel_k(sf_dir, "lineitem"),
    )
    banded = hash_partition_merge(
        cells, "k", fold2, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(banded, "band", merge, k=1)


def double_booking(sf_dir: str) -> Dataset:
    """R141: double-booking audit — group orders by FULL BUSINESS
    identity (custkey, order date, floor-cent total price) and report
    one corpus row: orders, suspect groups (multiplicity ≥ 2), orders
    inside them, the doubled permille, and the worst multiplicity —
    the ERP retry/duplicate-submission detector (R90's integrity audit
    checks REFERENCES, E202 runs this test on the EVENT stream; a
    customer 'placing' the same-value order twice on one day under two
    orderkeys is either a real repeat purchase — rare at identical
    cents — or a gateway retry that will double-ship unless caught,
    and the permille bounds the revenue double-count in the R1-family
    boards).  Exactly one row ALWAYS; exact int64 (3-key GROUP BY +
    CASE-sum + max oracle).

    Scale shape — ONE narrow exchange of PRE-REDUCED (custkey, day,
    cent, n) cells (Arrow group_by per batch); the custkey-hash
    partition holds every cell of a group, re-combines cross-batch
    copies, and collapses to FOUR integers; k=1 merge."""
    DAY_US = 86_400_000_000

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        cent = np.floor(
            100.0
            * b["o_totalprice"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        ).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "d": pa.array(day, pa.int64()),
                "c": pa.array(cent),
                "n": pa.array(np.ones(len(day), np.int64)),
            }
        )
        g = t.group_by(["k", "d", "c"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["k", "d", "c", "n"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "no": pa.array([], pa.int64()),
                    "ng": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "mx": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["k", "d", "c"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        n = g["n_sum" if "n_sum" in g.column_names else "n"]
        n = n.combine_chunks().to_numpy(zero_copy_only=False)
        dup = n >= 2
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "no": pa.array([int(n.sum())], pa.int64()),
                "ng": pa.array([int(dup.sum())], pa.int64()),
                "nd": pa.array([int(n[dup].sum())], pa.int64()),
                "mx": pa.array([int(n.max())], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        tot = {c: 0 for c in ("no", "ng", "nd")}
        mx = 0
        if t.num_rows:
            for c in tot:
                tot[c] = int(
                    t[c].combine_chunks().to_numpy(zero_copy_only=False).sum()
                )
            mx = int(
                t["mx"].combine_chunks().to_numpy(zero_copy_only=False).max()
            )
        return pa.table(
            {
                "n_orders": pa.array([tot["no"]], pa.int64()),
                "n_dup_groups": pa.array([tot["ng"]], pa.int64()),
                "n_doubled": pa.array([tot["nd"]], pa.int64()),
                "doubled_permille": pa.array(
                    [1000 * tot["nd"] // max(tot["no"], 1)], pa.int64()
                ),
                "max_multiplicity": pa.array([mx], pa.int64()),
            }
        )

    partials = orders.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials, "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "g", merge, k=1)


def cohort_value(sf_dir: str) -> Dataset:
    """R142: cohort first-year value — per (first-order YEAR, market
    segment): customers ACQUIRED that year (their first order falls in
    it), their lifetime orders, and the exact floored value of the
    orders placed within 365 days of each customer's first — the
    cohort-LTV base table (R48 tracks cohort REPURCHASE rates, R103
    first-order VALUE alone, R114 reactivation; R142 gives the
    first-year revenue per acquisition cohort × segment — the
    numerator of every CAC-payback metric, exact and re-derivable
    instead of a BI export).  One row per occupied (year, segment)
    cell; exact int64 (per-customer min date + 365-day window +
    two-key GROUP BY oracle; money floors per order).

    Scale shape — R124's custkey co-partition: order batches pre-reduce
    per custkey... the 365-day window needs each ORDER's distance to
    the customer's first day, so order cells ship (custkey, day,
    value, n) pre-grouped per (custkey, day); the custkey fold finds
    the first day, sums the windowed value with one vectorized
    compare, attaches the segment by searchsorted, and collapses IN
    PLACE to a ≤ years × segments grid; k=1 densifying merge."""
    DAY_US = 86_400_000_000

    segs = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]
            ).unique("c_mktsegment")
        ),
        pa.string(),
    )
    nsg = len(segs)

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        sg = (
            pc.cast(pc.index_in(b["c_mktsegment"], value_set=segs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        neg = np.full(b.num_rows, -1, np.int64)
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "d": pa.array(neg),
                "v": pa.array(sg.astype(np.int64)),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        day = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        rv = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "d": pa.array(day, pa.int64()),
                "v": pa.array(rv),
                "n": pa.array(np.ones(len(rv), np.int64)),
            }
        )
        g = t.group_by(["k", "d"], use_threads=False).aggregate(
            [("v", "sum"), ("n", "sum")]
        )
        return g.rename_columns(["k", "d", "v", "n"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "nc": pa.array([], pa.int64()),
                "no": pa.array([], pa.int64()),
                "fy": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        dc = t["d"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = dc < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fg = f.group_by(["k", "d"], use_threads=False).aggregate(
            [("v", "sum"), ("n", "sum")]
        )
        fg = fg.rename_columns(["k", "d", "v", "n"])
        fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fd = fg["d"].combine_chunks().to_numpy(zero_copy_only=False)
        fv = fg["v"].combine_chunks().to_numpy(zero_copy_only=False)
        fn = fg["n"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((fd, fk))
        k2, d2, v2, n2 = fk[order], fd[order], fv[order], fn[order]
        head = np.empty(len(k2), dtype=bool)
        head[0] = True
        head[1:] = k2[1:] != k2[:-1]
        sid = np.cumsum(head) - 1
        starts = np.flatnonzero(head)
        first = d2[starts]
        inwin = d2 <= first[sid] + 365
        fy = np.zeros(len(starts), np.int64)
        np.add.at(fy, sid[inwin], v2[inwin])
        no = np.add.reduceat(n2, starts)
        ck = k2[starts]
        yr = (
            first.astype("datetime64[D]").astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dsg = d["v"].combine_chunks().to_numpy(zero_copy_only=False)
        o = np.argsort(dk, kind="stable")
        dk_s, dsg_s = dk[o], dsg[o]
        pos = np.clip(np.searchsorted(dk_s, ck), 0, len(dk_s) - 1)
        hit = dk_s[pos] == ck
        seg = dsg_s[pos][hit]
        yb = yr[hit] - 1970
        cell = yb * nsg + seg
        W = int(cell.max()) + 1 if len(cell) else 1
        g_nc = np.zeros(W, np.int64)
        g_no = np.zeros(W, np.int64)
        g_fy = np.zeros(W, np.int64)
        np.add.at(g_nc, cell, 1)
        np.add.at(g_no, cell, no[hit])
        np.add.at(g_fy, cell, fy[hit])
        live = np.flatnonzero(g_nc)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "nc": pa.array(g_nc[live]),
                "no": pa.array(g_no[live]),
                "fy": pa.array(g_fy[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cohort_year": pa.array([], pa.int64()),
                    "c_mktsegment": pa.array([], pa.string()),
                    "n_customers": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                    "first_year_value": pa.array([], pa.int64()),
                }
            )
        cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        W = int(cell.max()) + 1
        g_nc = np.zeros(W, np.int64)
        g_no = np.zeros(W, np.int64)
        g_fy = np.zeros(W, np.int64)
        for acc, col in ((g_nc, "nc"), (g_no, "no"), (g_fy, "fy")):
            np.add.at(
                acc, cell,
                t[col].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(g_nc)
        return pa.table(
            {
                "cohort_year": pa.array(
                    (live // nsg + 1970).astype(np.int64)
                ),
                "c_mktsegment": pc.take(segs, pa.array(live % nsg)),
                "n_customers": pa.array(g_nc[live]),
                "n_orders": pa.array(g_no[live]),
                "first_year_value": pa.array(g_fy[live]),
            }
        )

    fact = orders.map_batches(fact_partial, batch_format="pyarrow")
    dim = cust.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "cell", merge, k=1)


def acquisition_seasonality(sf_dir: str) -> Dataset:
    """R143: acquisition seasonality — per (calendar month 1-12 of each
    customer's FIRST order, market segment): customers acquired and the
    floored value of those first orders — WHEN new customers arrive,
    the acquisition-calendar read the activity boards blur (R23 counts
    customers ACTIVE per month — dominated by the existing base; R142
    buckets cohorts by YEAR; R143 folds all years onto the month axis:
    a segment acquired mostly in Q4 is a gifting franchise, and the
    first-order value column says whether the seasonal door brings
    big or small entry tickets).  One row per occupied (month,
    segment) cell; exact int64 (per-customer min-date first order +
    month extract + two-key GROUP BY oracle; the first order is unique
    — min (date, value) pairs resolve by taking the value of the
    min-date order with the LOWEST value on ties, mirrored in both
    lanes).

    Scale shape — R124's custkey co-partition: order batches pre-reduce
    to per-custkey (min-day, value-at-min-day-min) partials (the
    tie-broken first-order value is itself a min over (day, value)
    pairs packed into one int64 — associative); the custkey fold
    combines, extracts the month with vectorized datetime64 math,
    attaches the segment, and collapses to a ≤ 12 × segments grid;
    k=1 densifying merge."""
    DAY_US = 86_400_000_000

    segs = pa.array(
        sorted(
            rd.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_mktsegment"]
            ).unique("c_mktsegment")
        ),
        pa.string(),
    )
    nsg = len(segs)

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    # pack (day, floored value) into one int64: day << 40 | value
    # (values < 2**40; days < 2**23) so MIN picks min-day then min-value
    SHIFT = 40

    def dim_partial(b: pa.Table) -> pa.Table:
        sg = (
            pc.cast(pc.index_in(b["c_mktsegment"], value_set=segs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "p": pa.array(np.full(b.num_rows, -1, np.int64)),
                "seg": pa.array(sg.astype(np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        day = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        rv = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "p": pa.array((day << SHIFT) | rv, pa.int64()),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate([("p", "min")])
        g = g.rename_columns(["k", "p"])
        return g.append_column(
            "seg", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "p", "seg"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "nc": pa.array([], pa.int64()),
                "fv": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["seg"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fg = f.group_by("k", use_threads=False).aggregate([("p", "min")])
        fg = fg.rename_columns(["k", "p"])
        fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        p = fg["p"].combine_chunks().to_numpy(zero_copy_only=False)
        day = p >> SHIFT
        fv = p & ((1 << SHIFT) - 1)
        month = (
            day.astype("datetime64[D]").astype("datetime64[M]")
            .astype(np.int64)
            % 12
        ) + 1
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dsg = role[is_dim]
        o = np.argsort(dk, kind="stable")
        dk_s, dsg_s = dk[o], dsg[o]
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        seg = dsg_s[pos][hit]
        cell = (month[hit] - 1) * nsg + seg
        g_nc = np.zeros(12 * nsg, np.int64)
        g_fv = np.zeros(12 * nsg, np.int64)
        np.add.at(g_nc, cell, 1)
        np.add.at(g_fv, cell, fv[hit])
        live = np.flatnonzero(g_nc)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "nc": pa.array(g_nc[live]),
                "fv": pa.array(g_fv[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        g_nc = np.zeros(12 * nsg, np.int64)
        g_fv = np.zeros(12 * nsg, np.int64)
        if t.num_rows:
            cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                g_nc, cell,
                t["nc"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                g_fv, cell,
                t["fv"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(g_nc)
        return pa.table(
            {
                "acq_month": pa.array((live // nsg + 1).astype(np.int64)),
                "c_mktsegment": pc.take(segs, pa.array(live % nsg)),
                "n_customers": pa.array(g_nc[live]),
                "first_order_value": pa.array(g_fv[live]),
            }
        )

    fact = orders.map_batches(fact_partial, batch_format="pyarrow")
    dim = cust.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "cell", merge, k=1)


def acquisition_geography(sf_dir: str) -> Dataset:
    """R144: acquisition geography — per (nation, first-order YEAR):
    customers whose FIRST order falls in that year and the floored
    value of those first orders — WHERE growth comes from over time,
    the geographic cohort map (R77 maps the static registry, R23/R142
    cohort by segment or activity; R144 crosses the acquisition clock
    with the map: a nation whose cohorts shrink year over year is a
    market going dark while the static registry still shows it big).
    One row per occupied (nation, year) cell; exact int64 (per-customer
    packed min-(day, value) first order + year + nation join oracle).

    Scale shape — R143's custkey co-partition with the customer's
    NATION rank riding the dim side (the 25-row nation-name list
    broadcasts); the fold unpacks the associative first-order MIN,
    derives the year with datetime64 math, and collapses to a
    ≤ 25 × years grid; k=1 densifying merge."""
    DAY_US = 86_400_000_000
    SHIFT = 40

    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas().sort_values("n_nationkey")
    nkeys = nat["n_nationkey"].to_numpy().astype(np.int64)
    nnames = pa.array(nat["n_name"].tolist(), pa.string())
    nn = len(nkeys)

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        override_num_blocks=_rel_k(sf_dir, "customer"),
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        nk = pc.cast(b["c_nationkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        ni = np.searchsorted(nkeys, nk)
        return pa.table(
            {
                "k": pc.cast(b["c_custkey"], pa.int64()),
                "p": pa.array(np.full(b.num_rows, -1, np.int64)),
                "nat": pa.array(ni.astype(np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        day = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        rv = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "k": pc.cast(b["o_custkey"], pa.int64()),
                "p": pa.array((day << SHIFT) | rv, pa.int64()),
            }
        )
        g = t.group_by("k", use_threads=False).aggregate([("p", "min")])
        g = g.rename_columns(["k", "p"])
        return g.append_column(
            "nat", pa.array(np.full(g.num_rows, -1, np.int64))
        ).select(["k", "p", "nat"])

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "nc": pa.array([], pa.int64()),
                "fv": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        role = t["nat"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = role >= 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fg = f.group_by("k", use_threads=False).aggregate([("p", "min")])
        fg = fg.rename_columns(["k", "p"])
        fk = fg["k"].combine_chunks().to_numpy(zero_copy_only=False)
        p = fg["p"].combine_chunks().to_numpy(zero_copy_only=False)
        day = p >> SHIFT
        fv = p & ((1 << SHIFT) - 1)
        yr = (
            day.astype("datetime64[D]").astype("datetime64[Y]")
            .astype(np.int64)
        )
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dnat = role[is_dim]
        o = np.argsort(dk, kind="stable")
        dk_s, dnat_s = dk[o], dnat[o]
        pos = np.clip(np.searchsorted(dk_s, fk), 0, len(dk_s) - 1)
        hit = dk_s[pos] == fk
        nat_i = dnat_s[pos][hit]
        cell = yr[hit] * nn + nat_i
        W = int(cell.max()) + 1 if len(cell) else 1
        g_nc = np.zeros(W, np.int64)
        g_fv = np.zeros(W, np.int64)
        np.add.at(g_nc, cell, 1)
        np.add.at(g_fv, cell, fv[hit])
        live = np.flatnonzero(g_nc)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "nc": pa.array(g_nc[live]),
                "fv": pa.array(g_fv[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "cohort_year": pa.array([], pa.int64()),
                    "n_customers": pa.array([], pa.int64()),
                    "first_order_value": pa.array([], pa.int64()),
                }
            )
        cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        W = int(cell.max()) + 1
        g_nc = np.zeros(W, np.int64)
        g_fv = np.zeros(W, np.int64)
        np.add.at(
            g_nc, cell,
            t["nc"].combine_chunks().to_numpy(zero_copy_only=False),
        )
        np.add.at(
            g_fv, cell,
            t["fv"].combine_chunks().to_numpy(zero_copy_only=False),
        )
        live = np.flatnonzero(g_nc)
        return pa.table(
            {
                "n_name": pc.take(nnames, pa.array(live % nn)),
                "cohort_year": pa.array(
                    (live // nn + 1970).astype(np.int64)
                ),
                "n_customers": pa.array(g_nc[live]),
                "first_order_value": pa.array(g_fv[live]),
            }
        )

    fact = orders.map_batches(fact_partial, batch_format="pyarrow")
    dim = cust.map_batches(dim_partial, batch_format="pyarrow")
    cells = hash_partition_merge(
        fact.union(dim), "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "cell", merge, k=1)


def demand_continuity(sf_dir: str) -> Dataset:
    """R145: demand-continuity audit — one corpus row over the order
    calendar: span days (first to last order date inclusive), ACTIVE
    days, coverage permille, and the LONGEST blackout (consecutive
    span days with zero orders) — the calendar-integrity read the
    event-side gap boards have no relational twin for (E43/E75 profile
    minute-grid activity; R7/R96 aggregate months that HIDE holes; a
    multi-week blackout inside an otherwise-dense order calendar is
    either an outage in the order pipeline or a data-loss window, and
    every trend board silently interpolates across it).  Exactly one
    row ALWAYS; exact int64 (distinct-day + lag-gap max + span
    arithmetic oracle).

    Scale shape — ONE narrow exchange of PRE-REDUCED distinct days
    (batches emit distinct day values — the exchange carries DAYS, not
    orders; the calendar bounds the payload at any corpus size); the
    single merge partition sorts the unique day list once and reads
    span/active/longest-gap off one diff."""
    DAY_US = 86_400_000_000

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        return pa.table({"d": pa.array(np.unique(day), pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "span_days": pa.array([0], pa.int64()),
                    "active_days": pa.array([0], pa.int64()),
                    "coverage_permille": pa.array([0], pa.int64()),
                    "longest_blackout": pa.array([0], pa.int64()),
                }
            )
        d = np.unique(
            t["d"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        span = int(d[-1] - d[0]) + 1
        active = len(d)
        gap = int((np.diff(d) - 1).max()) if len(d) > 1 else 0
        return pa.table(
            {
                "span_days": pa.array([span], pa.int64()),
                "active_days": pa.array([active], pa.int64()),
                "coverage_permille": pa.array(
                    [1000 * active // max(span, 1)], pa.int64()
                ),
                "longest_blackout": pa.array([gap], pa.int64()),
            }
        )

    partials = orders.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "d", merge, k=1)


def basket_trend(sf_dir: str) -> Dataset:
    """R146: basket-size trend — per order YEAR: orders with ≥ 1 line,
    their total lines, and the exact Σ(lines per order)² — the
    basket-depth drift line (R35 histograms depth STATICALLY; R146
    adds the clock: mean and variance of lines-per-order per year
    derive off-line, and a shrinking mean with growing variance is the
    classic marketplace-fragmentation signature — more, smaller,
    spikier orders — that changes picking costs long before revenue
    moves).  One row per order year with ≥ 1 line; exact int64
    (per-order line count + year + SUM/SUM² oracle).

    Scale shape — ONE orderkey co-partition, both sides pre-reduced:
    lineitem batches reduce to (orderkey, n) cells; the fold combines
    cells, squares each order's EXACT line count once, attaches the
    year from the co-partitioned orders dim, and collapses to a
    ≤ years grid; k=1 densifying merge."""
    DAY_US = 86_400_000_000

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )

    def dim_partial(b: pa.Table) -> pa.Table:
        od = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        return pa.table(
            {
                "k": pc.cast(b["o_orderkey"], pa.int64()),
                "d": pa.array(od, pa.int64()),
                "n": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        )

    def fact_partial(b: pa.Table) -> pa.Table:
        ok = pc.cast(b["l_orderkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        uo, cnt = np.unique(ok, return_counts=True)
        return pa.table(
            {
                "k": pa.array(uo),
                "d": pa.array(np.full(len(uo), -1, np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "yr": pa.array([], pa.int64()),
                "no": pa.array([], pa.int64()),
                "nl": pa.array([], pa.int64()),
                "nl2": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        nc = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        is_dim = nc < 0
        d = t.filter(pa.array(is_dim))
        f = t.filter(pa.array(~is_dim))
        if d.num_rows == 0 or f.num_rows == 0:
            return empty
        fk = f["k"].combine_chunks().to_numpy(zero_copy_only=False)
        fn = nc[~is_dim]
        uo, inv = np.unique(fk, return_inverse=True)
        nlines = np.zeros(len(uo), np.int64)
        np.add.at(nlines, inv, fn)
        dk = d["k"].combine_chunks().to_numpy(zero_copy_only=False)
        dd = d["d"].combine_chunks().to_numpy(zero_copy_only=False)
        o = np.argsort(dk, kind="stable")
        dk_s, dd_s = dk[o], dd[o]
        pos = np.clip(np.searchsorted(dk_s, uo), 0, len(dk_s) - 1)
        hit = dk_s[pos] == uo
        yr = (
            dd_s[pos][hit].astype("datetime64[D]").astype("datetime64[Y]")
            .astype(np.int64)
        )
        nl = nlines[hit]
        yb = yr - yr.min() if len(yr) else yr
        W = int(yb.max()) + 1 if len(yb) else 1
        g_no = np.zeros(W, np.int64)
        g_nl = np.zeros(W, np.int64)
        g_nl2 = np.zeros(W, np.int64)
        np.add.at(g_no, yb, 1)
        np.add.at(g_nl, yb, nl)
        np.add.at(g_nl2, yb, nl * nl)
        base = int(yr.min()) if len(yr) else 0
        live = np.flatnonzero(g_no)
        return pa.table(
            {
                "yr": pa.array((live + base).astype(np.int64)),
                "no": pa.array(g_no[live]),
                "nl": pa.array(g_nl[live]),
                "nl2": pa.array(g_nl2[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "order_year": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "sum_lines2": pa.array([], pa.int64()),
                }
            )
        yr = t["yr"].combine_chunks().to_numpy(zero_copy_only=False)
        uy, inv = np.unique(yr, return_inverse=True)
        no = np.zeros(len(uy), np.int64)
        nl = np.zeros(len(uy), np.int64)
        nl2 = np.zeros(len(uy), np.int64)
        for acc, col in ((no, "no"), (nl, "nl"), (nl2, "nl2")):
            np.add.at(
                acc, inv,
                t[col].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "order_year": pa.array((uy + 1970).astype(np.int64)),
                "n_orders": pa.array(no),
                "n_lines": pa.array(nl),
                "sum_lines2": pa.array(nl2),
            }
        )

    cells = hash_partition_merge(
        lines.map_batches(fact_partial, batch_format="pyarrow").union(
            orders.map_batches(dim_partial, batch_format="pyarrow")
        ),
        "k",
        fold,
        k=_rel_k(sf_dir, "lineitem"),
    )
    return hash_partition_merge(cells, "yr", merge, k=1)


def value_mix_trend(sf_dir: str) -> Dataset:
    """R147: order-value mix trend — per (order year, bit-length band of
    the floored order total): orders and floored value — the value
    DISTRIBUTION drift the totals hide (R18's yearly growth can hold
    flat while the mix walks: losing small orders and gaining big ones
    nets to zero revenue change but halves shipment count; R109 bands
    value statically — R147 adds the clock, and a band whose count
    decays year over year is a product tier dying in plain sight).
    One row per occupied (year, band) cell; exact int64 (length(bin) +
    year + two-key GROUP BY oracle).

    Scale shape — ZERO-join scan-reduce (R1 shape): year and band are
    both vectorized integer kernels; one packed bincount pair per
    batch; k=1 merge folds O(batches × cells) rows."""
    DAY_US = 86_400_000_000
    NB = 40

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        yr = day.astype("datetime64[D]").astype("datetime64[Y]").astype(
            np.int64
        )
        rv = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        band = np.where(
            rv <= 0, 0,
            np.frexp(np.maximum(rv, 0).astype(np.float64))[1].astype(
                np.int64
            ),
        )
        key = yr * NB + np.minimum(band, NB - 1)
        packed, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv)
        v = np.bincount(inv, weights=rv, minlength=len(packed)).astype(
            np.int64
        )
        return pa.table(
            {
                "cell": pa.array(packed),
                "n": pa.array(n.astype(np.int64)),
                "v": pa.array(v),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "order_year": pa.array([], pa.int64()),
                    "value_band": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                }
            )
        cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        ucell, inv = np.unique(cell, return_inverse=True)
        n = np.zeros(len(ucell), np.int64)
        v = np.zeros(len(ucell), np.int64)
        np.add.at(
            n, inv, t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        np.add.at(
            v, inv, t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "order_year": pa.array(
                    (ucell // NB + 1970).astype(np.int64)
                ),
                "value_band": pa.array((ucell % NB).astype(np.int64)),
                "n_orders": pa.array(n),
                "revenue_floor": pa.array(v),
            }
        )

    partials = orders.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "cell", merge, k=1)


def frequency_trend(sf_dir: str) -> Dataset:
    """R148: order-frequency mix trend — per (year, bit-length band of
    each ACTIVE customer's order count that year): customers and their
    orders — the frequency-distribution drift (R6 histograms lifetime
    order counts statically, R147 drifts the VALUE mix; R148 drifts
    the CADENCE mix: a year whose band-1 mass swells while band-3+
    shrinks is a base converting from habit to one-off even if total
    orders hold — the leading indicator of R18's future flattening).
    One row per occupied (year, band) cell; exact int64 (per-(customer,
    year) count + length(bin) + two-key GROUP BY oracle).

    Scale shape — ONE narrow exchange of PRE-REDUCED (custkey, year,
    n) cells (batches collapse with one packed np.unique); the
    custkey-hash fold re-combines each (customer, year)'s exact count,
    bands it with one frexp, and collapses to a ≤ years × 34 grid;
    k=1 densifying merge."""
    DAY_US = 86_400_000_000
    NB = 34

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        yr = day.astype("datetime64[D]").astype("datetime64[Y]").astype(
            np.int64
        )
        ck = pc.cast(b["o_custkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        key = ck * 256 + yr  # years since 1970 < 256
        packed, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "k": pa.array(packed // 256),
                "yr": pa.array(packed % 256),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "nc": pa.array([], pa.int64()),
                    "no": pa.array([], pa.int64()),
                }
            )
        kk = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        yr = t["yr"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        key = kk * 256 + yr
        packed, inv = np.unique(key, return_inverse=True)
        tot = np.zeros(len(packed), np.int64)
        np.add.at(tot, inv, nn)
        yru = packed % 256
        band = np.frexp(tot.astype(np.float64))[1].astype(np.int64)
        cell = yru * NB + np.minimum(band, NB - 1)
        W = int(cell.max()) + 1 if len(cell) else 1
        g_nc = np.zeros(W, np.int64)
        g_no = np.zeros(W, np.int64)
        np.add.at(g_nc, cell, 1)
        np.add.at(g_no, cell, tot)
        live = np.flatnonzero(g_nc)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "nc": pa.array(g_nc[live]),
                "no": pa.array(g_no[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "order_year": pa.array([], pa.int64()),
                    "freq_band": pa.array([], pa.int64()),
                    "n_customers": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        W = int(cell.max()) + 1
        g_nc = np.zeros(W, np.int64)
        g_no = np.zeros(W, np.int64)
        np.add.at(
            g_nc, cell,
            t["nc"].combine_chunks().to_numpy(zero_copy_only=False),
        )
        np.add.at(
            g_no, cell,
            t["no"].combine_chunks().to_numpy(zero_copy_only=False),
        )
        live = np.flatnonzero(g_nc)
        return pa.table(
            {
                "order_year": pa.array(
                    (live // NB + 1970).astype(np.int64)
                ),
                "freq_band": pa.array((live % NB).astype(np.int64)),
                "n_customers": pa.array(g_nc[live]),
                "n_orders": pa.array(g_no[live]),
            }
        )

    partials = orders.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials, "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "cell", merge, k=1)


def concentration_trend(sf_dir: str) -> Dataset:
    """R149: customer-concentration trend — per order year: orders,
    DISTINCT active customers, and the exact Simpson sufficient
    statistic Σ_c n_c·(n_c − 1) over each customer's order count that
    year — IS THE BUSINESS CONCENTRATING, year over year, as one
    number (R11's Pareto ranks a static snapshot, R148 drifts the
    frequency BANDS; R149 collapses each year's customer mix to the
    probability two random orders share a customer — rising λ with
    flat totals means the long tail is quietly leaving while the top
    keeps ordering, the revenue-at-risk trend a static Pareto cannot
    date).  One row per order year ALWAYS; exact int64 (per-(customer,
    year) count + Σn(n−1) + GROUP BY oracle).

    Scale shape — R148's pre-reduced (custkey, year, n) exchange with
    a Simpson finish: each customer-year's exact count settles in the
    custkey partition, n(n−1) forms there, and the partition collapses
    to a ≤ years moment grid; k=1 densifying merge."""
    DAY_US = 86_400_000_000

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        yr = day.astype("datetime64[D]").astype("datetime64[Y]").astype(
            np.int64
        )
        ck = pc.cast(b["o_custkey"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        key = ck * 256 + yr
        packed, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "k": pa.array(packed // 256),
                "yr": pa.array(packed % 256),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "yr": pa.array([], pa.int64()),
                    "no": pa.array([], pa.int64()),
                    "nc": pa.array([], pa.int64()),
                    "s2": pa.array([], pa.int64()),
                }
            )
        kk = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        yr = t["yr"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        key = kk * 256 + yr
        packed, inv = np.unique(key, return_inverse=True)
        tot = np.zeros(len(packed), np.int64)
        np.add.at(tot, inv, nn)
        yru = packed % 256
        W = int(yru.max()) + 1 if len(yru) else 1
        no = np.bincount(yru, weights=tot, minlength=W).astype(np.int64)
        nc = np.bincount(yru, minlength=W)
        s2 = np.bincount(
            yru, weights=tot * (tot - 1), minlength=W
        ).astype(np.int64)
        live = np.flatnonzero(nc)
        return pa.table(
            {
                "yr": pa.array(live.astype(np.int64)),
                "no": pa.array(no[live]),
                "nc": pa.array(nc[live].astype(np.int64)),
                "s2": pa.array(s2[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "order_year": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                    "n_customers": pa.array([], pa.int64()),
                    "simpson_num": pa.array([], pa.int64()),
                }
            )
        yr = t["yr"].combine_chunks().to_numpy(zero_copy_only=False)
        uy, inv = np.unique(yr, return_inverse=True)
        no = np.zeros(len(uy), np.int64)
        nc = np.zeros(len(uy), np.int64)
        s2 = np.zeros(len(uy), np.int64)
        for acc, col in ((no, "no"), (nc, "nc"), (s2, "s2")):
            np.add.at(
                acc, inv,
                t[col].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "order_year": pa.array((uy + 1970).astype(np.int64)),
                "n_orders": pa.array(no),
                "n_customers": pa.array(nc),
                "simpson_num": pa.array(s2),
            }
        )

    partials = orders.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials, "k", fold, k=_rel_k(sf_dir, "orders")
    )
    return hash_partition_merge(cells, "yr", merge, k=1)


def weekend_trend(sf_dir: str) -> Dataset:
    """R150: weekend-order trend — per order year: orders, WEEKEND
    orders (dayofweek 0 or 6, DuckDB's Sunday=0), the weekend
    permille, and the floored value of both populations — the
    B2B/B2C calendar mix over time (R102 profiles weekdays statically;
    R150 adds the clock: a rising weekend share is a customer-mix
    shift toward consumers — or a mobile checkout launch — and either
    re-weights staffing and R130's weekly operating cycle).  One row
    per order year ALWAYS; exact int64 (dayofweek + CASE-split counts
    and sums oracle).

    Scale shape — ZERO-join scan-reduce (R1 shape): weekday via the
    (day + 4) % 7 shift, one packed bincount quartet per batch onto a
    ≤ years grid; k=1 merge."""
    DAY_US = 86_400_000_000

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["o_orderdate"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        yr = day.astype("datetime64[D]").astype("datetime64[Y]").astype(
            np.int64
        )
        dow = (day + 4) % 7
        we = (dow == 0) | (dow == 6)
        rv = np.floor(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        uy, inv = np.unique(yr, return_inverse=True)
        n = np.bincount(inv)
        nw = np.bincount(inv[we], minlength=len(uy))
        v = np.bincount(inv, weights=rv, minlength=len(uy)).astype(np.int64)
        vw = np.bincount(
            inv[we], weights=rv[we], minlength=len(uy)
        ).astype(np.int64)
        return pa.table(
            {
                "yr": pa.array(uy),
                "n": pa.array(n.astype(np.int64)),
                "nw": pa.array(nw.astype(np.int64)),
                "v": pa.array(v),
                "vw": pa.array(vw),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "order_year": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                    "n_weekend": pa.array([], pa.int64()),
                    "weekend_permille": pa.array([], pa.int64()),
                    "revenue_floor": pa.array([], pa.int64()),
                    "weekend_revenue": pa.array([], pa.int64()),
                }
            )
        yr = t["yr"].combine_chunks().to_numpy(zero_copy_only=False)
        uy, inv = np.unique(yr, return_inverse=True)
        n = np.zeros(len(uy), np.int64)
        nw = np.zeros(len(uy), np.int64)
        v = np.zeros(len(uy), np.int64)
        vw = np.zeros(len(uy), np.int64)
        for acc, col in ((n, "n"), (nw, "nw"), (v, "v"), (vw, "vw")):
            np.add.at(
                acc, inv,
                t[col].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "order_year": pa.array((uy + 1970).astype(np.int64)),
                "n_orders": pa.array(n),
                "n_weekend": pa.array(nw),
                "weekend_permille": pa.array(1000 * nw // np.maximum(n, 1)),
                "revenue_floor": pa.array(v),
                "weekend_revenue": pa.array(vw),
            }
        )

    partials = orders.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "yr", merge, k=1)
