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
