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


def segment_sales(sf_dir: str) -> Dataset:
    """R3: market-segment sales — per (c_mktsegment, order year): order
    count and floored order-value total — the customer >< orders join
    where customer is the DIMENSION side (ships once via ``ray.put``,
    looked up per batch with one searchsorted — the T17 broadcast
    convention; no shuffle join for a dim table).

    Scale shape: the dimension payload is (custkey, segment-rank) int64
    pairs — tiny even at 10^9 customers relative to the fact table — and
    each orders batch reduces to O(segments x years) partials before the
    tiny merge."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    segs: list[str] = sorted(cust.unique("c_mktsegment"))
    seg_arr = pa.array(segs, pa.string())
    keys, codes = [], []
    for b in cust.iter_batches(batch_format="pyarrow", batch_size=65536):
        keys.append(
            pc.cast(b["c_custkey"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        codes.append(
            pc.cast(pc.index_in(b["c_mktsegment"], value_set=seg_arr), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
    k = np.concatenate(keys)
    c = np.concatenate(codes)
    order = np.argsort(k, kind="stable")
    dim_ref = ray.put((k[order], c[order]))

    class SegmentJoin:
        def __init__(self, ref):
            self.keys, self.codes = (
                ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            )

        def __call__(self, b: pa.Table) -> pa.Table:
            ck = (
                pc.cast(b["o_custkey"], pa.int64())
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            pos = np.clip(np.searchsorted(self.keys, ck), 0, len(self.keys) - 1)
            hit = self.keys[pos] == ck
            seg = self.codes[pos]
            ts_us = (
                b["o_orderdate"]
                .cast(pa.int64())
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            yr = ts_us.astype("datetime64[us]").astype("datetime64[Y]").astype(
                np.int64
            )
            price = (
                pc.cast(pc.floor(b["o_totalprice"]), pa.int64())
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            t = pa.table(
                {
                    "seg": pa.array(seg[hit], pa.int64()),
                    "yr": pa.array(yr[hit], pa.int64()),
                    "price": pa.array(price[hit], pa.int64()),
                }
            )
            g = t.group_by(["seg", "yr"], use_threads=False).aggregate(
                [("price", "count"), ("price", "sum")]
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

    ords = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
        override_num_blocks=_rel_k(sf_dir, "orders"),
    )
    partials = ords.map_batches(
        SegmentJoin,
        fn_constructor_args=(dim_ref,),
        batch_format="pyarrow",
        concurrency=2,
    )
    return hash_partition_merge(partials, "seg", merge, k=1)


def region_revenue(sf_dir: str) -> Dataset:
    """R4: supplier-region revenue — per (region name, ship year): line
    count and floored revenue, resolved through the THREE-HOP snowflake
    lineitem -> supplier -> nation -> region — the chained dimension
    lookup every star/snowflake schema needs (R3 is one hop; R4 composes
    the hops at the DRIVER so the fact scan still does exactly ONE
    searchsorted per batch).

    Scale shape: the three dims collapse driver-side into one
    (suppkey -> region-rank) int64 pair array (suppliers are the largest
    dim, still tiny next to the fact table) shipped ONCE via ``ray.put``;
    fact batches reduce to O(regions x years) partials before the k=1
    merge.  Region identity is the exact broadcast rank."""
    sup = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    reg = rd.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    reg = reg.sort_values("r_name").reset_index(drop=True)
    names = pa.array(reg["r_name"].tolist(), pa.string())
    rk_to_rank = dict(zip(reg["r_regionkey"].astype(int), range(len(reg))))
    nk_to_rank = {
        int(nk): rk_to_rank[int(rk)]
        for nk, rk in zip(nat["n_nationkey"], nat["n_regionkey"])
    }
    sk = sup["s_suppkey"].to_numpy(np.int64)
    sv = np.array(
        [nk_to_rank[int(nk)] for nk in sup["s_nationkey"]], np.int64
    )
    order = np.argsort(sk, kind="stable")
    dim_ref = ray.put((sk[order], sv[order]))

    class RegionJoin:
        def __init__(self, ref):
            self.keys, self.codes = (
                ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            )

        def __call__(self, b: pa.Table) -> pa.Table:
            s = (
                pc.cast(b["l_suppkey"], pa.int64())
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            pos = np.clip(np.searchsorted(self.keys, s), 0, len(self.keys) - 1)
            hit = self.keys[pos] == s
            code = self.codes[pos]
            ts_us = (
                b["l_shipdate"]
                .cast(pa.int64())
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            yr = ts_us.astype("datetime64[us]").astype("datetime64[Y]").astype(
                np.int64
            )
            price = (
                pc.cast(pc.floor(b["l_extendedprice"]), pa.int64())
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            t = pa.table(
                {
                    "rg": pa.array(code[hit], pa.int64()),
                    "yr": pa.array(yr[hit], pa.int64()),
                    "price": pa.array(price[hit], pa.int64()),
                }
            )
            g = t.group_by(["rg", "yr"], use_threads=False).aggregate(
                [("price", "count"), ("price", "sum")]
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

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    partials = lines.map_batches(
        RegionJoin,
        fn_constructor_args=(dim_ref,),
        batch_format="pyarrow",
        concurrency=2,
    )
    return hash_partition_merge(partials, "rg", merge, k=1)


def brand_volume(sf_dir: str, top_k: int = 10) -> Dataset:
    """R5: top-k part brands by shipped quantity — per brand: exact Σqty,
    line count, and DISTINCT part count, top-k by quantity (ties brand
    ASC so the answer is unique) — the part >< lineitem join read every
    catalog team runs ("which brands move").

    Scale shape: brand identity rides the part dim (ray.put once, one
    searchsorted per batch — parts are a dimension next to lineitem);
    the DISTINCT part count dedupes (brand, partkey) pairs via the E23
    combiner on the PART axis, so only distinct pairs and (brand, qty,
    lines) partials shuffle; k=1 merge folds both and takes top-k."""
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    ).to_pandas()
    brands = sorted(part["p_brand"].unique())
    b_arr = pa.array(brands, pa.string())
    b_rank = {b: i for i, b in enumerate(brands)}
    pk = part["p_partkey"].to_numpy(np.int64)
    pv = np.array([b_rank[b] for b in part["p_brand"]], np.int64)
    order = np.argsort(pk, kind="stable")
    dim_ref = ray.put((pk[order], pv[order]))

    class BrandJoin:
        def __init__(self, ref):
            self.keys, self.codes = (
                ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            )

        def __call__(self, b: pa.Table) -> pa.Table:
            p = (
                pc.cast(b["l_partkey"], pa.int64())
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            pos = np.clip(np.searchsorted(self.keys, p), 0, len(self.keys) - 1)
            hit = self.keys[pos] == p
            code = self.codes[pos]
            qty = (
                pc.cast(b["l_quantity"], pa.int64())
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            t = pa.table(
                {
                    "br": pa.array(code[hit], pa.int64()),
                    "pkey": pa.array(p[hit], pa.int64()),
                    "qty": pa.array(qty[hit], pa.int64()),
                }
            )
            g = t.group_by(["br", "pkey"], use_threads=False).aggregate(
                [("qty", "count"), ("qty", "sum")]
            )
            return g.rename_columns(["br", "pkey", "nl", "qty"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "br": pa.array([], pa.int64()),
                    "n_parts": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "sum_qty": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["br", "pkey"], use_threads=False).aggregate(
            [("nl", "sum"), ("qty", "sum")]
        )
        h = g.group_by("br", use_threads=False).aggregate(
            [("pkey", "count"), ("nl_sum", "sum"), ("qty_sum", "sum")]
        )
        return h.rename_columns(["br", "n_parts", "n_lines", "sum_qty"])

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
                "p_brand": b_arr.take(
                    pa.array(br[order], pa.int64())
                ),
                "n_parts": pc.cast(g["n_parts_sum"], pa.int64()).take(take),
                "n_lines": pc.cast(g["n_lines_sum"], pa.int64()).take(take),
                "sum_qty": pc.cast(g["sum_qty_sum"], pa.int64()).take(take),
            }
        )

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity"],
        override_num_blocks=_rel_k(sf_dir, "lineitem"),
    )
    partials = lines.map_batches(
        BrandJoin,
        fn_constructor_args=(dim_ref,),
        batch_format="pyarrow",
        concurrency=2,
    )
    per_part = hash_partition_merge(partials, "pkey", fold, k=_rel_k(sf_dir, "part"))
    return hash_partition_merge(per_part, "br", merge, k=1)
