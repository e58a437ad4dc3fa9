"""Local simulation of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry at the given sf_dir, runs the
matching ``oracle_sql()`` in DuckDB over the same parquet files, and compares
row count, schema (column names), and an order-insensitive value hash.

Usage: python scripts/driver_sim.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df):
    """Sort columns by name, rows by all values, stringify for hashing."""
    import pandas as pd

    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df) -> str:
    import hashlib

    h = hashlib.blake2b(digest_size=12)
    for col in df.columns:
        h.update(col.encode())
        for v in df[col].tolist():
            h.update(repr(v).encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    import __ray_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = canon(to_pandas(fn(sf_dir)))
            status = {"rows": len(got), "cols": list(got.columns),
                      "sec": round(time.perf_counter() - t0, 2)}
            if name in osql:
                want = canon(con.sql(osql[name]).df())
                status["oracle_rows"] = len(want)
                status["schema_match"] = list(got.columns) == list(want.columns)
                gh, wh = value_hash(got), value_hash(want)
                status["value_match"] = gh == wh
                if not status["value_match"] and status["schema_match"] and len(got) == len(want):
                    # find first differing cell for debugging
                    for col in got.columns:
                        if not got[col].equals(want[col]):
                            diff = got[col] != want[col]
                            # NaN != NaN — treat both-null as equal
                            both_null = got[col].isna() & want[col].isna()
                            diff = diff & ~both_null
                            if diff.any():
                                i = diff.idxmax()
                                status["first_diff"] = (
                                    f"col={col} row={i} got={got[col][i]!r} want={want[col][i]!r}"
                                )
                                break
                    else:
                        status["value_match"] = "all-cells-equal (null repr)"
            else:
                status["oracle"] = "rows-only"
        except Exception as ex:  # noqa: BLE001
            status = {"error": f"{type(ex).__name__}: {ex}"}
        results[name] = status
        print(name, json.dumps(status, default=str), flush=True)

    from mq_to_db_ray.util import quiesce_ray_data_stats

    quiesce_ray_data_stats()
    ray.shutdown()
    bad = [n for n, s in results.items()
           if "error" in s or s.get("value_match") is False or s.get("schema_match") is False]
    print("\nFAILING:", bad if bad else "none")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
