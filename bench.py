"""Benchmark harness for the mq_to_db_ray engine.

Default mode: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N}

``--scaling``: runs the flagship cascade twice in FRESH processes
(num_cpus=8 then num_cpus=32) on the same deterministic input and reports
both throughputs plus scaling efficiency ``(rate_32/rate_8)/4`` — the
sandbox stand-in for the north_rule's N vs 4N node clusters
(BASELINE.json:14).  Results go to stdout; record them in BASELINE.md.

``--worker-cascade`` is the internal per-process entry used by --scaling.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# flagship-cascade corpus: sized so per-task overhead is amortized and the
# 32-CPU run is not partition-starved (64 shards -> >=64 read tasks).
BENCH_ROWS = int(os.environ.get("MQ2DB_BENCH_ROWS", "2000000"))
BENCH_SHARDS = int(os.environ.get("MQ2DB_BENCH_SHARDS", "64"))
BENCH_MAX_TOK = int(os.environ.get("MQ2DB_BENCH_MAX_TOK", "128"))


def bench_corpus_dir(rows: int = BENCH_ROWS, shards: int = BENCH_SHARDS,
                     max_tok: int = BENCH_MAX_TOK) -> str:
    """Deterministic cached F1 corpus for benchmarking (FIXTURES.md §1)."""
    from mq_to_db_ray.gen import write_f1_parquet

    out = f"/tmp/mq2db_bench_corpus/r{rows}-s{shards}-t{max_tok}"
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(out, ignore_errors=True)
        write_f1_parquet(out, rows, shards=shards, max_tok=max_tok)
        open(marker, "w").close()
    return out


def run_cascade_once(corpus: str) -> dict:
    """One full raw->1m->1h->1d cascade into a throwaway dir; returns rates."""
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.cascade import run_cascade

    n_tokens = 0
    for f in sorted(os.listdir(corpus)):
        if f.endswith(".parquet"):
            md = pq.ParquetFile(os.path.join(corpus, f)).metadata
            n_tokens += sum(
                md.row_group(g).column(1).num_values
                for g in range(md.num_row_groups)
            )
    out = tempfile.mkdtemp(prefix="mq2db_bench_")
    t0 = time.perf_counter()
    summary = run_cascade(corpus, out)
    wall = time.perf_counter() - t0
    shutil.rmtree(out, ignore_errors=True)
    return dict(
        wall_sec=round(wall, 3),
        rows=summary["rows"],
        tokens=int(n_tokens),
        sequences_per_sec=round(summary["rows"] / wall, 1),
        tokens_per_sec=round(n_tokens / wall, 1),
        partitions=summary["partitions"],
    )


def timed_queries(sf_dir: str) -> dict[str, float]:
    """Time each headline query; consume Datasets fully (count via take of
    the already-small results — all queries return rolled-up/small outputs)."""
    import __ray_entry__ as entry

    q = entry.queries()
    names = [
        "events_rollup_1m",
        "events_rollup_1h_cascaded",
        "events_rollup_1d_cascaded",
        "events_gapfill_1m",
        "events_reject_lane",
        "doc_token_count",
        "doc_rollup_1m",
        "doc_quality",
        "doc_langid",
        "doc_fingerprint",
        "doc_exact_dedup",
        "doc_simhash",
        "doc_minhash_pairs",
        "embedding_stats",
        "ann_cosine_top10",
        "ann_lsh_topk",
        "multimodal_meta",
    ]
    out: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        res = q[name](sf_dir)
        _consume(res)
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def _consume(res) -> int:
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, (pd.DataFrame, pa.Table)):
        return len(res)
    return res.count()


def cmd_bench(args) -> None:
    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, ignore_reinit_error=True)
    corpus = bench_corpus_dir()
    cascade = run_cascade_once(corpus)
    queries = timed_queries(args.sf_dir)
    queries["f1_cascade"] = cascade["wall_sec"]
    total = round(sum(queries.values()), 3)
    sf = os.path.basename(os.path.normpath(args.sf_dir)).replace("sf", "")
    try:
        sf = float(sf)
    except ValueError:
        pass
    print(json.dumps(dict(
        metric="total_bench_sec",
        value=total,
        unit="sec",
        queries=queries,
        sf=sf,
        num_cpus=args.num_cpus,
        cascade=cascade,
    )))
    ray.shutdown()


def cmd_worker_cascade(args) -> None:
    """Internal: one fresh-process cascade run at --num-cpus (for --scaling)."""
    import ray

    ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)
    corpus = bench_corpus_dir(args.rows)
    r = run_cascade_once(corpus)
    r["num_cpus"] = args.num_cpus
    with open(args.json_out, "w") as f:
        json.dump(r, f)
    ray.shutdown()


def cmd_scaling(args) -> None:
    levels = [args.low, args.high]
    results = []
    bench_corpus_dir(args.rows)  # pre-generate outside the timed runs
    for n in levels:
        out = tempfile.mktemp(suffix=".json")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker-cascade",
             "--num-cpus", str(n), "--rows", str(args.rows),
             "--json-out", out],
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        with open(out) as f:
            results.append(json.load(f))
        os.unlink(out)
    r_lo, r_hi = results
    ratio = args.high / args.low
    eff = (r_hi["sequences_per_sec"] / r_lo["sequences_per_sec"]) / ratio
    print(json.dumps(dict(
        metric="scaling_efficiency",
        value=round(eff, 3),
        unit="fraction",
        queries={
            f"cascade_cpus{args.low}": r_lo["wall_sec"],
            f"cascade_cpus{args.high}": r_hi["wall_sec"],
        },
        sf="bench-corpus",
        num_cpus=args.high,
        low=r_lo,
        high=r_hi,
        target=0.8,
    )))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p.add_argument("--num-cpus", type=int, default=DEFAULT_CPUS)
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--worker-cascade", action="store_true")
    p.add_argument("--rows", type=int, default=BENCH_ROWS)
    p.add_argument("--low", type=int, default=8)
    p.add_argument("--high", type=int, default=32)
    p.add_argument("--json-out", default="/tmp/mq2db_worker.json")
    args = p.parse_args()
    if args.worker_cascade:
        cmd_worker_cascade(args)
    elif args.scaling:
        cmd_scaling(args)
    else:
        cmd_bench(args)


if __name__ == "__main__":
    main()
