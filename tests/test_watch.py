"""Continuous watch mode: arriving file batches become epochs; the ledger
gives file-granular ack-once across restarts; the merged view equals one
big run."""

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc


def _sorted(t: pa.Table) -> pa.Table:
    t = t.combine_chunks()
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("source", "ascending"), ("bucket_ts", "ascending")]
        )
    ).select(["source", "bucket_ts", "count", "sum_n_tok", "min_n_tok", "max_n_tok"])


def test_watch_consumes_arrivals_exactly_once(ray_session, tmp_path):
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade
    from mq_to_db_ray.pipelines.view import tier_view
    from mq_to_db_ray.pipelines.watch import processed_files, run_pending_epoch

    gen_dir = str(tmp_path / "gen")
    files = write_f1_parquet(gen_dir, 20_000, shards=4, max_tok=8,
                             layout="contiguous")
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    os.makedirs(in_dir)

    # batch 1 arrives
    for f in files[:2]:
        shutil.copy(f, in_dir)
    s1 = run_pending_epoch(in_dir, out)
    assert s1 is not None and s1["files"] == 2

    # nothing new -> no epoch
    assert run_pending_epoch(in_dir, out) is None

    # batch 2 arrives
    for f in files[2:]:
        shutil.copy(f, in_dir)
    s2 = run_pending_epoch(in_dir, out)
    assert s2 is not None and s2["files"] == 2
    assert s1["epoch"] != s2["epoch"]
    assert len(processed_files(out)) == 4

    # merged view across the two watched epochs == one big run
    out_single = str(tmp_path / "single")
    s = run_cascade(files, out_single)
    got = _sorted(pa.Table.from_pandas(tier_view(out, "1m").to_pandas()))
    want = _sorted(pa.Table.from_pandas(s["tiers"]["1m"].to_pandas()))
    assert got.equals(want)


def test_watch_generator_bounded(ray_session, tmp_path):
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.watch import watch

    in_dir = str(tmp_path / "in")
    write_f1_parquet(in_dir, 3_000, shards=2, max_tok=8, layout="contiguous")
    out = str(tmp_path / "out")
    summaries = list(watch(in_dir, out, max_epochs=5))
    # both files present at start -> one epoch, then drained -> stop
    assert len(summaries) == 1 and summaries[0]["files"] == 2


def test_watch_health_fresh_during_long_epoch(tmp_path, monkeypatch):
    """Round-2 ADVICE: the health heartbeat must stay fresh WHILE an epoch
    runs (timer thread), not only between epochs — otherwise any epoch
    longer than the monitor's staleness threshold makes a live watcher
    look dead.  No Ray needed: the epoch is stubbed."""
    import json
    import time

    from mq_to_db_ray.pipelines import watch as w

    health = str(tmp_path / "h.json")
    seen = {}

    def slow_epoch(in_dir, out_dir, **kw):
        time.sleep(2.5)  # longer than the 0.2s heartbeat cadence
        with open(health) as f:
            seen["mid"] = json.load(f)
        return None

    monkeypatch.setattr(w, "run_pending_epoch", slow_epoch)
    t0 = time.time()
    list(
        w.watch(
            str(tmp_path), str(tmp_path), max_epochs=1,
            health_file=health, interval_s=0.2,
        )
    )
    # the heartbeat observed DURING the (only) epoch was written by the
    # timer thread while run_pending_epoch was still sleeping
    assert seen["mid"]["status"] == "ok"
    assert seen["mid"]["ts"] >= t0
    with open(health) as f:
        final = json.load(f)
    assert final["epochs_processed"] == 0  # stubbed epoch returned None
