"""Round-4 eighth-wave operators: pairwise cross-source correlation
sufficient statistics, per-source median/MAD robust anomaly summary, and
per-source busy-streak (gaps-and-islands) statistics — each vs a scalar
brute-force reference on synthetic inputs hitting the edge cases (sparse
sources sharing few minutes, all-quiet sources with mad = 0, streaks
crossing window boundaries, single-minute streaks)."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pytest

from tests.test_wave7_ops import _write_events

TIER_US = 60 * 1_000_000


def _rolled(types: np.ndarray, ts: np.ndarray) -> dict[tuple[str, int], int]:
    return collections.Counter(zip(types.tolist(), (ts // TIER_US).tolist()))


def test_source_corr_matches_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_source_corr

    types, ts, _ = _write_events(tmp_path, seed=131, n=800, minutes=240)
    rolled = _rolled(types, ts)
    buckets = sorted({b for _, b in rolled})
    n_buckets = buckets[-1] - buckets[0] + 1
    srcs = sorted(set(types.tolist()))

    out = (
        events_source_corr(str(tmp_path))
        .to_pandas()
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )
    assert len(out) == len(srcs) * (len(srcs) - 1) // 2

    for _, row in out.iterrows():
        a, b = row.src_a, row.src_b
        assert a < b
        ca = {bk: c for (s, bk), c in rolled.items() if s == a}
        cb = {bk: c for (s, bk), c in rolled.items() if s == b}
        assert int(row.n_buckets) == n_buckets
        assert int(row.s_a) == sum(ca.values())
        assert int(row.s_b) == sum(cb.values())
        assert int(row.s_aa) == sum(v * v for v in ca.values())
        assert int(row.s_bb) == sum(v * v for v in cb.values())
        assert int(row.s_ab) == sum(
            ca[k] * cb[k] for k in set(ca) & set(cb)
        )


def _disc_median(values: list[int]) -> int:
    """Smallest value whose cumulative count >= ceil(n/2) — the repo's
    quantile_disc rank rule at q = 0.5."""
    values = sorted(values)
    return values[(len(values) + 1) // 2 - 1]


def test_mad_anomaly_matches_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_mad_anomaly_1m

    types, ts, _ = _write_events(tmp_path, seed=137, n=1200, minutes=300)
    rolled = _rolled(types, ts)

    out = (
        events_mad_anomaly_1m(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    for src in sorted(set(types.tolist())):
        per = {bk: c for (s, bk), c in rolled.items() if s == src}
        lo, hi = min(per), max(per)
        grid = [per.get(bk, 0) for bk in range(lo, hi + 1)]
        med = _disc_median(grid)
        devs = [abs(x - med) for x in grid]
        mad = _disc_median(devs)
        n_anom = sum(1 for d in devs if d > 4 * mad)
        assert int(out.loc[src, "med"]) == med
        assert int(out.loc[src, "mad"]) == mad
        assert int(out.loc[src, "n_anom"]) == n_anom


@pytest.mark.parametrize("window_buckets", [4, 4096])
def test_busy_streaks_matches_bruteforce(ray_session, tmp_path, window_buckets):
    """wb=4 forces streaks to span many window summaries, exercising the
    adjacency fold (join, no-join, single-run windows)."""
    from mq_to_db_ray.pipelines.events import events_busy_streaks

    types, ts, _ = _write_events(tmp_path, seed=139, n=600, minutes=200)
    rolled = _rolled(types, ts)

    out = (
        events_busy_streaks(str(tmp_path), window_buckets=window_buckets)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    for src in sorted(set(types.tolist())):
        present = sorted(bk for (s, bk), _ in rolled.items() if s == src)
        runs = []
        cur = 1
        for prev, nxt in zip(present, present[1:]):
            if nxt == prev + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        assert int(out.loc[src, "max_streak"]) == max(runs)
        assert int(out.loc[src, "n_streaks"]) == len(runs)
        assert int(out.loc[src, "n_busy"]) == len(present)


def test_top_anomalies_matches_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_top_anomalies

    types, ts, _ = _write_events(tmp_path, seed=149, n=1000, minutes=240)
    rolled = _rolled(types, ts)

    out = (
        events_top_anomalies(str(tmp_path))
        .to_pandas()
        .sort_values(["source", "rank"])
        .reset_index(drop=True)
    )
    tier_us = TIER_US
    for src in sorted(set(types.tolist())):
        per = {bk: c for (s, bk), c in rolled.items() if s == src}
        lo, hi = min(per), max(per)
        grid = [(bk, per.get(bk, 0)) for bk in range(lo, hi + 1)]
        med = _disc_median([c for _, c in grid])
        ranked = sorted(grid, key=lambda t: (-abs(t[1] - med), t[0]))[:3]
        sub = out[out.source == src].reset_index(drop=True)
        assert len(sub) == 3
        for i, (bk, c) in enumerate(ranked):
            assert int(sub.loc[i, "rank"]) == i + 1
            assert int(sub.loc[i, "dev"]) == abs(c - med)
            # pandas Timestamp.value is ns
            assert int(sub.loc[i, "bucket_ts"].value) // 1000 == bk * tier_us


def test_weekly_cascade_matches_direct(ray_session, tmp_path):
    """1d -> 1w cascade hop == direct weekly rollup (E4 extended one tier)."""
    from mq_to_db_ray.pipelines.events import events_rollup_cascaded

    types, ts, _ = _write_events(tmp_path, seed=151, n=900,
                                 minutes=60 * 24 * 20)
    out = (
        events_rollup_cascaded(str(tmp_path), "1w")
        .to_pandas()
        .sort_values(["source", "bucket_ts"])
        .reset_index(drop=True)
    )
    from mq_to_db_ray.pipelines.events import EVENTS_T0_US

    # weeks are t0-aligned (2024-01-01, a Monday), not epoch-aligned
    week_us = 7 * 86400 * 1_000_000
    per = collections.Counter(
        zip(types.tolist(), ((ts - EVENTS_T0_US) // week_us).tolist())
    )
    assert len(out) == len(per)
    for _, row in out.iterrows():
        wk = (row.bucket_ts.value // 1000 - EVENTS_T0_US) // week_us
        assert per[(row.source, wk)] == int(row["count"])


def test_leadlag_matches_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_leadlag_corr

    types, ts, _ = _write_events(tmp_path, seed=157, n=900, minutes=180)
    rolled = _rolled(types, ts)
    srcs = sorted(set(types.tolist()))

    out = (
        events_leadlag_corr(str(tmp_path))
        .to_pandas()
        .set_index(["src_a", "src_b"])
        .sort_index()
    )
    assert len(out) == len(srcs) ** 2
    for a in srcs:
        ca = {bk: c for (s, bk), c in rolled.items() if s == a}
        for b in srcs:
            cb = {bk: c for (s, bk), c in rolled.items() if s == b}
            want = sum(c * cb.get(bk + 1, 0) for bk, c in ca.items())
            assert int(out.loc[(a, b), "s_ab_lag1"]) == want


def test_alert_episodes_matches_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_alert_episodes

    types, ts, _ = _write_events(tmp_path, seed=163, n=1500, minutes=240)
    rolled = _rolled(types, ts)

    out = (
        events_alert_episodes(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    for src in sorted(set(types.tolist())):
        per = {bk: c for (s, bk), c in rolled.items() if s == src}
        lo, hi = min(per), max(per)
        med = _disc_median([per.get(bk, 0) for bk in range(lo, hi + 1)])
        hot = sorted(bk for bk, c in per.items() if c > med)
        if not hot:
            assert src not in out.index
            continue
        runs = []
        cur = 1
        for prev, nxt in zip(hot, hot[1:]):
            if nxt == prev + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        assert int(out.loc[src, "max_episode"]) == max(runs)
        assert int(out.loc[src, "n_episodes"]) == len(runs)
        assert int(out.loc[src, "n_hot"]) == len(hot)


def test_grid_quantiles_matches_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_grid_quantiles

    types, ts, _ = _write_events(tmp_path, seed=167, n=1400, minutes=300)
    rolled = _rolled(types, ts)

    out = (
        events_grid_quantiles(str(tmp_path))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    for src in sorted(set(types.tolist())):
        per = {bk: c for (s, bk), c in rolled.items() if s == src}
        lo, hi = min(per), max(per)
        grid = sorted(per.get(bk, 0) for bk in range(lo, hi + 1))
        n = len(grid)
        for name, q in (("p50", 500), ("p90", 900), ("p99", 990)):
            want = grid[(n * q + 999) // 1000 - 1]
            assert int(out.loc[src, name]) == want


def test_peak_minute_matches_bruteforce(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.events import events_peak_minute_1h

    types, ts, _ = _write_events(tmp_path, seed=173, n=1200, minutes=240)
    rolled = _rolled(types, ts)

    out = (
        events_peak_minute_1h(str(tmp_path))
        .to_pandas()
        .sort_values(["source", "hour_ts"])
        .reset_index(drop=True)
    )
    want = {}
    for (src, bk), c in rolled.items():
        h = bk // 60
        cur = want.get((src, h))
        # count DESC, earliest minute on ties
        if cur is None or (c, -bk) > (cur[1], -cur[0]):
            want[(src, h)] = (bk, c)
    assert len(out) == len(want)
    for _, row in out.iterrows():
        h = (row.hour_ts.value // 1000) // (3600 * 1_000_000)
        bk, c = want[(row.source, h)]
        assert int(row.bucket_ts.value // 1000) == bk * TIER_US
        assert int(row["count"]) == c


def test_length_hist_matches_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.training_data import length_hist

    g = np.random.default_rng(179)
    n = 500
    srcs = np.array(["web", "book", "code"])[g.integers(0, 3, n)]
    # hit bin edges: 0, 1, powers of two, one huge doc
    n_chars = g.integers(0, 5000, n).astype(np.int64)
    n_chars[:8] = [0, 1, 2, 3, 4, 1023, 1024, 1025]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["x"] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array(srcs.tolist()),
            "n_chars": pa.array(n_chars),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    out = (
        length_hist(str(tmp_path))
        .to_pandas()
        .set_index(["source", "len_bin"])
        .sort_index()
    )
    want = collections.Counter(
        (s, int(c).bit_length()) for s, c in zip(srcs.tolist(), n_chars)
    )
    assert len(out) == len(want)
    for (s, b), c in want.items():
        assert int(out.loc[(s, b), "n_docs"]) == c


def test_lang_mix_matches_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.training_data import lang_mix

    g = np.random.default_rng(181)
    n = 400
    srcs = np.array(["web", "book"])[g.integers(0, 2, n)]
    langs = np.array(["en", "de", "fr"])[g.integers(0, 3, n)]
    n_chars = g.integers(0, 900, n).astype(np.int64)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["x"] * n),
            "lang": pa.array(langs.tolist()),
            "source": pa.array(srcs.tolist()),
            "n_chars": pa.array(n_chars),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")

    out = (
        lang_mix(str(tmp_path))
        .to_pandas()
        .set_index(["source", "lang"])
        .sort_index()
    )
    docs = collections.Counter(zip(srcs.tolist(), langs.tolist()))
    chars = collections.Counter()
    for s, l, c in zip(srcs.tolist(), langs.tolist(), n_chars.tolist()):
        chars[(s, l)] += c
    assert len(out) == len(docs)
    for k, nd in docs.items():
        assert int(out.loc[k, "n_docs"]) == nd
        assert int(out.loc[k, "sum_chars"]) == chars[k]
