"""Regression tests for the round-2 advice findings: EPERM pid liveness,
flock raw-commit mutual exclusion, compaction retiring series blobs,
int64-exact stratified rank for large doc_ids, BruteForceTopK id column."""

from __future__ import annotations

import os
import threading

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_pid_alive_eperm_means_alive(monkeypatch):
    """EPERM from kill(pid, 0) proves the process EXISTS (another user's
    replica) — treating it as dead would rmtree a live staging tree."""
    from mq_to_db_ray.state.manifest import Manifest

    def fake_kill(pid, sig):
        raise PermissionError

    monkeypatch.setattr(os, "kill", fake_kill)
    assert Manifest._pid_alive(12345) is True

    def fake_kill2(pid, sig):
        raise ProcessLookupError

    monkeypatch.setattr(os, "kill", fake_kill2)
    assert Manifest._pid_alive(12345) is False


def test_raw_commit_flock_single_winner(tmp_path):
    """Two concurrent committers of the same epoch: exactly one renames its
    staging into place, the loser discards, no crash, one manifest entry."""
    from mq_to_db_ray.pipelines.cascade import _commit_raw_dir
    from mq_to_db_ray.state.manifest import Manifest

    out = str(tmp_path / "out")
    manifest = Manifest(out)
    raw_dir = os.path.join(out, "tier=raw/epoch=deadbeef")
    os.makedirs(os.path.dirname(raw_dir), exist_ok=True)

    stagings = []
    for i in range(4):
        s = os.path.join(out, "_staging", f"run{i}", "raw")
        os.makedirs(s)
        pq.write_table(pa.table({"seq": [1, 2, 3]}), os.path.join(s, "p.parquet"))
        stagings.append(s)

    errs = []

    def worker(s):
        try:
            _commit_raw_dir(manifest, s, raw_dir, "epoch=deadbeef", "deadbeef")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(s,)) for s in stagings]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    assert manifest.is_committed("raw", "epoch=deadbeef")
    assert os.path.isdir(raw_dir) and os.listdir(raw_dir) == ["p.parquet"]
    for s in stagings:  # every loser discarded its staging
        assert not os.path.exists(s)


def test_compact_retires_series_blobs(ray_session, tmp_path):
    """Compaction must retire the replaced epochs' series blobs and commit
    one re-encoded blob per compacted source (else series files accrete
    unboundedly in watch mode)."""
    from mq_to_db_ray.functions.dod import dod_decode
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade
    from mq_to_db_ray.pipelines.compact import compact_tier
    from mq_to_db_ray.pipelines.view import tier_view
    from mq_to_db_ray.state.manifest import Manifest

    in_dir = str(tmp_path / "in")
    files = write_f1_parquet(in_dir, 24_000, shards=4, max_tok=8,
                             layout="contiguous")
    out = str(tmp_path / "out")
    run_cascade(files[:2], out)
    run_cascade(files[2:], out)

    m = Manifest(out)

    def series_keys():
        return {
            k for k, e in m.committed("1m").items()
            if e["partition"].startswith("series__")
        }

    before = series_keys()
    report = compact_tier(out, "1m")
    assert report["compacted_sources"] >= 5
    after = series_keys()

    # every compacted source: its per-epoch blobs gone, one c-blob live
    epoch_blobs_after = {k for k in after if "__series__e" in k}
    compacted_blobs = {k for k in after if "__series__c" in k}
    assert len(compacted_blobs) == report["compacted_sources"]
    # per-epoch blobs remain only for sources that were NOT compacted
    assert len(epoch_blobs_after) == len(before) - 2 * report["compacted_sources"]
    # retired blob files are deleted
    for k in before - after:
        e = [v for kk, v in m.committed("1m", include_retired=True).items() if kk == k]
        assert e and not os.path.exists(os.path.join(out, e[0]["path"]))

    # the re-encoded blob round-trips to the compacted partition's series
    view = tier_view(out, "1m", gap=True).to_pandas()
    some = next(iter(compacted_blobs))
    entry = m.committed("1m")[some]
    blob = pq.read_table(os.path.join(out, entry["path"])).to_pylist()[0]
    src_series = (
        view[view["source"] == blob["source"]]
        .sort_values("bucket_ts")["sum_n_tok"]
        .tolist()
    )
    assert dod_decode(blob["dod_blob"]) == src_series


def test_stratified_rank_exact_for_large_doc_ids():
    """((doc_id % P) * K) % P stays below 2^63 — bit-exact vs unbounded-int
    arithmetic even where a raw doc_id*K would wrap numpy int64."""
    P, K = 1_000_000_007, 2654435761
    ids = np.array([0, 1, 3_470_000_000, 2**62, 2**63 - 1], dtype=np.int64)
    got = ((ids % P) * K) % P
    want = [(int(d) * K) % P for d in ids]
    assert got.tolist() == want


def test_jaccard_df_cap_bounds_hot_shingle(ray_session, tmp_path):
    """A stop-shingle shared by 1k docs must NOT explode into ~500k pairs:
    the df cap drops it before pair emission, while true near-dup pairs
    (whose shingles are rare by construction) are unaffected."""
    from mq_to_db_ray.pipelines import training_data as td

    texts, ids = [], []
    for i in range(1000):  # every doc shares the 'alpha beta gamma' shingle
        ids.append(i)
        texts.append(f"alpha beta gamma u{i} v{i} w{i}")
    dup = "one two three four five six seven eight"
    ids += [5000, 5001]
    texts += [dup, dup]
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts}),
        str(tmp_path / "documents.parquet"),
    )
    out = td.jaccard_pairs(str(tmp_path), df_cap=64).to_pandas()
    assert set(zip(out["doc_a"], out["doc_b"])) == {(5000, 5001)}
    assert out["jaccard_permille"].tolist() == [1000]
    # the large-corpus path (sizes ride the shuffle, no broadcast) must
    # produce the identical result
    big = td.jaccard_pairs(str(tmp_path), df_cap=64, broadcast_cap=0).to_pandas()
    assert big.sort_values(["doc_a", "doc_b"]).reset_index(drop=True).equals(
        out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )


def test_near_dup_lsh_recall_vs_exact(ray_session):
    """The bucketed near-dup scale path: every emitted pair must be a TRUE
    pair with the exact similarity (precision 1.0 — buckets are scored
    exactly), and multi-table recall must stay high (deterministic planes:
    13/14 at sf0.01 with p=4, L=8)."""
    from mq_to_db_ray.pipelines import training_data as td

    sf = "/root/testdata/sf0.01"
    exact = td.embedding_near_dup(sf).to_pandas()
    lsh = td.embedding_near_dup_lsh(sf).to_pandas()
    e = set(zip(exact["vec_a"], exact["vec_b"], exact["sim_permille"]))
    l = set(zip(lsh["vec_a"], lsh["vec_b"], lsh["sim_permille"]))
    assert l <= e  # precision 1.0: exact sims, no false pairs
    assert len(e & l) / len(e) >= 0.7


def test_windowed_gapfill_matches_unwindowed(ray_session):
    """A multi-year source: (source, window) gap-fill must produce EXACTLY
    the per-source dense series — including windows that are pure gap."""
    import pandas as pd
    import ray.data as rd

    from mq_to_db_ray.stages.gapfill import gap_fill
    from mq_to_db_ray.stages.rollup import rollup

    rng = np.random.RandomState(3)
    # sparse multi-year span: 3000 random minutes over ~2.1M buckets
    # (4 years at 1m), plus a second short source; huge interior gaps
    seqs = np.unique(rng.randint(0, 2_100_000, size=3000)) * 60
    t = pa.table(
        {
            "source": pa.array(
                ["long"] * len(seqs) + ["short"] * 5, type=pa.string()
            ),
            "seq": pa.array(
                np.concatenate([seqs, np.arange(5) * 60]), type=pa.int64()
            ),
            "n_tok": pa.array(
                np.full(len(seqs) + 5, 7, dtype=np.int32), type=pa.int32()
            ),
        }
    )
    rolled = rollup(rd.from_arrow(t), "1m").materialize()

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["source", "bucket_ts"]).reset_index(drop=True)

    # windowed (small window -> 'long' spans ~513 windows) vs one-window
    small = norm(gap_fill(rolled, "1m", window_buckets=4096).to_pandas())
    one = norm(gap_fill(rolled, "1m", window_buckets=1 << 40).to_pandas())
    lo, hi = seqs.min() // 60, seqs.max() // 60
    assert len(small[small["source"] == "long"]) == hi - lo + 1
    assert small.equals(one)


def test_windowed_cascade_partitions_and_resume(ray_session, tmp_path):
    """Cascade with a tiny window: multiple partitions+series blobs per
    source, view identical to the unwindowed run, resume skips them all."""
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade
    from mq_to_db_ray.pipelines.view import tier_view
    from mq_to_db_ray.state.manifest import Manifest

    in_dir = str(tmp_path / "in")
    write_f1_parquet(in_dir, 12_000, shards=2, max_tok=8)
    out_w = str(tmp_path / "out_w")
    s1 = run_cascade(in_dir, out_w, window_buckets=16)
    assert s1["partitions"]["1m"] > 8  # more than one partition per source
    out_u = str(tmp_path / "out_u")
    run_cascade(in_dir, out_u)

    def v(out):
        return (
            tier_view(out, "1m", gap=True)
            .to_pandas()
            .sort_values(["source", "bucket_ts"])
            .reset_index(drop=True)
        )

    assert v(out_w).equals(v(out_u))
    m = Manifest(out_w)
    series = [
        k for k, e in m.committed("1m").items()
        if e["partition"].startswith("series__")
    ]
    assert len(series) == s1["partitions"]["1m"]  # one blob per partition
    s2 = run_cascade(in_dir, out_w, window_buckets=16)
    assert s2["skipped"] == s2["partitions"]  # resume: everything skipped


def test_envelope_metadata_columns_ride_through():
    """Optional envelope metadata (Priority/ContentType analogs,
    reference consumer.go:80-91) must survive validation untouched on BOTH
    the fast (all-valid) and slow (mixed) paths; rejects stay canonical."""
    from mq_to_db_ray.stages.validate import split_batch

    def envelope(doc_ids):
        n = len(doc_ids)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "tokens": pa.array([[1, 2]] * n, type=pa.list_(pa.int32())),
                "n_tok": pa.array([2] * n, type=pa.int32()),
                "source": pa.array(["s0"] * n),
                "priority": pa.array(list(range(n)), type=pa.uint8()),
                "content_type": pa.array(["application/json"] * n),
            }
        )

    # fast path: every row valid
    valid, rejects = split_batch(envelope(["s0-1", "s0-2"]))
    assert rejects.num_rows == 0
    assert valid["priority"].to_pylist() == [0, 1]
    assert "content_type" in valid.schema.names and "seq" in valid.schema.names

    # slow path: one unparseable doc_id
    valid, rejects = split_batch(envelope(["s0-1", "nope"]))
    assert valid.num_rows == 1 and rejects.num_rows == 1
    assert valid["priority"].to_pylist() == [0]
    assert valid["content_type"][0].as_py() == "application/json"
    assert valid["seq"][0].as_py() == 1
    assert rejects.schema.names == ["doc_id", "source", "reason", "detail"]


def test_simhash_near_dup_exact_by_pigeonhole(ray_session):
    """Banded SimHash near-dup must find EXACTLY the brute-force Hamming
    pairs (pigeonhole: hamming <= 3 implies one of 4 bands agrees)."""
    from mq_to_db_ray.pipelines import training_data as td

    sf = "/root/testdata/sf0.01"
    hs = td.simhash(sf).to_pandas().sort_values("doc_id")
    ids = hs["doc_id"].to_numpy()
    h = hs["simhash"].to_numpy().view(np.uint64)
    ai, bi = np.triu_indices(len(ids), 1)
    x = h[ai] ^ h[bi]
    ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
    want = {
        (int(ids[a]), int(ids[b]), int(d))
        for a, b, d in zip(ai[ham <= 3], bi[ham <= 3], ham[ham <= 3])
    }
    got_df = td.simhash_near_dup(sf).to_pandas()
    got = set(
        zip(got_df["doc_a"], got_df["doc_b"], got_df["hamming"])
    )
    assert got == want and len(want) > 0


def test_layout_pin_refuses_changed_window(ray_session, tmp_path):
    """window_buckets is a layout parameter: re-running an out_dir with a
    different value would commit differently-named copies of the same data
    and double-count every view — the manifest pin must refuse it."""
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade

    in_dir = str(tmp_path / "in")
    write_f1_parquet(in_dir, 2_000, shards=2, max_tok=8)
    out = str(tmp_path / "out")
    run_cascade(in_dir, out, window_buckets=64)
    run_cascade(in_dir, out, window_buckets=64)  # same layout: fine
    with pytest.raises(ValueError, match="layout mismatch"):
        run_cascade(in_dir, out, window_buckets=128)


def test_compact_respects_pinned_window(ray_session, tmp_path):
    """Compaction must fold within the out_dir's PINNED window grid, never
    across it — two epochs of a source spanning 2 windows (pinned wb=16)
    compact to one partition PER WINDOW, and the view is unchanged."""
    from mq_to_db_ray.gen import write_f1_parquet
    from mq_to_db_ray.pipelines.cascade import run_cascade
    from mq_to_db_ray.pipelines.compact import compact_tier
    from mq_to_db_ray.pipelines.view import tier_view
    from mq_to_db_ray.state.manifest import Manifest

    in_dir = str(tmp_path / "in")
    files = write_f1_parquet(in_dir, 12_000, shards=4, max_tok=8,
                             layout="contiguous")
    out = str(tmp_path / "out")
    run_cascade(files[:2], out, window_buckets=16)
    run_cascade(files[2:], out, window_buckets=16)
    before = (
        tier_view(out, "1m").to_pandas()
        .sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    )
    compact_tier(out, "1m")  # no explicit wb: must pick up the pinned 16
    m = Manifest(out)
    live = [
        e for e in m.committed("1m").values()
        if not e["partition"].startswith("series__") and "bucket_lo" in e
    ]
    # every live partition stays inside one pinned window
    for e in live:
        assert e["bucket_lo"] // 16 == e["bucket_hi"] // 16, e["partition"]
    after = (
        tier_view(out, "1m").to_pandas()
        .sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    )
    assert after.equals(before)


def test_fingerprint_fast_matches_scalar():
    import pyarrow.parquet as _pq

    from mq_to_db_ray.functions import textstats as ts

    texts = _pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )["text"].to_pylist()[:100]
    h = ts.WordHasher()
    for t in texts + ["", "one", "a b c", "a b c d e f g h", "x " * 50]:
        assert ts.doc_fingerprint_fast(t, hasher=h) == ts.doc_fingerprint(t)


def test_ann_lsh_multitable_recall(ray_session):
    """Multi-table LSH ANN must return a full top-k with decent recall
    (deterministic planes: 0.9/0.7 at sf0.001/sf0.01 with p=4, L=16)."""
    from mq_to_db_ray.pipelines.training_data import ann_lsh_topk, ann_topk

    sf = "/root/testdata/sf0.01"
    exact = set(ann_topk(sf, k=10).to_pandas()["vec_id"])
    lsh = ann_lsh_topk(sf, k=10).to_pandas()
    assert len(lsh) == 10
    assert len(exact & set(lsh["vec_id"])) / 10 >= 0.5


def test_lang_id_vectorized_matches_scalar(ray_session):
    from mq_to_db_ray.functions import textstats as ts
    from mq_to_db_ray.pipelines import training_data as td
    import pyarrow.parquet as _pq

    sf = "/root/testdata/sf0.01"
    got = (
        td.lang_id(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    docs = _pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = [ts.lang_id(t) for t in docs["text"]]
    assert got["lang_pred"].tolist() == want


def test_cosine_topk_custom_id_col(ray_session):
    import ray.data as rd

    from mq_to_db_ray.functions.similarity import cosine_topk

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.5, 0.5]],
                type=pa.list_(pa.float64()),
            ),
        }
    )
    top = cosine_topk(
        rd.from_arrow(t), np.array([[1.0, 0.0]]), k=2,
        id_col="doc_id", vec_col="embedding",
    ).to_pandas()
    assert list(top.columns) == ["doc_id", "sim"]
    assert top["doc_id"].tolist() == [1, 2]


def test_batch_kernels_match_scalar():
    """Round-3: the whole-column fingerprint/simhash kernels (flattened
    parent-indices formulation) must be value-identical to the scalar
    references, including short/empty/multi-space docs."""
    import pyarrow as pa

    from mq_to_db_ray.functions import textstats as ts

    rng = np.random.RandomState(11)
    words = [f"w{i}" for i in range(64)]
    texts = [
        "", "one", "a b", "  leading", "trailing  ",
        " ".join(["x"] * 7), " ".join(["y"] * 8), " ".join(["z"] * 9),
    ] + [
        " ".join(rng.choice(words, size=rng.randint(1, 40)))
        for _ in range(200)
    ]
    col = pa.array(texts)
    fb = ts.fingerprint_batch(col)
    sb = ts.simhash_batch(col)
    for i, t in enumerate(texts):
        assert int(fb[i]) == ts.doc_fingerprint(t), t
        assert int(sb[i]) == ts.simhash(t), t
