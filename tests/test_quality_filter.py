"""Round-3 document-quality additions: vectorized batch shingling,
duplicate-n-gram fraction, blocklist scrub, and the fused keep-decision
(quality_filter) — the composite must equal the intersection of its
standalone oracle-checked predicates."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_shingles_flat_matches_scalar():
    from mq_to_db_ray.functions import textstats as ts

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a b",
        "",
        "solo",
        "one two three",
        "dup dup dup dup dup",
        "x y z x y z x y z",
    ]
    rows, flat = ts.shingles_flat(pa.array(texts))
    h = ts.WordHasher()
    for i, t in enumerate(texts):
        ref = np.sort(ts.shingles(t, hasher=h))
        got = flat[rows == i]
        assert np.array_equal(ref, got), i
        # per-row output is sorted unique
        assert np.all(np.diff(got.astype(np.uint64)) > 0) or len(got) <= 1


def test_dup_ngrams_matches_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from mq_to_db_ray.functions import textstats as ts
    from mq_to_db_ray.pipelines.training_data import dup_ngrams

    texts = [
        "alpha beta gamma delta",      # shares "alpha beta gamma" with doc 1
        "alpha beta gamma epsilon",
        "unique words only here now",
        "alpha beta",                   # short doc: joined-text shingle
        "alpha beta",                   # duplicate short doc
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts)}
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = (
        dup_ngrams(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # brute force over hashed shingles (same convention)
    h = ts.WordHasher()
    sets = [set(ts.shingles(t, hasher=h).tolist()) for t in texts]
    from collections import Counter

    df = Counter(s for ss in sets for s in ss)
    for i, ss in enumerate(sets):
        nd = sum(1 for s in ss if df[s] > 1)
        row = got.iloc[i]
        assert row["n_shingles"] == len(ss)
        assert row["n_dup_shingles"] == nd
        assert row["dup_permille"] == int(1000 * nd / max(len(ss), 1))


def test_word_scrub_counts_and_masks(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.training_data import word_scrub

    texts = [
        "spark table customer row",
        "sparkly customers",  # word boundaries: no match inside longer words
        "spark spark spark",
        "",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts)}
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = (
        word_scrub(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_redactions"].tolist() == [2, 0, 3, 0]
    assert got["clean_text"].tolist() == [
        "<MASK> table <MASK> row",
        "sparkly customers",
        "<MASK> <MASK> <MASK>",
        "",
    ]


def test_quality_filter_equals_predicate_intersection(ray_session):
    """The fused pass must keep exactly the docs that independently pass
    every standalone operator's oracle-checked predicate at sf0.001."""
    sf = "/root/testdata/sf0.001"
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.training_data import (
        contamination,
        quality_filter,
        quality_score,
        repetition,
    )

    kept = set(quality_filter(sf).to_pandas()["doc_id"])

    rep = repetition(sf).to_pandas().set_index("doc_id")
    qua = quality_score(sf).to_pandas().set_index("doc_id")
    con = contamination(sf).to_pandas().set_index("doc_id")
    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pandas().set_index("doc_id")

    expect = set()
    for d in docs.index:
        if (
            docs.loc[d, "lang"] == "en"
            and 20 <= rep.loc[d, "n_words"] <= 90
            and rep.loc[d, "dup_word_permille"] <= 600
            and rep.loc[d, "top_word_permille"] <= 130
            and qua.loc[d, "stop_permille"] >= 20
            and not con.loc[d, "contaminated"]
        ):
            expect.add(d)
    assert kept == expect
    assert len(kept) > 0


def test_corpus_prep_is_composition_of_stages(ray_session):
    """corpus_prep == (quality_filter ∩ near_dedup_keep) packed by the
    per-source exclusive cumsum in doc_id order."""
    sf = "/root/testdata/sf0.001"
    from mq_to_db_ray.pipelines.corpus import corpus_prep
    from mq_to_db_ray.pipelines.training_data import (
        near_dedup_keep,
        quality_filter,
    )

    got = (
        corpus_prep(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    q = quality_filter(sf).to_pandas().set_index("doc_id")
    surv = set(near_dedup_keep(sf).to_pandas()["doc_id"])
    kept = sorted(set(q.index) & surv)
    assert got["doc_id"].tolist() == kept
    off = {}
    for d in kept:  # kept is doc_id-sorted, so cumsum order == scan order
        s = q.loc[d, "source"]
        o = off.get(s, 0)
        row = got[got["doc_id"] == d].iloc[0]
        assert (row["pack_id"], row["pack_offset"]) == (o // 256, o % 256)
        off[s] = o + int(q.loc[d, "n_words"])
    assert len(kept) > 0
