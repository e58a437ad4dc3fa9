"""Repetition features and contamination check (training_data T18/T19):
vectorized kernels vs scalar brute force, and the contamination laws
(eval docs flag themselves; a doc sharing no shingle stays clean)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def tiny_docs(tmp_path_factory):
    """A corpus with controlled overlap: docs 0/1 are the 'eval set'; doc
    2 copies doc 0's opening; doc 3 shares nothing; doc 4 is one repeated
    word (repetition extremes)."""
    d = tmp_path_factory.mktemp("contam")
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine",
        "alpha beta gamma delta something else entirely here",
        "totally disjoint vocabulary nothing shared at all ok",
        "rep rep rep rep rep rep rep rep rep rep",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": texts,
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d), texts


def _brute_rep(text: str) -> tuple[int, int, int]:
    ws = text.split(" ")
    n = len(ws)
    from collections import Counter

    c = Counter(ws)
    dup = int(np.floor(1000.0 * (n - len(c)) / n))
    top = int(np.floor(1000.0 * max(c.values()) / n))
    return n, dup, top


def test_repetition_matches_bruteforce(ray_session, tiny_docs):
    from mq_to_db_ray.pipelines.training_data import repetition

    sf, texts = tiny_docs
    got = repetition(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, text in enumerate(texts):
        n, dup, top = _brute_rep(text)
        row = got.iloc[i]
        assert (row["n_words"], row["dup_word_permille"],
                row["top_word_permille"]) == (n, dup, top)
    # extremes: all-same doc has dup=900/1000-range and top=1000
    assert got.iloc[4]["top_word_permille"] == 1000
    assert got.iloc[3]["dup_word_permille"] == 0


def test_contamination_laws(ray_session, tiny_docs):
    from mq_to_db_ray.functions import textstats as ts
    from mq_to_db_ray.pipelines.training_data import contamination

    sf, texts = tiny_docs
    got = (
        contamination(sf, eval_max_doc_id=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # eval docs overlap themselves fully
    for i in (0, 1):
        assert bool(got.iloc[i]["contaminated"])
        assert got.iloc[i]["n_hits"] == len(ts.shingles(texts[i]))
    # doc 2 shares doc 0's opening trigrams, doc 3 shares nothing
    assert bool(got.iloc[2]["contaminated"]) and got.iloc[2]["n_hits"] == 2
    assert not bool(got.iloc[3]["contaminated"]) and got.iloc[3]["n_hits"] == 0
    # brute-force cross-check of every count
    ev = np.unique(
        np.concatenate([ts.shingles(texts[0]), ts.shingles(texts[1])])
    )
    for i, text in enumerate(texts):
        sh = ts.shingles(text)
        assert got.iloc[i]["n_hits"] == int(np.isin(sh, ev).sum())


def test_length_quantiles_semantics(ray_session, tmp_path):
    """quantile_disc semantics: rank = ceil(q*n), smallest value whose
    cumulative count reaches it — checked on a corpus with ties and a
    single-doc source."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.training_data import length_quantiles

    texts = {
        # source a: lengths 1,2,2,3  -> p50=2 (ceil(2)=2nd), p90=3, p99=3
        "a": ["x", "x y", "p q", "x y z"],
        # source b: single doc length 4 -> every quantile = 4
        "b": ["a b c d"],
    }
    rows_id, rows_t, rows_s = [], [], []
    i = 0
    for s, ts_ in texts.items():
        for t in ts_:
            rows_id.append(i); rows_t.append(t); rows_s.append(s); i += 1
    t = pa.table(
        {
            "doc_id": pa.array(rows_id, pa.int64()),
            "text": rows_t,
            "lang": ["en"] * i,
            "source": rows_s,
            "n_chars": pa.array([len(x) for x in rows_t], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = (
        length_quantiles(str(tmp_path))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    a = got[got["source"] == "a"].iloc[0]
    assert (a["n_docs"], a["p50"], a["p90"], a["p99"]) == (4, 2, 3, 3)
    b = got[got["source"] == "b"].iloc[0]
    assert (b["n_docs"], b["p50"], b["p90"], b["p99"]) == (1, 4, 4, 4)
