"""doc_top_terms (integer-exact TF-IDF ranking) and f1_bigram_topk (token
bigram heavy hitters) vs scalar brute force."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_top_terms_matches_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.training_data import top_terms

    texts = [
        "b b b a a c",          # tf ties: a(2) vs c(1); b wins
        "z y x",                # all tf=1: df then term breaks ties
        "a a z z q",            # tf tie a/z -> df decides (a in 2 docs)
        "solo",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts)}
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = (
        top_terms(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )

    from collections import Counter

    tfs = [Counter(t.split(" ")) for t in texts]
    df = Counter(w for tf in tfs for w in tf)
    expect = []
    for d, tf in enumerate(tfs):
        ranked = sorted(tf.items(), key=lambda kv: (-kv[1], df[kv[0]], kv[0]))
        for r, (w, n) in enumerate(ranked[:3], start=1):
            expect.append((d, w, n, df[w], r))
    assert len(got) == len(expect)
    for row, (d, w, n, dfv, r) in zip(got.itertuples(index=False), expect):
        assert (row.doc_id, row.term, row.tf, row.df, row.rank) == (
            d, w, n, dfv, r,
        )


def test_bigram_topk_matches_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.training_data import bigram_topk

    rng = np.random.default_rng(3)
    toks = [rng.integers(0, 5, rng.integers(0, 12)).astype(np.int32)
            for _ in range(200)]
    tbl = pa.table({"tokens": pa.array([t.tolist() for t in toks],
                                       pa.list_(pa.int32()))})
    pq.write_table(tbl, tmp_path / "part-0.parquet")

    got = bigram_topk(str(tmp_path), k=10).to_pandas()

    from collections import Counter

    c = Counter()
    for t in toks:
        for i in range(len(t) - 1):
            c[(int(t[i]), int(t[i + 1]))] += 1
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert len(got) == len(expect)
    for row, ((a, b), n) in zip(got.itertuples(index=False), expect):
        assert (row.tok_a, row.tok_b, row.n) == (a, b, n)


def test_inverted_index_matches_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from mq_to_db_ray.pipelines.training_data import inverted_index

    texts = [
        "a b c",
        "a b",
        "a c c c",   # duplicate words collapse to one posting
        "a d",
        "b d",
    ]
    tbl = pa.table(
        {"doc_id": pa.array([10, 2, 33, 4, 5], pa.int64()),
         "text": pa.array(texts)}
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = (
        inverted_index(str(tmp_path), min_df=2)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    ids = [10, 2, 33, 4, 5]
    from collections import defaultdict

    post = defaultdict(set)
    for d, t in zip(ids, texts):
        for w in t.split(" "):
            post[w].add(d)
    expect = sorted(
        (w, len(s), ",".join(str(x) for x in sorted(s)))
        for w, s in post.items()
        if len(s) >= 2
    )
    assert len(got) == len(expect)
    for row, (w, df, p) in zip(got.itertuples(index=False), expect):
        assert (row.term, row.df, row.postings) == (w, df, p)
