"""Round-4 wave-53 operator: T105 near-dup cluster-size histogram —
checked as a composition of jaccard_pairs + an independent union-find
on the chain corpus (4-doc chain + identical twins + singleton)."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_cluster_size_hist_vs_union_find(ray_session, tmp_path):
    from mq_to_db_ray.pipelines.training_data import (
        cluster_size_hist,
        jaccard_pairs,
    )

    words = [f"w{i:02d}" for i in range(30)]
    texts, ids = [], []
    for i in range(4):  # similarity chain 0-1-2-3
        ids.append(i)
        texts.append(" ".join(words[6 * i : 6 * i + 12]))
    twin = "zz aa bb cc dd ee ff gg hh ii jj kk"
    ids += [10, 11, 20]
    texts += [twin, twin, "qq rr ss tt uu vv ww xx yy qz ab cd"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(ids)),
                "source": pa.array(["s"] * len(ids)),
                "n_chars": pa.array([len(x) for x in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    pairs = jaccard_pairs(str(tmp_path)).to_pandas()
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = collections.defaultdict(set)
    for x in parent:
        members[find(x)].add(x)
    want = collections.Counter(len(m) for m in members.values())
    clustered = sum(len(m) for m in members.values())
    want[1] = len(ids) - clustered  # singleton row partitions the corpus

    got = cluster_size_hist(str(tmp_path)).to_pandas().set_index(
        "cluster_size"
    )
    assert len(got) == len(want)
    for sz, nc in want.items():
        r = got.loc[sz]
        assert int(r.n_clusters) == nc, sz
        assert int(r.n_docs) == nc * sz, sz
    assert int(got.n_docs.sum()) == len(ids)  # exact corpus partition
    # the chain must be ONE cluster of 4 (multi-round propagation), the
    # twins one cluster of 2, and exactly one singleton
    assert int(got.loc[4].n_clusters) == 1
    assert int(got.loc[2].n_clusters) == 1
    assert int(got.loc[1].n_clusters) == 1


def test_tokenizer_agreement_bruteforce(ray_session, tmp_path):
    import re

    from mq_to_db_ray.pipelines.training_data import tokenizer_agreement

    texts = [
        "plain words only here",
        "numbers 123 and punct!! mixed-case Words",
        "a,b,c;d 99bottles !!!",
        "   leading spaces   and   runs",
        "unicode straße café 42",
    ]
    srcs = ["s1", "s1", "s2", "s2", "s2"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(srcs),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )

    pat = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+")
    want = collections.defaultdict(lambda: [0, 0, 0, 0])
    for t, s in zip(texts, srcs):
        ws = len(t.split(" "))
        bpe = len(pat.findall(t))
        w = want[s]
        w[0] += 1
        w[1] += ws
        w[2] += bpe
        w[3] += abs(ws - bpe)

    got = tokenizer_agreement(str(tmp_path)).to_pandas().set_index("source")
    assert len(got) == 2
    for s, (nd, ws, bpe, dev) in want.items():
        r = got.loc[s]
        assert (
            int(r.n_docs), int(r.n_ws_tokens),
            int(r.n_bpe_tokens), int(r.abs_dev),
        ) == (nd, ws, bpe, dev), s
    assert int(got.abs_dev.sum()) > 0  # the tokenizers genuinely disagree
