"""dup_clusters (T20): distributed min-label propagation over the
near-dup pair graph. The chain corpus has diameter 3, so convergence
requires multiple propagation rounds — a single-round implementation
would leave the far end mislabeled."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def chain_docs(tmp_path_factory):
    """docs 0-1-2-3 form a similarity CHAIN (adjacent overlap only);
    docs 10,11 are an identical far-away pair; doc 20 is a singleton."""
    d = tmp_path_factory.mktemp("chain")
    words = [f"w{i:02d}" for i in range(30)]
    texts, ids = [], []
    for i in range(4):
        ids.append(i)
        texts.append(" ".join(words[6 * i: 6 * i + 12]))
    twin = "zz aa bb cc dd ee ff gg hh ii jj kk"
    ids += [10, 11, 20]
    texts += [twin, twin, "qq rr ss tt uu vv ww xx yy qz ab cd"]
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": texts,
            "lang": ["en"] * len(ids),
            "source": ["s"] * len(ids),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_chain_needs_multiround_propagation(ray_session, chain_docs):
    from mq_to_db_ray.pipelines.training_data import dup_clusters, jaccard_pairs

    pairs = jaccard_pairs(chain_docs).to_pandas()
    edge_set = set(zip(pairs["doc_a"], pairs["doc_b"]))
    # the chain exists and the skip pairs do not
    assert (0, 1) in edge_set and (1, 2) in edge_set and (2, 3) in edge_set
    assert (0, 2) not in edge_set and (0, 3) not in edge_set
    assert (10, 11) in edge_set

    got = (
        dup_clusters(chain_docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    labels = dict(zip(got["doc_id"], got["cluster_id"]))
    want = _union_find(edge_set)
    assert labels == want
    # chain collapses to min id 0; twins to 10; singleton absent
    assert labels[0] == labels[1] == labels[2] == labels[3] == 0
    assert labels[10] == labels[11] == 10
    assert 20 not in labels


def test_max_rounds_caps_propagation(ray_session, chain_docs):
    from mq_to_db_ray.pipelines.training_data import dup_clusters

    got = dup_clusters(chain_docs, max_rounds=1).to_pandas()
    labels = dict(zip(got["doc_id"], got["cluster_id"]))
    # one round moves labels one hop: node 3 sees node 2's ORIGINAL label
    assert labels[3] == 2 and labels[1] == 0


def test_near_dedup_keep_survivors(ray_session, chain_docs):
    from mq_to_db_ray.pipelines.training_data import near_dedup_keep

    got = near_dedup_keep(chain_docs).to_pandas()
    # chain 0-1-2-3 collapses to winner 0; twins (10,11) to 10; the
    # singleton 20 never entered the pair graph and survives untouched
    assert sorted(got["doc_id"].tolist()) == [0, 10, 20]
    assert set(got.columns) == {"doc_id", "source"}


def test_propagation_width_grows_with_edge_count(ray_session, monkeypatch):
    """The propagation shuffle width must scale with the edge-list size
    (VERDICT r3 #2): a hardcoded min(8, parts) cap would funnel a
    corpus-sized edge list through 8 partitions at every hop."""
    from mq_to_db_ray.stages import shuffle

    assert shuffle.width_for_rows(0, 65_536) == 8  # floor
    assert shuffle.width_for_rows(100, 65_536) == 8  # tiny input stays small
    # on a big cluster (the test session runs 4 CPUs, capping parts at 8)
    monkeypatch.setattr(shuffle, "shuffle_parts", lambda k=None: 256)
    assert shuffle.width_for_rows(2_000_000, 65_536) == 32  # grows with rows
    assert shuffle.width_for_rows(50_000_000, 65_536) == 256  # saturates
    assert shuffle.width_for_rows(10_000_000, 65_536) >= shuffle.width_for_rows(
        1_000_000, 65_536
    )


def test_cluster_cache_and_pairs_param(ray_session, chain_docs):
    """dup_clusters memoizes its materialized labels per session so
    near_dedup_keep / corpus_prep reuse them; an explicit pairs Dataset
    bypasses the cache and still yields identical clusters."""
    import ray.data as rd

    from mq_to_db_ray.pipelines.training_data import (
        dup_clusters,
        jaccard_pairs,
        near_dedup_keep,
    )

    a = dup_clusters(chain_docs)
    b = dup_clusters(chain_docs)
    assert a is b  # second call is the cached materialized dataset

    pairs = jaccard_pairs(chain_docs).materialize()
    c = dup_clusters(chain_docs, pairs=pairs)
    assert c is not a
    assert (
        c.to_pandas().sort_values("doc_id").values.tolist()
        == a.to_pandas().sort_values("doc_id").values.tolist()
    )

    # an explicit clusters Dataset short-circuits the chain entirely
    fake = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "cluster_id": pa.array([0, 0], pa.int64()),
            }
        )
    )
    got = near_dedup_keep(chain_docs, clusters=fake).to_pandas()
    assert sorted(got["doc_id"].tolist()) == [0, 2, 3, 10, 11, 20]
