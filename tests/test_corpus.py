"""Corpus-composition operators (pipelines/corpus.py): sequence packing,
global shuffle rank, mixture sampling, vocab-id mapping — each checked
against a scalar pandas/numpy reference on the sf0.001 driver table, plus
structural laws (prefix-scan contiguity, permutation, chunk independence).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
P = 1_000_000_007


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source", "text"])
    df = t.to_pandas()
    df["n_tok"] = df["text"].map(lambda s: len(s.split(" ")))
    return df


# ---------------------------------------------------------------- packing


def _ref_pack(df: pd.DataFrame, ctx: int) -> pd.DataFrame:
    d = df.sort_values(["source", "doc_id"]).copy()
    off = d.groupby("source")["n_tok"].cumsum() - d["n_tok"]
    d["pack_id"] = off // ctx
    d["pack_offset"] = off % ctx
    return d[["doc_id", "source", "pack_id", "pack_offset"]]


def test_pack_sequences_matches_reference(ray_session, docs):
    from mq_to_db_ray.pipelines.corpus import pack_sequences

    got = (
        pack_sequences(SF, ctx=256, chunk=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _ref_pack(docs, 256).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_pack_sequences_chunk_size_invariant(ray_session, docs):
    """The chunking is pure partitioning — any chunk size gives the same
    packing (the scan bases must stitch chunk boundaries exactly)."""
    from mq_to_db_ray.pipelines.corpus import pack_sequences

    a = (
        pack_sequences(SF, ctx=128, chunk=7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        pack_sequences(SF, ctx=128, chunk=1000)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_pack_sequences_stream_laws(ray_session, docs):
    """Per source (ordered by doc_id): offsets start at 0, advance by
    exactly the previous doc's token count, and pack_offset < ctx."""
    from mq_to_db_ray.pipelines.corpus import pack_sequences

    ctx = 256
    got = pack_sequences(SF, ctx=ctx, chunk=64).to_pandas()
    assert (got["pack_offset"] < ctx).all() and (got["pack_offset"] >= 0).all()
    merged = got.merge(docs[["doc_id", "n_tok"]], on="doc_id")
    for _, g in merged.sort_values("doc_id").groupby("source"):
        off = (g["pack_id"] * ctx + g["pack_offset"]).to_numpy()
        n = g["n_tok"].to_numpy()
        assert off[0] == 0
        assert (np.diff(off) == n[:-1]).all()


# ---------------------------------------------------------- shuffle rank


def test_shuffle_rank_is_hash_order_permutation(ray_session, docs):
    from mq_to_db_ray.pipelines.corpus import K_SHUFFLE, shuffle_rank

    got_raw = shuffle_rank(SF, nchunks=16).to_pandas()
    n = len(docs)
    assert sorted(got_raw["shuffle_pos"]) == list(range(n))
    r = ((docs["doc_id"].to_numpy() % P) * K_SHUFFLE) % P
    order = np.lexsort((docs["doc_id"].to_numpy(), r))
    exp = pd.DataFrame(
        {
            "doc_id": docs["doc_id"].to_numpy()[order],
            "shuffle_pos": np.arange(n, dtype=np.int64),
        }
    )
    got = got_raw.sort_values("shuffle_pos").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_shuffle_rank_nchunks_invariant(ray_session):
    from mq_to_db_ray.pipelines.corpus import shuffle_rank

    a = shuffle_rank(SF, nchunks=4).to_pandas().sort_values("doc_id")
    b = shuffle_rank(SF, nchunks=128).to_pandas().sort_values("doc_id")
    assert (a["shuffle_pos"].to_numpy() == b["shuffle_pos"].to_numpy()).all()


# -------------------------------------------------------- mixture sample


def test_mixture_sample_matches_reference(ray_session, docs):
    from mq_to_db_ray.pipelines.corpus import K_MIX, mixture_sample

    got = set(mixture_sample(SF).to_pandas()["doc_id"])
    d = docs["doc_id"].to_numpy()
    suffix = docs["source"].str.extract(r"([0-9]+)$")[0].astype(int).to_numpy()
    keep = ((d % P) * K_MIX) % P % 1000 < 100 + 40 * suffix
    assert got == set(d[keep])
    # sanity: selection is per-source graded, not uniform
    kept = docs[keep]
    lo = (kept["source"] == "src0").sum() / (docs["source"] == "src0").sum()
    hi = (kept["source"] == "src19").sum() / (docs["source"] == "src19").sum()
    assert lo < hi


# ------------------------------------------------------------- vocab ids


def test_vocab_ids_matches_reference(ray_session, docs):
    from collections import Counter

    from mq_to_db_ray.pipelines.corpus import vocab_ids

    counts: Counter[str] = Counter()
    for t in docs["text"]:
        counts.update(t.split(" "))
    vocab = {
        w: i
        for i, (w, _) in enumerate(
            sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:16]
        )
    }
    rows = []
    for did, t in zip(docs["doc_id"], docs["text"]):
        ws = t.split(" ")
        ids = [vocab[w] for w in ws if w in vocab]
        rows.append(
            {
                "doc_id": did,
                "n_words": len(ws),
                "n_oov": len(ws) - len(ids),
                "sum_ids": sum(ids),
            }
        )
    exp = pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)
    got = (
        vocab_ids(SF, v=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["n_oov"].sum() > 0  # V=16 < 31 distinct words: OOV is real


# ---------------------------------------------------------- length filter


def test_length_filter_matches_quantile_disc_reference(ray_session, docs):
    from mq_to_db_ray.pipelines.training_data import length_filter

    got = set(length_filter(SF).to_pandas()["doc_id"])
    import math

    exp = set()
    for _, g in docs.groupby("source"):
        n = np.sort(g["n_tok"].to_numpy())
        total = len(n)
        lo = n[math.ceil(total * 0.1) - 1] if total else 0
        hi = n[math.ceil(total * 0.9) - 1] if total else 0
        exp |= set(g.loc[(g["n_tok"] >= lo) & (g["n_tok"] <= hi), "doc_id"])
    assert got == exp
    assert 0 < len(got) < len(docs)  # the filter actually drops outliers
