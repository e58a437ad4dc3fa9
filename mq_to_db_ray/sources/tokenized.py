"""Sources: anything that yields an epoch ``Dataset`` in the INGEST schema.

The reference's Source abstraction is the two-method Go interface
(`consumer.Consumer`, /root/reference/internal/consumer/consumer.go:64-68 —
Connect/Consume/Close); ours is "a callable returning a Dataset for an
epoch".  Two implementations:

  * ``read_f1`` — Parquet already in INGEST shape (the engine's native
    corpus, FIXTURES §1).
  * ``tokenized_documents`` — adapts the driver's ``documents`` table
    (doc_id:int64, text, source) into INGEST rows by deterministic
    whitespace+hash tokenization, so the flagship cascade runs on driver
    testdata too.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

from ..functions.textstats import WordHasher
from ..gen import VOCAB


def read_f1(paths: list[str] | str) -> Dataset:
    return rd.read_parquet(paths)


class DocumentTokenizer:
    """documents row -> INGEST row.

    doc_id  -> "{source}-{doc_id:08d}"  (seq = the global doc_id — a pure
               row function, so event time never depends on block order)
    tokens  -> blake2b(word) % VOCAB per single-space-split word
    n_tok   -> len(words)  (== DuckDB len(str_split(text, ' ')))

    Stateful actor: the word-hash memo table lives across batches.
    """

    def __init__(self) -> None:
        self.hasher = WordHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sources = batch["source"].to_pylist()
        ids = batch["doc_id"].to_pylist()
        hh = self.hasher
        offsets = [0]
        values: list[int] = []
        n_toks = np.empty(len(texts), dtype=np.int32)
        for i, t in enumerate(texts):
            words = t.split(" ")
            values.extend(hh(w) % VOCAB for w in words)
            n_toks[i] = len(words)
            offsets.append(len(values))
        tokens = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(np.array(values, dtype=np.int32)),
        )
        doc_ids = pa.array(
            [f"{s}-{d:08d}" for s, d in zip(sources, ids)], type=pa.string()
        )
        return pa.Table.from_arrays(
            [doc_ids, tokens, pa.array(n_toks), pa.array(sources, type=pa.string())],
            names=["doc_id", "tokens", "n_tok", "source"],
        )


def tokenized_documents(sf_dir: str, *, concurrency: int | None = None) -> Dataset:
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return ds.map_batches(
        DocumentTokenizer,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency or 2,
    )
