"""JSONL epoch source — the reference's NATIVE payload format as a
first-class source.

The reference consumes newline-framed JSON messages from RabbitMQ and
type-checks each against one fixed Go struct
(`/root/reference/internal/messages/sql.go:29-36` — `json.Unmarshal`
fails on a type mismatch; negative test `sql_test.go:46-50`).  This
module is that contract for the engine: an epoch = a set of
newline-delimited JSON files whose objects carry the INGEST message
shape

    {"doc_id": str, "tokens": [int, ...], "n_tok": int, "source": str}

read with ``ray.data.read_json`` (Arrow's streaming JSON reader — one
read task per file/block, the same fan-out as the parquet source) and
CAST to the canonical Arrow ingest schema (tokens → list<int32>,
n_tok → int32).  The cast is the M1 parse step: a value that does not
fit the declared type (e.g. a token beyond int32) raises loudly at the
reading task, while SEMANTIC violations (n_tok ≠ len(tokens), empty
doc_id/source) flow on to the shared validate/reject lane exactly as
parquet rows do — the downstream validate → rollup → encode → commit
chain is format-agnostic by construction."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset

from ..gen import INGEST_SCHEMA


def read_jsonl(paths: list[str] | str, **read_kwargs) -> Dataset:
    """Read a JSONL epoch and cast it to the canonical INGEST schema."""
    ds = rd.read_json(paths, **read_kwargs)

    def cast(batch: pa.Table) -> pa.Table:
        cols = []
        for field in INGEST_SCHEMA:
            col = batch[field.name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols.append(pc.cast(col, field.type))
        return pa.Table.from_arrays(cols, schema=INGEST_SCHEMA)

    return ds.map_batches(cast, batch_format="pyarrow")
