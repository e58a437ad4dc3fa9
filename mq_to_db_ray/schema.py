"""Canonical Arrow schemas for every table the engine reads or writes.

The reference fixes its one payload schema in a Go struct
(`/root/reference/internal/messages/sql.go:12-26`) and strictly rejects
mismatches at parse time (`sql.go:29-36`).  We do the same with
``pyarrow.Schema`` objects: every stage validates/casts against these, and
violations are routed to the reject lane instead of raised.
"""

from __future__ import annotations

import pyarrow as pa

# Ingest table — the "message envelope" (BASELINE.json input_hint).
# doc_id <- MessageID, tokens <- Payload []byte (byte-identical passthrough),
# source <- RoutingKey/ConsumerTag (/root/reference/internal/consumer/consumer.go:80-91).
INGEST = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

# Validated envelope after E2 assign_time (narrow projection used by rollups —
# tokens are dropped to the raw tier before any shuffle).
ASSIGNED = pa.schema(
    [
        ("doc_id", pa.string()),
        ("source", pa.string()),
        ("n_tok", pa.int32()),
        ("seq", pa.int64()),
        ("event_ts", pa.timestamp("us")),
    ]
)

# Rolled-up points per tier (identical schema at 1m/1h/1d; FIXTURES.md §2).
ROLLUP = pa.schema(
    [
        ("source", pa.string()),
        ("bucket_ts", pa.timestamp("us")),
        ("count", pa.int64()),
        ("sum_n_tok", pa.int64()),
        ("min_n_tok", pa.int32()),
        ("max_n_tok", pa.int32()),
        ("filled", pa.bool_()),
    ]
)

# Per-(source, tier) compressed series blobs (E6 DoD + E7 Gorilla).
SERIES = pa.schema(
    [
        ("source", pa.string()),
        ("tier", pa.string()),
        ("n_points", pa.int64()),
        ("bucket_lo", pa.timestamp("us")),
        ("bucket_hi", pa.timestamp("us")),
        ("dod_blob", pa.binary()),
        ("gorilla_blob", pa.binary()),
    ]
)

# Reject lane — dead-letter rows, reasons mirror the reference's 4-branch
# error ladder (/root/reference/internal/repository/messages.go:66-146).
REJECT = pa.schema(
    [
        ("doc_id", pa.string()),
        ("source", pa.string()),
        ("reason", pa.string()),  # parse | validate | exec | ack
        ("detail", pa.string()),
    ]
)


def empty(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
