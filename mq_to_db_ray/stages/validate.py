"""E1 ingest-validate + E2 assign_time + E9 reject lane, fused in one
zero-copy Arrow ``map_batches`` stage.

Reference parity: strict payload parse (`NewSQL`,
/root/reference/internal/messages/sql.go:29-36 — schema mismatch errors
instead of garbage) and the validation predicate (`ValidDataConn`,
sql.go:40-45 — all connection fields non-empty).  Our analog predicate:
``doc_id parses to a seq AND source != '' AND tokens is not null AND
n_tok == len(tokens) AND n_tok >= 0``.  Failures are never raised — they are
split off to the reject lane (dead-letter, requeue=false, like
/root/reference/internal/repository/messages.go:66-84) with the 4-reason
taxonomy: parse | validate | exec | ack.

Everything is vectorized: the seq parse is a single ``pc.extract_regex``
over the batch, masks are pyarrow boolean kernels, the split is two
``Table.filter`` calls on the same zero-copy batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .. import schema as sch
from ..timegrid import T0_US, TICK_S

_SEQ_RE = r"-(?P<seq>[0-9]+)$"


def _arr(x: pa.Array | pa.ChunkedArray) -> pa.Array:
    return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x


def split_batch(batch: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(assigned_valid_rows, reject_rows).

    Valid rows carry the full envelope (tokens included — the raw retention
    tier needs them) plus ``seq`` / ``event_ts``; rejects follow
    ``schema.REJECT``.
    """
    n = batch.num_rows
    if n == 0:
        return _empty_valid(), sch.empty(sch.REJECT)

    doc_id = batch["doc_id"]
    if isinstance(doc_id, pa.ChunkedArray):
        doc_id = doc_id.combine_chunks()
    extracted = pc.extract_regex(doc_id, _SEQ_RE)
    seq_ok = pc.is_valid(extracted)
    # seq as int64; unparseable rows get null (kept out by seq_ok anyway)
    seq_str = pc.if_else(seq_ok, pc.struct_field(extracted, "seq"), pa.scalar(None, pa.string()))
    # bound seq to 12 digits: seq*1_000_000 + T0 must stay inside int64
    # microseconds (pc.multiply wraps SILENTLY on overflow, which would
    # commit garbage event_ts and detonate gap-fill's bucket-range alloc)
    len_ok = pc.less_equal(pc.binary_length(pc.fill_null(seq_str, "")), 12)
    seq_ok = pc.and_(seq_ok, len_ok)
    seq = pc.cast(pc.if_else(seq_ok, seq_str, pa.scalar(None, pa.string())), pa.int64())

    tokens_ok = pc.is_valid(batch["tokens"])
    parse_ok = pc.and_(pc.and_(seq_ok, tokens_ok), pc.is_valid(doc_id))

    src_ok = pc.and_(pc.is_valid(batch["source"]), pc.not_equal(pc.fill_null(batch["source"], ""), ""))
    tok_len = pc.list_value_length(batch["tokens"])
    ntok_ok = pc.and_(
        pc.fill_null(pc.equal(pc.cast(tok_len, pa.int32()), batch["n_tok"]), False),
        pc.fill_null(pc.greater_equal(batch["n_tok"], 0), False),
    )
    valid_ok = pc.and_(src_ok, ntok_ok)

    ok = _arr(pc.fill_null(pc.and_(parse_ok, valid_ok), False))

    # Fast path (the overwhelmingly common case): every row valid -> append
    # the derived columns to the original batch ZERO-COPY.  This avoids
    # re-materializing the wide `tokens` column (the dominant allocation of
    # the whole ingest pass; concurrent large allocations are also the
    # scaling bottleneck on oversubscribed hosts).
    if ok.null_count == 0 and pc.all(ok).as_py():
        seq_all = _arr(seq)
        event_us = pc.add(pc.multiply(seq_all, TICK_S * 1_000_000), T0_US)
        valid = batch.append_column(
            pa.field("seq", pa.int64()), seq_all
        ).append_column(
            pa.field("event_ts", pa.timestamp("us")),
            pc.cast(event_us, pa.timestamp("us")),
        )
        return valid, sch.empty(sch.REJECT)

    good = batch.filter(ok)
    seq_good = _arr(seq).filter(ok)
    event_us = pc.add(pc.multiply(seq_good, TICK_S * 1_000_000), T0_US)
    # keep the WHOLE envelope — optional metadata columns (the analogs of
    # the reference envelope's Priority/ContentType/ContentEncoding,
    # /root/reference/internal/consumer/consumer.go:80-91) ride through to
    # the raw tier untouched, exactly like the fast path
    valid = good.append_column(
        pa.field("seq", pa.int64()), _arr(seq_good)
    ).append_column(
        pa.field("event_ts", pa.timestamp("us")),
        _arr(pc.cast(event_us, pa.timestamp("us"))),
    )

    bad_mask = pc.invert(ok)
    if not pc.any(bad_mask).as_py():
        return valid, sch.empty(sch.REJECT)
    bad = batch.filter(bad_mask)
    # reason: parse failures win over validate (same precedence as the
    # reference ladder: parse errors reject before validation runs,
    # /root/reference/internal/repository/messages.go:66-84).
    parse_fail = _arr(pc.invert(pc.fill_null(parse_ok, False))).filter(bad_mask)
    reason = pc.if_else(parse_fail, "parse", "validate")
    detail_parse = pc.if_else(
        _arr(pc.invert(pc.fill_null(tokens_ok, False))).filter(bad_mask),
        "tokens is null",
        "doc_id has no parseable -<seq> suffix",
    )
    detail_validate = pc.if_else(
        _arr(pc.invert(pc.fill_null(src_ok, False))).filter(bad_mask),
        "source is empty",
        "n_tok != len(tokens) or n_tok < 0",
    )
    detail = pc.if_else(parse_fail, detail_parse, detail_validate)
    rejects = pa.Table.from_arrays(
        [
            _arr(pc.fill_null(bad["doc_id"], "")),
            _arr(pc.fill_null(bad["source"], "")),
            _arr(reason),
            _arr(detail),
        ],
        names=["doc_id", "source", "reason", "detail"],
    ).cast(sch.REJECT)
    return valid, rejects


def _empty_valid() -> pa.Table:
    return pa.schema(
        [
            ("doc_id", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", pa.string()),
            ("seq", pa.int64()),
            ("event_ts", pa.timestamp("us")),
        ]
    ).empty_table()


class ValidateAssign:
    """Actor-pool ``map_batches`` callable: forwards valid rows, dead-letters
    rejects to ``reject_dir`` as parquet (idempotent via content-hash file
    names, so a retried task overwrites the same file — ack-once analog of
    /root/reference/internal/consumer/rmq/rmq.go:241-245 Reject)."""

    def __init__(self, reject_dir: str | None = None):
        import os

        self.reject_dir = reject_dir
        if reject_dir:
            os.makedirs(reject_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        valid, rejects = split_batch(batch)
        if self.reject_dir and rejects.num_rows:
            import hashlib

            import pyarrow.parquet as pq

            key = hashlib.sha1(
                ("\x00".join(rejects["doc_id"].to_pylist()) + str(rejects.num_rows)).encode()
            ).hexdigest()[:16]
            pq.write_table(rejects, f"{self.reject_dir}/part-{key}.parquet")
        return valid
