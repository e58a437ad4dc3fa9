"""Wave 143 — native JSONL framing through the full oracle-shaped lane.

The S2 JSONL source (reference payload framing,
/root/reference/internal/messages/sql.go:29-36) already had byte-parity
tests against the parquet source (test_wave24_ops.py); these add the
REJECT side: a planted dirty JSONL corpus must classify through
``read_jsonl`` → ``split_batch`` with exactly the reference's
parse-before-validate precedence, matching a brute-force row check.
"""

from __future__ import annotations

import json

import pyarrow as pa


def _write_jsonl(path, rows):
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_jsonl_dirty_reject_classification(ray_session, tmp_path):
    from mq_to_db_ray.sources.jsonl import read_jsonl
    from mq_to_db_ray.stages.validate import split_batch

    good = lambda i: {
        "doc_id": f"doc-{i}",
        "tokens": [1, 2, 3],
        "n_tok": 3,
        "source": "s0",
    }
    rows = [good(i) for i in range(12)]
    # the four mutation classes planted by _f1_jsonl_dirty_dir
    rows[2]["n_tok"] = 4                      # validate: n_tok != len
    rows[5]["source"] = ""                    # validate: empty source
    rows[7]["doc_id"] = "doc_7"               # parse: no -<seq> suffix
    rows[9]["tokens"] = None                  # parse: tokens null
    jl = tmp_path / "dirty.jsonl"
    _write_jsonl(jl, rows)

    tbl = pa.concat_tables(
        read_jsonl(str(jl)).iter_batches(batch_format="pyarrow")
    )
    valid, rej = split_batch(tbl)
    assert valid.num_rows == 8
    got = {
        r["doc_id"]: r["reason"] for r in rej.to_pylist()
    }
    assert got == {
        "doc-2": "validate",
        "doc-5": "validate",
        "doc_7": "parse",
        "doc-9": "parse",
    }


def test_jsonl_oracle_entries_registered():
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    for name in ("f1_jsonl_rollup_1m", "f1_jsonl_reject_lane"):
        assert name in q and name in o
        assert "read_json_auto" in o[name]
