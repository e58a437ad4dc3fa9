"""Single-threaded pure-Python oracle for the rollup cascade (FIXTURES.md §2).

Independent of the engine: only numpy + the shared deterministic generator.
Given an F1 Arrow table, computes the expected gap-filled rollup per tier the
slow, obvious way (dict loops).  Engine output must match exactly.
"""

from __future__ import annotations

import pyarrow as pa

from mq_to_db_ray.timegrid import TIERS, bucket_id_to_us


def rollup_oracle(table: pa.Table, tier: str, gap_fill: bool = True) -> list[dict]:
    """Expected rollup rows: one dict per (source, bucket), sorted.

    Keys: source, bucket_ts(us int), count, sum_n_tok, min_n_tok, max_n_tok,
    filled.  Rows whose doc_id has no parseable seq, whose source is empty,
    whose tokens are null, or whose n_tok != len(tokens) are excluded
    (they belong to the reject lane).
    """
    tier_s = TIERS[tier]
    groups: dict[tuple[str, int], list[int]] = {}
    doc_ids = table["doc_id"].to_pylist()
    sources = table["source"].to_pylist()
    n_toks = table["n_tok"].to_pylist()
    tokens = table["tokens"].to_pylist()
    for d, s, n, t in zip(doc_ids, sources, n_toks, tokens):
        if d is None or s is None or s == "" or t is None:
            continue
        tail = d.rsplit("-", 1)
        if len(tail) != 2 or not tail[1].isdigit():
            continue
        if n != len(t):
            continue
        b = int(tail[1]) // tier_s
        groups.setdefault((s, b), []).append(n)
    out = []
    by_source: dict[str, list[int]] = {}
    for (s, b), _ in groups.items():
        by_source.setdefault(s, []).append(b)
    for s in sorted(by_source):
        buckets = sorted(by_source[s])
        lo, hi = buckets[0], buckets[-1]
        rng = range(lo, hi + 1) if gap_fill else buckets
        for b in rng:
            ns = groups.get((s, b))
            if ns is None:
                if not gap_fill:
                    continue
                out.append(
                    dict(source=s, bucket_ts=bucket_id_to_us(b, tier_s), count=0,
                         sum_n_tok=0, min_n_tok=None, max_n_tok=None, filled=True)
                )
            else:
                out.append(
                    dict(source=s, bucket_ts=bucket_id_to_us(b, tier_s),
                         count=len(ns), sum_n_tok=sum(ns), min_n_tok=min(ns),
                         max_n_tok=max(ns), filled=False)
                )
    return out
