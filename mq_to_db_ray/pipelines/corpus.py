"""Corpus-composition operators for training-data assembly: sequence
packing, deterministic global shuffle order, mixture sampling, and
vocabulary-id mapping.

These extend the training-data suite (SURVEY.md §2.3) with the steps that
sit between a deduplicated corpus and a training run: deciding each
document's position in the emitted token stream.  The reference's store
chain processes one message at a time with no notion of position
(/root/reference/internal/repository/messages.go:60-151); position here is
derived from data (doc_id order), never from block order, matching the
engine's per-source sequencing rule (SURVEY.md §4.2 "Ordering").

Dataflow shapes, all Ray-Data-first:

* ``pack_sequences`` / ``shuffle_rank`` share the **distributed ordered
  prefix scan**: a narrow per-chunk partial pass (combiner), an
  O(#chunks) driver-side exclusive scan (the only driver state — same
  bound as cascade's source_extents fold), and a chunk-partitioned second
  pass where every task knows its base offset from a broadcast dict.
  Text never moves; only (doc_id, source, n_tok) rides the one shuffle.
* ``mixture_sample`` is a stateless vectorized filter over pure integer
  hash arithmetic, so the DuckDB oracle reproduces it bit-exactly.
* ``vocab_ids`` is build-small-side-then-broadcast: a distributed word
  count (per-batch Arrow value_counts combiner -> crc32 hash-partition
  merge), a tiny top-V vocabulary on the driver, then one vectorized
  ``pc.index_in`` apply per batch.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset

from ..stages.shuffle import HASH_MULT, shuffle_parts

# Exact-arithmetic hash domain shared with stratified_sample: reducing
# doc_id mod P BEFORE the multiply keeps every intermediate below
# (P-1)*K < 2^63, so numpy int64 and DuckDB BIGINT agree bit-for-bit.
P = 1_000_000_007
K_SHUFFLE = 1_099_087_573  # shuffle_rank ordering hash
K_MIX = 2_246_822_519  # mixture_sample keep/drop hash


def _docs(sf_dir: str, columns=None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _n_tok(batch: pa.Table) -> pa.ChunkedArray:
    """Whitespace token count, same split semantics as the SQL oracle."""
    return pc.cast(
        pc.list_value_length(pc.split_pattern(batch["text"], " ")), pa.int64()
    )


def _source_codes(col) -> tuple[np.ndarray, list[str]]:
    """Dictionary-encode a string column -> (int codes, unique values).

    Lets per-partition kernels treat sources as small ints; the python
    work is O(#unique sources per partition), not O(rows).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = pc.dictionary_encode(col)
    return (
        d.indices.to_numpy(zero_copy_only=False).astype(np.int64),
        d.dictionary.to_pylist(),
    )


# ------------------------------------------------------------- packing


def pack_sequences(sf_dir: str, ctx: int = 256, chunk: int = 64) -> Dataset:
    """Concat-and-chunk sequence packing: per source, documents ordered by
    doc_id form one token stream; each doc is assigned the context window
    (``pack_id``) and in-window offset where its first token lands.

    Output: (doc_id, source, pack_id, pack_offset) with
    ``off = exclusive-cumsum of n_tok per source ordered by doc_id``,
    ``pack_id = off // ctx``, ``pack_offset = off % ctx``.

    Scale shape — distributed ordered prefix scan:
      1. one narrow pass emits per-(source, chunk) token sums
         (chunk = doc_id // chunk_size, a key-RANGE chunking so chunk
         order == doc_id order); the partials Dataset is folded
         incrementally on the driver at O(sources x chunks);
      2. the driver exclusive-scans each source's chunk sums into base
         offsets (broadcast, tiny);
      3. a second pass hash-partitions rows by (source, chunk) — every
         group's packing is then local: lexsort + cumsum + its base.
    At 100 TB, chunk_size is raised so sources x chunks stays ~1e6; the
    driver never sees a row, only per-chunk sums.
    """
    chunk_s = pa.scalar(chunk, pa.int64())

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "source": b["source"],
                "chunk_id": pc.divide(pc.cast(b["doc_id"], pa.int64()), chunk_s),
                "n_tok": _n_tok(b),
            }
        )

    # Tokenize once: the narrow (doc_id, source, chunk, n_tok) projection
    # (~1% of corpus width — text is dropped) feeds BOTH scan passes.
    narrow = (
        _docs(sf_dir, ["doc_id", "source", "text"])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    return pack_stream(narrow, ctx)


def pack_stream(narrow: Dataset, ctx: int = 256) -> Dataset:
    """The distributed ordered prefix scan behind :func:`pack_sequences`,
    over an already-MATERIALIZED narrow (doc_id, source, chunk_id, n_tok)
    dataset (both scan passes consume it) — shared with
    :func:`corpus_prep`, which packs a filtered survivor set."""
    k = shuffle_parts()

    def partial(b: pa.Table) -> pa.Table:
        return b.select(["source", "chunk_id", "n_tok"]).group_by(
            ["source", "chunk_id"]
        ).aggregate([("n_tok", "sum")])

    partials = narrow.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    # Driver fold: O(sources x chunks) ints, one numpy group-reduce — no
    # per-row python.  Batches are streamed then re-grouped once (a chunk
    # can span input batches); the exclusive scan resets at each source
    # boundary.  The broadcast is three parallel arrays sorted by
    # (source code, chunk_id): assign() resolves each group's base with
    # index_in (source -> global code) + searchsorted over the packed key.
    # the typed stub keeps the fold alive when EVERY partial batch is
    # empty (an all-filtered corpus): concat_tables refuses an empty list
    stub = pa.table(
        {
            "source": pa.array([], pa.string()),
            "chunk_id": pa.array([], pa.int64()),
            "n_tok_sum": pa.array([], pa.int64()),
        }
    )
    agg = pa.concat_tables(
        [stub] + list(partials.iter_batches(batch_format="pyarrow")),
        promote_options="default",
    ).group_by(["source", "chunk_id"]).aggregate([("n_tok_sum", "sum")])
    g_codes, g_uniq = _source_codes(agg["source"])
    g_cid = agg["chunk_id"].combine_chunks().to_numpy(zero_copy_only=False)
    g_sum = agg["n_tok_sum_sum"].combine_chunks().to_numpy(
        zero_copy_only=False
    )
    order = np.lexsort((g_cid, g_codes))
    g_codes, g_cid, g_sum = g_codes[order], g_cid[order], g_sum[order]
    excl = np.cumsum(g_sum) - g_sum
    if len(g_codes):
        new_src = np.empty(len(g_codes), dtype=bool)
        new_src[0] = True
        new_src[1:] = g_codes[1:] != g_codes[:-1]
        starts = np.flatnonzero(new_src)
        counts = np.diff(np.append(starts, len(g_codes)))
        base_vals = excl - np.repeat(excl[starts], counts)
        key_mult = int(g_cid.max()) + 1
    else:
        base_vals = np.empty(0, np.int64)
        key_mult = 1
    packed_keys = g_codes * key_mult + g_cid  # ascending by construction
    uniq_arr = pa.array(g_uniq, pa.string())

    def add_part(b: pa.Table) -> pa.Table:
        codes, uniq = _source_codes(b["source"])
        crc = np.array(
            [zlib.crc32(u.encode()) for u in uniq], dtype=np.int64
        )[codes]
        cid = b["chunk_id"].to_numpy(zero_copy_only=False)
        part = (crc ^ (cid * HASH_MULT)) & (k - 1)
        return b.append_column("part", pa.array(part.astype(np.int32)))

    def assign(g: pa.Table) -> pa.Table:
        codes, uniq = _source_codes(g["source"])
        cid = g["chunk_id"].to_numpy(zero_copy_only=False)
        did = g["doc_id"].to_numpy(zero_copy_only=False)
        n = g["n_tok"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, cid, codes))
        codes, cid, did, n = codes[order], cid[order], did[order], n[order]
        # Group boundaries where (source, chunk) changes.
        new = np.empty(len(n), dtype=bool)
        new[0] = True
        new[1:] = (codes[1:] != codes[:-1]) | (cid[1:] != cid[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(n)))
        excl = np.cumsum(n) - n
        within = excl - np.repeat(excl[starts], counts)
        # group base offsets: partition-local source codes -> global codes
        # (index_in over the tiny per-partition dictionary), then one
        # searchsorted over the broadcast packed (code, chunk) key array
        glob = (
            pc.index_in(pa.array(uniq, pa.string()), value_set=uniq_arr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        gk = glob[codes[starts]] * key_mult + cid[starts]
        base = base_vals[np.searchsorted(packed_keys, gk)]
        off = np.repeat(base, counts) + within
        src_sorted = pc.take(
            g["source"].combine_chunks(), pa.array(order, pa.int64())
        )
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "source": src_sorted,
                "pack_id": pa.array(off // ctx, pa.int64()),
                "pack_offset": pa.array(off % ctx, pa.int64()),
            }
        )

    return (
        narrow.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(
            lambda g: assign(g.drop_columns(["part"])), batch_format="pyarrow"
        )
    )


def corpus_prep(sf_dir: str, ctx: int = 256, chunk: int = 64) -> Dataset:
    """The end-to-end corpus-preparation pipeline a training run actually
    consumes — composition of three oracle-checked stages in their
    production order:

      1. **near-dedup decision** (T20b): drop non-winner members of the
         n-gram-Jaccard near-dup clusters;
      2. **fused quality filter** (T29): lang + word band + Gopher caps +
         stopword floor + benchmark decontamination in one text pass;
      3. **sequence packing** (T22): assign each survivor its context
         window and offset via the distributed ordered prefix scan.

    Output: (doc_id, source, pack_id, pack_offset) for every kept doc.

    The intersection of the two keep-sets is a hash-partitioned join on
    doc_id (survivor ids are corpus-sized at web dup rates — never a
    broadcast); the packing scan then runs over the FILTERED narrow rows,
    so dropped documents consume no context-window space.  Text is read
    by the two filter stages only; nothing corpus-sized touches the
    driver."""
    import numpy as np

    from ..stages.shuffle import hash_partition_merge
    from .training_data import near_dedup_keep, quality_filter

    kept_q = quality_filter(sf_dir)     # (doc_id, source, n_words)
    survivors = near_dedup_keep(sf_dir)  # (doc_id, source)

    def q_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "source": b["source"],
                "n_tok": pc.cast(b["n_words"], pa.int64()),
                "mark": pa.array(np.zeros(b.num_rows, dtype=bool)),
            }
        )

    def s_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "source": pa.nulls(b.num_rows, pa.string()),
                "n_tok": pa.nulls(b.num_rows, pa.int64()),
                "mark": pa.array(np.ones(b.num_rows, dtype=bool)),
            }
        )

    def intersect(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        mark = t["mark"].combine_chunks().to_numpy(zero_copy_only=False)
        marked = np.unique(ids[mark])
        rows = ~mark
        if len(marked):
            pos = np.searchsorted(marked, ids)
            pos[pos == len(marked)] = 0
            rows &= marked[pos] == ids
        else:
            rows[:] = False
        out = t.take(pa.array(np.flatnonzero(rows), pa.int64()))
        return out.drop_columns(["mark"])

    both = kept_q.map_batches(q_rows, batch_format="pyarrow").union(
        survivors.map_batches(s_rows, batch_format="pyarrow")
    )
    kept = hash_partition_merge(both, "doc_id", intersect)

    chunk_s = pa.scalar(chunk, pa.int64())

    def add_chunk(b: pa.Table) -> pa.Table:
        return b.append_column(
            "chunk_id", pc.divide(pc.cast(b["doc_id"], pa.int64()), chunk_s)
        )

    narrow = kept.map_batches(add_chunk, batch_format="pyarrow").materialize()
    return pack_stream(narrow, ctx)


# -------------------------------------------------------- shuffle order


def shuffle_rank(sf_dir: str, nchunks: int = 64) -> Dataset:
    """Deterministic global training-shuffle position for every document:
    ``shuffle_pos = rank of (hash(doc_id), doc_id) over the whole corpus``.

    The count-scan sibling of :func:`pack_sequences`: the hash value
    domain [0, P) is split into ``nchunks`` RANGE chunks (chunk order ==
    hash order), pass 1 bincounts rows per chunk (a length-``nchunks``
    vector folded on the driver), the exclusive scan of those counts is
    each chunk's base rank, and pass 2 sorts each chunk locally.  No
    global sort, no corpus-sized driver state; ties (doc_id >= P) break
    by doc_id, so the rank is total and reproducible by the SQL oracle's
    ROW_NUMBER.
    """

    def to_hash(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = ((d % P) * K_SHUFFLE) % P
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "r": pa.array(r, pa.int64()),
                "part": pa.array((r * nchunks // P).astype(np.int32)),
            }
        )

    hashed = _docs(sf_dir, ["doc_id"]).map_batches(
        to_hash, batch_format="pyarrow", zero_copy_batch=True
    )

    counts = np.zeros(nchunks, dtype=np.int64)
    for b in hashed.iter_batches(batch_format="pyarrow"):
        counts += np.bincount(
            b["part"].to_numpy(zero_copy_only=False), minlength=nchunks
        )
    base = np.cumsum(counts) - counts

    def rank(g: pa.Table) -> pa.Table:
        r = g["r"].to_numpy(zero_copy_only=False)
        did = g["doc_id"].to_numpy(zero_copy_only=False)
        c = int(r[0] * nchunks // P)
        order = np.lexsort((did, r))
        pos = base[c] + np.arange(len(r), dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did[order], pa.int64()),
                "shuffle_pos": pa.array(pos, pa.int64()),
            }
        )

    return hashed.groupby("part").map_groups(
        lambda g: rank(g.drop_columns(["part"])), batch_format="pyarrow"
    )


# ------------------------------------------------------ mixture sampling


def mixture_sample(sf_dir: str) -> Dataset:
    """Source-weighted corpus mixture: keep each document with a
    per-source probability (rate_permille = 100 + 40 * source index),
    decided by a deterministic integer hash of doc_id — the standard
    mixture-weighting step before training, reproducible everywhere.

    Stateless vectorized filter: the per-unique-source rate parse is
    O(#sources per batch) python, the keep mask is one numpy expression.
    In production the rates come from config; the source-derived default
    keeps the operator self-contained and SQL-checkable.
    """

    def fn(b: pa.Table) -> pa.Table:
        codes, uniq = _source_codes(b["source"])
        rate = np.array(
            [100 + 40 * int("".join(ch for ch in u if ch.isdigit()) or 0)
             for u in uniq],
            dtype=np.int64,
        )[codes]
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = ((d % P) * K_MIX) % P % 1000
        keep = u < rate
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "source": b["source"],
            }
        ).filter(pa.array(keep))

    return _docs(sf_dir, ["doc_id", "source"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


# ------------------------------------------------------------ vocab ids


def vocab_ids(sf_dir: str, v: int = 16) -> Dataset:
    """Tokenizer-apply plumbing: build a top-``v`` word vocabulary from
    the corpus itself (id = rank by count desc, word asc) and map every
    document through it, reporting per-doc (n_words, n_oov, sum_ids).

    Shape: per-batch Arrow ``value_counts`` combiner -> crc32
    hash-partition merge (only (word, count) rows shuffle, never text)
    -> tiny global sort-limit -> the ``v``-row vocabulary is broadcast —
    the canonical build-small-side / apply-vectorized split.  The apply
    is one ``pc.index_in`` + two bincounts per batch; a real BPE vocab
    swaps the value_set, the dataflow is identical.
    """
    k = shuffle_parts()

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        vc = words.flatten().value_counts()
        w = vc.field("values")
        crc = pa.array(
            np.array(
                [zlib.crc32(x.encode()) & (k - 1) for x in w.to_pylist()],
                dtype=np.int32,
            )
        )
        return pa.table(
            {
                "word": w,
                "n": pc.cast(vc.field("counts"), pa.int64()),
                "part": crc,
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        agg = g.group_by("word", use_threads=False).aggregate([("n", "sum")])
        return pa.table(
            {"word": agg["word"], "n": pc.cast(agg["n_sum"], pa.int64())}
        )

    merged = (
        _docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(
            lambda g: merge(g.drop_columns(["part"])), batch_format="pyarrow"
        )
    )
    top = merged.sort(["n", "word"], descending=[True, False]).limit(v)
    vocab = pa.array(
        [r["word"] for r in top.take_all()], pa.string()
    )  # v rows — bounded by construction

    def apply(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        idx = pc.index_in(flat, value_set=vocab)
        valid = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        ids = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        nrows = b.num_rows
        n_words = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        sum_ids = np.bincount(
            parent, weights=ids * valid, minlength=nrows
        ).astype(np.int64)
        n_oov = np.bincount(
            parent, weights=~valid, minlength=nrows
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_words": pa.array(n_words.astype(np.int64)),
                "n_oov": pa.array(n_oov),
                "sum_ids": pa.array(sum_ids),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        apply, batch_format="pyarrow", zero_copy_batch=True
    )


def token_budget_trim(sf_dir: str, budget_tokens: int = 6_000) -> Dataset:
    """T87: budget-constrained curriculum selection — keep documents in
    (n_chars DESC, doc_id ASC) curriculum order while the INCLUSIVE
    running token total stays within ``budget_tokens``; report per
    source: docs kept, tokens kept — "we can afford B tokens; take the
    longest-first prefix" — the budgeting step between T55's ordering
    and T22's packing (a straddling doc is DROPPED, so the answer is
    unique and the budget is a hard ceiling).  One dense row per source
    ALWAYS.  Exact int64 (window running-sum ≤ B oracle).

    Scale shape — T55's count-based ranking generalized to a WEIGHTED
    prefix, still with no global sort:
      1. one mergeable (n_chars → docs, tokens) histogram pass collapses
         at the driver into the boundary length L* (first length, desc,
         whose group crosses the budget) + the residual budget entering
         it — O(distinct lengths) rows, shipped via ray.put;
      2. hash-partition by N_CHARS: groups longer than L* keep
         everything; the L* group co-locates in ONE task where the
         doc_id-ordered residual prefix settles locally; shorter groups
         drop — each partition reduces straight to per-source (docs,
         tokens) partials and a k=1 merge densifies.
    Same hot-length caveat as T55: one length value's docs land in one
    task (the (key, window) sub-split applies if a real corpus pins
    n_chars)."""
    import ray

    from ..stages.shuffle import hash_partition_merge

    docs = _docs(sf_dir, ["doc_id", "source", "n_chars", "text"])
    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def narrow(b: pa.Table) -> pa.Table:
        ntok = pc.cast(
            pc.list_value_length(pc.split_pattern(b["text"], " ")),
            pa.int64(),
        )
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "len": pc.cast(b["n_chars"], pa.int64()),
                "ntok": ntok,
                "s": pc.cast(
                    pc.index_in(b["source"], value_set=srcs), pa.int64()
                ),
            }
        )

    narrowed = docs.map_batches(
        narrow, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # narrow int64 rows; consumed by both passes

    def hist_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("len", use_threads=False).aggregate(
            [("ntok", "sum"), ("ntok", "count")]
        )
        return g.rename_columns(["len", "tok", "f"])

    def hist_merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "len": pa.array([], pa.int64()),
                    "tok": pa.array([], pa.int64()),
                    "f": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("len", use_threads=False).aggregate(
            [("tok", "sum"), ("f", "sum")]
        )
        return g.rename_columns(["len", "tok", "f"])

    hist = pa.concat_tables(
        list(
            hash_partition_merge(
                narrowed.map_batches(hist_partial, batch_format="pyarrow"),
                "len",
                hist_merge,
                k=1,
            ).iter_batches(batch_format="pyarrow")
        )
    )
    lens = hist["len"].combine_chunks().to_numpy(zero_copy_only=False)
    toks = hist["tok"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(lens, kind="stable")[::-1]  # longest first
    lens_d, toks_d = lens[order], toks[order]
    cum = np.cumsum(toks_d)
    over = np.flatnonzero(cum > budget_tokens)
    if len(over) == 0:  # whole corpus affordable
        l_star, residual = -1, 0
    else:
        i = int(over[0])
        l_star = int(lens_d[i])
        residual = int(budget_tokens - (cum[i - 1] if i else 0))
    plan_ref = ray.put((l_star, residual))

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "s": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "ntok": pa.array([], pa.int64()),
                }
            )
        l_star_, residual_ = ray.get(plan_ref)
        L = t["len"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["ntok"].combine_chunks().to_numpy(zero_copy_only=False)
        s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = L > l_star_ if l_star_ >= 0 else np.ones(len(L), bool)
        if l_star_ >= 0:
            at = np.flatnonzero(L == l_star_)
            if len(at):  # the whole boundary group co-locates here
                order = np.argsort(d[at], kind="stable")
                csum = np.cumsum(k[at][order])
                kept_local = at[order][csum <= residual_]
                keep[kept_local] = True
        nd = np.bincount(s[keep], minlength=ns).astype(np.int64)
        tk = np.bincount(
            s[keep], weights=k[keep], minlength=ns
        ).astype(np.int64)
        live = np.flatnonzero((nd > 0) | (tk > 0))
        return pa.table(
            {
                "s": pa.array(live.astype(np.int64)),
                "nd": pa.array(nd[live]),
                "ntok": pa.array(tk[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nd = np.zeros(ns, np.int64)
        tk = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("s", use_threads=False).aggregate(
                [("nd", "sum"), ("ntok", "sum")]
            )
            ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
            nd[ss] = g["nd_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            tk[ss] = g["ntok_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "source": srcs,
                "n_docs_kept": pa.array(nd),
                "n_tokens_kept": pa.array(tk),
            }
        )

    from ..stages.shuffle import adaptive_width

    kk = adaptive_width(f"{sf_dir}/documents.parquet", 25_000)
    cells = hash_partition_merge(narrowed, "len", fold, k=kk)
    return hash_partition_merge(cells, "s", merge, k=1)
