"""Training-data pipeline operators over the driver's documents/embeddings
tables: text analysis, dedup (exact / MinHash-LSH / SimHash / n-gram
Jaccard), similarity search, multimodal metadata.

Every function takes ``sf_dir`` and returns a Dataset/Table whose column
names match the corresponding entry in ``__ray_entry__.oracle_sql`` exactly
(the driver sorts columns by name before hashing values).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data import Dataset

from ..functions import textstats as ts
from ..functions.multimodal import PayloadMeta
from ..functions.similarity import cosine_topk, LshBucketer, make_planes


def _docs(sf_dir: str, columns=None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


@lru_cache(maxsize=64)
def _doc_k(sf_dir: str) -> int:
    """Shuffle width scaled to the documents table's footer row count
    (stages/shuffle.adaptive_width).  Memoized — queries consult it more
    than once per build, and each call re-opened the parquet footer."""
    from ..stages.shuffle import adaptive_width

    return adaptive_width(f"{sf_dir}/documents.parquet", 25_000)


# ---------------- text analysis ----------------


def token_count(sf_dir: str) -> Dataset:
    """(doc_id, source, n_tok) with n_tok = len(text.split(' ')) — matches
    DuckDB len(str_split(text, ' ')).  Fully vectorized: one
    ``pc.split_pattern`` + ``pc.list_value_length`` per batch (single-space
    split keeps empty tokens, exactly like str.split(' ') and str_split)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(batch["text"], " "))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "n_tok": pc.cast(n, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


# GPT-2-style pre-tokenizer shape, restricted to RE2 syntax so BOTH Arrow's
# count_substring_regex and DuckDB's regexp_extract_all (RE2 engines) match
# identically: a token is an optional leading space + a letter run, digit
# run, or punctuation run; residual whitespace runs count as one token.
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_count_bpe(sf_dir: str) -> Dataset:
    """(doc_id, n_bpe_tok): token count under a BPE-ish regex pre-tokenizer
    (the whitespace counter's sibling for byte-pair pipelines).  One
    vectorized ``pc.count_substring_regex`` per batch — no Python loop."""

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], BPE_ISH_PATTERN)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tok": pc.cast(n, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def quality_score(sf_dir: str) -> Dataset:
    """Integer quality features: (doc_id, n_words, n_stop, stop_permille).

    Fully vectorized: split + lower + stopword membership are Arrow
    kernels; the per-row stopword count is one ``np.bincount`` over the
    flattened word list's parent indices.  Bit-exact vs the SQL oracle
    (integers only, same single-space split semantics)."""

    def fn(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(batch["text"]), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        n_words = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(
            flat, value_set=pa.array(list(ts.STOPWORDS))
        ).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(
            parent, weights=is_stop, minlength=batch.num_rows
        ).astype(np.int64)
        permille = np.floor(
            1000.0 * n_stop / np.maximum(n_words, 1)
        ).astype(np.int64)
        permille[n_words == 0] = 0
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words.astype(np.int64)),
                "n_stop": pa.array(n_stop),
                "stop_permille": pa.array(permille),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


LANGID_WORDS = {
    "en": ["the", "and", "of", "to", "is", "a", "in", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "que"],
}


def _langid_pred(texts) -> np.ndarray:
    """Vectorized stopword-vote language prediction for a text column —
    per language, DISTINCT matching words per row counted with
    ``pc.index_in`` + one np.unique over (row, word-index) codes; argmax
    tie-break (votes desc, language name asc... largest name on vote
    ties) matches the scalar kernel ``textstats.lang_id`` exactly.
    Returns an object ndarray of predictions ('unknown' on zero votes).
    Shared by T9 (per-doc labels) and T81 (confusion matrix)."""
    words = pc.split_pattern(pc.utf8_lower(texts), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    n = len(words)
    votes = np.zeros((n, len(LANGID_WORDS)), dtype=np.int64)
    for li, (_lang, ws) in enumerate(sorted(LANGID_WORDS.items())):
        idx = pc.index_in(flat, value_set=pa.array(ws))
        iv = idx.to_numpy(zero_copy_only=False)  # float with NaN for miss
        hit = ~np.isnan(iv)
        codes = np.unique(parent[hit] * len(ws) + iv[hit].astype(np.int64))
        rows = codes // len(ws)
        votes[:, li] = np.bincount(rows, minlength=n)
    names = sorted(LANGID_WORDS)
    best = np.zeros(n, dtype=np.int64)
    rows_idx = np.arange(n)
    for li in range(1, len(names)):
        # >= prefers the later (larger) name on vote ties, matching
        # max(..., key=(votes, name)) in the scalar kernel
        better = votes[:, li] >= votes[rows_idx, best]
        best = np.where(better, li, best)
    pred = np.asarray(names, dtype=object)[best]
    pred[votes.max(axis=1) == 0] = "unknown"
    return pred


def lang_id(sf_dir: str) -> Dataset:
    """(doc_id, lang_pred) — stopword-vote heuristic over the shared
    :func:`_langid_pred` kernel (SQL list_filter oracle)."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(
                    _langid_pred(batch["text"]), type=pa.string()
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def fingerprint(sf_dir: str) -> Dataset:
    """(doc_id, fp) rolling-hash winnowing fingerprint (int64, wrapped) —
    numpy rolling polynomial per doc, unique words hashed once per batch."""

    def fn(batch: pa.Table) -> pa.Table:
        fps = ts.fingerprint_batch(batch["text"]).view(np.int64)
        return pa.table(
            {"doc_id": batch["doc_id"], "fp": pa.array(fps, type=pa.int64())}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def repetition(sf_dir: str) -> Dataset:
    """Gopher-style repetition features (quality filtering): per doc
    (doc_id, n_words, dup_word_permille, top_word_permille) where
    dup_word_permille = floor(1000*(n-distinct)/n) and top_word_permille =
    floor(1000*max_word_count/n).  Fully vectorized: one Arrow split +
    dictionary-encode per batch, then per-(doc, word) counts via one
    np.unique over a combined int64 key — no Python loop over rows or
    words.  Bit-exact vs the SQL oracle (integer inputs, identical float64
    expression shape)."""

    def fn(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        n_words = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        n_words = n_words.astype(np.int64)
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        codes = (
            words.flatten()
            .dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n_dict = int(codes.max()) + 1 if len(codes) else 1
        combined = parent.astype(np.int64) * n_dict + codes
        pairs, counts = np.unique(combined, return_counts=True)
        pair_doc = pairs // n_dict
        distinct = np.bincount(pair_doc, minlength=batch.num_rows).astype(
            np.int64
        )
        # pairs are sorted, so each doc's (word,count) rows are contiguous
        doc_starts = np.flatnonzero(
            np.diff(pair_doc, prepend=pair_doc[0] - 1 if len(pair_doc) else 0)
        )
        top = np.zeros(batch.num_rows, dtype=np.int64)
        if len(pairs):
            top[pair_doc[doc_starts]] = np.maximum.reduceat(counts, doc_starts)
        n_safe = np.maximum(n_words, 1)
        dup = np.floor(1000.0 * (n_words - distinct) / n_safe).astype(np.int64)
        topf = np.floor(1000.0 * top / n_safe).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words),
                "dup_word_permille": pa.array(dup),
                "top_word_permille": pa.array(topf),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def contamination(sf_dir: str, eval_max_doc_id: int = 10) -> Dataset:
    """Benchmark-decontamination check: flag every document sharing a
    3-word shingle with the "eval set" (here: docs with
    doc_id < ``eval_max_doc_id``; in production, the held-out benchmark).
    Output (doc_id, n_hits, contaminated).

    Scale shape: the eval set is benchmark-sized (MBs) by definition, so
    its shingle-hash set is built once on the driver, ``ray.put`` ONCE, and
    probed inside every map task with one ``np.isin`` — the canonical
    broadcast-small-side join; the corpus streams, nothing corpus-sized
    anywhere.  Engine compares 64-bit shingle hashes, the oracle compares
    shingle STRINGS (same collision-free convention as T4 jaccard)."""
    import ray

    eval_ref = _eval_shingle_ref(sf_dir, eval_max_doc_id)

    def fn(batch: pa.Table) -> pa.Table:
        ev_sorted = ray.get(eval_ref)
        hits = _shingle_hits(batch["text"], ev_sorted, batch.num_rows)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_hits": pa.array(hits),
                "contaminated": pa.array(hits > 0),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def _eval_shingle_ref(sf_dir: str, eval_max_doc_id: int):
    """Build the benchmark eval set's sorted-unique shingle hashes on the
    driver (the eval set is benchmark-sized by definition) and ``ray.put``
    them ONCE — the broadcast-small-side convention shared by
    :func:`contamination` and :func:`quality_filter`."""
    import ray

    eval_tbl = (
        _docs(sf_dir, ["doc_id", "text"])
        .filter(expr=f"doc_id < {eval_max_doc_id}")
        .take_all()
    )
    hasher = ts.WordHasher()
    ev = [ts.shingles(r["text"], hasher=hasher) for r in eval_tbl]
    eval_set = np.unique(np.concatenate(ev)) if ev else np.empty(0, np.uint64)
    return ray.put(eval_set)


def _shingle_hits(texts, ev_sorted: np.ndarray, n_rows: int) -> np.ndarray:
    """Per-row count of DISTINCT shingles present in the sorted broadcast
    eval set — one vectorized shingles_flat + searchsorted + bincount for
    the whole batch (no per-row loop)."""
    if not len(ev_sorted):
        return np.zeros(n_rows, dtype=np.int64)
    rows, sh = ts.shingles_flat(texts)
    pos = np.searchsorted(ev_sorted, sh)
    pos[pos == len(ev_sorted)] = 0
    match = ev_sorted[pos] == sh
    return np.bincount(rows[match], minlength=n_rows).astype(np.int64)


def dup_ngrams(sf_dir: str, k_shingle: int = 3) -> Dataset:
    """Per-doc duplicate-n-gram fraction (Dolma/RefinedWeb-style quality
    signal): of each document's DISTINCT 3-word shingles, how many occur in
    at least one OTHER document.  Output (doc_id, n_shingles,
    n_dup_shingles, dup_permille).

    Scale shape — text never shuffles, only int64 rows do:
      1. one vectorized shingle pass per batch (textstats.shingles_flat)
         emits (doc_id, shingle-hash) rows, distinct per doc;
      2. hash-partition by SHINGLE: every occurrence of a shingle meets in
         one task, so df>1 is decided locally and folded into per-doc
         PARTIAL (n, n_dup) counts — the corpus-wide dup-shingle set is
         never materialized anywhere;
      3. hash-partition the partials by doc_id and sum.
    Engine compares 64-bit shingle hashes, the oracle shingle STRINGS
    (same collision-free convention as T4 jaccard / T19 contamination)."""
    from ..stages.shuffle import hash_partition_merge

    def explode(batch: pa.Table) -> pa.Table:
        rows, sh = ts.shingles_flat(batch["text"], k_shingle)
        doc = batch["doc_id"].combine_chunks().take(pa.array(rows, pa.int64()))
        return pa.table(
            {"doc_id": doc, "shingle": pa.array(sh.view(np.int64), pa.int64())}
        )

    exploded = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold_by_shingle(t: pa.Table) -> pa.Table:
        h = t["shingle"].combine_chunks().to_numpy(zero_copy_only=False)
        doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        _, inv, cnt = np.unique(h, return_inverse=True, return_counts=True)
        dup = cnt[inv] > 1
        ud, dinv = np.unique(doc, return_inverse=True)
        n_part = np.bincount(dinv, minlength=len(ud)).astype(np.int64)
        d_part = np.bincount(dinv, weights=dup, minlength=len(ud)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ud, pa.int64()),
                "n": pa.array(n_part),
                "d": pa.array(d_part),
            }
        )

    kk = _doc_k(sf_dir)
    partials = hash_partition_merge(exploded, "shingle", fold_by_shingle, k=kk)

    def fold_by_doc(t: pa.Table) -> pa.Table:
        g = t.group_by(["doc_id"], use_threads=False).aggregate(
            [("n", "sum"), ("d", "sum")]
        )
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        d = g["d_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        permille = np.floor(1000.0 * d / np.maximum(n, 1)).astype(np.int64)
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "n_shingles": pc.cast(g["n_sum"], pa.int64()),
                "n_dup_shingles": pc.cast(g["d_sum"], pa.int64()),
                "dup_permille": pa.array(permille),
            }
        )

    return hash_partition_merge(partials, "doc_id", fold_by_doc, k=kk)


# Blocklist scrub: the PII/profanity-redaction shape (RE2 word-boundary
# alternation, same engine in Arrow and DuckDB so outputs match byte-for-
# byte).  The list itself is a stand-in — production would ship emails /
# phones / slurs; the corpus here has no such tokens, so two common content
# words exercise the path with a nonzero redaction count.
SCRUB_PATTERN = r"\b(spark|customer)\b"
SCRUB_MASK = "<MASK>"


def word_scrub(sf_dir: str) -> Dataset:
    """(doc_id, n_redactions, clean_text): every blocklist word replaced by
    ``<MASK>`` — the redaction/scrubbing stage of a training-data pipeline.
    Two Arrow RE2 kernels per batch (count + replace), no Python loop;
    streams, no shuffle at all."""

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], SCRUB_PATTERN)
        clean = pc.replace_substring_regex(
            batch["text"], SCRUB_PATTERN, SCRUB_MASK
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_redactions": pc.cast(n, pa.int64()),
                "clean_text": clean,
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def _quality_features(batch: pa.Table, eval_set):
    """Shared fused feature kernel for T29/T54: ONE text pass computes
    n_words, the Gopher dup/top repetition permilles, the stopword
    permille, the language flag, and the contamination hit counts — each
    bit-identical to its standalone operator's kernel (doc_repetition /
    doc_quality / doc_contamination), so any composite of these features
    is reproducible by one SQL pass over the same CTEs."""
    n_rows = batch.num_rows
    words = pc.split_pattern(batch["text"], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    n_words = pc.list_value_length(words).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    flat = words.flatten()
    # repetition caps (raw-case words, same as doc_repetition)
    codes = (
        flat.dictionary_encode()
        .indices.to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_dict = int(codes.max()) + 1 if len(codes) else 1
    pairs, counts = np.unique(
        parent.astype(np.int64) * n_dict + codes, return_counts=True
    )
    pair_doc = pairs // n_dict
    distinct = np.bincount(pair_doc, minlength=n_rows).astype(np.int64)
    doc_starts = np.flatnonzero(
        np.diff(pair_doc, prepend=pair_doc[0] - 1 if len(pair_doc) else 0)
    )
    top = np.zeros(n_rows, dtype=np.int64)
    if len(pairs):
        top[pair_doc[doc_starts]] = np.maximum.reduceat(counts, doc_starts)
    # stopword floor (lowercased words, same as doc_quality)
    is_stop = pc.is_in(
        pc.utf8_lower(flat), value_set=pa.array(list(ts.STOPWORDS))
    ).to_numpy(zero_copy_only=False)
    n_stop = np.bincount(parent, weights=is_stop, minlength=n_rows).astype(
        np.int64
    )
    # contamination probe (broadcast eval set, same as doc_contamination)
    hits = _shingle_hits(batch["text"], eval_set, n_rows)

    n_safe = np.maximum(n_words, 1)
    dup = np.floor(1000.0 * (n_words - distinct) / n_safe)
    topf = np.floor(1000.0 * top / n_safe)
    stopf = np.floor(1000.0 * n_stop / n_safe)
    lang_en = pc.equal(batch["lang"], "en").to_numpy(zero_copy_only=False)
    return n_words, dup, topf, stopf, lang_en, hits


def quality_filter(
    sf_dir: str,
    *,
    eval_max_doc_id: int = 10,
    min_words: int = 20,
    max_words: int = 90,
    max_dup_permille: int = 600,
    max_top_permille: int = 130,
    min_stop_permille: int = 20,
) -> Dataset:
    """The fused preprocessing keep-decision — the flagship composition a
    training-data pipeline actually runs (C4/Gopher-style): keep a document
    iff it is (a) tagged English, (b) inside the word-count band,
    (c) below the Gopher duplicate-word and top-word repetition caps,
    (d) above the stopword-density floor, and (e) NOT contaminated against
    the benchmark eval set.  Output: kept (doc_id, source, n_words).

    ONE streaming map_batches pass computes every feature — the text is
    read once, split once, and never shuffled; the only non-local input is
    the benchmark shingle set, broadcast via ``ray.put`` exactly like T19.
    Each predicate reuses the oracle-checked kernel shape of its standalone
    operator (doc_repetition / doc_quality / doc_contamination), so the
    composite is bit-reproducible by one SQL WHERE over the same CTEs."""
    import ray

    eval_ref = _eval_shingle_ref(sf_dir, eval_max_doc_id)

    def fn(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        n_words, dup, topf, stopf, lang_en, hits = _quality_features(
            batch, ray.get(eval_ref)
        )
        keep = (
            lang_en
            & (n_words >= min_words)
            & (n_words <= max_words)
            & (dup <= max_dup_permille)
            & (topf <= max_top_permille)
            & (stopf >= min_stop_permille)
            & (hits == 0)
        )
        mask = pa.array(keep)
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(mask),
                "source": batch["source"].filter(mask),
                "n_words": pa.array(n_words[keep]),
            }
        )

    return _docs(sf_dir, ["doc_id", "source", "lang", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def stratified_sample(sf_dir: str, per_source: int = 5) -> Dataset:
    """Deterministic stratified sample: the ``per_source`` docs with the
    smallest multiplicative-hash rank within each source.

    The rank is pure arithmetic (((doc_id mod P) * K) mod P) so any engine —
    and the DuckDB oracle — reproduces it exactly; selection is per-group
    top-k over a narrow (doc_id, source, rank) projection, never the text.
    Reducing doc_id mod P BEFORE the multiply keeps every intermediate below
    (P-1)*K < 2^63, so the arithmetic is exact int64 everywhere (a raw
    doc_id*K wraps numpy int64 for doc_id >~ 3.47e9 and overflows DuckDB
    BIGINT).
    """
    P = 1_000_000_007

    def add_rank(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = ((d % P) * 2654435761) % P
        return pa.table(
            {"doc_id": b["doc_id"], "source": b["source"],
             "rank_key": pa.array(r, type=pa.int64())}
        )

    ranked = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        add_rank, batch_format="pyarrow"
    )

    def topk(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("rank_key", "ascending"), ("doc_id", "ascending")]
        )
        return g.take(idx[:per_source]).drop_columns(["rank_key"])

    return ranked.groupby("source").map_groups(topk, batch_format="pyarrow")


def token_topk(sf_dir: str, k: int = 20) -> pa.Table:
    """Heavy hitters over the F1 token stream: explode every tokens list,
    two-phase count (per-batch Arrow value_counts combiner -> hash-partition
    merge), tiny global sort.  The full stream is never shuffled — only
    per-batch (token, partial_count) rows."""
    import glob

    import ray.data as rd

    files = sorted(glob.glob(sf_dir + "/*.parquet"))

    from ..stages.shuffle import hash_partition_merge

    def partial_counts(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        vc = toks.flatten().value_counts()
        return pa.table(
            {
                "token": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    partials = rd.read_parquet(files, columns=["tokens"]).map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge(g: pa.Table) -> pa.Table:
        agg = g.group_by("token", use_threads=False).aggregate([("n", "sum")])
        return pa.table(
            {"token": agg["token"], "n": pc.cast(agg["n_sum"], pa.int64())}
        )

    merged = hash_partition_merge(partials, "token", merge, k=64)
    top = merged.sort(["n", "token"], descending=[True, False]).limit(k)
    t = pa.Table.from_pandas(top.to_pandas(), preserve_index=False)
    return pa.table(
        {"token": pc.cast(t["token"], pa.int64()), "n": t["n"]}
    )


def bigram_topk(sf_dir: str, k: int = 20) -> pa.Table:
    """Heavy hitters over consecutive TOKEN PAIRS of the F1 stream (the
    n-gram statistics pass of tokenizer/corpus analysis).  Same two-phase
    shape as :func:`token_topk`: the bigram key is one int64
    (tok_a << 32 | tok_b, exact for int32 vocab ids), per-batch np.unique
    combiner, hash-partition merge, tiny global sort — the token stream
    itself never shuffles."""
    import glob

    import ray.data as rd

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))

    def partial_counts(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        offs = np.arange(len(flat), dtype=np.int64) - starts[row_of]
        valid = offs <= lens[row_of] - 2
        i = np.flatnonzero(valid)
        key = (flat[i] << 32) | flat[i + 1]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "bg": pa.array(uk, pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = rd.read_parquet(files, columns=["tokens"]).map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge(g: pa.Table) -> pa.Table:
        agg = g.group_by("bg", use_threads=False).aggregate([("n", "sum")])
        return pa.table({"bg": agg["bg"], "n": pc.cast(agg["n_sum"], pa.int64())})

    merged = hash_partition_merge(partials, "bg", merge, k=64)
    top = merged.sort(["n", "bg"], descending=[True, False]).limit(k)
    t = pa.Table.from_pandas(top.to_pandas(), preserve_index=False)
    bg = t["bg"].to_numpy()
    return pa.table(
        {
            "tok_a": pa.array(bg >> 32, pa.int64()),
            "tok_b": pa.array(bg & 0xFFFFFFFF, pa.int64()),
            "n": t["n"],
        }
    )


def top_terms(sf_dir: str, kk: int = 3) -> Dataset:
    """Per-doc most DISTINCTIVE terms — the integer-exact TF-IDF shape:
    rank each document's words by (tf DESC, df ASC, term ASC) and keep the
    top ``kk``.  Output (doc_id, term, tf, df, rank).

    Classic two-sided aggregation, all narrow:
      1. per-batch combiner collapses the corpus to unique (doc, word, tf)
         rows (one dictionary-encode + np.unique, no Python loop);
      2. hash-partition by WORD-HASH: df = per-partition row count per word
         (rows are doc-distinct by construction), attached locally;
      3. hash-partition by doc_id: one lexsort + rank-within-run keeps the
         top-kk rows per doc.
    The full text never shuffles — only (doc, word, tf[, df]) rows; at web
    scale both exchanges are bounded by the distinct-(doc,word) count."""
    from ..stages.shuffle import hash_partition_merge

    def tf_rows(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        d = words.flatten().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_dict = int(codes.max()) + 1 if len(codes) else 1
        pairs, counts = np.unique(
            parent.astype(np.int64) * n_dict + codes, return_counts=True
        )
        pair_doc = (pairs // n_dict).astype(np.int64)
        pair_code = (pairs % n_dict).astype(np.int64)
        uniq_words = d.dictionary
        wh = ts.hash_strings64(uniq_words)
        doc = batch["doc_id"].combine_chunks().take(pa.array(pair_doc, pa.int64()))
        return pa.table(
            {
                "doc_id": doc,
                "term": uniq_words.take(pa.array(pair_code, pa.int64())),
                "tf": pa.array(counts.astype(np.int64)),
                "wh": pa.array(wh[pair_code], pa.int64()),
            }
        )

    rows = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tf_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def attach_df(t: pa.Table) -> pa.Table:
        d = t["term"].combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        df = np.bincount(codes, minlength=len(d.dictionary)).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "term": t["term"],
                "tf": t["tf"],
                "df": pa.array(df[codes]),
            }
        )

    with_df = hash_partition_merge(rows, "wh", attach_df, k=_doc_k(sf_dir))

    def topk_per_doc(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tf = t["tf"].combine_chunks().to_numpy(zero_copy_only=False)
        df = t["df"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["term"].combine_chunks().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # lexicographic rank of each unique term (ascii words; matches SQL
        # ORDER BY collation)
        uniq = np.asarray(d.dictionary.to_pylist(), dtype=object)
        lex = np.empty(len(uniq), dtype=np.int64)
        lex[np.argsort(uniq)] = np.arange(len(uniq))
        order = np.lexsort((lex[codes], df, -tf, doc))
        ds_ = doc[order]
        newg = np.empty(len(order), dtype=bool)
        if len(order):
            newg[0] = True
            newg[1:] = ds_[1:] != ds_[:-1]
        starts = np.flatnonzero(newg)
        gid = np.cumsum(newg) - 1
        rank = np.arange(len(order)) - starts[gid]
        keep = rank < kk
        take = pa.array(order[keep], pa.int64())
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks().take(take),
                "term": t["term"].combine_chunks().take(take),
                "tf": t["tf"].combine_chunks().take(take),
                "df": t["df"].combine_chunks().take(take),
                "rank": pa.array(rank[keep] + 1, pa.int64()),
            }
        )

    return hash_partition_merge(with_df, "doc_id", topk_per_doc, k=_doc_k(sf_dir))


def inverted_index(
    sf_dir: str, min_df: int = 5, df_cap: int = 1_000_000
) -> Dataset:
    """Distributed inverted-index build: per term with document frequency
    in [``min_df``, ``df_cap``], the sorted posting list of doc_ids
    (comma-joined string, so the artifact is one flat row per term and the
    DuckDB ``string_agg`` oracle compares byte-for-byte).  Output
    (term, df, postings).

    Scale shape: per-batch combiner emits DISTINCT (doc_id, term) rows
    (one dictionary-encode + np.unique — a doc's words collapse before
    anything moves); ONE hash shuffle on the term hash co-locates each
    term's postings; the per-partition build is a lexsort + one vectorized
    ``pc.binary_join`` (no Python loop over terms).  Sharding is per TERM,
    so the unit of work is one term's posting list — ``df_cap`` bounds it:
    a term in more than ``df_cap`` documents is vocabulary, not a useful
    posting list, and would otherwise be a single unbounded output row
    (the same documented-cap treatment as jaccard's ``df_cap``).  Capped
    terms are dropped, bounding per-task memory; the posting-list build
    uses large_list/int64 offsets so a partition's TOTAL kept (doc,term)
    rows (which df_cap does not bound) can exceed 2^31 without an Arrow
    offset overflow.  Remaining per-partition bound: each output row's
    joined postings string (<= df_cap ids), documented like df_cap."""
    from ..stages.shuffle import hash_partition_merge

    def doc_term_rows(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        d = words.flatten().dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_dict = int(codes.max()) + 1 if len(codes) else 1
        pairs = np.unique(parent.astype(np.int64) * n_dict + codes)
        pair_doc = (pairs // n_dict).astype(np.int64)
        pair_code = (pairs % n_dict).astype(np.int64)
        uniq = d.dictionary
        wh = ts.hash_strings64(uniq)
        return pa.table(
            {
                "doc_id": batch["doc_id"]
                .combine_chunks()
                .take(pa.array(pair_doc, pa.int64())),
                "term": uniq.take(pa.array(pair_code, pa.int64())),
                "wh": pa.array(wh[pair_code], pa.int64()),
            }
        )

    rows = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        doc_term_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def build(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "postings": pa.array([], pa.string()),
                }
            )
        term = t["term"].combine_chunks()
        d = term.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, codes))
        cs, ds_ = codes[order], doc[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = cs[1:] != cs[:-1]
        starts = np.flatnonzero(newg)
        sizes = np.diff(np.append(starts, len(order)))
        keep_g = (sizes >= min_df) & (sizes <= df_cap)
        keep_row = np.repeat(keep_g, sizes)
        kept_docs = pa.array(ds_[keep_row], pa.int64())
        offsets = np.concatenate(([0], np.cumsum(sizes[keep_g])))
        # large_list/int64 offsets: df_cap bounds ONE term's postings but
        # not a partition's total kept (doc,term) rows, so int32 offsets
        # would overflow past 2^31 rows per partition at web scale
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pc.cast(kept_docs, pa.string())
        )
        return pa.table(
            {
                "term": d.dictionary.take(
                    pa.array(cs[starts[keep_g]], pa.int64())
                ),
                "df": pa.array(sizes[keep_g].astype(np.int64)),
                "postings": pc.cast(pc.binary_join(lists, ","), pa.string()),
            }
        )

    return hash_partition_merge(rows, "wh", build, k=_doc_k(sf_dir))


def doc_embedding_join(sf_dir: str) -> Dataset:
    """Broadcast enrichment join: documents x embeddings on doc_id == vec_id.

    The small side (vec_id -> label) ships ONCE via ray.put; each batch does
    a vectorized dictionary lookup — no shuffle join for a dimension table."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"])
    ids, labels = [], []
    for b in emb.iter_batches(batch_format="pyarrow", batch_size=8192):
        ids.append(np.asarray(b["vec_id"].to_pylist(), dtype=np.int64))
        labels.append(np.asarray(b["label"].to_pylist(), dtype=np.int64))
    lookup_ref = ray.put((np.concatenate(ids), np.concatenate(labels)))

    class Enrich:
        def __init__(self, ref):
            ids, labels = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            order = np.argsort(ids)
            self.ids, self.labels = ids[order], labels[order]

        def __call__(self, b: pa.Table) -> pa.Table:
            d = b["doc_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.ids, d)
            pos = np.clip(pos, 0, len(self.ids) - 1)
            hit = self.ids[pos] == d
            lab = np.where(hit, self.labels[pos], -1)
            t = pa.table(
                {
                    "doc_id": b["doc_id"],
                    "n_chars": pc.cast(b["n_chars"], pa.int64()),
                    "label": pa.array(lab, type=pa.int64()),
                }
            )
            return t.filter(pa.array(hit))

    return _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        Enrich, fn_constructor_args=(lookup_ref,),
        batch_format="pyarrow", batch_size=8192, concurrency=2,
    )


# ---------------- dedup ----------------


def exact_dedup(sf_dir: str) -> Dataset:
    """Exact dedup by full text content: keep min doc_id per content group.

    Scale shape: hash-partition by a 64-bit content hash (narrow), never
    shuffle the text itself; per-group winner selection in map_groups.
    Returns (doc_id, dup_count).
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        # vectorized 64-bit content hash (polars/xxhash, fixed seed) — the
        # hash only partitions identical texts together, so any collision-
        # resistant deterministic function works; ~50x the per-row blake2b
        import polars as pl

        hs = (
            pl.from_arrow(batch.select(["text"]))["text"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "text_hash": pa.array(hs, type=pa.int64())}
        )

    hashed = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add_hash, batch_format="pyarrow"
    )

    # Scale shape: one content-hash key per document means millions of tiny
    # groups — Ray's sort-based groupby degrades there, so co-locate keys by
    # hash partition (stages/shuffle.py) and pick winners with ONE
    # vectorized Arrow group_by per partition.
    from ..stages.shuffle import hash_partition_merge

    def winners(g: pa.Table) -> pa.Table:
        agg = g.group_by("text_hash", use_threads=False).aggregate(
            [("doc_id", "min"), ("doc_id", "count")]
        )
        return pa.table(
            {
                "doc_id": pc.cast(agg["doc_id_min"], pa.int64()),
                "dup_count": pc.cast(agg["doc_id_count"], pa.int64()),
            }
        )

    return hash_partition_merge(hashed, "text_hash", winners, k=64)


def simhash(sf_dir: str) -> Dataset:
    """(doc_id, simhash) — 64-bit SimHash, int64-wrapped."""

    def fn(batch: pa.Table) -> pa.Table:
        vals = ts.simhash_batch(batch["text"]).view(np.int64)
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(vals, type=pa.int64())}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def simhash_near_dup(
    sf_dir: str, max_hamming: int = 3, bucket_cap: int = 4096
) -> Dataset:
    """SimHash near-duplicate pairs: (doc_a, doc_b, hamming) with
    hamming(simhash_a, simhash_b) <= ``max_hamming``.

    EXACT by pigeonhole: the 64-bit sketch splits into max_hamming+1 bands,
    so any pair within distance max_hamming agrees on at least one whole
    band — banding by (band_id, band_value) finds every such pair with no
    all-pairs scan.  Pairs are Hamming-verified inside their bucket (the
    simhash rides the shuffle, no second lookup) and deduped across bands
    with the shared hash-partition distinct.  ``bucket_cap`` guards a
    degenerate band value shared by huge doc counts (same role as the
    jaccard df cap)."""
    from ..stages.shuffle import hash_partition_merge

    bands = max_hamming + 1
    bits = 64 // bands
    sh = simhash(sf_dir)

    def to_bands(b: pa.Table) -> pa.Table:
        h = b["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        parts = []
        for bi in range(bands):
            val = (h >> np.uint64(bits * bi)) & np.uint64((1 << bits) - 1)
            parts.append(
                pa.table(
                    {
                        "band_id": pa.array(
                            np.full(len(h), bi, dtype=np.int32)
                        ),
                        "band_val": pa.array(val.view(np.int64)),
                        "doc_id": pa.array(ids, type=pa.int64()),
                        "simhash": b["simhash"],
                    }
                )
            )
        return pa.concat_tables(parts)

    banded = sh.map_batches(to_bands, batch_format="pyarrow")

    def partition_pairs(g: pa.Table) -> pa.Table:
        """All (band_id, band_val) buckets of one hash partition at once:
        lexsorted runs + per-run triu pairs — NOT a Ray groupby per bucket
        (its sort path degrades at #docs x bands group cardinality)."""
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
        if g.num_rows < 2:
            return empty
        bid = g["band_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bval = g["band_val"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        hs = g["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((ids, bval, bid))
        bid, bval, ids, hs = bid[order], bval[order], ids[order], hs[order]
        new = np.r_[True, (bid[1:] != bid[:-1]) | (bval[1:] != bval[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(ids)]
        pa_l, pb_l, x_l = [], [], []
        dropped = 0
        for s, e in zip(starts, ends):
            d = e - s
            if d < 2:
                continue
            if d > bucket_cap:
                dropped += 1
                continue
            ai, bi = np.triu_indices(d, 1)
            pa_l.append(ids[s:e][ai])
            pb_l.append(ids[s:e][bi])
            x_l.append(hs[s:e][ai] ^ hs[s:e][bi])
        if dropped:
            # the EXACT-by-pigeonhole guarantee is conditional on no bucket
            # exceeding bucket_cap — surface every violation (same
            # documented-approximation treatment as jaccard's df_cap)
            import logging

            logging.getLogger(__name__).warning(
                "simhash_near_dup: dropped %d band bucket(s) larger than "
                "bucket_cap=%d — result is a lower bound for pairs whose "
                "only agreeing band was dropped", dropped, bucket_cap,
            )
        if not pa_l:
            return empty
        x = np.concatenate(x_l)
        # vectorized popcount: 8 bytes per xor, table-free via unpackbits
        ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(
            axis=1
        ).astype(np.int64)
        keep = ham <= max_hamming
        if not keep.any():
            return empty
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(pa_l)[keep], type=pa.int64()),
                "doc_b": pa.array(np.concatenate(pb_l)[keep], type=pa.int64()),
                "hamming": pa.array(ham[keep]),
            }
        )

    cands = hash_partition_merge(banded, "band_val", partition_pairs)

    def add_key(b: pa.Table) -> pa.Table:
        h = pc.bit_wise_xor(
            pc.multiply(b["doc_a"], pa.scalar(2654435761, pa.int64())), b["doc_b"]
        )
        return b.append_column("pair_key", pc.cast(h, pa.int64()))

    def distinct(g: pa.Table) -> pa.Table:
        return (
            g.drop_columns(["pair_key"])
            .group_by(["doc_a", "doc_b", "hamming"], use_threads=False)
            .aggregate([])
        )

    return hash_partition_merge(
        cands.map_batches(add_key, batch_format="pyarrow"), "pair_key", distinct
    )


def minhash_lsh_pairs(
    sf_dir: str, *, num_perm: int = 64, bands: int = 16, jaccard_permille: int = 300
) -> Dataset:
    """MinHash+LSH near-dup candidates, Jaccard-verified — fully
    distributed, nothing corpus- or candidate-sized on the driver or in
    any one actor.

    shingle ONCE (materialized sketch rows) -> chunk-vectorized minhash
    signatures -> explode to (band_id, band_hash, doc_id) -> banded
    candidate pairs -> two hash-shuffle rounds that dedup the pairs and
    attach each side's shingle set as union rows -> exact partition-local
    Jaccard via one lexsort intersection count.
    Returns (doc_a, doc_b, jaccard_permille) with doc_a < doc_b.
    """
    rows_per_band = num_perm // bands
    a, b = ts.minhash_params(num_perm)
    _MASK64 = np.uint64((1 << 64) - 1)
    _LIST_I64 = pa.list_(pa.int64())

    def sketch_rows(batch: pa.Table) -> pa.Table:
        """Every doc's sorted-unique shingle set as ONE list row — computed
        (and materialized) ONCE; both the banding pass and the two verify
        attach rounds consume it, so the corpus is shingled once, not
        three times."""
        hasher = ts.WordHasher()
        shs = [ts.shingles(t, hasher=hasher) for t in batch["text"].to_pylist()]
        lens = np.fromiter((len(s) for s in shs), dtype=np.int64, count=len(shs))
        vals = (
            np.concatenate(shs).view(np.int64)
            if shs
            else np.empty(0, dtype=np.int64)
        )
        offs = np.zeros(len(shs) + 1, dtype=np.int32)
        np.cumsum(lens, out=offs[1:])
        lists = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(vals, pa.int64())
        )
        return pa.table(
            {"doc_id": pc.cast(batch["doc_id"], pa.int64()), "sh": lists}
        )

    sketches = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(sketch_rows, batch_format="pyarrow")
        .materialize()
    )
    # adaptive shuffle width: fixed per-round overhead dominates small
    # corpora (each of the three rounds costs ~2s at 64 parts on this
    # host), so scale the partition count with the data, capped by the
    # CPU-derived default — at web scale this is exactly shuffle_parts()
    from ..stages.shuffle import shuffle_parts as _sp

    n_docs = sketches.count()
    adaptive_k = 8  # power of two (the partition hash is a mask)
    while adaptive_k < (n_docs * bands) // 50_000:
        adaptive_k *= 2
    adaptive_k = min(adaptive_k, _sp())

    def to_bands(batch: pa.Table) -> pa.Table:
        """Chunk-vectorized signatures ((a*x+b) over the flat shingle
        vector, per-doc minimum via one reduceat per word-chunk), then ALL
        band hashes in one polynomial combine over the (docs × perms)
        matrix — band equality semantics are unchanged (equal 64-bit
        segments → equal hash; cross-collisions are 2^-64 birthday
        noise)."""
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "band_id": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.int64()),
                }
            )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        lists = (
            batch["sh"].combine_chunks()
            if isinstance(batch["sh"], pa.ChunkedArray)
            else batch["sh"]
        )
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False).view(np.uint64)
        ends = np.cumsum(lens)
        starts = ends - lens
        sigs = np.full((n, num_perm), _MASK64, dtype=np.uint64)
        chunk_words = 1 << 15
        d0 = 0
        while d0 < n:
            d1 = max(
                d0 + 1,
                min(int(np.searchsorted(ends, starts[d0] + chunk_words)), n),
            )
            nz = np.flatnonzero(lens[d0:d1] > 0) + d0
            if len(nz):
                seg = flat[starts[d0] : ends[d1 - 1]]
                with np.errstate(over="ignore"):
                    vals = seg[None, :] * a[:, None] + b[:, None]
                sigs[nz] = np.minimum.reduceat(
                    vals, starts[nz] - starts[d0], axis=1
                ).T
            d0 = d1
        with np.errstate(over="ignore"):
            bh = np.zeros((n, bands), dtype=np.uint64)
            for r in range(rows_per_band):
                cols = [bi * rows_per_band + r for bi in range(bands)]
                bh = (bh * np.uint64(0x9E3779B97F4A7C15)) ^ sigs[:, cols]
        return pa.table(
            {
                "doc_id": pa.array(
                    np.repeat(ids, bands), type=pa.int64()
                ),
                "band_id": pa.array(
                    np.tile(np.arange(bands, dtype=np.int32), n)
                ),
                "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
            }
        )

    banded = sketches.map_batches(to_bands, batch_format="pyarrow")

    from ..stages.shuffle import hash_partition_merge

    def emit_pairs(g: pa.Table) -> pa.Table:
        """All (band_id, band_hash) buckets of one hash partition at once:
        lexsorted runs + per-run triu pairs, fully numpy (no Ray groupby per
        bucket — its sort path degrades at #docs x bands cardinality)."""
        empty = pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
        if g.num_rows < 2:
            return empty
        bid = g["band_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bh = g["band_hash"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bh, bid))
        bid, bh, ids = bid[order], bh[order], ids[order]
        new = np.r_[True, (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(ids)]
        pa_l, pb_l = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ai, bi = np.triu_indices(e - s, 1)
            pa_l.append(ids[s:e][ai])
            pb_l.append(ids[s:e][bi])
        if not pa_l:
            return empty
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(pa_l), type=pa.int64()),
                "doc_b": pa.array(np.concatenate(pb_l), type=pa.int64()),
            }
        )

    candidates = hash_partition_merge(banded, "band_hash", emit_pairs, k=adaptive_k)

    # Verify true n-gram Jaccard FULLY DISTRIBUTED — nothing candidate- or
    # corpus-sized ever lands on the driver or inside one actor.  Every doc's
    # shingle SET rides the pair shuffles as one (doc_id, shingles: list)
    # sentinel row (the jaccard_pairs union-rows pattern below):
    #   round A (key doc_a): all copies of a pair meet their A-side sketch —
    #     dedup (same pair fires in several bands) folds into this round,
    #     and A's shingle list is attached by vectorized take;
    #   round B (key doc_b): B's list attaches the same way and the exact
    #     intersection is counted by one lexsort over the flattened
    #     (pair_idx, shingle) rows of both sides (shingles are unique per
    #     doc, so a value seen twice within a pair == one common shingle).
    # Per-actor memory is O(partition) — the fix for the round-2 verdict's
    # broadcast-all-candidate-texts finding.  The sketch rows are the SAME
    # materialized dataset the banding pass consumed (shingled once).

    def tag_sketch(key: str):
        sent_key = "doc_b" if key == "doc_a" else "doc_a"

        def fn(b: pa.Table) -> pa.Table:
            sent = pa.array(np.full(b.num_rows, -1, dtype=np.int64))
            cols = {key: b["doc_id"], sent_key: sent, "sh": b["sh"]}
            return pa.table({k: cols[k] for k in ("doc_a", "doc_b", "sh")})

        return fn

    def null_sh(b: pa.Table) -> pa.Table:
        return b.append_column("sh", pa.nulls(b.num_rows, _LIST_I64))

    def _attach(lst_tbl: pa.Table, key_ids: np.ndarray) -> pa.ListArray:
        """Vectorized (doc_id -> shingle-list) gather: sort the partition's
        sketch rows once, searchsorted the pair endpoints, Arrow take."""
        sid = lst_tbl["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(sid)
        lists = (
            lst_tbl["sh"].combine_chunks()
            if isinstance(lst_tbl["sh"], pa.ChunkedArray)
            else lst_tbl["sh"]
        ).take(pa.array(order))
        pos = np.searchsorted(sid[order], key_ids)
        pos = np.clip(pos, 0, max(len(sid) - 1, 0))
        return lists.take(pa.array(pos, pa.int64()))

    def round_a(g: pa.Table) -> pa.Table:
        is_sk = pc.equal(g["doc_b"], -1)
        sk = g.filter(is_sk).select(["doc_a", "sh"]).rename_columns(
            ["doc_id", "sh"]
        )
        prs = g.filter(pc.invert(is_sk))
        if prs.num_rows == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "sh": pa.array([], _LIST_I64),
                }
            )
        agg = prs.select(["doc_a", "doc_b"]).group_by(
            ["doc_a", "doc_b"], use_threads=False
        ).aggregate([])
        sh_a = _attach(sk, agg["doc_a"].to_numpy(zero_copy_only=False))
        return pa.table({"doc_a": agg["doc_a"], "doc_b": agg["doc_b"], "sh": sh_a})

    # the two attach rounds re-read the sketches with cheap kernels; a
    # compact copy at the shuffle width avoids 2x64 tiny-task launches
    # (the banding pass above already consumed the wide layout, which it
    # wants for signature-compute parallelism)
    sketches = sketches.repartition(adaptive_k).materialize()

    with_a = hash_partition_merge(
        candidates.map_batches(null_sh, batch_format="pyarrow").union(
            sketches.map_batches(tag_sketch("doc_a"), batch_format="pyarrow")
        ),
        "doc_a",
        round_a,
        k=adaptive_k,
    )

    def round_b(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard_permille": pa.array([], pa.int64()),
            }
        )
        is_sk = pc.equal(g["doc_a"], -1)
        sk = g.filter(is_sk).select(["doc_b", "sh"]).rename_columns(
            ["doc_id", "sh"]
        )
        prs = g.filter(pc.invert(is_sk))
        if prs.num_rows == 0:
            return empty
        la = (
            prs["sh"].combine_chunks()
            if isinstance(prs["sh"], pa.ChunkedArray)
            else prs["sh"]
        )
        lb = _attach(sk, prs["doc_b"].to_numpy(zero_copy_only=False))
        na = pc.list_value_length(la).to_numpy(zero_copy_only=False).astype(np.int64)
        nb = pc.list_value_length(lb).to_numpy(zero_copy_only=False).astype(np.int64)
        P = prs.num_rows
        pair_idx = np.concatenate(
            [np.repeat(np.arange(P, dtype=np.int64), na),
             np.repeat(np.arange(P, dtype=np.int64), nb)]
        )
        vals = np.concatenate(
            [pc.list_flatten(la).to_numpy(zero_copy_only=False),
             pc.list_flatten(lb).to_numpy(zero_copy_only=False)]
        )
        if len(vals):
            order = np.lexsort((vals, pair_idx))
            p, v = pair_idx[order], vals[order]
            dup = (p[1:] == p[:-1]) & (v[1:] == v[:-1])
            inter = np.bincount(p[1:][dup], minlength=P).astype(np.int64)
        else:
            inter = np.zeros(P, dtype=np.int64)
        denom = na + nb - inter
        # match ts.jaccard semantics exactly: j = inter/union (float64),
        # THEN *1000 and truncate; empty-vs-empty defines j = 1.0
        with np.errstate(invalid="ignore", divide="ignore"):
            j = np.where(denom > 0, inter / np.maximum(denom, 1), 1.0)
        jp = np.trunc(j * 1000.0).astype(np.int64)
        keep = jp >= jaccard_permille
        return pa.table(
            {
                "doc_a": prs["doc_a"].filter(pa.array(keep)),
                "doc_b": prs["doc_b"].filter(pa.array(keep)),
                "jaccard_permille": pa.array(jp[keep], type=pa.int64()),
            }
        )

    return hash_partition_merge(
        with_a.union(
            sketches.map_batches(tag_sketch("doc_b"), batch_format="pyarrow")
        ),
        "doc_b",
        round_b,
        k=adaptive_k,
    )


def jaccard_pairs(
    sf_dir: str, threshold_permille: int = 200, k: int = 3,
    df_cap: int = 1024, broadcast_cap: int = 50_000_000,
) -> Dataset:
    """EXACT n-gram (k-word shingle) Jaccard pairs — a set-similarity join.

    No per-pair set operations: |A∩B| is the count of shared shingles, so
    the whole computation is hash-partitioned count aggregations:

      shingle-explode -> partition by shingle hash -> pair counts per
      partition (numpy triu over shingle runs + Arrow group_by) ->
      pair merge + attach |A|/|B| + threshold, via EITHER one pair-keyed
      round with the (doc_id, |shingles|) pairs broadcast as sorted numpy
      arrays (corpora up to ``broadcast_cap`` docs — 16 B/doc) OR, beyond
      that, two more hash-partition rounds where the sizes ride the same
      shuffles as the pairs and the driver stays O(1).

    ``df_cap`` drops stop-shingles shared by more than ``df_cap`` documents
    BEFORE pair emission: one shingle shared by 10^6 docs would otherwise
    emit 5*10^11 pairs.  Exact whenever the corpus's max shingle document
    frequency <= df_cap (true of near-dup shingles by construction — a
    shingle that common is vocabulary, not duplication); the result is the
    standard production approximation otherwise.
    """
    import numpy as np

    from ..stages.shuffle import hash_partition_merge

    def explode(batch: pa.Table) -> pa.Table:
        hasher = ts.WordHasher()  # unique words hashed once per batch
        id_parts, sh_parts = [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            s = ts.shingles(text, k, hasher=hasher)
            sh_parts.append(s)
            id_parts.append(np.full(len(s), did, dtype=np.int64))
        sh64 = (
            np.concatenate(sh_parts).view(np.int64)
            if sh_parts
            else np.empty(0, dtype=np.int64)
        )
        ids = (
            np.concatenate(id_parts) if id_parts else np.empty(0, dtype=np.int64)
        )
        return pa.table(
            {
                "shingle": pa.array(sh64, type=pa.int64()),
                "doc_id": pa.array(ids, type=pa.int64()),
            }
        )

    exploded = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow"
    )

    def pair_counts(g: pa.Table) -> pa.Table:
        t = g.sort_by("shingle")
        sh = t["shingle"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "inter": pa.array([], type=pa.int64()),
            }
        )
        if len(sh) == 0:
            return empty
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        ends = np.r_[starts[1:], len(sh)]
        pa_, pb_ = [], []
        for s, e in zip(starts, ends):
            if e - s < 2 or e - s > df_cap:  # df cap: stop-shingle guard
                continue
            members = np.sort(ids[s:e])
            ai, bi = np.triu_indices(len(members), 1)
            pa_.append(members[ai])
            pb_.append(members[bi])
        if not pa_:
            return empty
        tbl = pa.table(
            {
                "doc_a": pa.array(np.concatenate(pa_), type=pa.int64()),
                "doc_b": pa.array(np.concatenate(pb_), type=pa.int64()),
            }
        )
        agg = tbl.group_by(["doc_a", "doc_b"], use_threads=False).aggregate(
            [("doc_a", "count")]
        )
        return pa.table(
            {
                "doc_a": agg["doc_a"],
                "doc_b": agg["doc_b"],
                "inter": pc.cast(agg["doc_a_count"], pa.int64()),
            }
        )

    partials = hash_partition_merge(exploded, "shingle", pair_counts, k=64)

    # doc -> shingle-set size, attached DISTRIBUTED: the (doc_id, n) rows
    # ride the same hash shuffles as the pair stream — the driver never
    # materializes anything corpus-sized.  Size rows are tagged with the
    # OTHER endpoint == -1 (real doc ids are non-negative), so one union per
    # round suffices.  Because every partial for a pair (a, b) hashes to the
    # same doc_a partition, the cross-partition pair merge folds into round
    # A — the whole join is THREE shuffle rounds total (shingle, doc_a,
    # doc_b), and round B also finalizes the Jaccard threshold in place.
    def size_batch(b: pa.Table) -> pa.Table:
        hasher = ts.WordHasher()
        ns = [len(ts.shingles(t, k, hasher=hasher)) for t in b["text"].to_pylist()]
        return pa.table(
            {"doc_id": b["doc_id"], "n": pa.array(ns, type=pa.int64())}
        )

    # materialized ONCE (narrow per-doc rows): both attach rounds consume it
    sizes_ds = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(size_batch, batch_format="pyarrow")
        .materialize()
    )

    # Hybrid size attach (both forms are scale-sanctioned): up to
    # ``broadcast_cap`` docs the (doc_id, n) pairs are a numpy broadcast
    # (16 B/doc — ~800 MB at 50M docs) and the join needs ONE pair-merge
    # round; beyond that the sizes ride the pair shuffles as union rows
    # (two attach rounds, driver stays O(1)).
    if sizes_ds.count() <= broadcast_cap:
        ids_l, ns_l = [], []
        for b in sizes_ds.iter_batches(batch_format="pyarrow", batch_size=65536):
            ids_l.append(b["doc_id"].to_numpy(zero_copy_only=False))
            ns_l.append(b["n"].to_numpy(zero_copy_only=False))
        ids = np.concatenate(ids_l) if ids_l else np.empty(0, np.int64)
        ns = np.concatenate(ns_l) if ns_l else np.empty(0, np.int64)
        order = np.argsort(ids)
        sizes_ref = ray.put((ids[order], ns[order]))

        def add_pair_key(b: pa.Table) -> pa.Table:
            h = pc.bit_wise_xor(
                pc.multiply(b["doc_a"], pa.scalar(2654435761, pa.int64())),
                b["doc_b"],
            )
            return b.append_column("pair_key", pc.cast(h, pa.int64()))

        def merge_finalize(g: pa.Table) -> pa.Table:
            agg = (
                g.drop_columns(["pair_key"])
                .group_by(["doc_a", "doc_b"], use_threads=False)
                .aggregate([("inter", "sum")])
            )
            sids, sns = ray.get(sizes_ref)
            da = agg["doc_a"].to_numpy(zero_copy_only=False)
            db = agg["doc_b"].to_numpy(zero_copy_only=False)
            inter = agg["inter_sum"].to_numpy(zero_copy_only=False)
            na = sns[np.searchsorted(sids, da)] if len(sids) else da * 0
            nb = sns[np.searchsorted(sids, db)] if len(sids) else db * 0
            jp = np.floor(1000.0 * inter / (na + nb - inter)).astype(np.int64)
            keep = jp >= threshold_permille
            return pa.table(
                {
                    "doc_a": pa.array(da[keep], type=pa.int64()),
                    "doc_b": pa.array(db[keep], type=pa.int64()),
                    "jaccard_permille": pa.array(jp[keep], type=pa.int64()),
                }
            )

        return hash_partition_merge(
            partials.map_batches(add_pair_key, batch_format="pyarrow"),
            "pair_key",
            merge_finalize,
            k=64,
        )

    def tag_sizes(key: str, with_na: bool):
        def fn(b: pa.Table) -> pa.Table:
            sent = pa.array(np.full(b.num_rows, -1, dtype=np.int64))
            out = pa.table(
                {
                    "doc_a": b["doc_id"] if key == "doc_a" else sent,
                    "doc_b": b["doc_id"] if key == "doc_b" else sent,
                    "inter": b["n"],
                }
            )
            if with_na:
                out = out.append_column("na", pa.nulls(b.num_rows, pa.int64()))
            return out

        return fn

    def _size_lookup(szs: pa.Table, key: str, pid: np.ndarray) -> np.ndarray:
        sid = szs[key].to_numpy(zero_copy_only=False)
        sn = szs["inter"].to_numpy(zero_copy_only=False)
        order = np.argsort(sid)
        sid, sn = sid[order], sn[order]
        if not len(sid):
            return np.zeros(len(pid), dtype=np.int64)
        pos = np.clip(np.searchsorted(sid, pid), 0, len(sid) - 1)
        return sn[pos]

    def round_a(g: pa.Table) -> pa.Table:
        """Merge pair partials by (doc_a, doc_b) AND attach |A| = na."""
        is_size = pc.equal(g["doc_b"], -1)
        szs = g.filter(is_size)
        prs = g.filter(pc.invert(is_size))
        if prs.num_rows == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "inter": pa.array([], pa.int64()),
                    "na": pa.array([], pa.int64()),
                }
            )
        agg = prs.group_by(["doc_a", "doc_b"], use_threads=False).aggregate(
            [("inter", "sum")]
        )
        na = _size_lookup(
            szs, "doc_a", agg["doc_a"].to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "doc_a": agg["doc_a"],
                "doc_b": agg["doc_b"],
                "inter": pc.cast(agg["inter_sum"], pa.int64()),
                "na": pa.array(na, type=pa.int64()),
            }
        )

    with_na = hash_partition_merge(
        partials.union(
            sizes_ds.map_batches(tag_sizes("doc_a", False), batch_format="pyarrow")
        ),
        "doc_a",
        round_a,
        k=64,
    )

    def round_b(g: pa.Table) -> pa.Table:
        """Attach |B| = nb and finalize the thresholded Jaccard in place."""
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard_permille": pa.array([], pa.int64()),
            }
        )
        is_size = pc.equal(g["doc_a"], -1)
        szs = g.filter(is_size)
        prs = g.filter(pc.invert(is_size))
        if prs.num_rows == 0:
            return empty
        inter = prs["inter"].to_numpy(zero_copy_only=False)
        na = prs["na"].to_numpy(zero_copy_only=False)
        nb = _size_lookup(
            szs, "doc_b", prs["doc_b"].to_numpy(zero_copy_only=False)
        )
        jp = np.floor(1000.0 * inter / (na + nb - inter)).astype(np.int64)
        keep = jp >= threshold_permille
        return pa.table(
            {
                "doc_a": prs["doc_a"].filter(pa.array(keep)),
                "doc_b": prs["doc_b"].filter(pa.array(keep)),
                "jaccard_permille": pa.array(jp[keep], type=pa.int64()),
            }
        )

    return hash_partition_merge(
        with_na.union(
            sizes_ds.map_batches(tag_sizes("doc_b", True), batch_format="pyarrow")
        ),
        "doc_b",
        round_b,
        k=64,
    )


# Above this many vectors the exact all-pairs kernel is refused unless the
# caller opts in: the O(N^2) matmul is the correctness BASELINE for the LSH
# scale path, never the production entry (VERDICT r4 #4).
EXACT_NEAR_DUP_MAX_ROWS = 200_000


def embedding_near_dup(
    sf_dir: str, threshold_permille: int = 450, *,
    exact: bool = False, max_rows: int = EXACT_NEAR_DUP_MAX_ROWS,
) -> Dataset:
    """Embedding-cosine near-duplicate pairs (exact): (vec_a, vec_b,
    sim_permille) with vec_a < vec_b and cosine(a, b) >= threshold.

    The normalized matrix is broadcast ONCE via ``ray.put`` (read in each
    actor's ``__init__``); every batch does one numpy matmul against it.

    This is the exact O(N^2) oracle baseline.  Inputs larger than
    ``max_rows`` vectors are REFUSED with a loud error pointing at the
    bucketed scale path (``embedding_near_dup_lsh``) unless the caller
    passes ``exact=True`` — the guard exists so the quadratic baseline
    cannot be reached by accident at 100-TB scale.
    """
    from ..functions.similarity import NearDupScorer, _batch_matrix

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    if not exact:
        n = emb.count()  # parquet metadata read — no data scan
        if n > max_rows:
            raise ValueError(
                f"embedding_near_dup is the exact O(N^2) baseline and the "
                f"input has {n} vectors (> {max_rows}).  Use "
                f"embedding_near_dup_lsh (the bucketed scale path), or pass "
                f"exact=True to force the quadratic kernel."
            )
    ids_list, mats = [], []
    for batch in emb.iter_batches(batch_format="pyarrow", batch_size=8192):
        ids_list.append(np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64))
        mats.append(_batch_matrix(batch, "embedding"))
    mat_ref = ray.put(np.vstack(mats))
    ids_ref = ray.put(np.concatenate(ids_list))

    # task-pool function with a per-worker memoized scorer: the broadcast
    # matrix is ray.get'd ONCE per worker process (local plasma, zero-copy),
    # NOT per batch — and unlike an actor pool whose constructor args are
    # ObjectRefs, there is no restartable-actor state to lose when the refs
    # leave driver scope (ray#53727 crashes ray.shutdown in that combo)
    memo: dict = {}

    def score(batch: pa.Table) -> pa.Table:
        s = memo.get("scorer")
        if s is None:
            s = NearDupScorer(mat_ref, ids_ref, threshold_permille)
            memo["scorer"] = s
        return s(batch)

    return emb.map_batches(score, batch_format="pyarrow", batch_size=2048)


def embedding_near_dup_lsh(
    sf_dir: str, threshold_permille: int = 450, *,
    n_planes: int = 4, n_tables: int = 8,
) -> Dataset:
    """Embedding-cosine near-dup, BUCKETED (the scale path for
    ``embedding_near_dup``): multi-table hyperplane LSH co-buckets probable
    neighbors, each bucket is exact-scored, pairs dedup across tables.
    Emitted sims are exact (precision 1.0 vs the exact query); recall is
    1-(1-s^p)^L, so rows-only check.  Returns (vec_a, vec_b, sim_permille)."""
    from ..functions.similarity import near_dup_pairs_lsh

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return near_dup_pairs_lsh(
        emb, threshold_permille, n_planes=n_planes, n_tables=n_tables
    )


# ---------------- similarity search ----------------


def _pandas_with_cols(ds, cols):
    """to_pandas that survives the all-empty case: Ray's to_pandas drops
    column names when a dataset has zero rows, so downstream column access
    on a fully-filtered corpus raises — rebuild the empty frame typed."""
    import pandas as pd

    df = ds.to_pandas()
    if len(df.columns) == 0:
        df = pd.DataFrame({c: [] for c in cols})
    return df


def ann_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """Exact cosine top-k of embeddings vs the query vector (vec_id == 0).

    Returns (vec_id, rank); the query vector itself is excluded.
    """
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = None
    for batch in emb.iter_batches(batch_format="pyarrow", batch_size=4096):
        m = pc.equal(batch["vec_id"], 0)
        if pc.any(m).as_py():
            q = np.asarray(batch.filter(m)["embedding"].to_pylist()[0], dtype=np.float64)
            break
    assert q is not None, "vec_id 0 not found"
    ds = emb.filter(expr="vec_id != 0")
    top = _pandas_with_cols(cosine_topk(ds, q[None, :], k=k), ["vec_id", "sim"])
    top = top.sort_values(
        ["sim", "vec_id"], ascending=[False, True]
    ).reset_index(drop=True)
    return pa.table(
        {
            "vec_id": pa.array(top["vec_id"].astype("int64")),
            "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
        }
    )


def ann_lsh_topk(
    sf_dir: str, k: int = 10, n_planes: int = 4, n_tables: int = 16,
    seed: int = 42,
) -> pa.Table:
    """Multi-table LSH ANN (the scale path): the query's bucket in each of
    L independent hyperplane tables is collected, the candidate union is
    exact-rescored, top-k returned.  Candidate recall is 1-(1-s^p)^L per
    true neighbor (vs s^p single-table).  Approximate by construction —
    rows-only check; recall vs exact asserted in tests."""
    from ..functions.similarity import _normalize, lsh_bucket_ids

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    first = emb.take_batch(1, batch_format="pyarrow")
    dim = len(first["embedding"][0].as_py())
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    q = None
    for batch in emb.iter_batches(batch_format="pyarrow", batch_size=4096):
        m = pc.equal(batch["vec_id"], 0)
        if pc.any(m).as_py():
            q = np.asarray(
                batch.filter(m)["embedding"].to_pylist()[0], dtype=np.float64
            )
            break
    qn = _normalize(q[None, :])
    qbuckets = np.array(
        [int(lsh_bucket_ids(qn, planes[t])[0]) for t in range(n_tables)],
        dtype=np.int64,
    )
    planes_ref = ray.put(planes)
    qb_ref = ray.put(qbuckets)

    memo: dict = {}

    def candidate_ids(batch: pa.Table) -> pa.Table:
        """Emits the vec_ids landing in ANY table's query bucket; the
        planes/buckets broadcast is ray.get'd once per worker (memo)."""
        from ..functions.similarity import _batch_matrix

        pq_ = memo.get("pq")
        if pq_ is None:
            pq_ = (ray.get(planes_ref), ray.get(qb_ref))
            memo["pq"] = pq_
        planes_w, qb_w = pq_
        m = _normalize(_batch_matrix(batch, "embedding"))
        hit = np.zeros(len(m), dtype=bool)
        for t in range(planes_w.shape[0]):
            hit |= lsh_bucket_ids(m, planes_w[t]) == qb_w[t]
        return pa.table({"vec_id": batch["vec_id"].filter(pa.array(hit))})

    # candidate ids are tiny (union of L buckets) — collected, broadcast,
    # and the rescore streams over the original vectors with one is_in
    cand_parts = [
        b["vec_id"].to_numpy(zero_copy_only=False)
        for b in emb.map_batches(
            candidate_ids, batch_format="pyarrow", batch_size=4096
        ).iter_batches(batch_format="pyarrow", batch_size=65536)
    ]
    cand_ids = (
        np.unique(np.concatenate(cand_parts))
        if cand_parts
        else np.array([], np.int64)
    )
    cand_set = pa.array(cand_ids[cand_ids != 0], type=pa.int64())

    def pick(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["vec_id"], value_set=cand_set))

    cand = emb.map_batches(pick, batch_format="pyarrow")
    top = _pandas_with_cols(cosine_topk(cand, q[None, :], k=k), ["vec_id", "sim"])
    return pa.table(
        {
            "vec_id": pa.array(top["vec_id"].astype("int64")),
            "sim_permille": pa.array((top["sim"] * 1000).astype("int64")),
        }
    )


def ann_ivf_topk(
    sf_dir: str, k: int = 10, n_centroids: int = 16, nprobe: int = 4
) -> pa.Table:
    """IVF-bucketed ANN (the other scale path): a k-means coarse quantizer
    over a driver-side sample, vectors assigned to cells by one matmul per
    batch, and only the query's ``nprobe`` nearest cells exact-scored.
    Approximate by construction — rows-only check.

    Reference shape: sample→centroids is the tiny broadcast side
    (``ray.put`` once), assignment + scoring stream per batch."""
    from ..functions.similarity import (
        IvfAssigner, _batch_matrix, _normalize, kmeans_centroids,
    )

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    sample = emb.limit(4096).take_batch(4096, batch_format="pyarrow")
    cents = kmeans_centroids(_batch_matrix(sample, "embedding"), n_centroids)
    cents_ref = ray.put(cents)
    assigned = emb.map_batches(
        IvfAssigner(cents_ref), batch_format="pyarrow", batch_size=4096
    )
    q = None
    for batch in emb.iter_batches(batch_format="pyarrow", batch_size=4096):
        m = pc.equal(batch["vec_id"], 0)
        if pc.any(m).as_py():
            q = np.asarray(batch.filter(m)["embedding"].to_pylist()[0], dtype=np.float64)
            break
    qcells = np.argsort(-(_normalize(q[None, :]) @ cents.T)[0])[:nprobe]
    cells = ", ".join(str(int(c)) for c in qcells)
    cand = assigned.filter(expr=f"ivf_cell in [{cells}] and vec_id != 0")
    top = _pandas_with_cols(
        cosine_topk(cand.drop_columns(["ivf_cell"]), q[None, :], k=k),
        ["vec_id", "sim"],
    )
    return pa.table(
        {
            "vec_id": pa.array(top["vec_id"].astype("int64")),
            "sim_permille": pa.array((top["sim"] * 1000).astype("int64")),
        }
    )


def embedding_stats(sf_dir: str) -> Dataset:
    """(label, n, dim) — grouped count + dimensionality check (SQL-checkable)."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")

    def fn(batch: pa.Table) -> pa.Table:
        dims = pc.list_value_length(batch["embedding"]).cast(pa.int64())
        return pa.table({"label": batch["label"], "dim": dims})

    from ray.data.aggregate import Count, Max

    return (
        emb.map_batches(fn, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Count(alias_name="n"), Max("dim", alias_name="dim"))
        .map_batches(
            lambda t: pa.table(
                {
                    "label": pc.cast(t["label"], pa.int32()),
                    "n": pc.cast(t["n"], pa.int64()),
                    "dim": pc.cast(t["dim"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


# ---------------- multimodal ----------------


def _to_payload(batch: pa.Table) -> pa.Table:
    """text -> opaque binary payload, zero-copy (utf-8 string and binary
    share the same Arrow buffer layout — no per-row encode loop)."""
    return pa.table(
        {"doc_id": batch["doc_id"], "payload": pc.cast(batch["text"], pa.binary())}
    )


def multimodal_features(sf_dir: str) -> Dataset:
    """The multimodal decode/feature-extract plumbing end to end with the
    deterministic fake decoder (real decode libs are stubbed per
    environment constraints): binary payloads -> actor-pool decode stage ->
    fixed-size feature vectors.  Returns (doc_id, feat_norm_permille)."""
    from ..functions.multimodal import ImageDecodeStub

    feats = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_to_payload, batch_format="pyarrow")
        .map_batches(
            ImageDecodeStub,
            fn_constructor_kwargs=dict(fake=True),
            batch_format="pyarrow",
            batch_size=512,  # small batches: binary rows are wide
            concurrency=2,
        )
    )

    def norm(batch: pa.Table) -> pa.Table:
        f = batch["features"]
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        # float64 throughout: the fake-law feature values are exact
        # integers in float32, so sum-of-squares/sqrt/floor in float64 is
        # bit-reproducible by the DuckDB oracle
        m = (
            np.asarray(f.flatten().to_numpy(zero_copy_only=False))
            .reshape(len(f), -1)
            .astype(np.float64)
        )
        n = np.floor(np.sqrt((m * m).sum(axis=1)) * 1000.0).astype(np.int64)
        return pa.table(
            {"doc_id": batch["doc_id"], "feat_norm_permille": pa.array(n)}
        )

    return feats.map_batches(norm, batch_format="pyarrow")


def multimodal_frame_sample(
    sf_dir: str, frame_bytes: int = 64, stride: int = 4
) -> Dataset:
    """The frame-sampling plumbing end to end with the deterministic
    byte-slice stub (real codecs are stubbed per environment constraints):
    binary payloads -> actor-pool FrameSampler -> per-frame rows.  Returns
    (doc_id, frame_idx, frame_len) — SQL-checkable (the slicing law is pure
    arithmetic over octet_length)."""
    from ..functions.multimodal import FrameSampler

    frames = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_to_payload, batch_format="pyarrow")
        .map_batches(
            FrameSampler,
            fn_constructor_kwargs=dict(
                fake=True, frame_bytes=frame_bytes, stride=stride
            ),
            batch_format="pyarrow",
            batch_size=512,  # small batches: binary rows are wide
            concurrency=2,
        )
    )

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "frame_idx": b["frame_idx"],
                "frame_len": pc.cast(
                    pc.binary_length(b["frame_payload"]), pa.int64()
                ),
            }
        )

    return frames.map_batches(project, batch_format="pyarrow")


def multimodal_meta(sf_dir: str) -> Dataset:
    """Treat each document's utf-8 bytes as an opaque binary payload and run
    the (real) metadata stage of the multimodal path.
    Returns (doc_id, payload_bytes, kind)."""

    meta = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_to_payload, batch_format="pyarrow")
        .map_batches(PayloadMeta, batch_format="pyarrow", batch_size=1024, concurrency=2)
    )
    return meta


# ---------------------------------------------------------------------------
# T20: near-dup cluster assignment (connected components over the pair graph)
# ---------------------------------------------------------------------------

# Session-scoped cache of materialized dedup intermediates: the cluster
# labels are a reusable artifact (computed once, applied by near_dedup_keep
# / corpus_prep / any downstream filter), exactly like the cascade's shared
# materialized tiers.  Keyed by the Ray job id so a dataset from a dead
# session is never returned.
_DEDUP_CACHE: dict[tuple, Dataset] = {}


def _dedup_cache_key(sf_dir: str, params: tuple) -> tuple:
    import ray

    try:
        job = ray.get_runtime_context().get_job_id()
    except Exception:
        job = ""
    return (job, sf_dir, params)


def dup_clusters(
    sf_dir: str, threshold_permille: int = 200, max_rounds: int = 32,
    shuffle_k: int | None = None, pairs: Dataset | None = None,
) -> Dataset:
    """Connected components over the exact-Jaccard near-dup pair graph —
    the step that turns pairwise similarity into DEDUP DECISIONS (one
    winner per cluster, not per pair).  Output: (doc_id, cluster_id) for
    every doc that appears in at least one pair, cluster_id = the minimum
    doc_id reachable through the pair graph.

    Distributed min-label propagation at ONE hash shuffle per hop: edge
    rows (keyed by src), label rows (keyed by node) and the previous
    hop's (dst, label) messages all hash-partition on the same key, so a
    single per-partition kernel folds the incoming messages into each
    node's label (lexsort + minimum-per-run) AND emits the next hop's
    messages from the co-located edges (vectorized searchsorted) — the
    fold of hop r and the attach of hop r+1 share one exchange.  The
    driver sees only a scalar changed-count per hop; per-task memory is
    O(partition).

    Hops needed = graph diameter (no pointer jumping): near-dup clusters
    are dense by construction, so diameters are single-digit;
    ``max_rounds`` bounds the pathological chain case, and a capped run
    yields each node's min label within ``max_rounds`` hops (a refinement,
    documented like df_cap).  State is edge-proportional, never
    corpus-proportional — singleton docs never enter the computation.

    ``pairs`` lets callers supply a precomputed pair graph; otherwise the
    materialized cluster labels are cached per (session, sf_dir, params)
    so near_dedup_keep / corpus_prep reuse them instead of re-running the
    shingle→pair→propagation chain.
    """
    import numpy as np

    from ..stages.shuffle import hash_partition_merge, width_for_rows

    cache_key = None
    if pairs is None:
        cache_key = _dedup_cache_key(
            sf_dir, ("clusters", threshold_permille, max_rounds, shuffle_k)
        )
        cached = _DEDUP_CACHE.get(cache_key)
        if cached is not None:
            return cached
        pairs = jaccard_pairs(sf_dir, threshold_permille=threshold_permille)
    KIND_EDGE, KIND_LABEL, KIND_MSG, KIND_COUNT = 0, 1, 2, 3

    def to_edges(b: pa.Table) -> pa.Table:
        a = b["doc_a"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        bb = b["doc_b"].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        n2 = 2 * len(a)
        return pa.table(
            {
                "key": pa.array(np.concatenate([a, bb])),
                "dst": pa.array(np.concatenate([bb, a])),
                "lab": pa.array(np.zeros(n2, np.int64)),
                "kind": pa.array(np.full(n2, KIND_EDGE, np.int64)),
            }
        )

    # compact the edge list once: it inherits jaccard's wide block layout
    # (tiny blocks), and every propagation hop re-reads it — kk blocks keep
    # the per-hop task count at the shuffle width instead of 64+.  The
    # propagation width scales with the materialized edge-list row count
    # (width_for_rows: floor 8, saturating to full shuffle width): at web
    # dup rates the edge list is corpus-sized, and a fixed small width
    # would funnel every hop through a handful of partitions.
    edges0 = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    kk = shuffle_k or width_for_rows(edges0.count(), 65_536)
    edges = edges0.repartition(kk).materialize()

    def seed(b: pa.Table) -> pa.Table:
        """Initial labels (node = own id) AND the first hop's messages
        (dst <- src id), straight from the edge rows — the first fold is
        then a real propagation step, not a seed-collapse barrier."""
        src = b["key"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = b["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        u = np.unique(src)
        return pa.table(
            {
                "key": pa.array(np.concatenate([u, dst])),
                "dst": pa.array(np.zeros(len(u) + len(dst), np.int64)),
                "lab": pa.array(np.concatenate([u, src])),
                "kind": pa.array(
                    np.concatenate(
                        [
                            np.full(len(u), KIND_LABEL, np.int64),
                            np.full(len(dst), KIND_MSG, np.int64),
                        ]
                    )
                ),
            }
        )

    def step(t: pa.Table) -> pa.Table:
        kind = t["kind"].combine_chunks().to_numpy(zero_copy_only=False)
        key = t["key"].combine_chunks().to_numpy(zero_copy_only=False)
        lab = t["lab"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        lbl, msg, edg = kind == KIND_LABEL, kind == KIND_MSG, kind == KIND_EDGE
        ln, ll = key[lbl], lab[lbl]
        o = np.argsort(ln, kind="stable")
        ln, ll = ln[o], ll[o]
        # duplicate-free seed labels: per-partition uniques of a node are
        # collapsed here (first round only), keeping min lab per node
        allk = np.concatenate([ln, key[msg]])
        alll = np.concatenate([ll, lab[msg]])
        o2 = np.lexsort((alll, allk))
        ak, al = allk[o2], alll[o2]
        if len(ak):
            starts = np.flatnonzero(np.diff(ak, prepend=ak[0] - 1))
            un, newl = ak[starts], al[starts]
        else:
            un = newl = np.empty(0, np.int64)
        # old label per unique node for the changed count (ln may hold
        # duplicates only in the seeding round; min of dups == unique min)
        if len(ln):
            lstarts = np.flatnonzero(np.diff(ln, prepend=ln[0] - 1))
            old = ll[lstarts]
        else:
            old = np.empty(0, np.int64)
        changed = int(np.count_nonzero(newl < old)) if len(old) else 0
        ek, ed = key[edg], dst[edg]
        epos = np.searchsorted(un, ek)
        elab = newl[epos]  # every edge src has a label row by construction
        n_l, n_m = len(un), len(ek)
        return pa.table(
            {
                "key": pa.array(np.concatenate([un, ed, [-1]])),
                "dst": pa.array(np.zeros(n_l + n_m + 1, np.int64)),
                "lab": pa.array(
                    np.concatenate([newl, elab, [changed]])
                ),
                "kind": pa.array(
                    np.concatenate(
                        [
                            np.full(n_l, KIND_LABEL, np.int64),
                            np.full(n_m, KIND_MSG, np.int64),
                            [KIND_COUNT],
                        ]
                    )
                ),
            }
        )

    state = edges.map_batches(seed, batch_format="pyarrow")
    for _hop in range(max_rounds):
        out = hash_partition_merge(
            state.union(edges), "key", step, k=kk
        ).materialize()
        counts = out.map_batches(
            lambda b: pa.table(
                {"c": pc.filter(b["lab"], pc.equal(b["kind"], KIND_COUNT))}
            ),
            batch_format="pyarrow",
        )
        changed = counts.sum("c") or 0
        state = out.map_batches(
            lambda b: b.filter(pc.not_equal(b["kind"], KIND_COUNT)),
            batch_format="pyarrow",
        )
        if changed == 0:  # fixed point: the fold moved no label
            break

    def rename(b: pa.Table) -> pa.Table:
        m = b.filter(pc.equal(b["kind"], KIND_LABEL))
        return pa.table({"doc_id": m["key"], "cluster_id": m["lab"]})

    out = state.map_batches(rename, batch_format="pyarrow")
    if cache_key is not None:
        out = out.materialize()  # edge-proportional label rows, never text
        _DEDUP_CACHE[cache_key] = out
    return out


# ---------------------------------------------------------------------------
# T21: exact distributed quantiles (bounded-int histogram combiner)
# ---------------------------------------------------------------------------

def length_quantiles(sf_dir: str) -> Dataset:
    """EXACT per-source token-length quantiles (p50/p90/p99) — corpus
    length profiling for mixture balancing.

    The mergeable-sketch pattern with an exact sketch: token counts are
    small bounded ints, so each batch pre-aggregates to a (source, n_tok)
    histogram (one Arrow group_by — the combiner), and the ONLY shuffle
    moves histograms, never documents.  The per-source merge is a cumsum
    + searchsorted over at most |value domain| rows.  ``quantile_disc``
    semantics (smallest value whose cumulative count >= ceil(q*n)), so
    the DuckDB oracle matches bit-exactly.  A continuous metric would
    swap the histogram for a t-digest; the dataflow shape is identical.
    """
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(batch["text"], " "))
        t = pa.table(
            {"source": batch["source"], "n_tok": pc.cast(n, pa.int64())}
        )
        return t.group_by(["source", "n_tok"]).aggregate([("n_tok", "count")])

    def merge(g: pa.Table) -> pa.Table:
        nt = g["n_tok"].combine_chunks().to_numpy(zero_copy_only=False)
        cnt = g["n_tok_count"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(nt, kind="stable")
        nt, cnt = nt[order], cnt[order]
        cum = np.cumsum(cnt)
        total = int(cum[-1])
        out = {"source": g["source"][:1], "n_docs": pa.array([total], pa.int64())}
        for name, q in (("p50", 500), ("p90", 900), ("p99", 990)):
            thr = (total * q + 999) // 1000
            pos = int(np.searchsorted(cum, thr, side="left"))
            out[name] = pa.array([int(nt[pos])], pa.int64())
        return pa.table(out)

    return (
        _docs(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .map_groups(merge, batch_format="pyarrow")
    )


def near_dedup_keep(
    sf_dir: str, threshold_permille: int = 200,
    clusters: Dataset | None = None,
) -> Dataset:
    """The dedup DECISION applied: keep every document except non-winner
    near-dup cluster members (winner = min doc_id per T20 cluster).
    Output (doc_id, source) of survivors.

    Scale shape: a hash-partitioned ANTI-JOIN — survivor filtering must
    not broadcast the loser set (at web-crawl dup rates losers are
    corpus-sized), so corpus ids and loser marks meet by doc_id hash and
    each partition drops its marked rows with one vectorized searchsorted;
    document text never moves, only (doc_id, source) ids.

    ``clusters`` lets callers pass precomputed (doc_id, cluster_id)
    labels; otherwise :func:`dup_clusters`' session cache supplies them,
    so the shingle→pair→propagation chain runs once per corpus, not once
    per downstream consumer.
    """
    import numpy as np

    from ..stages.shuffle import hash_partition_merge

    if clusters is None:
        clusters = dup_clusters(sf_dir, threshold_permille=threshold_permille)

    def losers(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b["doc_id"], b["cluster_id"])
        t = b.filter(keep)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "source": pa.nulls(t.num_rows, pa.string()),
                "is_loser": pa.array(np.ones(t.num_rows, dtype=bool)),
            }
        )

    def corpus(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "source": b["source"],
                "is_loser": pa.array(np.zeros(b.num_rows, dtype=bool)),
            }
        )

    def anti(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        isl = t["is_loser"].combine_chunks().to_numpy(zero_copy_only=False)
        lose = np.unique(ids[isl])
        rows = ~isl
        if len(lose):
            pos = np.searchsorted(lose, ids)
            pos[pos == len(lose)] = 0
            rows &= lose[pos] != ids
        keep_idx = np.flatnonzero(rows)
        out = t.take(pa.array(keep_idx, pa.int64()))
        return out.drop_columns(["is_loser"])

    both = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        corpus, batch_format="pyarrow"
    ).union(clusters.map_batches(losers, batch_format="pyarrow"))
    return hash_partition_merge(both, "doc_id", anti, k=_doc_k(sf_dir))


def length_filter(
    sf_dir: str, lo_q: int = 100, hi_q: int = 900
) -> Dataset:
    """Per-source length-outlier removal: keep documents whose token count
    lies within the source's [p10, p90] (``quantile_disc`` rank semantics,
    ceil(q*n), same as :func:`length_quantiles`) — the standard
    truncation/boilerplate cleaning step before mixing a corpus.

    Two passes over a narrow projection, nothing corpus-sized on the
    driver: text is tokenized ONCE into a materialized (doc_id, source,
    n_tok) dataset (~1% of corpus width — pack_sequences' pattern), the
    (source, n_tok) histogram combiner from length_quantiles gives
    per-source bounds (sources x |length domain| rows -> driver dict,
    broadcast), then one vectorized filter pass maps each row's source
    through the bounds via dictionary-encode + numpy take.
    """

    def project(b: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(b["text"], " "))
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "source": b["source"],
                "n_tok": pc.cast(n, pa.int64()),
            }
        )

    narrow = (
        _docs(sf_dir, ["doc_id", "source", "text"])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    def partial(batch: pa.Table) -> pa.Table:
        return batch.select(["source", "n_tok"]).group_by(
            ["source", "n_tok"]
        ).aggregate([("n_tok", "count")])

    def bounds(g: pa.Table) -> pa.Table:
        nt = g["n_tok"].combine_chunks().to_numpy(zero_copy_only=False)
        cnt = g["n_tok_count"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(nt, kind="stable")
        nt, cnt = nt[order], cnt[order]
        cum = np.cumsum(cnt)
        total = int(cum[-1])
        out = {"source": g["source"][:1]}
        for name, q in (("lo", lo_q), ("hi", hi_q)):
            thr = (total * q + 999) // 1000
            pos = int(np.searchsorted(cum, thr, side="left"))
            out[name] = pa.array([int(nt[pos])], pa.int64())
        return pa.table(out)

    bt = (
        narrow.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .map_groups(bounds, batch_format="pyarrow")
        .take_all()
    )  # one row per source — bounded by construction
    lims = {r["source"]: (r["lo"], r["hi"]) for r in bt}

    def keep(b: pa.Table) -> pa.Table:
        n = b["n_tok"].combine_chunks().to_numpy(zero_copy_only=False)
        src = b["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = pc.dictionary_encode(src)
        codes = d.indices.to_numpy(zero_copy_only=False)
        lo = np.array([lims[u][0] for u in d.dictionary.to_pylist()])[codes]
        hi = np.array([lims[u][1] for u in d.dictionary.to_pylist()])[codes]
        mask = pa.array((n >= lo) & (n <= hi))
        return pa.table(
            {"doc_id": b["doc_id"], "source": b["source"]}
        ).filter(mask)

    return narrow.map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )


def embedding_semdedup_keep(
    sf_dir: str, threshold_permille: int = 950, n_centroids: int = 16,
) -> Dataset:
    """T34: SemDeDup (Abbas et al. 2023, public) — semantic deduplication
    of an embedding corpus: cluster the embedding space with a k-means
    coarse quantizer, then within each cluster drop every vector whose
    cosine similarity to a lower-id cluster member reaches the threshold
    (min-id representative; pairwise suppression, like the paper — not a
    transitive closure).  Cross-cluster near-dups are missed BY DESIGN:
    that is SemDeDup's trade — O(sum n_c^2) work instead of O(N^2), with
    recall set by the cluster count (documented like df_cap/bucket_cap).

    Ray shape: sample -> centroids is the tiny broadcast side (ray.put
    once), assignment is one matmul per batch, ONE hash shuffle on the
    cluster id co-locates each cluster, and the per-cluster kernel is
    functions/similarity.semdedup_suppress (blocked-tile exact, memory
    O(block^2) however large the cluster).  Output (vec_id, cluster_id)
    of survivors; rows-only check (k-means is seeded-deterministic but
    not SQL-expressible) + kernel-vs-brute-force and threshold-limit
    pytest."""
    from ..functions.similarity import (
        IvfAssigner, _batch_matrix, kmeans_centroids, semdedup_suppress,
    )
    from ..stages.shuffle import hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    sample = emb.limit(4096).take_batch(4096, batch_format="pyarrow")
    cents_ref = ray.put(
        kmeans_centroids(_batch_matrix(sample, "embedding"), n_centroids)
    )
    assigned = emb.map_batches(
        IvfAssigner(cents_ref), batch_format="pyarrow", batch_size=4096
    ).map_batches(
        lambda b: b.append_column(
            "cluster_id", pc.cast(b["ivf_cell"], pa.int64())
        ).drop_columns(["ivf_cell"]),
        batch_format="pyarrow",
    )

    def dedup_cluster(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                }
            )
        import numpy as np

        cl = t["cluster_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = pc.cast(t["vec_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        mat = _batch_matrix(t, "embedding")  # flatten+reshape, no pylist
        keep = np.zeros(len(ids), dtype=bool)
        order = np.argsort(cl, kind="stable")
        cls = cl[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = cls[1:] != cls[:-1]
        starts = np.flatnonzero(newg)
        bounds = np.append(starts, len(order))
        for s, e in zip(bounds[:-1], bounds[1:]):  # O(clusters/partition)
            rows = order[s:e]
            keep[rows] = semdedup_suppress(
                mat[rows], ids[rows], threshold_permille
            )
        kept = pa.array(np.flatnonzero(keep), pa.int64())
        return pa.table(
            {
                "vec_id": pc.cast(t["vec_id"], pa.int64())
                .combine_chunks().take(kept),
                "cluster_id": t["cluster_id"].combine_chunks().take(kept),
            }
        )

    return hash_partition_merge(assigned, "cluster_id", dedup_cluster)


def embedding_cluster_balance(
    sf_dir: str, target_per_cluster: int | None = None, n_centroids: int = 16,
) -> Dataset:
    """T35: cluster-balanced sampling — down-sample over-represented
    k-means clusters of the embedding space to at most
    ``target_per_cluster`` members (default: the median cluster size), the
    mixture-balancing step that follows semantic dedup in a curation
    pipeline (cluster mass ~ topic mass; balancing stops one topic from
    dominating the mix).

    Ray shape: reuse T34's centroids/assignment (broadcast once, one
    matmul per batch); cluster SIZES come from a bincount combiner (one
    tiny row per (cluster, batch) — never vectors) folded on the driver
    at O(n_centroids); keep decisions are T23's exact integer hash
    arithmetic with per-cluster keep-rates broadcast as an array, so the
    sample is deterministic and engine-independent.  Output
    (vec_id, cluster_id) of kept members; rows-only check (seeded
    k-means) + determinism/bound pytest."""
    from .corpus import K_MIX, P
    from ..functions.similarity import (
        IvfAssigner, _batch_matrix, kmeans_centroids,
    )

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    sample = emb.limit(4096).take_batch(4096, batch_format="pyarrow")
    cents = kmeans_centroids(_batch_matrix(sample, "embedding"), n_centroids)
    cents_ref = ray.put(cents)
    assigned = emb.map_batches(
        IvfAssigner(cents_ref), batch_format="pyarrow", batch_size=4096
    )

    def size_partial(b: pa.Table) -> pa.Table:
        cnt = np.bincount(
            b["ivf_cell"].combine_chunks().to_numpy(zero_copy_only=False),
            minlength=len(cents),
        )
        return pa.table(
            {
                "cluster_id": pa.array(
                    np.arange(len(cents), dtype=np.int64)
                ),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    sizes = np.zeros(len(cents), dtype=np.int64)
    for b in assigned.map_batches(
        size_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        sizes += b["n"].to_numpy(zero_copy_only=False)

    nonempty = sizes[sizes > 0]
    target = target_per_cluster or int(np.median(nonempty)) if len(nonempty) else 1
    target = max(1, int(target))
    # keep-rate per cluster in permille (exact ints, same domain as T23)
    rate = np.minimum(1000, (target * 1000) // np.maximum(sizes, 1))

    def keep(b: pa.Table) -> pa.Table:
        cell = b["ivf_cell"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = pc.cast(b["vec_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        u = ((ids % P) * K_MIX) % P % 1000
        mask = pa.array(u < rate[cell])
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(cell.astype(np.int64)),
            }
        ).filter(mask)

    return assigned.map_batches(keep, batch_format="pyarrow")


def tokenizer_fertility(sf_dir: str) -> Dataset:
    """T36: per-source tokenizer fertility — BPE-ish tokens per whitespace
    word, in exact permille (``sum_bpe * 1000 // sum_words``).  The
    tokenizer-efficiency statistic a mixture designer reads per source:
    high fertility flags sources (code, non-Latin scripts) that consume
    disproportionate context-window budget per word.

    Shape: two Arrow kernels per batch (the T11/T11b counters), a
    per-batch (source, sum) combiner, and a tiny per-source final merge —
    one shuffle of O(sources x batches) rows, text never moves.  Output
    (source, n_bpe, n_words, fertility_permille); exact SQL oracle."""

    def partial(b: pa.Table) -> pa.Table:
        bpe = pc.cast(
            pc.count_substring_regex(b["text"], BPE_ISH_PATTERN), pa.int64()
        )
        w = pc.cast(
            pc.list_value_length(pc.split_pattern(b["text"], " ")), pa.int64()
        )
        t = pa.table({"source": b["source"], "n_bpe": bpe, "n_words": w})
        return t.group_by("source", use_threads=False).aggregate(
            [("n_bpe", "sum"), ("n_words", "sum")]
        )

    def merge(g: pa.Table) -> pa.Table:
        nb = int(
            pc.sum(g["n_bpe_sum"]).as_py() or 0
        )
        nw = int(pc.sum(g["n_words_sum"]).as_py() or 0)
        return pa.table(
            {
                "source": g["source"][:1],
                "n_bpe": pa.array([nb], pa.int64()),
                "n_words": pa.array([nw], pa.int64()),
                "fertility_permille": pa.array(
                    [nb * 1000 // max(nw, 1)], pa.int64()
                ),
            }
        )

    return (
        _docs(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .map_groups(merge, batch_format="pyarrow")
    )


def _src_shingle_rows(
    batch: pa.Table, srcs: pa.Array
) -> tuple[np.ndarray, np.ndarray]:
    """Per-batch DISTINCT (source-rank, shingle-hash) int64 rows: one
    vectorized shingle pass (shingles_flat is distinct per ROW; two docs
    of one source in a batch may repeat a shingle, hence the dedupe).
    Shared by T37 source_overlap (exact) and T39 its MinHash sketch."""
    rows, sh = ts.shingles_flat(batch["text"])
    code = pc.cast(
        pc.index_in(batch["source"], value_set=srcs), pa.int64()
    ).combine_chunks().to_numpy(zero_copy_only=False)
    src = code[rows]
    h = sh.view(np.int64)
    order = np.lexsort((h, src))
    s2, h2 = src[order], h[order]
    keep = np.empty(len(order), dtype=bool)
    if len(order):
        keep[0] = True
        keep[1:] = (s2[1:] != s2[:-1]) | (h2[1:] != h2[:-1])
    return s2[keep], h2[keep]


def source_overlap(sf_dir: str) -> Dataset:
    """T37: cross-source n-gram overlap matrix — for every source pair,
    how many DISTINCT 3-word shingles the two sources share, plus exact
    Jaccard permille.  The corpus-composition diagnostic behind
    mixture/dedup decisions ("is src3 a subset of src7?") and the
    source-level view of T19's doc-level contamination check.
    Output (source_a, source_b, n_a, n_b, n_common, jaccard_permille),
    pairs ordered source_a < source_b (string order), zero-overlap pairs
    absent — exactly the SQL self-join's shape.

    Scale shape — text never shuffles, only (source-rank, shingle-hash)
    int64 rows do:
      1. one vectorized shingle pass per batch (textstats.shingles_flat)
         reduced to per-(source, shingle) DISTINCT rows before the
         exchange;
      2. hash-partition by SHINGLE: every occurrence of a shingle meets in
         one task, so its source set is decided locally; each shingle
         emits C(m, 2) pair rows and per-source distinct-count partials —
         ``source`` is a tiny-cardinality mixture-domain column (like the
         reference's per-worker metric labels, metrics.go:115-123), so the
         pair fan-out is bounded by C(n_sources, 2), NOT by corpus size;
      3. the partials (<= parts * n_sources^2 rows) fold in one final
         task.
    Engine compares 64-bit shingle hashes, the oracle shingle STRINGS
    (the T4/T19/T27 collision convention: a 2^-64 collision could merge
    two shingles, never two sources — source identity is the exact
    broadcast rank)."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    n_src = len(srcs)

    def explode(batch: pa.Table) -> pa.Table:
        s2, h2 = _src_shingle_rows(batch, srcs)
        return pa.table(
            {
                "shingle": pa.array(h2, pa.int64()),
                "src": pa.array(s2, pa.int64()),
            }
        )

    def fold_by_shingle(t: pa.Table) -> pa.Table:
        h = t["shingle"].combine_chunks().to_numpy(zero_copy_only=False)
        s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((s, h))
        hs, ss = h[order], s[order]
        keep = np.empty(len(order), dtype=bool)
        if len(order):
            keep[0] = True
            keep[1:] = (hs[1:] != hs[:-1]) | (ss[1:] != ss[:-1])
        hs, ss = hs[keep], ss[keep]
        # per-source distinct totals (each (source, shingle) lives in
        # exactly this partition, so the bincount partial is exact)
        tot = np.bincount(ss, minlength=n_src).astype(np.int64)
        out_a = [np.arange(n_src, dtype=np.int64)]
        out_b = [np.full(n_src, -1, dtype=np.int64)]
        out_n = [tot]
        # per-shingle source runs -> pair counts, vectorized per run size
        newg = np.empty(len(hs), dtype=bool)
        if len(hs):
            newg[0] = True
            newg[1:] = hs[1:] != hs[:-1]
            starts = np.flatnonzero(newg)
            sizes = np.diff(np.append(starts, len(hs)))
            pair_counts = np.zeros((n_src, n_src), dtype=np.int64)
            for m in np.unique(sizes):
                if m < 2:
                    continue
                mat = ss[
                    (starts[sizes == m][:, None] + np.arange(m)[None, :])
                ]  # (runs_of_size_m, m), each row ascending distinct srcs
                for i in range(int(m) - 1):
                    for j in range(i + 1, int(m)):
                        np.add.at(pair_counts, (mat[:, i], mat[:, j]), 1)
            pa_, pb_ = np.nonzero(pair_counts)
            out_a.append(pa_.astype(np.int64))
            out_b.append(pb_.astype(np.int64))
            out_n.append(pair_counts[pa_, pb_])
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a)),
                "b": pa.array(np.concatenate(out_b)),
                "n": pa.array(np.concatenate(out_n)),
            }
        )

    exploded = _docs(sf_dir, ["source", "text"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = hash_partition_merge(
        exploded, "shingle", fold_by_shingle, k=_doc_k(sf_dir)
    )

    def final(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        tot = np.zeros(n_src, dtype=np.int64)
        is_tot = b < 0
        np.add.at(tot, a[is_tot], n[is_tot])
        pair_counts = np.zeros((n_src, n_src), dtype=np.int64)
        np.add.at(pair_counts, (a[~is_tot], b[~is_tot]), n[~is_tot])
        pa_, pb_ = np.nonzero(pair_counts)
        c = pair_counts[pa_, pb_]
        na, nb = tot[pa_], tot[pb_]
        return pa.table(
            {
                "source_a": pc.take(srcs, pa.array(pa_, pa.int64())),
                "source_b": pc.take(srcs, pa.array(pb_, pa.int64())),
                "n_a": pa.array(na, pa.int64()),
                "n_b": pa.array(nb, pa.int64()),
                "n_common": pa.array(c, pa.int64()),
                "jaccard_permille": pa.array(
                    1000 * c // (na + nb - c), pa.int64()
                ),
            }
        )

    # the partials are <= parts * n_sources^2 tiny int64 rows; k=1 folds
    # them in one task (hash & 0 == single partition)
    return hash_partition_merge(partials, "a", final, k=1)


def commonness(sf_dir: str) -> Dataset:
    """T38: corpus-frequency commonness score — per document, the exact
    sum over word OCCURRENCES of that word's corpus-wide occurrence count
    (plus n_words).  High values = documents made of globally common
    words; the integer-exact core of frequency-based quality signals
    (a unigram-LM log-prob replaces ct with log p(w) in production — the
    dataflow is identical, the log is the only float).
    Output (doc_id, n_words, commonness_sum).

    Scale shape — two narrow int64 exchanges, text never shuffles:
      1. per batch: one vectorized word-hash pass (textstats.
         batch_word_hashes) reduced to (word, doc, tf) term-frequency
         rows via one lexsort;
      2. hash-partition by WORD: every tf row of a word meets in one
         task, so ct(word) = Σ tf is decided locally and folded into
         per-doc PARTIAL Σ tf·ct — the corpus-wide count table is never
         materialized or broadcast anywhere (contrast T19's broadcast,
         which is only valid because the eval set is benchmark-sized);
      3. hash-partition the (doc, n, s) partials by doc_id and sum.
    Engine compares 64-bit word hashes, the oracle word STRINGS (the
    T4/T19/T27 collision convention)."""
    from ..stages.shuffle import hash_partition_merge

    def explode(batch: pa.Table) -> pa.Table:
        uh, nw = ts.batch_word_hashes(batch["text"])
        h = uh.view(np.int64)
        doc = (
            batch["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        drep = np.repeat(doc, nw)
        order = np.lexsort((h, drep))
        d2, h2 = drep[order], h[order]
        newg = np.empty(len(order), dtype=bool)
        if len(order):
            newg[0] = True
            newg[1:] = (d2[1:] != d2[:-1]) | (h2[1:] != h2[:-1])
        starts = np.flatnonzero(newg)
        tf = np.diff(np.append(starts, len(order)))
        return pa.table(
            {
                "word": pa.array(h2[starts], pa.int64()),
                "doc_id": pa.array(d2[starts], pa.int64()),
                "tf": pa.array(tf.astype(np.int64)),
            }
        )

    def fold_by_word(t: pa.Table) -> pa.Table:
        h = t["word"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tf = t["tf"].combine_chunks().to_numpy(zero_copy_only=False)
        uw, winv = np.unique(h, return_inverse=True)
        # int64 np.add.at accumulators, NOT bincount(weights=...) — its
        # float64 accumulation loses exactness past 2^53 at corpus scale
        ct = np.zeros(len(uw), dtype=np.int64)
        np.add.at(ct, winv, tf)
        ud, dinv = np.unique(d, return_inverse=True)
        n_part = np.zeros(len(ud), dtype=np.int64)
        np.add.at(n_part, dinv, tf)
        s_part = np.zeros(len(ud), dtype=np.int64)
        np.add.at(s_part, dinv, tf * ct[winv])
        return pa.table(
            {
                "doc_id": pa.array(ud, pa.int64()),
                "n": pa.array(n_part),
                "s": pa.array(s_part),
            }
        )

    def fold_by_doc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_words": pa.array([], pa.int64()),
                    "commonness_sum": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("doc_id", use_threads=False).aggregate(
            [("n", "sum"), ("s", "sum")]
        )
        return g.rename_columns(["doc_id", "n_words", "commonness_sum"])

    kk = _doc_k(sf_dir)
    exploded = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = hash_partition_merge(exploded, "word", fold_by_word, k=kk)
    return hash_partition_merge(partials, "doc_id", fold_by_doc, k=kk)


def source_overlap_minhash(sf_dir: str, num_perm: int = 128) -> Dataset:
    """T39: the 100 TB sketch path of T37 — estimate every source pair's
    shingle Jaccard from per-source MinHash signatures instead of the
    exact intersection.  T37's exchange is bounded by the number of TRUE
    distinct (source, shingle) rows (the exact answer's floor, like
    E23's distinct triples); this variant caps the exchange at
    ``n_sources × num_perm`` int64 rows per batch REGARDLESS of corpus
    size (the E23→E24 exact→sketch pattern).  Signature min is
    associative, so per-batch partial signatures merge by elementwise
    min — order- and partitioning-independent by construction.
    Output (source_a, source_b, n_match, est_jaccard_permille), all
    C(n_sources, 2) pairs of sources that have at least one shingle
    (the estimator can also emit ~0 rows for disjoint pairs, unlike
    T37's absent rows — consumers threshold, as with any sketch).
    Rows-only (blake2b word hashes aren't SQL-expressible); pytest
    checks estimate-vs-exact tolerance, merge associativity across
    partitionings, and determinism."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    n_src = len(srcs)
    av, bv = ts.minhash_params(num_perm)
    mask64 = np.uint64(0xFFFFFFFFFFFFFFFF)

    def sketch(batch: pa.Table) -> pa.Table:
        src, h = _src_shingle_rows(batch, srcs)
        out_s, out_p, out_v = [], [], []
        for s in np.unique(src):
            sig = ts.minhash_signature(
                h[src == s].view(np.uint64), av, bv
            )
            out_s.append(np.full(num_perm, s, dtype=np.int64))
            out_p.append(np.arange(num_perm, dtype=np.int64))
            out_v.append(sig.view(np.int64))
        if not out_s:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "perm": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "src": pa.array(np.concatenate(out_s)),
                "perm": pa.array(np.concatenate(out_p)),
                "v": pa.array(np.concatenate(out_v)),
            }
        )

    def merge_min(t: pa.Table) -> pa.Table:
        # elementwise min per (src, perm) — uint64 order, not int64
        s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        p = t["perm"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["v"].combine_chunks().to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((v, p, s))
        ss, ps = s[order], p[order]
        first = np.empty(len(order), dtype=bool)
        if len(order):
            first[0] = True
            first[1:] = (ss[1:] != ss[:-1]) | (ps[1:] != ps[:-1])
        sel = order[first]
        return pa.table(
            {
                "src": pa.array(s[sel]),
                "perm": pa.array(p[sel]),
                "v": pa.array(v[order][first].view(np.int64)),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        sketch, batch_format="pyarrow", zero_copy_batch=True
    )
    sigs = hash_partition_merge(partials, "src", merge_min, k=_doc_k(sf_dir))

    def final(t: pa.Table) -> pa.Table:
        s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        p = t["perm"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["v"].combine_chunks().to_numpy(zero_copy_only=False).view(np.uint64)
        mat = np.full((n_src, num_perm), mask64, dtype=np.uint64)
        np.minimum.at(mat, (s, p), v)
        present = np.zeros(n_src, dtype=bool)
        present[np.unique(s)] = True
        pa_i, pb_i, nm = [], [], []
        for i in range(n_src - 1):
            if not present[i]:
                continue
            js = np.flatnonzero(present[i + 1:]) + i + 1
            if not len(js):
                continue
            m = (mat[js] == mat[i][None, :]).sum(axis=1)
            pa_i.append(np.full(len(js), i, dtype=np.int64))
            pb_i.append(js.astype(np.int64))
            nm.append(m.astype(np.int64))
        if not pa_i:
            return pa.table(
                {
                    "source_a": pa.array([], pa.string()),
                    "source_b": pa.array([], pa.string()),
                    "n_match": pa.array([], pa.int64()),
                    "est_jaccard_permille": pa.array([], pa.int64()),
                }
            )
        pa_c = np.concatenate(pa_i)
        pb_c = np.concatenate(pb_i)
        nm_c = np.concatenate(nm)
        return pa.table(
            {
                "source_a": pc.take(srcs, pa.array(pa_c, pa.int64())),
                "source_b": pc.take(srcs, pa.array(pb_c, pa.int64())),
                "n_match": pa.array(nm_c, pa.int64()),
                "est_jaccard_permille": pa.array(
                    1000 * nm_c // num_perm, pa.int64()
                ),
            }
        )

    # signatures are n_sources x num_perm tiny rows; fold in one task
    return hash_partition_merge(sigs, "src", final, k=1)


def lexical_diversity(sf_dir: str) -> Dataset:
    """T40: per-source lexical diversity — exact token occurrences
    (n_tokens), distinct word types (n_types), and hapax legomena count
    (words occurring exactly once in the source's whole corpus, n_hapax).
    Type/token and hapax ratios are the classic corpus-health signals
    (vocabulary growth, boilerplate collapse) and follow off-line from the
    integers; emitting the exact counts keeps the DuckDB oracle bit-exact.

    Scale shape (T38 commonness's): text never shuffles —
      1. per batch: one vectorized word-hash pass (textstats.
         batch_word_hashes) reduced to distinct (word, source, n) rows via
         one lexsort (n = occurrences of that word in this batch's slice
         of the source);
      2. hash-partition by WORD: every row of a word meets in one task, so
         the source-wide total per (source, word) is decided locally and
         immediately re-reduced to per-source (n_tokens, n_types, n_hapax)
         partials — the corpus vocabulary is never materialized anywhere;
      3. one k=1 merge sums partials (output = one row per source).
    Engine compares 64-bit word hashes, the oracle word STRINGS (the
    T4/T19/T27 collision convention).  Output (source, n_tokens, n_types,
    n_hapax)."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )

    def explode(batch: pa.Table) -> pa.Table:
        uh, nw = ts.batch_word_hashes(batch["text"])
        h = uh.view(np.int64)
        code = pc.cast(
            pc.index_in(batch["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        crep = np.repeat(code, nw)
        order = np.lexsort((h, crep))
        c2, h2 = crep[order], h[order]
        newg = np.empty(len(order), dtype=bool)
        if len(order):
            newg[0] = True
            newg[1:] = (c2[1:] != c2[:-1]) | (h2[1:] != h2[:-1])
        starts = np.flatnonzero(newg)
        n = np.diff(np.append(starts, len(order)))
        return pa.table(
            {
                "word": pa.array(h2[starts], pa.int64()),
                "src": pa.array(c2[starts], pa.int64()),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    def fold_by_word(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "n_types": pa.array([], pa.int64()),
                "n_hapax": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        g = t.group_by(["src", "word"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        c = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        uc, inv = np.unique(c, return_inverse=True)
        toks = np.zeros(len(uc), dtype=np.int64)
        np.add.at(toks, inv, n)
        typ = np.bincount(inv, minlength=len(uc)).astype(np.int64)
        # int64 np.add.at, not bincount(weights=) — float64 accumulation
        # (the T38 exactness rule)
        hap = np.zeros(len(uc), dtype=np.int64)
        np.add.at(hap, inv, (n == 1).astype(np.int64))
        return pa.table(
            {
                "src": pa.array(uc),
                "n_tokens": pa.array(toks),
                "n_types": pa.array(typ),
                "n_hapax": pa.array(hap),
            }
        )

    def fold_by_src(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_types": pa.array([], pa.int64()),
                    "n_hapax": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("src", use_threads=False).aggregate(
            [("n_tokens", "sum"), ("n_types", "sum"), ("n_hapax", "sum")]
        )
        return pa.table(
            {
                "source": pc.take(srcs, g["src"]),
                "n_tokens": g["n_tokens_sum"],
                "n_types": g["n_types_sum"],
                "n_hapax": g["n_hapax_sum"],
            }
        )

    kk = _doc_k(sf_dir)
    exploded = _docs(sf_dir, ["source", "text"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = hash_partition_merge(exploded, "word", fold_by_word, k=kk)
    return hash_partition_merge(partials, "src", fold_by_src, k=1)


def freq_spectrum(sf_dir: str) -> Dataset:
    """T41: corpus word-frequency spectrum — for each occurrence count c,
    how many distinct words occur exactly c times corpus-wide.  The
    frequency-of-frequencies vector behind Zipf-slope fits, Heaps-law
    vocabulary projections and Good-Turing smoothing, exact by
    construction (E36's aggregate-of-aggregates shape on the doc side;
    T40's hapax count is this spectrum at c = 1).

    Scale shape — text never shuffles, and both exchanges are narrower
    than their inputs:
      1. per batch: one vectorized word-hash pass reduced to distinct
         (word, n) rows via np.unique;
      2. hash-partition by WORD: corpus-wide totals are decided locally
         and immediately re-reduced to (word_count, n_words) spectrum
         partials — per-word rows never leave their partition;
      3. one k=1 merge sums partials (output cardinality ~ log-scale of
         corpus size).
    Engine counts 64-bit word hashes, the oracle word STRINGS (the
    T4/T19/T27 collision convention).  Output (word_count, n_words)."""
    from ..stages.shuffle import hash_partition_merge

    def explode(batch: pa.Table) -> pa.Table:
        uh, _ = ts.batch_word_hashes(batch["text"])
        h, n = np.unique(uh.view(np.int64), return_counts=True)
        return pa.table(
            {
                "word": pa.array(h, pa.int64()),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    def fold_by_word(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "word_count": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("word", use_threads=False).aggregate([("n", "sum")])
        totals = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        c, nw = np.unique(totals, return_counts=True)
        return pa.table(
            {
                "word_count": pa.array(c, pa.int64()),
                "n": pa.array(nw.astype(np.int64)),
            }
        )

    def fold_by_count(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "word_count": pa.array([], pa.int64()),
                    "n_words": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("word_count", use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["word_count", "n_words"])

    kk = _doc_k(sf_dir)
    exploded = _docs(sf_dir, ["text"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = hash_partition_merge(exploded, "word", fold_by_word, k=kk)
    return hash_partition_merge(partials, "word_count", fold_by_count, k=1)


def word_concentration(sf_dir: str) -> Dataset:
    """T42: per-doc word-concentration sufficient statistics — token count
    ``n_tokens``, distinct types ``n_types``, and
    ``sum_cc = sum_w c_w*(c_w-1)`` over the doc's word counts.  Simpson
    repetition concentration lambda = sum_cc / (n*(n-1)) follows off-line:
    the probability two random tokens of the doc are the same word, the
    smooth single-pass cousin of T18's fixed-n repetition ratios (high
    lambda = keyword-stuffed/boilerplate text); exact int64 keeps the
    DuckDB two-level GROUP BY oracle bit-exact.

    Scale shape — NO shuffle at all: a document is one row, so its whole
    word multiset is local to the batch; one vectorized word-hash pass
    (textstats.batch_word_hashes) + one lexsort + two group-reduces per
    batch, output exactly one row per input row.  Engine compares 64-bit
    word hashes, the oracle word STRINGS (the T4/T19/T27 collision
    convention).  Output (doc_id, n_tokens, n_types, sum_cc)."""

    def kernel(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_types": pa.array([], pa.int64()),
                    "sum_cc": pa.array([], pa.int64()),
                }
            )
        uh, nw = ts.batch_word_hashes(b["text"])
        h = uh.view(np.int64)
        did = np.repeat(np.arange(len(nw), dtype=np.int64), nw)
        order = np.lexsort((h, did))
        d2, h2 = did[order], h[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = (d2[1:] != d2[:-1]) | (h2[1:] != h2[:-1])
        starts = np.flatnonzero(newg)
        c = np.diff(np.append(starts, len(order))).astype(np.int64)
        run_doc = d2[starts]
        n_types = np.bincount(run_doc, minlength=len(nw)).astype(np.int64)
        scc = np.zeros(len(nw), dtype=np.int64)
        np.add.at(scc, run_doc, c * (c - 1))
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "n_tokens": pa.array(nw.astype(np.int64)),
                "n_types": pa.array(n_types),
                "sum_cc": pa.array(scc),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def length_hist(sf_dir: str) -> Dataset:
    """T43: per-source log2-binned document-length histogram (chars) —
    the full length DISTRIBUTION behind length_quantiles' three points
    (mixture diagnostics: truncation spikes, short-doc floods, heavy
    tails at a glance).  bin = bit_length(n_chars), bin 0 = empty docs —
    the E39 inter-arrival binning convention, bit-exact vs the DuckDB
    floor(log2)+1 oracle because bit_length is a pure frexp.

    Scale shape — a column-pruned (source, n_chars) read; each batch
    collapses to ≤64 (source, bin) partial rows (one Arrow group_by),
    and the ONLY shuffle moves those partials into a k=1 merge.  No
    text, no tokens, no per-doc rows ever move."""
    import numpy as np

    from ..stages.shuffle import hash_partition_merge

    def partial(batch: pa.Table) -> pa.Table:
        n = batch["n_chars"].combine_chunks().to_numpy(zero_copy_only=False)
        # bit_length via the frexp exponent — exact while n < 2^53 (the
        # float conversion is lossless there; n_chars is a doc length)
        bins = np.zeros(len(n), dtype=np.int64)
        nz = n > 0
        bins[nz] = np.frexp(n[nz].astype(np.float64))[1]
        t = pa.table({"source": batch["source"], "len_bin": pa.array(bins)})
        g = t.group_by(["source", "len_bin"], use_threads=False).aggregate(
            [("len_bin", "count")]
        )
        return g.rename_columns(["source", "len_bin", "n_docs"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "len_bin": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["source", "len_bin"], use_threads=False).aggregate(
            [("n_docs", "sum")]
        )
        return g.rename_columns(["source", "len_bin", "n_docs"])

    partials = _docs(sf_dir, ["source", "n_chars"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "len_bin", merge, k=1)


def lang_mix(sf_dir: str) -> Dataset:
    """T44: corpus language-mix composition — doc counts and total chars
    per (source, labeled lang), the per-source language balance sheet a
    mixture designer reads before setting sampling weights (complements
    T9's predicted-language heuristic with the table's own labels).
    Exact int64; trivial GROUP BY oracle.

    Scale shape — a column-pruned (source, lang, n_chars) read; each
    batch collapses to ≤(sources × langs) partial rows via one Arrow
    group_by, and the ONLY shuffle moves those partials into a per-lang
    merge (the length_quantiles string-keyed groupby shape)."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["source", "lang"], use_threads=False).aggregate(
            [("n_chars", "count"), ("n_chars", "sum")]
        )
        return g.rename_columns(["source", "lang", "n_docs", "sum_chars"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "lang": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "sum_chars": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["source", "lang"], use_threads=False).aggregate(
            [("n_docs", "sum"), ("sum_chars", "sum")]
        )
        return g.rename_columns(["source", "lang", "n_docs", "sum_chars"])

    return (
        _docs(sf_dir, ["source", "lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(merge, batch_format="pyarrow")
    )


def length_gini(sf_dir: str) -> Dataset:
    """T45: per-source Gini coefficient of document length (n_chars), in
    exact integer permille — the length-inequality number behind "is this
    source a few giant pages plus boilerplate stubs, or uniformly sized"
    mixture diagnostics.  With lengths sorted ascending and 1-based ranks,
    ``G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)``; both numerator and denominator
    are exact integers, so ``gini_permille = 1000·num // den`` matches a
    DuckDB row_number oracle bit-for-bit (rank permutations within tied
    values leave Σ i·xᵢ unchanged because the tied x are equal).

    Scale shape — length_quantiles' mergeable-histogram pattern: each
    batch collapses to a (source, n_chars) frequency histogram via one
    Arrow group_by, ONLY histograms shuffle into the k=1 merge, and the
    rank sum folds over histogram RUNS (a run of f copies of value v
    starting after c earlier docs contributes v·(f·c + f(f+1)/2)) — the
    merge is O(sources × distinct lengths), never O(docs).  The fold runs
    in object dtype (Python ints) because Σ i·xᵢ grows as n²·x and would
    overflow int64 near ~10⁹ docs/source; output permille is tiny."""
    from ..stages.shuffle import hash_partition_merge

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["source", "n_chars"], use_threads=False).aggregate(
            [("n_chars", "count")]
        )
        return g.rename_columns(["source", "len", "f"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "sum_len": pa.array([], pa.int64()),
                    "gini_permille": pa.array([], pa.int64()),
                }
            )
        # combine per-batch histograms, then fold runs per source
        g = (
            t.group_by(["source", "len"], use_threads=False)
            .aggregate([("f", "sum")])
            .rename_columns(["source", "len", "f"])
        )
        src = g["source"]
        codes = (
            pc.dictionary_encode(src)
            .combine_chunks()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        vv = g["len"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = g["f"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((vv, codes))
        c2, v2, f2 = codes[order], vv[order], ff[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = c2[1:] != c2[:-1]
        gs = np.flatnonzero(newg)
        gid = np.cumsum(newg) - 1
        # exact arithmetic: object dtype = arbitrary-precision Python ints
        fo = f2.astype(object)
        vo = v2.astype(object)
        # docs counted before each run, within its source
        cum = np.cumsum(f2)
        base = np.concatenate(([0], cum[gs[1:] - 1]))
        before = (cum - f2 - base[gid]).astype(object)
        contrib = vo * (fo * before + fo * (fo + 1) // 2)
        srx = np.add.reduceat(contrib, gs)
        n = np.add.reduceat(fo, gs)
        sx = np.add.reduceat(vo * fo, gs)
        num = 2 * srx - (n + 1) * sx
        gini = [
            int(1000 * a // b) if b else 0 for a, b in zip(num, n * sx)
        ]
        return pa.table(
            {
                "source": pc.take(src, pa.array(order[gs], pa.int64())),
                "n_docs": pa.array([int(x) for x in n], pa.int64()),
                "sum_len": pa.array([int(x) for x in sx], pa.int64()),
                "gini_permille": pa.array(gini, pa.int64()),
            }
        )

    partials = _docs(sf_dir, ["source", "n_chars"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "len", merge, k=1)


def dup_size_hist(
    sf_dir: str, threshold_permille: int = 200, clusters: Dataset | None = None
) -> Dataset:
    """T46: duplicate-family size distribution — for each cluster size s,
    how many near-dup clusters (T20 connected components over the exact
    Jaccard pair graph) have exactly s members.  The "how duplicated is
    this corpus" fingerprint a dedup pass is judged by: mass in large
    families means template/mirror content, an all-singletons histogram
    means the threshold is too tight.  Covers docs with ≥1 near-dup
    partner (T20's domain), so every family has size ≥ 2.  Exact int64;
    the DuckDB oracle is T20's recursive-CTE components + GROUP BY size.

    Scale shape — E36's aggregate-of-aggregates on the cluster axis; both
    exchanges NARROWER than their inputs:
      1. per batch, (doc_id, cluster_id) labels collapse to
         (cluster_id, n) partials via one Arrow group_by;
      2. hash-partition by CLUSTER: exact family sizes are decided
         locally and immediately re-reduce to (size, n_clusters)
         partials — per-cluster rows never leave their partition;
      3. one k=1 merge sums partials (output is O(max family size)).
    Accepts a precomputed ``clusters`` Dataset (the T20/T20b shared
    pair-graph convention) so corpus-wide callers pay for the component
    chain once."""
    from ..stages.shuffle import hash_partition_merge

    if clusters is None:
        clusters = dup_clusters(sf_dir, threshold_permille=threshold_permille)

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["cluster_id"], use_threads=False).aggregate(
            [("cluster_id", "count")]
        )
        return g.rename_columns(["cluster_id", "n"])

    def cluster_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "size": pa.array([], pa.int64()),
                    "n_clusters": pa.array([], pa.int64()),
                }
            )
        sizes = (
            t.group_by(["cluster_id"], use_threads=False)
            .aggregate([("n", "sum")])
            .column("n_sum")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        vals, freq = np.unique(sizes, return_counts=True)
        return pa.table(
            {
                "size": pa.array(vals.astype(np.int64)),
                "n_clusters": pa.array(freq.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "size": pa.array([], pa.int64()),
                    "n_clusters": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["size"], use_threads=False).aggregate(
            [("n_clusters", "sum")]
        )
        return g.rename_columns(["size", "n_clusters"])

    partials = clusters.map_batches(partial, batch_format="pyarrow")
    per_cluster = hash_partition_merge(partials, "cluster_id", cluster_fold)
    return hash_partition_merge(per_cluster, "size", merge, k=1)


def dup_by_source(sf_dir: str) -> Dataset:
    """T47: per-source duplication balance sheet — for every source: total
    docs, docs whose byte-identical text occurs MORE THAN ONCE corpus-wide
    (n_dup_docs), and docs whose text also occurs in ANOTHER source
    (n_cross_dup_docs) — the mirror / syndication / boilerplate-reuse
    exposure a mixture designer checks before trusting per-source sampling
    weights (T1's exact-dedup groups projected back onto the source axis
    that T44 tracks; cross-source mass means sources are not independent).
    One row per source ALWAYS (exact zeros when the corpus is dup-free),
    so the oracle is non-vacuous at every scale.  Engine groups by a
    64-bit content hash, the oracle by the text itself (T1/T4 collision
    convention).

    Scale shape — T1's exact-dedup exchange with a per-source fold: text
    never shuffles;
      1. per batch one polars content-hash pass + one Arrow group_by
         reduces docs to (hash, source, n) partials;
      2. hash-partition by CONTENT HASH: every row of a content group
         meets in one task, so the group's corpus count and source span
         are decided exactly and fold IN PLACE to per-source
         (n_docs, n_dup_docs, n_cross_dup_docs) partials — group rows
         never re-shuffle;
      3. one k=1 merge sums partials (output = one row per source)."""
    from ..stages.shuffle import hash_partition_merge

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        hs = (
            pl.from_arrow(batch.select(["text"]))["text"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        t = pa.table(
            {
                "text_hash": pa.array(hs, pa.int64()),
                "source": batch["source"],
            }
        )
        g = t.group_by(["text_hash", "source"], use_threads=False).aggregate(
            [("source", "count")]
        )
        return g.rename_columns(["text_hash", "source", "n"])

    def _empty() -> pa.Table:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "n_dup_docs": pa.array([], pa.int64()),
                "n_cross_dup_docs": pa.array([], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty()
        # collapse per-batch partials to exact (hash, source, n), then
        # attach each content group's corpus count / source span
        g = t.group_by(["text_hash", "source"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        h = g["text_hash"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h2, n2 = h[order], n[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = h2[1:] != h2[:-1]
        gs = np.flatnonzero(newg)
        gid = np.cumsum(newg) - 1
        gtot = np.add.reduceat(n2, gs)  # corpus count per content group
        gspan = np.diff(np.append(gs, len(h2)))  # distinct sources per group
        dup = np.where(gtot[gid] > 1, n2, 0)
        cross = np.where(gspan[gid] >= 2, n2, 0)
        out = pa.table(
            {
                "source": g["source"].take(pa.array(order, pa.int64())),
                "nd": pa.array(n2.astype(np.int64)),
                "dd": pa.array(dup.astype(np.int64)),
                "cd": pa.array(cross.astype(np.int64)),
            }
        )
        f = out.group_by("source", use_threads=False).aggregate(
            [("nd", "sum"), ("dd", "sum"), ("cd", "sum")]
        )
        return f.rename_columns(
            ["source", "n_docs", "n_dup_docs", "n_cross_dup_docs"]
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty()
        g = t.group_by("source", use_threads=False).aggregate(
            [("n_docs", "sum"), ("n_dup_docs", "sum"), ("n_cross_dup_docs", "sum")]
        )
        return g.rename_columns(
            ["source", "n_docs", "n_dup_docs", "n_cross_dup_docs"]
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    per_hash = hash_partition_merge(partials, "text_hash", fold, k=_doc_k(sf_dir))
    # per-hash fold leaves O(partitions × sources) partial rows; the final
    # per-source sum rides a tiny sort-based groupby (the T44 lang_mix
    # convention for string keys)
    return per_hash.groupby("source").map_groups(merge, batch_format="pyarrow")


def vocab_coverage(
    sf_dir: str, ks: tuple[int, ...] = (100, 1000, 10000)
) -> Dataset:
    """T48: vocabulary coverage at top-k — for each k, the exact token
    mass covered by the k most frequent words, corpus-wide, plus the
    coverage permille — the "how big a vocab do we actually need" curve
    behind tokenizer sizing and stopword budgets (T16 lists the heavy
    hitters; T48 integrates their mass; T41's spectrum is the same
    distribution on the other axis).  Tie-safe by construction: the SUM of
    the k largest counts is unique even when boundary words tie, so the
    engine (word hashes) and the oracle (word strings, row_number over
    count DESC) agree bit-for-bit without a word-level tiebreak.

    Scale shape — T40's word-hash partition with a bounded-tail merge:
      1. per batch one vectorized word-hash pass reduces text to distinct
         (word, n) rows (text never shuffles);
      2. hash-partition by WORD decides each word's exact corpus count
         locally; each partition keeps only its max(ks) LARGEST counts
         plus one residual row (count sum of everything below the cut) —
         the vocabulary is never materialized;
      3. one k=1 merge sorts the <= parts × max(ks) survivors, cumsums,
         and reads off every k (coverage = sum of k largest counts)."""
    from ..stages.shuffle import hash_partition_merge

    kmax = max(ks)

    def explode(batch: pa.Table) -> pa.Table:
        uh, _ = ts.batch_word_hashes(batch["text"])
        h = uh.view(np.int64)
        vals, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {
                "word": pa.array(vals, pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold_by_word(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "g": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "rest": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        g = t.group_by("word", use_threads=False).aggregate([("n", "sum")])
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(n) > kmax:
            top = np.partition(n, len(n) - kmax)[len(n) - kmax :]
            rest = int(n.sum() - top.sum())
        else:
            top, rest = n, 0
        top = np.sort(top)[::-1].astype(np.int64)
        r = np.zeros(len(top), np.int64)
        r[0] = rest
        return pa.table(
            {
                "g": pa.array(np.zeros(len(top), np.int64)),
                "cnt": pa.array(top),
                "rest": pa.array(r),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "top_k": pa.array([], pa.int64()),
                    "covered_tokens": pa.array([], pa.int64()),
                    "total_tokens": pa.array([], pa.int64()),
                    "permille": pa.array([], pa.int64()),
                }
            )
        cnt = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        total = int(cnt.sum()) + int(
            t["rest"].combine_chunks().to_numpy(zero_copy_only=False).sum()
        )
        # partition-local top-kmax survivors are a superset of any global
        # top-k for k <= kmax (a global top-k word is top-k in its own
        # partition), so sorting the survivors suffices
        srt = np.sort(cnt)[::-1]
        cum = np.cumsum(srt)
        out_k, out_cov = [], []
        for k in ks:
            kk = min(k, len(srt))
            out_k.append(k)
            out_cov.append(int(cum[kk - 1]) if kk else 0)
        cov = np.array(out_cov, np.int64)
        return pa.table(
            {
                "top_k": pa.array(np.array(out_k, np.int64)),
                "covered_tokens": pa.array(cov),
                "total_tokens": pa.array(np.full(len(ks), total, np.int64)),
                "permille": pa.array(
                    (1000 * cov) // max(total, 1), pa.int64()
                ),
            }
        )

    partials = _docs(sf_dir, ["text"]).map_batches(explode, batch_format="pyarrow")
    per_word = hash_partition_merge(
        partials, "word", fold_by_word, k=_doc_k(sf_dir)
    )
    return hash_partition_merge(per_word, "g", merge, k=1)


def charclass_stats(sf_dir: str) -> Dataset:
    """T49: per-source character-class composition — exact totals of
    chars, ASCII digits, spaces, ASCII letters, and non-ASCII bytes'
    codepoints per source — the cheap "is this prose, tables, or binary
    spill" fingerprint read next to T10's quality score (a source whose
    digit share spikes is logs/markup, not prose; non-ASCII share
    cross-checks T9/T44's language labels).  Exact int64; DuckDB oracle =
    length(regexp_replace(...)) sums.

    Scale shape: ZERO wide exchange for the heavy part — each batch runs
    four compiled RE2 count kernels (pyarrow count_substring_regex) and
    reduces to one partial row per source; only O(batches × sources)
    partial rows shuffle into the per-source merge (the T44 convention)."""
    def partial(batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        t = pa.table(
            {
                "source": batch["source"],
                "chars": pc.cast(pc.utf8_length(txt), pa.int64()),
                "digits": pc.cast(
                    pc.count_substring_regex(txt, "[0-9]"), pa.int64()
                ),
                "spaces": pc.cast(
                    pc.count_substring_regex(txt, " "), pa.int64()
                ),
                "letters": pc.cast(
                    pc.count_substring_regex(txt, "[A-Za-z]"), pa.int64()
                ),
                "non_ascii": pc.cast(
                    pc.count_substring_regex(txt, "[^\\x00-\\x7F]"), pa.int64()
                ),
            }
        )
        g = t.group_by("source", use_threads=False).aggregate(
            [
                ("chars", "sum"),
                ("digits", "sum"),
                ("spaces", "sum"),
                ("letters", "sum"),
                ("non_ascii", "sum"),
            ]
        )
        return g.rename_columns(
            ["source", "n_chars", "n_digits", "n_spaces", "n_letters", "n_non_ascii"]
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_chars": pa.array([], pa.int64()),
                    "n_digits": pa.array([], pa.int64()),
                    "n_spaces": pa.array([], pa.int64()),
                    "n_letters": pa.array([], pa.int64()),
                    "n_non_ascii": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("source", use_threads=False).aggregate(
            [
                ("n_chars", "sum"),
                ("n_digits", "sum"),
                ("n_spaces", "sum"),
                ("n_letters", "sum"),
                ("n_non_ascii", "sum"),
            ]
        )
        return g.rename_columns(
            ["source", "n_chars", "n_digits", "n_spaces", "n_letters", "n_non_ascii"]
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return partials.groupby("source").map_groups(merge, batch_format="pyarrow")


def token_length_hist(sf_dir: str) -> Dataset:
    """T50: token-length histogram — for every word length L (in chars):
    total occurrences and DISTINCT words of that length, corpus-wide —
    the length profile behind BPE fertility (long words fragment; T36
    measures the fragmentation, T50 the cause) and tokenizer vocab
    budgeting next to T48's coverage curve.  Exact int64; DuckDB oracle
    = unnest + length(word) two-level GROUP BY.

    Scale shape — T40's word-hash partition with length riding along:
      1. per batch one vectorized word pass reduces text to distinct
         (word_hash, len, n) rows (a hash keeps ONE length, so the pair
         collapses to the hash key; text never shuffles);
      2. hash-partition by WORD decides each word's exact corpus count
         locally and re-reduces in place to (len, occ, distinct)
         partials — the vocabulary is never materialized;
      3. one k=1 merge sums O(max word length) rows.
    Engine counts word hashes, the oracle word strings (T4/T19/T27
    collision convention)."""
    from ..stages.shuffle import hash_partition_merge

    def explode(batch: pa.Table) -> pa.Table:
        txt = batch["text"].combine_chunks()
        words = pc.split_pattern(txt, " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        d = flat.dictionary_encode()
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = d.dictionary
        lens = pc.utf8_length(uniq).to_numpy(zero_copy_only=False).astype(np.int64)
        uh = np.fromiter(
            (ts.word_hash64(w) for w in uniq.to_pylist()),
            dtype=np.uint64,
            count=len(uniq),
        ).view(np.int64)
        cnt = np.bincount(idx, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "word": pa.array(uh, pa.int64()),
                "len": pa.array(lens),
                "n": pa.array(cnt),
            }
        )

    def fold_by_word(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "len": pa.array([], pa.int64()),
                    "occ": pa.array([], pa.int64()),
                    "dis": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["word", "len"], use_threads=False).aggregate([("n", "sum")])
        h = g.group_by("len", use_threads=False).aggregate(
            [("n_sum", "sum"), ("len", "count")]
        )
        return h.rename_columns(["len", "occ", "dis"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "word_len": pa.array([], pa.int64()),
                    "n_occurrences": pa.array([], pa.int64()),
                    "n_words": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("len", use_threads=False).aggregate(
            [("occ", "sum"), ("dis", "sum")]
        )
        return g.rename_columns(["word_len", "n_occurrences", "n_words"])

    partials = _docs(sf_dir, ["text"]).map_batches(explode, batch_format="pyarrow")
    per_word = hash_partition_merge(partials, "word", fold_by_word, k=_doc_k(sf_dir))
    return hash_partition_merge(per_word, "len", merge, k=1)


PATTERN_SCAN = (
    ("n_emails", "[A-Za-z0-9._]+@[A-Za-z0-9.]+"),
    ("n_urls", "https?://[A-Za-z0-9./_-]+"),
    ("n_long_numbers", "[0-9]{6,}"),
)


def pattern_scan(sf_dir: str) -> Dataset:
    """T51: PII / pattern scan — per source: exact counts of email-like
    tokens, URLs, and 6+-digit runs (phone/account/id-shaped strings) —
    the scrub-audit pass run before and after T28's blocklist scrub to
    size the redaction problem per source.  Both sides count
    NON-OVERLAPPING leftmost RE2 matches of the identical patterns
    (pyarrow count_substring_regex vs DuckDB regexp_extract_all), so the
    totals are exact int64 by construction.

    Scale shape — T49's zero-wide-exchange profile: three compiled RE2
    count kernels per batch reduce to one partial row per source; only
    O(batches × sources) partials ride the tiny per-source merge."""
    names = [n for n, _ in PATTERN_SCAN]

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        cols = {"source": batch["source"]}
        for name, pat in PATTERN_SCAN:
            cols[name] = pc.cast(pc.count_substring_regex(txt, pat), pa.int64())
        t = pa.table(cols)
        g = t.group_by("source", use_threads=False).aggregate(
            [(n, "sum") for n in names]
        )
        return g.rename_columns(["source", *names])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{n: pa.array([], pa.int64()) for n in names},
                }
            )
        g = t.group_by("source", use_threads=False).aggregate(
            [(n, "sum") for n in names]
        )
        return g.rename_columns(["source", *names])

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return partials.groupby("source").map_groups(merge, batch_format="pyarrow")


def token_quantiles(
    sf_dir: str, qs: tuple[int, ...] = (500, 900, 990)
) -> Dataset:
    """T52: tokens-per-doc quantiles — per source: n_docs + discrete
    p50/p90/p99 and max of the whitespace token count (T11's convention:
    split(' '), every doc >= 1 token) — T21's length-quantile board moved
    from the char axis to the token axis sequence-budget planners
    actually allocate in.  Exact int64 under the repo's quantile_disc
    rank rule (len(str_split) + quantile_disc oracle).

    Scale shape — T21's mergeable-histogram pattern: token counts are
    batch-local (one Arrow split-length kernel), so each batch reduces to
    (source, n_tokens, f) frequency partials via one group_by; ONLY
    histograms shuffle into the per-source merge, where every quantile
    reads off one cumulative sum — O(sources × distinct counts), never
    O(docs)."""
    names = tuple(f"p{q // 10}_tokens" for q in qs)

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch["text"].combine_chunks()
        words = pc.split_pattern(txt, " ")
        n = pc.cast(pc.list_value_length(words), pa.int64())
        t = pa.table({"source": batch["source"], "n_tokens": n})
        g = t.group_by(["source", "n_tokens"], use_threads=False).aggregate(
            [("n_tokens", "count")]
        )
        return g.rename_columns(["source", "n_tokens", "f"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in names},
                    "max_tokens": pa.array([], pa.int64()),
                }
            )
        g = (
            t.group_by(["source", "n_tokens"], use_threads=False)
            .aggregate([("f", "sum")])
            .rename_columns(["source", "n_tokens", "f"])
        )
        src = g["source"]
        codes = (
            pc.dictionary_encode(src)
            .combine_chunks()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        vv = g["n_tokens"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = g["f"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((vv, codes))
        c2, v2, f2 = codes[order], vv[order], ff[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = c2[1:] != c2[:-1]
        gs = np.flatnonzero(newg)
        cum = np.cumsum(f2)
        base = np.concatenate(([0], cum[gs[1:] - 1]))
        gid = np.cumsum(newg) - 1
        within = cum - base[gid]
        ndocs = np.add.reduceat(f2, gs)
        out = {
            "source": src.take(pa.array(order[gs], pa.int64())),
            "n_docs": pa.array(ndocs.astype(np.int64)),
        }
        ends = np.append(gs[1:], len(v2))
        for q, c in zip(qs, names):
            vals = np.empty(len(gs), np.int64)
            for gi, (s0, e0) in enumerate(zip(gs, ends)):
                thr = (int(ndocs[gi]) * q + 999) // 1000
                vals[gi] = v2[s0 + np.searchsorted(within[s0:e0], thr)]
            out[c] = pa.array(vals)
        out["max_tokens"] = pa.array(v2[ends - 1].astype(np.int64))
        return pa.table(out)

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return partials.groupby("source").map_groups(merge, batch_format="pyarrow")


def token_pareto(
    sf_dir: str, targets: tuple[int, ...] = (500, 800, 900, 990)
) -> Dataset:
    """T53: token-mass Pareto curve — for each target p (permille of ALL
    corpus tokens): the MINIMAL number of documents whose token counts
    cover at least that share — "how few giant documents carry the token
    budget", the concentration twin of T45's length Gini (one number per
    target instead of a coefficient; E61 is the same question on the
    event-user axis).  Unique under count ties and exact int64
    (row_number-over-count-DESC + running-sum oracle; T11's split(' ')
    token convention).

    Scale shape: token counts are batch-local (one Arrow split-length
    kernel), so each batch reduces straight to (n_tokens, f) histogram
    partials — no per-doc exchange at all — and the one k=1 merge reads
    every target off two cumulative sums."""
    from ..pipelines.events import _pareto_from_hist
    from ..stages.shuffle import hash_partition_merge

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch["text"].combine_chunks()
        n = np.asarray(
            pc.cast(pc.list_value_length(pc.split_pattern(txt, " ")), pa.int64())
        )
        vals, freq = np.unique(n, return_counts=True)
        return pa.table(
            {
                "g": pa.array(np.zeros(len(vals), np.int64)),
                "cnt": pa.array(vals, pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    names = tuple(f"docs_p{p // 10}" for p in targets)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "total_docs": pa.array([], pa.int64()),
                    "total_tokens": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in names},
                }
            )
        g = t.group_by("cnt", use_threads=False).aggregate([("f", "sum")])
        vals = g["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        freq = g["f_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        counts, n_docs, total = _pareto_from_hist(vals, freq, targets)
        out = {
            "total_docs": pa.array([n_docs], pa.int64()),
            "total_tokens": pa.array([total], pa.int64()),
        }
        for c, v in zip(names, counts):
            out[c] = pa.array([int(v)], pa.int64())
        return pa.table(out)

    partials = _docs(sf_dir, ["text"]).map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "g", merge, k=1)


def quality_funnel(
    sf_dir: str,
    *,
    eval_max_doc_id: int = 10,
    min_words: int = 20,
    max_words: int = 90,
    max_dup_permille: int = 600,
    max_top_permille: int = 130,
    min_stop_permille: int = 20,
) -> Dataset:
    """T54: quality-filter funnel — per source: total docs and the
    CUMULATIVE survivor count after each stage of T29's fused keep
    decision (language -> word band -> Gopher repetition caps -> stopword
    floor -> decontamination) — the "where do documents die" board a
    pipeline owner reads before changing any threshold (T29 gives the
    final survivors; T54 attributes the losses).  n_pass_all equals
    T29's per-source keep count by construction.  Exact int64.

    Scale shape: T29's shape exactly — ONE streaming text pass through
    the shared ``_quality_features`` kernel, each batch reducing to one
    partial row per source (7 int64 columns); only partials ride the
    tiny per-source merge.  The eval shingle set is the same ray.put
    broadcast T19/T29 use."""
    import ray

    eval_ref = _eval_shingle_ref(sf_dir, eval_max_doc_id)
    cols = [
        "n_docs",
        "n_pass_lang",
        "n_pass_band",
        "n_pass_rep",
        "n_pass_stop",
        "n_pass_all",
    ]

    def fn(batch: pa.Table) -> pa.Table:
        n_words, dup, topf, stopf, lang_en, hits = _quality_features(
            batch, ray.get(eval_ref)
        )
        f1 = lang_en
        f2 = f1 & (n_words >= min_words) & (n_words <= max_words)
        f3 = f2 & (dup <= max_dup_permille) & (topf <= max_top_permille)
        f4 = f3 & (stopf >= min_stop_permille)
        f5 = f4 & (hits == 0)
        t = pa.table(
            {
                "source": batch["source"],
                "n_docs": pa.array(np.ones(batch.num_rows, np.int64)),
                "n_pass_lang": pa.array(f1.astype(np.int64)),
                "n_pass_band": pa.array(f2.astype(np.int64)),
                "n_pass_rep": pa.array(f3.astype(np.int64)),
                "n_pass_stop": pa.array(f4.astype(np.int64)),
                "n_pass_all": pa.array(f5.astype(np.int64)),
            }
        )
        g = t.group_by("source", use_threads=False).aggregate(
            [(c, "sum") for c in cols]
        )
        return g.rename_columns(["source", *cols])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in cols},
                }
            )
        g = t.group_by("source", use_threads=False).aggregate(
            [(c, "sum") for c in cols]
        )
        return g.rename_columns(["source", *cols])

    partials = _docs(sf_dir, ["doc_id", "source", "lang", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )
    return partials.groupby("source").map_groups(merge, batch_format="pyarrow")


def curriculum_rank(sf_dir: str) -> Dataset:
    """T55: curriculum ordering rank — every document tagged with its
    0-based global rank under (n_chars DESC, doc_id ASC): the
    longest-first curriculum/packing order, materialized as a rank column
    WITHOUT a global sort (T25's shuffle_rank is the hash-order variant;
    T55 is the value-ordered one).  Exact int64 (row_number oracle).

    Scale shape — count-based ranking, the distributed ORDER BY answer:
      1. one mergeable (n_chars, f) histogram pass (O(distinct lengths)
         rows) collapses at the driver into per-length GLOBAL OFFSETS
         (#docs with strictly longer text), shipped via ray.put;
      2. hash-partition by N_CHARS: every doc of a length meets in one
         task, so the within-length doc_id order is one local lexsort and
         rank = offset[len] + within-group index — no doc row ever moves
         twice, no global sort anywhere."""
    import ray

    from ..stages.shuffle import hash_partition_merge

    narrow = _docs(sf_dir, ["doc_id", "n_chars"])

    def hist_partial(b: pa.Table) -> pa.Table:
        g = b.select(["n_chars"]).group_by("n_chars", use_threads=False).aggregate(
            [("n_chars", "count")]
        )
        return g.rename_columns(["len", "f"])

    def hist_merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"len": pa.array([], pa.int64()), "f": pa.array([], pa.int64())}
            )
        g = t.group_by("len", use_threads=False).aggregate([("f", "sum")])
        return g.rename_columns(["len", "f"])

    hist = pa.concat_tables(
        list(
            hash_partition_merge(
                narrow.map_batches(hist_partial, batch_format="pyarrow"),
                "len",
                hist_merge,
                k=1,
            ).iter_batches(batch_format="pyarrow")
        )
    )
    lens = hist["len"].combine_chunks().to_numpy(zero_copy_only=False)
    freq = hist["f"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(lens, kind="stable")[::-1]  # longest first
    lens_d, freq_d = lens[order], freq[order]
    offsets = np.concatenate(([0], np.cumsum(freq_d)[:-1]))
    # lookup keyed by ascending length for searchsorted
    asc = np.argsort(lens_d, kind="stable")
    lut_ref = ray.put((lens_d[asc], offsets[asc]))

    def rank_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        keys, offs = ray.get(lut_ref)
        d = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        L = t["n_chars"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((d, -L))
        d2, L2 = d[order], L[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = L2[1:] != L2[:-1]
        gs = np.flatnonzero(newg)
        within = np.arange(len(order)) - np.repeat(
            gs, np.diff(np.append(gs, len(order)))
        )
        base = offs[np.searchsorted(keys, L2)]
        return pa.table(
            {
                "doc_id": pa.array(d2, pa.int64()),
                "n_chars": pa.array(L2, pa.int64()),
                "rank": pa.array(base + within, pa.int64()),
            }
        )

    return hash_partition_merge(narrow, "n_chars", rank_fold, k=_doc_k(sf_dir))


def near_dup_rate_by_source(
    sf_dir: str, threshold_permille: int = 200, clusters: Dataset | None = None
) -> Dataset:
    """T56: near-duplication rate by source — per source: total docs and
    docs with at least one NEAR-dup partner (a T20 pair-graph node) —
    T47's balance sheet moved from byte-identical to Jaccard-near
    duplication, the number that decides whether a source needs the full
    dedup pass before its sampling weight is trusted.  Exact int64 (the
    T20 pair CTE's node set LEFT JOINed back to documents).

    Scale shape — near_dedup_keep's co-partitioned membership join, semi
    instead of anti: cluster labels (already bounded by T20's machinery;
    accepts the precomputed ``clusters`` Dataset so corpus-wide callers
    pay for the chain once) and the narrow (doc_id, source) corpus union
    under one role-tagged schema, hash-partition by DOC_ID, and each
    partition reduces straight to per-source (n_docs, n_in_family)
    partials — membership never broadcasts."""
    from ..stages.shuffle import hash_partition_merge

    if clusters is None:
        clusters = dup_clusters(sf_dir, threshold_permille=threshold_permille)

    def members(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "source": pa.nulls(b.num_rows, pa.string()),
                "is_member": pa.array(np.ones(b.num_rows, dtype=bool)),
            }
        )

    def corpus(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "source": b["source"],
                "is_member": pa.array(np.zeros(b.num_rows, dtype=bool)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_in_family": pa.array([], pa.int64()),
                }
            )
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ism = t["is_member"].combine_chunks().to_numpy(zero_copy_only=False)
        fam = np.unique(ids[ism])
        rows = ~ism
        pos = np.searchsorted(fam, ids[rows])
        pos = np.clip(pos, 0, max(len(fam) - 1, 0))
        hit = (fam[pos] == ids[rows]) if len(fam) else np.zeros(
            int(rows.sum()), dtype=bool
        )
        out = pa.table(
            {
                "source": t.filter(pa.array(rows))["source"],
                "nd": pa.array(np.ones(int(rows.sum()), np.int64)),
                "nf": pa.array(hit.astype(np.int64)),
            }
        )
        g = out.group_by("source", use_threads=False).aggregate(
            [("nd", "sum"), ("nf", "sum")]
        )
        return g.rename_columns(["source", "n_docs", "n_in_family"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_in_family": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("source", use_threads=False).aggregate(
            [("n_docs", "sum"), ("n_in_family", "sum")]
        )
        return g.rename_columns(["source", "n_docs", "n_in_family"])

    both = clusters.map_batches(members, batch_format="pyarrow").union(
        _docs(sf_dir, ["doc_id", "source"]).map_batches(
            corpus, batch_format="pyarrow"
        )
    )
    partials = hash_partition_merge(both, "doc_id", fold, k=_doc_k(sf_dir))
    return partials.groupby("source").map_groups(merge, batch_format="pyarrow")


def contamination_by_source(sf_dir: str, eval_max_doc_id: int = 10) -> Dataset:
    """T57: contamination exposure by source — per source: total docs,
    docs sharing ≥1 three-word shingle with the eval set, and the total
    shingle-hit count — T19's per-doc verdicts rolled into the board a
    pipeline owner actually reads ("which source leaks the benchmark").
    Exact int64; engine compares 64-bit shingle hashes, the oracle
    shingle STRINGS (T4/T19 convention).

    Scale shape: T19's broadcast probe verbatim (eval shingles ray.put
    once, one searchsorted per task) with the per-doc output replaced by
    one partial row per source per batch — ZERO wide exchange."""
    import ray

    eval_ref = _eval_shingle_ref(sf_dir, eval_max_doc_id)

    def fn(batch: pa.Table) -> pa.Table:
        hits = _shingle_hits(batch["text"], ray.get(eval_ref), batch.num_rows)
        t = pa.table(
            {
                "source": batch["source"],
                "nd": pa.array(np.ones(batch.num_rows, np.int64)),
                "nc": pa.array((hits > 0).astype(np.int64)),
                "nh": pa.array(hits.astype(np.int64)),
            }
        )
        g = t.group_by("source", use_threads=False).aggregate(
            [("nd", "sum"), ("nc", "sum"), ("nh", "sum")]
        )
        return g.rename_columns(
            ["source", "n_docs", "n_contaminated", "n_hits"]
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_contaminated": pa.array([], pa.int64()),
                    "n_hits": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("source", use_threads=False).aggregate(
            [("n_docs", "sum"), ("n_contaminated", "sum"), ("n_hits", "sum")]
        )
        return g.rename_columns(
            ["source", "n_docs", "n_contaminated", "n_hits"]
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )
    return partials.groupby("source").map_groups(merge, batch_format="pyarrow")


def scrub_impact(sf_dir: str) -> Dataset:
    """T58: blocklist scrub impact — per source: total docs, docs with at
    least one blocklist hit, and total redactions — the sizing board run
    before T28's scrub rewrites anything (identical RE2 word-boundary
    pattern on both sides, so the totals are exact by construction).

    Scale shape: one compiled RE2 count kernel per batch reducing to one
    partial row per source — T49's zero-wide-exchange profile."""

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(batch["text"], SCRUB_PATTERN), pa.int64()
        )
        narr = n.combine_chunks().to_numpy(zero_copy_only=False) if isinstance(
            n, pa.ChunkedArray
        ) else np.asarray(n)
        t = pa.table(
            {
                "source": batch["source"],
                "nd": pa.array(np.ones(batch.num_rows, np.int64)),
                "nh": pa.array((narr > 0).astype(np.int64)),
                "nr": pa.array(narr.astype(np.int64)),
            }
        )
        g = t.group_by("source", use_threads=False).aggregate(
            [("nd", "sum"), ("nh", "sum"), ("nr", "sum")]
        )
        return g.rename_columns(["source", "n_docs", "n_docs_hit", "n_redactions"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_docs_hit": pa.array([], pa.int64()),
                    "n_redactions": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("source", use_threads=False).aggregate(
            [("n_docs", "sum"), ("n_docs_hit", "sum"), ("n_redactions", "sum")]
        )
        return g.rename_columns(["source", "n_docs", "n_docs_hit", "n_redactions"])

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )
    return partials.groupby("source").map_groups(merge, batch_format="pyarrow")


def multimodal_size_hist(sf_dir: str) -> Dataset:
    """T59/M4: payload-size histogram — per (kind, log2 byte-size bin):
    payload count and total bytes — the capacity sheet a multimodal
    ingest is sized by (batch-size and block-size tuning read straight
    off it; bin = bit_length(payload_bytes), the T43 convention).  Runs
    on the REAL payload plumbing (the actor-pool metadata stage over
    opaque binary), so the histogram exercises the same path a production
    image/audio corpus would; exact int64 (octet_length + floor(log2)
    oracle).

    Scale shape: metadata rows are already narrow; each batch reduces to
    ≤(kinds × 64) partial rows via one Arrow group_by, and only partials
    ride the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    meta = multimodal_meta(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        nb = (
            pc.cast(b["payload_bytes"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        f, e = np.frexp(nb.astype(np.float64))
        bins = np.where(nb > 0, e, 0).astype(np.int64)
        t = pa.table(
            {
                "kind": b["kind"],
                "bin": pa.array(bins),
                "n": pa.array(np.ones(len(bins), np.int64)),
                "b": pa.array(nb),
            }
        )
        g = t.group_by(["kind", "bin"], use_threads=False).aggregate(
            [("n", "sum"), ("b", "sum")]
        )
        return g.rename_columns(["kind", "bin", "n_payloads", "total_bytes"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "kind": pa.array([], pa.string()),
                    "size_bin": pa.array([], pa.int64()),
                    "n_payloads": pa.array([], pa.int64()),
                    "total_bytes": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["kind", "bin"], use_threads=False).aggregate(
            [("n_payloads", "sum"), ("total_bytes", "sum")]
        )
        return g.rename_columns(["kind", "size_bin", "n_payloads", "total_bytes"])

    partials = meta.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "bin", merge, k=1)


def dup_matrix(sf_dir: str) -> Dataset:
    """T60: cross-source duplication matrix — for every source pair
    a <= b: how many exact-content groups have at least one copy in BOTH
    (diagonal = groups with >= 2 copies inside the source) — T47 says how
    exposed each source is, T60 says WHO mirrors WHOM (the pair you read
    before dropping one of two syndicated feeds).  Exact int64; engine
    groups by a 64-bit content hash, the oracle by the text itself
    (T1/T4 collision convention).

    Scale shape — T47's content-hash exchange feeding E57's pair
    expansion on the GROUP axis:
      1. per batch one polars content-hash pass + one Arrow group_by
         reduces docs to distinct (hash, source, n) partials;
      2. hash-partition by CONTENT HASH: each group's source multiset is
         local, so its ordered pairs (diagonal iff n >= 2 copies within
         the source, off-diagonal for every co-present pair) re-reduce in
         place to (a, b, n_groups) partials — bounded by
         groups x sources-per-group^2, text never shuffles;
      3. one k=1 merge sums O(sources^2) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        hs = (
            pl.from_arrow(batch.select(["text"]))["text"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        code = pc.cast(pc.index_in(batch["source"], value_set=srcs), pa.int64())
        t = pa.table(
            {"text_hash": pa.array(hs, pa.int64()), "c": code}
        )
        g = t.group_by(["text_hash", "c"], use_threads=False).aggregate(
            [("c", "count")]
        )
        return g.rename_columns(["text_hash", "c", "n"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "n_groups": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["text_hash", "c"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        h = g["text_hash"].combine_chunks().to_numpy(zero_copy_only=False)
        c = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((c, h))
        h2, c2, n2 = h[order], c[order], n[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = h2[1:] != h2[:-1]
        gs = np.flatnonzero(newg)
        runlen = np.diff(np.append(gs, len(h2)))
        # within-group ordered pairs (the E57 expansion) over source runs;
        # a source pairs with itself only when it holds >= 2 copies
        pos = np.arange(len(h2)) - np.repeat(gs, runlen)
        rep = np.repeat(runlen, runlen) - pos
        ai = np.repeat(np.arange(len(h2)), rep)
        csum = np.cumsum(rep)
        first = np.concatenate(([0], csum[:-1]))
        bi = ai + (np.arange(csum[-1]) - np.repeat(first, rep))
        keep = (ai != bi) | (n2[ai] >= 2)
        packed = c2[ai[keep]] * ns + c2[bi[keep]]
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "a": pa.array(vals // ns, pa.int64()),
                "b": pa.array(vals % ns, pa.int64()),
                "n_groups": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        # densify to the FULL upper triangle (zero cells included) so the
        # matrix is non-vacuous at every scale — a dup-free corpus reads
        # as an all-zero board, not an empty result (the T47 convention)
        dense = np.zeros((ns, ns), np.int64)
        if t.num_rows:
            g = t.group_by(["a", "b"], use_threads=False).aggregate(
                [("n_groups", "sum")]
            )
            aa = g["a"].combine_chunks().to_numpy(zero_copy_only=False)
            bb = g["b"].combine_chunks().to_numpy(zero_copy_only=False)
            dense[aa, bb] = g["n_groups_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        ai, bi = np.triu_indices(ns)
        return pa.table(
            {
                "source_a": srcs.take(pa.array(ai, pa.int64())),
                "source_b": srcs.take(pa.array(bi, pa.int64())),
                "n_groups": pa.array(dense[ai, bi]),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    cells = hash_partition_merge(partials, "text_hash", fold, k=_doc_k(sf_dir))
    # zero-contribution seed row: a dup-free corpus produces NO cell
    # partials, and a groupby over zero rows never invokes the merge —
    # the seed guarantees the dense all-zero board still materializes
    seed = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([0], pa.int64()),
                "b": pa.array([0], pa.int64()),
                "n_groups": pa.array([0], pa.int64()),
            }
        )
    )
    return hash_partition_merge(cells.union(seed), "a", merge, k=1)


def shingle_novelty(sf_dir: str, k_shingle: int = 3) -> Dataset:
    """T61: shingle novelty by corpus order — per doc: distinct 3-word
    shingles, shingles this doc INTRODUCES (no lower doc_id holds them),
    and the novelty permille — the "is the crawl still finding new
    content" curve dedup schedulers read (T27 asks "is it duplicated
    anywhere", T61 "who said it FIRST" under the doc_id ingest order).
    Exact int64; engine compares 64-bit shingle hashes, the oracle
    shingle STRINGS (T4/T19/T27 convention).

    Scale shape — T27's two narrow int64 exchanges verbatim:
      1. one vectorized shingle pass per batch emits distinct
         (doc_id, shingle) rows — text never shuffles;
      2. hash-partition by SHINGLE: each shingle's minimum doc_id is
         decided locally (one lexsort; the first row of each run is the
         introducer) and folds into per-doc (n, novel) partials;
      3. hash-partition partials by DOC_ID and sum."""
    from ..stages.shuffle import hash_partition_merge

    def explode(batch: pa.Table) -> pa.Table:
        rows, sh = ts.shingles_flat(batch["text"], k_shingle)
        doc = batch["doc_id"].combine_chunks().take(pa.array(rows, pa.int64()))
        return pa.table(
            {"doc_id": doc, "shingle": pa.array(sh.view(np.int64), pa.int64())}
        )

    exploded = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold_by_shingle(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "nv": pa.array([], pa.int64()),
                }
            )
        h = t["shingle"].combine_chunks().to_numpy(zero_copy_only=False)
        doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, h))
        h2, d2 = h[order], doc[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = h2[1:] != h2[:-1]
        # (doc, shingle) rows are distinct per doc, so the first row of
        # each shingle run is its unique minimum-doc introducer
        ud, dinv = np.unique(d2, return_inverse=True)
        n_part = np.bincount(dinv, minlength=len(ud)).astype(np.int64)
        nv_part = np.zeros(len(ud), np.int64)
        np.add.at(nv_part, dinv[newg], 1)
        return pa.table(
            {
                "doc_id": pa.array(ud, pa.int64()),
                "n": pa.array(n_part),
                "nv": pa.array(nv_part),
            }
        )

    def fold_by_doc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_shingles": pa.array([], pa.int64()),
                    "n_novel": pa.array([], pa.int64()),
                    "novelty_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("doc_id", use_threads=False).aggregate(
            [("n", "sum"), ("nv", "sum")]
        )
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nv = g["nv_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pc.cast(g["doc_id"], pa.int64()),
                "n_shingles": pa.array(n.astype(np.int64)),
                "n_novel": pa.array(nv.astype(np.int64)),
                "novelty_permille": pa.array(
                    (1000 * nv) // np.maximum(n, 1), pa.int64()
                ),
            }
        )

    kk = _doc_k(sf_dir)
    partials = hash_partition_merge(exploded, "shingle", fold_by_shingle, k=kk)
    return hash_partition_merge(partials, "doc_id", fold_by_doc, k=kk)


def lang_token_mix(sf_dir: str) -> Dataset:
    """T62: language-mix token budget — per (source, labeled lang): doc
    count and EXACT whitespace-token total (T11's split(' ') convention)
    — T44's balance sheet moved to the unit mixture weights are actually
    set in (tokens, not chars); exact int64 (len(str_split) oracle).

    Scale shape — T44's convention with the token kernel folded in: one
    Arrow split-length pass per batch, one group_by to
    ≤(sources × langs) partials, ONLY partials shuffle into the per-lang
    merge; text never leaves the batch."""

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch["text"].combine_chunks()
        n = pc.cast(pc.list_value_length(pc.split_pattern(txt, " ")), pa.int64())
        t = pa.table(
            {
                "source": batch["source"],
                "lang": batch["lang"],
                "n_tokens": n,
            }
        )
        g = t.group_by(["source", "lang"], use_threads=False).aggregate(
            [("n_tokens", "count"), ("n_tokens", "sum")]
        )
        return g.rename_columns(["source", "lang", "n_docs", "n_tokens"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "lang": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["source", "lang"], use_threads=False).aggregate(
            [("n_docs", "sum"), ("n_tokens", "sum")]
        )
        return g.rename_columns(["source", "lang", "n_docs", "n_tokens"])

    partials = _docs(sf_dir, ["source", "lang", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return partials.groupby("lang").map_groups(merge, batch_format="pyarrow")


def longest_per_source(sf_dir: str, k: int = 3) -> Dataset:
    """T63: longest documents per source — the top-k docs by (n_chars
    DESC, doc_id ASC) within each source, with their 1-based rank — the
    outlier-inspection drill-down next to T26's length filter and T45's
    Gini (what exactly IS the giant page this source keeps shipping);
    exact int64 (row_number oracle).

    Scale shape — grouped top-k on the DOC table (E18's combiner shape):
    each batch keeps only its local top-k per source via one lexsort, so
    the per-source merge sees O(batches × k) narrow rows — text never
    leaves the scan."""

    def local_topk(b: pa.Table) -> pa.Table:
        src = b["source"].combine_chunks()
        codes = (
            pc.dictionary_encode(src)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        d = pc.cast(b["doc_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        L = pc.cast(b["n_chars"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((d, -L, codes))
        c2 = codes[order]
        newg = np.empty(len(order), dtype=bool)
        if len(order):
            newg[0] = True
            newg[1:] = c2[1:] != c2[:-1]
        gs = np.flatnonzero(newg)
        pos = np.arange(len(order)) - np.repeat(
            gs, np.diff(np.append(gs, len(order)))
        )
        keep = order[pos < k]
        return pa.table(
            {
                "source": src.take(pa.array(keep, pa.int64())),
                "doc_id": pa.array(d[keep], pa.int64()),
                "n_chars": pa.array(L[keep], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        d = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        L = t["n_chars"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((d, -L))[: min(k, len(d))]
        take = pa.array(order, pa.int64())
        return pa.table(
            {
                "source": t["source"].take(take),
                "doc_id": pa.array(d[order], pa.int64()),
                "n_chars": pa.array(L[order], pa.int64()),
                "rank": pa.array(
                    np.arange(1, len(order) + 1, dtype=np.int64)
                ),
            }
        )

    partials = _docs(sf_dir, ["doc_id", "source", "n_chars"]).map_batches(
        local_topk, batch_format="pyarrow"
    )
    return partials.groupby("source").map_groups(merge, batch_format="pyarrow")


def novelty_by_source(sf_dir: str, k_shingle: int = 3) -> Dataset:
    """T64: novelty contribution by source — per source: total distinct
    doc-shingles, shingles its docs INTRODUCE corpus-wide (T61's
    first-introduction rule under doc_id order), and the novelty permille
    — "which source is still bringing new content" as the per-source roll
    of T61's per-doc curve; exact int64 (min(doc_id)-per-shingle join +
    source GROUP BY oracle; string/hash collision convention).

    Scale shape — T61's shingle-hash exchange with the source label
    riding as an exact broadcast rank (the T40 convention), so the
    per-shingle fold re-reduces straight to per-source partials and the
    per-doc table never materializes; one k=1 source merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )

    def explode(batch: pa.Table) -> pa.Table:
        rows, sh = ts.shingles_flat(batch["text"], k_shingle)
        take = pa.array(rows, pa.int64())
        doc = batch["doc_id"].combine_chunks().take(take)
        code = pc.cast(
            pc.index_in(batch["source"], value_set=srcs), pa.int64()
        ).combine_chunks().take(take)
        return pa.table(
            {
                "doc_id": doc,
                "src": code,
                "shingle": pa.array(sh.view(np.int64), pa.int64()),
            }
        )

    def fold_by_shingle(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "nv": pa.array([], pa.int64()),
                }
            )
        h = t["shingle"].combine_chunks().to_numpy(zero_copy_only=False)
        doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, h))
        h2, s2 = h[order], src[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = h2[1:] != h2[:-1]
        n = np.zeros(len(srcs), np.int64)
        nv = np.zeros(len(srcs), np.int64)
        np.add.at(n, s2, 1)
        np.add.at(nv, s2[newg], 1)
        keep = n > 0
        return pa.table(
            {
                "src": pa.array(np.flatnonzero(keep).astype(np.int64)),
                "n": pa.array(n[keep]),
                "nv": pa.array(nv[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_shingles": pa.array([], pa.int64()),
                    "n_novel": pa.array([], pa.int64()),
                    "novelty_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("src", use_threads=False).aggregate(
            [("n", "sum"), ("nv", "sum")]
        )
        si = pa.array(
            g["src"].combine_chunks().to_numpy(zero_copy_only=False), pa.int64()
        )
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nv = g["nv_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": srcs.take(si),
                "n_shingles": pa.array(n.astype(np.int64)),
                "n_novel": pa.array(nv.astype(np.int64)),
                "novelty_permille": pa.array(
                    (1000 * nv) // np.maximum(n, 1), pa.int64()
                ),
            }
        )

    exploded = _docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = hash_partition_merge(
        exploded, "shingle", fold_by_shingle, k=_doc_k(sf_dir)
    )
    return hash_partition_merge(partials, "src", merge, k=1)


def vocab_overlap(sf_dir: str) -> Dataset:
    """T65: cross-source vocabulary overlap matrix — for every source
    pair a <= b: the EXACT number of distinct WORDS present in both (the
    diagonal is each source's vocabulary size) — T37's n-gram overlap
    moved to the lexical axis (shingles measure shared CONTENT, shared
    words measure shared REGISTER/domain: two sources can share a whole
    vocabulary yet no 3-gram), and E57's user-overlap question asked of
    words.  Exact int64 (distinct source-word self-join oracle; engine
    compares 64-bit word hashes, the oracle word strings — the T4/T40
    collision convention; source identity is the exact broadcast rank).

    Scale shape — E57's dedupe-combiner + bounded outer product on the
    WORD axis: per batch one vectorized word-hash pass reduces to
    DISTINCT (word, source) rows; word-hash partition holds each word's
    whole source set locally, expanding its s(s+1)/2 ordered pairs in
    place with repeat/arange algebra (s bounded by the tiny source
    cardinality) and re-reducing to (a, b, n) partials; the k=1 merge
    sums O(sources²) rows.  The vocabulary is never materialized."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def explode(batch: pa.Table) -> pa.Table:
        uh, n = ts.batch_word_hashes(batch["text"])
        code = pc.cast(
            pc.index_in(batch["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        src = np.repeat(code, n)
        h = uh.view(np.int64)
        order = np.lexsort((h, src))
        s2, h2 = src[order], h[order]
        keep = np.empty(len(order), dtype=bool)
        if len(order):
            keep[0] = True
            keep[1:] = (s2[1:] != s2[:-1]) | (h2[1:] != h2[:-1])
        return pa.table(
            {
                "word": pa.array(h2[keep], pa.int64()),
                "src": pa.array(s2[keep], pa.int64()),
            }
        )

    def word_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        hh = t["word"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cc, hh))
        h2, c2 = hh[order], cc[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (h2[1:] != h2[:-1]) | (c2[1:] != c2[:-1])
        su = np.flatnonzero(new)
        h3, c3 = h2[su], c2[su]
        neww = np.empty(len(su), dtype=bool)
        neww[0] = True
        neww[1:] = h3[1:] != h3[:-1]
        wstart = np.flatnonzero(neww)
        runlen = np.diff(np.append(wstart, len(h3)))
        pos = np.arange(len(h3)) - np.repeat(wstart, runlen)
        rep = np.repeat(runlen, runlen) - pos
        ai = np.repeat(np.arange(len(h3)), rep)
        csum = np.cumsum(rep)
        first = np.concatenate(([0], csum[:-1]))
        bi = ai + (np.arange(csum[-1]) - np.repeat(first, rep))
        packed = c3[ai] * ns + c3[bi]
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "a": pa.array(vals // ns, pa.int64()),
                "b": pa.array(vals % ns, pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source_a": pa.array([], pa.string()),
                    "source_b": pa.array([], pa.string()),
                    "n_common_words": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["a", "b"], use_threads=False).aggregate([("n", "sum")])
        ai = pa.array(
            g["a"].combine_chunks().to_numpy(zero_copy_only=False), pa.int64()
        )
        bi = pa.array(
            g["b"].combine_chunks().to_numpy(zero_copy_only=False), pa.int64()
        )
        return pa.table(
            {
                "source_a": srcs.take(ai),
                "source_b": srcs.take(bi),
                "n_common_words": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    exploded = _docs(sf_dir, ["source", "text"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    per_word = hash_partition_merge(exploded, "word", word_fold, k=_doc_k(sf_dir))
    return hash_partition_merge(per_word, "a", merge, k=1)


def _prefix_hashes(texts) -> np.ndarray:
    """Per-row 64-bit hash of the doc's first min(3, n_words) words —
    the polynomial shingle fold applied at POSITION ZERO only, with the
    natural truncation for 1- and 2-word docs (matching the oracle's
    ``concat_ws(' ', w[1], w[2], w[3])`` NULL-skipping semantics: equal
    prefix strings hash equal; distinct ones collide only at the
    documented 2^-64 convention)."""
    uh, n = ts.batch_word_hashes(texts)
    starts = np.concatenate(([0], np.cumsum(n)))[:-1]
    out = np.empty(len(n), np.uint64)
    with np.errstate(over="ignore"):
        m1 = n == 1
        out[m1] = uh[starts[m1]]
        m2 = n == 2
        s2 = starts[m2]
        out[m2] = uh[s2] * ts._SH_A + uh[s2 + 1]
        m3 = n >= 3
        s3 = starts[m3]
        out[m3] = (uh[s3] * ts._SH_A + uh[s3 + 1] * ts._SH_B) * ts._SH_A + uh[
            s3 + 2
        ]
    return out


def prefix_exposure(sf_dir: str) -> Dataset:
    """T66: boilerplate-opening exposure by source — per source: total
    docs, distinct opening prefixes (first 3 words), docs whose prefix is
    SHARED with at least one other doc corpus-wide, and the shared
    permille — the template/boilerplate detector read before trusting
    near-dup rates (mirror sites and CMS templates share openings long
    before they share whole shingle sets; T47 asks this of whole texts,
    T66 of their first line).  One row per source ALWAYS (T47's
    non-vacuous convention).  Exact int64 (prefix GROUP BY + corpus-count
    join oracle; hash/string collision convention).

    Scale shape — T47's content-hash exchange on the PREFIX axis: per
    batch one vectorized pass reduces docs to (prefix, source, n) cells;
    prefix-hash partition decides each prefix's corpus-wide count
    exactly and folds IN PLACE to per-source (n_docs, n_prefixes,
    n_shared) partials — per-doc rows never leave their partition; tiny
    per-source merge.  Text never shuffles."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def cells(batch: pa.Table) -> pa.Table:
        pre = _prefix_hashes(batch["text"]).view(np.int64)
        code = pc.cast(
            pc.index_in(batch["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "prefix": pa.array(pre, pa.int64()),
                "src": pa.array(code, pa.int64()),
            }
        )
        g = t.group_by(["prefix", "src"], use_threads=False).aggregate(
            [("src", "count")]
        )
        return g.rename_columns(["prefix", "src", "n"])

    def prefix_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "np_": pa.array([], pa.int64()),
                    "nsh": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["prefix", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        hh = g["prefix"].combine_chunks().to_numpy(zero_copy_only=False)
        cc = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(hh, kind="stable")
        h2, c2, n2 = hh[order], cc[order], nn[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = h2[1:] != h2[:-1]
        gid = np.cumsum(new) - 1
        tot = np.zeros(gid[-1] + 1, np.int64)
        np.add.at(tot, gid, n2)
        shared = tot[gid] > 1
        nd = np.zeros(ns, np.int64)
        npf = np.zeros(ns, np.int64)
        nsh = np.zeros(ns, np.int64)
        np.add.at(nd, c2, n2)
        np.add.at(npf, c2, 1)
        np.add.at(nsh, c2[shared], n2[shared])
        keep = nd > 0
        return pa.table(
            {
                "src": pa.array(np.flatnonzero(keep).astype(np.int64)),
                "nd": pa.array(nd[keep]),
                "np_": pa.array(npf[keep]),
                "nsh": pa.array(nsh[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array(np.zeros(ns, np.int64))
            return pa.table(
                {
                    "source": srcs,
                    "n_docs": z,
                    "n_prefixes": z,
                    "n_shared": z,
                    "shared_permille": z,
                }
            )
        g = t.group_by("src", use_threads=False).aggregate(
            [("nd", "sum"), ("np_", "sum"), ("nsh", "sum")]
        )
        si = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        nd = g["nd_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        npf = g["np__sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nsh = g["nsh_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        # densify: one row per source ALWAYS (T47 convention)
        out_nd = np.zeros(ns, np.int64)
        out_np = np.zeros(ns, np.int64)
        out_ns = np.zeros(ns, np.int64)
        out_nd[si] = nd
        out_np[si] = npf
        out_ns[si] = nsh
        return pa.table(
            {
                "source": srcs,
                "n_docs": pa.array(out_nd),
                "n_prefixes": pa.array(out_np),
                "n_shared": pa.array(out_ns),
                "shared_permille": pa.array(
                    (1000 * out_ns) // np.maximum(out_nd, 1), pa.int64()
                ),
            }
        )

    cells_ds = _docs(sf_dir, ["source", "text"]).map_batches(
        cells, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = hash_partition_merge(
        cells_ds, "prefix", prefix_fold, k=_doc_k(sf_dir)
    )
    return hash_partition_merge(partials, "src", merge, k=1)


def len_token_stats(sf_dir: str) -> Dataset:
    """T67: length/token second-moment stats — per source: n_docs,
    Σchars, Σtokens, Σchars², Σtokens², Σchars·tokens, all exact int64 —
    the sufficient statistics of the per-source length↔token-count
    correlation (Pearson r follows off-line), read next to T36's
    fertility ratio to see whether token cost scales LINEARLY with
    length or some docs fragment disproportionately (E31's exact-Gram
    pattern on the doc axis).  Int64 bound: chars ≤ 10⁵ → per-doc
    squares ≤ 10¹⁰ → ~9·10⁸ docs per source before overflow; beyond
    that, shard the partials (documented like T45's object-dtype rank
    sums).  Exact (len(str_split) + SUM oracle).

    Scale shape: ZERO wide exchange — tokens are batch-local (one Arrow
    split-length kernel), chars ride the n_chars column, and one
    np.add.at pass reduces each batch to a single partial row per
    source; only O(batches × sources) rows reach the tiny per-source
    merge (T49's profile)."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)
    COLS = ("n_docs", "sum_chars", "sum_tokens", "sum_chars_sq",
            "sum_tokens_sq", "sum_cross")

    def partial(b: pa.Table) -> pa.Table:
        code = pc.cast(
            pc.index_in(b["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        ch = pc.cast(b["n_chars"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        tok = (
            pc.list_value_length(pc.split_pattern(b["text"], " "))
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        acc = np.zeros((ns, 6), np.int64)
        np.add.at(acc[:, 0], code, 1)
        np.add.at(acc[:, 1], code, ch)
        np.add.at(acc[:, 2], code, tok)
        np.add.at(acc[:, 3], code, ch * ch)
        np.add.at(acc[:, 4], code, tok * tok)
        np.add.at(acc[:, 5], code, ch * tok)
        keep = acc[:, 0] > 0
        out = {"src": pa.array(np.flatnonzero(keep).astype(np.int64))}
        for i, c in enumerate(COLS):
            out[c] = pa.array(acc[keep, i])
        return pa.table(out)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in COLS},
                }
            )
        g = t.group_by("src", use_threads=False).aggregate(
            [(c, "sum") for c in COLS]
        )
        si = pa.array(
            g["src"].combine_chunks().to_numpy(zero_copy_only=False), pa.int64()
        )
        out = {"source": srcs.take(si)}
        for c in COLS:
            out[c] = pc.cast(g[f"{c}_sum"], pa.int64())
        return pa.table(out)

    partials = _docs(sf_dir, ["source", "text", "n_chars"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "src", merge, k=1)


def quality_quantiles(
    sf_dir: str, qs: tuple[int, ...] = (500, 900, 990)
) -> Dataset:
    """T68: stopword-permille quantiles by source — per source: n_docs +
    discrete p50/p90/p99 of the T10 stopword permille
    floor(1000·n_stop/n_words) — the quality-score DISTRIBUTION behind
    T10's per-doc features and T29's fixed-floor filter (a source whose
    p50 sits below the filter floor is about to lose half its mass; the
    board that says so before the filter runs).  Exact int64 under the
    quantile_disc rank rule (list_filter stopword CTE + quantile_disc
    oracle; bit-exact because both sides floor the same 1000.0·x/y
    double division).

    Scale shape — T21's mergeable-histogram pattern with a domain bound
    of 1001 values: the permille is batch-local (T10's vectorized
    kernel), so each batch reduces to (source, permille, freq) partials
    (≤ sources × 1001 rows however large the corpus) and every quantile
    reads off one cumulative sum in the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(batch["text"]), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        n_words = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(
            flat, value_set=pa.array(list(ts.STOPWORDS))
        ).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(
            parent, weights=is_stop, minlength=batch.num_rows
        ).astype(np.int64)
        sp = np.floor(1000.0 * n_stop / np.maximum(n_words, 1)).astype(np.int64)
        sp[n_words == 0] = 0
        code = pc.cast(
            pc.index_in(batch["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        packed = code * 1001 + sp
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "src": pa.array(vals // 1001, pa.int64()),
                "sp": pa.array(vals % 1001, pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    names = tuple(f"p{q // 10}" for q in qs)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in names},
                }
            )
        g = t.group_by(["src", "sp"], use_threads=False).aggregate([("f", "sum")])
        ss = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = g["sp"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = g["f_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((vv, ss))
        s2, v2, f2 = ss[order], vv[order], ff[order]
        news = np.empty(len(order), dtype=bool)
        news[0] = True
        news[1:] = s2[1:] != s2[:-1]
        sstart = np.flatnonzero(news)
        send = np.append(sstart[1:], len(order))
        out = {
            "source": [], "n_docs": [],
            **{c: [] for c in names},
        }
        for a, b in zip(sstart, send):
            vals, freq = v2[a:b], f2[a:b]
            n = int(freq.sum())
            cum = np.cumsum(freq)
            out["source"].append(int(s2[a]))
            out["n_docs"].append(n)
            for q, c in zip(qs, names):
                thr = (n * q + 999) // 1000
                out[c].append(int(vals[np.searchsorted(cum, thr)]))
        return pa.table(
            {
                "source": srcs.take(pa.array(out["source"], pa.int64())),
                "n_docs": pa.array(out["n_docs"], pa.int64()),
                **{c: pa.array(out[c], pa.int64()) for c in names},
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "src", merge, k=1)


def first_publisher(sf_dir: str) -> Dataset:
    """T69: first-publisher attribution — per source: total docs, exact
    dup groups (byte-identical text, ≥2 copies corpus-wide) this
    source's doc LEADS (holds the minimum doc_id — T61's
    first-introduction rule applied to whole texts), and this source's
    ECHO docs (non-minimum members of any dup group) — the syndication
    DIRECTION board: T60's matrix says who shares with whom, T69 who
    published first and who repeats.  One row per source ALWAYS (exact
    zeros on a dup-free corpus — the T47 non-vacuous convention; real
    dup groups live at sf0.1 where this is driver-verified).  Exact
    int64 (min(doc_id)-per-text join oracle; engine groups by the
    64-bit content hash, oracle by text — T1/T4 collision convention;
    source identity is the exact broadcast rank).

    Scale shape — T47's content-hash exchange with a min-doc column
    riding: per batch one polars hash + one Arrow group_by reduce docs
    to (hash, src, n, min_doc) cells; the content-hash partition holds
    each group whole, so its corpus count, global minimum doc and that
    doc's source are decided locally and fold IN PLACE to per-source
    (n_docs, n_led, n_echo) partials; k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        hs = (
            pl.from_arrow(batch.select(["text"]))["text"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        code = pc.cast(
            pc.index_in(batch["source"], value_set=srcs), pa.int64()
        )
        t = pa.table(
            {
                "text_hash": pa.array(hs, pa.int64()),
                "src": code,
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            }
        )
        g = t.group_by(["text_hash", "src"], use_threads=False).aggregate(
            [("doc_id", "count"), ("doc_id", "min")]
        )
        return g.rename_columns(["text_hash", "src", "n", "min_doc"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "led": pa.array([], pa.int64()),
                    "echo": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["text_hash", "src"], use_threads=False).aggregate(
            [("n", "sum"), ("min_doc", "min")]
        )
        h = g["text_hash"].combine_chunks().to_numpy(zero_copy_only=False)
        s = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        md = g["min_doc_min"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((md, h))
        h2, s2, n2, m2 = h[order], s[order], n[order], md[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = h2[1:] != h2[:-1]
        gs = np.flatnonzero(newg)
        gid = np.cumsum(newg) - 1
        gtot = np.add.reduceat(n2, gs)
        is_dup = gtot[gid] > 1
        # group leader = the cell holding the group's global min doc
        # (first cell of each run under the (hash, min_doc) lexsort)
        nd = np.zeros(ns, np.int64)
        led = np.zeros(ns, np.int64)
        echo = np.zeros(ns, np.int64)
        np.add.at(nd, s2, n2)
        lead_cell = newg & is_dup
        np.add.at(led, s2[lead_cell], 1)
        # echo docs: every dup-group member except the single leader doc
        e = np.where(is_dup, n2, 0)
        e[lead_cell] -= 1
        np.add.at(echo, s2, e)
        keep = nd > 0
        return pa.table(
            {
                "src": pa.array(np.flatnonzero(keep).astype(np.int64)),
                "nd": pa.array(nd[keep]),
                "led": pa.array(led[keep]),
                "echo": pa.array(echo[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out_nd = np.zeros(ns, np.int64)
        out_led = np.zeros(ns, np.int64)
        out_echo = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("src", use_threads=False).aggregate(
                [("nd", "sum"), ("led", "sum"), ("echo", "sum")]
            )
            si = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
            out_nd[si] = g["nd_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            out_led[si] = g["led_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            out_echo[si] = g["echo_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "source": srcs,
                "n_docs": pa.array(out_nd),
                "n_led_groups": pa.array(out_led),
                "n_echo_docs": pa.array(out_echo),
            }
        )

    cells = _docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = hash_partition_merge(cells, "text_hash", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(partials, "src", merge, k=1)


def ttr_quantiles(
    sf_dir: str, qs: tuple[int, ...] = (500, 900, 990)
) -> Dataset:
    """T70: type-token-ratio quantiles by source — per source: n_docs +
    discrete p50/p90/p99 of each doc's 1000·distinct_words // n_words —
    the per-doc lexical-richness DISTRIBUTION (T40 sums the corpus-level
    ratio, T42 the repetition concentration; T70 shows the shape a
    single mean hides — a source mixing boilerplate and prose is bimodal
    here).  Exact int64 under the quantile_disc rank rule
    (list_distinct + quantile_disc oracle; engine counts distinct word
    HASHES, oracle distinct strings — the T4/T40 collision convention).

    Scale shape — T21's mergeable-histogram pattern with the ≤1001-value
    permille domain: a doc is one row, so its distinct-word count is
    batch-local (one vectorized word-hash pass + one lexsort per batch);
    batches reduce to (source, ttr, freq) partials and every quantile
    reads off one cumulative sum in the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )

    def partial(batch: pa.Table) -> pa.Table:
        uh, n = ts.batch_word_hashes(batch["text"])
        parent = np.repeat(np.arange(len(n), dtype=np.int64), n)
        order = np.lexsort((uh, parent))
        p2, h2 = parent[order], uh[order]
        new = np.empty(len(order), dtype=bool)
        if len(order):
            new[0] = True
            new[1:] = (p2[1:] != p2[:-1]) | (h2[1:] != h2[:-1])
        distinct = np.bincount(p2[new], minlength=len(n)).astype(np.int64)
        ttr = (1000 * distinct) // np.maximum(n, 1)
        code = pc.cast(
            pc.index_in(batch["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        packed = code * 1001 + ttr
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "src": pa.array(vals // 1001, pa.int64()),
                "ttr": pa.array(vals % 1001, pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    names = tuple(f"p{q // 10}" for q in qs)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in names},
                }
            )
        g = t.group_by(["src", "ttr"], use_threads=False).aggregate([("f", "sum")])
        ss = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = g["ttr"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = g["f_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((vv, ss))
        s2, v2, f2 = ss[order], vv[order], ff[order]
        news = np.empty(len(order), dtype=bool)
        news[0] = True
        news[1:] = s2[1:] != s2[:-1]
        sstart = np.flatnonzero(news)
        send = np.append(sstart[1:], len(order))
        out = {"source": [], "n_docs": [], **{c: [] for c in names}}
        for a, b in zip(sstart, send):
            vals, freq = v2[a:b], f2[a:b]
            nt = int(freq.sum())
            cum = np.cumsum(freq)
            out["source"].append(int(s2[a]))
            out["n_docs"].append(nt)
            for q, c in zip(qs, names):
                thr = (nt * q + 999) // 1000
                out[c].append(int(vals[np.searchsorted(cum, thr)]))
        return pa.table(
            {
                "source": srcs.take(pa.array(out["source"], pa.int64())),
                "n_docs": pa.array(out["n_docs"], pa.int64()),
                **{c: pa.array(out[c], pa.int64()) for c in names},
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "src", merge, k=1)


def word_len_hist(sf_dir: str) -> Dataset:
    """T71: word-length histogram — per (source, CHARACTER length of each
    whitespace word): occurrence count — the orthography profile of a
    corpus slice (tokenizer-fertility planning reads directly off it:
    long-tail word lengths predict subword splits; a mass spike at
    length 1-2 flags CJK-style scripts or broken segmentation).  T43
    bins DOCUMENT lengths and T50 bins chars by CLASS; T71 bins the word
    inventory itself.  Exact int64 (unnest + len() oracle; utf8_length
    is DuckDB len()'s codepoint semantics, so multi-byte scripts agree).

    Scale shape — zero shuffles of anything corpus-sized: one
    ``split_pattern`` + ``utf8_length`` Arrow kernel pair per batch (the
    word STRINGS never leave the batch — only their lengths), a
    bit-packed np.unique reduces each batch to (source, length, freq)
    partials, and the value domain (sources x max word length) is tiny,
    so the k=1 merge sums O(domain) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )

    def partial(batch: pa.Table) -> pa.Table:
        lst = pc.split_pattern(batch["text"], " ")
        nwords = (
            pc.cast(pc.list_value_length(lst), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        flat = pc.list_flatten(lst)
        wl = (
            pc.cast(pc.utf8_length(flat), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        code = (
            pc.cast(pc.index_in(batch["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = np.repeat(code, nwords) * (1 << 32) + wl
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "src": pa.array(vals >> 32, pa.int64()),
                "wlen": pa.array(vals & 0xFFFFFFFF, pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "wlen": pa.array([], pa.int64()),
                    "n_words": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["src", "wlen"], use_threads=False).aggregate(
            [("f", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["src"].combine_chunks()),
                "wlen": pc.cast(g["wlen"], pa.int64()),
                "n_words": pc.cast(g["f_sum"], pa.int64()),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "src", merge, k=1)


def stutter_stats(sf_dir: str) -> Dataset:
    """T72: word-stutter board — per source: n_docs, adjacent word pairs,
    pairs whose two words are EQUAL ("the the"), and the stutter permille
    — the OCR-glitch / boilerplate-concatenation / decoder-loop detector
    that reads WORD ORDER where T18/T27 read n-gram multiplicity (a
    looping generator maximizes stutter long before its 5-gram dup
    fraction moves).  Exact int64 (generate_subscripts + lag oracle;
    equality via the word-hash collision convention — a collision can
    only create a false stutter, at the documented 64-bit rate).

    Scale shape — ZERO wide exchange (T49's profile): adjacency is
    batch-local by construction (a doc is one row), so one
    batch_word_hashes pass + one shifted compare reduce each batch to one
    partial row per source; O(batches × sources) rows ride the tiny
    per-source merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )

    def partial(batch: pa.Table) -> pa.Table:
        uh, n = ts.batch_word_hashes(batch["text"])
        parent = np.repeat(np.arange(len(n), dtype=np.int64), n)
        same = np.zeros(0, dtype=bool)
        if len(uh) > 1:
            same = (uh[1:] == uh[:-1]) & (parent[1:] == parent[:-1])
        code = (
            pc.cast(pc.index_in(batch["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        k = len(srcs)
        ndocs = np.bincount(code, minlength=k).astype(np.int64)
        npairs = np.bincount(
            code, weights=np.maximum(n - 1, 0), minlength=k
        ).astype(np.int64)
        # doc index of each stuttering pair's second word -> its source
        per_doc_stut = np.bincount(
            parent[1:][same], minlength=len(n)
        ).astype(np.int64)
        nstut = np.bincount(
            code, weights=per_doc_stut, minlength=k
        ).astype(np.int64)
        live = ndocs > 0
        return pa.table(
            {
                "s": pa.array(np.flatnonzero(live).astype(np.int64)),
                "nd": pa.array(ndocs[live]),
                "np_": pa.array(npairs[live]),
                "st": pa.array(nstut[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_pairs": pa.array([], pa.int64()),
                    "n_stutters": pa.array([], pa.int64()),
                    "stutter_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("nd", "sum"), ("np_", "sum"), ("st", "sum")]
        )
        npv = g["np__sum"].combine_chunks().to_numpy(zero_copy_only=False)
        stv = g["st_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": srcs.take(g["s"].combine_chunks()),
                "n_docs": pc.cast(g["nd_sum"], pa.int64()),
                "n_pairs": pa.array(npv.astype(np.int64)),
                "n_stutters": pa.array(stv.astype(np.int64)),
                "stutter_permille": pa.array(
                    (1000 * stv.astype(np.int64))
                    // np.maximum(npv.astype(np.int64), 1)
                ),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def lang_quality_matrix(sf_dir: str) -> Dataset:
    """T73: language × quality-band composition matrix — per (labeled
    lang, stop-permille band of width 100): document count — the
    "is low-quality mass concentrated in one language" pivot a mixture
    designer reads before setting per-language T29 thresholds (T44
    crosses lang with SOURCE, T68 gives per-source quality SHAPE; T73
    crosses lang with the quality score itself).  Exact int64 (T10's
    floored stop-permille expression // 100 oracle; the 1000.0·x/y
    double divide floors identically on both sides — the T68
    convention).

    Scale shape — ZERO corpus-sized exchange: the permille is
    batch-local (T10's vectorized stopword kernel), each batch reduces
    to (lang, band, freq) partials over a ≤ langs × 11 domain, and the
    k=1 merge sums O(domain) rows."""
    from ..stages.shuffle import hash_partition_merge

    langs = pa.array(
        sorted(_docs(sf_dir, ["lang"]).unique("lang")), pa.string()
    )

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(batch["text"]), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        n_words = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(
            flat, value_set=pa.array(list(ts.STOPWORDS))
        ).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(
            parent, weights=is_stop, minlength=batch.num_rows
        ).astype(np.int64)
        sp = np.floor(1000.0 * n_stop / np.maximum(n_words, 1)).astype(
            np.int64
        )
        sp[n_words == 0] = 0
        band = sp // 100
        code = pc.cast(
            pc.index_in(batch["lang"], value_set=langs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        packed = code * 11 + band
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "lg": pa.array(vals // 11, pa.int64()),
                "band": pa.array(vals % 11, pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "band": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["lg", "band"], use_threads=False).aggregate(
            [("f", "sum")]
        )
        return pa.table(
            {
                "lang": langs.take(g["lg"].combine_chunks()),
                "band": pc.cast(g["band"], pa.int64()),
                "n_docs": pc.cast(g["f_sum"], pa.int64()),
            }
        )

    partials = _docs(sf_dir, ["lang", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "lg", merge, k=1)


def vocab_growth(sf_dir: str, k_shingle: int = 3) -> Dataset:
    """T74: shingle-vocabulary growth curve (Heaps' law board) — per
    corpus-position DECILE (doc_id scaled to 0-9): distinct 3-word
    shingles INTRODUCED there (first occurrence under T61's minimum-
    doc_id rule) — the "is content still arriving or just repeating"
    summary T61 gives per doc, collapsed to the 10-point curve a crawl
    review actually reads (a healthy crawl decays slowly; a loop
    crashes to zero).  Exact int64; engine compares 64-bit shingle
    hashes, the oracle shingle STRINGS (T4/T19/T27 convention).

    Scale shape — T61's shingle-hash exchange with a decile tail:
    distinct (doc, shingle) rows explode per batch (text never
    shuffles); each shingle's minimum doc_id settles locally in its
    hash partition (one lexsort run head) and bincounts straight to
    (decile, n) partials — ≤ 10 rows per partition ride the k=1
    merge.  The doc_id scale (max+1) is one footer-cheap aggregate."""
    from ..stages.shuffle import hash_partition_merge

    nd = int(
        _docs(sf_dir, ["doc_id"]).max("doc_id") + 1
    )  # position scale; tiny count-scan aggregate

    def explode(batch: pa.Table) -> pa.Table:
        rows, sh = ts.shingles_flat(batch["text"], k_shingle)
        doc = batch["doc_id"].combine_chunks().take(pa.array(rows, pa.int64()))
        return pa.table(
            {"doc_id": doc, "shingle": pa.array(sh.view(np.int64), pa.int64())}
        )

    exploded = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "decile": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        h = t["shingle"].combine_chunks().to_numpy(zero_copy_only=False)
        doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, h))
        h2, d2 = h[order], doc[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = h2[1:] != h2[:-1]
        first_doc = d2[newg]  # each shingle's introducing doc
        dec = np.minimum((10 * first_doc) // max(nd, 1), 9)
        cnt = np.bincount(dec, minlength=10).astype(np.int64)
        live = np.flatnonzero(cnt)
        return pa.table(
            {
                "decile": pa.array(live.astype(np.int64)),
                "n": pa.array(cnt[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "decile": pa.array([], pa.int64()),
                    "n_new_shingles": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("decile", use_threads=False).aggregate([("n", "sum")])
        return pa.table(
            {
                "decile": pc.cast(g["decile"], pa.int64()),
                "n_new_shingles": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    partials = hash_partition_merge(exploded, "shingle", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(partials, "decile", merge, k=1)


def embedding_dim_profile(sf_dir: str) -> Dataset:
    """T75: per-dimension embedding profile — for each vector dimension
    (1-based, matching generate_subscripts): component min, max, and the
    vector count — the feature-drift / normalization sanity board an
    embedding pipeline reads before ANN indexing (a dimension whose
    range collapses to a point is dead weight in T6's cosine; one whose
    range explodes dominates T5b's hyperplane buckets).  min/max are
    EXACT on floats (no accumulation — unlike sums, order cannot change
    them), emitted as float64 so both sides widen float32 identically
    (unnest + generate_subscripts + min/max oracle).

    Scale shape — ZERO wide exchange: vectors reshape (n, d) per batch
    (one flatten — the list child is contiguous), one np.min/np.max per
    axis reduces each batch to d partial rows, and the k=1 merge folds
    O(batches × d) rows with one group_by."""
    from ..stages.shuffle import hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "lo": pa.array([], pa.float64()),
                    "hi": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)
        )
        d = m.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "lo": pa.array(m.min(axis=0)),
                "hi": pa.array(m.max(axis=0)),
                "n": pa.array(np.full(d, n, np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "min_x": pa.array([], pa.float64()),
                    "max_x": pa.array([], pa.float64()),
                    "n_vecs": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("dim", use_threads=False).aggregate(
            [("lo", "min"), ("hi", "max"), ("n", "sum")]
        )
        return pa.table(
            {
                "dim": pc.cast(g["dim"], pa.int64()),
                "min_x": pc.cast(g["lo_min"], pa.float64()),
                "max_x": pc.cast(g["hi_max"], pa.float64()),
                "n_vecs": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "dim", merge, k=1)


FREQ_COVERAGE_FLOORS: tuple[int, ...] = (10, 100, 1000)


def freq_coverage(
    sf_dir: str, floors: tuple[int, ...] = FREQ_COVERAGE_FLOORS
) -> Dataset:
    """T76: frequency-coverage board — for each corpus-frequency floor F:
    words with ≥ F occurrences, their total occurrences, and the permille
    of ALL word occurrences they cover — the vocab-size planning curve
    behind T24's id mapping ("a 10k vocab built at floor F covers X‰ of
    the stream; everything else is <unk>").  Floor-thresholds instead of
    top-N so the answer is TIE-FREE (a top-N cut at the frequency
    boundary is ambiguous; ≥ F is not); one dense row per floor ALWAYS.
    Exact int64 (HAVING-style CASE-sum oracle; hash/string collision
    convention).

    Scale shape — T16's exact-count exchange with a threshold tail: per
    batch one word-hash count pass; each word's corpus count settles
    exactly in its hash partition, which reduces IN PLACE to ≤ floors+1
    rows (per-floor word/occurrence sums + the partition's total) — the
    vocabulary never leaves the partitions; k=1 merge of O(k × floors)
    rows emits the permilles."""
    from ..stages.shuffle import hash_partition_merge

    def partial(batch: pa.Table) -> pa.Table:
        uh, _n = ts.batch_word_hashes(batch["text"])
        vals, freq = np.unique(uh, return_counts=True)
        return pa.table(
            {
                "wh": pa.array(vals.view(np.int64), pa.int64()),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "f": pa.array([], pa.int64()),
                    "nw": pa.array([], pa.int64()),
                    "occ": pa.array([], pa.int64()),
                    "tot": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("wh", use_threads=False).aggregate([("n", "sum")])
        cnt = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        rows = {"f": [], "nw": [], "occ": [], "tot": []}
        for fl in floors:
            sel = cnt >= fl
            rows["f"].append(fl)
            rows["nw"].append(int(sel.sum()))
            rows["occ"].append(int(cnt[sel].sum()))
            rows["tot"].append(int(cnt.sum()))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})

    def merge(t: pa.Table) -> pa.Table:
        nw = np.zeros(len(floors), np.int64)
        occ = np.zeros(len(floors), np.int64)
        tot = np.zeros(len(floors), np.int64)
        if t.num_rows:
            g = t.group_by("f", use_threads=False).aggregate(
                [("nw", "sum"), ("occ", "sum"), ("tot", "sum")]
            )
            ff = g["f"].combine_chunks().to_numpy(zero_copy_only=False)
            pos = {int(fl): i for i, fl in enumerate(floors)}
            idx = np.array([pos[int(x)] for x in ff], np.int64)
            nw[idx] = g["nw_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            occ[idx] = g["occ_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            tot[idx] = g["tot_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "min_freq": pa.array(list(floors), pa.int64()),
                "n_words": pa.array(nw),
                "n_occurrences": pa.array(occ),
                "coverage_permille": pa.array(
                    (1000 * occ) // np.maximum(tot, 1)
                ),
            }
        )

    partials = _docs(sf_dir, ["text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "wh", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(cells, "f", merge, k=1)


def split_board(sf_dir: str) -> Dataset:
    """T77: deterministic train/val/test split + leakage board — assign
    every doc to a split by the T15 salted-hash convention
    (((doc_id % p) · 2654435761) % p % 1000 → <980 train, <990 val,
    else test) and report per split: docs, whitespace tokens, and docs
    LEAKED — sharing their exact text with a doc in a DIFFERENT split
    (the contamination mode that silently inflates eval scores; T19
    checks against an external eval set, T77 against the split's own
    siblings).  One dense row per split ALWAYS (zero-valued leak column
    under a dup-free corpus, per the dup-board convention).  Exact int64
    (hash-formula + text self-join oracle; content-hash collision
    convention on the leak lane).

    Scale shape — one stateless hash assigns splits batch-locally (the
    split ITSELF needs no exchange — the property that makes it usable
    as a read-time filter at 100 TB); the leak lane is T69's
    content-hash exchange with split FLAGS riding: per batch (text-hash,
    split, n) cells; each hash partition holds whole dup groups, so
    "group spans >1 split" decides locally and folds to per-split
    leaked counts; k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    P = 1_000_000_007
    MULT = 2_654_435_761

    def split_of(doc_id: np.ndarray) -> np.ndarray:
        b = ((doc_id % P) * MULT) % P % 1000
        return np.where(b < 980, 0, np.where(b < 990, 1, 2)).astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        doc = batch["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        sp = split_of(doc)
        ntok = (
            pc.cast(
                pc.list_value_length(pc.split_pattern(batch["text"], " ")),
                pa.int64(),
            )
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        h = (
            pl.from_arrow(batch.select(["text"]))["text"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        counts = {
            "h": [],
            "sp": [],
            "nd": [],
            "ntok": [],
        }
        packed = h * 4 + sp  # 3 splits fit 2 bits
        vals, inv, freq = np.unique(
            packed, return_inverse=True, return_counts=True
        )
        tok_sum = np.zeros(len(vals), np.int64)
        np.add.at(tok_sum, inv, ntok)
        counts["h"].append(vals >> 2)
        counts["sp"].append(vals & 3)
        counts["nd"].append(freq.astype(np.int64))
        counts["ntok"].append(tok_sum)
        return pa.table(
            {k: pa.array(np.concatenate(v)) for k, v in counts.items()}
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "sp": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "ntok": pa.array([], pa.int64()),
                    "leak": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["h", "sp"], use_threads=False).aggregate(
            [("nd", "sum"), ("ntok", "sum")]
        )
        hh = g["h"].combine_chunks().to_numpy(zero_copy_only=False)
        sp = g["sp"].combine_chunks().to_numpy(zero_copy_only=False)
        nd = g["nd_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        ntok = g["ntok_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(hh, kind="stable")
        h2, sp2, nd2 = hh[order], sp[order], nd[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = h2[1:] != h2[:-1]
        gid = np.cumsum(new) - 1
        n_groups = int(new.sum())
        splits_per_group = np.bincount(gid, minlength=n_groups)
        spans = splits_per_group > 1  # >1 distinct (hash, split) rows
        leak_rows = spans[gid]  # rows of multi-split groups
        leaked = np.zeros(3, np.int64)
        np.add.at(leaked, sp2[leak_rows], nd2[leak_rows])
        base_nd = np.zeros(3, np.int64)
        base_tok = np.zeros(3, np.int64)
        np.add.at(base_nd, sp, nd)
        np.add.at(base_tok, sp, ntok)
        return pa.table(
            {
                "sp": pa.array(np.arange(3, dtype=np.int64)),
                "nd": pa.array(base_nd),
                "ntok": pa.array(base_tok),
                "leak": pa.array(leaked),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nd = np.zeros(3, np.int64)
        ntok = np.zeros(3, np.int64)
        leak = np.zeros(3, np.int64)
        if t.num_rows:
            g = t.group_by("sp", use_threads=False).aggregate(
                [("nd", "sum"), ("ntok", "sum"), ("leak", "sum")]
            )
            ss = g["sp"].combine_chunks().to_numpy(zero_copy_only=False)
            nd[ss] = g["nd_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            ntok[ss] = g["ntok_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            leak[ss] = g["leak_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "split": pa.array(["train", "val", "test"], pa.string()),
                "n_docs": pa.array(nd),
                "n_tokens": pa.array(ntok),
                "n_leaked": pa.array(leak),
            }
        )

    partials = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "h", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(cells, "sp", merge, k=1)


def embedding_norm_hist(sf_dir: str, band_width: int = 2) -> Dataset:
    """T78: embedding norm histogram — per band of the INTEGER-QUANTIZED
    squared L2 norm (Σ floor(1000·x²), banded by ``band_width``): vector
    count — the normalization audit run before cosine ANN (T6/T7/T8
    assume comparable norms; a bimodal band histogram means two
    un-normalized populations and broken similarity scores).  The
    element-wise floor happens BEFORE the sum, so both sides add exact
    int64 — float addition order (numpy pairwise vs DuckDB sequential)
    can never differ (unnest/list_transform + list_sum would; this is
    the T68 double-floor convention applied per element).  Exact int64.

    Scale shape — ZERO wide exchange: vectors reshape (n, d) per batch,
    one float64 square + floor + row-sum per batch reduces to (band,
    freq) partials over a tiny domain; k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {"band": pa.array([], pa.int64()), "f": pa.array([], pa.int64())}
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)
        )
        q = np.floor(1000.0 * m * m).astype(np.int64).sum(axis=1)
        band = q // band_width
        vals, freq = np.unique(band, return_counts=True)
        return pa.table(
            {
                "band": pa.array(vals, pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "n_vecs": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("band", use_threads=False).aggregate([("f", "sum")])
        return pa.table(
            {
                "band": pc.cast(g["band"], pa.int64()),
                "n_vecs": pc.cast(g["f_sum"], pa.int64()),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "band", merge, k=1)


def token_band_hist(
    sf_dir: str, band_width: int = 4096
) -> Dataset:
    """T79/F: token-id band histogram over the F1 tokenized stream — per
    (source, token_id // band_width): occurrence count — the vocabulary
    USAGE heatmap of the flagship payload (a band the tokenizer never
    emits is reclaimable id space; a band one source saturates flags
    domain skew), the id-space dual of T16's per-token heavy hitters.
    Exact int64 (unnest + integer-divide oracle).

    Scale shape — ZERO corpus-sized exchange: one flatten + one
    bit-packed np.unique per batch reduces the token stream to
    (source, band, freq) partials over a ≤ sources × (vocab/band_width)
    domain; k=1 merge.  The token lists themselves never shuffle."""
    import glob

    import ray.data as rd

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = np.repeat(code, nper) * (1 << 32) + flat // band_width
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "src": pa.array(vals >> 32, pa.int64()),
                "band": pa.array(vals & 0xFFFFFFFF, pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "band": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["src", "band"], use_threads=False).aggregate(
            [("f", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["src"].combine_chunks()),
                "band": pc.cast(g["band"], pa.int64()),
                "n_tokens": pc.cast(g["f_sum"], pa.int64()),
            }
        )

    partials = rd.read_parquet(files, columns=["source", "tokens"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "src", merge, k=1)


def seq_dedup_board(sf_dir: str) -> Dataset:
    """T80/F: sequence-level exact-dedup board over the F1 tokenized
    stream — per source: sequences, DISTINCT token arrays, duplicate
    copies (seqs − distinct), dup permille — T1's exact dedup asked of
    the TOKENIZED payload (post-tokenization dedup catches what T1
    misses: two texts that tokenize identically), and the training-side
    answer to E84's redelivery accounting.  One dense row per source
    ALWAYS.  Exact int64 (count(DISTINCT tokens) on the LIST column
    oracle; engine hashes token arrays — polars 64-bit list hash, the
    T69 content-hash collision convention).

    Scale shape — E84's dedupe + counter-stream exchange with the key
    built from the PAYLOAD: one polars list-hash per batch (tokens never
    shuffle — only their 8-byte hashes), distinct (hash, source) pairs +
    per-(batch, source) raw counters ride ONE hash exchange; partitions
    re-dedupe exactly and reduce to per-source (raw, uniq) partials;
    k=1 merge."""
    import glob

    import ray.data as rd

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        import polars as pl

        h = (
            pl.from_arrow(b.select(["tokens"]))["tokens"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        raw = np.bincount(code, minlength=ns).astype(np.int64)
        live = np.flatnonzero(raw)
        order = np.lexsort((h, code))
        c2, h2 = code[order], h[order]
        new = np.empty(len(order), dtype=bool)
        if len(order):
            new[0] = True
            new[1:] = (c2[1:] != c2[:-1]) | (h2[1:] != h2[:-1])
        return pa.table(
            {
                "hh": pa.array(
                    np.concatenate([-1 - live.astype(np.int64), h2[new]])
                ),
                "s": pa.array(
                    np.concatenate([live.astype(np.int64), c2[new]])
                ),
                "raw": pa.array(
                    np.concatenate(
                        [raw[live], np.zeros(int(new.sum()), np.int64)]
                    )
                ),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "s": pa.array([], pa.int64()),
                    "raw": pa.array([], pa.int64()),
                    "uniq": pa.array([], pa.int64()),
                }
            )
        hh = t["hh"].combine_chunks().to_numpy(zero_copy_only=False)
        ss = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        rawv = t["raw"].combine_chunks().to_numpy(zero_copy_only=False)
        # counter rows use the low id lane -1..-ns (hash rows are raw
        # 64-bit values, which can be negative too — disambiguate by raw>0)
        is_ctr = rawv > 0
        raw_sum = np.bincount(ss[is_ctr], weights=rawv[is_ctr], minlength=ns)
        c2, h2 = ss[~is_ctr], hh[~is_ctr]
        order = np.lexsort((h2, c2))
        c2, h2 = c2[order], h2[order]
        new = np.empty(len(order), dtype=bool)
        if len(order):
            new[0] = True
            new[1:] = (c2[1:] != c2[:-1]) | (h2[1:] != h2[:-1])
        uniq = np.bincount(c2[new], minlength=ns).astype(np.int64)
        live = (raw_sum > 0) | (uniq > 0)
        idx = np.flatnonzero(live)
        return pa.table(
            {
                "s": pa.array(idx.astype(np.int64)),
                "raw": pa.array(raw_sum[idx].astype(np.int64)),
                "uniq": pa.array(uniq[idx]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        raw = np.zeros(ns, np.int64)
        un = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("s", use_threads=False).aggregate(
                [("raw", "sum"), ("uniq", "sum")]
            )
            ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
            raw[ss] = g["raw_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            un[ss] = g["uniq_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        dup = raw - un
        return pa.table(
            {
                "source": srcs,
                "n_seqs": pa.array(raw),
                "n_unique": pa.array(un),
                "n_dup_copies": pa.array(dup),
                "dup_permille": pa.array((1000 * dup) // np.maximum(raw, 1)),
            }
        )

    partials = rd.read_parquet(files, columns=["source", "tokens"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    per_hash = hash_partition_merge(partials, "hh", fold, k=_doc_k_files(files))
    return hash_partition_merge(per_hash, "s", merge, k=1)


def _doc_k_files(files) -> int:
    """adaptive_width over an explicit file list (the F1 cache has no
    fixed documents.parquet path)."""
    from ..stages.shuffle import adaptive_width

    return adaptive_width(files[0], 25_000)


def lang_confusion(sf_dir: str) -> Dataset:
    """T81: language-ID confusion matrix — per (labeled lang, T9
    prediction): document count — the CLASSIFIER AUDIT read before
    trusting T9-driven routing (T44 assumes the label, T9 predicts; T81
    says where they disagree and in which direction — 'unknown' columns
    are coverage gaps, off-diagonal mass is mislabeling risk).  Exact
    int64 (the doc_langid list_filter CASE joined to the label oracle).

    Scale shape — ZERO corpus-sized exchange: the prediction is
    batch-local (the shared _langid_pred kernel), each batch reduces to
    (label, pred, freq) partials over a ≤ langs × 4 domain; k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    langs = pa.array(
        sorted(_docs(sf_dir, ["lang"]).unique("lang")), pa.string()
    )
    preds = pa.array(
        sorted(LANGID_WORDS) + ["unknown"], pa.string()
    )
    npred = len(preds)

    def partial(batch: pa.Table) -> pa.Table:
        pred = _langid_pred(batch["text"])
        pcode = (
            pc.cast(
                pc.index_in(pa.array(pred, pa.string()), value_set=preds),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
        )
        lcode = (
            pc.cast(pc.index_in(batch["lang"], value_set=langs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = lcode * npred + pcode
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "lg": pa.array(vals // npred, pa.int64()),
                "pd": pa.array(vals % npred, pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "lang_pred": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["lg", "pd"], use_threads=False).aggregate(
            [("f", "sum")]
        )
        return pa.table(
            {
                "lang": langs.take(g["lg"].combine_chunks()),
                "lang_pred": preds.take(g["pd"].combine_chunks()),
                "n_docs": pc.cast(g["f_sum"], pa.int64()),
            }
        )

    partials = _docs(sf_dir, ["lang", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "lg", merge, k=1)


def embedding_join_audit(sf_dir: str) -> Dataset:
    """T82: doc↔embedding referential-integrity board — matched pairs
    (doc_id = vec_id), docs WITHOUT an embedding, embeddings WITHOUT a
    doc — the pipeline-health audit run before T17's enrichment join or
    any T5/T6 similarity pass silently drops rows (a non-zero doc_only
    column means the embedding job lagged the crawl; emb_only means
    stale vectors survive deletion).  One row ALWAYS, zero-valued when
    the join is total.  Exact int64 (FULL OUTER JOIN FILTER oracle).

    Scale shape — the co-partitioned FULL-OUTER existence probe: both
    tables reduce to role-tagged id rows (nothing else ships), ONE
    id-hash exchange co-locates equal ids, each partition settles
    matched / left-only / right-only with one lexsort, and the k=1
    merge sums three counters."""
    from ..stages.shuffle import hash_partition_merge

    docs = _docs(sf_dir, ["doc_id"])
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])

    def tag(role: int, col: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "k": pc.cast(b[col], pa.int64()),
                    "r": pa.array(
                        np.full(b.num_rows, role, np.int64)
                    ),
                }
            )

        return fn

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "one": pa.array([], pa.int64()),
                    "m": pa.array([], pa.int64()),
                    "do": pa.array([], pa.int64()),
                    "eo": pa.array([], pa.int64()),
                }
            )
        kk = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        rr = t["r"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((rr, kk))
        k2, r2 = kk[order], rr[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = k2[1:] != k2[:-1]
        gid = np.cumsum(new) - 1
        ng = int(new.sum())
        has_d = np.zeros(ng, dtype=bool)
        has_e = np.zeros(ng, dtype=bool)
        np.logical_or.at(has_d, gid, r2 == 0)
        np.logical_or.at(has_e, gid, r2 == 1)
        return pa.table(
            {
                "one": pa.array([0], pa.int64()),
                "m": pa.array([int((has_d & has_e).sum())], pa.int64()),
                "do": pa.array([int((has_d & ~has_e).sum())], pa.int64()),
                "eo": pa.array([int((~has_d & has_e).sum())], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        m = do = eo = 0
        if t.num_rows:
            m = int(pc.sum(t["m"]).as_py() or 0)
            do = int(pc.sum(t["do"]).as_py() or 0)
            eo = int(pc.sum(t["eo"]).as_py() or 0)
        return pa.table(
            {
                "n_matched": pa.array([m], pa.int64()),
                "n_doc_only": pa.array([do], pa.int64()),
                "n_emb_only": pa.array([eo], pa.int64()),
            }
        )

    both = docs.map_batches(tag(0, "doc_id"), batch_format="pyarrow").union(
        emb.map_batches(tag(1, "vec_id"), batch_format="pyarrow")
    )
    cells = hash_partition_merge(both, "k", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(cells, "one", merge, k=1)


def jaccard_spectrum(
    sf_dir: str, threshold_permille: int = 200, k_shingle: int = 3
) -> Dataset:
    """T83: near-dup severity spectrum — per Jaccard band (permille //
    100, from the T4 threshold up; band 10 = EXACT shingle-set match):
    candidate-pair count — the "how near are the near-dups" read that
    decides T20b's keep/drop threshold (a spectrum massed at 900+ means
    true duplicates — dedup aggressively; massed just over the threshold
    means boilerplate overlap — raise it).  One dense row per band
    ALWAYS (zero-valued below sf0.1, where the corpus has no near-dup
    pairs — the dup-board convention).  Exact int64 (the T4 pair CTE
    banded oracle).

    Scale shape — pure composition: T4's bounded-shuffle pair join does
    ALL the work (df_cap, hybrid size attach); the spectrum is one
    map_batches band + k=1 densifying merge over ≤9 rows."""
    from ..stages.shuffle import hash_partition_merge

    bands = list(range(threshold_permille // 100, 11))
    pairs = jaccard_pairs(
        sf_dir, threshold_permille=threshold_permille, k=k_shingle
    )

    def band(b: pa.Table) -> pa.Table:
        jp = (
            b["jaccard_permille"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        vals, freq = np.unique(jp // 100, return_counts=True)
        return pa.table(
            {
                "band": pa.array(vals.astype(np.int64)),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        cnt = {b: 0 for b in bands}
        if t.num_rows:
            g = t.group_by("band", use_threads=False).aggregate([("f", "sum")])
            bb = g["band"].combine_chunks().to_numpy(zero_copy_only=False)
            ff = g["f_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            for b, f in zip(bb, ff):
                cnt[int(b)] = int(f)
        return pa.table(
            {
                "band": pa.array(bands, pa.int64()),
                "n_pairs": pa.array([cnt[b] for b in bands], pa.int64()),
            }
        )

    # sentinel row (band −1, ignored by the merge) keeps the pipeline
    # non-empty below sf0.1 where no pair survives — Ray drops the schema
    # on all-empty streams and the dense board must still emit
    seed = rd.from_arrow(
        pa.table(
            {"band": pa.array([-1], pa.int64()), "f": pa.array([0], pa.int64())}
        )
    )
    partials = pairs.map_batches(band, batch_format="pyarrow").union(seed)
    return hash_partition_merge(partials, "band", merge, k=1)


def token_position_stats(sf_dir: str) -> Dataset:
    """T84/F: positional token statistics over the F1 tokenized stream —
    per sequence position p (0-based): sequences reaching it, min and
    max token id there — the positional-bias probe of the flagship
    payload (real corpora pin special ids to fixed positions: a BOS at
    0, EOS at the tail; a position whose id range collapses is such a
    convention, and a training-data bug if unintended).  Exact int64
    (generate_subscripts + min/max oracle).

    Scale shape — ZERO corpus-sized exchange: per batch the flattened
    child + one arange-minus-offsets position index reduce to ≤ max_len
    (n, min, max) partial rows via two sort-free np.minimum/maximum.at
    passes; k=1 merge folds O(batches × max_len) rows."""
    import glob

    import ray.data as rd

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        if len(flat) == 0:
            return pa.table(
                {
                    "pos": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "lo": pa.array([], pa.int64()),
                    "hi": pa.array([], pa.int64()),
                }
            )
        offs = np.zeros(len(nper) + 1, np.int64)
        np.cumsum(nper, out=offs[1:])
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offs[:-1], nper)
        m = int(pos.max()) + 1
        n = np.bincount(pos, minlength=m).astype(np.int64)
        lo = np.full(m, np.iinfo(np.int64).max, np.int64)
        hi = np.full(m, np.iinfo(np.int64).min, np.int64)
        np.minimum.at(lo, pos, flat)
        np.maximum.at(hi, pos, flat)
        return pa.table(
            {
                "pos": pa.array(np.arange(m, dtype=np.int64)),
                "n": pa.array(n),
                "lo": pa.array(lo),
                "hi": pa.array(hi),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "pos": pa.array([], pa.int64()),
                    "n_seqs": pa.array([], pa.int64()),
                    "min_tok": pa.array([], pa.int64()),
                    "max_tok": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("pos", use_threads=False).aggregate(
            [("n", "sum"), ("lo", "min"), ("hi", "max")]
        )
        return pa.table(
            {
                "pos": pc.cast(g["pos"], pa.int64()),
                "n_seqs": pc.cast(g["n_sum"], pa.int64()),
                "min_tok": pc.cast(g["lo_min"], pa.int64()),
                "max_tok": pc.cast(g["hi_max"], pa.int64()),
            }
        )

    partials = rd.read_parquet(files, columns=["tokens"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "pos", merge, k=1)


def f1_gap_report(sf_dir: str) -> Dataset:
    """T85/F: sequence-completeness audit over the F1 tokenized stream —
    per source: rows, DISTINCT seq numbers, MISSING seqs inside the
    observed span (span − distinct), the largest single gap between
    consecutive distinct seqs (in skipped seqs), and duplicate rows
    (rows − distinct) — the ingest-integrity board behind the
    reference's per-queue sequence tracking (a missing seq = a message
    the broker accepted but the sink never stored; a dup = a redelivery
    E84 counts on the events axis).  The generator PLANTS seq gaps
    (gen.make_pairs with_gaps), so every column is non-vacuous at every
    sf.  Exact int64 (regexp seq parse + lag oracle).

    Scale shape — seqs settle exactly under ONE (source, seq)-pair
    exchange... but gaps are ORDER-dependent across the whole seq axis,
    so the exchange keys on (source, seq // window): each partition
    holds a contiguous seq window, computes its INTERNAL gaps + window
    min/max/count locally, and the k=1 merge stitches windows per
    source with one lexsort over O(windows) summary rows (the
    grid_cumsum boundary-stitch shape, prefix carried at the merge)."""
    import glob

    import ray.data as rd

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    W = 1 << 16  # seqs per window

    def partial(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            b["doc_id"].combine_chunks(), r"-(?P<seq>[0-9]+)$"
        )
        seq = (
            pc.cast(pc.struct_field(ex, "seq"), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "sw": pa.array(code * (1 << 40) + seq // W, pa.int64()),
                "s": pa.array(code),
                "seq": pa.array(seq),
                "n": pa.array(np.ones(len(seq), np.int64)),
            }
        )
        g = t.group_by(["sw", "s", "seq"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["sw", "s", "seq", "n"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "s": pa.array([], pa.int64()),
                    "lo": pa.array([], pa.int64()),
                    "hi": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "rows": pa.array([], pa.int64()),
                    "igap": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["s", "seq"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        qq = g["seq"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((qq, ss))
        s2, q2, n2 = ss[order], qq[order], nn[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = s2[1:] != s2[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(order))
        rows = {k: [] for k in ("s", "lo", "hi", "nd", "rows", "igap")}
        for a, b in zip(starts, ends):
            q = q2[a:b]
            rows["s"].append(int(s2[a]))
            rows["lo"].append(int(q[0]))
            rows["hi"].append(int(q[-1]))
            rows["nd"].append(int(b - a))
            rows["rows"].append(int(n2[a:b].sum()))
            rows["igap"].append(
                int((q[1:] - q[:-1] - 1).max()) if b - a > 1 else 0
            )
        return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_rows": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "n_missing": pa.array([], pa.int64()),
                    "max_gap": pa.array([], pa.int64()),
                    "n_dup_rows": pa.array([], pa.int64()),
                }
            )
        ss = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        lo = t["lo"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = t["hi"].combine_chunks().to_numpy(zero_copy_only=False)
        nd = t["nd"].combine_chunks().to_numpy(zero_copy_only=False)
        nr = t["rows"].combine_chunks().to_numpy(zero_copy_only=False)
        ig = t["igap"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((lo, ss))
        s2 = ss[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = s2[1:] != s2[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(order))
        out = {
            k: []
            for k in (
                "source", "n_rows", "n_distinct", "n_missing", "max_gap",
                "n_dup_rows",
            )
        }
        for a, b in zip(starts, ends):
            w = order[a:b]  # this source's windows in ascending-lo order
            span = int(hi[w[-1]] - lo[w[0]] + 1)
            distinct = int(nd[w].sum())
            # boundary gaps between consecutive windows
            bgap = lo[w[1:]] - hi[w[:-1]] - 1 if len(w) > 1 else np.array([0])
            out["source"].append(int(s2[a]))
            out["n_rows"].append(int(nr[w].sum()))
            out["n_distinct"].append(distinct)
            out["n_missing"].append(span - distinct)
            out["max_gap"].append(int(max(ig[w].max(), bgap.max())))
            out["n_dup_rows"].append(int(nr[w].sum()) - distinct)
        return pa.table(
            {
                "source": srcs.take(pa.array(out["source"], pa.int64())),
                **{
                    k: pa.array(out[k], pa.int64())
                    for k in (
                        "n_rows", "n_distinct", "n_missing", "max_gap",
                        "n_dup_rows",
                    )
                },
            }
        )

    partials = rd.read_parquet(files, columns=["doc_id", "source"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "sw", fold, k=_doc_k_files(files))
    return hash_partition_merge(cells, "s", merge, k=1)


def f1_ntok_quantiles_1h(
    sf_dir: str, qs: tuple[int, ...] = (500, 900)
) -> Dataset:
    """T86/F: hourly sequence-length quantiles over the F1 stream — per
    (source, 1h bucket): sequences + discrete p50/p90 of n_tok — the
    flagship's own latency-percentile analog (E22 rolls event VALUES;
    T86 rolls the tokenized payload's length, the number batch-packing
    and KV-cache sizing key off per time slice).  Exact int64 under the
    quantile_disc rank rule (seq-derived bucket + quantile_disc oracle).

    Scale shape — E22's per-bucket mergeable histogram verbatim on the
    F axis: n_tok is bounded by max_tok, so each batch reduces to
    (source, bucket, n_tok, freq) partials; ONLY histograms shuffle
    (bucket-hash), every group's quantiles read off one lexsort +
    cumsum per partition."""
    import glob

    import ray.data as rd

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )

    def partial(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            b["doc_id"].combine_chunks(), r"-(?P<seq>[0-9]+)$"
        )
        seq = (
            pc.cast(pc.struct_field(ex, "seq"), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        bucket = seq // 3600
        ntok = pc.cast(b["n_tok"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = (code * (1 << 32) + bucket) * 1024 + ntok
        vals, freq = np.unique(packed, return_counts=True)
        sb = vals // 1024
        return pa.table(
            {
                "sb": pa.array(sb, pa.int64()),
                "v": pa.array(vals % 1024, pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    names = tuple(f"p{q // 10}_ntok" for q in qs)

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "bucket_ts": pa.array([], pa.timestamp("us")),
                    "n_seqs": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in names},
                }
            )
        g = t.group_by(["sb", "v"], use_threads=False).aggregate(
            [("f", "sum")]
        )
        sb = g["sb"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = g["v"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = g["f_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((vv, sb))
        k2, v2, f2 = sb[order], vv[order], ff[order]
        news = np.empty(len(order), dtype=bool)
        news[0] = True
        news[1:] = k2[1:] != k2[:-1]
        starts = np.flatnonzero(news)
        ends = np.append(starts[1:], len(order))
        out = {"s": [], "b": [], "n": [], **{c: [] for c in names}}
        for a, b in zip(starts, ends):
            vals, freq = v2[a:b], f2[a:b]
            nt = int(freq.sum())
            cum = np.cumsum(freq)
            out["s"].append(int(k2[a] >> 32))
            out["b"].append(int(k2[a] & 0xFFFFFFFF))
            out["n"].append(nt)
            for q, c in zip(qs, names):
                thr = (nt * q + 999) // 1000
                out[c].append(int(vals[np.searchsorted(cum, thr)]))
        from ..timegrid import T0_US

        return pa.table(
            {
                "source": srcs.take(pa.array(out["s"], pa.int64())),
                "bucket_ts": pa.array(
                    np.array(out["b"], np.int64) * 3_600_000_000 + T0_US,
                    pa.int64(),
                ).cast(pa.timestamp("us")),
                "n_seqs": pa.array(out["n"], pa.int64()),
                **{c: pa.array(out[c], pa.int64()) for c in names},
            }
        )

    partials = rd.read_parquet(
        files, columns=["doc_id", "source", "n_tok"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return hash_partition_merge(partials, "sb", fold, k=_doc_k_files(files))


def embedding_neighbor_gap_hist(
    sf_dir: str, band_width: int = 200
) -> Dataset:
    """T88: embedding-space spacing histogram — per band of the
    INTEGER-QUANTIZED squared distance Σ floor(1000·(xᵢ−yᵢ)²) between
    CONSECUTIVE vec_ids (a deterministic 1-D sample of the pairwise
    distance distribution — O(N) pairs where the full matrix is O(N²)):
    pair count — the spacing audit behind T5's threshold choice (a
    spike near zero = near-dup mass T5b must catch; a point mass
    elsewhere = a degenerate encoder).  The element-wise floor happens
    BEFORE the sum (T78's convention), so both sides add exact int64.
    Exact int64 (self-join on vec_id+1 + list_transform oracle).

    Scale shape — consecutive ids co-locate under ONE (vec_id //
    2)-free trick: rows ship to BOTH their own and their predecessor's
    pair partition... simpler: pairs key on the LOWER id, and each
    vector ships (at most) twice — to pair id and id−1 — as narrow
    (pair, role, vector) rows; each partition reshapes its two sides
    and reduces to (band, freq) partials; k=1 merge.  Pair rows are
    2 rows/vector regardless of corpus size."""
    from ..stages.shuffle import hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def explode(b: pa.Table) -> pa.Table:
        e = b["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        vid = pc.cast(b["vec_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        # role 0: this vector opens pair (vid); role 1: it closes (vid-1)
        t = pa.table(
            {
                "pair": pa.array(np.concatenate([vid, vid - 1])),
                "role": pa.array(
                    np.concatenate(
                        [
                            np.zeros(len(vid), np.int64),
                            np.ones(len(vid), np.int64),
                        ]
                    )
                ),
                "embedding": pa.concat_arrays([e, e]),
            }
        )
        return t.filter(pc.field("pair") >= 0)

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "f": pa.array([], pa.int64()),
                }
            )
        pairs = t["pair"].combine_chunks().to_numpy(zero_copy_only=False)
        roles = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        e = t["embedding"].combine_chunks()
        n = len(pairs)
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)
        )
        order = np.lexsort((roles, pairs))
        p2, r2 = pairs[order], roles[order]
        # complete pairs: adjacent rows with same pair id, roles (0, 1)
        both = (
            (p2[1:] == p2[:-1]) & (r2[:-1] == 0) & (r2[1:] == 1)
        )
        at = np.flatnonzero(both)
        if len(at) == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "f": pa.array([], pa.int64()),
                }
            )
        a = m[order[at]]
        bvec = m[order[at + 1]]
        d = a - bvec
        q = np.floor(1000.0 * d * d).astype(np.int64).sum(axis=1)
        vals, freq = np.unique(q // band_width, return_counts=True)
        return pa.table(
            {
                "band": pa.array(vals, pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "n_pairs": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("band", use_threads=False).aggregate([("f", "sum")])
        return pa.table(
            {
                "band": pc.cast(g["band"], pa.int64()),
                "n_pairs": pc.cast(g["f_sum"], pa.int64()),
            }
        )

    from ..stages.shuffle import adaptive_width

    exploded = emb.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    kk = adaptive_width(f"{sf_dir}/embeddings.parquet", 25_000)
    cells = hash_partition_merge(exploded, "pair", fold, k=kk)
    return hash_partition_merge(cells, "band", merge, k=1)


def length_integrity(sf_dir: str) -> Dataset:
    """T89: metadata-integrity audit — per source: docs, docs whose
    stored ``n_chars`` DISAGREES with len(text) (codepoint semantics,
    T71's convention) — the reference's validate-predicate (M2: declared
    n_tok must equal len(tokens)) asked of the documents table's own
    metadata; one dense row per source ALWAYS, zero-valued when the
    pipeline upstream was honest.  Exact int64 (len() compare oracle).

    Scale shape — ZERO wide exchange: one utf8_length kernel + one
    compare per batch reduce to per-source (docs, bad) counter rows;
    k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(batch: pa.Table) -> pa.Table:
        ln = (
            pc.cast(pc.utf8_length(batch["text"]), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        nc = pc.cast(batch["n_chars"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        code = (
            pc.cast(pc.index_in(batch["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        nd = np.bincount(code, minlength=ns).astype(np.int64)
        bad = np.bincount(
            code, weights=(ln != nc).astype(np.int64), minlength=ns
        ).astype(np.int64)
        live = np.flatnonzero(nd)
        return pa.table(
            {
                "s": pa.array(live.astype(np.int64)),
                "nd": pa.array(nd[live]),
                "bad": pa.array(bad[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nd = np.zeros(ns, np.int64)
        bad = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("s", use_threads=False).aggregate(
                [("nd", "sum"), ("bad", "sum")]
            )
            ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
            nd[ss] = g["nd_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            bad[ss] = g["bad_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "source": srcs,
                "n_docs": pa.array(nd),
                "n_mismatched": pa.array(bad),
            }
        )

    partials = _docs(sf_dir, ["source", "text", "n_chars"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def prep_attrition(
    sf_dir: str,
    threshold_permille: int = 200,
    clusters: Dataset | None = None,
) -> Dataset:
    """T90: corpus-prep attrition matrix — per source: docs, docs the
    near-dedup decision DROPS (non-winner T20 cluster members), docs the
    fused T29 quality filter REJECTS, docs hit by BOTH, and docs a
    T33-style prep keeps — the loss-accounting 2x2 a pipeline owner
    reads before signing off a corpus build ("how much unique good text
    is dedup deleting, how much duplicate junk is quality already
    catching").  One dense row per source ALWAYS (zero-valued where the
    corpus is clean — sf<0.1 has no real dup groups).  Exact int64
    (dedup recursive-CTE loser set x quality CTE crossed in one GROUP
    BY oracle).

    Scale shape — near_dedup_keep's hash-partitioned membership join
    with TWO mark streams riding one exchange: cluster-loser marks
    (bounded by T20's machinery, shared via the dup_clusters session
    cache) and quality-pass ids (T29's one streaming text pass) union
    with the narrow (doc_id, source) corpus under one role-tagged
    schema; each doc_id partition settles both memberships with two
    vectorized searchsorted probes and reduces straight to per-source
    counter partials — neither mark set ever broadcasts."""
    from ..stages.shuffle import hash_partition_merge

    if clusters is None:
        clusters = dup_clusters(sf_dir, threshold_permille=threshold_permille)
    qpass = quality_filter(sf_dir)

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def corpus(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "s": pc.cast(
                    pc.index_in(b["source"], value_set=srcs), pa.int64()
                ),
                "role": pa.array(np.zeros(b.num_rows, np.int8)),
            }
        )

    def losers(b: pa.Table) -> pa.Table:
        t = b.filter(pc.not_equal(b["doc_id"], b["cluster_id"]))
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "s": pa.array(np.full(t.num_rows, -1, np.int64)),
                "role": pa.array(np.ones(t.num_rows, np.int8)),
            }
        )

    def passed(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "s": pa.array(np.full(b.num_rows, -1, np.int64)),
                "role": pa.array(np.full(b.num_rows, 2, np.int8)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "s": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "dup": pa.array([], pa.int64()),
                    "qf": pa.array([], pa.int64()),
                    "both": pa.array([], pa.int64()),
                }
            )
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        sarr = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        lose = np.unique(ids[role == 1])
        qok = np.unique(ids[role == 2])
        rows = role == 0
        rid = ids[rows]

        def member(sorted_set: np.ndarray, keys: np.ndarray) -> np.ndarray:
            if len(sorted_set) == 0:
                return np.zeros(len(keys), dtype=bool)
            pos = np.clip(
                np.searchsorted(sorted_set, keys), 0, len(sorted_set) - 1
            )
            return sorted_set[pos] == keys

        is_dup = member(lose, rid)
        is_qf = ~member(qok, rid)
        code = sarr[rows]
        nd = np.bincount(code, minlength=ns).astype(np.int64)
        dup = np.bincount(
            code, weights=is_dup.astype(np.int64), minlength=ns
        ).astype(np.int64)
        qf = np.bincount(
            code, weights=is_qf.astype(np.int64), minlength=ns
        ).astype(np.int64)
        both = np.bincount(
            code, weights=(is_dup & is_qf).astype(np.int64), minlength=ns
        ).astype(np.int64)
        live = np.flatnonzero(nd)
        return pa.table(
            {
                "s": pa.array(live.astype(np.int64)),
                "nd": pa.array(nd[live]),
                "dup": pa.array(dup[live]),
                "qf": pa.array(qf[live]),
                "both": pa.array(both[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nd = np.zeros(ns, np.int64)
        dup = np.zeros(ns, np.int64)
        qf = np.zeros(ns, np.int64)
        both = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("s", use_threads=False).aggregate(
                [("nd", "sum"), ("dup", "sum"), ("qf", "sum"), ("both", "sum")]
            )
            ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
            for dst, col in (
                (nd, "nd_sum"),
                (dup, "dup_sum"),
                (qf, "qf_sum"),
                (both, "both_sum"),
            ):
                dst[ss] = g[col].combine_chunks().to_numpy(
                    zero_copy_only=False
                )
        return pa.table(
            {
                "source": srcs,
                "n_docs": pa.array(nd),
                "n_dup_dropped": pa.array(dup),
                "n_qual_failed": pa.array(qf),
                "n_both": pa.array(both),
                "n_kept": pa.array(nd - dup - qf + both),
            }
        )

    union = (
        _docs(sf_dir, ["doc_id", "source"])
        .map_batches(corpus, batch_format="pyarrow")
        .union(clusters.map_batches(losers, batch_format="pyarrow"))
        .union(qpass.map_batches(passed, batch_format="pyarrow"))
    )
    partials = hash_partition_merge(union, "doc_id", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(partials, "s", merge, k=1)


def dup_token_mass(sf_dir: str) -> Dataset:
    """T91: token-weighted duplication mass — per source: total tokens
    and tokens locked in ECHO docs (non-winner members of exact-dup
    groups, winner = min doc_id corpus-wide, T61/T69's first-publisher
    rule) — T47's doc-count balance sheet re-weighted by what dedup
    actually saves a TRAINING run: tokens, not documents (one 100k-token
    boilerplate dup outweighs a thousand tweet dups).  One dense row per
    source ALWAYS (zero echo mass when the corpus is dup-free, so the
    oracle is non-vacuous at every sf).  Engine groups by a 64-bit
    content hash, the oracle by the text itself (T1/T4 collision
    convention); identical text ⇒ identical token count, so each
    (hash, source) cell carries ONE per-doc token count.

    Scale shape — T47's content-hash exchange with token weights
    riding: per batch one polars hash pass + one Arrow group_by reduce
    docs to (hash, source, n, tok_per_doc, min_doc) cells — text never
    shuffles; the content-hash partition holds each group whole, so the
    corpus count, global winner and its source are decided locally and
    fold IN PLACE to per-source (n_tokens, n_echo_tokens) partials;
    k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        hs = (
            pl.from_arrow(batch.select(["text"]))["text"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        tok = (
            pc.list_value_length(pc.split_pattern(batch["text"], " "))
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        code = (
            pc.cast(pc.index_in(batch["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "text_hash": pa.array(hs, pa.int64()),
                "s": pa.array(code),
                "n": pa.array(np.ones(len(hs), np.int64)),
                "tok": pa.array(tok),
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            }
        )
        g = t.group_by(["text_hash", "s"], use_threads=False).aggregate(
            [("n", "sum"), ("tok", "min"), ("doc_id", "min")]
        )
        return g.rename_columns(["text_hash", "s", "n", "tok", "min_doc"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "s": pa.array([], pa.int64()),
                    "nt": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["text_hash", "s"], use_threads=False).aggregate(
            [("n", "sum"), ("tok", "min"), ("min_doc", "min")]
        )
        h = g["text_hash"].combine_chunks().to_numpy(zero_copy_only=False)
        s = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        tok = g["tok_min"].combine_chunks().to_numpy(zero_copy_only=False)
        md = g["min_doc_min"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((md, h))
        h2, s2, n2, tok2 = h[order], s[order], n[order], tok[order]
        newg = np.empty(len(order), dtype=bool)
        newg[0] = True
        newg[1:] = h2[1:] != h2[:-1]
        gs = np.flatnonzero(newg)
        gid = np.cumsum(newg) - 1
        gtot = np.add.reduceat(n2, gs)  # corpus docs per content group
        # the winner cell is each group's first row in (hash, min_doc) order
        is_winner_cell = newg
        echo_docs = np.where(
            gtot[gid] > 1, n2 - is_winner_cell.astype(np.int64), 0
        )
        nt = np.zeros(ns, np.int64)
        ne = np.zeros(ns, np.int64)
        np.add.at(nt, s2, n2 * tok2)
        np.add.at(ne, s2, echo_docs * tok2)
        live = np.flatnonzero(nt)
        return pa.table(
            {
                "s": pa.array(live.astype(np.int64)),
                "nt": pa.array(nt[live]),
                "ne": pa.array(ne[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nt = np.zeros(ns, np.int64)
        ne = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("s", use_threads=False).aggregate(
                [("nt", "sum"), ("ne", "sum")]
            )
            ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
            nt[ss] = g["nt_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            ne[ss] = g["ne_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "source": srcs,
                "n_tokens": pa.array(nt),
                "n_echo_tokens": pa.array(ne),
            }
        )

    partials = _docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials, "text_hash", fold, k=_doc_k(sf_dir)
    )
    return hash_partition_merge(cells, "s", merge, k=1)


def eval_exposure(sf_dir: str, eval_max_doc_id: int = 10) -> Dataset:
    """T92: benchmark-exposure board — T19's contamination question
    pointed the OTHER way: per EVAL doc (doc_id < eval_max_doc_id): its
    distinct 3-word shingles, how many of them appear in at least one
    corpus doc (doc_id ≥ eval_max_doc_id), and how many distinct corpus
    docs share at least one — the per-benchmark-item leak report a
    decontamination sign-off actually reads (T19/T57 say which CORPUS
    docs are dirty; T92 says which EVAL items are compromised and how
    widely).  One dense row per eval doc ALWAYS.  Engine compares
    64-bit shingle hashes, the oracle shingle STRINGS (T4/T19
    convention).  Exact int64 (shingle join + count(DISTINCT) oracle).

    Scale shape — T19's broadcast probe with the pair expansion kept
    batch-local: the eval side is benchmark-sized by definition, so its
    (hash, eval_doc) table ships once via ``ray.put``; each corpus
    batch runs one vectorized shingles_flat + two searchsorteds,
    expands only MATCHED (corpus_row, eval_pos) pairs, and reduces to
    ≤ |eval shingles| + |eval docs| partial rows (distinct covered
    slots + per-doc hit counters — corpus docs live in exactly one
    batch, so summing per-batch distinct-doc counts is exact); the k=1
    merge dedupes covered slots, bounded by the eval set."""
    import ray

    from ..stages.shuffle import hash_partition_merge

    eval_tbl = (
        _docs(sf_dir, ["doc_id", "text"])
        .filter(expr=f"doc_id < {eval_max_doc_id}")
        .take_all()
    )
    eval_tbl.sort(key=lambda r: r["doc_id"])
    hasher = ts.WordHasher()
    ev_docs = np.array([r["doc_id"] for r in eval_tbl], np.int64)
    sh_per_doc = [
        np.unique(ts.shingles(r["text"], hasher=hasher)) for r in eval_tbl
    ]
    n_sh = np.array([len(s) for s in sh_per_doc], np.int64)
    if len(sh_per_doc):
        ev_hash = np.concatenate(sh_per_doc)
        ev_doc_of = np.repeat(np.arange(len(ev_docs), dtype=np.int64), n_sh)
        order = np.argsort(ev_hash, kind="stable")
        ev_hash, ev_doc_of = ev_hash[order], ev_doc_of[order]
    else:
        ev_hash = np.empty(0, np.uint64)
        ev_doc_of = np.empty(0, np.int64)
    ev_ref = ray.put((ev_hash, ev_doc_of))

    def probe(batch: pa.Table) -> pa.Table:
        eh, ed = ray.get(ev_ref)
        empty = pa.table(
            {
                "e": pa.array([], pa.int64()),
                "sidx": pa.array([], pa.int64()),
                "dh": pa.array([], pa.int64()),
            }
        )
        if len(eh) == 0 or batch.num_rows == 0:
            return empty
        texts = batch["text"]
        rows, sh = ts.shingles_flat(texts)
        lo = np.searchsorted(eh, sh, side="left")
        hi = np.searchsorted(eh, sh, side="right")
        cnt = hi - lo
        sel = cnt > 0
        if not sel.any():
            return empty
        reps = cnt[sel]
        row_rep = np.repeat(rows[sel], reps)
        total = int(reps.sum())
        start = np.repeat(lo[sel], reps)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        ev_pos = (start + offs).astype(np.int64)
        edoc = ed[ev_pos]
        # distinct covered eval-shingle slots this batch
        slots = np.unique(ev_pos)
        # distinct (eval_doc, corpus_row) pairs -> per-eval-doc hit counts
        packed = edoc * (1 << 32) + row_rep.astype(np.int64)
        pd = np.unique(packed) >> 32
        hd = np.bincount(pd, minlength=len(ev_docs)).astype(np.int64)
        live = np.flatnonzero(hd)
        return pa.table(
            {
                "e": pa.array(
                    np.concatenate([ed[slots], live.astype(np.int64)])
                ),
                "sidx": pa.array(
                    np.concatenate(
                        [slots, np.full(len(live), -1, np.int64)]
                    )
                ),
                "dh": pa.array(
                    np.concatenate([np.zeros(len(slots), np.int64), hd[live]])
                ),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nd = len(ev_docs)
        covered = np.zeros(nd, np.int64)
        hits = np.zeros(nd, np.int64)
        if t.num_rows:
            ee = t["e"].combine_chunks().to_numpy(zero_copy_only=False)
            si = t["sidx"].combine_chunks().to_numpy(zero_copy_only=False)
            dh = t["dh"].combine_chunks().to_numpy(zero_copy_only=False)
            cov_rows = si >= 0
            if cov_rows.any():
                slots = np.unique(si[cov_rows])
                cov_doc = ev_doc_of[slots]
                covered += np.bincount(cov_doc, minlength=nd).astype(np.int64)
            np.add.at(hits, ee[~cov_rows], dh[~cov_rows])
        return pa.table(
            {
                "eval_doc_id": pa.array(ev_docs),
                "n_shingles": pa.array(n_sh),
                "n_shingles_covered": pa.array(covered),
                "n_docs_hit": pa.array(hits),
            }
        )

    corpus = _docs(sf_dir, ["doc_id", "text"]).filter(
        expr=f"doc_id >= {eval_max_doc_id}"
    )
    partials = corpus.map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "e", merge, k=1)


def case_stats(sf_dir: str) -> Dataset:
    """T93: per-source token-casing composition — total whitespace
    tokens, capitalized tokens (first char in A–Z), and ALL-CAPS tokens
    (≥1 char in A–Z and none in a–z) — the prose-vs-code/markup/shouting
    fingerprint next to T49's character classes (T49 counts letters,
    T93 how they're cased: headline-heavy sources inflate capitalized
    share, log/constant dumps inflate ALL-CAPS).  Both predicates are
    pure ASCII range/RE2-class checks, so the engine's Arrow kernels
    and DuckDB's regexps agree by construction (no Unicode case tables
    on either side).  Exact int64 (unnest + CASE-sum oracle).

    Scale shape — ZERO wide exchange (T49's profile): one split + three
    vectorized kernels per batch (slice + two RE2 class matches) reduce
    to one partial row per source; k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(batch: pa.Table) -> pa.Table:
        toks_list = pc.split_pattern(batch["text"], " ")
        per_row = pc.list_value_length(toks_list).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        code = (
            pc.cast(pc.index_in(batch["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        flat_code = np.repeat(code, per_row)
        toks = toks_list.combine_chunks().flatten()
        first = pc.utf8_slice_codeunits(toks, 0, 1)
        cap = pc.and_(
            pc.greater_equal(first, "A"), pc.less_equal(first, "Z")
        ).to_numpy(zero_copy_only=False)
        has_up = pc.match_substring_regex(toks, "[A-Z]")
        has_lo = pc.match_substring_regex(toks, "[a-z]")
        allcaps = pc.and_(has_up, pc.invert(has_lo)).to_numpy(
            zero_copy_only=False
        )
        nt = np.bincount(flat_code, minlength=ns).astype(np.int64)
        nc = np.bincount(
            flat_code, weights=cap.astype(np.int64), minlength=ns
        ).astype(np.int64)
        nu = np.bincount(
            flat_code, weights=allcaps.astype(np.int64), minlength=ns
        ).astype(np.int64)
        live = np.flatnonzero(nt)
        return pa.table(
            {
                "s": pa.array(live.astype(np.int64)),
                "nt": pa.array(nt[live]),
                "nc": pa.array(nc[live]),
                "nu": pa.array(nu[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nt = np.zeros(ns, np.int64)
        nc = np.zeros(ns, np.int64)
        nu = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("s", use_threads=False).aggregate(
                [("nt", "sum"), ("nc", "sum"), ("nu", "sum")]
            )
            ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
            for dst, col in ((nt, "nt_sum"), (nc, "nc_sum"), (nu, "nu_sum")):
                dst[ss] = g[col].combine_chunks().to_numpy(
                    zero_copy_only=False
                )
        return pa.table(
            {
                "source": srcs,
                "n_tokens": pa.array(nt),
                "n_cap_tokens": pa.array(nc),
                "n_upper_tokens": pa.array(nu),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def embedding_label_energy(sf_dir: str) -> Dataset:
    """T94: per-label embedding energy stats — for every label: vectors,
    Σ floor(1000·x) over all elements (net drift from the origin) and
    Σ floor(1000·x)² (energy) — the exact-int64 sufficient statistics of
    per-cluster spread read next to T82's join audit and the T8b
    cluster-balance board (a label whose energy per vector dwarfs the
    rest is a garbage bucket, not a cluster).  Element-wise floor BEFORE
    every sum (T78's convention), so numpy and DuckDB agree bit-exactly.
    Exact int64 (list_transform BIGINT + list_sum oracle — integer
    addition is order-free, unlike the float sums T78's docstring
    warns about).

    Scale shape — ZERO wide exchange: vectors reshape (n, d) per batch,
    one float64 scale + floor pass reduces to one partial row per label
    (≤ labels × batches rows total); k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sq": pa.array([], pa.int64()),
                    "sqq": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)
        )
        q = np.floor(1000.0 * m).astype(np.int64)
        row_sq = q.sum(axis=1)
        row_sqq = (q * q).sum(axis=1)
        lab = (
            pc.cast(batch["label"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        u, inv = np.unique(lab, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
        sq = np.zeros(len(u), np.int64)
        sqq = np.zeros(len(u), np.int64)
        np.add.at(sq, inv, row_sq)
        np.add.at(sqq, inv, row_sqq)
        return pa.table(
            {
                "label": pa.array(u, pa.int64()),
                "n": pa.array(cnt),
                "sq": pa.array(sq),
                "sqq": pa.array(sqq),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "n_vecs": pa.array([], pa.int64()),
                    "sum_q": pa.array([], pa.int64()),
                    "sum_qq": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("label", use_threads=False).aggregate(
            [("n", "sum"), ("sq", "sum"), ("sqq", "sum")]
        )
        return pa.table(
            {
                "label": pc.cast(g["label"], pa.int64()),
                "n_vecs": pc.cast(g["n_sum"], pa.int64()),
                "sum_q": pc.cast(g["sq_sum"], pa.int64()),
                "sum_qq": pc.cast(g["sqq_sum"], pa.int64()),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "label", merge, k=1)


def shingle_df_spectrum(sf_dir: str, k_shingle: int = 3) -> Dataset:
    """T95: shingle document-frequency spectrum — for every document
    frequency df: how many DISTINCT 3-word shingles appear in exactly df
    documents — T45's word-frequency spectrum moved to the dedup unit
    (T4/T20 key on shingles, so this curve IS the pair-generation
    capacity forecast: mass at df ≥ 2 drives candidate-pair counts, the
    tail at high df is the boilerplate T4's df_cap clips).  Engine
    counts 64-bit shingle hashes, the oracle shingle STRINGS (T1/T4
    collision convention).  Exact int64 (two-level GROUP BY oracle).

    Scale shape — T27's narrow-exchange discipline: one vectorized
    shingles_flat per batch emits distinct (doc, shingle-hash) int64
    rows (text never shuffles); the shingle-hash partition holds every
    occurrence of a shingle, so its exact df settles locally and
    reduces straight to (df, count) partials; k=1 merge sums
    O(distinct df values) rows."""
    from ..stages.shuffle import hash_partition_merge

    def explode(batch: pa.Table) -> pa.Table:
        rows, sh = ts.shingles_flat(batch["text"], k_shingle)
        return pa.table(
            {
                "shingle": pa.array(sh.view(np.int64), pa.int64()),
                "one": pa.array(np.ones(len(sh), np.int8)),
            }
        )

    exploded = _docs(sf_dir, ["text"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "df": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        h = t["shingle"].combine_chunks().to_numpy(zero_copy_only=False)
        _, cnt = np.unique(h, return_counts=True)
        vals, freq = np.unique(cnt, return_counts=True)
        return pa.table(
            {
                "df": pa.array(vals.astype(np.int64)),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    partials = hash_partition_merge(exploded, "shingle", fold, k=_doc_k(sf_dir))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_freq": pa.array([], pa.int64()),
                    "n_shingles": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("df", use_threads=False).aggregate([("n", "sum")])
        return pa.table(
            {
                "doc_freq": pc.cast(g["df"], pa.int64()),
                "n_shingles": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(partials, "df", merge, k=1)


def embedding_grid_occupancy(sf_dir: str, q_dims: int = 4) -> Dataset:
    """T96: quantized-grid occupancy — ONE row: vectors, occupied cells
    of the floor(4·x) grid over the first ``q_dims`` dimensions, and
    the heaviest cell's load — the bucketing-capacity audit run before
    committing to an LSH/IVF layout (T7/T8's buckets only bound work if
    no cell is corpus-sized; a huge max load here predicts a hot
    bucket).  Exact int64 (list-index quantize + two-level GROUP BY
    oracle).

    Scale shape — the E23 exact-distinct discipline on the cell axis:
    per batch one slice + floor + bit-pack reduces vectors to (cell,
    count) partials; the cell-hash partition decides each cell's exact
    total and reduces to (vecs, cells, max) triples; k=1 merge sums and
    maxes O(partitions) rows."""
    from ..stages.shuffle import adaptive_width, hash_partition_merge

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)[:, :q_dims]
        )
        q = np.floor(4.0 * m).astype(np.int64)
        packed = np.zeros(n, np.uint64)
        for d in range(q_dims):
            packed = (packed << np.uint64(16)) | (
                (q[:, d] + (1 << 15)).astype(np.uint64) & np.uint64(0xFFFF)
            )
        vals, cnt = np.unique(packed.view(np.int64), return_counts=True)
        return pa.table(
            {
                "cell": pa.array(vals, pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "nv": pa.array([], pa.int64()),
                    "nc": pa.array([], pa.int64()),
                    "mx": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("cell", use_threads=False).aggregate([("n", "sum")])
        tot = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "nv": pa.array([int(tot.sum())], pa.int64()),
                "nc": pa.array([len(tot)], pa.int64()),
                "mx": pa.array([int(tot.max())], pa.int64()),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials,
        "cell",
        fold,
        k=adaptive_width(f"{sf_dir}/embeddings.parquet", 25_000),
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_vecs": pa.array([0], pa.int64()),
                    "n_cells": pa.array([0], pa.int64()),
                    "max_cell_load": pa.array([0], pa.int64()),
                }
            )
        nv = t["nv"].combine_chunks().to_numpy(zero_copy_only=False)
        nc = t["nc"].combine_chunks().to_numpy(zero_copy_only=False)
        mx = t["mx"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_vecs": pa.array([int(nv.sum())], pa.int64()),
                "n_cells": pa.array([int(nc.sum())], pa.int64()),
                "max_cell_load": pa.array([int(mx.max())], pa.int64()),
            }
        )

    return hash_partition_merge(cells, "g", merge, k=1)


def f1_vocab_novelty_1h(sf_dir: str) -> Dataset:
    """T97/F: hourly vocabulary-novelty curve over the F1 tokenized
    stream — per 1h bucket: DISTINCT token ids seen + token ids whose
    FIRST tape appearance is that bucket — T61's shingle-novelty
    question asked of the flagship payload's id space (a flattening
    new-token curve says the tokenizer's working vocabulary has
    saturated; a late spike says a new domain entered the tape —
    the signal that decides when T24's vocab map must be recut).
    Exact int64 (DISTINCT pair + min-bucket join oracle).

    Scale shape — ONE token-keyed exchange of distinct int64 pairs
    (token lists never reship whole: each batch flattens once and
    np.unique-compacts to its distinct (token, bucket) pairs); the
    token-hash partition holds every bucket a token touches, so its
    exact first bucket settles locally and both counts reduce to
    (bucket, distinct, new) partials; k=1 merge sums O(buckets) rows."""
    import glob

    import ray.data as rd

    from ..stages.shuffle import hash_partition_merge
    from ..timegrid import T0_US

    files = sorted(glob.glob(sf_dir + "/*.parquet"))

    def partial(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            b["doc_id"].combine_chunks(), r"-(?P<seq>[0-9]+)$"
        )
        seq = (
            pc.cast(pc.struct_field(ex, "seq"), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        bucket = seq // 3600
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        packed = flat * (1 << 32) + np.repeat(bucket, nper)
        pairs = np.unique(packed)
        return pa.table(
            {
                "tok": pa.array(pairs >> 32, pa.int64()),
                "b": pa.array(pairs & 0xFFFFFFFF, pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "b": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "nn": pa.array([], pa.int64()),
                }
            )
        tok = t["tok"].combine_chunks().to_numpy(zero_copy_only=False)
        bb = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
        pairs = np.unique(tok * (1 << 32) + bb)
        tk, bk = pairs >> 32, pairs & 0xFFFFFFFF
        head = np.empty(len(pairs), bool)
        head[0] = True
        head[1:] = tk[1:] != tk[:-1]
        nb = int(bk.max()) + 1
        nd = np.bincount(bk, minlength=nb)
        nn = np.bincount(bk[head], minlength=nb)
        live = np.flatnonzero(nd)
        return pa.table(
            {
                "b": pa.array(live.astype(np.int64)),
                "nd": pa.array(nd[live].astype(np.int64)),
                "nn": pa.array(nn[live].astype(np.int64)),
            }
        )

    partials = rd.read_parquet(files, columns=["doc_id", "tokens"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    per_token = hash_partition_merge(partials, "tok", fold, k=_doc_k_files(files))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "bucket_ts": pa.array([], pa.timestamp("us")),
                    "n_distinct_tokens": pa.array([], pa.int64()),
                    "n_new_tokens": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("b", use_threads=False).aggregate(
            [("nd", "sum"), ("nn", "sum")]
        )
        bb = g["b"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket_ts": pa.array(
                    bb * 3_600_000_000 + T0_US, pa.timestamp("us")
                ),
                "n_distinct_tokens": pc.cast(g["nd_sum"], pa.int64()),
                "n_new_tokens": pc.cast(g["nn_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(per_token, "b", merge, k=1)


def quality_length_matrix(sf_dir: str, band_words: int = 10) -> Dataset:
    """T98: quality x length-band bias matrix — per word-count band
    (n_words // band_words): documents + documents passing EVERY fused
    T29 predicate EXCEPT the word-count band itself (tagged English,
    Gopher dup/top caps, stopword floor, not contaminated) — the read
    that separates the length filter's own cut from the length BIAS of
    the other filters (if short docs fail quality disproportionately,
    T29's min_words is partly redundant; if long docs fail, the band cap
    is doing quality's job).  Exact int64 (quality CTE + integer-divide
    band oracle; all permilles floor the same 1000.0 double division).

    Scale shape — T29's ONE streaming text pass verbatim (text read
    once, split once, never shuffled; eval shingles broadcast via
    ray.put): each batch reduces to (band, n_docs, n_ok) partials over a
    ≤ max_words/band_words domain; k=1 merge."""
    import ray

    eval_ref = _eval_shingle_ref(sf_dir, 10)

    def partial(batch: pa.Table) -> pa.Table:
        n_words, dup, topf, stopf, lang_en, hits = _quality_features(
            batch, ray.get(eval_ref)
        )
        ok = (
            lang_en
            & (dup <= 600)
            & (topf <= 130)
            & (stopf >= 20)
            & (hits == 0)
        )
        band = n_words // band_words
        nb = int(band.max()) + 1 if len(band) else 1
        n_docs = np.bincount(band, minlength=nb)
        n_ok = np.bincount(band[ok], minlength=nb)
        live = np.flatnonzero(n_docs)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "nd": pa.array(n_docs[live].astype(np.int64)),
                "nk": pa.array(n_ok[live].astype(np.int64)),
            }
        )

    from ..stages.shuffle import hash_partition_merge

    partials = _docs(sf_dir, ["lang", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "word_band": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_quality_ok": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("band", use_threads=False).aggregate(
            [("nd", "sum"), ("nk", "sum")]
        )
        return pa.table(
            {
                "word_band": pc.cast(g["band"], pa.int64()),
                "n_docs": pc.cast(g["nd_sum"], pa.int64()),
                "n_quality_ok": pc.cast(g["nk_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(partials, "band", merge, k=1)


def embedding_dim_quantiles(
    sf_dir: str, qs: tuple[int, ...] = (500, 900)
) -> Dataset:
    """T99: per-dimension quantized quantiles — per vector dimension
    (1-based, matching generate_subscripts): vector count + discrete
    p50/p90 of floor(1000·x) — the distributional companion to T75's
    min/max profile (min/max says a dimension's RANGE, the quantiles
    say where its mass sits: a dimension whose p50 hugs an extreme is
    saturated/clipped and degrades T5b's hyperplane splits even when
    its range looks healthy).  Exact int64 under the quantile_disc rank
    rule (unnest + generate_subscripts + quantile_disc oracle; the
    element-wise floor keeps both sides in exact int64).

    Scale shape — E22's per-bucket mergeable histogram on the dimension
    axis: the quantized domain is bounded (unit-normalized components ⇒
    ~2001 values), so each batch reduces to (dim, qval, freq) partials
    over a ≤ d × 2001 domain; ONLY histograms shuffle (dim-hash); every
    dimension's quantiles read off one lexsort + cumsum."""
    from ..stages.shuffle import hash_partition_merge

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "f": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)
        )
        q = np.floor(1000.0 * m).astype(np.int64)
        d = m.shape[1]
        dims = np.broadcast_to(np.arange(1, d + 1, dtype=np.int64), (n, d))
        # offset keeps the pack non-negative for np.unique on int64
        packed = dims.ravel() * (1 << 32) + (q.ravel() + (1 << 20))
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "dim": pa.array(vals >> 32, pa.int64()),
                "v": pa.array((vals & 0xFFFFFFFF) - (1 << 20), pa.int64()),
                "f": pa.array(freq.astype(np.int64)),
            }
        )

    names = tuple(f"p{q // 10}_q" for q in qs)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n_vecs": pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in names},
                }
            )
        g = t.group_by(["dim", "v"], use_threads=False).aggregate(
            [("f", "sum")]
        )
        dd = g["dim"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = g["v"].combine_chunks().to_numpy(zero_copy_only=False)
        ff = g["f_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((vv, dd))
        d2, v2, f2 = dd[order], vv[order], ff[order]
        news = np.empty(len(order), dtype=bool)
        news[0] = True
        news[1:] = d2[1:] != d2[:-1]
        starts = np.flatnonzero(news)
        ends = np.append(starts[1:], len(order))
        out = {"dim": [], "n": [], **{c: [] for c in names}}
        for a, b in zip(starts, ends):
            vals, freq = v2[a:b], f2[a:b]
            nt = int(freq.sum())
            cum = np.cumsum(freq)
            out["dim"].append(int(d2[a]))
            out["n"].append(nt)
            for q, c in zip(qs, names):
                thr = (nt * q + 999) // 1000
                out[c].append(int(vals[np.searchsorted(cum, thr)]))
        return pa.table(
            {
                "dim": pa.array(out["dim"], pa.int64()),
                "n_vecs": pa.array(out["n"], pa.int64()),
                **{c: pa.array(out[c], pa.int64()) for c in names},
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "dim", merge, k=1)


def f1_stutter_stats(sf_dir: str) -> Dataset:
    """T100/F: tape stutter board — per source: sequences, adjacent
    token pairs (Σ(n_tok − 1)), STUTTERED pairs (adjacent equal ids),
    and sequences containing at least one stutter — T12's word-stutter
    question asked of the flagship's tokenized payload (an id repeated
    back-to-back is the classic degenerate-generation / encoder-bug
    artifact, invisible to T80's whole-sequence dedup and to n_tok
    rollups).  Exact int64 (list_transform adjacent-compare oracle).

    Scale shape — ZERO wide exchange (T67's profile): one flatten +
    one shifted same-parent compare per batch reduces the token stream
    to one (source, seqs, pairs, stutters, hit-seqs) partial row per
    source; token lists never shuffle; k=1 merge."""
    import glob

    import ray.data as rd

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n = len(toks)
        nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        same = (
            (flat[1:] == flat[:-1]) & (parent[1:] == parent[:-1])
            if len(flat)
            else np.zeros(0, bool)
        )
        st_per_seq = np.bincount(
            parent[1:][same], minlength=n
        ).astype(np.int64)
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ns = len(srcs)
        return pa.table(
            {
                "src": pa.array(np.arange(ns, dtype=np.int64)),
                "seqs": pa.array(np.bincount(code, minlength=ns).astype(np.int64)),
                "pairs": pa.array(
                    np.bincount(
                        code, weights=np.maximum(nper - 1, 0), minlength=ns
                    ).astype(np.int64)
                ),
                "st": pa.array(
                    np.bincount(code, weights=st_per_seq, minlength=ns).astype(
                        np.int64
                    )
                ),
                "hit": pa.array(
                    np.bincount(
                        code[st_per_seq > 0], minlength=ns
                    ).astype(np.int64)
                ),
            }
        )

    partials = rd.read_parquet(files, columns=["source", "tokens"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_seqs": pa.array([], pa.int64()),
                    "n_adj_pairs": pa.array([], pa.int64()),
                    "n_stutter_pairs": pa.array([], pa.int64()),
                    "n_stutter_seqs": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("src", use_threads=False).aggregate(
            [("seqs", "sum"), ("pairs", "sum"), ("st", "sum"), ("hit", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["src"].combine_chunks()),
                "n_seqs": pc.cast(g["seqs_sum"], pa.int64()),
                "n_adj_pairs": pc.cast(g["pairs_sum"], pa.int64()),
                "n_stutter_pairs": pc.cast(g["st_sum"], pa.int64()),
                "n_stutter_seqs": pc.cast(g["hit_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(partials, "src", merge, k=1)


def embedding_cell_purity(sf_dir: str, scale: int = 2) -> Dataset:
    """T101: grid-cell label purity — per occupied cell of the
    floor(2·x) grid over the first two dimensions: vectors, DISTINCT
    labels, and the majority label's count — the partition-purity audit
    behind T8's IVF routing (T96 says whether any cell is overloaded;
    T101 says whether cells mean anything: a cell whose majority share
    is low mixes labels, so routing by it buys recall nothing).  Exact
    int64 (list-index quantize + two-level GROUP BY + max oracle).

    Scale shape — E85's settle-in-partition discipline: per batch one
    slice + floor + bit-pack reduces vectors to (cell, label, n)
    partials; the cell-hash partition holds every label count of a cell,
    so vectors, distinct labels and the majority all settle locally and
    final rows LEAVE the partition directly (cells partition the
    output; no k=1 funnel)."""
    from ..stages.shuffle import adaptive_width, hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    OFF = 1 << 10

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "lab": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)[:, :2]
        )
        q = np.floor(scale * m).astype(np.int64) + OFF
        cell = q[:, 0] * (2 * OFF) + q[:, 1]
        lab = (
            pc.cast(batch["label"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = cell * (1 << 24) + lab
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(vals >> 24, pa.int64()),
                "lab": pa.array(vals & 0xFFFFFF, pa.int64()),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cell_x": pa.array([], pa.int64()),
                    "cell_y": pa.array([], pa.int64()),
                    "n_vecs": pa.array([], pa.int64()),
                    "n_labels": pa.array([], pa.int64()),
                    "n_majority": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["cell", "lab"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        cc = g["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(cc, kind="stable")
        c2, n2 = cc[order], nn[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = c2[1:] != c2[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(order))
        vecs = np.add.reduceat(n2, starts)
        labels = ends - starts
        maj = np.maximum.reduceat(n2, starts)
        cells = c2[starts]
        return pa.table(
            {
                "cell_x": pa.array(cells // (2 * OFF) - OFF, pa.int64()),
                "cell_y": pa.array(cells % (2 * OFF) - OFF, pa.int64()),
                "n_vecs": pa.array(vecs.astype(np.int64)),
                "n_labels": pa.array(labels.astype(np.int64)),
                "n_majority": pa.array(maj.astype(np.int64)),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(
        partials,
        "cell",
        fold,
        k=adaptive_width(f"{sf_dir}/embeddings.parquet", 25_000),
    )


def pair_budget(sf_dir: str, k_shingle: int = 3) -> Dataset:
    """T102: candidate-pair budget — ONE row: distinct shingles, total
    (doc, shingle) postings, and Σ df·(df−1)/2 — the EXACT number of
    candidate pairs a shingle-keyed join (T4) would generate with no
    df_cap — T95's spectrum collapsed to its second moment: the one
    number that says whether the pair stage fits the cluster budget
    before anyone launches it (and how much mass a given df_cap clips).
    Engine counts 64-bit shingle hashes, oracle shingle strings (T1/T4
    collision convention).  Exact int64 (two-level GROUP BY + arithmetic
    oracle); the pair sum's int64 bound (df ≲ 4·10⁹ per shingle)
    documents itself — a corpus past it has no runnable pair stage.

    Scale shape — T95's token-keyed exchange verbatim with a scalar
    fold: distinct (doc, shingle-hash) pairs per batch, each shingle's
    exact df settles in its hash partition and reduces IN PLACE to one
    (shingles, postings, pairs) triple per partition; k=1 merge sums
    O(partitions) rows."""
    from ..stages.shuffle import hash_partition_merge

    def explode(batch: pa.Table) -> pa.Table:
        rows, sh = ts.shingles_flat(batch["text"], k_shingle)
        return pa.table(
            {"shingle": pa.array(sh.view(np.int64), pa.int64())}
        )

    exploded = _docs(sf_dir, ["text"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "ns": pa.array([], pa.int64()),
                    "no": pa.array([], pa.int64()),
                    "np_": pa.array([], pa.int64()),
                }
            )
        h = t["shingle"].combine_chunks().to_numpy(zero_copy_only=False)
        _, df = np.unique(h, return_counts=True)
        df = df.astype(np.int64)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "ns": pa.array([len(df)], pa.int64()),
                "no": pa.array([int(df.sum())], pa.int64()),
                "np_": pa.array([int((df * (df - 1) // 2).sum())], pa.int64()),
            }
        )

    per_shingle = hash_partition_merge(
        exploded, "shingle", fold, k=_doc_k(sf_dir)
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_shingles": pa.array([0], pa.int64()),
                    "n_postings": pa.array([0], pa.int64()),
                    "n_candidate_pairs": pa.array([0], pa.int64()),
                }
            )
        ns_ = t["ns"].combine_chunks().to_numpy(zero_copy_only=False)
        no = t["no"].combine_chunks().to_numpy(zero_copy_only=False)
        np2 = t["np_"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_shingles": pa.array([int(ns_.sum())], pa.int64()),
                "n_postings": pa.array([int(no.sum())], pa.int64()),
                "n_candidate_pairs": pa.array([int(np2.sum())], pa.int64()),
            }
        )

    return hash_partition_merge(per_shingle, "g", merge, k=1)


def embedding_dup_vectors(sf_dir: str) -> Dataset:
    """T103: exact-duplicate vector board — per label: vectors, DISTINCT
    embeddings (bitwise), echo copies (vecs − distinct) — T80's
    sequence-level dedup asked of the embedding table (bit-identical
    vectors are copy-paste augmentation or a re-embedded shard, and they
    silently bias every centroid and every T6 neighbor list).  One dense
    row per label ALWAYS (zero echoes on a clean table — the dup-board
    convention).  Engine hashes vector bytes (vectorized column-mix
    hash, the T69 collision convention); oracle counts DISTINCT on the
    list column directly.  Exact int64 (count(DISTINCT embedding)
    oracle).

    Scale shape — T80's dedupe + counter-stream exchange with the key
    built from the PAYLOAD BYTES: per batch one (n, d) reshape + one
    odd-constant column mix → distinct (hash, label) pairs + per-label
    raw counters ride ONE hash exchange (vectors never shuffle — only
    8-byte hashes); partitions re-dedupe exactly and reduce to
    per-label (raw, uniq) partials; k=1 densifying merge."""
    from ..stages.shuffle import adaptive_width, hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    "lab": pa.array([], pa.int64()),
                    "raw": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .view(np.uint32)
            .astype(np.uint64)
            .reshape(n, -1)
        )
        # multiply-rotate column mix: deterministic, vectorized over rows
        h = np.full(n, 0x9E3779B97F4A7C15, np.uint64)
        MUL = np.uint64(0xBF58476D1CE4E5B9)
        for j in range(m.shape[1]):
            h = (h ^ (m[:, j] * MUL)) * MUL
            h ^= h >> np.uint64(31)
        lab = (
            pc.cast(batch["label"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        # fold the label into the hash so the full 64 bits carry the
        # (vector, label) identity; the label column rides alongside
        h = (h ^ (lab.astype(np.uint64) * MUL)) * MUL
        h ^= h >> np.uint64(31)
        hi = h.view(np.int64)
        uh, uidx = np.unique(hi, return_index=True)
        raw = np.bincount(lab, minlength=int(lab.max()) + 1)
        live = np.flatnonzero(raw)
        dedup = pa.table(
            {
                "h": pa.array(uh, pa.int64()),
                "lab": pa.array(lab[uidx], pa.int64()),
                "raw": pa.array(np.zeros(len(uh), np.int64)),
            }
        )
        counters = pa.table(
            {
                "h": pa.array(-1 - live.astype(np.int64)),  # negative keys
                "lab": pa.array(live.astype(np.int64)),
                "raw": pa.array(raw[live].astype(np.int64)),
            }
        )
        return pa.concat_tables([dedup, counters])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "lab": pa.array([], pa.int64()),
                    "raw": pa.array([], pa.int64()),
                    "uniq": pa.array([], pa.int64()),
                }
            )
        hh = t["h"].combine_chunks().to_numpy(zero_copy_only=False)
        lab = t["lab"].combine_chunks().to_numpy(zero_copy_only=False)
        raw = t["raw"].combine_chunks().to_numpy(zero_copy_only=False)
        is_pair = raw == 0
        _, uidx = np.unique(hh[is_pair], return_index=True)
        ulab = lab[is_pair][uidx]
        out = pa.table(
            {
                "lab2": pa.array(
                    np.concatenate([ulab, lab[~is_pair]]), pa.int64()
                ),
                "raw2": pa.array(
                    np.concatenate(
                        [np.zeros(len(ulab), np.int64), raw[~is_pair]]
                    )
                ),
                "uniq2": pa.array(
                    np.concatenate(
                        [
                            np.ones(len(ulab), np.int64),
                            np.zeros(int((~is_pair).sum()), np.int64),
                        ]
                    )
                ),
            }
        )
        g = out.group_by("lab2", use_threads=False).aggregate(
            [("raw2", "sum"), ("uniq2", "sum")]
        )
        return g.rename_columns(["lab", "raw", "uniq"])

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    per_hash = hash_partition_merge(
        partials,
        "h",
        fold,
        k=adaptive_width(f"{sf_dir}/embeddings.parquet", 25_000),
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "n_vecs": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "n_echo": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("lab", use_threads=False).aggregate(
            [("raw", "sum"), ("uniq", "sum")]
        )
        raw = g["raw_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        uq = g["uniq_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "label": pc.cast(g["lab"], pa.int64()),
                "n_vecs": pa.array(raw.astype(np.int64)),
                "n_distinct": pa.array(uq.astype(np.int64)),
                "n_echo": pa.array((raw - uq).astype(np.int64)),
            }
        )

    return hash_partition_merge(per_hash, "lab", merge, k=1)


def f1_cross_source_dups(sf_dir: str) -> Dataset:
    """T104/F: cross-source duplicate-sequence matrix — for every source
    pair, DISTINCT token arrays BOTH emit, plus exact Jaccard permille —
    T60's syndication matrix asked of the flagship's tokenized payload
    (T80 counts echoes within a source; T104 says which PAIRS of tapes
    carry the same sequences — the dedup-routing read before merging two
    ingest feeds).  Pairs ordered source_a < source_b (string order),
    zero-overlap pairs absent — the SQL self-join's shape.  Engine
    hashes token arrays (polars 64-bit list hash, the T69/T80 collision
    convention); oracle intersects DISTINCT list values directly.
    Exact int64 (DISTINCT-list self-join oracle).

    Scale shape — T60's pair machinery verbatim with the key built from
    the PAYLOAD: one polars list-hash per batch (token arrays never
    shuffle — only 8-byte hashes), distinct (hash, source-rank) rows
    ride ONE hash exchange; each hash partition holds every source that
    emits a sequence, so pair counts fan out bounded by C(sources, 2),
    never corpus size; tiny partials fold in one k=1 task."""
    import glob

    import ray.data as rd

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    n_src = len(srcs)

    def explode(b: pa.Table) -> pa.Table:
        import polars as pl

        h = (
            pl.from_arrow(b.select(["tokens"]))["tokens"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((code, h))
        hs, ss = h[order], code[order]
        keep = np.empty(len(order), dtype=bool)
        if len(order):
            keep[0] = True
            keep[1:] = (hs[1:] != hs[:-1]) | (ss[1:] != ss[:-1])
        return pa.table(
            {
                "h": pa.array(hs[keep], pa.int64()),
                "src": pa.array(ss[keep], pa.int64()),
            }
        )

    def fold_by_hash(t: pa.Table) -> pa.Table:
        h = t["h"].combine_chunks().to_numpy(zero_copy_only=False)
        s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((s, h))
        hs, ss = h[order], s[order]
        keep = np.empty(len(order), dtype=bool)
        if len(order):
            keep[0] = True
            keep[1:] = (hs[1:] != hs[:-1]) | (ss[1:] != ss[:-1])
        hs, ss = hs[keep], ss[keep]
        tot = np.bincount(ss, minlength=n_src).astype(np.int64)
        out_a = [np.arange(n_src, dtype=np.int64)]
        out_b = [np.full(n_src, -1, dtype=np.int64)]
        out_n = [tot]
        newg = np.empty(len(hs), dtype=bool)
        if len(hs):
            newg[0] = True
            newg[1:] = hs[1:] != hs[:-1]
            starts = np.flatnonzero(newg)
            sizes = np.diff(np.append(starts, len(hs)))
            pair_counts = np.zeros((n_src, n_src), dtype=np.int64)
            for m in np.unique(sizes):
                if m < 2:
                    continue
                mat = ss[
                    (starts[sizes == m][:, None] + np.arange(m)[None, :])
                ]
                for i in range(int(m) - 1):
                    for j in range(i + 1, int(m)):
                        np.add.at(pair_counts, (mat[:, i], mat[:, j]), 1)
            pa_, pb_ = np.nonzero(pair_counts)
            out_a.append(pa_.astype(np.int64))
            out_b.append(pb_.astype(np.int64))
            out_n.append(pair_counts[pa_, pb_])
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a)),
                "b": pa.array(np.concatenate(out_b)),
                "n": pa.array(np.concatenate(out_n)),
            }
        )

    exploded = rd.read_parquet(files, columns=["source", "tokens"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = hash_partition_merge(
        exploded, "h", fold_by_hash, k=_doc_k_files(files)
    )

    def final(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        tot = np.zeros(n_src, dtype=np.int64)
        is_tot = b < 0
        np.add.at(tot, a[is_tot], n[is_tot])
        pair_counts = np.zeros((n_src, n_src), dtype=np.int64)
        np.add.at(pair_counts, (a[~is_tot], b[~is_tot]), n[~is_tot])
        pa_, pb_ = np.nonzero(pair_counts)
        c = pair_counts[pa_, pb_]
        na, nb = tot[pa_], tot[pb_]
        return pa.table(
            {
                "source_a": pc.take(srcs, pa.array(pa_, pa.int64())),
                "source_b": pc.take(srcs, pa.array(pb_, pa.int64())),
                "n_a": pa.array(na, pa.int64()),
                "n_b": pa.array(nb, pa.int64()),
                "n_common": pa.array(c, pa.int64()),
                "jaccard_permille": pa.array(
                    1000 * c // (na + nb - c), pa.int64()
                ),
            }
        )

    return hash_partition_merge(partials, "a", final, k=1)


def cluster_size_hist(
    sf_dir: str, threshold_permille: int = 200
) -> Dataset:
    """T105: near-dup cluster-size histogram — for every cluster size s:
    clusters of exactly s documents and the docs they hold, INCLUDING
    the size-1 row (documents in no near-dup pair), so the board always
    partitions the whole corpus — T42's exact-dup size histogram asked
    of T20's TRANSITIVE clusters (pair-level T83 says how near the dups
    are; T105 says how big the connected groups grow — the number that
    predicts what fraction of the corpus one `keep min(doc_id)` sweep
    deletes, and the skew read for the propagation loop itself).  Dense
    by construction (the size-1 row exists at every sf — the dup-board
    convention).  Exact int64 (the T20 recursive-CTE oracle re-grouped
    by cluster size).

    Scale shape — pure composition: T20's session-cached labels do ALL
    the work; ONE cluster-id hash exchange settles each cluster's exact
    size (labels for a cluster may span label partitions), reduces to
    (size, n_clusters) partials, and the k=1 merge injects the
    singleton row from the corpus row count (parquet footer metadata —
    no data scan)."""
    from ..stages.shuffle import hash_partition_merge

    total_docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).count()
    labels = dup_clusters(sf_dir, threshold_permille=threshold_permille)

    def key_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "cid": pc.cast(b["cluster_id"], pa.int64()),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by("cid", use_threads=False).aggregate([("n", "sum")])
        return g.rename_columns(["cid", "n"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "sz": pa.array([], pa.int64()),
                    "nc": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("cid", use_threads=False).aggregate([("n", "sum")])
        sz = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        vals, freq = np.unique(sz, return_counts=True)
        return pa.table(
            {
                "sz": pa.array(vals.astype(np.int64)),
                "nc": pa.array(freq.astype(np.int64)),
            }
        )

    # zero-count seed row keeps the exchange + k=1 merge firing when the
    # corpus has no near-dup pairs at all (E74's empty-corpus convention)
    seed = rd.from_arrow(
        pa.table(
            {"cid": pa.array([-1], pa.int64()), "n": pa.array([0], pa.int64())}
        )
    )
    partials = labels.map_batches(key_partial, batch_format="pyarrow").union(
        seed
    )
    per_size = hash_partition_merge(partials, "cid", fold, k=_doc_k(sf_dir))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            sz = np.array([], np.int64)
            nc = np.array([], np.int64)
        else:
            g = t.group_by("sz", use_threads=False).aggregate([("nc", "sum")])
            sz = g["sz"].combine_chunks().to_numpy(zero_copy_only=False)
            nc = g["nc_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            live = sz > 0  # drop the seed row's size-0 cluster
            sz, nc = sz[live], nc[live]
        clustered = int((sz * nc).sum()) if len(sz) else 0
        singles = total_docs - clustered
        return pa.table(
            {
                "cluster_size": pa.array(
                    np.concatenate([[1], sz]).astype(np.int64)
                ),
                "n_clusters": pa.array(
                    np.concatenate([[singles], nc]).astype(np.int64)
                ),
                "n_docs": pa.array(
                    np.concatenate([[singles], sz * nc]).astype(np.int64)
                ),
            }
        )

    return hash_partition_merge(per_size, "sz", merge, k=1)


def tokenizer_agreement(sf_dir: str) -> Dataset:
    """T106: tokenizer-agreement board — per source: docs, whitespace
    tokens (T11), BPE-ish tokens (T11b), and Σ|ws − bpe| per doc — the
    tokenizer-choice sensitivity read (T36's fertility says how many
    tokens a tokenizer spends; T106 says how much the BUDGET MOVES if
    the pipeline switches pre-tokenizers — a source with high per-doc
    disagreement is punctuation/number-dense and will re-cost first).
    Both counts are the oracle-checked T11/T11b kernels, so the delta is
    exact by construction; exact int64 (len(str_split) vs
    regexp_extract_all + abs oracle).

    Scale shape — ZERO wide exchange (T67's profile): one split-length
    kernel + one count_substring_regex per batch reduce each batch to
    one partial row per source; k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(batch: pa.Table) -> pa.Table:
        ws = (
            pc.cast(
                pc.list_value_length(pc.split_pattern(batch["text"], " ")),
                pa.int64(),
            )
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        bpe = (
            pc.cast(
                pc.count_substring_regex(batch["text"], BPE_ISH_PATTERN),
                pa.int64(),
            )
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        code = (
            pc.cast(pc.index_in(batch["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        # np.add.at into int64 accumulators (T67's convention) — a
        # weighted bincount runs in float64 and rounds past 2^53
        acc = np.zeros((3, ns), np.int64)
        np.add.at(acc[0], code, ws)
        np.add.at(acc[1], code, bpe)
        np.add.at(acc[2], code, np.abs(ws - bpe))
        return pa.table(
            {
                "src": pa.array(np.arange(ns, dtype=np.int64)),
                "nd": pa.array(np.bincount(code, minlength=ns).astype(np.int64)),
                "ws": pa.array(acc[0]),
                "bpe": pa.array(acc[1]),
                "dev": pa.array(acc[2]),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": srcs,
                    "n_docs": pa.array(np.zeros(ns, np.int64)),
                    "n_ws_tokens": pa.array(np.zeros(ns, np.int64)),
                    "n_bpe_tokens": pa.array(np.zeros(ns, np.int64)),
                    "abs_dev": pa.array(np.zeros(ns, np.int64)),
                }
            )
        g = t.group_by("src", use_threads=False).aggregate(
            [("nd", "sum"), ("ws", "sum"), ("bpe", "sum"), ("dev", "sum")]
        )
        cc = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        out = {
            "n_docs": "nd_sum",
            "n_ws_tokens": "ws_sum",
            "n_bpe_tokens": "bpe_sum",
            "abs_dev": "dev_sum",
        }
        cols = {"source": srcs}
        for name, col in out.items():
            v = np.zeros(ns, np.int64)
            v[cc] = g[col].combine_chunks().to_numpy(zero_copy_only=False)
            cols[name] = pa.array(v)
        return pa.table(cols)

    return hash_partition_merge(partials, "src", merge, k=1)


def f1_token_attribution(sf_dir: str) -> Dataset:
    """T107/F: token first-introduction attribution — per source: DISTINCT
    token ids whose FIRST tape appearance (earliest 1h bucket; bucket
    ties → source string ascending) is in that source, plus its total
    distinct tokens — T69's first-publisher question asked of the token
    id space (T97 says WHEN novelty arrives, T107 says WHO brings it —
    the feed that keeps introducing new ids is the one that forces
    T24's vocab recuts).  One dense row per source ALWAYS.  Exact int64
    (row_number over (bucket, source) oracle).

    Scale shape — T97's token-keyed exchange with the source rank
    riding: per batch one flatten + np.unique compaction to distinct
    (token, bucket, source-rank) triples; the token-hash partition holds
    every appearance of a token, so its first (bucket, source) settles
    with one lexsort and both counts reduce to per-source partials;
    k=1 densifying merge."""
    import glob

    import ray.data as rd

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            b["doc_id"].combine_chunks(), r"-(?P<seq>[0-9]+)$"
        )
        seq = (
            pc.cast(pc.struct_field(ex, "seq"), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        bucket = seq // 3600
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        # pack (token, bucket, source): bucket < 2^24, source < 2^8
        packed = (
            flat * (1 << 32)
            + np.repeat(bucket, nper) * (1 << 8)
            + np.repeat(code, nper)
        )
        trip = np.unique(packed)
        return pa.table(
            {
                "tok": pa.array(trip >> 32, pa.int64()),
                "bs": pa.array(trip & 0xFFFFFFFF, pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "intro": pa.array([], pa.int64()),
                    "seen": pa.array([], pa.int64()),
                }
            )
        tok = t["tok"].combine_chunks().to_numpy(zero_copy_only=False)
        bs = t["bs"].combine_chunks().to_numpy(zero_copy_only=False)
        pairs = np.unique(tok * (1 << 32) + bs)
        tk, bs2 = pairs >> 32, pairs & 0xFFFFFFFF
        src = bs2 & 0xFF
        head = np.empty(len(pairs), bool)
        head[0] = True
        head[1:] = tk[1:] != tk[:-1]
        # sorted (tok, bucket, source) -> run head IS the first
        # appearance under the (bucket, source-rank) tie rule
        intro = np.bincount(src[head], minlength=ns)
        # distinct tokens per source: dedupe (tok, src)
        ts_pairs = np.unique(tk * (1 << 8) + src)
        seen = np.bincount(ts_pairs & 0xFF, minlength=ns)
        return pa.table(
            {
                "src": pa.array(np.arange(ns, dtype=np.int64)),
                "intro": pa.array(intro.astype(np.int64)),
                "seen": pa.array(seen.astype(np.int64)),
            }
        )

    partials = rd.read_parquet(
        files, columns=["doc_id", "source", "tokens"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    per_token = hash_partition_merge(
        partials, "tok", fold, k=_doc_k_files(files)
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": srcs,
                    "n_tokens_seen": pa.array(np.zeros(ns, np.int64)),
                    "n_tokens_introduced": pa.array(np.zeros(ns, np.int64)),
                }
            )
        g = t.group_by("src", use_threads=False).aggregate(
            [("intro", "sum"), ("seen", "sum")]
        )
        cc = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        intro = np.zeros(ns, np.int64)
        seen = np.zeros(ns, np.int64)
        intro[cc] = g["intro_sum"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        seen[cc] = g["seen_sum"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "source": srcs,
                "n_tokens_seen": pa.array(seen),
                "n_tokens_introduced": pa.array(intro),
            }
        )

    return hash_partition_merge(per_token, "src", merge, k=1)


def embedding_norm_topk(sf_dir: str, k: int = 10) -> Dataset:
    """T108: norm-extreme vector drill-down — the k vectors with the
    LARGEST integer-quantized squared L2 norm (Σ floor(1000·x²), ties →
    vec_id ascending), with label attached — E59's max-event drill-down
    on the embedding axis (T78's histogram says extreme norms exist;
    T108 names the offending vec_ids so the ingest bug — an
    un-normalized shard, a fp16 overflow — can be traced).  The
    element-wise floor before the sum keeps both sides exact int64
    (T78's convention).  Exact (ORDER BY LIMIT oracle).

    Scale shape — E18's local-top-k discipline: per batch one float64
    square + floor + row-sum, then ONLY the batch's top k rows survive;
    O(batches × k) candidates reach the k=1 rank merge."""
    from ..stages.shuffle import hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                    "norm_q": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)
        )
        q = np.floor(1000.0 * m * m).astype(np.int64).sum(axis=1)
        vid = (
            pc.cast(batch["vec_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        order = np.lexsort((vid, -q))[:k]
        return pa.table(
            {
                "g": pa.array(np.zeros(len(order), np.int64)),
                "vec_id": pa.array(vid[order], pa.int64()),
                "label": pc.cast(batch["label"], pa.int64())
                .combine_chunks()
                .take(pa.array(order, pa.int64())),
                "norm_q": pa.array(q[order], pa.int64()),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                    "norm_q": pa.array([], pa.int64()),
                }
            )
        vid = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
        lab = t["label"].combine_chunks().to_numpy(zero_copy_only=False)
        q = t["norm_q"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, -q))[:k]
        return pa.table(
            {
                "vec_id": pa.array(vid[order], pa.int64()),
                "label": pa.array(lab[order], pa.int64()),
                "norm_q": pa.array(q[order], pa.int64()),
            }
        )

    return hash_partition_merge(partials, "g", merge, k=1)


def embedding_label_overlap(sf_dir: str, scale: int = 2) -> Dataset:
    """T109: label-pair grid overlap — per label pair (a < b): cells of
    the floor(2·x) grid (first two dims) where a appears, where b
    appears, and where BOTH do — the separability read T101's per-cell
    purity aggregates away (two labels can each dominate their own cells
    AND still share most of the grid; high cells_both/min(cells) means
    the pair is inseparable in these dims and any cell-routed ANN will
    confuse them).  Zero-overlap pairs absent (SQL self-join shape).
    Exact int64 (DISTINCT cell-label + self-join oracle).

    Scale shape — T60's pair machinery on the CELL axis: per batch one
    quantize + bit-pack to distinct (cell, label) pairs; the cell-hash
    partition holds every label of a cell so pair fan-out is bounded by
    cells × C(labels, 2) with labels tiny-cardinality; per-label cell
    totals ride the same partials; k=1 fold."""
    from ..stages.shuffle import adaptive_width, hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )
    OFF = 1 << 10

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "lab": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)[:, :2]
        )
        q = np.floor(scale * m).astype(np.int64) + OFF
        cell = q[:, 0] * (2 * OFF) + q[:, 1]
        lab = (
            pc.cast(batch["label"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        pairs = np.unique(cell * (1 << 24) + lab)
        return pa.table(
            {
                "cell": pa.array(pairs >> 24, pa.int64()),
                "lab": pa.array(pairs & 0xFFFFFF, pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        lab = t["lab"].combine_chunks().to_numpy(zero_copy_only=False)
        pairs = np.unique(cell * (1 << 24) + lab)
        cl, lb = pairs >> 24, pairs & 0xFFFFFF
        nl = int(lb.max()) + 1 if len(lb) else 1
        tot_lab, tot_n = np.unique(lb, return_counts=True)
        out_a = [tot_lab.astype(np.int64)]
        out_b = [np.full(len(tot_lab), -1, np.int64)]
        out_n = [tot_n.astype(np.int64)]
        news = np.empty(len(cl), dtype=bool)
        if len(cl):
            news[0] = True
            news[1:] = cl[1:] != cl[:-1]
            starts = np.flatnonzero(news)
            sizes = np.diff(np.append(starts, len(cl)))
            pair_counts = np.zeros((nl, nl), dtype=np.int64)
            for m in np.unique(sizes):
                if m < 2:
                    continue
                mat = lb[
                    (starts[sizes == m][:, None] + np.arange(m)[None, :])
                ]
                for i in range(int(m) - 1):
                    for j in range(i + 1, int(m)):
                        np.add.at(pair_counts, (mat[:, i], mat[:, j]), 1)
            pa_, pb_ = np.nonzero(pair_counts)
            out_a.append(pa_.astype(np.int64))
            out_b.append(pb_.astype(np.int64))
            out_n.append(pair_counts[pa_, pb_])
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a)),
                "b": pa.array(np.concatenate(out_b)),
                "n": pa.array(np.concatenate(out_n)),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    per_cell = hash_partition_merge(
        partials,
        "cell",
        fold,
        k=adaptive_width(f"{sf_dir}/embeddings.parquet", 25_000),
    )

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "label_a": pa.array([], pa.int64()),
                    "label_b": pa.array([], pa.int64()),
                    "cells_a": pa.array([], pa.int64()),
                    "cells_b": pa.array([], pa.int64()),
                    "cells_both": pa.array([], pa.int64()),
                }
            )
        a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        nl = int(a.max()) + 1 if len(a) else 1
        tot = np.zeros(nl, dtype=np.int64)
        is_tot = b < 0
        np.add.at(tot, a[is_tot], n[is_tot])
        pair_counts = np.zeros((nl, nl), dtype=np.int64)
        np.add.at(pair_counts, (a[~is_tot], b[~is_tot]), n[~is_tot])
        pa_, pb_ = np.nonzero(pair_counts)
        c = pair_counts[pa_, pb_]
        return pa.table(
            {
                "label_a": pa.array(pa_.astype(np.int64)),
                "label_b": pa.array(pb_.astype(np.int64)),
                "cells_a": pa.array(tot[pa_], pa.int64()),
                "cells_b": pa.array(tot[pb_], pa.int64()),
                "cells_both": pa.array(c, pa.int64()),
            }
        )

    return hash_partition_merge(per_cell, "a", final, k=1)


def embedding_label_centroid(sf_dir: str) -> Dataset:
    """T110: per-label centroid sufficient statistics — for every
    (label, dimension) pair (dims 1-based, matching generate_subscripts):
    the label's vector count and Σ floor(1000·x) over that component —
    the exact-int64 sufficient statistics of the per-label centroid
    (divide off-line), the table every centroid-routed ANN / k-means
    seeding / class-drift monitor starts from (T75 profiles dimensions
    GLOBALLY; T101 scores cells; T110 is the per-CLASS mean vector that
    tells you which labels sit on top of each other before T109's
    overlap even runs).  Element-wise floor BEFORE the sum (T78's
    convention) keeps both sides in exact int64: floor is order-free,
    unlike a float Σ whose value depends on reduction order.  One dense
    row per (label, dim) ALWAYS over the observed label domain.  Exact
    int64 (unnest + generate_subscripts + SUM(floor) oracle).

    Scale shape — ZERO wide exchange (T67's profile): vectors reshape
    (n, d) per batch with one flatten (the list child is contiguous),
    floor(1000·x) lands in int64, and ONE np.add.at scatter per batch
    folds rows into a (labels, d) accumulator — labels × d partial rows
    per batch regardless of corpus size; the k=1 merge sums
    O(batches × labels × d) rows with one group_by and densifies.

    Reference parity: per-queue running aggregates in the metrics plane
    (internal/metrics/metrics.go:95-183), lifted to a per-class vector
    mean."""
    from ..stages.shuffle import hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "lab": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                    "nv": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)
        )
        d = m.shape[1]
        milli = np.floor(1000.0 * m).astype(np.int64)
        lab = (
            pc.cast(batch["label"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        nl = int(lab.max()) + 1
        acc = np.zeros((nl, d), np.int64)
        np.add.at(acc, lab, milli)
        cnt = np.bincount(lab, minlength=nl).astype(np.int64)
        live = np.flatnonzero(cnt)
        return pa.table(
            {
                "lab": pa.array(np.repeat(live, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(1, d + 1), len(live))),
                "s": pa.array(acc[live].ravel()),
                "nv": pa.array(np.repeat(cnt[live], d)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "n_vecs": pa.array([], pa.int64()),
                    "sum_milli": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["lab", "dim"], use_threads=False).aggregate(
            [("s", "sum"), ("nv", "sum")]
        )
        lab = g["lab"].combine_chunks().to_numpy(zero_copy_only=False)
        dim = g["dim"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((dim, lab))
        return pa.table(
            {
                "label": pa.array(lab[order], pa.int64()),
                "dim": pa.array(dim[order], pa.int64()),
                "n_vecs": pc.take(
                    pc.cast(g["nv_sum"], pa.int64()), pa.array(order)
                ),
                "sum_milli": pc.take(
                    pc.cast(g["s_sum"], pa.int64()), pa.array(order)
                ),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "lab", merge, k=1)


def embedding_argmax_router(sf_dir: str) -> Dataset:
    """T111: argmax-dimension routing board — for every (label, dim)
    pair where dim is some vector's ARGMAX component (first max on
    ties, matching min(dim) in SQL; dims 1-based): how many of the
    label's vectors peak there, and Σ floor(1000·peak) over them — the
    dominant-feature read T110's centroid averages away (a label whose
    mass routes through ONE dimension is separable by a single-axis
    router; a label spread across many peak dims is not — the table a
    max-heap router / feature-gating layer is sized from).  Zero-count
    cells absent (SQL GROUP BY shape — the argmax map is a partition,
    so every label still contributes ≥1 row; never vacuous).  Exact
    int64: the peak VALUE floors element-wise before summing (T78's
    convention), and the argmax itself is an exact float comparison —
    both sides see the identical float32 values (unnest +
    generate_subscripts + min(dim)-at-max + SUM(floor) oracle).

    Scale shape — ZERO wide exchange (T110's profile): vectors reshape
    (n, d) per batch with one contiguous flatten, one np.argmax row
    reduction picks each vector's peak, and one np.unique over packed
    (label, dim) keys + np.add.at folds the batch to ≤ labels × d
    partial rows regardless of corpus size; the k=1 merge sums
    O(batches × labels × d) rows with one group_by.

    Reference parity: per-queue max-latency gauge selection in the
    metrics plane (internal/metrics/metrics.go:95-183), lifted to a
    per-class peak-component distribution."""
    from ..stages.shuffle import hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "lab": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "nv": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        m = e.flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
        am = np.argmax(m, axis=1)  # first max == SQL min(dim) tie rule
        peak = m[np.arange(n), am].astype(np.float64)
        milli = np.floor(1000.0 * peak).astype(np.int64)
        lab = (
            pc.cast(batch["label"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = lab * (1 << 32) + (am.astype(np.int64) + 1)
        keys, inv, cnt = np.unique(
            packed, return_inverse=True, return_counts=True
        )
        s = np.zeros(len(keys), np.int64)
        np.add.at(s, inv, milli)
        return pa.table(
            {
                "lab": pa.array((keys >> 32).astype(np.int64)),
                "dim": pa.array((keys & ((1 << 32) - 1)).astype(np.int64)),
                "nv": pa.array(cnt.astype(np.int64)),
                "s": pa.array(s),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "n_vecs": pa.array([], pa.int64()),
                    "peak_milli": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["lab", "dim"], use_threads=False).aggregate(
            [("nv", "sum"), ("s", "sum")]
        )
        lab = g["lab"].combine_chunks().to_numpy(zero_copy_only=False)
        dim = g["dim"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((dim, lab))
        tk = pa.array(order)
        return pa.table(
            {
                "label": pa.array(lab[order], pa.int64()),
                "dim": pa.array(dim[order], pa.int64()),
                "n_vecs": pc.take(pc.cast(g["nv_sum"], pa.int64()), tk),
                "peak_milli": pc.take(pc.cast(g["s_sum"], pa.int64()), tk),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "lab", merge, k=1)


def opener_board(sf_dir: str) -> Dataset:
    """T112: boilerplate-opener board — per source: docs, DISTINCT
    opening words (a doc's first whitespace-delimited token), and the
    MODAL opener with its doc count (ties -> lexicographically smallest
    word) — the template detector the dup suite can't see (T1 needs
    byte-identical TEXTS, T27 repeated n-grams WITHIN a doc; a crawler
    that prefixes every page with the same banner word shows up only in
    the opener distribution — top_count/n_docs near 1 means a templated
    corpus whose mass survives every dedup pass yet is worthless to
    train on).  One dense row per source ALWAYS.  Exact int64 + exact
    string identity (split_part + two-level GROUP BY + max-count/min-word
    join oracle; the 64-bit word hash only ROUTES — T4's convention —
    the exact word string rides the exchange and decides ties).

    Scale shape — ONE opener-hash exchange over (source, word) cells:
    each batch extracts first words with one Arrow split kernel
    (max_splits=1 — the text never re-scans) and pre-reduces to
    (hash, source, word, n) cells; the hash partition holds every copy
    of a (source, word) cell, so distinct-opener counts are additive and
    the per-source MODAL candidate is a local sort head — (best, sum) is
    associative, so the k=1 merge folds O(partitions × sources) rows;
    vocabulary never lands on one node."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    ds = _docs(sf_dir, ["text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        first = pc.list_element(
            pc.split_pattern(batch["text"], " ", max_splits=1), 0
        )
        code = pc.cast(
            pc.index_in(batch["source"], value_set=srcs), pa.int64()
        )
        ones = pa.array(np.ones(batch.num_rows, np.int64))
        t = pa.table({"w": first, "src": code, "n": ones})
        g = t.group_by(["w", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["w", "src", "n"])
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "src": g["src"],
                "w": g["w"],
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def _best(t: pa.Table) -> pa.Table:
        """Per-source best (max n, min w) + additive (nd, nop) rows."""
        order = pa.compute.sort_indices(
            t,
            sort_keys=[
                ("src", "ascending"),
                ("n", "descending"),
                ("w", "ascending"),
            ],
        )
        s = t["src"].take(order).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        head = np.empty(len(s), dtype=bool)
        head[0] = True
        head[1:] = s[1:] != s[:-1]
        hi = pa.array(np.asarray(order)[head])
        nd = np.zeros(ns, np.int64)
        nop = np.zeros(ns, np.int64)
        allsrc = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        alln = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        np.add.at(nd, allsrc, alln)
        np.add.at(nop, allsrc, 1)
        live = allsrc[np.asarray(hi)]
        return pa.table(
            {
                "src": pa.array(live.astype(np.int64)),
                "nd": pa.array(nd[live]),
                "nop": pa.array(nop[live]),
                "w": t["w"].take(hi),
                "tn": t["n"].take(hi),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "nop": pa.array([], pa.int64()),
                    "w": pa.array([], pa.string()),
                    "tn": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["w", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return _best(g.rename_columns(["w", "src", "n"]))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_openers": pa.array([], pa.int64()),
                    "top_opener": pa.array([], pa.string()),
                    "top_count": pa.array([], pa.int64()),
                }
            )
        order = pa.compute.sort_indices(
            t,
            sort_keys=[
                ("src", "ascending"),
                ("tn", "descending"),
                ("w", "ascending"),
            ],
        )
        s = t["src"].take(order).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        head = np.empty(len(s), dtype=bool)
        head[0] = True
        head[1:] = s[1:] != s[:-1]
        hi = pa.array(np.asarray(order)[head])
        nd = np.zeros(ns, np.int64)
        nop = np.zeros(ns, np.int64)
        allsrc = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        np.add.at(
            nd,
            allsrc,
            t["nd"].combine_chunks().to_numpy(zero_copy_only=False),
        )
        np.add.at(
            nop,
            allsrc,
            t["nop"].combine_chunks().to_numpy(zero_copy_only=False),
        )
        live = allsrc[np.asarray(hi)]
        # every source has >= 1 doc, so `live` covers 0..ns-1; order by src
        return pa.table(
            {
                "source": srcs.take(pa.array(live.astype(np.int64))),
                "n_docs": pa.array(nd[live]),
                "n_openers": pa.array(nop[live]),
                "top_opener": t["w"].take(hi),
                "top_count": pc.cast(t["tn"].take(hi), pa.int64()),
            }
        )

    from ..stages.shuffle import shuffle_parts

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "h", fold, k=shuffle_parts())
    return hash_partition_merge(cells, "src", merge, k=1)


def hygiene_board(sf_dir: str) -> Dataset:
    """T113: whitespace-hygiene lint board — per source: docs, EMPTY
    docs, docs with leading whitespace, trailing whitespace, an internal
    double-space run, and a control character (tab or newline) — the
    pre-tokenization lint pass every corpus-prep pipeline runs before
    T11 (a tokenizer sees ' the' and 'the' as different tokens; a
    double-space doubles T112's opener split; control bytes break
    line-oriented shard formats) that none of the quality boards lint
    (T10 scores words/punct, T29 filters on content — T113 audits the
    BYTES AROUND the content).  One dense row per source ALWAYS (a
    clean corpus shows zeros — the healthy reading, never vacuous
    because n_docs ≥ 1).  Exact int64 (LIKE / contains / chr() oracle).

    Scale shape — ZERO wide exchange (T49's profile): five Arrow
    predicate kernels per batch (starts_with / ends_with /
    match_substring — the text scans in-place, never re-materializes),
    one np.add.at scatter folds flags into a per-source accumulator —
    one partial row per source per batch; k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    ds = _docs(sf_dir, ["text", "source"])

    def _np(a) -> np.ndarray:
        return (
            pc.fill_null(pc.cast(a, pa.int64()), 0)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )

    def partial(b: pa.Table) -> pa.Table:
        txt = b["text"]
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        empty = _np(pc.equal(txt, ""))
        lead = _np(pc.starts_with(txt, " "))
        trail = _np(pc.ends_with(txt, " "))
        dbl = _np(pc.match_substring(txt, "  "))
        ctl = _np(
            pc.or_(
                pc.match_substring(txt, "\t"), pc.match_substring(txt, "\n")
            )
        )
        acc = np.zeros((6, ns), np.int64)
        np.add.at(acc[0], code, 1)
        np.add.at(acc[1], code, empty)
        np.add.at(acc[2], code, lead)
        np.add.at(acc[3], code, trail)
        np.add.at(acc[4], code, dbl)
        np.add.at(acc[5], code, ctl)
        return pa.table(
            {
                "src": pa.array(np.arange(ns, dtype=np.int64)),
                "nd": pa.array(acc[0]),
                "ne": pa.array(acc[1]),
                "nl": pa.array(acc[2]),
                "nt": pa.array(acc[3]),
                "n2": pa.array(acc[4]),
                "nc": pa.array(acc[5]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        acc = np.zeros((6, ns), np.int64)
        if t.num_rows:
            src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            for i, c in enumerate(["nd", "ne", "nl", "nt", "n2", "nc"]):
                np.add.at(
                    acc[i],
                    src,
                    t[c].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "source": srcs,
                "n_docs": pa.array(acc[0]),
                "n_empty": pa.array(acc[1]),
                "n_lead_ws": pa.array(acc[2]),
                "n_trail_ws": pa.array(acc[3]),
                "n_double_space": pa.array(acc[4]),
                "n_ctl": pa.array(acc[5]),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "src", merge, k=1)


def collocation_board(sf_dir: str) -> Dataset:
    """T114: collocation board — per source: total adjacent word pairs,
    DISTINCT pairs, and the MODAL pair with its occurrence count (ties
    -> lexicographically smallest "w1 w2" string) — T112's opener probe
    generalized to the whole text: a dominant collocation whose count
    approaches n_pairs/docs is phrase-level boilerplate (navigation
    chrome, legal footers) that survives exact dedup and word-level
    stats alike; T31 answers this for the token tape, T114 for the
    document corpus where the pair is a STRING the reviewer can read.
    One dense row per source ALWAYS (an all-single-word source shows
    zeros and an empty top_pair — the SQL COALESCE reading).  Exact
    int64 + exact string identity (lateral-unnest pair explode +
    two-level GROUP BY + max-count/min-pair join oracle; the 64-bit
    hash only ROUTES — T4's convention).

    Scale shape — ONE pair-hash exchange over (source, pair) cells:
    each batch splits once (one Arrow kernel), forms adjacent pairs
    with one take + one binary_join over the flattened word buffer
    (list boundaries masked vectorially — no per-doc loop), and
    pre-reduces to (hash, source, pair, n) cells; the hash partition
    holds every copy of a cell, so distinct counts are additive and the
    per-source modal candidate is a local sort head; (best, sum) is
    associative -> the k=1 merge folds O(partitions × sources) rows;
    the pair vocabulary never lands on one node."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    ds = _docs(sf_dir, ["text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        la = pc.split_pattern(batch["text"], " ").combine_chunks()
        offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = la.values
        nw = len(flat)
        code = pc.cast(
            pc.index_in(batch["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "h": pa.array([], pa.int64()),
                "src": pa.array([], pa.int64()),
                "w": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if nw == 0:
            return empty
        # pair start positions: every flat index except each list's last
        keep = np.ones(nw, bool)
        ends = offs[1:] - 1
        keep[ends[ends >= offs[:-1]]] = False  # skip empty lists
        keep[nw - 1] = False
        idx = np.flatnonzero(keep)
        if len(idx) == 0:
            return empty
        left = flat.take(pa.array(idx, pa.int64()))
        right = flat.take(pa.array(idx + 1, pa.int64()))
        pair = pc.binary_join_element_wise(left, right, " ")
        wsrc = np.repeat(code, np.diff(offs))[idx]
        t = pa.table(
            {
                "w": pair,
                "src": pa.array(wsrc.astype(np.int64)),
                "n": pa.array(np.ones(len(idx), np.int64)),
            }
        )
        g = t.group_by(["w", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["w", "src", "n"])
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "src": g["src"],
                "w": g["w"],
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def _best(t: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(
            t,
            sort_keys=[
                ("src", "ascending"),
                ("n", "descending"),
                ("w", "ascending"),
            ],
        )
        s = t["src"].take(order).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        head = np.empty(len(s), dtype=bool)
        head[0] = True
        head[1:] = s[1:] != s[:-1]
        hi = pa.array(np.asarray(order)[head])
        npair = np.zeros(ns, np.int64)
        ndis = np.zeros(ns, np.int64)
        allsrc = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        alln = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        np.add.at(npair, allsrc, alln)
        np.add.at(ndis, allsrc, 1)
        live = allsrc[np.asarray(hi)]
        return pa.table(
            {
                "src": pa.array(live.astype(np.int64)),
                "np": pa.array(npair[live]),
                "nd": pa.array(ndis[live]),
                "w": t["w"].take(hi),
                "tn": pc.cast(t["n"].take(hi), pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "np": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "w": pa.array([], pa.string()),
                    "tn": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["w", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return _best(g.rename_columns(["w", "src", "n"]))

    def merge(t: pa.Table) -> pa.Table:
        npair = np.zeros(ns, np.int64)
        ndis = np.zeros(ns, np.int64)
        top = np.full(ns, "", object)
        tcnt = np.zeros(ns, np.int64)
        if t.num_rows:
            order = pa.compute.sort_indices(
                t,
                sort_keys=[
                    ("src", "ascending"),
                    ("tn", "descending"),
                    ("w", "ascending"),
                ],
            )
            s = t["src"].take(order).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            head = np.empty(len(s), dtype=bool)
            head[0] = True
            head[1:] = s[1:] != s[:-1]
            hi = pa.array(np.asarray(order)[head])
            allsrc = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                npair,
                allsrc,
                t["np"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                ndis,
                allsrc,
                t["nd"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            live = allsrc[np.asarray(hi)]
            top[live] = np.asarray(t["w"].take(hi))
            tcnt[live] = t["tn"].take(hi).combine_chunks().to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "source": srcs,
                "n_pairs": pa.array(npair),
                "n_distinct": pa.array(ndis),
                "top_pair": pa.array([str(x) for x in top], pa.string()),
                "top_count": pa.array(tcnt),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "h", fold, k=shuffle_parts())
    return hash_partition_merge(cells, "src", merge, k=1)


def _f1_ntok_points(sf_dir: str):
    """Tape rows as OHLC points: (source, ts_us, order_id, v) with
    ts = T0 + seq seconds (seq from the doc_id suffix, unique per
    source stream) and v = n_tok — shared by the f1 OHLC tiers."""
    import glob as _glob

    from ..timegrid import T0_US

    files = sorted(_glob.glob(sf_dir + "/*.parquet"))

    def narrow(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            b["doc_id"].combine_chunks(), r"-(?P<seq>[0-9]+)$"
        )
        seq = (
            pc.cast(pc.struct_field(ex, "seq"), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "source": b["source"],
                "ts_us": pa.array(T0_US + seq * 1_000_000, pa.int64()),
                "order_id": pa.array(seq, pa.int64()),
                "v": pc.cast(b["n_tok"], pa.int64()),
            }
        )

    ds = rd.read_parquet(files, columns=["doc_id", "source", "n_tok"])
    return ds.map_batches(
        narrow, batch_format="pyarrow", zero_copy_batch=True
    ), files


def f1_ohlc_1h(sf_dir: str) -> Dataset:
    """T115/F: hourly sequence-length candlesticks over the F1 tape —
    per (source, 1h bucket): open/high/low/close of n_tok in seq order
    — E17's OHLC discipline on the flagship's own payload axis (T86
    gives the hour's length QUANTILES; the candle gives its ORDERED
    envelope — where the hour started, peaked, bottomed and ended,
    the shape a batch-packing autoscaler reads for trend, not just
    level).  Exact int64 (row_number over seq within the hour oracle;
    seq is unique per source so ties cannot occur).

    Scale shape — stages/rollup.ohlc_rollup verbatim: the associative
    _ohlc_merge combiner collapses each batch to one partial per
    (source, hour); ONE hour-hash exchange (salt axis = time)."""
    from ..stages.rollup import ohlc_rollup
    from ..timegrid import T0_US

    points, files = _f1_ntok_points(sf_dir)
    return ohlc_rollup(
        points, "1h", t0_us=T0_US, k=_doc_k_files(files)
    )


def f1_ohlc_1d_cascaded(sf_dir: str) -> Dataset:
    """T116/F: daily n_tok candlesticks CASCADED from the hourly tier —
    the E109 ordered-aggregate cascade on the flagship tape: the day's
    open is the open of its earliest hour, close the close of its
    latest, extremes the extremes — reading ONLY the 1h tier's
    one-row-per-bucket output (the retention story: once the 1h candles
    are committed, the raw tape can expire and every coarser candle is
    still derivable).  Exact int64, bit-equal to rolling the RAW tape
    to 1d directly — the oracle does exactly that, which IS the
    cascade-correctness statement.

    Scale shape — stages/rollup.ohlc_cascade (one day-hash exchange
    over 1h partials; no raw re-read)."""
    from ..stages.rollup import ohlc_cascade
    from ..timegrid import T0_US

    fine = f1_ohlc_1h(sf_dir)
    return ohlc_cascade(fine, "1d", t0_us=T0_US, k=8)


def ingestion_drift(sf_dir: str) -> Dataset:
    """T117: ingestion-order drift board — per doc_id DECILE (doc_ids
    are dense 0..N-1 in ingestion order — the invariant T52's
    length-integrity audit pins): docs, Σn_chars, Σwords, Σstopwords —
    the quality-drift monitor over crawl time (a corpus whose late
    deciles shrink or lose stopword mass changed its crawler mix
    mid-ingest; every per-source board averages this away because the
    drift axis is ORDER, not source).  N comes from parquet FOOTERS
    (exact, no data read).  One dense row per decile ALWAYS (10 rows).
    Exact int64 (count-scalar cross join + integer-divide decile +
    T10's stopword split semantics oracle).

    Scale shape — ZERO wide exchange (T49's profile): the decile is a
    stateless function of doc_id and the broadcast footer count; per
    batch the T10 split/stopword kernels + one np.add.at reduce docs to
    ≤ 10 partial rows; k=1 densifying merge."""
    import pyarrow.parquet as pq

    from ..functions import textstats as ts
    from ..stages.shuffle import hash_partition_merge

    n_total = pq.ParquetFile(
        f"{sf_dir}/documents.parquet"
    ).metadata.num_rows

    ds = _docs(sf_dir, ["doc_id", "text", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(batch["text"]), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        n_words = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False
        )
        is_stop = pc.is_in(
            flat, value_set=pa.array(list(ts.STOPWORDS))
        ).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(
            parent, weights=is_stop, minlength=batch.num_rows
        ).astype(np.int64)
        did = (
            pc.cast(batch["doc_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        chars = (
            pc.cast(batch["n_chars"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        dec = did * 10 // n_total
        acc = np.zeros((4, 10), np.int64)
        np.add.at(acc[0], dec, 1)
        np.add.at(acc[1], dec, chars)
        np.add.at(acc[2], dec, n_words)
        np.add.at(acc[3], dec, n_stop)
        return pa.table(
            {
                "dec": pa.array(np.arange(10, dtype=np.int64)),
                "nd": pa.array(acc[0]),
                "ch": pa.array(acc[1]),
                "w": pa.array(acc[2]),
                "st": pa.array(acc[3]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        acc = np.zeros((4, 10), np.int64)
        if t.num_rows:
            dec = t["dec"].combine_chunks().to_numpy(zero_copy_only=False)
            for i, c in enumerate(["nd", "ch", "w", "st"]):
                np.add.at(
                    acc[i],
                    dec,
                    t[c].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "decile": pa.array(np.arange(10, dtype=np.int64)),
                "n_docs": pa.array(acc[0]),
                "sum_chars": pa.array(acc[1]),
                "sum_words": pa.array(acc[2]),
                "sum_stop": pa.array(acc[3]),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "dec", merge, k=1)


def exclusive_vocab(sf_dir: str) -> Dataset:
    """T118: vocabulary-exclusivity board — per source: distinct word
    types, types appearing in NO other source (exclusive), and this
    source's occurrences of those exclusive types — the
    domain-specificity read next to T30's per-doc distinctive terms and
    T57's pairwise vocab overlap (T57 says how much two sources share;
    T118 says how much of each source's vocabulary is its ALONE — high
    exclusive mass = jargon/template vocabulary a general tokenizer
    will shatter into bytes, the T36 fertility risk localized to its
    cause).  One dense row per source ALWAYS.  Exact int64 (unnest +
    per-(source, word) counts + per-word source-count join oracle; the
    64-bit hash only ROUTES — the exact word string rides the exchange
    and decides identity, T4's convention).

    Scale shape — ONE word-hash exchange over (source, word) cells:
    batches pre-reduce with one split + one Arrow group_by to (hash,
    source, word, n) cells; the word's partition holds EVERY source's
    cell for it, so the per-word source count (the exclusivity test) is
    decided locally and re-reduces IN PLACE to per-source triples —
    O(partitions × sources) rows reach the k=1 densifying merge; the
    vocabulary never lands on one node."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    ds = _docs(sf_dir, ["text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        words = pc.split_pattern(batch["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False
        )
        code = pc.cast(
            pc.index_in(batch["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "w": flat,
                "src": pa.array(code[parent].astype(np.int64)),
                "n": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        g = t.group_by(["w", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["w", "src", "n"])
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "src": g["src"],
                "w": g["w"],
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "nt": pa.array([], pa.int64()),
                    "ne": pa.array([], pa.int64()),
                    "no": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["w", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["w", "src", "n"])
        # per-word source count via dictionary codes (exact strings)
        wcol = g["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        wid = wcol.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        src = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        nsrc_per_word = np.bincount(wid)
        excl = nsrc_per_word[wid] == 1
        nt = np.zeros(ns, np.int64)
        ne = np.zeros(ns, np.int64)
        no = np.zeros(ns, np.int64)
        np.add.at(nt, src, 1)
        np.add.at(ne, src, excl)
        np.add.at(no, src, np.where(excl, n, 0))
        live = np.flatnonzero(nt)
        return pa.table(
            {
                "src": pa.array(live.astype(np.int64)),
                "nt": pa.array(nt[live]),
                "ne": pa.array(ne[live]),
                "no": pa.array(no[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        acc = np.zeros((3, ns), np.int64)
        if t.num_rows:
            src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            for i, c in enumerate(["nt", "ne", "no"]):
                np.add.at(
                    acc[i],
                    src,
                    t[c].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "source": srcs,
                "n_types": pa.array(acc[0]),
                "n_exclusive": pa.array(acc[1]),
                "excl_occurrences": pa.array(acc[2]),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "h", fold, k=shuffle_parts())
    return hash_partition_merge(cells, "src", merge, k=1)


def vocab_intro_deciles(sf_dir: str) -> Dataset:
    """T119: vocabulary-introduction deciles — per doc_id DECILE (T117's
    dense-ingestion-order invariant): word types FIRST seen there
    (global min doc_id attribution — T61's first-introduction rule on
    the vocabulary axis) and those types' TOTAL corpus occurrences —
    the vocabulary-growth curve read with T117's drift board (a healthy
    crawl introduces most mass early and flattens; late deciles still
    minting heavy types = the source mix shifted, T24's vocab needs
    rebuilding).  One dense row per decile ALWAYS.  Exact int64
    (min(doc_id) + count-scalar decile + densify oracle).

    Scale shape — ONE word-hash exchange: batches pre-reduce with one
    split + one Arrow group_by to (hash, word, min_doc, n) cells; the
    word's partition holds every cell for it, so the GLOBAL first
    introduction (min over mins) and total count settle locally,
    re-reducing IN PLACE to ≤ 10 partial rows per partition; k=1
    densifying merge.  The vocabulary never lands on one node."""
    import pyarrow.parquet as pq

    from ..stages.shuffle import hash_partition_merge, shuffle_parts

    n_total = pq.ParquetFile(
        f"{sf_dir}/documents.parquet"
    ).metadata.num_rows

    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        words = pc.split_pattern(batch["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False
        )
        did = (
            pc.cast(batch["doc_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "w": flat,
                "d": pa.array(did[parent].astype(np.int64)),
                "n": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        g = t.group_by("w", use_threads=False).aggregate(
            [("d", "min"), ("n", "sum")]
        )
        g = g.rename_columns(["w", "md", "n"])
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "w": g["w"],
                "md": pc.cast(g["md"], pa.int64()),
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "dec": pa.array([], pa.int64()),
                    "nt": pa.array([], pa.int64()),
                    "occ": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("w", use_threads=False).aggregate(
            [("md", "min"), ("n", "sum")]
        )
        md = g["md_min"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        dec = md * 10 // n_total
        nt = np.zeros(10, np.int64)
        occ = np.zeros(10, np.int64)
        np.add.at(nt, dec, 1)
        np.add.at(occ, dec, n)
        live = np.flatnonzero(nt)
        return pa.table(
            {
                "dec": pa.array(live.astype(np.int64)),
                "nt": pa.array(nt[live]),
                "occ": pa.array(occ[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nt = np.zeros(10, np.int64)
        occ = np.zeros(10, np.int64)
        if t.num_rows:
            dec = t["dec"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nt,
                dec,
                t["nt"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                occ,
                dec,
                t["occ"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "decile": pa.array(np.arange(10, dtype=np.int64)),
                "new_types": pa.array(nt),
                "occurrences": pa.array(occ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "h", fold, k=shuffle_parts())
    return hash_partition_merge(cells, "dec", merge, k=1)


def quality_by_decile(sf_dir: str) -> Dataset:
    """T120: quality pass-rate by ingestion decile — per doc_id decile
    (T117's dense-order invariant): total docs (exact arithmetic from
    the footer count — {i : i·10//N = d} needs no scan) and docs
    SURVIVING T29's fused quality filter — T117 shows the raw drift
    (sizes, stopword mass); T120 shows whether the drift CROSSES the
    production keep-thresholds (a late decile whose pass-rate falls off
    a cliff is the actionable alarm; drifting sums that still pass are
    noise).  Pure composition: the filter is T29 verbatim (same
    kernels, same broadcast eval shingles), one extra scatter.  One
    dense row per decile ALWAYS.  Exact int64 (T29's oracle CTE +
    count-scalar decile + densify).

    Scale shape — T29's single streaming text pass (zero shuffles)
    feeding a 10-cell scatter; ≤ 10 partial rows per batch; k=1
    densifying merge."""
    import pyarrow.parquet as pq

    from ..stages.shuffle import hash_partition_merge

    n_total = pq.ParquetFile(
        f"{sf_dir}/documents.parquet"
    ).metadata.num_rows

    kept = quality_filter(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        did = (
            pc.cast(b["doc_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        dec = did * 10 // n_total
        npass = np.zeros(10, np.int64)
        np.add.at(npass, dec, 1)
        return pa.table(
            {
                "dec": pa.array(np.arange(10, dtype=np.int64)),
                "np": pa.array(npass),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        npass = np.zeros(10, np.int64)
        if t.num_rows:
            dec = t["dec"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                npass,
                dec,
                t["np"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        d = np.arange(10, dtype=np.int64)
        # |{i in [0, N): i*10//N == d}| = ceil((d+1)N/10) - ceil(dN/10)
        hi = ((d + 1) * n_total + 9) // 10
        lo = (d * n_total + 9) // 10
        return pa.table(
            {
                "decile": pa.array(d),
                "n_docs": pa.array(hi - lo),
                "n_pass": pa.array(npass),
            }
        )

    partials = kept.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "dec", merge, k=1)


def vocab_churn(sf_dir: str) -> Dataset:
    """T121: adjacent-decile vocabulary churn — for each decile
    boundary d → d+1 (T117's dense-ingestion-order invariant): distinct
    types in d, in d+1, and SHARED — the stability curve T119's
    first-introduction view can't draw (T119 counts what's NEW; T121
    whether the OLD persists — low overlap across a boundary = topic or
    crawler change, the retention dual of introduction).  One dense row
    per boundary ALWAYS (9 rows).  Exact int64 (DISTINCT (decile, word)
    + self-join on dec+1 + densify oracle).

    Scale shape — ONE word-hash exchange with a presence BITMASK
    riding: batches pre-reduce to (hash, word, OR of 1<<decile) cells
    (one np.bitwise_or scatter); the word's partition ORs its masks to
    the exact global presence set, then one vectorized bit-test per
    boundary re-reduces IN PLACE to ≤ 9 partial rows; k=1 merge.  The
    vocabulary never lands on one node."""
    import pyarrow.parquet as pq

    from ..stages.shuffle import hash_partition_merge, shuffle_parts

    n_total = pq.ParquetFile(
        f"{sf_dir}/documents.parquet"
    ).metadata.num_rows

    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        words = pc.split_pattern(batch["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False
        )
        did = (
            pc.cast(batch["doc_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        dec = (did * 10 // n_total)[parent]
        t = pa.table(
            {
                "w": flat,
                "m": pa.array((1 << dec).astype(np.int64)),
            }
        )
        # OR-reduce masks per word: sum of distinct powers == OR only
        # after dedupe, so reduce via max per (word, mask) then group
        g = (
            pl.from_arrow(t)
            .group_by("w")
            .agg(pl.col("m").unique().sum().alias("m"))
        )
        # unique().sum() over powers of two == bitwise OR
        ga = g.to_arrow()
        hs = pl.from_arrow(ga.select(["w"]))["w"].hash(seed=42).to_numpy()
        return pa.table(
            {
                "h": pa.array(hs.view(np.int64), pa.int64()),
                "w": ga["w"],
                "m": pc.cast(ga["m"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "b": pa.array([], pa.int64()),
                    "np_": pa.array([], pa.int64()),
                    "nx": pa.array([], pa.int64()),
                    "sh": pa.array([], pa.int64()),
                }
            )
        wcol = t["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        wid = wcol.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        m = t["m"].combine_chunks().to_numpy(zero_copy_only=False)
        nw = int(wid.max()) + 1
        mask = np.zeros(nw, np.int64)
        np.bitwise_or.at(mask, wid, m)
        np_ = np.zeros(9, np.int64)
        nx = np.zeros(9, np.int64)
        sh = np.zeros(9, np.int64)
        for d in range(9):
            a = (mask >> d) & 1
            b = (mask >> (d + 1)) & 1
            np_[d] = int(a.sum())
            nx[d] = int(b.sum())
            sh[d] = int((a & b).sum())
        return pa.table(
            {
                "b": pa.array(np.arange(9, dtype=np.int64)),
                "np_": pa.array(np_),
                "nx": pa.array(nx),
                "sh": pa.array(sh),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        acc = np.zeros((3, 9), np.int64)
        if t.num_rows:
            b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
            for i, c in enumerate(["np_", "nx", "sh"]):
                np.add.at(
                    acc[i],
                    b,
                    t[c].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "decile": pa.array(np.arange(9, dtype=np.int64)),
                "n_prev": pa.array(acc[0]),
                "n_next": pa.array(acc[1]),
                "n_shared": pa.array(acc[2]),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "h", fold, k=shuffle_parts())
    return hash_partition_merge(cells, "b", merge, k=1)


def f1_mix_by_hour(sf_dir: str) -> Dataset:
    """T122/F: tape source-mix drift — per (1h bucket, source):
    sequences and their exact permille share of the hour (1000·n //
    hour total) — the ingestion-mix monitor for the flagship tape (the
    north rule's streams are per-source; a source whose share of the
    hour collapses means its producer stalled — the number the lag
    alert pages on, next to f1_gap_report's hard gaps).  One dense row
    per (hour, source) ALWAYS over hours that exist.  Exact int64
    (two-key GROUP BY + window-total integer divide oracle).

    Scale shape — ZERO wide exchange: per batch one packed np.unique
    reduces tape rows to (hour, source, n) partials over a ≤ hours ×
    sources domain; the k=1 merge settles hour totals exactly (every
    cell of an hour co-locates at the fold) and densifies."""
    import glob as _glob

    from ..stages.shuffle import hash_partition_merge
    from ..timegrid import T0_US

    files = sorted(_glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            b["doc_id"].combine_chunks(), r"-(?P<seq>[0-9]+)$"
        )
        seq = (
            pc.cast(pc.struct_field(ex, "seq"), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        hour = seq // 3600
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = hour * ns + code
        vals, freq = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "hc": pa.array(vals, pa.int64()),
                "n": pa.array(freq.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "bucket_ts": pa.array([], pa.timestamp("us")),
                    "source": pa.array([], pa.string()),
                    "n_seqs": pa.array([], pa.int64()),
                    "share_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("hc", use_threads=False).aggregate([("n", "sum")])
        hc = g["hc"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        hours = np.unique(hc // ns)
        hidx = {int(h): i for i, h in enumerate(hours)}
        grid = np.zeros((len(hours), ns), np.int64)
        grid[
            np.fromiter((hidx[int(x)] for x in hc // ns), np.int64),
            hc % ns,
        ] = n
        tot = grid.sum(axis=1)
        share = 1000 * grid // np.maximum(tot, 1)[:, None]
        nh = len(hours)
        return pa.table(
            {
                "bucket_ts": pa.array(
                    np.repeat(hours, ns) * 3_600_000_000 + T0_US, pa.int64()
                ).cast(pa.timestamp("us")),
                "source": pa.array(
                    [str(srcs[i].as_py()) for _ in range(nh) for i in range(ns)],
                    pa.string(),
                ),
                "n_seqs": pa.array(grid.reshape(-1)),
                "share_permille": pa.array(share.reshape(-1)),
            }
        )

    ds = rd.read_parquet(files, columns=["doc_id", "source"])
    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "hc", merge, k=1)


def chunking_curve(
    sf_dir: str, lengths: tuple[int, ...] = (128, 512, 2048)
) -> Dataset:
    """T123: context-length chunking-overhead curve — for each candidate
    sequence length L: chunks the corpus splits into (Σ ceil(tok/L) over
    docs, whitespace tokens = T11's count) and PAD-WASTE tokens
    (Σ (ceil(tok/L)·L − tok)) — the context-length selection table read
    BEFORE T22's packer runs (small L wastes nothing but fragments
    long-range structure; large L pads short docs to death; the curve's
    knee is the budget decision, and T22's bin-packing can then be
    compared against this no-packing baseline).  Empty docs contribute
    one zero-token chunk (ceil(0/L) floors to 0 — they contribute
    NOTHING, matching the SQL).  One dense row per L ALWAYS.  Exact
    int64 (ceil-divide + SUM oracle).

    Scale shape — ZERO wide exchange (T49's profile): one Arrow
    split-length kernel per batch, one ceil-divide per L, ≤ len(lengths)
    partial rows per batch; k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    ls = np.array(lengths, np.int64)

    ds = _docs(sf_dir, ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        tok = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        chunks = np.zeros(len(ls), np.int64)
        waste = np.zeros(len(ls), np.int64)
        for i, L in enumerate(ls):
            c = -(-tok // L)
            chunks[i] = int(c.sum())
            waste[i] = int((c * L - tok).sum())
        return pa.table(
            {
                "L": pa.array(ls),
                "ch": pa.array(chunks),
                "wa": pa.array(waste),
                "nt": pa.array(np.full(len(ls), int(tok.sum()), np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "seq_len": pa.array(ls),
                    "n_chunks": pa.array(np.zeros(len(ls), np.int64)),
                    "pad_waste": pa.array(np.zeros(len(ls), np.int64)),
                    "n_tokens": pa.array(np.zeros(len(ls), np.int64)),
                }
            )
        g = t.group_by("L", use_threads=False).aggregate(
            [("ch", "sum"), ("wa", "sum"), ("nt", "sum")]
        )
        g = g.rename_columns(["L", "ch", "wa", "nt"])
        order = pc.sort_indices(g["L"])
        return pa.table(
            {
                "seq_len": g["L"].take(order),
                "n_chunks": pc.cast(g["ch"].take(order), pa.int64()),
                "pad_waste": pc.cast(g["wa"].take(order), pa.int64()),
                "n_tokens": pc.cast(g["nt"].take(order), pa.int64()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "L", merge, k=1)


def hapax_board(sf_dir: str) -> Dataset:
    """T124: hapax-legomena board — per source: distinct word types,
    HAPAX types (corpus-GLOBAL occurrence count exactly 1) appearing in
    this source, DIS-legomena types (global count exactly 2), and the
    hapax permille share of the source's types — the classic corpus
    noise read (OCR damage, typos, boilerplate IDs inflate the
    singleton tail; a healthy natural-language source sits near Zipf's
    ~400-500‰).  T118 measures presence-based exclusivity (a type seen
    ONLY here, however often); T124 measures count-based rarity (a
    type seen ONCE anywhere) — the two disagree exactly on repeated
    jargon, which is what separates domain vocabulary from noise.  One
    dense row per source ALWAYS; exact int64 (unnest + per-word global
    count join + permille divide oracle; the 64-bit hash only ROUTES —
    the exact word string rides the exchange and decides identity,
    T4's convention).

    Scale shape — T118's machinery with a count test instead of a
    source-count test: batches pre-reduce with one split + one Arrow
    group_by to (hash, source, word, n) cells; ONE word-hash exchange
    co-locates every cell of a word, so its exact global count (and
    therefore the hapax/dis test) is decided locally and re-reduces IN
    PLACE to per-source triples — O(partitions × sources) rows reach
    the k=1 densifying merge; the vocabulary never lands on one node.
    Reference parity: validation-lane counting
    (`internal/messages/messages.go` field checks) lifted to corpus QA."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    ds = _docs(sf_dir, ["text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        words = pc.split_pattern(batch["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False
        )
        code = pc.cast(
            pc.index_in(batch["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "w": flat,
                "src": pa.array(code[parent].astype(np.int64)),
                "n": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        g = t.group_by(["w", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["w", "src", "n"])
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "src": g["src"],
                "w": g["w"],
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "nt": pa.array([], pa.int64()),
                    "nh": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["w", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["w", "src", "n"])
        wcol = g["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        wid = wcol.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        src = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        nw = int(wid.max()) + 1
        tot = np.zeros(nw, np.int64)
        np.add.at(tot, wid, n)
        cell_tot = tot[wid]
        nt = np.zeros(ns, np.int64)
        nh = np.zeros(ns, np.int64)
        nd = np.zeros(ns, np.int64)
        np.add.at(nt, src, 1)
        np.add.at(nh, src, cell_tot == 1)
        np.add.at(nd, src, cell_tot == 2)
        live = np.flatnonzero(nt)
        return pa.table(
            {
                "src": pa.array(live.astype(np.int64)),
                "nt": pa.array(nt[live]),
                "nh": pa.array(nh[live]),
                "nd": pa.array(nd[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        acc = np.zeros((3, ns), np.int64)
        if t.num_rows:
            src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            for i, c in enumerate(["nt", "nh", "nd"]):
                np.add.at(
                    acc[i],
                    src,
                    t[c].combine_chunks().to_numpy(zero_copy_only=False),
                )
        pm = 1000 * acc[1] // np.maximum(acc[0], 1)
        return pa.table(
            {
                "source": srcs,
                "n_types": pa.array(acc[0]),
                "n_hapax": pa.array(acc[1]),
                "n_dis": pa.array(acc[2]),
                "hapax_permille": pa.array(pm.astype(np.int64)),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "h", fold, k=shuffle_parts())
    return hash_partition_merge(cells, "src", merge, k=1)


def repeat_gaps(sf_dir: str) -> Dataset:
    """T125: repeat-distance quantiles board — per source: total repeat
    pairs (a word's consecutive occurrences within one doc), discrete
    p50/p90 of the gap between them (in token positions) and the max
    gap — the self-repetition WAVELENGTH read: T72 counts gap=1
    stutters, T18 the doc's duplicate-word share, T27 duplicated
    n-gram mass, but none says HOW FAR APART the echoes sit —
    boilerplate chrome repeats at long fixed distances (headers and
    footers), decoder loops at short ones, healthy prose in between —
    the number that picks T18's run-length threshold and the context
    window a repetition penalty needs to see.  One dense row per
    source ALWAYS (zero rows for a repeat-free source); exact int64
    under the quantile_disc rank rule (generate_subscripts + lag +
    quantile_disc oracle; the 64-bit word hash decides identity at the
    documented collision rate — T72's convention).

    Scale shape — ZERO wide exchange (T49's profile): repeats are
    doc-local and a doc is one row, so one batch_word_hashes pass +
    one lexsort per batch reduce to (source, gap, n) histogram
    partials over a ≤ sources × max-doc-length domain however large
    the corpus (T21's bounded-histogram rule); every quantile reads
    off one cumsum per source in the k=1 merge.  Reference parity:
    the validation lane's field-repetition checks
    (`internal/messages/messages.go`) lifted to corpus QA."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    nsrc = len(srcs)

    def partial(batch: pa.Table) -> pa.Table:
        uh, n = ts.batch_word_hashes(batch["text"])
        total = int(n.sum())
        code = (
            pc.cast(pc.index_in(batch["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        out_sg = np.zeros(0, np.int64)
        out_n = np.zeros(0, np.int64)
        if total > 1:
            parent = np.repeat(np.arange(len(n), dtype=np.int64), n)
            starts = np.repeat(np.cumsum(n) - n, n)
            pos = np.arange(total, dtype=np.int64) - starts
            order = np.lexsort((pos, uh, parent))
            p2 = parent[order]
            h2 = uh[order]
            po2 = pos[order]
            same = (p2[1:] == p2[:-1]) & (h2[1:] == h2[:-1])
            if same.any():
                gaps = (po2[1:] - po2[:-1])[same]
                gsrc = code[p2[1:][same]]
                packed = gsrc * (1 << 32) + gaps
                out_sg, out_n = np.unique(packed, return_counts=True)
                out_n = out_n.astype(np.int64)
        return pa.table(
            {"sg": pa.array(out_sg), "n": pa.array(out_n)}
        )

    def merge(t: pa.Table) -> pa.Table:
        n_gaps = np.zeros(nsrc, np.int64)
        p50 = np.zeros(nsrc, np.int64)
        p90 = np.zeros(nsrc, np.int64)
        mx = np.zeros(nsrc, np.int64)
        if t.num_rows:
            g = t.group_by("sg", use_threads=False).aggregate(
                [("n", "sum")]
            )
            sg = g["sg"].combine_chunks().to_numpy(zero_copy_only=False)
            cnt = g["n_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            order = np.argsort(sg, kind="stable")
            sg, cnt = sg[order], cnt[order]
            s = sg >> 32
            gap = sg & 0xFFFFFFFF
            for si in np.unique(s):
                m = s == si
                gv, cv = gap[m], cnt[m]
                cum = np.cumsum(cv)
                total = int(cum[-1])
                n_gaps[si] = total
                for arr, q in ((p50, 500), (p90, 900)):
                    thr = (total * q + 999) // 1000
                    arr[si] = int(
                        gv[np.searchsorted(cum, thr, side="left")]
                    )
                mx[si] = int(gv[-1])
        return pa.table(
            {
                "source": srcs,
                "n_gaps": pa.array(n_gaps),
                "p50": pa.array(p50),
                "p90": pa.array(p90),
                "max_gap": pa.array(mx),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "sg", merge, k=1)


def length_autocorr(sf_dir: str) -> Dataset:
    """T126: ingestion-order length-autocorrelation board — per source:
    consecutive doc pairs (by doc_id within the source), and the exact
    int64 sufficient statistics Σx, Σy, Σxy, Σx², Σy² of (previous doc's
    token count, this doc's token count) — lag-1 Pearson reads off
    offline: T117 shows the corpus-wide drift DECILE by decile, T126
    whether a SOURCE's crawler batches similar-length pages back to
    back (high autocorrelation = frontier locality / template runs —
    exactly the ordering T25's global shuffle exists to destroy; a
    source already near zero doesn't need the shuffle pass).  One
    dense row per source ALWAYS (zeros for single-doc sources); exact
    int64 (lag window over doc_id order + SUM oracle; int64 bound
    ~3·10⁹ pairs/source at 10⁴-token docs).

    Scale shape — adjacency needs ORDER, so this is the grid-stitch
    shape (E116's run stitching on the doc_id axis), not a histogram:
    per batch docs reduce to (source, doc_id-range chunk, doc_id,
    n_tok) — three int64s per doc, text never moves; ONE (source,
    chunk)-hash exchange settles each chunk whole, where one lexsort
    computes all intra-chunk pair sums and leaves one summary row per
    (source, chunk) carrying its first/last token counts; the k=1
    merge sorts O(sources × chunks) summaries once and stitches
    boundary pairs (the last doc of a source's chunk immediately
    precedes the first doc of its next non-empty chunk in that
    source's order, by construction of the doc_id-range chunking)."""
    import pyarrow.parquet as pq_

    from ..stages.shuffle import hash_partition_merge, shuffle_parts

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    nsrc = len(srcs)
    n_total = pq_.ParquetFile(
        f"{sf_dir}/documents.parquet"
    ).metadata.num_rows
    kch = shuffle_parts()

    ds = _docs(sf_dir, ["doc_id", "source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.list_value_length(pc.split_pattern(batch["text"], " ")),
            pa.int64(),
        )
        code = pc.cast(
            pc.index_in(batch["source"], value_set=srcs), pa.int64()
        )
        did = (
            pc.cast(batch["doc_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        chunk = did * kch // max(n_total, 1)
        sc = (
            code.combine_chunks().to_numpy(zero_copy_only=False) * kch
            + chunk
        )
        return pa.table(
            {
                "sc": pa.array(sc.astype(np.int64)),
                "did": pa.array(did),
                "n": n,
            }
        )

    def _summaries(sc, did, n):
        """One summary row per (source, chunk): intra-chunk pair sums +
        first/last token counts, off one lexsort."""
        order = np.lexsort((did, sc))
        sc, did, n = sc[order], did[order], n[order]
        grp_start = np.ones(len(sc), bool)
        grp_start[1:] = sc[1:] != sc[:-1]
        starts = np.flatnonzero(grp_start)
        ends = np.r_[starts[1:], len(sc)] - 1
        gid = np.cumsum(grp_start) - 1
        pair = np.zeros(len(sc) - 1, bool) if len(sc) > 1 else np.zeros(0, bool)
        if len(sc) > 1:
            pair = sc[1:] == sc[:-1]
        x, y = n[:-1][pair], n[1:][pair]
        pg = gid[1:][pair]
        ng = len(starts)
        out = {
            "sc": sc[starts],
            "np": np.zeros(ng, np.int64),
            "sx": np.zeros(ng, np.int64),
            "sy": np.zeros(ng, np.int64),
            "sxy": np.zeros(ng, np.int64),
            "sxx": np.zeros(ng, np.int64),
            "syy": np.zeros(ng, np.int64),
            "first_n": n[starts],
            "last_n": n[ends],
        }
        np.add.at(out["np"], pg, 1)
        np.add.at(out["sx"], pg, x)
        np.add.at(out["sy"], pg, y)
        np.add.at(out["sxy"], pg, x * y)
        np.add.at(out["sxx"], pg, x * x)
        np.add.at(out["syy"], pg, y * y)
        return out

    def fold(t: pa.Table) -> pa.Table:
        cols = ["sc", "np", "sx", "sy", "sxy", "sxx", "syy",
                "first_n", "last_n"]
        if t.num_rows == 0:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in cols}
            )
        sc = t["sc"].combine_chunks().to_numpy(zero_copy_only=False)
        did = t["did"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        out = _summaries(sc, did, n)
        return pa.table({c: pa.array(out[c]) for c in cols})

    def merge(t: pa.Table) -> pa.Table:
        np_a = np.zeros(nsrc, np.int64)
        sx = np.zeros(nsrc, np.int64)
        sy = np.zeros(nsrc, np.int64)
        sxy = np.zeros(nsrc, np.int64)
        sxx = np.zeros(nsrc, np.int64)
        syy = np.zeros(nsrc, np.int64)
        if t.num_rows:
            sc = t["sc"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.argsort(sc, kind="stable")
            cols = {
                c: t[c].combine_chunks().to_numpy(zero_copy_only=False)[
                    order
                ]
                for c in t.column_names
            }
            sc = cols["sc"]
            s = sc // kch
            for acc, c in (
                (np_a, "np"), (sx, "sx"), (sy, "sy"),
                (sxy, "sxy"), (sxx, "sxx"), (syy, "syy"),
            ):
                np.add.at(acc, s, cols[c])
            if len(sc) > 1:
                stitch = s[1:] == s[:-1]
                x = cols["last_n"][:-1][stitch]
                y = cols["first_n"][1:][stitch]
                sg = s[1:][stitch]
                np.add.at(np_a, sg, 1)
                np.add.at(sx, sg, x)
                np.add.at(sy, sg, y)
                np.add.at(sxy, sg, x * y)
                np.add.at(sxx, sg, x * x)
                np.add.at(syy, sg, y * y)
        return pa.table(
            {
                "source": srcs,
                "n_pairs": pa.array(np_a),
                "sum_x": pa.array(sx),
                "sum_y": pa.array(sy),
                "sum_xy": pa.array(sxy),
                "sum_xx": pa.array(sxx),
                "sum_yy": pa.array(syy),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "sc", fold, k=kch)
    return hash_partition_merge(cells, "sc", merge, k=1)


def vocab_retire_deciles(sf_dir: str) -> Dataset:
    """T127: vocabulary-retirement deciles — per doc_id DECILE (T117's
    dense-ingestion-order invariant): word types LAST seen there
    (global max doc_id attribution — the dual of T119's
    first-introduction rule), those types' total corpus occurrences,
    and their summed LIFESPAN (max doc_id − min doc_id) — the
    vocabulary-death curve: T119 says when words are born, T127 when
    they die — early retirement deciles holding heavy short-lived
    types mark a topic/crawler mix that ENDED mid-ingest (the dual
    signal to late-minting), and the lifespan column separates
    one-burst jargon (span ≈ 0) from vocabulary that genuinely aged
    out.  One dense row per decile ALWAYS.  Exact int64 (min/max
    (doc_id) + count-scalar decile + densify oracle).

    Scale shape — T119's machinery with a max and a span riding: ONE
    word-hash exchange; batches pre-reduce with one split + one Arrow
    group_by to (hash, word, min_doc, max_doc, n) cells; the word's
    partition settles the GLOBAL first/last sighting and count
    locally, re-reducing IN PLACE to ≤ 10 partial rows per partition;
    k=1 densifying merge.  The vocabulary never lands on one node."""
    import pyarrow.parquet as pq

    from ..stages.shuffle import hash_partition_merge, shuffle_parts

    n_total = pq.ParquetFile(
        f"{sf_dir}/documents.parquet"
    ).metadata.num_rows

    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        words = pc.split_pattern(batch["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False
        )
        did = (
            pc.cast(batch["doc_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "w": flat,
                "d": pa.array(did[parent].astype(np.int64)),
                "n": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        g = t.group_by("w", use_threads=False).aggregate(
            [("d", "min"), ("d", "max"), ("n", "sum")]
        )
        g = g.rename_columns(["w", "mind", "maxd", "n"])
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "w": g["w"],
                "mind": pc.cast(g["mind"], pa.int64()),
                "maxd": pc.cast(g["maxd"], pa.int64()),
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "dec": pa.array([], pa.int64()),
                    "nt": pa.array([], pa.int64()),
                    "occ": pa.array([], pa.int64()),
                    "life": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("w", use_threads=False).aggregate(
            [("mind", "min"), ("maxd", "max"), ("n", "sum")]
        )
        mind = g["mind_min"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        maxd = g["maxd_max"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        dec = maxd * 10 // n_total
        nt = np.zeros(10, np.int64)
        occ = np.zeros(10, np.int64)
        life = np.zeros(10, np.int64)
        np.add.at(nt, dec, 1)
        np.add.at(occ, dec, n)
        np.add.at(life, dec, maxd - mind)
        live = np.flatnonzero(nt)
        return pa.table(
            {
                "dec": pa.array(live.astype(np.int64)),
                "nt": pa.array(nt[live]),
                "occ": pa.array(occ[live]),
                "life": pa.array(life[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nt = np.zeros(10, np.int64)
        occ = np.zeros(10, np.int64)
        life = np.zeros(10, np.int64)
        if t.num_rows:
            dec = t["dec"].combine_chunks().to_numpy(zero_copy_only=False)
            for acc, c in ((nt, "nt"), (occ, "occ"), (life, "life")):
                np.add.at(
                    acc,
                    dec,
                    t[c].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "decile": pa.array(np.arange(10, dtype=np.int64)),
                "retired_types": pa.array(nt),
                "occurrences": pa.array(occ),
                "sum_lifespan": pa.array(life),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "h", fold, k=shuffle_parts())
    return hash_partition_merge(cells, "dec", merge, k=1)


def lang_drift_deciles(sf_dir: str) -> Dataset:
    """T128: language-mix drift deciles — per (labeled lang, doc_id
    DECILE of T117's dense-ingestion-order invariant): docs and total
    chars — the language balance sheet OVER CRAWL TIME (T44 gives the
    corpus-wide mix a sampler weights from, T117 the length/stopword
    drift; T128 catches a source pivot that swaps languages mid-ingest
    — a lang whose late deciles collapse means the mixture weights T44
    informed are stale for the tail).  One dense row per (lang,
    decile) ALWAYS (langs × 10); exact int64 (count-scalar decile +
    two-key GROUP BY + densify oracle).

    Scale shape — ZERO wide exchange (T49's profile): the decile is a
    stateless function of doc_id and the broadcast footer count, the
    lang a tiny broadcast rank; per batch one packed np.unique + one
    np.add.at reduce docs to ≤ langs × 10 partial rows; k=1
    densifying merge."""
    import pyarrow.parquet as pq

    from ..stages.shuffle import hash_partition_merge

    langs = pa.array(
        sorted(_docs(sf_dir, ["lang"]).unique("lang")), pa.string()
    )
    nl = len(langs)
    n_total = pq.ParquetFile(
        f"{sf_dir}/documents.parquet"
    ).metadata.num_rows

    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        did = (
            pc.cast(batch["doc_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        dec = did * 10 // max(n_total, 1)
        code = (
            pc.cast(pc.index_in(batch["lang"], value_set=langs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        chars = (
            pc.cast(batch["n_chars"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ld = code * 10 + dec
        vals, inv = np.unique(ld, return_inverse=True)
        nd = np.bincount(inv).astype(np.int64)
        ch = np.zeros(len(vals), np.int64)
        np.add.at(ch, inv, chars)
        return pa.table(
            {
                "ld": pa.array(vals.astype(np.int64)),
                "nd": pa.array(nd),
                "ch": pa.array(ch),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nd = np.zeros(nl * 10, np.int64)
        ch = np.zeros(nl * 10, np.int64)
        if t.num_rows:
            g = t.group_by("ld", use_threads=False).aggregate(
                [("nd", "sum"), ("ch", "sum")]
            )
            ld = g["ld"].combine_chunks().to_numpy(zero_copy_only=False)
            nd[ld] = g["nd_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            ch[ld] = g["ch_sum"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "lang": langs.take(
                    pa.array(np.repeat(np.arange(nl), 10).astype(np.int64))
                ),
                "decile": pa.array(np.tile(np.arange(10, dtype=np.int64), nl)),
                "n_docs": pa.array(nd),
                "sum_chars": pa.array(ch),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "ld", merge, k=1)


def vocab_occupancy(sf_dir: str) -> Dataset:
    """T129/F: tape vocab-occupancy board — per source of the F1
    tokenized stream: total tokens, DISTINCT token ids, min/max id,
    and the occupancy permille of the source's own id range
    (1000·distinct // (max−min+1)) — the id-space utilization read
    T79's band heatmap draws per band, collapsed to the one number a
    tokenizer-shrink decision needs (a source using 3% of its id span
    wastes embedding rows; min/max localize WHERE the span sits, next
    to f1_vocab_novelty's WHEN).  One dense row per source ALWAYS;
    exact int64 (unnest + count(DISTINCT) + min/max + permille
    oracle).

    Scale shape — distinct over a corpus-sized id stream WITHOUT
    collecting ids (E114's rule on the token axis): per batch one
    flatten + one bit-packed np.unique reduces the stream to distinct
    (source, id) cells with counts riding; ONE id-hash exchange makes
    cross-batch dedupe exact (each cell settles in one partition),
    re-reducing IN PLACE to one (distinct, tokens, min, max) 4-tuple
    per (source, partition); k=1 merge.  Token lists never shuffle."""
    import glob

    import ray.data as rd

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    ns = len(srcs)

    ds = rd.read_parquet(files, columns=["source", "tokens"])

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = np.repeat(code, nper) * (1 << 32) + flat
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "si": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ["s", "nd", "nt", "mn", "mx"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("si", use_threads=False).aggregate([("n", "sum")])
        si = g["si"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        s = si >> 32
        tok = si & 0xFFFFFFFF
        nd = np.zeros(ns, np.int64)
        nt = np.zeros(ns, np.int64)
        mn = np.full(ns, np.iinfo(np.int64).max)
        mx = np.full(ns, -1, np.int64)
        np.add.at(nd, s, 1)
        np.add.at(nt, s, n)
        np.minimum.at(mn, s, tok)
        np.maximum.at(mx, s, tok)
        live = np.flatnonzero(nd)
        return pa.table(
            {
                "s": pa.array(live.astype(np.int64)),
                "nd": pa.array(nd[live]),
                "nt": pa.array(nt[live]),
                "mn": pa.array(mn[live]),
                "mx": pa.array(mx[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nd = np.zeros(ns, np.int64)
        nt = np.zeros(ns, np.int64)
        mn = np.full(ns, np.iinfo(np.int64).max)
        mx = np.full(ns, -1, np.int64)
        if t.num_rows:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            for acc, c, red in (
                (nd, "nd", np.add),
                (nt, "nt", np.add),
                (mn, "mn", np.minimum),
                (mx, "mx", np.maximum),
            ):
                red.at(
                    acc, s,
                    t[c].combine_chunks().to_numpy(zero_copy_only=False),
                )
        span = np.where(mx >= 0, mx - np.where(mx >= 0, mn, 0) + 1, 1)
        mn = np.where(mx >= 0, mn, 0)
        return pa.table(
            {
                "source": srcs,
                "n_tokens": pa.array(nt),
                "n_distinct": pa.array(nd),
                "min_id": pa.array(mn),
                "max_id": pa.array(np.maximum(mx, 0)),
                "occupancy_permille": pa.array(
                    1000 * nd // np.maximum(span, 1)
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "si", fold, k=_doc_k_files(files))
    return hash_partition_merge(cells, "s", merge, k=1)


def stopword_thirds(sf_dir: str) -> Dataset:
    """T130: stopword position-thirds board — per source: total tokens
    and stopword counts in the FIRST, MIDDLE and LAST third of each
    doc's token stream (third = 3·(pos−1)//n_tok) — WHERE the function
    words sit, not just how many (T10's ratio):  prose keeps a flat
    profile; header/navigation boilerplate depresses the first third,
    legal footers the last — the positional fingerprint that says
    WHICH END of every doc a trimming pass should inspect (T112 names
    the modal opener; T130 weighs the whole profile).  One dense row
    per source ALWAYS; exact int64 (generate_subscripts + integer
    third bucket + CASE SUM oracle, T10's lowered stopword list).

    Scale shape — ZERO wide exchange (T49's profile): position,
    third and stopword membership are all batch-local Arrow/numpy
    kernels (one split + one is_in + two np.add.at passes); each batch
    reduces to one partial row per source; k=1 densifying merge."""
    from ..functions.textstats import STOPWORDS
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    nsrc = len(srcs)
    stop_arr = pa.array(list(STOPWORDS), pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        n = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = words.flatten()
        is_stop = (
            pc.is_in(pc.utf8_lower(flat), value_set=stop_arr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        total = int(n.sum())
        parent = np.repeat(np.arange(len(n), dtype=np.int64), n)
        starts = np.repeat(np.cumsum(n) - n, n)
        pos = np.arange(total, dtype=np.int64) - starts
        third = 3 * pos // np.maximum(n[parent], 1)
        code = (
            pc.cast(pc.index_in(batch["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        sc = code[parent]
        nt = np.bincount(code, weights=n, minlength=nsrc).astype(np.int64)
        st = np.zeros(nsrc * 3, np.int64)
        np.add.at(st, sc * 3 + third, is_stop)
        live = np.arange(nsrc)
        return pa.table(
            {
                "s": pa.array(live.astype(np.int64)),
                "nt": pa.array(nt),
                "s0": pa.array(st[live * 3]),
                "s1": pa.array(st[live * 3 + 1]),
                "s2": pa.array(st[live * 3 + 2]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nt = np.zeros(nsrc, np.int64)
        s0 = np.zeros(nsrc, np.int64)
        s1 = np.zeros(nsrc, np.int64)
        s2 = np.zeros(nsrc, np.int64)
        if t.num_rows:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            for acc, c in ((nt, "nt"), (s0, "s0"), (s1, "s1"), (s2, "s2")):
                np.add.at(
                    acc, s,
                    t[c].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "source": srcs,
                "n_tokens": pa.array(nt),
                "stop_first": pa.array(s0),
                "stop_mid": pa.array(s1),
                "stop_last": pa.array(s2),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def modal_word(sf_dir: str) -> Dataset:
    """T131: modal-word board — per source: total tokens, the single
    MOST FREQUENT word (ties → lexicographically smallest), its count
    and permille of the source's tokens — the one-number boilerplate
    flag next to T114's modal PAIR (a top word whose share dwarfs any
    natural-language Zipf head is chrome or a decoder loop; T16 ranks
    the corpus-wide heavy hitters, T131 names each source's own) —
    and the argmax shape every "top item per group" dashboard needs.
    One dense row per source ALWAYS; exact (row_number over (count
    DESC, word ASC) oracle; the exact word STRING rides the exchange
    and decides identity — T4's convention).

    Scale shape — an ARGMAX is a reduction, so it needs no global
    sort: batches pre-reduce via one split + one Arrow group_by to
    (hash, source, word, n) cells; ONE word-hash exchange settles each
    word's exact per-source count (all cells of a word co-locate);
    each partition then keeps only its LOCAL best candidate per source
    (count DESC, word ASC — one lexsort), and the k=1 merge picks the
    best of O(partitions × sources) candidates.  The vocabulary never
    lands on one node."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge, shuffle_parts

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    nsrc = len(srcs)

    ds = _docs(sf_dir, ["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        n = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        code = (
            pc.cast(pc.index_in(batch["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        parent = np.repeat(code, n)
        t = pa.table(
            {
                "w": flat,
                "s": pa.array(parent),
                "n": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        g = t.group_by(["w", "s"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["w", "s", "n"])
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "w": g["w"],
                "s": g["s"],
                "n": g["n"],
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "s": pa.array([], pa.int64()),
                    "w": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "tot": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["w", "s"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        s = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        w = g["w"].combine_chunks()
        tot = np.zeros(nsrc, np.int64)
        np.add.at(tot, s, n)
        # local best per source: count DESC then word ASC
        import pyarrow.compute as _pc

        widx = _pc.rank(w, sort_keys="ascending", tiebreaker="dense")
        wr = widx.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((wr, -n, s))
        s_o = s[order]
        first = np.ones(len(s_o), bool)
        first[1:] = s_o[1:] != s_o[:-1]
        sel = order[first]
        live = s[sel]
        return pa.table(
            {
                "s": pa.array(live.astype(np.int64)),
                "w": w.take(pa.array(sel.astype(np.int64))),
                "n": pa.array(n[sel]),
                "tot": pa.array(tot[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        tot = np.zeros(nsrc, np.int64)
        best_n = np.zeros(nsrc, np.int64)
        best_w = [""] * nsrc
        if t.num_rows:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
            tt = t["tot"].combine_chunks().to_numpy(zero_copy_only=False)
            ws = t["w"].combine_chunks().to_pylist()
            np.add.at(tot, s, tt)
            for si, ni, wi in zip(s, n, ws):
                if ni > best_n[si] or (
                    ni == best_n[si] and (best_w[si] == "" or wi < best_w[si])
                ):
                    best_n[si] = ni
                    best_w[si] = wi
        return pa.table(
            {
                "source": srcs,
                "n_tokens": pa.array(tot),
                "top_word": pa.array(best_w, pa.string()),
                "top_count": pa.array(best_n),
                "top_permille": pa.array(
                    1000 * best_n // np.maximum(tot, 1)
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "h", fold, k=shuffle_parts())
    return hash_partition_merge(cells, "s", merge, k=1)


def tape_opener(sf_dir: str) -> Dataset:
    """T132/F: tape opener board — per source of the F1 tokenized
    stream: sequences, DISTINCT opening token ids (a sequence's
    tokens[0]) and the MODAL opener with its count and permille —
    T112's boilerplate-opener detector applied to the flagship payload
    (a tokenizer that emits a BOS-like id every time pins the modal
    opener at 1000‰ — expected; a NON-BOS id dominating marks template
    spam upstream of the model; few distinct openers = low prompt
    diversity, the curriculum-mix smell test).  One dense row per
    source ALWAYS; exact int64 (tokens[1] list-index + row_number over
    (count DESC, id ASC) oracle).

    Scale shape — T131's argmax-reduction on the id axis: the opener
    is one Arrow list-slice per batch (no flatten of the whole tape),
    pre-reducing to (source, first-id, n) cells; ONE id-hash exchange
    settles each opener's per-source count, each partition keeps its
    LOCAL best candidate per source plus (sequences, distinct)
    partials; the k=1 merge picks the best of O(partitions × sources)
    candidates."""
    import glob

    import ray.data as rd

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    ns = len(srcs)

    ds = rd.read_parquet(files, columns=["source", "tokens"])

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        first = pc.list_element(toks, 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        packed = code * (1 << 32) + first
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "si": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ["s", "nseq", "nd", "top_n", "top_id"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("si", use_threads=False).aggregate([("n", "sum")])
        si = g["si"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        s = si >> 32
        tid = si & 0xFFFFFFFF
        nseq = np.zeros(ns, np.int64)
        nd = np.zeros(ns, np.int64)
        np.add.at(nseq, s, n)
        np.add.at(nd, s, 1)
        order = np.lexsort((tid, -n, s))
        s_o = s[order]
        first = np.ones(len(s_o), bool)
        first[1:] = s_o[1:] != s_o[:-1]
        sel = order[first]
        live = s[sel]
        return pa.table(
            {
                "s": pa.array(live.astype(np.int64)),
                "nseq": pa.array(nseq[live]),
                "nd": pa.array(nd[live]),
                "top_n": pa.array(n[sel]),
                "top_id": pa.array(tid[sel].astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nseq = np.zeros(ns, np.int64)
        nd = np.zeros(ns, np.int64)
        top_n = np.zeros(ns, np.int64)
        top_id = np.full(ns, np.iinfo(np.int64).max)
        if t.num_rows:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nseq, s,
                t["nseq"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                nd, s,
                t["nd"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            tn = t["top_n"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            ti = t["top_id"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            for si, ni, ii in zip(s, tn, ti):
                if ni > top_n[si] or (
                    ni == top_n[si] and ii < top_id[si]
                ):
                    top_n[si] = ni
                    top_id[si] = ii
        top_id = np.where(nseq > 0, top_id, 0)
        return pa.table(
            {
                "source": srcs,
                "n_seqs": pa.array(nseq),
                "n_openers": pa.array(nd),
                "top_id": pa.array(top_id),
                "top_count": pa.array(top_n),
                "top_permille": pa.array(
                    1000 * top_n // np.maximum(nseq, 1)
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials, "si", fold, k=_doc_k_files(files)
    )
    return hash_partition_merge(cells, "s", merge, k=1)


def tape_integrity(sf_dir: str) -> Dataset:
    """T133/F: tape length-integrity audit — per source of the F1
    tokenized stream: sequences, Σn_tok as STORED, Σlen(tokens) as
    MEASURED from the list offsets, rows where the two disagree, and
    the worst absolute disagreement — the ingest-contract audit for
    the engine's own invariant (the n_tok column is the rollup
    cascade's weight everywhere; a writer that stamps it wrong skews
    every tier silently, so this board is the first thing to read
    after onboarding a new producer).  Reference parity: the
    validator's length checks on inbound payloads
    (`internal/messages/messages.go` SQL-message field validation)
    recast as a corpus-wide reconciliation.  One dense row per source
    ALWAYS; exact int64 (len(tokens) vs n_tok oracle).

    Scale shape — a pure per-row audit with a sources-bounded result:
    the measured length is one Arrow offsets diff per batch (the
    token VALUES never materialize — `list_value_length` reads the
    offset buffer only), pre-reduced via np.add.at/np.maximum.at to
    dense per-source partials (ns rows per batch); the k=1 merge
    sums/maxes O(partitions × sources) rows.  Zero data shuffles."""
    import glob

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    ns = len(srcs)

    ds = rd.read_parquet(files, columns=["source", "tokens", "n_tok"])

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ln = (
            pc.cast(pc.list_value_length(toks), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        nt = (
            pc.cast(b["n_tok"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        d = np.abs(nt - ln)
        nseq = np.zeros(ns, np.int64)
        snt = np.zeros(ns, np.int64)
        sln = np.zeros(ns, np.int64)
        nmm = np.zeros(ns, np.int64)
        mad = np.zeros(ns, np.int64)
        np.add.at(nseq, code, 1)
        np.add.at(snt, code, nt)
        np.add.at(sln, code, ln)
        np.add.at(nmm, code, (d != 0).astype(np.int64))
        np.maximum.at(mad, code, d)
        return pa.table(
            {
                "s": pa.array(np.arange(ns, dtype=np.int64)),
                "nseq": pa.array(nseq),
                "snt": pa.array(snt),
                "sln": pa.array(sln),
                "nmm": pa.array(nmm),
                "mad": pa.array(mad),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nseq = np.zeros(ns, np.int64)
        snt = np.zeros(ns, np.int64)
        sln = np.zeros(ns, np.int64)
        nmm = np.zeros(ns, np.int64)
        mad = np.zeros(ns, np.int64)
        if t.num_rows:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            for dst, col in (
                (nseq, "nseq"),
                (snt, "snt"),
                (sln, "sln"),
                (nmm, "nmm"),
            ):
                np.add.at(
                    dst, s,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
            np.maximum.at(
                mad, s,
                t["mad"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "source": srcs,
                "n_seqs": pa.array(nseq),
                "sum_n_tok": pa.array(snt),
                "sum_len": pa.array(sln),
                "n_mismatch": pa.array(nmm),
                "max_abs_delta": pa.array(mad),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def tape_window_dups(sf_dir: str) -> Dataset:
    """T134/F: tape repetition-loop board — per source of the F1
    tokenized stream: sequences, sliding 4-token windows, DUPLICATE
    windows (occurrences minus within-sequence distinct — the classic
    decoder repetition-loop signature: a motif stuck on repeat), the
    duplicate permille and sequences with ≥1 dup window — doc-side
    T27 measures duplicated word n-grams ACROSS documents; T134 is
    the within-sequence loop detector on the flagship payload, the
    filter that catches degenerate generations before they poison a
    training mix.  One dense row per source ALWAYS; exact int64 — NO
    hash convention: four ids pack exactly into one int64 (the tape's
    vocab is < 2¹⁶; asserted per batch, fails loudly on a wider
    vocab), so window identity is collision-free on both sides
    (list_transform packing oracle).

    Scale shape — a pure per-row audit (T133's class) with an O(len)
    vectorized kernel: windows are ONE strided expression over each
    batch's flat value buffer (no per-row Python), within-sequence
    distinct via one lexsort over (row, window) + adjacent-equal
    count, np.add.at to dense per-source partials; the k=1 merge
    folds O(partitions × sources) rows.  ZERO data shuffles."""
    import glob

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    ns = len(srcs)

    ds = rd.read_parquet(files, columns=["source", "tokens"])

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ln = (
            pc.cast(pc.list_value_length(toks), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = (
            pc.list_flatten(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if len(v) and int(v.max()) >= (1 << 16):
            raise ValueError(
                "tape_window_dups: token id >= 2^16 — exact 4-token "
                "packing needs a sub-65536 vocab"
            )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        row = np.repeat(np.arange(len(ln)), ln)
        nw_row = np.maximum(ln - 3, 0)
        nd_row = np.zeros(len(ln), np.int64)
        if len(v) >= 4:
            # unsigned packing: 4 x 16-bit ids fill all 64 bits, which
            # overflows SIGNED int64 (ids >= 2^15 set the sign region)
            u = v.astype(np.uint64)
            w = ((u[:-3] * 65536 + u[1:-2]) * 65536 + u[2:-1]) * 65536 + u[3:]
            wrow = row[:-3]
            keep = wrow == row[3:]
            w, wrow = w[keep], wrow[keep]
            order = np.lexsort((w, wrow))
            w, wrow = w[order], wrow[order]
            dup = np.zeros(len(w), bool)
            dup[1:] = (wrow[1:] == wrow[:-1]) & (w[1:] == w[:-1])
            np.add.at(nd_row, wrow, dup.astype(np.int64))
        nseq = np.zeros(ns, np.int64)
        nwin = np.zeros(ns, np.int64)
        ndup = np.zeros(ns, np.int64)
        nwith = np.zeros(ns, np.int64)
        np.add.at(nseq, code, 1)
        np.add.at(nwin, code, nw_row)
        np.add.at(ndup, code, nd_row)
        np.add.at(nwith, code, (nd_row > 0).astype(np.int64))
        return pa.table(
            {
                "s": pa.array(np.arange(ns, dtype=np.int64)),
                "nseq": pa.array(nseq),
                "nwin": pa.array(nwin),
                "ndup": pa.array(ndup),
                "nwith": pa.array(nwith),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nseq = np.zeros(ns, np.int64)
        nwin = np.zeros(ns, np.int64)
        ndup = np.zeros(ns, np.int64)
        nwith = np.zeros(ns, np.int64)
        if t.num_rows:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            for dst, col in (
                (nseq, "nseq"),
                (nwin, "nwin"),
                (ndup, "ndup"),
                (nwith, "nwith"),
            ):
                np.add.at(
                    dst, s,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "source": srcs,
                "n_seqs": pa.array(nseq),
                "n_windows": pa.array(nwin),
                "n_dup_windows": pa.array(ndup),
                "dup_permille": pa.array(
                    1000 * ndup // np.maximum(nwin, 1)
                ),
                "n_seqs_with_dup": pa.array(nwith),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def tape_window_vocab(sf_dir: str) -> Dataset:
    """T135/F: tape motif-vocabulary board — per source of the F1
    tokenized stream: total sliding 4-token windows, DISTINCT windows
    (the source's motif vocabulary), motifs SHARED with at least one
    other source, and the shared permille — the cross-source
    complement of T134 (which loops WITHIN a sequence): a source
    whose motif vocabulary is mostly shared is re-serving the same
    phrasing the rest of the corpus already has (template/mirror
    smell — T104 counts whole duplicated SEQUENCES across sources,
    T135 finds the overlap at sub-sequence granularity where
    mirror-with-edits hides).  One dense row per source ALWAYS; exact
    int64, collision-free: windows pack into one UNSIGNED 64-bit word
    (vocab < 2¹⁶, asserted; bit-cast to int64 for the shuffle key —
    the hash is sign-agnostic).

    Scale shape — T16's exact-count exchange on the motif axis: per
    batch windows are ONE strided expression over the flat value
    buffer, pre-reduced by Arrow group_by to (window, source, n)
    cells; ONE window-hash exchange lands each motif whole across
    ALL sources, where one lexsort settles per-(window, source)
    totals AND each window's source span, re-reducing IN PLACE to
    per-source (occurrences, distinct, shared) partials — the motif
    vocabulary never leaves the partitions; the k=1 merge folds
    O(k × sources) rows."""
    import glob

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    ns = len(srcs)

    ds = rd.read_parquet(files, columns=["source", "tokens"])

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ln = (
            pc.cast(pc.list_value_length(toks), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = (
            pc.list_flatten(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if len(v) and int(v.max()) >= (1 << 16):
            raise ValueError(
                "tape_window_vocab: token id >= 2^16 — exact 4-token "
                "packing needs a sub-65536 vocab"
            )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        row = np.repeat(np.arange(len(ln)), ln)
        if len(v) < 4:
            return pa.table(
                {
                    "w": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        u = v.astype(np.uint64)
        w = ((u[:-3] * 65536 + u[1:-2]) * 65536 + u[2:-1]) * 65536 + u[3:]
        keep = row[:-3] == row[3:]
        w = w[keep].view(np.int64)
        sc = code[row[:-3][keep]]
        t = pa.table(
            {
                "w": pa.array(w),
                "s": pa.array(sc),
                "n": pa.array(np.ones(len(w), np.int64)),
            }
        )
        g = t.group_by(["w", "s"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["w", "s", "n"])

    def fold(t: pa.Table) -> pa.Table:
        cols = ["s", "nwin", "ndist", "nshared"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["w", "s"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        w = g["w"].combine_chunks().to_numpy(zero_copy_only=False)
        s = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(w, kind="stable")
        w, s, n = w[order], s[order], n[order]
        first = np.ones(len(w), bool)
        first[1:] = w[1:] != w[:-1]
        starts = np.flatnonzero(first)
        span = np.diff(np.r_[starts, len(w)])  # sources per window
        shared = np.repeat(span >= 2, span)
        nwin = np.zeros(ns, np.int64)
        ndist = np.zeros(ns, np.int64)
        nshared = np.zeros(ns, np.int64)
        np.add.at(nwin, s, n)
        np.add.at(ndist, s, 1)
        np.add.at(nshared, s, shared.astype(np.int64))
        return pa.table(
            {
                "s": pa.array(np.arange(ns, dtype=np.int64)),
                "nwin": pa.array(nwin),
                "ndist": pa.array(ndist),
                "nshared": pa.array(nshared),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nwin = np.zeros(ns, np.int64)
        ndist = np.zeros(ns, np.int64)
        nshared = np.zeros(ns, np.int64)
        if t.num_rows:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            for dst, col in (
                (nwin, "nwin"),
                (ndist, "ndist"),
                (nshared, "nshared"),
            ):
                np.add.at(
                    dst, s,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "source": srcs,
                "n_windows": pa.array(nwin),
                "n_distinct": pa.array(ndist),
                "n_shared": pa.array(nshared),
                "shared_permille": pa.array(
                    1000 * nshared // np.maximum(ndist, 1)
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials, "w", fold, k=_doc_k_files(files)
    )
    return hash_partition_merge(cells, "s", merge, k=1)


def tape_novelty_saturation(sf_dir: str) -> Dataset:
    """T136/F: within-sequence novelty-saturation quantiles — per
    source of the F1 tokenized stream: sequences and the discrete
    p50/p90 of each sequence's SATURATION POINT (the 1-based position
    of its LAST first-occurrence token, as a permille of length) —
    where inside a sequence the id stream stops introducing new
    vocabulary (T134 detects literal loops, T135 cross-source motif
    reuse; T136 the novelty PROFILE: saturation near 200‰ means the
    tail is pure recombination of an opening header — template or
    boilerplate-generated text; near 1000‰ means novelty to the last
    token, the profile of natural prose).  One dense row per source
    ALWAYS over non-empty sequences; exact int64 under the
    quantile_disc rank rule (min(pos)-per-(doc, token) + max + integer
    permille oracle; lengths measured from the list offsets).

    Scale shape — a per-row audit whose kernel is one lexsort: per
    batch flatten once, sort (row, token, position), first-of-group
    marks every within-sequence first occurrence, np.maximum.at folds
    them to per-row saturation positions; the permille domain is
    [0, 1000] so partials are (source, permille) histogram cells and
    the k=1 merge input is ≤ sources × 1001 rows.  ZERO data
    shuffles; the token VALUES never leave the batch."""
    import glob

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    ns = len(srcs)

    ds = rd.read_parquet(files, columns=["source", "tokens"])

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ln = (
            pc.cast(pc.list_value_length(toks), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = (
            pc.list_flatten(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        row = np.repeat(np.arange(len(ln)), ln)
        starts = np.r_[0, np.cumsum(ln)[:-1]]
        pos = np.arange(len(v)) - starts[row] + 1
        sat = np.zeros(len(ln), np.int64)
        if len(v):
            order = np.lexsort((pos, v, row))
            r_o, v_o, p_o = row[order], v[order], pos[order]
            first = np.ones(len(v), bool)
            first[1:] = (r_o[1:] != r_o[:-1]) | (v_o[1:] != v_o[:-1])
            np.maximum.at(sat, r_o[first], p_o[first])
        keep = ln >= 1
        pm = 1000 * sat[keep] // ln[keep]
        sp = code[keep] * 1024 + pm
        vals, cnt = np.unique(sp, return_counts=True)
        return pa.table(
            {
                "sp": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n_seqs = np.zeros(ns, np.int64)
        p50 = np.zeros(ns, np.int64)
        p90 = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("sp", use_threads=False).aggregate(
                [("n", "sum")]
            )
            sp = g["sp"].combine_chunks().to_numpy(zero_copy_only=False)
            n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.argsort(sp, kind="stable")
            sp, n = sp[order], n[order]
            src = sp // 1024
            pm = sp % 1024
            first = np.ones(len(sp), bool)
            first[1:] = src[1:] != src[:-1]
            starts = np.flatnonzero(first)
            ends = np.r_[starts[1:], len(sp)]
            cum = np.cumsum(n)
            base = np.where(starts > 0, cum[starts - 1], 0)
            tot = cum[ends - 1] - base
            keys = src[starts]
            n_seqs[keys] = tot
            for dst, q in ((p50, 500), (p90, 900)):
                thr = (tot * q + 999) // 1000
                dst[keys] = pm[
                    np.searchsorted(cum, base + thr, side="left")
                ]
        return pa.table(
            {
                "source": srcs,
                "n_seqs": pa.array(n_seqs),
                "p50_saturation": pa.array(p50),
                "p90_saturation": pa.array(p90),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "sp", merge, k=1)


def bag_dedup_board(sf_dir: str) -> Dataset:
    """T137: bag-of-words dedup board — per source: docs, distinct
    word MULTISETS (bags) among its docs, docs in corpus-wide bag
    groups ≥2, docs in exact-TEXT groups ≥2, and the difference:
    REORDERED duplicates — same words, same multiplicities, shuffled
    order — the paraphrase/shuffle-spam layer that T1's exact dedup
    is blind to and T2/T3's shingle sketches see only dimly (a
    shuffle destroys every n-gram but preserves the bag exactly).
    One dense row per source ALWAYS; bag identity on the engine side
    is the documented collision-hash convention (an order-invariant
    sum/sum-of-squares/length combine of the blake2b word hashes,
    wrapping uint64), while the oracle groups by the TRUE sorted word
    list — collision-free — so a signature collision would surface
    as a driver mismatch rather than hide.  Exact int64 counts.

    Scale shape — T135's exact-count exchange with a two-level group
    finish: per batch ONE split + dictionary-encode hashes every
    unique word once (batch_word_hashes), bags reduce to one
    order-invariant signature per doc via two np.add.reduceat passes
    — the words never leave the batch; ONE bag-signature exchange
    lands each bag group whole (text-hash rides along: a text group
    is always inside a bag group, so text dups settle in the same
    partition), re-reducing IN PLACE to dense per-source partials;
    k=1 merge.  The doc texts never shuffle."""
    from ..functions.textstats import batch_word_hashes, word_hash64
    from ..stages.shuffle import hash_partition_merge

    path = f"{sf_dir}/documents.parquet"
    srcs = pa.array(
        sorted(rd.read_parquet(path, columns=["source"]).unique("source")),
        pa.string(),
    )
    ns = len(srcs)
    C = np.uint64(2654435761)

    ds = rd.read_parquet(
        path, columns=["source", "text"], override_num_blocks=_doc_k(sf_dir)
    )

    def partial(b: pa.Table) -> pa.Table:
        hv, nw = batch_word_hashes(b["text"])
        starts = np.r_[0, np.cumsum(nw)[:-1]].astype(np.int64)
        if len(hv):
            s1 = np.add.reduceat(hv, starts)
            s2 = np.add.reduceat(hv * hv, starts)
        else:
            s1 = np.zeros(len(nw), np.uint64)
            s2 = np.zeros(len(nw), np.uint64)
        sig = ((s1 * C + s2) * C + nw.astype(np.uint64)).view(np.int64)
        texts = b["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        th = np.fromiter(
            (word_hash64(t) for t in texts.to_pylist()),
            dtype=np.uint64,
            count=len(texts),
        ).view(np.int64)
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "sig": pa.array(sig),
                "th": pa.array(th),
                "s": pa.array(code),
                "n": pa.array(np.ones(len(sig), np.int64)),
            }
        )
        g = t.group_by(["sig", "th", "s"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["sig", "th", "s", "n"])

    def fold(t: pa.Table) -> pa.Table:
        cols = ["s", "nd", "nb", "nbd", "ntd"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["sig", "th", "s"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        sig = g["sig"].combine_chunks().to_numpy(zero_copy_only=False)
        th = g["th"].combine_chunks().to_numpy(zero_copy_only=False)
        s = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((s, th, sig))
        sig, th, s, n = sig[order], th[order], s[order], n[order]
        # per-sig totals (bag-group size), broadcast to rows
        bfirst = np.ones(len(sig), bool)
        bfirst[1:] = sig[1:] != sig[:-1]
        bstarts = np.flatnonzero(bfirst)
        bspan = np.diff(np.r_[bstarts, len(sig)])
        bn = np.repeat(np.add.reduceat(n, bstarts), bspan)
        # per-(sig, text) totals (text-group size)
        tfirst = bfirst | np.r_[True, th[1:] != th[:-1]]
        tstarts = np.flatnonzero(tfirst)
        tspan = np.diff(np.r_[tstarts, len(sig)])
        tn = np.repeat(np.add.reduceat(n, tstarts), tspan)
        nd = np.zeros(ns, np.int64)
        nbd = np.zeros(ns, np.int64)
        ntd = np.zeros(ns, np.int64)
        nb = np.zeros(ns, np.int64)
        np.add.at(nd, s, n)
        np.add.at(nbd, s, np.where(bn >= 2, n, 0))
        np.add.at(ntd, s, np.where(tn >= 2, n, 0))
        # distinct bags OWNED per source: first (sig, s) occurrence
        o2 = np.lexsort((sig, s))
        s2, sig2 = s[o2], sig[o2]
        ofirst = np.ones(len(s2), bool)
        ofirst[1:] = (s2[1:] != s2[:-1]) | (sig2[1:] != sig2[:-1])
        np.add.at(nb, s2[ofirst], 1)
        return pa.table(
            {
                "s": pa.array(np.arange(ns, dtype=np.int64)),
                "nd": pa.array(nd),
                "nb": pa.array(nb),
                "nbd": pa.array(nbd),
                "ntd": pa.array(ntd),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nd = np.zeros(ns, np.int64)
        nb = np.zeros(ns, np.int64)
        nbd = np.zeros(ns, np.int64)
        ntd = np.zeros(ns, np.int64)
        if t.num_rows:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            for dst, col in (
                (nd, "nd"), (nb, "nb"), (nbd, "nbd"), (ntd, "ntd")
            ):
                np.add.at(
                    dst, s,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "source": srcs,
                "n_docs": pa.array(nd),
                "n_bags": pa.array(nb),
                "n_bagdup_docs": pa.array(nbd),
                "n_textdup_docs": pa.array(ntd),
                "n_reordered": pa.array(nbd - ntd),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "sig", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(cells, "s", merge, k=1)


def template_slots(sf_dir: str, k_pos: int = 16) -> Dataset:
    """T138: template-slot lock board — per source, over the first
    ``k_pos`` word POSITIONS: docs, LOCKED positions (the modal word at
    that position covers ≥900‰ of the docs that reach it), and the
    summed per-position modal share — the structural-template detector
    (T112/T132 ask about position 1 only; T137 catches whole-doc
    reorders; T138 measures how deep the boilerplate header runs — 3+
    locked slots is a letterhead, 16 is a form with blanks, and the
    locked prefix length is exactly what a dedup-by-suffix or
    strip-header transform needs as input).  One dense row per source
    ALWAYS; exact int64 (parallel-unnest list-slice + per-position
    row_number-free modal share via max(count) oracle; word identity
    via the collision-hash convention engine-side, true strings in
    the oracle).

    Scale shape — a bounded-cell exchange on (source, position): per
    batch ONE split + dictionary-encode (batch_word_hashes), a mask
    keeps flat indices with position < k_pos (the tails never leave
    the batch), one packed np.unique to (source·position, word-hash,
    n) cells; ONE (source, position)-hash exchange settles each
    slot's word histogram whole — ≤ sources × k_pos cells exist, each
    bounded by the slot's vocabulary; the k=1 merge folds ≤ sources ×
    k_pos rows."""
    from ..functions.textstats import batch_word_hashes
    from ..stages.shuffle import hash_partition_merge

    path = f"{sf_dir}/documents.parquet"
    srcs = pa.array(
        sorted(rd.read_parquet(path, columns=["source"]).unique("source")),
        pa.string(),
    )
    ns = len(srcs)

    ds = rd.read_parquet(
        path, columns=["source", "text"], override_num_blocks=_doc_k(sf_dir)
    )

    def partial(b: pa.Table) -> pa.Table:
        hv, nw = batch_word_hashes(b["text"])
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        row = np.repeat(np.arange(len(nw)), nw)
        starts = np.r_[0, np.cumsum(nw)[:-1]].astype(np.int64)
        pos = np.arange(len(hv)) - starts[row]
        keep = pos < k_pos
        sp = code[row[keep]] * k_pos + pos[keep]
        h = hv[keep].view(np.int64)
        t = pa.table(
            {
                "sp": pa.array(sp.astype(np.int64)),
                "h": pa.array(h),
                "n": pa.array(np.ones(len(sp), np.int64)),
            }
        )
        g = t.group_by(["sp", "h"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["sp", "h", "n"])

    def fold(t: pa.Table) -> pa.Table:
        cols = ["s", "p", "tot", "share", "locked"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["sp", "h"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        sp = g["sp"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(sp, kind="stable")
        sp, n = sp[order], n[order]
        first = np.ones(len(sp), bool)
        first[1:] = sp[1:] != sp[:-1]
        starts = np.flatnonzero(first)
        tot = np.add.reduceat(n, starts)
        mx = np.maximum.reduceat(n, starts)
        share = 1000 * mx // tot
        return pa.table(
            {
                "s": pa.array((sp[starts] // k_pos).astype(np.int64)),
                "p": pa.array((sp[starts] % k_pos).astype(np.int64)),
                "tot": pa.array(tot.astype(np.int64)),
                "share": pa.array(share.astype(np.int64)),
                "locked": pa.array((share >= 900).astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nd = np.zeros(ns, np.int64)
        nl = np.zeros(ns, np.int64)
        ss = np.zeros(ns, np.int64)
        if t.num_rows:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            p = t["p"].combine_chunks().to_numpy(zero_copy_only=False)
            tot = t["tot"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(nd, s[p == 0], tot[p == 0])
            np.add.at(
                nl, s,
                t["locked"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                ss, s,
                t["share"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "source": srcs,
                "n_docs": pa.array(nd),
                "n_locked": pa.array(nl),
                "sum_share": pa.array(ss),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "sp", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(cells, "s", merge, k=1)


def tape_prefix_dedup(sf_dir: str, k_pre: int = 32) -> Dataset:
    """T139/F: tape anchored-prefix dedup board — per source of the F1
    tokenized stream: sequences, DISTINCT ``k_pre``-token prefixes
    (a sequence shorter than ``k_pre`` contributes its whole token
    list), sequences in corpus-wide prefix groups ≥2, and sequences
    whose prefix group spans ≥2 sources — the shared-system-prompt /
    common-header detector (T135's sliding motifs find reuse ANYWHERE
    in a sequence; T139 anchors at position 0, where instruction
    templates and injected prompts live — the mass a
    strip-common-prefix transform would reclaim before training).
    One dense row per source ALWAYS; engine-side prefix identity is
    the documented collision-hash convention (a position-weighted
    polynomial over uint64, wrapping), the oracle groups by the TRUE
    token-list slice — collision-free — so a hash collision surfaces
    as a driver mismatch rather than hiding.  Exact int64 counts.

    Scale shape — T137's signature exchange with an anchored kernel:
    per batch the prefix hash is ONE masked position-weighted
    multiply-add over the flat value buffer (tails beyond ``k_pre``
    never contribute), reduced by Arrow group_by to (signature,
    source, n) cells; ONE signature exchange lands each prefix group
    whole across ALL sources (one lexsort settles group size + source
    span), re-reducing IN PLACE to dense per-source partials; k=1
    merge.  The token arrays never shuffle."""
    import glob

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    ns = len(srcs)
    M = np.uint64(0x9E3779B97F4A7C15)
    POW = np.empty(k_pre, np.uint64)
    POW[0] = 1
    for i in range(1, k_pre):
        POW[i] = POW[i - 1] * M

    ds = rd.read_parquet(files, columns=["source", "tokens"])

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ln = (
            pc.cast(pc.list_value_length(toks), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = (
            pc.list_flatten(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        row = np.repeat(np.arange(len(ln)), ln)
        starts = np.r_[0, np.cumsum(ln)[:-1]].astype(np.int64)
        pos = np.arange(len(v)) - starts[row]
        keep = pos < k_pre
        sig = np.full(len(ln), np.uint64(0x8000000000000001))
        contrib = (v[keep] + np.uint64(1)) * POW[pos[keep]]
        np.add.at(sig, row[keep], contrib)
        sig = (sig * M + np.minimum(ln, k_pre).astype(np.uint64)).view(
            np.int64
        )
        t = pa.table(
            {
                "sig": pa.array(sig),
                "s": pa.array(code),
                "n": pa.array(np.ones(len(sig), np.int64)),
            }
        )
        g = t.group_by(["sig", "s"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return g.rename_columns(["sig", "s", "n"])

    def fold(t: pa.Table) -> pa.Table:
        cols = ["s", "nd", "npre", "ndup", "ncross"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["sig", "s"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        sig = g["sig"].combine_chunks().to_numpy(zero_copy_only=False)
        s = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((s, sig))
        sig, s, n = sig[order], s[order], n[order]
        first = np.ones(len(sig), bool)
        first[1:] = sig[1:] != sig[:-1]
        starts = np.flatnonzero(first)
        span = np.diff(np.r_[starts, len(sig)])
        tot = np.repeat(np.add.reduceat(n, starts), span)
        nsrc = np.repeat(span, span)  # rows per sig == distinct sources
        nd = np.zeros(ns, np.int64)
        npre = np.zeros(ns, np.int64)
        ndup = np.zeros(ns, np.int64)
        ncross = np.zeros(ns, np.int64)
        np.add.at(nd, s, n)
        np.add.at(npre, s, 1)
        np.add.at(ndup, s, np.where(tot >= 2, n, 0))
        np.add.at(ncross, s, np.where(nsrc >= 2, n, 0))
        return pa.table(
            {
                "s": pa.array(np.arange(ns, dtype=np.int64)),
                "nd": pa.array(nd),
                "npre": pa.array(npre),
                "ndup": pa.array(ndup),
                "ncross": pa.array(ncross),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nd = np.zeros(ns, np.int64)
        npre = np.zeros(ns, np.int64)
        ndup = np.zeros(ns, np.int64)
        ncross = np.zeros(ns, np.int64)
        if t.num_rows:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            for dst, col in (
                (nd, "nd"),
                (npre, "npre"),
                (ndup, "ndup"),
                (ncross, "ncross"),
            ):
                np.add.at(
                    dst, s,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "source": srcs,
                "n_seqs": pa.array(nd),
                "n_prefixes": pa.array(npre),
                "n_dup_prefix": pa.array(ndup),
                "n_cross_source": pa.array(ncross),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials, "sig", fold, k=_doc_k_files(files)
    )
    return hash_partition_merge(cells, "s", merge, k=1)


def tape_thirds_vocab(sf_dir: str) -> Dataset:
    """T140/F: tape thirds vocabulary profile — per (source, relative
    third of each sequence: opening 0 / middle 1 / closing 2, third =
    3·pos // len): token occurrences, DISTINCT ids, and the distinct
    permille — the positional id-diversity profile on the flagship
    payload (T130 splits DOCUMENT stopword mass by thirds; T132/T139
    look only at the opening; T140 asks where in a sequence the
    tokenizer's working vocabulary lives — an opening third at 1/10th
    the closing third's diversity is a fixed instruction header, a
    closing third that collapses is a templated sign-off).  One dense
    row per (source, third) ALWAYS; exact int64 (parallel-unnest
    position + count DISTINCT oracle — true ids, no hashing).

    Scale shape — E121's dedupe exchange on the id axis: positions
    are one arange-minus-offsets per batch, pre-reduced by packed
    np.unique to (source·third, id, n) cells; ONE id-hash exchange
    settles each (source, third, id) cell exactly (an id lands in one
    partition), re-reducing IN PLACE to (source, third) occurrence +
    distinct partials — additive because cells are globally distinct;
    the k=1 merge folds ≤ k × sources × 3 rows."""
    import glob

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    ns = len(srcs)

    ds = rd.read_parquet(files, columns=["source", "tokens"])

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ln = (
            pc.cast(pc.list_value_length(toks), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = (
            pc.list_flatten(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        row = np.repeat(np.arange(len(ln)), ln)
        starts = np.r_[0, np.cumsum(ln)[:-1]].astype(np.int64)
        pos = np.arange(len(v)) - starts[row]
        third = 3 * pos // ln[row]
        st = code[row] * 4 + third
        packed = st * (1 << 32) + v
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "id": pa.array((vals & 0xFFFFFFFF).astype(np.int64)),
                "st": pa.array((vals >> 32).astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ["st", "ntok", "ndist"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        packed = (
            t["st"].combine_chunks().to_numpy(zero_copy_only=False)
            * (1 << 32)
            + t["id"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        g = (
            pa.table({"p": pa.array(packed), "n": pa.array(n)})
            .group_by("p", use_threads=False)
            .aggregate([("n", "sum")])
        )
        p = g["p"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        st = p >> 32
        ntok = np.zeros(ns * 4, np.int64)
        ndist = np.zeros(ns * 4, np.int64)
        np.add.at(ntok, st, n)
        np.add.at(ndist, st, 1)
        live = np.flatnonzero(ntok)
        return pa.table(
            {
                "st": pa.array(live.astype(np.int64)),
                "ntok": pa.array(ntok[live]),
                "ndist": pa.array(ndist[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        ntok = np.zeros(ns * 4, np.int64)
        ndist = np.zeros(ns * 4, np.int64)
        if t.num_rows:
            st = t["st"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                ntok, st,
                t["ntok"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                ndist, st,
                t["ndist"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(ntok)
        return pa.table(
            {
                "source": srcs.take(
                    pa.array((live // 4).astype(np.int64))
                ),
                "third": pa.array((live % 4).astype(np.int64)),
                "n_tokens": pa.array(ntok[live]),
                "n_distinct": pa.array(ndist[live]),
                "distinct_permille": pa.array(
                    1000 * ndist[live] // ntok[live]
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials, "id", fold, k=_doc_k_files(files)
    )
    return hash_partition_merge(cells, "st", merge, k=1)


def tape_boundary_audit(sf_dir: str) -> Dataset:
    """T141/F: tape boundary-token packing audit — per source of the
    F1 tokenized stream: sequences, the source's MODAL opening id
    (its de-facto BOS, ties → smallest id), sequences actually
    starting with it (+ permille), and sequences where that id ALSO
    appears at an INTERIOR position — the packing-error detector (a
    BOS-like id mid-sequence means two documents were concatenated
    without resetting the boundary, exactly the corruption T22's
    sequence packer must never emit; T132 finds the modal opener,
    T141 turns it into a contract and audits the tape against it).
    One dense row per source ALWAYS; exact int64 (row_number modal +
    list_filter interior-scan oracle — true ids, no hashing).

    Scale shape — TWO streaming passes over the tape, no data
    shuffle in either: pass 1 is T132's argmax-reduction (one id-hash
    exchange over (source, first-id, n) cells) whose result — ONE id
    per source — broadcasts to pass 2; pass 2 is a pure per-row scan
    (one vectorized equality over the flat value buffer, np.add.at to
    dense per-source partials) folded by a k=1 merge."""
    import glob

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    ns = len(srcs)

    # pass 1: modal opener per source (tape_opener's reduction, narrowed)
    op = tape_opener(sf_dir).to_pandas().set_index("source")
    open_id = np.array(
        [int(op.loc[s, "top_id"]) for s in srcs.to_pylist()], np.int64
    )

    ds = rd.read_parquet(files, columns=["source", "tokens"])

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ln = (
            pc.cast(pc.list_value_length(toks), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = (
            pc.list_flatten(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        row = np.repeat(np.arange(len(ln)), ln)
        starts = np.r_[0, np.cumsum(ln)[:-1]].astype(np.int64)
        want = open_id[code[row]]
        is_first = np.zeros(len(v), bool)
        is_first[starts[ln >= 1]] = True
        hit = v == want
        opens = np.zeros(len(ln), bool)
        opens[row[hit & is_first]] = True
        inter = np.zeros(len(ln), bool)
        inter[row[hit & ~is_first]] = True
        nseq = np.zeros(ns, np.int64)
        nop = np.zeros(ns, np.int64)
        nint = np.zeros(ns, np.int64)
        np.add.at(nseq, code, 1)
        np.add.at(nop, code, opens.astype(np.int64))
        np.add.at(nint, code, inter.astype(np.int64))
        return pa.table(
            {
                "s": pa.array(np.arange(ns, dtype=np.int64)),
                "nseq": pa.array(nseq),
                "nop": pa.array(nop),
                "nint": pa.array(nint),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nseq = np.zeros(ns, np.int64)
        nop = np.zeros(ns, np.int64)
        nint = np.zeros(ns, np.int64)
        if t.num_rows:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            for dst, col in ((nseq, "nseq"), (nop, "nop"), (nint, "nint")):
                np.add.at(
                    dst, s,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "source": srcs,
                "n_seqs": pa.array(nseq),
                "open_id": pa.array(open_id),
                "n_open": pa.array(nop),
                "open_permille": pa.array(
                    1000 * nop // np.maximum(nseq, 1)
                ),
                "n_interior": pa.array(nint),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def tape_monotonicity(sf_dir: str) -> Dataset:
    """T142/F: tape monotonicity audit — per source of the F1
    tokenized stream: sequences, adjacent token pairs, NON-DECREASING
    pairs (+ permille), and fully-sorted sequences (every adjacent
    pair non-decreasing; length ≤1 is vacuously sorted) — the
    table-dump detector (natural text tokenizes to ids with no order
    structure — asc_permille ~500; a sequence of SORTED ids is an
    index, a numeric table column or an artifact of synthetic
    generation, exactly the non-linguistic payload a curriculum mix
    wants flagged; T134 catches loops, T142 catches ORDER).  One
    dense row per source ALWAYS; exact int64 (list_filter
    adjacent-compare oracle — true ids).

    Scale shape — a pure per-row audit: ONE shifted comparison over
    each batch's flat value buffer (pairs crossing row boundaries
    masked), np.add.at to dense per-source partials; k=1 merge.
    ZERO data shuffles."""
    import glob

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    ns = len(srcs)

    ds = rd.read_parquet(files, columns=["source", "tokens"])

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ln = (
            pc.cast(pc.list_value_length(toks), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = (
            pc.list_flatten(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        row = np.repeat(np.arange(len(ln)), ln)
        pairs_row = np.maximum(ln - 1, 0)
        asc_row = np.zeros(len(ln), np.int64)
        if len(v) >= 2:
            same = row[:-1] == row[1:]
            asc = (v[1:] >= v[:-1]) & same
            np.add.at(asc_row, row[:-1][asc], 1)
        nseq = np.zeros(ns, np.int64)
        npair = np.zeros(ns, np.int64)
        nasc = np.zeros(ns, np.int64)
        nsort = np.zeros(ns, np.int64)
        np.add.at(nseq, code, 1)
        np.add.at(npair, code, pairs_row)
        np.add.at(nasc, code, asc_row)
        np.add.at(
            nsort, code, (asc_row == pairs_row).astype(np.int64)
        )
        return pa.table(
            {
                "s": pa.array(np.arange(ns, dtype=np.int64)),
                "nseq": pa.array(nseq),
                "npair": pa.array(npair),
                "nasc": pa.array(nasc),
                "nsort": pa.array(nsort),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nseq = np.zeros(ns, np.int64)
        npair = np.zeros(ns, np.int64)
        nasc = np.zeros(ns, np.int64)
        nsort = np.zeros(ns, np.int64)
        if t.num_rows:
            s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
            for dst, col in (
                (nseq, "nseq"),
                (npair, "npair"),
                (nasc, "nasc"),
                (nsort, "nsort"),
            ):
                np.add.at(
                    dst, s,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "source": srcs,
                "n_seqs": pa.array(nseq),
                "n_pairs": pa.array(npair),
                "n_ascending": pa.array(nasc),
                "asc_permille": pa.array(
                    1000 * nasc // np.maximum(npair, 1)
                ),
                "n_sorted": pa.array(nsort),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def tape_vocab_jaccard(sf_dir: str) -> Dataset:
    """T143/F: tape vocabulary-Jaccard matrix — for each unordered
    source pair (a < b): DISTINCT token ids seen by BOTH and the exact
    Jaccard permille (1000·|A∩B| // |A∪B|) — the tokenizer-level
    source-similarity matrix on the flagship payload (T38's
    doc_vocab_overlap does this for WORD vocabularies; T135 for
    4-token motifs; T143 asks the coarsest version — do two tape
    sources even speak the same id space — the first check before
    pooling them into one training mix, and the one that catches a
    mis-tokenized source instantly).  One row per pair ALWAYS; exact
    int64 (DISTINCT (source, id) self-join oracle — true ids).

    Scale shape — ONE id-hash exchange finishing in a BITSET domain
    (R62's basket pattern on the id axis): per batch one packed
    np.unique to distinct (source, id) cells; the exchange lands each
    id whole, where ids collapse to ONE per-source-set bitmask each
    (≤64 sources, asserted) and partials are (mask, n) counts — the
    k=1 merge expands pair intersections from O(distinct masks) rows
    and reads |A|, |B| off the same counts.  The vocabulary never
    leaves the partitions."""
    import glob

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    ns = len(srcs)
    if ns > 64:
        raise ValueError(
            "tape_vocab_jaccard: >64 sources — bitset packing needs a "
            "wider mask"
        )

    ds = rd.read_parquet(files, columns=["source", "tokens"])

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ln = (
            pc.cast(pc.list_value_length(toks), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = (
            pc.list_flatten(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        row = np.repeat(np.arange(len(ln)), ln)
        cells = np.unique(v * 64 + code[row])
        return pa.table(
            {
                "id": pa.array((cells // 64).astype(np.int64)),
                "s": pa.array((cells % 64).astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "mask": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        cells = np.unique(
            t["id"].combine_chunks().to_numpy(zero_copy_only=False) * 64
            + t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        ids = cells // 64
        bit = np.uint64(1) << (cells % 64).astype(np.uint64)
        first = np.ones(len(ids), bool)
        first[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(first)
        masks = np.bitwise_or.reduceat(bit, starts)
        mv, mc = np.unique(masks, return_counts=True)
        return pa.table(
            {
                "mask": pa.array(mv.view(np.int64)),
                "n": pa.array(mc.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        inter = np.zeros((ns, ns), np.int64)
        size = np.zeros(ns, np.int64)
        if t.num_rows:
            g = t.group_by("mask", use_threads=False).aggregate(
                [("n", "sum")]
            )
            mv = (
                g["mask"].combine_chunks().to_numpy(zero_copy_only=False)
                .view(np.uint64)
            )
            mc = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            for m, c in zip(mv, mc):
                bits = np.flatnonzero(
                    (m >> np.arange(ns, dtype=np.uint64)) & np.uint64(1)
                )
                size[bits] += c
                if len(bits) >= 2:
                    a, b = np.triu_indices(len(bits), k=1)
                    inter[bits[a], bits[b]] += c
        a, b = np.triu_indices(ns, k=1)
        shared = inter[a, b]
        union = size[a] + size[b] - shared
        return pa.table(
            {
                "source_a": srcs.take(pa.array(a.astype(np.int64))),
                "source_b": srcs.take(pa.array(b.astype(np.int64))),
                "n_shared": pa.array(shared),
                "jaccard_permille": pa.array(
                    1000 * shared // np.maximum(union, 1)
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials, "id", fold, k=_doc_k_files(files)
    )
    return hash_partition_merge(cells, "mask", merge, k=1)


def tape_chunk_waste(
    sf_dir: str, sizes: tuple[int, ...] = (256, 512, 1024, 2048)
) -> Dataset:
    """T144/F: tape chunk-waste curve — per (source, context length):
    tokens, fixed-length chunks needed when each sequence is padded
    into its own chunks (no cross-document packing), padding waste,
    and the waste permille of the padded volume — the context-length
    planning board on the flagship payload (T58's doc-side curve
    prices chunking over WORD counts corpus-wide; T144 prices it per
    SOURCE over real token lengths — the table that says which
    context length each source can afford before T22's cross-document
    packing becomes mandatory).  One dense row per (source, size)
    ALWAYS; exact int64 (ceil-div unnest oracle).

    Scale shape — a pure per-row audit that never touches the token
    column at all: the read is pruned to (source, n_tok) — two narrow
    columns for a table whose mass is the lists (T133 audits that
    n_tok equals the true lengths, so this board rides the stamped
    column); four ceil-divs per row, np.add.at to dense (source ×
    sizes) partials; k=1 merge.  ZERO data shuffles."""
    import glob

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    ns = len(srcs)
    nsz = len(sizes)
    size_arr = np.array(sizes, np.int64)

    ds = rd.read_parquet(files, columns=["source", "n_tok"])

    def partial(b: pa.Table) -> pa.Table:
        ln = (
            pc.cast(b["n_tok"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ntok = np.zeros(ns * nsz, np.int64)
        nch = np.zeros(ns * nsz, np.int64)
        waste = np.zeros(ns * nsz, np.int64)
        for j, c in enumerate(size_arr):
            ch = (ln + c - 1) // c
            idx = code * nsz + j
            np.add.at(ntok, idx, ln)
            np.add.at(nch, idx, ch)
            np.add.at(waste, idx, ch * c - ln)
        live = np.arange(ns * nsz, dtype=np.int64)
        return pa.table(
            {
                "sc": pa.array(live),
                "ntok": pa.array(ntok),
                "nch": pa.array(nch),
                "waste": pa.array(waste),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        ntok = np.zeros(ns * nsz, np.int64)
        nch = np.zeros(ns * nsz, np.int64)
        waste = np.zeros(ns * nsz, np.int64)
        if t.num_rows:
            sc = t["sc"].combine_chunks().to_numpy(zero_copy_only=False)
            for dst, col in (
                (ntok, "ntok"), (nch, "nch"), (waste, "waste")
            ):
                np.add.at(
                    dst, sc,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        idx = np.arange(ns * nsz)
        return pa.table(
            {
                "source": srcs.take(
                    pa.array((idx // nsz).astype(np.int64))
                ),
                "chunk_len": pa.array(size_arr[idx % nsz]),
                "n_tokens": pa.array(ntok),
                "n_chunks": pa.array(nch),
                "pad_waste": pa.array(waste),
                "waste_permille": pa.array(
                    1000 * waste // np.maximum(ntok + waste, 1)
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "sc", merge, k=1)


def tape_motif_spectrum(sf_dir: str) -> Dataset:
    """T145/F: tape motif frequency spectrum — corpus-wide, per
    occurrence band (1 / 2-3 / 4-10 / 11-100 / >100): DISTINCT
    4-token motifs whose total occurrence count falls in the band,
    and their occurrences — the redundancy fingerprint of the id
    stream (T94's shingle-df spectrum draws this for word shingles;
    T135 names which sources SHARE motifs; T145 says how the motif
    mass distributes — a fat >100 band is templated generation, a
    spectrum hugging 1 is high-entropy prose, and the shape predicts
    what T2/T3's sketch-based dedup will find before running it).
    One dense row per band ALWAYS; exact int64, collision-free
    UNSIGNED packing (T134's convention; list_transform + unnest
    oracle).

    Scale shape — T135's motif exchange with a band finish: windows
    are ONE strided expression per batch, Arrow group_by to (window,
    n) cells; ONE window-hash exchange settles each motif's total
    exactly and re-reduces IN PLACE to a ≤5-row band histogram per
    partition; the k=1 merge folds O(k × 5) rows.  The motif
    vocabulary never leaves the partitions."""
    import glob

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    ds = rd.read_parquet(files, columns=["tokens"])

    EDGES = np.array([1, 3, 10, 100], np.int64)  # band = searchsorted

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ln = (
            pc.cast(pc.list_value_length(toks), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = (
            pc.list_flatten(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if len(v) and int(v.max()) >= (1 << 16):
            raise ValueError(
                "tape_motif_spectrum: token id >= 2^16 — exact 4-token "
                "packing needs a sub-65536 vocab"
            )
        row = np.repeat(np.arange(len(ln)), ln)
        if len(v) < 4:
            return pa.table(
                {
                    "w": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        u = v.astype(np.uint64)
        w = ((u[:-3] * 65536 + u[1:-2]) * 65536 + u[2:-1]) * 65536 + u[3:]
        keep = row[:-3] == row[3:]
        vals, cnt = np.unique(w[keep].view(np.int64), return_counts=True)
        return pa.table(
            {
                "w": pa.array(vals),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "nm": pa.array([], pa.int64()),
                    "no": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("w", use_threads=False).aggregate([("n", "sum")])
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        band = np.searchsorted(EDGES, n, side="left").astype(np.int64)
        nm = np.zeros(5, np.int64)
        no = np.zeros(5, np.int64)
        np.add.at(nm, band, 1)
        np.add.at(no, band, n)
        live = np.flatnonzero(nm)
        return pa.table(
            {
                "band": pa.array(live.astype(np.int64)),
                "nm": pa.array(nm[live]),
                "no": pa.array(no[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nm = np.zeros(5, np.int64)
        no = np.zeros(5, np.int64)
        if t.num_rows:
            b = t["band"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nm, b,
                t["nm"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                no, b,
                t["no"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(nm)
        return pa.table(
            {
                "df_band": pa.array(live.astype(np.int64)),
                "n_motifs": pa.array(nm[live]),
                "n_occurrences": pa.array(no[live]),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials, "w", fold, k=_doc_k_files(files)
    )
    return hash_partition_merge(cells, "band", merge, k=1)




def tape_vocab_pareto(sf_dir: str) -> Dataset:
    """T146/F: tape vocabulary-Pareto board — per source: total token
    occurrences, DISTINCT ids, and the MINIMUM number of distinct ids
    whose occurrences cover >= 50% / 90% of the source's token mass
    (v500/v900) — the "how big a vocabulary do you actually need"
    number an embedding-table budget reads (T129 measures id-SPAN
    utilization, T79 draws the usage heatmap, T16 names the top ids;
    T146 collapses the whole frequency curve to its Pareto knees — a
    v900 in the hundreds is a templated id stream, in the tens of
    thousands it's prose).  One dense row per source ALWAYS; exact
    int64 — the count-class formula (ids of equal count are
    interchangeable) matches ANY deterministic ORDER BY n DESC cumsum,
    so the window-FILTER oracle is bit-exact.

    Scale shape — the frequency CURVE without sorting the vocabulary
    globally: per batch one flatten + one packed np.unique reduces the
    stream to (source, id, n) partials; ONE id-hash exchange settles
    each id's total exactly and re-reduces IN PLACE to (source,
    count-class c, m ids) cells — the harmonic-sized spectrum, NOT the
    vocabulary; the k=1 merge sorts O(classes) rows per source and
    reads both knees off one cumulative sum.  Token lists and the id
    vocabulary never reach the driver."""
    import glob

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(
            rd.read_parquet(files, columns=["source"]).unique("source")
        ),
        pa.string(),
    )
    ns = len(srcs)

    ds = rd.read_parquet(files, columns=["source", "tokens"])

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ln = (
            pc.cast(pc.list_value_length(toks), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = (
            pc.list_flatten(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if len(v) and (int(v.min()) < 0 or int(v.max()) >= (1 << 32)):
            raise ValueError(
                "tape_vocab_pareto: token id outside [0, 2^32) — "
                "(source, id) packing needs a wider key"
            )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        row = np.repeat(np.arange(len(ln)), ln)
        key, n = np.unique(code[row] * (1 << 32) + v, return_counts=True)
        return pa.table(
            {
                "key": pa.array(key.astype(np.int64)),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "sc": pa.array([], pa.int64()),
                    "m": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("key", use_threads=False).aggregate([("n", "sum")])
        s = (
            g["key"].combine_chunks().to_numpy(zero_copy_only=False)
            >> 32
        )
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(n) and int(n.max()) >= (1 << 48):
            raise ValueError(
                "tape_vocab_pareto: count-class >= 2^48 — (source, c) "
                "packing needs a wider key"
            )
        sc, m = np.unique(s * (1 << 48) + n, return_counts=True)
        return pa.table(
            {
                "sc": pa.array(sc.astype(np.int64)),
                "m": pa.array(m.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        n_ids = np.zeros(ns, np.int64)
        n_occ = np.zeros(ns, np.int64)
        v = np.zeros((ns, 2), np.int64)
        if t.num_rows:
            g = t.group_by("sc", use_threads=False).aggregate(
                [("m", "sum")]
            )
            sc = g["sc"].combine_chunks().to_numpy(zero_copy_only=False)
            m = g["m_sum"].combine_chunks().to_numpy(zero_copy_only=False)
            s = sc >> 48
            c = sc & ((1 << 48) - 1)
            for si in range(ns):
                sel = s == si
                if not sel.any():
                    continue
                cs, ms = c[sel], m[sel]
                order = np.argsort(-cs, kind="stable")
                cs, ms = cs[order], ms[order]
                occ = cs * ms
                tot = int(occ.sum())
                n_ids[si] = int(ms.sum())
                n_occ[si] = tot
                cum = np.cumsum(occ)
                ids_before = np.concatenate(
                    ([0], np.cumsum(ms)[:-1])
                )
                occ_before = np.concatenate(([0], cum[:-1]))
                for qi, q in enumerate((500, 900)):
                    thr = (tot * q + 999) // 1000
                    j = int(np.searchsorted(cum, thr, side="left"))
                    need = thr - int(occ_before[j])
                    take = (need + int(cs[j]) - 1) // int(cs[j])
                    v[si, qi] = int(ids_before[j]) + take
        return pa.table(
            {
                "source": srcs,
                "n_occ": pa.array(n_occ),
                "n_ids": pa.array(n_ids),
                "v500": pa.array(v[:, 0]),
                "v900": pa.array(v[:, 1]),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(
        partials, "key", fold, k=_doc_k_files(files)
    )
    return hash_partition_merge(cells, "sc", merge, k=1)



def embedding_sign_profile(sf_dir: str) -> Dataset:
    """T147: per-dimension sign profile — for each vector dimension
    (1-based, matching generate_subscripts): strictly-positive,
    strictly-negative and exactly-zero component counts plus the
    positive permille — the bias / dead-dimension audit that
    complements T75's range board (a dimension that is 99% positive
    carries a constant offset that inflates every T6 cosine; one that
    is mostly exact zeros is sparse output the ANN index can skip; a
    50/50 dimension is healthy).  One dense row per dimension ALWAYS;
    exact int64 — sign tests on floats are order-free, so engine and
    oracle agree bit-exactly (unnest + generate_subscripts + FILTER
    oracle).

    Scale shape — ZERO wide exchange: vectors reshape (n, d) per batch
    (one flatten — the list child is contiguous), three vectorized
    comparisons reduce each batch to d partial rows, and the k=1 merge
    folds O(batches × d) rows with one group_by."""
    from ..stages.shuffle import hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "neg": pa.array([], pa.int64()),
                    "zero": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)
        )
        d = m.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "pos": pa.array((m > 0).sum(axis=0).astype(np.int64)),
                "neg": pa.array((m < 0).sum(axis=0).astype(np.int64)),
                "zero": pa.array((m == 0).sum(axis=0).astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n_pos": pa.array([], pa.int64()),
                    "n_neg": pa.array([], pa.int64()),
                    "n_zero": pa.array([], pa.int64()),
                    "pos_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("dim", use_threads=False).aggregate(
            [("pos", "sum"), ("neg", "sum"), ("zero", "sum")]
        )
        g = g.sort_by("dim")
        pos = g["pos_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        neg = g["neg_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        zero = g["zero_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        tot = np.maximum(pos + neg + zero, 1)
        return pa.table(
            {
                "dim": g["dim"],
                "n_pos": pa.array(pos),
                "n_neg": pa.array(neg),
                "n_zero": pa.array(zero),
                "pos_permille": pa.array(1000 * pos // tot),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "dim", merge, k=1)


def f1_bigram_novelty_1h(sf_dir: str) -> Dataset:
    """T148/F: hourly bigram-novelty curve over the F1 tokenized
    stream — per 1h bucket: DISTINCT adjacent token PAIRS seen +
    pairs whose FIRST tape appearance is that bucket — T97's
    vocabulary-saturation question asked one order up (unigram
    novelty flattens as soon as the id space is covered; the BIGRAM
    curve keeps rising while new constructions enter the tape, and
    its knee is the honest "nothing new is being said" signal T66's
    global bigram top-k cannot time).  Pairs never cross row
    boundaries (a sequence is one message — reference consumer
    framing, rmq.go one-delivery-one-SQL).  Exact int64 (DISTINCT
    pair + min-bucket join oracle; pair packed t1·65536+t2, exact
    for the 50257-id vocab).

    Scale shape — T97's ONE pair-keyed exchange verbatim: each batch
    masks out list-final positions (offsets, not a row loop), packs
    (t1, t2, bucket) into one int64 and np.unique-compacts to its
    distinct (pair, bucket) rows; the pair-hash partition holds every
    bucket a pair touches, so its exact first bucket settles locally
    and both counts reduce to (bucket, distinct, new) partials; k=1
    merge sums O(buckets) rows."""
    import glob

    import ray.data as rd

    from ..stages.shuffle import hash_partition_merge
    from ..timegrid import T0_US

    files = sorted(glob.glob(sf_dir + "/*.parquet"))

    def partial(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            b["doc_id"].combine_chunks(), r"-(?P<seq>[0-9]+)$"
        )
        seq = (
            pc.cast(pc.struct_field(ex, "seq"), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        bucket = seq // 3600
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        # mask out each list's final position: flat[i], flat[i+1] are an
        # adjacent pair of the SAME sequence exactly where mask holds
        ends = np.cumsum(nper)
        mask = np.ones(len(flat), dtype=bool)
        mask[ends[nper > 0] - 1] = False
        idx = np.flatnonzero(mask)
        pair = flat[idx] * 65_536 + flat[idx + 1]
        bkt = np.repeat(bucket, np.maximum(nper - 1, 0))
        packed = np.unique(pair * (1 << 20) + bkt)
        return pa.table(
            {
                "pr": pa.array(packed >> 20, pa.int64()),
                "b": pa.array(packed & 0xFFFFF, pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "b": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "nn": pa.array([], pa.int64()),
                }
            )
        pr = t["pr"].combine_chunks().to_numpy(zero_copy_only=False)
        bb = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
        pairs = np.unique(pr * (1 << 20) + bb)
        pk, bk = pairs >> 20, pairs & 0xFFFFF
        head = np.empty(len(pairs), bool)
        head[0] = True
        head[1:] = pk[1:] != pk[:-1]
        nb = int(bk.max()) + 1
        nd = np.bincount(bk, minlength=nb)
        nn = np.bincount(bk[head], minlength=nb)
        live = np.flatnonzero(nd)
        return pa.table(
            {
                "b": pa.array(live.astype(np.int64)),
                "nd": pa.array(nd[live].astype(np.int64)),
                "nn": pa.array(nn[live].astype(np.int64)),
            }
        )

    partials = rd.read_parquet(files, columns=["doc_id", "tokens"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    per_pair = hash_partition_merge(partials, "pr", fold, k=_doc_k_files(files))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "bucket_ts": pa.array([], pa.timestamp("us")),
                    "n_distinct_bigrams": pa.array([], pa.int64()),
                    "n_new_bigrams": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("b", use_threads=False).aggregate(
            [("nd", "sum"), ("nn", "sum")]
        )
        bb = g["b"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket_ts": pa.array(
                    bb * 3_600_000_000 + T0_US, pa.timestamp("us")
                ),
                "n_distinct_bigrams": pc.cast(g["nd_sum"], pa.int64()),
                "n_new_bigrams": pc.cast(g["nn_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(per_pair, "b", merge, k=1)


def quality_margin(
    sf_dir: str,
    *,
    eval_max_doc_id: int = 10,
    min_words: int = 20,
    max_words: int = 90,
    max_dup_permille: int = 600,
    max_top_permille: int = 130,
    min_stop_permille: int = 20,
) -> Dataset:
    """T149: quality-margin board — per source: docs, docs passing ALL
    five T29 predicates, docs failing EXACTLY ONE, and that sole-failure
    count attributed per predicate (language / word band / repetition
    caps / stopword floor / decontamination) — the knob-elasticity read
    T54's funnel can't give (the funnel counts losses in CHAIN order, so
    a doc failing only decontamination still shows under whatever
    earlier stage order charges it; T149 counts each doc's failure set
    independently: the predicate with the fattest sole-failure column is
    the threshold whose relaxation buys the most corpus).  Exact int64
    (T54's CTE with INDEPENDENT bits oracle; same fused kernel, bits
    bit-identical to the standalone operators).

    Scale shape — T29's ONE streaming text pass verbatim (text read
    once, split once, never shuffled; eval shingles broadcast via
    ray.put): each batch reduces to per-source partial rows; tiny
    groupby-source merge."""
    import ray

    eval_ref = _eval_shingle_ref(sf_dir, eval_max_doc_id)
    cols = [
        "n_docs",
        "n_pass_all",
        "n_fail_one",
        "only_lang",
        "only_band",
        "only_rep",
        "only_stop",
        "only_contam",
    ]

    def fn(batch: pa.Table) -> pa.Table:
        n_words, dup, topf, stopf, lang_en, hits = _quality_features(
            batch, ray.get(eval_ref)
        )
        p1 = lang_en
        p2 = (n_words >= min_words) & (n_words <= max_words)
        p3 = (dup <= max_dup_permille) & (topf <= max_top_permille)
        p4 = stopf >= min_stop_permille
        p5 = hits == 0
        npass = (
            p1.astype(np.int64) + p2 + p3 + p4 + p5
        )
        sole = npass == 4
        t = pa.table(
            {
                "source": batch["source"],
                "n_docs": pa.array(np.ones(batch.num_rows, np.int64)),
                "n_pass_all": pa.array((npass == 5).astype(np.int64)),
                "n_fail_one": pa.array(sole.astype(np.int64)),
                "only_lang": pa.array((sole & ~p1).astype(np.int64)),
                "only_band": pa.array((sole & ~p2).astype(np.int64)),
                "only_rep": pa.array((sole & ~p3).astype(np.int64)),
                "only_stop": pa.array((sole & ~p4).astype(np.int64)),
                "only_contam": pa.array((sole & ~p5).astype(np.int64)),
            }
        )
        g = t.group_by("source", use_threads=False).aggregate(
            [(c, "sum") for c in cols]
        )
        return g.rename_columns(["source", *cols])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in cols},
                }
            )
        g = t.group_by("source", use_threads=False).aggregate(
            [(c, "sum") for c in cols]
        )
        return g.rename_columns(["source", *cols])

    partials = _docs(sf_dir, ["doc_id", "source", "lang", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )
    return partials.groupby("source").map_groups(merge, batch_format="pyarrow")


def f1_vocab_lifetime(sf_dir: str) -> Dataset:
    """T150/F: vocabulary-lifetime spectrum over the F1 tokenized
    stream — for each lifespan s (hours between a token id's FIRST and
    LAST tape appearance, 1h buckets): token ids with exactly that
    span and their total tape occurrences — the JOINT read of T97's
    birth curve and the retirement dual (a vocabulary dominated by
    span-0 tokens is churning one-shot ids — T24's vocab map can drop
    them; heavy mass at full-tape span is the stable core worth a
    dense id range).  Exact int64 (min/max-bucket + count per token
    oracle).

    Scale shape — ONE token-keyed exchange of (token, bucket, count)
    partials (each batch np.unique-compacts its flattened tokens; the
    pair domain is vocab × buckets, never corpus-sized); the
    token-hash partition holds every bucket a token touches, so first,
    last and total settle locally and collapse IN PLACE to O(spans)
    partial rows; k=1 merge."""
    import glob

    import ray.data as rd

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))

    def partial(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            b["doc_id"].combine_chunks(), r"-(?P<seq>[0-9]+)$"
        )
        seq = (
            pc.cast(pc.struct_field(ex, "seq"), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        bucket = seq // 3600
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        nper = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        packed = flat * (1 << 20) + np.repeat(bucket, nper)
        vals, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "tok": pa.array(vals >> 20, pa.int64()),
                "b": pa.array(vals & 0xFFFFF, pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "span": pa.array([], pa.int64()),
                    "nt": pa.array([], pa.int64()),
                    "occ": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["tok"], use_threads=False).aggregate(
            [("b", "min"), ("b", "max"), ("n", "sum")]
        )
        span = pc.subtract(g["b_max"], g["b_min"]).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        occ = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        u, idx = np.unique(span, return_inverse=True)
        nt = np.bincount(idx)
        so = np.zeros(len(u), np.int64)
        np.add.at(so, idx, occ)
        return pa.table(
            {
                "span": pa.array(u.astype(np.int64)),
                "nt": pa.array(nt.astype(np.int64)),
                "occ": pa.array(so),
            }
        )

    partials = rd.read_parquet(files, columns=["doc_id", "tokens"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    per_tok = hash_partition_merge(partials, "tok", fold, k=_doc_k_files(files))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "span_hours": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_occurrences": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("span", use_threads=False).aggregate(
            [("nt", "sum"), ("occ", "sum")]
        )
        return pa.table(
            {
                "span_hours": pc.cast(g["span"], pa.int64()),
                "n_tokens": pc.cast(g["nt_sum"], pa.int64()),
                "n_occurrences": pc.cast(g["occ_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(per_tok, "span", merge, k=1)


def embedding_dim_extremes(sf_dir: str) -> Dataset:
    """T151: per-dimension extreme-vector board — for each vector
    dimension (1-based, generate_subscripts convention): the maximum
    component value (floored to milli-units) with the vec_id attaining
    it, and the minimum likewise (ties → smallest vec_id) — the
    outlier DRILL-DOWN next to T99's distributional quantiles (the
    quantiles say dimension 17 has a fat positive tail; T151 names the
    vector to go look at — a single vec_id owning many dimensions'
    extremes is one corrupt row wearing 64 costumes).  One dense row
    per dimension ALWAYS.  Exact int64 (float32 comparisons are exact
    and order-free; the milli floor happens in float64 on BOTH sides;
    row_number tie-break oracle).

    Scale shape — ZERO wide exchange: vectors reshape (n, d) per
    batch, a masked-min picks each dimension's argmax/argmin vec_id
    vectorized, and the k=1 merge folds O(batches × d) candidate rows
    with one lexsort."""
    from ..stages.shuffle import hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    BIG = np.iinfo(np.int64).max

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "mxv": pa.array([], pa.float64()),
                    "mxi": pa.array([], pa.int64()),
                    "mnv": pa.array([], pa.float64()),
                    "mni": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)
        )
        ids = (
            pc.cast(batch["vec_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        d = m.shape[1]
        mxv = m.max(axis=0)
        mnv = m.min(axis=0)
        idc = ids[:, None]
        mxi = np.where(m == mxv, idc, BIG).min(axis=0)
        mni = np.where(m == mnv, idc, BIG).min(axis=0)
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "mxv": pa.array(mxv),
                "mxi": pa.array(mxi),
                "mnv": pa.array(mnv),
                "mni": pa.array(mni),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "max_milli": pa.array([], pa.int64()),
                    "argmax_vec": pa.array([], pa.int64()),
                    "min_milli": pa.array([], pa.int64()),
                    "argmin_vec": pa.array([], pa.int64()),
                }
            )
        dim = t["dim"].combine_chunks().to_numpy(zero_copy_only=False)
        mxv = t["mxv"].combine_chunks().to_numpy(zero_copy_only=False)
        mxi = t["mxi"].combine_chunks().to_numpy(zero_copy_only=False)
        mnv = t["mnv"].combine_chunks().to_numpy(zero_copy_only=False)
        mni = t["mni"].combine_chunks().to_numpy(zero_copy_only=False)
        # best-per-dim under (value desc, vec asc) / (value asc, vec asc)
        omax = np.lexsort((mxi, -mxv, dim))
        head = np.empty(len(omax), bool)
        dmax = dim[omax]
        head[0] = True
        head[1:] = dmax[1:] != dmax[:-1]
        sel_max = omax[head]
        omin = np.lexsort((mni, mnv, dim))
        dmin = dim[omin]
        head2 = np.empty(len(omin), bool)
        head2[0] = True
        head2[1:] = dmin[1:] != dmin[:-1]
        sel_min = omin[head2]
        order = np.argsort(dim[sel_max])
        sel_max = sel_max[order]
        sel_min = sel_min[np.argsort(dim[sel_min])]
        return pa.table(
            {
                "dim": pa.array(dim[sel_max]),
                "max_milli": pa.array(
                    np.floor(mxv[sel_max] * 1000.0).astype(np.int64)
                ),
                "argmax_vec": pa.array(mxi[sel_max]),
                "min_milli": pa.array(
                    np.floor(mnv[sel_min] * 1000.0).astype(np.int64)
                ),
                "argmin_vec": pa.array(mni[sel_min]),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "dim", merge, k=1)


def f1_replay_adjacent(sf_dir: str, window_s: int = 3600) -> Dataset:
    """T152/F: adjacent-replay audit over the F1 tokenized stream — per
    source: sequences, sequences WITH a predecessor (in seq order), and
    sequences whose token array is BYTE-IDENTICAL to their immediate
    predecessor, with the replay permille — the redelivery read at the
    payload level (T80 counts echo copies ANYWHERE in the tape — a
    syndication signal; T152 counts them back-to-back, which is the
    at-least-once-delivery / producer-retry signature of the reference
    queue (rmq.go redelivery), the tape twin of E83's redelivery
    board).  One dense row per source ALWAYS.  Adjacency identity via
    the 64-bit polars list hash — the documented corpus-scale
    convention shared with T80/T104 (the sf-scale oracle compares the
    raw lists).  Exact int64 (lag(tokens) equality oracle).

    Scale shape — E140's carried-prefix scan on the tape axis: rows
    tag (source, seq, hash) and partition by (source, seq-window);
    :func:`mq_to_db_ray.pipelines.events._last_event_carries` hands
    each window its predecessor row in two narrow exchanges, so no
    source's full history lands in one task; per-partition one lexsort
    + one shifted compare; (pairs, replays) partials fold in one tiny
    source merge."""
    import glob

    import ray.data as rd

    # the carry machinery is schema-generic (k, t, o, v, carry, w) —
    # shared with the order-dependent event scans, not re-derived here
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition
    from .events import _last_event_carries, _tag_carry

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(rd.read_parquet(files, columns=["source"]).unique("source")),
        pa.string(),
    )
    ns = len(srcs)

    def narrow(b: pa.Table) -> pa.Table:
        import polars as pl

        ex = pc.extract_regex(
            b["doc_id"].combine_chunks(), r"-(?P<seq>[0-9]+)$"
        )
        seq = (
            pc.cast(pc.struct_field(ex, "seq"), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        h = (
            pl.from_arrow(b.select(["tokens"]))["tokens"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "k": pc.cast(
                    pc.index_in(b["source"], value_set=srcs), pa.int64()
                ),
                "t": pa.array(seq),
                "o": pa.array(np.zeros(len(seq), np.int64)),
                "v": pa.array(h),
                "carry": pa.array(np.zeros(len(seq), dtype=bool)),
                "w": pa.array(seq // window_s, pa.int64()),
            }
        )

    tagged = rd.read_parquet(
        files, columns=["doc_id", "tokens", "source"]
    ).map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "nr": pa.array([], pa.int64()),
                "np_": pa.array([], pa.int64()),
                "nrep": pa.array([], pa.int64()),
            }
        )
        if t_.num_rows == 0:
            return empty
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t_["v"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, tt, kk))
        ks, vs, crs = kk[order], vv[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        sel = has_prev & ~crs
        nrows = np.bincount(ks[~crs], minlength=ns)
        pv = np.empty(n, np.int64)
        pv[0] = 0
        pv[1:] = vs[:-1]
        eq = (vs == pv) & sel
        npair = np.bincount(ks[sel], minlength=ns)
        nrep = np.bincount(ks[eq], minlength=ns)
        live = np.flatnonzero(nrows + npair)
        return pa.table(
            {
                "src": pa.array(live.astype(np.int64)),
                "nr": pa.array(nrows[live].astype(np.int64)),
                "np_": pa.array(npair[live].astype(np.int64)),
                "nrep": pa.array(nrep[live].astype(np.int64)),
            }
        )

    partials = _kw_partition(full, kernel, shuffle_parts(_doc_k_files(files)))

    def merge(t: pa.Table) -> pa.Table:
        nr = np.zeros(ns, np.int64)
        npair = np.zeros(ns, np.int64)
        nrep = np.zeros(ns, np.int64)
        if t.num_rows:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            for grid, col in ((nr, "nr"), (npair, "np_"), (nrep, "nrep")):
                np.add.at(
                    grid, s,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        return pa.table(
            {
                "source": srcs,
                "n_rows": pa.array(nr),
                "n_pairs": pa.array(npair),
                "n_replays": pa.array(nrep),
                "replay_permille": pa.array(
                    1000 * nrep // np.maximum(npair, 1)
                ),
            }
        )

    return hash_partition_merge(partials, "src", merge, k=1)


def tape_rare_token_docs(sf_dir: str, max_df: int = 5) -> Dataset:
    """T153/F: rare-token exposure board — per source of the F1
    tokenized stream: sequences, sequences containing at least one
    GLOBALLY rare id (corpus df <= ``max_df``), total rare-id
    occurrences, and the hit permille — the long-tail exposure audit a
    tokenizer/curriculum owner reads before trimming the embedding
    table (T146 sizes the vocabulary the corpus NEEDS; T153 names the
    sequences that would break if the tail were dropped — a source
    with a fat hit permille is where byte-fallback or unk-mapping
    damage lands first).  One dense row per source ALWAYS; exact int64
    (unnest df + per-row FILTER-count oracle; true ids, no hashing —
    the id axis is vocabulary-bounded, so nothing here can collide).

    Scale shape — two streaming passes, text never shuffles:
      1. df pass: per batch one flatten + np.unique -> (id, n)
         partials; ONE id-hash exchange settles corpus df per id and
         keeps only ids with df <= max_df — the result is tail-sized
         (<= vocabulary, typically a few hundred ids), the ONLY thing
         that ever reaches the driver;
      2. probe pass: the sorted rare-id vector ships ONCE via
         ``ray.put`` (the T19 convention); each batch runs one
         searchsorted membership over its flat value buffer and
         np.add.at's per-(row -> source) hit/occurrence partials —
         (source, n_seqs, hit, occ) cells, k=1 densifying merge."""
    import glob

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(rd.read_parquet(files, columns=["source"]).unique("source")),
        pa.string(),
    )
    ns = len(srcs)

    def df_partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        v = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        ids, n = np.unique(v, return_counts=True)
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    def df_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"id": pa.array([], pa.int64())})
        g = t.group_by("id", use_threads=False).aggregate([("n", "sum")])
        keep = pc.less_equal(g["n_sum"], max_df)
        return g.filter(keep).select(["id"])

    df_cells = rd.read_parquet(files, columns=["tokens"]).map_batches(
        df_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    # map_groups can emit zero-column placeholder blocks for empty
    # partitions — skip them before the (tail-sized) driver concat
    rare_tbls = [
        t
        for t in (
            ray.get(ref)
            for ref in hash_partition_merge(
                df_cells, "id", df_fold
            ).to_arrow_refs()
        )
        if t.num_columns and t.num_rows
    ]
    rare = np.sort(
        np.concatenate(
            [
                t["id"].combine_chunks().to_numpy(zero_copy_only=False)
                for t in rare_tbls
            ]
        )
        if rare_tbls
        else np.empty(0, np.int64)
    ).astype(np.int64)
    rare_ref = ray.put(rare)

    def probe(b: pa.Table) -> pa.Table:
        r = ray.get(rare_ref)
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ln = pc.cast(pc.list_value_length(toks), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        v = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        if len(r):
            pos = np.searchsorted(r, v)
            pos[pos == len(r)] = 0
            is_rare = r[pos] == v
        else:
            is_rare = np.zeros(len(v), dtype=bool)
        row = np.repeat(np.arange(len(ln)), ln)
        occ_per_row = np.bincount(row[is_rare], minlength=len(ln)).astype(
            np.int64
        )
        seqs = np.bincount(code, minlength=ns).astype(np.int64)
        hits = np.bincount(
            code[occ_per_row > 0], minlength=ns
        ).astype(np.int64)
        occ = np.zeros(ns, np.int64)
        np.add.at(occ, code, occ_per_row)
        return pa.table(
            {
                "s": pa.array(np.arange(ns, dtype=np.int64)),
                "n_seqs": pa.array(seqs),
                "hit": pa.array(hits),
                "occ": pa.array(occ),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        cols = (
            "source",
            "n_seqs",
            "hit_seqs",
            "rare_occurrences",
            "hit_permille",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in cols[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("n_seqs", "sum"), ("hit", "sum"), ("occ", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_seqs_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        hh = g["hit_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = g["occ_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = nn > 0
        ss, nn, hh, oo = ss[keep], nn[keep], hh[keep], oo[keep]
        order = np.argsort(ss)
        ss, nn, hh, oo = ss[order], nn[order], hh[order], oo[order]
        return pa.table(
            {
                "source": srcs.take(pa.array(ss, pa.int64())),
                "n_seqs": pa.array(nn, pa.int64()),
                "hit_seqs": pa.array(hh, pa.int64()),
                "rare_occurrences": pa.array(oo, pa.int64()),
                "hit_permille": pa.array(1000 * hh // nn, pa.int64()),
            }
        )

    probed = rd.read_parquet(files, columns=["source", "tokens"]).map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(probed, "s", merge, k=1)


def sentence_stats(sf_dir: str) -> Dataset:
    """T154: sentence-terminator lint board — per source: docs, total
    sentence terminators (the ASCII chars . ! ?), docs with ZERO
    terminators, the zero-doc permille, and terminators per kilodoc —
    the sentence-structure read none of the text boards cover (T49
    counts character CLASSES, T113 the bytes AROUND content, T10 scores
    word/punct ratios; T154 asks whether the text segments into
    sentences AT ALL — a fat zero permille means table dumps, code, or
    headline fragments, the slices sentence-level dedup, splitting and
    curriculum passes silently mishandle).  One dense row per source
    ALWAYS; exact int64 (regexp char-count oracle; pure ASCII class, so
    Arrow RE2 and DuckDB agree by construction).

    Scale shape — T49's ZERO-wide-exchange profile: one compiled RE2
    count kernel per batch (pyarrow count_substring_regex) plus a
    zero-test reduce to one partial row per (source, batch); only
    O(batches × sources) partials ride the tiny per-source merge."""
    txt_cols = ["source", "text"]

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        term = pc.cast(
            pc.count_substring_regex(txt, "[.!?]"), pa.int64()
        )
        zero = pc.cast(pc.equal(term, 0), pa.int64())
        t = pa.table(
            {
                "source": batch["source"],
                "nd": pa.array(np.ones(batch.num_rows, np.int64)),
                "nt": term,
                "nz": zero,
            }
        )
        return t.group_by("source", use_threads=False).aggregate(
            [("nd", "sum"), ("nt", "sum"), ("nz", "sum")]
        )

    def merge(t: pa.Table) -> pa.Table:
        cols = (
            "source",
            "n_docs",
            "n_terminals",
            "n_zero_docs",
            "zero_permille",
            "terminals_per_kdoc",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in cols[1:]},
                }
            )
        g = t.group_by("source", use_threads=False).aggregate(
            [("nd_sum", "sum"), ("nt_sum", "sum"), ("nz_sum", "sum")]
        )
        nd = g["nd_sum_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nt = g["nt_sum_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nz = g["nz_sum_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": g["source"],
                "n_docs": pa.array(nd, pa.int64()),
                "n_terminals": pa.array(nt, pa.int64()),
                "n_zero_docs": pa.array(nz, pa.int64()),
                "zero_permille": pa.array(1000 * nz // nd, pa.int64()),
                "terminals_per_kdoc": pa.array(
                    1000 * nt // nd, pa.int64()
                ),
            }
        )

    partials = _docs(sf_dir, txt_cols).map_batches(
        partial, batch_format="pyarrow"
    )
    return partials.groupby("source").map_groups(merge, batch_format="pyarrow")


def sentence_length_spectrum(sf_dir: str, cap: int = 64) -> Dataset:
    """T155: sentence-length spectrum — split every doc on the ASCII
    terminators . ! ? and histogram the fragments' word counts per
    source, capped into a top band at ``cap`` — the sentence-SHAPE
    companion to T154 (T154 says whether text segments into sentences
    at all; T155 says what those sentences look like: a spike at 1-3
    words means headline/table fragments, a fat tail past 40 means
    run-ons or unsegmented dumps — the distribution sentence-level
    dedup, splitting and curriculum passes actually operate over).
    Word count per fragment = spaces + 1, exactly DuckDB's
    len(str_split(frag, ' ')) — empty fragments (adjacent terminators,
    trailing text) count as 1-word sentences on BOTH sides, so the
    spectrum is deterministic (str_split_regex + unnest oracle).

    Scale shape — T49's ZERO-wide-exchange profile with one extra
    flatten: per batch one RE2 split (split_pattern_regex) + one space
    count over the flattened fragments (fragment STRINGS never leave
    the batch), np.repeat attributes fragments to sources, and one
    bincount reduces the batch to (source, band) cells; only
    O(batches × sources × cap) partials ride the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    nbd = cap + 1

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        code = (
            pc.cast(pc.index_in(batch["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        frags = pc.split_pattern_regex(txt, "[.!?]")
        nfr = (
            pc.cast(pc.list_value_length(frags), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        flat = pc.list_flatten(frags)
        wps = np.minimum(
            pc.cast(pc.count_substring(flat, " "), pa.int64())
            .to_numpy(zero_copy_only=False)
            + 1,
            cap,
        )
        key = np.repeat(code, nfr) * nbd + wps
        cnt = np.bincount(key, minlength=len(srcs) * nbd).astype(np.int64)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {
                "s": pa.array(keep // nbd),
                "band": pa.array(keep % nbd),
                "n": pa.array(cnt[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("source", "words_band", "n_sentences")
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "words_band": pa.array([], pa.int64()),
                    "n_sentences": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["s", "band"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["s"]),
                "words_band": pc.cast(g["band"], pa.int64()),
                "n_sentences": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def word_breadth_spectrum(sf_dir: str) -> Dataset:
    """T156: word source-breadth spectrum — for every distinct word,
    count how many of the corpus's sources it appears in, then
    histogram the vocabulary by that breadth k: distinct words at each
    k and their total occurrence mass — the UNIVERSALITY curve of the
    vocabulary (T118 reads off exactly the k=1 band per source —
    exclusive jargon; T65 gives pairwise overlaps; T156 is the whole
    spectrum at once: a vocabulary whose mass sits at k=S is shared
    core language one merged tokenizer serves well, a fat k=1 tail
    predicts per-domain fertility blowups and tells the vocab-size
    planner what a source-stratified token budget actually buys).
    Dense small output (k = 1..#sources); exact int64 (unnest +
    COUNT DISTINCT + histogram oracle; the 64-bit hash only ROUTES —
    the exact word string rides the exchange and decides identity,
    T4/T118's convention).

    Scale shape — T118's ONE word-hash exchange verbatim: batches
    pre-reduce with one split + one Arrow group_by to (hash, source,
    word, freq) cells, every cell of a word lands in one partition, so
    breadth and mass are decided locally and collapse IN PLACE to
    O(#sources) histogram rows per partition before the k=1 merge;
    the vocabulary never lands on one node."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    ds = _docs(sf_dir, ["text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        words = pc.split_pattern(batch["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(
            zero_copy_only=False
        )
        code = pc.cast(
            pc.index_in(batch["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "w": flat,
                "src": pa.array(code[parent].astype(np.int64)),
                "n": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        g = t.group_by(["w", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["w", "src", "n"])
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "src": g["src"],
                "w": g["w"],
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("k", "nw", "occ")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["w", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["w", "src", "n"])
        wcol = g["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        wid = (
            wcol.dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        nw = int(wid.max()) + 1
        breadth = np.bincount(wid, minlength=nw).astype(np.int64)
        occ = np.zeros(nw, np.int64)
        np.add.at(occ, wid, n)
        # collapse to the (breadth -> words, occurrences) histogram
        nwords = np.bincount(breadth, minlength=ns + 1).astype(np.int64)
        mass = np.zeros(ns + 1, np.int64)
        np.add.at(mass, breadth, occ)
        keep = np.flatnonzero(nwords)
        return pa.table(
            {
                "k": pa.array(keep),
                "nw": pa.array(nwords[keep]),
                "occ": pa.array(mass[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_sources": pa.array([], pa.int64()),
                    "n_words": pa.array([], pa.int64()),
                    "n_occurrences": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("k", use_threads=False).aggregate(
            [("nw", "sum"), ("occ", "sum")]
        )
        return pa.table(
            {
                "n_sources": pc.cast(g["k"], pa.int64()),
                "n_words": pc.cast(g["nw_sum"], pa.int64()),
                "n_occurrences": pc.cast(g["occ_sum"], pa.int64()),
            }
        )

    cells = ds.map_batches(partial, batch_format="pyarrow")
    folded = hash_partition_merge(cells, "h", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(folded, "k", merge, k=1)


def tape_delta_spectrum(sf_dir: str) -> Dataset:
    """T157/F: tape delta-compressibility spectrum — per source of the
    F1 tokenized stream, histogram every adjacent within-sequence
    token-id delta into signed decimal-magnitude bands (0 = repeat;
    ±d = sign × digit count of |delta|) — the DoD-encoder feasibility
    read on the tape itself (the engine's own E6 delta-of-delta and E7
    Gorilla retention encoders win exactly when adjacent values are
    near; T79 histograms ids STATICALLY, T142 counts order DIRECTION;
    T157 measures the jump SIZES: mass in the ±1..2 bands means ids
    cluster locally and the tape delta-compresses, a flat ±5..7 spread
    means full-vocabulary jumps and no win).  Dense small output
    (sources × ≤21 bands); exact int64 (generate_subscripts + lag +
    digit-length oracle; true ids, no hashing).

    Scale shape — ZERO wide exchange for the heavy part: per batch one
    list_flatten + parent-index pass (token ids never leave the batch
    as anything wider than their deltas' bands), one searchsorted
    against the 10-power fence posts, one bincount to (source, band)
    cells; only O(batches × sources × bands) partials ride the k=1
    merge."""
    import glob

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(rd.read_parquet(files, columns=["source"]).unique("source")),
        pa.string(),
    )
    ns = len(srcs)
    off = 10  # band index offset: band -10..10 -> 0..20
    nbd = 21
    powers = np.array([10 ** i for i in range(1, 11)], np.int64)

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        if len(flat) < 2:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in ("s", "band", "n")}
            )
        same = parent[1:] == parent[:-1]
        d = (flat[1:] - flat[:-1])[same]
        sc = code[parent[1:][same]]
        digits = np.searchsorted(powers, np.abs(d), side="right") + 1
        band = np.where(d == 0, 0, np.sign(d) * digits)
        key = sc * nbd + (band + off)
        cnt = np.bincount(key, minlength=ns * nbd).astype(np.int64)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {
                "s": pa.array(keep // nbd),
                "band": pa.array(keep % nbd - off),
                "n": pa.array(cnt[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "delta_band": pa.array([], pa.int64()),
                    "n_pairs": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["s", "band"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["s"]),
                "delta_band": pc.cast(g["band"], pa.int64()),
                "n_pairs": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    partials = rd.read_parquet(files, columns=["source", "tokens"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def embedding_cosign_matrix(sf_dir: str, n_dims: int = 8) -> Dataset:
    """T158: embedding dimension co-sign matrix — for every ordered
    pair (i < j) of the first ``n_dims`` vector dimensions, the joint
    sign counts over all vectors: (+,+), (+,−/0), (−/0,+), (−/0,−/0) —
    the cheapest pairwise-dependence read of the embedding space (T147
    gives each dimension's sign MARGIN; T158 gives the JOINT: a pair
    whose diagonal mass n_pp+n_nn far exceeds the margins' product is
    correlated — redundant capacity PCA/whitening would fold, and the
    off-diagonal-heavy pairs are the ones sign-based LSH hyperplanes
    should prefer).  Signs are exact float comparisons (v > 0), so the
    board is integer-exact (list_extract + FILTER-count oracle).
    Dense small output: n_dims·(n_dims−1)/2 rows.

    Scale shape — ZERO wide exchange: each batch slices the first
    n_dims columns of the vector block once (one flatten + reshape),
    then THREE boolean matmuls (B'B for ++, B'(¬B) for +−, symmetric
    for the rest) produce the whole pair grid at once; only
    O(batches × pairs) cells ride the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        cols = ("i", "j", "pp", "pm", "mp", "mm")
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        flat = e.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // n
        b = (flat.reshape(n, dim)[:, :n_dims] > 0.0)
        bt = b.astype(np.int64)
        nt = (~b).astype(np.int64)
        pp = bt.T @ bt
        pm = bt.T @ nt
        mm = nt.T @ nt
        iu, ju = np.triu_indices(n_dims, k=1)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "pp": pa.array(pp[iu, ju]),
                "pm": pa.array(pm[iu, ju]),
                "mp": pa.array(pm.T[iu, ju]),
                "mm": pa.array(mm[iu, ju]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("dim_i", "dim_j", "n_pp", "n_pm", "n_mp", "n_mm")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by(["i", "j"], use_threads=False).aggregate(
            [("pp", "sum"), ("pm", "sum"), ("mp", "sum"), ("mm", "sum")]
        )
        return pa.table(
            {
                "dim_i": pc.cast(g["i"], pa.int64()),
                "dim_j": pc.cast(g["j"], pa.int64()),
                "n_pp": pc.cast(g["pp_sum"], pa.int64()),
                "n_pm": pc.cast(g["pm_sum"], pa.int64()),
                "n_mp": pc.cast(g["mp_sum"], pa.int64()),
                "n_mm": pc.cast(g["mm_sum"], pa.int64()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "i", merge, k=1)


def doc_id_integrity(sf_dir: str) -> Dataset:
    """T159: document-id integrity audit — corpus-wide: docs, distinct
    doc_ids, ids used MORE THAN ONCE, the worst multiplicity, and ids
    shared ACROSS sources — the primary-key trust read for the one
    column every join, dedup decision and resume manifest keys on (T89
    audits n_chars, T85 the TAPE's completeness; nothing audits the
    documents table's own identity column: a re-ingested shard or a
    collided id generator silently merges unrelated docs in every
    doc_id-keyed operator downstream).  ONE dense row ALWAYS,
    zero-defect when ingestion was honest.  Exact int64 (GROUP BY id +
    COUNT DISTINCT oracle).

    Scale shape — ONE id-hash exchange over pre-reduced cells: per
    batch one np.unique collapses rows to (id, n, one-source?) cells
    [a batch keeps at most one cell per (id, source)]; every cell of
    an id lands in one partition, so multiplicity and cross-source
    spread are decided locally and collapse IN PLACE to one counter
    row per partition; the k=1 merge sums O(parts) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )

    def partial(b: pa.Table) -> pa.Table:
        ids = (
            pc.cast(b["doc_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        pairs = np.stack([ids, code], axis=1)
        u, cnt = np.unique(pairs, axis=0, return_counts=True)
        return pa.table(
            {
                "id": pa.array(u[:, 0].astype(np.int64)),
                "src": pa.array(u[:, 1].astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("g", "nd", "ndist", "ndup", "mx", "nxs")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["id", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        ids = g["id"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        u, idx = np.unique(ids, return_inverse=True)
        mult = np.zeros(len(u), np.int64)
        np.add.at(mult, idx, n)
        nsrc = np.bincount(idx).astype(np.int64)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "nd": pa.array([int(n.sum())], pa.int64()),
                "ndist": pa.array([len(u)], pa.int64()),
                "ndup": pa.array([int((mult > 1).sum())], pa.int64()),
                "mx": pa.array([int(mult.max())], pa.int64()),
                "nxs": pa.array([int((nsrc > 1).sum())], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "n_docs",
            "n_distinct_ids",
            "n_dup_ids",
            "max_multiplicity",
            "n_cross_source_ids",
        )
        if t.num_rows == 0:
            return pa.table({c: pa.array([0], pa.int64()) for c in out})
        return pa.table(
            {
                "n_docs": pa.array([int(pc.sum(t["nd"]).as_py())], pa.int64()),
                "n_distinct_ids": pa.array(
                    [int(pc.sum(t["ndist"]).as_py())], pa.int64()
                ),
                "n_dup_ids": pa.array(
                    [int(pc.sum(t["ndup"]).as_py())], pa.int64()
                ),
                "max_multiplicity": pa.array(
                    [int(pc.max(t["mx"]).as_py())], pa.int64()
                ),
                "n_cross_source_ids": pa.array(
                    [int(pc.sum(t["nxs"]).as_py())], pa.int64()
                ),
            }
        )

    partials = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        partial, batch_format="pyarrow"
    )
    folded = hash_partition_merge(partials, "id", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(folded, "g", merge, k=1)


def quality_cofailure_matrix(
    sf_dir: str,
    *,
    eval_max_doc_id: int = 10,
    min_words: int = 20,
    max_words: int = 90,
    max_dup_permille: int = 600,
    max_top_permille: int = 130,
    min_stop_permille: int = 20,
) -> Dataset:
    """T160: quality-filter co-failure matrix — for every ordered pair
    of the five T29/T149 quality predicates (lang, word band,
    repetition, stopword floor, contamination): docs failing filter i,
    failing filter j, and failing BOTH — the filter-REDUNDANCY read
    T149 deliberately excludes (T149 counts docs where exactly ONE
    filter fires — the marginal value board; T160 measures how the
    filters overlap on the multi-fail mass: a pair whose co-failure ≈
    its margins is measuring the same defect twice and one of them can
    be dropped from the hot path, a near-zero co-failure pair is
    orthogonal signal).  Same thresholds, same `_quality_features`
    kernel, same eval-shingle broadcast as T29/T149, so the boards
    reconcile by construction.  Dense 10-row output; exact int64
    (the T149 predicate CTEs + pairwise FILTER counts oracle).

    Scale shape — T149's ZERO-wide-exchange profile: one streaming
    text pass; each batch reduces its five boolean fail columns to a
    single 10-cell pair row via one boolean matmul; O(batches) partial
    rows ride the k=1 merge."""
    import ray

    from ..stages.shuffle import hash_partition_merge

    eval_ref = _eval_shingle_ref(sf_dir, eval_max_doc_id)

    def fn(batch: pa.Table) -> pa.Table:
        cols = ("i", "j", "fi", "fj", "both")
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        n_words, dup, topf, stopf, lang_en, hits = _quality_features(
            batch, ray.get(eval_ref)
        )
        fails = np.stack(
            [
                ~lang_en,
                ~((n_words >= min_words) & (n_words <= max_words)),
                ~((dup <= max_dup_permille) & (topf <= max_top_permille)),
                ~(stopf >= min_stop_permille),
                hits != 0,
            ],
            axis=1,
        ).astype(np.int64)
        co = fails.T @ fails  # 5x5: diagonal = margins, off = co-fails
        iu, ju = np.triu_indices(5, k=1)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "fi": pa.array(co[iu, iu]),
                "fj": pa.array(co[ju, ju]),
                "both": pa.array(co[iu, ju]),
            }
        )

    names = pa.array(["lang", "band", "rep", "stop", "contam"], pa.string())

    def merge(t: pa.Table) -> pa.Table:
        out = ("filter_i", "filter_j", "n_fail_i", "n_fail_j", "n_both")
        if t.num_rows == 0:
            return pa.table(
                {
                    "filter_i": pa.array([], pa.string()),
                    "filter_j": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[2:]},
                }
            )
        g = t.group_by(["i", "j"], use_threads=False).aggregate(
            [("fi", "sum"), ("fj", "sum"), ("both", "sum")]
        )
        return pa.table(
            {
                "filter_i": names.take(g["i"]),
                "filter_j": names.take(g["j"]),
                "n_fail_i": pc.cast(g["fi_sum"], pa.int64()),
                "n_fail_j": pc.cast(g["fj_sum"], pa.int64()),
                "n_both": pc.cast(g["both_sum"], pa.int64()),
            }
        )

    partials = _docs(sf_dir, ["doc_id", "source", "lang", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "i", merge, k=1)


def embedding_hygiene(sf_dir: str) -> Dataset:
    """T161: embedding-hygiene audit — corpus-wide: vectors, the modal
    dimensionality (ties → smallest), RAGGED vectors (length differs
    from the modal), vectors containing NaN, containing ±Inf, and
    exact all-zero vectors — the vector-lint every ANN/dedup consumer
    assumes away (T78 histograms norms, T147 profiles signs — both
    silently propagate a NaN and crash or skew on a ragged row; a
    zero vector makes cosine similarity undefined and lands in every
    IVF cell's tail; T159's identity-audit discipline applied to the
    embedding payload).  ONE dense row ALWAYS, zero-defect on honest
    data.  Exact int64 (len() histogram + isnan/isinf list-filter
    oracle; NaN/Inf/zero tests are exact float predicates).

    Scale shape — ZERO wide exchange: each batch reduces to one
    counter row plus a tiny length-histogram via one flatten + three
    vectorized predicates; the k=1 merge sums counters and settles
    the modal length across batches from the merged histogram."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(b: pa.Table) -> pa.Table:
        cols = ("g", "dim", "nv", "nnan", "ninf", "nzero")
        e = b["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        lens = (
            pc.cast(pc.list_value_length(e), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        flat = e.flatten().to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(e).to_numpy(zero_copy_only=False)
        isnan = np.isnan(flat)
        isinf = np.isinf(flat)
        # NaN != 0 is True both here and under DuckDB's float total
        # order, so a NaN-bearing vector is NOT an all-zero vector
        nonzero = flat != 0.0
        vnan = np.zeros(n, bool)
        np.logical_or.at(vnan, parent, isnan)
        vinf = np.zeros(n, bool)
        np.logical_or.at(vinf, parent, isinf)
        vnz = np.zeros(n, bool)
        np.logical_or.at(vnz, parent, nonzero)
        # per-length vector counts (the dim histogram) ride as rows
        # with nv>0 and dim>=0; the defect counters ride dim=-1
        u, cnt = np.unique(lens, return_counts=True)
        return pa.table(
            {
                "g": pa.array(np.zeros(len(u) + 1, np.int64)),
                "dim": pa.array(
                    np.concatenate([u, np.array([-1], np.int64)])
                ),
                "nv": pa.array(
                    np.concatenate([cnt.astype(np.int64),
                                    np.array([0], np.int64)])
                ),
                "nnan": pa.array(
                    np.concatenate([np.zeros(len(u), np.int64),
                                    np.array([int(vnan.sum())], np.int64)])
                ),
                "ninf": pa.array(
                    np.concatenate([np.zeros(len(u), np.int64),
                                    np.array([int(vinf.sum())], np.int64)])
                ),
                "nzero": pa.array(
                    np.concatenate([np.zeros(len(u), np.int64),
                                    np.array([int((~vnz).sum())], np.int64)])
                ),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "n_vectors",
            "modal_dim",
            "n_ragged",
            "n_with_nan",
            "n_with_inf",
            "n_zero_vectors",
        )
        if t.num_rows == 0:
            return pa.table({c: pa.array([0], pa.int64()) for c in out})
        dim = t["dim"].combine_chunks().to_numpy(zero_copy_only=False)
        nv = t["nv"].combine_chunks().to_numpy(zero_copy_only=False)
        hist = dim >= 0
        u, idx = np.unique(dim[hist], return_inverse=True)
        cnt = np.zeros(len(u), np.int64)
        np.add.at(cnt, idx, nv[hist])
        best = u[np.lexsort((u, -cnt))[0]] if len(u) else 0
        total = int(cnt.sum())
        ragged = total - int(cnt[np.searchsorted(u, best)]) if len(u) else 0
        return pa.table(
            {
                "n_vectors": pa.array([total], pa.int64()),
                "modal_dim": pa.array([int(best)], pa.int64()),
                "n_ragged": pa.array([ragged], pa.int64()),
                "n_with_nan": pa.array(
                    [int(pc.sum(t["nnan"]).as_py())], pa.int64()
                ),
                "n_with_inf": pa.array(
                    [int(pc.sum(t["ninf"]).as_py())], pa.int64()
                ),
                "n_zero_vectors": pa.array(
                    [int(pc.sum(t["nzero"]).as_py())], pa.int64()
                ),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "g", merge, k=1)


def embedding_doc_linkage(sf_dir: str) -> Dataset:
    """T162: embedding↔document linkage audit — corpus-wide: vectors,
    documents, vec_ids with a matching doc_id, ORPHAN vectors (no such
    doc), UNEMBEDDED docs (no vector), and doc_ids carrying more than
    one vector — R48's referential-integrity discipline applied to the
    training-data pair every retrieval/dedup pipeline silently joins
    (a SemDeDup or ANN pass keyed on vec_id=doc_id quietly drops every
    orphan and never scores the unembedded tail; this board prices
    that loss before it happens).  ONE dense row ALWAYS.  Exact int64
    (FULL OUTER JOIN counting oracle).

    Scale shape — ONE id-hash co-partition of two pre-reduced id
    multiset summaries: each side's batches collapse to (id, n) cells
    via one np.unique; both sides of an id land in one partition, so
    match/orphan/fan-out classify locally and collapse to one counter
    row per partition; the k=1 merge sums O(parts) rows."""
    from ..stages.shuffle import hash_partition_merge

    def side_cells(col: str, tag: int):
        def fn(b: pa.Table) -> pa.Table:
            ids = (
                pc.cast(b[col], pa.int64())
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            u, cnt = np.unique(ids, return_counts=True)
            return pa.table(
                {
                    "id": pa.array(u),
                    "side": pa.array(np.full(len(u), tag, np.int64)),
                    "n": pa.array(cnt.astype(np.int64)),
                }
            )

        return fn

    vec = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).map_batches(
        side_cells("vec_id", 0), batch_format="pyarrow", zero_copy_batch=True
    )
    doc = _docs(sf_dir, ["doc_id"]).map_batches(
        side_cells("doc_id", 1), batch_format="pyarrow"
    )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("g", "nv", "nd", "nm", "no_", "nu", "nfan")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["id", "side"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        ids = g["id"].combine_chunks().to_numpy(zero_copy_only=False)
        side = g["side"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        u, idx = np.unique(ids, return_inverse=True)
        vcnt = np.zeros(len(u), np.int64)
        np.add.at(vcnt, idx[side == 0], n[side == 0])
        dcnt = np.zeros(len(u), np.int64)
        np.add.at(dcnt, idx[side == 1], n[side == 1])
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "nv": pa.array([int(vcnt.sum())], pa.int64()),
                "nd": pa.array([int(dcnt.sum())], pa.int64()),
                "nm": pa.array(
                    [int(vcnt[(vcnt > 0) & (dcnt > 0)].sum())], pa.int64()
                ),
                "no_": pa.array(
                    [int(vcnt[dcnt == 0].sum())], pa.int64()
                ),
                "nu": pa.array(
                    [int(dcnt[vcnt == 0].sum())], pa.int64()
                ),
                "nfan": pa.array(
                    [int(((vcnt > 1) & (dcnt > 0)).sum())], pa.int64()
                ),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "n_vectors",
            "n_docs",
            "n_matched_vectors",
            "n_orphan_vectors",
            "n_unembedded_docs",
            "n_multi_vector_ids",
        )
        if t.num_rows == 0:
            return pa.table({c: pa.array([0], pa.int64()) for c in out})
        src = ("nv", "nd", "nm", "no_", "nu", "nfan")
        return pa.table(
            {
                name: pa.array(
                    [int(pc.sum(t[c]).as_py())], pa.int64()
                )
                for name, c in zip(out, src)
            }
        )

    folded = hash_partition_merge(
        vec.union(doc), "id", fold, k=_doc_k(sf_dir)
    )
    return hash_partition_merge(folded, "g", merge, k=1)


def tail_fingerprint(sf_dir: str, tail_chars: int = 24) -> Dataset:
    """T163: tail-fingerprint board — per source: docs, DISTINCT
    ``tail_chars``-character document endings, the docs carrying the
    single most common ending, and its permille — the FOOTER detector
    (T66/T112 fingerprint document OPENINGS, T139 anchors dedup on
    tape PREFIXES; nothing reads the other end, where signatures,
    copyright lines and template footers live — a fat modal-tail
    permille is boilerplate chrome that inflates near-dup scores and
    wastes tokens, and the modal tail count prices what a
    footer-stripping pass would remove).  Short docs contribute their
    whole text.  Exact int64 (right(text, k) GROUP BY oracle; the
    tail STRING decides identity and rides the exchange — hash only
    routes, T118's convention; reverse∘slice∘reverse is codepoint
    right() on both sides).

    Scale shape — ONE tail-hash exchange over pre-reduced cells: each
    batch computes tails with three vectorized kernels and collapses
    to (tail, source, n) cells; every cell of a tail lands in one
    partition, so distinct/modal decide locally and collapse IN PLACE
    to per-source partials; the k=1 merge combines via sum/max
    (distinct counts sum exactly — a tail lives in ONE partition)."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        txt = b["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        tail = pc.utf8_reverse(
            pc.utf8_slice_codeunits(pc.utf8_reverse(txt), 0, tail_chars)
        )
        t = pa.table(
            {
                "tail": tail,
                "src": pc.cast(
                    pc.index_in(b["source"], value_set=srcs), pa.int64()
                ),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by(["tail", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["tail", "src", "n"])
        hs = (
            pl.from_arrow(g.select(["tail"]))["tail"]
            .hash(seed=47)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "tail": g["tail"],
                "src": g["src"],
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("s", "nd", "ntails", "modal")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["tail", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["tail", "src", "n"])
        src = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        nd = np.zeros(ns, np.int64)
        np.add.at(nd, src, n)
        ntails = np.bincount(src, minlength=ns).astype(np.int64)
        modal = np.zeros(ns, np.int64)
        np.maximum.at(modal, src, n)
        keep = np.flatnonzero(ntails)
        return pa.table(
            {
                "s": pa.array(keep),
                "nd": pa.array(nd[keep]),
                "ntails": pa.array(ntails[keep]),
                "modal": pa.array(modal[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "source",
            "n_docs",
            "n_distinct_tails",
            "modal_tail_docs",
            "modal_permille",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("nd", "sum"), ("ntails", "sum"), ("modal", "max")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        nd = g["nd_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nt = g["ntails_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        md = g["modal_max"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        ss, nd, nt, md = ss[order], nd[order], nt[order], md[order]
        return pa.table(
            {
                "source": srcs.take(pa.array(ss, pa.int64())),
                "n_docs": pa.array(nd, pa.int64()),
                "n_distinct_tails": pa.array(nt, pa.int64()),
                "modal_tail_docs": pa.array(md, pa.int64()),
                "modal_permille": pa.array(1000 * md // nd, pa.int64()),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    folded = hash_partition_merge(partials, "h", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(folded, "s", merge, k=1)


def tape_boundary_jump(sf_dir: str) -> Dataset:
    """T164/F: tape boundary-jump spectrum — per source of the F1
    tokenized stream, band the id jump ACROSS each adjacent sequence
    boundary (first token of a sequence minus the LAST token of its
    predecessor in seq order; empty sequences are skipped) into T157's
    signed decimal-magnitude bands — the tape-order continuity read
    T157 deliberately stops short of (T157 measures jumps WITHIN
    sequences, T152 whether a whole payload replays back-to-back; T164
    asks whether the stream's cut points are seams or continuations: a
    zero/±1-band spike means sequences were SPLIT from one document —
    re-joinable context a packing pass should exploit; a flat spectrum
    means genuinely independent records).  Dense small output
    (sources × ≤21 bands); exact int64 (lag(last-token) window +
    digit-length oracle; true ids, no hashing).

    Scale shape — T152's carried-prefix scan on the tape axis
    verbatim: rows tag (source, seq) with first/last tokens PACKED
    into the carried int64 (both < 2³¹); two narrow carry exchanges
    hand each (source, seq-window) its predecessor; one lexsort + one
    shifted unpack-subtract per partition; (source, band) partials
    fold k=1."""
    import glob

    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition
    from .events import _last_event_carries, _tag_carry

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(rd.read_parquet(files, columns=["source"]).unique("source")),
        pa.string(),
    )
    ns = len(srcs)
    off = 10
    nbd = 21
    powers = np.array([10 ** i for i in range(1, 11)], np.int64)
    PACK = 1 << 31

    def narrow(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = (
            pc.cast(pc.list_value_length(toks), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        keep = lens > 0
        ex = pc.extract_regex(
            b["doc_id"].combine_chunks(), r"-(?P<seq>[0-9]+)$"
        )
        seq = (
            pc.cast(pc.struct_field(ex, "seq"), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        offs = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        first = np.zeros(len(lens), np.int64)
        last = np.zeros(len(lens), np.int64)
        first[keep] = flat[offs[:-1][keep]]
        last[keep] = flat[offs[1:][keep] - 1]
        kk = code[keep]
        ss = seq[keep]
        return pa.table(
            {
                "k": pa.array(kk),
                "t": pa.array(ss),
                "o": pa.array(np.zeros(len(kk), np.int64)),
                "v": pa.array(first[keep] * PACK + last[keep]),
                "carry": pa.array(np.zeros(len(kk), dtype=bool)),
                "w": pa.array(ss // (1 << 17), pa.int64()),
            }
        )

    src_ds = rd.read_parquet(files, columns=["doc_id", "tokens", "source"])
    tagged = src_ds.map_batches(
        narrow, batch_format="pyarrow", zero_copy_batch=True
    )
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        cols = ("s", "band", "n")
        if t_.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        kk = t_["k"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t_["v"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, oo, tt, kk))
        ks, vs, crs = kk[order], vv[order], cr[order]
        n = len(order)
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = ks[1:] == ks[:-1]
        pv = np.empty(n, dtype=np.int64)
        pv[0] = 0
        pv[1:] = vs[:-1]
        pair = has_prev & ~crs
        d = np.where(pair, vs // PACK - pv % PACK, 0)
        digits = np.searchsorted(powers, np.abs(d), side="right") + 1
        band = np.where(d == 0, 0, np.sign(d) * digits)
        key = (ks[pair] * nbd + (band[pair] + off)).astype(np.int64)
        cnt = np.bincount(key, minlength=ns * nbd).astype(np.int64)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {
                "s": pa.array(keep // nbd),
                "band": pa.array(keep % nbd - off),
                "n": pa.array(cnt[keep]),
            }
        )

    cells = _kw_partition(full, kernel, shuffle_parts(8))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "jump_band": pa.array([], pa.int64()),
                    "n_pairs": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["s", "band"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["s"]),
                "jump_band": pc.cast(g["band"], pa.int64()),
                "n_pairs": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def lang_run_clustering(sf_dir: str, window_ids: int = 1 << 17) -> Dataset:
    """T165: language-run clustering audit — walk the documents table
    in doc_id order (ties by source) and, per language: docs and
    maximal same-language RUNS plus the run permille — the
    ingestion-batching read on the language axis (T128 bins the lang
    MIX per ingestion decile — a 10-point curve; T165 measures the
    fine-grained clumping itself: near-1000 permille means languages
    arrive shuffled, long runs mean per-language crawl batches — the
    exact situation where a sequential train/val split leaks one
    language into val and where T44's mix looks stable while local
    windows are monolingual).  One dense row per language ALWAYS;
    exact int64 (global lag-window oracle).

    Scale shape — E150's single-key carried-prefix machinery on the
    doc_id axis: rows tag (0, id-window); one lexsort + one shifted
    lang-compare per partition; carries hand each window its
    predecessor's language so boundary runs never double-count."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition
    from .events import _last_event_carries, _tag_carry

    langs = pa.array(
        sorted(_docs(sf_dir, ["lang"]).unique("lang")), pa.string()
    )
    nl = len(langs)

    def narrow(b: pa.Table) -> pa.Table:
        ids = (
            pc.cast(b["doc_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pa.array(np.zeros(b.num_rows, np.int64)),
                "t": pa.array(ids, pa.int64()),
                # tie-break on duplicate doc_ids is the lang code itself
                # (the kernel sorts (t, o, v); o = 0 leaves v = lang as
                # the tie key — the oracle's ORDER BY doc_id, lang)
                "o": pa.array(np.zeros(b.num_rows, np.int64)),
                "v": pc.cast(
                    pc.index_in(b["lang"], value_set=langs), pa.int64()
                ),
                "carry": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "w": pa.array(ids // window_ids, pa.int64()),
            }
        )

    tagged = _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        narrow, batch_format="pyarrow"
    )
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        cols = ("s", "ne", "nr")
        if t_.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        oo = t_["o"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t_["v"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, vv, oo, tt))
        vs, crs = vv[order], cr[order]
        n = len(order)
        pv = np.empty(n, dtype=np.int64)
        pv[0] = -1
        pv[1:] = vs[:-1]
        has_prev = np.empty(n, dtype=bool)
        has_prev[0] = False
        has_prev[1:] = True
        run_start = ~crs & (~has_prev | (vs != pv))
        return pa.table(
            {
                "s": pa.array(np.arange(nl, dtype=np.int64)),
                "ne": pa.array(
                    np.bincount(vs[~crs], minlength=nl).astype(np.int64)
                ),
                "nr": pa.array(
                    np.bincount(vs[run_start], minlength=nl).astype(
                        np.int64
                    )
                ),
            }
        )

    cells = _kw_partition(full, kernel, shuffle_parts(_doc_k(sf_dir)))

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_runs": pa.array([], pa.int64()),
                    "runs_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("ne", "sum"), ("nr", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        ne = g["ne_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nr = g["nr_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = ne > 0
        ss, ne, nr = ss[keep], ne[keep], nr[keep]
        order = np.argsort(ss)
        ss, ne, nr = ss[order], ne[order], nr[order]
        return pa.table(
            {
                "lang": langs.take(pa.array(ss, pa.int64())),
                "n_docs": pa.array(ne, pa.int64()),
                "n_runs": pa.array(nr, pa.int64()),
                "runs_permille": pa.array(1000 * nr // ne, pa.int64()),
            }
        )

    return hash_partition_merge(cells, "s", merge, k=1)


def hapax_share_quantiles(sf_dir: str) -> Dataset:
    """T166: per-doc hapax-share quantiles — per source: docs, and the
    discrete p50/p90 of each doc's PERMILLE of word occurrences whose
    word is a corpus hapax (total corpus frequency exactly 1) — how
    much of a typical document is one-of-a-kind vocabulary (T124
    counts the hapax inventory globally; T64 scores shingle novelty by
    corpus ORDER; T166 localizes the long tail per document: a source
    whose median doc is 100‰ hapax is names/ids/noise that bloats the
    embedding table, exactly the docs a vocabulary-driven quality
    gate would price differently).  One dense row per source ALWAYS;
    exact int64 under the quantile_disc rank rule (df CTE + per-doc
    share + quantile_disc oracle; the exact word string decides
    identity — the hash only routes, T118's convention).

    Scale shape — the T32/T4 df-join discipline, nothing broadcast:
      1. df pass: batches pre-reduce (word, n) cells; ONE word-hash
         exchange settles corpus frequency;
      2. probe pass: batches emit (word, doc, source, n_in_doc) cells
         on the SAME word-hash exchange, where each word's df is
         already resident — only hapax hits survive, corpus-small;
      3. one doc-hash exchange folds hits to per-doc permilles and
         bincounts them per source (the permille axis is ≤1001), so
         the k=1 merge reads both quantiles off a cumsum."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def cells(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        did = (
            pc.cast(b["doc_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "w": flat,
                "doc": pa.array(did[parent], pa.int64()),
                "src": pa.array(code[parent], pa.int64()),
                "n": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        g = t.group_by(["w", "doc", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["w", "doc", "src", "n"])
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=43)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "w": g["w"],
                "doc": g["doc"],
                "src": g["src"],
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def df_fold(t: pa.Table) -> pa.Table:
        """All cells of a word co-locate: compute corpus frequency, emit
        (doc, src, n_total_in_doc, n_hapax_in_doc) partials."""
        cols = ("doc", "src", "nt", "nh")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["w", "doc", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["w", "doc", "src", "n"])
        wcol = g["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        wid = (
            wcol.dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        cf = np.zeros(int(wid.max()) + 1, np.int64)
        np.add.at(cf, wid, n)
        is_hapax = cf[wid] == 1  # corpus frequency exactly 1
        doc = g["doc"].combine_chunks().to_numpy(zero_copy_only=False)
        src = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        key = np.stack([doc, src], axis=1)
        u, idx = np.unique(key, axis=0, return_inverse=True)
        nt = np.zeros(len(u), np.int64)
        np.add.at(nt, idx, n)
        nh = np.zeros(len(u), np.int64)
        np.add.at(nh, idx, np.where(is_hapax, n, 0))
        return pa.table(
            {
                "doc": pa.array(u[:, 0]),
                "src": pa.array(u[:, 1]),
                "nt": pa.array(nt),
                "nh": pa.array(nh),
            }
        )

    def doc_fold(t: pa.Table) -> pa.Table:
        cols = ("s", "pm", "n")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["doc", "src"], use_threads=False).aggregate(
            [("nt", "sum"), ("nh", "sum")]
        )
        src = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        nt = g["nt_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nh = g["nh_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        pm = 1000 * nh // np.maximum(nt, 1)
        key = src * 1001 + pm
        cnt = np.bincount(key, minlength=ns * 1001).astype(np.int64)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {
                "s": pa.array(keep // 1001),
                "pm": pa.array(keep % 1001),
                "n": pa.array(cnt[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("source", "n_docs", "p50_hapax_permille", "p90_hapax_permille")
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by(["s", "pm"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        pm = g["pm"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        rows = {"source": [], "n_docs": [], "p50_hapax_permille": [],
                "p90_hapax_permille": []}
        for si in np.unique(ss):
            sel = ss == si
            p, c = pm[sel], nn[sel]
            order = np.argsort(p)
            p, c = p[order], c[order]
            tot = int(c.sum())
            cum = np.cumsum(c)
            rows["source"].append(si)
            rows["n_docs"].append(tot)
            rows["p50_hapax_permille"].append(
                int(p[np.searchsorted(cum, (tot * 500 + 999) // 1000)])
            )
            rows["p90_hapax_permille"].append(
                int(p[np.searchsorted(cum, (tot * 900 + 999) // 1000)])
            )
        return pa.table(
            {
                "source": srcs.take(pa.array(rows["source"], pa.int64())),
                "n_docs": pa.array(rows["n_docs"], pa.int64()),
                "p50_hapax_permille": pa.array(
                    rows["p50_hapax_permille"], pa.int64()
                ),
                "p90_hapax_permille": pa.array(
                    rows["p90_hapax_permille"], pa.int64()
                ),
            }
        )

    raw = _docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
        cells, batch_format="pyarrow"
    )
    hits = hash_partition_merge(raw, "h", df_fold, k=_doc_k(sf_dir))
    pmc = hash_partition_merge(hits, "doc", doc_fold, k=_doc_k(sf_dir))
    return hash_partition_merge(pmc, "s", merge, k=1)


def brevity_law_matrix(sf_dir: str, len_cap: int = 40) -> Dataset:
    """T167: brevity-law matrix — for every distinct word, cross its
    character length (capped at ``len_cap``) with the bit length of
    its corpus frequency, and count words and occurrence mass per
    cell — Zipf's law of abbreviation as a table (T71 histograms
    length alone, T41 frequency alone; the JOINT says whether frequent
    words are actually shorter in this corpus — natural language bows
    the matrix toward the short-frequent corner, while id/hash spill
    puts mass in the long-rare corner, and a tokenizer budget model
    reads its expected-bytes-per-token straight off the cells).
    Dense small output (≤len_cap × ~30 bands); exact int64
    (df CTE + length + bin-length GROUP BY oracle).

    Scale shape — T118's ONE word-hash exchange: batches pre-reduce
    (word, n) cells with lengths attached; a word's cells co-locate,
    so its corpus frequency — and its cell — settles locally and
    bincounts IN PLACE to (len, freq-band) partials; the k=1 merge
    sums O(parts × cells) rows; the vocabulary never lands anywhere
    whole."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        t = pa.table(
            {
                "w": flat,
                "n": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        g = t.group_by("w", use_threads=False).aggregate([("n", "sum")])
        g = g.rename_columns(["w", "n"])
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=44)
            .to_numpy()
            .view(np.int64)
        )
        wcol = g["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "w": g["w"],
                "len": pc.cast(
                    pc.min_element_wise(
                        pc.utf8_length(wcol), pa.scalar(len_cap)
                    ),
                    pa.int64(),
                ),
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("wl", "fb", "nw", "occ")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["w", "len"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        ln = g["len"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        powers2 = np.int64(1) << np.arange(1, 41)
        fb = np.searchsorted(powers2, n, side="right") + 1
        key = ln * 64 + fb
        u, idx = np.unique(key, return_inverse=True)
        nw = np.bincount(idx).astype(np.int64)
        occ = np.zeros(len(u), np.int64)
        np.add.at(occ, idx, n)
        return pa.table(
            {
                "wl": pa.array(u // 64),
                "fb": pa.array(u % 64),
                "nw": pa.array(nw),
                "occ": pa.array(occ),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("word_len", "freq_band", "n_words", "n_occurrences")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by(["wl", "fb"], use_threads=False).aggregate(
            [("nw", "sum"), ("occ", "sum")]
        )
        return pa.table(
            {
                "word_len": pc.cast(g["wl"], pa.int64()),
                "freq_band": pc.cast(g["fb"], pa.int64()),
                "n_words": pc.cast(g["nw_sum"], pa.int64()),
                "n_occurrences": pc.cast(g["occ_sum"], pa.int64()),
            }
        )

    partials = _docs(sf_dir, ["text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    folded = hash_partition_merge(partials, "h", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(folded, "wl", merge, k=1)


def label_contradiction(sf_dir: str) -> Dataset:
    """T168: label-contradiction audit — group vectors by EXACT
    equality of the embedding payload and report: distinct payloads,
    duplicate groups (>=2 vectors), groups whose members carry MORE
    THAN ONE label, vectors trapped in such contradicted groups, and
    the worst distinct-label fan-out — the label-NOISE detector (T103
    counts exact-dup vector mass; T168 asks the question that matters
    for a classifier: when the same input appears twice, do the labels
    agree?  every contradicted vector is an irreducible-error floor the
    training loss cannot fix, and the fan-out names how bad the worst
    collision is).  ONE dense row ALWAYS.  Exact int64 (DuckDB groups
    lists by value — GROUP BY embedding + COUNT DISTINCT label oracle;
    on the Ray side the full float payload decides identity via a
    polars list group-by and the 64-bit list hash only routes, T118's
    convention).

    Scale shape — ONE vector-hash exchange over pre-reduced cells:
    batches collapse to (hash, vector, label, n) cells via one polars
    list group-by; all cells of a payload co-locate, so group size and
    label fan-out settle locally and collapse to one counter row per
    partition; the k=1 merge sums O(parts) rows."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def partial(b: pa.Table) -> pa.Table:
        cols = ("h", "v", "lab", "n")
        if b.num_rows == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    "v": pa.array([], pa.list_(pa.float32())),
                    "lab": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        df = pl.from_arrow(
            pa.table(
                {
                    "v": b["embedding"],
                    "lab": pc.cast(b["label"], pa.int64()),
                }
            )
        )
        g = (
            df.group_by(["v", "lab"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .with_columns(pl.col("v").hash(seed=45).alias("h"))
        )
        out = g.select(["h", "v", "lab", "n"]).to_arrow()
        return out.set_column(
            0, "h", pc.cast(out["h"], pa.int64(), safe=False)
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("g", "ng", "nd", "nc", "nv", "mf")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        df = pl.from_arrow(t.select(["v", "lab", "n"]))
        g = df.group_by(["v", "lab"]).agg(pl.col("n").sum())
        g2 = g.group_by("v").agg(
            pl.col("n").sum().alias("size"),
            pl.col("lab").n_unique().cast(pl.Int64).alias("fan"),
        )
        size = g2["size"].to_numpy()
        fan = g2["fan"].to_numpy()
        dup = size > 1
        contra = dup & (fan > 1)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "ng": pa.array([len(size)], pa.int64()),
                "nd": pa.array([int(dup.sum())], pa.int64()),
                "nc": pa.array([int(contra.sum())], pa.int64()),
                "nv": pa.array([int(size[contra].sum())], pa.int64()),
                "mf": pa.array(
                    [int(fan[contra].max()) if contra.any() else 0],
                    pa.int64(),
                ),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "n_distinct_vectors",
            "n_dup_groups",
            "n_contradicted_groups",
            "n_contradicted_vectors",
            "max_label_fanout",
        )
        if t.num_rows == 0:
            return pa.table({c: pa.array([0], pa.int64()) for c in out})
        src = ("ng", "nd", "nc", "nv")
        vals = {
            name: pa.array([int(pc.sum(t[c]).as_py())], pa.int64())
            for name, c in zip(out[:4], src)
        }
        vals["max_label_fanout"] = pa.array(
            [int(pc.max(t["mf"]).as_py())], pa.int64()
        )
        return pa.table(vals)

    cells = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    from ..stages.shuffle import adaptive_width

    folded = hash_partition_merge(
        cells, "h", fold,
        k=adaptive_width(f"{sf_dir}/embeddings.parquet", 25_000),
    )
    return hash_partition_merge(folded, "g", merge, k=1)


def opener_spread(sf_dir: str, opener_words: int = 3) -> Dataset:
    """T169: opener-spread spectrum — group docs by their first
    ``opener_words`` whitespace words, keep groups of ≥2, band each
    group by the bit length of its doc_id SPAN (max id − min id;
    band 0 = a re-used id, band 1 = adjacent ids) and count groups
    and member docs per band — WHERE the shared template openers sit
    in ingestion order (T112/T66 count the boilerplate openers and
    their per-source exposure; T169 reads their SPREAD: low bands are
    re-sent batches and crawl-local templates a windowed dedup
    catches, high bands are site-wide chrome spanning the whole
    ingestion — only a global pass finds those; the spectrum prices
    exactly how much a windowed boilerplate scrub would miss).  Dense
    small output (≤~40 bands); exact int64 (prefix GROUP BY + span
    bin-length oracle; the exact opener string decides identity, the
    hash only routes — T118's convention; concat_ws skips missing
    words on both sides, so short docs group by their whole text).

    Scale shape — ONE opener-hash exchange over pre-reduced cells:
    batches collapse to (hash, opener, min_id, max_id, n) cells; an
    opener's cells co-locate, so the group span settles locally and
    bincounts IN PLACE to band partials; the k=1 merge sums
    O(parts × bands) rows; only opener prefixes ride the exchange."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        opener = pc.binary_join(
            pc.list_slice(words, 0, opener_words), " "
        )
        t = pa.table(
            {
                "op": opener,
                "lo": pc.cast(b["doc_id"], pa.int64()),
                "hi": pc.cast(b["doc_id"], pa.int64()),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by("op", use_threads=False).aggregate(
            [("lo", "min"), ("hi", "max"), ("n", "sum")]
        )
        g = g.rename_columns(["op", "lo", "hi", "n"])
        hs = (
            pl.from_arrow(g.select(["op"]))["op"]
            .hash(seed=46)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "op": g["op"],
                "lo": pc.cast(g["lo"], pa.int64()),
                "hi": pc.cast(g["hi"], pa.int64()),
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("band", "ng", "nd")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("op", use_threads=False).aggregate(
            [("lo", "min"), ("hi", "max"), ("n", "sum")]
        )
        lo = g["lo_min"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = g["hi_max"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        dup = n > 1
        span = (hi - lo)[dup]
        nn = n[dup]
        powers2 = np.int64(1) << np.arange(1, 41)
        band = np.where(
            span <= 0, 0, np.searchsorted(powers2, span, side="right") + 1
        )
        u, idx = np.unique(band, return_inverse=True)
        ng = np.bincount(idx).astype(np.int64)
        nd = np.zeros(len(u), np.int64)
        np.add.at(nd, idx, nn)
        return pa.table(
            {
                "band": pa.array(u),
                "ng": pa.array(ng),
                "nd": pa.array(nd),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("span_band", "n_groups", "n_docs")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("band", use_threads=False).aggregate(
            [("ng", "sum"), ("nd", "sum")]
        )
        return pa.table(
            {
                "span_band": pc.cast(g["band"], pa.int64()),
                "n_groups": pc.cast(g["ng_sum"], pa.int64()),
                "n_docs": pc.cast(g["nd_sum"], pa.int64()),
            }
        )

    partials = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    folded = hash_partition_merge(partials, "h", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(folded, "band", merge, k=1)


def grid_population_spectrum(sf_dir: str, q_dims: int = 4) -> Dataset:
    """T170: grid-cell population spectrum — quantize vectors on T96's
    floor(4·x) grid over the first ``q_dims`` dimensions and histogram
    the CELLS by the bit length of their population — the IVF/LSH
    balance read T96 compresses into one max (T96 says the heaviest
    cell's load; T170 shows the whole imbalance curve: a spectrum
    hugging the low bands is a well-spread space where bucketed ANN
    bounds work, a fat top band means hot buckets that serialize — and
    the curve directly prices T102's candidate-pair budget per band).
    Dense small output (≤~30 bands); exact int64 (T96's list-index
    quantize CTE + two-level GROUP BY + bin-length oracle).

    Scale shape — T96's cell-hash discipline: per batch one slice +
    floor + bit-pack reduces vectors to (cell, n) partials; each
    cell's exact population settles in its hash partition and
    bincounts IN PLACE to (band, n_cells, n_vectors) partials; the
    k=1 merge sums O(parts × bands) rows."""
    from ..stages.shuffle import adaptive_width, hash_partition_merge

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {"cell": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)[:, :q_dims]
        )
        q = np.floor(4.0 * m).astype(np.int64)
        packed = np.zeros(n, np.uint64)
        for d in range(q_dims):
            packed = (packed << np.uint64(16)) | (
                (q[:, d] + (1 << 15)).astype(np.uint64) & np.uint64(0xFFFF)
            )
        vals, cnt = np.unique(packed.view(np.int64), return_counts=True)
        return pa.table(
            {
                "cell": pa.array(vals, pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("band", "nc", "nv")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("cell", use_threads=False).aggregate([("n", "sum")])
        tot = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        powers2 = np.int64(1) << np.arange(1, 41)
        band = np.searchsorted(powers2, tot, side="right") + 1
        u, idx = np.unique(band, return_inverse=True)
        nc = np.bincount(idx).astype(np.int64)
        nv = np.zeros(len(u), np.int64)
        np.add.at(nv, idx, tot)
        return pa.table(
            {"band": pa.array(u), "nc": pa.array(nc), "nv": pa.array(nv)}
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("pop_band", "n_cells", "n_vectors")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("band", use_threads=False).aggregate(
            [("nc", "sum"), ("nv", "sum")]
        )
        return pa.table(
            {
                "pop_band": pc.cast(g["band"], pa.int64()),
                "n_cells": pc.cast(g["nc_sum"], pa.int64()),
                "n_vectors": pc.cast(g["nv_sum"], pa.int64()),
            }
        )

    cells = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = hash_partition_merge(
        cells, "cell", fold,
        k=adaptive_width(f"{sf_dir}/embeddings.parquet", 25_000),
    )
    return hash_partition_merge(folded, "band", merge, k=1)


def embedding_quantization_audit(sf_dir: str) -> Dataset:
    """T171: embedding quantization audit — corpus-wide component
    census: components, exactly-integer components (x = ⌊x⌋),
    half-step components (2x integer but x not), and vectors whose
    EVERY component is integer-valued — the dequantization-artifact
    detector (T161 lints NaN/Inf/ragged payloads, T96/T170 quantize
    deliberately; T171 asks whether the floats were ALREADY quantized
    upstream — int8/fixed-point dequantized embeddings land exactly on
    integer or half-step lattices, which silently caps resolution and
    makes cosine ties exact — the provenance smell a similarity
    pipeline should surface before tuning thresholds).  ONE dense row
    ALWAYS.  Exact float comparisons (float32 integers are exact in
    float64), so the board is integer-exact (list_filter + floor
    compare oracle).

    Scale shape — ZERO wide exchange: one flatten + two vectorized
    lattice tests per batch reduce to a single counter row;
    O(batches) partials ride the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(b: pa.Table) -> pa.Table:
        cols = ("g", "ncomp", "nint", "nhalf", "nvint", "nvec")
        e = b["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        flat = e.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        parent = pc.list_parent_indices(e).to_numpy(zero_copy_only=False)
        finite = np.isfinite(flat)
        is_int = finite & (flat == np.floor(flat))
        is_half = finite & ~is_int & (2.0 * flat == np.floor(2.0 * flat))
        vec_all_int = np.ones(n, bool)
        np.logical_and.at(vec_all_int, parent, is_int)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "ncomp": pa.array([len(flat)], pa.int64()),
                "nint": pa.array([int(is_int.sum())], pa.int64()),
                "nhalf": pa.array([int(is_half.sum())], pa.int64()),
                "nvint": pa.array([int(vec_all_int.sum())], pa.int64()),
                "nvec": pa.array([n], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "n_components",
            "n_integer",
            "n_half_step",
            "n_integer_vectors",
            "n_vectors",
        )
        if t.num_rows == 0:
            return pa.table({c: pa.array([0], pa.int64()) for c in out})
        src = ("ncomp", "nint", "nhalf", "nvint", "nvec")
        return pa.table(
            {
                name: pa.array([int(pc.sum(t[c]).as_py())], pa.int64())
                for name, c in zip(out, src)
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "g", merge, k=1)


def length_tail_occupancy(sf_dir: str) -> Dataset:
    """T172: length-tail occupancy board — compute the CORPUS-GLOBAL
    discrete p10/p90 of n_chars, then per source: docs, docs strictly
    below the global p10, and strictly above the global p90 — which
    sources live in the corpus's own tails (T43 histograms each
    source's lengths in isolation, T26 fences outliers per source;
    T172 places every source against the shared distribution: a
    source owning the low tail is fragments/titles, one owning the
    high tail is dumps — exactly the cross-source imbalance a
    length-stratified sampler or a global truncation threshold acts
    on).  One dense row per source ALWAYS; exact int64 under the
    quantile_disc rank rule (global quantile CTE + FILTER counts
    oracle).

    Scale shape — two bounded passes: pass 1 reduces batches to
    (length, n) histogram cells — the value domain is the distinct
    length inventory, corpus-small — and ONE k=1 merge reads both
    thresholds off a cumsum (two scalars cross the driver); pass 2 is
    ZERO-exchange: one compare + bincount per batch against the
    broadcast thresholds, per-source partials fold k=1."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def hist_partial(b: pa.Table) -> pa.Table:
        ln = (
            pc.cast(b["n_chars"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        u, cnt = np.unique(ln, return_counts=True)
        return pa.table(
            {"ln": pa.array(u), "n": pa.array(cnt.astype(np.int64))}
        )

    def hist_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"ln": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        g = t.group_by("ln", use_threads=False).aggregate([("n", "sum")])
        return g.rename_columns(["ln", "n"])

    hist = (
        hash_partition_merge(
            _docs(sf_dir, ["n_chars"]).map_batches(
                hist_partial, batch_format="pyarrow"
            ),
            "ln",
            hist_fold,
            k=_doc_k(sf_dir),
        )
        .to_pandas()
        .sort_values("ln")
    )
    lens = hist["ln"].to_numpy()
    cnts = hist["n"].to_numpy()
    tot = int(cnts.sum())
    cum = np.cumsum(cnts)
    t10 = int(lens[np.searchsorted(cum, (tot * 100 + 999) // 1000)])
    t90 = int(lens[np.searchsorted(cum, (tot * 900 + 999) // 1000)])

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ln = (
            pc.cast(b["n_chars"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        nd = np.bincount(code, minlength=ns).astype(np.int64)
        lo = np.bincount(code[ln < t10], minlength=ns).astype(np.int64)
        hi = np.bincount(code[ln > t90], minlength=ns).astype(np.int64)
        return pa.table(
            {
                "s": pa.array(np.arange(ns, dtype=np.int64)),
                "nd": pa.array(nd),
                "lo": pa.array(lo),
                "hi": pa.array(hi),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("source", "n_docs", "n_below_p10", "n_above_p90")
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("nd", "sum"), ("lo", "sum"), ("hi", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        nd = g["nd_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        lo = g["lo_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = g["hi_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = nd > 0
        ss, nd, lo, hi = ss[keep], nd[keep], lo[keep], hi[keep]
        order = np.argsort(ss)
        ss, nd, lo, hi = ss[order], nd[order], lo[order], hi[order]
        return pa.table(
            {
                "source": srcs.take(pa.array(ss, pa.int64())),
                "n_docs": pa.array(nd, pa.int64()),
                "n_below_p10": pa.array(lo, pa.int64()),
                "n_above_p90": pa.array(hi, pa.int64()),
            }
        )

    partials = _docs(sf_dir, ["source", "n_chars"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def docs_to_half(sf_dir: str) -> Dataset:
    """T173: docs-to-half concentration board — per source: docs,
    total chars, and the MINIMAL number of documents (taken longest
    first) whose combined length covers at least half the source's
    character mass — the few-giants read (T43 histograms the lengths,
    T63 names the top-k longest, T53 runs the Pareto on token
    FREQUENCY; T173 collapses each source's mass concentration into
    one number: docs_to_half ≈ n_docs/2 is a uniform source,
    docs_to_half = 3 is a source whose character budget is three dumps
    plus noise — the number a per-source token-budget planner or a
    truncation policy keys on).  One dense row per source ALWAYS;
    exact int64 (window running-sum oracle — tie order cannot change
    the count because tied docs add equal increments).

    Scale shape — the value domain IS the distinct length inventory:
    batches reduce to (source, length, n) histogram cells; ONE k=1
    merge sorts each source's bins descending once and finds the
    half-mass crossing with a cumsum plus one integer division for
    the partial bin; nothing row-proportional crosses the driver."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ln = (
            pc.cast(b["n_chars"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        key = np.stack([code, ln], axis=1)
        u, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "s": pa.array(u[:, 0].astype(np.int64)),
                "ln": pa.array(u[:, 1].astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("source", "n_docs", "total_chars", "docs_to_half")
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by(["s", "ln"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        ln = g["ln"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        rows = {"source": [], "n_docs": [], "total_chars": [],
                "docs_to_half": []}
        for si in np.unique(ss):
            sel = ss == si
            l, c = ln[sel], nn[sel]
            order = np.argsort(-l)
            l, c = l[order], c[order]
            tot = int((l * c).sum())
            nd = int(c.sum())
            half_needed = 0
            cum = 0
            for li, ci in zip(l, c):
                li, ci = int(li), int(ci)
                if 2 * (cum + li * ci) >= tot:
                    if li > 0:
                        m = (tot - 2 * cum + 2 * li - 1) // (2 * li)
                        m = max(min(m, ci), 1)
                    else:
                        m = 1  # zero-mass: the first doc already covers
                    half_needed += m
                    break
                cum += li * ci
                half_needed += ci
            rows["source"].append(si)
            rows["n_docs"].append(nd)
            rows["total_chars"].append(tot)
            rows["docs_to_half"].append(half_needed)
        return pa.table(
            {
                "source": srcs.take(pa.array(rows["source"], pa.int64())),
                "n_docs": pa.array(rows["n_docs"], pa.int64()),
                "total_chars": pa.array(rows["total_chars"], pa.int64()),
                "docs_to_half": pa.array(rows["docs_to_half"], pa.int64()),
            }
        )

    partials = _docs(sf_dir, ["source", "n_chars"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def word_burstiness_matrix(sf_dir: str) -> Dataset:
    """T174: word burstiness matrix — for every distinct word, cross
    the bit length of its DOCUMENT frequency (how many docs carry it)
    with the bit length of its TOTAL frequency, and count words and
    occurrence mass per cell — the Church-Gale burstiness table (T41
    spectra total frequency alone, T95 document frequency of shingles,
    T167 couples frequency with LENGTH; the tf×df JOINT separates
    function words — high df, tf ≈ df — from bursty content terms
    that pile into few documents (tf ≫ df), the distinction an
    idf-weighted dedup, a keyword extractor, or a stopword list is
    actually built on).  Cells above the diagonal are impossible
    (tf ≥ df), so the matrix is triangular by construction.  Dense
    small output; exact int64 (per-word tf/df CTE + bin-length GROUP
    BY oracle).

    Scale shape — T118's ONE word-hash exchange: batches pre-reduce
    (word, doc) pairs to per-doc counts; a word's cells co-locate, so
    its exact tf and df settle locally and bincount IN PLACE to
    (df-band, tf-band) partials; the k=1 merge sums O(parts × cells)
    rows; the vocabulary never lands anywhere whole."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        did = (
            pc.cast(b["doc_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "w": flat,
                "doc": pa.array(did[parent], pa.int64()),
                "n": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        g = t.group_by(["w", "doc"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["w", "doc", "n"])
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=48)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "w": g["w"],
                "doc": g["doc"],
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("dfb", "tfb", "nw", "occ")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["w", "doc"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["w", "doc", "n"])
        wcol = g["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        wid = (
            wcol.dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        nw = int(wid.max()) + 1
        tf = np.zeros(nw, np.int64)
        np.add.at(tf, wid, n)
        df = np.bincount(wid, minlength=nw).astype(np.int64)
        powers2 = np.int64(1) << np.arange(1, 41)
        dfb = np.searchsorted(powers2, df, side="right") + 1
        tfb = np.searchsorted(powers2, tf, side="right") + 1
        key = dfb * 64 + tfb
        u, idx = np.unique(key, return_inverse=True)
        nwc = np.bincount(idx).astype(np.int64)
        occ = np.zeros(len(u), np.int64)
        np.add.at(occ, idx, tf)
        return pa.table(
            {
                "dfb": pa.array(u // 64),
                "tfb": pa.array(u % 64),
                "nw": pa.array(nwc),
                "occ": pa.array(occ),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("df_band", "tf_band", "n_words", "n_occurrences")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by(["dfb", "tfb"], use_threads=False).aggregate(
            [("nw", "sum"), ("occ", "sum")]
        )
        return pa.table(
            {
                "df_band": pc.cast(g["dfb"], pa.int64()),
                "tf_band": pc.cast(g["tfb"], pa.int64()),
                "n_words": pc.cast(g["nw_sum"], pa.int64()),
                "n_occurrences": pc.cast(g["occ_sum"], pa.int64()),
            }
        )

    partials = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    folded = hash_partition_merge(partials, "h", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(folded, "dfb", merge, k=1)


def threshold_sensitivity(
    sf_dir: str,
    *,
    eval_max_doc_id: int = 10,
    min_words: int = 20,
    max_words: int = 90,
    max_dup_permille: int = 600,
    max_top_permille: int = 130,
    min_stop_permille: int = 20,
) -> Dataset:
    """T175: quality-threshold sensitivity board — for each of the
    three threshold-parametrized T29 filters (word band, repetition,
    stopword floor): docs passing at the CURRENT threshold, and of
    those, docs that would be LOST under a 10%-tightened one (band
    [20,90] → [22,81]; dup ≤600 → ≤540 and top ≤130 → ≤117;
    stop ≥20 → ≥22) — the brittleness read T149/T160 stop short of
    (T149 prices each filter's marginal docs, T160 their overlap; T175
    asks how much of today's pass set sits ON the line: a filter whose
    at-risk mass is large makes the whole corpus composition hostage
    to a threshold nobody remembers choosing).  Dense 3-row output;
    exact int64 (the T149 predicate CTEs evaluated at both thresholds,
    FILTER-count oracle; same `_quality_features` kernel, so the
    boards reconcile by construction).

    Scale shape — T149's ZERO-wide-exchange profile: one streaming
    text pass, six boolean compares per batch, one 3-row partial;
    O(batches) rows ride the k=1 merge."""
    import ray

    from ..stages.shuffle import hash_partition_merge

    eval_ref = _eval_shingle_ref(sf_dir, eval_max_doc_id)
    t_min_w = min_words + (min_words + 9) // 10       # 22
    t_max_w = max_words - (max_words + 9) // 10       # 81
    t_dup = max_dup_permille - max_dup_permille // 10  # 540
    t_top = max_top_permille - max_top_permille // 10  # 117
    t_stop = min_stop_permille + (min_stop_permille + 9) // 10  # 22

    def fn(batch: pa.Table) -> pa.Table:
        cols = ("f", "np_", "nr")
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        n_words, dup, topf, stopf, lang_en, hits = _quality_features(
            batch, ray.get(eval_ref)
        )
        p_band = (n_words >= min_words) & (n_words <= max_words)
        r_band = p_band & ~(
            (n_words >= t_min_w) & (n_words <= t_max_w)
        )
        p_rep = (dup <= max_dup_permille) & (topf <= max_top_permille)
        r_rep = p_rep & ~((dup <= t_dup) & (topf <= t_top))
        p_stop = stopf >= min_stop_permille
        r_stop = p_stop & ~(stopf >= t_stop)
        return pa.table(
            {
                "f": pa.array([0, 1, 2], pa.int64()),
                "np_": pa.array(
                    [int(p_band.sum()), int(p_rep.sum()),
                     int(p_stop.sum())],
                    pa.int64(),
                ),
                "nr": pa.array(
                    [int(r_band.sum()), int(r_rep.sum()),
                     int(r_stop.sum())],
                    pa.int64(),
                ),
            }
        )

    names = pa.array(["band", "rep", "stop"], pa.string())

    def merge(t: pa.Table) -> pa.Table:
        out = ("filter", "n_pass", "n_at_risk", "at_risk_permille")
        if t.num_rows == 0:
            return pa.table(
                {
                    "filter": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by("f", use_threads=False).aggregate(
            [("np_", "sum"), ("nr", "sum")]
        )
        ff = g["f"].combine_chunks().to_numpy(zero_copy_only=False)
        np_ = g["np__sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nr = g["nr_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ff)
        ff, np_, nr = ff[order], np_[order], nr[order]
        return pa.table(
            {
                "filter": names.take(pa.array(ff, pa.int64())),
                "n_pass": pa.array(np_, pa.int64()),
                "n_at_risk": pa.array(nr, pa.int64()),
                "at_risk_permille": pa.array(
                    1000 * nr // np.maximum(np_, 1), pa.int64()
                ),
            }
        )

    partials = _docs(sf_dir, ["doc_id", "source", "lang", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "f", merge, k=1)


def doc_id_gap_spectrum(sf_dir: str, window_ids: int = 1 << 17) -> Dataset:
    """T176: doc-id gap spectrum — walk the DISTINCT doc_ids in order
    and histogram the adjacent-id gaps by bit length (band 1 = the
    dense +1 step; higher bands = holes) plus the total missing-id
    mass — the dropped-batch detector (T159 audits id REUSE, T117
    drift in id order, E114 the event table's id gaps; T176 asks what
    never arrived on the documents table: a spike at band ~10 means
    thousand-doc batches vanished whole — lost files, not lost rows —
    and missing mass prices the loss against n_docs).  Dense small
    output (≤~40 bands); exact int64 (distinct + lag-window oracle).

    Scale shape — E150's single-key carried-prefix machinery on the
    doc-id axis over DISTINCT ids: batches pre-reduce to distinct-id
    cells; the (0, id-window) partition sorts each window once, the
    carries hand it its predecessor, and gap bands bincount in place;
    the k=1 merge sums O(parts × bands) rows."""
    from ..stages.shuffle import hash_partition_merge, shuffle_parts
    from ..stages.temporal import _kw_partition
    from .events import _last_event_carries, _tag_carry

    def narrow(b: pa.Table) -> pa.Table:
        ids = np.unique(
            pc.cast(b["doc_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pa.array(np.zeros(len(ids), np.int64)),
                "t": pa.array(ids, pa.int64()),
                "o": pa.array(np.zeros(len(ids), np.int64)),
                "v": pa.array(ids, pa.int64()),
                "carry": pa.array(np.zeros(len(ids), dtype=bool)),
                "w": pa.array(ids // window_ids, pa.int64()),
            }
        )

    tagged = _docs(sf_dir, ["doc_id"]).map_batches(
        narrow, batch_format="pyarrow"
    )
    carries = _last_event_carries(tagged)
    full = tagged.union(
        carries.map_batches(_tag_carry, batch_format="pyarrow")
    )

    def kernel(t_: pa.Table) -> pa.Table:
        cols = ("band", "ng", "miss")
        if t_.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        tt = t_["t"].combine_chunks().to_numpy(zero_copy_only=False)
        cr = t_["carry"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((cr, tt))
        ts, crs = tt[order], cr[order]
        n = len(order)
        # distinct ids may repeat between a carry and its real twin —
        # dedupe consecutive equal ids (carry sorts after its twin)
        keep_row = np.empty(n, dtype=bool)
        keep_row[0] = True
        keep_row[1:] = ts[1:] != ts[:-1]
        ts = ts[keep_row]
        crs = crs[keep_row]
        if len(ts) < 2:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        gap = ts[1:] - ts[:-1]
        real_pair = ~crs[1:]  # pairs ending on a real row
        gap = gap[real_pair]
        powers2 = np.int64(1) << np.arange(1, 41)
        band = np.searchsorted(powers2, gap, side="right") + 1
        u, idx = np.unique(band, return_inverse=True)
        ng = np.bincount(idx).astype(np.int64)
        miss = np.zeros(len(u), np.int64)
        np.add.at(miss, idx, gap - 1)
        return pa.table(
            {
                "band": pa.array(u),
                "ng": pa.array(ng),
                "miss": pa.array(miss),
            }
        )

    cells = _kw_partition(full, kernel, shuffle_parts(_doc_k(sf_dir)))

    def merge(t: pa.Table) -> pa.Table:
        out = ("gap_band", "n_gaps", "missing_ids")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("band", use_threads=False).aggregate(
            [("ng", "sum"), ("miss", "sum")]
        )
        return pa.table(
            {
                "gap_band": pc.cast(g["band"], pa.int64()),
                "n_gaps": pc.cast(g["ng_sum"], pa.int64()),
                "missing_ids": pc.cast(g["miss_sum"], pa.int64()),
            }
        )

    return hash_partition_merge(cells, "band", merge, k=1)


def stopword_rhythm(sf_dir: str) -> Dataset:
    """T177: stopword-rhythm board — per source: words, stopwords (the
    T10/T149 7-word list, lowercased match), and maximal RUNS of
    consecutive stopwords and of consecutive content words — the
    syntax-alternation read (T68 quantiles the stopword SHARE, T130
    places them by thirds; T177 measures the grammar rhythm itself:
    prose alternates short stop-runs with short content-runs, keyword
    spam is one giant content-run, and templated legalese shows long
    stop-chains — mean run lengths divide out of the counts).  Runs
    are per-document (a run cannot span two docs).  One dense row per
    source ALWAYS; exact int64 (lockstep unnest + lag-window oracle).

    Scale shape — ZERO wide exchange: one split + one is_in + one
    shifted compare per batch (document boundaries break runs via the
    parent index), reduced to per-source counter rows; O(batches ×
    sources) partials ride the k=1 merge."""
    from ..functions import textstats as ts
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)
    stopset = pa.array(list(ts.STOPWORDS))

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        stop = pc.is_in(
            pc.utf8_lower(flat), value_set=stopset
        ).to_numpy(zero_copy_only=False)
        n = len(stop)
        if n == 0:
            return pa.table(
                {
                    c: pa.array([], pa.int64())
                    for c in ("s", "nw", "nst", "nsr", "ncr")
                }
            )
        new_doc = np.empty(n, dtype=bool)
        new_doc[0] = True
        new_doc[1:] = parent[1:] != parent[:-1]
        changed = np.empty(n, dtype=bool)
        changed[0] = True
        changed[1:] = stop[1:] != stop[:-1]
        start = new_doc | changed
        wsrc = code[parent]
        nw = np.bincount(wsrc, minlength=ns).astype(np.int64)
        nst = np.bincount(wsrc[stop], minlength=ns).astype(np.int64)
        nsr = np.bincount(wsrc[start & stop], minlength=ns).astype(np.int64)
        ncr = np.bincount(wsrc[start & ~stop], minlength=ns).astype(np.int64)
        keep = np.flatnonzero(nw)
        return pa.table(
            {
                "s": pa.array(keep),
                "nw": pa.array(nw[keep]),
                "nst": pa.array(nst[keep]),
                "nsr": pa.array(nsr[keep]),
                "ncr": pa.array(ncr[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "source",
            "n_words",
            "n_stopwords",
            "n_stop_runs",
            "n_content_runs",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("nw", "sum"), ("nst", "sum"), ("nsr", "sum"), ("ncr", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        return pa.table(
            {
                "source": srcs.take(pa.array(ss[order], pa.int64())),
                "n_words": pc.cast(g["nw_sum"], pa.int64()).take(
                    pa.array(order, pa.int64())
                ),
                "n_stopwords": pc.cast(g["nst_sum"], pa.int64()).take(
                    pa.array(order, pa.int64())
                ),
                "n_stop_runs": pc.cast(g["nsr_sum"], pa.int64()).take(
                    pa.array(order, pa.int64())
                ),
                "n_content_runs": pc.cast(g["ncr_sum"], pa.int64()).take(
                    pa.array(order, pa.int64())
                ),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def word_suffix_spectrum(sf_dir: str, suffix_chars: int = 2) -> Dataset:
    """T178: word-suffix spectrum — group the DISTINCT vocabulary by
    its last ``suffix_chars`` characters and count word types and
    occurrence mass per suffix — the morphology profile (T71 bins word
    LENGTHS, T167 length×frequency; T178 reads the inflection system
    itself: heavy -ed/-ing/-s mass is morphologically regular English
    a suffix-merging BPE exploits, a flat spectrum is id-soup — and
    per-language suffix signatures are the cheapest langid features
    there are).  Words shorter than the suffix group by their whole
    form.  Dense small output (≤ alphabet^k suffixes); exact int64
    (right(word, k) GROUP BY over the df CTE oracle; the exact word
    decides identity — hash only routes, T118's convention).

    Scale shape — T118's ONE word-hash exchange: batches pre-reduce
    (word, n) cells; a word's cells co-locate, so its corpus frequency
    settles locally and folds IN PLACE into per-suffix partials —
    suffix cells are alphabet-bounded; the k=1 merge sums them."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        t = pa.table(
            {"w": flat, "n": pa.array(np.ones(len(flat), np.int64))}
        )
        g = t.group_by("w", use_threads=False).aggregate([("n", "sum")])
        g = g.rename_columns(["w", "n"])
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=49)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "w": g["w"],
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("suffix", "nw", "occ", "g")
        if t.num_rows == 0:
            return pa.table(
                {
                    "suffix": pa.array([], pa.string()),
                    "nw": pa.array([], pa.int64()),
                    "occ": pa.array([], pa.int64()),
                    "g": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("w", use_threads=False).aggregate([("n", "sum")])
        g = g.rename_columns(["w", "n"])
        wcol = g["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        suf = pc.utf8_reverse(
            pc.utf8_slice_codeunits(
                pc.utf8_reverse(wcol), 0, suffix_chars
            )
        )
        t2 = pa.table(
            {
                "suffix": suf,
                "nw": pa.array(np.ones(g.num_rows, np.int64)),
                "occ": g["n"],
            }
        )
        g2 = t2.group_by("suffix", use_threads=False).aggregate(
            [("nw", "sum"), ("occ", "sum")]
        )
        g2 = g2.rename_columns(["suffix", "nw", "occ"])
        return g2.append_column(
            "g", pa.array(np.zeros(g2.num_rows, np.int64))
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("suffix", "n_words", "n_occurrences")
        if t.num_rows == 0:
            return pa.table(
                {
                    "suffix": pa.array([], pa.string()),
                    "n_words": pa.array([], pa.int64()),
                    "n_occurrences": pa.array([], pa.int64()),
                }
            )
        t = t.drop_columns(["g"]) if "g" in t.column_names else t
        g = t.group_by("suffix", use_threads=False).aggregate(
            [("nw", "sum"), ("occ", "sum")]
        )
        return pa.table(
            {
                "suffix": g["suffix"],
                "n_words": pc.cast(g["nw_sum"], pa.int64()),
                "n_occurrences": pc.cast(g["occ_sum"], pa.int64()),
            }
        )

    partials = _docs(sf_dir, ["text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    folded = hash_partition_merge(partials, "h", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(folded, "g", merge, k=1)


def token_residue_balance(sf_dir: str, modulus: int = 64) -> Dataset:
    """T179/F: token-residue balance board — per residue class of the
    token id modulo ``modulus``: total occurrences and distinct ids —
    the shard-assignment health check for mod-sharded embedding/
    optimizer tables (T129 measures which ids exist, T146 their Pareto;
    T179 asks how the LOAD lands when the table is split id % k ways —
    a skewed residue class is a hot parameter server shard, and
    distinct-vs-occurrence imbalance separates vocabulary skew from
    frequency skew).  Dense ≤modulus rows; exact int64 (modulo GROUP
    BY + COUNT DISTINCT oracle).

    Scale shape — ONE id-hash exchange over (id, n) cells (batches
    pre-reduce with one np.unique): an id's cells co-locate, so
    distinct counts per residue sum exactly across partitions; the
    k=1 merge sums O(parts × modulus) rows."""
    import glob

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        u, cnt = np.unique(flat, return_counts=True)
        return pa.table(
            {"id": pa.array(u), "n": pa.array(cnt.astype(np.int64))}
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("r", "occ", "nid")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("id", use_threads=False).aggregate([("n", "sum")])
        ids = g["id"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        r = ids % modulus
        occ = np.zeros(modulus, np.int64)
        np.add.at(occ, r, n)
        nid = np.bincount(r, minlength=modulus).astype(np.int64)
        keep = np.flatnonzero(nid)
        return pa.table(
            {
                "r": pa.array(keep),
                "occ": pa.array(occ[keep]),
                "nid": pa.array(nid[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("residue", "n_occurrences", "n_distinct_ids")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("r", use_threads=False).aggregate(
            [("occ", "sum"), ("nid", "sum")]
        )
        return pa.table(
            {
                "residue": pc.cast(g["r"], pa.int64()),
                "n_occurrences": pc.cast(g["occ_sum"], pa.int64()),
                "n_distinct_ids": pc.cast(g["nid_sum"], pa.int64()),
            }
        )

    cells = rd.read_parquet(files, columns=["tokens"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = hash_partition_merge(cells, "id", fold, k=8)
    return hash_partition_merge(folded, "r", merge, k=1)


def herdan_matrix(sf_dir: str) -> Dataset:
    """T180: Herdan vocabulary-growth matrix — per document cross the
    bit length of its word COUNT with the bit length of its DISTINCT
    word count, and count docs per cell — Herdan's law (type-token
    scaling) as a table (T70 quantiles the TTR per source, T74 fits
    Heaps' curve for the CORPUS; T180 scatters every doc on the
    length × vocabulary plane: natural prose rides the diagonal's
    lower edge — vocabulary grows sublinearly — while cells ON the
    diagonal at large bands are no-repeat word soup (generated id
    lists) and cells far below it are loop spam; both are exactly the
    non-linguistic payloads a curriculum wants flagged, localized by
    size class).  Triangular by construction (distinct ≤ total).
    Dense small output; exact int64 (per-doc counts + bin-length
    GROUP BY oracle).

    Scale shape — ZERO wide exchange: one split + one per-doc
    np.unique-free distinct count (lexsort over (doc, word-hash) per
    batch) reduces each batch to cell partials; O(batches × cells)
    rows ride the k=1 merge."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    def partial(b: pa.Table) -> pa.Table:
        cols = ("wb", "db", "n")
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        nw = (
            pc.cast(pc.list_value_length(words), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        n = len(nw)
        if n == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        # exact per-doc distinct: the word STRING decides identity
        df = pl.from_arrow(
            pa.table({"p": pa.array(parent, pa.int64()), "w": flat})
        )
        dg = df.group_by("p").agg(pl.col("w").n_unique().alias("nd"))
        nd = np.zeros(n, np.int64)
        nd[dg["p"].to_numpy()] = dg["nd"].to_numpy().astype(np.int64)
        powers2 = np.int64(1) << np.arange(1, 41)
        wb = np.searchsorted(powers2, np.maximum(nw, 1), side="right") + 1
        db = np.searchsorted(powers2, np.maximum(nd, 1), side="right") + 1
        key = wb * 64 + db
        cnt = np.bincount(key, minlength=64 * 64).astype(np.int64)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {
                "wb": pa.array(keep // 64),
                "db": pa.array(keep % 64),
                "n": pa.array(cnt[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("words_band", "distinct_band", "n_docs")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by(["wb", "db"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {
                "words_band": pc.cast(g["wb"], pa.int64()),
                "distinct_band": pc.cast(g["db"], pa.int64()),
                "n_docs": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    partials = _docs(sf_dir, ["text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "wb", merge, k=1)


def template_closure(
    sf_dir: str, opener_words: int = 3, tail_chars: int = 24
) -> Dataset:
    """T181: template-closure board — per source: docs, docs whose
    3-word OPENER is shared with another doc, docs whose 24-char TAIL
    is shared, and docs where BOTH ends are shared with the same
    (opener, tail) pair — the full-template detector (T112/T66 read
    the head, T163 the tail, T169 the opener's ingestion spread; T181
    closes the loop: a doc locked at BOTH ends is a filled-in form —
    near-dup machinery scores it mid-similarity, yet it carries almost
    no novel text, exactly what slips through threshold dedup).  One
    dense row per source ALWAYS; exact int64 (pair GROUP BY + window
    count oracle; exact strings decide identity, hash only routes).

    Scale shape — ONE (opener, tail)-hash exchange over pre-reduced
    cells: the joint pair's cells co-locate, so its group size
    settles locally; opener-only and tail-only shares settle on their
    own exchanges the same way — three narrow passes over
    prefix/suffix strings, never full texts."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def keyed_cells(which: int):
        """which: 0 = opener, 1 = tail, 2 = joint pair."""

        def fn(b: pa.Table) -> pa.Table:
            txt = b["text"]
            if isinstance(txt, pa.ChunkedArray):
                txt = txt.combine_chunks()
            words = pc.split_pattern(txt, " ")
            opener = pc.binary_join(
                pc.list_slice(words, 0, opener_words), " "
            )
            tail = pc.utf8_reverse(
                pc.utf8_slice_codeunits(
                    pc.utf8_reverse(txt), 0, tail_chars
                )
            )
            if which == 0:
                key = opener
            elif which == 1:
                key = tail
            else:
                key = pc.binary_join_element_wise(opener, tail, "\x1f")
            t = pa.table(
                {
                    "key": key,
                    "src": pc.cast(
                        pc.index_in(b["source"], value_set=srcs), pa.int64()
                    ),
                    "n": pa.array(np.ones(b.num_rows, np.int64)),
                }
            )
            g = t.group_by(["key", "src"], use_threads=False).aggregate(
                [("n", "sum")]
            )
            g = g.rename_columns(["key", "src", "n"])
            hs = (
                pl.from_arrow(g.select(["key"]))["key"]
                .hash(seed=51 + which)
                .to_numpy()
                .view(np.int64)
            )
            return pa.table(
                {
                    "h": pa.array(hs, pa.int64()),
                    "key": g["key"],
                    "src": g["src"],
                    "n": pc.cast(g["n"], pa.int64()),
                }
            )

        return fn

    def shared_fold(t: pa.Table) -> pa.Table:
        """Per key group: docs in groups of size >= 2, per source."""
        cols = ("s", "nshared")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["key", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["key", "src", "n"])
        kcol = g["key"]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        kid = (
            kcol.dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        src = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        gsize = np.zeros(int(kid.max()) + 1, np.int64)
        np.add.at(gsize, kid, n)
        shared = gsize[kid] > 1
        out = np.zeros(ns, np.int64)
        np.add.at(out, src[shared], n[shared])
        keep = np.flatnonzero(out)
        return pa.table(
            {"s": pa.array(keep), "nshared": pa.array(out[keep])}
        )

    def count_shared(which: int):
        cells = _docs(sf_dir, ["source", "text"]).map_batches(
            keyed_cells(which), batch_format="pyarrow"
        )
        return hash_partition_merge(
            cells, "h", shared_fold, k=_doc_k(sf_dir)
        )

    totals = _docs(sf_dir, ["source"]).map_batches(
        lambda b: pa.table(
            {
                "s": pc.cast(
                    pc.index_in(b["source"], value_set=srcs), pa.int64()
                ),
                "nd": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        .group_by("s", use_threads=False)
        .aggregate([("nd", "sum")])
        .rename_columns(["s", "nd"]),
        batch_format="pyarrow",
    )

    # three independent shared counts ride distinct marker columns
    def tag(ds, name):
        return ds.map_batches(
            lambda b, _n=name: pa.table(
                {
                    "s": b["s"],
                    "nd": pa.array(np.zeros(b.num_rows, np.int64)),
                    "no": pa.array(
                        b["nshared"]
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                        if _n == "no"
                        else np.zeros(b.num_rows, np.int64)
                    ),
                    "nt": pa.array(
                        b["nshared"]
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                        if _n == "nt"
                        else np.zeros(b.num_rows, np.int64)
                    ),
                    "nb": pa.array(
                        b["nshared"]
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)
                        if _n == "nb"
                        else np.zeros(b.num_rows, np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )

    tot_tagged = totals.map_batches(
        lambda b: pa.table(
            {
                "s": b["s"],
                "nd": b["nd"],
                "no": pa.array(np.zeros(b.num_rows, np.int64)),
                "nt": pa.array(np.zeros(b.num_rows, np.int64)),
                "nb": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    unioned = (
        tot_tagged.union(tag(count_shared(0), "no"))
        .union(tag(count_shared(1), "nt"))
        .union(tag(count_shared(2), "nb"))
    )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "source",
            "n_docs",
            "opener_shared",
            "tail_shared",
            "both_shared",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("nd", "sum"), ("no", "sum"), ("nt", "sum"), ("nb", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        take = pa.array(order, pa.int64())
        return pa.table(
            {
                "source": srcs.take(pa.array(ss[order], pa.int64())),
                "n_docs": pc.cast(g["nd_sum"], pa.int64()).take(take),
                "opener_shared": pc.cast(g["no_sum"], pa.int64()).take(take),
                "tail_shared": pc.cast(g["nt_sum"], pa.int64()).take(take),
                "both_shared": pc.cast(g["nb_sum"], pa.int64()).take(take),
            }
        )

    return hash_partition_merge(unioned, "s", merge, k=1)


def bigram_symmetry(sf_dir: str) -> Dataset:
    """T182: bigram-symmetry board — over all within-doc word bigrams:
    distinct ordered bigram types, UNORDERED pairs observed in BOTH
    directions, ordered types inside such symmetric pairs, and their
    occurrence mass — the word-ORDER signal detector (T142 tests the
    tape's ids for sortedness, T114 scores collocations; T182 asks
    whether word order carries information at all: natural language is
    deeply asymmetric — "of the" vastly outnumbers "the of", and most
    pairs occur one way only — while bag-of-words shuffles and
    generated id soup symmetrize; the symmetric-mass share is the
    single number).  Self-pairs (w w) count as symmetric by
    construction and are reported separately.  ONE dense row ALWAYS;
    exact int64 (bigram CTE + direction self-join oracle; exact word
    strings decide identity — the hash of the UNORDERED pair routes,
    so both directions co-locate).

    Scale shape — ONE unordered-pair-hash exchange over pre-reduced
    ordered-bigram cells: both directions of a pair land in one
    partition, so symmetry is decided locally and collapses to one
    counter row per partition; the k=1 merge sums O(parts) rows."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        n = len(parent)
        if n < 2:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    "a": pa.array([], pa.string()),
                    "b": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        same = parent[1:] == parent[:-1]
        w1 = flat.slice(0, n - 1).filter(pa.array(same))
        w2 = flat.slice(1, n - 1).filter(pa.array(same))
        t = pa.table(
            {
                "a": w1,
                "b": w2,
                "n": pa.array(np.ones(len(w1), np.int64)),
            }
        )
        g = t.group_by(["a", "b"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["a", "b", "n"])
        # route by the UNORDERED pair: hash(min||max)
        df = pl.from_arrow(g.select(["a", "b"]))
        lo = df.select(
            pl.min_horizontal("a", "b").alias("lo"),
            pl.max_horizontal("a", "b").alias("hi"),
        )
        hs = (
            lo.select(
                (pl.col("lo") + "\x1f" + pl.col("hi")).hash(seed=53)
                .alias("h")
            )["h"]
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "a": g["a"],
                "b": g["b"],
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("g", "nt", "nsymp", "nsymt", "msym", "nself", "mtot")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["a", "b"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["a", "b", "n"])
        df = pl.from_arrow(g)
        df = df.with_columns(
            pl.min_horizontal("a", "b").alias("lo"),
            pl.max_horizontal("a", "b").alias("hi"),
            (pl.col("a") == pl.col("b")).alias("selfp"),
        )
        pg = df.group_by(["lo", "hi"]).agg(
            pl.len().cast(pl.Int64).alias("dirs"),
            pl.col("n").sum().alias("mass"),
            pl.col("selfp").any().alias("is_self"),
        )
        dirs = pg["dirs"].to_numpy()
        mass = pg["mass"].to_numpy().astype(np.int64)
        is_self = pg["is_self"].to_numpy()
        sym = (dirs == 2) | is_self
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "nt": pa.array([int(df.height)], pa.int64()),
                "nsymp": pa.array(
                    [int((sym & ~is_self).sum())], pa.int64()
                ),
                "nsymt": pa.array(
                    [int(dirs[sym & ~is_self].sum())], pa.int64()
                ),
                "msym": pa.array(
                    [int(mass[sym].sum())], pa.int64()
                ),
                "nself": pa.array([int(is_self.sum())], pa.int64()),
                "mtot": pa.array([int(mass.sum())], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "n_bigram_types",
            "n_symmetric_pairs",
            "n_symmetric_types",
            "symmetric_mass",
            "n_self_pairs",
            "total_mass",
        )
        if t.num_rows == 0:
            return pa.table({c: pa.array([0], pa.int64()) for c in out})
        src = ("nt", "nsymp", "nsymt", "msym", "nself", "mtot")
        return pa.table(
            {
                name: pa.array([int(pc.sum(t[c]).as_py())], pa.int64())
                for name, c in zip(out, src)
            }
        )

    partials = _docs(sf_dir, ["text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    folded = hash_partition_merge(partials, "h", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(folded, "g", merge, k=1)


def length_mode(sf_dir: str) -> Dataset:
    """T183: length-mode board — per source: docs, the single most
    common EXACT n_chars value (ties → smallest length), its doc
    count, and its permille — the template/truncation spike detector
    (T43 bins lengths by powers of two — a byte-exact spike vanishes
    into its band; T172 places sources in the global tails; T183 asks
    whether one exact length dominates: forms filled to a fixed
    width, truncation at a byte limit, and padded records all print
    here as a fat modal permille that no natural length distribution
    produces).  One dense row per source ALWAYS; exact int64
    (two-level GROUP BY + argmax oracle).

    Scale shape — the value domain is the distinct length inventory:
    batches reduce to (source, length, n) cells; a length's cells
    co-locate per source on the k=1 merge, which takes one argmax per
    source; nothing row-proportional moves."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ln = (
            pc.cast(b["n_chars"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        key = np.stack([code, ln], axis=1)
        u, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "s": pa.array(u[:, 0].astype(np.int64)),
                "ln": pa.array(u[:, 1].astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("source", "n_docs", "modal_length", "modal_count",
               "modal_permille")
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by(["s", "ln"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        ln = g["ln"].combine_chunks().to_numpy(zero_copy_only=False)
        nn = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ln, -nn, ss))
        first = np.empty(len(order), dtype=bool)
        ss_s = ss[order]
        first[0] = True
        first[1:] = ss_s[1:] != ss_s[:-1]
        sel = order[first]
        nd = np.zeros(len(srcs), np.int64)
        np.add.at(nd, ss, nn)
        o2 = np.argsort(ss[sel])
        sel = sel[o2]
        ssel = ss[sel]
        return pa.table(
            {
                "source": srcs.take(pa.array(ssel, pa.int64())),
                "n_docs": pa.array(nd[ssel], pa.int64()),
                "modal_length": pa.array(ln[sel], pa.int64()),
                "modal_count": pa.array(nn[sel], pa.int64()),
                "modal_permille": pa.array(
                    1000 * nn[sel] // nd[ssel], pa.int64()
                ),
            }
        )

    partials = _docs(sf_dir, ["source", "n_chars"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def label_source_matrix(sf_dir: str) -> Dataset:
    """T184: label-source composition matrix — join embeddings to
    documents on vec_id = doc_id and count vectors per (doc source,
    label), plus an UNLINKED row per label for orphan vectors — the
    enrichment join the T162 linkage audit priced (T162 counts
    orphans; T184 actually performs the join every per-source
    classifier evaluation needs: a label concentrated in one source
    is a shortcut feature waiting to be learned, and the matrix is
    the stratification table for balanced sampling).  Dense small
    output (sources × labels + orphan rows); exact int64 (LEFT JOIN +
    GROUP BY oracle).

    Scale shape — ONE id-hash co-partition of two pre-reduced sides:
    embeddings ride as (id, label, n) cells, documents as (id,
    source); an id's rows co-locate, so the attach is one searchsorted
    and the matrix collapses IN PLACE; the k=1 merge sums
    O(parts × cells) rows."""
    from ..stages.shuffle import adaptive_width, hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    )

    def emb_cells(b: pa.Table) -> pa.Table:
        vid = (
            pc.cast(b["vec_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        lab = (
            pc.cast(b["label"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        key = np.stack([vid, lab], axis=1)
        u, cnt = np.unique(key, axis=0, return_counts=True)
        n = len(u)
        return pa.table(
            {
                "id": pa.array(u[:, 0].astype(np.int64)),
                "lab": pa.array(u[:, 1].astype(np.int64)),
                "src": pa.array(np.full(n, -1, np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def doc_cells(b: pa.Table) -> pa.Table:
        vid = (
            pc.cast(b["doc_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        key = np.stack([vid, code], axis=1)
        u = np.unique(key, axis=0)
        n = len(u)
        return pa.table(
            {
                "id": pa.array(u[:, 0].astype(np.int64)),
                "lab": pa.array(np.full(n, -1, np.int64)),
                "src": pa.array(u[:, 1].astype(np.int64)),
                "n": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("src", "lab", "nv")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        labv = t["lab"].combine_chunks().to_numpy(zero_copy_only=False)
        is_emb = labv >= 0
        e = t.filter(pa.array(is_emb))
        d = t.filter(pa.array(~is_emb))
        if e.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        eid = e["id"].combine_chunks().to_numpy(zero_copy_only=False)
        elab = e["lab"].combine_chunks().to_numpy(zero_copy_only=False)
        en = e["n"].combine_chunks().to_numpy(zero_copy_only=False)
        did = np.unique(
            d["id"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        dsrc_map = {}
        if d.num_rows:
            dd = d["id"].combine_chunks().to_numpy(zero_copy_only=False)
            ds_ = d["src"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.argsort(dd, kind="stable")
            dd_s, ds_s = dd[order], ds_[order]
            pos = np.clip(np.searchsorted(dd_s, eid), 0, len(dd_s) - 1)
            hit = dd_s[pos] == eid
            src = np.where(hit, ds_s[pos], ns)  # ns = the UNLINKED slot
        else:
            src = np.full(len(eid), ns, np.int64)
        key = src * (1 << 20) + elab  # labels < 2^20 by schema
        u, idx = np.unique(key, return_inverse=True)
        nv = np.zeros(len(u), np.int64)
        np.add.at(nv, idx, en)
        return pa.table(
            {
                "src": pa.array(u // (1 << 20)),
                "lab": pa.array(u % (1 << 20)),
                "nv": pa.array(nv),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("source", "label", "n_vectors")
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "label": pa.array([], pa.int64()),
                    "n_vectors": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["src", "lab"], use_threads=False).aggregate(
            [("nv", "sum")]
        )
        srcv = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        names = pa.concat_arrays(
            [srcs, pa.array(["<unlinked>"], pa.string())]
        )
        return pa.table(
            {
                "source": names.take(pa.array(srcv, pa.int64())),
                "label": pc.cast(g["lab"], pa.int64()),
                "n_vectors": pc.cast(g["nv_sum"], pa.int64()),
            }
        )

    tagged = emb.map_batches(
        emb_cells, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        _docs(sf_dir, ["doc_id", "source"]).map_batches(
            doc_cells, batch_format="pyarrow"
        )
    )
    cells = hash_partition_merge(
        tagged, "id", fold,
        k=adaptive_width(f"{sf_dir}/embeddings.parquet", 25_000),
    )
    return hash_partition_merge(cells, "src", merge, k=1)


def embedding_selection_bias(
    sf_dir: str,
    *,
    eval_max_doc_id: int = 10,
    min_words: int = 20,
    max_words: int = 90,
    max_dup_permille: int = 600,
    max_top_permille: int = 130,
    min_stop_permille: int = 20,
) -> Dataset:
    """T185: embedding selection-bias board — split the documents
    table by whether a vector exists for the doc (vec_id = doc_id)
    and, per side: docs and docs passing ALL five T29 quality
    predicates — is the embedded subset quality-biased?  (T162 counts
    the linkage, T184 its label composition; T185 asks the curation
    question: if embedded docs pass quality at a different rate than
    the unembedded tail, every embedding-driven dedup/retrieval
    decision inherits that skew — measure it before trusting
    SemDeDup's survivors.)  Two dense rows ALWAYS.  Exact int64 (the
    T149 predicate CTEs + linkage LEFT JOIN oracle; same
    `_quality_features` kernel, so the boards reconcile).

    Scale shape — membership rides an id-hash co-partition (the T162
    exchange) back to the quality pass as per-doc bits settled into
    (doc-block) partials... implemented as: quality flags stream per
    batch; each batch's doc ids probe the embedding id set via the
    SAME id-hash exchange (docs and vec_ids union-tagged), so the
    joined (linked, pass) counters collapse in partition; the k=1
    merge sums O(parts × 2) rows."""
    import ray

    from ..stages.shuffle import adaptive_width, hash_partition_merge

    eval_ref = _eval_shingle_ref(sf_dir, eval_max_doc_id)

    def doc_cells(batch: pa.Table) -> pa.Table:
        n_words, dup, topf, stopf, lang_en, hits = _quality_features(
            batch, ray.get(eval_ref)
        )
        ok = (
            lang_en
            & (n_words >= min_words)
            & (n_words <= max_words)
            & (dup <= max_dup_permille)
            & (topf <= max_top_permille)
            & (stopf >= min_stop_permille)
            & (hits == 0)
        )
        return pa.table(
            {
                "id": pc.cast(batch["doc_id"], pa.int64()),
                "isdoc": pa.array(np.ones(batch.num_rows, np.int64)),
                "ok": pa.array(ok.astype(np.int64)),
            }
        )

    def vec_cells(b: pa.Table) -> pa.Table:
        vid = np.unique(
            pc.cast(b["vec_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        n = len(vid)
        return pa.table(
            {
                "id": pa.array(vid, pa.int64()),
                "isdoc": pa.array(np.zeros(n, np.int64)),
                "ok": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("lk", "nd", "npass")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        isdoc = t["isdoc"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t.filter(pa.array(isdoc == 1))
        v = t.filter(pa.array(isdoc == 0))
        if d.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        did = d["id"].combine_chunks().to_numpy(zero_copy_only=False)
        dok = d["ok"].combine_chunks().to_numpy(zero_copy_only=False)
        vid = np.unique(
            v["id"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        pos = (
            np.clip(np.searchsorted(vid, did), 0, max(len(vid) - 1, 0))
            if len(vid)
            else np.zeros(len(did), np.int64)
        )
        linked = (
            (vid[pos] == did) if len(vid) else np.zeros(len(did), bool)
        ).astype(np.int64)
        nd = np.zeros(2, np.int64)
        np.add.at(nd, linked, 1)
        npass = np.zeros(2, np.int64)
        np.add.at(npass, linked, dok)
        return pa.table(
            {
                "lk": pa.array(np.array([0, 1], np.int64)),
                "nd": pa.array(nd),
                "npass": pa.array(npass),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("linked", "n_docs", "n_pass_all", "pass_permille")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("lk", use_threads=False).aggregate(
            [("nd", "sum"), ("npass", "sum")]
        )
        lk = g["lk"].combine_chunks().to_numpy(zero_copy_only=False)
        nd = g["nd_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        np_ = g["npass_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = nd > 0
        lk, nd, np_ = lk[keep], nd[keep], np_[keep]
        order = np.argsort(lk)
        lk, nd, np_ = lk[order], nd[order], np_[order]
        return pa.table(
            {
                "linked": pa.array(lk, pa.int64()),
                "n_docs": pa.array(nd, pa.int64()),
                "n_pass_all": pa.array(np_, pa.int64()),
                "pass_permille": pa.array(
                    1000 * np_ // np.maximum(nd, 1), pa.int64()
                ),
            }
        )

    docs = _docs(sf_dir, ["doc_id", "source", "lang", "text"]).map_batches(
        doc_cells, batch_format="pyarrow"
    )
    vecs = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).map_batches(vec_cells, batch_format="pyarrow", zero_copy_batch=True)
    cells = hash_partition_merge(
        docs.union(vecs), "id", fold,
        k=adaptive_width(f"{sf_dir}/documents.parquet", 25_000),
    )
    return hash_partition_merge(cells, "lk", merge, k=1)


def bigram_diversity(sf_dir: str) -> Dataset:
    """T186: bigram-diversity board — per source: within-doc word
    bigram occurrences, DISTINCT bigram types, and the type-token
    permille — lexical diversity at order two (T40 measures unigram
    TTR, T114 ranks the strongest collocations, T31 the heaviest
    bigrams; T186 gives the breadth number: templated text reuses the
    same transitions — low permille — while natural prose keeps
    minting new ones, and the ratio between a source's unigram and
    bigram diversities is the phrase-template signal).  One dense row
    per source ALWAYS; exact int64 (bigram CTE + COUNT DISTINCT
    oracle; exact word-pair strings decide identity — the pair hash
    only routes, T118's convention).

    Scale shape — ONE bigram-hash exchange over pre-reduced (bigram,
    source, n) cells: a bigram's cells co-locate, so per-source
    distinct counts sum exactly across partitions; the k=1 merge sums
    O(parts × sources) rows."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        n = len(parent)
        if n < 2:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    "a": pa.array([], pa.string()),
                    "b": pa.array([], pa.string()),
                    "src": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        same = parent[1:] == parent[:-1]
        w1 = flat.slice(0, n - 1).filter(pa.array(same))
        w2 = flat.slice(1, n - 1).filter(pa.array(same))
        psrc = code[parent[1:][same]]
        t = pa.table(
            {
                "a": w1,
                "b": w2,
                "src": pa.array(psrc, pa.int64()),
                "n": pa.array(np.ones(len(w1), np.int64)),
            }
        )
        g = t.group_by(["a", "b", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["a", "b", "src", "n"])
        df = pl.from_arrow(g.select(["a", "b"]))
        hs = (
            df.select(
                (pl.col("a") + "\x1f" + pl.col("b")).hash(seed=54).alias("h")
            )["h"]
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "a": g["a"],
                "b": g["b"],
                "src": g["src"],
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("s", "occ", "nt")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by(["a", "b", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["a", "b", "src", "n"])
        src = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        occ = np.zeros(ns, np.int64)
        np.add.at(occ, src, n)
        nt = np.bincount(src, minlength=ns).astype(np.int64)
        keep = np.flatnonzero(nt)
        return pa.table(
            {
                "s": pa.array(keep),
                "occ": pa.array(occ[keep]),
                "nt": pa.array(nt[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "source",
            "n_bigrams",
            "n_distinct_bigrams",
            "diversity_permille",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [("occ", "sum"), ("nt", "sum")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        occ = g["occ_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nt = g["nt_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        ss, occ, nt = ss[order], occ[order], nt[order]
        return pa.table(
            {
                "source": srcs.take(pa.array(ss, pa.int64())),
                "n_bigrams": pa.array(occ, pa.int64()),
                "n_distinct_bigrams": pa.array(nt, pa.int64()),
                "diversity_permille": pa.array(
                    1000 * nt // np.maximum(occ, 1), pa.int64()
                ),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    folded = hash_partition_merge(partials, "h", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(folded, "s", merge, k=1)


def tape_frame_bands(sf_dir: str) -> Dataset:
    """T187/F: tape frame-band matrix — per source, cross the bit-length
    band of each sequence's FIRST token id with its LAST token's and
    count sequences per cell (empty sequences excluded) — the framing
    structure read (T141 audits specific boundary ids for packing,
    T164 the id JUMP across boundaries, T132 the opener vocabulary;
    T187 asks whether sequences are framed at all: structured records
    open with low reserved ids and close in a narrow band — a tight
    corner cell — while free text scatters the whole grid).  Dense
    small output; exact int64 (list-index + bin-length GROUP BY
    oracle; true ids).

    Scale shape — ZERO wide exchange: one flatten + offset gather per
    batch yields first/last ids; one bincount to (source, cell)
    partials; the k=1 merge sums them."""
    import glob

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(rd.read_parquet(files, columns=["source"]).unique("source")),
        pa.string(),
    )
    ns = len(srcs)
    NB = 34  # bands 0..33 (id 0 -> band 0)

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = (
            pc.cast(pc.list_value_length(toks), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        keep = lens > 0
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        offs = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        first = flat[offs[:-1][keep]]
        last = flat[offs[1:][keep] - 1]
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )[keep]
        powers2 = np.int64(1) << np.arange(1, 33)
        fb = np.where(
            first <= 0, 0, np.searchsorted(powers2, first, side="right") + 1
        )
        lb = np.where(
            last <= 0, 0, np.searchsorted(powers2, last, side="right") + 1
        )
        key = (code * NB + fb) * NB + lb
        cnt = np.bincount(key, minlength=ns * NB * NB).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "s": pa.array(nz // (NB * NB)),
                "fb": pa.array((nz // NB) % NB),
                "lb": pa.array(nz % NB),
                "n": pa.array(cnt[nz]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "first_band": pa.array([], pa.int64()),
                    "last_band": pa.array([], pa.int64()),
                    "n_seqs": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["s", "fb", "lb"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["s"]),
                "first_band": pc.cast(g["fb"], pa.int64()),
                "last_band": pc.cast(g["lb"], pa.int64()),
                "n_seqs": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    partials = rd.read_parquet(files, columns=["source", "tokens"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def word_prefix_spectrum(sf_dir: str, prefix_chars: int = 2) -> Dataset:
    """T188: word-prefix spectrum — group the DISTINCT vocabulary by
    its FIRST ``prefix_chars`` characters and count word types and
    occurrence mass per prefix — derivational morphology's side of the
    T178 pair (T178 reads inflection off the suffixes; T188 reads
    derivation off the prefixes: un-/re-/de- mass in English, and the
    joint prefix/suffix budget is exactly what a BPE merge table
    spends first — while an id-soup corpus flattens both spectra).
    Short words group by their whole form.  Dense small output; exact
    int64 (left(word, k) GROUP BY over the df CTE oracle; the exact
    word decides identity — hash only routes).

    Scale shape — T178's ONE word-hash exchange verbatim, with a
    left-slice instead of the reverse∘slice∘reverse; per-prefix cells
    are alphabet-bounded and fold k=1."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        t = pa.table(
            {"w": flat, "n": pa.array(np.ones(len(flat), np.int64))}
        )
        g = t.group_by("w", use_threads=False).aggregate([("n", "sum")])
        g = g.rename_columns(["w", "n"])
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=55)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "w": g["w"],
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "prefix": pa.array([], pa.string()),
                    "nw": pa.array([], pa.int64()),
                    "occ": pa.array([], pa.int64()),
                    "g": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("w", use_threads=False).aggregate([("n", "sum")])
        g = g.rename_columns(["w", "n"])
        wcol = g["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        pref = pc.utf8_slice_codeunits(wcol, 0, prefix_chars)
        t2 = pa.table(
            {
                "prefix": pref,
                "nw": pa.array(np.ones(g.num_rows, np.int64)),
                "occ": g["n"],
            }
        )
        g2 = t2.group_by("prefix", use_threads=False).aggregate(
            [("nw", "sum"), ("occ", "sum")]
        )
        g2 = g2.rename_columns(["prefix", "nw", "occ"])
        return g2.append_column(
            "g", pa.array(np.zeros(g2.num_rows, np.int64))
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "prefix": pa.array([], pa.string()),
                    "n_words": pa.array([], pa.int64()),
                    "n_occurrences": pa.array([], pa.int64()),
                }
            )
        t = t.drop_columns(["g"]) if "g" in t.column_names else t
        g = t.group_by("prefix", use_threads=False).aggregate(
            [("nw", "sum"), ("occ", "sum")]
        )
        return pa.table(
            {
                "prefix": g["prefix"],
                "n_words": pc.cast(g["nw_sum"], pa.int64()),
                "n_occurrences": pc.cast(g["occ_sum"], pa.int64()),
            }
        )

    partials = _docs(sf_dir, ["text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    folded = hash_partition_merge(partials, "h", fold, k=_doc_k(sf_dir))
    return hash_partition_merge(folded, "g", merge, k=1)


def label_imbalance_spectrum(sf_dir: str) -> Dataset:
    """T189: label-imbalance spectrum — band every label by the bit
    length of its vector count and report labels and vectors per band
    — the class-imbalance read at a glance (T94/T110 profile each
    label's geometry, T184 its source mix; T189 shows the population
    pyramid itself: a fat top band next to a long singleton tail is
    the long-tail classification regime — reweighting or resampling
    territory — while one tight band is a balanced benchmark).
    Dense small output (≤~30 bands); exact int64 (two-level GROUP BY
    + bin-length oracle).

    Scale shape — ONE label-hash exchange over pre-reduced (label, n)
    cells: a label's cells co-locate, so its size settles locally and
    bincounts IN PLACE; the k=1 merge sums O(parts × bands) rows."""
    from ..stages.shuffle import adaptive_width, hash_partition_merge

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label"])

    def partial(b: pa.Table) -> pa.Table:
        lab = (
            pc.cast(b["label"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        u, cnt = np.unique(lab, return_counts=True)
        return pa.table(
            {"lab": pa.array(u), "n": pa.array(cnt.astype(np.int64))}
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("band", "nl", "nv")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("lab", use_threads=False).aggregate([("n", "sum")])
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        powers2 = np.int64(1) << np.arange(1, 41)
        band = np.searchsorted(powers2, n, side="right") + 1
        u, idx = np.unique(band, return_inverse=True)
        nl = np.bincount(idx).astype(np.int64)
        nv = np.zeros(len(u), np.int64)
        np.add.at(nv, idx, n)
        return pa.table(
            {"band": pa.array(u), "nl": pa.array(nl), "nv": pa.array(nv)}
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("size_band", "n_labels", "n_vectors")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("band", use_threads=False).aggregate(
            [("nl", "sum"), ("nv", "sum")]
        )
        return pa.table(
            {
                "size_band": pc.cast(g["band"], pa.int64()),
                "n_labels": pc.cast(g["nl_sum"], pa.int64()),
                "n_vectors": pc.cast(g["nv_sum"], pa.int64()),
            }
        )

    cells = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = hash_partition_merge(
        cells, "lab", fold,
        k=adaptive_width(f"{sf_dir}/embeddings.parquet", 25_000),
    )
    return hash_partition_merge(folded, "band", merge, k=1)


def source_length_drift(sf_dir: str) -> Dataset:
    """T190: per-source length-drift sufficient statistics — per
    source, over its docs: n, Σi, Σi², ΣL, ΣL², Σi·L with i = the
    doc_id (the ingestion-order proxy) and L = n_chars — is each
    source's content getting longer or shorter as the crawl advances?
    (T117 boards the GLOBAL ingestion-order drift by deciles, T126
    its autocorrelation; T190 localizes the regression per source,
    where the actionable signal lives: one source's lengths collapsing
    mid-crawl is a parser regression on that site, invisible once
    pooled.)  One dense row per source ALWAYS.  Int64 bound
    documented: doc_id ≤ ~10¹², L ≤ 10⁶ → Σi·L needs per-epoch
    sharding above ~10⁴ docs/source at max id — the id-rank rescale
    is the consumer's division.  Exact int64 (SUM oracle).

    Scale shape — ZERO wide exchange: six sums per (source, batch)
    row; O(batches × sources) partials ride the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        i = (
            pc.cast(b["doc_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ln = (
            pc.cast(b["n_chars"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        out = {"s": np.arange(ns, dtype=np.int64)}
        out["n"] = np.bincount(code, minlength=ns).astype(np.int64)
        for name, arr in (
            ("si", i),
            ("sii", i * i),
            ("sl", ln),
            ("sll", ln * ln),
            ("sil", i * ln),
        ):
            acc = np.zeros(ns, np.int64)
            np.add.at(acc, code, arr)
            out[name] = acc
        return pa.table({c: pa.array(a) for c, a in out.items()})

    def merge(t: pa.Table) -> pa.Table:
        names = (
            "source",
            "n_docs",
            "sum_i",
            "sum_i_sq",
            "sum_len",
            "sum_len_sq",
            "sum_i_len",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in names[1:]},
                }
            )
        g = t.group_by("s", use_threads=False).aggregate(
            [(c, "sum") for c in ("n", "si", "sii", "sl", "sll", "sil")]
        )
        ss = g["s"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(ss)
        cols = {
            name: g[f"{src}_sum"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)[order]
            for name, src in zip(
                names[1:], ("n", "si", "sii", "sl", "sll", "sil")
            )
        }
        keep = cols["n_docs"] > 0
        return pa.table(
            {
                "source": srcs.take(pa.array(ss[order][keep], pa.int64())),
                **{
                    c: pa.array(a[keep], pa.int64()) for c, a in cols.items()
                },
            }
        )

    partials = _docs(sf_dir, ["doc_id", "source", "n_chars"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def contamination_depth(sf_dir: str, eval_max_doc_id: int = 10) -> Dataset:
    """T191: contamination-depth spectrum — among contaminated docs
    (≥1 eval 3-shingle hit, the T19/T29 rule), band each by the bit
    length of its HIT COUNT and report docs per band, per source —
    verbatim copies versus incidental overlap (T57 counts exposure
    per source as a single number; T191 shows the depth: band-1 docs
    share one phrase — plausibly innocent — while a doc whose hit
    count rivals its shingle count IS the eval document, and the
    right cleanup differs: drop the deep ones, maybe keep the
    shallow).  Sparse exact output (source, depth band, n_docs);
    int64 (the T149 shingle-hit CTE with counts + bin-length
    oracle; same `_quality_features` kernel, so the boards
    reconcile).

    Scale shape — T149's ZERO-wide-exchange profile: the eval shingle
    set ships once via ray.put; each batch counts per-doc hits with
    one searchsorted and bincounts (source, band) cells; the k=1
    merge sums them."""
    import ray

    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)
    eval_ref = _eval_shingle_ref(sf_dir, eval_max_doc_id)

    def fn(batch: pa.Table) -> pa.Table:
        cols = ("s", "band", "n")
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        _, _, _, _, _, hits = _quality_features(
            batch, ray.get(eval_ref)
        )
        code = (
            pc.cast(pc.index_in(batch["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        sel = hits > 0
        if not sel.any():
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        powers2 = np.int64(1) << np.arange(1, 41)
        band = np.searchsorted(powers2, hits[sel], side="right") + 1
        key = code[sel] * 64 + band
        cnt = np.bincount(key, minlength=ns * 64).astype(np.int64)
        keep = np.flatnonzero(cnt)
        return pa.table(
            {
                "s": pa.array(keep // 64),
                "band": pa.array(keep % 64),
                "n": pa.array(cnt[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "depth_band": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["s", "band"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {
                "source": srcs.take(g["s"]),
                "depth_band": pc.cast(g["band"], pa.int64()),
                "n_docs": pc.cast(g["n_sum"], pa.int64()),
            }
        )

    partials = _docs(sf_dir, ["doc_id", "source", "lang", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "s", merge, k=1)


def label_spread_spectrum(sf_dir: str, q_dims: int = 4) -> Dataset:
    """T192: label-spread spectrum — per label count the OCCUPIED
    cells of T96's floor(4·x) grid (first ``q_dims`` dims), band by
    bit length, and report labels and cells per band — within-class
    dispersion, the dual of T101's per-cell purity (T101 asks whether
    a CELL is label-pure; T192 asks whether a LABEL is spatially
    tight: a one-cell label is a point class any centroid separates,
    a hundred-cell label is multimodal — one-vs-rest linear won't cut
    it, and cluster-then-label curricula should split it first).
    Dense small output; exact int64 (quantize + COUNT DISTINCT +
    bin-length oracle).

    Scale shape — distinct (label, cell) cells pre-reduce per batch;
    ONE label-hash exchange settles each label's cell count (its
    cells co-locate); band-bincount IN PLACE; the k=1 merge sums
    O(parts × bands) rows."""
    from ..stages.shuffle import adaptive_width, hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "lab": pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)[:, :q_dims]
        )
        q = np.floor(4.0 * m).astype(np.int64)
        packed = np.zeros(n, np.uint64)
        for d in range(q_dims):
            packed = (packed << np.uint64(16)) | (
                (q[:, d] + (1 << 15)).astype(np.uint64) & np.uint64(0xFFFF)
            )
        lab = (
            pc.cast(batch["label"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        key = np.stack([lab, packed.view(np.int64)], axis=1)
        u = np.unique(key, axis=0)
        return pa.table(
            {
                "lab": pa.array(u[:, 0].astype(np.int64)),
                "cell": pa.array(u[:, 1].astype(np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("band", "nl", "nc")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        lab = t["lab"].combine_chunks().to_numpy(zero_copy_only=False)
        cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        key = np.stack([lab, cell], axis=1)
        u = np.unique(key, axis=0)
        ul, idx = np.unique(u[:, 0], return_inverse=True)
        ncell = np.bincount(idx).astype(np.int64)
        powers2 = np.int64(1) << np.arange(1, 41)
        band = np.searchsorted(powers2, ncell, side="right") + 1
        ub, bidx = np.unique(band, return_inverse=True)
        nl = np.bincount(bidx).astype(np.int64)
        nc = np.zeros(len(ub), np.int64)
        np.add.at(nc, bidx, ncell)
        return pa.table(
            {"band": pa.array(ub), "nl": pa.array(nl), "nc": pa.array(nc)}
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("spread_band", "n_labels", "n_cells")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("band", use_threads=False).aggregate(
            [("nl", "sum"), ("nc", "sum")]
        )
        return pa.table(
            {
                "spread_band": pc.cast(g["band"], pa.int64()),
                "n_labels": pc.cast(g["nl_sum"], pa.int64()),
                "n_cells": pc.cast(g["nc_sum"], pa.int64()),
            }
        )

    cells = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = hash_partition_merge(
        cells, "lab", fold,
        k=adaptive_width(f"{sf_dir}/embeddings.parquet", 25_000),
    )
    return hash_partition_merge(folded, "band", merge, k=1)


def sparsity_spectrum(sf_dir: str) -> Dataset:
    """T193: embedding sparsity spectrum — band every vector by the
    bit length of its EXACT-ZERO component count (band 0 = fully
    dense) and report vectors and zero mass per band — the
    sparse-representation detector (T161 flags ALL-zero vectors and
    NaN; T193 shows the in-between: ReLU features and pruned
    projections carry structured zeros whose fraction decides whether
    sparse kernels/compressed storage pay — a dense-band-only
    spectrum says don't bother).  Dense small output; exact int64
    (list-filter zero count + bin-length oracle; exact float zero
    test).

    Scale shape — ZERO wide exchange: one flatten + one compare + one
    parent bincount per batch to band partials; the k=1 merge sums
    them."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(b: pa.Table) -> pa.Table:
        cols = ("band", "nv", "nz")
        e = b["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        flat = e.flatten().to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(e).to_numpy(zero_copy_only=False)
        zero = flat == 0.0
        zc = np.zeros(n, np.int64)
        np.add.at(zc, parent, zero.astype(np.int64))
        powers2 = np.int64(1) << np.arange(1, 41)
        band = np.where(
            zc <= 0, 0, np.searchsorted(powers2, zc, side="right") + 1
        )
        u, idx = np.unique(band, return_inverse=True)
        nv = np.bincount(idx).astype(np.int64)
        nz = np.zeros(len(u), np.int64)
        np.add.at(nz, idx, zc)
        return pa.table(
            {"band": pa.array(u), "nv": pa.array(nv), "nz": pa.array(nz)}
        )

    def merge(t: pa.Table) -> pa.Table:
        out = ("zero_band", "n_vectors", "n_zero_components")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in out})
        g = t.group_by("band", use_threads=False).aggregate(
            [("nv", "sum"), ("nz", "sum")]
        )
        return pa.table(
            {
                "zero_band": pc.cast(g["band"], pa.int64()),
                "n_vectors": pc.cast(g["nv_sum"], pa.int64()),
                "n_zero_components": pc.cast(g["nz_sum"], pa.int64()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "band", merge, k=1)


def dominant_token(sf_dir: str) -> Dataset:
    """T194/F: dominant-token board — per source of the F1 tokenized
    stream: occurrences, the single most frequent token id (ties →
    smallest), its count, and its permille — the filler detector
    (T146 curves the whole Pareto, T129 maps occupancy; T194 collapses
    each source to its worst repeat offender: a modal permille in the
    hundreds is a pad/unk/boilerplate id eating the loss mass —
    weight it down before it trains the model to predict filler).
    One dense row per source ALWAYS; exact int64 (two-level GROUP BY
    + argmax oracle; true ids).

    Scale shape — (source, id) occurrence cells pre-reduce per batch;
    ONE (source, id)-hash exchange settles counts and keeps
    per-partition bests; the k=1 merge argmaxes O(parts × sources)
    candidates."""
    import glob

    from ..stages.shuffle import hash_partition_merge

    files = sorted(glob.glob(sf_dir + "/*.parquet"))
    srcs = pa.array(
        sorted(rd.read_parquet(files, columns=["source"]).unique("source")),
        pa.string(),
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        key = code[parent] * (1 << 32) + flat
        u, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"si": pa.array(u), "n": pa.array(cnt.astype(np.int64))}
        )

    def fold(t: pa.Table) -> pa.Table:
        cols = ("s", "tok", "cnt", "tot")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = t.group_by("si", use_threads=False).aggregate([("n", "sum")])
        si = g["si"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        s = si >> 32
        tok = si & ((1 << 32) - 1)
        order = np.lexsort((tok, -n, s))
        first = np.empty(len(order), dtype=bool)
        s_s = s[order]
        first[0] = True
        first[1:] = s_s[1:] != s_s[:-1]
        sel = order[first]
        tot = np.zeros(ns, np.int64)
        np.add.at(tot, s, n)
        keep = np.flatnonzero(tot)
        bt = np.zeros(ns, np.int64)
        bc = np.zeros(ns, np.int64)
        bt[s[sel]] = tok[sel]
        bc[s[sel]] = n[sel]
        return pa.table(
            {
                "s": pa.array(keep),
                "tok": pa.array(bt[keep]),
                "cnt": pa.array(bc[keep]),
                "tot": pa.array(tot[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "source",
            "n_occurrences",
            "modal_token",
            "modal_count",
            "modal_permille",
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    **{c: pa.array([], pa.int64()) for c in out[1:]},
                }
            )
        ss = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        tok = t["tok"].combine_chunks().to_numpy(zero_copy_only=False)
        cnt = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        tt_ = t["tot"].combine_chunks().to_numpy(zero_copy_only=False)
        tot = np.zeros(ns, np.int64)
        np.add.at(tot, ss, tt_)
        order = np.lexsort((tok, -cnt, ss))
        first = np.empty(len(order), dtype=bool)
        ss_s = ss[order]
        first[0] = True
        first[1:] = ss_s[1:] != ss_s[:-1]
        sel = order[first]
        keep = np.flatnonzero(tot)
        bt = np.zeros(ns, np.int64)
        bc = np.zeros(ns, np.int64)
        bt[ss[sel]] = tok[sel]
        bc[ss[sel]] = cnt[sel]
        o2 = np.argsort(keep)
        keep = keep[o2]
        return pa.table(
            {
                "source": srcs.take(pa.array(keep, pa.int64())),
                "n_occurrences": pa.array(tot[keep], pa.int64()),
                "modal_token": pa.array(bt[keep], pa.int64()),
                "modal_count": pa.array(bc[keep], pa.int64()),
                "modal_permille": pa.array(
                    1000 * bc[keep] // np.maximum(tot[keep], 1), pa.int64()
                ),
            }
        )

    cells = rd.read_parquet(files, columns=["source", "tokens"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = hash_partition_merge(cells, "si", fold, k=8)
    return hash_partition_merge(folded, "s", merge, k=1)


def energy_drift(sf_dir: str, threshold: float = 1.0) -> Dataset:
    """T195: embedding energy-drift sufficient statistics — over all
    vectors: n, Σi, Σi², Σe, Σe², Σi·e with i = vec_id (the
    generation-order proxy) and e = the INTEGER count of components
    with |x| > ``threshold`` — is the embedding model's output
    distribution drifting across the corpus?  (T117/T190 read
    ingestion drift on the TEXT side; embeddings generated in batches
    drift too — a checkpoint swap or normalization change mid-run
    shifts the big-component count, and the OLS slope off these sums
    catches it exactly where cosine thresholds silently degrade.)
    The energy proxy is integer-exact (float compare), so the board
    avoids float-sum nondeterminism entirely.  ONE dense row ALWAYS.
    Exact int64 (list-filter count + SUM oracle).

    Scale shape — ZERO wide exchange: one flatten + compare + parent
    bincount per batch to six sums; O(batches) partials fold k=1."""
    from ..stages.shuffle import hash_partition_merge

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def partial(b: pa.Table) -> pa.Table:
        cols = ("g", "n", "si", "sii", "se", "see", "sie")
        e = b["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        flat = e.flatten().to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(e).to_numpy(zero_copy_only=False)
        big = np.abs(flat) > threshold
        ec = np.zeros(n, np.int64)
        np.add.at(ec, parent, big.astype(np.int64))
        vid = (
            pc.cast(b["vec_id"], pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "n": pa.array([n], pa.int64()),
                "si": pa.array([int(vid.sum())], pa.int64()),
                "sii": pa.array([int((vid * vid).sum())], pa.int64()),
                "se": pa.array([int(ec.sum())], pa.int64()),
                "see": pa.array([int((ec * ec).sum())], pa.int64()),
                "sie": pa.array([int((vid * ec).sum())], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        out = (
            "n_vectors",
            "sum_i",
            "sum_i_sq",
            "sum_e",
            "sum_e_sq",
            "sum_i_e",
        )
        if t.num_rows == 0:
            return pa.table({c: pa.array([0], pa.int64()) for c in out})
        src = ("n", "si", "sii", "se", "see", "sie")
        return pa.table(
            {
                name: pa.array([int(pc.sum(t[c]).as_py())], pa.int64())
                for name, c in zip(out, src)
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "g", merge, k=1)


def half_jaccard(sf_dir: str) -> Dataset:
    """T196: per-doc half-overlap quantiles (round 5) — per source: docs
    and the discrete p50/p90 of each document's HALF-JACCARD permille:
    split the word stream at the midpoint (first ⌊n/2⌋ words vs the rest)
    and score 1000·|vocab(A) ∩ vocab(B)| // |vocab(A) ∪ vocab(B)| — the
    LONG-RANGE internal redundancy read none of the repetition boards
    carry (T18 scores ADJACENT repeats, T94 cross-doc shingle reuse,
    T166 one-of-a-kind vocabulary; T196 asks whether a doc's two halves
    tell the same story — templated/boilerplate generation scores high,
    narrative prose low, and the number predicts how much a
    context-window-halving truncation actually loses).  One dense row
    per source ALWAYS; exact int64 under the quantile_disc rank rule
    (list_slice + list_distinct/intersect oracle — word identity is the
    exact string; the in-batch dictionary codes ARE exact identities,
    no hash convention needed).

    Scale shape — ZERO data shuffle (T49's profile): the half-split,
    per-half vocabularies and the intersection are all BATCH-LOCAL (one
    split_pattern, one dictionary_encode, two lexsort/unique passes over
    the flattened words); each batch reduces to (source, permille, freq)
    partials on a ≤ sources × 1001 domain; both quantiles read off one
    cumsum in the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        nw = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        offs = np.zeros(len(nw) + 1, dtype=np.int64)
        np.cumsum(nw, out=offs[1:])
        pos = np.arange(int(offs[-1]), dtype=np.int64) - offs[:-1][parent]
        half = (pos >= (nw // 2)[parent]).astype(np.int64)
        codes = (
            flat.dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # distinct (doc, half, word) triples
        order = np.lexsort((codes, half, parent))
        p2, h2, c2 = parent[order], half[order], codes[order]
        uniq = np.empty(len(order), dtype=bool)
        if len(order):
            uniq[0] = True
            uniq[1:] = (
                (p2[1:] != p2[:-1]) | (h2[1:] != h2[:-1]) | (c2[1:] != c2[:-1])
            )
        pu, hu, cu = p2[uniq], h2[uniq], c2[uniq]
        n_docs = b.num_rows
        na = np.bincount(pu[hu == 0], minlength=n_docs)
        nb = np.bincount(pu[hu == 1], minlength=n_docs)
        # intersection: among distinct triples, sort by (doc, word) — a word
        # in both halves of one doc forms an adjacent pair with half 0 then 1
        o2 = np.lexsort((hu, cu, pu))
        p3, h3, c3 = pu[o2], hu[o2], cu[o2]
        both = np.zeros(n_docs, np.int64)
        if len(p3) > 1:
            pair = (
                (p3[1:] == p3[:-1]) & (c3[1:] == c3[:-1])
                & (h3[:-1] == 0) & (h3[1:] == 1)
            )
            np.add.at(both, p3[1:][pair], 1)
        union = na + nb - both
        perm = np.where(union > 0, 1000 * both // np.maximum(union, 1), 0)
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        grid = np.zeros(ns * 1001, np.int64)
        np.add.at(grid, code * 1001 + perm, 1)
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "g": pa.array(np.zeros(len(live), np.int64)),
                "src": pa.array(live // 1001),
                "perm": pa.array(live % 1001),
                "f": pa.array(grid[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid = np.zeros(ns * 1001, np.int64)
        if t.num_rows:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            p = t["perm"].combine_chunks().to_numpy(zero_copy_only=False)
            f = t["f"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(grid, s * 1001 + p, f)
        g2 = grid.reshape(ns, 1001)
        n_docs = g2.sum(axis=1)
        cum = np.cumsum(g2, axis=1)
        out_q = {}
        for q, name in ((500, "p50_permille"), (900, "p90_permille")):
            thr = (n_docs * q + 999) // 1000
            idx = np.minimum(
                (cum >= thr[:, None]).argmax(axis=1), 1000
            )
            out_q[name] = np.where(n_docs > 0, idx, 0)
        return pa.table(
            {
                "source": srcs,
                "n_docs": pa.array(n_docs.astype(np.int64)),
                "p50_permille": pa.array(out_q["p50_permille"].astype(np.int64)),
                "p90_permille": pa.array(out_q["p90_permille"].astype(np.int64)),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "g", merge, k=1)


def wordlen_maturity(sf_dir: str) -> Dataset:
    """T197: word-length maturity profile — per (source, CHARACTER word
    length): total occurrences, distinct word TYPES, and types whose
    WITHIN-SOURCE frequency is exactly 1 — the lexicon-maturity read by
    orthographic band that none of the length or rarity boards carry
    (T71 counts occurrences per length with no type structure, T124
    counts corpus-GLOBAL singletons with no length structure; T197
    crosses them WITHIN the source: a healthy corpus slice shows short
    lengths dominated by a small closed type set and hapax mass
    concentrating in the long tail — singleton mass at length ≤ 3 is
    the classic OCR/segmentation-damage signature, invisible to either
    marginal).  One row per OCCUPIED (source, length) cell; exact int64
    (unnest + per-(source, word) count + length GROUP BY oracle; the
    64-bit hash only ROUTES — the exact word string rides the exchange
    and decides identity, T4's convention; utf8_length = DuckDB len()).

    Scale shape — T124's word-hash exchange with a LENGTH re-reduce:
    batches pre-reduce with one split + one Arrow group_by to
    (hash, source, word, n) cells; the word-hash partition holds every
    cell of a word, so its exact within-source count (and the hapax
    test) settles locally and collapses IN PLACE to a
    ≤ sources × max-length grid before anything moves again; the k=1
    densifying merge folds O(partitions × cells) rows.  The vocabulary
    never lands on one node; word strings never reach the driver."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    ds = _docs(sf_dir, ["text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        words = pc.split_pattern(batch["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        code = pc.cast(
            pc.index_in(batch["source"], value_set=srcs), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "w": flat,
                "src": pa.array(code[parent].astype(np.int64)),
                "n": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        g = t.group_by(["w", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["w", "src", "n"])
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "src": g["src"],
                "w": g["w"],
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "occ": pa.array([], pa.int64()),
                    "types": pa.array([], pa.int64()),
                    "hapax": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["w", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["w", "src", "n"])
        wcol = g["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        wlen = pc.cast(pc.utf8_length(wcol), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        src = g["src"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        # (src, wlen) cell id on the partition's own length range
        ml = int(wlen.max()) + 1
        cell = src * ml + wlen
        ucell, idx = np.unique(cell, return_inverse=True)
        occ = np.bincount(idx, weights=n).astype(np.int64)
        types = np.bincount(idx)
        hapax = np.bincount(idx[n == 1], minlength=len(ucell))
        # re-encode on the GLOBAL convention: src * 2**20 + wlen (length
        # is bounded by the longest word in the corpus, far below 2**20)
        return pa.table(
            {
                "cell": pa.array(
                    (ucell // ml) * (1 << 20) + (ucell % ml), pa.int64()
                ),
                "occ": pa.array(occ),
                "types": pa.array(types.astype(np.int64)),
                "hapax": pa.array(hapax.astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "wlen": pa.array([], pa.int64()),
                    "n_occurrences": pa.array([], pa.int64()),
                    "n_types": pa.array([], pa.int64()),
                    "n_hapax": pa.array([], pa.int64()),
                }
            )
        cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        ucell, idx = np.unique(cell, return_inverse=True)
        occ = np.zeros(len(ucell), np.int64)
        types = np.zeros(len(ucell), np.int64)
        hapax = np.zeros(len(ucell), np.int64)
        for acc, col in ((occ, "occ"), (types, "types"), (hapax, "hapax")):
            np.add.at(
                acc, idx,
                t[col].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(ucell >> 20)),
                "wlen": pa.array((ucell & ((1 << 20) - 1)).astype(np.int64)),
                "n_occurrences": pa.array(occ),
                "n_types": pa.array(types),
                "n_hapax": pa.array(hapax),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "h", fold)
    return hash_partition_merge(cells, "cell", merge, k=1)


def vocab_halflife(sf_dir: str) -> Dataset:
    """T198: within-doc vocabulary half-life quantiles — per source: docs
    and the discrete p50/p90 of each document's HALF-LIFE permille: the
    1-based word position at which the running count of distinct word
    types first reaches half the doc's total types (the quantile_disc
    median of the types' first-occurrence positions), as a permille of
    doc length — WHERE novelty saturates inside a document, the read
    none of the redundancy boards carry (T196 scores how much the two
    halves OVERLAP, T123 prices chunk boundaries, T173 concentrates
    MASS across docs; T198 reads the novelty CURVE's knee: ~500‰ means
    vocabulary arrives evenly to the end — prose; ≪ 500‰ means the doc
    spends its lexicon early and repeats — templates, logs, chorus-heavy
    text — and predicts which SIDE of a truncation carries the
    information).  One dense row per source ALWAYS; exact int64 under
    the quantile_disc rank rule at BOTH levels (per-doc median of
    min-position via quantile_disc(mp, 0.5), per-source p50/p90 of the
    permille — range-unnest + min(i) + two-level quantile_disc oracle;
    word identity is the exact string, in-batch dictionary codes ARE
    exact identities).

    Scale shape — ZERO data shuffle (T196's profile): first-occurrence
    positions, per-doc type counts and the k-th order statistic are all
    BATCH-LOCAL (one split_pattern, one dictionary_encode, two lexsort
    passes, one offset-indexed gather — no per-row loop); each batch
    reduces to (source, permille, freq) partials on a ≤ sources × 1001
    domain; both source-level quantiles read off one cumsum in the k=1
    merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        nw = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        offs = np.zeros(len(nw) + 1, dtype=np.int64)
        np.cumsum(nw, out=offs[1:])
        pos = np.arange(int(offs[-1]), dtype=np.int64) - offs[:-1][parent]
        codes = (
            flat.dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # first occurrence of each (doc, word): sort (doc, word, pos) and
        # keep group heads — their pos is the min position
        order = np.lexsort((pos, codes, parent))
        p2, c2, s2 = parent[order], codes[order], pos[order]
        uniq = np.empty(len(order), dtype=bool)
        if len(order):
            uniq[0] = True
            uniq[1:] = (p2[1:] != p2[:-1]) | (c2[1:] != c2[:-1])
        fp, fpos = p2[uniq], s2[uniq]
        n_docs = b.num_rows
        n_types = np.bincount(fp, minlength=n_docs)
        # per-doc median first-occurrence position: k-th smallest with
        # k = ceil(T/2) (== quantile_disc(mp, 0.5))
        o2 = np.lexsort((fpos, fp))
        fpos_s = fpos[o2]
        cum = np.zeros(n_docs + 1, np.int64)
        np.cumsum(n_types, out=cum[1:])
        sel = cum[:-1] + (n_types + 1) // 2 - 1
        mp = fpos_s[np.minimum(sel, len(fpos_s) - 1)]
        pm = 1000 * (mp + 1) // np.maximum(nw, 1)
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        grid = np.zeros(ns * 1001, np.int64)
        np.add.at(grid, code * 1001 + pm, 1)
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "g": pa.array(np.zeros(len(live), np.int64)),
                "src": pa.array(live // 1001),
                "perm": pa.array(live % 1001),
                "f": pa.array(grid[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid = np.zeros(ns * 1001, np.int64)
        if t.num_rows:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            p = t["perm"].combine_chunks().to_numpy(zero_copy_only=False)
            f = t["f"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(grid, s * 1001 + p, f)
        g2 = grid.reshape(ns, 1001)
        n_docs = g2.sum(axis=1)
        cum = np.cumsum(g2, axis=1)
        out_q = {}
        for q, name in ((500, "p50_permille"), (900, "p90_permille")):
            thr = (n_docs * q + 999) // 1000
            idx = np.minimum((cum >= thr[:, None]).argmax(axis=1), 1000)
            out_q[name] = np.where(n_docs > 0, idx, 0)
        return pa.table(
            {
                "source": srcs,
                "n_docs": pa.array(n_docs.astype(np.int64)),
                "p50_permille": pa.array(
                    out_q["p50_permille"].astype(np.int64)
                ),
                "p90_permille": pa.array(
                    out_q["p90_permille"].astype(np.int64)
                ),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "g", merge, k=1)


def topword_spread(sf_dir: str) -> Dataset:
    """T199: modal-word spread quantiles — per source: docs (≥ 2 words)
    and the discrete p50/p90 of each document's MODAL-WORD SPREAD
    permille: take the doc's most frequent word (ties broken by the
    lexicographically SMALLEST word — a deterministic, engine-agnostic
    rule) and score 1000·(last_pos − first_pos) // (n_words − 1) — HOW
    the dominant word occupies the document, the dispersion read none
    of the frequency boards carry (T52 names each source's modal word,
    T18 scores ADJACENT repeats, T198 reads where NEW types stop
    arriving; T199 asks whether the top word is a local burst — a
    quoted block, a table — or the document's backbone: spread → 0 is
    clustered mention, spread → 1000 is a word that frames the text
    end to end; singleton modal words score 0 by construction).  One
    dense row per source ALWAYS; exact int64 under the quantile_disc
    rank rule (range-unnest + count/min/max + row_number tie-break
    oracle).

    Scale shape — ZERO data shuffle (T196's profile): per-(doc, word)
    count/min/max positions fall out of ONE lexsort over (doc, code,
    pos) group boundaries; the modal pick is a second lexsort over
    (doc, −count, string-RANK) group heads, where the rank comes from
    argsort of the batch's dictionary — exact string order without
    shipping strings; each batch reduces to (source, permille, freq)
    partials on a ≤ sources × 1001 domain; both quantiles read off one
    cumsum in the k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        nw = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        offs = np.zeros(len(nw) + 1, dtype=np.int64)
        np.cumsum(nw, out=offs[1:])
        pos = np.arange(int(offs[-1]), dtype=np.int64) - offs[:-1][parent]
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # exact string rank per dictionary code (argsort of argsort)
        dic = enc.dictionary.to_numpy(zero_copy_only=False)
        rank = np.empty(len(dic), np.int64)
        rank[np.argsort(dic)] = np.arange(len(dic), dtype=np.int64)
        # per-(doc, word) count / min pos / max pos off one sorted pass
        order = np.lexsort((pos, codes, parent))
        p2, c2, s2 = parent[order], codes[order], pos[order]
        head = np.empty(len(order), dtype=bool)
        head[0] = True
        head[1:] = (p2[1:] != p2[:-1]) | (c2[1:] != c2[:-1])
        starts = np.flatnonzero(head)
        cnt = np.diff(starts, append=len(order))
        gp = p2[starts]
        gc = c2[starts]
        mn = s2[starts]
        mx = s2[np.append(starts[1:], len(order)) - 1]
        # modal per doc: first group under (doc, -count, string rank)
        o2 = np.lexsort((rank[gc], -cnt, gp))
        doc_head = np.empty(len(o2), dtype=bool)
        doc_head[0] = True
        gp_o = gp[o2]
        doc_head[1:] = gp_o[1:] != gp_o[:-1]
        sel = o2[doc_head]
        docs = gp[sel]
        spread = np.zeros(b.num_rows, np.int64)
        denom = np.maximum(nw - 1, 1)
        spread[docs] = 1000 * (mx[sel] - mn[sel]) // denom[docs]
        elig = nw >= 2
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        grid = np.zeros(ns * 1001, np.int64)
        np.add.at(grid, code[elig] * 1001 + spread[elig], 1)
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "g": pa.array(np.zeros(len(live), np.int64)),
                "src": pa.array(live // 1001),
                "perm": pa.array(live % 1001),
                "f": pa.array(grid[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid = np.zeros(ns * 1001, np.int64)
        if t.num_rows:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            p = t["perm"].combine_chunks().to_numpy(zero_copy_only=False)
            f = t["f"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(grid, s * 1001 + p, f)
        g2 = grid.reshape(ns, 1001)
        n_docs = g2.sum(axis=1)
        cum = np.cumsum(g2, axis=1)
        out_q = {}
        for q, name in ((500, "p50_permille"), (900, "p90_permille")):
            thr = (n_docs * q + 999) // 1000
            idx = np.minimum((cum >= thr[:, None]).argmax(axis=1), 1000)
            out_q[name] = np.where(n_docs > 0, idx, 0)
        return pa.table(
            {
                "source": srcs,
                "n_docs": pa.array(n_docs.astype(np.int64)),
                "p50_permille": pa.array(
                    out_q["p50_permille"].astype(np.int64)
                ),
                "p90_permille": pa.array(
                    out_q["p90_permille"].astype(np.int64)
                ),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "g", merge, k=1)


def thirds_exclusivity(sf_dir: str) -> Dataset:
    """T200: positional vocabulary exclusivity — per source: distinct word
    types, and of those the types seen ONLY in the first third of
    documents (position p of n words → third 3·p // n), only the middle,
    only the last, and those spanning ALL three — where in documents a
    source's vocabulary LIVES, the positional specialization read none
    of the vocabulary boards carry (T110 rations STOPWORDS across
    thirds, T118 scores cross-SOURCE exclusivity, T66 fingerprints
    openings; T200 classifies the whole lexicon by position-of-use:
    heavy first-only mass = header/boilerplate vocabulary, heavy
    last-only = signature/footer blocks, a large all-thirds core =
    position-free prose — and the split predicts which third a
    truncation actually deletes).  One dense row per source ALWAYS;
    exact int64 (range-unnest + per-(source, word) third-presence
    bitmask + class-count oracle).

    Scale shape — T197's word-hash exchange with a BITMASK payload:
    each occurrence maps to its third with one integer multiply; batches
    pre-reduce with one lexsort + bitwise_or.reduceat to (hash, source,
    word, mask) cells; the word's partition ORs its masks and re-reduces
    IN PLACE to a ≤ sources × 8 class grid; k=1 densifying merge.  The
    vocabulary never lands on one node; word strings never reach the
    driver."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        import polars as pl

        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        nw = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        offs = np.zeros(len(nw) + 1, dtype=np.int64)
        np.cumsum(nw, out=offs[1:])
        pos = np.arange(int(offs[-1]), dtype=np.int64) - offs[:-1][parent]
        third = 3 * pos // nw[parent]
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        src_occ = code[parent]
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((codes, src_occ))
        s2, c2, t2 = src_occ[order], codes[order], third[order]
        head = np.empty(len(order), dtype=bool)
        if len(order):
            head[0] = True
            head[1:] = (s2[1:] != s2[:-1]) | (c2[1:] != c2[:-1])
        starts = np.flatnonzero(head)
        mask = np.bitwise_or.reduceat(
            np.left_shift(np.int64(1), t2), starts
        ) if len(starts) else np.array([], np.int64)
        g = pa.table(
            {
                "w": pc.take(enc.dictionary, pa.array(c2[starts])),
                "src": pa.array(s2[starts]),
                "m": pa.array(mask.astype(np.int64)),
            }
        )
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "src": g["src"],
                "w": g["w"],
                "m": g["m"],
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "cls": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        wcol = t["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        wid = wcol.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        m = t["m"].combine_chunks().to_numpy(zero_copy_only=False)
        nw = int(wid.max()) + 1
        key = src * nw + wid
        order = np.argsort(key, kind="stable")
        k2, m2 = key[order], m[order]
        head = np.empty(len(order), dtype=bool)
        head[0] = True
        head[1:] = k2[1:] != k2[:-1]
        starts = np.flatnonzero(head)
        mm = np.bitwise_or.reduceat(m2, starts)
        src_g = k2[starts] // nw
        grid = np.zeros(ns * 8, np.int64)
        np.add.at(grid, src_g * 8 + mm, 1)
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "src": pa.array(live // 8),
                "cls": pa.array(live % 8),
                "n": pa.array(grid[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid = np.zeros(ns * 8, np.int64)
        if t.num_rows:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            c = t["cls"].combine_chunks().to_numpy(zero_copy_only=False)
            n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(grid, s * 8 + c, n)
        g2 = grid.reshape(ns, 8)
        return pa.table(
            {
                "source": srcs,
                "n_types": pa.array(g2.sum(axis=1).astype(np.int64)),
                "first_only": pa.array(g2[:, 1].astype(np.int64)),
                "mid_only": pa.array(g2[:, 2].astype(np.int64)),
                "last_only": pa.array(g2[:, 4].astype(np.int64)),
                "all_thirds": pa.array(g2[:, 7].astype(np.int64)),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    cells = hash_partition_merge(partials, "h", fold)
    return hash_partition_merge(cells, "cls", merge, k=1)


def lang_leakage(sf_dir: str) -> Dataset:
    """T201: cross-language vocabulary leakage — per source: distinct word
    types, POLYGLOT types (appearing under ≥ 2 distinct lang labels
    within the source), and the polyglot permille — the label-noise /
    code-switching read none of the language boards carry (T44/T62
    budget docs and tokens per label, T81 audits the T9 CLASSIFIER
    against the label; T201 audits the LABELS against each other: a
    vocabulary that freely crosses lang labels means either heavy
    code-switching or mislabeled documents, and either way T23's
    per-lang mixture weights are sampling from overlapping pools).
    One dense row per source ALWAYS; exact int64 (unnest +
    per-(source, word) count-DISTINCT-lang + permille oracle).

    Scale shape — T200's word-hash exchange with a LANG bitmask payload
    (the ≤ |langs| label list broadcasts; > 63 labels guarded loudly):
    batches pre-reduce with one lexsort + bitwise_or.reduceat to
    (hash, source, word, lang-mask) cells; the word's partition ORs its
    masks, popcounts, and re-reduces IN PLACE to per-source (types,
    polyglot) pairs; k=1 densifying merge.  Word strings never reach
    the driver."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)
    langs = pa.array(
        sorted(_docs(sf_dir, ["lang"]).unique("lang")), pa.string()
    )
    nl = len(langs)
    if nl > 63:
        raise ValueError(
            "lang_leakage: >63 lang labels — widen the bitmask fold "
            "(two uint64 lanes) before using it on this corpus"
        )

    def partial(b: pa.Table) -> pa.Table:
        import polars as pl

        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        scode = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        lcode = (
            pc.cast(pc.index_in(b["lang"], value_set=langs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        src_occ = scode[parent]
        lang_occ = lcode[parent]
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((codes, src_occ))
        s2, c2, l2 = src_occ[order], codes[order], lang_occ[order]
        head = np.empty(len(order), dtype=bool)
        if len(order):
            head[0] = True
            head[1:] = (s2[1:] != s2[:-1]) | (c2[1:] != c2[:-1])
        starts = np.flatnonzero(head)
        mask = np.bitwise_or.reduceat(
            np.left_shift(np.int64(1), l2), starts
        ) if len(starts) else np.array([], np.int64)
        g = pa.table(
            {
                "w": pc.take(enc.dictionary, pa.array(c2[starts])),
                "src": pa.array(s2[starts]),
                "m": pa.array(mask.astype(np.int64)),
            }
        )
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "src": g["src"],
                "w": g["w"],
                "m": g["m"],
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "nt": pa.array([], pa.int64()),
                    "np_": pa.array([], pa.int64()),
                }
            )
        wcol = t["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        wid = wcol.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        m = t["m"].combine_chunks().to_numpy(zero_copy_only=False)
        nw = int(wid.max()) + 1
        key = src * nw + wid
        order = np.argsort(key, kind="stable")
        k2, m2 = key[order], m[order]
        head = np.empty(len(order), dtype=bool)
        head[0] = True
        head[1:] = k2[1:] != k2[:-1]
        starts = np.flatnonzero(head)
        mm = np.bitwise_or.reduceat(m2, starts)
        src_g = k2[starts] // nw
        poly = np.zeros(len(mm), np.int64)
        for bit in range(nl):
            poly += (mm >> bit) & 1
        nt = np.bincount(src_g, minlength=ns)
        npoly = np.bincount(src_g[poly >= 2], minlength=ns)
        live = np.flatnonzero(nt)
        return pa.table(
            {
                "src": pa.array(live.astype(np.int64)),
                "nt": pa.array(nt[live].astype(np.int64)),
                "np_": pa.array(npoly[live].astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nt = np.zeros(ns, np.int64)
        npoly = np.zeros(ns, np.int64)
        if t.num_rows:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nt, s,
                t["nt"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                npoly, s,
                t["np_"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "source": srcs,
                "n_types": pa.array(nt),
                "n_polyglot": pa.array(npoly),
                "polyglot_permille": pa.array(
                    1000 * npoly // np.maximum(nt, 1)
                ),
            }
        )

    partials = _docs(sf_dir, ["source", "lang", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    cells = hash_partition_merge(partials, "h", fold)
    return hash_partition_merge(cells, "src", merge, k=1)


def shard_balance(sf_dir: str, n_shards: int = 16) -> Dataset:
    """T202: shard-balance board — assign every document to shard
    doc_id % n_shards (the resumable-output partitioning rule the
    cascade's TierPartitionWriter and the corpus packer both key on)
    and report per shard: docs, whitespace tokens (T11's split(' ')
    convention) and chars — the SKEW PREFLIGHT for any sharded run
    (T22's packer, the T25 shuffle, a 16-way distillation fan-out):
    uniform doc COUNTS with lopsided TOKEN mass is exactly the failure
    mode that strands one worker at 3× wall-clock, and this board is
    the one-scan check that catches it before the job launches.  One
    row per shard with ≥ 1 doc (id-dense corpora fill all shards);
    exact int64 (modulo + count/sum oracle).

    Scale shape — ZERO-shuffle scan-reduce (the R1 shape on the docs
    table): each batch collapses to ≤ n_shards (shard, docs, tokens,
    chars) partials with one np.bincount trio; the k=1 merge folds
    O(batches × n_shards) rows.  Nothing broadcasts; the modulo makes
    the shard key derivable at WRITE time with no lookup."""
    from ..stages.shuffle import hash_partition_merge

    ds = _docs(sf_dir, ["doc_id", "text", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        did = pc.cast(b["doc_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        shard = did % n_shards
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        ntok = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        nch = pc.cast(b["n_chars"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        nd = np.bincount(shard, minlength=n_shards)
        nt = np.bincount(shard, weights=ntok, minlength=n_shards).astype(
            np.int64
        )
        nc = np.bincount(shard, weights=nch, minlength=n_shards).astype(
            np.int64
        )
        live = np.flatnonzero(nd)
        return pa.table(
            {
                "shard": pa.array(live.astype(np.int64)),
                "nd": pa.array(nd[live].astype(np.int64)),
                "nt": pa.array(nt[live]),
                "nc": pa.array(nc[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nd = np.zeros(n_shards, np.int64)
        nt = np.zeros(n_shards, np.int64)
        nc = np.zeros(n_shards, np.int64)
        if t.num_rows:
            sh = t["shard"].combine_chunks().to_numpy(zero_copy_only=False)
            for acc, col in ((nd, "nd"), (nt, "nt"), (nc, "nc")):
                np.add.at(
                    acc, sh,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        live = np.flatnonzero(nd)
        return pa.table(
            {
                "shard": pa.array(live.astype(np.int64)),
                "n_docs": pa.array(nd[live]),
                "n_tokens": pa.array(nt[live]),
                "n_chars": pa.array(nc[live]),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_partition_merge(partials, "shard", merge, k=1)


def self_intro(sf_dir: str) -> Dataset:
    """T203: vocabulary self-introduction quantiles — per source: docs
    and the discrete p50/p90 of each document's SELF-INTRODUCTION
    permille: of the doc's distinct word types, the permille share
    whose corpus-wide FIRST appearance (minimum doc_id over every doc
    containing the type) is this very document — is a document made of
    inherited vocabulary or its own coinage, the novelty-ATTRIBUTION
    read none of the growth boards carry (T159/T175 time vocabulary
    introduction/retirement for the CORPUS stream, T97 rates per-source
    novelty, T198 locates novelty WITHIN a doc; T203 assigns each
    introduction to the doc that made it and histograms the credit:
    a late doc scoring high permille is genuinely new material — the
    dedup-survivor a curriculum should up-weight; a corpus whose
    self-intro mass sits entirely in the first docs is closed-world).
    Ties (several docs sharing a type's minimum doc_id) are impossible
    by construction — doc_id is unique, the minimum is one document.
    One dense row per source ALWAYS; exact int64 under the
    quantile_disc rank rule (unnest + per-word min(doc_id) + per-doc
    count/FILTER-count + two-level quantile oracle).

    Scale shape — TWO narrow hash exchanges, both pre-reduced, then the
    T196 grid merge: (1) word-hash — batches pre-reduce to distinct
    (hash, doc, source, word) cells; each word's partition finds its
    corpus-min doc_id locally and re-reduces IN PLACE to per-doc
    (n_types, n_self) partials — word strings die here; (2) doc-hash —
    per-doc partials sum (a doc's cells arrive from every word
    partition), the permille forms, and each partition collapses to
    (source, permille, freq) cells on a ≤ sources × 1001 domain; the
    k=1 merge reads both quantiles off one cumsum."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        import polars as pl

        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        did = pc.cast(b["doc_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        scode = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_occ = did[parent]
        # distinct (doc, word) cells
        order = np.lexsort((codes, doc_occ))
        d2, c2 = doc_occ[order], codes[order]
        head = np.empty(len(order), dtype=bool)
        if len(order):
            head[0] = True
            head[1:] = (d2[1:] != d2[:-1]) | (c2[1:] != c2[:-1])
        starts = np.flatnonzero(head)
        par_src = scode[parent][order][starts]
        g = pa.table(
            {
                "w": pc.take(enc.dictionary, pa.array(c2[starts])),
                "doc": pa.array(d2[starts]),
                "src": pa.array(par_src.astype(np.int64)),
            }
        )
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "doc": g["doc"],
                "src": g["src"],
                "w": g["w"],
            }
        )

    def fold_words(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc": pa.array([], pa.int64()),
                    "src": pa.array([], pa.int64()),
                    "nt": pa.array([], pa.int64()),
                    "nself": pa.array([], pa.int64()),
                }
            )
        wcol = t["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        wid = wcol.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        doc = t["doc"].combine_chunks().to_numpy(zero_copy_only=False)
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        # dedupe (word, doc) cells arriving from different batches
        order = np.lexsort((doc, wid))
        w2, d2, s2 = wid[order], doc[order], src[order]
        uniq = np.empty(len(order), dtype=bool)
        uniq[0] = True
        uniq[1:] = (w2[1:] != w2[:-1]) | (d2[1:] != d2[:-1])
        w3, d3, s3 = w2[uniq], d2[uniq], s2[uniq]
        # per word: min doc is the FIRST cell of its (sorted) group
        whead = np.empty(len(w3), dtype=bool)
        whead[0] = True
        whead[1:] = w3[1:] != w3[:-1]
        wsid = np.cumsum(whead) - 1
        min_doc = d3[np.flatnonzero(whead)]
        is_self = d3 == min_doc[wsid]
        # per (doc, src): types and self-introductions
        key = d3
        ud, inv = np.unique(key, return_inverse=True)
        nt = np.bincount(inv)
        nself = np.bincount(inv[is_self], minlength=len(ud))
        # source of each doc: take from any of its cells
        src_of = np.zeros(len(ud), np.int64)
        src_of[inv] = s3
        return pa.table(
            {
                "doc": pa.array(ud),
                "src": pa.array(src_of),
                "nt": pa.array(nt.astype(np.int64)),
                "nself": pa.array(nself.astype(np.int64)),
            }
        )

    def fold_docs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "src": pa.array([], pa.int64()),
                    "perm": pa.array([], pa.int64()),
                    "f": pa.array([], pa.int64()),
                }
            )
        doc = t["doc"].combine_chunks().to_numpy(zero_copy_only=False)
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        nt = t["nt"].combine_chunks().to_numpy(zero_copy_only=False)
        nself = t["nself"].combine_chunks().to_numpy(zero_copy_only=False)
        ud, inv = np.unique(doc, return_inverse=True)
        tnt = np.zeros(len(ud), np.int64)
        tns = np.zeros(len(ud), np.int64)
        np.add.at(tnt, inv, nt)
        np.add.at(tns, inv, nself)
        src_of = np.zeros(len(ud), np.int64)
        src_of[inv] = src
        perm = 1000 * tns // np.maximum(tnt, 1)
        grid = np.zeros(ns * 1001, np.int64)
        np.add.at(grid, src_of * 1001 + perm, 1)
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "g": pa.array(np.zeros(len(live), np.int64)),
                "src": pa.array(live // 1001),
                "perm": pa.array(live % 1001),
                "f": pa.array(grid[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid = np.zeros(ns * 1001, np.int64)
        if t.num_rows:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            p = t["perm"].combine_chunks().to_numpy(zero_copy_only=False)
            f = t["f"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(grid, s * 1001 + p, f)
        g2 = grid.reshape(ns, 1001)
        n_docs = g2.sum(axis=1)
        cum = np.cumsum(g2, axis=1)
        out_q = {}
        for q, name in ((500, "p50_permille"), (900, "p90_permille")):
            thr = (n_docs * q + 999) // 1000
            idx = np.minimum((cum >= thr[:, None]).argmax(axis=1), 1000)
            out_q[name] = np.where(n_docs > 0, idx, 0)
        return pa.table(
            {
                "source": srcs,
                "n_docs": pa.array(n_docs.astype(np.int64)),
                "p50_permille": pa.array(
                    out_q["p50_permille"].astype(np.int64)
                ),
                "p90_permille": pa.array(
                    out_q["p90_permille"].astype(np.int64)
                ),
            }
        )

    partials = _docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    per_doc = hash_partition_merge(partials, "h", fold_words)
    cells = hash_partition_merge(per_doc, "doc", fold_docs)
    return hash_partition_merge(cells, "g", merge, k=1)


def weakest_link(sf_dir: str) -> Dataset:
    """T204: weakest-link band board — for every document find the
    CORPUS-WIDE occurrence count of its rarest word type (the minimum
    total frequency over the doc's distinct types) and histogram docs
    per (source, bit-length band of that minimum, DuckDB's
    length(bin(x)) convention) — what is the most obscure thing each
    document says, the per-DOC rarity read none of the type-level
    boards carry (T124 counts hapax TYPES per source, T174 crosses
    DF×TF bands over the vocabulary, T203 credits introductions; T204
    collapses each doc to its single weakest link: band-1 docs contain
    a corpus-unique word — genuinely novel material or OCR garbage,
    either way the docs a curator reads FIRST; docs whose minimum sits
    at band 10+ are built entirely from common vocabulary — the
    boilerplate mass).  One row per OCCUPIED (source, band) cell;
    exact int64 (unnest + per-word count + per-doc min + length(bin)
    oracle).

    Scale shape — T203's two narrow exchanges with a MIN payload:
    (1) word-hash — batches pre-reduce to distinct (hash, doc, source,
    word) cells plus per-batch word counts; each word's partition sums
    its exact corpus frequency locally and emits per-doc PARTIAL
    minima (one row per doc per partition, not per word); (2) doc-hash
    — partial minima combine with one np.minimum-scatter, the band is
    one bit_length, and the partition collapses to a ≤ sources × 65
    grid; k=1 densifying merge.  Word strings never leave exchange 1."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)
    NB = 65

    def partial(b: pa.Table) -> pa.Table:
        import polars as pl

        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        did = pc.cast(b["doc_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        scode = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_occ = did[parent]
        order = np.lexsort((doc_occ, codes))
        c2, d2 = codes[order], doc_occ[order]
        head = np.empty(len(order), dtype=bool)
        if len(order):
            head[0] = True
            head[1:] = (c2[1:] != c2[:-1]) | (d2[1:] != d2[:-1])
        starts = np.flatnonzero(head)
        n_occ = np.diff(starts, append=len(order)).astype(np.int64)
        src_cell = scode[parent][order][starts]
        g = pa.table(
            {
                "w": pc.take(enc.dictionary, pa.array(c2[starts])),
                "doc": pa.array(d2[starts]),
                "src": pa.array(src_cell.astype(np.int64)),
                "n": pa.array(n_occ),
            }
        )
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "doc": g["doc"],
                "src": g["src"],
                "w": g["w"],
                "n": g["n"],
            }
        )

    def fold_words(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc": pa.array([], pa.int64()),
                    "src": pa.array([], pa.int64()),
                    "mf": pa.array([], pa.int64()),
                }
            )
        wcol = t["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        wid = wcol.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        doc = t["doc"].combine_chunks().to_numpy(zero_copy_only=False)
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        # exact corpus frequency of each word in this partition
        freq = np.zeros(int(wid.max()) + 1, np.int64)
        np.add.at(freq, wid, n)
        # per (doc): min over its types' frequencies (cells may repeat a
        # (doc, word) pair across batches — min is idempotent)
        ud, inv = np.unique(doc, return_inverse=True)
        mf = np.full(len(ud), np.int64(2**62))
        np.minimum.at(mf, inv, freq[wid])
        src_of = np.zeros(len(ud), np.int64)
        src_of[inv] = src
        return pa.table(
            {
                "doc": pa.array(ud),
                "src": pa.array(src_of),
                "mf": pa.array(mf),
            }
        )

    def fold_docs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "band": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        doc = t["doc"].combine_chunks().to_numpy(zero_copy_only=False)
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        mf = t["mf"].combine_chunks().to_numpy(zero_copy_only=False)
        ud, inv = np.unique(doc, return_inverse=True)
        gmf = np.full(len(ud), np.int64(2**62))
        np.minimum.at(gmf, inv, mf)
        src_of = np.zeros(len(ud), np.int64)
        src_of[inv] = src
        # vectorized bit length: frexp exponent == bit_length for exact
        # positive ints (frequencies are far below 2**53)
        band = np.frexp(gmf.astype(np.float64))[1].astype(np.int64)
        grid = np.zeros(ns * NB, np.int64)
        np.add.at(grid, src_of * NB + np.minimum(band, NB - 1), 1)
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "src": pa.array(live // NB),
                "band": pa.array(live % NB),
                "n": pa.array(grid[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid = np.zeros(ns * NB, np.int64)
        if t.num_rows:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            b = t["band"].combine_chunks().to_numpy(zero_copy_only=False)
            f = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(grid, s * NB + b, f)
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(live // NB)),
                "band": pa.array((live % NB).astype(np.int64)),
                "n_docs": pa.array(grid[live]),
            }
        )

    partials = _docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    per_doc = hash_partition_merge(partials, "h", fold_words)
    cells = hash_partition_merge(per_doc, "doc", fold_docs)
    return hash_partition_merge(cells, "band", merge, k=1)


def dedup_shard_audit(sf_dir: str, n_shards: int = 16) -> Dataset:
    """T205: dedup × sharding audit — group exact duplicates (full-text
    identity, T1's content-hash routing) and ask whether each dup group
    lands inside ONE doc_id % n_shards shard (T202's rule): one corpus
    row with dup groups (size ≥ 2), member docs, groups fully contained
    in a single shard, groups SPANNING shards, and the spanning
    permille — the distributed-dedup planning read T1 and T202 each
    hold half of (T1 finds the groups, T202 weighs the shards; T205
    says whether a shard-LOCAL dedup pass — the cheap kind that needs
    no cross-shard exchange — would even be correct: a high spanning
    permille means local dedup silently keeps cross-shard copies and
    the full hash exchange is mandatory).  Exactly one row ALWAYS;
    exact int64 (GROUP BY text HAVING ≥ 2 + count-DISTINCT-shard
    oracle; the engine groups by T1's collision-resistant 64-bit
    content hash — identical texts always co-group, and the oracle's
    exact-text grouping certifies the convention per run).

    Scale shape — T1's content-hash exchange verbatim (doc_id + hash
    travel, text never leaves the read): each hash partition counts
    group sizes and distinct shards with one packed np.unique pair and
    collapses to FOUR integers; the k=1 merge sums them."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = (
            pl.from_arrow(batch.select(["text"]))["text"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "text_hash": pa.array(hs, pa.int64()),
            }
        )

    hashed = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add_hash, batch_format="pyarrow"
    )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "ng": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "ns1": pa.array([], pa.int64()),
                    "nsx": pa.array([], pa.int64()),
                }
            )
        h = t["text_hash"].combine_chunks().to_numpy(zero_copy_only=False)
        did = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        shard = did % n_shards
        uh, inv = np.unique(h, return_inverse=True)
        size = np.bincount(inv)
        # distinct shards per group: unique (group, shard) pairs
        pair = np.unique(inv.astype(np.int64) * n_shards + shard)
        nsh = np.bincount(pair // n_shards, minlength=len(uh))
        dup = size >= 2
        ng = int(dup.sum())
        nd = int(size[dup].sum())
        ns1 = int((dup & (nsh == 1)).sum())
        nsx = int((dup & (nsh > 1)).sum())
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "ng": pa.array([ng], pa.int64()),
                "nd": pa.array([nd], pa.int64()),
                "ns1": pa.array([ns1], pa.int64()),
                "nsx": pa.array([nsx], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        tot = {c: 0 for c in ("ng", "nd", "ns1", "nsx")}
        if t.num_rows:
            for c in tot:
                tot[c] = int(
                    t[c].combine_chunks().to_numpy(zero_copy_only=False).sum()
                )
        return pa.table(
            {
                "n_groups": pa.array([tot["ng"]], pa.int64()),
                "n_dup_docs": pa.array([tot["nd"]], pa.int64()),
                "n_single_shard": pa.array([tot["ns1"]], pa.int64()),
                "n_cross_shard": pa.array([tot["nsx"]], pa.int64()),
                "cross_permille": pa.array(
                    [1000 * tot["nsx"] // max(tot["ng"], 1)], pa.int64()
                ),
            }
        )

    cells = hash_partition_merge(hashed, "text_hash", fold, k=64)
    return hash_partition_merge(cells, "g", merge, k=1)


def dim_dominance(sf_dir: str) -> Dataset:
    """T206: dimension-dominance census — for every vector, the 1-based
    dimension holding its maximum ABSOLUTE component (ties → lowest
    dimension, the first-occurrence rule numpy argmax and DuckDB
    list_position share), counted per dimension together with how often
    that dominant component is POSITIVE — which axes HOG the embedding
    space, the anisotropy read none of the per-dimension boards carry
    (T147 counts signs per dimension over ALL components, T148 spans
    min/max, T193 bands zero-sparsity; T206 asks which axis WINS each
    vector: a healthy isotropic space spreads dominance ~uniformly, a
    handful of hogging dimensions is the rogue-dimension pathology that
    wrecks cosine ANN — the T6/T7/T8 preflight — and a skewed positive
    share on the winning axis flags an additive bias term).  One row
    per dimension that dominates ≥ 1 vector; exact int64 counts (float
    compares only — list_transform(abs) + list_position oracle, no
    arithmetic whose rounding could diverge).

    Scale shape — ZERO wide exchange: vectors reshape (n, d) per batch
    (one flatten — the list child is contiguous), one np.argmax per
    row-block and two bincounts reduce each batch to ≤ d partial rows;
    the k=1 merge folds O(batches × d) rows."""
    from ..stages.shuffle import hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "nv": pa.array([], pa.int64()),
                    "np_": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)
        )
        d = m.shape[1]
        arg = np.abs(m).argmax(axis=1)
        pos = m[np.arange(n), arg] > 0
        nv = np.bincount(arg, minlength=d)
        npos = np.bincount(arg[pos], minlength=d)
        live = np.flatnonzero(nv)
        return pa.table(
            {
                "dim": pa.array((live + 1).astype(np.int64)),
                "nv": pa.array(nv[live].astype(np.int64)),
                "np_": pa.array(npos[live].astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n_vectors": pa.array([], pa.int64()),
                    "n_positive": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("dim", use_threads=False).aggregate(
            [("nv", "sum"), ("np_", "sum")]
        )
        return pa.table(
            {
                "dim": pc.cast(g["dim"], pa.int64()),
                "n_vectors": pc.cast(g["nv_sum"], pa.int64()),
                "n_positive": pc.cast(g["np__sum"], pa.int64()),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "dim", merge, k=1)


def label_norms(sf_dir: str) -> Dataset:
    """T207: label-conditioned norm audit — per label: vectors and the
    exact integer sufficient statistics of the QUANTIZED squared L2
    norm s = Σ_d floor(1000·x_d²) (T78's DOUBLE-cast quantization
    convention): Σs, min s, max s — does every CLASS live on the same
    shell, the label × geometry cross none of the embedding boards
    carry (T78 histograms norms with no label, T189 spreads label
    COUNTS, T195 drifts energy over vec_id ORDER; T207 conditions the
    norm on the label: a class with systematically larger norms
    dominates un-normalized dot-product retrieval and silently biases
    any nearest-centroid classifier — the audit before trusting T34's
    semdedup clusters across classes).  One row per label ALWAYS;
    exact int64 (list_transform/list_sum quantized-norm + GROUP BY
    oracle).

    Scale shape — ZERO wide exchange: vectors reshape (n, d) per batch,
    one vectorized floor(1000·x²) row-sum, then a ≤ |labels| partial
    per batch (labels are fixed-cardinality — only the label list
    broadcasts); the k=1 merge folds sums/mins/maxes."""
    from ..stages.shuffle import hash_partition_merge

    labels = pa.array(
        sorted(
            int(x)
            for x in rd.read_parquet(
                f"{sf_dir}/embeddings.parquet", columns=["label"]
            ).unique("label")
        ),
        pa.int64(),
    )
    nl = len(labels)

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "lb": pa.array([], pa.int64()),
                    "nv": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                    "mn": pa.array([], pa.int64()),
                    "mx": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)
        )
        s = np.floor(1000.0 * m * m).astype(np.int64).sum(axis=1)
        lb = (
            pc.cast(
                pc.index_in(pc.cast(batch["label"], pa.int64()),
                            value_set=labels),
                pa.int64(),
            )
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        nv = np.bincount(lb, minlength=nl)
        ssum = np.bincount(lb, weights=s, minlength=nl).astype(np.int64)
        mn = np.full(nl, np.int64(2**62))
        np.minimum.at(mn, lb, s)
        mx = np.full(nl, np.int64(-(2**62)))
        np.maximum.at(mx, lb, s)
        live = np.flatnonzero(nv)
        return pa.table(
            {
                "lb": pa.array(live.astype(np.int64)),
                "nv": pa.array(nv[live].astype(np.int64)),
                "s": pa.array(ssum[live]),
                "mn": pa.array(mn[live]),
                "mx": pa.array(mx[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nv = np.zeros(nl, np.int64)
        ssum = np.zeros(nl, np.int64)
        mn = np.full(nl, np.int64(2**62))
        mx = np.full(nl, np.int64(-(2**62)))
        if t.num_rows:
            lb = t["lb"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nv, lb,
                t["nv"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                ssum, lb,
                t["s"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.minimum.at(
                mn, lb,
                t["mn"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.maximum.at(
                mx, lb,
                t["mx"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "label": labels,
                "n_vectors": pa.array(nv),
                "sum_qnorm": pa.array(ssum),
                "min_qnorm": pa.array(np.where(nv > 0, mn, 0)),
                "max_qnorm": pa.array(np.where(nv > 0, mx, 0)),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "lb", merge, k=1)


def periodicity_comb(sf_dir: str, max_lag: int = 8) -> Dataset:
    """T208: word periodicity comb — per (source, lag 1..``max_lag``):
    word pairs exactly ``lag`` positions apart within one document,
    pairs whose two words are IDENTICAL, and the equality permille —
    the fixed-period template detector none of the repetition boards
    tune to (T18/T130 score ADJACENT repeats — the lag-1 tooth only;
    T125 measures the distance between a word's own consecutive
    occurrences; T208 asks, for each distance L, how likely position i
    and i+L agree: a spike at L = k is a k-field record template —
    log lines, CSV-ish dumps, markup — invisible to adjacency stats
    when the repeated field is separated by varying values).  One row
    per (source, lag) with ≥ 1 pair; exact int64 (range-unnest +
    list_extract(i)=list_extract(i+lag) compare oracle).

    Scale shape — ZERO-shuffle scan-reduce: the flattened word stream
    compares against itself ``max_lag`` shifted times (dictionary CODES
    compare, strings never re-materialize; document boundaries masked
    via parent indices); each batch collapses to a ≤ sources × lags
    grid; the k=1 merge folds O(batches × cells) rows."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        codes = (
            flat.dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        scode = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        grid_n = np.zeros(ns * max_lag, np.int64)
        grid_e = np.zeros(ns * max_lag, np.int64)
        for lag in range(1, max_lag + 1):
            if len(codes) <= lag:
                break
            same_doc = parent[lag:] == parent[:-lag]
            owner = scode[parent[lag:][same_doc]]
            eq = (codes[lag:] == codes[:-lag])[same_doc]
            np.add.at(grid_n, owner * max_lag + (lag - 1), 1)
            np.add.at(
                grid_e, owner[eq] * max_lag + (lag - 1), 1
            )
        live = np.flatnonzero(grid_n)
        return pa.table(
            {
                "src": pa.array(live // max_lag),
                "lag": pa.array(live % max_lag + 1),
                "n": pa.array(grid_n[live]),
                "e": pa.array(grid_e[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid_n = np.zeros(ns * max_lag, np.int64)
        grid_e = np.zeros(ns * max_lag, np.int64)
        if t.num_rows:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            lg = t["lag"].combine_chunks().to_numpy(zero_copy_only=False)
            idx = s * max_lag + (lg - 1)
            np.add.at(
                grid_n, idx,
                t["n"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                grid_e, idx,
                t["e"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(grid_n)
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(live // max_lag)),
                "lag": pa.array((live % max_lag + 1).astype(np.int64)),
                "n_pairs": pa.array(grid_n[live]),
                "n_equal": pa.array(grid_e[live]),
                "equal_permille": pa.array(
                    1000 * grid_e[live] // np.maximum(grid_n[live], 1)
                ),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "lag", merge, k=1)


def label_centroids(sf_dir: str) -> Dataset:
    """T209: quantized label centroids — per (label, 1-based dimension):
    vectors and the exact integer sum of the QUANTIZED component
    floor(1000·x) (DOUBLE-cast, the T78 discipline) — the
    nearest-centroid preflight materialized as exact integers (T207
    conditions the NORM on the label, T147 signs per dimension with no
    label; T209 is the full label × dimension first-moment grid: the
    centroid itself derives as sum_q / (1000·n) to any precision, two
    labels' centroid distance from two rows' difference — and because
    every entry is an integer sum, cross-run drift detection is exact
    equality, not a float tolerance).  One row per (label, dim) ALWAYS
    (labels and dims are both fixed); exact int64
    (unnest + generate_subscripts + floored-component SUM oracle).

    Scale shape — ZERO wide exchange: vectors reshape (n, d) per
    batch, one floor(1000·x) pass, per-label column sums via one
    np.add.at scatter onto a |labels| × d grid; the k=1 merge folds
    O(batches × labels × d) rows."""
    from ..stages.shuffle import hash_partition_merge

    labels = pa.array(
        sorted(
            int(x)
            for x in rd.read_parquet(
                f"{sf_dir}/embeddings.parquet", columns=["label"]
            ).unique("label")
        ),
        pa.int64(),
    )
    nl = len(labels)

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "nv": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)
        )
        d = m.shape[1]
        q = np.floor(1000.0 * m).astype(np.int64)
        lb = (
            pc.cast(
                pc.index_in(pc.cast(batch["label"], pa.int64()),
                            value_set=labels),
                pa.int64(),
            )
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        gs = np.zeros((nl, d), np.int64)
        np.add.at(gs, lb, q)
        gn = np.bincount(lb, minlength=nl)
        cells = np.arange(nl * d, dtype=np.int64)
        return pa.table(
            {
                "cell": pa.array(cells),
                "nv": pa.array(np.repeat(gn, d).astype(np.int64)),
                "s": pa.array(gs.reshape(-1)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "n_vectors": pa.array([], pa.int64()),
                    "sum_q": pa.array([], pa.int64()),
                }
            )
        cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
        ncell = int(cell.max()) + 1
        d = ncell // nl
        gn = np.zeros(ncell, np.int64)
        gs = np.zeros(ncell, np.int64)
        np.add.at(
            gn, cell,
            t["nv"].combine_chunks().to_numpy(zero_copy_only=False),
        )
        np.add.at(
            gs, cell,
            t["s"].combine_chunks().to_numpy(zero_copy_only=False),
        )
        cells = np.arange(ncell)
        return pa.table(
            {
                "label": pc.take(labels, pa.array(cells // d)),
                "dim": pa.array((cells % d + 1).astype(np.int64)),
                "n_vectors": pa.array(gn),
                "sum_q": pa.array(gs),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "cell", merge, k=1)


def seam_audit(sf_dir: str) -> Dataset:
    """T210: packing-seam audit — pair every document's LAST word with
    the FIRST word of doc_id + 1 (the seam T22's doc_id-order packer
    would create) and report one corpus row: seams, seams whose two
    sides are the SAME word (a packed sequence would stutter across
    the boundary — the artifact a repetition-penalized model notices),
    the stutter permille, and the DISTINCT boundary bigrams the packing
    would mint — concatenation-safety before packing, the read T22/T123
    price in tokens but never in CONTENT (T208's comb sees repeats
    WITHIN docs; the seam is invisible to every within-doc board
    because it does not exist until the packer runs).  Exactly one row
    ALWAYS; exact int64 (self-join on doc_id + 1 over first/last words
    + count-DISTINCT-concat oracle).

    Scale shape — TWO narrow exchanges of TWO-WORD payloads (each doc
    ships only its first and last word — nothing scales with doc
    LENGTH): (1) seam-hash — each doc posts (seam = doc_id, left) and
    (seam = doc_id − 1, right); the pair's partition joins the two
    roles and emits (bigram-hash, bigram, stutter) cells; (2)
    bigram-hash — distinct bigrams settle per partition and the counts
    collapse to THREE integers; k=1 merge."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    def endpoints(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        did = pc.cast(b["doc_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        nw = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        first = pc.list_element(words, 0)
        # last element: flatten + offsets
        flat = words.flatten()
        offs = np.zeros(len(nw) + 1, np.int64)
        np.cumsum(nw, out=offs[1:])
        last = pc.take(flat, pa.array(offs[1:] - 1))
        return pa.table(
            {
                "seam": pa.array(
                    np.concatenate([did, did - 1]), pa.int64()
                ),
                "role": pa.array(
                    np.concatenate(
                        [np.zeros(len(did), np.int64),
                         np.ones(len(did), np.int64)]
                    )
                ),
                "w": pa.concat_arrays(
                    [last.combine_chunks() if isinstance(last, pa.ChunkedArray) else last,
                     first.combine_chunks() if isinstance(first, pa.ChunkedArray) else first]
                ),
            }
        )

    def fold_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    "bg": pa.array([], pa.string()),
                    "st": pa.array([], pa.int64()),
                }
            )
        seam = t["seam"].combine_chunks().to_numpy(zero_copy_only=False)
        role = t["role"].combine_chunks().to_numpy(zero_copy_only=False)
        w = t["w"].combine_chunks()
        order = np.lexsort((role, seam))
        s2, r2 = seam[order], role[order]
        # a complete seam = adjacent (role 0, role 1) rows of one seam id
        left_pos = np.flatnonzero(
            (s2[:-1] == s2[1:]) & (r2[:-1] == 0) & (r2[1:] == 1)
        )
        if len(left_pos) == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    "bg": pa.array([], pa.string()),
                    "st": pa.array([], pa.int64()),
                }
            )
        wi = pc.take(w, pa.array(order[left_pos]))
        wj = pc.take(w, pa.array(order[left_pos + 1]))
        bg = pc.binary_join_element_wise(wi, wj, " ")
        st = pc.cast(pc.equal(wi, wj), pa.int64())
        hs = (
            pl.from_arrow(pa.table({"b": bg}))["b"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "bg": bg,
                "st": st,
            }
        )

    def fold_bigrams(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "ns": pa.array([], pa.int64()),
                    "nst": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                }
            )
        bg = t["bg"]
        if isinstance(bg, pa.ChunkedArray):
            bg = bg.combine_chunks()
        nd = len(bg.dictionary_encode().dictionary)
        ns = t.num_rows
        nst = int(
            t["st"].combine_chunks().to_numpy(zero_copy_only=False).sum()
        )
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "ns": pa.array([ns], pa.int64()),
                "nst": pa.array([nst], pa.int64()),
                "nd": pa.array([nd], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        tot = {c: 0 for c in ("ns", "nst", "nd")}
        if t.num_rows:
            for c in tot:
                tot[c] = int(
                    t[c].combine_chunks().to_numpy(zero_copy_only=False).sum()
                )
        return pa.table(
            {
                "n_seams": pa.array([tot["ns"]], pa.int64()),
                "n_stutter": pa.array([tot["nst"]], pa.int64()),
                "stutter_permille": pa.array(
                    [1000 * tot["nst"] // max(tot["ns"], 1)], pa.int64()
                ),
                "n_distinct_bigrams": pa.array([tot["nd"]], pa.int64()),
            }
        )

    ends = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        endpoints, batch_format="pyarrow"
    )
    pairs = hash_partition_merge(ends, "seam", fold_pairs)
    cells = hash_partition_merge(pairs, "h", fold_bigrams)
    return hash_partition_merge(cells, "g", merge, k=1)


def embedding_coverage(sf_dir: str) -> Dataset:
    """T211: document ↔ embedding coverage audit — per source: documents,
    documents whose doc_id has a matching embeddings.vec_id, and the
    coverage permille, plus one final ``__orphans__`` row counting
    vectors whose vec_id matches NO document — the referential-integrity
    preflight for every doc × embedding consumer (T26's enrichment join
    silently drops unmatched rows, T5/T6/T34 assume the vector side is
    the corpus; T211 says what the join will actually cover per slice
    and whether the vector store carries dead weight — the two failure
    modes of an embedding backfill, each invisible to the other side's
    counts).  One row per source plus the orphan row ALWAYS; exact
    int64 (LEFT JOIN coverage + anti-join count oracle).

    Scale shape — ONE doc_id/vec_id-hash co-partition of two NARROW
    id streams (docs ship (id, source-rank), vectors ship (id) — no
    text, no vectors): each partition matches the two sorted id lists
    with one searchsorted in each direction and collapses to
    ≤ sources + 1 partial rows; k=1 densifying merge."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    docs = _docs(sf_dir, ["doc_id", "source"])
    vecs = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    )

    def doc_side(b: pa.Table) -> pa.Table:
        sg = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pc.cast(b["doc_id"], pa.int64()),
                "src": pa.array(sg.astype(np.int64)),
            }
        )

    def vec_side(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b["vec_id"], pa.int64()),
                "src": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "nc": pa.array([], pa.int64()),
                    "orph": pa.array([], pa.int64()),
                }
            )
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        kk = t["k"].combine_chunks().to_numpy(zero_copy_only=False)
        is_doc = src >= 0
        dk = kk[is_doc]
        dsrc = src[is_doc]
        vk = np.unique(kk[~is_doc])
        o = np.argsort(dk, kind="stable")
        dk_s, dsrc_s = dk[o], dsrc[o]
        # doc covered: doc_id present in vec ids
        pos = np.clip(np.searchsorted(vk, dk_s), 0, max(len(vk) - 1, 0))
        covered = (vk[pos] == dk_s) if len(vk) else np.zeros(
            len(dk_s), dtype=bool
        )
        nd = np.bincount(dsrc_s, minlength=ns)
        nc = np.bincount(dsrc_s[covered], minlength=ns)
        # orphan vectors: vec ids matching no doc
        if len(dk_s):
            vpos = np.clip(np.searchsorted(dk_s, vk), 0, len(dk_s) - 1)
            orph = int((dk_s[vpos] != vk).sum())
        else:
            orph = len(vk)
        live = np.flatnonzero(nd)
        return pa.table(
            {
                "src": pa.array(
                    np.append(live, -1).astype(np.int64)
                ),
                "nd": pa.array(
                    np.append(nd[live], 0).astype(np.int64)
                ),
                "nc": pa.array(
                    np.append(nc[live], 0).astype(np.int64)
                ),
                "orph": pa.array(
                    np.append(np.zeros(len(live), np.int64), orph)
                ),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nd = np.zeros(ns, np.int64)
        nc = np.zeros(ns, np.int64)
        orph = 0
        if t.num_rows:
            src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            nd_c = t["nd"].combine_chunks().to_numpy(zero_copy_only=False)
            nc_c = t["nc"].combine_chunks().to_numpy(zero_copy_only=False)
            or_c = t["orph"].combine_chunks().to_numpy(zero_copy_only=False)
            doc_rows = src >= 0
            np.add.at(nd, src[doc_rows], nd_c[doc_rows])
            np.add.at(nc, src[doc_rows], nc_c[doc_rows])
            orph = int(or_c.sum())
        names = pa.concat_arrays(
            [srcs, pa.array(["__orphans__"], pa.string())]
        )
        return pa.table(
            {
                "source": names,
                "n_docs": pa.array(np.append(nd, 0)),
                "n_covered": pa.array(np.append(nc, orph)),
                "coverage_permille": pa.array(
                    np.append(1000 * nc // np.maximum(nd, 1), 0)
                ),
            }
        )

    both = docs.map_batches(doc_side, batch_format="pyarrow").union(
        vecs.map_batches(vec_side, batch_format="pyarrow")
    )
    cells = hash_partition_merge(both, "k", fold)
    return hash_partition_merge(cells, "src", merge, k=1)


def embedding_exact_dups(sf_dir: str) -> Dataset:
    """T212: exact-duplicate vector audit — group vectors by BITWISE
    equality of the whole embedding and report one corpus row: vectors,
    duplicate groups (size ≥ 2), vectors inside them, the duplicated
    permille, and the worst group size — the collapsed-embedding
    detector the text-side dedup suite has no eye for (T1 dedups
    TEXTS; a broken encoder or a double-run backfill duplicates
    VECTORS under distinct ids, silently biasing every T5-T8 neighbor
    search and T34 cluster toward the duplicated point; bitwise
    equality is the right test — near-dups are T5's job).  Exactly one
    row ALWAYS; exact int64 (GROUP BY embedding HAVING ≥ 2 oracle; the
    engine groups by a 64-bit polynomial hash of the raw float BIT
    PATTERNS — identical vectors always co-group, T1's documented
    hash-identity convention).

    Scale shape — ONE narrow hash exchange: each batch reshapes (n, d),
    views the float32 bit patterns as integers and folds each row to a
    64-bit polynomial hash with one vectorized pass (no per-row loop,
    no byte materialization); only (hash) travels; each partition
    counts group sizes with one np.unique and collapses to FOUR
    integers; k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    MULT = np.uint64(1099511628211)  # FNV-ish odd multiplier

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table({"h": pa.array([], pa.int64())})
        bits = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float32)
            .view(np.uint32)
            .astype(np.uint64)
            .reshape(n, -1)
        )
        d = bits.shape[1]
        # vectorized polynomial fold: h = ((h * M) ^ col) per dimension
        h = np.full(n, np.uint64(1469598103934665603))
        for j in range(d):
            h = (h * MULT) ^ bits[:, j]
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64())})

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.int64()),
                    "nv": pa.array([], pa.int64()),
                    "ng": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                    "mx": pa.array([], pa.int64()),
                }
            )
        h = t["h"].combine_chunks().to_numpy(zero_copy_only=False)
        _, cnt = np.unique(h, return_counts=True)
        dup = cnt >= 2
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "nv": pa.array([len(h)], pa.int64()),
                "ng": pa.array([int(dup.sum())], pa.int64()),
                "nd": pa.array([int(cnt[dup].sum())], pa.int64()),
                "mx": pa.array([int(cnt.max())], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        tot = {c: 0 for c in ("nv", "ng", "nd")}
        mx = 0
        if t.num_rows:
            for c in tot:
                tot[c] = int(
                    t[c].combine_chunks().to_numpy(zero_copy_only=False).sum()
                )
            mx = int(
                t["mx"].combine_chunks().to_numpy(zero_copy_only=False).max()
            )
        return pa.table(
            {
                "n_vectors": pa.array([tot["nv"]], pa.int64()),
                "n_dup_groups": pa.array([tot["ng"]], pa.int64()),
                "n_dup_vectors": pa.array([tot["nd"]], pa.int64()),
                "dup_permille": pa.array(
                    [1000 * tot["nd"] // max(tot["nv"], 1)], pa.int64()
                ),
                "max_group": pa.array([mx], pa.int64()),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cells = hash_partition_merge(partials, "h", fold, k=64)
    return hash_partition_merge(cells, "g", merge, k=1)


def chunk_shingle_loss(sf_dir: str) -> Dataset:
    """T213: chunk shingle-loss curve — for each candidate chunk length
    L ∈ {32, 64, 128, 256}: total 3-word shingles in the corpus and
    shingles a hard split at L-word boundaries would SEVER (a shingle
    starting at 0-based position p is severed when p // L ≠
    (p + 2) // L), with the loss permille — the INFORMATION cost of
    chunking that completes T123's accounting (T123 prices pad-waste
    in TOKENS; T213 prices the n-gram evidence destroyed at the cuts —
    the quantity shingle-based dedup, retrieval indexing and any
    overlap-free context split actually lose; the two curves bracket
    the chunk-length decision from both sides).  One row per L ALWAYS;
    exact int64 (integer-divide boundary predicate + per-L sums
    oracle).

    Scale shape — ZERO-shuffle scan-reduce: per batch, shingle counts
    fall out of the document length vector alone (max(nw − 2, 0) per
    doc) and severed counts out of a closed-form count of boundary-
    straddling positions per doc (no per-shingle materialization at
    all — 2 positions straddle each interior cut); each batch
    collapses to 4 partial rows; the k=1 merge folds them."""
    from ..stages.shuffle import hash_partition_merge

    LS = np.array([32, 64, 128, 256], np.int64)

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        nw = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sh = np.maximum(nw - 2, 0)
        total = int(sh.sum())
        out_l, out_t, out_s = [], [], []
        for L in LS:
            # a shingle starting at 0-based p (p ≤ nw-3) is severed iff a
            # multiple of L lies in [p+1, p+2]; counting by the multiples
            # instead of the shingles gives the closed form
            #   severed(nw) = (nw-2)//L  +  (nw-1)//L      (nw ≥ 3)
            # (each cut c = kL severs start c-1 iff c ≤ nw-2 and start
            # c-2 iff c ≤ nw-1; the two start sets never overlap for
            # L ≥ 2)
            has = nw >= 3
            sev = np.where(has, (nw - 2) // L, 0) + np.where(
                has, (nw - 1) // L, 0
            )
            out_l.append(int(L))
            out_t.append(total)
            out_s.append(int(sev.sum()))
        return pa.table(
            {
                "L": pa.array(out_l, pa.int64()),
                "t": pa.array(out_t, pa.int64()),
                "s": pa.array(out_s, pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        ls = t["L"].combine_chunks().to_numpy(zero_copy_only=False)
        tt = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        ss = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        tot = np.zeros(len(LS), np.int64)
        sev = np.zeros(len(LS), np.int64)
        idx = np.searchsorted(LS, ls)
        np.add.at(tot, idx, tt)
        np.add.at(sev, idx, ss)
        return pa.table(
            {
                "chunk_len": pa.array(LS),
                "n_shingles": pa.array(tot),
                "n_severed": pa.array(sev),
                "severed_permille": pa.array(
                    1000 * sev // np.maximum(tot, 1)
                ),
            }
        )

    partials = _docs(sf_dir, ["text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "L", merge, k=1)


def vocab_age_profile(sf_dir: str) -> Dataset:
    """T214: vocabulary-age profile — classify every word type by the
    INGESTION-ORDER DECILE of its corpus-wide first appearance
    (decile = 10·min_doc_id // N over the N dense doc_ids, clamped to
    9) and count, per (source, age decile): the source's distinct
    types in that decile — does a source speak OLD or NEW vocabulary,
    the age-mix read that inverts T64 (T64 credits each source with
    the types it INTRODUCES; T214 profiles each source's whole lexicon
    by WHEN the corpus first saw its words: a late-crawled source
    whose vocabulary is all decile-0 words adds volume, not language —
    exactly the redundancy a dedup pass cannot see because the DOCS
    are new; T159 draws the corpus-level introduction curve with no
    source axis).  One row per occupied (source, decile) cell; exact
    int64 (per-word min(doc_id) + decile divide + per-source distinct
    count oracle).

    Scale shape — T203's word-hash exchange with a decile finish: each
    word's partition knows the word's corpus-min doc_id AND every
    source carrying it, so the (source, decile) cell increments settle
    locally and collapse IN PLACE to a ≤ sources × 10 grid; k=1
    densifying merge.  The corpus doc count ships as one broadcast
    integer (parquet footer math); word strings die in the
    partition."""
    import os

    import pyarrow.parquet as pq

    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)
    path = f"{sf_dir}/documents.parquet"
    if os.path.isdir(path):
        n_docs = sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    else:
        n_docs = pq.ParquetFile(path).metadata.num_rows

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        did = pc.cast(b["doc_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        scode = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # distinct (word, source) cells + per-word batch-min doc
        key = codes * ns + scode[parent]
        order = np.argsort(key, kind="stable")
        k2 = key[order]
        d2 = did[parent][order]
        head = np.empty(len(order), dtype=bool)
        if len(order):
            head[0] = True
            head[1:] = k2[1:] != k2[:-1]
        starts = np.flatnonzero(head)
        # min doc per (word, source) cell
        mn = np.minimum.reduceat(d2, starts) if len(starts) else d2[:0]
        ku = k2[starts]
        g = pa.table(
            {
                "w": pc.take(enc.dictionary, pa.array(ku // ns)),
                "src": pa.array(ku % ns),
                "mn": pa.array(mn),
            }
        )
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "src": g["src"],
                "w": g["w"],
                "mn": g["mn"],
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dec": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        wcol = t["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        wid = wcol.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        mn = t["mn"].combine_chunks().to_numpy(zero_copy_only=False)
        nw = int(wid.max()) + 1
        # the word's corpus-min doc over all its cells
        wmin = np.full(nw, np.int64(2**62))
        np.minimum.at(wmin, wid, mn)
        dec = np.minimum(10 * wmin // max(n_docs, 1), 9)
        # distinct (word, source) pairs -> cell counts
        pair = np.unique(wid * ns + src)
        cell = dec[pair // ns] * ns + pair % ns
        grid = np.zeros(10 * ns, np.int64)
        np.add.at(grid, cell, 1)
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "src": pa.array(live % ns),
                "dec": pa.array(live // ns),
                "n": pa.array(grid[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid = np.zeros(10 * ns, np.int64)
        if t.num_rows:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            d = t["dec"].combine_chunks().to_numpy(zero_copy_only=False)
            n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(grid, d * ns + s, n)
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(live % ns)),
                "age_decile": pa.array((live // ns).astype(np.int64)),
                "n_types": pa.array(grid[live]),
            }
        )

    partials = _docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    cells = hash_partition_merge(partials, "h", fold)
    return hash_partition_merge(cells, "dec", merge, k=1)


def embedding_deadzone(sf_dir: str) -> Dataset:
    """T215: quantization dead-zone census — per 1-based dimension:
    components, EXACT zeros, and NEAR-ZERO components (nonzero but
    floor(1000·|x|) = 0 — the values the repo's 1/1000 integer
    quantization collapses to nothing), with the dead-zone permille —
    the quantization-safety audit for every integer-quantized consumer
    (T78's norms, T209's centroids and any int8-style compression all
    floor at the same scale; T193 counts EXACT zeros only: a dimension
    whose mass hides inside (0, 0.001) reads as dead to the quantized
    pipeline while carrying live signal — the silent-truncation bug
    class).  One row per dimension ALWAYS; exact int64 (unnest +
    generate_subscripts + CASE census oracle, float compares and ONE
    floor only).

    Scale shape — ZERO wide exchange: (n, d) reshape per batch, two
    vectorized masks, three bincounts to a d-row partial; k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "nc": pa.array([], pa.int64()),
                    "nz": pa.array([], pa.int64()),
                    "nd": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)
        )
        d = m.shape[1]
        zero = m == 0.0
        dead = (~zero) & (np.floor(1000.0 * np.abs(m)) == 0)
        dims = np.arange(1, d + 1, dtype=np.int64)
        return pa.table(
            {
                "dim": pa.array(dims),
                "nc": pa.array(np.full(d, n, np.int64)),
                "nz": pa.array(zero.sum(axis=0).astype(np.int64)),
                "nd": pa.array(dead.sum(axis=0).astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n_components": pa.array([], pa.int64()),
                    "n_zero": pa.array([], pa.int64()),
                    "n_deadzone": pa.array([], pa.int64()),
                    "deadzone_permille": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("dim", use_threads=False).aggregate(
            [("nc", "sum"), ("nz", "sum"), ("nd", "sum")]
        )
        nc = g["nc_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        nd = g["nd_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dim": pc.cast(g["dim"], pa.int64()),
                "n_components": pc.cast(g["nc_sum"], pa.int64()),
                "n_zero": pc.cast(g["nz_sum"], pa.int64()),
                "n_deadzone": pc.cast(g["nd_sum"], pa.int64()),
                "deadzone_permille": pa.array(
                    1000 * nd // np.maximum(nc, 1)
                ),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "dim", merge, k=1)


def sample_audit(sf_dir: str, mod: int = 64) -> Dataset:
    """T216: corpus sampling-error audit — per source: documents, the
    deterministic 1/``mod`` doc slice (doc_id % mod == 0), the true
    whitespace-token total, the ``mod``×-scaled token estimate from the
    slice alone, and the absolute permille error — the calibration
    board that says whether doc-id sampling is safe for CORPUS stats
    (every expensive board in this suite has a cheap sampled twin in
    practice; E139 runs this audit on the EVENT stream by user slice;
    T216 runs it where it matters for data work: a source whose error
    blows up has doc-id-correlated length structure — striping,
    sorted-by-size ingestion — and must not be sampled by id).  One
    dense row per source ALWAYS; exact int64 (modulo slice +
    CASE-scaled estimate + abs-diff permille oracle).

    Scale shape — ZERO-shuffle scan-reduce: per batch two bincount
    pairs (docs/tokens, full/sliced) onto a ≤ sources grid; k=1
    merge forms the estimate and error."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        ntok = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        did = pc.cast(b["doc_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        sc = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        insl = did % mod == 0
        nd = np.bincount(sc, minlength=ns)
        nds = np.bincount(sc[insl], minlength=ns)
        tok = np.bincount(sc, weights=ntok, minlength=ns).astype(np.int64)
        toks = np.bincount(
            sc[insl], weights=ntok[insl], minlength=ns
        ).astype(np.int64)
        live = np.flatnonzero(nd)
        return pa.table(
            {
                "src": pa.array(live.astype(np.int64)),
                "nd": pa.array(nd[live].astype(np.int64)),
                "nds": pa.array(nds[live].astype(np.int64)),
                "tok": pa.array(tok[live]),
                "toks": pa.array(toks[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nd = np.zeros(ns, np.int64)
        nds = np.zeros(ns, np.int64)
        tok = np.zeros(ns, np.int64)
        toks = np.zeros(ns, np.int64)
        if t.num_rows:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            for acc, col in (
                (nd, "nd"), (nds, "nds"), (tok, "tok"), (toks, "toks")
            ):
                np.add.at(
                    acc, s,
                    t[col].combine_chunks().to_numpy(zero_copy_only=False),
                )
        est = mod * toks
        err = 1000 * np.abs(est - tok) // np.maximum(tok, 1)
        return pa.table(
            {
                "source": srcs,
                "n_docs": pa.array(nd),
                "n_sampled": pa.array(nds),
                "n_tokens": pa.array(tok),
                "est_tokens": pa.array(est),
                "err_permille": pa.array(err),
            }
        )

    partials = _docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "src", merge, k=1)


def embedding_overflow(sf_dir: str) -> Dataset:
    """T217: quantization overflow audit — per 1-based dimension:
    components, components with |x| > 1 (outside the unit scale every
    int8-style symmetric quantizer and the repo's 1/1000 integer grid
    implicitly assume), and the maximum quantized magnitude
    floor(1000·|x|) — the OTHER end of T215's dead-zone (T215 finds
    mass the grid collapses to zero; T217 finds mass the grid would
    CLIP: a dimension whose max_q dwarfs its peers forces a per-tensor
    scale to waste precision everywhere else — the classic outlier-
    dimension quantization failure, and the reason per-channel scales
    exist).  One row per dimension ALWAYS; exact int64 (unnest +
    subscripts + CASE census + max oracle).

    Scale shape — ZERO wide exchange: (n, d) reshape per batch, one
    mask, one column max; d-row partials; k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "nc": pa.array([], pa.int64()),
                    "nov": pa.array([], pa.int64()),
                    "mq": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)
        )
        d = m.shape[1]
        am = np.abs(m)
        over = (am > 1.0).sum(axis=0).astype(np.int64)
        mq = np.floor(1000.0 * am).astype(np.int64).max(axis=0)
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "nc": pa.array(np.full(d, n, np.int64)),
                "nov": pa.array(over),
                "mq": pa.array(mq),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n_components": pa.array([], pa.int64()),
                    "n_over_unit": pa.array([], pa.int64()),
                    "max_q": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("dim", use_threads=False).aggregate(
            [("nc", "sum"), ("nov", "sum"), ("mq", "max")]
        )
        return pa.table(
            {
                "dim": pc.cast(g["dim"], pa.int64()),
                "n_components": pc.cast(g["nc_sum"], pa.int64()),
                "n_over_unit": pc.cast(g["nov_sum"], pa.int64()),
                "max_q": pc.cast(g["mq_max"], pa.int64()),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "dim", merge, k=1)


def id_stripe(sf_dir: str, mod: int = 64) -> Dataset:
    """T218: doc-id stripe detection — per source: docs, DISTINCT
    doc_id % ``mod`` residues the source occupies, and the MODAL
    residue's share permille (ties → the smaller residue) — the
    id-correlation detector T216's error number points at but cannot
    localize (T216 says a source is unsafe to id-sample; T218 says
    WHY: a round-robin generator pins each source to few residues —
    modal share → 1000 — while an organic corpus spreads ~uniformly at
    ≈ 1000/mod; T52's id-integrity audits dense GLOBAL numbering, not
    the per-source residue geometry that breaks modulo sampling).
    One dense row per source ALWAYS; exact int64 (modulo + per-(source,
    residue) count + modal row_number oracle).

    Scale shape — ZERO-shuffle scan-reduce: each batch collapses to a
    ≤ sources × mod grid with one packed bincount; the k=1 merge sums
    grids and takes one argmax per source."""
    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        did = pc.cast(b["doc_id"], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        sc = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        grid = np.bincount(sc * mod + did % mod, minlength=ns * mod)
        live = np.flatnonzero(grid)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "n": pa.array(grid[live].astype(np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        grid = np.zeros(ns * mod, np.int64)
        if t.num_rows:
            cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                grid, cell,
                t["n"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        g2 = grid.reshape(ns, mod)
        nd = g2.sum(axis=1)
        nres = (g2 > 0).sum(axis=1)
        modal = g2.argmax(axis=1)
        share = 1000 * g2[np.arange(ns), modal] // np.maximum(nd, 1)
        return pa.table(
            {
                "source": srcs,
                "n_docs": pa.array(nd.astype(np.int64)),
                "n_residues": pa.array(nres.astype(np.int64)),
                "modal_share_permille": pa.array(share.astype(np.int64)),
            }
        )

    partials = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "cell", merge, k=1)


def dup_distance(sf_dir: str) -> Dataset:
    """T219: duplicate-distance summary — over every ECHO document (a
    non-winner member of an exact-dup group, winner = min doc_id,
    T61/T69's first-publisher rule) report one corpus row: echoes, and
    the MIN / MAX / SUM of the ingestion distance echo_id − winner_id —
    HOW FAR APART copies arrive, the provenance read the dup counts
    flatten (T1 finds the groups, T91 weighs echo mass, T205 crosses
    shards; T219 reads the id axis: a small min/mean = near-adjacent
    re-fetches — a crawler revisiting within one sweep, dedupable with
    a bounded window; a large max = true mirrors surfacing much later,
    which only the full hash exchange catches — and the split decides
    whether a cheap windowed dedup would suffice).  Exactly one row
    ALWAYS (zeros on a dup-free corpus); exact int64 (GROUP BY text +
    min + id-difference + COALESCEd aggregate oracle; the engine
    routes by T1's 64-bit content hash — identical texts co-group).

    Scale shape — T1's content-hash exchange verbatim (doc_id + hash
    travel, text never leaves the read): each partition takes group
    minima and echo distances with one sorted boundary pass and
    collapses to FOUR integers (emitted even when empty, so the final
    merge always runs); k=1 merge."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = (
            pl.from_arrow(batch.select(["text"]))["text"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "text_hash": pa.array(hs, pa.int64()),
            }
        )

    hashed = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add_hash, batch_format="pyarrow"
    )

    SENT = np.int64(2**62)

    def fold(t: pa.Table) -> pa.Table:
        ne, mn, mx, sd = 0, int(SENT), 0, 0
        if t.num_rows:
            h = t["text_hash"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            did = t["doc_id"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            order = np.lexsort((did, h))
            h2, d2 = h[order], did[order]
            head = np.empty(len(h2), dtype=bool)
            head[0] = True
            head[1:] = h2[1:] != h2[:-1]
            gid = np.cumsum(head) - 1
            winner = d2[np.flatnonzero(head)]
            dist = d2 - winner[gid]
            echo = dist > 0
            if echo.any():
                dd = dist[echo]
                ne = int(echo.sum())
                mn = int(dd.min())
                mx = int(dd.max())
                sd = int(dd.sum())
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "ne": pa.array([ne], pa.int64()),
                "mn": pa.array([mn], pa.int64()),
                "mx": pa.array([mx], pa.int64()),
                "sd": pa.array([sd], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        ne = int(
            t["ne"].combine_chunks().to_numpy(zero_copy_only=False).sum()
        )
        mn = int(
            t["mn"].combine_chunks().to_numpy(zero_copy_only=False).min()
        )
        mx = int(
            t["mx"].combine_chunks().to_numpy(zero_copy_only=False).max()
        )
        sd = int(
            t["sd"].combine_chunks().to_numpy(zero_copy_only=False).sum()
        )
        return pa.table(
            {
                "n_echoes": pa.array([ne], pa.int64()),
                "min_dist": pa.array([0 if ne == 0 else mn], pa.int64()),
                "max_dist": pa.array([mx], pa.int64()),
                "sum_dist": pa.array([sd], pa.int64()),
            }
        )

    cells = hash_partition_merge(hashed, "text_hash", fold, k=64)
    return hash_partition_merge(cells, "g", merge, k=1)


def lang_length_matrix(sf_dir: str) -> Dataset:
    """T220: language × length matrix — per (lang label, bit-length band
    of the document's whitespace word count): docs and total words —
    HOW LONG documents run in each language (T44/T62 budget docs and
    tokens per lang with no length structure, T43 bands lengths with
    no lang; the cross is where script-economy effects live: a lang
    whose mass sits two bands below the corpus mode either genuinely
    compresses — CJK-style scripts — or its documents are truncated
    fragments, and per-lang context-length policy reads directly off
    the row).  One row per occupied (lang, band) cell; exact int64
    (len(str_split) + length(bin) + two-key GROUP BY oracle).

    Scale shape — ZERO-shuffle scan-reduce: word counts off one
    split_pattern length vector, bands via vectorized frexp, one
    packed bincount pair onto a ≤ langs × 34 grid; k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    langs = pa.array(
        sorted(_docs(sf_dir, ["lang"]).unique("lang")), pa.string()
    )
    nl = len(langs)
    NB = 34

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        nw = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        lc = (
            pc.cast(pc.index_in(b["lang"], value_set=langs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        band = np.where(
            nw == 0, 0,
            np.frexp(nw.astype(np.float64))[1].astype(np.int64),
        )
        idx = lc * NB + np.minimum(band, NB - 1)
        nd = np.bincount(idx, minlength=nl * NB)
        wsum = np.bincount(idx, weights=nw, minlength=nl * NB).astype(
            np.int64
        )
        live = np.flatnonzero(nd)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "nd": pa.array(nd[live].astype(np.int64)),
                "nw": pa.array(wsum[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        nd = np.zeros(nl * NB, np.int64)
        nw = np.zeros(nl * NB, np.int64)
        if t.num_rows:
            cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                nd, cell,
                t["nd"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                nw, cell,
                t["nw"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(nd)
        return pa.table(
            {
                "lang": pc.take(langs, pa.array(live // NB)),
                "len_band": pa.array((live % NB).astype(np.int64)),
                "n_docs": pa.array(nd[live]),
                "n_words": pa.array(nw[live]),
            }
        )

    partials = _docs(sf_dir, ["lang", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    return hash_partition_merge(partials, "cell", merge, k=1)


def embedding_mean_vector(sf_dir: str) -> Dataset:
    """T221: mean-vector anisotropy audit — per 1-based dimension:
    vectors, the exact quantized FIRST moment Σfloor(1000·x) over ALL
    vectors, and the quantized ABSOLUTE mass Σfloor(1000·|x|) — the
    common-direction bias read (the well-known anisotropy pathology:
    embedding spaces concentrate around a non-zero mean direction, and
    cosine similarity then measures agreement with the MEAN more than
    with meaning; T209 materializes centroids per LABEL — T221 is the
    corpus-level row whose ratio |Σq| / Σ|q| per dimension is the bias
    share: near 0 = balanced axis, near 1000‰ = the axis is pure
    offset and mean-centering before ANN is mandatory).  One row per
    dimension ALWAYS; exact int64 (unnest + subscripts + two floored
    SUMs oracle).

    Scale shape — ZERO wide exchange: (n, d) reshape per batch, two
    floor passes, column sums; d-row partials; k=1 merge."""
    from ..stages.shuffle import hash_partition_merge

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        e = batch["embedding"]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        n = len(e)
        if n == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "nv": pa.array([], pa.int64()),
                    "sq": pa.array([], pa.int64()),
                    "sa": pa.array([], pa.int64()),
                }
            )
        m = (
            e.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, -1)
        )
        d = m.shape[1]
        q = np.floor(1000.0 * m).astype(np.int64)
        aq = np.floor(1000.0 * np.abs(m)).astype(np.int64)
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "nv": pa.array(np.full(d, n, np.int64)),
                "sq": pa.array(q.sum(axis=0)),
                "sa": pa.array(aq.sum(axis=0)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n_vectors": pa.array([], pa.int64()),
                    "sum_q": pa.array([], pa.int64()),
                    "sum_abs_q": pa.array([], pa.int64()),
                }
            )
        g = t.group_by("dim", use_threads=False).aggregate(
            [("nv", "sum"), ("sq", "sum"), ("sa", "sum")]
        )
        return pa.table(
            {
                "dim": pc.cast(g["dim"], pa.int64()),
                "n_vectors": pc.cast(g["nv_sum"], pa.int64()),
                "sum_q": pc.cast(g["sq_sum"], pa.int64()),
                "sum_abs_q": pc.cast(g["sa_sum"], pa.int64()),
            }
        )

    partials = emb.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition_merge(partials, "dim", merge, k=1)


def core_vocab(sf_dir: str) -> Dataset:
    """T222: core-vocabulary coverage — define the corpus CORE as the
    word types present in at least HALF the sources (2·breadth ≥
    |sources|) and report per source: total word occurrences,
    occurrences of core types, and the core-coverage permille — how
    much of each slice is written in the corpus's shared language
    (T156 histograms breadth over the VOCABULARY, T118 counts
    exclusive types, T60 covers by corpus TOP-k frequency; T222's
    core is breadth-defined, which survives volume skew: a source at
    300‰ core coverage speaks its own dialect — it will anchor its own
    embedding cluster and resist cross-source dedup — while 900‰
    sources are interchangeable).  One dense row per source ALWAYS;
    exact int64 (per-word count-DISTINCT-source breadth + core filter
    + per-source occurrence sums oracle).

    Scale shape — T197's word-hash exchange: each word's partition
    holds every (source, word, n) cell, so its breadth and core-ness
    settle locally and re-reduce IN PLACE to per-source
    (occurrences, core occurrences) pairs; the |sources| count ships
    as one broadcast integer; k=1 densifying merge.  Word strings die
    in the partition."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "w": flat,
                "src": pa.array(code[parent].astype(np.int64)),
                "n": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        g = t.group_by(["w", "src"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        g = g.rename_columns(["w", "src", "n"])
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "src": g["src"],
                "w": g["w"],
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "occ": pa.array([], pa.int64()),
                    "core": pa.array([], pa.int64()),
                }
            )
        wcol = t["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        wid = wcol.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        nw = int(wid.max()) + 1
        # combine (word, source) cells, then breadth per word
        key = wid * ns + src
        packed, inv = np.unique(key, return_inverse=True)
        cnt = np.zeros(len(packed), np.int64)
        np.add.at(cnt, inv, n)
        wu = packed // ns
        su = packed % ns
        breadth = np.bincount(wu, minlength=nw)
        is_core = (2 * breadth[wu]) >= ns
        occ = np.bincount(su, weights=cnt, minlength=ns).astype(np.int64)
        core = np.bincount(
            su[is_core], weights=cnt[is_core], minlength=ns
        ).astype(np.int64)
        live = np.flatnonzero(occ)
        return pa.table(
            {
                "src": pa.array(live.astype(np.int64)),
                "occ": pa.array(occ[live]),
                "core": pa.array(core[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        occ = np.zeros(ns, np.int64)
        core = np.zeros(ns, np.int64)
        if t.num_rows:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                occ, s,
                t["occ"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                core, s,
                t["core"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        return pa.table(
            {
                "source": srcs,
                "n_occurrences": pa.array(occ),
                "n_core": pa.array(core),
                "core_permille": pa.array(
                    1000 * core // np.maximum(occ, 1)
                ),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    cells = hash_partition_merge(partials, "h", fold)
    return hash_partition_merge(cells, "src", merge, k=1)


def hapax_position(sf_dir: str) -> Dataset:
    """T223: hapax-position cross — per (source, document third of the
    occurrence, 3·p // n): total word occurrences in the cell and
    occurrences of CORPUS-HAPAX types (global frequency exactly 1 —
    the hapax's single occurrence has one well-defined position), with
    the hapax permille — WHERE the corpus's noise lives inside
    documents, the cross T124 and T200 each hold one axis of (T124
    counts hapax per source with no position, T200 classifies the
    whole lexicon by thirds with no rarity; OCR damage and truncation
    artifacts concentrate singletons at document TAILS — page edges,
    cut-off sentences — while uniform hapax spread is genuine
    long-tail vocabulary).  One row per occupied (source, third);
    exact int64 (range-unnest thirds + per-word corpus count +
    filtered sums oracle).

    Scale shape — T197's word-hash exchange carrying each cell's
    third-histogram: batches pre-reduce to (hash, source, word,
    third-counts) cells via one lexsort; the word's partition decides
    corpus-hapaxness exactly and re-reduces IN PLACE to a
    ≤ sources × 3 grid (total occurrence counts ride the same cells);
    k=1 densifying merge."""
    import polars as pl

    from ..stages.shuffle import hash_partition_merge

    srcs = pa.array(
        sorted(_docs(sf_dir, ["source"]).unique("source")), pa.string()
    )
    ns = len(srcs)

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        nw = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        offs = np.zeros(len(nw) + 1, dtype=np.int64)
        np.cumsum(nw, out=offs[1:])
        pos = np.arange(int(offs[-1]), dtype=np.int64) - offs[:-1][parent]
        third = 3 * pos // nw[parent]
        code = (
            pc.cast(pc.index_in(b["source"], value_set=srcs), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        src_occ = code[parent]
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # per (src, word): counts per third, via packed unique
        key = (codes * ns + src_occ) * 3 + third
        packed, cnt = np.unique(key, return_counts=True)
        g = pa.table(
            {
                "w": pc.take(enc.dictionary, pa.array(packed // 3 // ns)),
                "src": pa.array(packed // 3 % ns),
                "third": pa.array(packed % 3),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )
        hs = (
            pl.from_arrow(g.select(["w"]))["w"]
            .hash(seed=42)
            .to_numpy()
            .view(np.int64)
        )
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "src": g["src"],
                "third": g["third"],
                "w": g["w"],
                "n": g["n"],
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "occ": pa.array([], pa.int64()),
                    "hx": pa.array([], pa.int64()),
                }
            )
        wcol = t["w"]
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        wid = wcol.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        third = t["third"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        nw = int(wid.max()) + 1
        freq = np.zeros(nw, np.int64)
        np.add.at(freq, wid, n)
        is_hapax = freq[wid] == 1
        cell = src * 3 + third
        occ = np.zeros(ns * 3, np.int64)
        hx = np.zeros(ns * 3, np.int64)
        np.add.at(occ, cell, n)
        np.add.at(hx, cell[is_hapax], n[is_hapax])
        live = np.flatnonzero(occ)
        return pa.table(
            {
                "cell": pa.array(live.astype(np.int64)),
                "occ": pa.array(occ[live]),
                "hx": pa.array(hx[live]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        occ = np.zeros(ns * 3, np.int64)
        hx = np.zeros(ns * 3, np.int64)
        if t.num_rows:
            cell = t["cell"].combine_chunks().to_numpy(zero_copy_only=False)
            np.add.at(
                occ, cell,
                t["occ"].combine_chunks().to_numpy(zero_copy_only=False),
            )
            np.add.at(
                hx, cell,
                t["hx"].combine_chunks().to_numpy(zero_copy_only=False),
            )
        live = np.flatnonzero(occ)
        return pa.table(
            {
                "source": pc.take(srcs, pa.array(live // 3)),
                "third": pa.array((live % 3).astype(np.int64)),
                "n_occurrences": pa.array(occ[live]),
                "n_hapax": pa.array(hx[live]),
                "hapax_permille": pa.array(
                    1000 * hx[live] // np.maximum(occ[live], 1)
                ),
            }
        )

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    cells = hash_partition_merge(partials, "h", fold)
    return hash_partition_merge(cells, "cell", merge, k=1)
