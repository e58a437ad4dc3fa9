"""Text-analysis kernels for training-data pipelines: tokenization,
language-ID, quality scoring, fingerprinting, SimHash, MinHash shingles.

All are pure per-batch functions (numpy/pandas vectorized where it matters,
word-level dict hashing amortized per batch) meant to run inside
``map_batches``.  Token ids are derived with the same splitmix64 ``h`` as the
F1 generator so results are deterministic everywhere.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

from ..gen import VOCAB

# Tiny stopword list (shared with the quality oracle SQL — keep in sync with
# __ray_entry__.oracle_sql).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

_MASK64 = (1 << 64) - 1


def word_hash64(word: str) -> int:
    """Stable 64-bit word hash (blake2b-8); basis for token ids & sketches."""
    return int.from_bytes(hashlib.blake2b(word.encode(), digest_size=8).digest(), "big")


class WordHasher:
    """Per-actor memoized word -> hash map (stateful-stage state: build once,
    reuse across batches — the `storageWorkers` pattern)."""

    def __init__(self) -> None:
        self.cache: dict[str, int] = {}

    def __call__(self, word: str) -> int:
        v = self.cache.get(word)
        if v is None:
            v = word_hash64(word)
            self.cache[word] = v
        return v


def tokenize(text: str, hasher: WordHasher | None = None) -> list[int]:
    """Whitespace-split words -> int32 token ids in [0, VOCAB).

    Split semantics are exactly ``text.split(' ')`` (single-space), matching
    DuckDB's ``str_split(text, ' ')`` so n_tok is SQL-checkable.
    """
    hh = hasher or word_hash64
    return [(hh(w) if hasher else word_hash64(w)) % VOCAB for w in text.split(" ")]


def token_counts(texts: list[str]) -> np.ndarray:
    return np.array([len(t.split(" ")) for t in texts], dtype=np.int64)


def quality_features(text: str) -> dict:
    """Integer-valued quality features (integers so the DuckDB oracle can
    reproduce them bit-exactly — no float-summation ambiguity)."""
    words = text.split(" ")
    n_words = len(words)
    n_stop = sum(1 for w in words if w.lower() in STOPWORDS)
    return dict(
        n_words=n_words,
        n_stop=n_stop,
        stop_permille=math.floor(1000.0 * n_stop / n_words) if n_words else 0,
    )


def lang_id(text: str) -> str:
    """Tiny n-gram/stopword heuristic language guesser (en/de/fr/unknown).

    Not a model — a deterministic frequency heuristic (public-knowledge
    approach: character-frequency + stopword voting).
    """
    words = set(w.lower() for w in text.split(" "))
    votes = {
        "en": len(words & {"the", "and", "of", "to", "is", "a", "in", "that"}),
        "de": len(words & {"der", "die", "das", "und", "ist", "nicht", "ein"}),
        "fr": len(words & {"le", "la", "les", "et", "est", "une", "que"}),
    }
    best = max(votes, key=lambda k: (votes[k], k))
    return best if votes[best] > 0 else "unknown"


def doc_fingerprint(text: str, window: int = 8) -> int:
    """Rolling-hash document fingerprint: min of window-grams of word hashes
    (a winnowing-style selection — Schleimer et al., SIGMOD 2003, public)."""
    hs = [word_hash64(w) for w in text.split(" ")]
    if not hs:
        return 0
    if len(hs) <= window:
        acc = 0
        for v in hs:
            acc = (acc * 1099511628211 + v) & _MASK64
        return acc
    best = _MASK64
    acc = 0
    # rolling polynomial over each window of word hashes
    base = 1099511628211
    base_pow = pow(base, window - 1, 1 << 64)
    for i, v in enumerate(hs):
        acc = (acc * base + v) & _MASK64
        if i >= window:
            acc = (acc - hs[i - window] * ((base_pow * base) & _MASK64)) & _MASK64
        if i >= window - 1:
            best = min(best, acc)
    return best


_FP_BASE = 1099511628211
_FP_POWERS: dict[int, np.ndarray] = {}


def doc_fingerprint_fast(
    text: str, window: int = 8, hasher: WordHasher | None = None
) -> int:
    """``doc_fingerprint`` with the rolling polynomial evaluated as one
    numpy expression (window shifted-slices × precomputed base powers,
    wrapping uint64) — value-identical to the scalar reference (asserted in
    tests); the short-document path delegates to it."""
    words = text.split(" ")
    n = len(words)
    if n <= window:
        return doc_fingerprint(text, window)
    hh = hasher or word_hash64
    hv = np.fromiter((hh(w) for w in words), dtype=np.uint64, count=n)
    p = _FP_POWERS.get(window)
    if p is None:
        p = np.array(
            [pow(_FP_BASE, window - 1 - j, 1 << 64) for j in range(window)],
            dtype=np.uint64,
        )
        _FP_POWERS[window] = p
    m = n - window + 1
    with np.errstate(over="ignore"):
        acc = hv[0:m] * p[0]
        for j in range(1, window):
            acc = acc + hv[j : j + m] * p[j]
    return int(acc.min())


def batch_word_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Whole-batch word hashing: (flat word-hash vector uint64, words-per-row).

    One Arrow ``split_pattern`` over the column, one ``dictionary_encode``
    so each UNIQUE word is blake2b-hashed exactly once per batch, then a
    numpy gather — the flattened-parent-indices formulation that lets the
    per-doc kernels below (simhash/fingerprint) drop their Python doc loops.
    Split semantics are ``text.split(' ')``, so every row has >= 1 word
    ('' -> ['']), which the segment kernels rely on."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern(texts, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    n = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = words.flatten()
    d = flat.dictionary_encode()
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = d.dictionary.to_pylist()
    uh = np.fromiter(
        (word_hash64(w) for w in uniq), dtype=np.uint64, count=len(uniq)
    )
    return (uh[idx] if len(idx) else np.empty(0, np.uint64)), n


def simhash_batch(texts, bits: int = 64) -> np.ndarray:
    """Vectorized ``simhash`` over a whole column (value-identical to the
    scalar kernel — asserted in tests): the per-word bit matrix is one
    ``np.unpackbits`` over the hash bytes and per-doc votes are one
    ``np.add.reduceat``, processed in bounded word-chunks so the unpacked
    matrix stays cache-sized (this host's concurrent fresh-page allocation
    collapses at large temporaries)."""
    assert bits == 64, "simhash_batch supports the 64-bit sketch"
    hv, n = batch_word_hashes(texts)
    n_docs = len(n)
    if n_docs == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.cumsum(n)
    starts = ends - n
    # unpackbits is MSB-first within each little-endian byte: column
    # c = 8*(c//8) + (7 - c%8) in shift order
    cols = np.arange(64, dtype=np.uint64)
    col_shift = (cols // 8) * 8 + (7 - cols % 8)
    weights = np.uint64(1) << col_shift
    out = np.empty(n_docs, dtype=np.uint64)
    chunk_words = 1 << 15  # keeps the (64, W) csum in cache (swept: 2-4x
    # faster than 2^18-word chunks on this host)
    d0 = 0
    while d0 < n_docs:
        d1 = max(
            d0 + 1,
            min(int(np.searchsorted(ends, starts[d0] + chunk_words)), n_docs),
        )
        seg = hv[starts[d0] : ends[d1 - 1]]
        # (64, W) bit matrix, bits along the CONTIGUOUS axis so the segment
        # sums are one contiguous-inner-loop cumsum + a column gather
        # (np.add.reduceat / axis-0 cumsum over (W, 64) are ~30x slower)
        b8 = np.ascontiguousarray(seg.view(np.uint8).reshape(-1, 8).T)
        bits_t = np.unpackbits(b8, axis=0)
        csum = np.zeros((64, len(seg) + 1), dtype=np.int32)
        np.cumsum(bits_t, axis=1, dtype=np.int32, out=csum[:, 1:])
        sums = (
            csum[:, ends[d0:d1] - starts[d0]] - csum[:, starts[d0:d1] - starts[d0]]
        )
        counts = 2 * sums - n[d0:d1][None, :]
        out[d0:d1] = ((counts > 0) * weights[:, None]).sum(axis=0, dtype=np.uint64)
        d0 = d1
    return out


def fingerprint_batch(texts, window: int = 8) -> np.ndarray:
    """Vectorized ``doc_fingerprint`` over a whole column (value-identical
    to the scalar kernel — asserted in tests).

    Long docs (n >= window; n == window degenerates to the same single
    polynomial as the scalar short path): ALL window polynomials of the
    flat hash vector are computed in one shifted-slice expression, windows
    crossing doc boundaries are dropped by a gather, and per-doc minima are
    one ``np.minimum.reduceat``.  Short docs (n < window) are grouped by
    length — at most ``window - 1`` vectorized Horner evaluations."""
    hv, n = batch_word_hashes(texts)
    n_docs = len(n)
    out = np.zeros(n_docs, dtype=np.uint64)
    if n_docs == 0:
        return out
    starts = np.cumsum(n) - n
    p = _FP_POWERS.get(window)
    if p is None:
        p = np.array(
            [pow(_FP_BASE, window - 1 - j, 1 << 64) for j in range(window)],
            dtype=np.uint64,
        )
        _FP_POWERS[window] = p
    W = len(hv)
    L = np.where(n >= window, n - window + 1, 0)
    tot = int(L.sum())
    if tot:
        m = W - window + 1
        with np.errstate(over="ignore"):
            acc = hv[0:m] * p[0]
            for j in range(1, window):
                acc = acc + hv[j : j + m] * p[j]
        doc_pos = np.repeat(np.arange(n_docs), L)
        first = np.cumsum(L) - L
        win_start = starts[doc_pos] + (np.arange(tot, dtype=np.int64) - first[doc_pos])
        long_docs = np.flatnonzero(L > 0)
        out[long_docs] = np.minimum.reduceat(acc[win_start], first[long_docs])
    for k in np.unique(n[n < window]):
        rows = np.flatnonzero(n == k)
        idx = starts[rows][:, None] + np.arange(int(k))[None, :]
        pk = np.array(
            [pow(_FP_BASE, int(k) - 1 - j, 1 << 64) for j in range(int(k))],
            dtype=np.uint64,
        )
        with np.errstate(over="ignore"):
            out[rows] = (hv[idx] * pk[None, :]).sum(axis=1, dtype=np.uint64)
    return out


def simhash(text: str, bits: int = 64, hasher: WordHasher | None = None) -> int:
    """64-bit SimHash over word hashes (Charikar 2002, public).

    Vectorized: the per-bit vote matrix is one numpy broadcast over the
    word-hash vector instead of a per-word per-bit Python loop."""
    words = text.split(" ")
    if not words:
        return 0
    hh = hasher or word_hash64
    hv = np.array([hh(w) for w in words], dtype=np.uint64)
    shifts = np.arange(bits, dtype=np.uint64)
    bitmat = ((hv[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    counts = (2 * bitmat - 1).sum(axis=0)
    weights = np.uint64(1) << shifts
    return int(weights[counts > 0].sum(dtype=np.uint64))


# odd 64-bit mixing constants for the k-word shingle combine (any fixed
# odd multipliers give a ~uniform 64-bit hash over the word-hash k-tuple)
_SH_A = np.uint64(0x9E3779B97F4A7C15)
_SH_B = np.uint64(0xC2B2AE3D27D4EB4F)


def shingles(
    text: str, k: int = 3, hasher: WordHasher | None = None
) -> np.ndarray:
    """Hashed k-word shingles (sorted unique uint64 array — the n-gram set
    for Jaccard / MinHash).

    Vectorized: each UNIQUE word is blake2b-hashed once (memoized via
    ``hasher`` across a batch), then every k-tuple combines word hashes with
    a fixed-odd-multiplier polynomial in one numpy expression — ~10× the
    per-shingle blake2b of the naive form.  Only determinism and 64-bit
    uniformity matter (intersection counts drive Jaccard; the oracle works
    on shingle STRINGS), so the combine choice is free."""
    words = text.split(" ")
    if not words:
        return np.empty(0, dtype=np.uint64)
    hh = hasher or word_hash64
    if len(words) < k:
        return np.array([word_hash64(" ".join(words))], dtype=np.uint64)
    hv = np.fromiter((hh(w) for w in words), dtype=np.uint64, count=len(words))
    with np.errstate(over="ignore"):
        acc = hv[: -(k - 1)] * _SH_A
        for j in range(1, k - 1):
            acc = (acc + hv[j : j - (k - 1)] * _SH_B) * _SH_A
        acc = acc + hv[k - 1 :]
    return np.unique(acc)


def shingles_flat(texts, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Whole-batch :func:`shingles`: (parent-row int64, shingle uint64)
    pairs with per-row SORTED-UNIQUE shingles — value-identical to calling
    ``shingles(t, k)`` per row (asserted in tests), but one Arrow split +
    one dictionary-encode + one polynomial expression for the whole batch
    (the flattened-parent-indices formulation of simhash_batch), so the
    per-doc Python loop disappears.  Rows with < k words contribute their
    single joined-text hash, exactly like the scalar kernel."""
    import pyarrow as pa

    uh, n = batch_word_hashes(texts)
    total = len(uh)
    n_rows = len(n)
    starts = np.concatenate(([0], np.cumsum(n)))[:-1]
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), n)
    offs = np.arange(total, dtype=np.int64) - starts[row_of]
    valid = (n[row_of] >= k) & (offs <= n[row_of] - k)
    idx = np.flatnonzero(valid)
    with np.errstate(over="ignore"):
        acc = uh[idx] * _SH_A
        for j in range(1, k - 1):
            acc = (acc + uh[idx + j] * _SH_B) * _SH_A
        acc = acc + uh[idx + k - 1]
    rows = row_of[idx]
    short = np.flatnonzero(n < k)
    if len(short):
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        sh = np.fromiter(
            (word_hash64(texts[int(i)].as_py()) for i in short),
            dtype=np.uint64,
            count=len(short),
        )
        rows = np.concatenate([rows, short.astype(np.int64)])
        acc = np.concatenate([acc, sh])
    order = np.lexsort((acc, rows))
    rows, acc = rows[order], acc[order]
    keep = np.empty(len(rows), dtype=bool)
    if len(rows):
        keep[0] = True
        keep[1:] = (rows[1:] != rows[:-1]) | (acc[1:] != acc[:-1])
    return rows[keep], acc[keep]


def hash_strings64(arr) -> np.ndarray:
    """int64 view of :func:`word_hash64` over a string column — each UNIQUE
    value hashed once (dictionary-encode + gather).  The shared kernel for
    keying string columns into the int64-keyed shuffles/joins."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    d = arr.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uh = np.fromiter(
        (word_hash64(w) for w in d.dictionary.to_pylist()),
        dtype=np.uint64,
        count=len(d.dictionary),
    ).view(np.int64)
    return uh[codes] if len(codes) else np.empty(0, np.int64)


# MinHash: 64-bit universal hashing family a*x+b over the shingle hashes.
def minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MASK64, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, _MASK64, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(sh, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (
        np.asarray(sh, dtype=np.uint64)
        if not isinstance(sh, (set, frozenset))
        else np.fromiter(sh, dtype=np.uint64, count=len(sh))
    )
    if len(x) == 0:
        return np.full(len(a), _MASK64, dtype=np.uint64)
    # (a*x + b) mod 2^64, min over shingles, per permutation
    with np.errstate(over="ignore"):
        vals = (x[None, :] * a[:, None] + b[:, None]).min(axis=1)
    return vals


def jaccard(s1: set[int], s2: set[int]) -> float:
    if not s1 and not s2:
        return 1.0
    return len(s1 & s2) / len(s1 | s2)
