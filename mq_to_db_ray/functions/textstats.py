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
