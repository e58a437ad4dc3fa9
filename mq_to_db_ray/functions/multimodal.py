"""Multimodal column handling: opaque ``binary`` payloads + typed metadata.

The image/audio decode libraries are not available in this container, so the
decode kernels are STUBS (clearly marked) — but all Ray-side plumbing is
real and tested: schema, actor-pool stage shape, batch sizing for large
binary rows, and the metadata extraction that *is* computable (byte length,
content hash, magic sniffing).

Pattern for real deployments: payloads stay in Arrow ``binary`` columns,
decode runs in an actor pool (model/codec loaded once per actor in
``__init__``), with SMALL ``batch_size`` so batch × concurrency fits the
worker heap (see ray_guide: memory-aware batching for binary payloads).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MULTIMODAL_META = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("payload_bytes", pa.int64()),
        ("kind", pa.string()),  # sniffed from magic bytes: png/jpeg/wav/unknown
    ]
)

_MAGIC = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"RIFF", "wav"),
    (b"\x1aE\xdf\xa3", "webm"),
]


def sniff_kind(payload: bytes) -> str:
    for magic, kind in _MAGIC:
        if payload[: len(magic)] == magic:
            return kind
    return "unknown"


def sniff_kinds(payloads: pa.Array) -> pa.Array:
    """Vectorized ``sniff_kind`` over a binary column: one ``binary_slice``
    + ``equal`` chain per magic instead of a per-row Python loop."""
    import pyarrow.compute as pc

    kind = pa.scalar("unknown")
    for magic, k in reversed(_MAGIC):
        sl = pc.binary_slice(payloads, 0, len(magic))
        kind = pc.if_else(pc.equal(sl, magic), pa.scalar(k), kind)
    return pc.fill_null(kind, "unknown")


def _binary_np(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (offsets int64, data uint8) view of a binary array (nulls
    not supported — callers produce non-null payload columns)."""
    if pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    bufs = arr.buffers()
    offs = np.frombuffer(
        bufs[1], dtype=np.int64, count=len(arr) + 1, offset=arr.offset * 8
    )
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    return offs, data


class PayloadMeta:
    """Actor-pool stage: binary payload -> typed metadata row (real).

    ``with_hash=True`` adds a per-payload blake2b content_hash column —
    opt-in because it is a per-row Python hash loop and the default
    consumers don't use it (round-2 verdict: paid for and dropped)."""

    def __init__(self, with_hash: bool = False):
        self.with_hash = with_hash

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        sizes = pc.cast(pc.binary_length(payloads), pa.int64())
        ids = (
            batch["doc_id"].combine_chunks()
            if isinstance(batch["doc_id"], pa.ChunkedArray)
            else batch["doc_id"]
        )
        out = pa.Table.from_arrays(
            [ids, sizes, sniff_kinds(payloads)], schema=MULTIMODAL_META
        )
        if self.with_hash:
            hashes = [
                hashlib.blake2b(p.as_py() or b"", digest_size=8).hexdigest()
                for p in payloads
            ]
            out = out.append_column(
                "content_hash", pa.array(hashes, type=pa.string())
            )
        return out


class FrameSampler:
    """Actor-pool frame-sampling stage for video payloads — codec STUB.

    Real implementation opens the container once per actor (pyav/ffmpeg in
    ``__init__``) and decodes every ``stride``-th frame in ``__call__``.
    Not available here, so with ``fake=True`` the payload is treated as a
    stream of ``frame_bytes``-sized frames and the sampled frames are BYTE
    SLICES — a deterministic law (n_frames = ceil(len/frame_bytes); frame i
    covers [i*fb, min((i+1)*fb, len))) simple enough for the DuckDB oracle
    to reproduce, while the Ray-side plumbing (binary explode, small
    batches, actor signature, output layout) is fully real.
    """

    def __init__(self, fake: bool = False, frame_bytes: int = 64, stride: int = 4):
        if frame_bytes <= 0 or stride <= 0:
            raise ValueError("frame_bytes and stride must be positive")
        self.fake = fake
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video frame decode requires pyav/ffmpeg, not available in "
                "this container; construct FrameSampler(fake=True) for the "
                "deterministic byte-slice stub"
            )
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        ids = batch["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        fb, stride = self.frame_bytes, self.stride
        # Fully vectorized byte-slice sampling: frame boundaries and the
        # gathered value buffer are numpy expressions over the payload
        # column's (offsets, data) view — no per-row Python loop.
        offs, data = _binary_np(payloads)
        lens = offs[1:] - offs[:-1]
        n_frames = (lens + fb - 1) // fb
        counts = (n_frames + stride - 1) // stride  # sampled frames per doc
        total = int(counts.sum())
        doc_pos = np.repeat(np.arange(len(lens), dtype=np.int64), counts)
        first = np.cumsum(counts) - counts
        frame_i = (np.arange(total, dtype=np.int64) - np.repeat(first, counts)) * stride
        fstart = offs[:-1][doc_pos] + frame_i * fb
        fend = np.minimum(fstart + fb, offs[1:][doc_pos])
        flens = fend - fstart
        nbytes = int(flens.sum())
        intra = np.arange(nbytes, dtype=np.int64) - np.repeat(
            np.cumsum(flens) - flens, flens
        )
        vals = data[np.repeat(fstart, flens) + intra]
        out_off = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(flens, out=out_off[1:])
        frames = pa.Array.from_buffers(
            pa.large_binary(),
            total,
            [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(vals.tobytes())],
        ).cast(pa.binary())
        ids_np = ids.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids_np[doc_pos], type=pa.int64()),
                "frame_idx": pa.array(frame_i, type=pa.int64()),
                "frame_payload": frames,
            }
        )


class ImageDecodeStub:
    """Actor-pool decode stage — STUB.

    Real implementation would do ``PIL.Image.open(io.BytesIO(payload))`` /
    resize / to-tensor in ``__call__`` with the transform pipeline built in
    ``__init__``.  Here: raises by default; with ``fake=True`` emits a
    deterministic fake feature vector so the downstream plumbing (schema,
    batch flow, output layout) is exercised end to end in tests.

    Fake law (arithmetic, like FrameSampler's byte-slice law, so a SQL
    oracle can reproduce it): ``features[j] = sum of payload bytes b with
    b % feat_dim == j``.  Bucket sums of a realistic payload stay below
    2^24, so the float32 feature values are exact integers and downstream
    float64 math is bit-reproducible.  Fully vectorized (one bincount over
    the flattened payload bytes).
    """

    def __init__(self, fake: bool = False, feat_dim: int = 8):
        self.fake = fake
        self.feat_dim = feat_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires PIL/cv2, not available in this container; "
                "construct ImageDecodeStub(fake=True) for the deterministic stub"
            )
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        d = self.feat_dim
        offs, data = _binary_np(payloads)
        lens = offs[1:] - offs[:-1]
        parent = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
        data64 = data.astype(np.int64)
        feats = (
            np.bincount(
                parent * d + data64 % d,
                weights=data64,
                minlength=batch.num_rows * d,
            )
            .reshape(batch.num_rows, d)
            .astype(np.float32)
        )
        return pa.Table.from_arrays(
            [
                batch["doc_id"].combine_chunks()
                if isinstance(batch["doc_id"], pa.ChunkedArray)
                else batch["doc_id"],
                pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel()), self.feat_dim
                ),
            ],
            names=["doc_id", "features"],
        )
