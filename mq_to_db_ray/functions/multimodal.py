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
        ("content_hash", pa.string()),
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


class PayloadMeta:
    """Actor-pool stage: binary payload -> typed metadata row (real)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        sizes = pa.compute.binary_length(payloads).cast(pa.int64())
        hashes = []
        kinds = []
        for p in payloads:
            b = p.as_py() or b""
            hashes.append(hashlib.blake2b(b, digest_size=8).hexdigest())
            kinds.append(sniff_kind(b))
        return pa.Table.from_arrays(
            [
                batch["doc_id"].combine_chunks()
                if isinstance(batch["doc_id"], pa.ChunkedArray)
                else batch["doc_id"],
                sizes,
                pa.array(hashes, type=pa.string()),
                pa.array(kinds, type=pa.string()),
            ],
            schema=MULTIMODAL_META,
        )


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
        fb = self.frame_bytes
        out_id, out_idx, out_frame = [], [], []
        for did, p in zip(ids.to_pylist(), payloads):
            b = p.as_py() or b""
            n_frames = (len(b) + fb - 1) // fb
            for i in range(0, n_frames, self.stride):
                out_id.append(did)
                out_idx.append(i)
                out_frame.append(b[i * fb : (i + 1) * fb])
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_idx, type=pa.int64()),
                "frame_payload": pa.array(out_frame, type=pa.binary()),
            }
        )


class ImageDecodeStub:
    """Actor-pool decode stage — STUB.

    Real implementation would do ``PIL.Image.open(io.BytesIO(payload))`` /
    resize / to-tensor in ``__call__`` with the transform pipeline built in
    ``__init__``.  Here: raises by default; with ``fake=True`` emits a
    deterministic fake feature vector so the downstream plumbing (schema,
    batch flow, output layout) is exercised end to end in tests.
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
        feats = np.zeros((batch.num_rows, self.feat_dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            b = p.as_py() or b""
            h = hashlib.blake2b(b, digest_size=self.feat_dim * 4).digest()
            feats[i] = np.frombuffer(h, dtype=np.uint32).astype(np.float32) / 2**32
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
