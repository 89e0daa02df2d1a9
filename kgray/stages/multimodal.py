"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this container,
so the DECODE KERNELS are stubs (deterministic fakes by default, or
``NotImplementedError`` in strict mode) — but everything Ray-side is
real and tested: schema (binary payload + metadata columns), actor-pool
stage shape, small batch sizes for large payloads, and Arrow-native
output layout (fixed-size-list feature vectors). Swapping a real
decoder in means replacing ``_fake_*`` bodies only.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Optional

import numpy as np
import pyarrow as pa


def _fake_decode_meta(payload: bytes) -> tuple:
    """Deterministic stand-in for an image decode: (width, height, mode)."""
    crc = zlib.crc32(payload or b"")
    return (64 + crc % 1024, 64 + (crc >> 10) % 1024, "RGB")


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a CNN/CLIP embedding: bytes → R^dim."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "little") % (1 << 32)
    rng = np.random.RandomState(seed)
    v = rng.randn(dim).astype(np.float32)
    return v / max(np.linalg.norm(v), 1e-12)


class ImageDecode:
    """Actor-pool stage: binary column → (width, height, mode) metadata.

    ``strict=True`` raises NotImplementedError (no real decoder in this
    environment); the default deterministic fake keeps the pipeline
    shape testable end-to-end.
    """

    def __init__(self, payload_col: str = "payload", strict: bool = False):
        self.payload_col = payload_col
        self.strict = strict

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "Real image decoding requires an image library not present in "
                "this environment; run with strict=False for the deterministic stub."
            )
        w, h, m = [], [], []
        for payload in t.column(self.payload_col).to_pylist():
            wi, hi, mo = _fake_decode_meta(payload)
            w.append(wi)
            h.append(hi)
            m.append(mo)
        t = t.append_column("width", pa.array(w, type=pa.int32()))
        t = t.append_column("height", pa.array(h, type=pa.int32()))
        return t.append_column("mode", pa.array(m, type=pa.string()))


class FeatureExtract:
    """Actor-pool stage: binary column → fixed-size-list<float32> feature
    vector. In production this is the model-inference stage (weights
    loaded once per actor in __init__); here the model is the
    deterministic fake above."""

    def __init__(self, payload_col: str = "payload", dim: int = 64, out_col: str = "features"):
        self.payload_col, self.dim, self.out_col = payload_col, dim, out_col

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = np.stack(
            [_fake_features(p, self.dim) for p in t.column(self.payload_col).to_pylist()]
        )
        arr = pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel(), type=pa.float32()), self.dim)
        return t.append_column(self.out_col, arr)


class FrameSample:
    """Actor-pool stage: treat the payload as a frame container and emit
    one row per sampled "frame" (every ``stride``-th 4 KiB chunk) with
    (frame_index, frame_bytes). Real video decoders slot in here; the
    explode-shaped output (flat_map semantics inside map_batches) is
    the part worth testing."""

    def __init__(self, payload_col: str = "payload", id_col: str = "url", stride: int = 4, chunk: int = 4096):
        self.payload_col, self.id_col = payload_col, id_col
        self.stride, self.chunk = stride, chunk

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for rid, payload in zip(t.column(self.id_col).to_pylist(), t.column(self.payload_col).to_pylist()):
            payload = payload or b""
            n_chunks = max(1, (len(payload) + self.chunk - 1) // self.chunk)
            for fi in range(0, n_chunks, self.stride):
                ids.append(rid)
                idxs.append(fi)
                frames.append(payload[fi * self.chunk : (fi + 1) * self.chunk])
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "frame_index": pa.array(idxs, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )
