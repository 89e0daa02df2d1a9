"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this container,
so the DEFAULT decode kernels are stubs (deterministic fakes, or
``NotImplementedError`` in strict mode) — but everything Ray-side is
real and tested: schema (binary payload + metadata columns), actor-pool
stage shape, small batch sizes for large payloads, and Arrow-native
output layout (fixed-size-list feature vectors).

Every stage also accepts a USER-SUPPLIED kernel callable
(``decoder=`` / ``featurizer=`` / ``sampler=``), making the stages
production-usable outside the sandbox without code changes — pass
:func:`pillow_decoder` (built lazily from PIL when installed) or any
model-inference function. The callable is held on the ACTOR (built
once in ``__init__``), so per-actor model loads stay one-time.
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


def pillow_decoder():
    """A real image decoder built on Pillow — available when PIL is
    installed (it is NOT in this sandbox; the import-try keeps the
    factory harmless here). Returns ``bytes → (width, height, mode)``.
    """
    import io

    from PIL import Image  # noqa: F401 — ImportError is the contract

    def _decode(payload: bytes) -> tuple:
        with Image.open(io.BytesIO(payload)) as im:
            return (im.width, im.height, im.mode)

    return _decode


class ImageDecode:
    """Actor-pool stage: binary column → (width, height, mode) metadata.

    ``decoder`` is any ``bytes → (width, height, mode)`` callable (e.g.
    :func:`pillow_decoder`); with none supplied, ``strict=True`` raises
    NotImplementedError (no image library in this environment) and the
    default deterministic fake keeps the pipeline shape testable
    end-to-end.
    """

    def __init__(self, payload_col: str = "payload", strict: bool = False,
                 decoder=None):
        self.payload_col = payload_col
        self.strict = strict
        self.decoder = decoder

    def __call__(self, t: pa.Table) -> pa.Table:
        decode = self.decoder
        if decode is None:
            if self.strict:
                raise NotImplementedError(
                    "Real image decoding requires an image library not present "
                    "in this environment; pass decoder= (e.g. pillow_decoder()) "
                    "or strict=False for the deterministic stub."
                )
            decode = _fake_decode_meta
        w, h, m = [], [], []
        for payload in t.column(self.payload_col).to_pylist():
            wi, hi, mo = decode(payload)
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

    def __init__(self, payload_col: str = "payload", dim: int = 64,
                 out_col: str = "features", featurizer=None):
        self.payload_col, self.dim, self.out_col = payload_col, dim, out_col
        # Held on the actor: a real model callable loads once per actor.
        self.featurizer = featurizer or (lambda p: _fake_features(p, dim))

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = np.stack(
            [np.asarray(self.featurizer(p), dtype=np.float32)
             for p in t.column(self.payload_col).to_pylist()]
        )
        if feats.shape[1] != self.dim:
            raise ValueError(
                f"featurizer returned dim {feats.shape[1]}, expected {self.dim}")
        arr = pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel(), type=pa.float32()), self.dim)
        return t.append_column(self.out_col, arr)


class FrameSample:
    """Actor-pool stage: treat the payload as a frame container and emit
    one row per sampled "frame" (every ``stride``-th 4 KiB chunk) with
    (frame_index, frame_bytes). Real video decoders slot in here; the
    explode-shaped output (flat_map semantics inside map_batches) is
    the part worth testing."""

    def __init__(self, payload_col: str = "payload", id_col: str = "url",
                 stride: int = 4, chunk: int = 4096, sampler=None):
        self.payload_col, self.id_col = payload_col, id_col
        self.stride, self.chunk = stride, chunk
        # sampler: bytes -> iterable of (frame_index, frame_bytes);
        # a real video decoder (pyav/ffmpeg) slots in here.
        self.sampler = sampler

    def _default_sample(self, payload: bytes):
        n_chunks = max(1, (len(payload) + self.chunk - 1) // self.chunk)
        for fi in range(0, n_chunks, self.stride):
            yield fi, payload[fi * self.chunk: (fi + 1) * self.chunk]

    def __call__(self, t: pa.Table) -> pa.Table:
        sample = self.sampler or self._default_sample
        ids, idxs, frames = [], [], []
        for rid, payload in zip(t.column(self.id_col).to_pylist(), t.column(self.payload_col).to_pylist()):
            payload = payload or b""
            for fi, fb in sample(payload):
                ids.append(rid)
                idxs.append(fi)
                frames.append(fb)
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "frame_index": pa.array(idxs, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )
