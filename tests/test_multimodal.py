import pyarrow as pa
import pytest
import ray.data

from kgray.stages.multimodal import FeatureExtract, FrameSample, ImageDecode


def _payloads():
    return pa.table(
        {
            "url": pa.array(["u1", "u2", "u3"]),
            "payload": pa.array([b"\x89PNG" * 100, b"\xff\xd8JPEG" * 5000, b""], type=pa.binary()),
        }
    )


def test_image_decode_stub_deterministic(ray_session):
    ds = ray.data.from_arrow(_payloads())
    out1 = ds.map_batches(ImageDecode, batch_format="pyarrow", concurrency=1, batch_size=2).take_all()
    out2 = ds.map_batches(ImageDecode, batch_format="pyarrow", concurrency=1, batch_size=2).take_all()
    assert [(r["width"], r["height"], r["mode"]) for r in out1] == [
        (r["width"], r["height"], r["mode"]) for r in out2
    ]


def test_image_decode_strict_raises():
    dec = ImageDecode(strict=True)
    with pytest.raises(NotImplementedError):
        dec(_payloads())


def test_feature_extract_layout(ray_session):
    ds = ray.data.from_arrow(_payloads())
    out = ds.map_batches(
        FeatureExtract, fn_constructor_kwargs={"dim": 16}, batch_format="pyarrow", concurrency=1
    ).take_all()
    assert all(len(r["features"]) == 16 for r in out)


def test_frame_sample_explodes(ray_session):
    ds = ray.data.from_arrow(_payloads())
    out = ds.map_batches(
        FrameSample, fn_constructor_kwargs={"stride": 2, "chunk": 4096}, batch_format="pyarrow", concurrency=1
    ).take_all()
    u2 = [r for r in out if r["url"] == "u2"]
    assert len(u2) >= 3  # 30k bytes → 8 chunks → stride 2 → 4 frames
    assert all(isinstance(r["frame"], bytes) for r in out)


def test_image_decode_injected_real_decoder(ray_session):
    """A user-supplied decode callable replaces the stub — here a tiny
    REAL parser for a 12-byte header format (stands in for Pillow,
    which is not in this container)."""
    import struct

    def mk(w, h, mode):
        return struct.pack("<II4s", w, h, mode.encode().ljust(4)) + b"pixels"

    def real_decoder(payload):
        w, h, m = struct.unpack_from("<II4s", payload)
        return (w, h, m.rstrip(b"\x00 ").decode())

    t = pa.table({
        "url": pa.array(["a", "b"]),
        "payload": pa.array([mk(640, 480, "RGB"), mk(32, 16, "L")],
                            type=pa.binary()),
    })
    out = (ray.data.from_arrow(t)
           .map_batches(ImageDecode,
                        fn_constructor_kwargs={"decoder": real_decoder},
                        batch_format="pyarrow", concurrency=1)
           .take_all())
    got = {r["url"]: (r["width"], r["height"], r["mode"]) for r in out}
    assert got == {"a": (640, 480, "RGB"), "b": (32, 16, "L")}


def test_pillow_decoder_factory_gated():
    """pillow_decoder raises ImportError here (no PIL) — and would
    return a real callable where Pillow is installed."""
    from kgray.stages.multimodal import pillow_decoder
    try:
        dec = pillow_decoder()
    except ImportError:
        return  # expected in this sandbox
    assert callable(dec)


def test_feature_extract_injected_featurizer(ray_session):
    import numpy as np

    def real_featurizer(payload):
        # e.g. a trivial byte-histogram "model"
        h = np.bincount(np.frombuffer(payload or b"\x00", np.uint8) % 8,
                        minlength=8).astype(np.float32)
        return h / max(np.linalg.norm(h), 1e-12)

    ds = ray.data.from_arrow(_payloads())
    out = ds.map_batches(
        FeatureExtract,
        fn_constructor_kwargs={"dim": 8, "featurizer": real_featurizer},
        batch_format="pyarrow", concurrency=1).take_all()
    assert all(len(r["features"]) == 8 for r in out)
    assert all(abs(float(np.linalg.norm(r["features"])) - 1.0) < 1e-5
               for r in out)


def test_frame_sample_injected_sampler(ray_session):
    def every_byte_pairs(payload):
        for i in range(0, min(len(payload), 6), 2):
            yield i // 2, payload[i:i + 2]

    ds = ray.data.from_arrow(_payloads())
    out = ds.map_batches(
        FrameSample, fn_constructor_kwargs={"sampler": every_byte_pairs},
        batch_format="pyarrow", concurrency=1).take_all()
    assert all(len(r["frame"]) <= 2 for r in out)
    assert {r["frame_index"] for r in out} <= {0, 1, 2}


def test_image_decode_pillow_real_kernel(ray_session):
    """Runs the REAL pillow decode path end-to-end through the
    actor-pool stage wherever Pillow is installed; SKIPPED (not failed)
    in environments without it. Generates genuine PNG/BMP payloads with
    PIL itself so the test is self-contained."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    from kgray.stages.multimodal import pillow_decoder

    def png_bytes(w, h, mode):
        buf = io.BytesIO()
        Image.new(mode, (w, h)).save(buf, format="PNG")
        return buf.getvalue()

    t = pa.table({
        "url": pa.array(["a", "b"]),
        "payload": pa.array([png_bytes(17, 9, "RGB"), png_bytes(4, 30, "L")],
                            type=pa.binary()),
    })
    out = (ray.data.from_arrow(t)
           .map_batches(ImageDecode,
                        fn_constructor_kwargs={"decoder": pillow_decoder()},
                        batch_format="pyarrow", concurrency=1)
           .take_all())
    got = {r["url"]: (r["width"], r["height"], r["mode"]) for r in out}
    assert got == {"a": (17, 9, "RGB"), "b": (4, 30, "L")}
