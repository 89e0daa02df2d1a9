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
