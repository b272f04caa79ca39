"""Smaller coverage: multi-secondary WINDOW UNION, multimodal frame
sampling, spec validation errors, catalog-free select_into."""

import numpy as np
import pytest
import ray.data

from openmldb_ray.window import Agg, WindowSpec, window_agg
from openmldb_ray.window.spec import WindowSpec as WS


def test_window_union_multiple_secondaries(ray_session):
    prim = ray.data.from_items([{"k": "a", "ts": 30, "v": 1.0}])
    sec1 = ray.data.from_items([{"k": "a", "ts": 10, "v": 10.0}])
    sec2 = ray.data.from_items([{"k": "a", "ts": 20, "v": 100.0}])
    spec = WindowSpec("k", "ts", preceding_range=100)
    out = window_agg(prim, spec, [Agg("sum", "v", "s")],
                     union_ds=[sec1, sec2], passthrough=["k", "ts"],
                     num_buckets=2).to_pandas()
    assert len(out) == 1           # only the primary row emits
    assert out["s"].iloc[0] == 111.0


def test_frame_sample_deterministic(ray_session):
    from openmldb_ray.ops.multimodal import frame_sample
    ds = ray.data.from_items(
        [{"media_id": f"m{i}", "payload": b"x"} for i in range(200)])
    a = frame_sample(ds, every_n=10).to_pandas()
    b = frame_sample(ds, every_n=10).to_pandas()
    assert sorted(a["media_id"]) == sorted(b["media_id"])
    assert 0 < len(a) < 200


def test_multimodal_strict_decoder_raises(ray_session):
    import pyarrow as pa

    from openmldb_ray.ops.multimodal import StrictDecoder
    with pytest.raises(NotImplementedError):
        StrictDecoder()(pa.table({"payload": [b"x"]}))


def test_spec_validation_errors():
    with pytest.raises(ValueError):
        WS("k", "ts")  # no frame
    with pytest.raises(ValueError):
        WS("k", "ts", preceding_rows=-1)
    with pytest.raises(ValueError):
        WS("k", "ts", preceding_rows=2, end_offset_rows=1,
           end_offset_range=1)
    from openmldb_ray.window.spec import Agg as A
    with pytest.raises(ValueError):
        A("sum_where", "v", "s")   # missing where=
    with pytest.raises(ValueError):
        A("sum_cate", "v", "s")    # missing cate=
    with pytest.raises(ValueError):
        A("nope", "v", "s")


# -------------------------------------------------------- header kernel

# canonical 1x1 RGBA PNG (independent golden bytes, not from synth)
_ONE_PX_PNG = bytes.fromhex(
    "89504e470d0a1a0a0000000d4948445200000001000000010806000000"
    "1f15c4890000000d49444154789c626000000000ffff0300000600055"
    "7bfabd40000000049454e44ae426082")


def test_header_parse_goldens():
    import struct

    from openmldb_ray.ops.multimodal import parse_media_header
    m = parse_media_header(_ONE_PX_PNG)
    assert (m["media_type"], m["width"], m["height"]) == ("image/png", 1, 1)
    gif = (b"GIF89a" + (320).to_bytes(2, "little")
           + (200).to_bytes(2, "little") + b"\x00" * 20)
    m = parse_media_header(gif)
    assert (m["media_type"], m["width"], m["height"]) == (
        "image/gif", 320, 200)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 640, -480) + b"\x00" * 8
    m = parse_media_header(bmp)
    assert (m["width"], m["height"]) == (640, 480)  # top-down negative h
    for junk in (b"", b"junkjunkjunk", None, b"\xff\xd8\xff"):
        assert parse_media_header(junk)["media_type"] in (
            "application/octet-stream", "image/jpeg")


def test_header_parse_wav_stdlib_crosscheck():
    """The WAV branch must agree with a file produced by the stdlib
    wave writer (fully independent byte layout)."""
    import io
    import wave

    from openmldb_ray.ops.multimodal import parse_media_header
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(44100)
    w.writeframes(b"\x00" * (44100 * 2 * 2))   # exactly 1 s
    w.close()
    m = parse_media_header(buf.getvalue())
    assert m["media_type"] == "audio/wav"
    assert m["channels"] == 2 and m["sample_rate"] == 44100
    assert abs(m["duration_ms"] - 1000.0) < 1e-6


def test_header_synth_roundtrip():
    from openmldb_ray.ops.multimodal import parse_media_header, synth_payload
    for d in range(300):
        m = parse_media_header(synth_payload(d))
        if d % 3 == 0:
            assert (m["width"], m["height"]) == (d % 61 + 1, d % 37 + 1)
        elif d % 3 == 1:
            assert m["sample_rate"] == 8000 * (d % 4 + 1)
            assert m["channels"] == d % 2 + 1
            exp = (d % 500 + 1) * 1000.0 / (8000 * (d % 4 + 1))
            assert abs(m["duration_ms"] - exp) < 1e-9
        else:
            assert (m["width"], m["height"]) == (d % 127 + 1, d % 83 + 1)


def test_header_decode_stage(ray_session):
    import ray.data

    from openmldb_ray.ops.multimodal import (HeaderDecoder, SynthMedia,
                                             decode_stage)
    docs = ray.data.range(120).map_batches(
        lambda b: {"doc_id": b["id"]}, batch_format="numpy")
    media = docs.map_batches(SynthMedia, batch_format="pyarrow",
                             concurrency=2)
    out = decode_stage(media, decoder_cls=HeaderDecoder,
                       batch_size=32, concurrency=2).to_pandas()
    assert len(out) == 120
    assert set(out["media_type"]) == {"image/png", "audio/wav",
                                      "image/jpeg"}
    png = out[out["media_type"] == "image/png"]
    assert (png["payload_bytes"]
            == png["height"] * (png["width"] + 1) + 68).all()
