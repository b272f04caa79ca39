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
