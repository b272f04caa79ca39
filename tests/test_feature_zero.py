"""FeatureZero string ops: scalar semantics (reference doc examples)
and window forms through the Dataset runner."""

import pytest
import ray.data

from openmldb_ray.functions.feature_zero import (fz_join, fz_split,
                                                 fz_split_by_key,
                                                 fz_split_by_value)
from openmldb_ray.window import Agg, WindowSpec, window_agg


def test_scalar_semantics():
    # doc example feature_zero_def.cc:643-645
    assert fz_join(fz_split("k1:v1,k2:v2", ","), " ") == "k1:v1 k2:v2"
    assert fz_split(None, ",") == []
    assert fz_split_by_key("k1:v1,k2:v2,bad", ",", ":") == ["k1", "k2"]
    assert fz_split_by_value("k1:v1,k2:v2,bad", ",", ":") == ["v1", "v2"]
    assert fz_join(["a", None, "b"], "-") == "a-b"


def test_window_forms(ray_session):
    ds = ray.data.from_items([
        {"k": "a", "ts": 1, "s": "x:1,y:2"},
        {"k": "a", "ts": 2, "s": "z:3"},
        {"k": "a", "ts": 3, "s": None}])
    spec = WindowSpec("k", "ts", preceding_rows=2)
    out = window_agg(ds, spec, [
        Agg("fz_window_split", "s", "parts", params=(",",)),
        Agg("fz_window_split_by_key", "s", "keys", params=(",", ":")),
        Agg("fz_window_split_by_value", "s", "vals", params=(",", ":")),
        Agg("fz_join", "s", "joined", params=("|",))],
        passthrough=["k", "ts"], num_buckets=2).to_pandas() \
        .sort_values("ts")
    # frame iterates NEWEST-first (reference window order:
    # test_feature_zero_function.yaml id 1 expects
    # "k3:v3 k1:v1 k2:v2" on the second row)
    assert list(out["parts"].iloc[1]) == ["z:3", "x:1", "y:2"]
    assert list(out["keys"].iloc[1]) == ["z", "x", "y"]
    assert list(out["vals"].iloc[2]) == ["3", "1", "2"]  # null row skipped
    assert out["joined"].iloc[1] == "z:3|x:1,y:2"
