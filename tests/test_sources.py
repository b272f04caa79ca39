"""LOAD DATA / SELECT INTO round-trips (csv + parquet, deep/soft)."""

import os

import pytest
import ray.data

from openmldb_ray.sources import Catalog, load_data, select_into
from openmldb_ray.sources.load_data import load_data_into


def test_csv_roundtrip(ray_session, tmp_path):
    ds = ray.data.from_items(
        [{"a": i, "b": f"s{i}" if i % 3 else None} for i in range(50)])
    out = str(tmp_path / "csv_out")
    select_into(ds, out, fmt="csv")
    back = load_data(out, fmt="csv").to_pandas().sort_values("a")
    assert len(back) == 50
    assert back["b"].isna().sum() == ds.to_pandas()["b"].isna().sum()


def test_load_data_deep_and_soft(ray_session, tmp_path):
    src = ray.data.from_items([{"x": i, "y": i * 2.0} for i in range(20)])
    csv_dir = str(tmp_path / "src_csv")
    select_into(src, csv_dir, fmt="csv")
    cat = Catalog(str(tmp_path / "cat"))
    deep = load_data_into(cat, "t_deep", csv_dir, fmt="csv", deep_copy=True)
    assert deep.count() == 20
    assert cat.tables["t_deep"]["format"] == "parquet"
    soft = load_data_into(cat, "t_soft", csv_dir, fmt="csv", deep_copy=False)
    assert soft.count() == 20
    assert cat.tables["t_soft"]["mode"] == "soft"
    # catalog round-trip
    cat2 = Catalog(str(tmp_path / "cat"))
    assert cat2.read("t_deep").count() == 20


def test_bad_format_rejected(ray_session):
    with pytest.raises(ValueError):
        load_data("/tmp/x", fmt="json")
