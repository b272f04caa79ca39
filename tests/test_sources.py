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


def test_stream_ingest_equals_bulk_load(ray_session, tmp_path):
    """N micro-batch ingests == one bulk load: same windowed result,
    monotone watermark, crash-leftover .tmp invisible."""
    import json
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data

    from openmldb_ray.sources.load_data import Catalog, StreamIngestor
    from openmldb_ray.window import Agg, WindowSpec, window_agg

    rng = np.random.default_rng(31)
    n = 3000
    full = pa.table({
        "k": pa.array([f"u{i}" for i in rng.integers(0, 5, n)]),
        "ts": pa.array(np.sort(rng.integers(0, 1_000_000, n))
                       .astype("int64")),
        "v": pa.array(rng.integers(0, 100, n).astype("float64")),
    })
    cat = Catalog(str(tmp_path / "cat"))
    ing = StreamIngestor(cat, "ev", ts_col="ts")
    wms = []
    for lo in range(0, n, 1000):          # 3 micro-batches, time-ordered
        ing.ingest(ray.data.from_arrow(full.slice(lo, 1000)))
        wms.append(ing.watermark())
    assert wms == sorted(wms)             # watermark is monotone
    assert int(wms[-1]) == int(full["ts"][n - 1].as_py())

    # a crashed half-batch must stay invisible
    os.makedirs(str(tmp_path / "cat/offline/ev/batch_000099.tmp"))

    spec = WindowSpec("k", "ts", preceding_rows=10)
    aggs = [Agg("sum", "v", "s"), Agg("count", None, "c")]

    def run(ds):
        out = window_agg(ds, spec, aggs, passthrough=["k", "ts"],
                         num_buckets=4).to_pandas()
        return out.sort_values(["k", "ts", "s"]).reset_index(drop=True)

    got = run(ing.dataset())
    exp = run(ray.data.from_arrow(full))
    import pandas.testing as pt
    pt.assert_frame_equal(got, exp)

    # manifest doubles as lineage: 3 committed batches, 1000 rows each
    with open(str(tmp_path / "cat/offline/ev/stream.jsonl")) as fh:
        entries = [json.loads(x) for x in fh]
    assert [e["rows"] for e in entries] == [1000, 1000, 1000]
    # catalog round-trip reads the stream table too
    assert cat.read("ev").count() == n


def test_stream_ingest_recovers_orphaned_commit(ray_session, tmp_path):
    """A crash between the dir rename (data commit) and the manifest
    append must be healed on the next access — not lost, not seq-
    colliding."""
    import json
    import os

    import pyarrow as pa
    import ray.data

    from openmldb_ray.sources.load_data import Catalog, StreamIngestor
    cat = Catalog(str(tmp_path / "cat"))
    ing = StreamIngestor(cat, "ev", ts_col="ts")
    t = pa.table({"k": ["a"] * 10, "ts": pa.array(range(10), pa.int64()),
                  "v": pa.array([float(i) for i in range(10)])})
    ing.ingest(ray.data.from_arrow(t))

    # simulate the crash: commit batch 1's data dir, no manifest line
    t2 = pa.table({"k": ["a"] * 5, "ts": pa.array(range(10, 15),
                                                  pa.int64()),
                   "v": pa.array([1.0] * 5)})
    orphan = str(tmp_path / "cat/offline/ev/batch_000001")
    ray.data.from_arrow(t2).write_parquet(orphan)

    # next ingest reconciles the orphan AND takes seq=2 (no collision)
    t3 = pa.table({"k": ["a"] * 3, "ts": pa.array(range(15, 18),
                                                  pa.int64()),
                   "v": pa.array([2.0] * 3)})
    e3 = ing.ingest(ray.data.from_arrow(t3))
    assert e3["seq"] == 2
    entries = ing._batches()
    assert [e["seq"] for e in entries] == [0, 1, 2]
    assert any(e.get("recovered") for e in entries)
    assert ing.dataset().count() == 18
    assert int(ing.watermark()) == 17
