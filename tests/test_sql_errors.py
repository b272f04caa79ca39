"""SQL front-end rejection semantics mirroring the reference's
cases/function/window/error_window.yaml (each test names the YAML id),
plus the newly added scalar / cate-family functions."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from openmldb_ray.sql import sql


@pytest.fixture()
def t(ray_session):
    return {"t": ray.data.from_items([
        {"k": "a", "ts": i, "f": float(i), "s": f"s{i}", "v": float(i)}
        for i in range(5)])}


def test_err0_no_order_by(t):
    with pytest.raises(ValueError):
        sql("SELECT k, sum(v) OVER w AS s FROM t WINDOW w AS "
            "(PARTITION BY k ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)",
            tables=t)


def test_err1_no_partition_by(t):
    with pytest.raises(ValueError):
        sql("SELECT k, sum(v) OVER w AS s FROM t WINDOW w AS "
            "(ORDER BY ts ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)",
            tables=t)


@pytest.mark.parametrize("col", ["s", "f"])  # ids 4-6
def test_err_bad_order_type(t, col):
    with pytest.raises(ValueError, match="ORDER BY"):
        sql(f"SELECT k, sum(v) OVER w AS x FROM t WINDOW w AS "
            f"(PARTITION BY k ORDER BY {col} "
            f"ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)", tables=t)


def test_err8_rows_with_time_unit(t):
    with pytest.raises(ValueError, match="ROWS frame"):
        sql("SELECT k, sum(v) OVER w AS x FROM t WINDOW w AS "
            "(PARTITION BY k ORDER BY ts "
            "ROWS BETWEEN 2s PRECEDING AND CURRENT ROW)", tables=t)


def test_err9_unknown_window(t):
    with pytest.raises(ValueError, match="unknown window"):
        sql("SELECT k, sum(v) OVER w2 AS x FROM t WINDOW w AS "
            "(PARTITION BY k ORDER BY ts "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)", tables=t)


def test_err11_unknown_column(t):
    with pytest.raises((ValueError, KeyError)):
        sql("SELECT k, sum(nope) OVER w AS x FROM t WINDOW w AS "
            "(PARTITION BY k ORDER BY ts "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)", tables=t)


def test_err13_rows_maxsize(t):
    with pytest.raises(ValueError, match="MAXSIZE"):
        sql("SELECT k, sum(v) OVER w AS x FROM t WINDOW w AS "
            "(PARTITION BY k ORDER BY ts "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW MAXSIZE 10)",
            tables=t)


def test_top_n_key_cate_where(ray_session):
    """udfs_8h.md top_n_key_sum_cate_where doc example."""
    from openmldb_ray.window import Agg, WindowSpec, window_agg
    rows = [(0, True, "x"), (1, True, "y"), (2, False, "x"),
            (3, True, "y"), (4, False, "x"), (5, True, "z"),
            (6, True, "z")]
    ds = ray.data.from_items([
        # int-typed values render '%d' in cate strings (float would
        # be '%.6f', function/test_udaf_function.yaml ids 20-24)
        {"k": 1, "ts": i, "v": int(v), "cond": c, "cate": g}
        for i, (v, c, g) in enumerate(rows)])
    spec = WindowSpec("k", "ts", preceding_rows=100)
    out = window_agg(ds, spec, [
        Agg("top_n_key_sum_cate_where", "v", "o", where="cond",
            cate="cate", k=2)], passthrough=["ts"],
        num_buckets=2).to_pandas().sort_values("ts")
    # doc: over the full 7 rows -> top-2 keys desc: z:11,y:4
    assert out["o"].iloc[-1] == "z:11,y:4"


def test_new_scalar_functions(ray_session):
    from openmldb_ray.functions import scalar as F
    a = pa.array([65, 97, None])
    assert F.char_(a).to_pylist() == ["A", "a", None]
    assert F.inc(pa.array([1, 2])).to_pylist() == [2, 3]
    assert F.maximum(pa.array([1, 5]), pa.array([3, 2])).to_pylist() \
        == [3, 5]
    assert F.minimum(pa.array([1, 5]), pa.array([3, 2])).to_pylist() \
        == [1, 2]
    assert F.bool_(pa.array([0, 1])).to_pylist() == [False, True]
    assert F.int16(pa.array([1.0, 2.0])).to_pylist() == [1, 2]
    st = F.make_tuple(pa.array([1]), pa.array(["a"]))
    assert st.to_pylist() == [{"f0": 1, "f1": "a"}]
    assert "char" in F.REGISTRY and "abs" in F.REGISTRY
    # fz aliases route through the kernel
    from openmldb_ray.window.spec import AGG_FUNCS
    assert "fz_top1_ratio" in AGG_FUNCS
