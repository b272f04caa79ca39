"""Combined LAST JOIN + window pipeline golden, ported from
cases/query/last_join_window_query.yaml:0 — LAST JOIN (multi-key equi
+ ORDER BY) feeding a ROWS_RANGE window over the joined output."""

import numpy as np
import pytest
import ray.data

from openmldb_ray.joins import last_join
from openmldb_ray.window import Agg, WindowSpec, window_agg


def test_last_join_window_case0(ray_session):
    t1 = ray.data.from_items([
        {"col1": 1, "col2": 5, "col3": 1.1, "col5": 1},
        {"col1": 2, "col2": 5, "col3": 2.2, "col5": 2},
        {"col1": 3, "col2": 55, "col3": 3.3, "col5": 1},
        {"col1": 4, "col2": 55, "col3": 4.4, "col5": 2},
        {"col1": 5, "col2": 55, "col3": 5.5, "col5": 3}])
    t2 = ray.data.from_items([
        {"str1": "EEEEE", "col4": 550.5, "t2col2": 550, "col1": 5, "col5": 3},
        {"str1": "DDDD", "col4": 440.4, "t2col2": 550, "col1": 4, "col5": 2},
        {"str1": "CCC", "col4": 330.3, "t2col2": 550, "col1": 3, "col5": 1},
        {"str1": "BB", "col4": 220.2, "t2col2": 50, "col1": 2, "col5": 2},
        {"str1": "A", "col4": 110.1, "t2col2": 50, "col1": 1, "col5": 1}])
    joined = last_join(t1, t2, on=["col1", "col5"], order_by="col5",
                       payload=["str1", "col4", "t2col2"])
    spec = WindowSpec("col2", "col5", preceding_range=3)
    out = window_agg(joined, spec, [
        Agg("sum", "col1", "w1_col1_sum"),
        Agg("sum", "col3", "w1_col3_sum"),
        Agg("sum", "col4", "w1_t2_col4_sum"),
        Agg("sum", "t2col2", "w1_t2_col2_sum"),
        Agg("sum", "col5", "w1_col5_sum")],
        passthrough=["col1", "col2", "col5", "str1"],
        num_buckets=2).to_pandas().sort_values("col1")
    # expected rows from the YAML case (id column == col1)
    exp = {
        1: (1, 1.1, 110.1, 50, 1, "A"),
        2: (3, 3.3, 330.3, 100, 3, "BB"),
        3: (3, 3.3, 330.3, 550, 1, "CCC"),
        4: (7, 7.7, 770.7, 1100, 3, "DDDD"),
        5: (12, 13.2, 1321.2, 1650, 6, "EEEEE"),
    }
    assert len(out) == 5
    for _, r in out.iterrows():
        e = exp[r["col1"]]
        np.testing.assert_allclose(
            [r["w1_col1_sum"], r["w1_col3_sum"], r["w1_t2_col4_sum"],
             r["w1_t2_col2_sum"], r["w1_col5_sum"]],
            e[:5], rtol=1e-6, err_msg=str(r["col1"]))
        assert r["str1"] == e[5]
