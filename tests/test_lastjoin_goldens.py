"""LAST JOIN goldens ported from the reference YAML corpus
(cases/function/join/test_lastjoin_simple.yaml — case ids noted)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from openmldb_ray.joins import last_join


@pytest.fixture(params=["broadcast", "shuffle"])
def bcast(request):
    return request.param == "broadcast"


def _left():
    return ray.data.from_items([
        {"c1": "aa", "c2": 2, "lc4": 1590738989000},
        {"c1": "bb", "c2": 21, "lc4": 1590738990000},
        {"c1": "cc", "c2": 41, "lc4": 1590738991000}])


def test_lastjoin_simple_case1(ray_session, bcast):
    """id 1: ORDER BY c3, unique matches."""
    right = ray.data.from_items([
        {"c1": "aa", "c3": 13, "c4": 1590738989000},
        {"c1": "bb", "c3": 131, "c4": 1590738990000},
        {"c1": "cc", "c3": 151, "c4": 1590738992000}])
    out = last_join(_left(), right, on="c1", order_by="c3",
                    payload=["c3", "c4"], broadcast=bcast,
                    num_buckets=2).to_pandas().sort_values("c1")
    assert out["c3"].tolist() == [13, 131, 151]
    assert out["c4"].tolist() == [1590738989000, 1590738990000,
                                  1590738992000]


def test_lastjoin_simple_case2_unmatched_null(ray_session, bcast):
    """id 2: unmatched left key 'cc' -> right-side NULLs."""
    right = ray.data.from_items([
        {"c1": "aa", "c3": 13, "c4": 1590738989000},
        {"c1": "bb", "c3": 131, "c4": 1590738990000},
        {"c1": "dd", "c3": 151, "c4": 1590738991000}])
    out = last_join(_left(), right, on="c1", order_by="c3",
                    payload=["c3", "c4"], broadcast=bcast,
                    num_buckets=2).to_pandas().sort_values("c1")
    assert out["c3"].tolist()[:2] == [13, 131]
    assert pd.isna(out["c3"].tolist()[2])
    assert pd.isna(out["c4"].tolist()[2])


def test_lastjoin_simple_case3_multimatch_argmax(ray_session, bcast):
    """id 3: multiple 'bb' matches -> the max-c3 row (131) wins."""
    left = ray.data.from_items([
        {"c1": "aa", "c2": 2}, {"c1": "bb", "c2": 21}])
    right = ray.data.from_items([
        {"c1": "aa", "c3": 13, "c4": 1590738989000},
        {"c1": "bb", "c3": 131, "c4": 1590738990000},
        {"c1": "bb", "c3": 121, "c4": 1590738991000}])
    out = last_join(left, right, on="c1", order_by="c3",
                    payload=["c3", "c4"], broadcast=bcast,
                    num_buckets=2).to_pandas().sort_values("c1")
    assert out["c3"].tolist() == [13, 131]
    assert out["c4"].tolist() == [1590738989000, 1590738990000]


def test_lastjoin_simple_case4_no_orderby(ray_session):
    """id 4-1: no ORDER BY -> first right row in storage order;
    unmatched 'dd' -> NULLs."""
    left = ray.data.from_items([
        {"c1": "aa", "c2": 2}, {"c1": "bb", "c2": 21},
        {"c1": "dd", "c2": 41}])
    right = ray.data.from_items([
        {"c1": "aa", "c3": 13}, {"c1": "bb", "c3": 131},
        {"c1": "cc", "c3": 121}])
    out = last_join(left, right, on="c1", payload=["c3"],
                    broadcast=True).to_pandas().sort_values("c1")
    assert out["c3"].tolist()[:2] == [13, 131]
    assert pd.isna(out["c3"].tolist()[2])
