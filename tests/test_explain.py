"""EXPLAIN surface: textual logical plans (reference CLI `explain
SELECT ...`, cases/plan/cmd.yaml ids 7-8; graphviz dump
SparkPlanner.scala:95-98)."""

import pytest


def test_explain_window_join():
    from openmldb_ray.sql import explain
    txt = explain(
        "SELECT e.event_id, sum(e.value) OVER w AS s FROM events e "
        "LAST JOIN orders o ORDER BY o.o_orderdate "
        "ON e.user_id = o.o_custkey "
        "WINDOW w AS (PARTITION BY e.user_id ORDER BY e.ts "
        "ROWS_RANGE BETWEEN 10s PRECEDING AND CURRENT ROW MAXSIZE 5) "
        "LIMIT 10")
    assert "SCAN events" in txt
    assert "LAST JOIN orders ORDER BY o_orderdate" in txt
    assert "WINDOW AGG" in txt and "hash-shuffle by (user_id)" in txt
    assert "ROWS_RANGE BETWEEN" in txt and "MAXSIZE 5" in txt
    assert "LIMIT 10" in txt


def test_explain_group_union():
    from openmldb_ray.sql import explain
    txt = explain("select a, sum(b) as s from t1 group by a "
                  "union all select a, sum(b) as s from t2 group by a")
    assert txt.count("GROUP AGG [partial combine -> shuffle]") == 2
    assert "UNION ALL:" in txt


def test_explain_statement_in_session(ray_session):
    from openmldb_ray.sql.script import SqlSession
    s = SqlSession({})
    s.execute("create table t (a int, b bigint)")
    out = s.execute("explain SELECT a, count(*) AS n FROM t GROUP BY a;")
    lines = out.to_pandas()["plan"].tolist()
    assert any("SCAN t" in ln for ln in lines)
    assert any("GROUP AGG" in ln for ln in lines)


def test_explain_cmd_yaml_forms():
    """cmd.yaml ids 7-8: explain / explain logical forms parse."""
    from openmldb_ray.sql import explain
    for q in ("SELECT * FROM t1 WHERE COL1 > 10",):
        assert "SCAN t1" in explain(q)
