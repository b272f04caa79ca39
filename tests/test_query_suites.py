"""Reference batch-query suites (cases/query/*.yaml) through sql().

These are the reference's engine-level query tests (run by
hybridse/src/testing against the same YAML): GROUP BY / HAVING over
unindexed keys, const projections without FROM, IN/LIKE three-valued
logic, LAST JOIN with window, resource-file inputs.

Skipped classes (the reference's own runner also skips them):
- ``%%fun`` embedded-script UDFs (a scripting engine, out of scope);
- cases tagged TODO (e.g. ``&&``/``||`` logical ops are
  zetasql-unsupport: the reference's current parser rejects them too —
  ``||`` is string concat there, as here).
"""

import pytest

from openmldb_ray.testing.yaml_cases import (check_case, expand_case,
                                             is_batch_unsupported,
                                             load_cases, run_case)

Q = "/root/reference/cases/query"


def _params(path, ids):
    return [pytest.param(path, i, id=f"{path.rsplit('/', 1)[-1]}:{i}")
            for i in ids]


def _check(path, cid, ray_session):
    cases = load_cases(path)
    if cid not in cases:
        pytest.skip("case id absent in this reference checkout")
    case = cases[cid]
    if "%%fun" in case.get("sql", ""):
        pytest.skip("embedded-script UDF (%%fun): scripting engine "
                    "out of scope")
    if "TODO" in (case.get("tags") or ()):
        pytest.skip("case tagged TODO in the reference")
    if is_batch_unsupported(case):
        pytest.skip(f"reference mode {case.get('mode')!r}")
    for label, sub in expand_case(case):
        expect = sub.get("expect", {}) or {}
        try:
            if expect.get("success") is False:
                with pytest.raises(Exception):
                    run_case(sub)
            else:
                check_case(sub)
        except Exception as e:
            raise AssertionError(
                f"[{cid}{' ' + label if label else ''}] "
                f"{type(e).__name__}: {e}") from e


@pytest.mark.parametrize("path,cid",
                         _params(f"{Q}/group_query.yaml",
                                 [1, "2-1", "2-2", "2-3", 3, 4]))
def test_group_query(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{Q}/having_query.yaml",
                                 list(range(1, 7))))
def test_having_query(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{Q}/where_group_query.yaml",
                                 [1, "2-1", "2-2", "2-3", 3]))
def test_where_group_query(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{Q}/operator_query.yaml",
                                 list(range(0, 10))))
def test_operator_query(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{Q}/simple_query.yaml", [
                             0, 1, 2, 3, "4-1", "4-2", 5, 6,
                             "in_predicate_normal",
                             "in_predicate_type_conversion",
                             "in_predicate_type_cast_3",
                             "in_predicate_type_cast_4",
                             "in_predicate_v_null_null",
                             "in_predicate_null_null_null",
                             "in_predicate_subexpr",
                             "in_predicate_with_window",
                             "like_predicate_1", "like_predicate_2",
                             "like_predicate_3", "like_predicate_4",
                             "like_predicate_5", "like_predicate_6",
                             "like_predicate_7", "like_predicate_8",
                             "like_predicate_9", "like_predicate_10",
                             "like_predicate_11",
                         ]))
def test_simple_query(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{Q}/last_join_query.yaml",
                                 list(range(0, 11))))
def test_last_join_query(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{Q}/last_join_window_query.yaml",
                                 list(range(0, 4))))
def test_last_join_window_query(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{Q}/window_query.yaml",
                                 list(range(0, 22))))
def test_window_query(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{Q}/window_with_union_query.yaml",
                                 list(range(0, 6))))
def test_window_with_union_query(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{Q}/const_query.yaml",
                                 list(range(0, 10))))
def test_const_query(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{Q}/udaf_query.yaml",
                                 list(range(0, 3))))
def test_udaf_query(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid", _params(f"{Q}/udf_query.yaml", [
    "like_udf_1", "like_udf_2", "like_udf_3", "like_udf_4",
    "like_udf_5", "like_udf_const_null_string",
    "ilike_udf_const_null_string", "udf_replace", 0, 1, 2]))
def test_udf_query(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{Q}/parameterized_query.yaml",
                                 [0, "1-1", "1-2", "2", "3-1", "3-2",
                                  4, 5, 6, 7, 8, 9, 10, 11]))
def test_parameterized_query(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{Q}/fail_query.yaml",
                                 [0, "un-support const node",
                                  "un-support interval literal "
                                  "inside expr"]))
def test_fail_query(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{Q}/extream_query.yaml", [0]))
def test_extream_query(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{Q}/fz_sql.yaml",
                                 list(range(0, 6))))
def test_fz_sql_query(path, cid, ray_session):
    _check(path, cid, ray_session)


V040 = "/root/reference/cases/function/v040"


@pytest.mark.parametrize("path,cid",
                         _params(f"{V040}/test_groupby.yaml",
                                 list(range(0, 28))))
def test_v040_groupby(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{V040}/test_like.yaml",
                                 list(range(0, 30))))
def test_v040_like(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{V040}/test_like_match.yaml",
                                 list(range(0, 30))))
def test_v040_like_match(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{V040}/test_udaf.yaml",
                                 list(range(0, 6))))
def test_v040_udaf(path, cid, ray_session):
    _check(path, cid, ray_session)
