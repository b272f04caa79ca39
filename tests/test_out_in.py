"""Reference out_in suite (cases/function/out_in/test_out_in.yaml):
SELECT INTO OUTFILE / LOAD DATA INFILE statement sequences through
SqlSession — csv option surface (header/delimiter/null_value/format/
mode/quote), strict load-time schema validation, file-mode errors,
DROP/CREATE round-trips. Plus the performance-insensitive select/join
suite (WHERE off-index, LAST JOIN with extra conditions).
"""

import pytest

from openmldb_ray.testing.yaml_cases import load_cases

OUT_IN = "/root/reference/cases/function/out_in/test_out_in.yaml"
PERF = ("/root/reference/cases/function/test_performance_insensitive/"
        "test_performance_insensitive.yaml")

SKIP: dict = {
    (PERF, 14): "float PARTITION BY rejection is an ONLINE index "
                "restriction; the batch engine supports it and "
                "window/test_window_row.yaml id 2 (rtidb-unsupport) "
                "expects success — this engine follows the batch side",
    (PERF, 15): "double PARTITION BY: same online-only restriction "
                "as id 14",
}


def _params(path, ids):
    return [pytest.param(path, i, id=f"{path.rsplit('/', 2)[-1]}:{i}")
            for i in ids]


def _check(path, cid, ray_session):
    from openmldb_ray.testing.yaml_cases import (check_case, expand_case,
                                                 run_case)
    cases = load_cases(path)
    if cid not in cases:
        pytest.skip("case id absent in this reference checkout")
    if (path, cid) in SKIP:
        pytest.skip(SKIP[(path, cid)])
    case = cases[cid]
    from openmldb_ray.testing.yaml_cases import is_batch_unsupported
    if is_batch_unsupported(case):
        pytest.skip(f"reference mode {case.get('mode')!r}: not "
                    "applicable to batch/offline engines")
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


@pytest.mark.parametrize("path,cid", _params(OUT_IN, list(range(0, 39))))
def test_out_in_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid", _params(PERF, list(range(0, 16))))
def test_performance_insensitive_cases(path, cid, ray_session):
    _check(path, cid, ray_session)


OUT_IN_OFFLINE = ("/root/reference/cases/function/v040/"
                  "test_out_in_offline.yaml")


@pytest.mark.parametrize("path,cid",
                         _params(OUT_IN_OFFLINE, list(range(0, 39))))
def test_out_in_offline_cases(path, cid, ray_session):
    """v040 offline-mode OUTFILE/LOAD roundtrips, incl. the count-only
    file expectation (id 0) and special-character payloads."""
    _check(path, cid, ray_session)
