"""Reference DML suites (cases/function/dml/*.yaml) VERBATIM: inputs
are declared via CREATE TABLE and populated via INSERT ... VALUES
through the session statement surface, then the case SQL runs and the
result must match `expect` (reference literal typing: bare int ->
int32, L -> int64, f -> float, quoted date strings into date columns,
partial column lists NULL-pad)."""

import pytest

from openmldb_ray.testing.yaml_cases import (check_case, expand_case,
                                             is_batch_unsupported,
                                             load_cases, run_case)

D = "/root/reference/cases/function/dml"


def _params(path, ids):
    return [pytest.param(path, i, id=f"{path.rsplit('/', 1)[-1]}:{i}")
            for i in ids]


def _check(path, cid, ray_session):
    cases = load_cases(path)
    if cid not in cases:
        pytest.skip("case id absent in this reference checkout")
    case = cases[cid]
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
                         _params(f"{D}/test_insert.yaml",
                                 list(range(0, 11))))
def test_insert_suite(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{D}/multi_insert.yaml",
                                 list(range(0, 11))))
def test_multi_insert_suite(path, cid, ray_session):
    _check(path, cid, ray_session)


@pytest.mark.parametrize("path,cid",
                         _params(f"{D}/test_insert_prepared.yaml",
                                 list(range(0, 15))))
def test_insert_prepared_suite(path, cid, ray_session):
    """Prepared INSERT (? placeholders bound per parameter row — the
    SDK PreparedStatement surface)."""
    _check(path, cid, ray_session)
