"""Driver-contract invariants for __ray_entry__ (the correctness gate
runs the FIRST 50 queries() entries — round 2 lost six rows to that
cap, so the count is pinned here)."""

import sys

sys.path.insert(0, "/root/repo")


def test_queries_within_driver_cap():
    import __ray_entry__ as e
    qs = e.queries()
    assert len(qs) <= 50, (
        f"{len(qs)} queries() entries: the driver records only the "
        "first 50 — consolidate (see round-2 VERDICT) instead of "
        "letting late entries silently lose their correctness row")
    assert len(qs) == len(set(qs)), "duplicate query names"


def test_every_oracle_has_a_query():
    import __ray_entry__ as e
    qs, oracles = e.queries(), e.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"
    # rows-only entries are the documented non-SQL-expressible set;
    # anything new must either get an oracle or extend this list
    rows_only = set(qs) - set(oracles)
    assert rows_only <= {
        "fz_window", "top_cate", "window_maxsize", "langid_fingerprint",
        "ann_approx", "minhash_pairs", "minhash_dedup", "ngram_jaccard",
        "simhash_pairs",
    }, f"undocumented rows-only entries: {rows_only - set(oracles)}"


def test_entry_module_never_inits_ray():
    import ast
    import inspect

    import __ray_entry__ as e
    tree = ast.parse(inspect.getsource(e))
    calls = [n for n in ast.walk(tree)
             if isinstance(n, ast.Call)
             and isinstance(n.func, ast.Attribute)
             and n.func.attr in ("init", "shutdown")
             and isinstance(n.func.value, ast.Name)
             and n.func.value.id == "ray"]
    assert not calls, (
        "__ray_entry__ must not own a Ray session (the driver calls "
        "ray.init before importing it)")
