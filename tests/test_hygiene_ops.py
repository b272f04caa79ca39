"""New hygiene ops: PII redaction cross-checked against DuckDB's RE2
(same patterns verbatim), Gopher quality rules vs a brute Python
evaluator, and token-budget source mixing invariants."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from openmldb_ray.ops.text import GopherRules, PiiRedact

PII_TEXTS = [
    "mail me at john.doe+spam@example.co.uk today",
    "server at 10.0.255.1 and 192.168.1.254, port 80",
    "ssn 123-45-6789 phone 555-123-4567 alt 555.123.4567",
    "no pii here at all",
    "a@b.io x@y.z 999-99-9999",          # x@y.z: single-letter TLD no match
    "",
    None,
    "edge 1234-56-7890 not-a-ssn 12.34.56.78.90 chain",
    "v6-ish 1.2.3.4.5 and bare 255.255.255.255",
]


def test_pii_redact_matches_duckdb(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(PII_TEXTS))),
        "text": pa.array(PII_TEXTS, pa.string())}))
    out = ds.map_batches(PiiRedact(), batch_format="pyarrow") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("t", pd.DataFrame({
        "doc_id": list(range(len(PII_TEXTS))),
        "text": [t if t is not None else "" for t in PII_TEXTS]}))
    inner = "text"
    count_terms = []
    for _name, pat, repl in PiiRedact.PATTERNS:
        count_terms.append(
            f"len(regexp_extract_all(text, '{pat}'))")
        inner = f"regexp_replace({inner}, '{pat}', '{repl}', 'g')"
    sql = (f"SELECT doc_id, {inner} AS red, "
           f"{' + '.join(count_terms)} AS cnt FROM t ORDER BY doc_id")
    oracle = con.execute(sql).df()
    assert list(out["text"]) == list(oracle["red"])
    assert list(out["pii_count"]) == list(oracle["cnt"])


def test_pii_tag_only_keeps_text(ray_session):
    ds = ray.data.from_arrow(pa.table({"text": PII_TEXTS[:5]}))
    out = ds.map_batches(PiiRedact(tag_only=True),
                         batch_format="pyarrow").to_pandas()
    assert list(out["text"].fillna("")) == \
        [t or "" for t in PII_TEXTS[:5]]
    assert out["pii_count"].iloc[2] == 3


GOPHER_DOCS = [
    # passes everything: 60 normal words incl. required stops
    ("the be to of and that have with " + "alpha word " * 26).strip(),
    # too few words
    "the be to of and that have with short",
    # symbol spam (hashes)
    ("the be to of and that have with " + "# " * 60).strip(),
    # bullet lines
    "the be to of and that have with\n" + "\n".join(
        f"- item {i} word word word word word" for i in range(20)),
    # ellipsis line endings
    "the be to of and that have with\n" + "\n".join(
        f"line {i} trails off... " .strip() for i in range(20)),
    # numeric words (alpha fraction fails)
    ("the be to of and that have with " + "123 456 " * 40).strip(),
    # no required stop words
    ("lorem ipsum dolor sit amet " * 12).strip(),
    # mean word length too long
    ("the be to of and that have with " +
     "pneumonoultramicroscopic " * 60).strip(),
]


def _brute_gopher(text, g: GopherRules):
    words = text.split()
    nw = max(len(words), 1)
    nonspace = sum(len(w) for w in words)
    lines = text.split("\n")
    import re
    bullets = sum(bool(re.match(r"^[ \t]*[•\-\*] ", ln)) for ln in lines)
    ell = sum(bool(re.search(r"\.\.\.[ \t]*$", ln)) for ln in lines)
    nonalpha = sum(1 for w in words
                   if w and not any(c.isascii() and c.isalpha()
                                    for c in w))
    low = text.lower()
    stops = sum(bool(re.search(rf"\b{w}\b", low))
                for w in g.REQUIRED_STOPS)
    return (g.min_words <= len(words) <= g.max_words
            and g.min_awl <= nonspace / nw <= g.max_awl
            and (text.count("#") + text.count("...")) / nw
            <= g.max_symbol_ratio
            and bullets / len(lines) <= g.max_bullet_frac
            and ell / len(lines) <= g.max_ellipsis_frac
            and 1.0 - nonalpha / nw >= g.min_alpha_frac
            and stops >= g.min_stop_hits)


def test_gopher_rules_vs_brute(ray_session):
    g = GopherRules(max_bullet_frac=0.5)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(GOPHER_DOCS))), "text": GOPHER_DOCS}))
    out = ds.map_batches(GopherRules(max_bullet_frac=0.5),
                         batch_format="pandas") \
        .to_pandas().sort_values("doc_id")
    expect = [_brute_gopher(t, g) for t in GOPHER_DOCS]
    assert list(out["gopher_pass"]) == expect
    # the crafted docs exercise every rule: exactly one pass, and each
    # failing doc trips the intended rule
    assert expect == [True] + [False] * 7
    assert not out["rule_word_count"].iloc[1]
    assert not out["rule_symbol_ratio"].iloc[2]
    assert not out["rule_bullet_lines"].iloc[3]
    assert not out["rule_ellipsis_lines"].iloc[4]
    assert not out["rule_alpha_words"].iloc[5]
    assert not out["rule_stop_words"].iloc[6]
    assert not out["rule_avg_word_len"].iloc[7]


def test_gopher_filter_mode(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(GOPHER_DOCS))), "text": GOPHER_DOCS}))
    out = ds.map_batches(
        GopherRules(max_bullet_frac=0.5, drop_failing=True),
        batch_format="pandas").to_pandas()
    assert list(out["doc_id"]) == [0]
    assert list(out.columns) == ["doc_id", "text"]


def _mix_table(n=40_000):
    rng = np.arange(n)
    src = np.where(rng % 10 < 6, "web",
                   np.where(rng % 10 < 9, "books", "code"))
    n_tok = 100 + (rng * 37) % 400
    return pa.table({
        "doc_id": pa.array([f"d{i:07d}" for i in rng]),
        "source": pa.array(src.tolist()),
        "n_tok": pa.array(n_tok.astype(np.int32))})


def test_mix_sources_proportions(ray_session):
    from openmldb_ray.ops.corpus_ops import mix_sources
    t = _mix_table()
    ds = ray.data.from_arrow(t)
    out, stats = mix_sources(ds, {"web": 1, "books": 1, "code": 1})
    kept = out.to_pandas()
    by = kept.groupby("source")["n_tok"].sum()
    # code is the binding source (~10% of rows): kept whole
    assert stats["fractions"]["code"] == 1.0
    total_code = pd.Series(
        t["n_tok"].to_numpy()).groupby(
        pd.Series(t["source"].to_pylist())).sum()["code"]
    assert by["code"] == total_code
    # equal-weight targets: each source's kept tokens within 5% of
    # the budget third (hash sampling is statistical)
    third = stats["budget_tokens"] / 3
    for s in ("web", "books"):
        assert abs(by[s] - third) / third < 0.05
    # absent-source and determinism invariants
    out2, stats2 = mix_sources(ds, {"web": 1, "books": 1, "code": 1})
    assert stats2 == stats
    assert sorted(out2.to_pandas()["doc_id"]) == sorted(kept["doc_id"])


def test_mix_sources_budget_and_unknown_source(ray_session):
    from openmldb_ray.ops.corpus_ops import mix_sources
    ds = ray.data.from_arrow(_mix_table(8_000))
    out, stats = mix_sources(ds, {"web": 3, "books": 1},
                             total_tokens=200_000)
    kept = out.to_pandas()
    assert set(kept["source"]) <= {"web", "books"}   # code dropped
    by = kept.groupby("source")["n_tok"].sum()
    assert abs(by["web"] - 150_000) / 150_000 < 0.1
    assert abs(by["books"] - 50_000) / 50_000 < 0.1
