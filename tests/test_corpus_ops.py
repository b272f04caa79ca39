"""Corpus-hygiene ops: paragraph dedup vs a brute-force reference,
decontamination hit semantics, deterministic sampling invariants."""

import numpy as np
import pyarrow as pa
import ray.data


def _docs():
    # doc 1 and 3 share paragraph B; doc 2 repeats A internally
    return [
        {"doc_id": 1, "text": "A one\n\nB two\n\nC three"},
        {"doc_id": 2, "text": "A one\n\nA one\n\nD four"},
        {"doc_id": 3, "text": "B two\n\nE five"},
        {"doc_id": 4, "text": "B two"},              # fully duplicate
        {"doc_id": 5, "text": ""},                    # empty drops
    ]


def _brute_para_dedup(docs):
    seen, out = set(), {}
    for d in sorted(docs, key=lambda d: d["doc_id"]):
        keep = []
        for p in d["text"].split("\n\n"):
            if not p.strip():
                continue
            if p not in seen:
                seen.add(p)
                keep.append(p)
        if keep:
            out[d["doc_id"]] = "\n\n".join(keep)
    return out


def test_dedup_paragraphs_matches_brute(ray_session):
    from openmldb_ray.ops.corpus_ops import dedup_paragraphs
    docs = _docs()
    ds = ray.data.from_items(docs).repartition(3)
    got = dedup_paragraphs(ds, num_buckets=4).to_pandas()
    exp = _brute_para_dedup(docs)
    assert dict(zip(got["doc_id"], got["text"])) == exp


def test_dedup_paragraphs_randomized(ray_session):
    from openmldb_ray.ops.corpus_ops import dedup_paragraphs
    rng = np.random.default_rng(7)
    pool = [f"para {i} words here" for i in range(20)]
    docs = [{"doc_id": i,
             "text": "\n\n".join(rng.choice(pool,
                                            size=rng.integers(1, 6)))}
            for i in range(60)]
    ds = ray.data.from_items(docs).repartition(5)
    got = dedup_paragraphs(ds, num_buckets=8).to_pandas()
    exp = _brute_para_dedup(docs)
    assert dict(zip(got["doc_id"], got["text"])) == exp
    # global invariant: every distinct paragraph survives exactly once
    all_paras = [p for t in got["text"] for p in t.split("\n\n")]
    assert len(all_paras) == len(set(all_paras))


def test_decontaminate(ray_session):
    from openmldb_ray.ops.corpus_ops import decontaminate
    evals = ["the quick brown fox jumps over the lazy dog tonight"]
    docs = [
        {"doc_id": 1, "text": "prefix the quick brown fox jumps over "
                              "the lazy dog tonight suffix"},   # hit
        {"doc_id": 2, "text": "the quick brown fox sat down"},  # <8-gram
        {"doc_id": 3, "text": "completely unrelated text about rivers "
                              "and mountains and long valleys ok"},
    ]
    ds = ray.data.from_items(docs)
    kept = decontaminate(ds, evals, n=8, concurrency=2).to_pandas()
    assert sorted(kept["doc_id"]) == [2, 3]
    tagged = decontaminate(ds, evals, n=8, tag_only=True,
                           concurrency=2).to_pandas()
    m = dict(zip(tagged["doc_id"], tagged["contaminated"]))
    assert m == {1: True, 2: False, 3: False}
    hits = dict(zip(tagged["doc_id"], tagged["ngram_hits"]))
    assert hits[1] >= 1 and hits[2] == 0


def test_decontaminate_min_hits_counts_distinct(ray_session):
    """min_hits counts DISTINCT shared n-grams: a doc repeating one
    shared 3-gram many times shares only ONE distinct n-gram and must
    survive min_hits=2, while a doc sharing two different 3-grams is
    dropped."""
    from openmldb_ray.ops.corpus_ops import decontaminate
    evals = ["alpha beta gamma delta epsilon zeta"]
    one = "alpha beta gamma X " * 5            # same 3-gram repeated 5x
    two = "alpha beta gamma X delta epsilon zeta"   # two distinct hits
    docs = [{"doc_id": 1, "text": one},
            {"doc_id": 2, "text": two},
            {"doc_id": 3, "text": "nothing shared at all here"}]
    ds = ray.data.from_items(docs)
    tagged = decontaminate(ds, evals, n=3, tag_only=True,
                           concurrency=1).to_pandas()
    hits = dict(zip(tagged["doc_id"], tagged["ngram_hits"]))
    assert hits[1] == 1 and hits[2] == 2 and hits[3] == 0
    kept = decontaminate(ds, evals, n=3, min_hits=2,
                         concurrency=1).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 3]


def test_decontaminate_matches_per_doc_brute(ray_session):
    """The flat-batch contamination kernel must agree with a per-doc
    recompute on a randomized corpus (doc-boundary grams masked)."""
    from openmldb_ray.functions.hashing import word_hashes_batch
    from openmldb_ray.ops.corpus_ops import (_PRIME, _ngram_hash_set,
                                             decontaminate)
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    docs = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab,
                                          size=rng.integers(0, 25)))}
            for i in range(80)]
    evals = [" ".join(rng.choice(vocab, size=12)) for _ in range(5)]
    # plant real eval spans in a third of the docs so hits are certain
    for i in range(0, 80, 3):
        ev = evals[i % 5]
        span = " ".join(ev.split()[: rng.integers(2, 10)])
        docs[i]["text"] = docs[i]["text"] + " " + span
    n = 4
    banned = _ngram_hash_set(evals, n)

    def brute_hits(text):
        wh, off = word_hashes_batch([text])
        w = wh[off[0]:off[1]]
        if len(w) < n or not len(banned):
            return 0
        acc = w[: len(w) - n + 1].copy()
        with np.errstate(over="ignore"):
            for j in range(1, n):
                acc = acc * _PRIME ^ w[j: len(w) - n + 1 + j]
        return len(np.unique(acc[np.isin(acc, banned)]))

    ds = ray.data.from_items(docs).repartition(3)
    tagged = decontaminate(ds, evals, n=n, tag_only=True,
                           concurrency=2).to_pandas()
    got = dict(zip(tagged["doc_id"], tagged["ngram_hits"]))
    exp = {d["doc_id"]: brute_hits(d["text"]) for d in docs}
    assert got == exp
    assert sum(v > 0 for v in exp.values()) > 0  # non-trivial corpus


def test_sample_by_hash_null_ids(ray_session):
    """Null ids must not desync the filter mask (regression: crashed
    with a length mismatch in pa.Table.filter)."""
    from openmldb_ray.ops.corpus_ops import sample_by_hash
    rows = [{"doc_id": (None if i % 7 == 0 else f"d{i}"), "v": i}
            for i in range(500)]
    ds = ray.data.from_items(rows).repartition(3)
    out = sample_by_hash(ds, 0.5, seed=3).to_pandas()
    out2 = sample_by_hash(ds.repartition(11), 0.5, seed=3).to_pandas()
    assert sorted(out["v"]) == sorted(out2["v"])
    assert 0.35 < len(out) / 500 < 0.65


def test_sample_by_hash_deterministic_and_stable(ray_session):
    from openmldb_ray.ops.corpus_ops import sample_by_hash
    ds = ray.data.range(10_000).map_batches(
        lambda b: {"doc_id": b["id"]}, batch_format="numpy")
    a = sample_by_hash(ds, 0.25, seed=1).to_pandas()
    b = sample_by_hash(ds.repartition(17), 0.25, seed=1).to_pandas()
    # identical selection regardless of block layout
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert 0.2 < len(a) / 10_000 < 0.3
    c = sample_by_hash(ds, 0.25, seed=2).to_pandas()
    assert sorted(c["doc_id"]) != sorted(a["doc_id"])  # seed matters


def test_sample_per_key_quota(ray_session):
    from openmldb_ray.ops.corpus_ops import sample_per_key
    rows = [{"k": f"s{i % 3}", "ts": i, "v": i} for i in range(100)]
    ds = ray.data.from_items(rows).repartition(4)
    out = sample_per_key(ds, "k", max_rows=5, order_col="ts",
                         num_buckets=4).to_pandas()
    g = out.groupby("k")["ts"].apply(list).to_dict()
    for i in range(3):
        # smallest-ts rows win, exactly 5 per key
        assert sorted(g[f"s{i}"]) == [i, i + 3, i + 6, i + 9, i + 12]


def test_dedup_paragraphs_vs_duckdb_oracle(ray_session):
    """Independent-engine cross-check over the real documents table:
    paragraph-level dedup must match DuckDB's unnest + QUALIFY +
    ordered string_agg formulation exactly."""
    import duckdb
    import ray.data

    from openmldb_ray.ops.corpus_ops import dedup_paragraphs
    sf = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id", "text"])
    got = dedup_paragraphs(docs, num_buckets=8).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    exp = con.execute("""
        WITH paras AS (
          SELECT doc_id, p.para, p.idx - 1 AS idx
          FROM documents,
          LATERAL (SELECT unnest(str_split(text, chr(10)||chr(10)))
                     AS para,
                   generate_subscripts(
                     str_split(text, chr(10)||chr(10)), 1) AS idx) p
          WHERE trim(p.para) <> ''),
        surv AS (
          SELECT doc_id, para, idx FROM paras
          QUALIFY row_number() OVER (PARTITION BY para
                                     ORDER BY doc_id, idx) = 1)
        SELECT doc_id,
               string_agg(para, chr(10)||chr(10) ORDER BY idx) AS text
        FROM surv GROUP BY doc_id""").df()
    g = dict(zip(got["doc_id"], got["text"]))
    e = dict(zip(exp["doc_id"], exp["text"]))
    assert g == e


def test_dedup_paragraphs_large_string_corpus(ray_session):
    # large_string text columns (big parquet string blocks) must union
    # cleanly with the survivor side's null text column
    from openmldb_ray.ops.corpus_ops import dedup_paragraphs
    docs = _docs()
    tbl = pa.table({
        "doc_id": pa.array([d["doc_id"] for d in docs]),
        "text": pa.array([d["text"] for d in docs],
                         type=pa.large_string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(2)
    got = dedup_paragraphs(ds, num_buckets=4).to_pandas()
    assert dict(zip(got["doc_id"], got["text"])) == _brute_para_dedup(docs)


def test_mix_sources_null_source_dropped(ray_session):
    # null source values carry weight 0 (dropped), not a TypeError in
    # the searchsorted lookup
    from openmldb_ray.ops.corpus_ops import mix_sources
    rows = [{"doc_id": str(i), "source": ("web" if i % 2 else None),
             "n_tok": 10} for i in range(50)]
    ds = ray.data.from_items(rows)
    out, stats = mix_sources(ds, {"web": 1.0})
    got = out.to_pandas()
    assert (got["source"] == "web").all()
    assert stats["fractions"]["web"] == 1.0


def test_decontaminate_survives_actor_kill(ray_session):
    # restart hazard regression (ray#53727): the banned-hash array is
    # a spec-owned constructor arg, so a killed filter actor restarts
    # cleanly and the stream completes with every row accounted for
    import os
    import signal

    import ray._private.state as _state

    from openmldb_ray.ops.corpus_ops import decontaminate
    rows = [{"doc_id": i,
             "text": " ".join(f"w{i}_{j}" for j in range(30))}
            for i in range(4000)]
    ds = ray.data.from_items(rows).repartition(16)
    out = decontaminate(ds, ["alpha beta gamma delta epsilon"], n=4,
                        concurrency=1)
    it = iter(out.iter_batches(batch_size=256, batch_format="pyarrow"))
    total = next(it).num_rows
    for info in _state.actors().values():
        if "ContaminationFilter" in info.get("ActorClassName", "") \
                and info.get("State") == "ALIVE" and info.get("Pid"):
            try:
                os.kill(info["Pid"], signal.SIGKILL)
            except ProcessLookupError:
                pass
    for b in it:
        total += b.num_rows
    assert total == 4000


def _brute_line_dedup(docs):
    seen, out = set(), {}
    for d in sorted(docs, key=lambda d: d["doc_id"]):
        keep = []
        for p in d["text"].split("\n"):
            if not p.strip():
                continue
            if p not in seen:
                seen.add(p)
                keep.append(p)
        if keep:
            out[d["doc_id"]] = "\n".join(keep)
    return out


def test_dedup_lines_matches_brute(ray_session):
    from openmldb_ray.ops.corpus_ops import dedup_lines
    rng = np.random.default_rng(11)
    pool = [f"line {i} with words" for i in range(15)]
    docs = [{"doc_id": i,
             "text": "\n".join(rng.choice(pool,
                                          size=rng.integers(1, 7)))}
            for i in range(50)]
    ds = ray.data.from_items(docs).repartition(4)
    got = dedup_lines(ds, num_buckets=8).to_pandas()
    assert dict(zip(got["doc_id"], got["text"])) == _brute_line_dedup(docs)
    all_lines = [ln for t in got["text"] for ln in t.split("\n")]
    assert len(all_lines) == len(set(all_lines))


def test_dedup_lines_vs_duckdb_oracle(ray_session):
    """Independent-engine cross-check on the real documents table at
    line granularity (same formulation as the paragraph oracle)."""
    import duckdb

    from openmldb_ray.ops.corpus_ops import dedup_lines
    sf = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id", "text"])
    got = dedup_lines(docs, num_buckets=8).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    exp = con.execute("""
        WITH lines AS (
          SELECT doc_id, p.ln, p.idx - 1 AS idx
          FROM documents,
          LATERAL (SELECT unnest(str_split(text, chr(10))) AS ln,
                   generate_subscripts(
                     str_split(text, chr(10)), 1) AS idx) p
          WHERE trim(p.ln) <> ''),
        surv AS (
          SELECT doc_id, ln, idx FROM lines
          QUALIFY row_number() OVER (PARTITION BY ln
                                     ORDER BY doc_id, idx) = 1)
        SELECT doc_id, string_agg(ln, chr(10) ORDER BY idx) AS text
        FROM surv GROUP BY doc_id""").df()
    assert dict(zip(got["doc_id"], got["text"])) == \
        dict(zip(exp["doc_id"], exp["text"]))
