"""Headline benchmark. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...}

Pipelines benched (inputs: $GRAFT_SF_DIR testdata + a cached
deterministic synthetic corpus, FIXTURES F1):

  corpus_flagship  synthetic corpus parquet -> position axis -> ROWS +
                   ROWS_RANGE window features -> as-of LAST JOIN ->
                   parquet sink with lineage manifests (BASELINE.md
                   workload; sequences/sec headline)
  window_events    5-agg ROWS window over events
  asof_events      click->purchase as-of LAST JOIN over events
  dedup_exact      content-hash dedup over documents
  ann_bruteforce   cosine top-10 over embeddings

`python bench.py --scaling` runs corpus_flagship in two fresh
processes (RAY_GRAFT_CPUS=8 and =32) on the SAME input and reports
both throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "2000000"))
TEXT_DOCS = int(os.environ.get("GRAFT_TEXT_DOCS", "2000000"))
SCALING_DOCS = int(os.environ.get("GRAFT_SCALING_DOCS", "32000000"))
ONLY = os.environ.get("GRAFT_BENCH_ONLY", "")
CORPUS_CACHE = f"/tmp/openmldb_ray_bench/corpus_{BENCH_DOCS}"
OUT_DIR = "/tmp/openmldb_ray_bench/out"


def _prepare_corpus() -> str:
    from openmldb_ray.pipelines.synth import synth_corpus_parquet
    return synth_corpus_parquet(CORPUS_CACHE, BENCH_DOCS)


def bench_corpus_flagship() -> tuple[float, int]:
    import ray.data
    from openmldb_ray.pipelines.corpus import run_flagship
    from openmldb_ray.state.checkpoint import checkpoint
    path = _prepare_corpus()
    out = OUT_DIR + "/flagship"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    # one block per file: the corpus is entity-ordered within each
    # file; per-file blocks let the zero-shuffle blockwise plan verify
    # on the first pass (merged blocks need refinement rounds)
    from openmldb_ray.io import read_parquet_per_file
    corpus = read_parquet_per_file(path, file_extensions=["parquet"],
                                   columns=["doc_id", "n_tok", "source"])
    # dim density: ~1 checkpoint row per 64 docs at bench scale (a
    # realistic dimension size; the broadcast index collects it)
    dim_mod = 7 if BENCH_DOCS <= 1_000_000 else 64
    # pin=True (default): A/B measured 3.2-3.9s pinned vs 8.7-10.1s
    # re-scanning at 2M docs/32cpus — parquet re-decode for the
    # summary+eval passes costs far more than the one materialize +
    # zero-copy worker plasma reads. pin=False exists for inputs
    # larger than aggregate object-store memory (with pin_dir the
    # better option there).
    res = run_flagship(corpus, dim_modulo=dim_mod)
    # nodict: measured 1.34s vs 1.99s (and 1.01 vs 1.13 GB) for this
    # numeric-feature output at 32M rows
    checkpoint(res, out, force=True, use_dictionary=False)
    wall = time.time() - t0
    with open(out + "/_SUCCESS") as fh:
        rows = json.loads(fh.read())["rows"]
    return wall, rows


def bench_window_events() -> tuple[float, int]:
    from openmldb_ray.io import read_table
    from openmldb_ray.window import Agg, WindowSpec, window_agg
    t0 = time.time()
    ev = read_table(SF_DIR, "events",
                    columns=["event_id", "user_id", "ts", "value"])
    spec = WindowSpec("user_id", "ts", preceding_rows=50)
    out = window_agg(ev, spec, [
        Agg("sum", "value", "s"), Agg("avg", "value", "a"),
        Agg("min", "value", "mn"), Agg("max", "value", "mx"),
        Agg("count", None, "n")],
        passthrough=["event_id", "user_id", "ts"],
        num_buckets=None)
    rows = out.count()
    return time.time() - t0, rows


def bench_asof_events() -> tuple[float, int]:
    from openmldb_ray.io import read_table
    from openmldb_ray.joins import last_join
    t0 = time.time()
    ev = read_table(
        SF_DIR, "events",
        columns=["event_id", "user_id", "ts", "value", "event_type"])
    left = ev.filter(expr="event_type == 'click'") \
        .select_columns(["event_id", "user_id", "ts"])
    right = ev.filter(expr="event_type == 'purchase'") \
        .select_columns(["user_id", "ts", "value"])
    out = last_join(left, right, on="user_id", order_by="ts",
                    left_ts="ts", payload=["value"])
    rows = out.count()
    return time.time() - t0, rows


def bench_dedup_exact() -> tuple[float, int]:
    from openmldb_ray.io import read_table
    from openmldb_ray.ops.dedup import dedup_exact
    t0 = time.time()
    docs = read_table(SF_DIR, "documents", columns=["doc_id", "text"])
    rows = dedup_exact(docs, "text", "doc_id").count()
    return time.time() - t0, rows


def bench_long_window_preagg() -> tuple[float, int]:
    """Pre-agg long-window serving (reference aggregator.cc +
    tablet_impl.cc routing analog): distributed bucket build over a
    2M-row 8-entity history, SHARDED store (actor per key range, 4
    shards — no single process holds the table), then 2000 request
    rows routed by key hash and answered from full buckets + edges.
    The raw-path comparison (full window scan per request) is measured
    on a 20-request sample and logged to stderr for BASELINE.md."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from openmldb_ray.request import request_features
    from openmldb_ray.window import Agg, WindowSpec
    from openmldb_ray.window.preagg import (ShardedLongWindowStore,
                                            build_preagg)

    n, width, rng_w, n_ent = 2_000_000, 10_000, 1_000_000, 8
    rng = np.random.default_rng(5)

    # deterministic row i -> (entity, ts, v): generated in READ TASKS
    # for the distributed build (shipping a driver-built 2M-row table
    # through ray.put costs seconds on a slow driver plasma client)
    def _cols(i: np.ndarray):
        h = (i.astype(np.uint64) * np.uint64(2654435761)) % (1 << 32)
        ent = (h % n_ent).astype(np.int64)
        return (ent, i * 10 + (h % 10).astype(np.int64),
                (h % 1000).astype(np.float64))

    def gen(b: pa.Table) -> pa.Table:
        i = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ent, ts, v = _cols(i)
        ks = np.array([f"e{j}" for j in range(n_ent)], dtype=object)
        return pa.table({"k": pa.array(ks[ent]),
                         "ts": pa.array(ts), "v": pa.array(v)})

    aggs = [Agg("sum", "v", "s"), Agg("count", None, "n"),
            Agg("min", "v", "mn"), Agg("max", "v", "mx")]
    spec = WindowSpec("k", "ts", preceding_range=rng_w)
    reqs = [{"k": f"e{int(e)}", "ts": int(t), "v": 1.0}
            for e, t in zip(rng.integers(0, n_ent, 2000),
                            rng.integers(rng_w, n * 10, 2000))]

    t0 = time.time()
    ds = ray.data.range(n, override_num_blocks=32).map_batches(
        gen, batch_format="pyarrow")
    preagg = build_preagg(ds, "k", "ts", "v", width)
    store = ShardedLongWindowStore(preagg, ds, "k", "ts", "v", width,
                                   n_shards=4)
    store.features_batch(reqs, spec, aggs)
    wall = time.time() - t0

    # raw-path sample: full history scan per request (one entity)
    all_ent, all_ts, all_v = _cols(np.arange(n, dtype=np.int64))
    m = all_ent == 0
    hist = pa.table({"k": pa.array(np.repeat("e0", int(m.sum()))),
                     "ts": pa.array(all_ts[m]), "v": pa.array(all_v[m])})
    t1 = time.time()
    for r in [q for q in reqs if q["k"] == "e0"][:20]:
        request_features(r, hist, spec, aggs)
    raw20 = time.time() - t1
    print(f"long_window raw-path sample: {raw20:.2f}s / 20 reqs "
          f"(sharded preagg: {wall:.2f}s incl. build+spawn / 2000 reqs)",
          file=sys.stderr)
    store.shutdown()
    return wall, len(reqs)


def _prepare_text_corpus() -> str:
    from openmldb_ray.pipelines.synth import synth_text_corpus_parquet
    n = TEXT_DOCS
    return synth_text_corpus_parquet(
        f"/tmp/openmldb_ray_bench/textcorpus_{n}", n)


def bench_dedup_paragraphs() -> tuple[float, int]:
    """Paragraph-level exact dedup over the synthetic text corpus
    (VERDICT r3 item 7): explode to slim (doc,idx,hash) rows -> first
    occurrence groupby -> bucketed rebuild join. No driver-side
    materialization; only per-doc rebuild moves text."""
    from openmldb_ray.io import read_parquet_per_file
    from openmldb_ray.ops.corpus_ops import dedup_paragraphs
    path = _prepare_text_corpus()
    docs = read_parquet_per_file(path, file_extensions=["parquet"],
                                 columns=["doc_id", "text"])
    t0 = time.time()
    rows = dedup_paragraphs(docs, "text", "doc_id").count()
    return time.time() - t0, rows


def bench_decontaminate() -> tuple[float, int]:
    """Benchmark decontamination over the synthetic text corpus: eval
    n-gram hash set broadcast once, zero-shuffle vectorized filter."""
    from openmldb_ray.io import read_parquet_per_file
    from openmldb_ray.ops.corpus_ops import decontaminate
    from openmldb_ray.pipelines.synth import eval_paragraph_texts
    path = _prepare_text_corpus()
    ev = eval_paragraph_texts()
    docs = read_parquet_per_file(path, file_extensions=["parquet"],
                                 columns=["doc_id", "text"])
    t0 = time.time()
    rows = decontaminate(docs, ev, "text").count()
    return time.time() - t0, rows


def bench_pii_gopher() -> tuple[float, int]:
    """PII redaction + Gopher quality rules over the synthetic text
    corpus — the per-document hygiene stages of a cleaning run, fused
    into one zero-shuffle map chain (Arrow RE2 redaction kernels +
    the one-pass byte-class rule kernel)."""
    from openmldb_ray.io import read_parquet_per_file
    from openmldb_ray.ops.text import GopherRules, PiiRedact, \
        with_text_features
    path = _prepare_text_corpus()
    docs = read_parquet_per_file(path, file_extensions=["parquet"],
                                 columns=["doc_id", "text"])
    t0 = time.time()
    out = with_text_features(docs, [PiiRedact, GopherRules])
    rows = out.count()
    return time.time() - t0, rows


def bench_dedup_lines() -> tuple[float, int]:
    """Line-level exact dedup (r5): the dedup_paragraphs machinery at
    newline granularity — more segments per doc, same one-shuffle
    first-occurrence + fused rebuild shape."""
    from openmldb_ray.io import read_parquet_per_file
    from openmldb_ray.ops.corpus_ops import dedup_lines
    path = _prepare_text_corpus()
    docs = read_parquet_per_file(path, file_extensions=["parquet"],
                                 columns=["doc_id", "text"])
    t0 = time.time()
    rows = dedup_lines(docs, "text", "doc_id").count()
    return time.time() - t0, rows


def bench_minhash_pairs() -> tuple[float, int]:
    """MinHash+LSH near-duplicate pairs over sf documents: shingle ->
    minhash -> banded buckets -> bucket-local candidate pairs ->
    join-based exact-Jaccard verify (no whole-corpus materialization).
    Tracks the near-dup family's wall time per round."""
    from openmldb_ray.io import read_table
    from openmldb_ray.ops.dedup import minhash_duplicate_pairs
    t0 = time.time()
    docs = read_table(SF_DIR, "documents", columns=["doc_id", "text"])
    rows = minhash_duplicate_pairs(docs, "text", "doc_id").count()
    return time.time() - t0, rows


def bench_window_tslog() -> tuple[float, int]:
    """Generic ZERO-SHUFFLE window (window.blockwise) over a cached
    8M-row time-ordered log (32 entities): ROWS-100 + RANGE-5000
    frames, two specs, pinned projection. The shuffle plan on the same
    input is measured once and logged to stderr for BASELINE.md."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from openmldb_ray.io import read_parquet_per_file
    from openmldb_ray.window import Agg, WindowSpec, window_agg_multi
    from openmldb_ray.window.blockwise import blockwise_window_agg

    path = "/tmp/openmldb_ray_bench/tslog_8m"
    from openmldb_ray.state.checkpoint import checkpoint, is_complete
    if not is_complete(path):
        def gen(b):
            i = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
            h = (i * 2654435761) % (2 ** 32)
            return pa.table({
                "ent": (h % 32).astype(np.int64),
                "ts": (i * 3 + (h % 3)).astype(np.int64),
                "v": ((h % 1000) / 7.0)})
        checkpoint(ray.data.range(8_000_000, override_num_blocks=64)
                   .map_batches(gen, batch_format="pyarrow"), path)
    specs = [
        (WindowSpec("ent", "ts", preceding_rows=100),
         [Agg("sum", "v", "s100"), Agg("avg", "v", "a100"),
          Agg("count", None, "n100")]),
        (WindowSpec("ent", "ts", preceding_range=5000),
         [Agg("sum", "v", "s5k"), Agg("max", "v", "mx5k")]),
    ]
    pt = ["ent", "ts", "v"]
    log = read_parquet_per_file(path, file_extensions=["parquet"],
                                columns=pt)
    t0 = time.time()
    rows = blockwise_window_agg(log, specs, passthrough=pt).count()
    wall = time.time() - t0
    t1 = time.time()
    window_agg_multi(read_parquet_per_file(
        path, file_extensions=["parquet"], columns=pt),
        specs, passthrough=pt, num_buckets=None).count()
    print(f"window_tslog shuffle-plan comparison: "
          f"{time.time() - t1:.2f}s (blockwise {wall:.2f}s)",
          file=sys.stderr)
    return wall, rows


def bench_ann() -> tuple[float, int]:
    import numpy as np
    import pyarrow.parquet as pq
    from openmldb_ray.io import read_table
    from openmldb_ray.ops.ann import knn_bruteforce
    t0 = time.time()
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"]).sort_by("vec_id")
    qm = np.array(t.slice(0, 16)["embedding"].to_pylist(), dtype=np.float64)
    qids = t.slice(0, 16)["vec_id"].to_pylist()
    emb = read_table(SF_DIR, "embeddings",
                     columns=["vec_id", "embedding"])
    rows = knn_bruteforce(emb, qm, qids, k=10).count()
    return time.time() - t0, rows


def run_all() -> dict:
    import ray
    if not ray.is_initialized():
        # log_to_driver=False: raylet WARNING forwards land on stdout
        # and would corrupt the one-JSON-line contract
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR",
                 log_to_driver=False)
    from openmldb_ray.context import tune_data_context
    tune_data_context()
    # keep stdout to the single JSON line (ray.data warning handlers
    # can write to stdout and corrupt naive parsers)
    import logging
    for name in ("ray.data", "ray"):
        logging.getLogger(name).setLevel(logging.ERROR)

    # spawn the worker pool BEFORE the per-pipeline timers: Ray forks
    # workers lazily at first task, so a fresh process charges ~1-2s of
    # cold worker spawn to whichever pipeline runs first. Workers are
    # long-lived on a real cluster; pipeline throughput shouldn't
    # include cluster cold-start (documented in BASELINE.md).
    import ray.data as _rd
    _rd.range(NUM_CPUS * 4096, override_num_blocks=NUM_CPUS) \
        .map_batches(lambda b: b, batch_format="pyarrow").count()

    benches = {
        "corpus_flagship": bench_corpus_flagship,
        "window_events": bench_window_events,
        "asof_events": bench_asof_events,
        "dedup_exact": bench_dedup_exact,
        "ann_bruteforce": bench_ann,
        "minhash_pairs": bench_minhash_pairs,
        "dedup_paragraphs": bench_dedup_paragraphs,
        "decontaminate": bench_decontaminate,
        "dedup_lines": bench_dedup_lines,
        "pii_gopher": bench_pii_gopher,
        "window_tslog_blockwise": bench_window_tslog,
        "long_window_preagg": bench_long_window_preagg,
    }
    queries, rows_out = {}, {}
    for name, fn in benches.items():
        if ONLY and name != ONLY:
            continue
        wall, rows = fn()
        queries[name] = round(wall, 3)
        rows_out[name] = rows
    total = round(sum(queries.values()), 3)
    result = {
        "metric": "headline pipelines wall time (corpus as-of+window "
                  "flagship, window, as-of join, dedup, ann)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "rows": rows_out,
        "sequences_per_sec": round(rows_out["corpus_flagship"]
                                   / queries["corpus_flagship"], 1)
        if "corpus_flagship" in queries else None,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_docs": BENCH_DOCS,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job (corpus_flagship over the SCALING_DOCS corpus), same
    input, two parallelism levels in fresh processes; scaling
    efficiency = throughput_hi / (throughput_lo * hi/lo)."""
    import subprocess
    env_common = dict(os.environ, GRAFT_BENCH_DOCS=str(SCALING_DOCS),
                      GRAFT_BENCH_ONLY="corpus_flagship")

    def one(ncpu: int) -> dict:
        env = dict(env_common, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # warm run: generates/caches the corpus + warms the page cache
    one(8)
    lo, hi = 8, 32
    # single runs vary ~10-15% (plasma / page-cache state); take the
    # best of 3 fresh processes per level — same protocol both levels
    def best(ncpu: int) -> dict:
        runs = [one(ncpu) for _ in range(3)]
        return min(runs, key=lambda r: r["queries"]["corpus_flagship"])
    r_lo, r_hi = best(lo), best(hi)
    t_lo = r_lo["queries"]["corpus_flagship"]
    t_hi = r_hi["queries"]["corpus_flagship"]
    thr_lo = r_lo["rows"]["corpus_flagship"] / t_lo
    thr_hi = r_hi["rows"]["corpus_flagship"] / t_hi
    eff = thr_hi / (thr_lo * (hi / lo))
    return {
        "metric": "corpus_flagship scaling (sequences/sec at two "
                  "parallelism levels, same input; best of 3 fresh "
                  "processes per level)",
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": t_lo, "sec_hi": t_hi,
        "throughput_lo": round(thr_lo, 1),
        "throughput_hi": round(thr_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "runs_per_level": 3,
        "bench_docs": SCALING_DOCS,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_all()))
