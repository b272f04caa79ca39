"""The flagship pipeline over the mandated corpus shape
``(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)``.

The corpus is derived DETERMINISTICALLY from the driver-generated
``documents`` table (seed fixed by the generator): whitespace
tokenization + FNV-1a token ids. No external data; the same derivation
is expressible in the DuckDB oracle (token ids aside, which are
checked by the pytest token-equality invariant instead).

Pipeline (BASELINE.md workload):
  position-axis derivation (exclusive prefix sum of n_tok per source,
  docs ordered by doc_id — the entity time axis)
  -> hash shuffle by source + per-partition sort
  -> windowed features (ROWS + ROWS_RANGE frames over n_tok)
  -> LAST JOIN (as-of) against a checkpoint dim table
  -> parquet sink with per-partition lineage manifests.

Scale note: window features never touch the ``tokens`` arrays, so the
shuffle moves only (doc_id, source, ts, n_tok) — the token payload is
re-joined by doc_id afterwards (ConcatJoin analog, SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from openmldb_ray.joins import last_join
from openmldb_ray.window import Agg, WindowSpec

VOCAB = 50257


def _phase_log(label: str, t0: float) -> None:
    """Wall-clock phase telemetry for BASELINE.md scaling analysis;
    enabled by GRAFT_PHASE_LOG=1 (stderr, one line per phase)."""
    import os
    import sys
    import time
    if os.environ.get("GRAFT_PHASE_LOG"):
        print(f"[phase] {label}: {time.time() - t0:.2f}s",
              file=sys.stderr, flush=True)


class Tokenize:
    """Actor-pool stage: deterministic whitespace tokenization,
    batch-vectorized (one Arrow split + flat FNV pass per batch —
    ``functions.hashing``; token ids are unchanged from the scalar
    FNV definition: fnv1a(word) % VOCAB).

    Kept as a class so at real scale this is where a BPE model would
    be loaded once per actor.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from openmldb_ray.functions.hashing import word_hashes_batch
        wh, off = word_hashes_batch(batch["text"])
        toks = (wh % np.uint64(VOCAB)).astype(np.int32)
        tokens = pa.ListArray.from_arrays(
            pa.array(off.astype(np.int32)), pa.array(toks))
        ntok = (off[1:] - off[:-1]).astype(np.int32)
        doc_ids = pc.binary_join_element_wise(
            batch["source"].combine_chunks().cast(pa.string()),
            pc.utf8_lpad(pc.cast(batch["doc_id"], pa.string()), 8, "0"),
            "-")
        return pa.table({
            "doc_id": doc_ids,
            "tokens": tokens,
            "n_tok": pa.array(ntok),
            "source": batch["source"],
        })


def build_corpus(sf_dir: str, concurrency: int | None = None) -> ray.data.Dataset:
    """documents.parquet -> the mandated corpus shape."""
    from openmldb_ray.context import pool_concurrency
    from openmldb_ray.io import clean_read_parquet
    docs = clean_read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "source"])
    return docs.map_batches(Tokenize, batch_format="pyarrow",
                            batch_size=2048,
                            concurrency=concurrency or pool_concurrency())


class AddPositionAxis:
    """Per-source exclusive prefix sum of n_tok in doc_id order — the
    int64 entity time axis (SURVEY.md §7.2). Runs inside a per-source
    group (map_groups) so the cumsum sees the whole entity."""

    __name__ = "add_position_axis"

    def __call__(self, g: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(
            g, sort_keys=[("doc_id", "ascending")])
        g = g.take(order)
        n = g["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = np.concatenate(([0], np.cumsum(n)[:-1]))
        return g.append_column("ts", pa.array(ts, type=pa.int64()))


def add_position_axis(corpus: ray.data.Dataset,
                      num_buckets: int | None = None) -> ray.data.Dataset:
    """Attach ts. Groups by source (one shuffle); sorting by doc_id
    within the entity gives the deterministic total order."""
    slim = corpus.select_columns(["doc_id", "n_tok", "source"])
    return slim.groupby("source").map_groups(AddPositionAxis(),
                                             batch_format="pyarrow")


FEATURES = [
    Agg("sum", "n_tok", "sum_tok_100r"),
    Agg("avg", "n_tok", "avg_tok_100r"),
    Agg("max", "n_tok", "max_tok_100r"),
    Agg("count", None, "cnt_100r"),
]
RANGE_FEATURES = [
    Agg("sum", "n_tok", "sum_tok_50k"),
    Agg("min", "n_tok", "min_tok_50k"),
    Agg("count", None, "cnt_50k"),
]


ROWS_SPEC = WindowSpec("source", "ts", preceding_rows=100)
RANGE_SPEC = WindowSpec("source", "ts", preceding_range=50_000)


def corpus_features(with_ts: ray.data.Dataset,
                    num_buckets: int | None = None) -> ray.data.Dataset:
    """ROWS-100 and ROWS_RANGE-50k-token windows per source — both
    specs in ONE shuffle (window_agg_multi)."""
    from openmldb_ray.window.runner import window_agg_multi
    return window_agg_multi(
        with_ts, [(ROWS_SPEC, FEATURES), (RANGE_SPEC, RANGE_FEATURES)],
        passthrough=["doc_id", "source", "ts", "n_tok"],
        num_buckets=num_buckets)


def _derive_ts(run: pa.Table) -> pa.Table:
    """Per-run position axis: exclusive prefix sum of n_tok in doc_id
    order (the run arrives sorted by doc_id)."""
    n = run["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = np.concatenate(([0], np.cumsum(n)[:-1]))
    return run.append_column("ts", pa.array(ts, type=pa.int64()))


def _doc_idx(doc_id_col, prefix_len: int | None = None) -> np.ndarray:
    """doc_id "<source>-<i>" -> int64 doc index (documented derivation
    invariant, see build_dim). Width-agnostic: strips everything up to
    the last '-' with one RE2 pass, so 8-digit test ids and the
    12-digit at-scale corpus ids parse identically (a fixed -8 slice
    silently misparsed 9-digit indices past 1e8 docs).

    ``prefix_len``: when the caller knows every row shares the same
    "<source>-" prefix (a single-entity segment — the blockwise
    passes), a constant-offset slice replaces the RE2 pass. Measured
    0.105 s -> 0.004 s per 160k-row fragment, and the regex ran once
    PER SEGMENT (64x per fragment): ~44 cpu-s of the 32M-doc flagship.
    The digit width stays free, so the 1e8-id contract is unaffected;
    a wrong prefix still fails loudly at the int64 cast."""
    import pyarrow.compute as pc
    col = doc_id_col.combine_chunks() \
        if isinstance(doc_id_col, pa.ChunkedArray) else doc_id_col
    if prefix_len is not None:
        tail = pc.utf8_slice_codeunits(col.cast(pa.string()),
                                       start=prefix_len)
    else:
        tail = pc.replace_substring_regex(
            col.cast(pa.string()),
            pattern=r"^.*-", replacement="", max_replacements=1)
    return pc.cast(tail, pa.int64()).to_numpy(zero_copy_only=False)


def _derive_ts_with_asof(modulo: int):
    """Position axis + CO-PARTITIONED as-of dim join in one pass.

    The dim table (build_dim) is keyed by the same ``source`` the
    window shuffle partitions on, so every dim row a row can match
    lives in the SAME sorted run — the LAST JOIN (max dim_ts <= ts)
    reduces to a local searchsorted, with no dim collect, no broadcast
    and no second pass over the features. This is the 100 TB plan for
    dims sharing the partition key (the reference serves LAST JOIN
    from the same key's storage segment: IndexSeek/RequestUnion,
    hybridse/src/vm/runner.h:957); the general ``last_join`` operator
    stays for dims with foreign keys. Bit-equal to
    ``last_join(feats, build_dim(feats), broadcast=True)`` (tested).
    """
    def fn(run: pa.Table) -> pa.Table:
        run = _derive_ts(run)
        ts = run["ts"].to_numpy(zero_copy_only=False)
        idx = _doc_idx(run["doc_id"])
        is_dim = (idx % modulo) == 0
        dim_ts = ts[is_dim]
        pay = run["n_tok"].to_numpy(zero_copy_only=False)[is_dim] \
            .astype(np.int64)
        if len(dim_ts) == 0:
            payload = pa.nulls(run.num_rows, pa.int64())
        else:
            pos = np.searchsorted(dim_ts, ts, side="right") - 1
            payload = pa.array(
                np.where(pos >= 0, pay[np.maximum(pos, 0)], 0),
                type=pa.int64(), mask=pos < 0)
        return run.append_column("payload", payload)
    return fn


def corpus_features_fused(corpus: ray.data.Dataset,
                          num_buckets: int | None = None,
                          key_buckets: dict | None = None,
                          asof_modulo: int | None = None
                          ) -> ray.data.Dataset:
    """Position-axis derivation + BOTH window frames in a single
    shuffle: bucket by source, sort runs by doc_id, compute ts inside
    the run, evaluate both specs on the derived axis. This replaces
    three shuffles (axis groupby + two window stages) with one — the
    bytes-moved win that matters at 100 TB.

    ``asof_modulo``: also evaluate the co-partitioned as-of dim join
    inside the same pass (_derive_ts_with_asof) — adds a ``payload``
    column; no extra materialization or pass."""
    from openmldb_ray.window.runner import window_agg_multi
    passthrough = ["doc_id", "source", "ts", "n_tok"]
    rt = _derive_ts if asof_modulo is None \
        else _derive_ts_with_asof(asof_modulo)
    if asof_modulo is not None:
        passthrough = passthrough + ["payload"]
    return window_agg_multi(
        corpus, [(ROWS_SPEC, FEATURES), (RANGE_SPEC, RANGE_FEATURES)],
        passthrough=passthrough,
        sort_cols=["doc_id"], run_transform=rt,
        input_cols=["doc_id", "n_tok", "source"],
        num_buckets=num_buckets, key_buckets=key_buckets)


def build_dim(with_ts: ray.data.Dataset,
              modulo: int = 7) -> ray.data.Dataset:
    """Checkpoint dim table: every ``modulo``-th doc per source becomes
    a (source, ts, payload) row — the LAST JOIN right side (FIXTURES
    F3). The broadcast path collects this to the driver, so callers at
    large scale raise ``modulo`` to keep the dim a realistic dimension
    size (bench: ~1 row per 64 docs)."""
    def pick(b: pa.Table) -> pa.Table:
        # doc_id = "<source>-<i>": width-agnostic suffix parse shared
        # with _doc_idx (Arrow RE2 + cast; the pandas .str path costed
        # ~2s of the 32-CPU flagship wall at 32M rows).
        nums = _doc_idx(b["doc_id"])
        keep = (nums % modulo) == 0
        t = b.filter(pa.array(keep))
        return pa.table({
            "source": t["source"],
            "dim_ts": t["ts"],
            "payload": pa.compute.cast(t["n_tok"], pa.int64()),
        })
    return with_ts.map_batches(pick, batch_format="pyarrow")


def corpus_features_skewaware(corpus: ray.data.Dataset,
                              num_buckets: int | None = None,
                              hot_frac: float = 0.05,
                              min_rows: int = 100_000,
                              materialize: bool = True,
                              pin_dir: str | None = None,
                              asof_modulo: int | None = None,
                              blockwise: str = "auto",
                              pin: bool = True,
                              ) -> ray.data.Dataset:
    """Fused corpus features with explicit hot-key handling: sources
    holding > ``hot_frac`` of rows are split out and processed
    block-parallel with replicated boundary history (skew.py); the
    rest go through the single-shuffle fused path. Without this, one
    hot source (FIXTURES F1: ~30% of rows) serializes into one shuffle
    partition + one task and caps scaling.

    ``blockwise`` (the zero-shuffle plan, skew.blockwise_corpus_
    features): ``"auto"`` tries it first — if the source layout holds
    (each entity's doc_id ranges don't interleave across blocks, the
    append-only/ingest-ordered common case, VERIFIED at assembly) the
    whole job runs with NO all-to-all exchange and skew is moot (a hot
    entity spreads over every block); on verification failure falls
    back to the shuffle plan below. ``"off"`` forces the shuffle plan
    (A/B benchmarking); ``"require"`` raises on violation. Env
    ``GRAFT_BLOCKWISE`` overrides."""
    from concurrent.futures import ThreadPoolExecutor

    from openmldb_ray.skew import (hot_entity_corpus_features, key_counts,
                                   pack_key_buckets)
    # three consumers (hot detect, cold path, hot subsets): pin the slim
    # corpus once instead of re-reading the source per branch. At 100 TB
    # the analog is a parquet checkpoint of the slim projection.
    # the slim projection is consumed by three branches; pin it once.
    # pin_dir switches the pin from an object-store materialize to a
    # resumable parquet checkpoint — the 100 TB mode, where the slim
    # projection exceeds aggregate object-store memory and a killed run
    # must not redo the tokenize pass (manifest + _SUCCESS semantics).
    import os
    import time
    t0 = time.time()
    slim = corpus.select_columns(["doc_id", "n_tok", "source"])
    pinned = False
    if pin_dir is not None:
        from openmldb_ray.state.checkpoint import checkpoint
        slim = checkpoint(slim, pin_dir)
        pinned = True
    # pin (the in-memory mode) is DEFERRED into the blockwise call:
    # blockwise pass 1 rides the pin materialize (fuse_pin — one read
    # serves the pin and the summaries; the separate summary map cost
    # ~1s of the 32M-doc fixed budget). On refusal the pinned dataset
    # comes back on the exception for the shuffle fallback; when the
    # blockwise plan is disabled the pin happens below as before.
    # pin=False: the multi-consumer passes (summary+eval, or
    # hot-detect+cold+hot) re-read the source instead of paying an
    # object-store materialize. A/B at 2M docs/32cpus: pinned 3.2-3.9s
    # vs re-scan 8.7-10.1s — parquet decode dominates, so pinning wins
    # whenever the slim projection fits the object store. pin=False is
    # for inputs LARGER than aggregate object-store memory where the
    # pin would thrash to spill (pin_dir — a parquet checkpoint — is
    # usually the better answer there too).
    t0 = time.time()
    blockwise = os.environ.get("GRAFT_BLOCKWISE", blockwise)
    if blockwise != "off":
        from openmldb_ray.skew import (_NotPresorted,
                                       blockwise_corpus_features)
        specs = [(ROWS_SPEC, FEATURES), (RANGE_SPEC, RANGE_FEATURES)]
        try:
            out = blockwise_corpus_features(slim, specs,
                                            asof_modulo=asof_modulo,
                                            fuse_pin=pin and not pinned)
            _phase_log("blockwise plan (summaries+assembly)", t0)
            return out.materialize() if materialize else out
        except _NotPresorted as e:
            if blockwise == "require":
                raise
            if getattr(e, "pinned", None) is not None:
                slim = e.pinned
                pinned = True
            _phase_log(f"blockwise refused ({e}); shuffle fallback", t0)
            t0 = time.time()
    if pin and not pinned:
        slim = slim.materialize()
        _phase_log("slim pin (read+materialize)", t0)
        t0 = time.time()
    if num_buckets is None:
        # resolve HERE where the slim size is exactly known (pinned) —
        # downstream lazy branches would fall back to the raw-file
        # estimate, which includes the pruned-out token bytes
        from openmldb_ray.context import default_num_buckets
        num_buckets = default_num_buckets(ds=slim)
    # one partial-agg count pass serves BOTH hot-key detection and the
    # balanced (LPT) key->bucket assignment for the cold shuffle —
    # hashing ~num_buckets uniform keys into num_buckets partitions
    # leaves 2-4x stragglers (balls-in-bins); measured counts don't
    counts = key_counts(slim, "source")
    _phase_log("key_counts", t0)
    total = int(counts.sum())
    hot = counts[(counts > total * hot_frac)
                 & (counts >= min_rows)].index.tolist()
    cold_counts = counts.drop(hot)
    kb = pack_key_buckets(cold_counts,
                          min(num_buckets, max(1, len(cold_counts))))
    if not hot:
        out = corpus_features_fused(slim, num_buckets, key_buckets=kb,
                                    asof_modulo=asof_modulo)
        return out.materialize() if materialize else out
    hot_arr = np.array(sorted(hot))

    def drop_hot(b: pa.Table) -> pa.Table:
        src = b["source"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(~np.isin(src, hot_arr)))

    cold = slim.map_batches(drop_hot, batch_format="pyarrow")
    specs = [(ROWS_SPEC, FEATURES), (RANGE_SPEC, RANGE_FEATURES)]

    def cold_branch():
        t = time.time()
        out = corpus_features_fused(cold, num_buckets, key_buckets=kb,
                                    asof_modulo=asof_modulo)
        out = out.materialize() if materialize else out
        _phase_log("cold branch (fused window shuffle)", t)
        return out

    def hot_branch(k):
        t = time.time()
        sub = slim.map_batches(
            lambda b, kk=k: b.filter(pa.compute.equal(b["source"], kk)),
            batch_format="pyarrow")
        out = hot_entity_corpus_features(sub, k, specs,
                                         asof_modulo=asof_modulo)
        out = out.materialize() if materialize else out
        _phase_log(f"hot branch {k}", t)
        return out

    # the cold fused shuffle and every hot branch (range sort + block
    # summaries -> driver plan -> pass 2) execute CONCURRENTLY, one
    # driver thread each — round 1 serialized these into one sync point
    # per hot key, which dominated the fixed cost of the job and capped
    # scaling efficiency. Branches come back materialized, so the
    # returned union is a cheap block passthrough for every consumer.
    # On small nodes full overlap oversubscribes the CPUs (each branch
    # is itself a parallel shuffle) — cap concurrent branches by size.
    from openmldb_ray.context import cluster_cpus
    workers = max(1, min(1 + len(hot), cluster_cpus() // 8))
    if os.environ.get("GRAFT_BRANCH_WORKERS"):
        workers = int(os.environ["GRAFT_BRANCH_WORKERS"])
    with ThreadPoolExecutor(max_workers=workers) as ex:
        cold_fut = ex.submit(cold_branch)
        branch_futs = [ex.submit(hot_branch, k) for k in hot]
        out = cold_fut.result()
        for f in branch_futs:
            out = out.union(f.result())
    return out


def run_flagship(corpus: ray.data.Dataset, num_buckets: int | None = None,
                 include_tokens: bool = False,
                 materialize_axis: bool = True,
                 dim_modulo: int = 7,
                 fuse_asof: bool = True,
                 pin: bool = True) -> ray.data.Dataset:
    """The full BASELINE.md workload over an in-shape corpus Dataset:
    one output row per corpus doc with window features and the as-of
    dim payload.

    Two plans, bit-equal results (tested):

    - ``fuse_asof=True`` (default): the dim shares the window's
      partition key, so the as-of join evaluates INSIDE the window
      stage (_derive_ts_with_asof) — no feature materialization, no
      dim collect, no join pass; the whole pipeline (cold shuffle, hot
      block-parallel branches, write) executes as ONE streaming plan
      with backpressure. The 100 TB plan for same-key dims.
    - ``fuse_asof=False``: explicit ``build_dim`` + broadcast
      ``last_join`` — the general plan for dims with foreign keys;
      features are pinned (``materialize_axis``) because two branches
      consume them. At 100 TB the pin's analog is a parquet checkpoint
      (state.checkpoint.checkpoint).
    """
    if fuse_asof:
        joined = corpus_features_skewaware(corpus, num_buckets,
                                           materialize=False,
                                           asof_modulo=dim_modulo,
                                           pin=pin)
    else:
        feats = corpus_features_skewaware(corpus, num_buckets,
                                          materialize=materialize_axis)
        dim = build_dim(feats, modulo=dim_modulo)
        joined = last_join(feats, dim, on="source", order_by="dim_ts",
                           left_ts="ts", payload=["payload"],
                           broadcast=True)
    if include_tokens:
        # tokens were projected out before every shuffle; re-attach by
        # doc_id (list payloads need the explicit bucketed join)
        from openmldb_ray.joins.hash_join import hash_join
        tok = corpus.select_columns(["doc_id", "tokens"])
        joined = hash_join(joined, tok, on="doc_id", how="inner",
                           num_buckets=num_buckets or 64)
    return joined


def flagship(sf_dir: str, num_buckets: int | None = None,
             include_tokens: bool = False) -> ray.data.Dataset:
    """Flagship over the documents-derived corpus (test scale)."""
    corpus = build_corpus(sf_dir)
    return run_flagship(corpus, num_buckets, include_tokens)
