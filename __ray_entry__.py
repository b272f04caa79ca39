"""Driver contract: entry() / queries() / oracle_sql().

Ray is initialised by the driver BEFORE this module is imported — no
ray.init()/shutdown() anywhere in the import path or the callables.

Every queries() entry is a Ray-Data pipeline from openmldb_ray; every
oracle_sql() entry is the ANSI-SQL equivalent DuckDB runs on the same
parquet views. Output column names/dtypes match pairwise (the driver
hash-compares values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HOUR_US = 3_600_000_000
MIN_US = 60_000_000


def _read(sf_dir: str, name: str, columns=None):
    from openmldb_ray.context import tune_data_context
    from openmldb_ray.io import read_table
    tune_data_context()
    return read_table(sf_dir, name, columns=columns)


# --------------------------------------------------------------- entry


def entry() -> Any:
    """Flagship: corpus derivation -> position axis -> ROWS + ROWS_RANGE
    window features -> as-of LAST JOIN -> token arrays re-joined."""
    from openmldb_ray.context import tune_data_context
    from openmldb_ray.pipelines.corpus import flagship
    tune_data_context()
    return flagship("/root/testdata/sf0.001", num_buckets=16,
                    include_tokens=True)


# --------------------------------------------------------------- queries

def _q_window_rows(sf_dir):
    from openmldb_ray.window import Agg, WindowSpec, window_agg
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    spec = WindowSpec("user_id", "ts", preceding_rows=5)
    return window_agg(ev, spec, [
        Agg("sum", "value", "s5"), Agg("count", "value", "c5"),
        Agg("min", "value", "mn5"), Agg("max", "value", "mx5"),
        Agg("avg", "value", "a5")],
        passthrough=["event_id", "user_id", "ts"])


def _q_window_range(sf_dir):
    from openmldb_ray.window import Agg, WindowSpec, window_agg
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    spec = WindowSpec("user_id", "ts", preceding_range=HOUR_US)
    return window_agg(ev, spec, [Agg("sum", "value", "s"),
                                 Agg("count", None, "n")],
                      passthrough=["event_id", "user_id", "ts"])


def _q_window_between(sf_dir):
    """Both BETWEEN end-offset frame shapes (`n PRECEDING AND m
    PRECEDING`, rows and time-range) in ONE query — same partition key,
    so window_agg_concat fuses them into a single shuffle."""
    from openmldb_ray.window import Agg, WindowSpec, window_agg_concat
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    rows_spec = WindowSpec("user_id", "ts", preceding_rows=8,
                           end_offset_rows=2)
    rng_spec = WindowSpec("user_id", "ts", preceding_range=2 * HOUR_US,
                          end_offset_range=30 * MIN_US)
    return window_agg_concat(
        ev, [(rows_spec, [Agg("sum", "value", "s_r"),
                          Agg("count", None, "n_r")]),
             (rng_spec, [Agg("sum", "value", "s_t"),
                         Agg("count", None, "n_t")])],
        passthrough=["event_id", "user_id", "ts"])


def _q_window_where(sf_dir):
    from openmldb_ray.window import Agg, WindowSpec, window_agg
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def add_flag(t: pa.Table) -> pa.Table:
        return t.append_column("big", pc.greater(t["value"], 50.0))
    ev = ev.map_batches(add_flag, batch_format="pyarrow")
    spec = WindowSpec("user_id", "ts", preceding_rows=10)
    return window_agg(ev, spec, [
        Agg("sum_where", "value", "sw", where="big"),
        Agg("count_where", "value", "cw", where="big"),
        Agg("avg_where", "value", "aw", where="big"),
        Agg("min_where", "value", "mnw", where="big"),
        Agg("max_where", "value", "mxw", where="big")],
        passthrough=["event_id", "user_id", "ts"])


def _q_window_union(sf_dir):
    from openmldb_ray.window import Agg, WindowSpec, window_agg
    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value", "event_type"])
    prim = ev.filter(expr="event_type != 'click'") \
        .select_columns(["event_id", "user_id", "ts", "value"])
    sec = ev.filter(expr="event_type == 'click'") \
        .select_columns(["event_id", "user_id", "ts", "value"])
    spec = WindowSpec("user_id", "ts", preceding_range=HOUR_US)
    return window_agg(prim, spec, [Agg("sum", "value", "s"),
                                   Agg("count", None, "n")],
                      union_ds=[sec],
                      passthrough=["event_id", "user_id", "ts"])


def _q_lag_lead(sf_dir):
    from openmldb_ray.ops.session import shift
    from openmldb_ray.window import Agg, WindowSpec, window_agg
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    sh = shift(ev, "user_id", "ts",
               {"lag1": ("value", 1), "lag3": ("value", 3),
                "lead2": ("value", -2)})
    spec = WindowSpec("user_id", "ts", preceding_rows=0)
    return window_agg(sh, spec, [Agg("row_number", None, "rn")],
                      passthrough=["event_id", "user_id", "ts",
                                   "lag1", "lag3", "lead2"])


def _q_sessionize(sf_dir):
    from openmldb_ray.ops.session import sessionize
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return sessionize(ev, "user_id", "ts", gap=30 * MIN_US)


def _q_backfill(sf_dir):
    from openmldb_ray.ops.session import backfill
    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value", "event_type"])

    def mask(t: pa.Table) -> pa.Table:
        v = pc.if_else(pc.equal(t["event_type"], "view"), t["value"],
                       pa.nulls(t.num_rows, pa.float64()))
        return t.append_column("value_view", v)
    ev = ev.map_batches(mask, batch_format="pyarrow") \
        .select_columns(["event_id", "user_id", "ts", "value_view"])
    out = backfill(ev, "user_id", "ts", ["value_view"], suffix="_f")
    return out.select_columns(["event_id", "user_id", "ts", "value_view_f"]) \
        .rename_columns({"value_view_f": "value_filled"})


def _q_last_join_asof(sf_dir):
    from openmldb_ray.joins import last_join
    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value", "event_type"])
    left = ev.filter(expr="event_type == 'click'") \
        .select_columns(["event_id", "user_id", "ts"])
    right = ev.filter(expr="event_type == 'purchase'") \
        .select_columns(["user_id", "ts", "value"])
    return last_join(left, right, on="user_id", order_by="ts",
                     left_ts="ts", payload=["value"])


def _q_last_join_multikey(sf_dir):
    """Composite-key LAST JOIN (JoinPlan.scala:39-202 multi-column
    equi-keys): the right side has UNIQUE (suppkey, returnflag) keys,
    so LAST JOIN's pick-one is deterministic and equals a LEFT JOIN —
    count/max payloads keep the values order-independent."""
    from ray.data.aggregate import Count, Max
    from openmldb_ray.joins import last_join
    left = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_linenumber", "l_suppkey", "l_returnflag"])
    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_returnflag", "l_quantity"])
    right = li.groupby(["l_suppkey", "l_returnflag"]).aggregate(
        Count(alias_name="grp_cnt"),
        Max("l_quantity", alias_name="grp_maxq"))
    return last_join(left, right, on=["l_suppkey", "l_returnflag"],
                     payload=["grp_cnt", "grp_maxq"])


def _q_last_join_orderby(sf_dir):
    from openmldb_ray.joins import last_join
    ev = _read(sf_dir, "events", ["user_id", "ts", "value", "event_type"])
    right = ev.filter(expr="event_type == 'purchase'") \
        .select_columns(["user_id", "ts", "value"])
    left = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return last_join(left, right, on="c_custkey", right_on="user_id",
                     order_by="ts", payload=["value"])


def _tpch_q1_derive(t: pa.Table) -> pa.Table:
    """TPC-H Q1 inputs as exact integer cents: float sums reduce in
    nondeterministic order across blocks, so the aggregation runs on
    ints (order-independent, exact) and the floats are derived by one
    deterministic int->double division at the end — bit-identical to
    the DuckDB oracle computing the same expressions."""
    t = t.filter(pc.less_equal(
        t["l_shipdate"], pa.scalar(np.datetime64("1998-09-02", "us"))))

    def cents(col):
        return pc.cast(pc.round(pc.multiply(t[col], pa.scalar(100.0))),
                       pa.int64())
    qty_c = cents("l_quantity")
    price_c = cents("l_extendedprice")
    disc_c = cents("l_discount")
    tax_c = cents("l_tax")
    # disc_price in 1e-4 units; charge in 1e-6 units (exact int64)
    disc_price_u = pc.multiply(price_c,
                               pc.subtract(pa.scalar(100, pa.int64()),
                                           disc_c))
    charge_u = pc.multiply(disc_price_u,
                           pc.add(pa.scalar(100, pa.int64()), tax_c))
    return pa.table({
        "l_returnflag": t["l_returnflag"],
        "l_linestatus": t["l_linestatus"],
        "qty_c": qty_c, "price_c": price_c, "disc_c": disc_c,
        "disc_price_u": disc_price_u, "charge_u": charge_u,
    })


def _tpch_q1_finalize(t: pa.Table) -> pa.Table:
    def dd(col, unit):
        return pc.divide(pc.cast(t[col], pa.float64()),
                         pa.scalar(float(unit)))
    cnt = pc.cast(t["count_order"], pa.float64())
    sum_qty = dd("sum_qty_c", 100.0)
    sum_base = dd("sum_price_c", 100.0)
    sum_disc_c = dd("sum_disc_c", 100.0)
    return pa.table({
        "l_returnflag": t["l_returnflag"],
        "l_linestatus": t["l_linestatus"],
        "sum_qty": sum_qty,
        "sum_base_price": sum_base,
        "sum_disc_price": dd("sum_disc_price_u", 1e4),
        "sum_charge": dd("sum_charge_u", 1e6),
        "avg_qty": pc.divide(sum_qty, cnt),
        "avg_price": pc.divide(sum_base, cnt),
        "avg_disc": pc.divide(sum_disc_c, cnt),
        "count_order": t["count_order"],
    })


def _q_groupby_agg(sf_dir):
    """TPC-H Q1 through BOTH aggregation paths (r5 fusion of the
    former groupby_agg + groupby_agg_partial rows): the native Ray
    groupby().aggregate() result is returned, and the explicit
    map-side partial-combine path (functions.aggregates
    .grouped_aggregate — the 100 TB pattern) is asserted bit-equal to
    it inside the callable, so one driver row verifies both."""
    from ray.data.aggregate import Count, Sum
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax", "l_shipdate"])
    li = li.map_batches(_tpch_q1_derive, batch_format="pyarrow")
    agg = li.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_c", alias_name="sum_qty_c"),
        Sum("price_c", alias_name="sum_price_c"),
        Sum("disc_c", alias_name="sum_disc_c"),
        Sum("disc_price_u", alias_name="sum_disc_price_u"),
        Sum("charge_u", alias_name="sum_charge_u"),
        Count(alias_name="count_order"))
    native = agg.map_batches(_tpch_q1_finalize,
                             batch_format="pyarrow").to_pandas()

    from openmldb_ray.functions.aggregates import grouped_aggregate
    part = grouped_aggregate(li, ["l_returnflag", "l_linestatus"], {
        "sum_qty_c": ("sum", "qty_c"),
        "sum_price_c": ("sum", "price_c"),
        "sum_disc_c": ("sum", "disc_c"),
        "sum_disc_price_u": ("sum", "disc_price_u"),
        "sum_charge_u": ("sum", "charge_u"),
        "count_order": ("count", None),
    }).map_batches(_tpch_q1_finalize, batch_format="pyarrow") \
        .to_pandas()
    keys = ["l_returnflag", "l_linestatus"]
    a = native.sort_values(keys).reset_index(drop=True)
    b = part[a.columns].sort_values(keys).reset_index(drop=True)
    if not a.equals(b):
        raise AssertionError(
            "partial-combine path diverged from native groupby")
    return a


def _q_filter_project(sf_dir):
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_discount", "l_returnflag"])

    def fn(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.greater_equal(t["l_discount"], 0.05),
                    pc.less_equal(t["l_discount"], 0.07)),
            pc.less(t["l_quantity"], 24.0))
        t = t.filter(keep)
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "revenue": rev,
            "rf": pc.utf8_upper(t["l_returnflag"]),
        })
    return li.map_batches(fn, batch_format="pyarrow")


def _q_sort_limit(sf_dir):
    o = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return o.sort(["o_totalprice", "o_orderkey"],
                  descending=[True, False]).limit(10)


def _q_distinct(sf_dir):
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    from openmldb_ray.functions.aggregates import distinct
    return distinct(li, ["l_returnflag", "l_linestatus"])


def _q_left_join(sf_dir):
    o = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    c = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    j = o.join(c, join_type="left_outer", num_partitions=16,
               on=("o_custkey",), right_on=("c_custkey",))
    return j.select_columns(["o_orderkey", "o_custkey", "o_totalprice",
                             "c_name", "c_mktsegment"])


def _q_scalar_string_math(sf_dir):
    """Scalar battery in one projection: string funcs, LIKE match,
    math/log family, rounding and null handling."""
    from openmldb_ray.functions import scalar as F
    p = _read(sf_dir, "part",
              ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
               "p_retailprice"])

    def fn(t: pa.Table) -> pa.Table:
        size_d = pc.cast(t["p_size"], pa.float64())
        return pa.table({
            "p_partkey": t["p_partkey"],
            "name_up": F.upper(t["p_name"]),
            "brand5": F.substring(t["p_brand"], 1, 5),
            "type_len": pc.cast(F.char_length(t["p_type"]), pa.int64()),
            "size_dev": pc.cast(F.abs_(pc.subtract(t["p_size"], 25)),
                                pa.int64()),
            # DuckDB round(): ties away from zero
            "price_r": F.round_(t["p_retailprice"], ndigits=0,
                                round_mode="half_towards_infinity"),
            "brand_type": F.concat_ws("-", t["p_brand"], t["p_type"]),
            "is_brass": F.like_match(t["p_name"], "%brass%"),
            "price_ln": F.ln(t["p_retailprice"]),
            "price_log10": F.log10(t["p_retailprice"]),
            "size_sqrt": F.sqrt(size_d),
            "size_pow2": F.pow_(size_d, 2.0),
            "size_exp_neg": F.exp(pc.negate(size_d)),
            "type_rev": F.reverse(t["p_type"]),
            "nvl_name": F.if_null(t["p_name"], "unknown"),
        })
    return p.map_batches(fn, batch_format="pyarrow")


def _q_scalar_datetime(sf_dir):
    ev = _read(sf_dir, "events", ["event_id", "ts"])

    def fn(t: pa.Table) -> pa.Table:
        # reference dayofweek: Sunday=1..Saturday=7 (udfs_8h.md);
        # Arrow day_of_week: Monday=0 -> ((dw+1) % 7) + 1
        dw = pc.day_of_week(t["ts"]).to_numpy(zero_copy_only=False)
        dow = pa.array((dw + 1) % 7 + 1, type=pa.int64())
        return pa.table({
            "event_id": t["event_id"],
            "y": pc.cast(pc.year(t["ts"]), pa.int64()),
            "mo": pc.cast(pc.month(t["ts"]), pa.int64()),
            "d": pc.cast(pc.day(t["ts"]), pa.int64()),
            "h": pc.cast(pc.hour(t["ts"]), pa.int64()),
            "mi": pc.cast(pc.minute(t["ts"]), pa.int64()),
            "dow": dow,
        })
    return ev.map_batches(fn, batch_format="pyarrow")


def _corpus_feats(sf_dir):
    from openmldb_ray.context import tune_data_context
    from openmldb_ray.pipelines.corpus import (build_corpus,
                                               corpus_features_fused)
    tune_data_context()
    corpus = build_corpus(sf_dir)
    return corpus_features_fused(corpus, num_buckets=16)


# Oracle-facing dtype canonicalization: the oracle SQL casts the
# window aggregates to DOUBLE while the kernel keeps integer sums as
# integers (round-2 change); the driver's hash distinguishes dtypes
# even when values are exactly equal.
_CORPUS_F64 = ("sum_tok_100r", "avg_tok_100r", "max_tok_100r",
               "sum_tok_50k", "min_tok_50k")


def _canon_corpus(ds):
    def fn(t: pa.Table) -> pa.Table:
        i = t.column_names.index("n_tok")
        t = t.set_column(i, "n_tok", pc.cast(t["n_tok"], pa.int32()))
        for name in _CORPUS_F64:
            if name in t.column_names:
                j = t.column_names.index(name)
                t = t.set_column(j, name, pc.cast(t[name], pa.float64()))
        return t
    return ds.map_batches(fn, batch_format="pyarrow")


def _q_corpus_features(sf_dir):
    return _canon_corpus(_corpus_feats(sf_dir))


def _q_corpus_asof(sf_dir):
    from openmldb_ray.pipelines.corpus import flagship
    return _canon_corpus(flagship(sf_dir, num_buckets=16))


def _q_repetition(sf_dir):
    """Intra-document repetition (duplicate word-bigram fraction) —
    the Gopher/RefinedWeb quality rule, vectorized FNV bigram hashes
    (ops.text.RepetitionScore)."""
    from openmldb_ray.ops.text import RepetitionScore, with_text_features
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = with_text_features(docs, [RepetitionScore])
    return out.select_columns(["doc_id", "n_bigrams",
                               "n_distinct_bigrams",
                               "dup_bigram_ratio"])


def _q_corpus_clean(sf_dir):
    """Composed C4/RefinedWeb-style cleaning pass, one streaming
    pipeline: exact dedup (keep min doc_id per identical text) ->
    quality metrics -> repetition scoring -> rule filter. The whole
    pass is expressible in ANSI SQL, so every survivor is
    oracle-checked."""
    import pyarrow.compute as pc

    from openmldb_ray.ops.dedup import dedup_exact
    from openmldb_ray.ops.text import (QualityScore, RepetitionScore,
                                       with_text_features)
    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    survivors = dedup_exact(docs, "text", "doc_id")
    feats = with_text_features(survivors,
                               [QualityScore, RepetitionScore])

    def keep(b: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.and_(pc.greater_equal(b["n_words"], 10),
                    pc.less_equal(b["n_words"], 10_000)),
            pc.and_(pc.less(b["dup_bigram_ratio"], 0.08),
                    pc.less(b["digit_ratio"], 0.2)))
        t = b.filter(ok)
        return pa.table({
            "doc_id": t["doc_id"], "source": t["source"],
            "n_words": t["n_words"],
            "dup_bigram_ratio": t["dup_bigram_ratio"],
        })
    return feats.map_batches(keep, batch_format="pyarrow")


def _q_dedup_exact(sf_dir):
    from openmldb_ray.ops.dedup import dedup_exact
    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    out = dedup_exact(docs, "text", "doc_id")
    return out.select_columns(["doc_id", "source"])


def _q_langid_fingerprint(sf_dir):
    """Language-ID heuristic + rolling-hash document fingerprint in one
    text-features pass (rows-only: neither is SQL-expressible)."""
    from openmldb_ray.ops.text import Fingerprint, LangId, with_text_features
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = with_text_features(docs, [LangId, Fingerprint])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "lang_pred": t["lang_pred"],
                         "fingerprint": pc.cast(
                             pc.bit_wise_and(t["fingerprint"],
                                             np.uint64((1 << 63) - 1)),
                             pa.int64())})
    return out.map_batches(fn, batch_format="pyarrow")


def _ann_queries(sf_dir):
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    t = t.sort_by("vec_id").slice(0, 4)
    qm = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return t["vec_id"].to_pylist(), qm


def _q_ann_bruteforce(sf_dir):
    from openmldb_ray.ops.ann import knn_bruteforce
    qids, qm = _ann_queries(sf_dir)
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_bruteforce(emb, qm, qids, k=10)

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "query_id": t["query_id"],
            "vec_id": t["vec_id"],
            "rank": t["rank"],
            "sim_r": pc.round(t["cosine_sim"], ndigits=4),
        })
    return out.map_batches(fn, batch_format="pyarrow")


def _q_ann_approx(sf_dir):
    """Both approximate-kNN paths (LSH-bucketed and IVF/nprobe) in one
    entry, tagged by method (rows-only: approx recall has no SQL
    oracle; recall-vs-exact is pytest-covered in tests/test_ann.py)."""
    from openmldb_ray.ops.ann import knn_ivf, knn_lsh
    qids, qm = _ann_queries(sf_dir)
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    lsh = knn_lsh(emb, qm, qids, k=10)
    ivf = knn_ivf(emb, qm, qids, k=10, num_clusters=8, nprobe=3)

    def tag(method):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "method", pa.array([method] * len(t), pa.string()))
        fn.__name__ = f"tag_{method}"
        return fn
    return lsh.map_batches(tag("lsh"), batch_format="pyarrow").union(
        ivf.map_batches(tag("ivf"), batch_format="pyarrow"))


def _q_ngram_jaccard(sf_dir):
    from openmldb_ray.ops.dedup import ngram_jaccard_pairs
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs(docs, threshold=0.3)


def _q_embedding_dups(sf_dir):
    """Exact all-pairs mode (num_bits=0) so the DuckDB cross-join
    oracle applies; the LSH-bucketed mode is the scale path."""
    from openmldb_ray.ops.ann import embedding_dup_pairs
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = embedding_dup_pairs(emb, threshold=0.45, num_bits=0)

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({"id_a": t["id_a"], "id_b": t["id_b"],
                         "sim_r": pc.round(t["cosine_sim"], ndigits=4)})
    return out.map_batches(fn, batch_format="pyarrow")


def _q_minhash_pairs(sf_dir):
    from openmldb_ray.ops.dedup import minhash_duplicate_pairs
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_duplicate_pairs(docs, jaccard_threshold=0.5)


def _q_minhash_dedup(sf_dir):
    """End-to-end near-dup dedup: drop the id_b side of every confirmed
    pair via the distributed anti-join. Oracled: at this corpus the
    LSH candidates achieve full recall, so the result equals the exact
    word-3-gram Jaccard >= 0.5 drop set DuckDB computes."""
    from openmldb_ray.ops.dedup import dedup_minhash
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dedup_minhash(docs, jaccard_threshold=0.5)
    return out.select_columns(["doc_id"])


def _q_simhash_pairs(sf_dir):
    """SimHash near-dup pairs via the 4x16-bit table split, GREEN as
    of r5: at max_hamming <= 3 the table split guarantees full recall
    (pigeonhole), and the oracle recomputes the 64-bit FNV-1a word
    hashes, the per-bit majority votes and the pair Hamming distances
    entirely in DuckDB (HUGEINT modular arithmetic; bit-exact vs
    functions.hashing.simhash_batch, ASCII corpus)."""
    from openmldb_ray.ops.dedup import simhash_duplicate_pairs
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_duplicate_pairs(docs, max_hamming=3)


def _q_multimodal_decode(sf_dir):
    """Real container-metadata decode: deterministic mixed-modality
    payloads (valid PNG / RIFF-WAV / JPEG bytes keyed by doc_id) parsed
    back by the stdlib header kernel in an actor-pool stage. The oracle
    mirrors the synth formulas arithmetically — synth and parse are
    independent code paths, so an error in either breaks the match."""
    from openmldb_ray.ops.multimodal import HeaderDecoder, SynthMedia, \
        decode_stage
    docs = _read(sf_dir, "documents", ["doc_id"])
    media = docs.map_batches(SynthMedia, batch_format="pyarrow",
                             batch_size=1024, concurrency=2)
    out = decode_stage(media, decoder_cls=HeaderDecoder, batch_size=256)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "media_type": t["media_type"],
            "width": pc.cast(t["width"], pa.int64()),
            "height": pc.cast(t["height"], pa.int64()),
            "channels": pc.cast(t["channels"], pa.int64()),
            "sample_rate": pc.cast(t["sample_rate"], pa.int64()),
            "duration_ms": pc.round(t["duration_ms"], ndigits=6),
            "payload_bytes": t["payload_bytes"],
        })
    return out.map_batches(fin, batch_format="pyarrow")


def _q_window_ect_ties(sf_dir):
    """EXCLUDE CURRENT_TIME under heavy ts ties: the order axis is ts
    truncated to 10-minute buckets, so each user has many equal-ts
    peers. ECT frame = strictly-older rows in range + the current row
    itself (mem_catalog.h:459-468) — exactly the correlated oracle."""
    from openmldb_ray.window import Agg, WindowSpec, window_agg
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def bucket_ts(t: pa.Table) -> pa.Table:
        tsu = pc.cast(t["ts"], pa.int64())
        tsb = pc.multiply(pc.divide(tsu, 10 * MIN_US),
                          pa.scalar(10 * MIN_US, pa.int64()))
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "ts2": tsb, "value": t["value"]})
    ev = ev.map_batches(bucket_ts, batch_format="pyarrow")
    spec = WindowSpec("user_id", "ts2", preceding_range=HOUR_US,
                      exclude_current_time=True)
    return window_agg(ev, spec, [Agg("sum", "value", "s"),
                                 Agg("count", None, "n")],
                      passthrough=["event_id", "user_id", "ts2"])


def _q_window_open_preceding(sf_dir):
    """OPEN (exclusive) start bound == closed bound one microsecond
    shorter on a microsecond axis."""
    from openmldb_ray.window import Agg, WindowSpec, window_agg
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    spec = WindowSpec("user_id", "ts", preceding_range=HOUR_US,
                      open_preceding=True)
    return window_agg(ev, spec, [Agg("sum", "value", "s"),
                                 Agg("count", None, "n")],
                      passthrough=["event_id", "user_id", "ts"])


def _q_window_inw(sf_dir):
    """INSTANCE_NOT_IN_WINDOW: only WINDOW UNION rows + the instance
    itself form the frame (runner.cc:575-578, 1003-1005) — proven by
    cases/function/select/test_sub_select.yaml id 8. Union side = the
    'click' subset of events; oracle = correlated subquery over that
    subset plus the instance row."""
    from openmldb_ray.window import Agg, WindowSpec, window_agg
    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value", "event_type"])
    clicks = ev.filter(expr="event_type == 'click'")
    spec = WindowSpec("user_id", "ts", preceding_range=HOUR_US,
                      instance_not_in_window=True)
    out = window_agg(ev, spec, [Agg("sum", "value", "s"),
                                Agg("count", None, "n")],
                     union_ds=[clicks],
                     passthrough=["event_id", "user_id", "ts"])

    def rnd(t: pa.Table) -> pa.Table:
        # prefix-sum evaluation vs DuckDB's direct sum differ in ulps
        return t.set_column(t.column_names.index("s"), "s",
                            pc.round(t["s"], ndigits=4))
    return out.map_batches(rnd, batch_format="pyarrow")


def _q_window_distinct(sf_dir):
    from openmldb_ray.window import Agg, WindowSpec, window_agg
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    spec = WindowSpec("user_id", "ts", preceding_rows=10)
    return window_agg(ev, spec, [Agg("distinct_count", "value", "dc")],
                      passthrough=["event_id", "user_id", "ts"])


def _q_window_at(sf_dir):
    """Frame-bounded at()/lag (OpenMLDB semantics: NULL once the offset
    leaves the frame) — correlated LIMIT/OFFSET oracle."""
    from openmldb_ray.window import Agg, WindowSpec, window_agg
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    spec = WindowSpec("user_id", "ts", preceding_rows=5)
    return window_agg(ev, spec, [Agg("at", "value", "at2", k=2),
                                 Agg("first_value", "value", "fv")],
                      passthrough=["event_id", "user_id", "ts"])


def _q_window_salted(sf_dir):
    """Quantile-salted window path, BOTH frame shapes (time-range and
    count/ROWS) in one entry (hot threshold forced low so every user is
    'hot'; outputs joined on event_id) — must match the plain-window
    SQL oracle exactly."""
    from openmldb_ray.joins.hash_join import hash_join
    from openmldb_ray.skew import salted_window_agg
    from openmldb_ray.window import Agg, WindowSpec
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    rng = salted_window_agg(
        ev, WindowSpec("user_id", "ts", preceding_range=HOUR_US),
        [Agg("sum", "value", "s_rg"), Agg("count", None, "n_rg")],
        passthrough=["event_id", "user_id", "ts"],
        hot_frac=0.001, min_rows=10, parts=4)
    rows = salted_window_agg(
        ev, WindowSpec("user_id", "ts", preceding_rows=20),
        [Agg("sum", "value", "s_rw"), Agg("count", None, "n_rw"),
         Agg("min", "value", "mn_rw")],
        passthrough=["event_id"],
        hot_frac=0.001, min_rows=10, parts=4)
    return hash_join(rng, rows, "event_id", how="inner")


def _q_window_nested(sf_dir):
    """Nested aggregate-in-aggregate window expressions (reference
    test_udaf_function.yaml ids 43/47-49/53): inner aggregates are
    per-instance scalars over the frame, outer reduces the per-row
    expression. Runs through the SQL front end."""
    from openmldb_ray.sql import sql
    q = ("select event_id, user_id, ts, "
         "sum(value - count(value)) over w as r, "
         "count_where(event_id, value >= min(value) + 1) over w as m "
         "from events window w as (partition by user_id order by ts "
         "rows between 5 preceding and current row)")
    out = sql(q, sf_dir, dialect="ansi")

    # Float frame sums reduce in a different order than DuckDB (ulp
    # drift ≤3e-13 on ~16% of rows); round both sides for the compare.
    # m is a count: the kernel computes count_where in float — cast to
    # int64 to match the oracle's BIGINT (the driver hash is
    # dtype-sensitive).
    def canon(b: pa.Table) -> pa.Table:
        b = b.set_column(b.column_names.index("r"), "r",
                         pc.round(b["r"], ndigits=6))
        return b.set_column(b.column_names.index("m"), "m",
                            pc.cast(pc.round(b["m"]), pa.int64()))
    return out.map_batches(canon, batch_format="pyarrow")


def _q_window_concat_keys(sf_dir):
    """Two windows over DIFFERENT partition keys in one query — the
    reference's ConcatJoin (nodes/ConcatJoinPlan.scala:32-78), here a
    chain of single-key window stages preserving row identity."""
    from openmldb_ray.window import Agg, WindowSpec, window_agg_concat
    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value", "event_type"])
    by_user = WindowSpec("user_id", "ts", preceding_rows=5)
    by_type = WindowSpec("event_type", "ts", preceding_range=10 * MIN_US)
    return window_agg_concat(
        ev, [(by_user, [Agg("sum", "value", "su")]),
             (by_type, [Agg("count", None, "ct")])],
        passthrough=["event_id", "user_id", "ts"])


def _q_fz_window(sf_dir):
    """fz_* window forms over events.props; oracled via DuckDB
    string_agg/string_split with newest-first frame order."""
    from openmldb_ray.window import Agg, WindowSpec, window_agg
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "props"])
    spec = WindowSpec("user_id", "ts", preceding_rows=3)
    out = window_agg(ev, spec, [
        Agg("fz_window_split", "props", "parts", params=(",",)),
        Agg("fz_join", "props", "joined", params=("|",))],
        passthrough=["event_id", "user_id", "ts"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "n_parts": pc.list_value_length(t["parts"]).cast(pa.int64()),
            "joined": t["joined"],
        })
    return out.map_batches(fn, batch_format="pyarrow")


def _q_top_cate(sf_dir):
    """top / *_cate string aggregates; oracled via DuckDB string_agg
    over correlated frame subqueries matching the reference renderings
    (hybridse/src/udf/containers.h:99-137)."""
    from openmldb_ray.window import Agg, WindowSpec, window_agg
    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "value", "event_type"])
    spec = WindowSpec("user_id", "ts", preceding_rows=10)
    return window_agg(ev, spec, [
        Agg("top", "value", "top3", k=3),
        Agg("distinct_count", "event_type", "dc_types"),
        Agg("count_cate", "value", "cnt_by_type", cate="event_type"),
        Agg("avg_cate", "value", "avg_by_type", cate="event_type")],
        passthrough=["event_id", "user_id", "ts"])


def _q_window_maxsize(sf_dir):
    from openmldb_ray.window import Agg, WindowSpec, window_agg
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    spec = WindowSpec("user_id", "ts", preceding_range=4 * HOUR_US,
                      max_size=5)
    return window_agg(ev, spec, [Agg("sum", "value", "s"),
                                 Agg("count", None, "n")],
                      passthrough=["event_id", "user_id", "ts"])


_APPROX_AGG_SQL = """
  SELECT user_id,
         percentile_approx(value, 0.5) AS p50,
         percentile_approx(value, 0.9) AS p90,
         approx_count_distinct(event_type) AS adc,
         count(*) AS n
  FROM events GROUP BY user_id"""


def _q_approx_agg(sf_dir):
    """percentile_approx + approx_count_distinct UDAFs (reference
    java/openmldb-batch udf/PercentileApprox.scala) through the SQL
    front end. Both sketches are exact below capacity (4096), so the
    exact-SQL oracle matches at driver scale; the approximate regime
    above capacity is pytest-covered (tests/test_sketches.py)."""
    from openmldb_ray.sql import sql
    return sql(_APPROX_AGG_SQL, sf_dir, dialect="ansi")


def _q_window_edge_frames(sf_dir):
    """Three frame-edge semantics fused into ONE driver row (r5: frees
    rows for the hygiene slate without losing any verification — the
    oracle checks all three column groups): OPEN PRECEDING, WINDOW
    UNION + INSTANCE_NOT_IN_WINDOW, and EXCLUDE CURRENT_TIME under
    heavy ts ties, joined on event_id."""
    from openmldb_ray.joins.hash_join import hash_join
    open_o = _q_window_open_preceding(sf_dir) \
        .rename_columns({"s": "s_open", "n": "n_open"})
    inw_o = _q_window_inw(sf_dir) \
        .rename_columns({"s": "s_inw", "n": "n_inw"}) \
        .select_columns(["event_id", "s_inw", "n_inw"])
    ect_o = _q_window_ect_ties(sf_dir) \
        .rename_columns({"s": "s_ect", "n": "n_ect"}) \
        .select_columns(["event_id", "ts2", "s_ect", "n_ect"])
    idt, f64, i64 = pa.int64(), pa.float64(), pa.int64()
    lsch = pa.schema([("event_id", idt), ("user_id", i64),
                      ("ts", pa.timestamp("us")),
                      ("s_open", f64), ("n_open", i64)])
    j = hash_join(open_o, inw_o, on="event_id", left_schema=lsch,
                  right_schema=pa.schema([("event_id", idt),
                                          ("s_inw", f64),
                                          ("n_inw", i64)]))
    return hash_join(
        j, ect_o, on="event_id",
        left_schema=lsch.append(pa.field("s_inw", f64))
        .append(pa.field("n_inw", i64)),
        right_schema=pa.schema([("event_id", idt), ("ts2", i64),
                                ("s_ect", f64), ("n_ect", i64)]))


_UNION_OPS_SQL = """
  SELECT 'hi' AS branch, CAST(k AS DOUBLE) AS k, v FROM (
    SELECT o_custkey AS k, o_totalprice AS v FROM orders
    WHERE o_totalprice > 100000
    UNION ALL
    SELECT c_custkey AS k, c_acctbal AS v FROM customer
    WHERE c_acctbal < 0) t
  UNION ALL
  SELECT 'rk' AS branch, CAST(rk AS DOUBLE) AS k, 0.0 AS v FROM (
    SELECT n_regionkey AS rk FROM nation
    UNION
    SELECT r_regionkey AS rk FROM region
    UNION ALL
    SELECT n_regionkey AS rk FROM nation WHERE n_nationkey < 3) u"""


def _q_union_ops(sf_dir):
    """UNION ALL and mixed UNION DISTINCT / UNION ALL chains fused in
    one statement (r5 row-freeing fusion of the former union_all +
    union_distinct rows): both set-op semantics, subquery FROMs and
    positional alignment through the SQL front end."""
    from openmldb_ray.sql import sql
    return sql(_UNION_OPS_SQL, sf_dir, dialect="ansi")


def _q_text_stats(sf_dir):
    """TokenCount (zero-copy byte-class kernel) + QualityScore chained
    in one row (r5 fusion of token_count + text_quality; the n_words
    the oracle checks flows through BOTH stages)."""
    from openmldb_ray.ops.text import (QualityScore, TokenCount,
                                       with_text_features)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = with_text_features(docs, [TokenCount, QualityScore])
    return out.select_columns(["doc_id", "n_words", "n_chars",
                               "avg_word_len", "digit_ratio",
                               "upper_ratio", "punct_ratio"])


def _q_dedup_paragraphs(sf_dir):
    """Paragraph-level exact dedup over the documents table (first
    occurrence by (doc_id, paragraph index) survives; docs rebuilt from
    surviving paragraphs, emptied docs dropped)."""
    from openmldb_ray.ops.corpus_ops import dedup_paragraphs
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup_paragraphs(docs, num_buckets=16)


def _q_decontaminate(sf_dir):
    """Benchmark decontamination: the eval set is docs 0..19, the
    corpus is the rest; tag_only surfaces the distinct-matched-8-gram
    count per doc so the oracle checks the hit arithmetic, not just
    the surviving set."""
    from openmldb_ray.ops.corpus_ops import decontaminate
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    ev = docs.filter(expr="doc_id < 20")
    rest = docs.filter(expr="doc_id >= 20")
    eval_texts = [r["text"] for r in ev.take_all()]
    out = decontaminate(rest, eval_texts, n=8, min_hits=1,
                        tag_only=True)
    return out.select_columns(["doc_id", "ngram_hits", "contaminated"])


def _q_pii_gopher(sf_dir):
    """PII redaction + the Gopher quality rules in one pass: rule
    booleans computed on the ORIGINAL text, then the text column is
    rewritten with typed placeholders. Every output column is
    recomputable in DuckDB (RE2 patterns verbatim)."""
    from openmldb_ray.ops.text import GopherRules, PiiRedact
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    out = docs.map_batches(GopherRules(), batch_format="pyarrow",
                           batch_size=4096) \
        .map_batches(PiiRedact(), batch_format="pyarrow",
                     batch_size=4096)
    return out.select_columns([
        "doc_id", "text", "pii_count", "rule_word_count",
        "rule_avg_word_len", "rule_symbol_ratio", "rule_bullet_lines",
        "rule_ellipsis_lines", "rule_alpha_words", "rule_stop_words",
        "gopher_pass"])


def _q_mix_sources(sf_dir):
    """Token-budget source mixing: the oracle-checked surface is the
    PLAN (per-source input token totals from the distributed pass-1
    partials, the largest-feasible budget, and the per-source keep
    fractions) — pure arithmetic over the table, SQL-expressible. The
    hash-threshold keep rule itself is pytest-covered
    (tests/test_hygiene_ops.py)."""
    import pandas as pd

    from openmldb_ray.ops.corpus_ops import mix_sources
    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    _, stats = mix_sources(docs, {"src0": 3.0, "src1": 1.0},
                           tok_col="n_chars")
    rows = sorted(stats["fractions"])
    return pd.DataFrame({
        "source": rows,
        "input_tokens": [float(stats["source_tokens"].get(s, 0))
                         for s in rows],
        "fraction": [stats["fractions"][s] for s in rows],
        "budget_tokens": [stats["budget_tokens"]] * len(rows),
    })


def _q_knn_ivf_indexed(sf_dir):
    """The persisted-IVF-index serving path at FULL probe: builds the
    cluster-partitioned index, routes queries through the pruned
    partition read, and with nprobe == num_clusters the result is
    exactly brute-force top-k — a green oracle for the index build +
    partitioned layout + routed read; partial-probe recall stays
    pytest-bounded (tests/test_ann.py)."""
    import os

    from openmldb_ray.ops.ann import build_ivf_index, knn_ivf_indexed
    qids, qm = _ann_queries(sf_dir)
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    idx = "/tmp/openmldb_ray_qivf_" + os.path.basename(
        os.path.normpath(sf_dir))
    build_ivf_index(emb, idx, num_clusters=8, force=True)
    out = knn_ivf_indexed(idx, qm, qids, k=10, nprobe=8)

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "query_id": t["query_id"],
            "vec_id": t["vec_id"],
            "rank": t["rank"],
            "sim_r": pc.round(t["cosine_sim"], ndigits=4),
        })
    return out.map_batches(fn, batch_format="pyarrow")


def _q_window_presorted(sf_dir):
    """ZERO-SHUFFLE window over the time-ordered events layout
    (window.blockwise.blockwise_window_agg): events.parquet is
    globally ts-sorted, so per-entity history is assembled from
    block-boundary tails instead of an all-to-all exchange. Key is
    bucketed to keep entity runs longer than the frame depth (the
    operator refuses degenerate economics). Same semantics as the
    shuffle plan — the oracle is a plain SQL window."""
    import pyarrow.compute as pc

    from openmldb_ray.skew import _NotPresorted
    from openmldb_ray.window import Agg, WindowSpec
    from openmldb_ray.window.blockwise import blockwise_window_agg
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def bucket(b: pa.Table) -> pa.Table:
        ub = pc.cast(pc.bit_wise_and(b["user_id"], 7), pa.int64())
        return b.append_column("u_bucket", ub)
    ev = ev.map_batches(bucket, batch_format="pyarrow")
    spec = WindowSpec("u_bucket", "ts", preceding_rows=20)
    aggs = [Agg("sum", "value", "sum_v20"),
            Agg("count", None, "cnt20"),
            Agg("max", "value", "max_v20")]
    try:
        out = blockwise_window_agg(
            ev, spec, aggs, passthrough=["event_id", "u_bucket", "ts"])
    except _NotPresorted:
        # The blockwise economics guard refuses when entity runs per
        # block are shorter than the frame depth (small-sf inputs);
        # semantics are identical through the shuffle plan.
        from openmldb_ray.window import window_agg
        out = window_agg(ev, spec, aggs,
                         passthrough=["event_id", "u_bucket", "ts"])
    return out.map_batches(
        lambda b: b.set_column(
            b.column_names.index("sum_v20"), "sum_v20",
            pc.round(b["sum_v20"], ndigits=6)),
        batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "window_rows": _q_window_rows,
        "window_range": _q_window_range,
        "window_between": _q_window_between,
        "window_where": _q_window_where,
        "window_union": _q_window_union,
        "window_maxsize": _q_window_maxsize,
        "window_distinct": _q_window_distinct,
        "window_at": _q_window_at,
        "window_salted": _q_window_salted,
        "window_edge_frames": _q_window_edge_frames,
        "window_concat_keys": _q_window_concat_keys,
        "window_presorted": _q_window_presorted,
        "window_nested": _q_window_nested,
        "fz_window": _q_fz_window,
        "top_cate": _q_top_cate,
        "lag_lead": _q_lag_lead,
        "sessionize": _q_sessionize,
        "backfill": _q_backfill,
        "last_join_asof": _q_last_join_asof,
        "last_join_multikey": _q_last_join_multikey,
        "last_join_orderby": _q_last_join_orderby,
        "groupby_agg": _q_groupby_agg,
        "approx_agg": _q_approx_agg,
        "filter_project": _q_filter_project,
        "sort_limit": _q_sort_limit,
        "distinct": _q_distinct,
        "left_join": _q_left_join,
        "union_ops": _q_union_ops,
        "scalar_string_math": _q_scalar_string_math,
        "scalar_datetime": _q_scalar_datetime,
        "corpus_features": _q_corpus_features,
        "corpus_asof": _q_corpus_asof,
        "text_stats": _q_text_stats,
        "dedup_exact": _q_dedup_exact,
        "repetition": _q_repetition,
        "corpus_clean": _q_corpus_clean,
        "dedup_paragraphs": _q_dedup_paragraphs,
        "decontaminate": _q_decontaminate,
        "pii_gopher": _q_pii_gopher,
        "mix_sources": _q_mix_sources,
        "langid_fingerprint": _q_langid_fingerprint,
        "ann_bruteforce": _q_ann_bruteforce,
        "ann_approx": _q_ann_approx,
        "knn_ivf_indexed": _q_knn_ivf_indexed,
        "minhash_pairs": _q_minhash_pairs,
        "minhash_dedup": _q_minhash_dedup,
        "embedding_dups": _q_embedding_dups,
        "ngram_jaccard": _q_ngram_jaccard,
        "simhash_pairs": _q_simhash_pairs,
        "multimodal_decode": _q_multimodal_decode,
    }


# --------------------------------------------------------------- oracles

_TPCH_Q1_EXACT_SQL = """
  WITH c AS (
    SELECT l_returnflag, l_linestatus,
      CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
      CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
      CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
      CAST(round(l_tax * 100) AS BIGINT) AS tax_c
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02')
  SELECT l_returnflag, l_linestatus,
    sum(qty_c) / 100.0 AS sum_qty,
    sum(price_c) / 100.0 AS sum_base_price,
    sum(price_c * (100 - disc_c)) / 10000.0 AS sum_disc_price,
    sum(price_c * (100 - disc_c) * (100 + tax_c)) / 1000000.0
      AS sum_charge,
    (sum(qty_c) / 100.0) / count(*) AS avg_qty,
    (sum(price_c) / 100.0) / count(*) AS avg_price,
    (sum(disc_c) / 100.0) / count(*) AS avg_disc,
    count(*) AS count_order
  FROM c
  GROUP BY l_returnflag, l_linestatus"""

_CORPUS_CTE = """
WITH corpus AS (
  SELECT source || '-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER)
           AS n_tok,
         source
  FROM documents),
wts AS (
  SELECT doc_id, source, n_tok,
         CAST(coalesce(sum(n_tok) OVER (
              PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS ts
  FROM corpus),
feats AS (
  SELECT doc_id, source, ts, n_tok,
    CAST(sum(n_tok) OVER w100 AS DOUBLE)  AS sum_tok_100r,
    CAST(avg(n_tok) OVER w100 AS DOUBLE)  AS avg_tok_100r,
    CAST(max(n_tok) OVER w100 AS DOUBLE)  AS max_tok_100r,
    count(*) OVER w100                    AS cnt_100r,
    CAST(sum(n_tok) OVER w50k AS DOUBLE)  AS sum_tok_50k,
    CAST(min(n_tok) OVER w50k AS DOUBLE)  AS min_tok_50k,
    count(*) OVER w50k                    AS cnt_50k
  FROM wts
  WINDOW
    w100 AS (PARTITION BY source ORDER BY ts
             ROWS BETWEEN 100 PRECEDING AND CURRENT ROW),
    w50k AS (PARTITION BY source ORDER BY ts
             RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW))
"""


def oracle_sql() -> dict[str, str]:
    return {
        "window_rows": """
          SELECT event_id, user_id, ts,
            sum(value) OVER w AS s5, count(value) OVER w AS c5,
            min(value) OVER w AS mn5, max(value) OVER w AS mx5,
            avg(value) OVER w AS a5
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)""",
        "window_range": """
          SELECT event_id, user_id, ts, sum(value) OVER w AS s,
                 count(*) OVER w AS n
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                       AND CURRENT ROW)""",
        "window_between": """
          SELECT event_id, user_id, ts,
                 sum(value) OVER wr AS s_r, count(*) OVER wr AS n_r,
                 sum(value) OVER wt AS s_t, count(*) OVER wt AS n_t
          FROM events
          WINDOW
            wr AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 8 PRECEDING AND 2 PRECEDING),
            wt AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 2 HOUR PRECEDING
                   AND INTERVAL 30 MINUTE PRECEDING)""",
        "window_where": """
          SELECT event_id, user_id, ts,
            sum(CASE WHEN value > 50 THEN value END) OVER w AS sw,
            count(CASE WHEN value > 50 THEN value END) OVER w AS cw,
            avg(CASE WHEN value > 50 THEN value END) OVER w AS aw,
            min(CASE WHEN value > 50 THEN value END) OVER w AS mnw,
            max(CASE WHEN value > 50 THEN value END) OVER w AS mxw
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)""",
        "window_salted": """
          SELECT event_id, user_id, ts,
                 sum(value) OVER wrg AS s_rg, count(*) OVER wrg AS n_rg,
                 sum(value) OVER wrw AS s_rw, count(*) OVER wrw AS n_rw,
                 min(value) OVER wrw AS mn_rw
          FROM events
          WINDOW
            wrg AS (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                    AND CURRENT ROW),
            wrw AS (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)""",
        "window_maxsize": """
          SELECT e.event_id, e.user_id, e.ts,
            (SELECT sum(value) FROM (
               SELECT value FROM events e2
               WHERE e2.user_id = e.user_id AND e2.ts <= e.ts
                 AND e2.ts >= e.ts - INTERVAL 4 HOUR
               ORDER BY e2.ts DESC LIMIT 5)) AS s,
            (SELECT count(*) FROM (
               SELECT value FROM events e2
               WHERE e2.user_id = e.user_id AND e2.ts <= e.ts
                 AND e2.ts >= e.ts - INTERVAL 4 HOUR
               ORDER BY e2.ts DESC LIMIT 5)) AS n
          FROM events e""",
        "window_distinct": """
          SELECT e.event_id, e.user_id, e.ts,
            (SELECT count(DISTINCT value) FROM (
               SELECT value FROM events e2
               WHERE e2.user_id = e.user_id AND e2.ts <= e.ts
               ORDER BY e2.ts DESC LIMIT 11)) AS dc
          FROM events e""",
        "window_at": """
          SELECT e.event_id, e.user_id, e.ts,
            (SELECT value FROM (
               SELECT value, ts FROM events e2
               WHERE e2.user_id = e.user_id AND e2.ts <= e.ts
               ORDER BY e2.ts DESC LIMIT 6)
             ORDER BY ts DESC LIMIT 1 OFFSET 2) AS at2,
            value AS fv
          FROM events e""",
        # r5 fusion: OPEN PRECEDING + WINDOW UNION/INW + ECT-under-ties
        # verified by one row (joined on event_id)
        "window_edge_frames": """
          WITH b AS (
            SELECT event_id, user_id,
                   (epoch_us(ts) // 600000000) * 600000000 AS ts2,
                   value
            FROM events),
          openw AS (
            SELECT event_id, user_id, ts, sum(value) OVER w AS s_open,
                   count(*) OVER w AS n_open
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN (INTERVAL 1 HOUR - INTERVAL 1
                         MICROSECOND) PRECEDING AND CURRENT ROW)),
          inw AS (
            -- INW frame = instance row + union ('click') rows in range
            SELECT e.event_id,
              round(e.value + coalesce((
                SELECT sum(u.value) FROM events u
                WHERE u.event_type = 'click' AND u.user_id = e.user_id
                  AND u.ts >= e.ts - INTERVAL 1 HOUR AND u.ts <= e.ts),
                0), 4) AS s_inw,
              1 + (SELECT count(*) FROM events u
                   WHERE u.event_type = 'click'
                     AND u.user_id = e.user_id
                     AND u.ts >= e.ts - INTERVAL 1 HOUR
                     AND u.ts <= e.ts) AS n_inw
            FROM events e),
          ect AS (
            SELECT e.event_id, e.ts2,
              (SELECT coalesce(sum(value), 0) FROM b e2
               WHERE e2.user_id = e.user_id AND e2.ts2 < e.ts2
                 AND e2.ts2 >= e.ts2 - 3600000000) + e.value AS s_ect,
              (SELECT count(*) FROM b e2
               WHERE e2.user_id = e.user_id AND e2.ts2 < e.ts2
                 AND e2.ts2 >= e.ts2 - 3600000000) + 1 AS n_ect
            FROM b e)
          SELECT o.event_id, o.user_id, o.ts, o.s_open, o.n_open,
                 i.s_inw, i.n_inw, c.ts2, c.s_ect, c.n_ect
          FROM openw o JOIN inw i USING (event_id)
                       JOIN ect c USING (event_id)""",
        "window_concat_keys": """
          SELECT event_id, user_id, ts,
            sum(value) OVER wu AS su, count(*) OVER wt AS ct
          FROM events
          WINDOW
            wu AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW),
            wt AS (PARTITION BY event_type ORDER BY ts
                   RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING
                   AND CURRENT ROW)""",
        "window_presorted": """
          SELECT event_id,
                 CAST(user_id % 8 AS BIGINT) AS u_bucket, ts,
                 round(sum(value) OVER w, 6) AS sum_v20,
                 count(*) OVER w AS cnt20,
                 max(value) OVER w AS max_v20
          FROM events
          WINDOW w AS (PARTITION BY user_id % 8 ORDER BY ts
                       ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)""",
        "window_nested": """
          WITH r AS (
            SELECT event_id, user_id, ts, value,
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS rn,
              min(value)  OVER w AS mn,
              sum(value)  OVER w AS s,
              count(value) OVER w AS cnt
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
          SELECT a.event_id, a.user_id, a.ts,
            round(a.s - a.cnt * a.cnt, 6) AS r,
            (SELECT count(*) FROM r b
              WHERE b.user_id = a.user_id
                AND b.rn BETWEEN a.rn - 5 AND a.rn
                AND b.value >= a.mn + 1) AS m
          FROM r a""",
        "window_union": """
          SELECT event_id, user_id, ts, s, n FROM (
            SELECT event_id, user_id, ts,
                   (event_type <> 'click') AS is_primary,
                   sum(value) OVER w AS s, count(*) OVER w AS n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                         AND CURRENT ROW))
          WHERE is_primary""",
        "lag_lead": """
          SELECT event_id, user_id, ts,
            lag(value, 1) OVER w AS lag1, lag(value, 3) OVER w AS lag3,
            lead(value, 2) OVER w AS lead2,
            row_number() OVER w AS rn
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
        "sessionize": """
          SELECT event_id, user_id, ts,
            CAST(sum(CASE WHEN prev_ts IS NULL
                          OR ts - prev_ts > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM (SELECT event_id, user_id, ts,
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_ts
                FROM events)""",
        "backfill": """
          SELECT event_id, user_id, ts,
            last_value(CASE WHEN event_type = 'view' THEN value END
                       IGNORE NULLS) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS value_filled
          FROM events""",
        "last_join_asof": """
          SELECT l.event_id, l.user_id, l.ts, r.value AS value
          FROM (SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'click') l
          ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                          WHERE event_type = 'purchase') r
            ON l.user_id = r.user_id AND l.ts >= r.ts""",
        "last_join_multikey": """
          SELECT l_orderkey, l_linenumber, l.l_suppkey, l.l_returnflag,
                 grp_cnt, grp_maxq
          FROM lineitem l LEFT JOIN (
            SELECT l_suppkey, l_returnflag, count(*) AS grp_cnt,
                   max(l_quantity) AS grp_maxq
            FROM lineitem GROUP BY l_suppkey, l_returnflag) g
          ON l.l_suppkey = g.l_suppkey
             AND l.l_returnflag = g.l_returnflag""",
        "last_join_orderby": """
          SELECT c_custkey, c_name, r.value AS value
          FROM customer LEFT JOIN (
            SELECT user_id, value FROM (
              SELECT user_id, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC) AS rn
              FROM events WHERE event_type = 'purchase')
            WHERE rn = 1) r
          ON c_custkey = r.user_id""",
        # TPC-H Q1, computed over exact integer cents so the float
        # outputs are order-independent and bit-identical to the Ray
        # side (float sums reduce in nondeterministic order otherwise)
        "groupby_agg": _TPCH_Q1_EXACT_SQL,
        # sketches are exact below capacity, so the oracle is exact SQL
        "approx_agg": """
          SELECT user_id,
                 quantile_disc(value, 0.5) AS p50,
                 quantile_disc(value, 0.9) AS p90,
                 count(DISTINCT event_type) AS adc,
                 count(*) AS n
          FROM events GROUP BY user_id""",
        "filter_project": """
          SELECT l_orderkey, l_linenumber,
                 l_extendedprice * (1 - l_discount) AS revenue,
                 upper(l_returnflag) AS rf
          FROM lineitem
          WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
        "sort_limit": """
          SELECT o_orderkey, o_totalprice FROM orders
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
        "distinct": """
          SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem""",
        "left_join": """
          SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
          FROM orders LEFT JOIN customer ON o_custkey = c_custkey""",
        "union_ops": _UNION_OPS_SQL,
        "scalar_string_math": """
          SELECT p_partkey,
                 upper(p_name) AS name_up,
                 substring(p_brand, 1, 5) AS brand5,
                 length(p_type) AS type_len,
                 CAST(abs(p_size - 25) AS BIGINT) AS size_dev,
                 round(p_retailprice, 0) AS price_r,
                 p_brand || '-' || p_type AS brand_type,
                 p_name LIKE '%brass%' AS is_brass,
                 ln(p_retailprice) AS price_ln,
                 log10(p_retailprice) AS price_log10,
                 sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
                 pow(CAST(p_size AS DOUBLE), 2) AS size_pow2,
                 exp(-CAST(p_size AS DOUBLE)) AS size_exp_neg,
                 reverse(p_type) AS type_rev,
                 coalesce(p_name, 'unknown') AS nvl_name
          FROM part""",
        "scalar_datetime": """
          SELECT event_id,
                 year(ts) AS y, month(ts) AS mo, day(ts) AS d,
                 hour(ts) AS h, minute(ts) AS mi,
                 dayofweek(ts) + 1 AS dow
          FROM events""",
        "corpus_features": _CORPUS_CTE + "SELECT * FROM feats",
        "corpus_asof": _CORPUS_CTE + """
          , dim AS (
            SELECT source, ts AS dim_ts, CAST(n_tok AS BIGINT) AS payload
            FROM wts
            WHERE CAST(regexp_extract(doc_id, '([0-9]+)$', 1) AS INTEGER)
                  % 7 = 0)
          SELECT f.*, d.payload
          FROM feats f
          ASOF LEFT JOIN dim d
            ON f.source = d.source AND f.ts >= d.dim_ts""",
        "corpus_clean": r"""
          WITH surv AS (
            SELECT doc_id, text, source FROM documents
            QUALIFY row_number() OVER (PARTITION BY text
                                       ORDER BY doc_id) = 1),
          w AS (
            SELECT doc_id, source,
                   regexp_split_to_array(trim(text), '\s+') AS ws,
                   len(regexp_extract_all(text, '[0-9]'))
                     / CAST(greatest(length(text), 1) AS DOUBLE)
                     AS digit_ratio
            FROM surv),
          b AS (
            SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bg
            FROM w, UNNEST(range(1, len(ws))) AS t(i)),
          agg AS (
            SELECT doc_id, count(*) AS nb,
                   count(DISTINCT bg) AS nd
            FROM b GROUP BY doc_id)
          SELECT w.doc_id, w.source,
                 CAST(len(w.ws) AS BIGINT) AS n_words,
                 round(CASE WHEN coalesce(agg.nb, 0) > 0
                       THEN 1.0 - agg.nd::DOUBLE / agg.nb
                       ELSE 0.0 END, 6) AS dup_bigram_ratio
          FROM w LEFT JOIN agg USING (doc_id)
          WHERE len(w.ws) BETWEEN 10 AND 10000
            AND round(CASE WHEN coalesce(agg.nb, 0) > 0
                      THEN 1.0 - agg.nd::DOUBLE / agg.nb
                      ELSE 0.0 END, 6) < 0.08
            AND w.digit_ratio < 0.2""",
        "repetition": r"""
          WITH w AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
            FROM documents),
          b AS (
            SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bg
            FROM w, UNNEST(range(1, len(ws))) AS t(i)),
          agg AS (
            SELECT doc_id, count(*) AS n_bigrams,
                   count(DISTINCT bg) AS n_distinct_bigrams
            FROM b GROUP BY doc_id)
          SELECT w.doc_id,
                 coalesce(agg.n_bigrams, 0) AS n_bigrams,
                 coalesce(agg.n_distinct_bigrams, 0)
                   AS n_distinct_bigrams,
                 round(CASE WHEN coalesce(agg.n_bigrams, 0) > 0
                       THEN 1.0 - agg.n_distinct_bigrams::DOUBLE
                                  / agg.n_bigrams
                       ELSE 0.0 END, 6) AS dup_bigram_ratio
          FROM w LEFT JOIN agg USING (doc_id)""",
        # r5 fusion of token_count + text_quality: n_words flows
        # through BOTH the TokenCount byte kernel and QualityScore
        "text_stats": """
          SELECT doc_id,
            CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
              AS n_words,
            CAST(length(text) AS BIGINT) AS n_chars,
            (length(text) - greatest(
               len(regexp_split_to_array(trim(text), '\\s+')) - 1, 0))
              / CAST(greatest(
                  len(regexp_split_to_array(trim(text), '\\s+')), 1)
                AS DOUBLE) AS avg_word_len,
            len(regexp_extract_all(text, '[0-9]'))
              / CAST(greatest(length(text), 1) AS DOUBLE) AS digit_ratio,
            len(regexp_extract_all(text, '[A-Z]'))
              / CAST(greatest(length(text), 1) AS DOUBLE) AS upper_ratio,
            len(regexp_extract_all(text, '[.,;:!?]'))
              / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio
          FROM documents""",
        "dedup_exact": """
          SELECT doc_id, source FROM documents
          QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1""",
        "multimodal_decode": """
          SELECT doc_id,
            CASE doc_id % 3 WHEN 0 THEN 'image/png'
                 WHEN 1 THEN 'audio/wav' ELSE 'image/jpeg' END
              AS media_type,
            CASE doc_id % 3 WHEN 0 THEN doc_id % 61 + 1
                 WHEN 2 THEN doc_id % 127 + 1 END AS width,
            CASE doc_id % 3 WHEN 0 THEN doc_id % 37 + 1
                 WHEN 2 THEN doc_id % 83 + 1 END AS height,
            CASE doc_id % 3 WHEN 1 THEN doc_id % 2 + 1 END AS channels,
            CASE doc_id % 3 WHEN 1 THEN 8000 * (doc_id % 4 + 1) END
              AS sample_rate,
            CASE doc_id % 3 WHEN 1 THEN round(
              (doc_id % 500 + 1) * 1000.0 / (8000 * (doc_id % 4 + 1)), 6)
              END AS duration_ms,
            CASE doc_id % 3
              WHEN 0 THEN (doc_id % 37 + 1) * (doc_id % 61 + 2) + 68
              WHEN 1 THEN 44 + 2 * (doc_id % 500 + 1) * (doc_id % 2 + 1)
              ELSE 35 END AS payload_bytes
          FROM documents""",
        "embedding_dups": """
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 round(list_cosine_similarity(a.embedding, b.embedding), 4)
                   AS sim_r
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45""",
        "ann_bruteforce": """
          WITH q AS (
            SELECT vec_id AS query_id, embedding AS qe
            FROM embeddings ORDER BY vec_id LIMIT 4),
          scored AS (
            SELECT q.query_id, e.vec_id,
                   list_cosine_similarity(q.qe, e.embedding) AS sim
            FROM q CROSS JOIN embeddings e),
          ranked AS (
            SELECT query_id, vec_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, vec_id) AS rank
            FROM scored)
          SELECT query_id, vec_id, rank, round(sim, 4) AS sim_r
          FROM ranked WHERE rank <= 10""",
        # minhash_pairs / ngram_jaccard / minhash_dedup: the oracle is
        # the EXACT word-3-gram Jaccard set (distinct 3-word shingles,
        # intersection-join, threshold). The engine's candidate stages
        # (LSH bands / shingle anchors) are probabilistic recall aids;
        # the verify stage computes the same exact Jaccard, so equality
        # here checks both soundness (every emitted pair really passes
        # the threshold, same value bit-for-bit) and full recall on
        # this corpus (recall bounds stay pytest-covered).
        "minhash_pairs": _NGRAM_JACCARD_CTE + """
          SELECT id_a, id_b, jaccard FROM pairj
          WHERE jaccard >= 0.5 ORDER BY id_a, id_b""",
        "ngram_jaccard": _NGRAM_JACCARD_CTE + """
          SELECT id_a, id_b, jaccard FROM pairj
          WHERE jaccard >= 0.3 ORDER BY id_a, id_b""",
        "minhash_dedup": _NGRAM_JACCARD_CTE + """
          SELECT doc_id FROM documents
          WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM pairj
                               WHERE jaccard >= 0.5)""",
        # top / *_cate renderings follow the reference's container
        # output formats (hybridse/src/udf/containers.h:99-137):
        # top = k values DESC comma-joined, *_cate = 'key:val' sorted
        # by key asc; floats render %g-style when integral-free, avg
        # always %.6f, counts as ints.
        "top_cate": """
          SELECT e.event_id, e.user_id, e.ts,
            coalesce((
              SELECT string_agg(CASE WHEN v = floor(v)
                       THEN CAST(CAST(v AS BIGINT) AS VARCHAR)
                       ELSE printf('%g', v) END, ',' ORDER BY v DESC)
              FROM (SELECT value AS v FROM (
                      SELECT value FROM events e2
                      WHERE e2.user_id = e.user_id AND e2.ts <= e.ts
                      ORDER BY e2.ts DESC LIMIT 11)
                    WHERE value IS NOT NULL
                    ORDER BY value DESC LIMIT 3)), '') AS top3,
            (SELECT count(DISTINCT event_type) FROM (
               SELECT event_type FROM events e2
               WHERE e2.user_id = e.user_id AND e2.ts <= e.ts
               ORDER BY e2.ts DESC LIMIT 11)) AS dc_types,
            coalesce((
              SELECT string_agg(event_type || ':' ||
                                CAST(cnt AS VARCHAR),
                                ',' ORDER BY event_type)
              FROM (SELECT event_type, count(*) AS cnt FROM (
                      SELECT event_type, value FROM events e2
                      WHERE e2.user_id = e.user_id AND e2.ts <= e.ts
                      ORDER BY e2.ts DESC LIMIT 11)
                    WHERE event_type IS NOT NULL
                      AND value IS NOT NULL
                    GROUP BY event_type)), '') AS cnt_by_type,
            coalesce((
              SELECT string_agg(event_type || ':' ||
                                printf('%.6f', a),
                                ',' ORDER BY event_type)
              FROM (SELECT event_type, avg(value) AS a FROM (
                      SELECT event_type, value FROM events e2
                      WHERE e2.user_id = e.user_id AND e2.ts <= e.ts
                      ORDER BY e2.ts DESC LIMIT 11)
                    WHERE event_type IS NOT NULL
                      AND value IS NOT NULL
                    GROUP BY event_type)), '') AS avg_by_type
          FROM events e""",
        # fz_window_split counts concatenated per-frame splits;
        # fz_join joins frame strings NEWEST-first (the reference
        # window iterates instance-row back).
        "fz_window": """
          SELECT e.event_id,
            (SELECT CAST(coalesce(sum(len(string_split(props, ','))),
                                  0) AS BIGINT) FROM (
               SELECT props FROM events e2
               WHERE e2.user_id = e.user_id AND e2.ts <= e.ts
               ORDER BY e2.ts DESC LIMIT 4)
             WHERE props IS NOT NULL) AS n_parts,
            (SELECT coalesce(string_agg(props, '|' ORDER BY ts DESC),
                             '') FROM (
               SELECT props, ts FROM events e2
               WHERE e2.user_id = e.user_id AND e2.ts <= e.ts
               ORDER BY e2.ts DESC LIMIT 4)
             WHERE props IS NOT NULL) AS joined
          FROM events e""",
        # ----- r5 hygiene-slate oracles -----
        # paragraph dedup: unnest + QUALIFY first-occurrence + ordered
        # string_agg rebuild (same formulation as the pytest oracle)
        "dedup_paragraphs": """
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
          FROM surv GROUP BY doc_id""",
        # decontamination: distinct word-8-grams shared with the
        # doc_id<20 eval slice, counted per corpus doc
        "decontaminate": """
          WITH ev AS (SELECT text FROM documents WHERE doc_id < 20),
          rest AS (SELECT doc_id, text FROM documents
                   WHERE doc_id >= 20),
          evw AS (SELECT list_filter(string_split_regex(text, '\\s+'),
                                     w -> w <> '') AS ws FROM ev),
          evg AS (
            SELECT DISTINCT ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||
                   ws[i+3]||' '||ws[i+4]||' '||ws[i+5]||' '||
                   ws[i+6]||' '||ws[i+7] AS gram
            FROM evw, LATERAL (SELECT unnest(generate_series(
                   1, greatest(len(ws) - 7, 0))) AS i) t),
          rw AS (SELECT doc_id,
                        list_filter(string_split_regex(text, '\\s+'),
                                    w -> w <> '') AS ws FROM rest),
          rg AS (
            SELECT DISTINCT doc_id,
                   ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||
                   ' '||ws[i+4]||' '||ws[i+5]||' '||ws[i+6]||' '||
                   ws[i+7] AS gram
            FROM rw, LATERAL (SELECT unnest(generate_series(
                   1, greatest(len(ws) - 7, 0))) AS i) t),
          hits AS (SELECT rg.doc_id, count(*) AS h
                   FROM rg JOIN evg USING (gram) GROUP BY rg.doc_id)
          SELECT r.doc_id,
                 CAST(coalesce(h.h, 0) AS BIGINT) AS ngram_hits,
                 coalesce(h.h, 0) >= 1 AS contaminated
          FROM rest r LEFT JOIN hits h USING (doc_id)""",
        "pii_gopher": _PII_GOPHER_SQL,
        # mix_sources: the PLAN surface (input totals / budget /
        # fractions) — n_chars values are integral doubles, so the
        # sums are order-independent-exact on both engines
        "mix_sources": """
          WITH tot AS (SELECT source, sum(n_chars) AS tk
                       FROM documents GROUP BY source),
          w(source, wt) AS (VALUES ('src0', 0.75), ('src1', 0.25)),
          b AS (SELECT min(tk / wt) AS budget
                FROM tot JOIN w USING (source))
          SELECT w.source, tot.tk AS input_tokens,
                 least(1.0, b.budget * w.wt / tot.tk) AS fraction,
                 b.budget AS budget_tokens
          FROM w JOIN tot USING (source) CROSS JOIN b""",
        # full-probe IVF == brute force (same scoring, every
        # partition read) — reuses the brute-force oracle text
        "knn_ivf_indexed": """
          WITH q AS (
            SELECT vec_id AS query_id, embedding AS qe
            FROM embeddings ORDER BY vec_id LIMIT 4),
          scored AS (
            SELECT q.query_id, e.vec_id,
                   list_cosine_similarity(q.qe, e.embedding) AS sim
            FROM q CROSS JOIN embeddings e),
          ranked AS (
            SELECT query_id, vec_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, vec_id) AS rank
            FROM scored)
          SELECT query_id, vec_id, rank, round(sim, 4) AS sim_r
          FROM ranked WHERE rank <= 10""",
        # simhash (r5 upgrade): FNV-1a word hashes via HUGEINT modular
        # arithmetic, per-bit majority votes, pair Hamming via
        # bit_count(xor) — bit-exact vs functions.hashing.simhash_batch
        # on the ASCII corpus; max_hamming=3 is the 4x16-bit split's
        # full-recall bound, so the engine's bucketed pipeline must
        # emit EXACTLY these pairs
        "simhash_pairs": """
          WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               w -> w <> '') AS ws
            FROM documents),
          words AS (SELECT doc_id, unnest(ws) AS w FROM toks),
          dw AS (SELECT DISTINCT w FROM words),
          wh AS (
            SELECT w,
              list_reduce(
                list_prepend(CAST(14695981039346656037 AS HUGEINT),
                  list_transform(range(1, length(w) + 1),
                    i -> CAST(ascii(substring(w, i, 1)) AS HUGEINT))),
                (acc, b) -> (CAST(xor(CAST(acc AS UBIGINT),
                                      CAST(b AS UBIGINT)) AS HUGEINT)
                             * 1099511628211)
                            % CAST(18446744073709551616 AS HUGEINT)
              ) AS h
            FROM dw),
          bits AS (
            SELECT wo.doc_id, j.j,
                   sum(CASE WHEN (CAST(wh.h AS UBIGINT) >> j.j) & 1 = 1
                       THEN 1 ELSE 0 END) AS ones,
                   count(*) AS nw
            FROM words wo JOIN wh ON wo.w = wh.w
            CROSS JOIN (SELECT unnest(range(64)) AS j) j
            GROUP BY wo.doc_id, j.j),
          sig0 AS (
            SELECT doc_id,
                   sum(CASE WHEN 2 * ones > nw
                       THEN CAST(1 AS UBIGINT) << j ELSE 0 END) AS sig
            FROM bits GROUP BY doc_id),
          sigs AS (
            SELECT d.doc_id, coalesce(CAST(s.sig AS UBIGINT), 0) AS sig
            FROM documents d LEFT JOIN sig0 s USING (doc_id))
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
          FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sig, b.sig)) <= 3""",
        # langid_fingerprint and ann_approx stay rows-only: a
        # heuristic language model and partial-probe ANN recall have
        # no ANSI-SQL oracle (recall is pytest-bounded vs exact).
    }


# Distinct word-3-gram sets per doc (str.split-equivalent whitespace
# tokenization), intersection sizes via a gram self-join, exact
# Jaccard per pair — the shared CTE for the near-dup oracles.
def _pii_gopher_sql() -> str:
    """pii_gopher oracle: the PiiRedact replace chain and the Gopher
    rule arithmetic rebuilt from the SAME pattern constants (RE2 runs
    verbatim in DuckDB), so a drift in either pattern set breaks the
    match."""
    from openmldb_ray.ops.text import GopherRules, PiiRedact
    red = "text"
    cnts = []
    for _name, pat, repl in PiiRedact.PATTERNS:
        cnts.append(f"len(regexp_extract_all(text, '{pat}'))")
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    stops = " + ".join(
        "CAST(regexp_matches(lower(text), '\\b" + w + "\\b') AS INT)"
        for w in GopherRules.REQUIRED_STOPS)
    tmpl = """
      WITH g AS (
        SELECT doc_id, text,
          list_filter(string_split_regex(text, '\\s+'),
                      w -> w <> '') AS ws,
          length(text) - len(regexp_extract_all(text, '\\s'))
            AS nonspace,
          len(regexp_extract_all(text, '#'))
            + len(regexp_extract_all(text, '\\.\\.\\.')) AS symbols,
          length(text) - length(replace(text, chr(10), '')) + 1
            AS n_lines,
          len(regexp_extract_all(text, '(?:^|\\n)[ \\t]*[\u2022\\-\\*] '))
            AS bullets,
          len(regexp_extract_all(text, '\\.\\.\\.[ \\t]*(\\n|$)'))
            AS ellipsis,
          (@STOPS@) AS stop_hits,
          @RED@ AS red,
          (@CNT@) AS pii_count
        FROM documents),
      g2 AS (
        SELECT *, len(ws) AS n_words, greatest(len(ws), 1) AS nw,
               len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
                 AS n_alpha
        FROM g),
      r AS (
        SELECT doc_id, red, pii_count,
          n_words >= 50 AND n_words <= 100000 AS rule_word_count,
          nonspace / nw >= 3.0 AND nonspace / nw <= 10.0
            AS rule_avg_word_len,
          symbols / nw <= 0.1 AS rule_symbol_ratio,
          bullets / n_lines <= 0.9 AS rule_bullet_lines,
          ellipsis / n_lines <= 0.3 AS rule_ellipsis_lines,
          1.0 - (n_words - n_alpha) / nw >= 0.8 AS rule_alpha_words,
          stop_hits >= 2 AS rule_stop_words
        FROM g2)
      SELECT doc_id, red AS text,
        CAST(pii_count AS BIGINT) AS pii_count,
        rule_word_count, rule_avg_word_len, rule_symbol_ratio,
        rule_bullet_lines, rule_ellipsis_lines, rule_alpha_words,
        rule_stop_words,
        rule_word_count AND rule_avg_word_len AND rule_symbol_ratio
          AND rule_bullet_lines AND rule_ellipsis_lines
          AND rule_alpha_words AND rule_stop_words AS gopher_pass
      FROM r"""
    return tmpl.replace("@STOPS@", stops).replace("@RED@", red) \
        .replace("@CNT@", " + ".join(cnts))


_PII_GOPHER_SQL = _pii_gopher_sql()


_NGRAM_JACCARD_CTE = """
  WITH ws AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'),
                       w -> w <> '') AS w
    FROM documents),
  grams AS (
    SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
    FROM ws, LATERAL (SELECT unnest(generate_series(
                        1, greatest(len(w) - 2, 0))) AS i) t),
  sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
  inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
    FROM grams a JOIN grams b
      ON a.gram = b.gram AND a.doc_id < b.doc_id
    GROUP BY 1, 2),
  pairj AS (
    SELECT id_a, id_b, i * 1.0 / (sa.n + sb.n - i) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = id_a
               JOIN sizes sb ON sb.doc_id = id_b)
"""
