"""Window specification — the compiled analog of an OpenMLDB WINDOW clause.

Semantics spec (reference, read-only, cited for parity only):
  - frame types kFrameRows / kFrameRowsRange / kFrameRowsMergeRowsRange:
    hybridse/include/node/node_enum.h:209-212
  - history-only offsets (clamped <= 0): hybridse/include/node/sql_node.h:1242-1260
  - MAXSIZE / EXCLUDE CURRENT_TIME / buffer algorithm:
    hybridse/include/vm/mem_catalog.h:385-471
  - INSTANCE_NOT_IN_WINDOW: hybridse/src/vm/runner.cc:1003-1005
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class WindowSpec:
    """PARTITION BY ``partition_by`` ORDER BY ``order_by`` with a
    history-only sliding frame.

    Exactly one (or both, for a merged frame) of ``preceding_rows`` /
    ``preceding_range`` must be set:

    - ``preceding_rows=n``  -> ROWS BETWEEN n PRECEDING AND CURRENT ROW
      (count-based: the frame holds the current row plus up to n prior
      buffer rows, regardless of time gaps).
    - ``preceding_range=t`` -> ROWS_RANGE BETWEEN t PRECEDING AND
      CURRENT ROW (time-based: rows with ts >= current_ts - t).
    - both set              -> merged frame (union of the two frames).

    End-bound variants (history lag, mutually exclusive):
    - ``end_offset_range=t2``: ... AND t2 PRECEDING (time units); rows
      newer than current_ts - t2 (including the current row) are
      excluded — the zero-temporal-leakage as-of lag.
    - ``end_offset_rows=m``: ... AND m PRECEDING (row counts).

    Modifiers:
    - ``max_size=k``: frame capped at the newest k rows (oldest evicted
      first).
    - ``exclude_current_time``: buffer rows whose ts equals the current
      row's ts (other than the current row itself) are excluded.
    - ``instance_not_in_window``: the current row is evaluated against
      the window but never buffered — it is not part of its own frame
      (its earlier ts-peers still are).
    - ``open_preceding``: the start bound is exclusive (OPEN n
      PRECEDING).

    ``order_by`` must resolve to an int64-comparable axis (int, or
    timestamp — converted to int64 ms). Rows with NULL or negative
    order keys are dropped, matching the reference
    (java/openmldb-batch WindowAggPlan.scala:783-791).
    """

    partition_by: tuple[str, ...] | str
    order_by: str
    preceding_rows: int | None = None
    preceding_range: int | None = None
    end_offset_rows: int = 0
    end_offset_range: int = 0
    max_size: int = 0
    exclude_current_time: bool = False
    instance_not_in_window: bool = False
    open_preceding: bool = False

    def __post_init__(self):
        if isinstance(self.partition_by, str):
            object.__setattr__(self, "partition_by", (self.partition_by,))
        else:
            object.__setattr__(self, "partition_by", tuple(self.partition_by))
        if self.preceding_rows is None and self.preceding_range is None:
            raise ValueError("one of preceding_rows / preceding_range required")
        if self.preceding_rows is not None and self.preceding_rows < 0:
            raise ValueError("preceding_rows must be >= 0")
        if self.preceding_range is not None and self.preceding_range < 0:
            raise ValueError("preceding_range must be >= 0")
        if self.end_offset_rows and self.end_offset_range:
            raise ValueError("end_offset_rows and end_offset_range are exclusive")

    @property
    def keys(self) -> tuple[str, ...]:
        return self.partition_by  # type: ignore[return-value]


#: aggregate/analytic functions the kernel implements (reference UDAF
#: registry: hybridse/src/udf/default_udf_library.cc:2099-2389 and
#: window position fns default_defs/window_functions_def.cc:96-156).
AGG_FUNCS = frozenset(
    {
        "sum", "sum_zero", "min", "max", "count", "avg", "distinct_count",
        "sum_where", "sum_zero_where", "count_where", "avg_where",
        "min_where", "max_where",
        "lag", "lead", "at", "first_value", "last_value_in_frame",
        "last_value_ignore_nulls", "row_number",
        "top", "topn_frequency", "top1_ratio",
        "sum_cate", "count_cate", "avg_cate", "min_cate", "max_cate",
        "sum_cate_where", "count_cate_where", "avg_cate_where",
        "min_cate_where", "max_cate_where",
        "top_n_key_sum_cate_where", "top_n_key_count_cate_where",
        "top_n_key_avg_cate_where", "top_n_key_min_cate_where",
        "top_n_key_max_cate_where",
        "fz_top1_ratio", "fz_topn_frequency",
        "fz_window_split", "fz_window_split_by_key",
        "fz_window_split_by_value", "fz_join",
        # composite FeatureZero aggs: outer agg over flattened
        # per-frame split items (params[0] names the split function)
        "count__split", "distinct_count__split", "top1_ratio__split",
        "topn_frequency__split", "fz_join__split",
        # instance__nexpr: evaluate an expression on the instance row
        # with nested per-instance aggregate scalars (variable top-n
        # arguments, hybridsql_gen composites)
        "instance",
    }
)


@dataclass(frozen=True)
class Agg:
    """One output feature: ``name = func(col) OVER w``.

    - ``func``: one of AGG_FUNCS.
    - ``col``: input column (None for count(*) / row_number).
    - ``name``: output column name (must match the oracle SQL alias).
    - ``where``: boolean column gating *_where variants.
    - ``k``: lag/at offset, or top-k size.
    - ``cate``: category column for the *_cate family (output
      'K:V,K:V' sorted by key ascending, udfs_8h.md sum_cate).
    """

    func: str
    col: str | None
    name: str
    where: str | None = None
    k: int = 0
    cate: str | None = None
    #: extra literal args (fz_* delimiters etc.)
    params: tuple = ()

    def __post_init__(self):
        # "<outer>__nexpr" = nested-aggregate expression form: outer
        # reduce over a per-frame-row expression referencing inner
        # per-instance aggregate scalars (test_udaf_function.yaml 43/53)
        if self.func not in AGG_FUNCS \
                and not (self.func.endswith("__nexpr")
                         and self.func[:-7] in AGG_FUNCS):
            raise ValueError(f"unknown window function: {self.func}")
        if self.func.endswith("_where") and self.where is None:
            raise ValueError(f"{self.func} requires where=")
        if "_cate" in self.func and self.cate is None:
            raise ValueError(f"{self.func} requires cate=")
