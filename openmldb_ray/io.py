"""Parquet sources with column pruning + small shared helpers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def strip_meta(batch: pa.Table) -> pa.Table:
    """Drop schema-level metadata (parquet writers attach a pandas
    metadata DICT that makes pa.Schema unhashable — Ray Data then logs
    'Failed to hash the schemas' and falls into its slow schema-unify
    path on every block concat). Zero-copy."""
    if batch.schema.metadata:
        return batch.replace_schema_metadata(None)
    return batch


def clean_read_parquet(path, columns: list[str] | None = None,
                       schema_file: str | None = None,
                       **kwargs) -> ray.data.Dataset:
    """read_parquet that emits blocks WITHOUT schema metadata: an
    explicit pruned schema is passed so the read tasks never attach the
    file's pandas metadata (which would make every downstream schema
    unhashable — see strip_meta). ``schema_file``: read the schema from
    this file when ``path`` is a list."""
    import pyarrow.parquet as pq
    try:
        sch = pq.read_schema(schema_file or path)
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        kwargs.setdefault("schema", sch.remove_metadata())
    except (OSError, KeyError, TypeError):
        pass  # directory / list / missing column: let Ray infer
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def _no_prefetch_meta_provider():
    """Parquet metadata provider that skips the per-file footer
    prefetch: with one block per file the planner doesn't need
    row-group metadata, and prefetching 200 footers through Ray tasks
    measured ~2.5s of plan time (~1s without) on a 200-file read."""
    from ray.data.datasource import ParquetMetadataProvider

    class _NoPrefetch(ParquetMetadataProvider):
        def prefetch_file_metadata(self, fragments, **kw):
            return None
    return _NoPrefetch()


def read_parquet_per_file(path: str, columns: list[str] | None = None,
                          **kwargs) -> ray.data.Dataset:
    """read_parquet with ONE BLOCK PER FILE — for layout-sensitive
    consumers (skew.blockwise_corpus_features): entity-ordered corpora
    are ordered WITHIN each file, but write tasks number files by
    completion order, so a size-based read that merges several
    name-adjacent files produces blocks whose per-entity key ranges
    have holes — forcing the blockwise planner into refinement rounds
    (or refusal). Per-file blocks keep fragments = blocks and the
    zero-shuffle plan verifies on the first pass."""
    import os
    if os.path.isdir(path):
        files = sorted(os.path.join(path, f) for f in os.listdir(path)
                       if f.endswith(".parquet"))
        if files:
            # explicit file list: a directory argument pays a cold
            # pyarrow dataset discovery (~1.7s at 200 files vs 0.17s)
            kwargs.setdefault("override_num_blocks", len(files))
            kwargs.setdefault("meta_provider", _no_prefetch_meta_provider())
            # one BATCH per file too (reader default is 10k rows):
            # fused consumers see read batches, so sub-file batches
            # fragment the blockwise plan ~4-20x (at 32M docs the
            # replicated plan tails grew ~20x and assembly dominated)
            kwargs.setdefault("batch_size", 1 << 18)
            kwargs.pop("file_extensions", None)
            return clean_read_parquet(files, columns=columns,
                                      schema_file=files[0], **kwargs)
    return clean_read_parquet(path, columns=columns, **kwargs)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               **kwargs) -> ray.data.Dataset:
    """Read one testdata table, pruning columns at the read (row-group /
    column pushdown — a read that loads all columns for a 2-column
    transform is wrong at 100 TB)."""
    return clean_read_parquet(f"{sf_dir}/{name}.parquet", columns=columns,
                              **kwargs)


def hash_columns(batch: pa.Table, cols: list[str], num_buckets: int) -> np.ndarray:
    """Deterministic vectorized bucket id from one or more key columns.

    Uses pandas' C hash (fixed default hash_key -> stable across
    processes and nodes) over only the key columns.
    """
    df = batch.select(cols).to_pandas()
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int32)


def order_to_int64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """ORDER BY axis -> int64 numpy with NULLs as int64 min.

    Timestamps keep their native unit (us for the testdata tables);
    window range offsets are expressed in the same unit by callers.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_date(t):
        # date32 -> days since epoch (int32 first; direct int64 cast is
        # unimplemented in Arrow)
        arr = arr.cast(pa.int32()).cast(pa.int64())
    elif pa.types.is_timestamp(t):
        arr = arr.cast(pa.int64())
    elif not pa.types.is_integer(t):
        arr = arr.cast(pa.int64())
    np_arr = arr.to_numpy(zero_copy_only=False)
    if arr.null_count:
        mask = arr.is_null().to_numpy(zero_copy_only=False)
        np_arr = np.where(mask, np.iinfo(np.int64).min, np_arr)
    return np_arr.astype(np.int64, copy=False)


def column_to_float(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Numeric column -> float64 numpy with NULLs as NaN; string/binary
    columns -> object numpy with None (string aggs / cate keys)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type) \
            or pa.types.is_binary(arr.type):
        return np.asarray(arr.to_pandas(), dtype=object)
    if pa.types.is_timestamp(arr.type) or pa.types.is_date(arr.type):
        arr = arr.cast(pa.int32() if pa.types.is_date32(arr.type)
                       else pa.int64())
    out = arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    if arr.null_count:
        mask = arr.is_null().to_numpy(zero_copy_only=False)
        out = np.where(mask, np.nan, out)
    return out


def column_to_exact(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Value-preserving column -> object numpy with None for NULLs.
    Temporal columns become python ints (us for timestamps, days for
    date32) — float64 silently loses microseconds above 2**53, so
    value-passing window funcs (lag/at/first_value/min/max/...) must
    NOT round-trip temporals through floats."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.int64())
    elif pa.types.is_date(arr.type):
        arr = arr.cast(pa.int32()).cast(pa.int64())
    np_arr = arr.to_numpy(zero_copy_only=False)
    out = np.empty(len(np_arr), dtype=object)
    out[:] = np_arr
    if arr.null_count:
        mask = arr.is_null().to_numpy(zero_copy_only=False)
        out[mask] = None
    return out


def exact_factorize(values: np.ndarray, return_uniques: bool = False):
    """int64 codes for ``values`` with NULL/NaN as -1, equal values
    sharing a code (dense, first-seen order). Unlike ``pd.factorize``,
    exact on object strings containing an embedded NUL (pandas'
    StringHashTable hashes C strings, so 'a\\x00b' and 'a\\x00c' would
    conflate). With ``return_uniques`` also returns the unique values
    (numpy, first-seen order, nulls excluded)."""
    try:
        arr = pa.array(values, from_pandas=True)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
        codes, uniq = pd.factorize(values, use_na_sentinel=True)
        codes = np.asarray(codes, dtype=np.int64)
        return (codes, np.asarray(uniq)) if return_uniques else codes
    import pyarrow.compute as pc
    enc = pc.dictionary_encode(arr)
    idx = enc.indices
    if idx.null_count:
        codes = np.asarray(
            idx.to_numpy(zero_copy_only=False), dtype=np.float64)
        codes = np.where(np.isnan(codes), -1, codes).astype(np.int64)
    else:
        codes = np.asarray(idx.to_numpy(zero_copy_only=False),
                           dtype=np.int64)
    if not return_uniques:
        return codes
    return codes, enc.dictionary.to_numpy(zero_copy_only=False)
