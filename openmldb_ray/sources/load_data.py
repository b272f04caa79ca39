"""LOAD DATA INFILE / SELECT INTO OUTFILE — the reference's offline
ingest/egress surface (java/openmldb-batch nodes/LoadDataPlan.scala:31-127,
SelectIntoPlan.scala:27-46; csv/parquet only, HybridseUtil.scala:193-208).

- ``load_data(path, fmt)``: read csv or parquet into a Dataset with the
  reference's csv options (header, delimiter, null_value, quote).
- deep copy (default): rewrite to parquet under the catalog's offline
  prefix and register that; soft copy: register the source path+format.
- ``select_into``: write a Dataset to csv/parquet.
- ``Catalog``: a JSON-file manifest per table (the nameserver analog —
  enough to round-trip offline table registrations).
"""

from __future__ import annotations

import json
import os

import ray.data

_FORMATS = ("csv", "parquet")


class Catalog:
    """Tiny file-backed table catalog: {table: {path, format, mode}}."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, "catalog.json")
        self.tables: dict = {}
        if os.path.exists(self.path):
            with open(self.path) as fh:
                self.tables = json.load(fh)

    def register(self, table: str, path: str, fmt: str, mode: str):
        self.tables[table] = {"path": path, "format": fmt, "mode": mode}
        with open(self.path, "w") as fh:
            json.dump(self.tables, fh, indent=1)

    def read(self, table: str) -> ray.data.Dataset:
        info = self.tables[table]
        return load_data(info["path"], fmt=info["format"])


def load_data(path: str, fmt: str = "parquet", *, header: bool = True,
              delimiter: str = ",", null_value: str = "null",
              columns: list[str] | None = None) -> ray.data.Dataset:
    if fmt not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}")  # parity:
        # HybridseUtil.scala:193-194 rejects everything else
    if fmt == "parquet":
        return ray.data.read_parquet(path, columns=columns,
                                     file_extensions=["parquet"])
    from pyarrow import csv as pacsv
    parse = pacsv.ParseOptions(delimiter=delimiter)
    # the reference's null_value option (default "null",
    # HybridseUtil.scala:199-208) plus empty-string nulls, which is how
    # Arrow's csv writer emits them
    convert = pacsv.ConvertOptions(null_values=[null_value, ""],
                                   strings_can_be_null=True,
                                   include_columns=columns or None)
    read = pacsv.ReadOptions(autogenerate_column_names=not header)
    return ray.data.read_csv(path, parse_options=parse,
                             convert_options=convert, read_options=read)


def load_data_into(catalog: Catalog, table: str, path: str,
                   fmt: str = "csv", deep_copy: bool = True,
                   **csv_opts) -> ray.data.Dataset:
    """LOAD DATA INFILE: deep copy rewrites to parquet under the
    catalog root (LoadDataPlan.scala:64-117); soft copy registers the
    source path."""
    ds = load_data(path, fmt, **csv_opts)
    if deep_copy:
        dest = os.path.join(catalog.root, "offline", table)
        ds.write_parquet(dest)
        catalog.register(table, dest, "parquet", "deep")
        return load_data(dest, "parquet")
    catalog.register(table, path, fmt, "soft")
    return ds


def select_into(ds: ray.data.Dataset, path: str, fmt: str = "parquet",
                *, delimiter: str = ",") -> None:
    """SELECT ... INTO OUTFILE (SelectIntoPlan.scala:36-43)."""
    if fmt not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}")
    if fmt == "parquet":
        ds.write_parquet(path)
    else:
        from pyarrow import csv as pacsv
        ds.write_csv(path)


class StreamIngestor:
    """Micro-batch streaming ingest — the reference's Kafka-connector
    analog (extensions/kafka-connect-jdbc: a sink that appends rows to
    an OpenMLDB table as they arrive) re-expressed as an append-only
    parquet table with commit + watermark semantics:

    - every ``ingest()`` call lands ONE micro-batch as its own parquet
      sub-directory, written to ``.tmp`` then renamed (a crashed load
      never leaves a half-batch that looks committed — same protocol
      as state.checkpoint);
    - a ``stream.jsonl`` manifest records (seq, rows, ts_min, ts_max)
      per committed batch — the lineage/metrics artifact;
    - ``watermark()`` is the max event time across committed batches:
      windowed queries over the table are complete up to it;
    - ``dataset()`` reads the committed batches ONLY (an in-flight or
      crashed ``.tmp`` directory is invisible).

    Correctness contract (pytest test_sources.py): N consecutive
    ingests followed by a windowed query equal the same query over one
    bulk load of the concatenated input.
    """

    def __init__(self, catalog: Catalog, table: str,
                 ts_col: str | None = None):
        self.catalog = catalog
        self.table = table
        self.ts_col = ts_col
        self.dir = os.path.join(catalog.root, "offline", table)
        os.makedirs(self.dir, exist_ok=True)
        self.manifest = os.path.join(self.dir, "stream.jsonl")

    def _batches(self) -> list[dict]:
        if not os.path.exists(self.manifest):
            entries = []
        else:
            with open(self.manifest) as fh:
                entries = [json.loads(ln) for ln in fh if ln.strip()]
        # reconcile: a batch_* dir present but absent from the manifest
        # is a crash between the rename (the data commit) and the
        # manifest append — finish its commit instead of losing it or
        # colliding with its seq
        known = {b["dir"] for b in entries}
        orphans = sorted(
            d for d in os.listdir(self.dir)
            if d.startswith("batch_") and not d.endswith(".tmp")
            and os.path.isdir(os.path.join(self.dir, d))
            and d not in known)
        for d in orphans:
            entry = self._stats_of(os.path.join(self.dir, d))
            entry.update(seq=int(d.split("_")[1]), dir=d, recovered=True)
            with open(self.manifest, "a") as fh:
                fh.write(json.dumps(entry) + "\n")
            entries.append(entry)
        return sorted(entries, key=lambda b: b["seq"])

    def _stats_of(self, path: str) -> dict:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        rows, ts_min, ts_max = 0, None, None
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(path, f))
            rows += md.num_rows
            if self.ts_col is not None and md.num_rows:
                t = pq.read_table(os.path.join(path, f),
                                  columns=[self.ts_col])
                mn = pc.min(t[self.ts_col]).as_py()
                mx = pc.max(t[self.ts_col]).as_py()
                ts_min = mn if ts_min is None else min(ts_min, mn)
                ts_max = mx if ts_max is None else max(ts_max, mx)
        return {"rows": rows,
                "ts_min": None if ts_min is None else str(ts_min),
                "ts_max": None if ts_max is None else str(ts_max)}

    def ingest(self, src, fmt: str = "parquet", **csv_opts) -> dict:
        """One micro-batch: a Dataset, or a path loaded like LOAD
        DATA. Returns the committed manifest entry."""
        ds = src if isinstance(src, ray.data.Dataset) \
            else load_data(src, fmt, **csv_opts)
        seq = max((b["seq"] for b in self._batches()), default=-1) + 1
        dest = os.path.join(self.dir, f"batch_{seq:06d}")
        tmp = dest + ".tmp"
        if os.path.exists(tmp):
            import shutil
            shutil.rmtree(tmp)
        ds.write_parquet(tmp)
        entry = self._stats_of(tmp)
        os.rename(tmp, dest)           # the commit point
        entry.update(seq=seq, dir=os.path.basename(dest))
        with open(self.manifest, "a") as fh:
            fh.write(json.dumps(entry) + "\n")
        self.catalog.register(self.table, self.dir, "parquet", "stream")
        return entry

    def watermark(self):
        """Max committed event time (None before the first ingest or
        without a ts_col). Manifest values are stringified for JSON;
        numeric ones must compare numerically (max("9","17") is "9")."""
        marks = [b["ts_max"] for b in self._batches()
                 if b.get("ts_max") is not None]
        if not marks:
            return None

        def key(v):
            try:
                return (0, float(v), "")
            except (TypeError, ValueError):
                return (1, 0.0, str(v))
        return max(marks, key=key)

    def dataset(self) -> ray.data.Dataset:
        """Committed batches only — never an in-flight .tmp."""
        dirs = [os.path.join(self.dir, b["dir"]) for b in self._batches()]
        if not dirs:
            raise ValueError(f"stream table {self.table!r} has no "
                             "committed batches")
        return ray.data.read_parquet(dirs, file_extensions=["parquet"])
