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
