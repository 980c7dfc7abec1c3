"""Streaming change feed over the snapshot catalog:
``spark.readStream.format("ddops_catalog").load(table_dir)``.

The missing half of incremental processing: `incremental.py` diffs
snapshots batch-side on demand; this source makes the catalog a
STREAM — downstream jobs (index refresh, dedup maintenance, feature
extraction) subscribe once and receive each committed batch of rows
exactly once, driven by Spark's own offset checkpointing. It is the
Delta/Iceberg change-data-feed "insert" subset:

* offset = snapshot id (one integer in the query checkpoint);
* a micro-batch is the snapshots committed since the last offset;
* each snapshot contributes the data files it ADDED —
  ``append``/``overwrite``/``upsert`` emit their new files' rows;
  ``compact`` emits nothing (a rewrite changes no row set — emitting
  its files would replay the whole table) and ``delete`` emits
  nothing (removals carry no insert rows);
* rows are padded to the RUN's schema (the manifest schema when the
  query starts): files from before an add-column evolution yield NULL
  for the newer columns; files newer than the run's schema have their
  extra columns dropped. A continuously-running query therefore keeps
  a stable schema, and a restart (same checkpoint) adopts the evolved
  one — Spark's standard compatible-schema-change-on-restart
  contract.

Planning is driver-metadata-only (manifest diffs); execution reads
one parquet file per task via pyarrow and yields Arrow RecordBatches.
Like every file-list source, an ``overwrite`` that REPLACES history
restates rows (its files are new); consumers needing upsert semantics
key on their own identifier downstream.

Batch reads of a catalog table must go through ``catalog.read_table``
(which applies positional/equality delete masks — Spark joins this
source cannot express); ``reader()`` refuses with that guidance.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _FileSlice(InputPartition):
    def __init__(self, path: str, schema_json: str) -> None:
        self.path = path
        self.schema_json = schema_json


class CatalogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema_json: str) -> None:
        self.table_dir = options.get("path")
        if not self.table_dir:
            raise ValueError("ddops_catalog stream needs a table path")
        self.schema_json = schema_json

    def _current(self) -> int:
        from dd_ops_ocr_spark import catalog

        return catalog.current_snapshot_id(self.table_dir) or 0

    def initialOffset(self) -> dict:
        return {"snap": 0}

    def latestOffset(self) -> dict:
        return {"snap": self._current()}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from dd_ops_ocr_spark import catalog

        out: list[_FileSlice] = []
        for sid in range(start["snap"] + 1, end["snap"] + 1):
            m = catalog._read_manifest(self.table_dir, sid)
            if m.get("operation") in ("compact", "delete"):
                continue  # row set unchanged / removals only
            if m.get("parent_id"):
                prev = set(
                    catalog._read_manifest(
                        self.table_dir, m["parent_id"]
                    )["files"]
                )
            else:
                prev = set()
            for name in m["files"]:
                if name not in prev:
                    out.append(_FileSlice(
                        os.path.join(self.table_dir, "data", name),
                        self.schema_json,
                    ))
        return out

    def read(self, partition: _FileSlice):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        want = to_arrow_schema(
            StructType.fromJson(json.loads(partition.schema_json))
        )
        table = pq.read_table(partition.path)
        for batch in table.to_batches():
            arrays = []
            for field in want:
                i = batch.schema.get_field_index(field.name)
                if i >= 0:
                    arrays.append(batch.column(i).cast(field.type))
                else:  # pre-evolution file: NULL-fill the newer column
                    arrays.append(pa.nulls(batch.num_rows, field.type))
            yield pa.RecordBatch.from_arrays(
                arrays, names=[f.name for f in want]
            )

    def commit(self, end: dict) -> None:
        pass  # the manifest lineage is the log


class CatalogChangeFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ddops_catalog"

    def _schema_json(self) -> str:
        from dd_ops_ocr_spark import catalog

        table_dir = self.options.get("path")
        if not table_dir:
            raise ValueError("ddops_catalog needs a table path")
        sid = catalog.current_snapshot_id(table_dir)
        if sid is None:
            raise FileNotFoundError(
                f"no committed snapshot in {table_dir} — the change feed "
                "subscribes to an existing table's schema"
            )
        return catalog._read_manifest(table_dir, sid)["schema"]

    def schema(self):
        from pyspark.sql.types import StructType

        return StructType.fromJson(json.loads(self._schema_json()))

    def reader(self, schema):
        raise NotImplementedError(
            "batch reads must use catalog.read_table (it applies the "
            "positional/equality delete masks this source cannot); "
            "ddops_catalog is the STREAMING change feed"
        )

    def streamReader(self, schema) -> CatalogStreamReader:
        return CatalogStreamReader(self.options, self._schema_json())


def ensure_registered(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CatalogChangeFeedDataSource)
