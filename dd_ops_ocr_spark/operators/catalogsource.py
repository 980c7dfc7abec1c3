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

* history retention: snapshots 1..N replay from the manifest lineage,
  so a subscriber can start from the beginning — UNLESS
  ``expire_snapshots`` dropped manifests it hadn't consumed. Hitting
  an expired snapshot raises with recovery guidance by default;
  ``option("starting_snapshot", "earliest")`` starts a fresh
  subscriber at the oldest SURVIVING snapshot (whose full file list
  is emitted as the initial-state backfill when its parent is gone —
  the Debezium/Delta startingVersion shape), ``"latest"`` subscribes
  to future changes only, an integer pins an explicit snapshot id,
  and ``option("allow_data_loss", "true")`` skips expired snapshots
  instead of failing (Kafka's failOnDataLoss=false contract).

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
        self.starting = str(options.get("starting_snapshot", "0"))
        self.allow_data_loss = str(
            options.get("allow_data_loss", "false")
        ).lower() == "true"

    def _current(self) -> int:
        from dd_ops_ocr_spark import catalog

        return catalog.current_snapshot_id(self.table_dir) or 0

    def _earliest_available(self) -> int:
        """Oldest snapshot whose manifest still exists (expire_snapshots
        deletes old manifests); 1 when none were ever expired."""
        import re as _re

        meta = os.path.join(self.table_dir, "metadata")
        try:
            ids = [
                int(n[5:-5]) for n in os.listdir(meta)
                if _re.fullmatch(r"snap-\d+\.json", n)
            ]
        except FileNotFoundError:
            ids = []
        return min(ids, default=1)

    def initialOffset(self) -> dict:
        if self.starting == "earliest":
            return {"snap": self._earliest_available() - 1}
        if self.starting == "latest":
            return {"snap": self._current()}
        return {"snap": int(self.starting)}

    def latestOffset(self) -> dict:
        return {"snap": self._current()}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from dd_ops_ocr_spark import catalog

        out: list[_FileSlice] = []
        for sid in range(start["snap"] + 1, end["snap"] + 1):
            try:
                m = catalog._read_manifest(self.table_dir, sid)
            except FileNotFoundError:
                # expire_snapshots dropped this manifest (and its
                # unshared data files) — the rows are unrecoverable
                if self.allow_data_loss:
                    continue
                raise RuntimeError(
                    f"ddops_catalog: snapshot {sid} of {self.table_dir} "
                    "was expired before this subscriber consumed it. "
                    "Restart from a fresh checkpoint with option("
                    "'starting_snapshot', 'earliest') to backfill from "
                    "the oldest surviving snapshot, or set option("
                    "'allow_data_loss', 'true') to skip expired "
                    "snapshots; expire with keep_last covering "
                    "subscriber lag to avoid this."
                ) from None
            if m.get("operation") in ("compact", "delete"):
                continue  # row set unchanged / removals only
            prev: set = set()
            if m.get("parent_id"):
                try:
                    prev = set(
                        catalog._read_manifest(
                            self.table_dir, m["parent_id"]
                        )["files"]
                    )
                except FileNotFoundError:
                    # parent expired but THIS manifest survives: the
                    # added-files delta is uncomputable, so emit the
                    # full file list — a backfill. Correct for a new
                    # 'earliest' subscriber (initial state + changes,
                    # the Debezium/Delta startingVersion shape); for a
                    # lagging one it restates rows (at-least-once at a
                    # data-loss boundary, never silent loss).
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
    # (no filter-pushdown conf here: this source implements no
    # pushFilters — the conf only matters for readers that do)
    spark.dataSource.register(CatalogChangeFeedDataSource)
