"""Iceberg-style snapshot catalog over plain parquet.

The target environment speaks Iceberg (BASELINE.json: "Iceberg table of
interleaved text + media documents"); this sandbox has no Iceberg jars,
so this module implements the three Iceberg properties the engine
actually relies on, directly over parquet files:

  * **snapshot isolation** — a snapshot is a JSON manifest listing its
    data files; readers list files from a manifest, never from the
    directory, so concurrent writers can't expose partial output.
  * **atomic commit** — data files are written under a staging name,
    then the manifest is created with ``O_CREAT|O_EXCL`` (exclusive —
    two committers racing for the same snapshot id cannot both win; the
    loser re-reads the parent and retries, Iceberg's optimistic
    concurrency); the catalog pointer (``_current``) is a one-line file
    advanced monotonically with atomic renames. A crash mid-write leaves
    only unreferenced files.
  * **time travel** — every snapshot remains readable by id
    (``read_table(..., snapshot_id=k)``); appends create a child
    snapshot referencing the parent (lineage).

The run ledger (ledger.py) composes with this: each bucket commit can be
a snapshot append, giving resume-partition-exactly WITH snapshot reads.

Not a port of Iceberg — just the minimal spec-compatible behavior the
reference's session-directory bookkeeping (step0/06_directory_manager.py)
gets replaced by (SURVEY §2.1 S10).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(table_dir: str, snapshot_id: int) -> str:
    return os.path.join(table_dir, "metadata", f"snap-{snapshot_id:06d}.json")


def _current_path(table_dir: str) -> str:
    return os.path.join(table_dir, "metadata", "_current")


def current_snapshot_id(table_dir: str) -> int | None:
    try:
        with open(_current_path(table_dir)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def _read_manifest(table_dir: str, snapshot_id: int) -> dict:
    with open(_manifest_path(table_dir, snapshot_id)) as f:
        return json.load(f)


def _write_files(df: DataFrame, table_dir: str) -> list[str]:
    """Write df to a unique staging dir; return the data-file names after
    moving them into data/ (names are unique, moves are renames)."""
    stage = os.path.join(table_dir, f"_stage-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage)
    data_dir = os.path.join(table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    moved = []
    for name in sorted(os.listdir(stage)):
        if not name.endswith(".parquet"):
            continue
        final = f"{uuid.uuid4().hex}-{name}"
        os.rename(os.path.join(stage, name), os.path.join(data_dir, final))
        moved.append(final)
    for leftover in os.listdir(stage):
        os.remove(os.path.join(stage, leftover))
    os.rmdir(stage)
    return moved


def _max_manifest_id(table_dir: str) -> int:
    meta = os.path.join(table_dir, "metadata")
    try:
        names = os.listdir(meta)
    except FileNotFoundError:
        return 0
    # strip 'snap-' / '.json' rather than a fixed-width slice: the id is
    # zero-padded to 6 digits but grows past that at sid >= 1,000,000.
    ids = [
        int(n[5:-5]) for n in names
        if n.startswith("snap-") and n.endswith(".json")
    ]
    return max(ids, default=0)


def _publish(table_dir: str, manifest: dict) -> int:
    """Create the manifest exclusively (commit point), then advance the
    pointer. Raises FileExistsError if another committer won this id."""
    os.makedirs(os.path.join(table_dir, "metadata"), exist_ok=True)
    sid = manifest["snapshot_id"]
    fd = os.open(
        _manifest_path(table_dir, sid), os.O_CREAT | os.O_EXCL | os.O_WRONLY
    )
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1)
    _advance_pointer(table_dir, sid)
    return sid


def _advance_pointer(table_dir: str, sid: int) -> None:
    """Monotonically advance ``_current``: never move it backwards, even
    when an older committer's rename lands after a newer one's."""
    for _ in range(8):
        cur = current_snapshot_id(table_dir) or 0
        target = max(cur, sid, _max_manifest_id(table_dir))
        if cur >= target:
            return
        cur_tmp = _current_path(table_dir) + f".tmp-{uuid.uuid4().hex}"
        with open(cur_tmp, "w") as f:
            f.write(str(target))
        os.rename(cur_tmp, _current_path(table_dir))  # atomic swap


def write_snapshot(df: DataFrame, table_dir: str, operation: str = "overwrite",
                   properties: dict | None = None,
                   aux: dict[str, DataFrame] | None = None) -> int:
    """Commit df as a new snapshot. ``overwrite`` starts a new file set;
    ``append`` unions the parent snapshot's files. Concurrent committers
    are safe: a snapshot id is claimed by exclusive manifest creation,
    and the loser retries against the re-read parent (so no commit is
    ever silently discarded).

    ``aux`` commits named side tables (e.g. a processed-doc_id roster)
    in the SAME manifest — one atomic commit covers data + aux, the
    Iceberg analogue of a snapshot carrying several manifests. Under
    ``append`` each aux file set unions the parent's files for that
    key, like the data files do."""
    files = _write_files(df, table_dir)
    aux_files = {k: _write_files(v, table_dir) for k, v in (aux or {}).items()}
    while True:
        parent = _max_manifest_id(table_dir) or None
        all_files = files
        all_aux = dict(aux_files)
        if operation == "append" and parent is not None:
            pm = _read_manifest(table_dir, parent)
            all_files = pm["files"] + files
            for k, pfiles in pm.get("aux", {}).items():
                all_aux[k] = pfiles + aux_files.get(k, [])
        manifest = {
            "snapshot_id": (parent or 0) + 1,
            "parent_id": parent,
            "operation": operation,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "files": all_files,
            "aux": all_aux,
            # schema rides in the manifest (like Iceberg's) so a snapshot
            # whose data file list is EMPTY — e.g. a batch where every doc
            # legitimately extracted to zero rows — stays readable as an
            # empty DataFrame instead of crashing the parquet reader.
            "schema": df.schema.json(),
            "properties": properties or {},
        }
        try:
            return _publish(table_dir, manifest)
        except FileExistsError:
            continue  # lost the race — re-read parent and retry


def read_table(spark: SparkSession, table_dir: str,
               snapshot_id: int | None = None) -> DataFrame:
    """Read a snapshot (default: current) — file list comes from the
    manifest, so in-flight writers are invisible."""
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(table_dir)
    if sid is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    m = _read_manifest(table_dir, sid)
    paths = [os.path.join(table_dir, "data", f) for f in m["files"]]
    if not paths:
        return _empty_df(spark, m)
    return spark.read.parquet(*paths)


def _empty_df(spark: SparkSession, manifest: dict) -> DataFrame:
    from pyspark.sql.types import StructType

    schema_json = manifest.get("schema")
    if schema_json is None:
        raise FileNotFoundError(
            "snapshot has no data files and no recorded schema"
        )
    return spark.createDataFrame([], StructType.fromJson(json.loads(schema_json)))


def read_aux(spark: SparkSession, table_dir: str, name: str,
             snapshot_id: int | None = None) -> DataFrame | None:
    """Read an aux side table committed with the snapshot (default:
    current). Returns None when the snapshot has no such aux component
    (pre-aux tables stay readable)."""
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(table_dir)
    if sid is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    m = _read_manifest(table_dir, sid)
    files = m.get("aux", {}).get(name)
    if not files:
        return None
    paths = [os.path.join(table_dir, "data", f) for f in files]
    return spark.read.parquet(*paths)


def snapshots(table_dir: str) -> list[dict]:
    """Snapshot lineage, oldest first."""
    meta = os.path.join(table_dir, "metadata")
    names = [
        n for n in os.listdir(meta)
        if n.startswith("snap-") and n.endswith(".json")
    ]
    out = []
    # numeric sort — lexicographic breaks once ids outgrow the 6-digit pad
    for name in sorted(names, key=lambda n: int(n[5:-5])):
        with open(os.path.join(meta, name)) as f:
            out.append(json.load(f))
    return out
