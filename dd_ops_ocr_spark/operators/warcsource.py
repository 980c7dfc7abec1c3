"""WARC archives as a first-class Spark source/sink: the Python
DataSource API (`spark.read.format("ddops_warc")`).

The reference's source stage is imperative driver code that opens each
object and hands pages to the pipeline (`src/modules/step1/
01_pdf_reader.py:41-66`, GCS listing in `src/api/main.py:1717-1847`).
``operators/warc.py`` already gives this repo the byte-real codec; this
module lifts it into Spark's OWN source abstraction — the Spark 4
Python DataSource API — so an archive directory is a table:

    spark.read.format("ddops_warc").load(dir)        # scan
    df.write.format("ddops_warc").mode(...).save(dir)  # sink

Why this matters at 100 TB (what each piece buys):

* **O(files) partition planning.** The writer emits a tiny
  ``.idx.json`` per shard (gzip-member offsets + compressed lengths)
  and stamps each shard's total member bytes into the manifest.
  ``partitions()`` reads ONLY the manifest on the driver — never index
  or data bytes — and plans one byte-range split per ~``split_bytes``
  of compressed members by pure arithmetic; each TASK resolves its own
  member offsets from its shard's sidecar index in parallel. A 1 TB
  shard becomes ~128 bounded 8 MiB tasks; on object storage each task
  is one small index GET + one range-GET. Driver work and split pickle
  size stay O(files) however many members the archive holds. No task
  ever gunzips a whole archive file (WARC Annex-D members are
  independently decompressible — `warc.split_gzip_members` proves it).
* **Filter pushdown** (``pushFilters``): ``warc_type`` equality/IN
  predicates are evaluated INSIDE the scan before the md5/body work,
  so ``WHERE warc_type = 'response'`` skips the metadata/warcinfo
  payload hashing entirely. Unsupported filters are returned to Spark
  and applied post-scan as usual.
* **Arrow batches out.** ``read()`` yields one ``pyarrow.RecordBatch``
  per split — columnar straight into Tungsten, no per-row Python→JVM
  round trip.
* **Commit protocol.** Tasks write ``shard-<pid>-<attempt>`` files and
  return commit messages; only ``commit()`` publishes a manifest
  listing the winners, so readers never observe partial/aborted
  writes. The manifest is VERSIONED and CAS-published exactly like the
  catalog's (`dd_ops_ocr_spark/catalog.py`): written complete to a tmp
  name, then hard-linked to ``_MANIFEST-<v+1>.json`` — link fails with
  EEXIST when another job claimed the version, and the loser re-reads
  and re-merges, so two concurrent ``mode("append")`` jobs both land
  (a read-modify-``os.replace`` would silently drop one's files).
  ``mode("overwrite")`` starts a fresh file list; ``mode("append")``
  unions the previous version's. ``commit()`` deletes NOTHING — a
  sweep there would race a concurrent job's staged-but-uncommitted
  shards; superseded/orphaned files are reclaimed by the explicit
  ``vacuum()`` maintenance call (Iceberg's expire/remove_orphan_files
  split, and the catalog module draws the same line).
* **Quarantine.** Default reads are strict (a corrupt member fails the
  task loudly). ``option("permissive", "true")`` degrades a corrupt
  member to one ``__corrupt__`` row — the reference's warn-and-continue
  contract (`src/modules/step1/01_pdf_reader.py:41-66`) — WITHOUT
  losing the rest of the split, because the sidecar index lets the
  reader inflate each member independently instead of streaming
  through the failure.

Oracle: shards hold one warcinfo member (shard-scoped, excluded by the
queries' type filter) plus per-doc response+metadata records whose
WARC-Record-IDs are the md5-derived urn:uuid of `warc.warc_record_set`
— every emitted field is a closed form of the planted page, restated
in DuckDB SQL, so the driver hash pins writer framing, gzip layer,
index planning, and reader parse bit-exactly.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import uuid
import zlib
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    WriterCommitMessage,
)

from dd_ops_ocr_spark.operators.warc import (
    _http_split,
    _INFO_BODY,
    _record,
    _VERSION,
    _WARC_DATE,
    decode_warc,
    gzip_member,
    warc_record_set,
)

_MANIFEST = "_MANIFEST.json"  # legacy single-file name (version 0 reads)
_MANIFEST_V = re.compile(r"^_MANIFEST-(\d+)\.json$")


def _manifest_v_path(path: str, version: int) -> str:
    return os.path.join(path, f"_MANIFEST-{version:06d}.json")


def _load_manifest(path: str) -> tuple[dict | None, int]:
    """Resolve the current manifest: the highest ``_MANIFEST-<v>.json``,
    falling back to the legacy unversioned ``_MANIFEST.json`` (version
    0) for archives written before manifests were CAS-versioned.
    Returns ``(manifest, version)`` — ``(None, 0)`` when the archive
    has no manifest yet."""
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return None, 0
    versions = [
        int(m.group(1)) for m in map(_MANIFEST_V.match, names) if m
    ]
    if versions:
        v = max(versions)
        with open(_manifest_v_path(path, v)) as f:
            return json.load(f), v
    legacy = os.path.join(path, _MANIFEST)
    if os.path.exists(legacy):
        with open(legacy) as f:
            return json.load(f), 0
    return None, 0


_READ_SCHEMA = (
    "record_id string, warc_type string, target_uri string, "
    "content_length bigint, http_status bigint, body_len bigint, "
    "body_md5 string"
)
# one row per corrupt member under permissive reads; every data field
# is the type's zero so the row is statable in SQL without knowing
# WHICH bytes rotted
_CORRUPT_TYPE = "__corrupt__"


# ------------------------------------------------------------- writer

@dataclass
class _Commit(WriterCommitMessage):
    file: str | None
    n_members: int
    total_bytes: int = 0


def _shard_info_record(pid: int) -> bytes:
    """The shard-scoped warcinfo record (proper WARC files lead with
    one). Its id derives from the partition id — deterministic, but
    shard membership is hash-partitioning dependent, which is why the
    oracle-checked queries filter warcinfo out."""
    h = hashlib.md5(f"warcinfo-shard:{pid}".encode()).hexdigest()
    rid = f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    return _record(
        "warcinfo",
        [("WARC-Date", _WARC_DATE), ("WARC-Record-ID", rid)],
        _INFO_BODY.encode("ascii"),
    )


class WarcArchiveWriter(DataSourceWriter):
    """Per-task shard writer + driver-side manifest commit."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ddops_warc writer requires a path")
        self.overwrite = overwrite

    def write(self, iterator) -> _Commit:
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid, att = tc.partitionId(), tc.taskAttemptId()
        members: list[bytes] = [gzip_member(_shard_info_record(pid))]
        n_docs = 0
        for row in iterator:
            # records[0] is the per-doc warcinfo — the shard-level one
            # above replaces it (one warcinfo per FILE, per the spec)
            for rec in warc_record_set(
                int(row["doc_id"]), str(row["uri"]), str(row["html"])
            )[1:]:
                members.append(gzip_member(rec))
            n_docs += 1
        if n_docs == 0:
            return _Commit(file=None, n_members=0)
        os.makedirs(self.path, exist_ok=True)
        name = f"shard-{pid:05d}-{att}.warc.gz"
        offsets: list[list[int]] = []
        pos = 0
        for m in members:
            offsets.append([pos, len(m)])
            pos += len(m)
        with open(os.path.join(self.path, name), "wb") as f:
            for m in members:
                f.write(m)
        with open(os.path.join(self.path, name + ".idx.json"), "w") as f:
            json.dump({"members": offsets}, f)
        return _Commit(file=name, n_members=len(members), total_bytes=pos)

    def commit(self, messages) -> None:
        new = sorted(m.file for m in messages if m is not None and m.file)
        # a legitimately-empty job (every task saw zero rows) must still
        # publish its (empty) manifest — only row-bearing TASKS create
        # the directory, so the driver ensures it here
        os.makedirs(self.path, exist_ok=True)
        # CAS publish loop (same shape as catalog._publish): merge
        # against the version we read, link-claim the next version,
        # re-merge and retry on EEXIST — two concurrent appends both
        # land. No sweep here: commit cannot tell a loser attempt from
        # a CONCURRENT job's staged-but-uncommitted shard, so deleting
        # unreferenced files would silently destroy that job's data;
        # reclamation is vacuum()'s job, called when no write is live.
        new_stats = {
            m.file: m.total_bytes
            for m in messages
            if m is not None and m.file
        }
        while True:
            prev, ver = _load_manifest(self.path)
            if self.overwrite or prev is None:
                files = list(new)
                # "commits" is the append-ordered epoch log the
                # STREAMING reader offsets into (commit index = offset);
                # "files" stays the flat union the batch reader scans
                commits = [new]
                stats = dict(new_stats)
            else:
                files = sorted(set(prev["files"]) | set(new))
                commits = prev.get("commits", [prev["files"]]) + [new]
                # per-file member-byte totals let partitions() plan
                # byte-range splits without parsing sidecar indexes on
                # the driver (O(files), not O(members)); files committed
                # before stats existed simply stay absent and planning
                # falls back to index-driven splits for the archive
                stats = {**prev.get("stats", {}), **new_stats}
            target = _manifest_v_path(self.path, ver + 1)
            tmp = f"{target}.tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump(
                    {"files": files, "commits": commits, "stats": stats}, f
                )
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, target)  # EEXIST: another job took this v
            except FileExistsError:
                os.unlink(tmp)
                continue
            os.unlink(tmp)
            return

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.file:
                for suffix in ("", ".idx.json"):
                    try:
                        os.remove(os.path.join(self.path, m.file + suffix))
                    except FileNotFoundError:
                        pass  # task died before writing this piece


def vacuum(path: str) -> dict:
    """Reclaim shard files no longer referenced by the CURRENT manifest
    (loser task attempts, files superseded by ``mode("overwrite")``)
    plus superseded manifest versions and orphan ``.tmp-*``. MUST NOT
    run concurrently with a live write job — an in-flight job's staged
    shards are indistinguishable from orphans (the same reason
    ``commit()`` never sweeps, and the same contract as Iceberg's
    remove_orphan_files). Returns counts."""
    manifest, ver = _load_manifest(path)
    if manifest is None:
        return {"data_files": 0, "manifests": 0}
    referenced = set(manifest["files"])
    n_data = n_manifests = 0
    for name in os.listdir(path):
        full = os.path.join(path, name)
        mv = _MANIFEST_V.match(name)
        if mv:
            if int(mv.group(1)) < ver:
                os.remove(full)
                n_manifests += 1
            continue
        if name == _MANIFEST and ver > 0:
            os.remove(full)  # legacy manifest superseded by versioned
            n_manifests += 1
            continue
        if ".tmp-" in name:
            os.remove(full)
            continue
        base = name[: -len(".idx.json")] if name.endswith(
            ".idx.json"
        ) else name
        if base.startswith("shard-") and base not in referenced:
            os.remove(full)
            n_data += 1
    return {"data_files": n_data, "manifests": n_manifests}


# ------------------------------------------------------------- reader

class _MemberSplit(InputPartition):
    """One bounded scan task: a contiguous member range of one shard.
    Carries absolute [offset, comp_len] pairs from the sidecar index so
    the task reads exactly its byte range (one range-GET on object
    storage) and can inflate each member independently."""

    def __init__(self, path: str, members: list) -> None:
        self.path = path
        self.members = members


class _RangeSplit(InputPartition):
    """One bounded scan task as a compressed BYTE range of one shard:
    every member whose start offset lies in [lo, hi) belongs to this
    split (``hi is None`` = to end of file, so members appended after
    the manifest stats were stamped still scan). The task resolves its
    member list from the shard's own sidecar index — parallel,
    executor-side — so the DRIVER plans from per-file byte totals only:
    O(files) work and ~100-byte pickled splits instead of parsing every
    member index and shipping megabytes of offset lists per query."""

    def __init__(self, path: str, lo: int, hi: int | None) -> None:
        self.path = path
        self.lo = lo
        self.hi = hi


def _plan_splits(
    path: str, files: list, split_bytes: int, stats: dict | None = None
) -> list[InputPartition]:
    """Driver-side planning — no data bytes. When the manifest carries
    per-file member-byte totals (``stats``), planning is pure
    arithmetic over them; otherwise (legacy manifests) it falls back
    to parsing each sidecar index on the driver. Shared by the batch
    reader (whole manifest) and the stream reader (one epoch range)."""
    if stats is not None and all(name in stats for name in files):
        splits: list[InputPartition] = []
        for name in files:
            fpath = os.path.join(path, name)
            total = int(stats[name])
            n = max(1, -(-total // split_bytes))  # ceil
            bounds = [total * i // n for i in range(n)]
            for i, lo in enumerate(bounds):
                hi = bounds[i + 1] if i + 1 < n else None
                splits.append(_RangeSplit(fpath, lo, hi))
        return splits
    splits = []
    for name in files:
        fpath = os.path.join(path, name)
        with open(fpath + ".idx.json") as f:
            members = json.load(f)["members"]
        chunk: list = []
        size = 0
        for off, clen in members:
            chunk.append([off, clen])
            size += clen
            if size >= split_bytes:
                splits.append(_MemberSplit(fpath, chunk))
                chunk, size = [], 0
        if chunk:
            splits.append(_MemberSplit(fpath, chunk))
    return splits


_CRLF2 = b"\r\n\r\n"
_VERSION_LINE = _VERSION + b"\r\n"
_VLEN = len(_VERSION_LINE)


def _parse_member(raw: bytes):
    """Parse ONE inflated gzip member into the scan's columns. A
    specialization of ``decode_warc`` + the single-record check for the
    hot path: one UTF-8 decode and one split over the header block
    instead of per-piece decodes and repeated ``find`` calls. Raises
    the same exception CLASSES on the same malformed inputs (bad
    version line, truncated/malformed/non-UTF8 headers, missing or
    garbage Content-Length, payload overrun, missing terminator,
    trailing bytes after the record, missing WARC-Type) so strict and
    permissive classification is unchanged; ``tests/test_warcsource``
    and the driver-checked quarantine oracle pin this equivalence."""
    if not raw.startswith(_VERSION_LINE):
        raise ValueError("bad WARC version line")
    # the header terminator CRLFCRLF can start at byte _VLEN - 2 (the
    # version line's own CRLF + an immediate blank line = empty headers)
    hdr_end = raw.find(_CRLF2, _VLEN - 2)
    if hdr_end < 0:
        raise ValueError("truncated WARC header block")
    headers: dict[str, str] = {}
    if hdr_end > _VLEN:
        for line in raw[_VLEN:hdr_end].decode("utf-8").split("\r\n"):
            name, sep, value = line.partition(":")
            if not sep:
                raise ValueError(f"malformed WARC header {line!r}")
            headers[name.strip()] = value.strip()
    if "Content-Length" not in headers:
        raise ValueError("WARC record without Content-Length")
    clen = int(headers["Content-Length"])
    pos = hdr_end + 4
    n = len(raw)
    if clen < 0 or pos + clen + 4 > n:
        raise ValueError("WARC payload overruns member")
    if raw[pos + clen: pos + clen + 4] != _CRLF2:
        raise ValueError("missing WARC record terminator")
    if pos + clen + 4 != n:
        raise ValueError("member holds != 1 record")
    wtype = headers.get("WARC-Type")
    if not wtype:
        raise ValueError("WARC record without WARC-Type")
    return wtype, headers, raw[pos: pos + clen], clen


def _resolve_members(partition) -> list:
    """The [offset, comp_len] pairs a split owns. ``_MemberSplit``
    carries them; ``_RangeSplit`` resolves them task-side from the
    shard's sidecar index (members whose start offset is in [lo, hi))."""
    if isinstance(partition, _RangeSplit):
        with open(partition.path + ".idx.json") as f:
            members = json.load(f)["members"]
        lo, hi = partition.lo, partition.hi
        return [
            m for m in members
            if m[0] >= lo and (hi is None or m[0] < hi)
        ]
    return partition.members


def _read_split(partition, permissive: bool, type_ok):
    """Task-side execution: one range read, per-member inflate, one
    Arrow RecordBatch out. ``type_ok`` is the (possibly pushed-down)
    warc_type predicate."""
    import pyarrow as pa

    members = _resolve_members(partition) if partition is not None else None
    if partition is None or not members:
        # an empty archive plans zero splits; Spark still issues one
        # read(None) task — answer it with an empty, correctly-typed batch
        yield pa.RecordBatch.from_arrays(
            [pa.array([], t) for t in (
                pa.string(), pa.string(), pa.string(), pa.int64(),
                pa.int64(), pa.int64(), pa.string(),
            )],
            names=[
                "record_id", "warc_type", "target_uri", "content_length",
                "http_status", "body_len", "body_md5",
            ],
        )
        return

    base = members[0][0]
    end = members[-1][0] + members[-1][1]
    with open(partition.path, "rb") as f:
        f.seek(base)
        blob = f.read(end - base)
    cols: list[list] = [[], [], [], [], [], [], []]

    def emit(rid, wtype, uri, clen, status, blen, md5) -> None:
        for col, v in zip(cols, (rid, wtype, uri, clen, status, blen, md5)):
            col.append(v)

    md5_ = hashlib.md5
    for off, clen in members:
        raw_gz = blob[off - base: off - base + clen]
        # permissive mode must degrade ANY malformed member to one
        # __corrupt__ row — not just gzip/framing rot. A member can
        # inflate with a valid CRC yet hold a response whose payload is
        # not well-formed HTTP, a non-UTF8 header block, or a garbage
        # Content-Length (foreign tooling, rot that preserves the CRC);
        # all of those are member-local defects, so the whole
        # parse-to-row path sits inside the try.
        try:
            d = zlib.decompressobj(31)
            raw = d.decompress(raw_gz) + d.flush()
            if not d.eof or d.unused_data:
                raise ValueError("misframed gzip member")
            wtype, hdrs, payload, rec_clen = _parse_member(raw)
            if not type_ok(wtype):
                continue  # pushed filter: skip before any body work
            if wtype == "response":
                status, body = _http_split(payload)
            else:
                status, body = 0, payload
            row = (
                hdrs.get("WARC-Record-ID", ""), wtype,
                hdrs.get("WARC-Target-URI", ""),
                rec_clen, status, len(body),
                md5_(body).hexdigest(),
            )
        except (zlib.error, ValueError, KeyError, IndexError,
                UnicodeDecodeError):
            if not permissive:
                raise
            if type_ok(_CORRUPT_TYPE):
                emit("", _CORRUPT_TYPE, "", 0, 0, 0, "")
            continue
        emit(*row)
    yield pa.RecordBatch.from_arrays(
        [
            pa.array(cols[0], pa.string()),
            pa.array(cols[1], pa.string()),
            pa.array(cols[2], pa.string()),
            pa.array(cols[3], pa.int64()),
            pa.array(cols[4], pa.int64()),
            pa.array(cols[5], pa.int64()),
            pa.array(cols[6], pa.string()),
        ],
        names=[
            "record_id", "warc_type", "target_uri", "content_length",
            "http_status", "body_len", "body_md5",
        ],
    )


class WarcArchiveReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ddops_warc reader requires a path")
        # 8 MiB default: larger bounded range-GETs mean fewer, larger
        # tasks (guide-style shuffle/task-count hygiene) while each
        # split still inflates one bounded byte range
        self.split_bytes = int(options.get("split_bytes", 8 << 20))
        self.permissive = str(
            options.get("permissive", "false")
        ).lower() == "true"
        # (op, value) predicates on warc_type accepted by pushFilters
        self.type_preds: list = []

    # -- pushdown
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for flt in filters:
            if isinstance(flt, EqualTo) and flt.attribute == ("warc_type",):
                self.type_preds.append(("eq", flt.value))
            elif isinstance(flt, In) and flt.attribute == ("warc_type",):
                self.type_preds.append(("in", frozenset(flt.value)))
            else:
                yield flt  # unsupported — Spark applies it post-scan

    def _type_ok(self, wtype: str) -> bool:
        for op, val in self.type_preds:
            if op == "eq" and wtype != val:
                return False
            if op == "in" and wtype not in val:
                return False
        return True

    # -- planning (driver): manifest metadata only, no data bytes
    def partitions(self) -> Sequence[InputPartition]:
        manifest, _ver = _load_manifest(self.path)
        if manifest is None:
            raise FileNotFoundError(
                f"no committed ddops_warc manifest in {self.path}"
            )
        return _plan_splits(
            self.path, manifest["files"], self.split_bytes,
            manifest.get("stats"),
        )

    # -- execution (tasks)
    def read(self, partition: _MemberSplit):
        return _read_split(partition, self.permissive, self._type_ok)


class WarcArchiveStreamReader(DataSourceStreamReader):
    """`spark.readStream.format("ddops_warc")`: micro-batches are the
    writer's COMMIT EPOCHS. The manifest's append-ordered ``commits``
    list is the offset log — offset = number of epochs consumed — so
    progress is one integer in Spark's checkpoint, replay of any
    (start, end] range replans exactly the same member splits, and a
    crashed query resumes exactly-once without the source keeping any
    state of its own. Planning stays driver-metadata-only and reads
    stay executor-side bounded splits (same `_plan_splits` /
    `_read_split` as the batch scan). An ``overwrite`` of the archive
    invalidates outstanding offsets by design — same contract as
    file-stream sources over rewritten directories."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ddops_warc stream reader requires a path")
        # 8 MiB default: larger bounded range-GETs mean fewer, larger
        # tasks (guide-style shuffle/task-count hygiene) while each
        # split still inflates one bounded byte range
        self.split_bytes = int(options.get("split_bytes", 8 << 20))
        self.permissive = str(
            options.get("permissive", "false")
        ).lower() == "true"

    def _commits(self) -> tuple[list, dict | None]:
        m, _ver = _load_manifest(self.path)
        if m is None:
            return [], None  # archive not created yet — stream waits
        return m.get("commits", [m["files"]]), m.get("stats")

    def initialOffset(self) -> dict:
        return {"commit": 0}

    def latestOffset(self) -> dict:
        return {"commit": len(self._commits()[0])}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        commits, stats = self._commits()
        files = [
            name
            for epoch in commits[start["commit"]: end["commit"]]
            for name in epoch
        ]
        return _plan_splits(self.path, files, self.split_bytes, stats)

    def read(self, partition: _MemberSplit):
        return _read_split(partition, self.permissive, lambda _t: True)

    def commit(self, end: dict) -> None:
        pass  # the manifest IS the log; Spark's checkpoint holds offsets


class WarcArchiveDataSource(DataSource):
    """format("ddops_warc"): directory of Annex-D .warc.gz shards with
    sidecar member indexes and a commit manifest."""

    @classmethod
    def name(cls) -> str:
        return "ddops_warc"

    def schema(self) -> str:
        return _READ_SCHEMA

    def reader(self, schema) -> WarcArchiveReader:
        return WarcArchiveReader(self.options)

    def streamReader(self, schema) -> WarcArchiveStreamReader:
        return WarcArchiveStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> WarcArchiveWriter:
        return WarcArchiveWriter(self.options, overwrite)


def ensure_registered(spark: SparkSession) -> None:
    """Idempotent per-session registration (register replaces). Also
    flips the session conf that gates Python-DataSource pushdown —
    off by default in Spark 4.1, and without it a reader implementing
    pushFilters() is an ERROR, not a slow path — set here so the
    source works in ANY caller's session (e.g. the correctness
    driver's), not just ones built by session.build_spark."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WarcArchiveDataSource)


# ------------------------------------------------------------ fixtures

_FIXTURE_VERSION = 2  # v2: manifests carry per-file stats for O(files) planning


def _pages_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_ops_ocr_spark.operators.warc import _pages

    return _pages(spark, sf_dir).select("doc_id", "uri", "html")


def _corrupt_metadata_members(path: str) -> None:
    """Flip one CRC byte of the metadata member of every md5-gated doc
    (3rd md5 nibble even — the repo's standard deterministic gate).
    Offsets don't move, so the sidecar indexes stay valid: exactly the
    bit-rot case the permissive reader must quarantine per-member."""
    manifest, _ver = _load_manifest(path)
    for name in manifest["files"]:
        fpath = os.path.join(path, name)
        with open(fpath, "rb") as f:
            data = bytearray(f.read())
        with open(fpath + ".idx.json") as f:
            members = json.load(f)["members"]
        for off, clen in members:
            d = zlib.decompressobj(31)
            raw = d.decompress(bytes(data[off: off + clen])) + d.flush()
            recs = decode_warc(raw)
            wtype, _hdrs, payload = recs[0]
            if wtype != "metadata":
                continue
            doc_id = int(
                payload.split(b"docId: ", 1)[1].split(b"\r\n", 1)[0]
            )
            h = hashlib.md5(str(doc_id).encode()).hexdigest()
            if int(h[2], 16) % 2 == 0:
                data[off + clen - 8] ^= 0x01  # CRC32 trailer byte
        with open(fpath, "wb") as f:
            f.write(data)


def _fixture_dir(
    spark: SparkSession, sf_dir: str, corrupt: bool
) -> str:
    from dd_ops_ocr_spark.fixture_cache import bench_cache_dir, cached_fixture

    name = os.path.basename(sf_dir.rstrip("/"))
    cache = bench_cache_dir()
    tag = "corrupt" if corrupt else "clean"
    path = os.path.join(
        cache, f"warcds_{name}_{tag}_v{_FIXTURE_VERSION}"
    )

    def build(tmp: str) -> None:
        ensure_registered(spark)
        (
            _pages_df(spark, sf_dir)
            .repartition(8, "doc_id")
            .write.format("ddops_warc")
            .mode("overwrite")
            .save(tmp)
        )
        if corrupt:
            _corrupt_metadata_members(tmp)

    return cached_fixture(path, build)


def bench_archive(spark: SparkSession, sf_dir: str, mult: int = 64) -> str:
    """Build-once multiplied archive for the scan bench: the planted
    pages replicated ``mult``x with disjoint doc_ids, written through
    the DataSource writer (32 shards + sidecar indexes + manifest).
    The read side then measures what matters — member-split planning
    fan-out and per-member inflate+parse throughput — on enough
    members that per-query overhead is noise."""
    from dd_ops_ocr_spark.fixture_cache import bench_cache_dir, cached_fixture

    name = os.path.basename(sf_dir.rstrip("/"))
    cache = bench_cache_dir()
    path = os.path.join(
        cache, f"warcds_{name}_x{mult}_v{_FIXTURE_VERSION}"
    )

    def build(tmp: str) -> None:
        ensure_registered(spark)
        pages = _pages_df(spark, sf_dir)
        rep = (
            pages.crossJoin(
                F.broadcast(
                    spark.range(mult).withColumnRenamed("id", "rep")
                )
            )
            .withColumn(
                "doc_id",
                F.col("doc_id") + F.col("rep") * F.lit(100_000_000),
            )
            .drop("rep")
        )
        (
            rep.repartition(32, "doc_id")
            .write.format("ddops_warc")
            .mode("overwrite")
            .save(tmp)
        )

    return cached_fixture(path, build)


# ------------------------------------------------------------- queries

def q_warc_source_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writer -> manifest -> planned member-splits -> pushed-filter
    read. The IN filter lands in the scan via pushFilters, so warcinfo
    members are skipped before any hashing; the remaining rows are the
    per-doc response+metadata records, every field a closed form of
    the planted page."""
    path = _fixture_dir(spark, sf_dir, corrupt=False)
    ensure_registered(spark)
    # small splits force multi-split planning even at sf0.01 so the
    # driver check exercises the range-read path, not one-task-per-file
    df = (
        spark.read.format("ddops_warc")
        .option("split_bytes", 16384)
        .load(path)
    )
    return df.filter(F.col("warc_type").isin("response", "metadata"))


def q_warc_source_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permissive read over a bit-rotted archive: md5-gated docs had
    their metadata member's CRC flipped, so each surfaces as ONE
    __corrupt__ row while every other member of the same split still
    decodes — per-member isolation that only index-driven inflation
    can give (a streaming gunzip would lose the rest of the file)."""
    path = _fixture_dir(spark, sf_dir, corrupt=True)
    ensure_registered(spark)
    df = (
        spark.read.format("ddops_warc")
        .option("split_bytes", 16384)
        .option("permissive", "true")
        .load(path)
    )
    return df.filter(
        F.col("warc_type").isin("response", "metadata", _CORRUPT_TYPE)
    )


# ------------------------------------------------------------- oracles

def _sql_rid(doc_expr: str, i: int) -> str:
    h = f"md5({doc_expr}::VARCHAR || ':{i}')"
    return (
        f"'<urn:uuid:' || substring({h}, 1, 8) || '-' || "
        f"substring({h}, 9, 4) || '-' || substring({h}, 13, 4) || '-' || "
        f"substring({h}, 17, 4) || '-' || substring({h}, 21, 12) || '>'"
    )


def _sql() -> tuple[str, str]:
    from dd_ops_ocr_spark.operators.htmlops import (
        _SQL_PLANT,
        _sql_canonical,
    )
    from dd_ops_ocr_spark.operators.warc import _HTTP_PRE

    crlf = "chr(13) || chr(10)"
    meta_body = (
        f"'docId: ' || doc_id::VARCHAR || {crlf} || 'via: crawler' || {crlf}"
    )
    base = f"""
WITH pages AS ({_SQL_PLANT}),
uri AS (
  SELECT doc_id, {_sql_canonical("doc_id")} AS uri FROM documents
),
src AS (
  SELECT p.doc_id, u.uri, p.html,
    (strpos('0123456789abcdef',
            substring(md5(p.doc_id::VARCHAR), 3, 1)) - 1) AS n3
  FROM pages p JOIN uri u ON p.doc_id = u.doc_id
)
"""
    response = f"""
  SELECT {_sql_rid("doc_id", 2)} AS record_id,
    'response' AS warc_type, uri AS target_uri,
    ({len(_HTTP_PRE)} + length(length(html)::VARCHAR) + 4
     + length(html))::BIGINT AS content_length,
    200::BIGINT AS http_status, length(html)::BIGINT AS body_len,
    md5(html) AS body_md5
  FROM src
"""
    def metadata(where: str = "") -> str:
        return f"""
  SELECT {_sql_rid("doc_id", 3)}, 'metadata', uri,
    (23 + length(doc_id::VARCHAR))::BIGINT, 0,
    (23 + length(doc_id::VARCHAR))::BIGINT, md5({meta_body})
  FROM src {where}
"""
    read_sql = base + f"""
SELECT record_id, warc_type, target_uri, content_length,
       http_status, body_len, body_md5
FROM ({response} UNION ALL {metadata()})
"""
    quarantine_sql = base + f"""
SELECT record_id, warc_type, target_uri, content_length,
       http_status, body_len, body_md5
FROM (
  {response}
  UNION ALL
  {metadata("WHERE n3 % 2 <> 0")}
  UNION ALL
  SELECT '', '{_CORRUPT_TYPE}', '', 0::BIGINT, 0::BIGINT, 0::BIGINT, ''
  FROM src WHERE n3 % 2 = 0
)
"""
    return read_sql, quarantine_sql


QUERIES = {
    "warc_source_read": q_warc_source_read,
    "warc_source_quarantine": q_warc_source_quarantine,
}


def __getattr__(name: str):
    """PEP 562 lazy oracle SQL: ``_sql()`` pulls htmlops (and through it
    pandas) for the closed-form page/URL expressions — ~0.3 s of import
    the Python-DataSource PLAN worker would otherwise pay on every
    ``ddops_warc`` query, since unpickling the reader imports this
    module. The registry (driver side) still sees ORACLE_SQL eagerly at
    its own import; the SQL text is byte-identical."""
    if name in ("SQL_WARC_SOURCE_READ", "SQL_WARC_SOURCE_QUARANTINE",
                "ORACLE_SQL"):
        read_sql, quarantine_sql = _sql()
        g = globals()
        g["SQL_WARC_SOURCE_READ"] = read_sql
        g["SQL_WARC_SOURCE_QUARANTINE"] = quarantine_sql
        g["ORACLE_SQL"] = {
            "warc_source_read": read_sql,
            "warc_source_quarantine": quarantine_sql,
        }
        return g[name]
    raise AttributeError(name)
