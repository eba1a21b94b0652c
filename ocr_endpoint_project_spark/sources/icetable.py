"""Iceberg-style table format on plain parquet (north_rule "Iceberg table").

SURVEY.md §1.1 maps the reference's append-only results store + derived
latest-snapshot reads (``pages/parallel_ocr_test.py:56-68``,
``scripts/export_benchmark_results.py:47-56``) to "Iceberg append +
snapshot isolation".  Earlier rounds delivered those SEMANTICS on bare
parquet directories; this module adds the metadata/manifest layer itself,
modeled on the public Apache Iceberg spec (v2), so that snapshot
isolation, time travel, and scan planning are implemented rather than
asserted:

* ``metadata/v{N}.metadata.json`` — immutable table metadata: schema,
  partition column, the full snapshot log, and ``current_snapshot_id``.
  One file per committed version, exactly Iceberg's metadata lineage.
* ``metadata/snap-{id}.manifest-list.json`` — per-snapshot manifest
  LIST: which manifests make up the snapshot, each with a partition-value
  summary so readers can prune WHOLE manifests before opening them
  (Iceberg's two-level pruning).
* ``metadata/manifest-{id}-{k}.json`` — immutable manifests: data files
  with per-file row/byte counts and per-column min/max stats harvested
  from the parquet footers (Iceberg collects the same stats from write
  results).  Appends add ONE new manifest and reuse the parent's list
  untouched — commit cost is O(new files), never O(table).
* ``data/…/snap{seq}-part-*.parquet`` — immutable data files, written by
  Spark, hive-style partition directories so readers reconstitute the
  partition column from paths (``basePath`` option).

Commit protocol (optimistic concurrency / snapshot isolation):

1. write data files into the table's data dir (invisible: nothing
   references them yet — a crash here leaves harmless orphans, and the
   table still reads at the old snapshot);
2. write the new manifest + manifest list;
3. render ``v{N+1}.metadata.json`` to a temp name and publish it with an
   atomic compare-and-swap: ``os.link`` on plain paths (EEXIST = lost
   race), ``FileContext.rename(Options.Rename.NONE)`` on Hadoop
   FileSystem URIs (r7 — all storage IO routes through the ``_LocalIO``
   / ``_HadoopIO`` backends below, so ``file:``/``hdfs:``/``s3a:``
   tables work end to end; tests run the full lifecycle against
   ``file:`` through the Hadoop client).  The loser re-reads the
   now-current metadata, re-validates (appends always merge; overwrites
   re-check partition conflicts) and retries against N+2.  Readers
   resolve the current version ONCE and then touch only immutable
   files, so a scan never observes a half-commit.  The one remaining
   object-store caveat: S3 has no atomic rename, so a production S3
   deployment swaps ONLY ``_HadoopIO.cas_write`` for a catalog
   conditional-put (Glue/DynamoDB/REST) — exactly Iceberg's own answer.

``version-hint.text`` is a best-effort pointer (exactly Iceberg's
HadoopCatalog hint file); readers fall back to listing the metadata dir.

Scale: metadata ops are O(files touched) JSON writes; the data path is
ordinary Spark parquet IO.  Stats harvesting reads only parquet FOOTERS
(pyarrow), never data pages; at 10^12 docs you would collect the same
stats from task commit messages instead of a driver-side footer pass —
the manifest format is identical either way.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

_HINT = "version-hint.text"


def _meta_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, "metadata", f"v{version}.metadata.json")


# ---------------------------------------------------------------------------
# storage backends (r7, VERDICT #2): every metadata/staging IO routes
# through an IO object, so the table format runs on any Hadoop
# FileSystem (``file:``, ``hdfs:``, ``s3a:`` via the JVM FS client) and
# not just the local POSIX disk — the same migration
# ``jobs/compact_job.py`` made in r5. Plain paths keep the original
# os-based fast path, whose ``os.link`` CAS is truly atomic.
# ---------------------------------------------------------------------------

_URI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:/")


def _io_for(path: str):
    return _HadoopIO(path) if _URI_RE.match(path) else _LocalIO()


class _LocalIO:
    """POSIX-path backend — the original implementation, byte-for-byte."""

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def write_bytes(self, path: str, data: bytes) -> None:
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def cas_write(self, dst: str, data: bytes, tmp: str) -> bool:
        """Create ``dst`` with ``data`` iff absent.  ``os.link`` is an
        atomic create-if-absent on POSIX (EEXIST = lost race)."""
        self.write_bytes(tmp, data)
        try:
            os.link(tmp, dst)
        except FileExistsError:
            return False
        finally:
            if os.path.exists(dst):
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
        return True

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def delete(self, path: str) -> None:
        os.unlink(path)

    def delete_recursive(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def list_files(self, path: str):
        for root, _dirs, files in os.walk(path):
            for name in files:
                yield os.path.join(root, name)

    def qualify(self, path: str) -> str:
        """Canonical absolute form for path-containment comparisons."""
        return os.path.abspath(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def open_seekable(self, path: str):
        return open(path, "rb")


class _HadoopIO:
    """Hadoop FileSystem backend (driver-side py4j against the session's
    JVM — executors never touch table metadata).

    CAS = ``FileContext.rename(src, dst, Options.Rename.NONE)``: atomic
    rename-without-overwrite on HDFS (the namenode serializes it); on
    the local AbstractFileSystem it is check-then-rename, so same-host
    multi-writer setups should prefer plain paths (``_LocalIO``'s
    ``os.link`` is truly atomic).  S3 has no atomic rename either — a
    production S3 deployment swaps ONLY :meth:`cas_write` for a catalog
    CAS (Glue / DynamoDB / REST catalog conditional put), exactly
    Iceberg's own answer; every other operation here is plain object IO.
    """

    def __init__(self, any_path: str):
        # getActiveSession() is THREAD-local; concurrent writers commit
        # from their own threads, so fall back to the process-wide
        # instantiated session
        spark = SparkSession.getActiveSession() or getattr(
            SparkSession, "_instantiatedSession", None
        )
        if spark is None:
            raise RuntimeError(
                "icetable on a URI path needs an active SparkSession "
                "(the Hadoop FS client lives in the JVM)"
            )
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._gw = spark.sparkContext._gateway
        p = self._path(any_path)
        self._fs = p.getFileSystem(self._conf)
        self._fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            p.toUri(), self._conf
        )

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def read_bytes(self, path: str) -> bytes:
        stream = self._fs.open(self._path(path))
        try:
            # byte[] return values auto-convert to Python bytes
            return bytes(
                self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()

    def write_bytes(self, path: str, data: bytes) -> None:
        out = self._fs.create(self._path(path), True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def cas_write(self, dst: str, data: bytes, tmp: str) -> bool:
        self.write_bytes(tmp, data)
        Rename = self._jvm.org.apache.hadoop.fs.Options.Rename
        arr = self._gw.new_array(Rename, 1)
        arr[0] = Rename.NONE
        try:
            self._fc.rename(self._path(tmp), self._path(dst), arr)
            return True
        except Exception as e:  # Py4JJavaError
            jexc = getattr(e, "java_exception", None)
            cls = jexc.getClass().getName() if jexc is not None else ""
            if "FileAlreadyExistsException" in cls:
                try:
                    self._fs.delete(self._path(tmp), False)
                except Exception:  # noqa: BLE001 — tmp cleanup is best-effort
                    pass
                return False
            raise

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._path(path)))

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._path(path))

    def delete(self, path: str) -> None:
        self._fs.delete(self._path(path), False)

    def delete_recursive(self, path: str) -> None:
        self._fs.delete(self._path(path), True)

    def rename(self, src: str, dst: str) -> None:
        self._fs.rename(self._path(src), self._path(dst))

    def list_files(self, path: str):
        if not self.exists(path):
            return
        it = self._fs.listFiles(self._path(path), True)
        while it.hasNext():
            yield it.next().getPath().toString()

    def qualify(self, path: str) -> str:
        """Fully-qualified URI via the FS (resolves default scheme /
        authority spellings), for path-containment comparisons —
        ``listFiles`` yields fully-qualified URIs while the user's
        ``table_dir`` may be shorthand like ``hdfs:/x``; comparing raw
        strings silently mismatches (ADVICE round-8 fix)."""
        return self._fs.makeQualified(self._path(path)).toString()

    def size(self, path: str) -> int:
        return int(self._fs.getFileStatus(self._path(path)).getLen())

    def open_seekable(self, path: str):
        return _HadoopSeekableFile(
            self._fs.open(self._path(path)), self.size(path), self._jvm
        )


class _HadoopSeekableFile:
    """Minimal seekable file-like over ``FSDataInputStream`` for
    pyarrow's footer reads (a handful of small seek+read calls/file)."""

    def __init__(self, stream, size: int, jvm):
        self._s = stream
        self._size = size
        self._jvm = jvm
        self.closed = False

    def seekable(self):
        return True

    def readable(self):
        return True

    def writable(self):
        return False

    def tell(self) -> int:
        return int(self._s.getPos())

    def seek(self, pos: int, whence: int = 0) -> int:
        if whence == 1:
            pos += self.tell()
        elif whence == 2:
            pos += self._size
        self._s.seek(pos)
        return pos

    def size(self) -> int:
        return self._size

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self.tell()
        n = min(n, self._size - self.tell())
        if n <= 0:
            return b""
        return bytes(
            self._jvm.org.apache.commons.io.IOUtils.toByteArray(self._s, n)
        )

    def close(self) -> None:
        if not self.closed:
            self._s.close()
            self.closed = True

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def _write_json(path: str, obj) -> None:
    """Local-path JSON write (kept for the executor-side streaming sink,
    which runs without a py4j gateway; IceTable routes through its IO)."""
    _LocalIO().write_bytes(
        path, json.dumps(obj, sort_keys=True).encode("utf-8")
    )


def _read_json(path: str):
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def _file_stats(path: str, stat_cols: list[str], io=None) -> dict:
    """Row/byte counts + per-column min/max from the parquet FOOTER only."""
    import pyarrow.parquet as pq

    io = io or _LocalIO()
    with io.open_seekable(path) as f:
        md = pq.ParquetFile(f).metadata
    lo: dict = {}
    hi: dict = {}
    name_to_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    for col in stat_cols:
        idx = name_to_idx.get(col)
        if idx is None:
            continue
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                lo.pop(col, None)
                hi.pop(col, None)
                break
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                mn, mx = mn.decode("utf-8", "replace"), mx.decode("utf-8", "replace")
            lo[col] = mn if col not in lo else min(lo[col], mn)
            hi[col] = mx if col not in hi else max(hi[col], mx)
    return {
        "rows": md.num_rows,
        "bytes": io.size(path),
        "min": lo,
        "max": hi,
    }


class IceTable:
    """A partitioned table with snapshots, time travel, and scan planning.

    ``partition_col`` is identity-partitioning on one column (the shape
    the extraction sink needs: ``partition_id``); ``None`` gives an
    unpartitioned table.  ``stat_cols`` are the columns whose min/max
    land in the manifests for file skipping.
    """

    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        self.data_dir = os.path.join(table_dir, "data")
        self.meta_dir = os.path.join(table_dir, "metadata")
        self._io = None

    @property
    def io(self):
        """Storage backend, resolved lazily from the path scheme (plain
        path -> POSIX; ``scheme:/...`` -> Hadoop FileSystem)."""
        if self._io is None:
            self._io = _io_for(self.table_dir)
        return self._io

    def _rj(self, path: str):
        return json.loads(self.io.read_bytes(path))

    def _wj(self, path: str, obj) -> None:
        self.io.write_bytes(path, json.dumps(obj, sort_keys=True).encode("utf-8"))

    def _cas_json(self, dst: str, obj, token: str) -> bool:
        return self.io.cas_write(
            dst, json.dumps(obj, sort_keys=True).encode("utf-8"),
            dst + f".claim-{token}",
        )

    # -- catalog ----------------------------------------------------------

    @classmethod
    def create(
        cls,
        table_dir: str,
        partition_col: str | None = None,
        stat_cols: list[str] | None = None,
    ) -> "IceTable":
        t = cls(table_dir)
        t.io.mkdirs(t.data_dir)
        t.io.mkdirs(t.meta_dir)
        if t.io.exists(_meta_path(table_dir, 1)):
            raise FileExistsError(f"table already exists at {table_dir}")
        meta = {
            "format": "icetable/1",
            "partition_col": partition_col,
            "stat_cols": stat_cols or [],
            "snapshots": [],
            "current_snapshot_id": None,
            "last_sequence": 0,
        }
        if not t._cas_json(_meta_path(table_dir, 1), meta, "v0"):
            raise FileExistsError(f"concurrent create at {table_dir}")
        t._write_hint(1)
        return t

    @classmethod
    def load(cls, table_dir: str) -> "IceTable":
        t = cls(table_dir)
        t.current_version()  # raises if absent
        return t

    def _write_hint(self, version: int) -> None:
        self._wj(os.path.join(self.meta_dir, _HINT), {"version": version})

    def current_version(self) -> int:
        """Newest committed metadata version (hint fast-path, list fallback)."""
        hint = os.path.join(self.meta_dir, _HINT)
        v = 0
        if self.io.exists(hint):
            try:
                v = int(self._rj(hint)["version"])
            except (ValueError, KeyError, json.JSONDecodeError):
                v = 0
        while self.io.exists(_meta_path(self.table_dir, v + 1)):
            v += 1  # hint is best-effort; walk forward to the true head
        if v == 0:
            raise FileNotFoundError(f"no icetable metadata in {self.meta_dir}")
        return v

    def metadata(self, version: int | None = None) -> dict:
        return self._rj(
            _meta_path(self.table_dir, version or self.current_version())
        )

    def snapshots(self) -> list[dict]:
        """The snapshot log (oldest first) — Iceberg's history table."""
        return self.metadata()["snapshots"]

    # -- write path -------------------------------------------------------

    def _stage_data(self, df: DataFrame, meta: dict, seq: int) -> list[dict]:
        """Write ``df`` as immutable data files; return manifest entries.

        Files are written to a scratch dir then hard-linked into
        ``data/`` (two dirs on one filesystem; a crash mid-move leaves
        only unreferenced files).  Names carry a per-stage random token:
        data files are staged ONCE per logical commit and reused across
        CAS retries (whose sequence number moves), and a token also keeps
        a crashed writer's orphans from colliding with a later commit.
        """
        import secrets
        from urllib.parse import unquote

        token = secrets.token_hex(4)
        pcol = meta["partition_col"]
        scratch = os.path.join(self.table_dir, f"_stage-{seq}-{token}")
        self.io.delete_recursive(scratch)
        writer = df.write.mode("overwrite")
        if pcol is not None:
            writer = writer.partitionBy(pcol)
        writer.parquet(scratch)

        moves: list[tuple[str, str, str | None]] = []  # (src, dst, part)
        made_dirs: set[str] = set()
        counter = 0
        for src in sorted(self.io.list_files(scratch)):
            rel = os.path.relpath(src, scratch)
            if not rel.endswith(".parquet"):
                continue
            rel_dir = os.path.dirname(rel)
            part_val = None
            if pcol is not None and rel_dir:
                # hive-style "pcol=value" path component.  Spark escapes
                # special chars (space, '/', ':', '%'…) as %XX when
                # writing partition dirs and unescapes them when reading
                # with basePath — unescape here too, or string partition
                # values in the manifest would diverge from the column
                # values and plan_files/pushFilters could wrongly prune.
                part_val = unquote(rel_dir.split("=", 1)[1])
            dst_dir = (
                self.data_dir
                if not rel_dir
                else os.path.join(self.data_dir, rel_dir)
            )
            if dst_dir not in made_dirs:
                self.io.mkdirs(dst_dir)
                made_dirs.add(dst_dir)
            dst = os.path.join(
                dst_dir, f"snap{seq}-{token}-part-{counter:05d}.parquet"
            )
            counter += 1
            moves.append((src, dst, part_val))

        def _move_and_stat(rec: tuple[str, str, str | None]) -> dict:
            src, dst, part_val = rec
            self.io.rename(src, dst)
            st = _file_stats(dst, meta["stat_cols"], io=self.io)
            return {
                "path": os.path.relpath(dst, self.table_dir),
                "partition": part_val,
                **st,
            }

        # the move + footer-stats pass is per-file driver work (a py4j
        # round-trip chain on Hadoop backends, small pyarrow opens
        # locally): run it on a thread pool so a 4096-file commit costs
        # ~max(file) latency, not the sum. Hadoop FileSystem and the
        # py4j gateway are thread-safe; at 10^12 docs the same stats
        # would come from task commit messages instead (module
        # docstring), with an identical manifest format.
        if len(moves) > 4:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(16, len(moves))) as ex:
                entries = list(ex.map(_move_and_stat, moves))
        else:
            entries = [_move_and_stat(m) for m in moves]
        self.io.delete_recursive(scratch)
        entries.sort(key=lambda e: e["path"])
        return entries

    def _commit(self, operation: str, build) -> dict:
        """Optimistic-concurrency commit loop.

        ``build(meta, seq, token)`` writes this attempt's manifests (every
        metadata file name carries the attempt ``token`` so two racing
        writers can NEVER overwrite each other's files — only the CAS
        decides whose become reachable) and returns ``(manifest_names,
        summary)``; the manifest list is re-assembled per attempt so
        overwrite conflicts are re-validated against the CURRENT head.
        """
        import secrets

        for _attempt in range(20):
            token = secrets.token_hex(4)
            version = self.current_version()
            meta = self.metadata(version)
            seq = meta["last_sequence"] + 1
            manifest_names, summary = build(meta, seq, token)
            snap_id = seq
            list_name = f"snap-{snap_id}-{token}.manifest-list.json"
            self._wj(os.path.join(self.meta_dir, list_name), manifest_names)
            new_meta = dict(meta)
            new_meta["last_sequence"] = seq
            new_meta["current_snapshot_id"] = snap_id
            if getattr(self, "_pending_schema", None) is not None:
                # metadata-driven schema evolution (Iceberg: the schema
                # lives in table metadata, NOT in data-file footers): the
                # newest committed write's schema becomes the table
                # schema; scans read EVERY snapshot with it, so columns
                # added later come back NULL-filled from old files
                # without any footer merging.
                new_meta["schema"] = self._pending_schema
            new_meta["snapshots"] = meta["snapshots"] + [
                {
                    "snapshot_id": snap_id,
                    "parent_id": meta["current_snapshot_id"],
                    "sequence": seq,
                    "timestamp_ms": int(time.time() * 1000),
                    "operation": operation,
                    "manifest_list": list_name,
                    "summary": summary,
                }
            ]
            if self._cas_json(
                _meta_path(self.table_dir, version + 1), new_meta, token
            ):
                self._write_hint(version + 1)
                self._pending_schema = None
                return new_meta["snapshots"][-1]
            # lost the race: another writer committed version+1 — loop,
            # re-read the new head, re-validate, and try version+2
        raise RuntimeError("icetable commit contention: 20 CAS attempts lost")

    def _manifest_summary(self, entries: list[dict]) -> dict:
        parts = sorted({e["partition"] for e in entries if e["partition"] is not None})
        return {
            "partitions": parts,
            "rows": sum(e["rows"] for e in entries),
            "bytes": sum(e["bytes"] for e in entries),
            "files": len(entries),
        }

    def append(self, df: DataFrame) -> dict:
        """Commit ``df`` as a new snapshot appended to the current one.

        Data files are staged ONCE; only the (cheap) metadata step
        repeats on a lost CAS — commit retries never rewrite data.
        """
        meta0 = self.metadata()
        entries = self._stage_data(df, meta0, meta0["last_sequence"] + 1)
        self._pending_schema = df.schema.jsonValue()

        def build(meta: dict, seq: int, token: str):
            name = f"manifest-{seq}-{token}-0.json"
            self._wj(os.path.join(self.meta_dir, name), entries)
            parent = self._current_manifest_names(meta)
            summary = self._manifest_summary(entries)
            summary["added_files"] = summary.pop("files")
            return parent + [{"name": name, **self._manifest_summary(entries)}], summary

        return self._commit("append", build)

    def commit_appended_entries(
        self,
        entries: list[dict],
        extra_summary: dict | None = None,
        idempotency_key: str | None = None,
    ) -> dict:
        """Metadata-only append commit for data files ALREADY in place
        (the two-phase-commit path: executors write files and report
        manifest entries, the driver commits them here — used by the
        streaming sink in ``icetable_source.py``).

        ``idempotency_key``: if a snapshot already carries this key in
        its summary the commit is skipped and that snapshot returned —
        a replayed micro-batch after a crash between table commit and
        the engine's checkpoint ack commits exactly once.
        """
        if idempotency_key is not None:
            for s in self.metadata()["snapshots"]:
                if s["summary"].get("idempotency_key") == idempotency_key:
                    return s

        def build(meta: dict, seq: int, token: str):
            name = f"manifest-{seq}-{token}-0.json"
            self._wj(os.path.join(self.meta_dir, name), entries)
            parent = self._current_manifest_names(meta)
            summary = self._manifest_summary(entries)
            summary["added_files"] = summary.pop("files")
            if extra_summary:
                summary.update(extra_summary)
            if idempotency_key is not None:
                summary["idempotency_key"] = idempotency_key
            return parent + [{"name": name, **self._manifest_summary(entries)}], summary

        return self._commit("append", build)

    def stage_overwrite(self, df: DataFrame) -> list[dict]:
        """Phase 1 of a dynamic partition overwrite: write ``df``'s data
        files into the table layout and return their manifest entries —
        NOTHING is committed yet (a crash leaves harmless orphans).

        Callers that need commit-time metadata derived from the staged
        rows (e.g. the extraction sink's lineage summary) read the
        entries' files between this and :meth:`commit_overwrite`, so the
        expensive producing plan runs exactly once.
        """
        meta0 = self.metadata()
        if meta0["partition_col"] is None:
            raise ValueError("overwrite_partitions needs a partitioned table")
        entries = self._stage_data(df, meta0, meta0["last_sequence"] + 1)
        self._pending_schema = df.schema.jsonValue()
        return entries

    def overwrite_partitions(self, df: DataFrame, extra_summary: dict | None = None) -> dict:
        """Dynamic partition overwrite: replace exactly the partitions in ``df``.

        Prior manifests with NO overlap are reused as-is (O(new files)
        commit); partially-overlapping manifests are rewritten filtered —
        both immutable, so concurrent readers are unaffected.  A retry
        after a lost CAS re-checks overlap against the NEW head (data
        files are reused, the manifest merge is redone), which is what
        makes two writers overwriting DISJOINT partitions both succeed —
        serialized, neither lost.
        """
        return self.commit_overwrite(self.stage_overwrite(df), extra_summary)

    def commit_overwrite(
        self, entries: list[dict], extra_summary: dict | None = None
    ) -> dict:
        """Phase 2: publish staged entries as one overwrite snapshot."""
        touched = {e["partition"] for e in entries}

        def build(meta: dict, seq: int, token: str):
            name = f"manifest-{seq}-{token}-0.json"
            self._wj(os.path.join(self.meta_dir, name), entries)
            kept: list[dict] = []
            k = 1
            for m in self._current_manifest_names(meta):
                if not set(m["partitions"]) & touched:
                    kept.append(m)  # untouched manifest reused verbatim
                    continue
                old = self._rj(os.path.join(self.meta_dir, m["name"]))
                rest = [e for e in old if e["partition"] not in touched]
                if rest:
                    rname = f"manifest-{seq}-{token}-{k}.json"
                    k += 1
                    self._wj(os.path.join(self.meta_dir, rname), rest)
                    kept.append({"name": rname, **self._manifest_summary(rest)})
            summary = self._manifest_summary(entries)
            summary["replaced_partitions"] = sorted(touched)
            if extra_summary:
                summary.update(extra_summary)
            return kept + [{"name": name, **self._manifest_summary(entries)}], summary

        return self._commit("overwrite", build)

    def merge(self, spark: SparkSession, df: DataFrame, key_cols: list[str]) -> dict:
        """Copy-on-write MERGE (upsert by key): within the partitions
        ``df`` touches, rows whose key matches an incoming row are
        replaced and everything else is carried over; partitions ``df``
        does not touch are reused verbatim (their manifests never open).
        One overwrite snapshot — Iceberg's copy-on-write ``MERGE INTO``.

        The key must be partition-stable (a key never changes its
        partition value between writes): a matching old row living in an
        UNtouched partition is invisible to the rewrite and would
        survive as a duplicate.  The extraction sink's natural key
        ``url`` -> ``partition_id = pmod(xxhash64(url), P)`` has this
        property by construction.
        """
        meta = self.metadata()
        pcol = meta["partition_col"]
        if pcol is None:
            raise ValueError("merge needs a partitioned table")
        # bounded driver list: one row per TOUCHED PARTITION, never data
        touched = {r[0] for r in df.select(pcol).distinct().collect()}
        if not touched:
            return self.overwrite_partitions(df, extra_summary={"merge_keys": key_cols})
        old = self.scan(spark, partition_values=touched)
        carried = old.join(df.select(*key_cols).distinct(), key_cols, "left_anti")
        merged = carried.unionByName(df)
        return self.overwrite_partitions(
            merged, extra_summary={"merge_keys": list(key_cols)}
        )

    def _manifest_list_for(self, meta: dict, snap_id: int | None) -> list[dict]:
        if snap_id is None:
            return []
        entry = next(
            (s for s in meta["snapshots"] if s["snapshot_id"] == snap_id), None
        )
        if entry is None:
            raise ValueError(f"snapshot {snap_id} unknown or expired")
        return self._rj(os.path.join(self.meta_dir, entry["manifest_list"]))

    def _current_manifest_names(self, meta: dict) -> list[dict]:
        return self._manifest_list_for(meta, meta["current_snapshot_id"])

    # -- read path --------------------------------------------------------

    def _resolve_snapshot(
        self, meta: dict, snapshot_id: int | None, as_of_ms: int | None
    ) -> int | None:
        if snapshot_id is not None:
            if not any(s["snapshot_id"] == snapshot_id for s in meta["snapshots"]):
                raise ValueError(f"unknown snapshot_id {snapshot_id}")
            return snapshot_id
        if as_of_ms is not None:
            past = [s for s in meta["snapshots"] if s["timestamp_ms"] <= as_of_ms]
            if not past:
                return None
            return past[-1]["snapshot_id"]
        return meta["current_snapshot_id"]

    def plan_files(
        self,
        snapshot_id: int | None = None,
        as_of_ms: int | None = None,
        partition_values: set | None = None,
        stats_ranges: dict | None = None,
    ) -> list[dict]:
        """Scan planning: manifest-level pruning, then file-level skipping.

        ``partition_values``: keep only files of these partition values —
        whole manifests whose summary doesn't intersect are never opened.
        ``stats_ranges``: ``{col: (lo, hi)}`` — a file is kept only if
        its footer [min,max] OVERLAPS the wanted range (Iceberg's
        inclusive metrics evaluation; files without stats are kept).
        """
        meta = self.metadata()
        snap_id = self._resolve_snapshot(meta, snapshot_id, as_of_ms)
        if snap_id is None:
            return []
        want = (
            None
            if partition_values is None
            else {str(v) for v in partition_values}
        )
        files: list[dict] = []
        for m in self._manifest_list_for(meta, snap_id):
            if want is not None and m["partitions"] and not set(m["partitions"]) & want:
                continue  # manifest-level prune: file list never opened
            for e in self._rj(os.path.join(self.meta_dir, m["name"])):
                if want is not None and e["partition"] is not None and e["partition"] not in want:
                    continue
                if stats_ranges:
                    skip = False
                    for col, (lo, hi) in stats_ranges.items():
                        mn = e["min"].get(col)
                        mx = e["max"].get(col)
                        if mn is None or mx is None:
                            continue  # no stats -> cannot skip
                        if (hi is not None and mn > hi) or (lo is not None and mx < lo):
                            skip = True
                            break
                    if skip:
                        continue
                files.append(e)
        return files

    def scan(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        as_of_ms: int | None = None,
        partition_values: set | None = None,
        stats_ranges: dict | None = None,
    ) -> DataFrame:
        """Read a snapshot as a DataFrame (time travel via ``snapshot_id``
        / ``as_of_ms``).  The returned plan lists exactly the planned
        files — partition pruning and min/max skipping happened HERE, at
        the metadata layer, so Spark never even enumerates skipped files.
        """
        meta = self.metadata()
        files = self.plan_files(snapshot_id, as_of_ms, partition_values, stats_ranges)
        pcol = meta["partition_col"]
        schema = None
        if meta.get("schema") is not None:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(meta["schema"])
        if not files:
            if schema is not None:
                return spark.createDataFrame([], schema)
            return spark.range(0).drop("id")
        reader = spark.read
        if schema is not None:
            # table schema from METADATA (schema evolution): old files
            # missing later-added columns read back as NULLs. The
            # partition column is NOT part of the data files — it comes
            # from the hive-style paths — so the reader schema excludes
            # it and the stored column order is restored afterwards.
            from pyspark.sql.types import StructType

            data_schema = StructType([f for f in schema.fields if f.name != pcol])
            reader = reader.schema(data_schema)
        if pcol is not None:
            # basePath makes Spark reconstitute pcol from hive-style dirs
            reader = reader.option("basePath", self.data_dir)
        out = reader.parquet(
            *[os.path.join(self.table_dir, e["path"]) for e in files]
        )
        if schema is not None:
            out = out.select(*[f.name for f in schema.fields])
        return out

    # -- incremental / CDC read path --------------------------------------

    def _snapshot_range(
        self, meta: dict, from_snapshot_id: int | None, to_snapshot_id: int | None
    ) -> list[dict]:
        """Snapshot entries in ``(from, to]`` in commit order."""
        snaps = meta["snapshots"]
        if to_snapshot_id is None:
            to_snapshot_id = meta["current_snapshot_id"]
        ids = [s["snapshot_id"] for s in snaps]
        if to_snapshot_id not in ids:
            raise ValueError(f"unknown snapshot_id {to_snapshot_id}")
        if from_snapshot_id is not None and from_snapshot_id not in ids:
            raise ValueError(f"unknown snapshot_id {from_snapshot_id}")
        out = []
        for s in snaps:
            if from_snapshot_id is not None and s["snapshot_id"] <= from_snapshot_id:
                continue
            if s["snapshot_id"] > to_snapshot_id:
                break
            out.append(s)
        return out

    def _file_diff(self, meta: dict, snap: dict) -> tuple[list[dict], list[dict]]:
        """(added, removed) data-file entries of one snapshot vs its parent.

        Manifests are immutable and reused verbatim across commits, so the
        diff is a set difference on file paths — untouched manifests cost
        one name comparison, never a file-list read."""
        cur_manifests = self._manifest_list_for(meta, snap["snapshot_id"])
        par_manifests = self._manifest_list_for(meta, snap["parent_id"])
        cur_names = {m["name"] for m in cur_manifests}
        par_names = {m["name"] for m in par_manifests}

        def entries(manifests, skip_names):
            out = {}
            for m in manifests:
                if m["name"] in skip_names:
                    continue
                for e in self._rj(os.path.join(self.meta_dir, m["name"])):
                    out[e["path"]] = e
            return out

        cur = entries(cur_manifests, par_names)
        par = entries(par_manifests, cur_names)
        added = [cur[p] for p in sorted(set(cur) - set(par))]
        removed = [par[p] for p in sorted(set(par) - set(cur))]
        return added, removed

    def incremental_scan(
        self,
        spark: SparkSession,
        from_snapshot_id: int | None,
        to_snapshot_id: int | None = None,
    ) -> DataFrame:
        """Rows APPENDED in ``(from, to]`` — Iceberg's incremental append
        scan.  Reads only the data files added by each snapshot in the
        range (an append's new manifest), so a consumer polling a growing
        table does work proportional to the NEW data, not the table size.
        Raises on overwrite/expire snapshots in the range (their file
        diff is not append-only); use :meth:`changelog_scan` for those.
        """
        meta = self.metadata()
        snaps = self._snapshot_range(meta, from_snapshot_id, to_snapshot_id)
        bad = [s for s in snaps if s["operation"] != "append"]
        if bad:
            raise ValueError(
                "incremental_scan crosses non-append snapshots "
                f"{[s['snapshot_id'] for s in bad]}; use changelog_scan"
            )
        files = []
        for s in snaps:
            added, _ = self._file_diff(meta, s)
            files.extend((s["snapshot_id"], e) for e in added)
        return self._read_tagged(spark, meta, files, with_change_type=False)

    def changelog_scan(
        self,
        spark: SparkSession,
        from_snapshot_id: int | None,
        to_snapshot_id: int | None = None,
    ) -> DataFrame:
        """CDC over ``(from, to]``: every row added by a snapshot comes
        back with ``_change_type='insert'``, every row whose file was
        dropped with ``'delete'`` — copy-on-write granularity, exactly
        Iceberg's ``create_changelog_view`` for COW tables (a carried-over
        row in a rewritten file appears as delete+insert).  Each row is
        tagged with ``_commit_snapshot_id``."""
        meta = self.metadata()
        snaps = self._snapshot_range(meta, from_snapshot_id, to_snapshot_id)
        files = []
        for s in snaps:
            if s["operation"] == "expire":
                # metadata-only commit: the table's logical contents are
                # unchanged (current manifests carried over) and its
                # parent has been trimmed from the log — no row images
                continue
            added, removed = self._file_diff(meta, s)
            files.extend((s["snapshot_id"], "insert", e) for e in added)
            files.extend((s["snapshot_id"], "delete", e) for e in removed)
        return self._read_tagged(spark, meta, files, with_change_type=True)

    def _read_tagged(
        self, spark: SparkSession, meta: dict, files, with_change_type: bool
    ) -> DataFrame:
        """Union per-(snapshot[, change]) file groups, each tagged with
        literal metadata columns.  One read per group — groups are file
        LISTS, so Spark still parallelizes within each."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        pcol = meta["partition_col"]
        schema = (
            StructType.fromJson(meta["schema"]) if meta.get("schema") else None
        )

        def empty():
            fields = list(schema.fields) if schema else []
            fields.append(StructField("_commit_snapshot_id", LongType()))
            if with_change_type:
                fields.append(StructField("_change_type", StringType()))
            return spark.createDataFrame([], StructType(fields))

        if not files:
            return empty()
        groups: dict[tuple, list[dict]] = {}
        for rec in files:
            key, e = rec[:-1], rec[-1]
            groups.setdefault(key, []).append(e)
        parts = []
        for key in sorted(groups):
            reader = spark.read
            if schema is not None:
                data_schema = StructType(
                    [f for f in schema.fields if f.name != pcol]
                )
                reader = reader.schema(data_schema)
            if pcol is not None:
                reader = reader.option("basePath", self.data_dir)
            df = reader.parquet(
                *[os.path.join(self.table_dir, e["path"]) for e in groups[key]]
            )
            if schema is not None:
                df = df.select(*[f.name for f in schema.fields])
            df = df.withColumn(
                "_commit_snapshot_id", F.lit(int(key[0])).cast("long")
            )
            if with_change_type:
                df = df.withColumn("_change_type", F.lit(key[1]))
            parts.append(df)
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df)
        return out

    # -- maintenance ------------------------------------------------------

    def compact(
        self,
        spark: SparkSession,
        min_files: int = 2,
        sort_by: list[str] | None = None,
        files_per_partition: int = 1,
    ) -> dict | None:
        """Rewrite partitions fragmented into ``>= min_files`` data files
        as one file each (Iceberg's ``rewrite_data_files``), committed as
        an ordinary overwrite snapshot — readers of prior snapshots keep
        the old files, time travel still sees every state, and a crash
        mid-compaction leaves the table untouched.  Returns the snapshot,
        or None when nothing is fragmented.

        ``sort_by``: Iceberg's sort-order rewrite — rewritten rows are
        clustered on these columns (default: ``stat_cols`` — stats you
        collect are stats you want skippable). With
        ``files_per_partition=1`` this tightens parquet ROW-GROUP stats
        (reader-side skipping); set ``files_per_partition > 1`` to
        range-split each partition into that many sorted files, giving
        every FILE a tight min/max slice in the manifest, so
        ``plan_files(stats_ranges=...)`` / reader ``pushFilters`` prune
        compacted data they could not prune while appends interleaved
        the key space.
        """
        from collections import Counter

        meta = self.metadata()
        pcol = meta["partition_col"]
        if pcol is None:
            raise ValueError("compact needs a partitioned table")
        counts = Counter(e["partition"] for e in self.plan_files())
        targets = {p for p, c in counts.items() if p is not None and c >= min_files}
        if not targets:
            return None
        # one exchange keyed on pcol: every partition VALUE lands whole in
        # one task, so partitionBy writes exactly one file per partition
        scanned = self.scan(spark, partition_values=targets)
        order = sort_by if sort_by is not None else (meta["stat_cols"] or None)
        if order and files_per_partition > 1:
            # range-clustered rewrite: tasks hold contiguous (pcol, keys)
            # slices, so partitionBy splits each partition value into
            # sorted files with disjoint key ranges
            from pyspark.sql import functions as _F

            df = scanned.repartitionByRange(
                max(len(targets), 1) * files_per_partition,
                _F.col(pcol),
                *[_F.col(c) for c in order],
            ).sortWithinPartitions(pcol, *order)
        else:
            df = scanned.repartition(max(len(targets), 1), pcol)
            if order:
                df = df.sortWithinPartitions(*order)
        return self.overwrite_partitions(df, extra_summary={"compaction": True})

    def remove_orphan_files(self) -> int:
        """Delete data files referenced by NO snapshot in the CURRENT
        committed metadata (Iceberg's ``remove_orphan_files``).

        Idempotent: it only ever deletes files the committed head cannot
        reach, so re-running after a crash (e.g. between an expire commit
        and its cleanup) is always safe.  Like Iceberg's version, it must
        not run concurrently with in-flight writers: a writer that has
        staged data but not yet committed looks exactly like an orphan.
        """
        meta = self.metadata()
        live: set[str] = set()
        for s in meta["snapshots"]:
            for m in self._manifest_list_for(meta, s["snapshot_id"]):
                for e in self._rj(os.path.join(self.meta_dir, m["name"])):
                    live.add(e["path"])
        # containment is checked on FS-qualified forms: _HadoopIO.list_files
        # yields fully-qualified URIs while table_dir may be a shorthand
        # spelling (hdfs:/x relying on fs.defaultFS) — a raw relpath on
        # mismatched forms would see every live file as an orphan and
        # delete the whole table. A listed path outside the qualified
        # table dir aborts cleanup instead of guessing.
        base = self.io.qualify(self.table_dir).rstrip("/")
        removed = 0
        for p in list(self.io.list_files(self.data_dir)):
            q = self.io.qualify(p)
            if not q.startswith(base + "/"):
                raise RuntimeError(
                    f"remove_orphan_files: listed path {p!r} is not under "
                    f"table dir {base!r}; refusing cleanup"
                )
            if q[len(base) + 1 :] not in live:
                self.io.delete(p)
                removed += 1
        return removed

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Drop history older than the newest ``keep_last`` snapshots,
        then delete data files no surviving snapshot references.

        Two strictly ordered phases (Iceberg's ``expireSnapshots`` then
        ``remove_orphan_files``), preserving the table-format invariant
        that COMMITTED metadata only ever references existing files:

        1. CAS-commit the trimmed snapshot log — metadata only, no file
           touched.  A crash before this point changes nothing; a lost
           race retries against the new head like any commit.
        2. After (and only after) the commit is published, delete files
           unreachable from the committed head via
           :meth:`remove_orphan_files`.  A crash between the phases
           leaves EXTRA files, never missing ones — every committed
           snapshot still reads — and the cleanup is re-runnable.

        The returned snapshot dict is enriched with the (post-commit)
        ``orphan_files_removed`` count; the committed summary records
        only ``expired`` because the removal count is not known at
        commit time.
        """

        def build(meta: dict, seq: int, token: str):
            # expiry is itself a commit: rewrite the snapshot log but keep
            # the current snapshot's manifests untouched
            keep = meta["snapshots"][-keep_last:] if keep_last > 0 else []
            manifest_names = self._current_manifest_names(meta)
            summary = {"expired": len(meta["snapshots"]) - len(keep)}
            # splice the trimmed history in via the commit loop's meta copy
            meta["snapshots"] = keep[:-1] if keep else []
            return manifest_names, summary

        snap = self._commit("expire", build)
        removed = self.remove_orphan_files()
        out = dict(snap)
        out["summary"] = dict(snap["summary"], orphan_files_removed=removed)
        return out
