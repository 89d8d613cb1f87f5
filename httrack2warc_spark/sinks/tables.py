"""Engine-owned table catalog.

The production design is Iceberg (snapshot-per-round commits give the
north_rule's checkpoint/resume + time travel; ``write.target-file-size-bytes``
replaces the reference's 1 GiB WARC rotation, ``RotatingFile.java:42-54``).
This sandbox ships no Iceberg runtime jar, so the catalog implements the same
commit model over parquet directly — **manifest-of-file-sets versioning**,
which is exactly Iceberg's snapshot/manifest mechanism in miniature:

- every commit writes a fresh parquet file-set directory, never mutating an
  existing one;
- a table version is a JSON manifest listing the file-set directories that
  make up the table (append = previous list + one new set ⇒ O(delta) commits,
  no rewrite of accumulated state);
- the table's current version is published by an atomic rename; readers only
  ever see committed manifests;
- ``snapshot(tag)`` records every table's current version (the per-round
  checkpoint); ``rollback_to_snapshot`` republishes those versions (crash
  resume) — appended-but-unsnapshotted file-sets are simply unreferenced.
"""

from __future__ import annotations

import abc
import json
import os
import re
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class CrawlCatalog(abc.ABC):
    """The catalog verbs the engine is written against — everything the
    scheduler, converter, streaming ingestion and retention code call. Two
    implementations: ``TableCatalog`` (manifest-of-filesets over parquet, the
    in-sandbox default) and ``IcebergCatalog`` (the production mapping onto a
    real Iceberg runtime). Swapping one for the other is a constructor
    change; every verb maps 1:1."""

    @abc.abstractmethod
    def write(self, name: str, df: DataFrame, partition_by=None, bucket_by=None): ...

    @abc.abstractmethod
    def append(self, name: str, df: DataFrame, bucket_by=None): ...

    @abc.abstractmethod
    def read(self, name: str) -> DataFrame: ...

    @abc.abstractmethod
    def read_filesets(self, name: str) -> list[DataFrame]: ...

    @abc.abstractmethod
    def row_count(self, name: str) -> int: ...

    @abc.abstractmethod
    def fileset_row_count(self, entry) -> int:
        """Rows in the fileset/commit identified by ``entry`` — the value
        ``append()``/``write()`` returned. Must be metadata-only (no Spark
        job): the scheduler's job-free next-frontier count depends on it."""
        ...

    @abc.abstractmethod
    def exists(self, name: str) -> bool: ...

    @abc.abstractmethod
    def compact_small(self, name: str, bucket_by=None, max_filesets: int = 6) -> bool: ...

    @abc.abstractmethod
    def snapshot(self, tag: str, extra: dict | None = None) -> None: ...

    @abc.abstractmethod
    def rollback_to_snapshot(self, tag: str) -> dict: ...

    @abc.abstractmethod
    def load_snapshot(self, tag: str) -> dict: ...

    @abc.abstractmethod
    def list_snapshots(self) -> list[str]: ...

    @abc.abstractmethod
    def expire_snapshots(self, keep_last: int) -> list[str]: ...

    @abc.abstractmethod
    def vacuum(self, name: str | None = None) -> dict[str, dict]: ...


class TableCatalog(CrawlCatalog):
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._pinned: dict[str, int] | None = None

    # -- manifest helpers ---------------------------------------------------
    def _table_dir(self, name: str) -> Path:
        return self.root / name

    def _manifest_path(self, name: str, version: int) -> Path:
        return self._table_dir(name) / f"_v{version}.json"

    def _current_ptr(self, name: str) -> Path:
        return self._table_dir(name) / "_current.json"

    def _current_version(self, name: str) -> int | None:
        ptr = self._current_ptr(name)
        if not ptr.exists():
            return None
        return json.loads(ptr.read_text())["version"]

    def _manifest(self, name: str, version: int) -> dict:
        return json.loads(self._manifest_path(name, version).read_text())

    def _commit(self, name: str, files: list[str]) -> None:
        version = (self._current_version(name) or 0) + 1
        self._manifest_path(name, version).write_text(
            json.dumps({"version": version, "files": files, "ts": time.time()})
        )
        tmp = self._current_ptr(name).with_suffix(".tmp")
        tmp.write_text(json.dumps({"version": version}))
        os.replace(tmp, self._current_ptr(name))  # atomic publish

    def _write_fileset(self, name: str, df: DataFrame,
                       partition_by: list[str] | None = None,
                       bucket_by: tuple[str, int] | None = None) -> str | dict:
        path = self._table_dir(name) / "data" / uuid.uuid4().hex[:12]
        # thread-local: labels this commit's jobs in the UI/event log
        self.spark.sparkContext.setJobDescription(f"catalog:{name}")
        try:
            return self._write_fileset_inner(name, df, partition_by, bucket_by, path)
        finally:
            self.spark.sparkContext.setJobDescription(None)

    def _write_fileset_inner(self, name, df, partition_by, bucket_by, path):
        if bucket_by is not None:
            # Spark-native bucketed external table: the scan reports
            # HashPartitioning(col, n) so joins/cogroups keyed on ``col``
            # read this fileset WITHOUT an exchange (and without a sort —
            # one file per bucket via the explicit repartition). This is the
            # parquet stand-in for Iceberg bucket partitioning +
            # storage-partitioned joins at 10^10-row url_seen scale.
            col, n = bucket_by
            tbl = f"h2w_{re.sub('[^a-z0-9]', '_', name.lower())}_{uuid.uuid4().hex[:12]}"
            (
                df.repartition(n, col)
                .write.mode("overwrite")
                .bucketBy(n, col)
                .sortBy(col)
                .option("path", str(path))
                .saveAsTable(tbl)
            )
            return {"path": str(path), "table": tbl, "bucket_col": col, "buckets": n}
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(str(path))
        return str(path)

    def _ensure_bucket_table(self, entry: dict) -> DataFrame:
        """Re-register a bucketed fileset table if this session doesn't know it
        (session catalogs are in-memory; resume happens in a fresh session)."""
        tbl = entry["table"]
        if not self.spark.catalog.tableExists(tbl):
            schema = self.spark.read.parquet(entry["path"]).schema
            ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema)
            self.spark.sql(
                f"CREATE TABLE {tbl} ({ddl}) USING PARQUET "
                f"CLUSTERED BY (`{entry['bucket_col']}`) "
                f"SORTED BY (`{entry['bucket_col']}`) "
                f"INTO {entry['buckets']} BUCKETS "
                f"LOCATION '{entry['path']}'"
            )
        return self.spark.table(tbl)

    def _fileset_df(self, entry: str | dict) -> DataFrame:
        if isinstance(entry, dict):
            return self._ensure_bucket_table(entry)
        return self.spark.read.parquet(entry)

    # -- public API ----------------------------------------------------------
    def write(self, name: str, df: DataFrame,
              partition_by: list[str] | None = None,
              bucket_by: tuple[str, int] | None = None) -> str | dict:
        self._table_dir(name).mkdir(parents=True, exist_ok=True)
        entry = self._write_fileset(name, df, partition_by, bucket_by)
        self._commit(name, [entry])
        return entry

    def append(self, name: str, df: DataFrame,
               bucket_by: tuple[str, int] | None = None) -> str | dict:
        version = self._current_version(name)
        if version is None:
            return self.write(name, df, bucket_by=bucket_by)
        prior = self._manifest(name, version)["files"]
        entry = self._write_fileset(name, df, bucket_by=bucket_by)
        self._commit(name, prior + [entry])
        return entry

    @staticmethod
    def fileset_row_count(entry: str | dict) -> int:
        """Row count straight from the parquet footers — driver-side metadata,
        NO Spark job. The per-round `count()` actions this replaces were a
        measurable share of the fixed ~1 s/job local-mode round latency."""
        import pyarrow.parquet as pq

        path = entry["path"] if isinstance(entry, dict) else entry
        total = 0
        for root, _dirs, files in os.walk(path):
            for fn in files:
                if fn.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
        return total

    def row_count(self, name: str) -> int:
        """Table row count from footers (no Spark job). Exact for append-only
        tables (every committed row is live)."""
        return sum(self.fileset_row_count(e) for e in self._files(name))

    def exists(self, name: str) -> bool:
        return self._current_version(name) is not None

    def _files(self, name: str) -> list:
        version = (
            self._pinned.get(name) if self._pinned is not None else None
        ) or self._current_version(name)
        if version is None:
            raise FileNotFoundError(f"table {name} has no committed version")
        return self._manifest(name, version)["files"]

    def read(self, name: str) -> DataFrame:
        files = self._files(name)
        if not any(isinstance(f, dict) for f in files):
            return self.spark.read.parquet(*files)
        dfs = [self._fileset_df(f) for f in files]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def read_filesets(self, name: str) -> list[DataFrame]:
        """One DataFrame per committed fileset. For bucketed tables each keeps
        its HashPartitioning metadata (a union would discard it) — callers
        that join per-fileset get the exchange-free bucketed scans."""
        return [self._fileset_df(f) for f in self._files(name)]

    def compact_small(self, name: str, bucket_by: tuple[str, int] | None = None,
                      max_filesets: int = 6) -> bool:
        """Size-tiered compaction: when the manifest holds more than
        ``max_filesets`` filesets, rewrite all but the largest one into a
        single new fileset (union read → one write) and commit the two-entry
        manifest. The big base fileset is NEVER rewritten — per-round appends
        merge at O(sum-of-small-tails), not O(total), which is what keeps a
        10^10-row append-only table compactable at all. (Iceberg's rewrite-
        data-files action, in miniature.) Returns True if it compacted."""
        files = self._files(name)
        if len(files) <= max_filesets:
            return False
        sized = sorted(files, key=self.fileset_row_count)
        base, small = sized[-1], sized[:-1]
        dfs = [self._fileset_df(f) for f in small]
        merged = dfs[0]
        for d in dfs[1:]:
            merged = merged.unionByName(d)
        entry = self._write_fileset(name, merged, bucket_by=bucket_by)
        # preserve manifest order semantics: base first, then the merged tail
        self._commit(name, [base, entry])
        return True

    def expire_snapshots(self, keep_last: int) -> list[str]:
        """Delete all but the ``keep_last`` newest snapshots (by snapshot
        timestamp). Iceberg's expire_snapshots in miniature: a snapshot that
        nobody can roll back to no longer pins its table versions, so a later
        ``vacuum`` can reclaim their filesets. Returns the expired tags."""
        snapdir = self.root / "_snapshots"
        if not snapdir.exists():
            return []
        tagged = sorted(
            snapdir.glob("*.json"),
            key=lambda p: json.loads(p.read_text()).get("ts", 0.0),
        )
        expired = []
        for p in tagged[:-keep_last] if keep_last > 0 else tagged:
            expired.append(p.stem)
            p.unlink()
        return expired

    def vacuum(self, name: str | None = None) -> dict[str, dict]:
        """Reclaim storage + session-catalog entries no committed reader can
        reach (Iceberg's remove-orphan-files, in miniature): for each table,
        the live versions are the current one, any snapshot-referenced one and
        any pinned one; manifests of dead versions are deleted, fileset
        directories referenced by no live manifest are removed, and stale
        ``h2w_*`` bucketed-table registrations are dropped from the session
        catalog. Never touches live data — safe after every compaction."""
        import shutil
        from collections import defaultdict

        names = (
            [name]
            if name is not None
            else [
                p.name
                for p in self.root.iterdir()
                if p.is_dir() and p.name != "_snapshots"
                and self._current_ptr(p.name).exists()
            ]
        )
        snap_versions: dict[str, set[int]] = defaultdict(set)
        for tag in self.list_snapshots():
            payload = json.loads(
                (self.root / "_snapshots" / f"{tag}.json").read_text()
            )
            for t, v in payload.get("tables", {}).items():
                if v is not None:
                    snap_versions[t].add(v)

        def _live(nm: str):
            """(versions, fileset paths, h2w registrations) a committed
            reader of ``nm`` can still reach."""
            cur = self._current_version(nm)
            if cur is None:
                return None
            versions = {cur} | snap_versions.get(nm, set())
            if self._pinned and self._pinned.get(nm):
                versions.add(self._pinned[nm])
            paths: set[str] = set()
            tables: set[str] = set()
            for v in versions:
                mp = self._manifest_path(nm, v)
                if not mp.exists():
                    continue
                for e in json.loads(mp.read_text())["files"]:
                    paths.add(e["path"] if isinstance(e, dict) else e)
                    if isinstance(e, dict):
                        tables.add(e["table"])
            return versions, paths, tables

        # Registration names are sanitized (h2w_<name>_...), so one table's
        # prefix can be a prefix of another's (e.g. "foo" vs "foo_bar").
        # Protect against cross-table drops by sparing every registration any
        # LIVE table references — across the whole catalog, not just `names`.
        all_names = [
            p.name for p in self.root.iterdir()
            if p.is_dir() and p.name != "_snapshots"
            and self._current_ptr(p.name).exists()
        ]
        global_live_tables: set[str] = set()
        live_by_name: dict[str, tuple] = {}
        for nm in set(all_names) | set(names):
            info = _live(nm)
            if info is not None:
                live_by_name[nm] = info
                global_live_tables |= info[2]

        stats: dict[str, dict] = {}
        for nm in names:
            if nm not in live_by_name:
                continue
            live_versions, live_paths, _ = live_by_name[nm]
            n_manifests = n_filesets = n_tables = 0
            for mp in self._table_dir(nm).glob("_v*.json"):
                if int(mp.stem[2:]) not in live_versions:
                    mp.unlink()
                    n_manifests += 1
            data_dir = self._table_dir(nm) / "data"
            if data_dir.exists():
                for d in data_dir.iterdir():
                    if str(d) not in live_paths:
                        shutil.rmtree(d, ignore_errors=True)
                        n_filesets += 1
            prefix = f"h2w_{re.sub('[^a-z0-9]', '_', nm.lower())}_"
            for t in self.spark.catalog.listTables():
                if t.name.startswith(prefix) and t.name not in global_live_tables:
                    self.spark.sql(f"DROP TABLE IF EXISTS {t.name}")
                    n_tables += 1
            stats[nm] = {
                "manifests": n_manifests,
                "filesets": n_filesets,
                "tables": n_tables,
            }
        return stats

    def snapshot(self, tag: str, extra: dict | None = None) -> None:
        versions = {
            p.name: self._current_version(p.name)
            for p in self.root.iterdir()
            if p.is_dir() and self._current_ptr(p.name).exists()
        }
        snapdir = self.root / "_snapshots"
        snapdir.mkdir(exist_ok=True)
        payload = {"tables": versions, "ts": time.time(), **(extra or {})}
        tmp = snapdir / f"{tag}.tmp"
        tmp.write_text(json.dumps(payload))
        os.replace(tmp, snapdir / f"{tag}.json")

    def rollback_to_snapshot(self, tag: str) -> dict:
        """Republish every table at its snapshot version (resume after a crash
        that may have committed newer, un-snapshotted versions)."""
        payload = json.loads((self.root / "_snapshots" / f"{tag}.json").read_text())
        for name, version in payload["tables"].items():
            if version is not None:
                tmp = self._current_ptr(name).with_suffix(".tmp")
                tmp.write_text(json.dumps({"version": version}))
                os.replace(tmp, self._current_ptr(name))
        self._pinned = None
        return payload

    def load_snapshot(self, tag: str) -> dict:
        payload = json.loads((self.root / "_snapshots" / f"{tag}.json").read_text())
        self._pinned = payload["tables"]
        return payload

    def list_snapshots(self) -> list[str]:
        snapdir = self.root / "_snapshots"
        if not snapdir.exists():
            return []
        return sorted(p.stem for p in snapdir.glob("*.json"))


class IcebergCatalog(CrawlCatalog):
    """The same verbs over a REAL Iceberg runtime (requires the
    iceberg-spark-runtime jar + a configured Spark catalog — absent in this
    sandbox, so constructing one here raises; every mapping below is the
    public Iceberg Spark SQL surface, 1:1 with what TableCatalog mimics):

    | engine verb        | Iceberg                                           |
    |--------------------|---------------------------------------------------|
    | write              | ``df.writeTo(t).createOrReplace()``               |
    | append             | ``df.writeTo(t).append()`` (O(delta) snapshot)    |
    | bucket_by          | ``partitionedBy(bucket(n, col))`` → storage-      |
    |                    | partitioned joins replace our bucketed filesets   |
    | snapshot(tag)      | ``ALTER TABLE t CREATE OR REPLACE TAG tag``       |
    | rollback           | ``CALL c.system.set_current_snapshot(ref=tag)``   |
    | expire_snapshots   | ``CALL c.system.expire_snapshots(retain_last=k)`` |
    | vacuum             | ``CALL c.system.remove_orphan_files(table=t)``    |
    | compact_small      | ``CALL c.system.rewrite_data_files(table=t)``     |
    | row_count          | newest row of ``t.snapshots`` summary (metadata-  |
    |                    | only, like our parquet-footer walk)               |

    Snapshot ``extra`` payloads (round/next_seq bookkeeping) don't belong in
    Iceberg table metadata, so they land in a tiny JSON sidecar per tag under
    ``root`` — same as TableCatalog's ``_snapshots`` dir.
    """

    def __init__(self, spark: SparkSession, root: str,
                 catalog: str = "h2w", namespace: str = "crawl"):
        if not iceberg_available(spark):
            raise RuntimeError(
                "IcebergCatalog needs the iceberg-spark-runtime jar on the "
                "session classpath and a configured Spark catalog; use "
                "TableCatalog (parquet manifest engine) otherwise"
            )
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.catalog = catalog
        self.namespace = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")

    def _t(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def _tables(self) -> list[str]:
        return [
            r.tableName
            for r in self.spark.sql(
                f"SHOW TABLES IN {self.catalog}.{self.namespace}"
            ).collect()
        ]

    def _current_snapshot_id(self, name) -> int | None:
        """Snapshot id of the main branch right after one of OUR commits —
        read from the ``refs`` metadata table (exact: the snapshot the commit
        made current), not a committed_at sort (which a same-timestamp tie or
        a racing later commit could mis-rank)."""
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self._t(name)}.refs "
            f"WHERE name = 'main'"
        ).collect()
        return int(row[0].snapshot_id) if row else None

    def write(self, name, df, partition_by=None, bucket_by=None):
        w = df.writeTo(self._t(name))
        if bucket_by is not None:
            from pyspark.sql import functions as F

            col, n = bucket_by
            w = w.partitionedBy(F.bucket(n, F.col(col)))
        elif partition_by:
            w = w.partitionedBy(*partition_by)
        w.createOrReplace()
        return (self._t(name), self._current_snapshot_id(name))

    def append(self, name, df, bucket_by=None):
        if not self.exists(name):
            return self.write(name, df, bucket_by=bucket_by)
        df.writeTo(self._t(name)).append()
        return (self._t(name), self._current_snapshot_id(name))

    def read(self, name):
        return self.spark.table(self._t(name))

    def read_filesets(self, name):
        # one table: Iceberg's bucket partition metadata gives the scheduler
        # the same exchange-free storage-partitioned joins our per-fileset
        # bucketed scans emulate
        return [self.read(name)]

    def row_count(self, name) -> int:
        row = self.spark.sql(
            f"SELECT summary['total-records'] AS n FROM {self._t(name)}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(row[0].n) if row and row[0].n is not None else 0

    def fileset_row_count(self, entry) -> int:
        """Rows added by the commit ``append()``/``write()`` returned —
        Iceberg records ``added-records`` in every snapshot summary, so this
        is metadata-only, the exact twin of TableCatalog's parquet-footer
        arithmetic the scheduler's job-free frontier count relies on. The
        write verbs return ``(table, snapshot_id)``, pinning the commit they
        made: the count is THAT snapshot's, immune to later commits to the
        same table (compaction, a second append). A bare table-name entry
        (legacy) falls back to the current main-branch snapshot."""
        if isinstance(entry, (tuple, list)):
            table, snap = entry
            if snap is None:
                return 0
            row = self.spark.sql(
                f"SELECT summary['added-records'] AS n FROM {table}.snapshots "
                f"WHERE snapshot_id = {int(snap)}"
            ).collect()
        else:
            row = self.spark.sql(
                f"SELECT s.summary['added-records'] AS n "
                f"FROM {entry}.snapshots s "
                f"JOIN {entry}.refs r ON s.snapshot_id = r.snapshot_id "
                f"WHERE r.name = 'main'"
            ).collect()
        return int(row[0].n) if row and row[0].n is not None else 0

    def exists(self, name) -> bool:
        return name in self._tables()

    def compact_small(self, name, bucket_by=None, max_filesets: int = 6) -> bool:
        self.spark.sql(
            f"CALL {self.catalog}.system.rewrite_data_files"
            f"(table => '{self.namespace}.{name}')"
        )
        return True

    def snapshot(self, tag, extra=None) -> None:
        safe = re.sub("[^A-Za-z0-9_-]", "_", tag)
        for name in self._tables():
            self.spark.sql(
                f"ALTER TABLE {self._t(name)} CREATE OR REPLACE TAG `{safe}`"
            )
        snapdir = self.root / "_snapshots"
        snapdir.mkdir(exist_ok=True)
        payload = {"tables": self._tables(), "ts": time.time(), **(extra or {})}
        tmp = snapdir / f"{tag}.tmp"
        tmp.write_text(json.dumps(payload))
        os.replace(tmp, snapdir / f"{tag}.json")

    def rollback_to_snapshot(self, tag) -> dict:
        payload = json.loads((self.root / "_snapshots" / f"{tag}.json").read_text())
        safe = re.sub("[^A-Za-z0-9_-]", "_", tag)
        for name in payload["tables"]:
            self.spark.sql(
                f"CALL {self.catalog}.system.set_current_snapshot"
                f"(table => '{self.namespace}.{name}', ref => '{safe}')"
            )
        return payload

    def load_snapshot(self, tag) -> dict:
        # time-travel reads would use FOR VERSION AS OF; the engine only needs
        # the bookkeeping payload here
        return json.loads((self.root / "_snapshots" / f"{tag}.json").read_text())

    def list_snapshots(self) -> list[str]:
        snapdir = self.root / "_snapshots"
        if not snapdir.exists():
            return []
        return sorted(p.stem for p in snapdir.glob("*.json"))

    def expire_snapshots(self, keep_last: int) -> list[str]:
        dropped = self.list_snapshots()[:-keep_last] if keep_last else []
        for name in self._tables():
            self.spark.sql(
                f"CALL {self.catalog}.system.expire_snapshots"
                f"(table => '{self.namespace}.{name}', retain_last => {int(keep_last)})"
            )
        for tag in dropped:
            (self.root / "_snapshots" / f"{tag}.json").unlink(missing_ok=True)
        return dropped

    def vacuum(self, name=None) -> dict[str, dict]:
        stats: dict[str, dict] = {}
        for nm in [name] if name else self._tables():
            self.spark.sql(
                f"CALL {self.catalog}.system.remove_orphan_files"
                f"(table => '{self.namespace}.{nm}')"
            )
            stats[nm] = {"orphan_files": "removed"}
        return stats
