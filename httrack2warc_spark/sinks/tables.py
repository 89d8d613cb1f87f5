"""Engine-owned table catalog.

The production design is Iceberg (snapshot-per-round commits give the
north_rule's checkpoint/resume + time travel; ``write.target-file-size-bytes``
replaces the reference's 1 GiB WARC rotation, ``RotatingFile.java:42-54``).
This sandbox ships no Iceberg runtime jar, so the catalog degrades to
versioned parquet directories with the same commit semantics:

- ``write(name, df)``        — atomic overwrite via write-new-version-then-
                               publish-manifest (crash-safe: readers only see
                               versions named in the manifest)
- ``append(name, df)``       — append a new file-set under the current version
- ``read(name)``             — latest committed version
- ``snapshot(tag)``          — record the current version of every table under
                               a tag (the per-round checkpoint)
- ``load_snapshot(tag)``     — pin reads to a tag (resume path)

Every commit also writes per-partition lineage metrics when the caller passes
them (north_rule: "per-partition lineage and fetch/dedup metrics written
alongside each Iceberg snapshot").
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class TableCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._pinned: dict[str, int] | None = None

    # -- manifest helpers ---------------------------------------------------
    def _manifest_path(self, name: str) -> Path:
        return self.root / name / "_manifest.json"

    def _current_version(self, name: str) -> int | None:
        mp = self._manifest_path(name)
        if not mp.exists():
            return None
        return json.loads(mp.read_text())["version"]

    def _publish(self, name: str, version: int) -> None:
        mp = self._manifest_path(name)
        tmp = mp.with_suffix(".tmp")
        tmp.write_text(json.dumps({"version": version, "ts": time.time()}))
        os.replace(tmp, mp)  # atomic publish

    # -- public API ----------------------------------------------------------
    def write(self, name: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        version = (self._current_version(name) or 0) + 1
        path = self.root / name / f"v{version}"
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(str(path))
        self._publish(name, version)

    def append(self, name: str, df: DataFrame) -> None:
        version = self._current_version(name)
        if version is None:
            self.write(name, df)
            return
        path = self.root / name / f"v{version}"
        df.write.mode("append").parquet(str(path))

    def exists(self, name: str) -> bool:
        return self._current_version(name) is not None

    def read(self, name: str) -> DataFrame:
        version = (
            self._pinned.get(name) if self._pinned is not None else None
        ) or self._current_version(name)
        if version is None:
            raise FileNotFoundError(f"table {name} has no committed version")
        return self.spark.read.parquet(str(self.root / name / f"v{version}"))

    def snapshot(self, tag: str, extra: dict | None = None) -> None:
        versions = {
            p.name: self._current_version(p.name)
            for p in self.root.iterdir()
            if p.is_dir() and self._manifest_path(p.name).exists()
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
                self._publish(name, version)
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
