"""SparkSession factory.

Design notes (scale): AQE on (runtime re-plan + skew-join splitting), Arrow on
(every custom kernel is a pandas UDF), small Arrow batches (image rows are
MB-sized, see BASELINE.json input_hint), shuffle partitions sized for local
testing but overridable via env for cluster runs. Iceberg catalog is attached
only when the runtime jar is actually present (this sandbox has none), with a
parquet-directory fallback implemented in ``sinks.tables``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Default sized for the URL/string hot path (small batches starve the Arrow
# pipeline with per-batch overhead). Jobs moving MB-sized binary rows
# (full-resolution image payloads) should override via extra_conf —
# BASELINE.json's "Arrow batch size tuned for image payloads" note; the
# sandbox's synthetic images are KBs, so the default holds there too.
ARROW_MAX_RECORDS_PER_BATCH = "10000"


def get_spark(
    app_name: str = "httrack2warc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all cores)
    so bench.py can run the identical job at two parallelism levels.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE's default 64MB advisory size coalesces post-shuffle stages that
        # feed Python (Arrow) kernels to a handful of fat partitions — a hard
        # parallelism cap (measured: the 8M-row probe stage coalesced to 10
        # tasks, capping N→4N scaling efficiency at 0.77; 8MB restores 0.92,
        # see BENCH/BASELINE.md). Python-UDF stages want fine-grained tasks.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # Scan-split floor: the bench inputs are single files with ~20 MB row
        # groups, and the 128 MB default packs a whole 6-row-group/126 MB
        # file into ONE scan task while 31 cores idle. 16 MB splits let every
        # row group get its own task (row groups are the split atoms, so this
        # cannot over-split tiny files). Cluster runs with large sequential
        # scans should raise it back via SPARK_GRAFT_MAX_PARTITION_BYTES
        # (guide §6 recommends 512m-1g there — the right value tracks row
        # group size, which on a production table this engine writes is
        # 128 MB+).
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", ARROW_MAX_RECORDS_PER_BATCH)
        .config("spark.sql.session.timeZone", "UTC")
        # binary-heavy rows: don't let broadcast autodetection pull a payload
        # table driver-side; dimension tables are broadcast explicitly.
        .config("spark.sql.autoBroadcastJoinThreshold", str(8 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
