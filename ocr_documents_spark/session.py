"""SparkSession factory tuned for the extraction workload.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` in one JVM, but every knob
below is the one you would set on a 1000-executor cluster: AQE for runtime
re-planning and skew-join splitting, Arrow for all Python UDF traffic, and a
shuffle-partition count sized so post-explode span batches stay well inside
executor memory at the target SF.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
# Arrow batch sizing: rows here are WHOLE DOCUMENTS on the light path
# (each carrying every media payload), so 4096-row batches ran to ~40-80MB
# and measurably hurt under memory pressure (18s vs 10s in a loaded
# window; ~7% slower even in a quiet one).  1024 keeps batches ~10-20MB —
# large enough to amortize Arrow framing, small enough to pipeline — and
# bounds heavy-path span batches identically.
ARROW_BATCH_ROWS = 1024


def get_spark(app_name: str = "ocr-documents-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        # on a real lake these stay at cluster defaults (128m); locally the
        # bench shrinks them via env so a few-MB corpus still fans out to
        # every core the way a many-file 100 TB table naturally would
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"))
        .config("spark.sql.files.openCostInBytes",
                os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", "4194304"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Shuffle/spill scratch space.  On a real cluster this is the
    # executor-local NVMe array; on this single-box sandbox the default
    # (/tmp) is one virtual disk shared by all 32 task threads.  Point
    # it at tmpfs (SPARK_GRAFT_LOCAL_DIR=/dev/shm/...) to take disk I/O
    # out of the scratch path the way per-executor NVMe does in
    # production.  NOTE the measured caveat (BENCH.md §3 decomposition):
    # the 10-15x shuffle-write-time inflation at local[32] SURVIVES a
    # tmpfs scratch dir — it is compress/copy CPU contending with the
    # Python workers, not I/O — so do not expect this knob alone to
    # restore 8->32 scaling on one box.  Also measured (BENCH.md §3
    # knob A/B): spark.shuffle.compress=false makes local[32] WORSE
    # (1.62x -> 1.20x) — uncompressed blocks push 1.5x the bytes
    # through the same shared copy path — and a 24g heap changes
    # nothing; the defaults are the tuned state.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
