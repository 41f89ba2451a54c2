"""SparkSession factory with the semantics configs the engine relies on.

Semantics configs mirror the reference's DuckDB/pandas conventions
(see SURVEY.md §4.3; reference: /root/reference/hangarbay/api.py:301-302):

- ANSI off: unsafe casts return null instead of erroring, matching the
  reference's ``cast(schema, safe=False)`` / ``errors="coerce"`` behavior
  (/root/reference/pipelines/normalize.py:123-142).
- ``timeParserPolicy=CORRECTED``: malformed dates -> null.
- Session timezone UTC: testdata timestamps are naive; DuckDB treats
  them as UTC-naive, so Spark must too for oracle parity.
- AQE on: runtime join-strategy selection, partition coalescing and
  skew-join handling — the scale path for a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "hangarbay_spark",
    master: str | None = None,
    shuffle_partitions: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) the session used by the pipeline, API and tests.

    In local mode the driver is the only JVM; ``local[N]`` controls task
    threads. On a real cluster the same configs apply, only
    ``spark.sql.shuffle.partitions`` should scale with executor count
    (or be left to AQE's coalescing with a high initial value).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    # glibc malloc tuning for the PYTHON WORKERS only (guide §4): large
    # numpy/Arrow temporaries otherwise come from fresh mmap regions,
    # and first-touch page faults on those dominate vectorized kernels
    # in this environment (measured ~1000x a warm-page pass for a
    # 19 MB array; pd.Index.get_indexer 11 s in-worker vs 0.2 s in the
    # driver on identical data). Keeping allocations on the sbrk heap
    # (MMAP_MAX_=0) and never trimming it back (TRIM_THRESHOLD_ max)
    # makes worker reuse keep pages warm — kernels run at driver speed
    # from the second task on. Delivered via spark.executorEnv.* — the
    # Python daemon/worker launch env includes getExecutorEnv in local
    # mode too — NOT by mutating this process's environ: the JVM and
    # driver-side Python must keep default malloc (a same-hour A/B of
    # the JVM-only PageRank loop read 17 s default vs 42 s with the
    # env inherited process-wide).
    malloc_env = {
        "MALLOC_MMAP_MAX_": "0",
        "MALLOC_TRIM_THRESHOLD_": "2147483647",
    }
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS,
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        # The driver testdata writes TIMESTAMP(NANOS) parquet, which the
        # Spark reader rejects outright; read as long ns-since-epoch and
        # normalize to TimestampType at load (queries/base.py:load_events).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.legacy.timeParserPolicy", "CORRECTED")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Bound Arrow batch row count so multi-MB binary payloads
        # (multimodal media columns) don't blow Python-worker memory:
        # 1024 rows x ~4 MB payload ≈ 4 GB worst-case without a cap.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Local-mode split sizing: single-file corpora compress far
        # below the 128 MB default split, so CPU-heavy scans (text
        # kernels, HOF pipelines) otherwise run on ONE task no matter
        # how many cores local[N] has (sf1 A/B: text_char_entropy ran
        # 14x the sf0.1 time on one core). 16 MB engages the cores on
        # bench-scale files while leaving test-scale files (< 16 MB)
        # as single splits — no tiny-task overhead at sf0.01. A real
        # cluster deployment keeps the default (many files, and
        # executor count — not split count — is the parallelism lever).
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in malloc_env.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
