"""SparkSession factory with the engine's standard configuration.

Scale notes (100 TB / 1000-executor design intent):
- AQE on: runtime coalescing + skew-join splitting replaces the
  reference's hand-tuned batch sizes (guac's flush@5000,
  /root/reference/pkg/ingestor/ingestor.go:119).
- shuffle partitions default to cores locally; on a real cluster this
  is set to ~2-3× total cores via spark-submit conf, and AQE coalesces.
- UTC session timezone so results compare bit-exactly with the DuckDB
  oracle (duckdb timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "guackg",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("GUACKG_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        n = cpus if cpus.isdigit() else "32"
        shuffle_partitions = int(os.environ.get("GUACKG_SHUFFLE_PARTITIONS", n))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # The broadcast threshold stays at Spark's conservative 10 MB
        # default. Measured dead end: raising it to 64 MB made the
        # planner broadcast the 2×|triples| exploded mention stream in
        # the page-graph join — Catalyst's size estimate for a
        # project+explode over a dictionary-compressed parquet scan
        # was ~2 bytes/row (3.6 MB for 1.9M rows), so the WRONG side
        # cleared the raised bar and 18.8M rows funneled through the
        # driver. Joins that genuinely want a broadcast carry an
        # explicit, real-statistics-driven hint instead
        # (pipeline.py page-map decision from lineage row counts).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ~10-50 KB blob rows: 256-row batches keep Arrow buffers well
        # under the G1 humongous-object threshold (4096-row batches of
        # heavy rows measured 7× slower at 32 concurrent tasks — GC and
        # kernel page-allocator storms)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        # JVM↔Python worker transport over unix domain sockets —
        # measurably less kernel overhead than loopback TCP at high
        # worker counts (Spark 4 feature)
        .config("spark.python.unix.domain.socket.enabled", "true")
        # split scans small enough that every core gets tasks even on
        # the few-hundred-MB intermediate tables of local benchmarks;
        # on a real cluster raise toward the 128m default so task
        # count tracks executor memory, not core starvation
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("GUACKG_MAX_PARTITION_BYTES", "16m"))
        .config("spark.driver.memory", os.environ.get("GUACKG_DRIVER_MEM", "8g"))
        # commit algorithm v2: task-side rename into the job output dir
        # (parallel, executor-side) instead of a serial driver-side move
        # of every file at commitJob. Safe here: every guackg sink
        # already writes to a private tmp dir swapped in atomically
        # (io.write_table / merge_upsert), so v2's weaker mid-job
        # atomicity is invisible — and the serial driver rename walk is
        # a per-job fixed cost that caps executor scaling.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
                "2")
        .config("spark.ui.enabled", "false")
    )
    # observability probe: GUACKG_EVENT_LOG=<dir> writes the standard
    # Spark event log (per-stage/task timings) for offline analysis —
    # the same file a cluster's history server ingests
    ev_dir = os.environ.get("GUACKG_EVENT_LOG")
    if ev_dir:
        os.makedirs(ev_dir, exist_ok=True)
        builder = (builder.config("spark.eventLog.enabled", "true")
                   .config("spark.eventLog.dir", ev_dir))
    if master.startswith("local"):
        # local / local-cluster hygiene: shuffle/spill on the RAM disk
        # (ext4 journal churn from 32 concurrent shuffle writers shows
        # up as kernel time), and GC threads capped so collections
        # don't stall all task threads. A real cluster sets these per
        # executor in spark-submit conf instead.
        local_dir = os.environ.get("GUACKG_LOCAL_DIR")
        if local_dir is None and os.path.isdir("/dev/shm"):
            local_dir = "/dev/shm/spark-local"
        if local_dir:
            os.makedirs(local_dir, exist_ok=True)
            builder = builder.config("spark.local.dir", local_dir)
        gc_opts = "-XX:ParallelGCThreads=8 -XX:ConcGCThreads=2"
        builder = builder.config("spark.driver.extraJavaOptions", gc_opts)
        if master.startswith("local-cluster"):
            # multi-executor-JVM mode (the in-sandbox stand-in for a
            # real N-executor cluster): each executor JVM gets its own
            # python workers, Arrow exchange, and GC. Worker JVMs take
            # their scratch dir from SPARK_LOCAL_DIRS (the standalone
            # cluster manager overrides spark.local.dir), so export it
            # before the JVMs launch — shuffle must hit the RAM disk
            # in every executor, not just the driver.
            if local_dir:
                os.environ.setdefault("SPARK_LOCAL_DIRS", local_dir)
            # Executor JVM thread pools: measured dead end — pinning
            # each executor to its container view via
            # -XX:ActiveProcessorCount=<cores> (the YARN/k8s cgroup
            # analog) with GC threads scaled down made the 4-executor
            # leg 25% SLOWER (edges stage 135 s → 205 s): whole-stage
            # codegen compiles per executor per stage, and one C2
            # compiler thread + 2 GC threads per 8 GB heap starve
            # exactly the codegen-heavy aggregation stages. The capped
            # 8/2 GC pool below is the measured sweet spot.
            builder = (builder
                       .config("spark.executor.memory",
                               os.environ.get("GUACKG_EXECUTOR_MEM", "8g"))
                       .config("spark.executor.extraJavaOptions", gc_opts))
    return builder.getOrCreate()
