"""SparkSession construction tuned for this engine.

Local-mode settings for tests/bench; on a real cluster the same builder is
used minus the master/driver-memory overrides (spark-submit supplies them).
AQE is always on: skewed celebrity blocks at 10^12-document scale are
re-planned at runtime (skew-join splitting + partition coalescing), which
complements the explicit key-salting in ``operators.blocking``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pprl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
    n_threads = cpus if n in ("*", "") else int(n)
    if shuffle_partitions is None:
        # Partition count must follow DATA VOLUME, not a universal
        # multiplier: at 100k docs/source, 4x partitions-per-thread wins
        # (local[32]: 89s @1x -> 73s @4x; local[4]: 387s -> 313s) because
        # big blocked-join partitions interleave across contended cores —
        # but on the small sf0.1 driver suite the same 4x rule DOUBLES
        # total time (87s -> 165s): per-task overhead swamps tiny
        # shuffles, worst in the iterative connected-components loop.
        # Default = threads (right for the small scale tests run at);
        # large jobs pass shuffle_partitions=4*cores explicitly
        # (tools/_scale_job.py) — on a real cluster, size to
        # data-bytes/partition (~128MB), not to core count.
        shuffle_partitions = n_threads
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Keep the heap LEAN: in this container a larger heap is strictly
        # slower when headroom exists (30k-doc linkage, local[32]: 2g ->
        # 35s, 8g -> 86s, 16g -> 104s — fresh-page faults + GC dwarf the
        # work), while 16+ threads allocating Arrow batches on 2g hit
        # GCLocker starvation. Empirical table from the 100k-doc sweep:
        # <=8 threads -> 2g, >8 -> 5g. Override via PPRL_DRIVER_MEMORY.
        .config(
            "spark.driver.memory",
            os.environ.get("PPRL_DRIVER_MEMORY", "2g" if n_threads <= 8 else "5g"),
        )
        # Long-lived local sessions accumulate broadcast/checkpoint blocks
        # whose cleanup waits on driver GC (ContextCleaner is weak-ref
        # driven); the default 30min periodic GC lets a multi-query bench
        # session build memory pressure that intermittently doubles a
        # query's wall time. 2min bounds the drift.
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # Arrow's JNI critical sections starve G1 allocations under load
        # ("Retried waiting for GCLocker too often"); raising the retry
        # budget is the standard mitigation (JDK-8192647 era guidance)
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=100",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
