"""SparkSession construction with scale-aware defaults.

Local mode is a correctness proxy only; every config below is chosen to
also be the right call on a 1000-executor cluster: AQE for runtime
re-planning (skew joins, partition coalescing), Arrow for any
Python-exchange path, UTC session time zone so timestamp semantics match
the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Streaming state-store backends (spark.sql.streaming.stateStore.
# providerClass). The HDFS-backed provider keeps state on the JVM heap
# — fine for small key spaces; RocksDB spills state to local disk, the
# right call when stateful keys × window size outgrow executor memory
# (ships with Spark 4, no extra jars). Select per session via
# get_spark(state_store_provider=...) or SPARK_GRAFT_STATE_STORE.
STATE_STORE_PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
}


def get_spark(
    app_name: str = "real_time_data_anomaly_detection_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    state_store_provider: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    At real cluster scale the same knobs apply; only ``master`` and the
    shuffle-partition count (sized ~2-3x total cores, with AQE coalescing
    the excess) change.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # Local mode = one JVM; driver memory IS executor memory. The
        # 1g default OOMs any real shuffle. Takes effect only when this
        # call launches the JVM (ignored on an already-running session).
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
        )
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime re-planning — coalesce small shuffle partitions,
        # convert SMJ->broadcast when runtime stats allow, split skewed
        # partitions. Essential at 100 TB, harmless at sf0.01.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow batches for any pandas_udf / applyInPandas / toPandas path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp semantics (oracle parity).
        .config("spark.sql.session.timeZone", "UTC")
        # Whole-stage-codegen class cache (STATIC conf — takes effect
        # only when this call launches the JVM). The 100-entry default
        # thrashes on mixed workloads: a session cycling through this
        # engine's full registry (bench/verify: ~180 queries, several
        # generated classes each) evicts every query's classes between
        # its own runs, re-paying janino compilation per sample —
        # measured as a consistent ~2-3 s in-bench overhead on the
        # iterative queries (pagerank's 5-iteration loop alone
        # generates ~15 stages). Sized for the registry sweep; a few
        # KB of bytecode per entry, so ~tens of MB against a 48g heap.
        .config("spark.sql.codegen.cache.maxEntries", "4000")
        .config("spark.ui.enabled", "false")
    )
    provider = state_store_provider or os.environ.get("SPARK_GRAFT_STATE_STORE")
    if provider:
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            STATE_STORE_PROVIDERS.get(provider.lower(), provider),
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
