"""SparkSession factory with scale-oriented defaults.

Settings chosen for the 100 TB design point (see README):
* AQE on (runtime coalescing, skew-join splitting),
* Arrow enabled for every pandas-UDF exchange,
* UTC session timezone (reference normalizes all timestamps to UTC,
  db/models.py:57-76),
* shuffle partitions sized for the local harness; on a real cluster this
  is set to ~2-3x total cores and AQE coalesces from there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(
    app_name: str = "greynirserver-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus if cpus.isdigit() else "32")
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # G1's GCLocker stalls badly when many executor threads sit in
        # JNI critical sections (snappy/lz4 codecs): allocation retries
        # give up and force full GCs. Measured 67s -> 22s on a 32-thread
        # shuffle+write stage with this flag.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64",
        )
        # honored only by executor-JVM masters (local-cluster / real
        # clusters); harmless in local[k]
        .config("spark.executor.memory", os.environ.get("SPARK_EXECUTOR_MEM", "6g"))
        .config(
            "spark.executor.extraJavaOptions",
            os.environ.get(
                "SPARK_EXECUTOR_JAVA_OPTS",
                "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64",
            ),
        )
        # Block the first job until every executor has registered:
        # otherwise the fixture-persist job lands all cached blocks on
        # whichever executors came up first and every later stage
        # bottlenecks on remote fetches from them. No-op for local[k];
        # on real clusters this is the standard cold-start guard.
        .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
        .config("spark.scheduler.maxRegisteredResourcesWaitingTime", "60s")
        .config(
            "spark.locality.wait",
            os.environ.get("SPARK_LOCALITY_WAIT", "3s"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Tokenization explodes each text row ~200x; at the default 128MB
        # scan partitions a single task would own GBs of exploded rows.
        # Smaller scan splits keep the explode stage wide. (On a 100TB
        # corpus there are plenty of files either way; this guards the
        # small-file tail.)
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    if not master.startswith("local[") :
        _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship greynirserver_spark to executors (the spark-submit --py-files
    contract): required for any master with separate executor processes
    (local-cluster, standalone, YARN, K8s); local[k] threads inherit the
    driver's sys.path and skip this."""
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_base = os.path.join(
        tempfile.gettempdir(), f"greynirserver_spark_pyfiles_{os.getpid()}"
    )
    zip_path = shutil.make_archive(
        zip_base, "zip", os.path.dirname(pkg_dir), "greynirserver_spark"
    )
    spark.sparkContext.addPyFile(zip_path)
