"""SparkSession factory tuned for the CDC ingest workload.

The confs below are the scale knobs the engine relies on (SURVEY.md §4):

* AQE + skew-join splitting: hot-repo skew (Zipf key distribution in the
  WAL) is re-planned at runtime instead of hand-scheduled.
* Arrow execution for the pandas extraction UDFs; ``maxRecordsPerBatch``
  kept moderate because ``content`` rows are 0.2–50 KB strings.
* ``shuffle.partitions`` defaults to the local core count — on a real
  cluster this is set per-submit (``spark-submit --conf``) to
  ~2–3× total cores; every helper here takes an override.
* **Right-sized heap + pre-sized code cache.** An oversized ``-Xmx``
  is not free: the first workload that drives committed-heap growth
  pays the kernel's page-fault/zeroing cost for memory it never needed
  (measured on this host: an identical first job ran 51 s under a 48g
  heap vs 2.6 s under 8g — all system time; steady state identical).
  Same for the JIT code cache: growing it in 2 MB steps under load
  serializes compilation behind mprotect storms. Default 16g (plenty
  for the engine's bounded broadcasts; ``SPARK_GRAFT_DRIVER_MEM``
  overrides for outsized jobs) with the code cache reserved up front.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "read_comp_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard confs.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract);
    on a real cluster the master comes from spark-submit and this argument
    is left None.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]"))
        except (IndexError, ValueError):
            n = os.cpu_count() or 8
        shuffle_partitions = max(n, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # InferFiltersFromGenerate copies the generator expression into a
        # `size(e) > 0 AND isnotnull(e)` pre-filter. For the engine's
        # shingle/gram pipelines the generator is the most expensive
        # expression in the query (split + transform + concat_ws over the
        # full text), so the "free" inferred filter evaluates it 3× per row
        # (twice in the filter, once in the project) — measured in the r6
        # plans (plans/r06/dup_ngram_spans_before.txt nodes 5/6). Every
        # explode in the engine already carries an explicit emptiness guard
        # (`size(toks) >= n`), so the inference buys nothing here at any
        # scale; excluding the rule is semantics-neutral (optimizer rules
        # never change results, only plans).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    # pre-size the JIT code cache; callers' extraJavaOptions are appended
    java_opts = "-XX:InitialCodeCacheSize=256m -XX:ReservedCodeCacheSize=512m"
    extra_conf = dict(extra_conf or {})
    caller_opts = extra_conf.pop("spark.driver.extraJavaOptions", "")
    builder = builder.config(
        "spark.driver.extraJavaOptions", f"{java_opts} {caller_opts}".strip()
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
