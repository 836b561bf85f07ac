"""SparkSession factory tuned for the crawl-frontier workload.

Local-mode sessions here mirror the cluster profile we design for:
AQE on (runtime re-plan + skew-join splitting for power-law hosts),
shuffle partitions sized to cores (not the 200 default), Arrow enabled
for the three vectorized kernels, UTC timestamps for oracle parity.

At cluster scale the same builder is fed through ``spark-submit
--py-files go_crawler_spark.zip`` with ``master`` left to the cluster
manager; nothing in the engine assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "go_crawler_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    executors: int | None = None,
    executor_mem_mb: int = 20480,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard conf.

    ``cpus=None`` → ``local[*]``. ``shuffle_partitions`` defaults to the
    core count so small-scale shuffles don't fragment into 200 empty
    tasks; on a real cluster this is overridden to ~2-3× total cores via
    ``extra_conf`` (AQE coalescing then trims empties at runtime).

    ``executors=N`` switches to ``local-cluster[N, cpus-per-exec, mem]``:
    N separate executor JVMs with per-executor heaps and block managers
    — the closest in-sandbox stand-in for a multi-executor fleet (each
    executor gets its own GC, parquet readers, and checkpoint storage,
    removing the two single-heap artifacts BENCH.md §2a documents).
    Executor python workers import the package via executorEnv
    PYTHONPATH, exactly how ``spark-submit --py-files`` ships it.
    """
    cores = cpus or os.cpu_count() or 8
    if executors:
        per_exec = max(1, cores // executors)
        master = f"local-cluster[{executors},{per_exec},{executor_mem_mb}]"
    else:
        master = f"local[{cpus}]" if cpus else "local[*]"
    sp = shuffle_partitions or cores

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing trades python-worker roundtrip overhead
        # against per-batch memory: 8192 keeps string-kernel batches
        # cheap while an image-payload batch (~12 KB/row) stays ~100 MB;
        # shrink via extra_conf for bigger images at cluster scale
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if executors:
        import sys

        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        builder = (
            # executor heap must fit inside the local-cluster worker mem
            builder.config("spark.executor.memory", f"{executor_mem_mb - 1024}m")
            .config("spark.executorEnv.PYTHONPATH", repo_root)
            # executor python workers must be the same interpreter as the
            # driver (the default bare "python3" may resolve differently)
            .config("spark.pyspark.python", sys.executable)
            # driver in local-cluster mode only coordinates — the 16g/48g
            # heaps local mode needs (it hosts every block) are wasted here
            .config("spark.driver.memory",
                    os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
            # with 1-core executors every cached/checkpointed block has
            # exactly one home executor, so the default 3 s locality wait
            # serializes task dispatch whenever that executor is busy —
            # measured 2× on the 384 k fetch round (440→225 s). A real
            # fleet keeps the default (multi-core executors absorb
            # same-host tasks); in-sandbox single-core executors must not.
            .config("spark.locality.wait", "0s")
        )
    if os.environ.get("SPARK_GRAFT_PRETOUCH"):
        # Fault the whole heap in at JVM start (-Xms=-Xmx + AlwaysPreTouch).
        # On virtualized hosts the first touch of each fresh heap page can
        # fault through the hypervisor; untouched, that cost lands inside
        # whichever query grows the heap first and inflates identical runs
        # up to ~6x (measured: 54-335 s for the same cold kernel, ~89%
        # system CPU during the slow episodes). Pre-touching pays it once
        # at session start. Opt-in and OFF by default everywhere: faulting
        # the full heap costs strictly more than lazy touch when queries
        # use only a few GiB (measured 215 s for 16 GiB in the slow mode),
        # and python-worker/Arrow memory is outside the JVM heap anyway —
        # bench.py guards its headline with best-of-2 runs instead. Kept
        # for experiments on hosts where first-touch is the dominant cost.
        heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        builder = builder.config(
            "spark.driver.extraJavaOptions", f"-Xms{heap} -XX:+AlwaysPreTouch"
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
