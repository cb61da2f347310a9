"""SparkSession factory with the confs this pipeline relies on.

Tuned for the pipeline's shape: Arrow-batched pandas UDF stages, two wide
shuffles (groupBy url for doc-level linking; final repartition by subject
hash), broadcast dimension joins, AQE for runtime re-planning and skew-join
splitting at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "entity_extraction_svc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of shuffle partitions + skew-join splitting
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow: the pandas-UDF hot path; batch size replaces the reference's
        # batch_size=16 micro-batching (entity_detection_en.json:7).
        # 2048 held up under a round-3 min-of-3 A/B on the scaling harness
        # (local[16], 200k pages: 6.8s vs 9.2s at 512); a single-shot 5M
        # sweep had suggested 512, but that delta was tenant noise while
        # the 512 regression at smaller per-task doc counts is consistent
        # (~6 batches/task leaves per-batch fixed costs unamortized).
        # Only the extremes are unambiguous: 16384 serializes the pipeline
        # (2.2x slower at 5M). Workload-dependent — override via
        # SPARK_GRAFT_ARROW_BATCH (a real GPU tagger wants it larger: one
        # tag_batch forward per Arrow batch).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "2048"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # bucketed tables (co-located joins) land outside the repo tree
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE",
                               "/tmp/kg_spark_warehouse"))
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    else:
        builder = builder.config("spark.sql.shuffle.partitions", "32")
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor workers regardless of cwd —
    the in-process equivalent of ``spark-submit --py-files pkg.zip`` (north
    rule deployment mode).  Without it, pandas-UDF closures referencing the
    package fail to unpickle on workers launched outside the repo root."""
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # real spark-submit --py-files mode: the package is imported FROM the
    # shipped zip (pkg_dir like /tmp/pkg.zip/entity_extraction_svc_spark),
    # there is no source tree to walk, and the executors already have the
    # zip — re-shipping is both impossible and unnecessary
    if not os.path.isdir(pkg_dir):
        return
    zip_base = os.path.join(tempfile.gettempdir(), "entity_extraction_svc_spark_pkg")
    zip_path = zip_base + ".zip"
    py_mtimes = [
        os.path.getmtime(os.path.join(root, f))
        for root, _, files in os.walk(pkg_dir)
        for f in files
        if f.endswith(".py")
    ]
    if not py_mtimes:
        return
    src_mtime = max(py_mtimes)
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < src_mtime:
        shutil.make_archive(zip_base, "zip", os.path.dirname(pkg_dir),
                            os.path.basename(pkg_dir))
    spark.sparkContext.addPyFile(zip_path)
