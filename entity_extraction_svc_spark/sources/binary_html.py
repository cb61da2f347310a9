"""HTML-file source (reference S3): raw .html files -> the pages shape.

The reference's multipart file upload (``agent/server.py:410-415``) maps to
Spark's ``binaryFile`` source: one row per file with path, modification time
and content — projected straight onto the pages schema so everything
downstream (fused plan, lineage) is source-agnostic.  At scale the source
parallelizes per file; ``pathGlobFilter`` prunes non-HTML payloads at the
listing, before any bytes are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_html_files(spark: SparkSession, path: str,
                    glob: str = "*.html", lang: str = "en") -> DataFrame:
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.col("path").alias("url"),
            F.col("modificationTime").alias("warc_ts"),
            F.col("content").alias("html"),
            F.lit(None).cast("string").alias("text"),
            F.lit(lang).alias("lang"),
        )
    )
