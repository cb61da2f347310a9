"""extract_text: pages(html|text) -> byte-identical extracted text.

Spark mapping of reference operators H1/H4/H5 (SURVEY.md §2.2): a scalar
Arrow-batched pandas UDF wrapping the exact chain of
``agent/server_utils/preprocessing.py:18-74`` + ``agent/server.py:215-236``.
Pure string work per row -> series-to-series UDF, no per-row Python at the
Spark API level (input_hint requirement).

Column pruning matters at 10^12 docs: this stage selects only (url, html,
lang) from the source so the parquet scan never reads the other columns.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from entity_extraction_svc_spark.functions import htmltext


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda h: htmltext.preprocess_html(h) if h is not None else "")


@pandas_udf(StringType())
def preprocess_text_udf(text: pd.Series) -> pd.Series:
    """For payloads that arrive as plain text (reference S1 'text' branch)."""
    return text.map(lambda t: htmltext.preprocess_text(t) if t is not None else "")


def extract_text(pages: DataFrame, source: str = "html",
                 engine: str = "bs4") -> DataFrame:
    """pages -> (url, text, lang).

    source="html": strip boilerplate from the html column (flagship path).
    source="text": normalize the pre-extracted text column.
    engine: "bs4" (deterministic, the byte-identity contract) or
    "trafilatura" (the reference's other request-time engine,
    agent/server.py:51; available only where the library is installed —
    its output is version-sensitive, so the invariant tests pin bs4).
    """
    if source != "html":
        return pages.select(
            "url", preprocess_text_udf(F.col("text")).alias("text"), "lang"
        )
    if engine == "trafilatura":
        try:
            import trafilatura  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env without the lib
            raise NotImplementedError(
                "engine='trafilatura' needs the trafilatura package "
                "(not installed in this environment); use engine='bs4'"
            ) from exc

        @pandas_udf(StringType())
        def trafilatura_udf(html: pd.Series) -> pd.Series:
            import trafilatura as T

            def one(h):
                if h is None:
                    return ""
                raw = h.decode("utf-8", errors="replace") if isinstance(h, (bytes, bytearray)) else h
                return htmltext.preprocess_text(T.extract(raw) or "")

            return html.map(one)

        return pages.select(
            "url", trafilatura_udf(F.col("html")).alias("text"), "lang"
        )
    return pages.select(
        "url", extract_text_udf(F.col("html")).alias("text"), "lang"
    )
