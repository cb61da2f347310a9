"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with typed
metadata extracted alongside (the same pattern the pipeline uses for ``html``
— BASELINE.json input_hint).  The heavy per-byte work is Arrow-batched
``mapInPandas`` so a real codec drops in without touching the plan:

* ``binary_meta``        — pure JVM expressions: size, magic-number sniff.
* ``extract_features``   — REAL deterministic featurization (byte histogram
                           -> L1-normalized float vector) in a pandas UDF;
                           the shape a CLIP/ResNet embedding stage would have.
* ``decode_image``       — decodes via PIL when available; otherwise a
                           clearly-marked deterministic fake (dimensions
                           derived from the payload hash) so the plumbing
                           (schema, batching, null handling) is testable in
                           this container.  STUB: real pixel decode needs an
                           image lib not present here.
* ``resize_image`` / ``sample_frames`` — STUBS raising NotImplementedError:
                           the Spark-side signatures, schemas and batch
                           shapes are real; the codec calls are not.

Partitioning note: binary payloads dominate row size, so upstream tables
should be written with small ``maxRecordsPerFile`` / row-group sizes; the
feature stage selects only (key, binary) so Parquet column pruning keeps
every other column off the wire.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MAGIC = {
    "89504e47": "png",
    "ffd8ffe0": "jpeg",
    "ffd8ffe1": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi container
    "664c6143": "flac",
    "1a45dfa3": "matroska",  # mkv/webm
}


def binary_meta(df: DataFrame, bin_col: str = "payload", key_col: str = "url") -> DataFrame:
    """Typed metadata from the binary column — built-in expressions only
    (no Python): byte size, 4-byte magic prefix, sniffed media kind."""
    payload = F.col(bin_col)
    magic = F.lower(F.hex(F.substring(payload, 1, 4)))
    kind = F.lit("unknown")
    for sig, name in MAGIC.items():
        kind = F.when(magic == sig, F.lit(name)).otherwise(kind)
    kind = (
        F.when(F.substring(payload.cast("string"), 1, 9) == "<!DOCTYPE", F.lit("html"))
        .when(F.substring(payload.cast("string"), 1, 5) == "<html", F.lit("html"))
        .otherwise(kind)
    )
    return df.select(
        F.col(key_col),
        F.length(payload).cast("long").alias("n_bytes"),
        magic.alias("magic_hex"),
        kind.alias("media_kind"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def extract_features(df: DataFrame, bin_col: str = "payload",
                     key_col: str = "url", dim: int = 16) -> DataFrame:
    """Deterministic byte-histogram features (L1-normalized, ``dim`` buckets)
    via Arrow-batched mapInPandas — the exact plumbing a learned encoder
    uses: select-only-needed-columns, model/codec init once per batch
    iterator (== once per executor task), vectorized numpy inside."""
    import numpy as np

    cols = df.select(F.col(key_col).alias("url"), F.col(bin_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-task init happens HERE (broadcast model handle at scale)
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                if b is None or len(b) == 0:
                    feats.append(None)
                    continue
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr >> (8 - int(dim).bit_length() + 1),
                                   minlength=dim)[:dim].astype("float64")
                total = hist.sum()
                feats.append((hist / total).astype("float32").tolist() if total else None)
            yield pd.DataFrame({"url": pdf["url"], "feature": feats})

    return cols.mapInPandas(run, FEATURE_SCHEMA)


DECODE_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mode", StringType(), True),
        StructField("decoder", StringType(), True),
    ]
)


def decode_image(df: DataFrame, bin_col: str = "payload",
                 key_col: str = "url") -> DataFrame:
    """Image decode metadata.  Uses PIL when importable; otherwise a
    DETERMINISTIC FAKE (dimensions from the payload md5) clearly labelled in
    the ``decoder`` column — the batching/schema/null path is the real
    production shape, only the codec is stubbed."""
    cols = df.select(F.col(key_col).alias("url"), F.col(bin_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False
        import hashlib
        import io

        for pdf in batches:
            rows = {"url": [], "width": [], "height": [], "mode": [], "decoder": []}
            for url, b in zip(pdf["url"], pdf["payload"]):
                rows["url"].append(url)
                if b is None or len(b) == 0:
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["mode"].append(None)
                    rows["decoder"].append(None)
                    continue
                if have_pil:
                    try:
                        im = Image.open(io.BytesIO(bytes(b)))
                        rows["width"].append(im.width)
                        rows["height"].append(im.height)
                        rows["mode"].append(im.mode)
                        rows["decoder"].append("pil")
                        continue
                    except Exception:
                        pass
                h = hashlib.md5(bytes(b)).digest()
                rows["width"].append(64 + h[0] % 192)
                rows["height"].append(64 + h[1] % 192)
                rows["mode"].append("FAKE")
                rows["decoder"].append("deterministic-fake")
            yield pd.DataFrame(rows)

    return cols.mapInPandas(run, DECODE_SCHEMA)


def resize_image(df: DataFrame, width: int, height: int,
                 bin_col: str = "payload") -> DataFrame:
    """STUB — real resize needs an image codec not present in this
    container.  The call shape (same-schema binary-in/binary-out mapInPandas)
    is fixed; swap the body for PIL/libvips on a real cluster."""
    raise NotImplementedError(
        "image resize requires an image library (PIL/libvips) not available "
        "in this environment; plumbing shape: mapInPandas binary->binary"
    )


def sample_frames(df: DataFrame, every_n_seconds: float = 1.0,
                  bin_col: str = "payload") -> DataFrame:
    """STUB — video frame sampling needs ffmpeg/pyav.  Output schema would be
    (url, frame_idx, ts_sec, frame_png binary) via mapInPandas 1->N."""
    raise NotImplementedError(
        "frame sampling requires ffmpeg/pyav not available in this "
        "environment; plumbing shape: mapInPandas 1->N exploding rows"
    )
