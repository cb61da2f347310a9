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
* ``resize_image``       — REAL Spark plumbing (binary->binary mapInPandas,
                           PIL when importable) with a deterministic
                           strided-byte fake codec otherwise, labelled in
                           the ``codec`` column.  STUB: only the pixel
                           math is fake without an image lib.
* ``sample_frames``      — REAL 1->N exploding mapInPandas (url, frame_idx,
                           ts_sec, frame binary); ffmpeg/pyav when present,
                           else a deterministic byte-window fake labelled
                           in ``codec``.  STUB: only the codec is fake.

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
    BinaryType,
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


RESIZE_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("resized", BinaryType(), True),
        StructField("out_width", IntegerType(), True),
        StructField("out_height", IntegerType(), True),
        StructField("codec", StringType(), True),
    ]
)


def resize_image(df: DataFrame, width: int, height: int,
                 bin_col: str = "payload", key_col: str = "url") -> DataFrame:
    """Binary-in/binary-out resize via Arrow-batched mapInPandas.

    PIL when importable (real pixel resample, PNG re-encode); otherwise a
    DETERMINISTIC FAKE codec — the payload bytes strided to exactly
    ``width*height`` output bytes — clearly labelled ``codec =
    "strided-byte-fake"``.  Schema, column pruning (only key+binary read),
    batching and null handling are the production shape either way; ONLY
    the pixel math is stubbed without an image lib (SURVEY §7.4 risk 5).
    """
    import numpy as np

    cols = df.select(F.col(key_col).alias("url"), F.col(bin_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        try:
            from PIL import Image

            have_pil = True
        except ImportError:
            have_pil = False
        for pdf in batches:
            rows = {"url": [], "resized": [], "out_width": [],
                    "out_height": [], "codec": []}
            for url, b in zip(pdf["url"], pdf["payload"]):
                rows["url"].append(url)
                if b is None or len(b) == 0:
                    rows["resized"].append(None)
                    rows["out_width"].append(None)
                    rows["out_height"].append(None)
                    rows["codec"].append(None)
                    continue
                if have_pil:
                    # with a real codec present, a decode failure is DATA
                    # corruption, not a missing library: surface it as a
                    # null row labelled decode-error rather than silently
                    # emitting fake bytes a consumer could mistake for a
                    # resized image
                    try:
                        im = Image.open(io.BytesIO(bytes(b))).resize((width, height))
                        buf = io.BytesIO()
                        im.save(buf, format="PNG")
                        rows["resized"].append(buf.getvalue())
                        rows["out_width"].append(width)
                        rows["out_height"].append(height)
                        rows["codec"].append("pil")
                    except Exception:
                        rows["resized"].append(None)
                        rows["out_width"].append(None)
                        rows["out_height"].append(None)
                        rows["codec"].append("decode-error")
                    continue
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                n_out = width * height
                idx = (np.arange(n_out, dtype=np.int64) * len(arr)) // n_out
                rows["resized"].append(arr[idx].tobytes())
                rows["out_width"].append(width)
                rows["out_height"].append(height)
                rows["codec"].append("strided-byte-fake")
            yield pd.DataFrame(rows)

    return cols.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_sec", FloatType(), False),
        StructField("frame", BinaryType(), True),
        StructField("codec", StringType(), True),
    ]
)


def sample_frames(df: DataFrame, every_n_seconds: float = 1.0,
                  assumed_duration_sec: float = 8.0,
                  frame_bytes: int = 256,
                  bin_col: str = "payload", key_col: str = "url") -> DataFrame:
    """1->N frame sampling via exploding mapInPandas.

    ffmpeg/pyav when importable; otherwise a DETERMINISTIC FAKE that
    treats the payload as ``assumed_duration_sec`` of media and emits one
    ``frame_bytes``-byte window per sampled timestamp (``codec =
    "byte-window-fake"``).  The 1->N row explosion, ordered frame_idx /
    ts_sec columns, and binary frame payloads are the real production
    shape; ONLY the decode is stubbed without a video lib.
    """
    cols = df.select(F.col(key_col).alias("url"), F.col(bin_col).alias("payload"))
    n_frames = max(1, int(assumed_duration_sec / max(every_n_seconds, 1e-9)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        try:
            import av

            have_av = True
        except ImportError:
            have_av = False

        def real_frames(data: bytes):
            """pyav keyframe sampling; raises on any demux/decode problem
            and the caller falls back to the labelled fake."""
            out = []
            with av.open(io.BytesIO(data)) as container:
                stream = container.streams.video[0]
                next_ts, idx = 0.0, 0
                for frame in container.decode(stream):
                    ts = float(frame.time or 0.0)
                    if ts + 1e-9 < next_ts:
                        continue
                    buf = io.BytesIO()
                    frame.to_image().save(buf, format="PNG")
                    out.append((idx, ts, buf.getvalue(), "pyav"))
                    idx += 1
                    next_ts += every_n_seconds
            if not out:
                raise ValueError("no decodable video frames")
            return out

        for pdf in batches:
            rows = {"url": [], "frame_idx": [], "ts_sec": [], "frame": [],
                    "codec": []}
            for url, b in zip(pdf["url"], pdf["payload"]):
                if b is None or len(b) == 0:
                    continue
                data = bytes(b)
                if have_av:
                    try:
                        for idx, ts, png, codec in real_frames(data):
                            rows["url"].append(url)
                            rows["frame_idx"].append(idx)
                            rows["ts_sec"].append(ts)
                            rows["frame"].append(png)
                            rows["codec"].append(codec)
                        continue
                    except Exception:
                        pass  # non-video / corrupt payload -> labelled fake
                for i in range(n_frames):
                    start = (i * len(data)) // n_frames
                    rows["url"].append(url)
                    rows["frame_idx"].append(i)
                    rows["ts_sec"].append(float(i * every_n_seconds))
                    rows["frame"].append(data[start:start + frame_bytes])
                    rows["codec"].append("byte-window-fake")
            yield pd.DataFrame(rows)

    return cols.mapInPandas(run, FRAME_SCHEMA)
