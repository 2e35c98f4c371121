"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are carried as `binary` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` — the same executor
pattern as HTML extraction, so the partitioning/skew story is shared.

The actual codec step (image decode / resample / frame-sample) needs
libraries not present in this container; it is stubbed behind
``decode_media`` which raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case a seed-stable fake feature
vector is derived from the bytes (sha256-based) — the Spark-side plumbing
(schema, batch shape, UDF signature, partitioning) is fully real and
tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURE_DIM = 16

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
        StructField("status", StringType()),
    ]
)


def decode_media(
    data: bytes, media_type: str, deterministic_fake: bool = False
) -> dict:
    """Decode one media payload → metadata + feature vector.

    Real decode requires PIL/ffmpeg/torchaudio — NOT available here; the
    deterministic fake derives every field from sha256(bytes) so tests and
    the Spark plumbing are fully exercised with stable values.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not available in this environment; "
            "pass deterministic_fake=True to exercise the pipeline plumbing"
        )
    digest = hashlib.sha256(data).digest()
    arr = np.frombuffer(digest[:MEDIA_FEATURE_DIM], dtype=np.uint8)
    features = (arr.astype(np.float32) / 255.0).tolist()
    return {
        "media_type": media_type,
        "n_bytes": len(data),
        "content_hash": digest.hex()[:16],
        "width": int(digest[0]) * 4 + 64,
        "height": int(digest[1]) * 4 + 64,
        "features": features,
        "status": "ok:fake-decode",
    }


def media_features(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """mapInPandas stage over (media_id, media_type, payload:binary).

    Batch shape mirrors the extraction stage: iterator API, bounded Arrow
    batches, per-row error isolation."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            out = {k.name: [] for k in MEDIA_SCHEMA.fields}
            # the select below renames id_col → media_id before the UDF
            # runs; reading pdf[id_col] here raised KeyError for any
            # non-default id column (r3 review)
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                try:
                    d = decode_media(
                        bytes(payload) if payload is not None else b"",
                        str(mtype),
                        deterministic_fake=True,
                    )
                except Exception as e:  # noqa: BLE001
                    d = {
                        "media_type": str(mtype),
                        "n_bytes": 0,
                        "content_hash": "",
                        "width": 0,
                        "height": 0,
                        "features": [],
                        "status": f"error:{type(e).__name__}",
                    }
                out["media_id"].append(None if mid is None else str(mid))
                for k in (
                    "media_type",
                    "n_bytes",
                    "content_hash",
                    "width",
                    "height",
                    "features",
                    "status",
                ):
                    out[k].append(d[k])
            yield pd.DataFrame(out)

    from ..plans.pipeline import ensure_pyfiles

    ensure_pyfiles(media.sparkSession)
    cols = media.select(
        media[id_col].cast("string").alias("media_id"),
        "media_type",
        "payload",
    )
    return cols.mapInPandas(batches, schema=MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_id, n_frames) into frame
    indices JVM-side (no Python) — the decode of each frame would be the
    stubbed codec step."""
    from pyspark.sql import functions as F

    # sequence(0, -1, n) THROWS on illegal boundaries — a single
    # zero-frame row would abort the whole job (r3 review); an empty array
    # explodes to no rows, exactly what SQL generate_series yields
    idxs = F.when(
        F.col("n_frames") >= 1,
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)),
    ).otherwise(F.array().cast("array<int>"))
    return media.select("media_id", F.explode(idxs).alias("frame_idx"))


def resize_plan(
    media: DataFrame, max_side: int = 256, id_col: str = "media_id"
) -> DataFrame:
    """Image resize *plan*: aspect-preserving fit of (width, height) into a
    max_side box, computed JVM-side from the typed metadata — the actual
    pixel resample is the stubbed codec step.  Downscale only (scale capped
    at 1.0, the training-pipeline convention); integer dims via
    round-half-up (floor(x + 0.5) — engine-agnostic, unlike CAST which
    rounds in DuckDB and truncates in Spark), floored at 1.  Half-up, not
    truncation: w·(max_side/w) lands at max_side − ε in doubles for ~11%
    of widths, and truncating violated the fit-to-max_side contract by one
    pixel (r3 review).

    Scale: pure narrow projection — no shuffle, no Python."""
    from pyspark.sql import functions as F

    w, h = F.col("width").cast("double"), F.col("height").cast("double")
    scale = F.least(
        F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h)
    )
    return media.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col("width").cast("int").alias("src_w"),
        F.col("height").cast("int").alias("src_h"),
        F.greatest(F.lit(1), F.floor(w * scale + 0.5).cast("int")).alias("dst_w"),
        F.greatest(F.lit(1), F.floor(h * scale + 0.5).cast("int")).alias("dst_h"),
        F.round(scale, 6).alias("scale"),
    )
