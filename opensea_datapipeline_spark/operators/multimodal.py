"""Multimodal column handling — image/audio/video as opaque binary columns
with typed metadata (LLM-data-pipeline extension mandated by BASELINE.json;
the reference's closest analog is its image-embedding ingestion,
`scripts/embeddings/generate_clip_embeddings.py:28-91`).

Conventions:

- A media asset is ``(asset_id LONG, media BINARY, media_type STRING,
  meta STRUCT<...>)``. The binary payload is opaque to the engine; all
  engine-side ops are metadata extraction, chunking/frame-sampling, and
  batched feature extraction over Arrow.
- Real decoders (PIL / libav) are NOT in this container: ``decode_media``
  is a clearly-marked stub behind an import-try. The Spark-side plumbing —
  schema, partitioning, ``mapInPandas`` batch shape — is real and tested
  with ``byte_histogram_features`` as the deterministic stand-in
  featurizer.
- Payload columns are heavy: every op here projects the binary column
  late and never shuffles it unless the result requires it (metadata ops
  reduce to scalars *before* any groupBy).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8  # byte-histogram buckets (256 / 32)


def attach_binary_payload(
    df: DataFrame, source_col: str, out_col: str = "media",
    media_type: str = "text/plain",
) -> DataFrame:
    """Materialize an opaque binary payload column. In production this is
    the raw image/audio bytes read by ``spark.read.format('binaryFile')``;
    the testdata stand-in encodes an existing string column — the
    downstream plumbing is identical either way."""
    return df.withColumn(out_col, F.encode(F.col(source_col), "UTF-8")).withColumn(
        "media_type", F.lit(media_type)
    )


def binary_metadata(
    df: DataFrame, bin_col: str = "media", id_col: str = "asset_id"
) -> DataFrame:
    """Typed metadata over the opaque payload: byte length, content digest,
    magic-prefix hex. All JVM built-ins — no payload leaves the executor,
    no Python boundary."""
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(bin_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(bin_col)).alias("content_md5"),
        F.lower(F.hex(F.substring(F.col(bin_col), 1, 4))).alias("magic_hex"),
        "media_type",
    )


def frame_sample(
    df: DataFrame,
    bin_col: str = "media",
    id_col: str = "asset_id",
    frame_bytes: int = 64,
    stride: int = 2,
) -> DataFrame:
    """Frame/chunk sampling for a video/audio-like payload: split the byte
    stream into fixed-size frames, keep every ``stride``-th. Pure built-ins
    (sequence + transform + posexplode) — rows fan out on the executors,
    never through the driver."""
    n_frames = F.ceil(F.octet_length(F.col(bin_col)) / F.lit(frame_bytes))
    frames = F.transform(
        F.sequence(F.lit(0), n_frames.cast("int") - 1),
        lambda i: F.substring(
            F.col(bin_col), i * F.lit(frame_bytes) + 1, F.lit(frame_bytes)
        ),
    )
    return (
        df.select(F.col(id_col), F.posexplode(frames).alias("frame_idx", "frame"))
        .filter(F.col("frame_idx") % stride == 0)
        .select(
            id_col,
            F.col("frame_idx").cast("long").alias("frame_idx"),
            F.octet_length("frame").cast("long").alias("frame_len"),
            F.lower(F.hex(F.substring(F.col("frame"), 1, 8))).alias("frame_prefix_hex"),
        )
    )


def byte_histogram_features(
    df: DataFrame, bin_col: str = "media", id_col: str = "asset_id",
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """Deterministic stand-in featurizer: normalized ``dim``-bucket byte
    histogram per asset, computed in Arrow batches via ``mapInPandas``.

    This is the exact seam a real encoder (CLIP / wav2vec / a
    ``predict_batch_udf`` model) plugs into: binary column in → fixed-dim
    ``array<double>`` out, one Arrow batch per partition chunk, zero
    driver involvement. Swap the numpy body for model inference and the
    plan is unchanged.
    """
    import numpy as np
    import pandas as pd

    bucket = 256 // dim
    schema = f"{id_col} long, feature array<double>"

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[bin_col]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr // bucket, minlength=dim).astype("float64")
                total = hist.sum()
                feats.append((hist / total if total else hist).round(6).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "feature": feats})

    return df.select(id_col, bin_col).mapInPandas(featurize, schema=schema)


def decode_media(
    df: DataFrame, bin_col: str = "media", id_col: str = "asset_id"
) -> DataFrame:
    """STUB: real image decode (PIL) / audio decode (libav) — the decoder
    libraries are not installed in this container. The mapInPandas
    signature and output schema are the production shape; calling it
    without PIL raises NotImplementedError (import-gated)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "media decoding requires pillow/libav, not present in this "
            "environment; use byte_histogram_features for the plumbing path"
        ) from exc

    import io
    from collections.abc import Iterator as It

    import pandas as pd
    import PIL.Image as Image

    schema = f"{id_col} long, width long, height long, mode string"

    def decode(batches: It[pd.DataFrame]) -> It[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[bin_col]):
                img = Image.open(io.BytesIO(payload))
                rows.append((aid, img.width, img.height, img.mode))
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "mode"])

    return df.select(id_col, bin_col).mapInPandas(decode, schema=schema)
