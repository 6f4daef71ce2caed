"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the lakehouse as ``binary`` columns
with a typed metadata struct alongside (modality, byte length, content
hash). The Spark-side machinery — schema, partition-sized Arrow
batches, ``mapInPandas`` signatures — is real and tested; the actual
codec step is stubbed (``NotImplementedError``) or replaced by a
deterministic fake, because no image/audio libraries exist in this
container.

Batch shape: ``mapInPandas`` receives an iterator of Arrow-backed
pandas DataFrames (one stream per partition). Decoders must stream —
never materialize the whole partition — so executor memory stays
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``, not by
partition size. That is the property that survives 100 TB of blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "id long, modality string, n_bytes long, content_md5 string"
)

DECODED_IMAGE_SCHEMA = (
    "id long, n_bytes long, content_md5 string, width int, height int, "
    "n_channels int"
)


def to_media_column(
    df: DataFrame, payload_col: str, id_col: str, modality: str
) -> DataFrame:
    """Wrap an existing column as (id, modality, payload binary) — the
    engine's canonical multimodal row shape. Metadata (length, md5) is
    computed JVM-side; the payload stays opaque."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).alias("id"),
        F.lit(modality).alias("modality"),
        payload.alias("payload"),
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


def decode_image_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB — real codec goes here (PIL / libvips via Arrow batches).

    The deterministic fake derives (width, height, channels) from the
    content hash so tests exercise the full distributed shape: schema
    contract, per-batch vectorized work, null payload handling.
    """
    def fake_dims(payload: bytes | None) -> tuple[int, int, int]:
        if payload is None:
            return (0, 0, 0)
        h = hashlib.md5(payload).digest()
        return (64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 3)

    dims = [fake_dims(p) for p in pdf["payload"]]
    return pd.DataFrame(
        {
            "id": pdf["id"].values,
            "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
            "content_md5": [
                None if p is None else hashlib.md5(p).hexdigest()
                for p in pdf["payload"]
            ],
            "width": [d[0] for d in dims],
            "height": [d[1] for d in dims],
            "n_channels": [d[2] for d in dims],
        }
    )


def decode_images(media: DataFrame) -> DataFrame:
    """Distributed decode via ``mapInPandas`` — streaming batch iterator,
    bounded memory per executor thread."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_image_batch(pdf)

    return media.select("id", "payload").mapInPandas(run, DECODED_IMAGE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB — a real implementation re-encodes payloads per batch.
    Raises until a codec library is provisioned; the signature and
    schema contract are the deliverable here."""
    raise NotImplementedError(
        "image resize requires a codec library (PIL/libvips) not present "
        "in this container; wire it into decode_image_batch-style "
        "mapInPandas when available"
    )


def sample_frames(media: DataFrame, every_n: int) -> DataFrame:
    """STUB — video frame sampling (pyav/ffmpeg) — same contract."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg bindings not present in "
        "this container"
    )
