"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the lakehouse as ``binary`` columns
with a typed metadata struct alongside (modality, byte length, content
hash). The Spark-side machinery — schema, partition-sized Arrow
batches, ``mapInPandas`` signatures — is real and tested. The IMAGE
and VIDEO codec steps are stubbed (``NotImplementedError``) or
replaced by a deterministic fake, because no image libraries exist in
this container; the AUDIO path (``encode_wav``/``decode_wav``) is a
REAL codec — stdlib ``wave``/``struct`` PCM WAV, r13 — so its header
fields and signal stats come from actual bytes, driver-checked against
a relational oracle.

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


RESIZED_SCHEMA = (
    "id long, width int, height int, n_bytes long, resized_md5 string"
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize via ``mapInPandas`` — 1→1 row shape, bounded Arrow batches.

    CODEC STUB: the re-encode is a deterministic fake (the "resized"
    payload is the md5 hex of the original — 32 bytes), so the
    distributed plumbing (schema contract, per-batch work, new content
    hash downstream systems key on) is real and oracle-checkable. A
    real codec (PIL/libvips, absent in this container) replaces only
    the body of ``fake_resize``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_resize(payload: bytes) -> bytes:
            return hashlib.md5(payload).hexdigest().encode()

        for pdf in batches:
            resized = [
                None if p is None else fake_resize(p) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "width": width,
                    "height": height,
                    "n_bytes": [0 if r is None else len(r) for r in resized],
                    "resized_md5": [
                        None if r is None else hashlib.md5(r).hexdigest()
                        for r in resized
                    ],
                }
            )

    return media.select("id", "payload").mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = "id long, frame_idx int, frame_md5 string"


def sample_frames(media: DataFrame, every_n: int) -> DataFrame:
    """Video frame sampling via ``mapInPandas`` — the 1→N row-expansion
    shape (one output row per sampled frame), still streaming batch by
    batch so a long video cannot blow out executor memory.

    CODEC STUB: frame count and per-frame hashes are md5-derived fakes
    (ffmpeg bindings absent); the expansion plumbing, schema, and
    deterministic frame identity are real.
    """
    # Validate at plan-build time: a bad step would otherwise surface
    # as an opaque Python-worker failure inside executors mid-job.
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                if payload is None:
                    continue
                digest = hashlib.md5(payload)
                n_frames = 1 + digest.digest()[0] % 16
                for fi in range(0, n_frames, every_n):
                    ids.append(i)
                    idxs.append(fi)
                    hashes.append(
                        hashlib.md5(
                            f"{digest.hexdigest()}:{fi}".encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "frame_md5": hashes}
            )

    return media.select("id", "payload").mapInPandas(run, FRAME_SCHEMA)


FEATURE_SCHEMA = "id long, dim int, value double"


def extract_features(media: DataFrame, n_dims: int = 8) -> DataFrame:
    """Feature extraction via ``mapInPandas`` — payload → ``n_dims``
    feature values, emitted exploded as (id, dim, value) so every
    value is oracle-checkable at top level (the array<float> form is
    ``F.collect_list`` away, and the embeddings table covers the
    array-typed similarity path).

    CODEC STUB: features are md5 digest bytes scaled to [0,1] — a real
    model (CLIP et al.) replaces only the per-payload function; the
    Arrow batch shape and explode are what survive scale.
    """
    # md5 digests are 16 bytes — validate here, not as an executor-side
    # IndexError halfway through a job.
    if not 1 <= n_dims <= 16:
        raise ValueError(f"n_dims must be in [1, 16], got {n_dims}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, dims, vals = [], [], []
            for i, payload in zip(pdf["id"], pdf["payload"]):
                if payload is None:
                    continue
                digest = hashlib.md5(payload).digest()
                for d in range(n_dims):
                    ids.append(i)
                    dims.append(d)
                    vals.append(round(digest[d] / 255.0, 6))
            yield pd.DataFrame({"id": ids, "dim": dims, "value": vals})

    return media.select("id", "payload").mapInPandas(run, FEATURE_SCHEMA)


# --- audio: a REAL codec (stdlib wave/struct — no external libs) ----------

WAV_DECODED_SCHEMA = (
    "id long, sample_rate int, n_channels int, n_frames long, "
    "duration_ms double, rms double, peak int"
)


def wav_bytes(samples, rate: int) -> bytes:
    """Encode a 1-D int16 sample array as a canonical 44-byte-header
    PCM WAV — pure stdlib ``struct``. This is a REAL codec, not a
    stub: the payload round-trips through any WAV reader."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    n = len(data)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", n)
        + data
    )


def encode_wav(df: DataFrame, pcm_col: str, id_col: str,
               rate: int = 16000) -> DataFrame:
    """array<int> PCM -> (id, modality, payload binary, ...) media rows
    via a streaming ``mapInPandas`` encoder (bounded Arrow batches,
    the same executor-memory contract as the image path)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                None if s is None else wav_bytes(s, rate)
                for s in pdf[pcm_col]
            ]
            yield pd.DataFrame(
                {"id": pdf[id_col].values, "payload": payloads}
            )

    out = df.select(F.col(id_col).alias(id_col), pcm_col).mapInPandas(
        run, "id long, payload binary"
    )
    return out.select(
        "id",
        F.lit("audio/wav").alias("modality"),
        "payload",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
    )


def decode_wav_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """REAL decode — stdlib ``wave`` over the binary payload: header
    fields (rate, channels, frames) come from the RIFF header, the
    signal stats (rms, peak) from the PCM frames themselves. NULL or
    malformed payloads yield a NULL-ish row instead of failing the
    batch (poison blobs must never kill a 100 TB scan)."""
    import io
    import wave

    import numpy as np

    rows = {
        "id": pdf["id"].values,
        "sample_rate": [],
        "n_channels": [],
        "n_frames": [],
        "duration_ms": [],
        "rms": [],
        "peak": [],
    }
    for p in pdf["payload"]:
        try:
            with wave.open(io.BytesIO(bytes(p))) as w:
                rate = w.getframerate()
                nch = w.getnchannels()
                nfr = w.getnframes()
                raw = w.readframes(nfr)
            x = np.frombuffer(raw, dtype="<i2").astype("float64")
            rows["sample_rate"].append(rate)
            rows["n_channels"].append(nch)
            rows["n_frames"].append(nfr)
            rows["duration_ms"].append(1000.0 * nfr / rate)
            rows["rms"].append(
                float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
            )
            rows["peak"].append(int(np.max(np.abs(x))) if len(x) else 0)
        except Exception:
            rows["sample_rate"].append(None)
            rows["n_channels"].append(None)
            rows["n_frames"].append(None)
            rows["duration_ms"].append(None)
            rows["rms"].append(None)
            rows["peak"].append(None)
    return pd.DataFrame(rows)


def decode_wav(media: DataFrame) -> DataFrame:
    """Distributed WAV decode via ``mapInPandas`` — same streaming
    batch-iterator shape as ``decode_images``, but with a REAL codec
    (stdlib ``wave``): no external dependency, so nothing here is
    faked."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_wav_batch(pdf)

    return media.select("id", "payload").mapInPandas(
        run, WAV_DECODED_SCHEMA
    )
