"""Parity between the JVM higher-order vector path and the
Arrow/pandas_udf path — both must produce the same top-k and (to 1e-9)
the same cosines."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.functions.vectorized import (
    cosine_to_query_pandas,
    knn_brute_force_pandas,
)
from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators.neardup import (
    cosine_similarity,
)
from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators.similarity import (
    knn_brute_force,
)
from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.sources.tables import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings")


def _query_vec(embeddings) -> list[float]:
    row = embeddings.filter(F.col("vec_id") == 0).first()
    return [float(x) for x in row["embedding"]]


def test_cosine_paths_agree(spark, embeddings):
    q = _query_vec(embeddings)
    qlit = F.array(*[F.lit(float(x)) for x in q])
    both = embeddings.select(
        "vec_id",
        cosine_similarity(F.col("embedding"), qlit).alias("jvm"),
        cosine_to_query_pandas(q)(F.col("embedding")).alias("arrow"),
    )
    bad = both.filter(F.abs(F.col("jvm") - F.col("arrow")) > 1e-9).count()
    assert bad == 0


def test_knn_paths_agree(spark, embeddings):
    q = _query_vec(embeddings)
    a = knn_brute_force(embeddings, q, k=15).collect()
    b = knn_brute_force_pandas(embeddings, q, k=15).collect()
    assert [(r["vec_id"], r["cosine"]) for r in a] == [
        (r["vec_id"], r["cosine"]) for r in b
    ]


def test_wav_codec_round_trip_and_poison(spark):
    """The REAL audio codec (r13): stdlib WAV encode -> decode
    round-trips header fields and signal stats exactly; NULL and
    malformed payloads yield NULL rows instead of failing the batch
    (poison blobs must never kill a 100 TB scan)."""
    import math

    from pyspark.sql import Row

    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators import (
        multimodal,
    )

    samples = [0, 1000, -1000, 32767, -32768, 5, -5, 0]
    raw = multimodal.wav_bytes(samples, 8000)
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    df = spark.createDataFrame(
        [Row(id=1, pcm=samples), Row(id=2, pcm=[100] * 16)]
    )
    media = multimodal.encode_wav(df, "pcm", "id", rate=8000)
    metas = {r["id"]: r for r in media.collect()}
    assert metas[1]["n_bytes"] == 44 + 2 * len(samples)
    assert metas[1]["modality"] == "audio/wav"
    got = {r["id"]: r for r in multimodal.decode_wav(media).collect()}
    assert got[1]["sample_rate"] == 8000
    assert got[1]["n_channels"] == 1
    assert got[1]["n_frames"] == len(samples)
    assert got[1]["peak"] == 32768
    want_rms = math.sqrt(sum(s * s for s in samples) / len(samples))
    assert abs(got[1]["rms"] - want_rms) < 1e-9
    assert got[2]["rms"] == 100.0 and got[2]["peak"] == 100
    assert got[2]["duration_ms"] == 2.0
    # poison: truncated/garbage payloads decode to NULLs, not errors
    poison = spark.createDataFrame(
        [Row(id=3, payload=bytearray(b"not a wav")),
         Row(id=4, payload=None)]
    )
    bad = {r["id"]: r for r in multimodal.decode_wav(poison).collect()}
    assert bad[3]["sample_rate"] is None and bad[4]["rms"] is None


def test_image_real_codec_netpbm_bmp_and_nn_resize(spark):
    """The REAL lib-free image branch (r13): netpbm and uncompressed
    BMP decode to their ACTUAL header dims; nearest-neighbor resize
    re-encodes actual pixels (value-checked against the index-map
    formula); compressed/garbage payloads fall back to the
    deterministic fake; resize of non-netpbm yields NULL rows."""
    import hashlib
    import struct

    import numpy as np
    from pyspark.sql import Row

    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators import (
        multimodal,
    )

    # 4x2 P6 with known pixels
    px = np.arange(4 * 2 * 3, dtype=np.uint8)
    ppm = multimodal.ppm_bytes(4, 2, px)
    parsed = multimodal.parse_netpbm(ppm)
    assert parsed[:3] == (4, 2, 3)
    assert np.array_equal(parsed[3].ravel(), px)
    # comment + PGM variant
    pgm = b"P5\n# a comment\n3 2\n255\n" + bytes(range(6))
    assert multimodal.parse_netpbm(pgm)[:3] == (3, 2, 1)
    # minimal uncompressed 24-bit BMP header
    bmp = (
        b"BM"
        + struct.pack("<IHHI", 54 + 12, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, 12, 0, 0, 0, 0)
        + bytes(12)
    )
    assert multimodal.parse_bmp_header(bmp) == (2, 2, 3)

    media = spark.createDataFrame(
        [
            Row(id=1, payload=bytearray(ppm)),
            Row(id=2, payload=bytearray(bmp)),
            Row(id=3, payload=bytearray(b"\x89PNG garbage")),
            Row(id=4, payload=None),
        ]
    )
    got = {r["id"]: r for r in multimodal.decode_images_real(media).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (
        4, 2, 3,
    )
    assert (got[2]["width"], got[2]["height"], got[2]["n_channels"]) == (
        2, 2, 3,
    )
    # non-parseable payloads take the deterministic fake's dims
    h = hashlib.md5(b"\x89PNG garbage").digest()
    assert got[3]["width"] == 64 + h[0] % 192
    assert got[4]["width"] == 0 and got[4]["content_md5"] is None

    # NN resize: 4x2 -> 2x1 picks rows [0], cols [0, 2] exactly
    rz = {r["id"]: r for r in
          multimodal.resize_images_nn(media, 2, 1).collect()}
    want_px = px.reshape(2, 4, 3)[[0]][:, [0, 2]]
    want_payload = b"P6\n2 1\n255\n" + want_px.tobytes()
    assert rz[1]["n_bytes"] == len(want_payload)
    assert rz[1]["resized_md5"] == hashlib.md5(want_payload).hexdigest()
    # non-netpbm payloads are poison for the REAL resize: NULL row
    assert rz[2]["n_bytes"] is None and rz[3]["resized_md5"] is None

    # encoder round-trip through the distributed path
    df = spark.createDataFrame(
        [Row(id=7, rgb=[int(v) for v in px], w=4, h=2)]
    )
    enc = multimodal.encode_ppm(df, "rgb", "w", "h", "id")
    [m] = enc.collect()
    assert bytes(m["payload"]) == ppm and m["n_bytes"] == len(ppm)


def test_y4m_video_codec_round_trip_and_sampling(spark):
    """The REAL lib-free video branch (r13): y4m encode -> parse
    round-trips actual frames; sample_frames_y4m extracts every Nth
    REAL frame with exact luma means; poison payloads contribute no
    rows."""
    import hashlib

    import numpy as np
    from pyspark.sql import Row

    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators import (
        multimodal,
    )

    w, h, n = 4, 3, 5
    luma = np.arange(n * w * h, dtype=np.uint8)
    raw = multimodal.y4m_bytes(w, h, luma)
    assert raw.startswith(b"YUV4MPEG2 W4 H3 ")
    pw, ph, frames = multimodal.parse_y4m(raw)
    assert (pw, ph, len(frames)) == (w, h, n)
    assert np.array_equal(frames[2].ravel(), luma[2 * 12 : 3 * 12])

    df = spark.createDataFrame(
        [Row(id=1, y=[int(v) for v in luma]),
         Row(id=2, y=[255] * 12)]
    )
    media = multimodal.encode_y4m(df, "y", w, h, "id")
    metas = {r["id"]: r for r in media.collect()}
    header = len(b"YUV4MPEG2 W4 H3 F25:1 Ip A1:1 C444\n")
    assert metas[1]["n_bytes"] == header + n * (6 + 3 * 12)
    got = [
        (r["id"], r["frame_idx"], r["width"], r["height"], r["y_mean"],
         r["frame_md5"])
        for r in multimodal.sample_frames_y4m(media, 2)
        .orderBy("id", "frame_idx").collect()
    ]
    # id=1: frames 0,2,4 of 5; id=2: frame 0 of 1
    assert [(g[0], g[1]) for g in got] == [
        (1, 0), (1, 2), (1, 4), (2, 0),
    ]
    assert got[1][4] == float(np.mean(luma[24:36]))
    assert got[1][5] == hashlib.md5(luma[24:36].tobytes()).hexdigest()
    assert got[3][4] == 255.0
    # poison: garbage and NULL payloads yield zero rows, no failure
    poison = spark.createDataFrame(
        [Row(id=3, payload=bytearray(b"YUV4MPEG2 W4 H3 C444\nFRAME\nxx")),
         Row(id=4, payload=bytearray(b"mp4 garbage")),
         Row(id=5, payload=None)]
    )
    assert multimodal.sample_frames_y4m(poison, 1).count() == 0
