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


def test_png_codec_round_trip_all_filters_and_poison(spark):
    """The REAL lib-free PNG branch (r14): stdlib zlib inflate +
    per-scanline unfiltering. Round-trips all five filter types and
    all three supported color types; the encoder's filtered scanlines
    are cross-checked against an INDEPENDENT per-pixel reference
    implementation straight from RFC 2083 §6 (so a symmetric
    encoder/decoder bug can't hide behind the round-trip); poison
    payloads (truncated, CRC-corrupted, 16-bit, interlaced) raise or
    fall back per the decoder contract."""
    import struct
    import zlib

    import numpy as np
    from pyspark.sql import Row

    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators import (
        multimodal,
    )

    def ref_filter(px, h, w, ch, ft):
        # independent scalar reference: RFC 2083 §6.2-6.6 verbatim
        stride = w * ch
        prev = [0] * stride
        out = []
        for y in range(h):
            cur = [int(v) for v in px[y * stride : (y + 1) * stride]]
            out.append(ft)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if ft == 0:
                    f = cur[x]
                elif ft == 1:
                    f = (cur[x] - a) % 256
                elif ft == 2:
                    f = (cur[x] - b) % 256
                elif ft == 3:
                    f = (cur[x] - (a + b) // 2) % 256
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c
                    )
                    f = (cur[x] - pr) % 256
                out.append(f)
            prev = cur
        return bytes(out)

    def idat_raw(payload):
        pos, idat = 8, []
        while pos + 12 <= len(payload):
            (ln,) = struct.unpack_from(">I", payload, pos)
            tag = payload[pos + 4 : pos + 8]
            if tag == b"IDAT":
                idat.append(payload[pos + 8 : pos + 8 + ln])
            pos += 12 + ln
        return zlib.decompress(b"".join(idat))

    rng = np.random.RandomState(41)
    for ch in (1, 3, 4):
        for ft in range(5):
            w, h = 5, 4
            px = rng.randint(0, 256, size=h * w * ch).astype(np.uint8)
            b = multimodal.png_bytes(w, h, px, channels=ch, filter_type=ft)
            # encoder scanlines == the independent reference
            assert idat_raw(b) == ref_filter(px, h, w, ch, ft), (ch, ft)
            # decode round-trip
            W, H, C, arr = multimodal.parse_png(b)
            assert (W, H, C) == (w, h, ch)
            assert np.array_equal(arr.ravel(), px), (ch, ft)

    # not-a-PNG -> None (falls to the other branches / the fake)
    assert multimodal.parse_png(b"P6\n1 1\n255\nabc") is None
    good = multimodal.png_bytes(5, 4, np.arange(60) % 256, channels=3,
                                filter_type=4)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        multimodal.parse_png(good[:25])  # truncated chunk
    bad = bytearray(good)
    bad[40] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        multimodal.parse_png(bytes(bad))

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    for depth, color, inter in ((16, 0, 0), (8, 3, 0), (8, 0, 1)):
        hdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, inter)
        p = (multimodal._PNG_MAGIC + chunk(b"IHDR", hdr)
             + chunk(b"IDAT", zlib.compress(b"\0" * 10))
             + chunk(b"IEND", b""))
        with _pytest.raises(ValueError, match="unsupported PNG"):
            multimodal.parse_png(p)

    # distributed path: encode_png -> image_pixel_stats, filter varies
    # per row; poison rows yield NULL stats; real dims via
    # decode_images_real's PNG branch
    rows = []
    want = {}
    for i, (ch, ft) in enumerate([(1, 0), (3, 1), (4, 2), (3, 3), (1, 4)]):
        w, h = 4 + i, 3
        px = rng.randint(0, 256, size=h * w * ch)
        rows.append(Row(id=i, px=[int(v) for v in px], w=w, h=h,
                        ch=ch, ft=ft))
        want[i] = (w, h, ch, int(px.sum()), int(px.min()), int(px.max()))
    df = spark.createDataFrame(rows)
    media = multimodal.encode_png(df, "px", "w", "h", "ch", "id",
                                  filter_col="ft")
    got = {r["id"]: r for r in
           multimodal.image_pixel_stats(media).collect()}
    for i, (w, h, ch, s, lo, hi) in want.items():
        g = got[i]
        assert (g["width"], g["height"], g["n_channels"]) == (w, h, ch)
        assert (g["px_sum"], g["px_min"], g["px_max"]) == (s, lo, hi), i
    poison = spark.createDataFrame(
        [Row(id=10, payload=bytearray(b"\x89PNG garbage")),
         Row(id=11, payload=None)]
    )
    pg = {r["id"]: r for r in
          multimodal.image_pixel_stats(poison).collect()}
    assert pg[10]["px_sum"] is None and pg[11]["width"] is None
    dec = {r["id"]: r for r in
           multimodal.decode_images_real(media).collect()}
    assert (dec[3]["width"], dec[3]["height"], dec[3]["n_channels"]) == (
        7, 3, 3,
    )


def test_gif_codec_lzw_palette_interlace_and_poison(spark):
    """The REAL lib-free GIF branch (r14): full variable-width LZW
    (LSB-first bit packing, dict growth, clear resets), palette
    mapping, four-pass interlace. The decoder is pinned against a
    HAND-PACKED stream exercising the KwKwK case the literal-only
    encoder can never emit (so the codec halves share no logic);
    round-trips cover width growth + clear resets + interlace;
    poison payloads raise or fall back per the decoder contract."""
    import struct

    import numpy as np
    import pytest as _pytest
    from pyspark.sql import Row

    from pulselake_a_lakehouse_based_fitbit_data_analysis_system_spark.operators import (
        multimodal,
    )

    # -- hand-packed KwKwK stream: min_code=2, codes [CLEAR=4, 1, 6,
    # END=5] at width 3, LSB-first -> bytes 0x8C 0x0B; code 6 == next
    # table index forces entry = prev + prev[0] = "11", total raster
    # [1, 1, 1]
    pal = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]
    payload = (
        b"GIF87a"
        + struct.pack("<HHBBB", 3, 1, 0x80 | 1, 0, 0)
        + b"".join(bytes(c) for c in pal)
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 1, 0)
        + bytes([2])            # LZW min code size
        + bytes([2, 0x8C, 0x0B])  # one 2-byte sub-block
        + b"\x00\x3b"
    )
    w, h, c, arr = multimodal.parse_gif(payload)
    assert (w, h, c) == (3, 1, 3)
    assert np.array_equal(arr, np.array([[pal[1]] * 3], dtype=np.uint8))

    # -- round-trips: interlace x sizes x palette widths; width
    # growth + clear resets on the big one
    rng = np.random.RandomState(11)
    pal16 = [((i * 37) % 256, (i * 59) % 256, (i * 83) % 256)
             for i in range(16)]
    for il in (False, True):
        for (w, h) in [(1, 1), (3, 5), (13, 9), (40, 17)]:
            idx = rng.randint(0, 16, size=w * h)
            b = multimodal.gif_bytes(w, h, idx, pal16, interlace=il)
            W, H, C, arr = multimodal.parse_gif(b)
            assert (W, H, C) == (w, h, 3)
            want = np.array(pal16, dtype=np.uint8)[idx.reshape(h, w)]
            assert np.array_equal(arr, want), (w, h, il)
    big = rng.randint(0, 256, size=120 * 90)
    pal256 = [(i, 255 - i, (i * 7) % 256) for i in range(256)]
    b = multimodal.gif_bytes(120, 90, big, pal256)
    assert np.array_equal(
        multimodal.parse_gif(b)[3],
        np.array(pal256, dtype=np.uint8)[big.reshape(90, 120)],
    )

    # -- poison: not-gif -> None; truncation/corruption raise
    assert multimodal.parse_gif(b"\x89PNG\r\n\x1a\n junk") is None
    with _pytest.raises(ValueError):
        multimodal.parse_gif(b[:40])
    corrupt = bytearray(multimodal.gif_bytes(4, 4, rng.randint(0, 16, 16),
                                             pal16))
    corrupt[-8] ^= 0xFF  # flip a byte inside the LZW stream
    with _pytest.raises(ValueError):
        multimodal.parse_gif(bytes(corrupt))

    # -- distributed path: encode_gif -> image_pixel_stats, interlace
    # varying per row; decode_images_real picks up the GIF branch
    rows, want = [], {}
    for i in range(4):
        w, h = 3 + i, 2 + (i % 3)
        idx = rng.randint(0, 16, size=w * h)
        rgb = np.array(pal16, dtype=np.uint8)[idx].astype(np.int64)
        rows.append(Row(id=i, idx=[int(v) for v in idx], w=w, h=h,
                        pal=[int(v) for t in pal16 for v in t],
                        il=bool(i % 2)))
        want[i] = (w, h, int(rgb.sum()), int(rgb.min()), int(rgb.max()))
    df = spark.createDataFrame(rows)
    media = multimodal.encode_gif(df, "idx", "w", "h", "pal", "id",
                                  interlace_col="il")
    got = {r["id"]: r for r in
           multimodal.image_pixel_stats(media).collect()}
    for i, (w, h, s, lo, hi) in want.items():
        g = got[i]
        assert (g["width"], g["height"], g["n_channels"]) == (w, h, 3)
        assert (g["px_sum"], g["px_min"], g["px_max"]) == (s, lo, hi), i
    dec = {r["id"]: r for r in
           multimodal.decode_images_real(media).collect()}
    assert (dec[2]["width"], dec[2]["height"], dec[2]["n_channels"]) == (
        5, 4, 3,
    )
