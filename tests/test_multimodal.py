"""Real media decode: pure codec round-trips + the Spark decode path.

Covers VERDICT r2 ask #1 — the BMP/WAV struct codecs behind
``decode_media`` (operators/multimodal.py), exercised both as pure
byte functions (no Spark) and end-to-end through mapInPandas.
"""

from __future__ import annotations

import struct

import pytest

from knn_using_hadoop_spark.operators import multimodal as mm


# ------------------------------------------------------------------ pure BMP


def test_bmp_roundtrip_aligned():
    pixels = bytes(range(16)) * 16  # 16x16
    blob = mm.bmp_encode(pixels, 16, 16)
    assert blob[:2] == b"BM"
    w, h, out = mm.bmp_decode(blob)
    assert (w, h) == (16, 16)
    assert out == pixels


def test_bmp_roundtrip_unaligned_rows():
    # width 5 -> row stride padded to 8; padding must not leak back.
    pixels = bytes(range(5 * 3))
    blob = mm.bmp_encode(pixels, 5, 3)
    w, h, out = mm.bmp_decode(blob)
    assert (w, h) == (5, 3)
    assert out == pixels


def test_bmp_row_order_is_bottom_up_on_disk():
    # Top row of the image must be the LAST stored row in the file.
    pixels = bytes([1] * 4 + [2] * 4)  # 4x2: row0=1s, row1=2s
    blob = mm.bmp_encode(pixels, 4, 2)
    offset = struct.unpack_from("<I", blob, 10)[0]
    assert blob[offset : offset + 4] == bytes([2] * 4)  # stored first
    assert mm.bmp_decode(blob)[2] == pixels  # decode restores top-down


def test_bmp_decode_top_down_negative_height():
    # Third-party BMPs may store top-down rasters (negative height).
    pixels = bytes([1] * 4 + [2] * 4)
    blob = bytearray(mm.bmp_encode(pixels, 4, 2))
    struct.pack_into("<i", blob, 22, -2)  # flip height sign
    offset = struct.unpack_from("<I", blob, 10)[0]
    raster = bytes([1] * 4 + [2] * 4)  # top-down storage
    blob[offset : offset + 8] = raster
    w, h, out = mm.bmp_decode(bytes(blob))
    assert (w, h, out) == (4, 2, pixels)


def test_bmp_rejects_wrong_magic_and_bpp():
    with pytest.raises(ValueError, match="not a BMP"):
        mm.bmp_decode(b"PNG" + b"\x00" * 60)
    blob = bytearray(mm.bmp_encode(b"\x00" * 4, 2, 2))
    struct.pack_into("<H", blob, 28, 24)  # claim 24bpp
    with pytest.raises(ValueError, match="unsupported BMP"):
        mm.bmp_decode(bytes(blob))


# ------------------------------------------------------------------ pure WAV


def test_wav_roundtrip():
    samples = [0, 1, -1, 32767, -32768, 12345]
    blob = mm.wav_encode(samples, 8000)
    channels, rate, out = mm.wav_decode(blob)
    assert (channels, rate, out) == (1, 8000, samples)


def test_wav_chunk_walk_skips_unknown_chunks():
    # Insert a LIST chunk (odd-sized, word-padded) before data: the
    # decoder must walk past it, not assume fixed offsets.
    samples = [100, -200, 300]
    blob = mm.wav_encode(samples, 8000)
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"  # pad
    patched = blob[:fmt_end] + extra + blob[fmt_end:]
    assert mm.wav_decode(patched)[2] == samples


def test_wav_rejects_non_riff_and_non_pcm():
    with pytest.raises(ValueError, match="not a WAV"):
        mm.wav_decode(b"OggS" + b"\x00" * 40)
    blob = bytearray(mm.wav_encode([1, 2], 8000))
    struct.pack_into("<H", blob, 20, 3)  # IEEE-float format tag
    with pytest.raises(ValueError, match="unsupported WAV"):
        mm.wav_decode(bytes(blob))


# ------------------------------------------------------- Spark decode path


def test_decode_media_stats_match_python(spark, sf_dir):
    from knn_using_hadoop_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir)
    rows = {
        r.doc_id: r
        for r in mm.decode_media(mm.attach_media(docs)).collect()
    }
    for d in docs.orderBy("doc_id").limit(6).collect():
        raw = d.text.encode()
        r = rows[d.doc_id]
        if d.doc_id % 2 == 0:
            h = min(max(len(raw) // 16, 1), 32)
            units = list(raw[: 16 * h].ljust(16 * h, b"\x00"))
            assert (r.kind, r.width, r.height) == ("image", 16, h)
            assert r.sample_rate is None
        else:
            n = min(max(len(raw), 1), 512)
            units = [(b - 128) * 256 for b in raw[:n].ljust(n, b"\x00")]
            assert (r.kind, r.channels, r.sample_rate) == ("audio", 1, 8000)
            assert r.width is None and r.height is None
        assert r.n_units == len(units)
        assert r.unit_sum == sum(units)
        assert r.unit_min == min(units)
        assert r.unit_max == max(units)
        assert r.mean_unit == sum(units) / len(units)


def test_decode_media_plan_is_mapinpandas_only(spark, sf_dir):
    from knn_using_hadoop_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir)
    plan = (
        mm.decode_media(mm.attach_media(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 2  # encode + decode stages
    assert "BatchEvalPython" not in plan  # no row-wise Python
    assert "Exchange" not in plan  # embarrassingly parallel


def test_decode_media_rejects_unknown_container(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"GIF89a....."))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="unrecognized media container"):
        mm.decode_media(df).collect()


def test_media_features_image_resize(spark):
    """Nearest-neighbor 8x8 resize picks exact source pixels."""
    from knn_using_hadoop_spark.operators.multimodal import (
        bmp_encode,
        media_features,
    )

    # 16x16 image whose pixel value encodes its (row, col): v = r*16+c
    w = h = 16
    pixels = bytes((r * w + c) % 256 for r in range(h) for c in range(w))
    df = spark.createDataFrame(
        [(2, bmp_encode(pixels, w, h))], "doc_id long, payload binary"
    )
    (row,) = media_features(df).collect()
    assert row.kind == "image" and len(row.feature) == 64
    # feature[k] = pixel at src_row=(k//8 * 16)//8 = 2*(k//8),
    # src_col=2*(k%8)
    for k in (0, 7, 8, 35, 63):
        r, c = 2 * (k // 8), 2 * (k % 8)
        assert row.feature[k] == float(r * w + c)


def test_media_features_audio_rms(spark):
    """Per-frame RMS: silence frame -> 0, constant frame -> |s|."""
    from knn_using_hadoop_spark.operators.multimodal import (
        media_features,
        wav_encode,
    )

    samples = [0] * 64 + [1000] * 64 + [-500] * 32  # 2.5 frames
    df = spark.createDataFrame(
        [(3, wav_encode(samples))], "doc_id long, payload binary"
    )
    (row,) = media_features(df).collect()
    assert row.kind == "audio"
    assert row.feature == [0.0, 1000.0, 500.0]


def test_media_features_oracle_parity_hostile_docs(spark, tmp_path):
    """ADVICE r3 #2: the byte-arithmetic oracle must agree with the
    codec-path operator on short (< 16 byte) and non-ASCII documents,
    not just the benign gate corpus — bs comes from UTF-8 octets with
    zero-pad semantics on out-of-range indexes."""
    import duckdb

    from knn_using_hadoop_spark.contract.round3 import _MEDIA_FEAT_SQL
    from knn_using_hadoop_spark.operators.multimodal import (
        attach_media,
        media_features,
    )

    rows = [
        (0, "tiny"),            # image, len < 16 -> zero-padded row
        (1, ""),                # audio, len 0 -> single zero sample
        (2, "héllo wörld ✓"),   # image, multi-byte UTF-8
        (3, "ünïcode àudio"),   # audio, multi-byte UTF-8
        (4, "x" * 40),          # image, h > 1
        (5, "y" * 700),         # audio, capped at 512 samples
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "documents.parquet")
    docs.write.parquet(p)

    got = sorted(
        (r.doc_id, r.kind, tuple(r.feature))
        for r in media_features(attach_media(docs)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'"
    )
    want = sorted(
        (d, k, tuple(f)) for d, k, f in con.sql(_MEDIA_FEAT_SQL).fetchall()
    )
    assert got == want
