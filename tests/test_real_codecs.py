"""Unit tests for the REAL uncompressed codecs (operators/multimodal):
the encoded BMP/WAV bytes must be structurally valid files whose parsed
headers and pixel/sample math round-trip known inputs exactly."""

import struct

from dc_moving_violations_cloud_etl_spark.operators.multimodal import (
    BMP_H,
    BMP_W,
    WAV_N,
    WAV_RATE,
    encode_bmp,
    encode_wav,
)

DIGEST = bytes(range(16))  # 0..15


def test_bmp_layout_is_a_valid_24bpp_file():
    payload = encode_bmp(DIGEST)
    magic, file_size, _, _, offset = struct.unpack("<2sIHHI", payload[:14])
    assert magic == b"BM"
    assert offset == 54
    assert file_size == len(payload) == 54 + BMP_W * BMP_H * 3
    hdr_size, width, height, planes, bpp = struct.unpack(
        "<IiiHH", payload[14:30]
    )
    assert (hdr_size, width, height, planes, bpp) == (40, BMP_W, BMP_H, 1, 24)
    pixels = payload[offset:]
    # pixels tile the digest exactly (192 = 12 tiles of 16)
    assert pixels == DIGEST * 12
    assert sum(pixels) / len(pixels) == sum(DIGEST) / 16


def test_wav_layout_is_a_valid_pcm16_file():
    payload = encode_wav(DIGEST)
    riff, _, wave = struct.unpack("<4sI4s", payload[:12])
    assert (riff, wave) == (b"RIFF", b"WAVE")
    tag, sz, fmt, ch, rate, byte_rate, align, bits = struct.unpack(
        "<4sIHHIIHH", payload[12:36]
    )
    assert (tag, sz, fmt, ch, bits) == (b"fmt ", 16, 1, 1, 16)
    assert rate == WAV_RATE and byte_rate == WAV_RATE * 2 and align == 2
    dtag, dlen = struct.unpack("<4sI", payload[36:44])
    assert (dtag, dlen) == (b"data", WAV_N * 2)
    samples = struct.unpack(f"<{WAV_N}h", payload[44:])
    assert samples[:16] == tuple(b * 256 - 32768 for b in DIGEST)
    assert samples == samples[:16] * 4  # exact tiling


def test_textured_bmp_is_valid_and_aperiodic():
    from dc_moving_violations_cloud_etl_spark.operators.multimodal import (
        encode_bmp_textured,
    )

    payload = encode_bmp_textured(DIGEST)
    magic, file_size, _, _, offset = struct.unpack("<2sIHHI", payload[:14])
    assert magic == b"BM" and offset == 54
    assert file_size == len(payload) == 54 + BMP_W * BMP_H * 3
    pixels = payload[offset:]
    # byte i = (digest[i%16] + i//16) % 256 — tile k is the digest
    # shifted by k, so the stream is aperiodic across tiles
    assert pixels == bytes(
        (DIGEST[i % 16] + i // 16) % 256 for i in range(192)
    )
    assert pixels[:16] != pixels[16:32]


def test_ahash_band_packing_matches_reference():
    # pure-python aHash reference over the textured pixel stream: the
    # numpy band packing in ahash_bands must reproduce it bit-for-bit
    import numpy as np

    from dc_moving_violations_cloud_etl_spark.operators.multimodal import (
        encode_bmp_textured,
    )

    payload = encode_bmp_textured(DIGEST)
    px = payload[54:]
    g3 = [px[3 * p] + px[3 * p + 1] + px[3 * p + 2] for p in range(64)]
    total = sum(g3)
    bits = [1 if 64 * g >= total else 0 for g in g3]
    expect = [
        sum(bits[16 * k + j] << (15 - j) for j in range(16)) for k in range(4)
    ]
    # replicate the operator's numpy path exactly
    arr = np.frombuffer(px, np.uint8)
    g3n = arr.reshape(-1, 3).sum(axis=1).astype(np.int64)
    bitsn = (64 * g3n >= g3n.sum()).astype(np.int64)
    weights = (1 << np.arange(15, -1, -1)).astype(np.int64)
    got = [int(bitsn[16 * k : 16 * (k + 1)] @ weights) for k in range(4)]
    assert got == expect
    assert all(0 <= v <= 0xFFFF for v in got)


def test_y4m_layout_is_a_valid_c420_stream():
    from dc_moving_violations_cloud_etl_spark.operators.multimodal import (
        Y4M_FRAMES,
        Y4M_H,
        Y4M_W,
        encode_y4m,
    )

    payload = encode_y4m(DIGEST)
    nl = payload.index(b"\n")
    tags = payload[:nl].decode().split(" ")
    assert tags[0] == "YUV4MPEG2"
    assert f"W{Y4M_W}" in tags and f"H{Y4M_H}" in tags and "C420" in tags
    frame_bytes = Y4M_W * Y4M_H + 2 * (Y4M_W // 2) * (Y4M_H // 2)
    body = payload[nl + 1 :]
    assert len(body) == Y4M_FRAMES * (6 + frame_bytes)
    # frame 0: luma tiles the digest exactly; frame 1: +1 offset, rot 3
    f0 = body[6 : 6 + Y4M_W * Y4M_H]
    assert f0 == (DIGEST * 4)
    f1 = body[6 + frame_bytes + 6 : 6 + frame_bytes + 6 + Y4M_W * Y4M_H]
    expect1 = bytes(
        (DIGEST[(i + 3) % 16] + 1) % 256 for i in range(Y4M_W * Y4M_H)
    )
    assert f1 == expect1


def test_null_text_rows_excluded_not_crashing(spark):
    """A documents row with NULL text carries no media: pre-fix,
    md5(NULL) -> NULL payload crashed every pandas decode on
    len(None); now the payload derivations exclude the row (same
    discipline as dedup.norm_docs) and the pipelines run (r10 review
    finding)."""
    from dc_moving_violations_cloud_etl_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, None)], "doc_id long, text string"
    )
    meta = multimodal.decode_metadata(docs).collect()
    assert [r["doc_id"] for r in meta] == [1]
    bmp = multimodal.decode_bmp_real(docs).collect()
    assert [r["doc_id"] for r in bmp] == [1]


def test_overflow_buckets_zero_on_empty_input(spark):
    """The truncation-honesty column must read 0 (not NULL) when the
    banded table is empty — sum over zero rows is NULL without the
    coalesce, and `overflow_buckets == 0` on NULL misreports
    truncation (r10 review finding)."""
    from pyspark.sql import types as T

    from dc_moving_violations_cloud_etl_spark.operators.dedup import (
        embedding_capped_pair_edges,
    )

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("label", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    empty = spark.createDataFrame([], schema)
    _, overflow = embedding_capped_pair_edges(empty)
    row = overflow.collect()
    assert len(row) == 1 and row[0]["overflow_buckets"] == 0
