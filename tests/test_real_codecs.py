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
