"""AVI codec + frame-sampling tests (operators/video.py): round-trip
pixel exactness, RIFF structure handling, the strict error contract,
and the Arrow 1→N expansion."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_wrangling_spark.operators import video


def _grad_frame(w, h, off=0):
    return [((x * 37 + y * 11 + off) % 256,
             (x * 5 + off) % 256,
             (y * 29 + off) % 256) for y in range(h) for x in range(w)]


def test_avi_roundtrip_exact_luma():
    w, h = 6, 4
    frames_px = [_grad_frame(w, h, off) for off in (0, 50, 100)]
    payload = video.encode_avi(frames_px, w, h, fps=25)
    frames, fps = video.decode_avi(payload)
    assert fps == 25.0
    assert len(frames) == 3
    for px, gray in zip(frames_px, frames):
        assert gray.shape == (h, w)
        for y in range(h):
            for x in range(w):
                r, g, b = px[y * w + x]
                want = 0.299 * r + 0.587 * g + 0.114 * b
                assert gray[y, x] == want  # bit-exact, same IEEE sequence


def test_avi_top_down_variant():
    """Negative biHeight means top-down frame storage; the decoder must
    not flip those rows."""
    w, h = 4, 2
    payload = bytearray(video.encode_avi([_grad_frame(w, h)], w, h))
    up, _ = video.decode_avi(bytes(payload))
    i = bytes(payload).index(b"strf") + 8  # chunk body start
    struct.pack_into("<i", payload, i + 8, -h)  # biHeight := -h
    down, _ = video.decode_avi(bytes(payload))
    assert np.array_equal(down[0], up[0][::-1])  # rows reversed
    assert not np.array_equal(down[0], up[0])


def test_avi_error_contract():
    w, h = 4, 2
    good = video.encode_avi([_grad_frame(w, h)], w, h)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        video.decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    # compressed stream (biCompression != 0) raises, never junk frames
    bad = bytearray(good)
    i = good.index(b"strf") + 8
    struct.pack_into("<I", bad, i + 16, 0x30323449)  # 'I420'
    with pytest.raises(ValueError, match="compression"):
        video.decode_avi(bytes(bad))
    # truncated frame chunk
    with pytest.raises(ValueError, match="truncated"):
        video.decode_avi(good[:-8])
    # headers but no movi list
    hdr_only = good[: good.index(b"movi") - 8]
    with pytest.raises(ValueError, match="movi"):
        video.decode_avi(hdr_only)
    # non-video first stream
    bad2 = bytearray(good)
    j = good.index(b"strh") + 8
    bad2[j : j + 4] = b"auds"
    with pytest.raises(ValueError, match="not video"):
        video.decode_avi(bytes(bad2))


def test_sample_avi_frames_every_n(spark):
    from data_wrangling_spark.operators.multimodal import MEDIA_SCHEMA

    w, h = 8, 2
    payload = video.encode_avi(
        [[(g, g, g)] * (w * h) for g in (10, 20, 30, 40, 50)], w, h, fps=10
    )
    media = spark.createDataFrame(
        [(7, bytearray(payload), "synthetic://v.avi",
          {"mime": "video/x-msvideo", "width": w, "height": h,
           "n_bytes": len(payload)})],
        MEDIA_SCHEMA,
    )
    rows = video.sample_avi_frames(media, every_n=2).collect()
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    # solid gray g → luma exactly g → milli = round(1000*g/255)
    import math
    for r, g in zip(rows, (10, 30, 50)):
        want = math.floor(1000.0 * (0.299 * g + 0.587 * g + 0.114 * g)
                          / 255.0 + 0.5)
        assert r.luma_milli == want
        assert (r.width, r.height, r.fps_milli) == (w, h, 10000)
