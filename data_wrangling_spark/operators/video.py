"""Dependency-free AVI (RIFF) video decode for the multimodal pipeline
(SURVEY.md §2.11 X-MULTIMODAL — the video modality).

Completes the real-decode seam across all three modalities: raster
images (PPM/BMP/PNG/JPEG, operators/multimodal.py + jpeg.py), audio
(WAV, operators/audio.py), and now video — a strict parser for the
canonical uncompressed interchange container: RIFF 'AVI ' with a
'hdrl' header list ('avih' main header, 'strl'/'strh'/'strf' stream
description) and a 'movi' list of '00db'/'00dc' frame chunks, each an
uncompressed 24-bit DIB pixel array (bottom-up, BGR, 4-byte-padded
rows — the exact layout the BMP decoder handles, minus the file
header). Codec-compressed streams (biCompression != 0, or any fourcc
handler this parser can't verify as raw DIB) raise loudly.

Frame sampling is the operation an LLM-pipeline needs from video —
every Nth frame decoded to the same grayscale strip features the image
decoders emit — and it runs as one Arrow-batched 1→N mapInPandas, the
UDTF-style expansion shape sample_frames established.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: ITU-R 601 luma — the SAME constants every raster decoder here uses
_LUMA = (0.299, 0.587, 0.114)


def _chunks(buf: bytes, start: int, end: int):
    """Iterate RIFF (chunk_id, body_start, body_size) word-aligned."""
    o = start
    while o + 8 <= end:
        cid = buf[o : o + 4]
        (size,) = struct.unpack_from("<I", buf, o + 4)
        yield cid, o + 8, size
        o += 8 + size + (size & 1)


def decode_avi(payload: bytes) -> tuple[list[np.ndarray], float]:
    """Parse a RIFF/AVI payload → (frames, fps); each frame is a float64
    (h, w) grayscale plane in [0, 255] (ITU-R 601 luma of the raw BGR
    pixels). Only uncompressed 24-bit DIB video is decoded; anything
    else raises ValueError with the reason."""
    if payload is None:
        raise NotImplementedError(
            "payload fetch by URI not implemented in this environment"
        )
    b = bytes(payload)
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    strh = None
    strf = None
    movi_span = None

    def walk(start: int, end: int) -> None:
        nonlocal strh, strf, movi_span
        for cid, o, size in _chunks(b, start, end):
            if cid == b"LIST":
                kind = b[o : o + 4]
                if kind == b"movi":
                    movi_span = (o + 4, o + size)
                else:
                    walk(o + 4, o + size)
            elif cid == b"strh" and strh is None:
                strh = b[o : o + size]
            elif cid == b"strf" and strf is None:
                strf = b[o : o + size]

    walk(12, len(b))
    if strh is None or strf is None:
        raise ValueError("AVI payload has no stream header (strh/strf)")
    if movi_span is None:
        raise ValueError("AVI payload has no movi list")
    fcc_type = strh[0:4]
    if fcc_type != b"vids":
        raise ValueError(f"first AVI stream is {fcc_type!r}, not video")
    scale, rate = struct.unpack_from("<II", strh, 20)
    if scale == 0 or rate == 0:
        raise ValueError("AVI strh declares zero frame rate")
    if len(strf) < 40:
        raise ValueError("AVI strf shorter than BITMAPINFOHEADER")
    w, h_signed = struct.unpack_from("<ii", strf, 4)
    (bits,) = struct.unpack_from("<H", strf, 14)
    (compression,) = struct.unpack_from("<I", strf, 16)
    if compression != 0 or bits != 24:
        raise ValueError(
            f"unsupported AVI video (bits={bits}, compression={compression}):"
            " only uncompressed 24-bit DIB frames are decoded"
        )
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise ValueError(f"degenerate AVI frame dimensions {w}x{h_signed}")
    stride = (w * 3 + 3) & ~3
    frames: list[np.ndarray] = []
    for cid, o, size in _chunks(b, movi_span[0], movi_span[1]):
        if cid[2:4] not in (b"db", b"dc"):
            continue  # index/audio/other stream chunks
        if size < stride * h or o + size > len(b):
            raise ValueError("truncated AVI frame chunk")
        raw = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=o)
        rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if h_signed > 0:  # bottom-up, like BMP
            rows = rows[::-1]
        bgr = rows.astype(np.float64)
        gray = (
            _LUMA[0] * bgr[:, :, 2]
            + _LUMA[1] * bgr[:, :, 1]
            + _LUMA[2] * bgr[:, :, 0]
        )
        frames.append(gray)
    return frames, rate / scale


def encode_avi(
    frames: list[list[tuple[int, int, int]]],
    width: int,
    height: int,
    fps: int = 10,
) -> bytes:
    """Fixture/test encoder: RGB frames (row-major, top-down pixel
    lists) → canonical uncompressed AVI bytes (bottom-up BGR DIB
    frames, word-aligned RIFF chunks)."""
    stride = (width * 3 + 3) & ~3
    bodies = []
    for pix in frames:
        if len(pix) != width * height:
            raise ValueError("frame pixel count != width*height")
        rows = []
        for y in range(height - 1, -1, -1):  # bottom-up
            row = bytearray()
            for x in range(width):
                r, g, bb = pix[y * width + x]
                row += bytes((bb, g, r))
            row += b"\x00" * (stride - len(row))
            rows.append(bytes(row))
        bodies.append(b"".join(rows))

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, 0, 0, 0x10, len(bodies), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(bodies), 0, 0, 0, 0)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, stride * height,
        0, 0, 0, 0,
    )
    strl = b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl = b"hdrl" + chunk(b"avih", avih) + chunk(b"LIST", strl)
    movi = b"movi" + b"".join(chunk(b"00db", body) for body in bodies)
    payload = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps_milli", T.LongType()),
        T.StructField("luma_milli", T.LongType()),
    ]
)


def sample_avi_frames(media: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video frame sampling: decode every ``every_n``-th DIB frame
    of each AVI payload and emit its mean luma in integer milli (plus
    geometry and frame rate). One Arrow-batched 1→N mapInPandas — the
    sample_frames expansion shape with a genuine container parse
    inside. Values are deterministic: the luma mean is a fixed IEEE
    float sequence over exact uint8 pixels, rounded half-away to
    integer milli."""
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[tuple] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, fps = decode_avi(payload)
                for i in range(0, len(frames), every_n):
                    g = frames[i]
                    mean = float(g.mean())
                    luma_milli = math.floor(1000.0 * mean / 255.0 + 0.5)
                    out.append(
                        (
                            mid, i, g.shape[1], g.shape[0],
                            math.floor(1000.0 * fps + 0.5), luma_milli,
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "frame_idx", "width", "height",
                    "fps_milli", "luma_milli",
                ],
            )

    return media.mapInPandas(batches, schema=VIDEO_FRAME_SCHEMA)


def synth_avi_from_documents(docs: DataFrame, width: int = 8,
                             height: int = 2) -> DataFrame:
    """Deterministic video fixture from the documents table: doc_id d
    gets 1 + (d % 4) solid-gray frames, frame f filled with
    g = (d*31 + f*7) % 256 — real AVI containers (header lists, DIB
    frames) whose decoded luma a SQL oracle can replay exactly:
    luma(g,g,g) = 0.299·g + 0.587·g + 0.114·g evaluated in the same
    IEEE order by both engines."""
    from data_wrangling_spark.operators.multimodal import MEDIA_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                frames = []
                for f in range(1 + int(d) % 4):
                    g = (int(d) * 31 + f * 7) % 256
                    frames.append([(g, g, g)] * (width * height))
                payloads.append(encode_avi(frames, width, height, fps=10))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "payload_uri": [
                        f"synthetic://avi/{d}" for d in pdf["doc_id"]
                    ],
                    "meta": [
                        {
                            "mime": "video/x-msvideo",
                            "width": width,
                            "height": height,
                            "n_bytes": len(p),
                        }
                        for p in payloads
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=MEDIA_SCHEMA)
