"""Dependency-free WAV (RIFF/PCM) audio decode for the multimodal
pipeline (SURVEY.md §2.11 X-MULTIMODAL — the audio modality).

The image side of the real-decode seam covers PPM/PGM, BMP, PNG, and
baseline JPEG; this module gives audio the same treatment: a strict
stdlib-only decoder for the canonical uncompressed interchange format,
parsed from the published RIFF/WAVE layout (chunked container, 'fmt '
describing PCM encoding, 'data' carrying samples), plus the fixture
encoder that makes real WAV files in-container for tests and queries.

Decode contract matches the raster decoders (operators/multimodal.py):
ValueError with a specific message for malformed/truncated/unsupported
payloads — never junk samples; compressed formats (MP3/OGG/µ-law...)
raise loudly rather than pretending.

Scale posture: payloads cross into Python only through Arrow batches
(mapInPandas); per-payload work is vectorized numpy over the sample
array. Feature values are integer-milli (exact integer sums of the
PCM domain inside, one double sqrt at the end), so results are
independent of partitioning and reproducible across engines.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: WAVE format tags this decoder understands
_FMT_PCM = 1
_FMT_IEEE_FLOAT = 3


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE payload → (samples, sample_rate); ``samples``
    is float64 (n_frames, channels) in [-1, 1].

    Supports PCM 8 (unsigned) / 16 / 24 / 32-bit and IEEE float32,
    any channel count. Unknown chunks are skipped (word-aligned, per
    the RIFF spec); compressed format tags, missing fmt/data chunks,
    and truncated sample data raise ValueError."""
    if payload is None:
        raise NotImplementedError(
            "payload fetch by URI not implemented in this environment"
        )
    b = bytes(payload)
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    o = 12
    while o + 8 <= len(b):
        cid = b[o : o + 4]
        (size,) = struct.unpack_from("<I", b, o + 4)
        body = b[o + 8 : o + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            if len(body) < size:
                raise ValueError("truncated WAV data chunk")
            data = body
        o += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("WAV payload has no fmt chunk")
    if data is None:
        raise ValueError("WAV payload has no data chunk")
    tag, channels, rate, _byte_rate, _block_align, bits = fmt
    if channels < 1:
        raise ValueError("WAV fmt declares zero channels")
    if tag == _FMT_PCM:
        if bits == 8:
            x = (data_arr(data, np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            x = data_arr(data, np.dtype("<i2")).astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3).astype(np.int64)
            v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = data_arr(data, np.dtype("<i4")).astype(np.float64) / float(1 << 31)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif tag == _FMT_IEEE_FLOAT:
        if bits != 32:
            raise ValueError(f"unsupported IEEE-float bit depth {bits}")
        x = data_arr(data, np.dtype("<f4")).astype(np.float64)
    else:
        raise ValueError(
            f"unsupported WAV format tag {tag} (only PCM and IEEE float "
            "are decodable; compressed audio needs a codec library)"
        )
    n = (len(x) // channels) * channels
    return x[:n].reshape(-1, channels), rate


def data_arr(data: bytes, dtype) -> np.ndarray:
    itemsize = np.dtype(dtype).itemsize
    usable = (len(data) // itemsize) * itemsize
    return np.frombuffer(data[:usable], dtype=dtype)


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16, fmt: int = _FMT_PCM
) -> bytes:
    """Fixture/test encoder: float samples in [-1, 1], shape (n,) or
    (n_frames, channels) → canonical RIFF/WAVE bytes. Supports the same
    encodings the decoder does."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    channels = x.shape[1]
    if fmt == _FMT_IEEE_FLOAT:
        if bits != 32:
            raise ValueError("IEEE-float WAV is 32-bit")
        data = x.astype("<f4").tobytes()
    elif bits == 8:
        data = (np.clip(np.round(x * 128.0 + 128.0), 0, 255)
                .astype(np.uint8).tobytes())
    elif bits == 16:
        data = (np.clip(np.round(x * 32768.0), -32768, 32767)
                .astype("<i2").tobytes())
    elif bits == 24:
        v = np.clip(np.round(x * (1 << 23)), -(1 << 23), (1 << 23) - 1)
        v = v.astype(np.int64).ravel()
        v = np.where(v < 0, v + (1 << 24), v)
        out = np.empty((len(v), 3), dtype=np.uint8)
        out[:, 0] = v & 0xFF
        out[:, 1] = (v >> 8) & 0xFF
        out[:, 2] = (v >> 16) & 0xFF
        data = out.tobytes()
    elif bits == 32:
        data = (np.clip(np.round(x * (1 << 31)), -(1 << 31), (1 << 31) - 1)
                .astype("<i4").tobytes())
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    return wrap_wav_data(data, sample_rate, channels, bits, fmt)


def wrap_wav_data(
    data: bytes, sample_rate: int, channels: int, bits: int, fmt: int = _FMT_PCM
) -> bytes:
    """Wrap raw sample bytes in a RIFF/WAVE container (the header is a
    pure function of the parameters — used by encode_wav and by the
    synthetic-payload query that treats text bytes as 8-bit PCM)."""
    block_align = channels * (bits // 8)
    byte_rate = sample_rate * block_align
    hdr = b"WAVE" + b"fmt " + struct.pack(
        "<IHHIIHH", 16, fmt, channels, sample_rate, byte_rate, block_align, bits
    ) + b"data" + struct.pack("<I", len(data))
    pad = b"\x00" if len(data) & 1 else b""
    return b"RIFF" + struct.pack("<I", 4 + len(hdr) + len(data) + len(pad)) + hdr + data + pad


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms_milli", T.LongType()),
        T.StructField("peak_milli", T.LongType()),
    ]
)


def _round_half_away(x: float) -> int:
    """ROUND half-away-from-zero — what Spark's round() and DuckDB's
    ROUND() both do. Python's built-in round is banker's, which differs
    at every exact .5 (e.g. duration of a 4-frame 8 kHz clip), so the
    built-in must never touch an oracle-visible value."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _exact_sumsq(v: np.ndarray) -> int:
    """Exact Σv² for int64 samples |v| ≤ 2²³ without overflow: squares
    fit int64 (≤ 2⁴⁶), chunks of ≤ 2¹⁶ squares sum inside int64
    (≤ 2⁶²), chunk sums accumulate as arbitrary-precision Python ints.
    Vectorized (no per-sample Python loop), exact at any length."""
    flat = v.ravel()
    total = 0
    for i in range(0, flat.size, 65536):
        chunk = flat[i : i + 65536]
        total += int(np.sum(chunk * chunk))
    return total


def wav_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction over a MEDIA_SCHEMA-shaped table whose
    payloads are WAV: per payload (sample_rate, channels, n_frames,
    duration_ms, rms_milli, peak_milli) via one Arrow-batched
    mapInPandas.

    RMS/peak are integer-milli of full scale, computed EXACTLY in the
    integer PCM domain (sum of squared integer sample values, one
    double sqrt at the end) — the decoded floats are exact dyadic
    rationals, so reconstructing the integer domain loses nothing and
    the value is engine- and partition-independent (the same int-first
    discipline as the text/entropy operators)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                x, rate = decode_wav(p)
                n_frames, channels = x.shape
                # exact integer PCM domain: x = v / 128 for 8-bit etc.;
                # recover v on the finest grid actually used (2^23 covers
                # every supported depth exactly; IEEE float payloads are
                # quantized to that grid, documented)
                v = np.round(x * (1 << 23)).astype(np.int64)
                n = v.size
                if n == 0:
                    rms_milli = 0
                    peak_milli = 0
                else:
                    s = _exact_sumsq(v)
                    rms_milli = _round_half_away(
                        1000.0 * float(np.sqrt(float(s) / n)) / float(1 << 23)
                    )
                    peak_milli = _round_half_away(
                        1000.0 * float(np.abs(v).max()) / float(1 << 23)
                    )
                rows.append(
                    (
                        mid,
                        rate,
                        channels,
                        n_frames,
                        _round_half_away(1000.0 * n_frames / rate),
                        rms_milli,
                        peak_milli,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "channels", "n_frames",
                    "duration_ms", "rms_milli", "peak_milli",
                ],
            )

    return media.mapInPandas(batches, schema=AUDIO_FEATURE_SCHEMA)


def synth_wav_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic audio fixture built from the documents table: each
    document's UTF-8 bytes become the sample bytes of a REAL 8-bit PCM
    8 kHz mono WAV (full RIFF container via wrap_wav_data), so the
    registered audio query exercises the genuine encode → decode path
    on executors while staying DuckDB-replayable: 8-bit PCM amplitude
    is (byte - 128)/128 and the oracle recovers the exact integer
    sample domain from ascii() codes. Pure-ASCII is ENFORCED (not
    assumed): the encode side consumes UTF-8 BYTES while the oracle
    indexes CHARACTERS, so non-ASCII rows are filtered out here via
    octet_length == length and in the oracle via strlen = length —
    identically on both engines (same guard as
    multimodal.synth_pgm_from_documents)."""
    from data_wrangling_spark.operators.multimodal import MEDIA_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [
                wrap_wav_data(t.encode("utf-8"), 8000, 1, 8)
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "payload_uri": [
                        f"synthetic://wav/{d}" for d in pdf["doc_id"]
                    ],
                    "meta": [
                        {
                            "mime": "audio/wav",
                            "width": None,
                            "height": None,
                            "n_bytes": len(p),
                        }
                        for p in payloads
                    ],
                }
            )

    from pyspark.sql import functions as F

    return (
        docs.filter(
            F.col("text").isNotNull()
            & (F.octet_length("text") == F.length("text"))
        )
        .select("doc_id", "text")
        .mapInPandas(batches, schema=MEDIA_SCHEMA)
    )


def decode_wav_envelope(payload: bytes, dim: int = 8) -> list[float]:
    """WAV → dim-float energy envelope in [0, 1] (mean |amplitude| per
    equal time segment, channel-averaged) — the audio counterpart of the
    raster decoders' luma strip, plugging WAV payloads into the shared
    FEATURE_SCHEMA/extract_features pipeline."""
    x, _rate = decode_wav(payload)
    if x.size == 0:
        return [0.0] * dim
    mono = np.abs(x).mean(axis=1)
    bounds = np.linspace(0, len(mono), dim + 1).astype(int)
    out = []
    for i in range(dim):
        seg = mono[bounds[i] : bounds[i + 1]]
        out.append(float(seg.mean()) if seg.size else 0.0)
    return out
