"""WAV codec + audio feature tests (operators/audio.py): round-trip
across every supported encoding, the strict error contract, and the
mixed-modality dispatch through the Arrow pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from data_wrangling_spark.operators import audio


def _sig(n=400, channels=1, seed=7):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-0.9, 0.9, size=(n, channels))
    return x


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("channels", [1, 2])
def test_wav_pcm_roundtrip_within_quantization(bits, channels):
    x = _sig(channels=channels)
    payload = audio.encode_wav(x, 8000, bits=bits)
    got, rate = audio.decode_wav(payload)
    assert rate == 8000
    assert got.shape == x.shape
    # encode quantizes to 2^(bits-1) steps; decode must land within one
    # quantization step of the source everywhere
    step = 1.0 / (1 << (bits - 1))
    assert np.abs(got - x).max() <= step


def test_wav_float32_roundtrip_exact_to_f32():
    x = _sig()
    payload = audio.encode_wav(x, 44100, bits=32, fmt=3)
    got, rate = audio.decode_wav(payload)
    assert rate == 44100
    assert np.array_equal(got, x.astype(np.float32).astype(np.float64))


def test_wav_8bit_bytes_are_exactly_recoverable():
    """The oracle correspondence the registered query relies on: 8-bit
    PCM amplitude is exactly (byte - 128)/128, so text bytes wrapped by
    wrap_wav_data decode to exact dyadic rationals."""
    raw = bytes(range(32, 127))
    payload = audio.wrap_wav_data(raw, 8000, 1, 8)
    got, rate = audio.decode_wav(payload)
    v = np.round(got[:, 0] * 128.0 + 128.0).astype(int)
    assert list(v) == list(raw)


def test_wav_error_contract():
    good = audio.encode_wav(_sig(), 8000, bits=16)
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        audio.decode_wav(b"\x89PNG\r\n\x1a\nrest")
    # compressed format tag (2 = MS ADPCM) raises, never junk samples
    bad_tag = bytearray(good)
    bad_tag[20] = 2
    with pytest.raises(ValueError, match="format tag"):
        audio.decode_wav(bytes(bad_tag))
    # data chunk declaring more bytes than present
    with pytest.raises(ValueError, match="truncated"):
        audio.decode_wav(good[:-10])
    # a WAV with fmt but no data chunk
    hdr_only = good[: good.index(b"data")]
    with pytest.raises(ValueError, match="no data chunk"):
        audio.decode_wav(hdr_only)
    with pytest.raises(ValueError, match="bit depth"):
        audio.decode_wav(
            audio.wrap_wav_data(b"\x00\x00", 8000, 1, 12)
        )


def test_wav_skips_unknown_chunks():
    """RIFF allows LIST/INFO etc. before data — the parser must skip
    word-aligned unknown chunks, not die or misread."""
    x = _sig(64)
    good = audio.encode_wav(x, 8000, bits=16)
    # splice an unknown 5-byte chunk (odd size → 1 pad byte) after fmt
    i = good.index(b"data")
    extra = b"LIST" + (5).to_bytes(4, "little") + b"abcde" + b"\x00"
    spliced = good[:i] + extra + good[i:]
    got, rate = audio.decode_wav(spliced)
    assert np.array_equal(got, audio.decode_wav(good)[0])


def test_wav_envelope_constant_amplitude():
    x = np.full(800, 0.5)
    env = audio.decode_wav_envelope(audio.encode_wav(x, 8000, bits=16), dim=4)
    assert len(env) == 4
    assert all(abs(e - 0.5) < 1e-3 for e in env)
    silent = audio.decode_wav_envelope(
        audio.encode_wav(np.zeros(800), 8000, bits=16), dim=4
    )
    assert silent == [0.0] * 4


def test_exact_sumsq_matches_python_ints():
    rng = np.random.default_rng(3)
    v = rng.integers(-(1 << 23), 1 << 23, size=200_000, dtype=np.int64)
    assert audio._exact_sumsq(v) == sum(int(a) * int(a) for a in v.tolist())


def test_mixed_media_dispatch_on_executors(spark):
    """One payload column holding a WAV and a PNG routes through
    decoder='media' magic dispatch inside mapInPandas."""
    from data_wrangling_spark.operators.multimodal import (
        encode_png,
        extract_features,
    )

    wav = audio.encode_wav(np.full(64, 0.25), 8000, bits=16)
    png = encode_png(4, 4, [(i * 16, i * 16, i * 16) for i in range(16)])
    rows = [
        (1, bytearray(wav), "synthetic://a.wav",
         {"mime": "audio/wav", "width": None, "height": None,
          "n_bytes": len(wav)}),
        (2, bytearray(png), "synthetic://b.png",
         {"mime": "image/png", "width": 4, "height": 4,
          "n_bytes": len(png)}),
    ]
    from data_wrangling_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in
           extract_features(media, dim=4, decoder="media").collect()}
    assert len(out) == 2
    assert all(abs(f - 0.25) < 1e-3 for f in out[1].feature)
    assert len(out[2].feature) == 4


def test_wav_features_hand_computed(spark):
    """Integer-milli features for a hand-checkable clip: constant
    amplitude 0.5 → rms == peak == 500 milli; 4000 frames at 8 kHz →
    500 ms."""
    from data_wrangling_spark.operators.multimodal import MEDIA_SCHEMA

    wav = audio.encode_wav(np.full(4000, 0.5), 8000, bits=16)
    media = spark.createDataFrame(
        [(9, bytearray(wav), "synthetic://c.wav",
          {"mime": "audio/wav", "width": None, "height": None,
           "n_bytes": len(wav)})],
        MEDIA_SCHEMA,
    )
    r = audio.wav_features(media).collect()[0]
    assert (r.sample_rate, r.channels, r.n_frames) == (8000, 1, 4000)
    assert r.duration_ms == 500
    assert r.rms_milli == 500 and r.peak_milli == 500
