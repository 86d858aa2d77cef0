"""Multimodal plumbing tests: binary payload columns survive the Arrow
boundary, mapInPandas batches produce deterministic stub features."""

from __future__ import annotations

import hashlib

from data_wrangling_spark.operators.multimodal import (
    decode_stub,
    extract_features,
    synth_media_from_documents,
)
from data_wrangling_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_media_schema_and_payload_roundtrip(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(20)
    media = synth_media_from_documents(docs)
    row = media.orderBy("media_id").first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.payload)
    assert row.payload_uri.startswith("synthetic://doc/")


def test_extract_features_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(20)
    media = synth_media_from_documents(docs)
    feats = extract_features(media).orderBy("media_id").collect()
    src = {r.doc_id: r.text for r in docs.collect()}
    assert len(feats) == 20
    for r in feats:
        payload = src[r.media_id].encode("utf-8")
        assert r.digest == hashlib.sha256(payload).hexdigest()
        assert len(r.feature) == 8  # exact values checked (as float32) below
        assert r.n_bytes == len(payload)


def test_feature_values_match_stub_to_float32(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(5)
    media = synth_media_from_documents(docs)
    feats = {r.media_id: r.feature for r in extract_features(media).collect()}
    src = {r.doc_id: r.text for r in docs.collect()}
    import numpy as np

    for mid, got in feats.items():
        want = np.array(decode_stub(src[mid].encode("utf-8")), dtype=np.float32)
        assert np.allclose(np.array(got, dtype=np.float32), want)


def test_decoder_resolution_and_pil_gate(spark):
    """The optional-import decode gate (round-2 verdict item 7): 'stub'
    always resolves; 'image' raises NotImplementedError without Pillow;
    'auto' picks whichever path this environment supports. In THIS
    container Pillow is absent, so the stub branch of each assertion is
    the one CI exercises; on a Pillow-equipped cluster the same test
    exercises the real branch — no code change either way."""
    import pytest

    from data_wrangling_spark.operators.multimodal import (
        _pil_image_module,
        decode_image,
        resolve_decoder,
    )

    assert resolve_decoder("stub") is decode_stub
    with pytest.raises(ValueError):
        resolve_decoder("nope")

    if _pil_image_module() is None:
        assert resolve_decoder("auto") is decode_stub
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_image(b"\x89PNG... irrelevant")
        # the full pipeline surfaces the same contract, not a crash later
        docs = load_table(spark, SF_DIR, "documents").limit(3)
        with pytest.raises(Exception, match="Pillow|NotImplementedError"):
            extract_features(
                synth_media_from_documents(docs), decoder="image"
            ).collect()
    else:
        assert resolve_decoder("auto") is decode_image


def test_extract_features_real_decode_with_pil(spark):
    """Real-codec path, skipped where Pillow is absent: a synthetic 8x1
    grayscale PNG decodes through the SAME mapInPandas pipeline, and the
    feature comes out as the normalized pixel strip — proving only the
    per-payload function differs between stub and real decode."""
    import pytest

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    pixels = [0, 32, 64, 96, 128, 160, 192, 255]
    im = Image.new("L", (8, 1))
    im.putdata(pixels)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    payload = buf.getvalue()

    media = spark.createDataFrame(
        [(1, payload, None, ("image/png", 8, 1, len(payload)))],
        schema="media_id long, payload binary, payload_uri string, "
               "meta struct<mime:string,width:int,height:int,n_bytes:bigint>",
    )
    feats = extract_features(media, dim=8, decoder="image").collect()
    assert len(feats) == 1
    import numpy as np

    got = np.array(feats[0].feature, dtype=np.float32)
    want = np.array([p / 255.0 for p in pixels], dtype=np.float32)
    assert np.allclose(got, want, atol=1e-6)


def test_resize_media_composes(spark):
    from data_wrangling_spark.operators.multimodal import resize_media

    docs = load_table(spark, SF_DIR, "documents").limit(10)
    media = synth_media_from_documents(docs)
    resized = resize_media(media, width=16, height=4)
    rows = resized.orderBy("media_id").collect()
    assert len(rows) == 10
    for r in rows:
        assert len(r.payload) == 16 * 4
        assert r.meta.width == 16 and r.meta.height == 4
        assert r.meta.n_bytes == 64
    # schema-preserving: output feeds straight into feature extraction
    feats = extract_features(resized).collect()
    assert len(feats) == 10 and all(f.n_bytes == 64 for f in feats)


def test_sample_frames_fanout_deterministic(spark):
    from data_wrangling_spark.operators.multimodal import sample_frames

    docs = load_table(spark, SF_DIR, "documents").limit(10)
    media = synth_media_from_documents(docs)
    frames = sample_frames(media, frame_bytes=32, every_n=2).collect()
    src = {r.doc_id: r.text.encode("utf-8") for r in docs.collect()}
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    assert set(by_media) == set(src)
    for mid, rows in by_media.items():
        payload = src[mid]
        n_frames = max(len(payload) // 32, 1)
        want_idxs = list(range(0, n_frames, 2))
        assert sorted(r.frame_idx for r in rows) == want_idxs
        for r in rows:
            assert bytes(r.frame_payload) == payload[r.frame_idx * 32:(r.frame_idx + 1) * 32]
