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
