"""binaryFile media ingest: directory of binary files → MEDIA_SCHEMA
table → existing multimodal ops compose unchanged; glob filter applies
at listing time; parquet round trip preserves payload bytes."""

from __future__ import annotations

import hashlib

from data_wrangling_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    sample_frames,
)
from data_wrangling_spark.sources.media import read_media_dir, to_media_table

PAYLOADS = {
    "a.img": b"\x89PNG-fake" * 40,
    "b.img": b"RIFF-fake-audio" * 11,
    "c.txt": b"not media",
}


def _write_files(tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    for name, data in PAYLOADS.items():
        (d / name).write_bytes(data)
    return str(d)


def test_read_media_dir_schema_and_content(spark, tmp_path):
    d = _write_files(tmp_path)
    media = read_media_dir(spark, d, glob="*.img")
    # same columns and types; nullability legitimately differs (the
    # source derivations are provably non-null)
    assert media.schema.simpleString() == MEDIA_SCHEMA.simpleString()

    rows = media.collect()
    assert len(rows) == 2  # glob excluded c.txt at listing time
    by_name = {r.payload_uri.rsplit("/", 1)[-1]: r for r in rows}
    for name in ("a.img", "b.img"):
        assert bytes(by_name[name].payload) == PAYLOADS[name]
        assert by_name[name].meta.n_bytes == len(PAYLOADS[name])
    # stable ids across re-reads
    again = {r.payload_uri: r.media_id for r in read_media_dir(spark, d, glob="*.img").collect()}
    assert {r.payload_uri: r.media_id for r in rows} == again


def test_downstream_ops_compose(spark, tmp_path):
    d = _write_files(tmp_path)
    media = read_media_dir(spark, d, glob="*.img")

    feats = {r.digest for r in extract_features(media).collect()}
    assert feats == {
        hashlib.sha256(PAYLOADS["a.img"]).hexdigest(),
        hashlib.sha256(PAYLOADS["b.img"]).hexdigest(),
    }

    frames = sample_frames(media, frame_bytes=64, every_n=2).collect()
    assert len(frames) > 0
    assert all(len(bytes(f.frame_payload)) <= 64 for f in frames)


def test_media_table_round_trip(spark, tmp_path):
    d = _write_files(tmp_path)
    out = str(tmp_path / "media_table")
    to_media_table(read_media_dir(spark, d, glob="*.img"), out)
    back = spark.read.parquet(out)
    got = {r.payload_uri.rsplit("/", 1)[-1]: bytes(r.payload) for r in back.collect()}
    assert got == {k: v for k, v in PAYLOADS.items() if k.endswith(".img")}
