"""Multimodal binary-column plumbing (decode stubbed, plumbing real)."""

import pytest


def test_decode_stub_raises():
    from codegraph.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_metadata_roundtrip(spark):
    from codegraph.multimodal import extract_metadata, fake_decode, synth_blobs

    docs = spark.range(20).withColumnRenamed("id", "doc_id")
    blobs = synth_blobs(docs)
    meta = extract_metadata(blobs).toPandas().set_index("doc_id")
    assert len(meta) == 20
    # deterministic header parse: w/h derived from doc_id
    assert meta.loc[3, "width"] == 16 + (3 * 7) % 1024
    assert meta.loc[3, "height"] == 16 + (3 * 13) % 768
    assert set(meta["media_type"]) == {"image", "audio", "video"}
    assert (meta["n_bytes"] > 16).all()


def test_frame_sample_plan(spark):
    from codegraph.multimodal import extract_metadata, frame_sample_plan, synth_blobs

    docs = spark.range(30).withColumnRenamed("id", "doc_id")
    meta = extract_metadata(synth_blobs(docs))
    plan = frame_sample_plan(meta, every_n=30).toPandas()
    assert (plan["n_frames"] >= 1).all()
    for _, r in plan.iterrows():
        assert list(r["sample_frames"])[0] == 0
