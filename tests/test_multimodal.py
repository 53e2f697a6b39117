"""Multimodal binary-column plumbing (fake codec, real Spark mechanics)."""

import hashlib

import pytest

from grafink_spark.llm import multimodal as mm


@pytest.fixture()
def media(spark):
    rows = [
        (i, mm.make_fake_image(i, 16, 8)) for i in range(1, 6)
    ] + [(99, None)]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_extract_image_features(spark, media):
    out = {r.doc_id: r for r in mm.extract_image_features(media).collect()}
    assert len(out) == 6
    assert out[1].width == 16 and out[1].height == 8
    assert out[1].n_bytes == 8 + 16 * 8
    assert out[1].payload_md5 == hashlib.md5(
        mm.make_fake_image(1, 16, 8).hex().encode()
    ).hexdigest()
    assert 0 <= out[1].mean_luma <= 255
    assert out[99].payload_md5 is None and out[99].n_bytes == 0
    # deterministic: same doc_id → same features
    again = {r.doc_id: r for r in mm.extract_image_features(media).collect()}
    assert again[2].mean_luma == out[2].mean_luma


def test_real_kernel_is_explicitly_stubbed(spark, media):
    import pandas as pd  # noqa: F401

    with pytest.raises(Exception) as ei:
        mm.extract_image_features(media, kernel=mm.real_decode_kernel).collect()
    assert "NotImplementedError" in str(ei.value) or "not installed" in str(ei.value)


def test_sample_frames_one_to_many(spark, media):
    frames = mm.sample_frames(media, every_n_bytes=32)
    got = frames.groupBy("doc_id").count().collect()
    by_id = {r.doc_id: r["count"] for r in got}
    # 136 payload bytes / 32 → 5 frames per doc; null payload → none
    assert by_id[1] == 5
    assert 99 not in by_id
    first = frames.where("doc_id = 1 and frame_idx = 0").first()
    assert len(first.frame_bytes) == 32


def test_resize_images_contract(spark):
    from grafink_spark.llm.multimodal import (
        extract_image_features,
        make_fake_image,
        resize_images,
    )

    df = spark.createDataFrame(
        [(i, make_fake_image(i, 32, 16)) for i in range(4)],
        "doc_id long, payload binary",
    )
    resized = resize_images(df, 8, 4)
    feats = extract_image_features(resized)
    rows = {r.doc_id: r for r in feats.collect()}
    assert len(rows) == 4
    for r in rows.values():
        assert (r.width, r.height) == (8, 4)
        assert r.n_bytes == 8 + 8 * 4
        assert r.mean_luma is not None


def test_audio_features(spark):
    from grafink_spark.llm.multimodal import (
        extract_audio_features,
        fake_audio_kernel,
        make_fake_audio,
        real_audio_kernel,
    )

    df = spark.createDataFrame(
        [(1, make_fake_audio(1, 2000)), (2, make_fake_audio(2, 500)), (3, None)],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in extract_audio_features(df).collect()}
    assert rows[1].duration_ms == 2000 and rows[2].duration_ms == 500
    assert rows[1].rms is not None and rows[1].rms > 0
    assert rows[3].duration_ms is None and rows[3].n_bytes == 0
    # determinism: kernel is pure
    assert fake_audio_kernel(1, make_fake_audio(1, 2000)) == fake_audio_kernel(
        1, make_fake_audio(1, 2000)
    )
    # the real kernel is a clearly-marked stub
    import pytest

    with pytest.raises(NotImplementedError):
        real_audio_kernel(1, b"")
