"""Multimodal plumbing tests: real Spark-side schema/batching, stubbed codec."""

import pandas as pd
import pytest

from fast_pdf_parser_spark.multimodal.media import (
    decode_image,
    extract_media_features,
    fake_decode_meta,
    fake_features,
    media_spans,
    media_type_of,
)


def test_media_type_routing():
    assert media_type_of("media://img/x.png") == "image"
    assert media_type_of("media://a/x.WAV".lower()) == "audio"
    assert media_type_of("media://v/x.mp4") == "video"
    assert media_type_of("media://x/blob") == "unknown"


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_fake_decode_deterministic():
    a = fake_decode_meta("media://img/1.png", b"abc")
    b = fake_decode_meta("media://img/1.png", b"abc")
    assert a == b
    assert a["media_type"] == "image" and a["width"] > 0
    assert fake_features("x", 16) == fake_features("x", 16)
    assert abs(sum(v * v for v in fake_features("x", 16)) - 1.0) < 1e-6


def test_extract_media_features_spark(spark):
    rows = [
        {"doc_id": "d1", "media_ref": "media://img/000001_cover.png",
         "content": b"fakebytes"},
        {"doc_id": "d2", "media_ref": "media://v/clip.mp4", "content": None},
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        schema="doc_id string, media_ref string, content binary",
    )
    out = extract_media_features(df, feature_dim=8).collect()
    by_id = {r.doc_id: r for r in out}
    img = by_id["d1"]
    assert img.media_type == "image" and img.width > 0 and img.n_bytes == 9
    assert len(img.features) == 8
    vid = by_id["d2"]
    assert vid.media_type == "video" and vid.duration_ms >= 1000
    assert vid.bytes_sha256 is None

    # zero-shuffle plan
    plan = (
        extract_media_features(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_media_flow_from_pipeline(spark):
    from fast_pdf_parser_spark.operators.pipeline import extract_documents
    from fast_pdf_parser_spark.sources.synth import SPANS_DDL, iter_docs

    docs = [d for d in iter_docs(25, seed=42)
            if any(s["kind"] == "media" for s in d["spans"])]
    assert docs
    df = spark.createDataFrame(pd.DataFrame(docs), schema=SPANS_DDL)
    refs = media_spans(extract_documents(df))
    feats = extract_media_features(refs)
    got = feats.collect()
    assert all(r.media_type == "image" for r in got)
    n_media = sum(
        1 for d in docs for s in d["spans"] if s["kind"] == "media"
    )
    assert len(got) == n_media


def test_decode_image_branch_selection(monkeypatch):
    """The import-gated real-decoder path must not be dead code: without
    PIL it raises NotImplementedError; with a (faked) PIL module present it
    decodes and returns the same metadata shape fake_decode_meta emits."""
    import hashlib

    import pytest

    from fast_pdf_parser_spark.multimodal import media as M

    monkeypatch.setattr(M, "_HAS_PIL", False)
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG...")

    class FakeImg:
        width, height, mode = 640, 480, "RGB"

        def getbands(self):
            return ("R", "G", "B")

    class FakeImage:
        @staticmethod
        def open(buf):
            assert buf.read(4) == b"\x89PNG"
            return FakeImg()

    monkeypatch.setattr(M, "_HAS_PIL", True)
    monkeypatch.setattr(M, "Image", FakeImage)
    data = b"\x89PNG fake payload"
    meta = M.decode_image(data)
    assert meta == {
        "media_type": "image", "width": 640, "height": 480, "channels": 3,
        "duration_ms": 0,
        "bytes_sha256": hashlib.sha256(data).hexdigest(),
        "n_bytes": len(data),
    }
    # unknown mode falls back to getbands()
    FakeImg.mode = "YCbCr"
    assert M.decode_image(data)["channels"] == 3


def test_resize_images_geometry_and_plan(spark):
    from pyspark.sql import functions as F

    from fast_pdf_parser_spark.multimodal.media import (
        fake_decode_meta, resize_images,
    )

    refs = [("d0", "media://img/a.png"), ("d1", "media://img/b.jpg"),
            ("d2", "media://aud/c.mp3")]  # audio row must be dropped
    df = spark.createDataFrame(refs, schema="doc_id string, media_ref string")
    out = resize_images(df, max_side=128)
    rows = {r.media_ref: r for r in out.collect()}
    assert set(rows) == {"media://img/a.png", "media://img/b.jpg"}
    for ref, r in rows.items():
        meta = fake_decode_meta(ref, None)
        assert (r.src_width, r.src_height) == (meta["width"], meta["height"])
        assert max(r.out_width, r.out_height) <= 128
        # aspect preserved within rounding
        assert abs(r.out_width / r.out_height
                   - r.src_width / r.src_height) < 0.05
        assert len(r.resized_sha256) == 64
    # zero-shuffle Arrow stage
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "MapInPandas" in plan
    _ = F  # imported for parity with sibling tests


def test_sample_frames_multiplicity_bounded(spark):
    from fast_pdf_parser_spark.multimodal.media import (
        fake_decode_meta, sample_frames,
    )

    refs = [("d0", "media://vid/a.mp4"), ("d1", "media://img/b.png")]
    df = spark.createDataFrame(refs, schema="doc_id string, media_ref string")
    out = sample_frames(df, every_ms=1000, max_frames=8).collect()
    assert all(r.media_ref == "media://vid/a.mp4" for r in out)
    dur = fake_decode_meta("media://vid/a.mp4", None)["duration_ms"]
    expected = min(dur // 1000 + 1, 8)
    assert len(out) == expected
    assert sorted(r.frame_index for r in out) == list(range(expected))
    assert all(r.timestamp_ms == r.frame_index * 1000 for r in out)
    # deterministic digests differ per frame
    assert len({r.frame_sha256 for r in out}) == expected
