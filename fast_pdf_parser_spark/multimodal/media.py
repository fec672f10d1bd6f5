"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

Media payloads are opaque ``binary`` columns with typed metadata structs;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` stages. The Spark-side plumbing here — schemas, batch shape,
partition-friendly signatures — is real and tested; the actual codec step is
STUBBED because no image/audio library ships in this container:

- ``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless a
  real decoder (PIL / soundfile) is importable (import-try gated);
- ``fake_decode_meta`` provides a deterministic stand-in (seeded by the
  media_ref hash) so the distributed plumbing is testable end-to-end.

At 100 TB the binary column dominates bytes moved: these stages must stay
zero-shuffle (mapInPandas over whatever partitioning the scan produced) and
column-pruned (select only media_ref/content before the UDF), which is how
``extract_media_features`` is written.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

try:  # real decoder if ever available (not in this container)
    from PIL import Image  # type: ignore
    _HAS_PIL = True
except ImportError:
    Image = None  # type: ignore
    _HAS_PIL = False

MEDIA_FEATURES_DDL = (
    "doc_id string, media_ref string, media_type string, width int, "
    "height int, channels int, duration_ms int, bytes_sha256 string, "
    "n_bytes bigint, features array<float>"
)


def media_type_of(ref: str) -> str:
    ref = (ref or "").lower()
    if ref.endswith((".png", ".jpg", ".jpeg", ".gif", ".webp")):
        return "image"
    if ref.endswith((".mp3", ".wav", ".flac", ".ogg")):
        return "audio"
    if ref.endswith((".mp4", ".webm", ".mkv", ".avi")):
        return "video"
    return "unknown"


_CHANNELS = {"1": 1, "L": 1, "P": 1, "LA": 2, "RGB": 3, "RGBA": 4, "CMYK": 4}


def decode_image(data: bytes) -> dict:
    """Real image decode via PIL when importable (cluster images that ship
    it); raises NotImplementedError here, where no codec library exists —
    use fake_decode_meta for plumbing tests. Returns the same metadata
    shape fake_decode_meta produces for ``kind='image'``."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decoding requires PIL, which is not installed; "
            "use fake_decode_meta for plumbing tests"
        )
    import io

    img = Image.open(io.BytesIO(data))
    return {
        "media_type": "image",
        "width": int(img.width),
        "height": int(img.height),
        "channels": _CHANNELS.get(img.mode, len(img.getbands())),
        "duration_ms": 0,
        "bytes_sha256": hashlib.sha256(data).hexdigest(),
        "n_bytes": len(data),
    }


def fake_decode_meta(ref: str, data: bytes | None) -> dict:
    """Deterministic stand-in decode: metadata derived from the ref hash,
    byte stats from the (optional) payload."""
    h = hashlib.sha256((ref or "").encode("utf-8")).digest()
    kind = media_type_of(ref)
    width = 64 + h[0] * 8 if kind in ("image", "video") else 0
    height = 64 + h[1] * 8 if kind in ("image", "video") else 0
    channels = 1 + h[2] % 4 if kind == "image" else 0
    duration = 1000 + struct.unpack("<H", h[3:5])[0] if kind in (
        "audio", "video") else 0
    return {
        "media_type": kind,
        "width": int(width),
        "height": int(height),
        "channels": int(channels),
        "duration_ms": int(duration),
        "bytes_sha256": hashlib.sha256(data).hexdigest() if data else None,
        "n_bytes": len(data) if data else 0,
    }


def fake_features(ref: str, dim: int = 16) -> list[float]:
    """Deterministic unit-norm feature vector from the ref hash (the shape a
    real embedding model would produce).

    Every float op here (subtract/divide/square/left-to-right sum/sqrt) is
    mirrored term-for-term by the DuckDB oracle
    (relational._media_features_oracle_duck), so both engines produce
    bit-identical doubles; math.sqrt (not ``** 0.5``) keeps the square root
    correctly rounded on every libm."""
    import math

    h = hashlib.sha256(f"feat:{ref}".encode("utf-8")).digest()
    raw = [(h[i % 32] - 127.5) / 127.5 for i in range(dim)]
    norm = math.sqrt(sum(x * x for x in raw)) or 1.0
    return [float(x / norm) for x in raw]


def extract_media_features(df: DataFrame, feature_dim: int = 16) -> DataFrame:
    """(doc_id, media_ref[, content binary]) → metadata + feature rows.

    Zero-shuffle Arrow-batched stage; prunes to exactly the needed columns
    before the UDF so a 100 TB scan reads only what it must.
    """
    has_content = "content" in df.columns
    cols = ["doc_id", "media_ref"] + (["content"] if has_content else [])
    pruned = df.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                ref = pdf["media_ref"].iloc[i]
                data = bytes(pdf["content"].iloc[i]) if has_content and \
                    pdf["content"].iloc[i] is not None else None
                meta = fake_decode_meta(ref, data)
                rows.append({
                    "doc_id": pdf["doc_id"].iloc[i],
                    "media_ref": ref,
                    **meta,
                    "features": fake_features(ref, feature_dim),
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_ref", "media_type", "width",
                         "height", "channels", "duration_ms", "bytes_sha256",
                         "n_bytes", "features"],
            )

    return pruned.mapInPandas(run, schema=MEDIA_FEATURES_DDL)


RESIZED_DDL = (
    "doc_id string, media_ref string, src_width int, src_height int, "
    "out_width int, out_height int, resized_sha256 string"
)


_RESIZED_COLS = ["doc_id", "media_ref", "src_width", "src_height",
                 "out_width", "out_height", "resized_sha256"]


def resize_images(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize stage: (doc_id, media_ref) → target geometry + a
    deterministic digest of the (stub-)resized payload.

    Real plumbing, stubbed codec (same policy as decode): the
    aspect-preserving target geometry is computed exactly as a real resize
    would; the payload digest is a deterministic stand-in keyed by
    (ref, geometry). Only the two string columns enter the stage — with a
    stubbed codec, pulling the binary payload across the Arrow boundary
    would be pure waste, and at 100 TB the binary column dominates bytes
    moved (a real-codec variant would add `content` back and resize it).
    Output is yielded per Arrow batch, so worker memory is bounded by
    batch size, not partition size.
    """
    pruned = df.select("doc_id", "media_ref")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                ref = pdf["media_ref"].iloc[i]
                meta = fake_decode_meta(ref, None)
                if meta["media_type"] != "image":
                    continue
                w, h = meta["width"], meta["height"]
                scale = min(1.0, max_side / max(w, h, 1))
                # floor(x + 0.5), not round(): Python round() is banker's
                # rounding, which no SQL dialect reproduces — half-up keeps
                # the DuckDB oracle twin exact
                ow = max(1, int(w * scale + 0.5))
                oh = max(1, int(h * scale + 0.5))
                digest = hashlib.sha256(
                    f"resized:{ref}:{ow}x{oh}".encode("utf-8")).hexdigest()
                rows.append({
                    "doc_id": pdf["doc_id"].iloc[i], "media_ref": ref,
                    "src_width": w, "src_height": h,
                    "out_width": ow, "out_height": oh,
                    "resized_sha256": digest,
                })
            yield pd.DataFrame(rows, columns=_RESIZED_COLS)

    return pruned.mapInPandas(run, schema=RESIZED_DDL)


FRAMES_DDL = (
    "doc_id string, media_ref string, frame_index int, timestamp_ms int, "
    "frame_sha256 string"
)


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  max_frames: int = 32) -> DataFrame:
    """Video frame-sampling stage: one row per sampled frame (explode
    shape). Frame count derives from the (stub-)decoded duration exactly as
    a real decoder path would; the frame payload digest is the
    deterministic stand-in. Batch shape: a row with duration D yields
    min(D // every_ms + 1, max_frames) rows — the 100 TB consideration is
    the output multiplicity, bounded by max_frames per video.
    """
    pruned = df.select("doc_id", "media_ref")
    frame_cols = ["doc_id", "media_ref", "frame_index", "timestamp_ms",
                  "frame_sha256"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-batch yield: worker memory is bounded by
        # arrow_batch_rows x max_frames, never by partition size
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                ref = pdf["media_ref"].iloc[i]
                meta = fake_decode_meta(ref, None)
                if meta["media_type"] != "video":
                    continue
                n = min(meta["duration_ms"] // every_ms + 1, max_frames)
                for f in range(n):
                    ts = f * every_ms
                    rows.append({
                        "doc_id": pdf["doc_id"].iloc[i], "media_ref": ref,
                        "frame_index": f, "timestamp_ms": ts,
                        "frame_sha256": hashlib.sha256(
                            f"frame:{ref}:{ts}".encode()).hexdigest(),
                    })
            yield pd.DataFrame(rows, columns=frame_cols)

    return pruned.mapInPandas(run, schema=FRAMES_DDL)


def media_spans(result: DataFrame) -> DataFrame:
    """Select the media passthrough rows of a pipeline result — the input to
    extract_media_features in the flagship flow."""
    from pyspark.sql import functions as F

    return result.filter(F.col("kind") == "media").select("doc_id", "media_ref")
