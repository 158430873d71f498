"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata.

The container has no image/audio codecs, so the decode kernels are
STUBBED (deterministic fakes / NotImplementedError as marked) — but the
Spark-side plumbing is real and tested: schema contract, Arrow-batched
``mapInPandas`` pipelines, batch shapes, partition sizing. Swapping the
stub for a real `PIL`/`torchaudio` call changes one function body and
nothing else.

Scale notes: binary payloads dominate row size, so these pipelines
(a) never shuffle payload bytes unless the operator requires it,
(b) use mapInPandas (per-partition Arrow batches) instead of per-row
UDFs, and (c) carry metadata in plain columns so filters on metadata
prune at the scan without touching payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id BIGINT, modality STRING, payload BINARY, "
    "mime STRING, byte_len BIGINT, sha256 STRING"
)

FEATURE_SCHEMA = (
    "media_id BIGINT, modality STRING, byte_len BIGINT, "
    "width INT, height INT, n_frames INT, feature ARRAY<FLOAT>"
)


def pack_media(
    df: DataFrame, payload_col: str, media_id_col: str, modality: str, mime: str
) -> DataFrame:
    """Wrap an existing binary column into the engine's media contract:
    typed metadata columns beside an opaque payload."""
    return df.select(
        F.col(media_id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.col(payload_col).alias("payload"),
        F.lit(mime).alias("mime"),
        F.length(F.col(payload_col)).cast("long").alias("byte_len"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
    )


def text_as_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic media fixture: utf-8 bytes of a text column as a
    binary payload (stands in for image bytes in tests)."""
    return pack_media(
        df.withColumn("_payload", F.encode(F.col(text_col), "UTF-8")),
        "_payload",
        id_col,
        "text",
        "text/plain",
    )


def _fake_decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decode kernel. A real implementation would be e.g.
    ``PIL.Image.open(io.BytesIO(payload))``; the container has no codec
    libraries, so this derives a deterministic fake (width, height,
    8-dim feature) from the bytes themselves. The Spark-side contract
    (batch iterator, Arrow schema) is identical either way."""
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    # Deterministic "feature": byte histogram over 8 buckets, normalized.
    hist = [0.0] * 8
    for b in payload[:4096]:
        hist[b % 8] += 1.0
    total = sum(hist) or 1.0
    return width, height, [h / total for h in hist]


def decode_and_featurize(media: DataFrame, frame_sample: int = 1) -> DataFrame:
    """Decode payloads and extract fixed-size features via mapInPandas.

    Arrow streams partition batches into pandas; the decode loop is
    per-batch Python (the genuinely non-vectorizable part); output is a
    typed feature row per media item. ``frame_sample`` is the video
    frame-sampling stride (stub: synthesizes n_frames deterministically).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # decode kernel nested here so the pickled closure is fully
        # self-contained (workers need no package import); same stub
        # contract as _fake_decode_image above.
        def decode(payload: bytes) -> tuple[int, int, list[float]]:
            n = len(payload)
            width = 16 + n % 64
            height = 16 + (n // 64) % 64
            hist = [0.0] * 8
            for byte in payload[:4096]:
                hist[byte % 8] += 1.0
            total = sum(hist) or 1.0
            return width, height, [h / total for h in hist]

        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "byte_len": pdf["byte_len"],
            }
            widths, heights, frames, feats = [], [], [], []
            for payload in pdf["payload"]:
                w, h, feat = decode(bytes(payload))
                widths.append(w)
                heights.append(h)
                frames.append(max(1, (w * h) // (1024 * frame_sample)))
                feats.append(feat)
            out["width"] = pd.Series(widths, dtype="int32")
            out["height"] = pd.Series(heights, dtype="int32")
            out["n_frames"] = pd.Series(frames, dtype="int32")
            out["feature"] = feats
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "media_id BIGINT, frame_idx BIGINT, frame_key STRING"


def sample_frames(
    media: DataFrame, stride: int = 4, bytes_per_frame: int = 16
) -> DataFrame:
    """Video frame-sampling plumbing: every ``stride``-th frame of each
    media item as its own row (the 1→N explode shape a frame extractor
    needs), via mapInPandas. The decode kernel is STUBBED — frame count
    derives from payload length and the frame key from the content hash —
    but the contract (Arrow batch in, multi-row batch out, typed schema)
    is exactly what a real ffmpeg/opencv kernel drops into.

    Only metadata columns ship to Python: a real kernel would add
    ``payload`` to the select, but nothing else changes — and the
    metadata-only variant is itself the production fast path for
    building frame MANIFESTS without moving payload bytes."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            keys: list[str] = []
            for mid, sha, blen in zip(
                pdf["media_id"], pdf["sha256"], pdf["byte_len"]
            ):
                n_frames = max(1, int(blen) // bytes_per_frame)
                for i in range(0, n_frames, stride):
                    ids.append(int(mid))
                    idxs.append(i)
                    keys.append(hashlib.md5(f"{sha}:{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_key": keys,
                }
            )

    return media.select("media_id", "sha256", "byte_len").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator — decode step not available in this
    container. The plumbing (signature, schema) is the engine contract;
    raising keeps the gap explicit rather than silently fake."""
    raise NotImplementedError(
        "resize requires an image codec (PIL/opencv) not present in this "
        "environment; wire _fake_decode_image-style kernel when available"
    )
