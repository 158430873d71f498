"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode path is REAL for BMP (24bpp) and WAV (PCM16): stdlib
`struct`-based parsers in ``codecs.py`` — actual binary format
implementations, not fakes. Payloads that aren't one of those formats
(e.g. the text-as-bytes fixture) fall back to a deterministic
byte-histogram kernel, clearly marked below — and payloads that SNIFF
as BMP/WAV but are malformed (truncated, non-PCM16, corrupt RIFF) are
caught per row and routed to the same fallback with
``decode_status='corrupt'`` instead of failing the job, so the decode
operators are total over arbitrary bytes. Swapping in a richer codec set (`PIL`/`torchaudio`, absent in
this container) extends the same dispatch with more sniffed formats and
changes nothing Spark-side.

Scale notes: binary payloads dominate row size, so these pipelines
(a) never shuffle payload bytes unless the operator requires it,
(b) use mapInPandas (per-partition Arrow batches) instead of per-row
UDFs, and (c) carry metadata in plain columns so filters on metadata
prune at the scan without touching payloads.

The codec module is registered for pickle-by-value: python workers
unpickle the kernels without needing this package on their PYTHONPATH
(the engine may be imported by path, not installed).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark import cloudpickle
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..fns import spread
from . import codecs

cloudpickle.register_pickle_by_value(codecs)
# This module's own helpers (e.g. _decode_payload) are referenced from
# mapInPandas closures too — self-register at the bottom of the file.

MEDIA_SCHEMA = (
    "media_id BIGINT, modality STRING, payload BINARY, "
    "mime STRING, byte_len BIGINT, sha256 STRING"
)

FEATURE_SCHEMA = (
    "media_id BIGINT, modality STRING, byte_len BIGINT, "
    "width INT, height INT, n_frames INT, feature ARRAY<FLOAT>, "
    "decode_status STRING"
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


def _decode_payload(payload: bytes, frame_sample: int) -> tuple[int, int, int, list[float], str]:
    """Decode kernel: REAL header+content parse for BMP/WAV payloads
    (codecs.py), deterministic byte-histogram FALLBACK for anything else.
    Returns (width, height, n_frames, feature, decode_status) with
    status one of 'bmp' / 'wav' / 'fallback' / 'corrupt'.

    Totality: a payload that passes the magic-byte sniff but is
    malformed (truncated BMP, non-PCM16 or corrupt RIFF) must NOT fail
    the whole job — that is the common case for web-scraped media
    corpora. Parser errors (ValueError / struct.error) are caught
    per-row and routed to the byte-histogram fallback with
    decode_status='corrupt', so callers can filter or quarantine
    corrupt rows instead of losing the partition.

    Field mapping per modality: images -> (width, height, 1); audio ->
    (sample_rate, channels, n_frames) — one schema, documented overload,
    exactly how mixed-modality training manifests carry per-type dims.
    """
    kind = codecs.sniff(payload)
    status = kind if kind in ("bmp", "wav") else "fallback"
    try:
        if kind == "bmp":
            w, h, _bpp, pixels = codecs.parse_bmp(payload)
            hist = [0.0] * 8
            for b in pixels:
                hist[b % 8] += 1.0
            total = sum(hist) or 1.0
            return w, h, 1, [v / total for v in hist], status
        if kind == "wav":
            rate, channels, n_frames, samples = codecs.parse_wav(payload)
            hist = [0.0] * 8
            for s in samples:
                hist[s % 8] += 1.0
            total = sum(hist) or 1.0
            return rate, channels, n_frames, [v / total for v in hist], status
    except (ValueError, struct.error):
        status = "corrupt"
    # FALLBACK (non-media or corrupt payload): deterministic byte-derived
    # pseudo-dims + byte histogram — marked fake, never claimed as a decode.
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    hist = [0.0] * 8
    for byte in payload[:4096]:
        hist[byte % 8] += 1.0
    total = sum(hist) or 1.0
    return width, height, max(1, (width * height) // (1024 * frame_sample)), [
        v / total for v in hist
    ], status


def decode_and_featurize(media: DataFrame, frame_sample: int = 1) -> DataFrame:
    """Decode payloads and extract fixed-size features via mapInPandas.

    Arrow streams partition batches into pandas; the decode loop is
    per-batch Python (the genuinely non-vectorizable part); output is a
    typed feature row per media item. BMP/WAV payloads get a REAL binary
    parse (see ``_decode_payload``); others the documented fallback.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "byte_len": pdf["byte_len"],
            }
            widths, heights, frames, feats, statuses = [], [], [], [], []
            for payload in pdf["payload"]:
                w, h, nf, feat, status = _decode_payload(bytes(payload), frame_sample)
                widths.append(w)
                heights.append(h)
                frames.append(nf)
                feats.append(feat)
                statuses.append(status)
            out["width"] = pd.Series(widths, dtype="int32")
            out["height"] = pd.Series(heights, dtype="int32")
            out["n_frames"] = pd.Series(frames, dtype="int32")
            out["feature"] = feats
            out["decode_status"] = statuses
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


def synthesize_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL-media fixture: for each id, build one valid BMP
    and one valid WAV whose parameters are pure functions of the id —
    width = 4 + id % 13, height = 4 + id % 7, constant pixel id % 256;
    sample_rate = 8000 + (id % 8) * 1000, channels = 1 + id % 2,
    n_frames = 60 + id % 40, constant sample (id % 1000) - 500.

    Because every parameter is arithmetic on the id, a SQL oracle can
    predict exactly what a correct decoder must recover — which turns
    the codec round-trip into a hash-checkable differential test."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, modality, payloads, mimes = [], [], [], []
            for raw_id in pdf["_media_src_id"]:
                i = int(raw_id)
                w, h = 4 + i % 13, 4 + i % 7
                bmp = codecs.make_bmp(w, h, bytes([i % 256]) * (3 * w * h))
                rate, ch, nf = 8000 + (i % 8) * 1000, 1 + i % 2, 60 + i % 40
                wav = codecs.make_wav(rate, ch, [(i % 1000) - 500] * (nf * ch))
                ids += [2 * i, 2 * i + 1]
                modality += ["image", "audio"]
                payloads += [bmp, wav]
                mimes += ["image/bmp", "audio/wav"]
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "modality": modality,
                    "payload": payloads,
                    "mime": mimes,
                    "byte_len": pd.Series([len(p) for p in payloads], dtype="int64"),
                    "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                }
            )

    # spread: per-row Python synthesis is CPU-bound scan-stage work; on a
    # one-split source it ran in ONE worker. The exchange carries ids
    # only. No-op on a well-split input.
    return spread(
        df.select(F.col(id_col).cast("long").alias("_media_src_id"))
    ).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator: REAL nearest-neighbor resample of BMP
    payloads (codecs.resize_bmp), re-emitted under the media contract
    with recomputed byte_len/sha256. Non-BMP payloads raise — resizing
    audio bytes silently would be data corruption, and explicit failure
    is the engine contract for unsupported modalities.

    Payload bytes stay inside the partition (mapInPandas): no shuffle,
    no driver collection — the only cost at 100 TB is the per-row kernel.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                if codecs.sniff(raw) != "bmp":
                    raise ValueError(
                        f"resize_images: media_id={int(mid)} is not a BMP payload"
                    )
                payloads.append(codecs.resize_bmp(raw, width, height))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload": payloads,
                    "mime": pdf["mime"],
                    "byte_len": pd.Series([len(p) for p in payloads], dtype="int64"),
                    "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


import sys as _sys

cloudpickle.register_pickle_by_value(_sys.modules[__name__])


def synthesize_tonal_audio(df: DataFrame, id_col: str) -> DataFrame:
    """Square-wave WAV fixture for AUDIO ANALYSIS (not just header
    parsing): one mono PCM16 WAV per id whose signal is
    ``+A/-A`` alternating every ``p`` samples, with
    ``p = 2 + id % 5``, ``N = 60 + id % 40`` samples,
    ``A = 1 + id % 300``. Every analysis quantity is then a pure
    function of the id — zero crossings = floor((N-1)/p), RMS = A
    (IEEE sqrt of a perfect square is exact) — so a SQL oracle can
    hash-check features computed from a REAL decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, modality, payloads, mimes = [], [], [], []
            for raw_id in pdf["_media_src_id"]:
                i = int(raw_id)
                p, n, amp = 2 + i % 5, 60 + i % 40, 1 + i % 300
                samples = [amp if (k // p) % 2 == 0 else -amp for k in range(n)]
                wav = codecs.make_wav(8000, 1, samples)
                ids.append(i)
                modality.append("audio")
                payloads.append(wav)
                mimes.append("audio/wav")
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "modality": modality,
                    "payload": payloads,
                    "mime": mimes,
                    "byte_len": pd.Series(
                        [len(x) for x in payloads], dtype="int64"
                    ),
                    "sha256": [hashlib.sha256(x).hexdigest() for x in payloads],
                }
            )

    # spread: per-row Python synthesis is CPU-bound scan-stage work; on a
    # one-split source it ran in ONE worker. The exchange carries ids
    # only. No-op on a well-split input.
    return spread(
        df.select(F.col(id_col).cast("long").alias("_media_src_id"))
    ).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = (
    "media_id BIGINT, n_samples BIGINT, zero_crossings BIGINT, rms DOUBLE, "
    "decode_status STRING"
)


def audio_signal_features(media: DataFrame) -> DataFrame:
    """Signal-level audio featurization over REAL WAV decode: per
    payload, sample count, strict zero-crossing count
    (``s[k-1]·s[k] < 0``), and RMS energy — the fingerprints an audio
    curation pipeline filters on (silence, clipping, tone detection).
    Same totality contract as decode_and_featurize: malformed payloads
    land with status='corrupt' and zeroed features, never a failed job.
    Multi-channel signals analyze the interleaved stream (channel
    separation is a slicing detail the caller owns)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            out_rows = {
                "media_id": pdf["media_id"],
            }
            ns, zcs, rmss, statuses = [], [], [], []
            for payload in pdf["payload"]:
                try:
                    _rate, _ch, _nf, samples = codecs.parse_wav(bytes(payload))
                    n = len(samples)
                    zc = sum(
                        1
                        for a, b in zip(samples, samples[1:])
                        if a * b < 0
                    )
                    rms = (
                        math.sqrt(sum(s * s for s in samples) / n) if n else 0.0
                    )
                    ns.append(n)
                    zcs.append(zc)
                    rmss.append(rms)
                    statuses.append("ok")
                except (ValueError, struct.error):
                    ns.append(0)
                    zcs.append(0)
                    rmss.append(0.0)
                    statuses.append("corrupt")
            out_rows["n_samples"] = pd.Series(ns, dtype="int64")
            out_rows["zero_crossings"] = pd.Series(zcs, dtype="int64")
            out_rows["rms"] = pd.Series(rmss, dtype="float64")
            out_rows["decode_status"] = statuses
            yield pd.DataFrame(out_rows)

    return media.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


SPECTRAL_SCHEMA = (
    "media_id BIGINT, n_samples BIGINT, peak_bin BIGINT, "
    "peak_freq_hz DOUBLE, rms DOUBLE, decode_status STRING"
)


def synthesize_fft_audio(df: DataFrame, id_col: str) -> DataFrame:
    """Square-wave WAV fixture for SPECTRAL analysis: one mono PCM16
    WAV per id with N = 64 samples at 8 kHz whose full period
    ``p = 2^(2 + id % 4)`` (4/8/16/32 samples) exactly divides N, so
    the discrete spectrum is exactly periodic in the analysis window:
    the DFT is non-zero only at odd multiples of the fundamental bin
    ``N/p = 16 >> (id % 4)``, with the fundamental ~3x the strongest
    harmonic — the spectral argmax is therefore a pure function of the
    id and a SQL oracle can hash-check a REAL decode + FFT pipeline.
    Amplitude ``A = 1 + id % 300`` (exact RMS = A, perfect square)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, modality, payloads, mimes = [], [], [], []
            for raw_id in pdf["_media_src_id"]:
                i = int(raw_id)
                half = 1 << (1 + i % 4)  # half-period 2/4/8/16
                amp = 1 + i % 300
                samples = [
                    amp if (kk // half) % 2 == 0 else -amp for kk in range(64)
                ]
                wav = codecs.make_wav(8000, 1, samples)
                ids.append(i)
                modality.append("audio")
                payloads.append(wav)
                mimes.append("audio/wav")
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "modality": modality,
                    "payload": payloads,
                    "mime": mimes,
                    "byte_len": pd.Series(
                        [len(x) for x in payloads], dtype="int64"
                    ),
                    "sha256": [hashlib.sha256(x).hexdigest() for x in payloads],
                }
            )

    # spread: per-row Python synthesis is CPU-bound scan-stage work; on a
    # one-split source it ran in ONE worker. The exchange carries ids
    # only. No-op on a well-split input.
    return spread(
        df.select(F.col(id_col).cast("long").alias("_media_src_id"))
    ).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def audio_spectral_peak(media: DataFrame) -> DataFrame:
    """Dominant-frequency estimation over a REAL PCM16 decode: rFFT of
    the raw sample vector (numpy, Arrow-batched — never row-at-a-time
    Python), argmax of |X_k| over the positive-frequency bins
    k = 1..N/2, reported as bin index and Hz (bin * rate / N), plus
    exact RMS. Same totality contract as audio_signal_features:
    malformed payloads land with decode_status='corrupt' and zeroed
    features, never a failed job. At 100 TB this is payload-local
    (zero shuffle): each task decodes and transforms only its own
    partition's clips."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in batches:
            ns, bins, freqs, rmss, statuses = [], [], [], [], []
            for payload in pdf["payload"]:
                try:
                    rate, _ch, _nf, samples = codecs.parse_wav(bytes(payload))
                    n = len(samples)
                    if n < 2:
                        raise ValueError("too short for a spectrum")
                    x = np.asarray(samples, dtype=np.float64)
                    mag = np.abs(np.fft.rfft(x))
                    # positive-frequency bins only (skip DC; rfft length
                    # is n//2 + 1, inclusive of Nyquist for even n)
                    peak = int(np.argmax(mag[1:])) + 1
                    ns.append(n)
                    bins.append(peak)
                    freqs.append(peak * rate / n)
                    rmss.append(math.sqrt(float(np.dot(x, x)) / n))
                    statuses.append("ok")
                except (ValueError, struct.error):
                    ns.append(0)
                    bins.append(0)
                    freqs.append(0.0)
                    rmss.append(0.0)
                    statuses.append("corrupt")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "peak_bin": pd.Series(bins, dtype="int64"),
                    "peak_freq_hz": pd.Series(freqs, dtype="float64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                    "decode_status": statuses,
                }
            )

    return media.mapInPandas(run, schema=SPECTRAL_SCHEMA)


CHANNEL_SCHEMA = (
    "media_id BIGINT, width INT, height INT, "
    "r_mean DOUBLE, r_min BIGINT, r_max BIGINT, "
    "g_mean DOUBLE, b_mean DOUBLE, r_entropy_nats DOUBLE, "
    "decode_status STRING"
)


def synthesize_gradient_images(df: DataFrame, id_col: str) -> DataFrame:
    """Gradient BMP fixture for CHANNEL-STATISTICS analysis: per id a
    w×h BMP (w = 4 + id%4 ≤ 7, h = 4 + id%5 ≤ 8) whose red channel is
    the gradient R(x, y) = base + x + 7·y with base = id % 192 — no
    modular wrap (max 191+6+49 = 246 < 256) and, because w ≤ 7, every
    (x, y) yields a DISTINCT R value, so the red histogram is exactly
    uniform over w·h values: mean = base + (w−1)/2 + 7(h−1)/2,
    min = base, max = base + (w−1) + 7(h−1), entropy = ln(w·h) — all
    pure arithmetic an SQL oracle can state. G = 255 − R (perfect
    anti-correlation), B = base (constant)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, modality, payloads, mimes = [], [], [], []
            for raw_id in pdf["_media_src_id"]:
                i = int(raw_id)
                w, h, base = 4 + i % 4, 4 + i % 5, i % 192
                px = bytearray()
                for y in range(h):
                    for x in range(w):
                        r = base + x + 7 * y
                        # make_bmp consumes BGR triplets (codecs.py:43):
                        # the R gradient goes in byte 2, B=base in byte 0.
                        px += bytes((base, 255 - r, r))
                payloads.append(codecs.make_bmp(w, h, bytes(px)))
                ids.append(i)
                modality.append("image")
                mimes.append("image/bmp")
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "modality": modality,
                    "payload": payloads,
                    "mime": mimes,
                    "byte_len": pd.Series(
                        [len(x) for x in payloads], dtype="int64"
                    ),
                    "sha256": [hashlib.sha256(x).hexdigest() for x in payloads],
                }
            )

    # spread: per-row Python synthesis is CPU-bound scan-stage work; on a
    # one-split source it ran in ONE worker. The exchange carries ids
    # only. No-op on a well-split input.
    return spread(
        df.select(F.col(id_col).cast("long").alias("_media_src_id"))
    ).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def image_channel_stats(media: DataFrame) -> DataFrame:
    """Per-image channel statistics over a REAL BMP decode: R mean /
    min / max, G and B means, and the empirical entropy of the R
    histogram in nats — the exposure/contrast screening pass of an
    image curation pipeline. Payload-local (zero shuffle); corrupt
    payloads land with decode_status='corrupt' and zeroed stats."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            ws, hs = [], []
            rm, rmin, rmax, gm, bm, ent, statuses = (
                [], [], [], [], [], [], [],
            )
            for payload in pdf["payload"]:
                try:
                    w, h, _bpp, px = codecs.parse_bmp(bytes(payload))
                    n = w * h
                    # parse_bmp yields BGR triplets: byte 0 is BLUE,
                    # byte 2 is RED (codecs.py:66) — a BMP from any
                    # standard tool stores this order, so read it.
                    bs = [px[3 * i] for i in range(n)]
                    gs = [px[3 * i + 1] for i in range(n)]
                    rs = [px[3 * i + 2] for i in range(n)]
                    hist: dict[int, int] = {}
                    for r in rs:
                        hist[r] = hist.get(r, 0) + 1
                    e = -sum(
                        (c / n) * math.log(c / n) for c in hist.values()
                    )
                    ws.append(w)
                    hs.append(h)
                    rm.append(sum(rs) / n)
                    rmin.append(min(rs))
                    rmax.append(max(rs))
                    gm.append(sum(gs) / n)
                    bm.append(sum(bs) / n)
                    ent.append(e)
                    statuses.append("ok")
                except (ValueError, struct.error, IndexError):
                    ws.append(0)
                    hs.append(0)
                    rm.append(0.0)
                    rmin.append(0)
                    rmax.append(0)
                    gm.append(0.0)
                    bm.append(0.0)
                    ent.append(0.0)
                    statuses.append("corrupt")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "r_mean": pd.Series(rm, dtype="float64"),
                    "r_min": pd.Series(rmin, dtype="int64"),
                    "r_max": pd.Series(rmax, dtype="int64"),
                    "g_mean": pd.Series(gm, dtype="float64"),
                    "b_mean": pd.Series(bm, dtype="float64"),
                    "r_entropy_nats": pd.Series(ent, dtype="float64"),
                    "decode_status": statuses,
                }
            )

    return media.mapInPandas(run, schema=CHANNEL_SCHEMA)


BLOCK_LOUDNESS_SCHEMA = (
    "media_id BIGINT, n_blocks INT, "
    "rms_min DOUBLE, rms_max DOUBLE, rms_mean DOUBLE, "
    "dyn_range_db DOUBLE, peak_dbfs DOUBLE, decode_status STRING"
)

_LOUDNESS_BLOCK = 256  # samples per loudness block


def synthesize_block_wavs(
    df: DataFrame, id_col: str, nb_mod: int = 4, amp_mod: int = 5
) -> DataFrame:
    """Blocked square-wave WAV fixture for LOUDNESS analysis: per id a
    mono PCM16 WAV of ``nb = 4 + id % nb_mod`` blocks of 256 samples;
    block ``b`` is a ±A square wave with
    ``A(id, b) = 1000 + 500·((id+b) % amp_mod)`` — per-block RMS is
    exactly A (sqrt of a perfect square is exact in IEEE double), and
    because b spans ≥ 4 consecutive residues, every media has ≥ 4
    DISTINCT block amplitudes when amp_mod ≥ 4 (rms_max ≠ rms_min — no
    degenerate dynamic range). All outputs are pure arithmetic
    functions of the id that a SQL oracle can state.

    The defaults (4, 5) are the original recipe ``wav_block_loudness``
    oracles against; its period lcm(4,5)=20 aliases with the fixture's
    source = doc_id % 20 assignment, so PER-SOURCE rollups must pick
    moduli coprime with 20 (e.g. (3, 7), period 21 — see
    ``audio_source_curation_join``) or every source is one constant
    loudness value (degenerate-fixture-labels)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, modality, payloads, mimes = [], [], [], []
            for raw_id in pdf["_media_src_id"]:
                i = int(raw_id)
                nb = 4 + i % nb_mod
                samples: list[int] = []
                for b in range(nb):
                    amp = 1000 + 500 * ((i + b) % amp_mod)
                    samples.extend(
                        amp if kk % 2 == 0 else -amp
                        for kk in range(_LOUDNESS_BLOCK)
                    )
                wav = codecs.make_wav(8000, 1, samples)
                ids.append(i)
                modality.append("audio")
                payloads.append(wav)
                mimes.append("audio/wav")
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "modality": modality,
                    "payload": payloads,
                    "mime": mimes,
                    "byte_len": pd.Series(
                        [len(x) for x in payloads], dtype="int64"
                    ),
                    "sha256": [hashlib.sha256(x).hexdigest() for x in payloads],
                }
            )

    # spread: per-row Python synthesis is CPU-bound scan-stage work; on a
    # one-split source it ran in ONE worker. The exchange carries ids
    # only. No-op on a well-split input.
    return spread(
        df.select(F.col(id_col).cast("long").alias("_media_src_id"))
    ).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def audio_block_loudness(media: DataFrame) -> DataFrame:
    """Per-block loudness profile over a REAL PCM16 decode: the clip is
    cut into 256-sample blocks (trailing partial block dropped), each
    block's RMS computed vectorized (numpy reshape + one einsum — never
    per-sample Python), then summarized per media: block count, min /
    max / mean block RMS, dynamic range 20·log10(max/min) dB and peak
    block level 20·log10(max/32768) dBFS — the gain-staging screening
    pass of an audio curation pipeline (clipped or near-silent clips
    fail cheap thresholds on these columns). Payload-local, zero
    shuffle; corrupt or too-short payloads land with
    decode_status='corrupt' and zeroed stats, never a failed job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in batches:
            nbs, rmins, rmaxs, rmeans, dyns, peaks, statuses = (
                [], [], [], [], [], [], [],
            )
            for payload in pdf["payload"]:
                try:
                    _rate, ch, _n, samples = codecs.parse_wav(bytes(payload))
                    if ch != 1:
                        raise ValueError("mono expected")
                    nb = len(samples) // _LOUDNESS_BLOCK
                    if nb < 1:
                        raise ValueError("shorter than one block")
                    x = np.asarray(
                        samples[: nb * _LOUDNESS_BLOCK], dtype=np.float64
                    ).reshape(nb, _LOUDNESS_BLOCK)
                    rms = np.sqrt(np.einsum("ij,ij->i", x, x) / _LOUDNESS_BLOCK)
                    rmin, rmax = float(rms.min()), float(rms.max())
                    nbs.append(nb)
                    rmins.append(rmin)
                    rmaxs.append(rmax)
                    rmeans.append(float(rms.mean()))
                    dyns.append(
                        20.0 * math.log10(rmax / rmin) if rmin > 0 else 0.0
                    )
                    peaks.append(
                        20.0 * math.log10(rmax / 32768.0) if rmax > 0 else 0.0
                    )
                    statuses.append("ok")
                except (ValueError, struct.error, IndexError):
                    nbs.append(0)
                    rmins.append(0.0)
                    rmaxs.append(0.0)
                    rmeans.append(0.0)
                    dyns.append(0.0)
                    peaks.append(0.0)
                    statuses.append("corrupt")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_blocks": pd.Series(nbs, dtype="int32"),
                    "rms_min": pd.Series(rmins, dtype="float64"),
                    "rms_max": pd.Series(rmaxs, dtype="float64"),
                    "rms_mean": pd.Series(rmeans, dtype="float64"),
                    "dyn_range_db": pd.Series(dyns, dtype="float64"),
                    "peak_dbfs": pd.Series(peaks, dtype="float64"),
                    "decode_status": statuses,
                }
            )

    return media.mapInPandas(run, schema=BLOCK_LOUDNESS_SCHEMA)
