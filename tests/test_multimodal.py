"""Real-codec multimodal tests: BMP/WAV build+parse round trips (pure
python), nearest-neighbor resize on actual pixel grids, and the
Spark-side decode/resize operators over valid media payloads."""

from __future__ import annotations

import struct

import pytest

from pyspark.sql import functions as F

from agent_data_pipeline_spark.llmdata import codecs, multimodal


# --- pure-python codec round trips ------------------------------------------


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (4, 4), (13, 7), (16, 5)])
def test_bmp_roundtrip(w, h):
    pixels = bytes((3 * x) % 256 for x in range(3 * w * h))
    payload = codecs.make_bmp(w, h, pixels)
    assert payload[:2] == b"BM"
    # file size field matches reality (a real header, not a sketch)
    (file_size,) = struct.unpack_from("<I", payload, 2)
    assert file_size == len(payload)
    pw, ph, bpp, back = codecs.parse_bmp(payload)
    assert (pw, ph, bpp) == (w, h, 24)
    assert back == pixels  # row padding + bottom-up flip both undone


def test_bmp_top_down_variant_parses():
    """Negative height marks a top-down BMP; the parser must not flip it."""
    pixels = bytes(range(3 * 2 * 2))
    payload = bytearray(codecs.make_bmp(2, 2, pixels))
    # patch height to -2 and re-order rows to top-down in the body
    struct.pack_into("<i", payload, 22, -2)
    row = codecs._bmp_row_size(2)
    off = 54
    r0 = bytes(payload[off : off + row])
    r1 = bytes(payload[off + row : off + 2 * row])
    payload[off : off + row] = r1
    payload[off + row : off + 2 * row] = r0
    _, ph, _, back = codecs.parse_bmp(bytes(payload))
    assert ph == 2 and back == pixels


def test_bmp_rejects_non_bmp_and_truncated():
    with pytest.raises(ValueError):
        codecs.parse_bmp(b"PNG not really")
    ok = codecs.make_bmp(4, 4, bytes(48))
    with pytest.raises(ValueError):
        codecs.parse_bmp(ok[: len(ok) - 10])


def test_resize_bmp_nearest_neighbor_exact():
    # 2x2 image with distinct corner colors; 2x upscale must replicate
    # each source pixel into a 2x2 block (nearest neighbor, no blending).
    px = {(0, 0): b"\x01\x02\x03", (1, 0): b"\x04\x05\x06",
          (0, 1): b"\x07\x08\x09", (1, 1): b"\x0a\x0b\x0c"}
    flat = px[(0, 0)] + px[(1, 0)] + px[(0, 1)] + px[(1, 1)]
    up = codecs.resize_bmp(codecs.make_bmp(2, 2, flat), 4, 4)
    w, h, _, pixels = codecs.parse_bmp(up)
    assert (w, h) == (4, 4)
    for y in range(4):
        for x in range(4):
            want = px[(x // 2, y // 2)]
            got = pixels[3 * (4 * y + x) : 3 * (4 * y + x) + 3]
            assert got == want, (x, y)
    # downsize back to 2x2 recovers the original corners
    _, _, _, down = codecs.parse_bmp(codecs.resize_bmp(up, 2, 2))
    assert down == flat


@pytest.mark.parametrize("rate,ch,n", [(8000, 1, 5), (44100, 2, 16), (16000, 1, 1)])
def test_wav_roundtrip(rate, ch, n):
    samples = [((7 * i) % 2000) - 1000 for i in range(n * ch)]
    payload = codecs.make_wav(rate, ch, samples)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    prate, pch, pframes, back = codecs.parse_wav(payload)
    assert (prate, pch, pframes) == (rate, ch, n)
    assert back == samples


def test_wav_chunk_walk_skips_unknown_chunks():
    """Parser must walk RIFF chunks, not assume fmt/data offsets."""
    base = codecs.make_wav(8000, 1, [1, 2, 3])
    # splice an unknown odd-sized chunk between WAVE and fmt
    extra = b"LIST" + struct.pack("<I", 5) + b"abcde" + b"\x00"  # word-aligned
    patched = base[:12] + extra + base[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate, ch, nf, samples = codecs.parse_wav(patched)
    assert (rate, ch, nf, samples) == (8000, 1, 3, [1, 2, 3])


def test_wav_rejects_non_pcm16():
    bad = bytearray(codecs.make_wav(8000, 1, [0]))
    struct.pack_into("<H", bad, 34, 8)  # bits-per-sample -> 8
    with pytest.raises(ValueError):
        codecs.parse_wav(bytes(bad))


# --- Spark-side operators over real payloads --------------------------------


def _media_df(spark, n=6):
    ids = spark.createDataFrame([(i,) for i in range(1, n + 1)], "doc_id long")
    return multimodal.synthesize_media(ids, "doc_id")


def test_decode_and_featurize_parses_real_headers(spark):
    feats = {r["media_id"]: r for r in multimodal.decode_and_featurize(_media_df(spark)).collect()}
    for i in range(1, 7):
        img = feats[2 * i]
        assert (img["width"], img["height"]) == (4 + i % 13, 4 + i % 7)
        assert img["n_frames"] == 1
        # constant-fill image: one histogram bucket holds everything
        assert max(img["feature"]) == pytest.approx(1.0)
        assert img["feature"].index(max(img["feature"])) == (i % 256) % 8
        aud = feats[2 * i + 1]
        assert aud["width"] == 8000 + (i % 8) * 1000   # sample_rate
        assert aud["height"] == 1 + i % 2              # channels
        assert aud["n_frames"] == 60 + i % 40


def test_resize_images_real_resample(spark):
    bmps = _media_df(spark).filter(F.col("modality") == "image")
    out = multimodal.resize_images(bmps, 8, 8).collect()
    assert len(out) == 6
    import hashlib

    for r in out:
        raw = bytes(r["payload"])
        w, h, _, pixels = codecs.parse_bmp(raw)
        assert (w, h) == (8, 8)
        # constant-fill source -> constant-fill resized
        assert len(set(pixels)) == 1
        assert r["byte_len"] == len(raw)
        assert r["sha256"] == hashlib.sha256(raw).hexdigest()


def test_resize_images_rejects_non_bmp(spark):
    audio = _media_df(spark).filter(F.col("modality") == "audio")
    with pytest.raises(Exception, match="not a BMP"):
        multimodal.resize_images(audio, 8, 8).collect()


def test_decode_is_total_over_corrupt_payloads(spark):
    """Payloads that SNIFF as media but are malformed — the common case
    for web-scraped corpora — must not fail the job: they flow through
    with decode_status='corrupt' and fallback features, alongside good
    BMP/WAV ('bmp'/'wav') and non-media ('fallback') rows."""
    good_bmp = codecs.make_bmp(4, 3, bytes([7]) * 36)
    good_wav = codecs.make_wav(8000, 1, [100] * 50)
    rows = [
        (1, "image", good_bmp, "image/bmp"),
        (2, "image", good_bmp[:20], "image/bmp"),            # truncated BMP
        (3, "audio", good_wav, "audio/wav"),
        (4, "audio", good_wav[:16], "audio/wav"),            # RIFF, chunks gone
        (5, "audio", b"RIFF\x10\x00\x00\x00WAVEjunkdata",    # WAVE, no fmt/data
         "audio/wav"),
        (6, "text", b"plain bytes payload", "text/plain"),
        # crafted header: claims width=-5 — must be rejected by the
        # parse_bmp bounds check, not silently decoded as empty pixels
        (7, "image",
         good_bmp[:18]
         + (-5).to_bytes(4, "little", signed=True)
         + good_bmp[22:], "image/bmp"),
    ]
    import hashlib

    media = spark.createDataFrame(
        [
            (i, mod, payload, mime, len(payload),
             hashlib.sha256(payload).hexdigest())
            for i, mod, payload, mime in rows
        ],
        multimodal.MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in multimodal.decode_and_featurize(media).collect()}
    assert len(out) == 7, "corrupt rows must not drop or fail the job"
    assert out[1]["decode_status"] == "bmp" and out[1]["width"] == 4
    assert out[3]["decode_status"] == "wav" and out[3]["width"] == 8000
    assert out[6]["decode_status"] == "fallback"
    for corrupt_id in (2, 4, 5, 7):
        assert out[corrupt_id]["decode_status"] == "corrupt", corrupt_id
        assert len(out[corrupt_id]["feature"]) == 8  # fallback histogram


def test_parse_bmp_rejects_implausible_dimensions():
    good = codecs.make_bmp(4, 3, bytes([7]) * 36)
    for w in (-5, 0, 1 << 21):
        bad = good[:18] + w.to_bytes(4, "little", signed=True) + good[22:]
        with pytest.raises(ValueError, match="implausible|truncated"):
            codecs.parse_bmp(bad)
    # zero height is meaningless too
    bad_h = good[:22] + (0).to_bytes(4, "little", signed=True) + good[26:]
    with pytest.raises(ValueError, match="implausible"):
        codecs.parse_bmp(bad_h)


def test_audio_signal_features_corrupt_payload_total(spark):
    """A payload that sniffs as RIFF but is truncated must land with
    decode_status='corrupt' and zeroed features — never a failed job —
    while well-formed rows in the same batch analyze normally."""
    import pandas as pd

    from agent_data_pipeline_spark.llmdata import codecs
    from agent_data_pipeline_spark.llmdata.multimodal import (
        audio_signal_features,
    )

    good = codecs.make_wav(8000, 1, [5, -5, 5, -5])
    bad = good[:20]  # truncated mid-header
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": pd.Series([1, 2], dtype="int64"),
                "payload": [good, bad],
            }
        )
    )
    rows = {r["media_id"]: r for r in audio_signal_features(df).collect()}
    assert rows[1]["decode_status"] == "ok"
    assert rows[1]["zero_crossings"] == 3 and rows[1]["rms"] == 5.0
    assert rows[2]["decode_status"] == "corrupt"
    assert rows[2]["n_samples"] == 0 and rows[2]["rms"] == 0.0


def test_image_dhash_planted_pairs(spark):
    """The dHash near-dup operator must recover EXACTLY the planted
    near-duplicate renders: P = R = 1.0 on the textured-BMP fixture
    (planted Hamming <= 3, cross-id >= 15 — measured margins documented
    in llmdata/phash.py)."""
    from agent_data_pipeline_spark.llmdata import phash

    base = spark.range(0, 240).selectExpr("id as doc_id")
    media = phash.synthesize_textured_images(base, "doc_id", near_dup_every=3)
    hashed = phash.with_dhash(media)
    got = {
        (r["id_a"], r["id_b"])
        for r in phash.hamming_pairs(hashed, max_hamming=6, blocks=8).collect()
    }
    truth = {(i - 1, i) for i in range(2, 240, 3)}
    assert got == truth, (len(got), len(truth), got - truth, truth - got)


def test_dhash_stable_under_resize(spark):
    """dHash of a nearest-neighbor downscale of the same SMOOTH image
    stays within the near-dup threshold — the property that makes it a
    PERCEPTUAL hash rather than a byte hash. (Smooth = band-limited:
    resize stability is a statement about content below the 9x8 sample
    grid's Nyquist rate; the planted-pair fixture's wrap textures
    deliberately alias and are covered by the exact-render test above.)"""
    from agent_data_pipeline_spark.llmdata import codecs as c
    from agent_data_pipeline_spark.llmdata.phash import dhash64

    def smooth_pixels(i, w, h):
        # non-wrapping diagonal ramp with a per-i bump: max value
        # 4*31 + 3*31 + 30 < 256, so no mod aliasing anywhere
        px = bytearray()
        for y in range(h):
            for x in range(w):
                v = 4 * x + 3 * y + (i * (x + y)) // (w + h)
                px += bytes((v, v, v))
        return bytes(px)

    for i in (1, 10, 25):
        big = c.make_bmp(32, 32, smooth_pixels(i, 32, 32))
        small = c.resize_bmp(big, 16, 16)
        d = bin((dhash64(big) ^ dhash64(small)) & ((1 << 64) - 1)).count("1")
        assert d <= 6, (i, d)


def test_image_channel_stats_reads_bgr_order(spark):
    """Regression (round-8 advice): a BMP built with KNOWN per-channel
    constants — B=10, G=20, R=30, i.e. make_bmp triplet bytes
    (10, 20, 30) per BGR contract (codecs.py:43) — must report
    r_mean=30 and b_mean=10. Before the fix, image_channel_stats read
    byte 0 as red AND synthesize_gradient_images wrote the gradient
    into byte 0, so the swap was mutually invisible to the fixture
    tests; this test pins the channel order against the codec contract
    itself, independent of any fixture."""
    import hashlib

    w, h = 4, 3
    payload = codecs.make_bmp(w, h, bytes((10, 20, 30)) * (w * h))
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), "image/bmp", len(payload),
          hashlib.sha256(payload).hexdigest())],
        "media_id long, modality string, payload binary, mime string, "
        "byte_len long, sha256 string",
    )
    row = multimodal.image_channel_stats(media).collect()[0]
    assert row["decode_status"] == "ok"
    assert row["r_mean"] == 30.0 and row["r_min"] == 30 and row["r_max"] == 30
    assert row["g_mean"] == 20.0
    assert row["b_mean"] == 10.0
    assert row["r_entropy_nats"] == 0.0


def test_gradient_fixture_red_channel_in_byte2(spark):
    """The gradient fixture's documented R(x,y)=base+x+7y must land in
    BGR byte 2 so a standards-conformant decoder sees the red gradient."""
    base_df = spark.createDataFrame([(5,)], "doc_id long")
    payload = bytes(
        multimodal.synthesize_gradient_images(base_df, "doc_id")
        .collect()[0]["payload"]
    )
    w, h, _bpp, px = codecs.parse_bmp(payload)
    i = 5
    base = i % 192
    assert (w, h) == (4 + i % 4, 4 + i % 5)
    for y in range(h):
        for x in range(w):
            r = base + x + 7 * y
            off = 3 * (y * w + x)
            assert px[off + 2] == r, (x, y)        # red in byte 2
            assert px[off + 1] == 255 - r, (x, y)  # green
            assert px[off] == base, (x, y)         # blue constant


def test_block_loudness_totality_and_exactness(spark):
    """audio_block_loudness: (a) corrupt payloads land as
    decode_status='corrupt' with zeroed stats (totality contract);
    (b) on the blocked square-wave fixture the per-block RMS is
    EXACTLY the block amplitude, so min/max match the arithmetic."""
    import hashlib

    base_df = spark.createDataFrame([(3,)], "doc_id long")
    good = multimodal.synthesize_block_wavs(base_df, "doc_id")
    bad = spark.createDataFrame(
        [(99, "audio", bytearray(b"RIFFgarbage"), "audio/wav", 11,
          hashlib.sha256(b"RIFFgarbage").hexdigest())],
        "media_id long, modality string, payload binary, mime string, "
        "byte_len long, sha256 string",
    )
    rows = {
        r["media_id"]: r
        for r in multimodal.audio_block_loudness(good.unionByName(bad)).collect()
    }
    ok = rows[3]
    i, nb = 3, 4 + 3 % 4
    amps = [1000 + 500 * ((i + b) % 5) for b in range(nb)]
    assert ok["decode_status"] == "ok"
    assert ok["n_blocks"] == nb
    assert ok["rms_min"] == float(min(amps))
    assert ok["rms_max"] == float(max(amps))
    corrupt = rows[99]
    assert corrupt["decode_status"] == "corrupt"
    assert corrupt["n_blocks"] == 0 and corrupt["rms_max"] == 0.0
