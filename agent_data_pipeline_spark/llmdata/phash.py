"""Perceptual image hashing (dHash) and blocked Hamming near-dup pairs
over binary image payloads.

Text dedup has MinHash/SimHash; image dedup's workhorse is a perceptual
hash: a tiny fingerprint that is STABLE under small pixel edits
(re-encode noise, light watermarks) but different for different
pictures. dHash (difference hash) is the standard cheap one: grayscale,
downsample to a 9×8 grid, emit one bit per horizontal gradient sign —
64 bits total. Near-duplicate images differ in a few bits; unrelated
images differ in ~32.

Spark shape (the part that matters at 100 TB):

* hashing is an Arrow-batched ``mapInPandas`` kernel over the payload
  column — O(payload bytes) per row, embarrassingly parallel, no
  shuffle;
* candidate generation reuses the SimHash pigeonhole trick
  (``llmdata/dedup.py simhash_hamming_pairs`` — reference pattern): the
  64-bit hash splits into ``blocks`` chunks, any pair within Hamming
  distance < blocks must agree on ≥1 chunk, so candidates come from a
  (chunk_id, chunk_value) equi-join — never an n² cross join — and the
  exact Hamming check is one xor+bit_count per candidate.

The decode step uses the repo's stdlib BMP codec (``codecs.parse_bmp``)
— the container ships no PIL; for real deployments the kernel body
swaps to a library decode with the identical Spark plumbing.

Reference parity: the reference pipeline has no image processing at all
(SURVEY.md §2.A); this belongs to the declared multimodal north-star
surface (§2.B).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..fns import spread
from . import codecs


def dhash64(payload: bytes) -> int:
    """64-bit dHash of a 24bpp BMP payload: grayscale (channel mean) →
    9×8 nearest-neighbor downsample → bit i = (right pixel brighter
    than left). Returned as a SIGNED 64-bit int (two's complement) so
    it stores in a Spark LongType losslessly."""
    w, h, _bpp, pix = codecs.parse_bmp(payload)
    arr = (
        np.frombuffer(pix, dtype=np.uint8)
        .reshape(h, w, 3)
        .astype(np.float64)
        .mean(axis=2)
    )
    xs = (np.arange(9) * w) // 9
    ys = (np.arange(8) * h) // 8
    g = arr[np.ix_(ys, xs)]
    bits = (g[:, 1:] > g[:, :-1]).ravel()
    val = 0
    for i, bit in enumerate(bits):
        if bit:
            val |= 1 << i
    return val - (1 << 64) if val >= 1 << 63 else val


def with_dhash(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Add a ``dhash`` LongType column: one Arrow-batched kernel pass,
    payload-local (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "dhash": pd.Series(
                        [dhash64(p) for p in pdf[payload_col]], dtype="int64"
                    ),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, dhash long"
    )


def hamming_pairs(
    hashed: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    max_hamming: int = 6,
    blocks: int = 8,
) -> DataFrame:
    """Blocked Hamming near-dup pairs over ANY precomputed 64-bit hash
    column. Pigeonhole: ``max_hamming < blocks`` guarantees a matching
    chunk, so recall is exact (no false negatives) while candidates
    stay a chunk-value equi-join."""
    if max_hamming >= blocks:
        raise ValueError("need max_hamming < blocks for exact pigeonhole recall")
    width = 64 // blocks
    chunk_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftrightunsigned(F.col(hash_col), i * width)
                .bitwiseAND(F.lit((1 << width) - 1).cast("long"))
                .alias("val"),
            )
            for i in range(blocks)
        ]
    )
    ch = hashed.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("hsh"),
        F.explode(chunk_arr).alias("c"),
    ).select("id", "hsh", F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val"))
    a, b = ch.alias("a"), ch.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.hsh").alias("h_a"),
            F.col("b.hsh").alias("h_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def synthesize_textured_images(
    df: DataFrame, id_col: str, near_dup_every: int = 3, size: int = 32
) -> DataFrame:
    """Deterministic textured-BMP fixture with PLANTED near-duplicates.

    For each id a 24bpp BMP whose gray value at (x, y) is
    ``(A·x + B·y + C·x·y + E·x² + G·y² + D) mod 256`` with per-id
    coefficients — the nonlinear cross and quadratic terms give every
    id a distinct gradient structure (measured over 240 ids: cross-id
    dHash Hamming ≥ 15, median ~32). Every id with
    ``id % near_dup_every == near_dup_every - 1`` instead re-renders
    the PREVIOUS id's pattern with a sparse +10 perturbation along
    ``(x+y) % 16 == 0`` (measured: dHash Hamming ≤ 3) — so the planted
    near-dup truth set is exactly {(id−1, id)} for those ids, with a
    ≥12-bit margin to the Hamming-6 match threshold."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = h = size

        def pixels(pattern_id: int, perturb: int) -> bytes:
            a_c = 1 + (pattern_id * 17) % 31
            b_c = 2 + (pattern_id * 23) % 29
            c_c = 1 + (pattern_id * 13) % 11
            e_c = 1 + (pattern_id * 7) % 13
            g_c = 2 + (pattern_id * 11) % 7
            d_c = (pattern_id * 29) % 256
            px = bytearray()
            for y in range(h):
                for x in range(w):
                    v = (
                        a_c * x + b_c * y + c_c * x * y
                        + e_c * x * x + g_c * y * y + d_c
                    ) % 256
                    if perturb and (x + y) % 16 == 0:
                        v = (v + perturb) % 256
                    px += bytes((v, v, v))
            return bytes(px)

        for pdf in batches:
            ids, payloads, is_dup = [], [], []
            for raw in pdf["_img_src_id"]:
                i = int(raw)
                dup = i % near_dup_every == near_dup_every - 1 and i > 0
                pattern = i - 1 if dup else i
                payloads.append(codecs.make_bmp(w, h, pixels(pattern, 10 if dup else 0)))
                ids.append(i)
                is_dup.append(dup)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "payload": payloads,
                    "is_planted_dup": pd.Series(is_dup, dtype="bool"),
                }
            )

    # spread (see multimodal.py): parallelize per-row synthesis kernels
    return spread(
        df.select(F.col(id_col).cast("long").alias("_img_src_id"))
    ).mapInPandas(
        run, schema="media_id long, payload binary, is_planted_dup boolean"
    )
