"""Image perceptual-hash near-dup — the multimodal cell of the dedup
matrix (exact / MinHash / SimHash / embedding-cosine tiers all exist
for text and vectors; this adds images).

Average-hash (aHash) over REALLY DECODED pixels: the Spark kernel
zlib-inflates and unfilters each PNG (decode_png_pixels — chunk walk,
CRC check, all five filter types), projects the 3-channel image onto
an 8x8 grid of cell luminance sums, and sets bit (cy*8+cx) where the
cell's mean exceeds the global mean. All comparisons are integer
cross-multiplications (cell_sum * tot_n > tot_sum * cell_n) so the
hash is bit-exact reproducible with no float in sight. The 64 bits
are carried as FOUR 16-bit quarter values (q0..q3) rather than one
BIGINT — bit 63 would wrap a signed 64-bit assembly and ">>" sign
semantics differ across engines; four small non-negative ints have no
such hazards and are exactly what the pigeonhole join needs anyway.

Pairing is the SimHash recipe (registry_funnel): hamming <= 3 over 64
bits guarantees at least one of the 4 quarters is untouched, so four
quarter-equality equi-joins (unioned + distinct — never an OR join,
which would plan as a nested loop) generate candidates and an exact
popcount(xor) sum verifies.

ROUND 10 — content entropy + planted twins: the round-9 corpus reused
attach_png_payload's closed form, whose pixel value depends on doc_id
ONLY through doc_id % 256 — any corpus contains exactly 256 distinct
images, so near-dup output was Theta(n^2/256) BY CORPUS CONSTRUCTION
and the operator's true scale shape was unmeasurable (round-9 verdict
watch item).  This query now generates its own corpus: the pixel seed
pd = d XOR (d>>8) XOR (d>>16) XOR (d>>24) mixes every bit of doc_id
(content period 2^32 — no accidental dups at any testable scale), and
ground truth is PLANTED the way the audio cell plants it: each doc
contributes its image AND a POSTERIZED re-export twin (every pixel
quantized to a multiple of 8 — the JPEG-ish lossy re-encode), keyed
vid = doc_id*2 + variant — the near-dup an exact byte-hash misses
but the aHash catches (measured twin hamming mean 0.52, recall 0.99
at tau=3; a uniform brightness nudge was rejected because the
sawtooth base image puts every cell near the threshold and flips
~18 of 64 bits).  attach_png_payload itself is unchanged (the
per-doc decode/feature queries that share it do no pairing, so its
entropy is irrelevant there).

The DuckDB oracle never decodes a PNG: it recomputes the SAME hash
analytically from the generator's closed form (pixel(y,x,c) =
(pd + 31y + 7x + 83c) % 256, posterized to //8*8 for variant 1, at
w = d%32+4, h = (7d)%32+4), enumerating pixels with range() cross
joins. The Spark side must round-trip the real bytes; agreement means
encode -> decode -> hash is lossless end-to-end.

At 100 TB: hashing is one mapInPandas scan (Arrow-batched, payloads
never leave executors); the candidate join shuffles on 16-bit quarter
values — 65536 keys per quarter, so band buckets stay O(n/65536) and
degenerate quarters (letterboxed black quadrants — the boilerplate-
cluster problem) take the bucket_cap guard below.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.multimodal import (
    decode_png_pixels,
    encode_png,
)
from stockpulse_spark.plans.registry import _register, _t

_AHASH_SCHEMA = "vid long, q0 long, q1 long, q2 long, q3 long"

# Quarter-bucket cap for the pigeonhole joins (round 9): degenerate
# flat/periodic quarters (q = 0, 0x5555, ...) pile hundreds of images
# onto one 16-bit key — the 10x audit measured the uncapped join at
# 60x shuffle growth.  256 is a no-op at sf0.1 (max observed bucket
# ~60) and trips only the degenerate values at 10x (~390-590); the
# oracle mirrors it in the qw CTE so both engines agree when it fires.
_IMAGE_BUCKET_CAP = 256


def _attach_png_variants(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Both image variants per doc: variant 0 from the full-entropy
    closed form below, variant 1 posterizes every pixel to a multiple
    of 8 (the lossy re-export twin). Real PNGs either way — the
    encoder cycles all five PNG filter types."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids, payloads = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                w = d % 32 + 4
                h = (d * 7) % 32 + 4
                pd_seed = d ^ (d >> 8) ^ (d >> 16) ^ (d >> 24)
                y, x, c = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                base = (pd_seed + 31 * y + 7 * x + 83 * c) % 256
                for variant in (0, 1):
                    pix = (base if variant == 0 else (base // 8) * 8)
                    vids.append(d * 2 + variant)
                    payloads.append(
                        encode_png(w, h, pix.astype(np.uint8).tobytes())
                    )
            yield pd.DataFrame({"vid": vids, "payload": payloads})

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        kernel, schema="vid long, payload binary"
    )


def png_ahash_quarters(df: DataFrame, id_col: str = "vid") -> DataFrame:
    """payload -> 8x8 average-hash as four 16-bit quarters.  Decode
    failures dead-letter to NULL quarters (excluded from pairing)."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    w, h, ch, pix = decode_png_pixels(bytes(payload))
                    arr = (
                        np.frombuffer(pix, np.uint8)
                        .astype(np.int64)
                        .reshape(h, w, ch)
                    )
                    g = arr.sum(axis=2)
                    cy = (np.arange(h) * 8) // h
                    cx = (np.arange(w) * 8) // w
                    cell = (cy[:, None] * 8 + cx[None, :]).ravel()
                    cs = np.zeros(64, dtype=np.int64)
                    cn = np.zeros(64, dtype=np.int64)
                    np.add.at(cs, cell, g.ravel())
                    np.add.at(cn, cell, 1)
                    tot_s = int(g.sum())
                    tot_n = w * h
                    bits = cs * tot_n > tot_s * cn
                    q = [0, 0, 0, 0]
                    for b in range(64):
                        if bits[b]:
                            q[b // 16] |= 1 << (b % 16)
                    rows.append(
                        dict(vid=int(vid), q0=q[0], q1=q[1],
                             q2=q[2], q3=q[3])
                    )
                except ValueError:
                    rows.append(
                        dict(vid=int(vid), q0=None, q1=None,
                             q2=None, q3=None)
                    )
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col).alias("vid"), "payload").mapInPandas(
        kernel, schema=_AHASH_SCHEMA
    )


@_register(
    "image_phash_near_dup",
    oracle=f"""
    WITH docs AS (
      SELECT d, v, d * 2 + v AS vid,
             d % 32 + 4 AS w,
             (d * 7) % 32 + 4 AS h,
             xor(xor(xor(d, d // 256), d // 65536), d // 16777216) AS pd
      FROM (SELECT DISTINCT doc_id AS d FROM documents
            WHERE doc_id IS NOT NULL),
           (VALUES (0), (1)) AS var(v)
    ), px0 AS (
      SELECT vid, v, w, h, yy.y AS y, xx.x AS x,
             (pd + 31*yy.y + 7*xx.x) % 256 AS p0,
             (pd + 31*yy.y + 7*xx.x + 83) % 256 AS p1,
             (pd + 31*yy.y + 7*xx.x + 166) % 256 AS p2
      FROM docs, range(0, 36) AS yy(y), range(0, 36) AS xx(x)
      WHERE yy.y < h AND xx.x < w
    ), px AS (
      -- variant 1 is the posterized re-export: each channel //8*8
      SELECT vid, w, h, y, x,
             CASE WHEN v = 1
                  THEN (p0//8)*8 + (p1//8)*8 + (p2//8)*8
                  ELSE p0 + p1 + p2 END AS g
      FROM px0
    ), cell_agg AS (
      SELECT vid, ((y*8)//h)*8 + (x*8)//w AS b,
             SUM(g) AS cs, COUNT(*) AS cn
      FROM px GROUP BY vid, b
    ), tot AS (
      SELECT vid, SUM(g) AS ts, COUNT(*) AS tn FROM px GROUP BY vid
    ), q AS (
      SELECT c.vid,
        CAST(SUM(CASE WHEN b // 16 = 0 AND c.cs*t.tn > t.ts*c.cn
                 THEN 1 << (b % 16) ELSE 0 END) AS BIGINT) AS q0,
        CAST(SUM(CASE WHEN b // 16 = 1 AND c.cs*t.tn > t.ts*c.cn
                 THEN 1 << (b % 16) ELSE 0 END) AS BIGINT) AS q1,
        CAST(SUM(CASE WHEN b // 16 = 2 AND c.cs*t.tn > t.ts*c.cn
                 THEN 1 << (b % 16) ELSE 0 END) AS BIGINT) AS q2,
        CAST(SUM(CASE WHEN b // 16 = 3 AND c.cs*t.tn > t.ts*c.cn
                 THEN 1 << (b % 16) ELSE 0 END) AS BIGINT) AS q3
      FROM cell_agg c JOIN tot t USING (vid) GROUP BY c.vid
    ), qw AS (
      -- bucket_cap mirror (round 9, same contract as the audio fpw
      -- CTE): a quarter bucket over the cap is excluded from THAT
      -- quarter's pairing — degenerate flat/periodic quarters pile
      -- hundreds of images onto one key and carry no signal
      SELECT q.*,
             COUNT(*) OVER (PARTITION BY q0) AS n0,
             COUNT(*) OVER (PARTITION BY q1) AS n1,
             COUNT(*) OVER (PARTITION BY q2) AS n2,
             COUNT(*) OVER (PARTITION BY q3) AS n3
      FROM q
    ), pairs AS (
      SELECT DISTINCT a.vid AS vid_1, b.vid AS vid_2,
             a.q0 AS a0, a.q1 AS a1, a.q2 AS a2, a.q3 AS a3,
             b.q0 AS b0, b.q1 AS b1, b.q2 AS b2, b.q3 AS b3
      FROM qw a JOIN qw b
        ON a.vid < b.vid
       AND ((a.q0 = b.q0 AND a.n0 <= {_IMAGE_BUCKET_CAP})
         OR (a.q1 = b.q1 AND a.n1 <= {_IMAGE_BUCKET_CAP})
         OR (a.q2 = b.q2 AND a.n2 <= {_IMAGE_BUCKET_CAP})
         OR (a.q3 = b.q3 AND a.n3 <= {_IMAGE_BUCKET_CAP}))
    )
    SELECT vid_1, vid_2,
           CAST(bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
              + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3))
              AS INTEGER) AS hamming
    FROM pairs
    WHERE bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
        + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3)) <= 3
    ORDER BY vid_1, vid_2
    """,
    tags=("llmdata", "multimodal", "dedup", "join"),
    doc="image near-dup via 8x8 average-hash over really-decoded PNG "
    "pixels: integer-exact hash as four 16-bit quarters, pigeonhole "
    "quarter-equality candidate joins (hamming <= 3 over 64 bits "
    "guarantees one untouched quarter), exact popcount verify. The "
    "corpus mixes the FULL doc_id into pixel content (period 2^32) "
    "and plants a posterized (//8*8) re-export twin per doc (vid = "
    "doc_id*2 + variant) — measured near-dup volume is the "
    "operator's, not a 256-image generator artifact. The oracle "
    "recomputes the hash from the closed form without touching a "
    "byte — agreement proves the PNG encode/decode/hash round-trip "
    "lossless.",
)
def q_image_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.llmdata.dedup import capped_band_pairs

    ids = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id")
        .distinct()
    )
    q = png_ahash_quarters(_attach_png_variants(ids)).filter(
        F.col("q0").isNotNull()
    )
    # round 9: the quarter joins moved onto capped_band_pairs (audio's
    # machinery) with cap 256 — the 10x shuffle audit measured the
    # uncapped joins at 60x growth because DEGENERATE quarters (flat /
    # periodic patterns hashing to 0, 0x5555, ...) pile hundreds of
    # images into one bucket, and a flat quarter carries no
    # discriminative signal: the image analog of the text boilerplate
    # the LSH bucket cap drops.  No-op at sf0.1 (max observed bucket
    # ~60), trips only the degenerate values at 10x (~390-590).
    pairs = capped_band_pairs(
        q, ("q0", "q1", "q2", "q3"), _IMAGE_BUCKET_CAP
    )
    hamming = (
        F.bit_count(F.expr("x0 ^ y0"))
        + F.bit_count(F.expr("x1 ^ y1"))
        + F.bit_count(F.expr("x2 ^ y2"))
        + F.bit_count(F.expr("x3 ^ y3"))
    ).cast("int")
    return (
        pairs.select("vid_1", "vid_2", hamming.alias("hamming"))
        .filter(F.col("hamming") <= 3)
        .orderBy("vid_1", "vid_2")
    )
