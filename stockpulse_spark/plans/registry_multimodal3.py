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
popcount(xor) sum verifies. doc_id and doc_id+256 produce pixel-
identical images under the payload generator's closed form, so the
corpus contains genuine hamming-0 dup pairs, and +-32 brightness
shifts populate the near-dup band.

The DuckDB oracle never decodes a PNG: it recomputes the SAME hash
analytically from the generator's closed form (pixel(y,x,c) =
(doc_id + 31y + 7x + 83c) % 256 at w = d%32+4, h = (7d)%32+4 —
attach_png_payload's contract), enumerating pixels with range() cross
joins. The Spark side must round-trip the real bytes; agreement means
encode -> decode -> hash is lossless end-to-end.

At 100 TB: hashing is one mapInPandas scan (Arrow-batched, payloads
never leave executors); the candidate join shuffles on 16-bit quarter
values — bucket skew (e.g. letterboxed black quadrants) is the
boilerplate-cluster problem and takes the same bucket_cap guard as
the MinHash-LSH path if a quarter value degenerates.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.multimodal import (
    attach_png_payload,
    decode_png_pixels,
)
from stockpulse_spark.plans.registry import _register, _t

_AHASH_SCHEMA = "doc_id long, q0 long, q1 long, q2 long, q3 long"

# Quarter-bucket cap for the pigeonhole joins (round 9): degenerate
# flat/periodic quarters (q = 0, 0x5555, ...) pile hundreds of images
# onto one 16-bit key — the 10x audit measured the uncapped join at
# 60x shuffle growth.  256 is a no-op at sf0.1 (max observed bucket
# ~60) and trips only the degenerate values at 10x (~390-590); the
# oracle mirrors it in the qw CTE so both engines agree when it fires.
_IMAGE_BUCKET_CAP = 256


def png_ahash_quarters(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """payload -> 8x8 average-hash as four 16-bit quarters.  Decode
    failures dead-letter to NULL quarters (excluded from pairing)."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
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
                        dict(doc_id=int(doc_id), q0=q[0], q1=q[1],
                             q2=q[2], q3=q[3])
                    )
                except ValueError:
                    rows.append(
                        dict(doc_id=int(doc_id), q0=None, q1=None,
                             q2=None, q3=None)
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, "payload").mapInPandas(
        kernel, schema=_AHASH_SCHEMA
    )


@_register(
    "image_phash_near_dup",
    oracle="""
    WITH docs AS (
      SELECT DISTINCT doc_id AS d,
             doc_id % 32 + 4 AS w,
             (doc_id * 7) % 32 + 4 AS h
      FROM documents WHERE doc_id IS NOT NULL
    ), px AS (
      SELECT d, w, h, yy.y AS y, xx.x AS x,
             ((d + 31*yy.y + 7*xx.x) % 256
              + (d + 31*yy.y + 7*xx.x + 83) % 256
              + (d + 31*yy.y + 7*xx.x + 166) % 256) AS g
      FROM docs, range(0, 36) AS yy(y), range(0, 36) AS xx(x)
      WHERE yy.y < h AND xx.x < w
    ), cell_agg AS (
      SELECT d, ((y*8)//h)*8 + (x*8)//w AS b,
             SUM(g) AS cs, COUNT(*) AS cn
      FROM px GROUP BY d, b
    ), tot AS (
      SELECT d, SUM(g) AS ts, COUNT(*) AS tn FROM px GROUP BY d
    ), q AS (
      SELECT c.d,
        CAST(SUM(CASE WHEN b // 16 = 0 AND c.cs*t.tn > t.ts*c.cn
                 THEN 1 << (b % 16) ELSE 0 END) AS BIGINT) AS q0,
        CAST(SUM(CASE WHEN b // 16 = 1 AND c.cs*t.tn > t.ts*c.cn
                 THEN 1 << (b % 16) ELSE 0 END) AS BIGINT) AS q1,
        CAST(SUM(CASE WHEN b // 16 = 2 AND c.cs*t.tn > t.ts*c.cn
                 THEN 1 << (b % 16) ELSE 0 END) AS BIGINT) AS q2,
        CAST(SUM(CASE WHEN b // 16 = 3 AND c.cs*t.tn > t.ts*c.cn
                 THEN 1 << (b % 16) ELSE 0 END) AS BIGINT) AS q3
      FROM cell_agg c JOIN tot t USING (d) GROUP BY c.d
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
      SELECT DISTINCT a.d AS doc_id_1, b.d AS doc_id_2,
             a.q0 AS a0, a.q1 AS a1, a.q2 AS a2, a.q3 AS a3,
             b.q0 AS b0, b.q1 AS b1, b.q2 AS b2, b.q3 AS b3
      FROM qw a JOIN qw b
        ON a.d < b.d
       AND ((a.q0 = b.q0 AND a.n0 <= 256) OR (a.q1 = b.q1 AND a.n1 <= 256)
         OR (a.q2 = b.q2 AND a.n2 <= 256) OR (a.q3 = b.q3 AND a.n3 <= 256))
    )
    SELECT doc_id_1, doc_id_2,
           CAST(bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
              + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3))
              AS INTEGER) AS hamming
    FROM pairs
    WHERE bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
        + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3)) <= 3
    ORDER BY doc_id_1, doc_id_2
    """,
    tags=("llmdata", "multimodal", "dedup", "join"),
    doc="image near-dup via 8x8 average-hash over really-decoded PNG "
    "pixels: integer-exact hash as four 16-bit quarters, pigeonhole "
    "quarter-equality candidate joins (hamming <= 3 over 64 bits "
    "guarantees one untouched quarter), exact popcount verify. The "
    "oracle recomputes the hash from the payload generator's closed "
    "form without touching a byte — agreement proves the PNG "
    "encode/decode/hash round-trip lossless.",
)
def q_image_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.llmdata.dedup import capped_band_pairs

    ids = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id")
        .distinct()
    )
    q = png_ahash_quarters(attach_png_payload(ids)).filter(
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
        q, ("q0", "q1", "q2", "q3"), _IMAGE_BUCKET_CAP, id_col="doc_id"
    )
    hamming = (
        F.bit_count(F.expr("x0 ^ y0"))
        + F.bit_count(F.expr("x1 ^ y1"))
        + F.bit_count(F.expr("x2 ^ y2"))
        + F.bit_count(F.expr("x3 ^ y3"))
    ).cast("int")
    return (
        pairs.select(
            F.col("vid_1").alias("doc_id_1"),
            F.col("vid_2").alias("doc_id_2"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .orderBy("doc_id_1", "doc_id_2")
    )
