"""Image perceptual-hash near-dup — the multimodal cell of the dedup
matrix (exact / MinHash / SimHash / embedding-cosine tiers all exist
for text and vectors; this adds images).

Average-hash (aHash) over REALLY DECODED pixels: the Spark kernel
zlib-inflates and unfilters each PNG (decode_png_pixels — chunk walk,
CRC check, all five filter types), projects the 3-channel image onto
a 4 x w grid of cell luminance sums (4 quarter-rows by w columns),
and sets bit (qy*w + bx) where the cell's mean exceeds the global
mean. All comparisons are integer cross-multiplications
(cell_sum * tot_n > tot_sum * cell_n) so the hash is bit-exact
reproducible with no float in sight.  The 4w bits are carried as FOUR
w-bit quarter values (q0..q3) rather than one BIGINT — a wide single
assembly would wrap signed 64-bit and ">>" sign semantics differ
across engines; four small non-negative ints have no such hazards and
are exactly what the pigeonhole join needs anyway.

SCALABLE KEY SPACE (round 11 — the audio cell's round-10 machinery,
generalized via llmdata/widths.py): the per-quarter width is the
CORPUS-SIZED parameter w = fp_width_bits(n_vids) in [8, 20], so the
per-quarter key space 2^w tracks the corpus and the expected quarter
bucket stays O(1): candidate volume is Theta(n^2 / 2^w) per quarter =
Theta(n) once 2^w tracks n.  The old fixed 8x8/16-bit layout is
(roughly) the w=16 member of this family; small corpora now get w=8
(a 4x8 grid) and 1M+ corpora get w=20 without a code change.

SECOND KEY AXIS — dimensions prefilter (the image analog of the audio
duration axis): a re-export preserves pixel dimensions, so the join
key is the COMPOSITE quarter_value * 4096 + (w_px*36 + h_px).  Every
candidate pair therefore agrees on dims, so xor(k_x, k_y) =
xor(q_x, q_y) << 12 and the popcount verify is unchanged.

Pairing is the SimHash recipe (registry_funnel): hamming <= 3 over
the 4w bits guarantees at least one of the 4 quarters is untouched
(pigeonhole: 3 flips touch at most 3 quarters — width-independent),
so four quarter-equality equi-joins (unioned + distinct — never an
OR join, which would plan as a nested loop) generate candidates and
an exact popcount(xor) sum verifies.

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
joins — INCLUDING the width ladder and cap, computed in SQL from
COUNT(*) (llmdata/widths.py), so no constant edit can desynchronize
the engines. The Spark side must round-trip the real bytes; agreement
means encode -> decode -> hash is lossless end-to-end at every corpus
size.

At 100 TB: hashing is one mapInPandas scan (Arrow-batched, payloads
never leave executors); the candidate join shuffles on composite
(quarter value, dims) keys whose space 2^w x dims tracks the corpus,
so quarter buckets stay O(1) and degenerate quarters (letterboxed
black quadrants — the boilerplate-cluster problem) take the
band_bucket_cap guard.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.multimodal import (
    decode_png_pixels,
    encode_png,
)
from stockpulse_spark.llmdata.widths import (
    band_bucket_cap,
    fp_width_bits,
    width_cap_cte_sql,
)
from stockpulse_spark.plans.registry import _register, _t

_AHASH_SCHEMA = "vid long, dims long, q0 long, q1 long, q2 long, q3 long"

# Composite-key modulus for the dims axis: dims = w_px*36 + h_px <
# 36*36 = 1296 < 4096, so quarter_value * 4096 + dims is collision-
# free.  Same constant role as the audio cell's _NS_MOD.
_DIMS_MOD = 4096


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

    # spread the id frame before the Python encode kernel (optimization
    # r11): the upstream scan is one parquet split, so the whole
    # payload synthesis otherwise runs in a single Python task
    spark = df.sparkSession
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(kernel, schema="vid long, payload binary")
    )


def png_ahash_quarters(
    df: DataFrame, id_col: str = "vid", w_bits: int = 16
) -> DataFrame:
    """payload -> 4 x w_bits average-hash as four w_bits-bit quarters
    plus the dims code (w_px*36 + h_px — the second key axis).  Decode
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
                    qy = (np.arange(h) * 4) // h
                    bx = (np.arange(w) * w_bits) // w
                    cell = (qy[:, None] * w_bits + bx[None, :]).ravel()
                    cs = np.zeros(4 * w_bits, dtype=np.int64)
                    cn = np.zeros(4 * w_bits, dtype=np.int64)
                    np.add.at(cs, cell, g.ravel())
                    np.add.at(cn, cell, 1)
                    tot_s = int(g.sum())
                    tot_n = w * h
                    bits = cs * tot_n > tot_s * cn
                    q = [0, 0, 0, 0]
                    for b in range(4 * w_bits):
                        if bits[b]:
                            q[b // w_bits] |= 1 << (b % w_bits)
                    rows.append(
                        dict(vid=int(vid), dims=w * 36 + h, q0=q[0],
                             q1=q[1], q2=q[2], q3=q[3])
                    )
                except ValueError:
                    rows.append(
                        dict(vid=int(vid), dims=None, q0=None, q1=None,
                             q2=None, q3=None)
                    )
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col).alias("vid"), "payload").mapInPandas(
        kernel, schema=_AHASH_SCHEMA
    )


@_register(
    "image_phash_near_dup",
    oracle=f"""
    WITH ws AS (
      -- corpus-sized per-quarter width (same ladder as fp_width_bits)
      -- and bucket cap (same formula as band_bucket_cap) — the audio
      -- cell's machinery, shared via llmdata/widths.py
      {width_cap_cte_sql(
          "SELECT 2 * COUNT(*) AS n "
          "FROM (SELECT DISTINCT doc_id FROM documents "
          "WHERE doc_id IS NOT NULL)",
          width_col="wb",
      )}
    ), docs AS (
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
      -- 4 quarter-rows x wb columns (the corpus-sized grid)
      SELECT vid, ((y*4)//h)*ws.wb + (x*ws.wb)//w AS b,
             SUM(g) AS cs, COUNT(*) AS cn
      FROM px, ws GROUP BY vid, b
    ), tot AS (
      SELECT vid, ANY_VALUE(w*36 + h) AS dims,
             SUM(g) AS ts, COUNT(*) AS tn
      FROM px GROUP BY vid
    ), q AS (
      -- composite (quarter value, dimensions) keys: q*{_DIMS_MOD} + dims
      -- mirrors the Spark side; every candidate pair agrees on dims,
      -- so the xor popcount below is unchanged
      SELECT c.vid,
        CAST(SUM(CASE WHEN b // ws.wb = 0 AND c.cs*t.tn > t.ts*c.cn
                 THEN 1 << (b % ws.wb) ELSE 0 END) AS BIGINT)
          * {_DIMS_MOD} + ANY_VALUE(t.dims) AS q0,
        CAST(SUM(CASE WHEN b // ws.wb = 1 AND c.cs*t.tn > t.ts*c.cn
                 THEN 1 << (b % ws.wb) ELSE 0 END) AS BIGINT)
          * {_DIMS_MOD} + ANY_VALUE(t.dims) AS q1,
        CAST(SUM(CASE WHEN b // ws.wb = 2 AND c.cs*t.tn > t.ts*c.cn
                 THEN 1 << (b % ws.wb) ELSE 0 END) AS BIGINT)
          * {_DIMS_MOD} + ANY_VALUE(t.dims) AS q2,
        CAST(SUM(CASE WHEN b // ws.wb = 3 AND c.cs*t.tn > t.ts*c.cn
                 THEN 1 << (b % ws.wb) ELSE 0 END) AS BIGINT)
          * {_DIMS_MOD} + ANY_VALUE(t.dims) AS q3
      FROM cell_agg c JOIN tot t USING (vid), ws GROUP BY c.vid
    ), qw AS (
      -- band_bucket_cap mirror: a quarter bucket over the cap is
      -- excluded from THAT quarter's pairing (members still pair
      -- through their other quarters) in BOTH engines
      SELECT q.*,
             COUNT(*) OVER (PARTITION BY q0) AS n0,
             COUNT(*) OVER (PARTITION BY q1) AS n1,
             COUNT(*) OVER (PARTITION BY q2) AS n2,
             COUNT(*) OVER (PARTITION BY q3) AS n3
      FROM q
    ), cand AS (
      -- four hash equi-joins + UNION dedup — the Spark side's exact
      -- candidate shape (never an OR join: DuckDB would nested-loop
      -- it, the quadratic-oracle class the round-10 sf1 sweep hit)
      SELECT a.vid AS vid_1, b.vid AS vid_2 FROM qw a JOIN qw b
        ON a.q0 = b.q0 AND a.vid < b.vid
       WHERE a.n0 <= (SELECT cap FROM ws)
      UNION
      SELECT a.vid, b.vid FROM qw a JOIN qw b
        ON a.q1 = b.q1 AND a.vid < b.vid
       WHERE a.n1 <= (SELECT cap FROM ws)
      UNION
      SELECT a.vid, b.vid FROM qw a JOIN qw b
        ON a.q2 = b.q2 AND a.vid < b.vid
       WHERE a.n2 <= (SELECT cap FROM ws)
      UNION
      SELECT a.vid, b.vid FROM qw a JOIN qw b
        ON a.q3 = b.q3 AND a.vid < b.vid
       WHERE a.n3 <= (SELECT cap FROM ws)
    ), pairs AS (
      SELECT c.vid_1, c.vid_2,
             x.q0 AS a0, x.q1 AS a1, x.q2 AS a2, x.q3 AS a3,
             y.q0 AS b0, y.q1 AS b1, y.q2 AS b2, y.q3 AS b3
      FROM cand c JOIN q x ON x.vid = c.vid_1
                  JOIN q y ON y.vid = c.vid_2
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
    doc="image near-dup via corpus-width average-hash over really-"
    "decoded PNG pixels: integer-exact hash on a 4 x w grid with "
    "w = fp_width_bits(n_vids) in [8, 20] (per-quarter key space 2^w "
    "tracks the corpus, so quarter buckets stay O(1) and the "
    "pigeonhole joins stay linear — the audio cell's round-10 "
    "machinery, shared via llmdata/widths.py), composite (quarter, "
    "dims) keys (a re-export preserves pixel dimensions), bucket-"
    "capped quarter-equality joins, exact popcount verify. hamming "
    "<= 3 over 4 quarters guarantees one untouched quarter at ANY "
    "width. The corpus mixes the FULL doc_id into pixel content "
    "(period 2^32) and plants a posterized (//8*8) re-export twin "
    "per doc (vid = doc_id*2 + variant). The oracle recomputes the "
    "hash from the closed form without touching a byte — INCLUDING "
    "the width ladder and cap, computed in SQL from COUNT(*) — so "
    "agreement proves the PNG encode/decode/hash round-trip lossless "
    "at every corpus size.",
)
def q_image_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.llmdata.dedup import capped_band_pairs

    ids = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id")
        .distinct()
    )
    # one O(1)-row scalar action sizing the quarter width — the bloom-
    # literal posture; SPARK_IMAGE_FP_WIDTH pins the width for the
    # measurement-only curve runs (tools/fp_width_curve.py), never for
    # parity (the oracle always computes the auto width).
    override = os.environ.get("SPARK_IMAGE_FP_WIDTH")
    n_vids = 2 * ids.count()
    w_bits = int(override) if override else fp_width_bits(n_vids)
    q = png_ahash_quarters(
        _attach_png_variants(ids), w_bits=w_bits
    ).filter(F.col("q0").isNotNull())
    # composite (quarter value, dims) join keys — candidates must
    # agree on dims, so xor(k_x, k_y) = xor(q_x, q_y) << 12 and the
    # popcount verify below needs no change
    keyed = q.select(
        "vid",
        *[
            (F.col(f"q{i}") * _DIMS_MOD + F.col("dims")).alias(f"k{i}")
            for i in range(4)
        ],
    )
    pairs = capped_band_pairs(
        keyed, ("k0", "k1", "k2", "k3"), band_bucket_cap(n_vids, w_bits)
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
