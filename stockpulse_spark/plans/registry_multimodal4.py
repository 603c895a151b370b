"""Audio fingerprint near-dup — completes the dedup matrix's audio
cell (text: exact/MinHash/SimHash; vectors: cosine/SRP; images:
aHash — registry_multimodal3; audio: this).

Energy-band fingerprint over REALLY DECODED PCM (chromaprint-lite):
the Spark kernel walks RIFF chunks and decodes 16-bit mono samples
(decode_wav — format tag, channel, alignment validation), splits the
clip into 32 index frames, and sets bit f where the frame's energy
(sum of squared samples, integer-exact) exceeds the clip mean under
cross-multiplication — the same no-floats discipline as the image
aHash. Bits travel as FOUR 8-bit band values; hamming <= 3 over 32
bits guarantees one untouched band, so four band-equality equi-joins
(unioned + distinct) generate candidates and exact popcount verifies.

Near-dup ground truth is planted, not hoped for: each doc contributes
its generated clip AND a "re-encode" twin whose every sample is +8
(a loudness nudge; the rare mod-2048 wraps are the lossy part) — the
pair a fingerprint must catch and exact byte-hash dedup must miss.
Keys are vid = doc_id*2 + variant.

The DuckDB oracle integrates the generator's closed form
(sample[i] = ((d*7919 + i*31 + 8*variant) % 2048) - 1024,
n = d % 256 + 16 — attach_wav_payload's contract) without touching a
byte; agreement proves the WAV encode/decode/fingerprint round-trip
lossless. Same 100 TB posture as image_phash_near_dup: one Arrow
mapInPandas scan for fingerprints, band-value shuffles for pairing.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.dedup import capped_band_pairs
from stockpulse_spark.llmdata.multimodal import decode_wav, encode_wav
from stockpulse_spark.plans.registry import _register, _t

# Band-bucket cap for the pigeonhole joins: with four 8-bit bands the
# key space is 256 buckets/band, so a degenerate corpus (every clip
# near-silent -> same energy profile) piles n/256 items into one
# bucket and the self-join goes quadratic on it.  4096 is a no-op at
# every tested SF (max observed bucket ~160 at sf0.1) but bounds the
# adversary; the oracle mirrors the cap exactly (fpw CTE), so the two
# engines agree even when a corpus trips it.
_AUDIO_BUCKET_CAP = 4096

_N_FRAMES = 32
_FP_SCHEMA = "vid long, b0 long, b1 long, b2 long, b3 long"


def _attach_wav_variants(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Both clip variants per doc: variant 0 is attach_wav_payload's
    closed form, variant 1 adds +8 before the wrap (the near-dup
    twin). Real WAV containers either way."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids, payloads = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                n = d % 256 + 16
                for variant in (0, 1):
                    samples = [
                        ((d * 7919 + i * 31 + 8 * variant) % 2048) - 1024
                        for i in range(n)
                    ]
                    vids.append(d * 2 + variant)
                    payloads.append(encode_wav(8000, samples))
            yield pd.DataFrame({"vid": vids, "payload": payloads})

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        kernel, schema="vid long, payload binary"
    )


def wav_fingerprint_bands(df: DataFrame) -> DataFrame:
    """payload -> 32-bit energy fingerprint as four 8-bit bands.
    Decode failures dead-letter to NULL bands."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, payload in zip(pdf["vid"], pdf["payload"]):
                try:
                    _rate, samples = decode_wav(bytes(payload))
                    s = np.asarray(samples, dtype=np.int64)
                    n = len(s)
                    frame = (np.arange(n) * _N_FRAMES) // n
                    e = np.zeros(_N_FRAMES, dtype=np.int64)
                    cnt = np.zeros(_N_FRAMES, dtype=np.int64)
                    np.add.at(e, frame, s * s)
                    np.add.at(cnt, frame, 1)
                    tot_e = int((s * s).sum())
                    bits = e * n > tot_e * cnt
                    b = [0, 0, 0, 0]
                    for f in range(_N_FRAMES):
                        if bits[f]:
                            b[f // 8] |= 1 << (f % 8)
                    rows.append(
                        dict(vid=int(vid), b0=b[0], b1=b[1],
                             b2=b[2], b3=b[3])
                    )
                except ValueError:
                    rows.append(
                        dict(vid=int(vid), b0=None, b1=None,
                             b2=None, b3=None)
                    )
            yield pd.DataFrame(rows)

    return df.select("vid", "payload").mapInPandas(
        kernel, schema=_FP_SCHEMA
    )


@_register(
    "audio_fingerprint_near_dup",
    oracle=f"""
    WITH docs AS (
      SELECT d, v, d * 2 + v AS vid, d % 256 + 16 AS n
      FROM (SELECT DISTINCT doc_id AS d FROM documents
            WHERE doc_id IS NOT NULL),
           (VALUES (0), (1)) AS var(v)
    ), px AS (
      SELECT vid, n, (ii.i * {_N_FRAMES}) // n AS f,
             (((d * 7919 + ii.i * 31 + 8 * v) % 2048) - 1024)
               * (((d * 7919 + ii.i * 31 + 8 * v) % 2048) - 1024) AS e
      FROM docs, range(0, 272) AS ii(i)
      WHERE ii.i < n
    ), frame_agg AS (
      SELECT vid, f, SUM(e) AS fe, COUNT(*) AS fn
      FROM px GROUP BY vid, f
    ), tot AS (
      SELECT vid, SUM(e) AS te, COUNT(*) AS tn FROM px GROUP BY vid
    ), fp AS (
      SELECT a.vid,
        CAST(SUM(CASE WHEN f // 8 = 0 AND a.fe*t.tn > t.te*a.fn
                 THEN 1 << (f % 8) ELSE 0 END) AS BIGINT) AS b0,
        CAST(SUM(CASE WHEN f // 8 = 1 AND a.fe*t.tn > t.te*a.fn
                 THEN 1 << (f % 8) ELSE 0 END) AS BIGINT) AS b1,
        CAST(SUM(CASE WHEN f // 8 = 2 AND a.fe*t.tn > t.te*a.fn
                 THEN 1 << (f % 8) ELSE 0 END) AS BIGINT) AS b2,
        CAST(SUM(CASE WHEN f // 8 = 3 AND a.fe*t.tn > t.te*a.fn
                 THEN 1 << (f % 8) ELSE 0 END) AS BIGINT) AS b3
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
       AND ((x.b0 = y.b0 AND x.n0 <= {_AUDIO_BUCKET_CAP})
         OR (x.b1 = y.b1 AND x.n1 <= {_AUDIO_BUCKET_CAP})
         OR (x.b2 = y.b2 AND x.n2 <= {_AUDIO_BUCKET_CAP})
         OR (x.b3 = y.b3 AND x.n3 <= {_AUDIO_BUCKET_CAP}))
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
    doc="audio near-dup via 32-frame energy fingerprint over "
    "really-decoded PCM: integer-exact bits as four 8-bit bands, "
    "pigeonhole band-equality joins (bucket-capped — see "
    "capped_band_pairs), exact popcount verify <= 3. Each doc's clip "
    "is paired with a planted +8-amplitude re-encode twin — the "
    "near-dup a byte-hash misses. Oracle integrates the generator's "
    "closed form; agreement proves the RIFF "
    "encode/decode/fingerprint round-trip lossless.",
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
    fp = wav_fingerprint_bands(_attach_wav_variants(ids)).filter(
        F.col("b0").isNotNull()
    )
    pairs = capped_band_pairs(fp, ("b0", "b1", "b2", "b3"), _AUDIO_BUCKET_CAP)
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
