"""Frame-sampling over video-style binary payloads — the one-to-many
multimodal kernel shape (media_metadata/media_features are one-to-one).
The fingerprint is defined over the frame's hex encoding so the DuckDB
oracle can recompute every digest with plain VARCHAR slicing (DuckDB
has no BLOB substring), while the Spark kernel genuinely slices
bytes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.multimodal import (
    attach_image_payload,
    sample_frames,
)
from stockpulse_spark.plans.registry import _register, _t

# keep in exact sync with attach_image_payload's header construction
_PAYLOAD_HEX_SQL = """
    CASE WHEN doc_id % 2 = 0
         THEN '89504E470D0A1A0A0000000D49484452'
              || printf('%08X', doc_id % 512 + 16)
              || printf('%08X', (doc_id * 7) % 512 + 16)
              || '080200000000000000'
         ELSE 'FFD8FFC0001108'
              || printf('%04X', (doc_id * 7) % 512 + 16)
              || printf('%04X', doc_id % 512 + 16)
              || '03011100021101031101'
    END || hex(encode(text))
"""


@_register(
    "media_frame_sample",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, ({_PAYLOAD_HEX_SQL}) AS ph FROM documents
    )
    SELECT p.doc_id,
           CAST(t.i AS INT) AS frame_idx,
           CAST(length(substr(p.ph, CAST(t.i * 1024 + 1 AS BIGINT), 1024))
                / 2 AS INT) AS frame_len,
           md5(substr(p.ph, CAST(t.i * 1024 + 1 AS BIGINT), 1024))
             AS frame_md5
    FROM p
    JOIN (
      -- enumerate frame indices up to the longest payload: DuckDB's
      -- range() only takes constants, so derive the bound via
      -- generate_series over the max hex length instead of a
      -- hardcoded cap that a longer regenerated testdoc would outgrow
      SELECT unnest(generate_series(
        0, (SELECT CAST(ceil(max(length(ph)) / 1024.0) AS BIGINT) FROM p)
      )) AS i
    ) t ON t.i * 1024 < length(p.ph)
    WHERE t.i % 2 = 0
    """,
    tags=("llmdata", "multimodal"),
    doc="video-style frame sampling: slice each binary payload into "
    "512-byte frames, keep every 2nd, md5-fingerprint each (digest "
    "over the hex encoding — recomputable by the oracle without blob "
    "slicing). One-to-many mapInPandas expansion with a typed schema; "
    "the shape a real codec frame-sampler plugs into "
    "(llmdata/multimodal.py:sample_frames).",
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = attach_image_payload(
        _t(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
    )
    return sample_frames(d)


@_register(
    "audio_features",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 256 + 16 AS n FROM documents
    ), s AS (
      SELECT d.doc_id, d.n, t.i,
             ((d.doc_id * 7919 + t.i * 31) % 2048) - 1024 AS v
      FROM dims d JOIN range(0, 272) t(i) ON t.i < d.n
    ), lagged AS (
      SELECT doc_id, n, v,
             LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      FROM s
    )
    SELECT doc_id,
           8000 AS sample_rate,
           CAST(MAX(n) AS INT) AS n_samples,
           TRUE AS decode_ok,
           ROUND(sqrt(AVG(CAST(v AS DOUBLE) * v)), 6) AS rms,
           CAST(SUM(CASE WHEN (pv < 0 AND v > 0) OR (pv > 0 AND v < 0)
                         THEN 1 ELSE 0 END) AS INT) AS zero_crossings,
           CAST(MAX(abs(v)) AS INT) AS peak
    FROM lagged GROUP BY doc_id
    """,
    tags=("llmdata", "multimodal"),
    doc="REAL audio feature extraction: each doc carries a genuine "
    "RIFF/WAVE container (mono 16-bit PCM, samples a closed-form "
    "function of doc_id) and the Spark kernel truly parses the chunk "
    "list, validates fmt, and decodes little-endian PCM bytes before "
    "computing RMS / zero-crossings / peak "
    "(llmdata/multimodal.py:decode_wav). The oracle integrates the "
    "sample formula analytically, so a wrong chunk walk, endianness, "
    "or sample width fails the value hash. With the PNG pixel path "
    "this makes two fully-decoded modalities; only DCT-class codecs "
    "(JPEG/video) remain external-encoder hooks.",
)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.llmdata.multimodal import (
        attach_wav_payload,
        extract_audio_features,
    )
    from stockpulse_spark.plans.registry import _r6

    d = attach_wav_payload(
        _t(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
    )
    out = extract_audio_features(d)
    return out.select(
        "doc_id", "sample_rate", "n_samples", "decode_ok",
        _r6(F.col("rms")).alias("rms"), "zero_crossings", "peak",
    )
