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
