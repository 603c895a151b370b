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
    END || hex(encode(coalesce(text, '')))
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


@_register(
    "media_resize",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 32 + 4 AS w, (doc_id * 7) % 32 + 4 AS h
      FROM documents
    ), px AS (
      -- resized sample (x, y, c) = mean of its 2x2 source block; the
      -- source pixel formula is attach_png_payload's closed form
      SELECT d.doc_id, d.w // 2 AS out_w, d.h // 2 AS out_h,
             y.i AS y, x.i AS x, c.i AS c,
             ( ((d.doc_id + 31 * (2*y.i)     + 7 * (2*x.i)     + 83 * c.i) % 256)
             + ((d.doc_id + 31 * (2*y.i)     + 7 * (2*x.i + 1) + 83 * c.i) % 256)
             + ((d.doc_id + 31 * (2*y.i + 1) + 7 * (2*x.i)     + 83 * c.i) % 256)
             + ((d.doc_id + 31 * (2*y.i + 1) + 7 * (2*x.i + 1) + 83 * c.i) % 256)
             ) / 4.0 AS v
      FROM dims d
      JOIN range(0, 18) y(i) ON y.i < d.h // 2
      JOIN range(0, 18) x(i) ON x.i < d.w // 2
      CROSS JOIN range(0, 3) c(i)
    )
    SELECT doc_id,
           CAST(MAX(out_w) AS INT) AS out_w,
           CAST(MAX(out_h) AS INT) AS out_h,
           TRUE AS decode_ok,
           ROUND(AVG(v), 6) AS resized_mean,
           ROUND(SUM(v * ((y * out_w + x) * 3 + c + 1)), 6) AS checksum
    FROM px GROUP BY doc_id
    """,
    tags=("llmdata", "multimodal"),
    doc="REAL image resize: decode the PNG (zlib inflate + unfilter), "
    "2x2 box-filter downsample the raw pixels, and emit the resized "
    "dimensions, mean, and a position-weighted checksum "
    "(llmdata/multimodal.py:box_downsample_2x). The oracle recomputes "
    "each resized sample as the analytic mean of its source block, so "
    "a transposed, channel-swapped, or off-by-one resize fails the "
    "hash even when the plain mean would survive. Completes the "
    "multimodal verb set: decode / feature-extract / resize / "
    "frame-sample.",
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.llmdata.multimodal import (
        attach_png_payload,
        resize_media,
    )
    from stockpulse_spark.plans.registry import _r6

    d = attach_png_payload(
        _t(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
    )
    out = resize_media(d)
    return out.select(
        "doc_id", "out_w", "out_h", "decode_ok",
        _r6(F.col("resized_mean")).alias("resized_mean"),
        _r6(F.col("checksum")).alias("checksum"),
    )


@_register(
    "audio_silence_segments",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 256 + 16 AS n FROM documents
    ), s AS (
      SELECT d.doc_id, t.i,
             ((d.doc_id * 7919 + t.i * 31) % 2048) - 1024 AS v
      FROM dims d JOIN range(0, 272) t(i) ON t.i < d.n
    ), grp AS (
      SELECT doc_id, i, abs(v) < 256 AS silent,
             i - ROW_NUMBER() OVER (
               PARTITION BY doc_id, abs(v) < 256 ORDER BY i) AS g
      FROM s
    ), runs AS (
      SELECT doc_id, MIN(i) AS start_idx, MAX(i) + 1 AS end_idx,
             COUNT(*) AS seg_len
      FROM grp WHERE silent GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start_idx)
                - 1 AS INT) AS seg_idx,
           CAST(start_idx AS INT) AS start_idx,
           CAST(end_idx AS INT) AS end_idx,
           CAST(seg_len AS INT) AS seg_len
    FROM runs WHERE seg_len >= 4
    """,
    tags=("llmdata", "multimodal"),
    doc="silence segmentation over DECODED PCM: maximal runs of "
    "|sample| < 256 at least 4 samples long, one output row per "
    "segment (llmdata/multimodal.py:silence_segments) — the VAD/"
    "segment step of a speech-curation pipeline as a one-to-many "
    "mapInPandas expansion over genuinely decoded WAV bytes. Oracle "
    "is the classic gaps-and-islands row_number difference over the "
    "analytic sample formula, so run boundaries, ordering, and the "
    "min-length filter are all value-checked.",
)
def q_audio_silence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stockpulse_spark.llmdata.multimodal import (
        attach_wav_payload,
        silence_segments,
    )

    d = attach_wav_payload(
        _t(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
    )
    return silence_segments(d)
