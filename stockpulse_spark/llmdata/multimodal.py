"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched mapInPandas
kernels.

The decode step itself is STUBBED (no image/audio libraries in this
container): `decode_image` raises NotImplementedError and the kernel
falls back to a deterministic fake decoder, clearly marked. Everything
Spark-side is real and tested — the binary column, the kernel
signature, the output schema, the batch iteration, and the
partitioning story:

- payloads travel as parquet BINARY; Spark never materializes them on
  the driver;
- mapInPandas streams Arrow record batches through the kernel, so peak
  memory is one batch (spark.sql.execution.arrow.maxRecordsPerBatch),
  not one partition;
- at 100 TB, partition by content-size histogram (repartitionByRange
  on byte_len) so one batch of 4K videos doesn't OOM an executor that
  was sized for thumbnails.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, byte_len long, format string, width int, height int, "
    "n_frames int, decode_ok boolean"
)


def decode_image(payload: bytes) -> dict:
    """Real decoder hook — wire Pillow/ffmpeg here when available.

    Raises NotImplementedError in this container (no imaging libs);
    callers fall back to `fake_decode`.
    """
    raise NotImplementedError("no imaging libraries in this environment")


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: derives plausible metadata from
    the payload bytes only (stable across engines/runs)."""
    n = len(payload)
    return {
        "format": "FAKE",
        "width": n % 512 + 16,
        "height": (n * 7) % 512 + 16,
        "n_frames": 1,
    }


FEATURE_SCHEMA = "doc_id long, byte_len long, feature_vec array<double>"


def fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic md5-derived feature vector (stands in for a real
    image/audio encoder): byte i,i+1 of the hex digest → [0,1]."""
    import hashlib

    h = hashlib.md5(payload).hexdigest()
    hexmap = "0123456789abcdef"
    return [
        (hexmap.index(h[4 * i]) * 16 + hexmap.index(h[1 + 4 * i])) / 255.0
        for i in range(dim)
    ]


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas kernel: payload → fixed-size feature vector.

    The embedding model hook is `decode_image`-style: wire a real
    encoder (Pillow preprocessing + any vision model) here; this
    container uses the deterministic md5 fake so the Spark plumbing
    (binary in, array<double> out, Arrow batches) is fully exercised
    and oracle-checkable.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                dict(
                    doc_id=int(doc_id),
                    byte_len=len(bytes(payload)),
                    feature_vec=fake_features(bytes(payload)),
                )
                for doc_id, payload in zip(pdf[id_col], pdf["payload"])
            ]
            yield pd.DataFrame(rows)

    return df.select(id_col, "payload").mapInPandas(kernel, schema=FEATURE_SCHEMA)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata shim: treat utf-8 text bytes as the opaque media
    payload (real pipelines read the binary column from parquet)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_media_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas kernel: payload binary → typed metadata row.

    Tries the real decoder once per batch; on NotImplementedError uses
    the deterministic fake for every row (flagged decode_ok=False).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                data = bytes(payload)
                try:
                    meta = decode_image(data)
                    ok = True
                except NotImplementedError:
                    meta = fake_decode(data)
                    ok = False
                rows.append(
                    dict(
                        doc_id=int(doc_id),
                        byte_len=len(data),
                        format=meta["format"],
                        width=meta["width"],
                        height=meta["height"],
                        n_frames=meta["n_frames"],
                        decode_ok=ok,
                    )
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, "payload").mapInPandas(kernel, schema=MEDIA_META_SCHEMA)
