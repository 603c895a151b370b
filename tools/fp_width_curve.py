"""Audio-fingerprint width curve (round 10, verdict item 2).

Measures, at the 10x documents corpus, how the pigeonhole candidate
volume, verified-pair volume, planted-twin recall, and wall time move
as the per-band fingerprint width w sweeps the supported range — the
evidence behind fp_width_bits' corpus-sized choice.  The round-9
design pinned w=8 (256 keys/band) forever: candidates are
Theta(n^2/2^w) per band, so the fixed width is the measured 22.57x
shuffle growth in SHUFFLE_r09.md.  This curve shows the volume
collapsing toward Theta(n) as 2^w passes n, and what the fixed tau=3
verify budget does to planted-twin recall as frames (4w) grow.

Usage:
    python tools/fp_width_curve.py [sf_dir_10x] [widths...]
    (default dir: a 10x replica with 50k docs; default widths:
     8 10 12 14 16 17 18 20 — 17 is fp_width_bits(100k), the auto
     choice at this corpus)

One JSON line to stdout; progress to stderr.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from stockpulse_spark.llmdata.dedup import capped_band_pairs  # noqa: E402
from stockpulse_spark.plans.registry_multimodal4 import (  # noqa: E402
    _AUDIO_BUCKET_CAP,
    _attach_wav_variants,
    fp_width_bits,
    wav_fingerprint_bands,
)
from stockpulse_spark.session import get_spark  # noqa: E402
from stockpulse_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sp_scale10x_a0pjeaht"
    widths = (
        [int(a) for a in sys.argv[2:]]
        if len(sys.argv) > 2
        else [8, 10, 12, 14, 16, 17, 18, 20]
    )
    spark = get_spark("fp_width_curve")
    spark.sparkContext.setLogLevel("ERROR")
    ids = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id")
        .distinct()
    )
    n_docs = ids.count()
    auto_w = fp_width_bits(2 * n_docs)
    print(f"# corpus: {n_docs} docs, auto width {auto_w}", file=sys.stderr)
    out = {}
    for w in widths:
        t0 = time.time()
        fp = wav_fingerprint_bands(_attach_wav_variants(ids), w_bits=w).filter(
            F.col("b0").isNotNull()
        )
        pairs = capped_band_pairs(
            fp, ("b0", "b1", "b2", "b3"), _AUDIO_BUCKET_CAP
        ).localCheckpoint(eager=True)
        n_cand = pairs.count()
        hamming = (
            F.bit_count(F.expr("x0 ^ y0"))
            + F.bit_count(F.expr("x1 ^ y1"))
            + F.bit_count(F.expr("x2 ^ y2"))
            + F.bit_count(F.expr("x3 ^ y3"))
        ).cast("int")
        verified = pairs.select(
            "vid_1", "vid_2", hamming.alias("h")
        ).filter(F.col("h") <= 3)
        n_ver = verified.count()
        # planted-twin recall: pair (2d, 2d+1) present
        n_twin = verified.filter(
            (F.col("vid_2") == F.col("vid_1") + 1)
            & (F.col("vid_1") % 2 == 0)
        ).count()
        el = round(time.time() - t0, 2)
        out[str(w)] = {
            "candidates": n_cand,
            "verified": n_ver,
            "twin_recall": round(n_twin / n_docs, 4),
            "sec": el,
            "auto": w == auto_w,
        }
        print(
            f"# w={w}: cand={n_cand} verified={n_ver} "
            f"recall={n_twin}/{n_docs} {el}s",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "audio_fp_width_curve",
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "auto_width": auto_w,
                "bucket_cap": _AUDIO_BUCKET_CAP,
                "widths": out,
            }
        )
    )


if __name__ == "__main__":
    main()
