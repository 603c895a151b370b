"""Behavioral tests for the training-data operators: the dedup funnel
must FIND planted near-duplicates, the ANN path must have reasonable
recall against the exact baseline, and the multimodal kernel must
stream Arrow batches with the declared schema."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stockpulse_spark.llmdata.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash32,
)
from stockpulse_spark.llmdata.multimodal import (
    attach_image_payload,
    decode_image,
    extract_media_metadata,
)
from stockpulse_spark.llmdata.similarity import cosine_topk, srp_lsh_topk
from stockpulse_spark.plans import REGISTRY
from stockpulse_spark.plans.registry_llmdata import _mutated_corpus
from stockpulse_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_exact_dedup_finds_doubles(spark, docs):
    out = exact_dedup(docs.unionAll(docs)).collect()
    assert all(r["n_copies"] == 2 for r in out)
    assert len(out) == docs.count()


def test_minhash_finds_planted_near_dups(spark):
    corpus = _mutated_corpus(spark, SF_DIR)
    n_docs = corpus.count() // 2
    pairs = minhash_lsh_pairs(corpus, k=16, bands=8, threshold=0.5).collect()
    planted = {(r["doc_id_1"], r["doc_id_2"]) for r in pairs
               if r["doc_id_2"] == r["doc_id_1"] + 1
               and r["doc_id_1"] % 2 == 0}
    # dropping 5 words of >=10 keeps Jaccard high; LSH must recover
    # the large majority of planted pairs
    assert len(planted) > 0.6 * n_docs, f"{len(planted)}/{n_docs}"


def test_ngram_jaccard_verifies_planted(spark):
    corpus = _mutated_corpus(spark, SF_DIR)
    pairs = ngram_jaccard_pairs(corpus, group_col=None, threshold=0.5).collect()
    planted = [
        r for r in pairs
        if r["doc_id_2"] == r["doc_id_1"] + 1 and r["doc_id_1"] % 2 == 0
    ]
    assert planted
    assert all(0.0 < r["jaccard"] <= 1.0 for r in pairs)


def test_simhash_buckets_near_dups(spark, docs):
    """A doc and its lightly-mutated copy should have close (often
    equal) simhashes; unrelated docs usually differ."""
    sim = simhash32(docs)
    vals = [r["simhash"] for r in sim.collect()]
    assert len(vals) == docs.count()
    assert all(0 <= v < 2**32 for v in vals)
    # identical text → identical hash (determinism)
    sim2 = {r["doc_id"]: r["simhash"] for r in simhash32(docs).collect()}
    sim1 = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    assert sim1 == sim2


def test_srp_recall_vs_bruteforce(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(queries, emb, k=3).collect()
    approx = srp_lsh_topk(queries, emb, k=3, n_planes=4, n_tables=8, dim=64).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 8 tables × 4 planes: expected recall ≈ 1-(1-p^4)^8 ≈ 0.75 for
    # neighbors at cosine ~0.4 (p = 1 - θ/π ≈ 0.63)
    assert recall >= 0.5, f"recall={recall:.2f}"


def test_media_metadata_kernel_real_decode(spark, docs):
    out = extract_media_metadata(attach_image_payload(docs))
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert r["decode_ok"] is True
        assert r["format"] == ("PNG" if r["doc_id"] % 2 == 0 else "JPEG")
        assert r["width"] == r["doc_id"] % 512 + 16
        assert r["height"] == (r["doc_id"] * 7) % 512 + 16
        assert r["channels"] == 3 and r["n_frames"] == 1
    assert out.schema.simpleString().startswith(
        "struct<doc_id:bigint,byte_len:bigint,format:string,width:int,height:int"
    )


def _png_bytes(w: int, h: int, color_type: int = 2) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0]) + b"\x00" * 4
    )


def _jpeg_bytes(w: int, h: int, pre_segments: bytes = b"") -> bytes:
    sof = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + bytes([8])
        + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    return b"\xff\xd8" + pre_segments + sof


def test_decode_image_parses_headers():
    m = decode_image(_png_bytes(640, 480))
    assert (m["format"], m["width"], m["height"], m["channels"]) == ("PNG", 640, 480, 3)
    m = decode_image(_png_bytes(17, 9, color_type=6))
    assert (m["width"], m["height"], m["channels"]) == (17, 9, 4)
    m = decode_image(_jpeg_bytes(1920, 1080))
    assert (m["format"], m["width"], m["height"], m["channels"]) == ("JPEG", 1920, 1080, 3)
    # SOF behind an APP0/JFIF segment (the common real-file layout)
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    m = decode_image(_jpeg_bytes(33, 44, pre_segments=app0))
    assert (m["width"], m["height"]) == (33, 44)
    m = decode_image(b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little"))
    assert (m["format"], m["width"], m["height"]) == ("GIF", 320, 200)


def test_decode_image_rejects_malformed():
    for bad in (
        b"",                                   # empty
        b"plain text payload",                 # no magic
        _png_bytes(640, 480)[:20],             # truncated IHDR
        b"\x89PNG\r\n\x1a\x00" + b"\x00" * 20,  # corrupted signature
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 4 + b"IDAT" + b"\x00" * 16,  # no IHDR
        b"\xff\xd8\xff\xd9",                   # JPEG with no SOF
        b"\xff\xd8" + b"\x00\x00\x00\x00",     # JPEG lost alignment
        b"GIF89a\x01",                         # truncated GIF
    ):
        with pytest.raises(ValueError):
            decode_image(bad)


def test_media_metadata_dead_letters_malformed(spark):
    rows = [
        (1, bytearray(_png_bytes(100, 50))),
        (2, bytearray(b"not an image at all")),
        (3, bytearray(_jpeg_bytes(64, 32))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in extract_media_metadata(df).collect()}
    assert out[1]["decode_ok"] and out[1]["width"] == 100
    assert out[3]["decode_ok"] and out[3]["height"] == 32
    assert out[2]["decode_ok"] is False
    assert out[2]["format"] is None and out[2]["width"] is None
    assert out[2]["byte_len"] == 19


def test_min_label_components_planted_chains(spark):
    from stockpulse_spark.operators.dedup import min_label_components

    edges = spark.createDataFrame(
        [(2, 7), (7, 9), (9, 11), (11, 30), (100, 101), (101, 102)],
        "src long, dst long",
    )
    labels = {r["id"]: r["label"] for r in min_label_components(edges).collect()}
    assert all(labels[v] == 2 for v in (2, 7, 9, 11, 30))
    assert all(labels[v] == 100 for v in (100, 101, 102))


def test_min_label_refuses_unconverged_long_chain(spark):
    """Plain propagation needs O(diameter) rounds; under a cap that a
    pathological chain exceeds, it must FAIL LOUDLY (wrong dedup labels
    silently merging/splitting groups is the worst outcome)."""
    from stockpulse_spark.operators.dedup import min_label_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src long, dst long"
    )
    with pytest.raises(ValueError, match="not converged"):
        min_label_components(chain, max_iter=5)


def test_star_components_long_chain_logarithmic_rounds(spark):
    """The 100 TB contract: a planted 1200-node chain — the worst case
    for label propagation (diameter 1200) — must fully converge under a
    12-round cap, which only holds if the alternating large-star/
    small-star contraction is genuinely logarithmic."""
    from stockpulse_spark.operators.dedup import star_components

    n = 1200
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    labels = {
        r["id"]: r["label"]
        for r in star_components(chain, max_iter=12).collect()
    }
    assert len(labels) == n + 1
    assert all(v == 0 for v in labels.values())


def test_star_components_matches_min_label_on_random_graphs(spark):
    """Differential check on shapes where both algorithms converge:
    identical labels on random multi-component graphs, plus isolated
    vertices labeling themselves."""
    import random

    from stockpulse_spark.operators.dedup import (
        min_label_components,
        star_components,
    )

    rng = random.Random(7)
    for _ in range(3):
        m = rng.randint(5, 60)
        es = [(rng.randint(0, 40), rng.randint(0, 40)) for _ in range(m)]
        es = [e for e in es if e[0] != e[1]] or [(0, 1)]
        edf = spark.createDataFrame(es, "src long, dst long")
        a = {r["id"]: r["label"] for r in star_components(edf).collect()}
        b = {r["id"]: r["label"] for r in min_label_components(edf).collect()}
        assert a == b
    verts = spark.createDataFrame([(i,) for i in range(8)], "id long")
    edf = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    lab = {
        r["id"]: r["label"]
        for r in star_components(edf, vertices=verts).collect()
    }
    assert lab == {0: 0, 1: 1, 2: 1, 3: 3, 4: 3, 5: 5, 6: 6, 7: 7}


def test_transitive_keeper_chains_elect_one_keeper(spark):
    """Every planted A-B-C chain must land in ONE component: C (largest
    id) only touches B, so 1-hop min-id would elect B as its keeper —
    label propagation must carry A's id across both hops."""
    from stockpulse_spark.plans import REGISTRY

    out = REGISTRY["dedup_keeper_transitive"].builder(spark, SF_DIR).collect()
    keeper = {r["doc_id"]: r["keeper_id"] for r in out}
    dup = {r["doc_id"]: r["is_duplicate"] for r in out}
    origs = [d for d in keeper if d % 4 == 0]  # A tier: ids 4i
    assert origs
    for d in origs:
        assert keeper[d + 1] == keeper[d] == keeper[d + 2]
        assert keeper[d] <= d
        assert dup[d + 1] and dup[d + 2]


def test_doc_chunking_reconstructs_corpus(spark, docs):
    """Chunks must cover the corpus losslessly: taking each chunk's
    first `stride` words (the non-overlapping prefix) in chunk order
    reassembles every document exactly."""
    from stockpulse_spark.plans import REGISTRY
    from stockpulse_spark.plans.registry_llmpipe import _STRIDE

    chunks = REGISTRY["doc_chunking"].builder(spark, SF_DIR).collect()
    by_doc = {}
    for r in sorted(chunks, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        part = r["chunk_text"].split(" ")[:_STRIDE]
        by_doc.setdefault(r["doc_id"], []).extend(part)
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(by_doc) == set(orig)
    for did, words in by_doc.items():
        assert " ".join(words) == orig[did], f"doc {did} mangled"


# ---------------------------------------------------------------------------
# real PNG pixel codec (llmdata/multimodal.py: encode_png / decode_png_pixels)


def _checker_pixels(w: int, h: int) -> bytes:
    return bytes(
        ((x + y + 37 * c) * 11) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


def test_png_pixel_roundtrip_all_filters():
    """encode_png cycles filter types 0-4 across scanlines, so a green
    round-trip proves the decoder implements the whole PNG filter set
    (Sub/Up/Average/Paeth), not just filter 0."""
    from stockpulse_spark.llmdata.multimodal import decode_png_pixels, encode_png

    for w, h in [(1, 1), (4, 7), (33, 6), (16, 16)]:
        pix = _checker_pixels(w, h)
        rw, rh, ch, out = decode_png_pixels(encode_png(w, h, pix))
        assert (rw, rh, ch) == (w, h, 3)
        assert out == pix


def test_png_decode_rejects_corruption():
    """Every corruption class raises ValueError: flipped pixel bytes
    (CRC catches it), a corrupted zlib stream, a bad filter type, and a
    truncated file."""
    from stockpulse_spark.llmdata.multimodal import decode_png_pixels, encode_png

    good = encode_png(8, 5, _checker_pixels(8, 5))
    # flip one byte inside the IDAT payload -> CRC mismatch
    idat_off = good.index(b"IDAT") + 6
    bad_crc = good[:idat_off] + bytes([good[idat_off] ^ 0xFF]) + good[idat_off + 1 :]
    with pytest.raises(ValueError, match="CRC"):
        decode_png_pixels(bad_crc)
    # truncation
    with pytest.raises(ValueError):
        decode_png_pixels(good[: len(good) // 2])
    # valid CRC but bogus zlib bytes: rebuild the IDAT chunk wholesale
    import struct
    import zlib

    start = good.index(b"IDAT") - 4
    end_len = int.from_bytes(good[start : start + 4], "big")
    bogus = b"\x00" * end_len
    chunk = (
        struct.pack(">I", end_len) + b"IDAT" + bogus
        + struct.pack(">I", zlib.crc32(b"IDAT" + bogus) & 0xFFFFFFFF)
    )
    bad_stream = good[:start] + chunk + good[start + 12 + end_len :]
    with pytest.raises(ValueError):
        decode_png_pixels(bad_stream)


def test_png_features_match_pixel_stats():
    """Channel mean/std from the decoder equal stats computed directly
    on the raw pixels we fed the encoder."""
    import numpy as np

    from stockpulse_spark.llmdata.multimodal import encode_png, png_channel_features

    w, h = 12, 9
    pix = _checker_pixels(w, h)
    feats = png_channel_features(encode_png(w, h, pix))
    a = np.frombuffer(pix, dtype=np.uint8).reshape(-1, 3).astype(np.float64)
    want = [*(a.mean(axis=0) / 255.0), *(a.std(axis=0) / 255.0)]
    assert feats["width"] == w and feats["height"] == h
    assert np.allclose(feats["feature_vec"], want, atol=1e-12)


def test_png_feature_kernel_dead_letters(spark):
    """The mapInPandas kernel routes corrupt payloads to decode_ok=false
    rows instead of failing the job."""
    from stockpulse_spark.llmdata.multimodal import encode_png, extract_png_features

    good = encode_png(6, 4, _checker_pixels(6, 4))
    rows = [(1, bytearray(good)), (2, bytearray(good[:20])), (3, bytearray(b"junk"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in extract_png_features(df).collect()}
    assert out[1]["decode_ok"] and out[1]["width"] == 6
    assert len(out[1]["feature_vec"]) == 6
    assert not out[2]["decode_ok"] and out[2]["feature_vec"] is None
    assert not out[3]["decode_ok"]


def test_minhash_bucket_cap_drops_boilerplate_bucket(spark):
    """Planted hot bucket: 200 docs share one boilerplate text (a crawl
    banner) and would alone contribute ~19,900 candidate pairs through
    every band; the cap (64) must drop those buckets entirely while a
    genuine near-dup pair with distinctive content still surfaces.
    Disabling the cap on the same input must reintroduce the quadratic
    pair blow-up — proving the cap, not the data, is what bounds it."""
    from stockpulse_spark.llmdata.dedup import minhash_lsh_pairs

    banner = " ".join(f"cookie policy terms w{i}" for i in range(10))
    uniq = (
        "quick brown fox jumps over the lazy dog number %d variant "
        "alpha beta gamma delta epsilon zeta eta theta"
    )
    rows = [(i, banner) for i in range(200)]
    rows += [(1001, uniq % 1), (1002, uniq % 1)]  # true near-dup pair
    rows += [(2000 + i, uniq % (50 + i)) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = minhash_lsh_pairs(docs, threshold=0.5).collect()
    capped_pairs = {(r["doc_id_1"], r["doc_id_2"]) for r in capped}
    assert (1001, 1002) in capped_pairs
    assert not any(a < 1000 and b < 1000 for a, b in capped_pairs), (
        "boilerplate bucket leaked through the cap"
    )

    uncapped = minhash_lsh_pairs(docs, threshold=0.5, bucket_cap=None).count()
    assert uncapped >= 200 * 199 // 2, "expected the quadratic blow-up"


# ---------------------------------------------------------------------------
# real WAV/PCM codec (llmdata/multimodal.py: encode_wav / decode_wav)


def test_wav_roundtrip_and_features():
    from stockpulse_spark.llmdata.multimodal import (
        decode_wav,
        encode_wav,
        wav_audio_features,
    )

    samples = [0, 1000, -1000, 32767, -32768, 12, -12, 0]
    rate, out = decode_wav(encode_wav(44100, samples))
    assert rate == 44100 and out == samples
    f = wav_audio_features(encode_wav(8000, samples))
    assert f["n_samples"] == 8 and f["peak"] == 32768
    # strict sign flips: (1000,-1000) (-1000,32767) (32767,-32768)
    # (-32768,12) (12,-12) — the leading/trailing zeros break no pair
    assert f["zero_crossings"] == 5


def test_wav_decode_rejects_corruption():
    import struct

    from stockpulse_spark.llmdata.multimodal import decode_wav, encode_wav

    good = encode_wav(8000, [1, -2, 3, -4])
    with pytest.raises(ValueError):  # truncated
        decode_wav(good[:20])
    with pytest.raises(ValueError, match="RIFF size"):
        decode_wav(good + b"\x00")  # size field no longer matches
    bad_magic = b"RIFX" + good[4:]
    with pytest.raises(ValueError):
        decode_wav(bad_magic)
    # stereo declared in fmt -> unsupported
    stereo = bytearray(good)
    stereo[22] = 2
    with pytest.raises(ValueError, match="mono"):
        decode_wav(bytes(stereo))
    # odd data chunk length
    pos = good.index(b"data")
    odd = bytearray(good)
    odd[pos + 4 : pos + 8] = struct.pack("<I", 5)
    with pytest.raises(ValueError):
        decode_wav(bytes(odd))


def test_box_downsample_resize():
    from stockpulse_spark.llmdata.multimodal import box_downsample_2x

    # 4x2 image, value = x + 10*y per channel offset c*100
    pix = bytes((x + 10 * y + 100 * c) % 256 for y in range(2) for x in range(4) for c in range(3))
    rs = box_downsample_2x(4, 2, pix)
    # out 2x1: block (x=0..1, y=0..1) mean = (0 + 1 + 10 + 11)/4 = 5.5
    assert rs[0] == 5.5 and rs[1] == 105.5 and rs[2] == 205.5
    assert rs[3] == 7.5  # block x=2..3: (2+3+12+13)/4
    assert len(rs) == 2 * 1 * 3
    # odd trailing column is cropped
    rs2 = box_downsample_2x(5, 2, bytes(5 * 2 * 3))
    assert len(rs2) == 2 * 1 * 3
    with pytest.raises(ValueError):
        box_downsample_2x(1, 1, bytes(3))


def test_semantic_dedup_clusters_transitively(spark):
    """Semantic dedup must be transitive: A~B and B~C (cosine >= 0.5)
    puts all three under one keeper even when A~C directly misses the
    threshold."""
    from stockpulse_spark.plans import REGISTRY

    out = REGISTRY["semantic_dedup_keepers"].builder(spark, SF_DIR).collect()
    keeper = {r["vec_id"]: r["keeper_id"] for r in out}
    size = {r["vec_id"]: r["cluster_size"] for r in out}
    assert len(out) == 500
    # every keeper is its own keeper, and cluster sizes are consistent
    for vid, k in keeper.items():
        assert keeper[k] == k, f"keeper {k} of {vid} is not a root"
        assert size[vid] == size[k]
    # at least some structure exists (testdata embeddings correlate)
    dups = [r for r in out if r["is_duplicate"]]
    assert all(keeper[r["vec_id"]] < r["vec_id"] for r in dups)


def test_silence_segments_known_runs(spark):
    """Hand-built PCM with known silent runs: segments respect the
    threshold boundary, the min-length filter, and exclusive ends."""
    from stockpulse_spark.llmdata.multimodal import encode_wav, silence_segments

    samples = (
        [1000] * 3          # loud
        + [10, -20, 30, 0]  # silent run of 4 -> kept
        + [500]             # loud
        + [5, 5, 5]         # silent run of 3 -> dropped (min_len 4)
        + [-300]            # loud
        + [0] * 6           # silent run of 6 -> kept
    )
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(8000, samples))), (2, bytearray(b"junk"))],
        "doc_id long, payload binary",
    )
    rows = sorted(
        silence_segments(df).collect(), key=lambda r: (r["doc_id"], r["seg_idx"])
    )
    assert [(r["doc_id"], r["seg_idx"], r["start_idx"], r["end_idx"], r["seg_len"])
            for r in rows] == [(1, 0, 3, 7, 4), (1, 1, 12, 18, 6)]


def test_full_dedup_pipeline_elects_one_keeper_per_cluster(spark):
    """End-to-end funnel -> components -> keepers: planted mutations
    land under their original's keeper, keepers are roots, and
    non-duplicates keep themselves."""
    from stockpulse_spark.plans import REGISTRY

    out = REGISTRY["doc_dedup_pipeline_full"].builder(spark, SF_DIR).collect()
    keeper = {r["doc_id"]: r["keeper_id"] for r in out}
    assert len(out) == 1000  # 500 originals + 500 mutations
    for vid, k in keeper.items():
        assert keeper[k] == k
        assert k <= vid
    # most planted mutations (2d+1) must cluster with the original (2d)
    linked = sum(
        1 for d in range(500)
        if 2 * d + 1 in keeper
        and keeper[2 * d + 1] == keeper.get(2 * d, 2 * d)
    )
    assert linked > 300, f"only {linked}/500 planted pairs clustered"


def test_incremental_gate_verdicts(spark):
    """Planted batch tiers get the right verdicts: exact copies ->
    exact_dup, 5-word-dropped mutations -> mostly near_dup, reversed
    texts -> overwhelmingly new."""
    from stockpulse_spark.plans import REGISTRY

    out = REGISTRY["incremental_dedup_gate"].builder(spark, SF_DIR).collect()
    verdict = {r["batch_id"] - 1000000: r["verdict"] for r in out}
    exact = [verdict[d] for d in verdict if d % 5 == 0]
    near = [verdict[d] for d in verdict if d % 5 == 1]
    new = [verdict[d] for d in verdict if d % 5 == 2]
    assert all(v == "exact_dup" for v in exact)
    assert sum(v == "near_dup" for v in near) > 0.6 * len(near)
    assert sum(v == "new" for v in new) > 0.9 * len(new)


def test_lsh_recall_eval_s_curve(spark):
    """The measured LSH catch-rate must look like an S-curve: (near-)
    total recall on true near-dups (the planted mutations live in the
    top Jaccard deciles), and near-zero candidate waste on the J<0.1
    background mass of co-shingle pairs."""
    rows = {
        r["jaccard_bucket"]: r
        for r in REGISTRY["minhash_lsh_recall_eval"]
        .builder(spark, SF_DIR)
        .collect()
    }
    assert rows, "no buckets"
    top = max(rows)
    assert top >= 8, f"no high-similarity pairs found (top bucket {top})"
    assert rows[top]["catch_rate"] >= 0.9, rows[top]
    if 0 in rows:
        assert rows[0]["catch_rate"] <= 0.1, rows[0]
    # counts are consistent: caught never exceeds pairs
    for r in rows.values():
        assert 0 <= r["n_caught"] <= r["n_pairs"]


def test_shard_assignment_covers_corpus_and_balances(spark):
    """Every document lands in exactly one shard, and the md5-derived
    key spreads well enough to pass its own 2x-mean certificate."""
    from stockpulse_spark.sources.tables import load_table

    rows = (
        REGISTRY["shard_assignment_balance"].builder(spark, SF_DIR).collect()
    )
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert len({r["shard"] for r in rows}) == len(rows)
    assert all(0 <= r["shard"] < 16 for r in rows)
    assert all(r["balanced_2x"] for r in rows)


def test_ann_recall_eval_measures_nontrivial_recall(spark):
    """The SRP-ANN must retrieve a meaningful share of the true exact
    top-10 (multi-table recall), and the bookkeeping must be sound
    (hits never exceed the exact set)."""
    rows = REGISTRY["ann_recall_eval"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_hit"] <= r["n_exact"], r
    mean_recall = sum(r["recall_at_10"] for r in rows) / len(rows)
    assert mean_recall >= 0.3, mean_recall


def test_decontamination_recall_boundary(spark):
    """The 5-gram detector's boundary must be exactly where shingling
    puts it: any >=5-word contiguous copy is flagged (verbatim and
    10-word spans at 1.0), a 4-word span is structurally invisible
    (0.0), and the organic clean-train false-positive rate stays
    small."""
    rows = {
        r["cohort"]: r
        for r in REGISTRY["decontamination_recall_eval"]
        .builder(spark, SF_DIR)
        .collect()
    }
    assert rows["copy_full"]["flag_rate"] == 1.0, rows["copy_full"]
    assert rows["copy_span10"]["flag_rate"] == 1.0, rows["copy_span10"]
    assert rows["copy_span4"]["flag_rate"] == 0.0, rows["copy_span4"]
    assert rows["clean_train"]["flag_rate"] <= 0.2, rows["clean_train"]


def test_decontamination_fuzzy_tier_catch_rate_measured(spark):
    """MEASURE (don't assert) what the MinHash fuzzy tier adds at the
    5-gram detector's 4-word blind spot (VERDICT r07 item 8).

    Plant the same cohorts decontamination_recall_eval plants, plus
    an edited near-copy (every 4th word rewritten — kills every
    5-gram), then run the deployed MinHash-LSH tier (k=16, bands=8,
    3-word shingles, est-Jaccard >= 0.5) across train+eval and count
    planted pairs it recovers.  Measured result, now pinned:

    - copy_full: 1.0 — verbatim re-plants all pair with their source.
    - copy_span4: 0.0 — a 4-word snippet shares <= 2 of a 25+-word
      doc's shingles; estimated Jaccard can't reach any useful
      threshold.  The fuzzy tier does NOT cover the 4-word blind
      spot, and the docstring no longer claims it does: sub-5-word
      overlap is out of decontamination scope BY DESIGN (idiom-level
      collocations, negligible eval signal), not delegated.
    - copy_edited(1-in-4): 0.0 at the deployed threshold — token
      edits dense enough to defeat 5-grams also push 3-shingle
      Jaccard to ~1/7.  The fuzzy tier's real decontamination value
      is near-VERBATIM copies (char noise, whitespace, punctuation),
      which it catches at 1.0; dense paraphrase evades both tiers
      and is embedding-similarity territory (label_centroid /
      semantic-dedup family), stated in the docstring.
    """
    from pyspark.sql import functions as F

    from stockpulse_spark.llmdata.dedup import minhash_lsh_pairs
    from stockpulse_spark.sources.tables import load_table

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    b = d.select(
        "doc_id",
        "text",
        (
            F.expr("cast(conv(substr(md5(text),1,8),16,10) as bigint)") % 100
        ).alias("bucket"),
        F.split("text", " ").alias("w"),
    )
    ev = b.filter((F.col("bucket") >= 90) & (F.size("w") >= 25))
    n_ev = ev.count()
    assert n_ev > 0
    full = ev.select((F.col("doc_id") + 3000000).alias("doc_id"), "text")
    span4 = ev.select(
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.array_join(F.slice("w", 9, 4), " ").alias("text"),
    )
    edited = ev.select(
        (F.col("doc_id") + 6000000).alias("doc_id"),
        F.array_join(
            F.transform(
                F.col("w"),
                lambda x, i: F.when(i % 4 == 3, F.lit("zqx")).otherwise(x),
            ),
            " ",
        ).alias("text"),
    )
    union = d.unionAll(full).unionAll(span4).unionAll(edited)
    pairs = minhash_lsh_pairs(union)  # deployed defaults
    ev_ids = ev.select(F.col("doc_id").alias("doc_id_1"))

    def caught(offset: int) -> int:
        # exactly the (source eval doc, its planted copy) pairs
        return (
            pairs.withColumn(
                "doc_id_2", F.col("doc_id_2") - F.lit(offset)
            )
            .filter(F.col("doc_id_1") == F.col("doc_id_2"))
            .join(ev_ids, "doc_id_1")
            .count()
        )

    caught_full = caught(3000000)
    caught_span4 = caught(5000000)
    caught_edited = caught(6000000)
    assert caught_full == n_ev, (caught_full, n_ev)
    assert caught_span4 == 0, (caught_span4, n_ev)
    assert caught_edited == 0, (caught_edited, n_ev)


def test_srp_recall_certificate_gate_holds(spark):
    """The driver-hashed deployment gate must agree with the pytest
    recall floor: one row, integer bookkeeping sound, meets_gate True
    at the 8x4 table/plane budget on the test corpus."""
    rows = (
        REGISTRY["srp_ann_recall_certificate"].builder(spark, SF_DIR).collect()
    )
    assert len(rows) == 1
    r = rows[0]
    assert r["n_queries"] == 10
    assert 0 <= r["n_hit"] <= r["n_exact"]
    assert r["meets_gate"] == (2 * r["n_hit"] >= r["n_exact"])
    assert r["meets_gate"], r


def test_signatures_not_reused_across_invocations(spark):
    """Bench-honesty contract (optimization round r11): the MinHash
    signature table is materialized once PER INVOCATION (localCheckpoint
    shared by the three plan branches) but never across invocations —
    no module-level memo, no CacheManager entry that a re-built
    identical query would silently hit warm."""
    from stockpulse_spark.llmdata import dedup as d

    # the old cross-run cache must stay gone
    assert not hasattr(d, "_SIG_CACHE")
    assert not hasattr(d, "_cached_signatures")

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], ["doc_id", "text"]
    )
    sig = df.select("doc_id", d.minhash_signature(F.col("text")).alias("sig"))
    out1 = d._shared_signatures(sig)
    out2 = d._shared_signatures(sig)
    # distinct checkpoint instances per call: no shared materialization
    assert out1 is not out2
    # persist() would register the canonicalized plan in CacheManager;
    # localCheckpoint must not (jvm lookup returns no cached data)
    jcache = spark._jsparkSession.sharedState().cacheManager()
    assert jcache.lookupCachedData(out1._jdf).isEmpty()
    # and the checkpointed frame still computes the right signatures
    rows = {r["doc_id"]: r["sig"] for r in out1.collect()}
    ref = {r["doc_id"]: r["sig"] for r in sig.collect()}
    assert rows == ref


def test_decontamination_recall_survives_planted_id_collision(
    spark, tmp_path
):
    """Regression for the planted-id collision class.  Under the old
    additive scheme (+3M/+4M/+5M), doc 7's verbatim copy landed at id
    3000007 — the same id as the real clean doc planted here, relying
    on (doc_id, cohort) keying to avoid cross-flagging.  Round 9
    migrated the plants to residue-class ids (k=4, offsets 0-3), which
    are injective for ANY input range, so the same adversarial input
    now cannot collide at all: the clean doc keeps its own identity
    (clean_train n_docs exactly 1, unflagged) and the copy flags 1.0."""
    eval_text = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu probe7"
    )  # md5 bucket 93 -> eval side, 27 words
    clean_text = " ".join(f"w{j}x1" for j in range(30))  # bucket 61
    df = spark.createDataFrame(
        [(7, eval_text), (3000007, clean_text)], "doc_id long, text string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["cohort"]: r
        for r in REGISTRY["decontamination_recall_eval"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    assert rows["copy_full"]["flag_rate"] == 1.0
    assert rows["clean_train"]["n_docs"] == 1
    assert rows["clean_train"]["flag_rate"] == 0.0, (
        "planted-id collision cross-flagged the clean doc"
    )


def test_capped_band_pairs_drops_hot_bucket_only(spark):
    """The band-bucket cap must drop ONLY the over-cap band's
    contribution: items in a hot bucket still pair through their
    other bands; fully-hot pairs disappear."""
    from stockpulse_spark.llmdata.dedup import capped_band_pairs

    # b0: items 1..4 share bucket 9 (hot, > cap=3); b1: only 1,2 share
    rows = [
        (1, 9, 100),
        (2, 9, 100),
        (3, 9, 101),
        (4, 9, 102),
    ]
    fp = spark.createDataFrame(rows, "vid long, b0 int, b1 int")
    got = {
        (r["vid_1"], r["vid_2"])
        for r in capped_band_pairs(fp, ("b0", "b1"), cap=3).collect()
    }
    # bucket b0=9 holds 4 > cap -> its 6 pairs are dropped; the b1
    # bucket 100 (size 2 <= cap) still pairs (1, 2)
    assert got == {(1, 2)}
    # cap high enough -> all 6 b0 pairs return
    got_all = {
        (r["vid_1"], r["vid_2"])
        for r in capped_band_pairs(fp, ("b0", "b1"), cap=10).collect()
    }
    assert len(got_all) == 6
