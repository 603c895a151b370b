"""Large-scale training-data operators (north-star extension, SURVEY §7 M5).

Not in the reference — these are the operations a 100 TB LLM-data
pipeline needs, built Spark-first alongside the reference's surface:

    textstats    language-ID, quality scoring, token counting,
                 document fingerprinting
    dedup        exact, MinHash+LSH, SimHash, n-gram Jaccard
    similarity   brute-force cosine top-k + SRP-LSH bucketed ANN
    multimodal   opaque binary columns + mapInPandas decode plumbing

Design rules: everything stays JVM-side (higher-order functions over
arrays, no per-row Python) except the multimodal decode kernels, which
are Arrow-batched mapInPandas by construction. Hash functions are md5
(identical bytes→hex in Spark and DuckDB) so every operator keeps a
DuckDB oracle.
"""
