"""Custom operators Spark core lacks (SURVEY.md §4.3 'what we build').

- ``merge``      : M1 keyed upsert + atomic versioned parquet table
                   (plain or partition-pruned with hard-linked rest).
- ``asof``       : B15 as-of join (union + window, shuffle-once).
- ``dedup``      : C1 exact, C2 MinHash-LSH / SimHash / n-gram Jaccard.
- ``similarity`` : C3 cosine top-k (brute-force, LSH-bucketed, IVF) +
                   C2e embedding-cosine near-dup pairs.
- ``skew``       : salted aggregation / salted join (hot-key rewrites).
- ``text``       : C4 language-ID, quality score, tokens, fingerprint.
- ``multimodal`` : C5 binary-column plumbing (decode stubbed).
"""
