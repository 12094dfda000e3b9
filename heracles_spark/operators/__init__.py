"""LLM-data-pipeline operators (beyond the reference surface — SURVEY §7.2.7):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search (brute-force + LSH ANN), text analysis, multimodal
plumbing. All designed shuffle-aware for 100 TB: no driver collects, no
cross joins on large sides, inverted-index joins instead of pairwise."""
