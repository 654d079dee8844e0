"""Custom operators the DataFrame API lacks as single calls: as-of join,
dedup family (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
search, multimodal column plumbing."""
