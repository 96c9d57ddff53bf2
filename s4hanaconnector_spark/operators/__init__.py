"""Engine operators (SURVEY §2.2/§2.3), grouped by domain:

cdc          change-data-capture core (delta query, watermark, retention, …)
relational   projection/filter/join/agg/window/set-op surface
nesting      business-object nested documents (master + detail arrays)
dedup        exact + fuzzy document deduplication (MinHash-LSH, SimHash, …)
similarity   embedding similarity search (brute-force + LSH-bucketed top-k)
text         text analysis (token counts, quality, language-id, fingerprints)
multimodal   opaque binary columns with typed metadata + pandas-UDF plumbing
"""
