"""Large-scale training-data pipeline operators.

Beyond the reference's surface: deduplication (exact, MinHash+LSH, SimHash,
n-gram Jaccard), embedding similarity search (brute-force + LSH-bucketed),
text analysis (language ID, quality scoring, token counting, fingerprinting),
and multimodal binary-column plumbing. All designed for 100 TB: built-in
column expressions where possible, Arrow-batched pandas UDFs where not, and
LSH/banding so no operator is O(n^2) in document count.
"""
