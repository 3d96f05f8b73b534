"""Large-scale training-data pipeline operators — first-class components
beyond the reference's own surface (BASELINE.json north star): deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding near-dup),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, heuristic + char-n-gram-LM quality scoring, Gopher
repetition signals, token counting, fingerprinting), PII
detection/scrubbing, benchmark contamination checks, duplicate-cluster
resolution (connected components over LSH pairs), as-of/range joins,
sequence packing, and multimodal binary-column plumbing.

All hashing is md5-based and engine-portable, so every operator is
oracle-checkable against DuckDB with identical results.
"""

from . import (bpe, dedup, joins, multimodal, pii, profile, quality_clf,
               semdedup, similarity, text, web)

__all__ = ["dedup", "similarity", "text", "multimodal", "pii", "joins",
           "profile", "semdedup"]
