"""Large-scale training-data pipeline operators — first-class components
beyond the reference's own surface (BASELINE.json north star): deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding near-dup),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, heuristic + char-n-gram-LM quality scoring, Gopher
repetition signals, token counting, fingerprinting), PII
detection/scrubbing, benchmark contamination checks, duplicate-cluster
resolution (connected components over LSH pairs), as-of/range/interval/
fuzzy-blocking joins, sequence packing, multimodal binary-column
plumbing, BM25 retrieval + TF-IDF keywords (search), event analytics
(funnel / cohort retention / SCD2 / gap fill / OHLC / rolling z-score —
timeseries), ML-data prep (splits, standardization, negative sampling,
weighted sampling, ranking metrics — mldata), experiment statistics
(Welch t / two-proportion z — stats), reshape (pivot/melt), and
data-quality audits (FK integrity — quality).

All hashing is md5-based and engine-portable, so every operator is
oracle-checkable against DuckDB with identical results.
"""

from . import (bpe, dedup, joins, mldata, multimodal, pii, profile,
               quality, quality_clf, reshape, search, semdedup,
               similarity, stats, text, timeseries, web)

__all__ = ["dedup", "similarity", "text", "multimodal", "pii", "joins",
           "profile", "semdedup", "search", "timeseries", "mldata",
           "stats", "reshape", "quality"]
