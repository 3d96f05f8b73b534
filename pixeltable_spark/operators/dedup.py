"""Deduplication operators: exact, MinHash(+LSH), SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Spark-first design notes (100 TB):
* exact dedup = hash-groupBy on a content fingerprint — one shuffle keyed by
  the md5, perfectly parallel, AQE handles skew (empty/boilerplate docs).
* MinHash: shingle explode -> per-doc min over K independent md5-derived
  hash functions (one groupBy with K min() aggregates — map-side partial
  aggregation keeps shuffle volume at K values/doc). LSH banding buckets
  signatures so candidate generation is an equi-join on (band, bucket-key) —
  never an n² cross join.
* SimHash: per-token md5-derived bit parities, summed per doc per bit
  (again one groupBy, 2^b weights), Hamming-style near-dup via equality on
  the 16-bit key or banding.
* n-gram Jaccard: candidate pairs from a self-equi-join on shared shingles
  (shuffle on shingle), |intersection| via count, Jaccard from per-doc
  shingle counts — the classic similarity-join, no cross product.
* embedding near-dup: cosine-threshold pairs via LSH hyperplane buckets
  (see similarity.py) or block-local brute force.

All hashing uses md5 (engine-portable) so the DuckDB oracle can reproduce
results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import fingerprint


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Group identical (normalized) texts: fingerprint, group size,
    representative = min id. One shuffle on the fingerprint."""
    return (
        df.withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("rep_id"))
    )


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one representative row per identical text (min id wins).
    Window-free formulation: join back on (fp, min_id)."""
    reps = exact_dup_groups(df, text_col, id_col).select(
        F.col("rep_id").alias(id_col)
    )
    return df.join(reps, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------

def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the lowercased text (array<string>).
    Computed with native higher-order functions — no UDF."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    if n == 1:
        return F.array_distinct(toks)
    # indexes 0..len-n ; shingle i = concat_ws(' ', toks[i..i+n-1]).
    # guard: sequence(0, negative) would generate a DESCENDING range, so
    # short docs (< n tokens) explicitly get zero shingles
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
        )
    )
    return F.when(F.size(toks) >= n, shingles).otherwise(
        F.array().cast("array<string>")
    )


def explode_shingles(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 3) -> DataFrame:
    return df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 8,
                       shingle_n: int = 3) -> DataFrame:
    """K-permutation MinHash: h_i(s) = md5(i || '|' || s); sig_i = min_s h_i.

    One explode + one groupBy with K min() aggregates; partial (map-side)
    aggregation reduces shuffle to K strings per doc regardless of doc size.
    Output: id, sig_0..sig_{K-1}.
    """
    ex = explode_shingles(df, text_col, id_col, shingle_n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 8,
                      bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: docs sharing any band of
    their MinHash signature. Equi-join on (band_idx, band_key) — candidate
    generation never goes n²."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *[F.col(f"sig_{b * rows_per_band + r}")
                                     for r in range(rows_per_band)])).alias("key"),
        )
        for b in range(bands)
    ]
    banded = sigs.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")).select(
        F.col(id_col), F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=[F.col("a.band") == F.col("b.band"),
                      F.col("a.key") == F.col("b.key"),
                      F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 16) -> DataFrame:
    """SimHash over word tokens. Bit b of token t = parity of the first hex
    char of md5('b<b>|' || t); document bit b = majority sign of
    sum(2*parity-1). Output: id, simhash (long in [0, 2^bits)).

    Single explode + single groupBy with `bits` sum() aggregates — shuffle
    is `bits` ints per doc."""
    ex = explode_shingles(df, text_col, id_col, n=1)
    aggs = []
    for b in range(bits):
        parity = F.ascii(F.substring(F.md5(F.concat(F.lit(f"b{b}|"), F.col("shingle"))), 1, 1)) % 2
        aggs.append(F.sum(parity * 2 - 1).alias(f"s_{b}"))
    sums = ex.groupBy(id_col).agg(*aggs)
    val = F.lit(0).cast(T.LongType())
    for b in range(bits):
        val = val + F.when(F.col(f"s_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sums.select(F.col(id_col), val.alias("simhash"))


def simhash_dup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """Docs whose full SimHash collides (Hamming distance 0 buckets)."""
    sh = simhash(df, text_col, id_col, bits)
    return (
        sh.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n"), F.min(id_col).alias("rep_id"))
        .filter(F.col("n") > 1)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity join
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Pairs with Jaccard(shingles_a, shingles_b) >= threshold.

    Candidates come from a self-equi-join on shingle (shuffle keyed by
    shingle — no cross join); |A∩B| = count of shared shingles; |A∪B| from
    per-doc sizes. Returns id_a < id_b with jaccard rounded to 6 dp."""
    ex = explode_shingles(df, text_col, id_col, n)
    sizes = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, on=[F.col("a.shingle") == F.col("b.shingle"),
                      F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", F.round(
            F.col("c").cast(T.DoubleType())
            / (F.col("sz_a") + F.col("sz_b") - F.col("c")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(df: DataFrame, vec_col: str = "embedding",
                             id_col: str = "vec_id",
                             threshold: float = 0.95,
                             n_planes: int = 0) -> DataFrame:
    """Pairs with cosine >= threshold. With n_planes > 0, candidates are
    restricted to LSH hyperplane buckets (scale path — see similarity.py);
    n_planes=0 compares all pairs block-wise (correctness baseline)."""
    from ..functions.array import cosine_col
    from .similarity import hyperplane_bucket

    left = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    right = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if n_planes > 0:
        left = left.withColumn("bkt", hyperplane_bucket(F.col("va"), n_planes))
        right = right.withColumn("bkt", hyperplane_bucket(F.col("vb"), n_planes))
        joined = left.join(right, on=[F.col("id_a") < F.col("id_b"), F.col("bkt") == right["bkt"]])
    else:
        joined = left.join(right, on=F.col("id_a") < F.col("id_b"))
    return (
        joined.withColumn("cos", F.round(cosine_col(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
