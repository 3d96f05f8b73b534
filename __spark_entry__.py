"""Driver contract for the spark-graft builder (PySpark target).

Every entry routes through the pixeltable_spark engine (Query API or the
operators/ library); oracle_sql() carries the DuckDB-dialect equivalent.
All float outputs are rounded in BOTH engines (sums to 2 dp, ratios to
4-6 dp) so value hashes are stable across summation orders; all hashing
used by sampling/dedup/LSH operators is md5-based and engine-portable.

One-command verification of EVERY declared query (the driver's gate
samples a window; this runs all of them against their oracles):

    python tools/check_correctness.py /root/testdata/sf0.01

Exit 0 = all queries match DuckDB (rows + schema + values); the five
oracle-less ops (q70 PQ, q88 SemDeDup, q91 BPE, q92 LSA, q95 ICWS —
iterative algorithms or engine-specific ulp behavior) report ROWS-ONLY
and are pinned by property tests instead.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import pixeltable_spark as pxt
from pixeltable_spark import functions as pxtf
from pixeltable_spark.exprs import Function
from pixeltable_spark.operators import dedup, multimodal, similarity, text as textops

# round-half-up (matches DuckDB round()); digits selects the expression
R = Function("round_half_up", pxt.Float(), spark_fn=lambda x, digits=0: F.round(x, digits))


def _rp(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet through the registry's single-file schema
    cache: skips the per-construction footer-inference job for the
    immutable testdata files (metadata caching only — data is always
    scanned fresh)."""
    from pixeltable_spark.sources.registry import _parquet_df
    return _parquet_df(spark, path)


def _t(spark: SparkSession, sf_dir: str, name: str):
    return pxt.table_from_parquet(spark, f"{sf_dir}/{name}.parquet", name)


def _df(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _t(spark, sf_dir, name).df()


# ---------------------------------------------------------------------------
# relational queries (engine Query API)
# ---------------------------------------------------------------------------

def q01_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: filter + group_by + 8 aggregates + order."""
    t = _t(spark, sf_dir, "lineitem")
    disc_price = t.l_extendedprice * (1 - t.l_discount)
    return (
        t.where(t.l_shipdate <= datetime(1998, 9, 2))
        .group_by(t.l_returnflag, t.l_linestatus)
        .select(
            t.l_returnflag, t.l_linestatus,
            sum_qty=R(pxtf.sum(t.l_quantity), digits=2),
            sum_base_price=R(pxtf.sum(t.l_extendedprice), digits=2),
            sum_disc_price=R(pxtf.sum(disc_price), digits=4),
            sum_charge=R(pxtf.sum(disc_price * (1 + t.l_tax)), digits=6),
            avg_qty=R(pxtf.mean(t.l_quantity), digits=4),
            avg_price=R(pxtf.mean(t.l_extendedprice), digits=4),
            avg_disc=R(pxtf.mean(t.l_discount), digits=4),
            count_order=pxtf.count(t.l_orderkey),
        )
        .order_by(t.l_returnflag, t.l_linestatus)
        .df()
    )


def q02_project_arith(spark, sf_dir):
    """Projection with +,-,*,/,%,//,** expression arithmetic."""
    t = _t(spark, sf_dir, "lineitem")
    return (
        t.where(t.l_orderkey < 100)
        .select(
            t.l_orderkey, t.l_linenumber,
            disc_price=R(t.l_extendedprice * (1 - t.l_discount), digits=4),
            ln_mod=t.l_linenumber % 3,
            price_div=R(t.l_extendedprice / 100, digits=4),
            price_floordiv=t.l_extendedprice // 100,
            disc_sq=R(t.l_discount ** 2, digits=6),
        )
        .order_by(t.l_orderkey, t.l_linenumber)
        .df()
    )


def q03_filter_compound(spark, sf_dir):
    """AND/OR/NOT + isin + between predicates."""
    t = _t(spark, sf_dir, "lineitem")
    return (
        t.where(
            ((t.l_returnflag == "R") | (t.l_linestatus == "O"))
            & ~(t.l_quantity < 5)
            & t.l_discount.between(0.02, 0.08)
            & t.l_suppkey.isin([1, 2, 3])
        )
        .select(t.l_orderkey, t.l_linenumber, t.l_quantity, t.l_suppkey)
        .order_by(t.l_orderkey, t.l_linenumber)
        .df()
    )


def q04_join_agg(spark, sf_dir):
    """3-way equi-join + group + agg (revenue by market segment)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        li.join(o, on=li.l_orderkey == o.o_orderkey)
        .join(c, on=o.o_custkey == c.c_custkey)
        .group_by(c.c_mktsegment)
        .select(
            c.c_mktsegment,
            revenue=R(pxtf.sum(li.l_extendedprice * (1 - li.l_discount)), digits=4),
            n_orders=pxtf.count_distinct(o.o_orderkey),
        )
        .order_by(c.c_mktsegment)
        .df()
    )


def q05_left_join(spark, sf_dir):
    """Left outer join preserving customers without orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, on=c.c_custkey == o.o_custkey, how="left")
        .group_by(c.c_custkey)
        .select(c.c_custkey, n_orders=pxtf.count(o.o_orderkey))
        .order_by(c.c_custkey)
        .df()
    )


def q06_order_limit_offset(spark, sf_dir):
    t = _t(spark, sf_dir, "lineitem")
    return (
        t.select(t.l_orderkey, t.l_linenumber, t.l_extendedprice)
        .order_by(t.l_extendedprice, asc=False)
        .order_by(t.l_orderkey, t.l_linenumber)
        .limit(20, offset=5)
        .df()
    )


def q07_distinct(spark, sf_dir):
    t = _t(spark, sf_dir, "lineitem")
    return (
        t.select(t.l_returnflag, t.l_linestatus)
        .distinct()
        .order_by(t.l_returnflag, t.l_linestatus)
        .df()
    )


def q08_top_suppliers(spark, sf_dir):
    """Group + agg + order by aggregate + limit (top-N pattern)."""
    t = _t(spark, sf_dir, "lineitem")
    q = (
        t.group_by(t.l_suppkey)
        .select(t.l_suppkey,
                revenue=R(pxtf.sum(t.l_extendedprice * (1 - t.l_discount)), digits=4))
        .order_by(pxt.ColumnRef("revenue", pxt.Float()), asc=False)
    )
    # deterministic tie-break on suppkey
    return q.df().orderBy(F.col("revenue").desc(), F.col("l_suppkey")).limit(5)


def q09_window_running(spark, sf_dir):
    """Running aggregate — pixeltable's window form (UDA with
    group_by/order_by -> ROWS UNBOUNDED PRECEDING..CURRENT ROW)."""
    t = _t(spark, sf_dir, "lineitem")
    return (
        t.where(t.l_suppkey <= 3)
        .select(
            t.l_suppkey, t.l_orderkey, t.l_linenumber,
            run_qty=pxtf.sum(
                t.l_quantity,
                group_by=t.l_suppkey,
                order_by=[t.l_shipdate, t.l_orderkey, t.l_linenumber],
            ),
        )
        .order_by(t.l_suppkey, t.l_orderkey, t.l_linenumber)
        .df()
    )


def q10_topk_per_group(spark, sf_dir):
    """Top-k per group via ranking window + composed query."""
    t = _t(spark, sf_dir, "lineitem")
    df = t.df()
    from pyspark.sql import Window as W
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber"))
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rk")
        .orderBy("l_returnflag", "rk")
    )


def q11_sample_fraction(spark, sf_dir):
    """Deterministic repeatable hash sampling (md5-threshold)."""
    t = _t(spark, sf_dir, "lineitem")
    return (
        t.sample(fraction=0.2, seed=42)
        .select(t.l_orderkey, t.l_linenumber)
        .order_by(t.l_orderkey, t.l_linenumber)
        .df()
    )


def q12_sample_stratified(spark, sf_dir):
    """n-per-stratum sampling via row_number over md5 order."""
    t = _t(spark, sf_dir, "lineitem")
    return (
        t.sample(n_per_stratum=20, stratify_by=[t.l_returnflag], seed=7)
        .select(t.l_orderkey, t.l_linenumber, t.l_returnflag)
        .order_by(t.l_orderkey, t.l_linenumber)
        .df()
    )


def q13_json_path(spark, sf_dir):
    """JSON path navigation + typed extraction on events.props."""
    e = _t(spark, sf_dir, "events")
    k = e.props["k"].astype(pxt.Int())
    return (
        e.where(k > 50)
        .select(e.event_id, k_val=k)
        .order_by(e.event_id)
        .df()
    )


def q14_string_funcs(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            p.p_partkey,
            up=p.p_name.upper(),
            lo=p.p_brand.lower(),
            ln=p.p_name.len(),
            pos=p.p_name.find("a"),
            rep=p.p_type.replace(" ", "_"),
            pre=p.p_name[0:8],
            cap=p.p_type.capitalize(),
        )
        .order_by(p.p_partkey)
        .limit(50)
        .df()
    )


def q15_math_funcs(spark, sf_dir):
    t = _t(spark, sf_dir, "lineitem")
    return (
        t.where(t.l_orderkey < 50)
        .select(
            t.l_orderkey, t.l_linenumber,
            a=R(pxtf.math.abs(t.l_discount - 0.05), digits=6),
            c=pxtf.math.ceil(t.l_extendedprice / 1000),
            f=pxtf.math.floor(t.l_quantity / 7),
            s=R(pxtf.math.sqrt(t.l_extendedprice), digits=6),
            e=R(pxtf.math.exp(t.l_discount), digits=6),
            l=R(pxtf.math.log(t.l_extendedprice), digits=6),
        )
        .order_by(t.l_orderkey, t.l_linenumber)
        .df()
    )


def q16_timestamp_funcs(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    m = e.ts.month()
    d = e.ts.day()
    return (
        e.group_by(m, e.event_type)
        .select(
            month=m, event_type=e.event_type,
            n=pxtf.count(e.event_id),
            avg_val=R(pxtf.mean(e.value), digits=6),
        )
        .order_by(m, e.event_type)
        .df()
    )


def q17_typecast(spark, sf_dir):
    t = _t(spark, sf_dir, "lineitem")
    return (
        t.where(t.l_orderkey < 30)
        .select(
            t.l_orderkey, t.l_linenumber,
            qty_int=t.l_quantity.astype(pxt.Int()),
            key_str=t.l_orderkey.astype(pxt.String()),
            ln_float=t.l_linenumber.astype(pxt.Float()),
        )
        .order_by(t.l_orderkey, t.l_linenumber)
        .df()
    )


def q18_in_between(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(
            o.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
            & o.o_totalprice.between(50000.0, 200000.0)
        )
        .group_by(o.o_orderstatus)
        .select(o.o_orderstatus, n=pxtf.count(o.o_orderkey),
                total=R(pxtf.sum(o.o_totalprice), digits=2))
        .order_by(o.o_orderstatus)
        .df()
    )


def q19_agg_stats(spark, sf_dir):
    t = _t(spark, sf_dir, "lineitem")
    return (
        t.group_by(t.l_returnflag)
        .select(
            t.l_returnflag,
            n=pxtf.count(t.l_orderkey),
            nd_supp=pxtf.count_distinct(t.l_suppkey),
            sd_qty=R(pxtf.stddev(t.l_quantity), digits=6),
            avg_qty=R(pxtf.mean(t.l_quantity), digits=6),
            min_price=pxtf.min(t.l_extendedprice),
            max_price=pxtf.max(t.l_extendedprice),
        )
        .order_by(t.l_returnflag)
        .df()
    )


def q20_semi_join(spark, sf_dir):
    """left_semi: customers having >= 1 order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, on=c.c_custkey == o.o_custkey, how="semi")
        .select(n=pxtf.count(c.c_custkey))
        .df()
    )


def q21_anti_join(spark, sf_dir):
    """left_anti: customers with no orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, on=c.c_custkey == o.o_custkey, how="anti")
        .select(n=pxtf.count(c.c_custkey))
        .df()
    )


def q22_sessionize(spark, sf_dir):
    """lag + gap-threshold sessionization (30-min gap) per user."""
    e = _t(spark, sf_dir, "events")
    us = e.ts.epoch_micros()
    prev = pxtf.lag(us, group_by=e.user_id, order_by=[e.ts, e.event_id])
    is_new = ((prev == None) | (us - prev > 1800 * 1_000_000)).astype(pxt.Int())  # noqa: E711
    step1 = e.select(e.user_id, is_new=is_new)
    t2 = pxt.TableRef.from_df(step1.df(), "sess")
    return (
        t2.group_by(t2.user_id)
        .select(t2.user_id, n_sessions=pxtf.sum(t2.is_new))
        .order_by(t2.user_id)
        .df()
    )


def q23_date_funcs(spark, sf_dir):
    """Date extraction/arithmetic via the date/timestamp function library."""
    t = _t(spark, sf_dir, "lineitem")
    d = t.l_shipdate.date()
    return (
        t.where(t.l_orderkey < 40)
        .select(
            t.l_orderkey, t.l_linenumber,
            ship_date=d.isoformat(),
            y=t.l_shipdate.year(), m=t.l_shipdate.month(),
            wd=t.l_shipdate.weekday(),
            plus_week=d.add_days(7).isoformat(),
        )
        .order_by(t.l_orderkey, t.l_linenumber)
        .df()
    )


def q24_higher_order_array(spark, sf_dir):
    """Array higher-order functions over tokenized text (JVM-side)."""
    df = _df(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    return (
        df.select(
            F.col("doc_id"),
            F.size(words).alias("n_words"),
            F.upper(F.element_at(words, 1)).alias("first_upper"),
            F.array_max(F.transform(words, lambda w: F.length(w))).alias("longest"),
            F.size(F.filter(words, lambda w: F.length(w) > 4)).alias("n_long"),
        )
        .orderBy("doc_id")
    )


def q25_string_battery2(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            p.p_partkey,
            cnt_a=p.p_name.count("a"),
            sw=p.p_type.startswith("S"),
            cre=p.p_name.contains_re("[aeiou]{2}"),
            lp=p.p_brand.rjust(12),
            dup=p.p_brand * 2,
        )
        .order_by(p.p_partkey)
        .limit(100)
        .df()
    )


def q26_rollup(spark, sf_dir):
    """ROLLUP aggregation (beyond-reference Spark extra, SURVEY §2.4)."""
    df = _df(spark, sf_dir, "lineitem")
    return (
        df.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(),
                 F.col("l_linestatus").asc_nulls_first())
    )


def q27_rank_lag(spark, sf_dir):
    """rank + lag navigation windows."""
    o = _t(spark, sf_dir, "orders")
    rk = pxtf.rank(group_by=o.o_custkey,
                   order_by=[o.o_totalprice, o.o_orderkey])
    prev = pxtf.lag(o.o_totalprice, group_by=o.o_custkey,
                    order_by=[o.o_totalprice, o.o_orderkey])
    return (
        o.where(o.o_custkey < 100)
        .select(o.o_custkey, o.o_orderkey, rk=rk, prev=prev)
        .order_by(o.o_custkey, o.o_orderkey)
        .df()
    )


# ---------------------------------------------------------------------------
# training-data pipeline operators (operators/)
# ---------------------------------------------------------------------------

def q30_dedup_exact(spark, sf_dir):
    df = _df(spark, sf_dir, "documents")
    return dedup.exact_dup_groups(df).orderBy("fp")


def q31_minhash_sigs(spark, sf_dir):
    df = _df(spark, sf_dir, "documents")
    return dedup.minhash_signatures(df, num_hashes=4, shingle_n=3).orderBy("doc_id")


def q32_minhash_lsh_pairs(spark, sf_dir):
    df = _df(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(df, num_hashes=4, bands=2, shingle_n=3).orderBy("id_a", "id_b")


def q33_simhash(spark, sf_dir):
    df = _df(spark, sf_dir, "documents")
    return dedup.simhash(df, bits=16).orderBy("doc_id")


def q34_ngram_jaccard(spark, sf_dir):
    df = _df(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(df, n=3, threshold=0.2).orderBy("id_a", "id_b")


QUERY_VEC = [round(((i * 37) % 19 - 9) / 10.0, 1) for i in range(64)]


def q35_topk_cosine(spark, sf_dir):
    df = _df(spark, sf_dir, "embeddings")
    return similarity.topk_cosine(df, QUERY_VEC, k=20)


def q36_ann_lsh(spark, sf_dir):
    df = _df(spark, sf_dir, "embeddings")
    return similarity.ann_topk_cosine(df, QUERY_VEC, k=10, n_planes=4)


def q37_lsh_buckets(spark, sf_dir):
    df = _df(spark, sf_dir, "embeddings")
    dim = similarity._infer_dim(df, "embedding")
    return (
        df.withColumn("bkt",
                      similarity.hyperplane_bucket(F.col("embedding"), 4,
                                                   dim=dim))
        .groupBy("bkt").agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("bkt")
    )


def q38_embed_near_dup(spark, sf_dir):
    df = _df(spark, sf_dir, "embeddings")
    return dedup.embedding_near_dup_pairs(df, threshold=0.35).orderBy("id_a", "id_b")


def q39_knn_join(spark, sf_dir):
    df = _df(spark, sf_dir, "embeddings")
    probes = df.filter(F.col("vec_id") < 20)
    return similarity.knn_join(probes, df, k=3).orderBy("lid", "rk")


def q40_lang_id(spark, sf_dir):
    """Model-based language id (operators/langid.py: hashed char-n-gram
    Naive Bayes, integer-sum scoring) — corpus-scale explode +
    codegen hash-agg path; spread the single-file scan so the gram
    extraction parallelizes (see textops.spread)."""
    from pixeltable_spark.operators.langid import lang_id_table
    df = textops.spread(_df(spark, sf_dir, "documents"))
    return (
        lang_id_table(df, "doc_id", "text")
        .groupBy("lang_pred").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang_pred")
    )


def q41_text_quality(spark, sf_dir):
    df = textops.spread(_df(spark, sf_dir, "documents"))
    c = F.col("text")
    return (
        df.select(
            F.col("doc_id"),
            textops.token_count(c).alias("n_tokens"),
            F.round(textops.punct_ratio(c), 6).alias("punct_r"),
            F.round(textops.stopword_ratio(c), 6).alias("stop_r"),
            textops.quality_score(c).alias("quality"),
        )
        .orderBy("doc_id")
    )


def q42_token_stats(spark, sf_dir):
    df = _df(spark, sf_dir, "documents")
    return (
        df.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.round(F.avg(textops.token_count(F.col("text"))), 4).alias("avg_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source", "lang")
    )


def q43_doc_chunks(spark, sf_dir):
    """Component-view pattern: document_splitter iterator exploding each doc
    into overlapping token chunks with pos (reference
    exec/component_iteration_node.py; iterators/document.py:10)."""
    from pixeltable_spark.functions.document import document_splitter
    df = _df(spark, sf_dir, "documents")
    return document_splitter(df, chunk_tokens=50, overlap=10).orderBy("doc_id", "pos")


def q44_image_meta(spark, sf_dir):
    """Multimodal binary plumbing: payload -> decoded metadata struct
    (decode stub is md5-deterministic, so the oracle reproduces it)."""
    df = multimodal.documents_as_binary(_df(spark, sf_dir, "documents"))
    out = multimodal.extract_image_metadata(df)
    return out.select(
        "doc_id",
        F.col("image_meta.width").alias("width"),
        F.col("image_meta.height").alias("height"),
        F.col("image_meta.mode").alias("mode"),
        F.col("image_meta.n_bytes").alias("n_bytes"),
    ).orderBy("doc_id")


def q45_minhash_jaccard_est(spark, sf_dir):
    """Jaccard estimation from MinHash signature agreement over the LSH
    candidate pairs — the classic MinHash-LSH dedup composition."""
    df = _df(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(df, num_hashes=4, shingle_n=3)
    pairs = dedup.minhash_lsh_pairs(df, num_hashes=4, bands=2, shingle_n=3)
    a = sigs.select(F.col("doc_id").alias("id_a"),
                    *[F.col(f"sig_{i}").alias(f"a{i}") for i in range(4)])
    b = sigs.select(F.col("doc_id").alias("id_b"),
                    *[F.col(f"sig_{i}").alias(f"b{i}") for i in range(4)])
    est = None
    for i in range(4):
        term = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        est = term if est is None else est + term
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", (est / 4.0).alias("jaccard_est"))
        .orderBy("id_a", "id_b")
    )


def q46_token_histogram(spark, sf_dir):
    """Global token frequency top-20 (corpus vocabulary head)."""
    df = _df(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return (
        df.select(F.explode(words).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(20)
    )


def q47_tfidf_top_term(spark, sf_dir):
    """Per-document top term by tf-idf (text-analysis composition:
    tokenize -> tf -> df -> idf -> rank)."""
    from pyspark.sql import Window as W
    df = _df(spark, sf_dir, "documents")
    n_docs = df.count()
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    tokens = df.select("doc_id", F.explode(words).alias("term"))
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .withColumn("score", F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6))
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "term", "score")
        .orderBy("doc_id")
    )


def q48_custom_uda(spark, sf_dir):
    """Custom @uda aggregate checked against a SQL oracle: quantity-weighted
    average price per return flag. merge(other) opts into the map-side
    combine plan — per-input-partition partial states via mapInPandas, so
    only #groups x #partitions pickled states shuffle (not 100 TB of rows
    into 3 groups)."""
    @pxt.uda
    class weighted_avg:
        def __init__(self):
            self.num, self.den = 0.0, 0.0

        def update(self, price, qty):
            if price is not None and qty is not None:
                self.num += price * qty
                self.den += qty

        def merge(self, other):
            self.num += other.num
            self.den += other.den

        def value(self) -> float:
            return round(self.num / self.den, 4) if self.den else None

    t = _t(spark, sf_dir, "lineitem")
    return (
        t.group_by(t.l_returnflag)
        .select(t.l_returnflag,
                wavg_price=weighted_avg(t.l_extendedprice, t.l_quantity),
                n=pxtf.count(t.l_orderkey))
        .order_by(t.l_returnflag)
        .df()
    )


def q49_stream_windowed(spark, sf_dir):
    """Structured Streaming: hourly watermarked windowed counts over the
    events table driven to completion with availableNow — results equal the
    batch date_trunc bucketing, so the oracle is plain SQL."""
    from pyspark.sql import types as T

    from pixeltable_spark import streaming

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    # stream the parquet file; nanos ts arrives as long under the legacy conf
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # noqa: BLE001
        pass
    # the testdata's ts physical type differs by generator version:
    # TIMESTAMP(NANOS) (long under the legacy conf) vs TIMESTAMP_NTZ
    # (micros) — probe the static footer once to pick the stream schema
    ts_type = _rp(spark, f"{sf_dir}/events.parquet").schema["ts"].dataType
    read_schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", ts_type),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    raw = (spark.readStream.format("parquet").schema(read_schema)
           .option("pathGlobFilter", "events.parquet").load(sf_dir))
    if isinstance(ts_type, T.LongType):
        stream = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        stream = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    import uuid as _uuid
    # stateful-operator parallelism: state cardinality here is
    # #windows x #event_types (hundreds) — 8 state stores, not 32
    # (each store pays fixed commit/snapshot cost per micro-batch)
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        agg = streaming.windowed_event_counts(stream, window="1 hour", watermark="2 hours")
        name = "q49_win_" + _uuid.uuid4().hex[:10]  # unique per invocation
        q = (agg.writeStream.outputMode("complete").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
    return (
        spark.table(name)
        .select(F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
                "event_type", "n",
                F.round("total_value", 4).alias("total_value"))
        .orderBy("hour_start", "event_type")
    )


def q50_llm_chat(spark, sf_dir):
    """Async rate-limited inference runtime over documents; the
    deterministic fake client is md5-derived, so even model output is
    oracle-checkable."""
    from pixeltable_spark.functions import llm
    # prune before the operator: mapInPandas Arrow-ships every input column
    # both ways, and Catalyst cannot prune through it
    df = _df(spark, sf_dir, "documents").select("doc_id", "text")
    out = llm.chat_completions(df, "text", model="fake-chat-1",
                               requests_per_minute=1e9, concurrency=64)
    return out.select("doc_id", "response").orderBy("doc_id")


def q52_sample_stratified_n(spark, sf_dir):
    """Proportional stratified n-sampling: 100 rows allocated across
    return-flag strata by largest remainder, md5-ordered within strata."""
    t = _t(spark, sf_dir, "lineitem")
    return (
        t.sample(n=100, stratify_by=[t.l_returnflag], seed=11)
        .select(t.l_orderkey, t.l_linenumber, t.l_returnflag)
        .order_by(t.l_orderkey, t.l_linenumber)
        .df()
    )


def q51_bbox_ops(spark, sf_dir):
    """Vision bbox geometry as pure column math (functions/vision.py):
    boxes synthesized from lineitem numerics, IoU/area/clip oracle-checked."""
    from pixeltable_spark.functions import vision
    df = _df(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 60)
    a = F.array(F.col("l_quantity"), F.col("l_discount") * 100,
                F.col("l_quantity") + 20, F.col("l_discount") * 100 + 15)
    b = F.array(F.col("l_quantity") + 10, F.col("l_discount") * 100 + 5,
                F.col("l_quantity") + 30, F.col("l_discount") * 100 + 20)
    return (
        df.select(
            "l_orderkey", "l_linenumber",
            F.round(vision.bbox_area(a), 4).alias("area_a"),
            F.round(vision.bbox_iou(a, b), 6).alias("iou"),
            F.round(F.element_at(vision.bboxes_clip(a, 25.0, 10.0), 3), 4).alias("x2_clipped"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def q53_json_mapper_typed(spark, sf_dir):
    """JVM-side JsonMapper: a typed `>>` mapper compiles to
    transform(from_json(...), x -> ...) — no pandas UDF in the plan
    (reference exprs/json_mapper.py:20-60 MAP semantics)."""
    d = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    j = (d.df().where(F.size(words) >= 4)
         .select("doc_id", F.to_json(F.slice(words, 1, 4)).alias("toks")))
    t = pxt.TableRef.from_df(j, "doc_toks", rowid_cols=["doc_id"],
                             json_cols=["toks"])
    mapped = t.toks >> pxt.R.astype(pxt.String()).len()
    return (
        t.select(t.doc_id, l0=mapped[0], l1=mapped[1], l2=mapped[2], l3=mapped[3])
        .order_by(t.doc_id)
        .df()
    )


def q54_provider_embeddings(spark, sf_dir):
    """Provider-module surface (functions/openai.py embeddings — reference
    functions/openai.py:862) through the async-UDF runtime: per-row
    embedding as a select item, reduced to scalars for comparison."""
    from pixeltable_spark.functions import openai as oai
    t = _t(spark, sf_dir, "documents")
    e = oai.embeddings(t.text, model="oracle-emb")
    return (
        t.select(t.doc_id,
                 e0=pxtf.math.round(e[0], 6),
                 e7=pxtf.math.round(e[7], 6))
        .order_by(t.doc_id)
        .df()
    )


def q55_doc_sections(spark, sf_dir):
    """Separator-aware document splitter (paragraph + sentence boundaries)
    — reference functions/document.py document_splitter separators option;
    capture-group regex form is RE2-compatible so DuckDB replicates it."""
    from pixeltable_spark.functions.document import document_splitter_v2
    df = _df(spark, sf_dir, "documents")
    out = document_splitter_v2(df, separators="paragraph,sentence")
    return (out.select("doc_id", "pos",
                       F.length("text").alias("n_chars"),
                       F.substring("text", 1, 20).alias("head20"))
            .orderBy("doc_id", "pos"))


def q56_json_typed_schema(spark, sf_dir):
    """JSON structural schema (reference type_system.py:497-533): declaring
    props as Json(fields={'k': Int}) types the path extraction — t.props.k
    is a BIGINT column with no explicit astype, arithmetic stays JVM-side."""
    e = _t(spark, sf_dir, "events")
    schema = dict(e._schema)
    schema["props"] = pxt.ColumnType.json(fields={"k": pxt.Int()})
    t = pxt.TableRef(e.df(), "events_typed", schema, rowid_cols=["event_id"])
    k = t.props.k  # typed: BIGINT, no astype
    return (
        t.where(k % 7 == 0)
        .select(t.event_id, k_val=k, k2=k * 2 + 1)
        .order_by(t.event_id)
        .df()
    )


def q57_gemini_generate(spark, sf_dir):
    """Gemini provider surface (functions/gemini.py generate_content —
    reference functions/gemini.py:96) through the async-UDF runtime: the
    deterministic fake is md5-derived, so response text AND token usage are
    oracle-checkable."""
    from pixeltable_spark.functions import gemini
    t = _t(spark, sf_dir, "documents")
    r = gemini.generate_content(t.text, model="gem-oracle")
    return (
        t.select(t.doc_id,
                 resp=r["candidates"][0]["content"]["parts"][0]["text"]
                 .astype(pxt.String()),
                 total_tokens=r["usage_metadata"]["total_token_count"]
                 .astype(pxt.Int()))
        .order_by(t.doc_id)
        .df()
    )


def q58_whisper_segments(spark, sf_dir):
    """Whisper local-transcription surface (functions/whisper.py transcribe
    — reference functions/whisper.py:21): deterministic fake transcript,
    segment texts + language extracted via typed JSON paths."""
    from pixeltable_spark.functions import whisper
    t = _t(spark, sf_dir, "documents")
    r = whisper.transcribe(t.text, model="base.en")
    return (
        t.select(t.doc_id,
                 lang=r["language"].astype(pxt.String()),
                 seg0=r["segments"][0]["text"].astype(pxt.String()),
                 seg1=r["segments"][1]["text"].astype(pxt.String()))
        .order_by(t.doc_id)
        .df()
    )


def q59_html_sections(spark, sf_dir):
    """HTML document parsing with heading metadata (functions/document.py
    html_to_markdown + document_splitter_v2 input_format='html' — reference
    iterators/document.py _html_sections): HTML synthesized from the
    documents corpus, split on headings, h1/h2 hierarchy + title extracted.
    The whole pipeline is regexp_replace/split/posexplode column math —
    RE2-compatible, so DuckDB replicates it exactly."""
    from pixeltable_spark.functions.document import document_splitter_v2
    from pixeltable_spark.operators import text as textops
    # spread the one-split scan so the regex/split battery parallelizes
    # (measured 0.9 s single-task job); no-op at real scale
    df = textops.spread(_df(spark, sf_dir, "documents"))
    ids = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><body><h1>Doc "), ids, F.lit(" &amp; Co</h1><p>"),
        F.regexp_replace(F.col("text"), r"\n\s*\n", "</p><p>"),
        F.lit("</p><h2>Tail</h2><p>End of doc "), ids,
        F.lit(".</p></body></html>"))
    out = document_splitter_v2(
        df.select("doc_id", html.alias("text")),
        separators="heading", metadata="title,heading", input_format="html")
    return (out.select(
        "doc_id", "pos",
        F.length("text").alias("n_chars"),
        F.substring("text", 1, 20).alias("head20"),
        "title",
        F.get_json_object("heading", "$.h1").alias("h1"),
        F.get_json_object("heading", "$.h2").alias("h2"))
        .orderBy("doc_id", "pos"))


def q60_stream_dedup(spark, sf_dir):
    """Custom stateful streaming operator (streaming/stateful.py
    stream_dedup_stateful — applyInPandasWithState with TTL'd per-key
    GroupState): exactly-once dedup of the events stream on a derived key.
    The emitted KEY SET is deterministic (one row per distinct key), so it
    oracle-checks; the carried row values depend on arrival order and are
    projected away."""
    from pyspark.sql import types as T

    from pixeltable_spark import streaming
    ts_type = _rp(spark, f"{sf_dir}/events.parquet").schema["ts"].dataType
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", ts_type),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    raw = (spark.readStream.format("parquet").schema(schema)
           .option("pathGlobFilter", "events.parquet").load(sf_dir))
    if isinstance(ts_type, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    keyed = raw.withColumn("dedup_key",
                           F.concat_ws("|", "user_id", "event_type"))
    # bucketed state: applyInPandasWithState costs one Python call per
    # GROUP per micro-batch, so per-key grouping would pay 7.5k Arrow
    # round-trips at sf0.1; 16 buckets pays 16 calls with the same
    # live-key state split across bucket dicts. Each stateful shuffle
    # partition also carries a state-store instance with fixed per-batch
    # cost (commit, snapshot, maintenance) — size the stream's shuffle
    # width to the STATE cardinality, not the session default (at real
    # scale this is exactly how you size stateful-operator parallelism)
    import uuid as _uuid
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        deduped = streaming.stream_dedup_stateful(
            keyed, id_col="dedup_key", ts_col="ts", num_buckets=16)
        name = "q60_dedup_" + _uuid.uuid4().hex[:10]
        q = (deduped.writeStream.outputMode("append").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
    return (spark.table(name)
            .select("user_id", "event_type")
            .orderBy("user_id", "event_type"))


def q61_image_codec(spark, sf_dir):
    """REAL image kernels without PIL (functions/image_codec.py): PNGs are
    synthesized per doc (dims + fill derived from doc_id), then decoded
    back through the image-function surface — width/height/mode/resize
    dims/first-pixel/entropy are all arithmetic in doc_id, so DuckDB
    checks the whole encode→probe→decode→resize pipeline without ever
    seeing a PNG."""
    import pandas as pd
    from pyspark.sql import types as T

    from pixeltable_spark.functions import image as pxi
    from pixeltable_spark.functions.image_codec import decode, encode_png

    # documents.parquet is one small file -> one scan task; the codec stage
    # is CPU-bound Python, so spread payload synthesis/decoding across all
    # cores (at 100 TB: repartition media payloads before any decode stage)
    df = (_df(spark, sf_dir, "documents").select("doc_id")
          .repartition(spark.sparkContext.defaultParallelism))

    def _make_png(ids):
        import numpy as np
        out = []
        for i in ids:
            w, h = 4 + int(i) % 13, 3 + int(i) % 7
            arr = np.full((h, w, 3), int(i) % 256, dtype=np.uint8)
            out.append(encode_png(arr, "RGB"))
        return pd.Series(out)

    def _first_pixel(payloads):
        return pd.Series([int(decode(bytes(p)).getpixel((0, 0))[0])
                          for p in payloads])

    # lambdas/no-hint fns: `from __future__ import annotations` stringifies
    # hints, which pandas_udf cannot resolve against local imports
    make_png = F.pandas_udf(_make_png, T.BinaryType())
    first_pixel = F.pandas_udf(_first_pixel, T.IntegerType())

    img = df.withColumn("png", make_png(F.col("doc_id")))
    resized = pxi.resize(F.col("png"), 3, 2)
    return (img.select(
        "doc_id",
        pxi.width(F.col("png")).alias("w"),
        pxi.height(F.col("png")).alias("h"),
        pxi.mode(F.col("png")).alias("m"),
        pxi.width(resized).alias("rw"),
        pxi.height(resized).alias("rh"),
        first_pixel(F.col("png")).alias("px"),
        F.round(pxi.entropy(F.col("png")), 6).alias("ent"),
    ).orderBy("doc_id"))


def q62_audio_codec(spark, sf_dir):
    """REAL WAV kernels without ffmpeg (functions/audio_codec.py): PCM
    sine WAVs synthesized per doc (rate/length/amplitude derived from
    doc_id), then probed/clipped/volume-scaled — every output is
    arithmetic in doc_id, so DuckDB checks the decode→transform→encode
    pipeline without ever seeing a WAV."""
    import pandas as pd
    from pyspark.sql import types as T

    from pixeltable_spark.functions import audio_codec as ac

    df = (_df(spark, sf_dir, "documents").select("doc_id")
          .repartition(spark.sparkContext.defaultParallelism))

    def _make_wav(ids):
        import numpy as np
        out = []
        for i in ids:
            rate = 4000 + 1000 * (int(i) % 3)          # 4000/5000/6000
            n = rate // 2 + int(i) % 5                 # ~0.5 s
            amp = 1000 + int(i) % 7 * 100
            t = np.arange(n)
            wave = (amp * np.sin(2 * np.pi * 220 * t / rate)).astype(np.int16)
            out.append(ac.encode(wave[:, None], rate, 2))
        return pd.Series(out)

    def _pipeline(payloads):
        import json
        out = []
        for p in payloads:
            p = bytes(p)
            info = ac.probe(p)
            clipped = ac.clip(p, 0.0, 0.25)
            doubled, _r, _w = ac.decode(ac.multiply_volume(p, 2.0))
            orig, _r2, _w2 = ac.decode(p)
            out.append(json.dumps({
                "rate": info["sample_rate"],
                "n": info["n_frames"],
                "clip_n": ac.probe(clipped)["n_frames"],
                "peak_ratio": int(round(abs(doubled).max()
                                        / abs(orig).max())),
            }, sort_keys=True))
        return pd.Series(out)

    make_wav = F.pandas_udf(_make_wav, T.BinaryType())
    pipe = F.pandas_udf(_pipeline, T.StringType())
    out = df.withColumn("r", pipe(make_wav(F.col("doc_id"))))
    return (out.select(
        "doc_id",
        F.get_json_object("r", "$.rate").cast("long").alias("rate"),
        F.get_json_object("r", "$.n").cast("long").alias("n"),
        F.get_json_object("r", "$.clip_n").cast("long").alias("clip_n"),
        F.get_json_object("r", "$.peak_ratio").cast("long").alias("peak_ratio"),
    ).orderBy("doc_id"))


def q63_video_codec(spark, sf_dir):
    """REAL AVI kernels without ffmpeg (functions/video_codec.py): videos
    synthesized per doc (dims/frame-count/fps from doc_id, one hard
    luminance jump mid-stream), then probed, speed-adjusted, and
    scene-detected — all outputs arithmetic in doc_id for the DuckDB
    oracle."""
    import pandas as pd
    from pyspark.sql import types as T

    from pixeltable_spark.functions import video_codec as vc

    df = (_df(spark, sf_dir, "documents").select("doc_id")
          .repartition(spark.sparkContext.defaultParallelism))

    def _make_avi(ids):
        import numpy as np
        out = []
        for i in ids:
            w, h = 4 + int(i) % 5, 3 + int(i) % 4
            n = 4 + int(i) % 6                 # 4..9 frames
            cut = n // 2
            frames = np.stack(
                [np.full((h, w, 3), 0 if k < cut else 200, np.uint8)
                 for k in range(n)])
            out.append(vc.encode(frames, fps=10.0))
        return pd.Series(out)

    def _pipeline(payloads):
        import json
        out = []
        for p in payloads:
            p = bytes(p)
            info = vc.probe(p)
            cuts = vc.scene_cuts(p, threshold=27.0)
            half = vc.probe(vc.speed(p, 2.0))
            out.append(json.dumps({
                "w": info["width"], "h": info["height"],
                "n": info["n_frames"], "cut": cuts[0] if cuts else -1,
                "half_n": half["n_frames"],
            }, sort_keys=True))
        return pd.Series(out)

    make_avi = F.pandas_udf(_make_avi, T.BinaryType())
    pipe = F.pandas_udf(_pipeline, T.StringType())
    out = df.withColumn("r", pipe(make_avi(F.col("doc_id"))))
    return (out.select(
        "doc_id",
        F.get_json_object("r", "$.w").cast("long").alias("w"),
        F.get_json_object("r", "$.h").cast("long").alias("h"),
        F.get_json_object("r", "$.n").cast("long").alias("n"),
        F.get_json_object("r", "$.cut").cast("long").alias("cut"),
        F.get_json_object("r", "$.half_n").cast("long").alias("half_n"),
    ).orderBy("doc_id"))


def q64_pii_scrub(spark, sf_dir):
    """PII detection + scrubbing (operators/pii.py — pure-JVM regexp in the
    Java-regex ∩ RE2 subset): PII is synthesized into each doc from doc_id
    so counts, the scrubbed text length, and the flag are all
    oracle-checkable."""
    from pixeltable_spark.operators.pii import has_pii, pii_counts, scrub_pii
    df = textops.spread(_df(spark, sf_dir, "documents"))
    ids = F.col("doc_id").cast("string")
    ptext = F.concat(
        F.col("text"),
        F.lit(" contact user"), ids, F.lit("@example.com or 10.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".7 ssn 123-45-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
    counts = pii_counts(ptext, ["email", "ipv4", "ssn"])
    return (df.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ipv4"),
        counts["ssn"].alias("n_ssn"),
        F.length(scrub_pii(ptext, ["email", "ssn", "ipv4"])).alias("scrub_len"),
        has_pii(ptext, ["email"]).alias("flagged"),
    ).orderBy("doc_id"))


def q65_repetition_quality(spark, sf_dir):
    """Gopher-style repetition signals (operators/text.py repetition_stats
    — Rae et al. 2021 §A1.1): word-3-gram duplicate fraction and
    top-n-gram coverage per doc, one explode + two aggregations."""
    from pixeltable_spark.operators.text import repetition_stats
    df = _df(spark, sf_dir, "documents")
    out = repetition_stats(df, n=3)
    return (out.select(
        "doc_id",
        F.round("dup_ngram_frac", 6).alias("dup_frac"),
        F.round("top_ngram_frac", 6).alias("top_frac"),
    ).orderBy("doc_id"))


def q66_contamination(spark, sf_dir):
    """Benchmark-contamination check (operators/dedup.py
    ngram_contamination — the GPT-3 decontamination rule): every 50th doc
    plays the 'benchmark'; per-doc shared-3-gram counts via a broadcast
    join on the n-gram, corpus never shuffles."""
    from pixeltable_spark.operators.dedup import ngram_contamination
    df = _df(spark, sf_dir, "documents")
    bench = df.where(F.col("doc_id") % 50 == 0)
    out = ngram_contamination(df, bench, n=3)
    return (out.select(
        "doc_id", "n_grams", "n_contaminated",
        F.round("contamination_frac", 6).alias("contam_frac"),
    ).orderBy("doc_id"))


def q67_dup_clusters(spark, sf_dir):
    """Duplicate-CLUSTER resolution (operators/dedup.py dedup_clusters):
    MinHash-LSH candidate pairs -> connected components via alternating
    large-star/small-star (Kiveris et al. SOCC'14) -> (id, component =
    min reachable id). The oracle replays the pair graph with a recursive
    CTE, so the whole iterative algorithm is EXACT-checked."""
    from pixeltable_spark.operators.dedup import dedup_clusters
    df = _df(spark, sf_dir, "documents")
    out = dedup_clusters(df, k=4, bands=2)
    return (out.select(F.col("id").alias("doc_id"), "component")
            .orderBy("doc_id"))


def q68_jpeg_codec(spark, sf_dir):
    """REAL baseline JPEG kernels without PIL (functions/jpeg_codec.py —
    full DCT/quant/Huffman encode + decode): flat-color JPEGs synthesized
    per doc roundtrip EXACTLY (verified over all fill values), so
    width/height/mode/first-pixel after a full encode->decode->resize
    chain are arithmetic in doc_id for the DuckDB oracle."""
    import pandas as pd
    from pyspark.sql import types as T

    from pixeltable_spark.functions import image as pxi
    from pixeltable_spark.functions.jpeg_codec import decode_jpeg, encode_jpeg

    df = (_df(spark, sf_dir, "documents").select("doc_id")
          .repartition(spark.sparkContext.defaultParallelism))

    def _make_jpeg(ids):
        import numpy as np
        out = []
        for i in ids:
            w, h = 8 + int(i) % 9, 8 + int(i) % 5
            arr = np.zeros((h, w, 3), dtype=np.uint8)
            arr[:, :] = ((int(i) * 7) % 256, (int(i) * 13) % 256,
                         (int(i) * 29) % 256)
            out.append(encode_jpeg(arr, "RGB", 90))
        return pd.Series(out)

    def _px(payloads):
        return pd.Series([int(decode_jpeg(bytes(p))[0][0, 0, 0])
                          for p in payloads])

    make_jpeg = F.pandas_udf(_make_jpeg, T.BinaryType())
    px = F.pandas_udf(_px, T.IntegerType())
    img = df.withColumn("jp", make_jpeg(F.col("doc_id")))
    resized = pxi.resize(F.col("jp"), 4, 3)
    return (img.select(
        "doc_id",
        pxi.width(F.col("jp")).alias("w"),
        pxi.height(F.col("jp")).alias("h"),
        pxi.mode(F.col("jp")).alias("m"),
        pxi.width(resized).alias("rw"),
        pxi.height(resized).alias("rh"),
        px(F.col("jp")).alias("px"),
    ).orderBy("doc_id"))


def q69_lm_quality(spark, sf_dir):
    """CCNet-style LM quality gate (operators/text.py ngram_lm_train/
    ngram_lm_score — Wenzek et al. 2019, char-trigram model standing in
    for KenLM): train on every 10th doc, score all docs by average gram
    log-probability with an OOV floor; model broadcasts, corpus never
    shuffles raw text."""
    from pixeltable_spark.operators.text import ngram_lm_score, ngram_lm_train
    # single-file scan -> 1 task; spread docs before the heavy char-gram
    # explode (no-op on a real many-file corpus)
    df = (_df(spark, sf_dir, "documents")
          .repartition(spark.sparkContext.defaultParallelism))
    model = ngram_lm_train(df.where(F.col("doc_id") % 10 == 0), n=3)
    out = ngram_lm_score(df, model, n=3)
    return (out.select("doc_id",
                       F.round("lm_score", 6).alias("lm_score"),
                       "n_grams_scored")
            .orderBy("doc_id"))


def q70_pq_ann(spark, sf_dir):
    """Product-quantization ANN (operators/similarity.py pq_train/encode/
    topk_rerank — Jégou et al. TPAMI'11): deterministic codebook
    training, distributed uint8 encoding, JVM-side ADC shortlist of 100,
    exact cosine rerank to top-10. Deliberately has NO oracle_sql entry:
    k-means training is not SQL-expressible, so the driver records the
    weaker rows-only check; output is nonetheless fully deterministic,
    and recall/exactness properties are pinned by
    tests/test_pq_index.py."""
    from pixeltable_spark.operators import similarity as S
    df = _df(spark, sf_dir, "embeddings")
    books = S.pq_train(df, m=8, k=16, iters=5)
    codes = S.pq_encode(df, books)
    return S.pq_topk_rerank(df, codes, books, QUERY_VEC, k=10, rerank=100)


def q71_asof_join(spark, sf_dir):
    """Point-in-time as-of join (operators/joins.py asof_join — the
    union-and-carry formulation: ONE shuffle on the by-keys, running
    last(ignorenulls) carry, no range explosion): every event picks up
    the same user's most recent prior-or-equal purchase value. DuckDB's
    native ASOF JOIN is the oracle, so the semantics (backward, ties
    included, null-safe carried values) are checked EXACTLY."""
    from pixeltable_spark.operators.joins import asof_join
    ev = _df(spark, sf_dir, "events")
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .groupBy("user_id", "ts")
                 .agg(F.max("value").alias("pv")))
    out = asof_join(ev.select("event_id", "user_id", "ts"),
                    purchases, on="ts", by=["user_id"])
    return (out.select("event_id",
                       F.round("pv_r", 4).alias("pv"),
                       F.col("ts_r").alias("pts"))
            .orderBy("event_id"))


def q72_simhash_neighbors(spark, sf_dir):
    """SimHash Hamming-ball near-dup degree (operators/dedup.py
    simhash_pairs — pigeonhole banding, Manku et al. WWW'07: d+1 bands,
    any pair within Hamming d agrees exactly on one band, exact distance
    verified with bit_count(xor) JVM-side): per-doc count of neighbors
    within Hamming<=1 of its 32-bit fingerprint. The oracle replays the
    same simhash SQL with a brute-force self-join — feasible at the
    check scale, which is exactly why the Spark side must band."""
    from pixeltable_spark.operators.dedup import simhash_pairs
    df = _df(spark, sf_dir, "documents")
    pairs = simhash_pairs(df, bits=32, max_hamming=1)
    both = (pairs.select(F.col("id_a").alias("doc_id"))
            .unionAll(pairs.select(F.col("id_b").alias("doc_id"))))
    return (both.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_near"))
            .orderBy("doc_id"))


def q73_doc_packing(spark, sf_dir):
    """Sequence packing for training batches (operators/text.py
    pack_documents — the GPT concat-then-chunk layout): docs hash to
    independent packing streams, one window cumsum per stream assigns
    (stream, bin, offset). Pure window math, so DuckDB replays it
    EXACTLY."""
    from pixeltable_spark.operators.text import pack_documents
    df = _df(spark, sf_dir, "documents")
    return (pack_documents(df, tokens_per_bin=256, n_streams=4)
            .orderBy("doc_id"))


def q74_line_dedup(spark, sf_dir):
    """Cross-document line-level dedup (operators/dedup.py dedup_lines —
    the CCNet §3 paragraph-dedup design): lines occurring in more than
    max_doc_freq documents are boilerplate and get scrubbed from every
    document, preserving original line order. The synthetic corpus has no
    newlines, so the query first materializes line structure by turning
    the word ' table ' into a line break (literal replace — identical
    non-overlapping semantics in both engines). Plan: explode -> two-level
    exact doc-frequency agg -> join back on the 16-byte md5 line key ->
    ordered rebuild; three keyed shuffles, no window over the corpus."""
    from pixeltable_spark.operators.dedup import dedup_lines
    df = (_df(spark, sf_dir, "documents")
          .select("doc_id", F.replace(F.col("text"), F.lit(" table "),
                                      F.lit("\n")).alias("text")))
    return dedup_lines(df, max_doc_freq=2).orderBy("doc_id")


def q75_url_curation(spark, sf_dir):
    """URL canonicalization + eTLD+1 domains + per-domain cap
    (operators/web.py — the RefinedWeb/CCNet web-curation front door).
    URLs are synthesized deterministically from doc_id (the corpus has no
    url column): mixed case, www prefix, default port, tracking params,
    fragments — everything canonicalization must strip. The per-domain
    cap (row_number window on the ~14 registrable domains) keeps the 20
    lowest doc_ids per domain, the dedup-friendly deterministic choice."""
    from pixeltable_spark.operators.web import (
        canonicalize_url, cap_per_domain, registered_domain, url_host)
    df = _df(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("HTTP://WWW.Site"), (F.col("doc_id") % 7).cast("string"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(".co.UK"))
             .otherwise(F.lit(".COM")),
            F.lit(":80/docs/"), F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.lit("/?utm_source=feed&ref=rss&id="),
                            F.col("doc_id").cast("string")))
             .otherwise(F.concat(F.lit("?id="), F.col("doc_id").cast("string"),
                                 F.lit("&z=2&a=1"))),
            F.lit("#frag"),
        ).alias("url"))
    capped = cap_per_domain(df, max_docs=20, order_col="doc_id")
    return (capped.select(
        "doc_id",
        canonicalize_url(F.col("url")).alias("canonical_url"),
        registered_domain(url_host(F.col("url"))).alias("domain"))
        .orderBy("doc_id"))


def q76_dsir_score(spark, sf_dir):
    """DSIR importance weights (operators/text.py dsir_model/dsir_score —
    Xie et al. NeurIPS'23): hashed word-unigram log-likelihood ratio of a
    target domain (source='src0' docs) vs the raw corpus, length-
    normalized per document. Model is bounded by n_buckets so it
    broadcasts; scoring is explode -> broadcast join -> one groupBy(doc)
    with map-side partials — the corpus is scanned once and never
    shuffled wider than (doc, partial-avg)."""
    from pixeltable_spark.operators.text import dsir_model, dsir_score
    df = _df(spark, sf_dir, "documents")
    target = df.where(F.col("source") == "src0")
    model = dsir_model(df, target, n_buckets=512)
    return (dsir_score(df, model, n_buckets=512)
            .select("doc_id", "dsir_score", "n_tokens")
            .orderBy("doc_id"))


def q77_tile_stitch(spark, sf_dir):
    """Image tile iterator + stitcher (functions/image.py tile_iterator /
    stitch_tiles — reference functions/image.py:473/:576): per-doc PNGs
    with a position-dependent pixel pattern are tiled 8x8 with (2,2)
    overlap (edge tiles black-padded), then stitched back at their
    tile_box origins. n_tiles follows the reference's exact grid formula
    — pure doc_id arithmetic for DuckDB — and roundtrip_ok asserts the
    stitched pixels equal the original pattern, proving tiling, padding,
    clipping and overlap-overwrite are all lossless end-to-end."""
    import pandas as pd
    from pyspark.sql import types as T

    from pixeltable_spark.functions.image import stitch_tiles, tile_iterator
    from pixeltable_spark.functions.image_codec import decode, encode_png

    # codec-bound (~20 ms/doc of pure-python PNG work across 17 payloads):
    # deterministic 1-in-8 subsample keeps the bench honest without
    # dominating it; the oracle applies the identical predicate
    # parallelism sized to the sampled corpus (hundreds of rows here):
    # 8 codec tasks beat 32 near-empty ones; a full-corpus run would use
    # defaultParallelism like the other codec queries
    dims = (_df(spark, sf_dir, "documents").select("doc_id")
            .where(F.col("doc_id") % 8 == 1)
            .repartition(min(8, spark.sparkContext.defaultParallelism))
            .withColumn("w", (F.lit(9) + F.col("doc_id") % 13).cast("int"))
            .withColumn("h", (F.lit(8) + F.col("doc_id") % 7).cast("int")))

    def _pattern(i, w, h):
        import numpy as np
        y, x = np.mgrid[0:h, 0:w]
        arr = ((x + 3 * y + int(i)) % 251).astype("uint8")
        return np.stack([arr, (arr + 1) % 251, (arr + 2) % 251], axis=2)

    def _make_png(ids, ws, hs):
        return pd.Series([encode_png(_pattern(i, w, h), "RGB")
                          for i, w, h in zip(ids, ws, hs)])

    def _check(ids, ws, hs, payloads):
        import numpy as np
        out = []
        for i, w, h, p in zip(ids, ws, hs, payloads):
            if p is None:
                out.append(False)
                continue
            img = decode(bytes(p))
            out.append(bool(img.size == (int(w), int(h))
                            and np.array_equal(img.arr, _pattern(i, w, h))))
        return pd.Series(out)

    make_png = F.pandas_udf(_make_png, T.BinaryType())
    check = F.pandas_udf(_check, T.BooleanType())

    imgs = dims.withColumn("payload", make_png("doc_id", "w", "h"))
    # one linear pipeline: synth -> tile (narrow) -> ONE shuffle by doc ->
    # stitch-and-count in a single grouped pass -> verify; no branch ever
    # recomputes the codec stages
    tiles = tile_iterator(imgs.select("doc_id", "payload"),
                          tile_size=(8, 8), overlap=(2, 2), id_col="doc_id")
    stitched = stitch_tiles(tiles.join(F.broadcast(dims.select("doc_id", "w", "h")),
                                       "doc_id"),
                            width="w", height="h", id_col="doc_id",
                            with_count=True)
    return (stitched
            .join(F.broadcast(dims), "doc_id")
            .select("doc_id", "n_tiles",
                    check("doc_id", "w", "h", "image").alias("roundtrip_ok"))
            .orderBy("doc_id"))


BOW_QUERY_TEXT = "spark table scan merge value window"
BOW_DIM = 16


def q78_bow_embed_search(spark, sf_dir):
    """REAL classical text embeddings + similarity search, end-to-end
    engine-native (operators/similarity.py bow_embeddings — bag-of-words
    signed random projection, the same model behind the huggingface
    sentence_transformer fallback): embed every document JVM-side (one
    tokenize explode + 16 integer sum() aggregates per doc), embed the
    query string with the scalar twin, and return every doc with
    cosine > 0.3. Integer bit-sums -> IEEE-exact normalize/dot, so the
    DuckDB oracle reproduces the doubles bit-for-bit — no rounding."""
    from pixeltable_spark.functions.array import dot_col
    from pixeltable_spark.operators.similarity import (
        bow_embedding_py, bow_embeddings)
    df = _df(spark, sf_dir, "documents")
    emb = bow_embeddings(df, dim=BOW_DIM)
    qv = bow_embedding_py(BOW_QUERY_TEXT, BOW_DIM)
    # both vectors are unit-norm, so dot IS cosine; dot_col's zip_with
    # references the embedding array ONCE (a per-element element_at
    # formulation re-inlines the 16-aggregate array construction into
    # every term under projection collapse — a 256x expression blowup
    # that stalls the optimizer, not the executors)
    dot = dot_col(F.col("embedding"),
                  F.array(*[F.lit(float(x)) for x in qv]))
    return (emb.select("doc_id", dot.alias("cos"))
            .where(F.col("cos") > 0.3)
            .orderBy("doc_id"))


def _q78_oracle() -> str:
    import hashlib
    import math
    toks = [t for t in BOW_QUERY_TEXT.lower().strip().split() if t]
    sums = [0] * BOW_DIM
    for t in toks:
        h = hashlib.md5(t.encode()).hexdigest()
        for d in range(BOW_DIM):
            sums[d] += (ord(h[d]) % 2) * 2 - 1
    n = math.sqrt(sum(s * s for s in sums)) or 1.0
    qv = [s / n for s in sums]
    s_cols = ", ".join(
        f"sum(ascii(substr(md5(tok), {d + 1}, 1)) % 2 * 2 - 1) AS s_{d}"
        for d in range(BOW_DIM))
    norm_expr = " + ".join(f"s_{d} * s_{d}" for d in range(BOW_DIM))
    # leading 0.0 matches dot_col's aggregate fold seed
    dot_expr = "0.0 + " + " + ".join(f"(s_{d} / nrm) * ({qv[d]!r})"
                                     for d in range(BOW_DIM))
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                            t -> t <> '')) AS tok
  FROM documents),
sums AS (SELECT doc_id, {s_cols} FROM toks GROUP BY doc_id),
emb AS (
  SELECT doc_id,
         CASE WHEN sqrt({norm_expr}) = 0 THEN 1.0
              ELSE sqrt({norm_expr}) END AS nrm, *
  FROM sums)
SELECT doc_id, {dot_expr} AS cos
FROM emb WHERE ({dot_expr}) > 0.3 ORDER BY doc_id"""


QC_POS = [f"table scan merge sort window hash key batch {i}" for i in range(24)]
QC_NEG = [f"slow spam click row value line part a the {i}" for i in range(24)]
QC_BUCKETS = 128


def q79_quality_classifier(spark, sf_dir):
    """Trainable fastText-style quality gate (operators/quality_clf.py —
    Joulin et al. 2016 / the GPT-3 §A quality-filter design): logistic
    regression over md5-hashed word unigrams, trained on a fixed synthetic
    good/bad corpus (sf-independent, so the oracle replays the exact
    weights with the Spark-free training core), then scored over every
    document as a pure-JVM projection — array-literal weights folded over
    the token buckets, no join, no Python, filter-pushdown-friendly.
    Returns the raw logit (basic IEEE ops only -> bit-exact vs DuckDB;
    sigmoid is monotone so keep == logit >= 0)."""
    from pixeltable_spark.operators.quality_clf import (
        quality_logit, train_from_texts)
    from pixeltable_spark.operators.text import spread
    w = _qc_weights()
    # quality_logit is a pure Column (interpreted HOF fold over the token
    # buckets) — a single-file scan would run the whole battery on one
    # core, so spread the scan first (no-op at real multi-split scale)
    df = spread(_df(spark, sf_dir, "documents"))
    z = quality_logit(F.col("text"), w)
    return (df.select("doc_id", z.alias("logit"), (z >= 0).alias("keep"))
            .orderBy("doc_id"))


def _qc_weights() -> list:
    """Trained weights quantized to the 2^-20 grid: every per-token weight
    (and thus every partial sum of <=2^13 of them) is exactly
    representable, so the fold total is association-independent —
    DuckDB's list_reduce is a tree reduction, not Spark's left fold, and
    un-quantized weights differ by 1 ulp on ~0.4% of documents."""
    from pixeltable_spark.operators.quality_clf import train_from_texts
    w = train_from_texts(QC_POS, QC_NEG, n_buckets=QC_BUCKETS)
    q = float(1 << 20)
    return [round(v * q) / q for v in w]


def _q79_oracle() -> str:
    w = _qc_weights()
    w_list = "[" + ", ".join(f"{v!r}::DOUBLE" for v in w[:QC_BUCKETS]) + "]"
    bias = f"{w[QC_BUCKETS]!r}::DOUBLE"
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     t -> t <> '') AS ts
  FROM documents),
scored AS (
  SELECT doc_id,
         list_transform(ts, t ->
           ({w_list})[CAST(CAST('0x' || substr(md5(t), 1, 14) AS BIGINT)
                           % {QC_BUCKETS} AS INT) + 1]) AS ws,
         len(ts) AS cnt
  FROM toks)
SELECT doc_id,
       (CASE WHEN cnt > 0
             THEN list_reduce(ws, (x, y) -> x + y) / cnt
             ELSE 0.0 END) + ({bias}) AS logit,
       ((CASE WHEN cnt > 0
              THEN list_reduce(ws, (x, y) -> x + y) / cnt
              ELSE 0.0 END) + ({bias})) >= 0 AS keep
FROM scored ORDER BY doc_id"""


def q80_mean_ap(spark, sf_dir):
    """Distributed mean average precision (functions/vision.py mean_ap —
    reference vision.py:235, VOC "area" AP with the monotone precision
    envelope) over synthetic detections derived from doc_id: each gt box
    is either matched by an EXACT prediction (IoU 1) or paired with a
    disjoint one (IoU 0), so the greedy matcher's verdicts are pure
    doc_id arithmetic and DuckDB replays the per-class PR windows
    bit-for-bit (integer cumsums; 2^-20-quantized envelope makes the AP
    sum association-independent). The Spark side still runs the REAL
    matching kernel — the oracle only knows what it must conclude."""
    from pixeltable_spark.functions.vision import mean_ap
    d = F.col("doc_id")

    def seq():
        return F.sequence(F.lit(0), d % 3)

    k = None  # lambdas below bind their own k
    gt_boxes = F.transform(seq(), lambda k: F.array(
        (k * 100).cast("double"), F.lit(0.0),
        (k * 100 + 10).cast("double"), F.lit(10.0)))
    gt_labels = F.transform(seq(), lambda k: (d + k) % 3)
    exists = lambda k: (d + k) % 4 != 0  # noqa: E731
    is_exact = lambda k: (d + k) % 5 != 0  # noqa: E731
    ks = F.filter(seq(), exists)
    pred_boxes = F.transform(ks, lambda k: F.when(is_exact(k), F.array(
        (k * 100).cast("double"), F.lit(0.0),
        (k * 100 + 10).cast("double"), F.lit(10.0))).otherwise(F.array(
        (k * 100 + 40).cast("double"), F.lit(40.0),
        (k * 100 + 50).cast("double"), F.lit(50.0))))
    pred_labels = F.transform(ks, lambda k: (d + k) % 3)
    pred_scores = F.transform(
        ks, lambda k: F.lit(0.5) + ((d * 7 + k) % 40).cast("double") / 100)
    # spread the one-split scan: the Python matching kernel is a narrow
    # map and otherwise runs single-task (measured 1.9 s one-task job);
    # no-op at real scale, per-image verdicts partition-independent
    from pixeltable_spark.operators import text as textops
    det = (textops.spread(_df(spark, sf_dir, "documents").select("doc_id"))
           .select(
        d.alias("image_id"),
        pred_boxes.alias("pred_boxes"), pred_labels.alias("pred_labels"),
        pred_scores.alias("pred_scores"),
        gt_boxes.alias("gt_boxes"), gt_labels.alias("gt_labels")))
    return mean_ap(det).orderBy("category")


def q81_repeated_spans(spark, sf_dir):
    """ExactSubstr-style repeated-substring spans (operators/dedup.py
    repeated_ngram_spans — Lee et al. 2022, at word-10-gram granularity):
    maximal token spans covered by n-grams occurring >= 2 times corpus-
    wide. posexplode -> md5-keyed occurrence counts -> semi-join ->
    per-doc lag/cumsum span merge (the sessionize window shape). The
    oracle replays the identical pipeline in SQL."""
    from pixeltable_spark.operators.dedup import repeated_ngram_spans
    df = _df(spark, sf_dir, "documents")
    return (repeated_ngram_spans(df, n=10, min_count=2)
            .orderBy("doc_id", "span_start"))


def q82_gopher_filter(spark, sf_dir):
    """The full Gopher quality-rule battery as ONE operator
    (operators/text.py gopher_filter — Rae et al. 2021 §A1.1): word
    count band, mean word length band, symbol ratio, alphabetic-word
    fraction, stopword presence, duplicate-line and top-n-gram
    repetition, plus the combined keep. One scan + two keyed
    aggregations; every ratio is an integer/integer division so DuckDB
    reproduces the doubles bit-for-bit."""
    from pixeltable_spark.operators.text import gopher_filter
    df = _df(spark, sf_dir, "documents")
    return gopher_filter(df).orderBy("doc_id")


def q83_range_join(spark, sf_dir):
    """Binned range join (operators/joins.py range_join — the shared-bin
    equi-join rewrite of a point-in-interval theta join, same trick as
    Databricks' RANGE_JOIN hint): events whose value falls inside each
    nation's synthetic [2k, 2k+3] band. With bin_width set, both sides
    meet on (bin) so the pairing is a hash join, not a nested-loop; the
    exact predicate re-applies after. Each match lives in exactly one
    left bin, so no dedup is needed. Oracle = the plain theta join."""
    from pixeltable_spark.operators.joins import range_join
    ev = _df(spark, sf_dir, "events").select("event_id", "value")
    bands = (_df(spark, sf_dir, "nation")
             .select(F.col("n_nationkey"),
                     (F.col("n_nationkey") * 2.0).alias("lo"),
                     (F.col("n_nationkey") * 2.0 + 3.0).alias("hi")))
    out = range_join(ev, bands, left_point="value",
                     right_lo="lo", right_hi="hi", bin_width=2.0)
    return (out.select("event_id", "n_nationkey", "value")
            .orderBy("event_id", "n_nationkey"))


MIX_RATES = {"src0": 0.8, "src1": 0.5, "src2": 0.2}


def q84_mixture_sample(spark, sf_dir):
    """Deterministic training-mix sampling (operators/text.py
    mixture_sample — the DoReMi/Pile static data-mixing step): each
    domain keeps rows at its configured rate via the engine's md5-keyed
    coin (SampleClause construction), so the mix is map-only,
    filter-pushdown-friendly, and bit-reproducible on any cluster. The
    oracle applies the identical md5-prefix thresholds."""
    from pixeltable_spark.operators.text import mixture_sample
    df = _df(spark, sf_dir, "documents")
    return (mixture_sample(df, MIX_RATES, default_rate=0.1)
            .select("doc_id", "source").orderBy("doc_id"))


def _q84_oracle() -> str:
    from pixeltable_spark.plans.query import SampleClause
    cases = " ".join(
        f"WHEN '{dom}' THEN '{SampleClause.fraction_to_md5_hex(rate)}'"
        for dom, rate in sorted(MIX_RATES.items()))
    dflt = SampleClause.fraction_to_md5_hex(0.1)
    return f"""
SELECT doc_id, source FROM documents
WHERE substr(md5('0___' || CAST(doc_id AS VARCHAR)), 1, 16)
      <= CASE source {cases} ELSE '{dflt}' END
ORDER BY doc_id"""


def q85_image_hash_dedup(spark, sf_dir):
    """Image near-dup via perceptual hashing (functions/image.py ahash +
    operators/dedup.py hamming_pairs — pigeonhole banding, never n²):
    per-doc PNG textures keyed by doc_id % 37, so identical-key images
    hash identically while cross-key textures sit >= 19 bits apart
    (verified margin; max_hamming=3 can only pair same-key docs). The
    Spark side runs real decode -> luma thumbnail -> aHash -> banded
    join; the oracle knows the pairing must equal the key equivalence."""
    import pandas as pd
    from pyspark.sql import types as T

    from pixeltable_spark.functions.image import ahash
    from pixeltable_spark.functions.image_codec import encode_png
    from pixeltable_spark.operators.dedup import hamming_pairs

    def _make(ids):
        import numpy as np
        out = []
        for i in ids:
            rng = np.random.RandomState(1000 + int(i) % 37)
            out.append(encode_png(
                rng.randint(0, 256, size=(24, 32, 3), dtype="uint8"), "RGB"))
        return pd.Series(out)

    make = F.pandas_udf(_make, T.BinaryType())
    df = (_df(spark, sf_dir, "documents").select("doc_id")
          .repartition(min(8, spark.sparkContext.defaultParallelism))
          .withColumn("payload", make("doc_id")))
    hashes = df.select("doc_id", ahash(F.col("payload")).alias("h"))
    return (hamming_pairs(hashes, "h", bits=64, max_hamming=3)
            .orderBy("id_a", "id_b"))


def q86_audio_fingerprint_dedup(spark, sf_dir):
    """Audio near-dup via energy-delta fingerprints (functions/audio.py
    audio_fingerprint + the same banded hamming_pairs as text simhash
    and image ahash — the cross-modal dedup family on one candidate
    engine): per-doc WAVs keyed by doc_id % 29, identical-key audio
    fingerprints identically while cross-key noise sits >= 20 bits apart
    (verified margin; max_hamming=4 pairs only same-key docs). Real
    decode -> frame energies -> sign bits -> banded join on Spark; the
    oracle knows the pairing equals the key equivalence."""
    import pandas as pd
    from pyspark.sql import types as T

    from pixeltable_spark.functions import audio_codec as ac
    from pixeltable_spark.functions.audio import audio_fingerprint
    from pixeltable_spark.operators.dedup import hamming_pairs

    def _make(ids):
        import numpy as np
        out = []
        for i in ids:
            rng = np.random.RandomState(2000 + int(i) % 29)
            sig = (rng.randn(8000) * 8000).clip(-30000, 30000) \
                .astype(np.int16)
            out.append(ac.encode(sig.reshape(-1, 1), 8000))
        return pd.Series(out)

    make = F.pandas_udf(_make, T.BinaryType())
    df = (_df(spark, sf_dir, "documents").select("doc_id")
          .repartition(min(8, spark.sparkContext.defaultParallelism))
          .withColumn("payload", make("doc_id")))
    fps = df.select("doc_id", audio_fingerprint(F.col("payload")).alias("h"))
    return (hamming_pairs(fps, "h", bits=64, max_hamming=4)
            .orderBy("id_a", "id_b"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q01_pricing_summary(spark, "/root/testdata/sf0.001")



def q87_profile(spark, sf_dir):
    """One-pass dataset profile (operators/profile.py profile_table —
    the describe()-at-scale analog, reference catalog/table.py
    Table.describe): n / nulls / exact distinct / min / max / mean /
    exact interpolated quartiles for the lineitem measures, long format.
    Spark's `percentile` and DuckDB's `quantile_cont` share the linear
    interpolation formula, so the oracle matches to the 6dp rounding.
    The approx variant (HLL++ + KLL sketches, exact=False) is the 100 TB
    path, pinned by tests instead of the oracle."""
    from pixeltable_spark.operators.profile import profile_table
    df = _df(spark, sf_dir, "lineitem")
    out = profile_table(
        df, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        percentiles=(0.25, 0.5, 0.75), exact=True)
    return (out.select("col_name", "stat",
                       F.round("value", 6).alias("value"))
            .orderBy("col_name", "stat"))


def q88_semdedup(spark, sf_dir):
    """SemDeDup semantic dedup (operators/semdedup.py — Abbas et al.
    2023): deterministic sample-based k-means -> broadcast argmin
    assignment -> per-cluster greedy leader pruning at cosine 0.9.
    Deliberately has NO oracle_sql entry (k-means is not
    SQL-expressible — same standing as q70_pq_ann); output is fully
    deterministic and its invariants are pinned by
    tests/test_semdedup.py."""
    from pixeltable_spark.operators.semdedup import semdedup
    df = _df(spark, sf_dir, "embeddings")
    out = semdedup(df, k=16, threshold=0.9, iters=5)
    return out.orderBy("vec_id")



def q89_curation_pipeline(spark, sf_dir):
    """END-TO-END corpus curation — the composed pipeline a pretraining
    user actually ships, every stage an already-oracle-checked operator:
    Gopher quality rules (min_words=10 for this corpus' short docs) AND
    no PII (email/ssn/ipv4 alternation, map-only rlike) AND exact-dedup
    representative (md5 fingerprint, min doc_id wins) AND lang_id == 'en'
    -> (doc_id, n_words, quality). One scan feeds four map-side column
    families; the only shuffles are the two Gopher repetition aggs and
    the fingerprint groupBy — the composition adds NO shuffle beyond its
    parts. The oracle replays the full CTE chain."""
    from pixeltable_spark.operators import text as TXo
    from pixeltable_spark.operators.pii import has_pii
    # materialize the (id, text) projection ONCE: the four column families
    # below are separate DataFrame branches, and Spark shares no scan
    # across branches — without this the plan reads the corpus 10x
    df = (TXo.spread(_df(spark, sf_dir, "documents"))
          .select("doc_id", "text").localCheckpoint(eager=False))
    # min_stopwords=0: this corpus' whitespace tokens keep punctuation
    # glued ("the," != "the"), so the stopword-kinds intersect is empty
    # for every doc and the rule would blank the whole pipeline
    g = (TXo.gopher_filter(df, min_words=10, min_stopwords=0)
         .select("doc_id", "n_words", F.col("keep").alias("g_keep")))
    from pixeltable_spark.operators.langid import lang_id_table
    base = df.select(
        "doc_id",
        TXo.quality_score(F.col("text")).alias("quality"),
        has_pii(F.col("text"), ["email", "ssn", "ipv4"]).alias("pii"),
        TXo.fingerprint(F.col("text")).alias("fp"))
    # model lang-id via the explode+hash-agg table path (the scalar
    # column fn is interpreted-HOF slow at corpus scale), joined back
    # on the key — one extra doc_id-keyed shuffle, O(docs) rows
    base = base.join(lang_id_table(df, "doc_id", "text"), "doc_id")
    reps = base.groupBy("fp").agg(F.min("doc_id").alias("rep_id"))
    return (base.join(g, "doc_id").join(reps, "fp")
            .where(F.col("g_keep") & ~F.col("pii")
                   & (F.col("doc_id") == F.col("rep_id"))
                   & (F.col("lang_pred") == "en"))
            .select("doc_id", "n_words", "quality")
            .orderBy("doc_id"))



def q90_cross_corpus_dedup(spark, sf_dir):
    """Cross-corpus dedup flags (operators/dedup.py dedup_flags_against —
    the dedup-new-crawl-vs-training-set shape): every 10th doc plays the
    existing training set; each document of the full corpus gets
    dup_exact (fingerprint membership) and dup_near (MinHash band-key
    collision, K=4/2 bands) flags. Both sides reduce to hash key sets
    before any join — raw text never shuffles. The oracle replays
    fingerprints and band keys in SQL."""
    from pixeltable_spark.operators.dedup import dedup_flags_against
    from pixeltable_spark.operators.text import spread
    # one materialized pass over the corpus feeds both the fingerprint
    # branch and the band-key branch of BOTH sides (ref is a subset scan)
    df = (spread(_df(spark, sf_dir, "documents"))
          .select("doc_id", "text").localCheckpoint(eager=False))
    ref = df.where(F.col("doc_id") % 10 == 0)
    out = dedup_flags_against(df, ref, num_hashes=4, bands=2)
    return out.orderBy("doc_id")



def q91_bpe_tokenize(spark, sf_dir):
    """End-to-end tokenization pipeline (operators/bpe.py — Sennrich'16
    BPE): distributed word-frequency aggregation trains 64 merge rules
    driver-side (corpus never collected), then every document encodes
    with the rank-greedy pandas UDF and reports its exact BPE token
    count next to the regex estimator. Deliberately has NO oracle_sql
    entry (the merge loop is iterative, not SQL-expressible — same
    standing as q70/q88); training and encoding are deterministic
    (lexicographic tie-breaks), and encode/round-trip properties are
    pinned by tests TestBpe."""
    from pixeltable_spark.operators.bpe import bpe_token_count, bpe_train
    from pixeltable_spark.operators.text import spread, word_token_count
    df = spread(_df(spark, sf_dir, "documents"))
    merges = bpe_train(df, num_merges=64, max_words=5000)
    return (df.select(
        "doc_id",
        bpe_token_count(F.col("text"), merges).alias("n_bpe_tokens"),
        word_token_count(F.col("text")).alias("n_regex_tokens"))
        .orderBy("doc_id"))


def q92_lsa_semantic_dedup(spark, sf_dir):
    """Locally-trained LSA semantic embeddings (operators/lsa.py —
    Deerwester'90 LSA with Levy-Goldberg'14 PPMI weighting): distributed
    co-occurrence counting (array-shift zips, no self-join), bounded
    driver SVD, broadcast model, one mapInPandas embed pass, then
    exact top-k semantic search (TakeOrderedAndProject). NO oracle_sql
    (SVD is iterative linear algebra, not SQL — same standing as
    q70/q88/q91); semantics pinned by tests/test_lsa.py (synonym
    recall@3 beats the BoW baseline, determinism, unit-norm)."""
    from pixeltable_spark.operators.lsa import lsa_embeddings, lsa_train
    df = _df(spark, sf_dir, "documents").select("doc_id", "text")
    model = lsa_train(df, "text", dim=16, vocab_size=300, window=2)
    emb = lsa_embeddings(df, model)
    qvec = model.encode("data processing and analysis of large document "
                        "collections")
    return similarity.topk_cosine(emb, qvec, k=20,
                                  vec_col="embedding", id_col="doc_id")


def q93_media_probe(spark, sf_dir):
    """Round-5 codec family end-to-end: per doc, a TIFF (compression
    cycling none/deflate/packbits/lzw by doc_id), an IMA ADPCM WAV, and a
    hand-assembled MP4 box tree are synthesized with dims/durations that
    are arithmetic in doc_id, then probed/decoded back through the codec
    waists (functions/tiff_codec.py, audio_codec.py fmt 0x11,
    video_codec.py probe_mp4) — DuckDB checks the whole pipeline without
    ever seeing a media payload."""
    import pandas as pd
    from pyspark.sql import types as T

    df = (_df(spark, sf_dir, "documents").select("doc_id")
          .repartition(spark.sparkContext.defaultParallelism))

    def _pipeline(ids):
        import json
        import struct

        import numpy as np

        from pixeltable_spark.functions import audio_codec as ac
        from pixeltable_spark.functions import tiff_codec as tc
        from pixeltable_spark.functions import video_codec as vc

        def box(fourcc, payload):
            return struct.pack(">I", len(payload) + 8) + fourcc + payload

        comps = ("none", "deflate", "packbits", "lzw")
        out = []
        for i in ids:
            i = int(i)
            # TIFF: encode -> decode must be identical for every compression
            w, h, fill = 5 + i % 11, 2 + i % 6, i % 256
            arr = np.full((h, w, 3), fill, dtype=np.uint8)
            tif = tc.encode_tiff(arr, "RGB", compression=comps[i % 4])
            dec, _mode = tc.decode_tiff(tif)
            # ADPCM: constant signal; first sample is the block predictor
            n = 800 + i % 50
            first = (i % 100) * 10
            sig = np.full((n, 1), first, dtype=np.int16)
            wav = ac.encode_ima_adpcm(sig, 8000)
            winfo = ac.probe(wav)
            wdec, _r, _w = ac.decode(wav)
            # MP4: mvhd duration in quarter seconds
            mvhd = box(b"mvhd", b"\x00" * 4 + b"\x00" * 8
                       + struct.pack(">II", 1000, i * 250) + b"\x00" * 80)
            mp4 = box(b"ftyp", b"isom" + b"\x00" * 12) + box(b"moov", mvhd)
            minfo = vc.probe(mp4)
            out.append(json.dumps({
                "tw": int(dec.shape[1]), "th": int(dec.shape[0]),
                "tpx": int(dec[0, 0, 0]),
                "wn": int(winfo["n_frames"]),
                "wfirst": int(wdec[0, 0]),
                "wdn": int(wdec.shape[0]),
                "mdur": float(minfo["duration_s"]),
            }, sort_keys=True))
        return pd.Series(out)

    pipe = F.pandas_udf(_pipeline, T.StringType())
    out = df.withColumn("r", pipe(F.col("doc_id")))
    r = F.col("r")
    return (out.select(
        "doc_id",
        F.get_json_object(r, "$.tw").cast("int").alias("tiff_w"),
        F.get_json_object(r, "$.th").cast("int").alias("tiff_h"),
        F.get_json_object(r, "$.tpx").cast("int").alias("tiff_px"),
        F.get_json_object(r, "$.wn").cast("int").alias("wav_n"),
        F.get_json_object(r, "$.wfirst").cast("int").alias("wav_first"),
        F.get_json_object(r, "$.wdn").cast("int").alias("wav_dec_n"),
        F.get_json_object(r, "$.mdur").cast("double").alias("mp4_dur"),
    ).orderBy("doc_id"))


def q97_icon_audio_probe(spark, sf_dir):
    """Round-5c codec additions end-to-end: per doc, an ICO (PNG entry
    for even ids, 32bpp DIB+mask for odd — both container layouts), an
    AIFF and a Sun AU are synthesized with dims/frame-counts arithmetic
    in doc_id, then probed/decoded back through the shared waists
    (image_codec.decode_ico, audio_codec.decode dispatch) — DuckDB
    checks the full pipeline without seeing a media byte."""
    import pandas as pd
    from pyspark.sql import types as T

    df = (_df(spark, sf_dir, "documents").select("doc_id")
          .repartition(spark.sparkContext.defaultParallelism))

    def _pipeline(ids):
        import json

        import numpy as np

        from pixeltable_spark.functions import audio_codec as ac
        from pixeltable_spark.functions import image_codec as ic

        out = []
        for i in ids:
            i = int(i)
            w, h, fill = 3 + i % 14, 2 + i % 9, (i * 11) % 256
            arr = np.full((h, w, 4), fill, dtype=np.uint8)
            ico = ic.encode_ico(arr, png_entry=(i % 2 == 0))
            img = ic.decode(ico)
            n = 200 + i % 77
            sig = np.full((n, 1), (i % 90) * 100, dtype=np.int16)
            aif = ac.encode_aiff(sig, 8000)
            adec, arate, _aw = ac.decode(aif)
            au = ac.encode_au(sig, 16000)
            audec, aurate, _uw = ac.decode(au)
            out.append(json.dumps({
                "iw": int(img.arr.shape[1]), "ih": int(img.arr.shape[0]),
                "ipx": int(img.arr[0, 0, 0]),
                "an": int(adec.shape[0]), "ar": int(arate),
                "afirst": int(adec[0, 0]),
                "un": int(audec.shape[0]), "ur": int(aurate),
            }, sort_keys=True))
        return pd.Series(out)

    pipe = F.pandas_udf(_pipeline, T.StringType())
    r = F.col("r")
    return (df.withColumn("r", pipe(F.col("doc_id"))).select(
        "doc_id",
        F.get_json_object(r, "$.iw").cast("int").alias("ico_w"),
        F.get_json_object(r, "$.ih").cast("int").alias("ico_h"),
        F.get_json_object(r, "$.ipx").cast("int").alias("ico_px"),
        F.get_json_object(r, "$.an").cast("int").alias("aiff_n"),
        F.get_json_object(r, "$.ar").cast("int").alias("aiff_rate"),
        F.get_json_object(r, "$.afirst").cast("int").alias("aiff_first"),
        F.get_json_object(r, "$.un").cast("int").alias("au_n"),
        F.get_json_object(r, "$.ur").cast("int").alias("au_rate"),
    ).orderBy("doc_id"))


def q98_gap_fill(spark, sf_dir):
    """Time-series densify + fill (operators/timeseries.py gap_fill —
    the TimescaleDB time_bucket_gapfill + locf analog): per-user 6h
    buckets of avg(value) over events, every missing bucket generated
    executor-side (sequence + explode per group, no calendar cross
    join), last observation carried forward by a single-pass window.
    Oracle: generate_series + IGNORE NULLS window in DuckDB."""
    from pixeltable_spark.operators.timeseries import gap_fill
    df = _df(spark, sf_dir, "events")
    out = gap_fill(df, "ts", "value", 21600, by=["user_id"],
                   agg="avg", fill="locf")
    return (out.select("user_id", "bucket",
                       F.round("value", 6).alias("value"), "filled")
            .orderBy("user_id", "bucket"))


def q99_ohlc(spark, sf_dir):
    """Candlestick rollup (operators/timeseries.py ohlc): per (user,
    day) open/high/low/close/n over events.value — min_by/max_by on
    (ts, event_id) so open/close are deterministic even with duplicate
    timestamps (first()/last() would be partition-order-dependent)."""
    from pixeltable_spark.operators.timeseries import ohlc
    df = _df(spark, sf_dir, "events")
    # events carry microsecond timestamps with no (user, ts) ties at any
    # sf (checked), so the plain ts order is already deterministic here;
    # tiebreak_col exists on the operator for data that has ties
    out = ohlc(df, "ts", "value", 86400, by=["user_id"])
    return (out.select("user_id", "bucket",
                       F.round("open", 6).alias("open"),
                       F.round("high", 6).alias("high"),
                       F.round("low", 6).alias("low"),
                       F.round("close", 6).alias("close"), "n")
            .orderBy("user_id", "bucket"))


def q94_weighted_jaccard(spark, sf_dir):
    """Exact weighted (multiset) Jaccard near-dup pairs over unigram term
    frequencies, with the max_df stopword-skew guard (terms in >5% of the
    corpus are dropped before totals — a broadcast anti-join; the term
    equi-join is the only wide stage over raw terms). Set-based q34 calls
    'spam spam spam ham' == 'spam ham'; this measure doesn't."""
    df = _df(spark, sf_dir, "documents")
    # cap = 5% of the corpus (metadata-only parquet count) — a fixed cap
    # would silently drop the whole vocabulary at 10x the docs
    max_df = max(1, int(0.05 * df.count()))
    return dedup.weighted_jaccard_pairs(
        df, threshold=0.3, max_df=max_df).orderBy("id_a", "id_b")


def q95_icws_pairs(spark, sf_dir):
    """ICWS (Ioffe 2010) consistent-weighted-sampling sketch of the same
    measure: K=12 samples banded 4-per-band (hot-bucket guard), estimate =
    agreeing fraction over the full signature, first-agreeing-band-wins
    pair emission, slim-candidate + distributed-verify join shape.
    Deterministic (xxhash64-derived gamma draws) but ln/floor ulp behavior
    is engine-specific, so no SQL oracle — pinned by
    tests/test_weighted_jaccard.py (estimator tracks the exact measure,
    determinism, consistency)."""
    df = _df(spark, sf_dir, "documents")
    return dedup.icws_pairs(
        df, num_samples=12, threshold=0.75).orderBy("id_a", "id_b")


def q96_cluster_representatives(spark, sf_dir):
    """Quality-aware duplicate resolution (the step after q67's cluster
    detection): per near-dup cluster keep the member maximizing text
    length (min id on ties); singletons keep themselves. The oracle
    replays the LSH pair graph with a recursive CTE and picks the same
    argmax, so the full detect -> cluster -> resolve chain is
    EXACT-checked."""
    from pixeltable_spark.operators.dedup import cluster_representatives
    df = _df(spark, sf_dir, "documents")
    out = cluster_representatives(df, k=4, bands=2)
    return (out.select("doc_id", F.length("text").alias("quality"))
            .orderBy("doc_id"))


def q100_bm25_search(spark, sf_dir):
    """Lexical full-text retrieval (operators/search.py bm25_topk): top-10
    BM25 matches per query over documents. The corpus shuffle is pruned
    to the query vocabulary before the exchange (broadcast literal IN
    under the explode), doc length rides the scan projection, df stats /
    query terms / corpus scalars are all broadcast — the scoring join
    never moves the corpus. Scores rounded to 6 before ranking with a
    doc_id tiebreak so the top-k cut is engine-deterministic."""
    from pixeltable_spark.operators.search import bm25_topk
    df = _df(spark, sf_dir, "documents")
    out = bm25_topk(df, [("q1", "spark shuffle join"),
                         ("q2", "window hash scan"),
                         ("q3", "stream batch dedup")], k=10)
    return out.orderBy("query_id", "rnk")


def q101_funnel(spark, sf_dir):
    """Ordered-funnel conversion over events (operators/timeseries.py
    funnel): view -> click -> purchase, greedy earliest-first matching
    (equivalent to nested min(ts) > prev stages — which is exactly how
    the DuckDB oracle states it). ONE shuffle: per-user sorted event
    fold via JVM aggregate(), no per-step join cascade."""
    from pixeltable_spark.operators.timeseries import funnel
    df = _df(spark, sf_dir, "events")
    out = funnel(df, "ts", "event_type", ["view", "click", "purchase"])
    return out.orderBy("step")


def q102_cohort_retention(spark, sf_dir):
    """Weekly cohort retention over events (operators/timeseries.py
    cohort_retention): entities cohorted by first-event week, per
    (cohort, offset) active-user counts + retention vs the cohort size.
    ONE shuffle over raw events — first week and the distinct-week set
    come out of the same per-user groupBy (collect_set bounded by the
    calendar, not the event count)."""
    from pixeltable_spark.operators.timeseries import cohort_retention
    df = _df(spark, sf_dir, "events")
    out = cohort_retention(df, "ts", by="user_id", period_s=7 * 86400)
    return out.orderBy("cohort", "offset")


def q103_fuzzy_name_join(spark, sf_dir):
    """Record-linkage blocking join (operators/joins.py
    blocked_fuzzy_join): customer-name near-matches within a nation —
    candidates via the c_nationkey blocking key (one AQE-splittable
    equi-shuffle), verified with whole-stage-codegen levenshtein <= 2.
    Non-matches never materialize; cross-block pairs are never compared
    (the blocking contract)."""
    from pixeltable_spark.operators.joins import blocked_fuzzy_join
    c = _df(spark, sf_dir, "customer")
    left = c.select(F.col("c_custkey").alias("id_a"),
                    F.col("c_name").alias("name_a"),
                    F.col("c_nationkey").alias("nat_a"))
    right = c.select(F.col("c_custkey").alias("id_b"),
                     F.col("c_name").alias("name_b"),
                     F.col("c_nationkey").alias("nat_b"))
    out = blocked_fuzzy_join(left, right, "name_a", "name_b",
                             F.col("nat_a"), F.col("nat_b"), max_dist=2)
    return (out.filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "edit_dist")
            .orderBy("id_a", "id_b"))


def q104_rolling_zscore(spark, sf_dir):
    """Trailing-window anomaly detection (operators/timeseries.py
    rolling_zscore): each event's value vs mean/stddev of the previous
    20 events of the same user (current row excluded — an outlier can't
    mask itself). One window pass partitioned on user_id; rows with <2
    prior observations or zero variance get NULL z."""
    from pixeltable_spark.operators.timeseries import rolling_zscore
    df = _df(spark, sf_dir, "events")
    out = rolling_zscore(df, "ts", "value", by=["user_id"], lookback=20,
                         z_threshold=3.0, order_cols=["event_id"])
    return (out.select("user_id", "ts", "value", "z", "is_anomaly")
            .orderBy("user_id", "ts"))


def q105_pivot(spark, sf_dir):
    """Cross-tab pivot (operators/reshape.py pivot_table): per-user
    event-type counts as one wide row. Explicit pivot_values fix the
    schema and compile to ONE conditional-aggregate groupBy (no
    distinct-scan job, one shuffle); empty cells filled with 0 to match
    SQL count semantics."""
    from pixeltable_spark.operators.reshape import pivot_table
    df = _df(spark, sf_dir, "events")
    out = pivot_table(df, ["user_id"], "event_type", "value", agg="count",
                      pivot_values=["click", "error", "purchase",
                                    "signup", "view"],
                      fill_value=0)
    return out.orderBy("user_id")


def q106_melt(spark, sf_dir):
    """Wide -> long melt (operators/reshape.py melt, Spark native
    unpivot): lineitem measure columns to (variable, value) rows —
    a zero-shuffle generator expansion, each input row emitting 4
    output rows in place."""
    from pixeltable_spark.operators.reshape import melt
    df = _df(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    out = melt(df, ["l_orderkey", "l_linenumber"],
               ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])
    return (out.select("l_orderkey", "l_linenumber", "variable",
                       F.round("value", 6).alias("value"))
            .orderBy("l_orderkey", "l_linenumber", "variable"))


def q107_split_dataset(spark, sf_dir):
    """Deterministic 80/10/10 dataset split (operators/mldata.py
    split_dataset): md5(seed, id) cumulative-interval assignment —
    map-only, reproducible on any cluster, stable under appends (an
    existing row's split never changes when rows arrive). Rolled up per
    (split, source) for the check."""
    from pixeltable_spark.operators.mldata import split_dataset
    df = _df(spark, sf_dir, "documents")
    out = split_dataset(df, {"train": 0.8, "val": 0.1, "test": 0.1},
                        id_col="doc_id", seed=0)
    return (out.groupBy("split", "source").agg(F.count("*").alias("n"))
            .orderBy("split", "source"))


def q108_negative_samples(spark, sf_dir):
    """Contrastive negative mining (operators/mldata.py
    negative_samples): up to 4 deterministic pseudo-random partners per
    document via md5 hash-bucket probing — one equi-shuffle against the
    bucketed corpus, one min_by aggregate, no cross join, no driver
    collect. The oracle replays the identical hex-string hash math."""
    from pixeltable_spark.operators.mldata import negative_samples
    df = _df(spark, sf_dir, "documents")
    out = negative_samples(df, id_col="doc_id", k=4, prefix_len=2, seed=0)
    return out.orderBy("doc_id", "slot")


def q109_ranking_metrics(spark, sf_dir):
    """Retrieval evaluation composed end-to-end (operators/mldata.py
    ranking_metrics over operators/search.py bm25_topk): BM25 top-10 per
    query, graded relevance = number of distinct query terms present in
    the document, NDCG@10 / MRR / hit count per query. The relevance
    join reuses the query-vocabulary-pruned term pass — the corpus still
    never shuffles unpruned."""
    from pixeltable_spark.operators.mldata import ranking_metrics
    from pixeltable_spark.operators.search import bm25_topk
    qs = [("q1", "spark shuffle join"), ("q2", "window hash scan"),
          ("q3", "stream batch dedup")]
    df = _df(spark, sf_dir, "documents")
    ranked = bm25_topk(df, qs, k=10)
    vocab = sorted({t for _, s in qs for t in s.split()})
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    from pixeltable_spark.localframe import local_df
    qterms = local_df(
        spark, [(qid, t) for qid, s in qs for t in s.split()],
        "query_id string, term string")
    present = (df.select(F.col("doc_id"), F.explode(toks).alias("term"))
               .filter(F.col("term").isin(vocab)).distinct()
               .join(F.broadcast(qterms), "term")
               .groupBy("query_id", "doc_id")
               .agg(F.count("*").alias("rel")))
    joined = ranked.join(present, ["query_id", "doc_id"], "left") \
        .fillna(0, subset=["rel"])
    out = ranking_metrics(joined, "query_id", "rel", "rnk", k=10)
    return out.orderBy("query_id")


def q110_standardize(spark, sf_dir):
    """Per-group feature standardization with winsorization
    (operators/mldata.py standardize): z-scores of quantity and price
    within each returnflag group, clipped to +/-2.5 sigma — grouped
    stats ride one window pass, column math in codegen."""
    from pixeltable_spark.operators.mldata import standardize
    df = _df(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 5000)
    out = standardize(df, ["l_quantity", "l_extendedprice"],
                      by=["l_returnflag"], clip_sigma=2.5)
    return (out.select("l_orderkey", "l_linenumber", "l_returnflag",
                       F.round("l_quantity_z", 6).alias("qty_z"),
                       F.round("l_extendedprice_z", 6).alias("price_z"))
            .orderBy("l_orderkey", "l_linenumber"))


def q111_scd2(spark, sf_dir):
    """Slowly-changing-dimension type-2 build (operators/timeseries.py
    scd2): collapse each user's event stream into event_type validity
    intervals — one row per change with valid_from/valid_to/is_current.
    One shuffle on the key; lag-detect and lead-close-out ride the same
    partitioning (the filter between them preserves it)."""
    from pixeltable_spark.operators.timeseries import scd2
    df = _df(spark, sf_dir, "events")
    out = scd2(df, ["user_id"], "ts", ["event_type"],
               order_cols=["event_id"])
    return (out.select("user_id", "event_type", "valid_from", "valid_to",
                       "is_current")
            .orderBy("user_id", "valid_from"))


def q112_histogram(spark, sf_dir):
    """Per-event-type equi-width histogram of event values
    (operators/profile.py histogram): 20 bins over the GLOBAL min/max
    (comparable bins across groups — the bounds ride a broadcast one-row
    aggregate), clamp-to-edge bins, one map-side-combined rollup."""
    from pixeltable_spark.operators.profile import histogram
    df = _df(spark, sf_dir, "events")
    out = histogram(df, "value", bins=20, by=["event_type"])
    return (out.select("event_type", "bin",
                       F.round("bin_lo", 6).alias("bin_lo"),
                       F.round("bin_hi", 6).alias("bin_hi"), "n")
            .orderBy("event_type", "bin"))


def q113_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation matrix (operators/profile.py
    corr_matrix) over the lineitem measures — all 6 pairs in ONE
    map-side-combined aggregation pass (corr is algebraic), long-format
    upper triangle."""
    from pixeltable_spark.operators.profile import corr_matrix
    df = _df(spark, sf_dir, "lineitem")
    out = corr_matrix(df, ["l_quantity", "l_extendedprice",
                           "l_discount", "l_tax"])
    return out.orderBy("col_a", "col_b")


def q114_funnel_stream(spark, sf_dir):
    """The ordered funnel run as a STATEFUL STREAM
    (streaming/stateful.py funnel_stream — applyInPandasWithState, three
    scalars of state per entity, no event buffering): availableNow replay
    of the events source, per-entity progress aggregated to the same
    per-step rollup as batch q101 — and checked against the SAME
    nested-min SQL oracle (streaming ≡ batch on a time-ordered replay,
    also pinned by tests/test_stateful_streaming.py)."""
    import uuid as _uuid

    from pyspark.sql import types as T

    from pixeltable_spark import streaming
    steps = ["view", "click", "purchase"]
    ts_type = _rp(spark, 
        f"{sf_dir}/events.parquet").schema["ts"].dataType
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", ts_type),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    raw = (spark.readStream.format("parquet").schema(schema)
           .option("pathGlobFilter", "events.parquet").load(sf_dir))
    if isinstance(ts_type, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        prog = streaming.funnel_stream(raw, "ts", "event_type", steps)
        name = "q114_funnel_" + _uuid.uuid4().hex[:10]
        q = (prog.writeStream.outputMode("update").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
    # steps_completed is monotone per entity: max() collapses multi-batch
    # update emissions to final progress
    final = (spark.table(name).groupBy("user_id")
             .agg(F.max("steps_completed").alias("__k")))
    step_arr = F.array(*[F.lit(s) for s in steps])
    per_step = (final.filter(F.col("__k") >= 1)
                .select(F.explode(F.sequence(F.lit(1), F.col("__k")))
                        .alias("step"))
                .groupBy("step").agg(F.count("*").alias("users")))
    from pyspark.sql import Window as W
    first_users = F.max(F.when(F.col("step") == 1, F.col("users"))) \
        .over(W.partitionBy())
    return (per_step
            .withColumn("event_type", F.element_at(step_arr, F.col("step")))
            .withColumn("conversion",
                        F.round(F.col("users") / first_users, 6))
            .select("step", "event_type", "users", "conversion")
            .orderBy("step"))


def q115_interval_join(spark, sf_dir):
    """Interval-OVERLAP join (operators/joins.py interval_join): pairs
    of a customer's orders whose activity windows ([orderdate,
    orderdate + 1+key%20 days]) intersect — both sides explode to
    shared 30-day bins, pairing becomes an equi-join on (custkey, bin),
    and a multi-bin overlap emits ONCE via the first-shared-bin
    projection filter (the LSH first-band-wins trick, no distinct()
    shuffle). Oracle: the plain theta overlap join."""
    from pixeltable_spark.operators.joins import interval_join
    o = _df(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("okey"),
        F.unix_timestamp("o_orderdate").alias("lo"),
        (F.unix_timestamp("o_orderdate")
         + (1 + F.col("o_orderkey") % 20) * 86400).alias("hi"))
    out = interval_join(iv, iv, "lo", "hi", "lo", "hi",
                        by=["custkey"], bin_width=30 * 86400.0)
    return (out.filter(F.col("okey") < F.col("okey_r"))
            .select("custkey", "okey", "okey_r")
            .orderBy("custkey", "okey", "okey_r"))


def q116_ab_test(spark, sf_dir):
    """Welch two-sample t-test (operators/stats.py ab_test): event
    values of even- vs odd-id users, ONE conditional-aggregate pass
    (n/mean/var per arm ride the same map-side combine), t statistic /
    Welch df / two-sided p from the A&S 7.1.26 erf polynomial — pure
    codegen column math that the oracle replays with the identical
    IEEE-double association order."""
    from pixeltable_spark.operators.stats import ab_test
    df = _df(spark, sf_dir, "events").withColumn(
        "grp", (F.col("user_id") % 2).cast("int"))
    return ab_test(df, "value", "grp", control=0, treatment=1)


def q117_conversion_test(spark, sf_dir):
    """Two-proportion z-test (operators/stats.py two_proportion_test):
    did odd-id users purchase at a different rate than even-id users?
    Per-user conversion flags from one groupBy, then the pooled-variance
    z and the A&S-polynomial p in a single conditional-aggregate row."""
    from pixeltable_spark.operators.stats import two_proportion_test
    df = _df(spark, sf_dir, "events")
    # "big purchase" (value > 190) so the conversion rate sits mid-range
    # at every sf — plain 'any purchase' saturates to 1.0 and the test
    # is degenerate (se = 0 -> NULL by design)
    per_user = (df.groupBy("user_id")
                .agg(F.max((F.col("event_type") == "purchase")
                           & (F.col("value") > 190))
                     .alias("converted"))
                .withColumn("grp", (F.col("user_id") % 2).cast("int")))
    return two_proportion_test(per_user, "converted", "grp",
                               control=0, treatment=1)


def q118_keywords(spark, sf_dir):
    """TF-IDF keyword extraction (operators/search.py
    top_terms_per_doc): top-3 distinguishing terms per document, hapax
    (min_df=2) and boilerplate (max_df 60%) filtered on the
    aggregate-sized df table, round-before-rank + term tiebreak.
    Restricted to doc_id < 200 to keep the check output bounded; the
    operator itself is corpus-wide."""
    from pixeltable_spark.operators.search import top_terms_per_doc
    df = _df(spark, sf_dir, "documents")
    out = top_terms_per_doc(df, k=3, min_df=2, max_df_frac=0.6)
    return (out.filter(F.col("doc_id") < 200)
            .orderBy("doc_id", "rnk"))


def q119_fk_audit(spark, sf_dir):
    """Referential-integrity audit (operators/quality.py fk_summary —
    the dbt `relationships` test distributed): events.user_id against
    the BUILDING-segment customer dimension — parent reduces to
    distinct keys before a left-anti join, child streams through one
    scan; plus the one-row totals/violations/rate summary."""
    from pixeltable_spark.operators.quality import fk_summary
    ev = _df(spark, sf_dir, "events")
    cust = _df(spark, sf_dir, "customer") \
        .filter(F.col("c_mktsegment") == "BUILDING")
    return fk_summary(ev, cust, ["user_id"], ["c_custkey"])


def q120_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement
    (operators/mldata.py weighted_sample_n — Efraimidis-Spirakis A-ES
    keys over md5 uniforms): 20 docs per source, inclusion probability
    proportional to n_chars. Hash math instead of RNG state, so the
    oracle replays the identical 52-bit draw and top-n per group."""
    from pixeltable_spark.operators.mldata import weighted_sample_n
    df = _df(spark, sf_dir, "documents")
    out = weighted_sample_n(df, 20, "n_chars", by=["source"],
                            id_col="doc_id", seed=0)
    return (out.select("doc_id", "source", "n_chars")
            .orderBy("source", "doc_id"))


def q121_top_paths(spark, sf_dir):
    """User-journey mining (operators/timeseries.py top_paths): the 10
    most common event-type trigrams across per-user time-ordered
    streams — ONE shuffle (per-entity array_sort(collect_list), n-grams
    via slice-under-transform executor-side), vocabulary-sized rollup,
    deterministic path tiebreak."""
    from pixeltable_spark.operators.timeseries import top_paths
    df = _df(spark, sf_dir, "events")
    return top_paths(df, "ts", "event_type", by="user_id", n=3, k=10,
                     order_cols=["event_id"]).orderBy("rnk")


def q122_transitions(spark, sf_dir):
    """First-order Markov transition matrix (operators/timeseries.py
    transition_matrix): P(next event type | current) per user stream —
    one lead() window on the entity shuffle, vocabulary-sized rollup,
    row-normalized probabilities."""
    from pixeltable_spark.operators.timeseries import transition_matrix
    df = _df(spark, sf_dir, "events")
    return transition_matrix(df, "ts", "event_type", by="user_id",
                             order_cols=["event_id"]) \
        .orderBy("cur", "nxt")


def q123_vocab_divergence(spark, sf_dir):
    """Corpus distribution drift (operators/text.py vocab_divergence):
    Jensen-Shannon divergence between the English and German documents'
    smoothed unigram distributions — each corpus reduces to
    vocabulary-sized counts before the full-outer term join; totals
    broadcast; one aggregate-sized sum. The drift check a training
    pipeline runs between a new crawl and the current mix."""
    from pixeltable_spark.operators.text import vocab_divergence
    docs = _df(spark, sf_dir, "documents")
    return vocab_divergence(docs.filter(F.col("lang") == "en"),
                            docs.filter(F.col("lang") == "de"))


def q124_char_entropy(spark, sf_dir):
    """Low-information document filter (operators/text.py char_entropy):
    per-doc Shannon entropy of the character distribution — repetitive
    spam scores near 0, natural text ~3-4 nats. One (doc, char)
    aggregate (shuffle bounded by docs x alphabet, not text volume) and
    a per-doc rollup on the same key distribution."""
    from pixeltable_spark.operators.text import char_entropy
    df = _df(spark, sf_dir, "documents")
    return char_entropy(df).orderBy("doc_id")


def q125_robust_scale(spark, sf_dir):
    """Median/IQR robust scaling (operators/mldata.py robust_scale —
    sklearn RobustScaler distributed): per-returnflag scaled quantity
    and price. Percentiles ride one grouped aggregate (shared buffer
    per column) and join back broadcast; zero-IQR groups give NULL."""
    from pixeltable_spark.operators.mldata import robust_scale
    df = _df(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 5000)
    out = robust_scale(df, ["l_quantity", "l_extendedprice"],
                       by=["l_returnflag"])
    return (out.select("l_orderkey", "l_linenumber", "l_returnflag",
                       F.round("l_quantity_r", 6).alias("qty_r"),
                       F.round("l_extendedprice_r", 6).alias("price_r"))
            .orderBy("l_orderkey", "l_linenumber"))


def q126_twap(spark, sf_dir):
    """Time-weighted average (operators/timeseries.py twap): per-user
    6-hour TWAP of event values — each observation holds until the next
    in its bucket (weights in integer microseconds, no float time
    math); a plain avg() would over-weight bursts. The lead() window
    and the bucket rollup share one shuffle."""
    from pixeltable_spark.operators.timeseries import twap
    df = _df(spark, sf_dir, "events")
    return twap(df, "ts", "value", 21600, by=["user_id"]) \
        .orderBy("user_id", "bucket")


def q127_collocations(spark, sf_dir):
    """Corpus collocations (operators/text.py collocations): top-20
    adjacent word pairs by PMI (Church & Hanks), marginals counted over
    the same pair positions, min_count=5 noise floor. One bigram
    explode (zip_with of the token array against its own tail — no
    self-join), pair aggregate with map-side combine, vocabulary-sized
    marginal rollups joined back broadcast."""
    from pixeltable_spark.operators.text import collocations
    df = _df(spark, sf_dir, "documents")
    return collocations(df, k=20, min_count=5).orderBy("rnk")


def q128_rolling_corr(spark, sf_dir):
    """Trailing-window trend detection (operators/timeseries.py
    rolling_corr): Pearson correlation of each user's last 50 event
    values against time — corr() is an algebraic co-moment aggregate,
    so the frame slides in O(1) per row on one entity shuffle."""
    from pixeltable_spark.operators.timeseries import rolling_corr
    df = _df(spark, sf_dir, "events")
    out = rolling_corr(df, "ts", "ts", "value", by=["user_id"],
                       lookback=50, min_obs=10,
                       order_cols=["event_id"])
    return (out.select("user_id", "ts", "corr", "n_window")
            .orderBy("user_id", "ts"))


def q129_benford(spark, sf_dir):
    """Benford's-law audit (operators/quality.py benford_audit) of
    lineitem prices: first-significant-digit distribution vs
    log10(1+1/d) with the chi-square statistic — digit extracted from
    the decimal string (the arithmetic 10^floor(log10 x) form flips at
    exact powers of ten where engines' log10 ulps differ)."""
    from pixeltable_spark.operators.quality import benford_audit
    df = _df(spark, sf_dir, "lineitem")
    return benford_audit(df, "l_extendedprice")


def _q130_synth_text():
    """Deterministic multi-line document synthesized from doc_id
    arithmetic + the corpus text, so every C4 rule branch fires on the
    driver testdata (whose raw text has no newlines or punctuation).
    The oracle rebuilds the identical text in SQL."""
    did = F.col("doc_id")
    return F.concat_ws(
        "\n",
        F.lit("This is a good line with punctuation."),
        F.substring(F.col("text"), 1, 40),
        F.when(did % 3 == 0,
               F.lit("Please enable javascript to continue."))
        .otherwise(F.lit("Another fine sentence appears here!")),
        F.when(did % 5 == 0, F.lit("short one."))
        .otherwise(F.lit("A third proper sentence is present here?")),
        F.when(did % 7 == 0,
               F.lit("We use cookies and a privacy policy."))
        .otherwise(F.lit("Closing sentence for the document.")),
        F.when(did % 11 == 0, F.lit("function() { return 1; }"))
        .otherwise(F.lit("No code here.")))


def q130_c4_filter(spark, sf_dir):
    """C4 cleanup rule battery (operators/text.py c4_filter — Raffel et
    al. 2020 §2.2: terminal-punctuation lines, min words per line,
    javascript lines, lorem-ipsum/policy phrases, curly braces, min
    kept lines). Map-only JVM column math; the doc text is synthesized
    from doc_id arithmetic so every rule branch fires (q93 pattern)."""
    df = textops.spread(_df(spark, sf_dir, "documents")).select(
        "doc_id", _q130_synth_text().alias("text"))
    return (textops.c4_filter(df, min_words_per_line=3, min_kept_lines=3)
            .orderBy("doc_id"))


def q131_canonical_url(spark, sf_dir):
    """URL canonicalization + dedup keys (operators/urlops.py —
    RFC 3986 normalization + tracking-param strip): fragment drop,
    authority lowercasing, default-port drop, utm/gclid removal with
    param sorting, trailing-slash strip; md5 dedup key. URLs are
    synthesized from event_id arithmetic (q93 pattern) so every
    normalization branch fires; map-only, zero shuffle."""
    from pixeltable_spark.operators.urlops import canonical_url, url_dedup_key
    ev = textops.spread(
        _df(spark, sf_dir, "events").select("event_id", "event_type"))
    eid = F.col("event_id")
    url = F.concat(
        F.when(eid % 2 == 0, F.lit("HTTP://Example.COM:80"))
        .otherwise(F.lit("https://CDN.Site.org:443")),
        F.lit("/products/"), F.col("event_type"),
        F.when(eid % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=news&b="), (eid % 5).cast("string"),
        F.lit("&a=1"),
        F.when(eid % 4 == 0, F.lit("&gclid=abc")).otherwise(F.lit("")),
        F.lit("#sec"), (eid % 7).cast("string"))
    return (ev.select("event_id", url.alias("url"))
            .select("event_id",
                    canonical_url(F.col("url")).alias("canonical"),
                    url_dedup_key(F.col("url")).alias("dedup_key"))
            .orderBy("event_id"))



def q132_curation_stream(spark, sf_dir):
    """STREAMING corpus curation (streaming/incremental.py
    curation_stream): model lang-id + quality score + PII flag +
    fingerprint + keep verdict as a stateless per-row stream projection
    — availableNow replay of the documents source, checked against a
    full SQL oracle assembled from the q40/q41/q89 fragments (a second
    streaming query with an EXACT value oracle, after q114)."""
    import uuid as _uuid

    from pyspark.sql import types as T

    from pixeltable_spark.streaming import curation_stream
    schema = _rp(spark, f"{sf_dir}/documents.parquet").schema
    raw = (spark.readStream.format("parquet").schema(schema)
           .option("pathGlobFilter", "documents.parquet").load(sf_dir))
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        cur = curation_stream(raw)
        name = "q132_curation_" + _uuid.uuid4().hex[:10]
        q = (cur.writeStream.outputMode("append").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
    return spark.table(name).orderBy("doc_id")


def q133_mvcc_mutations(spark, sf_dir):
    """Write-path MVCC battery under the hard oracle gate (catalog.py
    insert/update/delete/revert/time-travel; reference
    catalog/table.py:675-1111 + store.py MVCC layout): load customers
    into a fresh versioned table, update one segment, delete negatives,
    REVERT that delete, delete big balances instead, then read the
    final version joined with a time-travel read of version 1. DuckDB
    replays the whole mutation history as pure relational algebra —
    cell-exact, so _v_min/_v_max bookkeeping, bucket rewrites, revert
    and version visibility are all value-checked, not just row-counted."""
    import tempfile

    import pixeltable_spark as pxt
    from pixeltable_spark.exprs import ColumnRef

    cust = _rp(spark, f"{sf_dir}/customer.parquet")
    wh = tempfile.mkdtemp(prefix="pxt_q133_")
    cat = pxt.Catalog(spark, wh)
    # n_buckets=4: the update/delete predicates are not rowid-aligned so
    # every bucket is touched regardless — fewer buckets = fewer files
    # to rewrite/stat for the same mutation coverage
    t = cat.create_table("t", {"k": pxt.Int(False), "v": pxt.Float(True),
                               "s": pxt.String(True)}, primary_key=["k"],
                         n_buckets=4)
    t.insert(cust.select(
        F.col("c_custkey").cast("int").alias("k"),
        F.col("c_acctbal").cast("double").alias("v"),
        F.col("c_mktsegment").alias("s")))                        # v1
    t.update({"v": ColumnRef("v", t.schema["v"]) + 100.0},
             where=ColumnRef("s", t.schema["s"]) == "BUILDING")   # v2
    t.delete(where=ColumnRef("v", t.schema["v"]) < 0.0)           # v3
    t.revert()                                                    # back to v2
    t.delete(where=ColumnRef("v", t.schema["v"]) > 9000.0)        # v3'
    final = t.user_df()
    orig = t.df(version=1).select(F.col("k"), F.col("v").alias("v_orig"))
    return (final.join(orig, "k")
            .select("k", F.col("v").alias("v_final"), "s", "v_orig")
            .orderBy("k"))


def q134_view_propagation(spark, sf_dir):
    """Materialized-view incremental maintenance under the hard oracle
    gate (catalog.py View._load_increment/_apply_base_update; reference
    catalog/view.py:38-328, plan.py:717-836): filtered + computed view
    over a base table, then insert/update/delete on the BASE — the view
    must track each change incrementally (new rows flow through the
    plan, updated rows enter/leave the predicate, deleted rows vanish).
    DuckDB replays the final base state through the view definition —
    the incremental path must equal the from-scratch evaluation."""
    import tempfile

    import pixeltable_spark as pxt
    from pixeltable_spark.exprs import ColumnRef

    ords = _rp(spark, f"{sf_dir}/orders.parquet")
    src = ords.select(F.col("o_orderkey").cast("int").alias("k"),
                      F.col("o_totalprice").cast("double").alias("p"),
                      F.col("o_orderstatus").alias("st"))
    wh = tempfile.mkdtemp(prefix="pxt_q134_")
    cat = pxt.Catalog(spark, wh)
    t = cat.create_table("base", {"k": pxt.Int(False), "p": pxt.Float(True),
                                  "st": pxt.String(True)}, n_buckets=4)
    t.insert(src.where(F.col("k") % 3 != 0))          # seed
    pcol = ColumnRef("p", t.schema["p"])
    v = cat.create_view(
        "big", t, predicate=pcol >= 150000.0,
        # * 0.5 is exact in IEEE double, so the oracle matches bit-for-bit
        extra_columns={"margin": (pcol * 0.5, pxt.Float())})
    t.insert(src.where(F.col("k") % 3 == 0))          # incremental load
    t.update({"p": pcol + 1000.0},
             where=ColumnRef("st", t.schema["st"]) == "F")   # rows may enter
    t.delete(where=ColumnRef("k", t.schema["k"]) % 10 == 0)  # rows leave
    out = v.df()
    return out.select("k", "p", "st", "margin").orderBy("k")


def q135_schema_evolution(spark, sf_dir):
    """Schema evolution under the hard oracle gate (catalog.py
    add_column/add_computed_column backfill/rename_column/drop_column;
    reference catalog/table.py add_column/drop_column/rename_column):
    seed a table from nation, add a computed column AFTER the seed
    insert (backfill over existing rows), insert more rows (computed
    over only the new slice), add + drop a plain column, rename a
    column, then read. DuckDB replays the surviving projection."""
    import tempfile

    import pixeltable_spark as pxt
    from pixeltable_spark.exprs import ColumnRef

    nat = _rp(spark, f"{sf_dir}/nation.parquet")
    src = nat.select(F.col("n_nationkey").cast("int").alias("nk"),
                     F.col("n_name").alias("name"),
                     F.col("n_regionkey").cast("int").alias("rk"))
    wh = tempfile.mkdtemp(prefix="pxt_q135_")
    cat = pxt.Catalog(spark, wh)
    t = cat.create_table("t", {"nk": pxt.Int(False), "name": pxt.String(True),
                               "rk": pxt.Int(True)}, n_buckets=2)
    t.insert(src.where(F.col("nk") < 15))              # seed
    rk = ColumnRef("rk", t.schema["rk"])
    t.add_computed_column("rk10", rk * 10)             # backfill path
    t.insert(src.where(F.col("nk") >= 15))             # incremental path
    t.add_column("bonus", pxt.Float(True))             # all-null add
    t.rename_column("name", "nation_name")
    t.drop_column("bonus")
    out = t.user_df()
    return out.select("nk", "nation_name", "rk", "rk10").orderBy("nk")


def q136_pii_audit(spark, sf_dir):
    """PII audit battery with Luhn-validated card detection
    (operators/pii.py; public ISO/IEC 7812 mod-10): text synthesized
    from doc_id arithmetic embeds emails, SSNs, and a bank of known
    test card numbers — half Luhn-valid, half not — so the naive
    regex count and the checksum-validated count disagree exactly
    where they should. Map-only codegen column math; DuckDB replays
    the fold with list_transform/list_aggregate."""
    from pixeltable_spark.operators.pii import (pii_count, scrub_pii,
                                                valid_card_count)

    did = F.col("doc_id")
    text = F.concat_ws(
        " ",
        F.lit("Contact"),
        F.when(did % 3 == 0,
               F.concat(F.lit("user"), did.cast("string"),
                        F.lit("@example.com"))).otherwise(F.lit("nobody")),
        F.when(did % 5 == 0, F.lit("ssn 123-45-6789")).otherwise(F.lit("")),
        F.lit("card"),
        # alternating valid / invalid test PANs (publicly known vectors)
        F.when(did % 4 == 0, F.lit("4111111111111111"))
        .when(did % 4 == 1, F.lit("4111111111111112"))
        .when(did % 4 == 2, F.lit("378282246310005"))
        .otherwise(F.lit("1234567890123456")),
        F.lit("end"))
    df = _df(spark, sf_dir, "documents").select("doc_id", text.alias("t"))
    return (df.select(
        "doc_id",
        pii_count(F.col("t"), "email").alias("n_email"),
        pii_count(F.col("t"), "ssn").alias("n_ssn"),
        pii_count(F.col("t"), "credit_card").alias("n_card_naive"),
        valid_card_count(F.col("t")).alias("n_card_luhn"),
        scrub_pii(F.col("t"), ["email", "ssn"]).alias("scrubbed"))
        .orderBy("doc_id"))


_MP3_BANK = [32, 48, 64, 96, 128, 160, 192, 256, 320]


def q137_audio_structure(spark, sf_dir):
    """Audio structural layer under the hard oracle gate
    (audio_codec.py mp3_frame_index/mp3_duration/adts_*): per document,
    SYNTHESIZE a VBR MP3 (3 + doc_id%7 frames, bitrate bank walked from
    doc_id, padding alternating) and an ADTS AAC stream (2 + doc_id%5
    frames) inside an Arrow batch, run the REAL frame indexers over the
    bytes, and return frame counts / exact durations / mean bitrate.
    The DuckDB oracle replays the expected numbers closed-form — so the
    parsers' output is value-gated, not just unit-tested."""
    import pandas as pd
    from pyspark.sql import types as T

    from pixeltable_spark.functions import audio_codec as ac

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("mp3_frames", T.IntegerType()),
        T.StructField("mp3_dur", T.DoubleType()),
        T.StructField("mp3_mean_kbps", T.DoubleType()),
        T.StructField("aac_frames", T.IntegerType()),
        T.StructField("aac_dur", T.DoubleType()),
    ])

    def _mk_mp3_frame(bitrate_kbps, padding):
        br_idx = ac._MP3_BITRATES[("1", 3)].index(bitrate_kbps) + 1
        size = 144 * bitrate_kbps * 1000 // 44100 + padding
        hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (0 << 2) | (padding << 1),
                     0x00])
        return hdr + bytes(32) + bytes(size - 36)

    def _mk_adts_frame():
        size = 150
        h = bytearray(7)
        h[0], h[1] = 0xFF, 0xF1
        h[2] = (1 << 6) | (4 << 2)      # LC, 44100
        h[3] = (2 & 3) << 6 | ((size >> 11) & 3)
        h[4] = (size >> 3) & 0xFF
        h[5] = ((size & 7) << 5) | 0x1F
        h[6] = 0xFC
        return bytes(h) + bytes(size - 7)

    frame_cache: dict = {}

    def _frame(kbps, pad):
        f = frame_cache.get((kbps, pad))
        if f is None:
            f = frame_cache[(kbps, pad)] = _mk_mp3_frame(kbps, pad)
        return f

    adts_one = _mk_adts_frame()
    # every per-row result is a pure function of doc_id % lcm(7,9,2,5):
    # memoize the 630 distinct cases so 60k+ rows parse ~630 streams
    result_cache: dict = {}

    def _result(key):
        r = result_cache.get(key)
        if r is not None:
            return r
        n_mp3 = 3 + key % 7
        mp3 = b"".join(_frame(_MP3_BANK[(key + i) % len(_MP3_BANK)],
                              i % 2) for i in range(n_mp3))
        aac = adts_one * (2 + key % 5)
        st = ac.mp3_bitrate_stats(mp3)
        r = (len(ac.mp3_frame_index(mp3)), ac.mp3_duration(mp3),
             st["mean_kbps"], len(ac.adts_frame_index(aac)),
             ac.adts_duration(aac))
        result_cache[key] = r
        return r

    def op(batches):
        lcm = 630  # lcm(7, 9, 2, 5): the doc_id periodicity of the synth
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                mf, md, mk, af, ad = _result(did % lcm)
                rows.append({
                    "doc_id": did, "mp3_frames": mf, "mp3_dur": md,
                    "mp3_mean_kbps": mk, "aac_frames": af, "aac_dur": ad})
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    base = textops.spread(_df(spark, sf_dir, "documents")).select("doc_id")
    return base.mapInPandas(op, out_schema).orderBy("doc_id")


def q138_video_structure(spark, sf_dir):
    """Video structural layer under the hard oracle gate
    (video_codec.py mp4_sample_index/mp4_gop_segments): per document,
    synthesize a valid BMFF file (10 + doc_id%8 samples, stts of two
    runs, keyframes every 4th sample) in an Arrow batch, run the REAL
    sample-table parser, and return frame/keyframe counts, exact
    duration, and the GOP segment count at a fixed duration — all
    replayed closed-form by the DuckDB oracle."""
    import struct as _struct

    import pandas as pd
    from pyspark.sql import types as T

    from pixeltable_spark.functions import video_codec as vc

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("n_keyframes", T.IntegerType()),
        T.StructField("dur", T.DoubleType()),
        T.StructField("n_gops", T.IntegerType()),
    ])

    def _box(fourcc, body):
        return _struct.pack(">I", 8 + len(body)) + fourcc + body

    def _full(fourcc, body):
        return _box(fourcc, b"\x00\x00\x00\x00" + body)

    def _mk_mp4(n):
        sizes = [20 + (i % 5) for i in range(n)]
        deltas = [(n // 2, 100), (n - n // 2, 50)]
        sync = list(range(1, n + 1, 4))
        ftyp = _box(b"ftyp", b"isom" + _struct.pack(">I", 0x200) + b"isom")
        mdat = _box(b"mdat", b"".join(bytes([i % 251]) * s
                                      for i, s in enumerate(sizes)))
        stts = _full(b"stts", _struct.pack(">I", len(deltas)) + b"".join(
            _struct.pack(">II", c, d) for c, d in deltas))
        stsz = _full(b"stsz", _struct.pack(">II", 0, n) + b"".join(
            _struct.pack(">I", s) for s in sizes))
        stsc = _full(b"stsc", _struct.pack(">I", 1)
                     + _struct.pack(">III", 1, n, 1))
        stco = _full(b"stco", _struct.pack(">II", 1, len(ftyp) + 8))
        stss = _full(b"stss", _struct.pack(">I", len(sync)) + b"".join(
            _struct.pack(">I", s) for s in sync))
        stsd = _full(b"stsd", _struct.pack(">I", 1)
                     + _box(b"avc1", b"\x00" * 78))
        stbl = _box(b"stbl", stsd + stts + stsz + stsc + stco + stss)
        total = sum(c * d for c, d in deltas)
        mdhd = _full(b"mdhd", _struct.pack(">IIIIHH", 0, 0, 600, total,
                                           0x55C4, 0))
        hdlr = _full(b"hdlr", _struct.pack(">I", 0) + b"vide"
                     + b"\x00" * 12 + b"V\x00")
        mdia = _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl))
        trak = _box(b"trak", _full(b"tkhd", b"\x00" * 80) + mdia)
        mvhd = _full(b"mvhd", _struct.pack(">IIII", 0, 0, 600, total)
                     + b"\x00" * 80)
        return ftyp + mdat + _box(b"moov", mvhd + trak)

    cache: dict = {}

    def _result(m):
        r = cache.get(m)
        if r is None:
            p = _mk_mp4(10 + m)
            idx = vc.mp4_sample_index(p)
            r = cache[m] = (len(idx),
                            sum(1 for s in idx if s["keyframe"]),
                            vc.mp4_exact_duration(p),
                            len(vc.mp4_gop_segments(p, duration=0.5)))
        return r

    def op(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                ns, nk, dur, ng = _result(did % 8)
                rows.append({"doc_id": did, "n_samples": ns,
                             "n_keyframes": nk, "dur": dur, "n_gops": ng})
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    base = textops.spread(_df(spark, sf_dir, "documents")).select("doc_id")
    return base.mapInPandas(op, out_schema).orderBy("doc_id")


def q139_index_maintenance(spark, sf_dir):
    """Embedding-index INSERT-SYNC under the hard oracle gate
    (index.py EmbeddingIndex/add-then-insert; reference
    catalog/table.py:461 add_embedding_index — index values computed
    incrementally at insert time): load half the embeddings into a
    versioned table, build the index, insert the OTHER half, then
    search. The DuckDB oracle computes exact top-k cosine over ALL
    embeddings — if post-index inserts were invisible to the search,
    half the corpus would be missing and the result set could not
    match."""
    import tempfile

    import pixeltable_spark as pxt
    from pixeltable_spark.index import EmbeddingIndex
    from pixeltable_spark.type_system import ArrayType

    emb = _rp(spark, f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").cast("int").alias("vid"),
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    wh = tempfile.mkdtemp(prefix="pxt_q139_")
    cat = pxt.Catalog(spark, wh)
    t = cat.create_table(
        "e", {"vid": pxt.Int(False),
              "embedding": ArrayType(element=pxt.Float(False))},
        n_buckets=2)
    t.insert(emb.where(F.col("vid") % 2 == 0))       # half the corpus
    idx = EmbeddingIndex(t, "embedding", "embedding", method="exact")
    t.insert(emb.where(F.col("vid") % 2 == 1))       # index must see these
    hits = idx.search(QUERY_VEC, k=20)
    return (hits.select("vid",
                        F.col("_similarity").alias("cos"))
            .orderBy(F.col("cos").desc(), "vid"))


def q140_sessionize_stream(spark, sf_dir):
    """Gap sessionization as a STATEFUL STREAM
    (streaming/stateful.py sessionize_stream_stateful —
    applyInPandasWithState, two scalars of state per entity, numpy
    shifted-diff fold, no event buffering): availableNow replay of the
    events source, per-user session counts collapsed by max() (the
    count is monotone across update emissions) — checked against the
    SAME lag+gap SQL oracle as batch q22 (streaming ≡ batch on a
    time-ordered replay; third streaming query with a full SQL oracle,
    after q114/q132)."""
    import uuid as _uuid

    from pyspark.sql import types as T

    from pixeltable_spark import streaming
    ts_type = _rp(spark, 
        f"{sf_dir}/events.parquet").schema["ts"].dataType
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", ts_type),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    raw = (spark.readStream.format("parquet").schema(schema)
           .option("pathGlobFilter", "events.parquet").load(sf_dir))
    if isinstance(ts_type, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        sess = streaming.sessionize_stream_stateful(raw, "ts", "user_id",
                                                    gap_s=1800)
        name = "q140_sess_" + _uuid.uuid4().hex[:10]
        q = (sess.writeStream.outputMode("update").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
    return (spark.table(name).groupBy("user_id")
            .agg(F.max("n_sessions").alias("n_sessions"))
            .orderBy("user_id"))


def q141_component_groupby(spark, sf_dir):
    """NESTED component views + group_by(base_tbl) under the oracle gate
    (catalog.py View + iterators.py _as_view_iterator composite identity;
    plans/query.py group_by(table handle); reference
    _query.py:1446-1538 groups a component view by its base row, one pos
    level per iterator): documents -> token-chunk component view ->
    sub-chunk component view OVER the component view (identity
    `_rowid + _pos + _pos_2`), then both views grouped by the ROOT base
    table and joined back for per-document chunk/sub-chunk counts.
    DuckDB replays the two-level token-window explode in closed form."""
    import tempfile

    import pixeltable_spark as pxt
    from pixeltable_spark import functions as pxtf
    from pixeltable_spark.iterators import DocumentSplitter

    docs = (_df(spark, sf_dir, "documents")
            .orderBy("doc_id").limit(150)
            .where(F.length(F.trim(F.col("text"))) > 0))
    wh = tempfile.mkdtemp(prefix="pxt_q141_")
    cat = pxt.Catalog(spark, wh)
    t = cat.create_table("d", {"doc_id": pxt.Int(False),
                               "text": pxt.String(True)}, n_buckets=4)
    t.insert(docs.select("doc_id", "text"))
    chunks = cat.create_view("chunks", t, iterator=DocumentSplitter.create(
        document="text", separators="token_limit", limit=20))
    subs = cat.create_view("subs", chunks, iterator=DocumentSplitter.create(
        document="text", separators="token_limit", limit=5))
    base = t.ref()
    cref, sref = chunks.ref(), subs.ref()
    g1 = pxt.TableRef.from_df(
        cref.group_by(t).select(cref["_rowid"],
                                n_chunks=pxtf.count(cref["_rowid"])).df(),
        "g1")
    g2 = pxt.TableRef.from_df(
        sref.group_by(t).select(sref["_rowid"],
                                n_subs=pxtf.count(sref["_rowid"])).df(),
        "g2")
    q = (base.join(g1, on=base["_rowid"] == g1["_rowid"])
             .join(g2, on=base["_rowid"] == g2["_rowid"])
             .select(base.doc_id, g1.n_chunks, g2.n_subs)
             .order_by(base.doc_id))
    return q.df()


def q142_merge_battery(spark, sf_dir):
    """batch_update (keyed MERGE) under the hard oracle gate (catalog.py
    batch_update: one broadcast key join, one version bump, one
    file-granular rewrite per batch; reference catalog/table.py:978,
    plan.py:619 the MERGE shape): load customers keyed by custkey, apply
    three merge batches with DIFFERENT column subsets (v only, s only,
    both — unmentioned columns must keep their values) plus unmatched
    keys (ignored, not inserted), then one post-merge delete. DuckDB
    replays the merges as CASE expressions over the final key sets —
    cell-exact, so per-row column-subset semantics, no-match behavior
    and MVCC bookkeeping are all value-checked."""
    import tempfile

    import pixeltable_spark as pxt
    from pixeltable_spark.exprs import ColumnRef

    cust = _df(spark, sf_dir, "customer")
    wh = tempfile.mkdtemp(prefix="pxt_q142_")
    cat = pxt.Catalog(spark, wh)
    t = cat.create_table("c", {"k": pxt.Int(False), "v": pxt.Float(True),
                               "s": pxt.String(True)},
                         primary_key=["k"], n_buckets=4)
    t.insert(cust.select(F.col("c_custkey").cast("long").alias("k"),
                         F.col("c_acctbal").cast("double").alias("v"),
                         F.col("c_mktsegment").alias("s")))
    # batch 1: v only (-1.0*k is exact in IEEE double for these ints);
    # keys beyond the sf's max custkey are skipped (if_not_exists=ignore)
    t.batch_update([{"k": k, "v": -1.0 * k} for k in range(1, 1500, 97)],
                   if_not_exists="ignore")
    # batch 2: s only — v set by batch 1 must survive where keys overlap
    t.batch_update([{"k": k, "s": "MERGED"} for k in range(2, 1500, 101)],
                   if_not_exists="ignore")
    # batch 3: both columns, plus 5 keys outside the table that the
    # UPSERT path must INSERT in the same commit (reference
    # if_not_exists='insert', catalog/table.py:982-995)
    t.batch_update([{"k": k, "v": 0.25 * k, "s": "BOTH"}
                    for k in range(3, 1500, 103)]
                   + [{"k": 10_000_000 + i, "v": 1.0, "s": "X"}
                      for i in range(5)],
                   if_not_exists="insert")
    t.delete(where=ColumnRef("k", t.schema["k"]) % 10 == 7)
    return t.user_df().select("k", "v", "s").orderBy("k")


def q143_stream_ingest(spark, sf_dir):
    """Exactly-once streaming ingest under the oracle gate (catalog.py
    Table.insert_stream: foreachBatch + per-stream batch ledger stamped
    in the manifest commit — Delta txnAppId/txnVersion; the reference
    only has batch insert, catalog/table.py:675): orders flow through a
    multi-batch availableNow file stream into a versioned table with a
    computed column, then the WHOLE stream is replayed from a fresh
    checkpoint under the same stream_id (the at-least-once failure
    shape) — the ledger must make the replay a no-op. DuckDB sees the
    batch equivalent; any duplicate or missed batch breaks cell-exact."""
    import tempfile

    import pixeltable_spark as pxt
    from pixeltable_spark.exprs import ColumnRef

    ords = _df(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_totalprice").cast("double").alias("p"))
    root = tempfile.mkdtemp(prefix="pxt_q143_")
    src = f"{root}/src"
    ords.repartition(4).write.parquet(src)
    cat = pxt.Catalog(spark, f"{root}/wh")
    t = cat.create_table("t", {"k": pxt.Int(False), "p": pxt.Float(True)})
    pref = ColumnRef("p", t.schema["p"])
    t.add_computed_column("margin", pref * 0.5, pxt.Float())

    import pyspark.sql.types as T
    schema = T.StructType([T.StructField("k", T.LongType(), False),
                           T.StructField("p", T.DoubleType(), True)])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    t.insert_stream(stream, f"{root}/ck1",
                    stream_id="orders").awaitTermination(300)
    # full replay from a fresh checkpoint, same stream id: every batch
    # re-delivers and every one must be rejected by the ledger
    stream2 = spark.readStream.schema(schema).parquet(src)
    t.insert_stream(stream2, f"{root}/ck2",
                    stream_id="orders").awaitTermination(300)
    return t.user_df().select("k", "p", "margin").orderBy("k")


def q144_similarity_expr(spark, sf_dir):
    """ColumnRef.similarity() under the hard oracle gate (exprs.py
    SimilarityExpr + catalog Table.add_embedding_index; reference
    exprs/similarity_expr.py, index/embedding_index.py:270-295 metric
    semantics): index the precomputed embedding ARRAY column directly
    (the reference's array-column path — no embedding fn), metric=l2,
    and rank nearest-first by the expr. Compiles to pure-JVM
    zip_with/aggregate over the array + TakeOrderedAndProject — the
    100 TB shape is a scan + partition-local top-k, no shuffle of the
    corpus. The DuckDB oracle recomputes exact L2 distance."""
    import tempfile

    import pixeltable_spark as pxt
    from pixeltable_spark import functions as pxtf
    from pixeltable_spark.type_system import ArrayType

    emb = _rp(spark, f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").cast("int").alias("vid"),
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    wh = tempfile.mkdtemp(prefix="pxt_q144_")
    cat = pxt.Catalog(spark, wh)
    t = cat.create_table(
        "e", {"vid": pxt.Int(False),
              "embedding": ArrayType(element=pxt.Float(False))},
        n_buckets=2)
    t.insert(emb)
    t.add_embedding_index("embedding", idx_name="nn", metric="l2")
    r = t.ref()
    sim = pxtf.math.round(
        r.embedding.similarity(vector=QUERY_VEC, idx="nn"), digits=6)
    return (r.select(r.vid, dist=sim)
            .order_by(sim).order_by(r.vid).limit(20).df())


def q145_schema_time_travel(spark, sf_dir):
    """Versioned-schema time travel under the hard oracle gate
    (catalog.py schema snapshots + METADATA-ONLY drop_column; reference
    keeps a versioned schema via catalog/table_version.py
    bump_schema_version): add a column, fill it for half the rows,
    drop it (no rewrite — the physical column stays, resolved through
    the retired reader schema), insert more rows, then revert. Reads at
    three points must see the schema AS OF each version: the dropped
    column's values at v3, its absence at v1, and the post-revert state
    (insert undone, column still absent). DuckDB replays each stage
    from the source data; any history leak (column visible too early,
    values lost by the drop, revert not undoing the insert) breaks
    cell-exact."""
    import tempfile

    import pixeltable_spark as pxt
    from pixeltable_spark.exprs import ColumnRef

    nat = _rp(spark, f"{sf_dir}/nation.parquet")
    src = nat.select(F.col("n_nationkey").cast("int").alias("nk"),
                     F.col("n_name").alias("name"),
                     F.col("n_regionkey").cast("int").alias("rk"))
    wh = tempfile.mkdtemp(prefix="pxt_q145_")
    cat = pxt.Catalog(spark, wh)
    t = cat.create_table("t", {"nk": pxt.Int(False),
                               "name": pxt.String(True),
                               "rk": pxt.Int(True)}, n_buckets=2)
    t.insert(src.where(F.col("nk") < 20))              # v1: 20 rows
    t.add_column("extra", pxt.Int(True))               # v2
    nk = ColumnRef("nk", t.schema["nk"])
    t.update({"extra": nk * 7}, where=nk < 10)         # v3
    t.drop_column("extra")                             # v4: metadata-only
    t.insert(src.where(F.col("nk") >= 20))             # v5
    t.revert()                                         # back to v4 state

    def stage(df, label, ncols, with_extra):
        val = F.col("extra") if with_extra else F.lit(None).cast("int")
        return df.select(F.lit(label).alias("stage"),
                         F.col("nk"), val.alias("val"),
                         F.lit(ncols).alias("ncols"))

    out = (stage(t.user_df(version=3), "at_v3", 4, True)
           .unionByName(stage(t.user_df(version=1), "at_v1", 3, False))
           .unionByName(stage(t.user_df(), "final", 3, False)))
    return out.orderBy("stage", "nk")


def q146_serialized_query(spark, sf_dir):
    """Query JSON serialization under the hard oracle gate
    (plans/query.py Query.as_dict/from_dict + exprs.py Expr.as_dict;
    reference _query.py:1904-1985): build a filtered grouped aggregate
    over a versioned table, round-trip it through json.dumps/loads,
    rebind against the catalog by table name, and EXECUTE the
    deserialized plan. DuckDB computes the same aggregate from the
    source — a clause lost or rebound wrongly in the round-trip breaks
    the values."""
    import json as _json
    import tempfile

    import pixeltable_spark as pxt
    from pixeltable_spark import functions as pxtf

    orders = _rp(spark, f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").cast("long").alias("ok"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("double").alias("price"))
    wh = tempfile.mkdtemp(prefix="pxt_q146_")
    cat = pxt.Catalog(spark, wh)
    t = cat.create_table("o", {"ok": pxt.Int(False),
                               "prio": pxt.String(True),
                               "price": pxt.Float(True)}, n_buckets=2)
    t.insert(orders)
    r = t.ref()
    q = (r.where(r.price > 50_000.0)
         .group_by(r.prio)
         .select(r.prio, n=pxtf.count(r.ok),
                 rev=pxtf.math.round(pxtf.sum(r.price), digits=2))
         .order_by(r.prio))
    blob = _json.dumps(q.as_dict())                    # pure JSON
    q2 = pxt.Query.from_dict(_json.loads(blob), cat)
    return q2.df()


def q147_stream_stream_join(spark, sf_dir):
    """Watermarked STREAM-STREAM join under the hard oracle gate
    (streaming/incremental.py stream_stream_join; Structured
    Streaming's state-store-buffered two-sided join — the reference has
    no stream processing at all, SURVEY §2.11): view events joined to
    same-user purchase events within 30 minutes, both sides replayed
    from the events source with availableNow. Watermark + time-range
    condition bound the join state to the window, so at scale state is
    O(events in the watermark), not O(stream). DuckDB computes the same
    time-window self-join; per-user attributed-pair counts and summed
    purchase value must match cell-exact."""
    import uuid as _uuid

    from pyspark.sql import types as T

    from pixeltable_spark.streaming import stream_stream_join

    ts_type = _rp(spark, 
        f"{sf_dir}/events.parquet").schema["ts"].dataType
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", ts_type),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])

    def src():
        raw = (spark.readStream.format("parquet").schema(schema)
               .option("pathGlobFilter", "events.parquet").load(sf_dir))
        if isinstance(ts_type, T.LongType):
            raw = raw.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return raw.select("event_id", "ts", "user_id", "event_type",
                          "value")

    views = src().where(F.col("event_type") == "view")
    purchases = src().where(F.col("event_type") == "purchase")
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    # 4 state partitions: each micro-batch pays per-partition state
    # store setup x3 batches; at gate scale fewer stores is ~15%
    # faster and a real deployment sizes this to volume anyway
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        joined = stream_stream_join(views, purchases, "user_id",
                                    within_s=1800, watermark_s=3600)
        name = "q147_ssj_" + _uuid.uuid4().hex[:10]
        q = (joined.writeStream.outputMode("append").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
    return (spark.table(name)
            .groupBy(F.col("l_user_id").alias("user_id"))
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.round(F.sum("r_value"), 4).alias("attributed"))
            .orderBy("user_id"))


def q148_audio_resample(spark, sf_dir):
    """Windowed-sinc sample-rate conversion under the hard oracle gate
    (audio_codec.py sinc_resample/resample_payload — Smith's
    bandlimited resampling, real derivable DSP): per document,
    synthesize a PCM WAV sine (rate/length/frequency walked from
    doc_id), resample to 16 kHz inside the Arrow batch, decode the
    result and report the output rate, frame count and duration. The
    DuckDB oracle replays the length arithmetic closed-form
    (n_out = round(n_in * 16000 / rate_in)); the DSP quality itself
    (DC exactness, tone preservation, anti-aliasing) is pinned by
    tests/test_audio_resample.py."""
    import pandas as pd
    from pyspark.sql import types as T

    from pixeltable_spark.functions import audio_codec as ac

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("rate_in", T.IntegerType()),
        T.StructField("n_in", T.IntegerType()),
        T.StructField("rate_out", T.IntegerType()),
        T.StructField("n_out", T.IntegerType()),
        T.StructField("dur_ms", T.DoubleType()),
    ])
    rates = [8000, 11025, 22050, 44100]

    def gen(batches):
        import numpy as np
        cache: dict = {}
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                key = did % 20
                if key not in cache:
                    rate = rates[key % 4]
                    n = 400 + 37 * key
                    t = np.arange(n) / rate
                    freq = 200 + 10 * key
                    x = (8000 * np.sin(2 * np.pi * freq * t)) \
                        .astype(np.int16)
                    wav = ac.encode(x, rate)
                    out = ac.resample_payload(wav, 16000)
                    samples, r_out, _w = ac.decode(out)
                    cache[key] = (rate, n, r_out, samples.shape[0])
                rate, n, r_out, n_out = cache[key]
                rows.append((did, rate, n, r_out, n_out,
                             round(1000.0 * n_out / r_out, 6)))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

    docs = _df(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(gen, out_schema).orderBy("doc_id")


def q149_image_quality(spark, sf_dir):
    """PSNR/SSIM image-quality metrics under the hard oracle gate
    (functions/image.py psnr/ssim — Wang et al. 2004 with the standard
    constants; the whole path runs REAL: PNG encode -> stdlib decode ->
    grayscale -> metric): per document, two solid-color frames with
    luma values derived from doc_id. For constant images both metrics
    collapse to closed form — PSNR = 20 log10(255) - 10 log10((a-b)^2)
    (100 dB cap when equal) and SSIM = (2ab+c1)/(a^2+b^2+c1) — which
    DuckDB replays exactly. Any luma/codec/windowing defect (e.g. the
    uint16 luma wrap this round's property tests caught) breaks the
    values."""
    import pandas as pd
    from pyspark.sql import types as T

    from pixeltable_spark.functions import image as pxti

    pair_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("a", T.BinaryType()),
        T.StructField("b", T.BinaryType()),
    ])

    def gen(batches):
        import numpy as np

        from pixeltable_spark.functions.image_codec import encode_png
        cache: dict = {}
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                key = did % 24
                if key not in cache:
                    av = 30 + 9 * key
                    bv = min(255, av + (key % 5) * 11)
                    cache[key] = (
                        encode_png(np.full((16, 16), av, np.uint8), "L"),
                        encode_png(np.full((16, 16), bv, np.uint8), "L"))
                pa, pb = cache[key]
                rows.append((did, bytearray(pa), bytearray(pb)))
            yield pd.DataFrame(rows, columns=["doc_id", "a", "b"])

    # spread the one-split scan: the narrow gen -> psnr/ssim chain
    # otherwise inherits ONE partition and the whole codec/metric
    # battery runs single-task (measured two ~1.9 s one-task jobs);
    # no-op at real scale, per-row metrics unaffected by partitioning
    from pixeltable_spark.operators import text as textops
    docs = textops.spread(_df(spark, sf_dir, "documents").select("doc_id"))
    pairs = docs.mapInPandas(gen, pair_schema)
    return (pairs.select(
        "doc_id",
        F.round(pxti.psnr(F.col("a"), F.col("b")), 6).alias("p"),
        F.round(pxti.ssim(F.col("a"), F.col("b")), 6).alias("s"))
        .orderBy("doc_id"))


def q150_stream_leftouter_join(spark, sf_dir):
    """leftOuter STREAM-STREAM join with heartbeat flush under the hard
    oracle gate (streaming/incremental.py stream_stream_join +
    heartbeat_replay_dir): views left-joined to same-user purchases
    within 30 minutes, replayed availableNow. Plain bounded replays
    withhold unmatched left rows inside the final watermark (inherent
    Structured Streaming semantics — they emit only when the watermark
    passes their join window); the heartbeat protocol appends two
    sentinel-key rows past `max_ts + watermark + window` as trailing
    micro-batches, so the replay flushes the tail and equals the batch
    LEFT time-window join exactly. DuckDB computes that batch join;
    per-user view/matched/unmatched counts and attributed value must
    match cell-exact — and the unmatched tail is load-bearing: without
    the flush, late unmatched views are missing and the counts break."""
    import datetime
    import uuid as _uuid

    from pyspark.sql import types as T

    from pixeltable_spark.streaming import (heartbeat_replay_dir,
                                            stream_stream_join)

    src_file = f"{sf_dir}/events.parquet"
    raw_schema = _rp(spark, src_file).schema
    b = _rp(spark, src_file)
    maxts = b.agg(F.max("ts")).first()[0]
    if isinstance(raw_schema["ts"].dataType, T.LongType):
        hb_ts = int(maxts) + (3600 + 1800 + 60) * 1_000_000
    else:
        hb_ts = maxts + datetime.timedelta(seconds=3600 + 1800 + 60)
    src_dir = heartbeat_replay_dir(
        spark, [src_file],
        [(-1, hb_ts, -1, "view", None, None),
         (-2, hb_ts, -1, "purchase", None, None)],
        raw_schema)

    def src():
        raw = (spark.readStream.format("parquet").schema(raw_schema)
               .option("maxFilesPerTrigger", "1").load(src_dir))
        if isinstance(raw_schema["ts"].dataType, T.LongType):
            raw = raw.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return raw.select("event_id", "ts", "user_id", "event_type",
                          "value")

    views = src().where(F.col("event_type") == "view")
    purchases = src().where(F.col("event_type") == "purchase")
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    # 4 state partitions: each micro-batch pays per-partition state
    # store setup x3 batches; at gate scale fewer stores is ~15%
    # faster and a real deployment sizes this to volume anyway
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        joined = stream_stream_join(views, purchases, "user_id",
                                    within_s=1800, watermark_s=3600,
                                    how="leftOuter", heartbeat_key=-1)
        name = "q150_ssj_" + _uuid.uuid4().hex[:10]
        q = (joined.writeStream.outputMode("append").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
    return (spark.table(name)
            .groupBy(F.col("l_user_id").alias("user_id"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("r_event_id").isNotNull().cast("long"))
                 .alias("n_matched"),
                 F.sum(F.col("r_event_id").isNull().cast("long"))
                 .alias("n_unmatched"),
                 F.round(F.coalesce(F.sum("r_value"), F.lit(0.0)), 4)
                 .alias("attributed"))
            .orderBy("user_id"))


def q151_shuffle_shards(spark, sf_dir):
    """Deterministic global shuffle + sharding for training export
    (operators/mldata.py shuffle_shards; the reproducible epoch-order
    step the reference's io/pytorch export hands off at): every
    document gets an md5-derived shard and intra-shard shuffle key —
    reproducible on any cluster/partitioning/retry, one shuffle total.
    The oracle replays the identical md5 arithmetic in DuckDB; per
    shard the row count, id sum, and the FIRST THREE doc_ids in
    shuffle order must match exactly (the head sample pins the ORDER,
    not just the partition assignment)."""
    from pixeltable_spark.operators.mldata import shuffle_shards

    docs = _df(spark, sf_dir, "documents").select("doc_id")
    out = shuffle_shards(docs, 8, "doc_id", seed=0)
    pair = F.struct(F.col("shuffle_key").alias("k"),
                    F.col("doc_id").alias("d"))
    return (out.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("doc_id").alias("id_sum"),
                 F.slice(F.transform(
                     F.array_sort(F.collect_list(pair)),
                     lambda s: s["d"]), 1, 3).alias("head_ids"))
            .orderBy("shard"))


def q152_dedup_segments(spark, sf_dir):
    """Within-document repetition removal (operators/text.py
    dedup_segments — the C4 "drop repeated segments inside a page"
    cleanup as a TRANSFORM, complementing the duplicate_line_stats
    measurements): keep each segment's first occurrence in order, here
    at word granularity so the synthetic single-line documents actually
    contain repeats. Pure JVM split/filter/array_distinct/array_join —
    map-only at any corpus size. The DuckDB oracle replays
    first-occurrence semantics via min(ordinal) per (doc, segment);
    the FULL deduplicated text must match byte-exact, plus the unique
    segment count."""
    from pixeltable_spark.operators.text import dedup_segments

    docs = _df(spark, sf_dir, "documents").select("doc_id", "text")
    segs = F.filter(F.split(F.col("text"), " "),
                    lambda s: F.trim(s) != "")
    return (docs.select(
        "doc_id",
        dedup_segments(F.col("text"), " ").alias("deduped"),
        F.size(F.array_distinct(segs)).alias("n_unique"))
        .orderBy("doc_id"))


def q153_kn_perplexity(spark, sf_dir):
    """Interpolated Kneser–Ney bigram LM + CCNet perplexity buckets
    (operators/ngram_lm.py — Wenzek et al. 2020's actual method: train
    on a reference slice, score every doc's perplexity, partition the
    corpus into head/middle/tail thirds). Train on doc_id % 5 == 0,
    vocab top-500, D=0.75; score ALL docs; NTILE(3) over the tie-free
    (ppl, doc_id) order. The DuckDB oracle replays the ENTIRE pipeline
    — tokenization, vocab selection with the count-desc/token-asc
    tie-break, <unk> mapping, bigram/context/continuation counts, the
    add-one continuation smoothing, the KN interpolation, perplexity,
    and the bucketing — so every count and every smoothed probability
    is value-verified end to end, not just the bucket shapes."""
    from pixeltable_spark.operators.ngram_lm import (kn_perplexity,
                                                     perplexity_buckets,
                                                     train_kn_bigram)

    docs = _df(spark, sf_dir, "documents").select("doc_id", "text")
    model = train_kn_bigram(docs.where(F.col("doc_id") % 5 == 0),
                            vocab_size=500, discount=0.75)
    scored = kn_perplexity(docs, model)
    b = perplexity_buckets(scored, n_buckets=3)
    return (b.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("ppl"), 4).alias("avg_ppl"),
                 F.round(F.min("ppl"), 4).alias("min_ppl"),
                 F.round(F.max("ppl"), 4).alias("max_ppl"),
                 F.min("doc_id").alias("min_doc"),
                 F.max("doc_id").alias("max_doc"))
            .orderBy("bucket"))


def q154_ndv_sketch(spark, sf_dir):
    """Manifest-resident HyperLogLog NDV sketches (catalog.py
    add_ndv_stats/approx_count_distinct + ndv.py): approximate
    COUNT(DISTINCT) answered from table METADATA — per-file sketches
    ride the footer-stats pass at commit, live MVCC rows only,
    register-max merged across every commit at read, zero data scan.
    The battery: an insert commit, a delete, and an update that
    rewrites the category column (leaving a live file set mixing
    untouched and rewritten commits), then estimates over both a
    high-cardinality key and a low-cardinality category. The DuckDB
    oracle replays the ESTIMATE bit-exactly — same md5 over the same
    canonical key bytes, same bucket/rho register fold (exact-integer
    indicator sum, one double conversion), same linear-counting
    correction — plus the exact distinct counts, so the sketch math,
    the MVCC live-row filtering, and the file-granular refresh through
    update/delete are all value-verified, not bounds-checked."""
    import tempfile

    import pixeltable_spark as pxt
    from pixeltable_spark.exprs import ColumnRef

    docs = _df(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("k"),
        F.concat(F.lit("c"), (F.col("doc_id") % 50).cast("string"))
         .alias("cat"))
    wh = tempfile.mkdtemp(prefix="pxt_q154_")
    cat = pxt.Catalog(spark, wh)
    t = cat.create_table("t", {"k": pxt.Int(False),
                               "cat": pxt.String(True)}, n_buckets=4)
    t.add_ndv_stats("k")
    t.add_ndv_stats("cat")
    t.insert(docs.where(F.col("k") % 3 != 2))                     # v1
    t.delete(where=ColumnRef("k", t.schema["k"]) % 7 == 0)        # v3
    t.update({"cat": "upd"},
             where=ColumnRef("k", t.schema["k"]) % 11 == 3)       # v4
    k_est = t.approx_count_distinct("k")
    cat_est = t.approx_count_distinct("cat")
    exact = t.df().agg(
        F.countDistinct("k").alias("k_exact"),
        F.countDistinct("cat").alias("cat_exact")).first()
    from pixeltable_spark.localframe import local_df
    return local_df(
        spark, [(int(k_est), int(exact["k_exact"]),
                 int(cat_est), int(exact["cat_exact"]))],
        "k_est long, k_exact long, cat_est long, cat_exact long")


def q155_kmv_overlap(spark, sf_dir):
    """KMV cross-corpus overlap estimation (operators/sketches.py —
    Beyer et al. 2007): distinct counts + union/intersection/Jaccard
    between two overlapping corpus slices (60% / 60% with a 20%-class
    overlap on doc_id) estimated from two k-minimum-hash summaries —
    each side pays one distinct-shuffle + TakeOrderedAndProject, the
    comparison is a driver fold over ≤ 2k hashes, and NO cross-corpus
    join ever runs (the contamination-estimate path for corpora too
    big to shuffle on the key). The DuckDB oracle replays the exact
    k-min hash sets (same md5 over the same canonical key bytes, ORDER
    BY/LIMIT k) and the same estimator arithmetic — every output
    double is bit-identical, not tolerance-checked."""
    from pixeltable_spark.operators.sketches import corpus_overlap

    docs = _df(spark, sf_dir, "documents").select("doc_id")
    a = docs.where(F.col("doc_id") % 10 < 6)
    b = docs.where(F.col("doc_id") % 10 >= 4)
    return corpus_overlap(a, b, "doc_id", k=512, kind="int")


def q156_stream_approx_distinct(spark, sf_dir):
    """Per-hour approximate distinct users as a STATEFUL STREAM with
    BOUNDED state (streaming/stateful.py approx_distinct_stream): one
    2 KB HyperLogLog register array per window instead of a seen-key
    set — O(1) state per window on an unbounded stream, the sketch
    contract shared with the manifest NDV layer (ndv.py). Register-max
    folding is order- and batch-split-invariant, so the availableNow
    replay's final per-window estimate equals the batch sketch over
    the same rows exactly; emissions collapse by max_by(est, seq)
    (last-wins — the linear-counting→raw branch crossing makes a
    plain max() subtly wrong). The DuckDB oracle replays the estimate
    bit-for-bit (same md5/bucket/rho fold grouped per hour, exact
    HUGEINT indicator sums) — a fourth streaming query with a full
    value oracle, and the first whose STATE is a sketch."""
    import uuid as _uuid

    from pyspark.sql import types as T

    from pixeltable_spark.streaming import approx_distinct_stream
    ts_type = _rp(spark, 
        f"{sf_dir}/events.parquet").schema["ts"].dataType
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", ts_type),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    raw = (spark.readStream.format("parquet").schema(schema)
           .option("pathGlobFilter", "events.parquet").load(sf_dir))
    if isinstance(ts_type, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    raw = raw.withColumn("wstart", F.date_trunc("hour", F.col("ts")))
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        est = approx_distinct_stream(raw.select("wstart", "user_id"),
                                     "user_id", "wstart", p=11,
                                     kind="int")
        name = "q156_hll_" + _uuid.uuid4().hex[:10]
        q = (est.writeStream.outputMode("update").format("memory")
             .queryName(name).trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
    return (spark.table(name).groupBy("wstart")
            .agg(F.max_by("approx_distinct", "seq")
                 .alias("approx_users"))
            .orderBy("wstart"))


def q157_count_min(spark, sf_dir):
    """Count-min sketch frequency estimation (operators/sketches.py
    cm_sketch/cm_estimate — Cormode & Muthukrishnan 2005): build a
    4x1024 counter grid over every token occurrence in the corpus
    (map-only bucket explode + one map-side-combined groupBy bounded
    by depth*width cells), then probe the top-10 tokens' frequencies
    from the 16 KB summary next to their exact counts. The DuckDB
    oracle rebuilds the identical grid (same md5 32-bit digest
    slices) and replays the min-over-rows estimates — integer-exact,
    and the CM guarantee est >= exact is visible in the output."""
    from pixeltable_spark.operators.sketches import cm_estimate, cm_sketch

    docs = _df(spark, sf_dir, "documents")
    toks = docs.where(F.col("text").isNotNull()).select(
        F.explode(F.expr(
            "regexp_extract_all(lower(text), '\\\\S+', 0)")).alias("tok"))
    sk = cm_sketch(toks, "tok", depth=4, width=1024, kind="str")
    cand = (toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("tok"))
            .limit(10).collect())
    rows = [(r["tok"], int(cm_estimate(sk, r["tok"], "str")),
             int(r["cnt"])) for r in cand]
    from pixeltable_spark.localframe import local_df
    return (local_df(spark, rows, "tok string, est long, exact long")
            .orderBy("tok"))


def q158_rollup_maintenance(spark, sf_dir):
    """Incrementally-maintained aggregate rollup under the hard gate
    (catalog.py Rollup / create_rollup — the TimescaleDB continuous-
    aggregate design; beyond-reference: the reference's views are
    row-wise only). Build a per-segment rollup over customers
    (count/sum/avg/min/max of acctbal), then drive the maintenance
    through the hard cases: an UPDATE that moves every BUILDING row
    into a new segment (old group shrinks via its PRE-update key, new
    group appears), a DELETE of negative balances (groups shrink or
    vanish), and an INSERT batch (existing + brand-new groups). Each
    commit recomputes ONLY the delta-affected groups (file-granular
    swap), yet must equal DuckDB's from-scratch aggregation of the
    replayed mutation history — both the FINAL state and the TIME-
    TRAVELED rollup at version 1 (MVCC intervals on rollup rows)."""
    import tempfile

    import pixeltable_spark as pxt
    from pixeltable_spark.exprs import ColumnRef

    cust = _rp(spark, f"{sf_dir}/customer.parquet")
    wh = tempfile.mkdtemp(prefix="pxt_q158_")
    cat = pxt.Catalog(spark, wh)
    t = cat.create_table("c", {"k": pxt.Int(False), "seg": pxt.String(True),
                               "bal": pxt.Float(True)}, n_buckets=4)
    t.insert(cust.select(
        F.col("c_custkey").cast("int").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("bal")))
    r = cat.create_rollup("seg_stats", t, ["seg"], {
        "n": ("count", None), "total": ("sum", "bal"),
        "avg_bal": ("avg", "bal"), "lo": ("min", "bal"),
        "hi": ("max", "bal")}, n_buckets=4)                       # r v1
    t.update({"seg": "MOVED"},
             where=ColumnRef("seg", t.schema["seg"]) == "BUILDING")
    t.delete(where=ColumnRef("bal", t.schema["bal"]) < 0.0)
    t.insert([{"k": 10_000_000 + i,
               "seg": ("FRESH" if i % 2 == 0 else "MOVED"),
               "bal": float(100 * i)} for i in range(50)])

    def fmt(df, tag):
        return df.select(
            F.lit(tag).alias("state"), "seg", "n",
            F.round("total", 2).alias("total"),
            F.round("avg_bal", 4).alias("avg_bal"),
            F.round("lo", 2).alias("lo"), F.round("hi", 2).alias("hi"))

    return (fmt(r.df(), "final")
            .unionByName(fmt(r.df(version=1), "v1"))
            .orderBy("state", "seg"))


def q159_component_rollup(spark, sf_dir):
    """The FULL incremental chain under the hard gate: documents table
    → token-chunk COMPONENT VIEW (DocumentSplitter iterator) →
    AGGREGATE ROLLUP of chunks per document (catalog.py Rollup over a
    View base — round 11). Mutations drive every propagation edge: an
    UPDATE rewrites some documents' text (their chunk count changes),
    a DELETE removes documents (their groups vanish), an INSERT adds
    documents with synthesized token counts (new groups) — each commit
    flows table → view (row-wise incremental) → rollup (delta-group
    incremental). DuckDB replays the token chunking in closed form
    (ceil(tokens/20)) over the replayed mutation history; the FINAL
    rollup and the TIME-TRAVELED v1 rollup must both match."""
    import tempfile

    import pixeltable_spark as pxt
    from pixeltable_spark.exprs import ColumnRef
    from pixeltable_spark.iterators import DocumentSplitter

    docs = (_df(spark, sf_dir, "documents")
            .orderBy("doc_id").limit(150)
            .where(F.length(F.trim(F.col("text"))) > 0))
    wh = tempfile.mkdtemp(prefix="pxt_q159_")
    cat = pxt.Catalog(spark, wh)
    t = cat.create_table("d", {"doc_id": pxt.Int(False),
                               "text": pxt.String(True)}, n_buckets=4)
    t.insert(docs.select("doc_id", "text"))
    chunks = cat.create_view("chunks", t, iterator=DocumentSplitter.create(
        document="text", separators="token_limit", limit=20))
    # component views key their rows by the BASE _rowid (+_pos), so
    # the per-document rollup groups by _rowid and joins doc_id back
    roll = cat.create_rollup("chunk_stats", chunks, ["_rowid"],
                             {"n_chunks": ("count", None)},
                             n_buckets=4)                          # r v1
    const45 = " ".join(f"w{i}" for i in range(45))     # 45 tokens
    t.update({"text": const45},
             where=ColumnRef("doc_id", t.schema["doc_id"]) % 5 == 3)
    t.delete(where=ColumnRef("doc_id", t.schema["doc_id"]) % 7 == 0)
    t.insert([{"doc_id": 100_000 + i,
               "text": " ".join(["tok"] * (i % 50 + 1))}
              for i in range(40)])

    def fmt(rdf, base_df, tag):
        return (rdf.join(base_df.select("_rowid", "doc_id"), on="_rowid")
                .select(F.lit(tag).alias("state"), "doc_id", "n_chunks"))

    return (fmt(roll.df(), t.df(), "final")
            .unionByName(fmt(roll.df(version=1), t.df(version=1), "v1"))
            .orderBy("state", "doc_id"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q02_project_arith": q02_project_arith,
        "q03_filter_compound": q03_filter_compound,
        "q04_join_agg": q04_join_agg,
        "q05_left_join": q05_left_join,
        "q06_order_limit_offset": q06_order_limit_offset,
        "q07_distinct": q07_distinct,
        "q08_top_suppliers": q08_top_suppliers,
        "q09_window_running": q09_window_running,
        "q10_topk_per_group": q10_topk_per_group,
        "q11_sample_fraction": q11_sample_fraction,
        "q12_sample_stratified": q12_sample_stratified,
        "q13_json_path": q13_json_path,
        "q14_string_funcs": q14_string_funcs,
        "q15_math_funcs": q15_math_funcs,
        "q16_timestamp_funcs": q16_timestamp_funcs,
        "q17_typecast": q17_typecast,
        "q18_in_between": q18_in_between,
        "q19_agg_stats": q19_agg_stats,
        "q20_semi_join": q20_semi_join,
        "q21_anti_join": q21_anti_join,
        "q22_sessionize": q22_sessionize,
        "q23_date_funcs": q23_date_funcs,
        "q24_higher_order_array": q24_higher_order_array,
        "q25_string_battery2": q25_string_battery2,
        "q26_rollup": q26_rollup,
        "q27_rank_lag": q27_rank_lag,
        "q30_dedup_exact": q30_dedup_exact,
        "q31_minhash_sigs": q31_minhash_sigs,
        "q32_minhash_lsh_pairs": q32_minhash_lsh_pairs,
        "q33_simhash": q33_simhash,
        "q34_ngram_jaccard": q34_ngram_jaccard,
        "q35_topk_cosine": q35_topk_cosine,
        "q36_ann_lsh": q36_ann_lsh,
        "q37_lsh_buckets": q37_lsh_buckets,
        "q38_embed_near_dup": q38_embed_near_dup,
        "q39_knn_join": q39_knn_join,
        "q40_lang_id": q40_lang_id,
        "q41_text_quality": q41_text_quality,
        "q42_token_stats": q42_token_stats,
        "q43_doc_chunks": q43_doc_chunks,
        "q44_image_meta": q44_image_meta,
        "q45_minhash_jaccard_est": q45_minhash_jaccard_est,
        "q46_token_histogram": q46_token_histogram,
        "q47_tfidf_top_term": q47_tfidf_top_term,
        "q48_custom_uda": q48_custom_uda,
        "q49_stream_windowed": q49_stream_windowed,
        "q50_llm_chat": q50_llm_chat,
        "q51_bbox_ops": q51_bbox_ops,
        "q52_sample_stratified_n": q52_sample_stratified_n,
        "q53_json_mapper_typed": q53_json_mapper_typed,
        "q54_provider_embeddings": q54_provider_embeddings,
        "q55_doc_sections": q55_doc_sections,
        "q56_json_typed_schema": q56_json_typed_schema,
        "q57_gemini_generate": q57_gemini_generate,
        "q58_whisper_segments": q58_whisper_segments,
        "q59_html_sections": q59_html_sections,
        "q60_stream_dedup": q60_stream_dedup,
        "q61_image_codec": q61_image_codec,
        "q62_audio_codec": q62_audio_codec,
        "q63_video_codec": q63_video_codec,
        "q64_pii_scrub": q64_pii_scrub,
        "q65_repetition_quality": q65_repetition_quality,
        "q66_contamination": q66_contamination,
        "q67_dup_clusters": q67_dup_clusters,
        "q68_jpeg_codec": q68_jpeg_codec,
        "q69_lm_quality": q69_lm_quality,
        "q70_pq_ann": q70_pq_ann,
        "q71_asof_join": q71_asof_join,
        "q72_simhash_neighbors": q72_simhash_neighbors,
        "q73_doc_packing": q73_doc_packing,
        "q74_line_dedup": q74_line_dedup,
        "q75_url_curation": q75_url_curation,
        "q76_dsir_score": q76_dsir_score,
        "q77_tile_stitch": q77_tile_stitch,
        "q78_bow_embed_search": q78_bow_embed_search,
        "q79_quality_classifier": q79_quality_classifier,
        "q80_mean_ap": q80_mean_ap,
        "q81_repeated_spans": q81_repeated_spans,
        "q82_gopher_filter": q82_gopher_filter,
        "q83_range_join": q83_range_join,
        "q84_mixture_sample": q84_mixture_sample,
        "q85_image_hash_dedup": q85_image_hash_dedup,
        "q86_audio_fingerprint_dedup": q86_audio_fingerprint_dedup,
        "q87_profile": q87_profile,
        "q88_semdedup": q88_semdedup,
        "q89_curation_pipeline": q89_curation_pipeline,
        "q90_cross_corpus_dedup": q90_cross_corpus_dedup,
        "q91_bpe_tokenize": q91_bpe_tokenize,
        "q92_lsa_semantic_dedup": q92_lsa_semantic_dedup,
        "q93_media_probe": q93_media_probe,
        "q94_weighted_jaccard": q94_weighted_jaccard,
        "q95_icws_pairs": q95_icws_pairs,
        "q96_cluster_representatives": q96_cluster_representatives,
        "q97_icon_audio_probe": q97_icon_audio_probe,
        "q98_gap_fill": q98_gap_fill,
        "q99_ohlc": q99_ohlc,
        "q100_bm25_search": q100_bm25_search,
        "q101_funnel": q101_funnel,
        "q102_cohort_retention": q102_cohort_retention,
        "q103_fuzzy_name_join": q103_fuzzy_name_join,
        "q104_rolling_zscore": q104_rolling_zscore,
        "q105_pivot": q105_pivot,
        "q106_melt": q106_melt,
        "q107_split_dataset": q107_split_dataset,
        "q108_negative_samples": q108_negative_samples,
        "q109_ranking_metrics": q109_ranking_metrics,
        "q110_standardize": q110_standardize,
        "q111_scd2": q111_scd2,
        "q112_histogram": q112_histogram,
        "q113_corr_matrix": q113_corr_matrix,
        "q114_funnel_stream": q114_funnel_stream,
        "q115_interval_join": q115_interval_join,
        "q116_ab_test": q116_ab_test,
        "q117_conversion_test": q117_conversion_test,
        "q118_keywords": q118_keywords,
        "q119_fk_audit": q119_fk_audit,
        "q120_weighted_sample": q120_weighted_sample,
        "q121_top_paths": q121_top_paths,
        "q122_transitions": q122_transitions,
        "q123_vocab_divergence": q123_vocab_divergence,
        "q124_char_entropy": q124_char_entropy,
        "q125_robust_scale": q125_robust_scale,
        "q126_twap": q126_twap,
        "q127_collocations": q127_collocations,
        "q128_rolling_corr": q128_rolling_corr,
        "q129_benford": q129_benford,
        "q130_c4_filter": q130_c4_filter,
        "q131_canonical_url": q131_canonical_url,
        "q132_curation_stream": q132_curation_stream,
        "q133_mvcc_mutations": q133_mvcc_mutations,
        "q134_view_propagation": q134_view_propagation,
        "q135_schema_evolution": q135_schema_evolution,
        "q136_pii_audit": q136_pii_audit,
        "q137_audio_structure": q137_audio_structure,
        "q138_video_structure": q138_video_structure,
        "q139_index_maintenance": q139_index_maintenance,
        "q140_sessionize_stream": q140_sessionize_stream,
        "q141_component_groupby": q141_component_groupby,
        "q142_merge_battery": q142_merge_battery,
        "q143_stream_ingest": q143_stream_ingest,
        "q144_similarity_expr": q144_similarity_expr,
        "q145_schema_time_travel": q145_schema_time_travel,
        "q146_serialized_query": q146_serialized_query,
        "q147_stream_stream_join": q147_stream_stream_join,
        "q148_audio_resample": q148_audio_resample,
        "q149_image_quality": q149_image_quality,
        "q150_stream_leftouter_join": q150_stream_leftouter_join,
        "q151_shuffle_shards": q151_shuffle_shards,
        "q152_dedup_segments": q152_dedup_segments,
        "q153_kn_perplexity": q153_kn_perplexity,
        "q154_ndv_sketch": q154_ndv_sketch,
        "q155_kmv_overlap": q155_kmv_overlap,
        "q156_stream_approx_distinct": q156_stream_approx_distinct,
        "q157_count_min": q157_count_min,
        "q158_rollup_maintenance": q158_rollup_maintenance,
        "q159_component_rollup": q159_component_rollup,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect) — generated where repetitive
# ---------------------------------------------------------------------------

_SHINGLE3_CTE = r"""
toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS words
         FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_filter(
           list_transform(words, (w, i) -> CASE WHEN i + 2 <= len(words)
             THEN words[i] || ' ' || words[i+1] || ' ' || words[i+2] END),
           x -> x IS NOT NULL))) AS shingle
  FROM toks)
"""

_WORDS_CTE = r"""
toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS words
         FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(words)) AS shingle FROM toks)
"""


def _minhash_sql(num_hashes: int) -> str:
    sigs = ", ".join(
        f"min(substr(md5(shingle), {8 * i + 1}, 8)) AS sig_{i}" for i in range(num_hashes)
    )
    return f"WITH {_SHINGLE3_CTE} SELECT doc_id, {sigs} FROM sh GROUP BY doc_id ORDER BY doc_id"


def _minhash_lsh_sql(num_hashes: int, bands: int) -> str:
    rpb = num_hashes // bands
    band_keys = ", ".join(
        "md5(" + " || '|' || ".join(f"sig_{b * rpb + r}" for r in range(rpb)) + f") AS key_{b}"
        for b in range(bands)
    )
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, key_{b} AS key FROM sigs" for b in range(bands)
    )
    sigs_inner = ", ".join(
        f"min(substr(md5(shingle), {8 * i + 1}, 8)) AS sig_{i}" for i in range(num_hashes)
    )
    return f"""
WITH {_SHINGLE3_CTE},
raw_sigs AS (SELECT doc_id, {sigs_inner} FROM sh GROUP BY doc_id),
sigs AS (SELECT doc_id, {band_keys} FROM raw_sigs),
banded AS ({unions})
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
ORDER BY id_a, id_b"""


def _simhash_sql(bits: int) -> str:
    sums = ", ".join(
        f"sum((ascii(substr(md5(shingle), {b + 1}, 1)) % 2) * 2 - 1) AS s_{b}"
        for b in range(bits)
    )
    val = " + ".join(f"(CASE WHEN s_{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return f"""
WITH {_WORDS_CTE},
sums AS (SELECT doc_id, {sums} FROM sh GROUP BY doc_id)
SELECT doc_id, CAST({val} AS BIGINT) AS simhash FROM sums ORDER BY doc_id"""


def _vec_lit() -> str:
    return "[" + ", ".join(str(x) for x in QUERY_VEC) + "]::DOUBLE[]"


_COS_CTE = f"""
s AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS e,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings),
q AS (SELECT {_vec_lit()} AS v),
cos AS (
  SELECT vec_id,
         round(sum(e * q.v[i]) /
               (sqrt(sum(e * e)) * sqrt(sum(q.v[i] * q.v[i]))), 6) AS cos
  FROM s, q GROUP BY vec_id)
"""


def _plane_weight_sql(p: int, idx: str) -> str:
    return f"((ascii(substr(md5('p{p}_' || CAST({idx} AS VARCHAR)), 1, 1)) % 2) * 2 - 1)"


def _bucket_sql(n_planes: int) -> str:
    """Per-vec_id bucket via projections onto md5-derived hyperplanes."""
    projs = ", ".join(
        f"sum(e * {_plane_weight_sql(p, 'i')}) AS proj_{p}" for p in range(n_planes)
    )
    val = " + ".join(f"(CASE WHEN proj_{p} > 0 THEN {1 << p} ELSE 0 END)" for p in range(n_planes))
    return f"""
bs AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS e,
              generate_subscripts(embedding, 1) AS i
       FROM embeddings),
bproj AS (SELECT vec_id, {projs} FROM bs GROUP BY vec_id),
bkt AS (SELECT vec_id, CAST({val} AS BIGINT) AS bkt FROM bproj)
"""


def _query_bucket(n_planes: int) -> int:
    qb = 0
    for p in range(n_planes):
        proj = 0.0
        for i, x in enumerate(QUERY_VEC, start=1):
            h = hashlib.md5(f"p{p}_{i}".encode()).hexdigest()
            proj += float(x) * (1 if (ord(h[0]) % 2) == 1 else -1)
        if proj > 0:
            qb |= 1 << p
    return qb


def _hexbyte_sql(texpr: str, pos: int) -> str:
    """int value of md5 hex byte at 1-based hex position pos (2 chars)."""
    d1 = f"(strpos('0123456789abcdef', substr(md5({texpr}), {pos}, 1)) - 1)"
    d2 = f"(strpos('0123456789abcdef', substr(md5({texpr}), {pos + 1}, 1)) - 1)"
    return f"({d1} * 16 + {d2})"




def _langid_ctes(src: str = "documents", id_col: str = "doc_id") -> str:
    """CTE chain replaying the model-based lang_id (operators/langid.py,
    hashed char 1/2/3-gram Naive Bayes) bit-for-bit in DuckDB via
    integer weight sums. Ends with `lgpred(id_col, lang_pred)`."""
    from pixeltable_spark.operators.langid import langid_ctes
    return langid_ctes(src, id_col)


# count-of-\S+-runs mirrors operators/text.py token_count (trim strips
# ASCII spaces only in both engines; '\n\t \n' must count 0, not 2)
_TOKCOUNT = r"len(regexp_extract_all(text, '\S+'))"
_STOPPAT = r"\b(" + "|".join(textops.LANG_STOPWORDS["en"]) + r")\b"


def _oracle_sql_base() -> dict[str, str]:
    md5_key_li = ("md5('{seed}___' || CAST(l_orderkey AS VARCHAR) || '___' || "
                  "CAST(l_linenumber AS VARCHAR))")
    # q87: long-format per-column profile — generated, one UNION ALL arm
    # per (column, stat); quantile_cont shares Spark percentile's linear
    # interpolation formula
    _prof_arms = []
    for _c in ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]:
        for _st, _ex in [
            ("n", f"count({_c})"),
            ("n_null", f"count(*) - count({_c})"),
            ("n_distinct", f"count(DISTINCT {_c})"),
            ("min", f"min({_c})"),
            ("max", f"max({_c})"),
            ("mean", f"avg({_c})"),
            ("p25", f"quantile_cont({_c}, 0.25)"),
            ("p50", f"quantile_cont({_c}, 0.50)"),
            ("p75", f"quantile_cont({_c}, 0.75)"),
        ]:
            _prof_arms.append(
                f"SELECT '{_c}' AS col_name, '{_st}' AS stat, "
                f"round(CAST({_ex} AS DOUBLE), 6) AS value FROM lineitem")
    _profile_sql = ("SELECT * FROM (\n" + "\nUNION ALL\n".join(_prof_arms)
                    + "\n) ORDER BY col_name, stat")
    return {
        "q87_profile": _profile_sql,
        "q90_cross_corpus_dedup": r"""
WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS words
              FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_filter(
           list_transform(words, (w, i) -> CASE WHEN i + 2 <= len(words)
             THEN words[i] || ' ' || words[i+1] || ' ' || words[i+2] END),
           x -> x IS NOT NULL))) AS shingle
  FROM toks),
raw_sigs AS (SELECT doc_id,
    min(substr(md5(shingle), 1, 8)) AS sig_0,
    min(substr(md5(shingle), 9, 8)) AS sig_1,
    min(substr(md5(shingle), 17, 8)) AS sig_2,
    min(substr(md5(shingle), 25, 8)) AS sig_3
  FROM sh GROUP BY doc_id),
keys AS (
  SELECT doc_id, md5(sig_0 || '|' || sig_1) AS key FROM raw_sigs
  UNION ALL
  SELECT doc_id, md5(sig_2 || '|' || sig_3) AS key FROM raw_sigs),
fp AS (SELECT doc_id,
              md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS f
       FROM documents),
ref_fp AS (SELECT DISTINCT f FROM fp WHERE doc_id % 10 = 0),
ref_keys AS (SELECT DISTINCT key FROM keys WHERE doc_id % 10 = 0)
SELECT d.doc_id,
       (fp.f IN (SELECT f FROM ref_fp)) AS dup_exact,
       coalesce((SELECT TRUE FROM keys k
                 WHERE k.doc_id = d.doc_id
                   AND k.key IN (SELECT key FROM ref_keys) LIMIT 1),
                FALSE) AS dup_near
FROM documents d JOIN fp ON d.doc_id = fp.doc_id
ORDER BY d.doc_id""",

        "q89_curation_pipeline": f"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     t -> t <> '') AS ts
  FROM documents),
m AS (
  SELECT doc_id,
         len(ts) AS n_words,
         CAST(list_reduce(list_transform(ts, t -> length(t)),
                          (x, y) -> x + y) AS DOUBLE)
           / greatest(len(ts), 1) AS mean_word_len,
         CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS DOUBLE)
           / greatest(len(ts), 1) AS symbol_ratio,
         CAST(len(list_filter(ts, t -> regexp_matches(t, '[a-z]')))
              AS DOUBLE) / greatest(len(ts), 1) AS alpha_word_frac,
         len(list_intersect(list_distinct(ts),
             ['the','be','to','of','and','that','have','with']))
           AS n_stopword_kinds
  FROM base),
grams AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, len(string_split_regex(lower(trim(text)), '\\s+')) - 2 + 2),
           i -> array_to_string(list_slice(
                  string_split_regex(lower(trim(text)), '\\s+'),
                  i, i + 1), ' '))) AS g
  FROM documents),
per_gram AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
rep AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_ngram_frac
        FROM per_gram GROUP BY doc_id),
lns AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents),
per_line AS (
  SELECT doc_id, line, count(*) AS c FROM lns
  WHERE trim(line) <> '' GROUP BY doc_id, line),
dl AS (SELECT doc_id, 1.0 - CAST(count(*) AS DOUBLE) / sum(c)
         AS dup_line_frac
       FROM per_line GROUP BY doc_id),
gopher AS (
  SELECT m.doc_id, m.n_words,
         ((m.n_words >= 10 AND m.n_words <= 100000)
          AND (m.mean_word_len >= 3.0 AND m.mean_word_len <= 10.0)
          AND m.symbol_ratio <= 0.1 AND m.alpha_word_frac >= 0.8
          AND coalesce(d.dup_line_frac, 0.0) <= 0.3
          AND coalesce(r.top_ngram_frac, 0.0) <= 0.2) AS g_keep
  FROM m LEFT JOIN rep r USING (doc_id) LEFT JOIN dl d USING (doc_id)),
{_langid_ctes()},
pred AS (SELECT doc_id, lang_pred FROM lgpred),
fp AS (SELECT doc_id,
              md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS f
       FROM documents),
reps AS (SELECT f, min(doc_id) AS rep_id FROM fp GROUP BY f),
pii AS (SELECT doc_id, regexp_matches(text,
          '(?:[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}})'
          || '|(?:\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b)'
          || '|(?:\\b(?:\\d{{1,3}}\\.){{3}}\\d{{1,3}}\\b)') AS p
       FROM documents),
q AS (
  SELECT doc_id,
         round((CASE WHEN {_TOKCOUNT} BETWEEN 20 AND 1000
                     THEN 0.5 ELSE 0.1 END)
               + least(CAST(len(regexp_extract_all(lower(text),
                       '{_STOPPAT}')) AS DOUBLE) / ({_TOKCOUNT}) * 2.0, 0.3)
               - least(CAST(length(text) - length(regexp_replace(text,
                       '[.,!?;:]', '', 'g')) AS DOUBLE)
                       / length(text) * 2.0, 0.2), 6) AS quality
  FROM documents)
SELECT g.doc_id, g.n_words, q.quality
FROM gopher g
JOIN pred USING (doc_id) JOIN pii USING (doc_id)
JOIN fp USING (doc_id) JOIN reps ON fp.f = reps.f
JOIN q USING (doc_id)
WHERE g.g_keep AND NOT pii.p AND pred.lang_pred = 'en'
  AND g.doc_id = reps.rep_id
ORDER BY g.doc_id""",

        "q01_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(l_orderkey) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
        "q02_project_arith": """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 4) AS disc_price,
       l_linenumber % 3 AS ln_mod,
       round(l_extendedprice / 100, 4) AS price_div,
       floor(l_extendedprice / 100) AS price_floordiv,
       round(l_discount * l_discount, 6) AS disc_sq
FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""",
        "q03_filter_compound": """
SELECT l_orderkey, l_linenumber, l_quantity, l_suppkey
FROM lineitem
WHERE (l_returnflag = 'R' OR l_linestatus = 'O')
  AND NOT (l_quantity < 5)
  AND l_discount BETWEEN 0.02 AND 0.08
  AND l_suppkey IN (1, 2, 3)
ORDER BY l_orderkey, l_linenumber""",
        "q04_join_agg": """
SELECT c_mktsegment,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",
        "q05_left_join": """
SELECT c_custkey, count(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey ORDER BY c_custkey""",
        "q06_order_limit_offset": """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 20 OFFSET 5""",
        "q07_distinct": """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
ORDER BY l_returnflag, l_linestatus""",
        "q08_top_suppliers": """
SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem GROUP BY l_suppkey
ORDER BY revenue DESC, l_suppkey LIMIT 5""",
        "q09_window_running": """
SELECT l_suppkey, l_orderkey, l_linenumber,
       sum(l_quantity) OVER (PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS UNBOUNDED PRECEDING) AS run_qty
FROM lineitem WHERE l_suppkey <= 3
ORDER BY l_suppkey, l_orderkey, l_linenumber""",
        "q10_topk_per_group": """
SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rk FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag
           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
  FROM lineitem) WHERE rk <= 3 ORDER BY l_returnflag, rk""",
        "q11_sample_fraction": f"""
SELECT l_orderkey, l_linenumber FROM lineitem
WHERE substr({md5_key_li.format(seed=42)}, 1, 16) <= '{pxt.SampleClause.fraction_to_md5_hex(0.2)}'
ORDER BY l_orderkey, l_linenumber""",
        "q12_sample_stratified": f"""
SELECT l_orderkey, l_linenumber, l_returnflag FROM (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         row_number() OVER (PARTITION BY l_returnflag
           ORDER BY {md5_key_li.format(seed=7)}) AS rn
  FROM lineitem) WHERE rn <= 20 ORDER BY l_orderkey, l_linenumber""",
        "q13_json_path": """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
ORDER BY event_id""",
        "q14_string_funcs": """
SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
       length(p_name) AS ln, strpos(p_name, 'a') - 1 AS pos,
       replace(p_type, ' ', '_') AS rep, substr(p_name, 1, 8) AS pre,
       upper(substr(p_type, 1, 1)) || lower(substr(p_type, 2)) AS cap
FROM part ORDER BY p_partkey LIMIT 50""",
        "q15_math_funcs": """
SELECT l_orderkey, l_linenumber,
       round(abs(l_discount - 0.05), 6) AS a,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS c,
       CAST(floor(l_quantity / 7) AS BIGINT) AS f,
       round(sqrt(l_extendedprice), 6) AS s,
       round(exp(l_discount), 6) AS e,
       round(ln(l_extendedprice), 6) AS l
FROM lineitem WHERE l_orderkey < 50 ORDER BY l_orderkey, l_linenumber""",
        "q16_timestamp_funcs": """
SELECT CAST(month(ts) AS BIGINT) AS month, event_type,
       count(event_id) AS n, round(avg(value), 6) AS avg_val
FROM events GROUP BY month(ts), event_type ORDER BY 1, 2""",
        "q17_typecast": """
SELECT l_orderkey, l_linenumber,
       CAST(trunc(l_quantity) AS BIGINT) AS qty_int,
       CAST(l_orderkey AS VARCHAR) AS key_str,
       CAST(l_linenumber AS DOUBLE) AS ln_float
FROM lineitem WHERE l_orderkey < 30 ORDER BY l_orderkey, l_linenumber""",
        "q18_in_between": """
SELECT o_orderstatus, count(o_orderkey) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_totalprice BETWEEN 50000.0 AND 200000.0
GROUP BY o_orderstatus ORDER BY o_orderstatus""",
        "q19_agg_stats": """
SELECT l_returnflag, count(l_orderkey) AS n,
       count(DISTINCT l_suppkey) AS nd_supp,
       round(stddev(l_quantity), 6) AS sd_qty,
       round(avg(l_quantity), 6) AS avg_qty,
       min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
        "q20_semi_join": """
SELECT count(c_custkey) AS n FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
        "q21_anti_join": """
SELECT count(c_custkey) AS n FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
        "q22_sessionize": """
WITH x AS (
  SELECT user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events)
SELECT user_id,
       CAST(sum(CASE WHEN prev IS NULL OR us - prev > 1800 * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM x GROUP BY user_id ORDER BY user_id""",
        "q23_date_funcs": """
SELECT l_orderkey, l_linenumber,
       strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_date,
       CAST(year(l_shipdate) AS BIGINT) AS y,
       CAST(month(l_shipdate) AS BIGINT) AS m,
       CAST(isodow(CAST(l_shipdate AS DATE)) - 1 AS BIGINT) AS wd,
       strftime(CAST(l_shipdate AS DATE) + INTERVAL 7 DAY, '%Y-%m-%d') AS plus_week
FROM lineitem WHERE l_orderkey < 40 ORDER BY l_orderkey, l_linenumber""",
        "q24_higher_order_array": r"""
WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents)
SELECT doc_id, len(words) AS n_words, upper(words[1]) AS first_upper,
       list_max(list_transform(words, x -> length(x))) AS longest,
       len(list_filter(words, x -> length(x) > 4)) AS n_long
FROM w ORDER BY doc_id""",
        "q25_string_battery2": """
SELECT p_partkey,
       CAST((length(p_name) - length(replace(p_name, 'a', ''))) AS BIGINT) AS cnt_a,
       starts_with(p_type, 'S') AS sw,
       regexp_matches(p_name, '[aeiou]{2}') AS cre,
       lpad(p_brand, 12, ' ') AS lp,
       p_brand || p_brand AS dup
FROM part ORDER BY p_partkey LIMIT 100""",
        "q26_rollup": """
SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
        "q27_rank_lag": """
SELECT o_custkey, o_orderkey,
       rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS rk,
       lag(o_totalprice) OVER (PARTITION BY o_custkey
         ORDER BY o_totalprice, o_orderkey) AS prev
FROM orders WHERE o_custkey < 100 ORDER BY o_custkey, o_orderkey""",
        "q30_dedup_exact": r"""
SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
       count(*) AS n_dups, min(doc_id) AS rep_id
FROM documents GROUP BY 1 ORDER BY fp""",
        "q31_minhash_sigs": _minhash_sql(4),
        "q32_minhash_lsh_pairs": _minhash_lsh_sql(4, 2),
        "q33_simhash": _simhash_sql(16),
        "q34_ngram_jaccard": f"""
WITH {_SHINGLE3_CTE},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       round(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.2
ORDER BY id_a, id_b""",
        "q35_topk_cosine": f"""
WITH {_COS_CTE}
SELECT vec_id, cos FROM cos ORDER BY cos DESC, vec_id LIMIT 20""",
        "q36_ann_lsh": f"""
WITH {_COS_CTE}, {_bucket_sql(4).strip().rstrip()}
SELECT c.vec_id, c.cos FROM cos c JOIN bkt ON bkt.vec_id = c.vec_id
WHERE bkt.bkt = {_query_bucket(4)}
ORDER BY c.cos DESC, c.vec_id LIMIT 10""",
        "q37_lsh_buckets": f"""
WITH {_bucket_sql(4).strip()}
SELECT bkt, count(*) AS n_vectors FROM bkt GROUP BY bkt ORDER BY bkt""",
        "q38_embed_near_dup": """
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
           FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.ve, b.ve) /
             (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve))), 6) AS cos
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.ve, b.ve) /
       (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve))), 6) >= 0.35
ORDER BY id_a, id_b""",
        "q39_knn_join": """
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
           FROM embeddings),
pairs AS (
  SELECT a.vec_id AS lid, b.vec_id AS rid,
         round(list_dot_product(a.ve, b.ve) /
               (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve))), 6) AS cos
  FROM v a JOIN v b ON a.vec_id < 20),
ranked AS (
  SELECT lid, rid, cos,
         row_number() OVER (PARTITION BY lid ORDER BY cos DESC, rid) AS rk
  FROM pairs)
SELECT lid, rid, cos, rk FROM ranked WHERE rk <= 3 ORDER BY lid, rk""",
        "q40_lang_id": f"""
WITH {_langid_ctes()}
SELECT lang_pred, count(*) AS n FROM lgpred
GROUP BY lang_pred ORDER BY lang_pred""",
        "q41_text_quality": f"""
WITH m AS (
  SELECT doc_id,
         {_TOKCOUNT} AS n_tokens,
         CASE WHEN length(text) > 0 THEN
           CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
             / length(text) ELSE 0.0 END AS praw,
         CASE WHEN ({_TOKCOUNT}) > 0 THEN
           CAST(len(regexp_extract_all(lower(text), '{_STOPPAT}')) AS DOUBLE)
             / ({_TOKCOUNT}) ELSE 0.0 END AS sraw
  FROM documents)
SELECT doc_id, n_tokens, round(praw, 6) AS punct_r, round(sraw, 6) AS stop_r,
       round((CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 0.5 ELSE 0.1 END)
             + least(sraw * 2.0, 0.3) - least(praw * 2.0, 0.2), 6) AS quality
FROM m ORDER BY doc_id""",
        "q42_token_stats": f"""
SELECT source, lang, count(*) AS docs,
       round(avg({_TOKCOUNT}), 4) AS avg_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY source, lang ORDER BY source, lang""",
        "q43_doc_chunks": r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents),
starts AS (
  SELECT doc_id, words, unnest(range(0, len(words), 40)) AS start_token,
         generate_subscripts(range(0, len(words), 40), 1) - 1 AS pos
  FROM toks)
SELECT doc_id, CAST(pos AS BIGINT) AS pos, CAST(start_token AS BIGINT) AS start_token,
       CAST(least(50, len(words) - start_token) AS BIGINT) AS n_chunk_tokens,
       array_to_string(words[start_token + 1 : start_token + 50], ' ') AS chunk
FROM starts ORDER BY doc_id, pos""",
        "q45_minhash_jaccard_est": f"""
WITH {_SHINGLE3_CTE},
raw_sigs AS (SELECT doc_id,
    min(substr(md5(shingle), 1, 8)) AS sig_0,
    min(substr(md5(shingle), 9, 8)) AS sig_1,
    min(substr(md5(shingle), 17, 8)) AS sig_2,
    min(substr(md5(shingle), 25, 8)) AS sig_3
  FROM sh GROUP BY doc_id),
sigs AS (SELECT doc_id, md5(sig_0 || '|' || sig_1) AS key_0,
                md5(sig_2 || '|' || sig_3) AS key_1 FROM raw_sigs),
banded AS (SELECT doc_id, 0 AS band, key_0 AS key FROM sigs
           UNION ALL SELECT doc_id, 1, key_1 FROM sigs),
pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM banded a JOIN banded b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT id_a, id_b,
       ((CASE WHEN sa.sig_0 = sb.sig_0 THEN 1 ELSE 0 END)
        + (CASE WHEN sa.sig_1 = sb.sig_1 THEN 1 ELSE 0 END)
        + (CASE WHEN sa.sig_2 = sb.sig_2 THEN 1 ELSE 0 END)
        + (CASE WHEN sa.sig_3 = sb.sig_3 THEN 1 ELSE 0 END)) / 4.0 AS jaccard_est
FROM pairs JOIN raw_sigs sa ON sa.doc_id = id_a
JOIN raw_sigs sb ON sb.doc_id = id_b
ORDER BY id_a, id_b""",
        "q46_token_histogram": r"""
WITH w AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
           FROM documents)
SELECT token, count(*) AS freq FROM w GROUP BY token
ORDER BY freq DESC, token LIMIT 20""",
        "q47_tfidf_top_term": r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS score
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
  FROM scored)
SELECT doc_id, term, score FROM ranked WHERE rn = 1 ORDER BY doc_id""",
        "q48_custom_uda": """
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price,
       count(l_orderkey) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
        "q49_stream_windowed": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type, count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""",
        "q50_llm_chat": """
SELECT doc_id,
       'response[' || substr(md5('fake-chat-1|' || text), 1, 12) || ']' AS response
FROM documents ORDER BY doc_id""",
        "q52_sample_stratified_n": f"""
WITH counts AS (
  SELECT l_returnflag AS s, count(*) AS c FROM lineitem GROUP BY 1),
tot AS (SELECT sum(c) AS n FROM counts),
alloc AS (
  SELECT s, floor(100.0 * c / tot.n) AS fq,
         100.0 * c / tot.n - floor(100.0 * c / tot.n) AS rem
  FROM counts, tot),
base AS (SELECT sum(fq) AS used FROM alloc),
ranked AS (
  SELECT s, fq, row_number() OVER (ORDER BY rem DESC, s) AS rk FROM alloc),
quota AS (
  SELECT s, CAST(fq + CASE WHEN rk <= 100 - base.used THEN 1 ELSE 0 END AS BIGINT) AS q
  FROM ranked, base),
keyed AS (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY
           {("md5('11___' || CAST(l_orderkey AS VARCHAR) || '___' || CAST(l_linenumber AS VARCHAR))")}) AS rn
  FROM lineitem)
SELECT k.l_orderkey, k.l_linenumber, k.l_returnflag
FROM keyed k JOIN quota ON quota.s = k.l_returnflag
WHERE k.rn <= quota.q
ORDER BY k.l_orderkey, k.l_linenumber""",
        "q51_bbox_ops": """
WITH boxes AS (
  SELECT l_orderkey, l_linenumber,
         l_quantity AS ax1, l_discount * 100 AS ay1,
         l_quantity + 20 AS ax2, l_discount * 100 + 15 AS ay2,
         l_quantity + 10 AS bx1, l_discount * 100 + 5 AS by1,
         l_quantity + 30 AS bx2, l_discount * 100 + 20 AS by2
  FROM lineitem WHERE l_orderkey < 60)
SELECT l_orderkey, l_linenumber,
       round(greatest(ax2 - ax1, 0) * greatest(ay2 - ay1, 0), 4) AS area_a,
       round(
         (greatest(least(ax2, bx2) - greatest(ax1, bx1), 0)
          * greatest(least(ay2, by2) - greatest(ay1, by1), 0))
         / (greatest(ax2 - ax1, 0) * greatest(ay2 - ay1, 0)
            + greatest(bx2 - bx1, 0) * greatest(by2 - by1, 0)
            - greatest(least(ax2, bx2) - greatest(ax1, bx1), 0)
              * greatest(least(ay2, by2) - greatest(ay1, by1), 0)), 6) AS iou,
       round(least(greatest(ax2, 0), 25.0), 4) AS x2_clipped
FROM boxes ORDER BY l_orderkey, l_linenumber""",
        "q44_image_meta": f"""
SELECT doc_id,
       64 + {_hexbyte_sql('text', 1)} % 192 AS width,
       64 + {_hexbyte_sql('text', 3)} % 192 AS height,
       CASE {_hexbyte_sql('text', 5)} % 3 WHEN 0 THEN 'RGB' WHEN 1 THEN 'RGBA'
            ELSE 'L' END AS mode,
       octet_length(encode(text)) AS n_bytes
FROM documents ORDER BY doc_id""",
        "q53_json_mapper_typed": r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents)
SELECT doc_id,
       CAST(length(words[1]) AS BIGINT) AS l0,
       CAST(length(words[2]) AS BIGINT) AS l1,
       CAST(length(words[3]) AS BIGINT) AS l2,
       CAST(length(words[4]) AS BIGINT) AS l3
FROM w WHERE len(words) >= 4 ORDER BY doc_id""",
        "q54_provider_embeddings": f"""
WITH b AS (
  SELECT doc_id,
         {', '.join(f"({_hexbyte_sql(chr(39) + 'oracle-emb|' + chr(39) + ' || text', 2 * i + 1)} - 127.5) / 127.5 AS r{i}" for i in range(16))}
  FROM documents),
n AS (SELECT doc_id, sqrt({' + '.join(f'r{i}*r{i}' for i in range(16))}) AS nm,
             r0, r7 FROM b)
SELECT doc_id, round(r0 / nm, 6) AS e0, round(r7 / nm, 6) AS e7
FROM n ORDER BY doc_id""",
        "q55_doc_sections": r"""
WITH s AS (
  SELECT doc_id,
         string_split(
           regexp_replace(
             regexp_replace(text, '\n\s*\n', chr(1), 'g'),
             '([.!?])\s+', '\1' || chr(1), 'g'),
           chr(1)) AS parts
  FROM documents),
u AS (
  SELECT doc_id, trim(part) AS part, ord
  FROM (SELECT doc_id, unnest(parts) AS part,
               unnest(range(1, len(parts) + 1)) AS ord FROM s)
  WHERE length(trim(part)) > 0)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS BIGINT) AS pos,
       CAST(length(part) AS BIGINT) AS n_chars,
       substr(part, 1, 20) AS head20
FROM u ORDER BY doc_id, pos""",
        "q56_json_typed_schema": """
WITH x AS (
  SELECT event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
  FROM events)
SELECT event_id, k_val, k_val * 2 + 1 AS k2
FROM x WHERE ((k_val % 7) + 7) % 7 = 0 ORDER BY event_id""",
        "q57_gemini_generate": f"""
SELECT doc_id,
       'response[' || substr(md5('gem-oracle|' || text || '|null'), 1, 12) || ']' AS resp,
       CAST({_TOKCOUNT} + 1 AS BIGINT) AS total_tokens
FROM documents ORDER BY doc_id""",
        "q58_whisper_segments": """
SELECT doc_id,
       'en' AS lang,
       ' segment[' || substr(md5(md5(text) || '|base.en|0'), 1, 12) || ']' AS seg0,
       ' segment[' || substr(md5(md5(text) || '|base.en|1'), 1, 12) || ']' AS seg1
FROM documents ORDER BY doc_id""",
        "q60_stream_dedup": """
SELECT DISTINCT user_id, event_type
FROM events ORDER BY user_id, event_type""",
        "q61_image_codec": """
SELECT doc_id,
       CAST(4 + doc_id % 13 AS INTEGER) AS w,
       CAST(3 + doc_id % 7 AS INTEGER) AS h,
       'RGB' AS m,
       CAST(3 AS INTEGER) AS rw,
       CAST(2 AS INTEGER) AS rh,
       CAST(doc_id % 256 AS INTEGER) AS px,
       0.0 AS ent
FROM documents ORDER BY doc_id""",
        "q62_audio_codec": """
SELECT doc_id,
       4000 + 1000 * (doc_id % 3) AS rate,
       (4000 + 1000 * (doc_id % 3)) // 2 + doc_id % 5 AS n,
       (4000 + 1000 * (doc_id % 3)) // 4 AS clip_n,
       CAST(2 AS BIGINT) AS peak_ratio
FROM documents ORDER BY doc_id""",
        "q128_rolling_corr": """
WITH w AS (
  SELECT user_id, ts,
         corr(CAST(epoch_us(ts) AS DOUBLE), value) OVER win AS c,
         count(value) OVER win AS n_window
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 49 PRECEDING AND CURRENT ROW))
SELECT user_id, ts,
       round(CASE WHEN n_window >= 10 THEN c END, 6) AS corr,
       n_window
FROM w ORDER BY user_id, ts""",
        "q130_c4_filter": _q130_oracle(),
        "q132_curation_stream": _q132_oracle(),
        # q133/q134: DuckDB replays the MUTATION HISTORY as relational
        # algebra over the same input — the engine's MVCC/incremental
        # answer must equal the from-scratch evaluation, cell-exact
        "q133_mvcc_mutations": """
WITH v1 AS (SELECT CAST(c_custkey AS INT) AS k,
                   CAST(c_acctbal AS DOUBLE) AS v, c_mktsegment AS s
            FROM customer),
v2 AS (SELECT k, CASE WHEN s = 'BUILDING' THEN v + 100.0 ELSE v END AS v, s
       FROM v1),
final AS (SELECT * FROM v2 WHERE NOT (v > 9000.0))
SELECT f.k, f.v AS v_final, f.s, o.v AS v_orig
FROM final f JOIN v1 o USING (k) ORDER BY f.k""",
        "q134_view_propagation": """
WITH base0 AS (SELECT CAST(o_orderkey AS INT) AS k,
                      CAST(o_totalprice AS DOUBLE) AS p, o_orderstatus AS st
               FROM orders),
upd AS (SELECT k, CASE WHEN st = 'F' THEN p + 1000.0 ELSE p END AS p, st
        FROM base0),
final_base AS (SELECT * FROM upd WHERE k % 10 <> 0)
SELECT k, p, st, p * 0.5 AS margin
FROM final_base WHERE p >= 150000.0 ORDER BY k""",
        "q135_schema_evolution": """
SELECT CAST(n_nationkey AS INT) AS nk, n_name AS nation_name,
       CAST(n_regionkey AS INT) AS rk,
       CAST(n_regionkey AS INT) * 10 AS rk10
FROM nation ORDER BY nk""",
        "q136_pii_audit": _q136_oracle(),
        "q137_audio_structure": _q137_oracle(),
        "q138_video_structure": _q138_oracle(),
        # q139: exact top-k over ALL embeddings — catches an index that
        # missed post-creation inserts (half the corpus would be absent)
        "q139_index_maintenance": f"""
WITH {_COS_CTE}
SELECT CAST(vec_id AS INT) AS vid, cos FROM cos
ORDER BY cos DESC, vid LIMIT 20""",
        "q131_canonical_url": _q131_oracle(),
        "q129_benford": """
WITH d AS (SELECT regexp_extract(
             CAST(abs(CAST(l_extendedprice AS DOUBLE)) AS VARCHAR),
             '[1-9]', 0) AS digit
           FROM lineitem
           WHERE abs(CAST(l_extendedprice AS DOUBLE)) > 0),
c AS (SELECT CAST(digit AS INT) AS digit, count(*) AS n
      FROM d WHERE digit <> '' GROUP BY 1),
spine AS (SELECT CAST(g AS INT) AS digit FROM generate_series(1, 9) AS t(g)),
j AS (SELECT spine.digit, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
      FROM spine LEFT JOIN c ON spine.digit = c.digit),
t AS (SELECT sum(n) AS total FROM j),
s AS (SELECT digit, n, total,
             CASE WHEN total > 0 THEN n / total END AS freq,
             log10(1.0 + 1.0 / digit) AS benford
      FROM j, t)
SELECT digit, n, round(freq, 6) AS freq, round(benford, 6) AS benford,
       CASE WHEN total > 0 THEN
         round(sum((n - total * benford) * (n - total * benford)
                   / (total * benford)) OVER (), 6) END AS chi2
FROM s ORDER BY digit""",
        "q127_collocations": r"""
WITH toks AS (SELECT list_filter(
                string_split_regex(lower(trim(text)), '\s+'),
                x -> x <> '') AS w
              FROM documents),
bi AS (SELECT unnest(list_transform(
         generate_series(1, len(w) - 1),
         i -> {'a': w[i], 'b': w[i + 1]})) AS p
       FROM toks),
pairs AS (SELECT p.a AS a, p.b AS b, count(*) AS n_ab
          FROM bi GROUP BY 1, 2),
l AS (SELECT a, sum(n_ab) AS n_a FROM pairs GROUP BY 1),
r AS (SELECT b, sum(n_ab) AS n_b FROM pairs GROUP BY 1),
t AS (SELECT sum(n_ab) AS n_pairs FROM pairs),
scored AS (SELECT pairs.a, pairs.b, pairs.n_ab,
                  round(ln(CAST(t.n_pairs * pairs.n_ab AS DOUBLE)
                           / (l.n_a * r.n_b)), 6) AS pmi
           FROM pairs JOIN l USING (a) JOIN r USING (b) CROSS JOIN t
           WHERE pairs.n_ab >= 5)
SELECT a, b, n_ab, pmi,
       CAST(row_number() OVER (ORDER BY pmi DESC, a, b) AS INT) AS rnk
FROM scored QUALIFY rnk <= 20 ORDER BY rnk""",
        "q125_robust_scale": """
WITH f AS (SELECT * FROM lineitem WHERE l_orderkey < 5000),
st AS (SELECT l_returnflag,
              quantile_cont(l_quantity, 0.5) AS med_q,
              quantile_cont(l_quantity, 0.75)
                - quantile_cont(l_quantity, 0.25) AS iqr_q,
              quantile_cont(l_extendedprice, 0.5) AS med_p,
              quantile_cont(l_extendedprice, 0.75)
                - quantile_cont(l_extendedprice, 0.25) AS iqr_p
       FROM f GROUP BY 1)
SELECT f.l_orderkey, f.l_linenumber, f.l_returnflag,
       round(CASE WHEN iqr_q > 0
                  THEN (l_quantity - med_q) / iqr_q END, 6) AS qty_r,
       round(CASE WHEN iqr_p > 0
                  THEN (l_extendedprice - med_p) / iqr_p END, 6)
         AS price_r
FROM f JOIN st USING (l_returnflag)
ORDER BY l_orderkey, l_linenumber""",
        "q126_twap": """
WITH s AS (SELECT user_id,
                  CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)
                    AS bucket,
                  epoch_us(ts) AS us, value
           FROM events),
d AS (SELECT *,
             coalesce(lead(us) OVER (PARTITION BY user_id, bucket
                                     ORDER BY us),
                      (bucket + 21600) * 1000000) - us AS dur
      FROM s)
SELECT user_id, bucket,
       round(CASE WHEN sum(dur) > 0
                  THEN sum(value * dur) / sum(dur) END, 6) AS twap,
       count(*) AS n
FROM d GROUP BY 1, 2 ORDER BY user_id, bucket""",
        "q124_char_entropy": """
WITH ch AS (SELECT doc_id, length(text) AS n,
                   unnest(string_split(text, '')) AS c
            FROM documents),
cc AS (SELECT doc_id, c, count(*) AS cnt, first(n) AS n
       FROM ch GROUP BY doc_id, c),
pd AS (SELECT doc_id,
              round(sum(-(cnt / CAST(n AS DOUBLE))
                        * ln(cnt / CAST(n AS DOUBLE))), 6) AS entropy
       FROM cc GROUP BY doc_id)
SELECT d.doc_id, coalesce(length(d.text), 0) AS n_chars,
       coalesce(pd.entropy, 0.0) AS entropy,
       coalesce(pd.entropy, 0.0) < 2.0 AS is_low
FROM documents d LEFT JOIN pd USING (doc_id) ORDER BY d.doc_id""",
        "q121_top_paths": """
WITH l AS (SELECT user_id,
                  list(event_type ORDER BY ts, event_id) AS types
           FROM events GROUP BY 1),
g AS (SELECT unnest(CASE WHEN len(types) >= 3 THEN
        list_transform(generate_series(1, len(types) - 2),
                       i -> array_to_string(types[i:i+2], '>'))
      ELSE []::VARCHAR[] END) AS path FROM l),
c AS (SELECT path, count(*) AS n FROM g GROUP BY 1)
SELECT path, n,
       CAST(row_number() OVER (ORDER BY n DESC, path) AS INT) AS rnk
FROM c QUALIFY rnk <= 10 ORDER BY rnk""",
        "q122_transitions": """
WITH p AS (SELECT event_type AS cur,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS nxt
           FROM events),
c AS (SELECT cur, nxt, count(*) AS n FROM p
      WHERE nxt IS NOT NULL GROUP BY 1, 2)
SELECT cur, nxt, n,
       round(n / sum(n) OVER (PARTITION BY cur), 6) AS prob
FROM c ORDER BY cur, nxt""",
        "q123_vocab_divergence": r"""
WITH ta AS (SELECT unnest(list_filter(
              string_split_regex(lower(trim(text)), '\s+'),
              x -> x <> '')) AS term
            FROM documents WHERE lang = 'en'),
tb AS (SELECT unnest(list_filter(
         string_split_regex(lower(trim(text)), '\s+'),
         x -> x <> '')) AS term
       FROM documents WHERE lang = 'de'),
ca AS (SELECT term, count(*) AS ca FROM ta GROUP BY 1),
cb AS (SELECT term, count(*) AS cb FROM tb GROUP BY 1),
j AS (SELECT coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
      FROM ca FULL JOIN cb USING (term)),
t AS (SELECT sum(ca) AS tokens_a, sum(cb) AS tokens_b,
             count(CASE WHEN ca > 0 THEN 1 END) AS vocab_a,
             count(CASE WHEN cb > 0 THEN 1 END) AS vocab_b,
             count(*) AS vocab_union FROM j),
s AS (SELECT (ca + 0.5) / (tokens_a + 0.5 * vocab_union) AS p,
             (cb + 0.5) / (tokens_b + 0.5 * vocab_union) AS q
      FROM j, t)
SELECT round(sum(0.5 * p * ln(p / ((p + q) / 2.0))
               + 0.5 * q * ln(q / ((p + q) / 2.0))), 6)
         AS js_divergence,
       (SELECT CAST(tokens_a AS BIGINT) FROM t) AS tokens_a,
       (SELECT CAST(tokens_b AS BIGINT) FROM t) AS tokens_b,
       (SELECT vocab_a FROM t) AS vocab_a,
       (SELECT vocab_b FROM t) AS vocab_b,
       (SELECT vocab_union FROM t) AS vocab_union
FROM s""",
        "q120_weighted_sample": """
WITH k AS (SELECT doc_id, source, n_chars,
  ln((('0x' || substr(md5('0___' || doc_id), 1, 13))::BIGINT + 1.0)
     / 4503599627370496.0) / CAST(n_chars AS DOUBLE) AS key
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
SELECT doc_id, source, n_chars FROM (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY key DESC) AS r FROM k)
WHERE r <= 20 ORDER BY source, doc_id""",
        "q117_conversion_test": """
WITH per_user AS (SELECT user_id,
                         max(event_type = 'purchase' AND value > 190)
                           AS converted
                  FROM events GROUP BY 1),
a AS (SELECT
  count(*) FILTER (WHERE user_id % 2 = 0) AS n_c,
  count(*) FILTER (WHERE user_id % 2 = 1) AS n_t,
  count(*) FILTER (WHERE user_id % 2 = 0 AND converted) AS succ_c,
  count(*) FILTER (WHERE user_id % 2 = 1 AND converted) AS succ_t
  FROM per_user),
s AS (SELECT *,
  CAST(succ_c AS DOUBLE) / n_c AS p_c,
  CAST(succ_t AS DOUBLE) / n_t AS p_t,
  CAST(succ_c + succ_t AS DOUBLE) / (n_c + n_t) AS pool
  FROM a),
zt AS (SELECT *,
  (p_t - p_c) / sqrt(pool * (1.0 - pool) * (1.0 / n_c + 1.0 / n_t))
    AS z FROM s),
e AS (SELECT *, abs(z) / 1.4142135623730951 AS x FROM zt),
u AS (SELECT *, 1.0 / (1.0 + 0.3275911 * x) AS t FROM e),
ph AS (SELECT *,
  1.0 - ((((((0.0 + 1.061405429) * t + -1.453152027) * t
            + 1.421413741) * t + -0.284496736) * t
          + 0.254829592) * t) * exp(-(x * x)) AS erfv
  FROM u)
SELECT n_c, n_t, succ_c, succ_t,
       round(p_c, 6) AS rate_c, round(p_t, 6) AS rate_t,
       round(p_t - p_c, 6) AS diff, round(z, 6) AS z_stat,
       round(2.0 * (1.0 - 0.5 * (1.0 + erfv)), 6) AS p_value
FROM ph""",
        "q118_keywords": r"""
WITH toks AS (SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS words
              FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM (SELECT doc_id, unnest(words) AS term FROM toks)
       WHERE term <> '' GROUP BY 1, 2),
nd AS (SELECT count(*) AS n FROM documents),
dfq AS (SELECT term, count(*) AS dft FROM tf GROUP BY 1
        HAVING count(*) >= 2
           AND count(*) <= (SELECT CAST(floor(0.6 * n) AS BIGINT)
                            FROM nd)),
scored AS (SELECT tf.doc_id, tf.term,
                  round(tf.tf * ln(CAST(nd.n AS DOUBLE) / dfq.dft), 6)
                    AS score
           FROM tf JOIN dfq USING (term) CROSS JOIN nd)
SELECT doc_id, term, score,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS INT) AS rnk
FROM scored QUALIFY rnk <= 3 AND doc_id < 200
ORDER BY doc_id, rnk""",
        "q119_fk_audit": """
WITH pk AS (SELECT DISTINCT c_custkey FROM customer
            WHERE c_mktsegment = 'BUILDING'),
v AS (SELECT count(*) AS violations FROM events e
      WHERE e.user_id IS NOT NULL
        AND e.user_id NOT IN (SELECT c_custkey FROM pk)),
t AS (SELECT count(*) AS total_rows,
             count(*) FILTER (WHERE user_id IS NULL) AS null_keys
      FROM events)
SELECT total_rows, null_keys, violations,
       round(violations / (total_rows - null_keys), 6)
         AS violation_rate
FROM t, v""",
        "q115_interval_join": """
WITH iv AS (SELECT o_custkey AS custkey, o_orderkey AS okey,
                   epoch(o_orderdate) AS lo,
                   epoch(o_orderdate) + (1 + o_orderkey % 20) * 86400
                     AS hi
            FROM orders)
SELECT a.custkey AS custkey, a.okey AS okey, b.okey AS okey_r
FROM iv a JOIN iv b
  ON a.custkey = b.custkey
 AND a.lo <= b.hi AND b.lo <= a.hi
 AND a.okey < b.okey
ORDER BY a.custkey, a.okey, okey_r""",
        "q116_ab_test": """
WITH a AS (SELECT
  count(value) FILTER (WHERE user_id % 2 = 0) AS n_c,
  count(value) FILTER (WHERE user_id % 2 = 1) AS n_t,
  avg(value) FILTER (WHERE user_id % 2 = 0) AS mean_c,
  avg(value) FILTER (WHERE user_id % 2 = 1) AS mean_t,
  var_samp(value) FILTER (WHERE user_id % 2 = 0) AS v_c,
  var_samp(value) FILTER (WHERE user_id % 2 = 1) AS v_t
  FROM events),
s AS (SELECT *, v_c / n_c AS se2_c, v_t / n_t AS se2_t FROM a),
tt AS (SELECT *,
  (mean_t - mean_c) / sqrt(se2_c + se2_t) AS t_stat,
  (se2_c + se2_t) * (se2_c + se2_t)
    / (se2_c * se2_c / (n_c - 1) + se2_t * se2_t / (n_t - 1))
    AS welch_df
  FROM s),
e AS (SELECT *, abs(t_stat) / 1.4142135623730951 AS x FROM tt),
u AS (SELECT *, 1.0 / (1.0 + 0.3275911 * x) AS t FROM e),
ph AS (SELECT *,
  1.0 - ((((((0.0 + 1.061405429) * t + -1.453152027) * t
            + 1.421413741) * t + -0.284496736) * t
          + 0.254829592) * t) * exp(-(x * x)) AS erfv
  FROM u)
SELECT n_c, n_t,
       round(mean_c, 6) AS mean_c, round(mean_t, 6) AS mean_t,
       round(mean_t - mean_c, 6) AS diff,
       round(t_stat, 6) AS t_stat,
       round(welch_df, 6) AS welch_df,
       round(2.0 * (1.0 - 0.5 * (1.0 + erfv)), 6) AS p_value
FROM ph""",
        "q111_scd2": """
WITH m AS (
  SELECT user_id, event_type, ts,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events),
c AS (SELECT user_id, event_type, ts FROM m
      WHERE prev IS DISTINCT FROM event_type)
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts)
ORDER BY user_id, valid_from""",
        "q112_histogram": """
WITH b AS (SELECT min(value) AS lo,
                  (max(value) - min(value)) / 20 AS w FROM events),
h AS (SELECT event_type,
             CAST(least(greatest(floor((value - lo) / w), 0), 19)
                  AS INT) AS bin, lo, w
      FROM events, b WHERE value IS NOT NULL)
SELECT event_type, bin,
       round(lo + bin * w, 6) AS bin_lo,
       round(lo + (bin + 1) * w, 6) AS bin_hi,
       count(*) AS n
FROM h GROUP BY event_type, bin, lo, w
ORDER BY event_type, bin""",
        "q113_corr_matrix": """
WITH c AS (SELECT
  corr(l_quantity, l_extendedprice) AS c0,
  corr(l_quantity, l_discount) AS c1,
  corr(l_quantity, l_tax) AS c2,
  corr(l_extendedprice, l_discount) AS c3,
  corr(l_extendedprice, l_tax) AS c4,
  corr(l_discount, l_tax) AS c5
  FROM lineitem)
SELECT col_a, col_b, round(v, 6) AS corr FROM (
  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, c0 AS v
    FROM c
  UNION ALL SELECT 'l_quantity', 'l_discount', c1 FROM c
  UNION ALL SELECT 'l_quantity', 'l_tax', c2 FROM c
  UNION ALL SELECT 'l_extendedprice', 'l_discount', c3 FROM c
  UNION ALL SELECT 'l_extendedprice', 'l_tax', c4 FROM c
  UNION ALL SELECT 'l_discount', 'l_tax', c5 FROM c)
ORDER BY col_a, col_b""",
        "q107_split_dataset": """
WITH s AS (SELECT source,
  CASE WHEN substr(md5('0___' || doc_id), 1, 16) <= 'ccccccccccccd000'
         THEN 'train'
       WHEN substr(md5('0___' || doc_id), 1, 16) <= 'e666666666666800'
         THEN 'val'
       ELSE 'test' END AS split
  FROM documents)
SELECT split, source, count(*) AS n
FROM s GROUP BY 1, 2 ORDER BY split, source""",
        "q108_negative_samples": """
WITH corpus AS (SELECT doc_id AS cand,
                       substr(md5('0___' || doc_id), 1, 2) AS bkt
                FROM documents),
probes AS (SELECT doc_id, slot,
                  substr(md5('0___' || doc_id || '___' || slot
                             || '___probe'), 1, 2) AS bkt
           FROM documents, (SELECT unnest([0, 1, 2, 3]) AS slot)),
cand AS (SELECT p.doc_id, p.slot, c.cand
         FROM probes p JOIN corpus c USING (bkt)
         WHERE c.cand <> p.doc_id)
SELECT doc_id,
       arg_min(cand, md5('0___' || doc_id || '___' || slot || '___'
                         || cand)) AS neg_id,
       slot
FROM cand GROUP BY doc_id, slot ORDER BY doc_id, slot""",
        "q109_ranking_metrics": r"""
WITH q(query_id, term, qtf) AS (VALUES
  ('q1','spark',1),('q1','shuffle',1),('q1','join',1),
  ('q2','window',1),('q2','hash',1),('q2','scan',1),
  ('q3','stream',1),('q3','batch',1),('q3','dedup',1)),
docs AS (SELECT doc_id,
  list_filter(string_split_regex(lower(trim(text)), '\s+'),
              x -> x <> '') AS tokens
  FROM documents),
dl AS (SELECT doc_id, len(tokens) AS dl FROM docs),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
       WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS dft FROM tf GROUP BY 1),
scored AS (SELECT q.query_id, tf.doc_id,
  round(sum(q.qtf * ln(1 + (st.n_docs - dfq.dft + 0.5)/(dfq.dft + 0.5))
        * tf.tf * 2.2
        / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl))), 6)
    AS score
  FROM tf JOIN q USING (term) JOIN dfq USING (term)
  JOIN dl USING (doc_id) CROSS JOIN st GROUP BY 1, 2),
ranked AS (SELECT query_id, doc_id,
  row_number() OVER (PARTITION BY query_id
                     ORDER BY score DESC, doc_id) AS rnk
  FROM scored QUALIFY rnk <= 10),
rel AS (SELECT q.query_id, tf.doc_id, count(*) AS rel
        FROM tf JOIN q USING (term) GROUP BY 1, 2),
j AS (SELECT r.query_id, r.rnk, coalesce(rel.rel, 0) AS rel
      FROM ranked r LEFT JOIN rel
        ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id),
ideal AS (SELECT query_id, rel, rnk,
  row_number() OVER (PARTITION BY query_id
                     ORDER BY rel DESC, rnk ASC) AS ir
  FROM j)
SELECT query_id,
  round(CASE WHEN sum(rel / log2(ir + 1)) > 0
             THEN sum(rel / log2(rnk + 1)) / sum(rel / log2(ir + 1))
             ELSE 0 END, 6) AS ndcg,
  round(coalesce(1.0 / min(CASE WHEN rel > 0 THEN rnk END), 0), 6)
    AS mrr,
  count(CASE WHEN rel > 0 THEN 1 END) AS hits
FROM ideal GROUP BY 1 ORDER BY query_id""",
        "q110_standardize": """
WITH f AS (SELECT * FROM lineitem WHERE l_orderkey < 5000),
w AS (SELECT l_orderkey, l_linenumber, l_returnflag,
             l_quantity, l_extendedprice,
             avg(l_quantity) OVER g AS mu_q,
             stddev_samp(l_quantity) OVER g AS sd_q,
             avg(l_extendedprice) OVER g AS mu_p,
             stddev_samp(l_extendedprice) OVER g AS sd_p
      FROM f WINDOW g AS (PARTITION BY l_returnflag))
SELECT l_orderkey, l_linenumber, l_returnflag,
       round(CASE WHEN sd_q > 0 THEN
         least(greatest((l_quantity - mu_q) / sd_q, -2.5), 2.5) END, 6)
         AS qty_z,
       round(CASE WHEN sd_p > 0 THEN
         least(greatest((l_extendedprice - mu_p) / sd_p, -2.5), 2.5)
         END, 6) AS price_z
FROM w ORDER BY l_orderkey, l_linenumber""",
        "q105_pivot": """
SELECT user_id,
       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       count(CASE WHEN event_type = 'view' THEN 1 END) AS view
FROM events GROUP BY user_id ORDER BY user_id""",
        "q106_melt": """
WITH m AS (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable,
         CAST(l_quantity AS DOUBLE) AS value FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice',
         CAST(l_extendedprice AS DOUBLE) FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount',
         CAST(l_discount AS DOUBLE) FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_tax',
         CAST(l_tax AS DOUBLE) FROM lineitem)
SELECT l_orderkey, l_linenumber, variable, round(value, 6) AS value
FROM m WHERE l_orderkey < 2000
ORDER BY l_orderkey, l_linenumber, variable""",
        "q102_cohort_retention": """
WITH b AS (SELECT user_id,
                  CAST(floor(epoch(ts) / 604800) * 604800 AS BIGINT) AS wk
           FROM events),
pe AS (SELECT user_id, min(wk) AS cohort, list_distinct(list(wk)) AS act
       FROM b GROUP BY 1),
hits AS (SELECT cohort,
                CAST((unnest(act) - cohort) / 604800 AS INT) AS "offset"
         FROM pe),
counts AS (SELECT cohort, "offset", count(*) AS users
           FROM hits GROUP BY 1, 2)
SELECT cohort, "offset", users,
       round(users / max(CASE WHEN "offset" = 0 THEN users END)
                      OVER (PARTITION BY cohort), 6) AS retention
FROM counts ORDER BY cohort, "offset" """,
        "q103_fuzzy_name_join": """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS edit_dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_custkey < b.c_custkey
 AND levenshtein(a.c_name, b.c_name) <= 2
ORDER BY id_a, id_b""",
        "q104_rolling_zscore": """
WITH w AS (
  SELECT user_id, ts, value,
         avg(value) OVER win AS mu,
         stddev_samp(value) OVER win AS sd,
         count(value) OVER win AS nprev
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
SELECT user_id, ts, value,
       CASE WHEN nprev >= 2 AND sd > 0
            THEN round((value - mu) / sd, 6) END AS z,
       abs(CASE WHEN nprev >= 2 AND sd > 0
                THEN round((value - mu) / sd, 6) END) > 3.0 AS is_anomaly
FROM w ORDER BY user_id, ts""",
        "q100_bm25_search": r"""
WITH q(query_id, term, qtf) AS (VALUES
  ('q1','spark',1),('q1','shuffle',1),('q1','join',1),
  ('q2','window',1),('q2','hash',1),('q2','scan',1),
  ('q3','stream',1),('q3','batch',1),('q3','dedup',1)),
docs AS (SELECT doc_id,
  list_filter(string_split_regex(lower(trim(text)), '\s+'),
              x -> x <> '') AS tokens
  FROM documents),
dl AS (SELECT doc_id, len(tokens) AS dl FROM docs),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM (SELECT doc_id, unnest(tokens) AS term FROM docs)
       WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS dft FROM tf GROUP BY 1),
scored AS (SELECT q.query_id, tf.doc_id,
  round(sum(q.qtf * ln(1 + (st.n_docs - dfq.dft + 0.5)/(dfq.dft + 0.5))
        * tf.tf * 2.2
        / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl))), 6)
    AS score
  FROM tf JOIN q USING (term) JOIN dfq USING (term)
  JOIN dl USING (doc_id) CROSS JOIN st GROUP BY 1, 2)
SELECT query_id, doc_id, score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id) AS INT) AS rnk
FROM scored QUALIFY rnk <= 10 ORDER BY query_id, rnk""",
        "q101_funnel": """
WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t
       FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS t
       FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
SELECT step, event_type, users,
       round(users / first(users) OVER (ORDER BY step), 6) AS conversion
FROM (SELECT 1 AS step, 'view' AS event_type,
             (SELECT count(*) FROM s1) AS users
      UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
      UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
WHERE users > 0 ORDER BY step""",
        "q99_ohlc": """
WITH b AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
         ts, event_id, value
  FROM events)
SELECT user_id, bucket,
       round(arg_min(value, ts), 6) AS open,
       round(max(value), 6) AS high,
       round(min(value), 6) AS low,
       round(arg_max(value, ts), 6) AS close,
       count(value) AS n
FROM b GROUP BY 1, 2 ORDER BY user_id, bucket""",
        "q98_gap_fill": """
WITH agged AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS bucket,
         avg(value) AS v
  FROM events GROUP BY 1, 2),
spans AS (SELECT user_id, min(bucket) lo, max(bucket) hi
          FROM agged GROUP BY 1),
spine AS (SELECT user_id, unnest(generate_series(lo, hi, 21600)) AS bucket
          FROM spans),
dense AS (SELECT s.user_id, s.bucket, a.v, a.v IS NULL AS filled
          FROM spine s LEFT JOIN agged a USING (user_id, bucket))
SELECT user_id, bucket,
       round(last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY bucket
         ROWS UNBOUNDED PRECEDING), 6) AS value,
       filled
FROM dense ORDER BY user_id, bucket""",
        "q97_icon_audio_probe": """
SELECT doc_id,
       CAST(3 + doc_id % 14 AS INT) AS ico_w,
       CAST(2 + doc_id % 9 AS INT) AS ico_h,
       CAST((doc_id * 11) % 256 AS INT) AS ico_px,
       CAST(200 + doc_id % 77 AS INT) AS aiff_n,
       CAST(8000 AS INT) AS aiff_rate,
       CAST((doc_id % 90) * 100 AS INT) AS aiff_first,
       CAST(200 + doc_id % 77 AS INT) AS au_n,
       CAST(16000 AS INT) AS au_rate
FROM documents ORDER BY doc_id""",
        "q96_cluster_representatives": f"""
WITH RECURSIVE pairs AS ({_minhash_lsh_sql(4, 2).replace("ORDER BY id_a, id_b", "")}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
nodes AS (SELECT DISTINCT u AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
wc AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
              length(d.text) AS q
       FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
reps AS (SELECT component,
                first(doc_id ORDER BY q DESC, doc_id ASC) AS rep
         FROM wc GROUP BY component)
SELECT d.doc_id, length(d.text) AS quality
FROM documents d JOIN reps r ON r.rep = d.doc_id
ORDER BY d.doc_id""",
        "q94_weighted_jaccard": r"""
WITH toks AS (SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS words
              FROM documents),
tf0 AS (SELECT doc_id, term, count(*) AS cnt
        FROM (SELECT doc_id, unnest(words) AS term FROM toks)
        WHERE term <> '' GROUP BY 1, 2),
hot AS (SELECT term FROM tf0 GROUP BY term
        HAVING count(*) > (SELECT greatest(1, CAST(floor(0.05 * count(*))
                                               AS BIGINT)) FROM documents)),
tf AS (SELECT * FROM tf0 WHERE term NOT IN (SELECT term FROM hot)),
tot AS (SELECT doc_id, sum(cnt) AS tot FROM tf GROUP BY 1),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 sum(least(a.cnt, b.cnt)) AS im
          FROM tf a JOIN tf b ON a.term = b.term AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT id_a, id_b,
       round(CAST(im AS DOUBLE) / (ta.tot + tb.tot - im), 6) AS wjaccard
FROM inter JOIN tot ta ON ta.doc_id = id_a JOIN tot tb ON tb.doc_id = id_b
WHERE CAST(im AS DOUBLE) / (ta.tot + tb.tot - im) >= 0.3
ORDER BY id_a, id_b""",
        "q93_media_probe": """
SELECT doc_id,
       CAST(5 + doc_id % 11 AS INTEGER) AS tiff_w,
       CAST(2 + doc_id % 6 AS INTEGER) AS tiff_h,
       CAST(doc_id % 256 AS INTEGER) AS tiff_px,
       CAST(800 + doc_id % 50 AS INTEGER) AS wav_n,
       CAST((doc_id % 100) * 10 AS INTEGER) AS wav_first,
       CAST(800 + doc_id % 50 AS INTEGER) AS wav_dec_n,
       CAST(doc_id AS DOUBLE) * 0.25 AS mp4_dur
FROM documents ORDER BY doc_id""",
        "q63_video_codec": """
SELECT doc_id,
       4 + doc_id % 5 AS w,
       3 + doc_id % 4 AS h,
       4 + doc_id % 6 AS n,
       (4 + doc_id % 6) // 2 AS cut,
       (4 + doc_id % 6 + 1) // 2 AS half_n
FROM documents ORDER BY doc_id""",
        "q59_html_sections": r"""
WITH h AS (
  SELECT doc_id,
         '<html><body><h1>Doc ' || CAST(doc_id AS VARCHAR)
         || ' &amp; Co</h1><p>'
         || regexp_replace(text, '\n\s*\n', '</p><p>', 'g')
         || '</p><h2>Tail</h2><p>End of doc ' || CAST(doc_id AS VARCHAR)
         || '.</p></body></html>' AS html
  FROM documents),
md AS (
  -- exactly the engine's html_to_markdown chain, in the same order
  -- (script/style strip and h3-h6 / inline-tag / other-entity passes are
  -- no-ops on this constructed input and elided)
  SELECT doc_id,
    regexp_replace(regexp_replace(
      replace(
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
          '(?is)<h1[^>]*>(.*?)</h1\s*>',
          chr(10)||chr(10)||'# \1'||chr(10)||chr(10), 'g'),
          '(?is)<h2[^>]*>(.*?)</h2\s*>',
          chr(10)||chr(10)||'## \1'||chr(10)||chr(10), 'g'),
          '(?i)<(?:/p|p[^>]*|br\s*/?|/li|li[^>]*)>', chr(10)||chr(10), 'g'),
          '(?s)<[^>]+>', ' ', 'g'),
        '&amp;', '&'),
      '[ '||chr(9)||']+', ' ', 'g'),
      ' ?'||chr(10)||' ?', chr(10), 'g') AS md_text
  FROM h),
sec AS (
  SELECT doc_id,
         string_split(
           regexp_replace(md_text, '(?m)^(#{1,6}\s)', chr(1)||'\1', 'g'),
           chr(1)) AS parts
  FROM md),
u AS (
  SELECT doc_id, trim(part) AS part, ord
  FROM (SELECT doc_id, unnest(parts) AS part,
               unnest(range(1, len(parts) + 1)) AS ord FROM sec)
  WHERE length(trim(part)) > 0),
lv AS (
  SELECT doc_id, part, ord,
         length(regexp_extract(part, '^(#{1,6})\s', 1)) AS hlvl,
         regexp_extract(part, '^#{1,6}\s*([^\n]*)', 1) AS htext
  FROM u),
w AS (
  SELECT doc_id, part, ord,
         last_value(CASE WHEN hlvl = 1 THEN htext END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY ord
                 ROWS UNBOUNDED PRECEDING) AS h1,
         last_value(CASE WHEN hlvl BETWEEN 1 AND 2 THEN hlvl END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY ord
                 ROWS UNBOUNDED PRECEDING) AS l2,
         last_value(CASE WHEN hlvl BETWEEN 1 AND 2 THEN htext END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY ord
                 ROWS UNBOUNDED PRECEDING) AS l2t,
         first_value(CASE WHEN hlvl > 0 THEN htext END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY ord
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS title
  FROM lv)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS BIGINT) AS pos,
       CAST(length(part) AS BIGINT) AS n_chars,
       substr(part, 1, 20) AS head20,
       title, h1,
       CASE WHEN l2 = 2 THEN l2t END AS h2
FROM w ORDER BY doc_id, pos""",
        "q64_pii_scrub": r"""
WITH p AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
         || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)
         || '.7 ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         AS t
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
       CAST(len(regexp_extract_all(t, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS INT) AS n_ipv4,
       CAST(len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS INT) AS n_ssn,
       CAST(length(
         regexp_replace(regexp_replace(regexp_replace(t,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
           '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IPV4>', 'g')) AS INT) AS scrub_len,
       regexp_matches(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}') AS flagged
FROM p ORDER BY doc_id""",
        "q65_repetition_quality": r"""
WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS words
              FROM documents),
grams AS (
  SELECT doc_id, unnest(list_filter(
           list_transform(words, (w, i) -> CASE WHEN i + 2 <= len(words)
             THEN words[i] || ' ' || words[i+1] || ' ' || words[i+2] END),
           x -> x IS NOT NULL)) AS ngram
  FROM toks),
per AS (SELECT doc_id, ngram, count(*) AS c FROM grams GROUP BY doc_id, ngram)
SELECT doc_id,
       round(1.0 - CAST(count(*) AS DOUBLE) / sum(c), 6) AS dup_frac,
       round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_frac
FROM per GROUP BY doc_id ORDER BY doc_id""",
        "q66_contamination": f"""
WITH {_SHINGLE3_CTE},
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0)
SELECT s.doc_id,
       count(*) AS n_grams,
       sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_contaminated,
       round(CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS contam_frac
FROM sh s LEFT JOIN bench b ON s.shingle = b.shingle
GROUP BY s.doc_id ORDER BY s.doc_id""",
        "q67_dup_clusters": f"""
WITH RECURSIVE pairs AS ({_minhash_lsh_sql(4, 2).replace("ORDER BY id_a, id_b", "")}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
nodes AS (SELECT DISTINCT u AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id)
SELECT id AS doc_id, min(r) AS component
FROM reach GROUP BY id ORDER BY doc_id""",
        "q68_jpeg_codec": """
SELECT doc_id,
       CAST(8 + doc_id % 9 AS INT) AS w,
       CAST(8 + doc_id % 5 AS INT) AS h,
       'RGB' AS m,
       CAST(4 AS INT) AS rw,
       CAST(3 AS INT) AS rh,
       CAST((doc_id * 7) % 256 AS INT) AS px
FROM documents ORDER BY doc_id""",
        "q69_lm_quality": r"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
  FROM documents),
tg AS (
  SELECT doc_id, unnest(list_transform(
           range(1, greatest(len(t) - 1, 1)),
           i -> substr(t, CAST(i AS INT), 3))) AS gram
  FROM norm),
train AS (SELECT gram FROM tg WHERE doc_id % 10 = 0),
model AS (
  SELECT gram, ln(CAST(count(*) AS DOUBLE)
                  / (SELECT count(*) FROM train)) AS logp
  FROM train GROUP BY gram)
SELECT tg.doc_id,
       round(avg(coalesce(model.logp, -20.0)), 6) AS lm_score,
       count(*) AS n_grams_scored
FROM tg LEFT JOIN model ON tg.gram = model.gram
GROUP BY tg.doc_id ORDER BY tg.doc_id""",
        "q71_asof_join": """
SELECT a.event_id,
       round(b.pv, 4) AS pv,
       b.ts AS pts
FROM events a
ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS pv
                FROM events WHERE event_type = 'purchase'
                GROUP BY user_id, ts) b
  ON a.user_id = b.user_id AND a.ts >= b.ts
ORDER BY a.event_id""",
        "q72_simhash_neighbors": f"""
WITH sims AS ({_simhash_sql(32).replace("ORDER BY doc_id", "")})
SELECT a.doc_id, count(*) AS n_near
FROM sims a JOIN sims b
  ON a.doc_id <> b.doc_id
 AND bit_count(xor(a.simhash, b.simhash)) <= 1
GROUP BY a.doc_id ORDER BY a.doc_id""",
        "q73_doc_packing": r"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           % 4 AS stream
  FROM documents),
cum AS (
  SELECT doc_id, n_tokens, stream,
         sum(n_tokens) OVER (PARTITION BY stream ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS s
  FROM base)
SELECT doc_id, n_tokens, stream,
       CAST(floor(s / 256) AS BIGINT) AS bin,
       s % 256 AS "offset"
FROM cum ORDER BY doc_id""",
        "q74_line_dedup": r"""
WITH docs AS (
  SELECT doc_id, replace(text, ' table ', chr(10)) AS text FROM documents),
split AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs),
lines AS (
  SELECT doc_id, unnest(ls) AS line,
         unnest(range(1, len(ls) + 1)) AS pos FROM split),
freq AS (
  SELECT md5(trim(line)) AS line_key, count(DISTINCT doc_id) AS doc_freq
  FROM lines WHERE trim(line) <> '' GROUP BY 1),
kept AS (
  SELECT l.doc_id, l.pos, l.line
  FROM lines l LEFT JOIN freq f ON md5(trim(l.line)) = f.line_key
  WHERE trim(l.line) = '' OR f.doc_freq IS NULL OR f.doc_freq <= 2),
rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
  FROM kept GROUP BY doc_id)
SELECT d.doc_id, coalesce(r.text, '') AS text
FROM documents d LEFT JOIN rebuilt r USING (doc_id) ORDER BY d.doc_id""",
        "q75_url_curation": r"""
WITH u AS (
  SELECT doc_id,
    'HTTP://WWW.Site' || CAST(doc_id % 7 AS VARCHAR)
    || CASE WHEN doc_id % 2 = 0 THEN '.co.UK' ELSE '.COM' END
    || ':80/docs/' || CAST(doc_id AS VARCHAR)
    || CASE WHEN doc_id % 3 = 0
            THEN '/?utm_source=feed&ref=rss&id=' || CAST(doc_id AS VARCHAR)
            ELSE '?id=' || CAST(doc_id AS VARCHAR) || '&z=2&a=1' END
    || '#frag' AS url
  FROM documents),
parts AS (
  SELECT doc_id, url,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS host,
    regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:(\d+)', 1) AS port,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path,
    regexp_extract(url, '\?([^#]*)', 1) AS query
  FROM u),
canon AS (
  SELECT doc_id, host,
    scheme || '://' || regexp_replace(host, '^www\.', '')
    || CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
                                     OR (scheme = 'https' AND port = '443'))
            THEN ':' || port ELSE '' END
    || regexp_replace(path, '/$', '')
    || CASE WHEN q2 <> '' THEN '?' || q2 ELSE '' END AS canonical_url
  FROM (
    SELECT *, array_to_string(list_sort(list_filter(string_split(query, '&'),
      x -> x <> '' AND NOT list_contains(['utm_source','utm_medium','utm_campaign','utm_term','utm_content','gclid','fbclid','msclkid','mc_eid','igshid','ref','ref_src'],
                                         string_split(x, '=')[1]))), '&') AS q2
    FROM parts)),
dom AS (
  SELECT doc_id, canonical_url,
    CASE WHEN regexp_matches(host, '^\d{1,3}(\.\d{1,3}){3}$')
              OR len(string_split(host, '.')) <= 2 THEN host
         WHEN list_contains(['co.uk','ac.uk','gov.uk','org.uk','co.jp','ne.jp','or.jp','com.au','net.au','org.au','com.br','com.cn','com.mx','co.in','co.kr','com.tr','com.ar','co.za'],
             array_to_string(list_slice(string_split(host, '.'),
               greatest(len(string_split(host, '.')) - 1, 1),
               len(string_split(host, '.'))), '.'))
         THEN array_to_string(list_slice(string_split(host, '.'),
               greatest(len(string_split(host, '.')) - 2, 1),
               len(string_split(host, '.'))), '.')
         ELSE array_to_string(list_slice(string_split(host, '.'),
               greatest(len(string_split(host, '.')) - 1, 1),
               len(string_split(host, '.'))), '.') END AS domain
  FROM canon),
capped AS (
  SELECT *, row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
  FROM dom)
SELECT doc_id, canonical_url, domain FROM capped WHERE rn <= 20
ORDER BY doc_id""",
        "q76_dsir_score": r"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            t -> t <> '')) AS tok
  FROM documents),
feat AS (
  SELECT doc_id, source,
         CAST(CAST('0x' || substr(md5(tok), 1, 14) AS BIGINT) % 512 AS INT)
           AS bucket
  FROM toks),
tgt AS (SELECT bucket, count(*) AS c_target FROM feat
        WHERE source = 'src0' GROUP BY 1),
rawc AS (SELECT bucket, count(*) AS c_raw FROM feat GROUP BY 1),
j AS (
  SELECT coalesce(t.bucket, r.bucket) AS bucket,
         coalesce(c_target, 0) AS c_target, coalesce(c_raw, 0) AS c_raw
  FROM tgt t FULL OUTER JOIN rawc r ON t.bucket = r.bucket),
tot AS (SELECT sum(c_target) AS t_target, sum(c_raw) AS t_raw FROM j),
model AS (
  SELECT bucket,
         ln((c_target + 1.0) / (t_target + 1.0 * 512))
         - ln((c_raw + 1.0) / (t_raw + 1.0 * 512)) AS log_ratio
  FROM j, tot)
SELECT doc_id, avg(coalesce(log_ratio, 0.0)) AS dsir_score,
       count(*) AS n_tokens
FROM feat LEFT JOIN model USING (bucket)
GROUP BY doc_id ORDER BY doc_id""",
        "q77_tile_stitch": r"""
WITH dims AS (
  SELECT doc_id,
         CAST(9 + doc_id % 13 AS INT) AS w,
         CAST(8 + doc_id % 7 AS INT) AS h
  FROM documents WHERE doc_id % 8 = 1)
SELECT doc_id,
       ((w - 2 - 1) // 6 + 1) * ((h - 2 - 1) // 6 + 1) AS n_tiles,
       TRUE AS roundtrip_ok
FROM dims ORDER BY doc_id""",
        "q78_bow_embed_search": _q78_oracle(),
        "q79_quality_classifier": _q79_oracle(),
        "q80_mean_ap": r"""
WITH ks AS (
  SELECT doc_id, unnest(range(0, doc_id % 3 + 1)) AS k FROM documents),
gts AS (
  SELECT (doc_id + k) % 3 AS category, count(*) AS num_gts
  FROM ks GROUP BY 1),
preds AS (
  SELECT doc_id AS image_id, (doc_id + k) % 3 AS category,
         0.5 + CAST((doc_id * 7 + k) % 40 AS DOUBLE) / 100 AS score,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY k) - 1 AS INT)
           AS pred_idx,
         CASE WHEN (doc_id + k) % 5 <> 0 THEN 1 ELSE 0 END AS is_tp
  FROM ks WHERE (doc_id + k) % 4 <> 0),
ranked AS (
  SELECT *,
         sum(is_tp) OVER w AS tp_cum,
         row_number() OVER w AS rnk
  FROM preds
  WINDOW w AS (PARTITION BY category
               ORDER BY score DESC, image_id, pred_idx
               ROWS UNBOUNDED PRECEDING)),
enved AS (
  SELECT *,
         CAST(tp_cum AS DOUBLE)
           / greatest(CAST(rnk AS DOUBLE), 1.1920928955078125e-07) AS prec
  FROM ranked),
env2 AS (
  SELECT *,
         floor(max(prec) OVER (PARTITION BY category
                               ORDER BY score ASC, image_id DESC, pred_idx DESC
                               ROWS UNBOUNDED PRECEDING) * 1048576 + 0.5)
           / 1048576 AS env_q
  FROM enved),
ap_num AS (
  SELECT category, sum(is_tp * env_q) AS ap_num FROM env2 GROUP BY category)
SELECT g.category,
       coalesce(a.ap_num, 0.0)
         / greatest(CAST(g.num_gts AS DOUBLE), 1.1920928955078125e-07) AS ap
FROM gts g LEFT JOIN ap_num a USING (category)
ORDER BY g.category""",
        "q81_repeated_spans": r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts
  FROM documents),
grams AS (
  SELECT doc_id,
         unnest(range(1, len(ts) - 10 + 2)) - 1 AS pos,
         unnest(list_transform(range(1, len(ts) - 10 + 2),
                i -> array_to_string(list_slice(ts, i, i + 9), ' '))) AS gram
  FROM toks WHERE len(ts) >= 10),
keyed AS (SELECT doc_id, pos, md5(gram) AS k FROM grams),
hot AS (SELECT k FROM keyed GROUP BY k HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM keyed WHERE k IN (SELECT k FROM hot)),
marked AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 10
              THEN 1 ELSE 0 END AS new
  FROM hits),
cum AS (
  SELECT doc_id, pos,
         sum(new) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS span
  FROM marked)
SELECT doc_id, min(pos) AS span_start, max(pos) + 10 AS span_end
FROM cum GROUP BY doc_id, span ORDER BY doc_id, span_start""",
        "q82_gopher_filter": r"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     t -> t <> '') AS ts
  FROM documents),
m AS (
  SELECT doc_id,
         len(ts) AS n_words,
         CAST(list_reduce(list_transform(ts, t -> length(t)),
                          (x, y) -> x + y) AS DOUBLE)
           / greatest(len(ts), 1) AS mean_word_len,
         CAST(len(regexp_extract_all(text, '#|\.\.\.|…')) AS DOUBLE)
           / greatest(len(ts), 1) AS symbol_ratio,
         CAST(len(list_filter(ts, t -> regexp_matches(t, '[a-z]')))
              AS DOUBLE) / greatest(len(ts), 1) AS alpha_word_frac,
         len(list_intersect(list_distinct(ts),
             ['the','be','to','of','and','that','have','with']))
           AS n_stopword_kinds
  FROM base),
grams AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, len(string_split_regex(lower(trim(text)), '\s+')) - 2 + 2),
           i -> array_to_string(list_slice(
                  string_split_regex(lower(trim(text)), '\s+'),
                  i, i + 1), ' '))) AS g
  FROM documents),
per_gram AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
rep AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_ngram_frac
        FROM per_gram GROUP BY doc_id),
lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents),
per_line AS (
  SELECT doc_id, line, count(*) AS c FROM lines
  WHERE trim(line) <> '' GROUP BY doc_id, line),
dl AS (SELECT doc_id, 1.0 - CAST(count(*) AS DOUBLE) / sum(c)
         AS dup_line_frac
       FROM per_line GROUP BY doc_id)
SELECT m.doc_id, m.n_words, m.mean_word_len, m.symbol_ratio,
       m.alpha_word_frac, m.n_stopword_kinds,
       coalesce(r.top_ngram_frac, 0.0) AS top_ngram_frac,
       coalesce(d.dup_line_frac, 0.0) AS dup_line_frac,
       (m.n_words >= 50 AND m.n_words <= 100000) AS ok_n_words,
       (m.mean_word_len >= 3.0 AND m.mean_word_len <= 10.0) AS ok_word_len,
       (m.symbol_ratio <= 0.1) AS ok_symbols,
       (m.alpha_word_frac >= 0.8) AS ok_alpha,
       (m.n_stopword_kinds >= 2) AS ok_stopwords,
       (coalesce(d.dup_line_frac, 0.0) <= 0.3) AS ok_dup_lines,
       (coalesce(r.top_ngram_frac, 0.0) <= 0.2) AS ok_top_ngram,
       ((m.n_words >= 50 AND m.n_words <= 100000)
        AND (m.mean_word_len >= 3.0 AND m.mean_word_len <= 10.0)
        AND m.symbol_ratio <= 0.1 AND m.alpha_word_frac >= 0.8
        AND m.n_stopword_kinds >= 2
        AND coalesce(d.dup_line_frac, 0.0) <= 0.3
        AND coalesce(r.top_ngram_frac, 0.0) <= 0.2) AS keep
FROM m LEFT JOIN rep r USING (doc_id) LEFT JOIN dl d USING (doc_id)
ORDER BY m.doc_id""",
        "q83_range_join": r"""
SELECT e.event_id, n.n_nationkey, e.value
FROM events e JOIN nation n
  ON e.value >= n.n_nationkey * 2.0 AND e.value <= n.n_nationkey * 2.0 + 3.0
ORDER BY e.event_id, n.n_nationkey""",
        "q84_mixture_sample": _q84_oracle(),
        "q85_image_hash_dedup": r"""
SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0 AS hamming
FROM documents a JOIN documents b
  ON a.doc_id < b.doc_id AND a.doc_id % 37 = b.doc_id % 37
ORDER BY id_a, id_b""",
        "q86_audio_fingerprint_dedup": r"""
SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0 AS hamming
FROM documents a JOIN documents b
  ON a.doc_id < b.doc_id AND a.doc_id % 29 = b.doc_id % 29
ORDER BY id_a, id_b""",
    }



def _q130_oracle() -> str:
    """DuckDB replay of q130: same synthesized text, same C4 rules."""
    synth = """concat_ws(chr(10),
  'This is a good line with punctuation.',
  substr(text, 1, 40),
  CASE WHEN doc_id % 3 = 0 THEN 'Please enable javascript to continue.'
       ELSE 'Another fine sentence appears here!' END,
  CASE WHEN doc_id % 5 = 0 THEN 'short one.'
       ELSE 'A third proper sentence is present here?' END,
  CASE WHEN doc_id % 7 = 0 THEN 'We use cookies and a privacy policy.'
       ELSE 'Closing sentence for the document.' END,
  CASE WHEN doc_id % 11 = 0 THEN 'function() { return 1; }'
       ELSE 'No code here.' END)"""
    kept = ("list_filter(lines, ln -> "
            "regexp_matches(trim(ln), '[.!?\"]$') "
            "AND len(list_filter(string_split_regex(trim(ln), '\\s+'), "
            "w -> w <> '')) >= 3 "
            "AND NOT contains(lower(ln), 'javascript'))")
    bad = ("(contains(lower(t), 'lorem ipsum') "
           "OR contains(lower(t), 'privacy policy') "
           "OR contains(lower(t), 'terms of use') "
           "OR contains(lower(t), 'cookie policy') "
           "OR contains(lower(t), 'uses cookies'))")
    return f"""
WITH synth AS (SELECT doc_id, {synth} AS t FROM documents),
ln AS (SELECT doc_id, t, string_split(t, chr(10)) AS lines FROM synth),
k AS (SELECT doc_id, t, len(lines) AS n_lines, {kept} AS kept FROM ln)
SELECT doc_id, CAST(n_lines AS INT) AS n_lines,
       CAST(len(kept) AS INT) AS n_kept_lines,
       array_to_string(kept, chr(10)) AS clean_text,
       (len(kept) >= 3 AND NOT {bad} AND NOT contains(t, '{{')) AS keep
FROM k ORDER BY doc_id"""


def _q131_oracle() -> str:
    """DuckDB replay of q131: same synthesized URLs, same normalization
    (operators/urlops.py canonical_url_sql)."""
    from pixeltable_spark.operators.urlops import canonical_url_sql
    url = """(CASE WHEN event_id % 2 = 0 THEN 'HTTP://Example.COM:80'
       ELSE 'https://CDN.Site.org:443' END
  || '/products/' || event_type
  || CASE WHEN event_id % 3 = 0 THEN '/' ELSE '' END
  || '?utm_source=news&b=' || CAST(event_id % 5 AS VARCHAR) || '&a=1'
  || CASE WHEN event_id % 4 = 0 THEN '&gclid=abc' ELSE '' END
  || '#sec' || CAST(event_id % 7 AS VARCHAR))"""
    canon = canonical_url_sql("u")
    return f"""
WITH urls AS (SELECT event_id, {url} AS u FROM events)
SELECT event_id, {canon} AS canonical, md5({canon}) AS dedup_key
FROM urls ORDER BY event_id"""



def _q136_oracle() -> str:
    """DuckDB replay of q136: identical synthesized text, regex counts,
    and the Luhn mod-10 fold (operators/pii.py luhn_sql)."""
    from pixeltable_spark.operators.pii import PII_PATTERNS, luhn_sql
    synth = """concat_ws(' ', 'Contact',
  CASE WHEN doc_id % 3 = 0 THEN 'user' || CAST(doc_id AS VARCHAR) || '@example.com'
       ELSE 'nobody' END,
  CASE WHEN doc_id % 5 = 0 THEN 'ssn 123-45-6789' ELSE '' END,
  'card',
  CASE WHEN doc_id % 4 = 0 THEN '4111111111111111'
       WHEN doc_id % 4 = 1 THEN '4111111111111112'
       WHEN doc_id % 4 = 2 THEN '378282246310005'
       ELSE '1234567890123456' END,
  'end')"""
    email, ssn = PII_PATTERNS["email"], PII_PATTERNS["ssn"]
    card = PII_PATTERNS["credit_card"]
    cand = (r"list_filter(list_transform("
            r"regexp_extract_all(t, '\b(?:\d[ -]?){12,18}\d\b'), "
            r"s -> regexp_replace(s, '[ -]', '', 'g')), "
            r"s -> length(s) BETWEEN 13 AND 16)")
    luhn = luhn_sql("s")
    return f"""
WITH synth AS (SELECT doc_id, {synth} AS t FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{email}')) AS INT) AS n_email,
       CAST(len(regexp_extract_all(t, '{ssn}')) AS INT) AS n_ssn,
       CAST(len(regexp_extract_all(t, '{card}')) AS INT) AS n_card_naive,
       CAST(len(list_filter({cand}, s -> {luhn})) AS INT) AS n_card_luhn,
       regexp_replace(regexp_replace(t, '{email}', '<EMAIL>', 'g'),
                      '{ssn}', '<SSN>', 'g') AS scrubbed
FROM synth ORDER BY doc_id"""


def _q137_oracle() -> str:
    """Closed-form DuckDB replay of q137: the synthesized streams'
    frame counts, durations, and VBR mean bitrate from doc_id
    arithmetic — the REAL parsers in the Spark path must land exactly
    on these numbers."""
    bank = ", ".join(str(b) for b in _MP3_BANK)
    return f"""
SELECT doc_id,
  CAST(3 + doc_id % 7 AS INT) AS mp3_frames,
  round((3 + doc_id % 7) * 1152.0 / 44100, 6) AS mp3_dur,
  round(list_aggregate(list_transform(range(0, CAST(3 + doc_id % 7 AS INT)),
        i -> ([{bank}])[CAST((doc_id + i) % {len(_MP3_BANK)} AS INT) + 1]),
      'avg'), 3) AS mp3_mean_kbps,
  CAST(2 + doc_id % 5 AS INT) AS aac_frames,
  round((2 + doc_id % 5) * 1024.0 / 44100, 6) AS aac_dur
FROM documents ORDER BY doc_id"""


def _q138_expected_gops(n: int, duration: float = 0.5) -> int:
    """Independent pure-python replay of the keyframe-aligned greedy
    segmentation for the q138 synthetic layout (keyframes every 4th
    sample, stts = n//2 @100 + rest @50 ticks, timescale 600) — NOT
    calling the engine's mp4_gop_segments."""
    ts = []
    t = 0
    for i in range(n):
        # 6-dp rounding mirrors mp4_sample_index's t exactly — the
        # greedy >= comparison is IEEE-sensitive right at the boundary
        ts.append(round(t / 600.0, 6))
        t += 100 if i < n // 2 else 50
    kf = [i % 4 == 0 for i in range(n)]
    segs = 0
    start = 0
    i = 1
    while i < n:
        if kf[i] and ts[i] - ts[start] >= duration:
            segs += 1
            start = i
        i += 1
    return segs + 1   # the tail segment


def _q138_oracle() -> str:
    gop_cases = " ".join(
        f"WHEN {n} THEN {_q138_expected_gops(10 + n % 8)}"
        for n in range(8))
    return f"""
SELECT doc_id,
  CAST(10 + doc_id % 8 AS INT) AS n_samples,
  CAST(((10 + doc_id % 8) + 3) // 4 AS INT) AS n_keyframes,
  round((((10 + doc_id % 8) // 2) * 100
         + ((10 + doc_id % 8) - (10 + doc_id % 8) // 2) * 50) / 600.0, 6)
    AS dur,
  CAST(CASE doc_id % 8 {gop_cases} END AS INT) AS n_gops
FROM documents ORDER BY doc_id"""


def _q132_oracle() -> str:
    """Full SQL oracle for the streaming curation projection: the
    model lang-id CTE chain + q41's quality formula + q89's PII regex +
    the md5 fingerprint, composed per document."""
    return f"""
WITH {_langid_ctes()},
m AS (
  SELECT doc_id,
         {_TOKCOUNT} AS tok,
         CASE WHEN length(text) > 0 THEN
           CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
             / length(text) ELSE 0.0 END AS praw,
         CASE WHEN ({_TOKCOUNT}) > 0 THEN
           CAST(len(regexp_extract_all(lower(text), '{_STOPPAT}')) AS DOUBLE)
             / ({_TOKCOUNT}) ELSE 0.0 END AS sraw,
         regexp_matches(text,
           '(?:[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}})'
           || '|(?:\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b)'
           || '|(?:\\b(?:\\d{{1,3}}\\.){{3}}\\d{{1,3}}\\b)') AS pii,
         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents),
q AS (SELECT doc_id,
             -- empty-doc guard mirrors curation_stream's quality floor
             -- (with guarded ratios the formula reduces to 0.1 anyway,
             -- but state it explicitly so the oracle stays valid for
             -- the input class the operator documents)
             CASE WHEN tok > 0 THEN
               round((CASE WHEN tok BETWEEN 20 AND 1000 THEN 0.5 ELSE 0.1 END)
                     + least(sraw * 2.0, 0.3) - least(praw * 2.0, 0.2), 6)
             ELSE 0.1 END AS quality, pii, fp FROM m)
SELECT q.doc_id, lg.lang_pred, q.quality, q.pii, q.fp,
       (lg.lang_pred = 'en' AND NOT q.pii AND q.quality >= 0.0) AS keep
FROM q JOIN lgpred lg USING (doc_id) ORDER BY doc_id"""


def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_base()
    # the streaming funnel replay must equal the batch funnel: a
    # time-ordered availableNow replay shares q101's nested-min oracle
    # (also pinned by tests/test_stateful_streaming.py)
    d["q114_funnel_stream"] = d["q101_funnel"]
    # the streaming sessionizer's availableNow replay must equal the
    # batch lag+gap formulation — q22's oracle, verbatim
    d["q140_sessionize_stream"] = d["q22_sessionize"]
    # q141: the two-level token-window explode in closed form — a chunk of
    # m words (m = least(20, n - start)) yields floor((m-1)/5)+1 sub-chunks
    # (the splitter's window starts are sequence(0, m-1, stride))
    d["q141_component_groupby"] = r"""
WITH src AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 150),
nz AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
       FROM src WHERE length(trim(text)) > 0),
ch AS (SELECT doc_id, len(words) AS n,
              unnest(range(0, len(words), 20)) AS s FROM nz),
pc AS (SELECT doc_id, least(20, n - s) AS m FROM ch)
SELECT doc_id, count(*) AS n_chunks,
       sum(CAST(floor((m - 1) / 5) + 1 AS BIGINT)) AS n_subs
FROM pc GROUP BY doc_id ORDER BY doc_id"""
    # q142: the three merge batches replayed as CASE expressions (later
    # batches win per column; batch 2/3 column subsets leave the other
    # column at its prior value), batch 3's upserted rows appended, then
    # the delete predicate
    d["q142_merge_battery"] = """
WITH base AS (
  SELECT CAST(c_custkey AS BIGINT) AS k,
         CAST(c_acctbal AS DOUBLE) AS v,
         c_mktsegment AS s
  FROM customer),
m AS (
  SELECT k,
    CASE WHEN k >= 3 AND k < 1500 AND (k - 3) % 103 = 0 THEN 0.25 * k
         WHEN k >= 1 AND k < 1500 AND (k - 1) % 97 = 0 THEN -1.0 * k
         ELSE v END AS v,
    CASE WHEN k >= 3 AND k < 1500 AND (k - 3) % 103 = 0 THEN 'BOTH'
         WHEN k >= 2 AND k < 1500 AND (k - 2) % 101 = 0 THEN 'MERGED'
         ELSE s END AS s
  FROM base
  UNION ALL
  SELECT 10000000 + i AS k, CAST(1.0 AS DOUBLE) AS v, 'X' AS s
  FROM range(5) t(i))
SELECT k, v, s FROM m WHERE k % 10 <> 7 ORDER BY k"""
    # q143: streaming ingest ≡ batch load (* 0.5 exact in IEEE double);
    # a duplicated or dropped micro-batch breaks the row set
    d["q143_stream_ingest"] = """
SELECT CAST(o_orderkey AS BIGINT) AS k,
       CAST(o_totalprice AS DOUBLE) AS p,
       CAST(o_totalprice AS DOUBLE) * 0.5 AS margin
FROM orders ORDER BY k"""
    # q144: exact L2 nearest neighbors of the fixed query vector
    d["q144_similarity_expr"] = f"""
WITH s AS (SELECT CAST(vec_id AS INT) AS vid,
                  CAST(unnest(embedding) AS DOUBLE) AS e,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings),
q AS (SELECT {_vec_lit()} AS v),
d AS (SELECT vid,
             round(sqrt(sum((e - q.v[i]) * (e - q.v[i]))), 6) AS dist
      FROM s, q GROUP BY vid)
SELECT vid, dist FROM d ORDER BY dist, vid LIMIT 20"""
    # q145: schema-as-of-version replay — extra visible (with values)
    # only at v3, absent at v1 and after the revert (insert undone too)
    d["q145_schema_time_travel"] = """
WITH src AS (SELECT CAST(n_nationkey AS INT) AS nk FROM nation
             WHERE n_nationkey < 20)
SELECT 'at_v1' AS stage, nk, CAST(NULL AS INT) AS val, 3 AS ncols FROM src
UNION ALL
SELECT 'at_v3', nk, CASE WHEN nk < 10 THEN nk * 7 END, 4 FROM src
UNION ALL
SELECT 'final', nk, CAST(NULL AS INT), 3 FROM src
ORDER BY stage, nk"""
    # q146: the deserialized plan must equal the direct aggregate
    d["q146_serialized_query"] = """
SELECT o_orderpriority AS prio,
       count(o_orderkey) AS n,
       round(sum(CAST(o_totalprice AS DOUBLE)), 2) AS rev
FROM orders WHERE CAST(o_totalprice AS DOUBLE) > 50000.0
GROUP BY prio ORDER BY prio"""
    # q147: streaming two-sided join == the batch time-window self-join
    d["q147_stream_stream_join"] = """
SELECT v.user_id AS user_id,
       count(*) AS n_pairs,
       round(sum(p.value), 4) AS attributed
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
GROUP BY v.user_id ORDER BY user_id"""
    # q148: resampler length arithmetic replayed closed-form
    d["q148_audio_resample"] = """
WITH p AS (
  SELECT doc_id,
         CAST(doc_id % 20 AS INT) AS key
  FROM documents),
q AS (
  SELECT doc_id,
         CASE key % 4 WHEN 0 THEN 8000 WHEN 1 THEN 11025
                      WHEN 2 THEN 22050 ELSE 44100 END AS rate_in,
         400 + 37 * key AS n_in
  FROM p)
SELECT doc_id, rate_in, CAST(n_in AS INT) AS n_in,
       16000 AS rate_out,
       CAST(round(n_in * 16000.0 / rate_in) AS INT) AS n_out,
       round(1000.0 * round(n_in * 16000.0 / rate_in) / 16000, 6)
         AS dur_ms
FROM q ORDER BY doc_id"""
    # q153: KN bigram LM + CCNet buckets — FULL pipeline replay
    # (tokenize, vocab top-500 with count-desc/token-asc tie-break,
    # <unk> map, bigram/context/continuation counts, add-one
    # continuation smoothing, interpolated-KN logp, ppl, NTILE thirds)
    d["q153_kn_perplexity"] = """
WITH toks AS (
  SELECT doc_id,
         list_prepend('<s>', regexp_extract_all(lower(text), '\\S+'))
           AS l
  FROM documents WHERE text IS NOT NULL),
raw_pairs AS (
  SELECT doc_id, p[1] AS w1, p[2] AS w2
  FROM toks, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS u(p)),
train_pairs AS (SELECT * FROM raw_pairs WHERE doc_id % 5 = 0),
vocab AS (
  SELECT w2 AS tok FROM train_pairs GROUP BY w2
  ORDER BY count(*) DESC, w2 LIMIT 500),
tmap AS (
  SELECT t.doc_id,
         CASE WHEN t.w1 = '<s>' THEN '<s>'
              WHEN v1.tok IS NOT NULL THEN t.w1
              ELSE '<unk>' END AS w1,
         CASE WHEN v2.tok IS NOT NULL THEN t.w2
              ELSE '<unk>' END AS w2
  FROM train_pairs t
  LEFT JOIN vocab v1 ON t.w1 = v1.tok
  LEFT JOIN vocab v2 ON t.w2 = v2.tok),
bigrams AS (
  SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c FROM tmap GROUP BY 1, 2),
contexts AS (
  SELECT w1, sum(c) AS ctx, CAST(count(*) AS DOUBLE) AS nfollow
  FROM bigrams GROUP BY 1),
consts AS (
  SELECT (SELECT count(*) FROM bigrams) AS t,
         (SELECT count(*) FROM vocab) + 1 AS vp),
pcont AS (
  SELECT vv.w2,
         (coalesce(nc.n1, 0) + 1) / CAST(c.t + c.vp AS DOUBLE) AS pc
  FROM (SELECT tok AS w2 FROM vocab
        UNION ALL SELECT '<unk>') vv
  LEFT JOIN (SELECT w2, CAST(count(*) AS DOUBLE) AS n1
             FROM bigrams GROUP BY 1) nc ON vv.w2 = nc.w2
  CROSS JOIN consts c),
smap AS (
  SELECT r.doc_id,
         CASE WHEN r.w1 = '<s>' THEN '<s>'
              WHEN v1.tok IS NOT NULL THEN r.w1
              ELSE '<unk>' END AS w1,
         CASE WHEN v2.tok IS NOT NULL THEN r.w2
              ELSE '<unk>' END AS w2
  FROM raw_pairs r
  LEFT JOIN vocab v1 ON r.w1 = v1.tok
  LEFT JOIN vocab v2 ON r.w2 = v2.tok),
terms AS (
  SELECT s.doc_id,
         CASE WHEN cx.ctx IS NULL THEN ln(pcont.pc)
              ELSE ln(greatest(coalesce(b.c, 0) - 0.75, 0) / cx.ctx
                      + 0.75 * cx.nfollow / cx.ctx * pcont.pc)
         END AS lp
  FROM smap s
  LEFT JOIN bigrams b ON s.w1 = b.w1 AND s.w2 = b.w2
  LEFT JOIN contexts cx ON s.w1 = cx.w1
  JOIN pcont ON s.w2 = pcont.w2),
scored AS (
  SELECT doc_id, round(exp(-avg(lp)), 4) AS ppl
  FROM terms GROUP BY doc_id),
bucketed AS (
  SELECT doc_id, ppl,
         ntile(3) OVER (ORDER BY ppl, doc_id) AS bucket
  FROM scored)
SELECT bucket, count(*) AS n_docs,
       round(avg(ppl), 4) AS avg_ppl,
       round(min(ppl), 4) AS min_ppl,
       round(max(ppl), 4) AS max_ppl,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM bucketed GROUP BY bucket ORDER BY bucket"""
    # q159: table -> component view -> rollup chain — closed-form
    # token chunking (ceil(n/20)) over the replayed mutation history
    d["q159_component_rollup"] = r"""
WITH src AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 150),
nz AS (SELECT doc_id, text FROM src WHERE length(trim(text)) > 0),
v1 AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS n FROM nz),
final_docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 3 THEN 45
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n
  FROM nz WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT 100000 + i AS doc_id, i % 50 + 1 AS n FROM range(0, 40) t(i)),
agg_final AS (
  SELECT 'final' AS state, doc_id,
         CAST(ceil(n / 20.0) AS BIGINT) AS n_chunks FROM final_docs),
agg_v1 AS (
  SELECT 'v1' AS state, doc_id,
         CAST(ceil(n / 20.0) AS BIGINT) AS n_chunks FROM v1)
SELECT * FROM agg_final UNION ALL SELECT * FROM agg_v1
ORDER BY state, doc_id"""
    # q158: rollup maintenance — from-scratch aggregation of the
    # replayed mutation history, final state AND time travel to v1
    d["q158_rollup_maintenance"] = """
WITH base AS (
  SELECT c_custkey AS k, c_mktsegment AS seg,
         CAST(c_acctbal AS DOUBLE) AS bal
  FROM customer),
final_rows AS (
  SELECT k, CASE WHEN seg = 'BUILDING' THEN 'MOVED' ELSE seg END AS seg,
         bal
  FROM base
  WHERE NOT (bal < 0.0)
  UNION ALL
  SELECT 10000000 + i AS k,
         CASE WHEN i % 2 = 0 THEN 'FRESH' ELSE 'MOVED' END AS seg,
         CAST(100 * i AS DOUBLE) AS bal
  FROM range(0, 50) t(i)),
agg_final AS (
  SELECT 'final' AS state, seg, count(*) AS n,
         round(sum(bal), 2) AS total, round(avg(bal), 4) AS avg_bal,
         round(min(bal), 2) AS lo, round(max(bal), 2) AS hi
  FROM final_rows GROUP BY seg),
agg_v1 AS (
  SELECT 'v1' AS state, seg, count(*) AS n,
         round(sum(bal), 2) AS total, round(avg(bal), 4) AS avg_bal,
         round(min(bal), 2) AS lo, round(max(bal), 2) AS hi
  FROM base GROUP BY seg)
SELECT * FROM agg_final UNION ALL SELECT * FROM agg_v1
ORDER BY state, seg"""
    # q157: count-min — identical 4x1024 grid from the same md5
    # 32-bit slices; min-over-rows probes for the top-10 tokens
    d["q157_count_min"] = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
  FROM documents WHERE text IS NOT NULL),
cand AS (
  SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
  ORDER BY cnt DESC, tok LIMIT 10),
hashes AS (
  SELECT tok, md5('s' || tok) AS h
  FROM (SELECT DISTINCT tok FROM toks)),
cells AS (
  SELECT rr.r,
         CAST(('0x' || substr(h.h, rr.r * 8 + 1, 8)) AS BIGINT)
           % 1024 AS b,
         count(*) AS c
  FROM toks t JOIN hashes h ON t.tok = h.tok
  CROSS JOIN (VALUES (0), (1), (2), (3)) rr(r)
  GROUP BY 1, 2),
probed AS (
  SELECT cand.tok, cand.cnt, min(cells.c) AS est
  FROM cand
  JOIN hashes ON cand.tok = hashes.tok
  CROSS JOIN (VALUES (0), (1), (2), (3)) rr(r)
  JOIN cells ON cells.r = rr.r
            AND cells.b = CAST(('0x' || substr(hashes.h,
                                rr.r * 8 + 1, 8)) AS BIGINT) % 1024
  GROUP BY cand.tok, cand.cnt)
SELECT tok, est, cnt AS exact FROM probed ORDER BY tok"""
    # q156: streaming HLL distinct — per-hour md5-HLL register fold
    # replayed in SQL (HUGEINT indicator sums, linear-counting branch)
    d["q156_stream_approx_distinct"] = """
WITH hk AS (
  SELECT DISTINCT date_trunc('hour', ts) AS w,
         CAST(('0x' || substr(md5('i' || CAST(user_id AS VARCHAR)),
                              1, 16)) AS UBIGINT) AS h
  FROM events WHERE user_id IS NOT NULL),
rk AS (SELECT w, CAST(h % 2048 AS INT) AS j, h // 2048 AS ww FROM hk),
mk AS (SELECT w, j, max(54 - length(ltrim(bin(ww), '0'))) AS m
       FROM rk GROUP BY w, j),
win AS (SELECT DISTINCT w FROM hk),
regs AS (SELECT win.w, g.range AS j, coalesce(mk.m, 0) AS m
         FROM win CROSS JOIN range(0, 2048) g
         LEFT JOIN mk ON mk.w = win.w AND mk.j = g.range),
s AS (SELECT w, sum(CAST(1 AS BIGINT) << (53 - m)) AS s,
             sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS z
      FROM regs GROUP BY w),
est AS (SELECT w, z,
               0.7213 / (1 + 1.079 / 2048) * 2048 * 2048
                 * 9007199254740992.0 / CAST(s AS DOUBLE) AS raw
        FROM s)
SELECT w AS wstart,
       CASE WHEN raw <= 2.5 * 2048 AND z > 0
            THEN 2048 * ln(2048.0 / z) ELSE raw END AS approx_users
FROM est ORDER BY wstart"""
    # q155: KMV overlap — the oracle rebuilds the exact k-min hash
    # sets (same md5/canonical bytes, ORDER BY h LIMIT k) and replays
    # the estimator arithmetic; outputs are bit-identical doubles
    d["q155_kmv_overlap"] = """
WITH ha AS (
  SELECT DISTINCT substr(md5('i' || CAST(doc_id AS VARCHAR)), 1, 16)
           AS h
  FROM documents WHERE doc_id % 10 < 6),
hb AS (
  SELECT DISTINCT substr(md5('i' || CAST(doc_id AS VARCHAR)), 1, 16)
           AS h
  FROM documents WHERE doc_id % 10 >= 4),
ka AS (SELECT h FROM ha ORDER BY h LIMIT 512),
kb AS (SELECT h FROM hb ORDER BY h LIMIT 512),
ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
       ORDER BY h LIMIT 512),
ndv AS (
  SELECT
    (SELECT CASE WHEN count(*) < 512 THEN CAST(count(*) AS DOUBLE)
         ELSE 511.0 / ((CAST(CAST(('0x' || max(h)) AS UBIGINT)
                             AS DOUBLE) + 1.0)
                       / 18446744073709551616.0) END FROM ka) AS ndv_a,
    (SELECT CASE WHEN count(*) < 512 THEN CAST(count(*) AS DOUBLE)
         ELSE 511.0 / ((CAST(CAST(('0x' || max(h)) AS UBIGINT)
                             AS DOUBLE) + 1.0)
                       / 18446744073709551616.0) END FROM kb) AS ndv_b,
    (SELECT CASE WHEN count(*) < 512 THEN CAST(count(*) AS DOUBLE)
         ELSE 511.0 / ((CAST(CAST(('0x' || max(h)) AS UBIGINT)
                             AS DOUBLE) + 1.0)
                       / 18446744073709551616.0) END FROM ku)
      AS union_ndv,
    (SELECT count(*) FROM ku
     WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb))
      AS n_inter,
    (SELECT count(*) FROM ku) AS n_union)
SELECT ndv_a, ndv_b, union_ndv,
       (CAST(n_inter AS DOUBLE) / n_union) * union_ndv
         AS intersection_ndv,
       CAST(n_inter AS DOUBLE) / n_union AS jaccard
FROM ndv"""
    # q154: manifest-resident HLL NDV — the oracle replays the sketch
    # ESTIMATE bit-exactly (md5 over the engine's canonical key bytes,
    # p=11 bucket/rho register fold with an exact-integer indicator
    # sum, linear-counting correction) over the post-mutation live set
    d["q154_ndv_sketch"] = """
WITH live AS (
  SELECT doc_id AS k,
         CASE WHEN doc_id % 11 = 3 THEN 'upd'
              ELSE 'c' || CAST(doc_id % 50 AS VARCHAR) END AS cat
  FROM documents
  WHERE doc_id % 3 <> 2 AND doc_id % 7 <> 0),
hk AS (
  SELECT DISTINCT CAST(('0x' || substr(md5('i' ||
           CAST(k AS VARCHAR)), 1, 16)) AS UBIGINT) AS h
  FROM live),
hc AS (
  SELECT DISTINCT CAST(('0x' || substr(md5('s' || cat), 1, 16))
           AS UBIGINT) AS h
  FROM live),
rk AS (SELECT CAST(h % 2048 AS INT) AS j, h // 2048 AS w FROM hk),
rc AS (SELECT CAST(h % 2048 AS INT) AS j, h // 2048 AS w FROM hc),
mk AS (SELECT j, max(54 - length(ltrim(bin(w), '0'))) AS m
       FROM rk GROUP BY j),
mc AS (SELECT j, max(54 - length(ltrim(bin(w), '0'))) AS m
       FROM rc GROUP BY j),
regk AS (SELECT g.range AS j, coalesce(mk.m, 0) AS m
         FROM range(0, 2048) g LEFT JOIN mk ON g.range = mk.j),
regc AS (SELECT g.range AS j, coalesce(mc.m, 0) AS m
         FROM range(0, 2048) g LEFT JOIN mc ON g.range = mc.j),
sk AS (SELECT sum(CAST(1 AS BIGINT) << (53 - m)) AS s,
              sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS z FROM regk),
sc AS (SELECT sum(CAST(1 AS BIGINT) << (53 - m)) AS s,
              sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS z FROM regc),
estk AS (
  SELECT CASE WHEN 0.7213 / (1 + 1.079 / 2048) * 2048 * 2048
                   * 9007199254740992.0 / CAST(s AS DOUBLE)
                 <= 2.5 * 2048 AND z > 0
              THEN 2048 * ln(2048.0 / z)
              ELSE 0.7213 / (1 + 1.079 / 2048) * 2048 * 2048
                   * 9007199254740992.0 / CAST(s AS DOUBLE)
         END AS e FROM sk),
estc AS (
  SELECT CASE WHEN 0.7213 / (1 + 1.079 / 2048) * 2048 * 2048
                   * 9007199254740992.0 / CAST(s AS DOUBLE)
                 <= 2.5 * 2048 AND z > 0
              THEN 2048 * ln(2048.0 / z)
              ELSE 0.7213 / (1 + 1.079 / 2048) * 2048 * 2048
                   * 9007199254740992.0 / CAST(s AS DOUBLE)
         END AS e FROM sc)
SELECT CAST(round(estk.e) AS BIGINT) AS k_est,
       (SELECT count(DISTINCT k) FROM live) AS k_exact,
       CAST(round(estc.e) AS BIGINT) AS cat_est,
       (SELECT count(DISTINCT cat) FROM live) AS cat_exact
FROM estk, estc"""
    # q152: within-doc segment dedup — first-occurrence order replay
    d["q152_dedup_segments"] = """
WITH segs AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS seg,
         generate_subscripts(string_split(text, ' '), 1) AS ord
  FROM documents),
firsts AS (
  SELECT doc_id, seg, min(ord) AS first_ord
  FROM segs WHERE trim(seg) <> '' GROUP BY doc_id, seg)
SELECT doc_id,
       string_agg(seg, ' ' ORDER BY first_ord) AS deduped,
       CAST(count(*) AS INT) AS n_unique
FROM firsts GROUP BY doc_id ORDER BY doc_id"""
    # q151: deterministic shuffle-shard export — identical md5 replay
    d["q151_shuffle_shards"] = """
WITH h AS (
  SELECT doc_id,
         CAST(CAST('0x' || substr(md5('0_shard___' ||
              CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT) % 8 AS INT)
           AS shard,
         CAST('0x' || substr(md5('0_order___' ||
              CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT) AS k
  FROM documents)
SELECT shard, count(*) AS n, sum(doc_id) AS id_sum,
       (list(doc_id ORDER BY k, doc_id))[1:3] AS head_ids
FROM h GROUP BY shard ORDER BY shard"""
    # q150: leftOuter streaming replay + heartbeat flush == batch LEFT
    # time-window join (unmatched tail included)
    d["q150_stream_leftouter_join"] = """
SELECT v.user_id AS user_id,
       count(*) AS n_rows,
       count(p.event_id) AS n_matched,
       count(*) - count(p.event_id) AS n_unmatched,
       round(coalesce(sum(p.value), 0.0), 4) AS attributed
FROM (SELECT * FROM events WHERE event_type = 'view') v
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
GROUP BY v.user_id ORDER BY user_id"""
    # q149: constant-image PSNR/SSIM in closed form. For solid frames:
    # mse = (a-b)^2; ssim's contrast/structure term is exactly c2/c2=1,
    # leaving the luminance term (2ab+c1)/(a^2+b^2+c1).
    d["q149_image_quality"] = """
WITH p AS (SELECT doc_id, CAST(doc_id % 24 AS INT) AS key FROM documents),
v AS (SELECT doc_id,
             CAST(30 + 9 * key AS DOUBLE) AS a,
             CAST(least(255, 30 + 9 * key + (key % 5) * 11) AS DOUBLE) AS b
      FROM p)
SELECT doc_id,
       round(CASE WHEN a = b THEN 100.0
                  ELSE least(100.0, 20 * log10(255.0)
                             - 10 * log10((a - b) * (a - b))) END,
             6) AS p,
       round((2 * a * b + 6.5025) / (a * a + b * b + 6.5025), 6) AS s
FROM v ORDER BY doc_id"""
    return d
