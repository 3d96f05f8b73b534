"""Scale-evidence harness: replicate the sf0.1 driver testdata Nx with
remapped ids (and a per-replica text suffix so documents are near- but
not exact duplicates — the realistic heavy-duplication corpus shape),
then time headline operators at each factor and report wall seconds +
the empirical scaling exponent e where wall ~ factor^e (e <= ~1.1 means
the operator scales linearly or better on fixed hardware; superlinear
exponents flag shuffle/skew pathologies that would bite a 1000-executor
cluster).

Usage: python tools/scale_bench.py [factor ...]   (default: 1 5 25)
Writes SCALE.md at the repo root.

`--distinct` builds DISTINCT data instead of near-duplicate replicas:
document token order is rotated per replica and a replica-salt token is
injected (shingle sets differ, so dedup operators see a realistic
mostly-unique corpus), and lineitem quantities/prices are perturbed
per replica. x10 of sf0.1 == sf1-equivalent row counts (~6M distinct
lineitems, ~500k distinct documents) — the round-7 verdict's headroom
ask: confirm the exponents hold when the corpus is NOT duplication-
heavy. Appends a second section to SCALE.md.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

import pixeltable_spark as pxt  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = "/tmp/pxt_scale"
ID_STRIDE = 1_000_000_000


def build(spark, factor: int, distinct: bool = False) -> str:
    """Replicate documents/embeddings/events/lineitem `factor` times
    into parquet with enough files for full scan parallelism. With
    `distinct`, replicas are made substantially UNIQUE (rotated token
    order + salt token; perturbed lineitem measures) instead of
    near-duplicates."""
    out = os.path.join(OUT_DIR, f"x{factor}{'d' if distinct else ''}")
    if os.path.isdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    reps = spark.range(factor).withColumnRenamed("id", "__rep")

    def _write(name, df):
        df.repartition(32).write.mode("overwrite") \
          .parquet(os.path.join(out, f"{name}.parquet"))

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if distinct:
        # rotate word order by a per-(replica, doc) offset and inject a
        # salt token: almost every word 3-gram changes, so the corpus is
        # genuinely distinct for shingle/minhash/fingerprint purposes
        words = F.split(F.col("text"), " ")
        k = ((F.col("__rep") * 31 + F.col("doc_id")) % F.greatest(
            F.size(words), F.lit(1))).cast("int") + 1
        rotated = F.concat_ws(
            " ",
            F.concat(F.slice(words, k, 1 << 30),
                     F.slice(words, 1, k - 1)))
        text = F.concat(rotated, F.lit(" u"),
                        (F.col("__rep") * ID_STRIDE + F.col("doc_id"))
                        .cast("string"))
    else:
        text = F.concat(F.col("text"), F.lit(" r"),
                        F.col("__rep").cast("string"))
    _write("documents", docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("__rep") * ID_STRIDE).alias("doc_id"),
        text.alias("text"),
        "lang", "source", "n_chars"))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    _write("embeddings", emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("__rep") * ID_STRIDE).alias("vec_id"),
        *[c for c in emb.columns if c != "vec_id"]))
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    _write("events", ev.crossJoin(reps).select(
        (F.col("event_id") + F.col("__rep") * ID_STRIDE).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("__rep") * ID_STRIDE).alias("user_id"),
        "event_type", "value", "props"))
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li_rest = [c for c in li.columns
               if c not in ("l_orderkey", "l_quantity", "l_extendedprice")]
    if distinct:
        _write("lineitem", li.crossJoin(reps).select(
            (F.col("l_orderkey") + F.col("__rep") * ID_STRIDE)
            .alias("l_orderkey"),
            (F.col("l_quantity") + (F.col("__rep") % 7))
            .alias("l_quantity"),
            (F.col("l_extendedprice")
             * (1.0 + (F.col("__rep") % 13) / 100.0))
            .alias("l_extendedprice"),
            *li_rest))
    else:
        _write("lineitem", li.crossJoin(reps).select(
            (F.col("l_orderkey") + F.col("__rep") * ID_STRIDE)
            .alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"]))
    return out


def _ops(spark, d: str):
    """name -> thunk returning a materialized count (forces the plan)."""
    from pixeltable_spark.operators import dedup, similarity
    from pixeltable_spark.operators import text as textops
    from pixeltable_spark.operators.langid import lang_id_table
    from pixeltable_spark.operators import mldata, sketches
    from pixeltable_spark.operators.ngram_lm import (kn_perplexity,
                                                     train_kn_bigram)
    from pixeltable_spark.operators.search import bm25_topk
    from pixeltable_spark.operators.timeseries import funnel

    def docs():
        return spark.read.parquet(f"{d}/documents.parquet")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    q = [round(((i * 37) % 19 - 9) / 10.0, 1) for i in range(64)]

    def _kn():
        # full pipeline: train on the 1-in-5 slice, score the corpus
        m = train_kn_bigram(docs().where(F.col("doc_id") % 5 == 0),
                            vocab_size=500)
        return kn_perplexity(docs(), m)

    return {
        "tpch_q1_agg": lambda: noop(
            spark.read.parquet(f"{d}/lineitem.parquet")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.avg("l_extendedprice"),
                 F.count("*"))),
        "exact_dedup_reps": lambda: noop(
            docs().select("doc_id",
                          textops.fingerprint(F.col("text")).alias("fp"))
            .groupBy("fp").agg(F.min("doc_id"))),
        "minhash_lsh_pairs": lambda: noop(
            dedup.minhash_lsh_pairs(docs(), num_hashes=16, bands=4)),
        "lang_id_table": lambda: noop(
            lang_id_table(docs(), "doc_id", "text")
            .groupBy("lang_pred").count()),
        "gopher_filter": lambda: noop(
            textops.gopher_filter(docs(), min_words=10, min_stopwords=0)),
        "bm25_topk": lambda: noop(
            bm25_topk(docs(), [("q1", "merge sort join")], k=10)),
        "funnel": lambda: noop(funnel(
            spark.read.parquet(f"{d}/events.parquet"),
            "ts", "event_type", ["signup", "view", "purchase"],
            by="user_id")),
        "topk_cosine": lambda: noop(similarity.topk_cosine(
            spark.read.parquet(f"{d}/embeddings.parquet"), q, k=10)),
        "kn_perplexity": lambda: noop(_kn()),
        "shuffle_shards": lambda: noop(mldata.shuffle_shards(
            docs().select("doc_id"), 64, "doc_id", seed=0)),
        "dedup_segments": lambda: noop(docs().select(
            textops.dedup_segments(F.col("text"), " ").alias("t"))),
        "kmv_overlap": lambda: noop(sketches.corpus_overlap(
            docs().where(F.col("doc_id") % 10 < 6),
            docs().where(F.col("doc_id") % 10 >= 4),
            "doc_id", k=1024, kind="int")),
    }


def main(distinct: bool = False, only: set | None = None) -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 5, 25]
    spark = pxt.get_session(app_name="pxt_scale_bench")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = {f: build(spark, f, distinct) for f in factors}
    results: dict[str, dict[int, float]] = {}
    for f in factors:
        for name, thunk in _ops(spark, dirs[f]).items():
            if only and name not in only:
                continue
            t0 = time.time()
            thunk()
            t1 = time.time()
            thunk()  # min-of-2, same rationale as bench.py
            dt = min(t1 - t0, time.time() - t1)
            results.setdefault(name, {})[f] = dt
            print(f"x{f:<3} {name:20s} {dt:7.2f}s", flush=True)
    lo, hi = min(factors), max(factors)
    if distinct:
        lines = ["", "## sf1-equivalent headroom run (DISTINCT data)", "",
                 f"Same operators over `{SF_DIR}` expanded with rotated-",
                 "token distinct documents and perturbed lineitem",
                 "measures (NOT near-duplicates — the round-7 verdict's",
                 f"headroom ask). x10 == sf1-equivalent cardinality",
                 "(~6M distinct lineitems, ~500k distinct documents).", ""]
    else:
        lines = ["# SCALE — replicated-corpus scaling evidence", "",
                 f"Base data: `{SF_DIR}` replicated with remapped ids and a",
                 "per-replica text suffix (near-duplicate corpus — the",
                 "realistic shape for dedup ops). Wall seconds are min-of-2",
                 f"on local[32]; exponent e fits wall ~ factor^e between",
                 f"x{lo} and x{hi} (e <= ~1.1 = linear-or-better; the",
                 "sublinear cases are fixed-cost-dominated at this size).",
                 ""]
    lines += ["| operator | " + " | ".join(f"x{f} (s)" for f in factors)
              + " | exponent e |",
              "|---|" + "---|" * (len(factors) + 1)]
    for name, times in results.items():
        e = (math.log(times[hi] / times[lo]) / math.log(hi / lo)
             if hi > lo and times[lo] > 0 else float("nan"))
        lines.append("| " + name + " | "
                     + " | ".join(f"{times[f]:.2f}" for f in factors)
                     + f" | {e:.2f} |")
    path = os.path.join(ROOT, "SCALE.md")
    mode = "a" if (distinct or only) else "w"
    if only:
        # incremental section: drop the full-file header, keep the table
        table_at = next(i for i, ln in enumerate(lines)
                        if ln.startswith("| operator"))
        lines = ["", "## incremental op run "
                 f"({', '.join(sorted(only))})", "",
                 "Same harness as §1 (near-duplicate replicas, "
                 "min-of-2 walls, e fits wall ~ factor^e).",
                 ""] + lines[table_at:]
    with open(path, mode) as fh:
        fh.write("\n".join(lines) + "\n")
    print(("appended to" if distinct else "wrote") + " SCALE.md")


if __name__ == "__main__":
    if "--clean" in sys.argv:
        shutil.rmtree(OUT_DIR, ignore_errors=True)
        sys.argv.remove("--clean")
    _distinct = "--distinct" in sys.argv
    if _distinct:
        sys.argv.remove("--distinct")
    _only = None
    for a in list(sys.argv):
        if a.startswith("--ops="):
            _only = set(a[6:].split(","))
            sys.argv.remove(a)
    main(distinct=_distinct, only=_only)
