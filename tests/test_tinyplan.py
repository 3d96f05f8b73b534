"""Focused battery for the round-12 tiny-plan execution mode
(pixeltable_spark/tinyplan.py) and its three application sites:
connected_components' star rounds, train_kn_bigram's post-vocab
section, and the mutation commit path (catalog._mutation_shuffle_conf).

Pins: (1) session confs are restored after each scope, including on
error and under nesting; (2) the scoped sections produce identical
results to the session-default plans; (3) the mutation scope pins the
shuffle width to the mutated table's n_buckets while active."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import pixeltable_spark as pxt
from pixeltable_spark.tinyplan import materialized_width, tiny_plan

AQE = "spark.sql.adaptive.enabled"
SHUF = "spark.sql.shuffle.partitions"


@pytest.fixture(scope="module")
def spark():
    return pxt.get_session(shuffle_partitions=8)


def test_tiny_plan_sets_and_restores(spark):
    aqe0, shuf0 = spark.conf.get(AQE), spark.conf.get(SHUF)
    with tiny_plan(spark, 3):
        assert spark.conf.get(AQE) == "false"
        assert spark.conf.get(SHUF) == "3"
        # a shuffle inside the scope lands on the pinned width
        n = (spark.range(100).groupBy((F.col("id") % 7).alias("k"))
             .count().rdd.getNumPartitions())
        assert n == 3
    assert spark.conf.get(AQE) == aqe0
    assert spark.conf.get(SHUF) == shuf0


def test_tiny_plan_restores_on_error(spark):
    aqe0, shuf0 = spark.conf.get(AQE), spark.conf.get(SHUF)
    with pytest.raises(RuntimeError):
        with tiny_plan(spark, 2):
            raise RuntimeError("boom")
    assert spark.conf.get(AQE) == aqe0
    assert spark.conf.get(SHUF) == shuf0


def test_tiny_plan_nested_keeps_outermost(spark):
    with tiny_plan(spark, 5):
        with tiny_plan(spark, 1):   # inner scope must NOT override
            assert spark.conf.get(SHUF) == "5"
        assert spark.conf.get(SHUF) == "5"
        assert spark.conf.get(AQE) == "false"


def test_tiny_plan_width_floor(spark):
    with tiny_plan(spark, 0):       # degenerate width clamps to 1
        assert spark.conf.get(SHUF) == "1"


def test_materialized_width_is_checkpoint_width(spark):
    df = spark.range(1000).repartition(4).localCheckpoint(eager=True)
    assert materialized_width(df) == 4


def test_connected_components_matches_default_mode(spark):
    """The star loop's tiny-plan result must equal the same loop run
    with plain session confs (partitioning cannot change results)."""
    from pixeltable_spark.operators.dedup import connected_components

    edges = [(i, i + 1) for i in range(0, 40, 2)]          # 20 chains
    edges += [(1, 3), (3, 5), (100, 101), (101, 102)]       # merges
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {(r["id"], r["component"])
           for r in connected_components(pairs).collect()}
    # closed-form expectation: union-find on the driver
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {(x, find(x)) for x in parent}
    assert got == want
    # and the session is back to defaults afterwards
    assert spark.conf.get(AQE) == "true"
    assert spark.conf.get(SHUF) == "8"


def test_kn_trainer_restores_confs(spark):
    from pixeltable_spark.operators.ngram_lm import train_kn_bigram

    docs = spark.createDataFrame(
        [(i, "a b c a b " + ("x y " * (i % 3))) for i in range(30)],
        "doc_id long, text string")
    model = train_kn_bigram(docs, vocab_size=10, discount=0.75)
    assert model.vocab.count() > 0
    assert spark.conf.get(AQE) == "true"
    assert spark.conf.get(SHUF) == "8"


def test_mutation_scope_uses_n_buckets_and_restores(spark, tmp_path):
    cat = pxt.Catalog(spark, str(tmp_path))
    t = cat.create_table("t", {"k": pxt.Int(False),
                               "v": pxt.Float(True)}, n_buckets=3)
    seen = {}
    orig = type(t).insert.__wrapped__   # the undecorated mutation body

    def spy(self, *a, **kw):
        seen["aqe"] = spark.conf.get(AQE)
        seen["shuf"] = spark.conf.get(SHUF)
        return orig(self, *a, **kw)

    import pixeltable_spark.catalog as catmod
    wrapped_spy = catmod._locked_mutation(spy)
    try:
        type(t).insert = wrapped_spy
        t.insert([{"k": i, "v": float(i)} for i in range(10)])
    finally:
        type(t).insert = catmod._locked_mutation(orig)
    assert seen["aqe"] == "false"
    assert seen["shuf"] == "3"          # the table's n_buckets
    assert spark.conf.get(AQE) == "true"
    assert spark.conf.get(SHUF) == "8"
    assert t.df().count() == 10
