"""Differential fuzzing: random expression trees evaluated through the
engine's Expr -> Column compiler vs DuckDB running the mirrored SQL on
identical data. Catches operator-semantics drift (sign rules, null
handling, precedence, casts) that hand-written cases miss — the
property-based arm of the oracle strategy (SURVEY §5).

Every generated node yields BOTH sides at once — an engine Expr builder
and the SQL string with identical tree shape — so the comparison
isolates evaluation semantics, not plan rewrites.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pixeltable_spark as pxt
from pixeltable_spark.functions import math as pxtm

ROWS = [
    {"k": i,
     "a": float((i * 7) % 13) - 6.0,
     "b": float((i * 11) % 17) / 4.0,
     "c": (i * 3) % 9,
     "s": f"Doc {i} alpha" if i % 3 else f"doc {i} BETA",
     }
    for i in range(60)
]


@pytest.fixture(scope="module")
def tbl(spark):
    df = spark.createDataFrame(
        ROWS, "k long, a double, b double, c long, s string")
    return pxt.TableRef.from_df(df, "fuzz", rowid_cols=["k"])


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE fuzz (k BIGINT, a DOUBLE, b DOUBLE, c BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO fuzz VALUES (?, ?, ?, ?, ?)",
                    [(r["k"], r["a"], r["b"], r["c"], r["s"]) for r in ROWS])
    return con


# -- paired generators: (engine expr builder, sql string) -------------------

def num_leaf():
    return st.one_of(
        st.sampled_from([("a", "a"), ("b", "b"), ("c", "c")]).map(
            lambda p: (lambda t: getattr(t, p[0]), p[1])),
        st.integers(-9, 9).map(lambda v: (lambda t: pxt.Literal(v), str(v))),
        st.floats(-8, 8, allow_nan=False).map(
            lambda v: (lambda t: pxt.Literal(round(v, 3)),
                       repr(round(v, 3)))),
    )


def num_expr(depth: int = 0):
    if depth >= 3:
        return num_leaf()
    sub = st.deferred(lambda: num_expr(depth + 1))

    def binop(op):
        def mk(pair):
            (fl, sl), (fr, sr) = pair
            build = {"+": lambda t: fl(t) + fr(t),
                     "-": lambda t: fl(t) - fr(t),
                     "*": lambda t: fl(t) * fr(t)}[op]
            return (build, f"({sl} {op} {sr})")
        return st.tuples(sub, sub).map(mk)

    def unfn(name):
        def mk(pair):
            f, sql = pair
            build = {"abs": lambda t: pxtm.abs(f(t)),
                     "floor": lambda t: pxtm.floor(f(t)),
                     "ceil": lambda t: pxtm.ceil(f(t))}[name]
            # DuckDB floor/ceil return DOUBLE for DOUBLE; match Spark's
            return (build, f"{name}({sql})")
        return sub.map(mk)

    return st.one_of(num_leaf(), binop("+"), binop("-"), binop("*"),
                     unfn("abs"), unfn("floor"), unfn("ceil"))


def bool_expr():
    cmp_ops = [("<", "<"), ("<=", "<="), (">", ">"), (">=", ">="),
               ("==", "="), ("!=", "<>")]

    def mk_cmp(t3):
        (fl, sl), (fr, sr), (py_op, sql_op) = t3
        build = {"<": lambda t: fl(t) < fr(t),
                 "<=": lambda t: fl(t) <= fr(t),
                 ">": lambda t: fl(t) > fr(t),
                 ">=": lambda t: fl(t) >= fr(t),
                 "==": lambda t: fl(t) == fr(t),
                 "!=": lambda t: fl(t) != fr(t)}[py_op]
        return (build, f"({sl} {sql_op} {sr})")

    cmp = st.tuples(num_expr(1), num_expr(1),
                    st.sampled_from(cmp_ops)).map(mk_cmp)

    def mk_logic(t3):
        (fl, sl), (fr, sr), op = t3
        if op == "and":
            return (lambda t: fl(t) & fr(t), f"({sl} AND {sr})")
        if op == "or":
            return (lambda t: fl(t) | fr(t), f"({sl} OR {sr})")
        return (lambda t: ~fl(t), f"(NOT {sl})")

    logic = st.tuples(cmp, cmp, st.sampled_from(["and", "or", "not"])).map(mk_logic)
    return st.one_of(cmp, logic)


def str_expr():
    def mk(t2):
        base, fn = t2
        builders = {
            "upper": (lambda t: getattr(t, base).upper(), f"upper({base})"),
            "lower": (lambda t: getattr(t, base).lower(), f"lower({base})"),
            "len": (lambda t: getattr(t, base).len(), f"length({base})"),
            "reverse": (lambda t: getattr(t, base).reverse(),
                        f"reverse({base})"),
            "strip": (lambda t: getattr(t, base).strip(), f"trim({base})"),
        }
        return builders[fn]
    return st.tuples(st.just("s"),
                     st.sampled_from(["upper", "lower", "len", "reverse",
                                      "strip"])).map(mk)


def _run(tbl, duck, build, sql, is_float):
    got = [r["v"] for r in
           tbl.select(tbl.k, v=build(tbl)).order_by(tbl.k).collect()]
    exp = [r[0] for r in duck.execute(
        f"SELECT {sql} AS v FROM fuzz ORDER BY k").fetchall()]
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        if g is None or e is None:
            assert g is None and e is None, (g, e, sql)
        elif is_float and isinstance(g, float):
            assert math.isclose(g, float(e), rel_tol=1e-9, abs_tol=1e-9), \
                (g, e, sql)
        else:
            assert g == e, (g, e, sql)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pair=num_expr())
def test_numeric_exprs_match_duckdb(tbl, duck, pair):
    build, sql = pair
    _run(tbl, duck, build, sql, is_float=True)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pair=bool_expr())
def test_predicates_match_duckdb(tbl, duck, pair):
    build, sql = pair
    _run(tbl, duck, build, sql, is_float=False)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pair=str_expr())
def test_string_exprs_match_duckdb(tbl, duck, pair):
    build, sql = pair
    _run(tbl, duck, build, sql, is_float=False)


# -- python-semantics division / modulo (the classic drift area) ------------

def divmod_expr():
    """Engine % and // follow PYTHON sign semantics; mirror them in SQL
    explicitly (DuckDB's native % is C-style / fmod)."""
    def mk(t3):
        (fl, sl), d, op = t3
        if op == "%":
            # python a % d (d>0 literal): ((a % d) + d) % d
            return (lambda t: fl(t) % d,
                    f"(((({sl}) % {d}) + {d}) % {d})")
        if op == "//":
            return (lambda t: fl(t) // d,
                    f"CAST(floor(({sl}) / {d}.0) AS DOUBLE)")
        return (lambda t: fl(t) / d, f"(({sl}) / {d}.0)")

    return st.tuples(num_expr(1), st.integers(1, 7),
                     st.sampled_from(["%", "//", "/"])).map(mk)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pair=divmod_expr())
def test_python_division_semantics_match_mirrored_sql(tbl, duck, pair):
    build, sql = pair
    _run(tbl, duck, build, sql, is_float=True)


# -- timestamp field extraction --------------------------------------------

TS_ROWS = [
    {"k": i,
     "ts": __import__("datetime").datetime(
         2020 + i % 6, 1 + (i * 5) % 12, 1 + (i * 11) % 28,
         (i * 7) % 24, (i * 13) % 60, (i * 17) % 60)}
    for i in range(50)
]


@pytest.fixture(scope="module")
def ts_tbl(spark):
    df = spark.createDataFrame(TS_ROWS, "k long, ts timestamp")
    return pxt.TableRef.from_df(df, "fuzzts", rowid_cols=["k"])


@pytest.fixture(scope="module")
def ts_duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE fuzzts (k BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO fuzzts VALUES (?, ?)",
                    [(r["k"], r["ts"]) for r in TS_ROWS])
    return con


def ts_expr():
    from pixeltable_spark.functions import timestamp as pxts
    fields = {
        "year": (pxts.year, "year(ts)"),
        "month": (pxts.month, "month(ts)"),
        "day": (pxts.day, "day(ts)"),
        "hour": (pxts.hour, "hour(ts)"),
        "minute": (pxts.minute, "minute(ts)"),
        "second": (pxts.second, "CAST(second(ts) AS BIGINT)"),
        "isoweekday": (pxts.isoweekday, "isodow(ts)"),
        "posix": (pxts.posix_timestamp, "epoch(ts)"),
    }

    def mk(name):
        fn, sql = fields[name]
        return (lambda t: fn(t.ts), sql)
    return st.sampled_from(sorted(fields)).map(mk)


@settings(max_examples=16, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pair=ts_expr())
def test_timestamp_fields_match_duckdb(ts_tbl, ts_duck, pair):
    build, sql = pair
    got = [r["v"] for r in
           ts_tbl.select(ts_tbl.k, v=build(ts_tbl)).order_by(ts_tbl.k).collect()]
    exp = [r[0] for r in ts_duck.execute(
        f"SELECT {sql} AS v FROM fuzzts ORDER BY k").fetchall()]
    for g, e in zip(got, exp):
        if isinstance(g, float) or isinstance(e, float):
            assert math.isclose(float(g), float(e)), (g, e, sql)
        else:
            assert g == e, (g, e, sql)


# -- joined-aggregate fuzzing ------------------------------------------------
# random (join type, filter, group key, aggregate battery) trees built as
# paired engine-query + mirrored-SQL, run on fuzz (fact) x fuzzdim (dim).
# The dim covers only keys 0..5, so left joins produce genuine null dim
# rows and null group keys — the semantics hand-written cases get wrong.

DIM_ROWS = [{"d": i, "name": f"grp{i % 3}", "w": float(i) * 1.5 - 2.0}
            for i in range(6)]


@pytest.fixture(scope="module")
def dim_tbl(spark):
    df = spark.createDataFrame(DIM_ROWS, "d long, name string, w double")
    return pxt.TableRef.from_df(df, "fuzzdim", rowid_cols=["d"])


@pytest.fixture(scope="module")
def duck_joined(duck):
    duck.execute("CREATE TABLE IF NOT EXISTS fuzzdim "
                 "(d BIGINT, name VARCHAR, w DOUBLE)")
    if duck.execute("SELECT count(*) FROM fuzzdim").fetchone()[0] == 0:
        duck.executemany("INSERT INTO fuzzdim VALUES (?, ?, ?)",
                         [(r["d"], r["name"], r["w"]) for r in DIM_ROWS])
    return duck


AGGS = {
    "sum": (lambda e: __import__("pixeltable_spark").functions.sum(e), "sum"),
    "min": (lambda e: __import__("pixeltable_spark").functions.min(e), "min"),
    "max": (lambda e: __import__("pixeltable_spark").functions.max(e), "max"),
    "mean": (lambda e: __import__("pixeltable_spark").functions.mean(e),
             "avg"),
    "count": (lambda e: __import__("pixeltable_spark").functions.count(e),
              "count"),
}


def joined_agg_query():
    """(runner, sql) pairs: runner(fact_tbl, dim_tbl) -> engine rows."""
    def mk(parts):
        how, (pf, psql), key_choice, agg_names, (af, asql) = parts
        sql_join = {"inner": "JOIN", "left": "LEFT JOIN"}[how]
        keys = {"fact": ("c", "f.c"), "dim": ("name", "d.name"),
                "both": (None, "f.c, d.name")}[key_choice]

        def run(f, d):
            q = f.join(d, on=f.c == d.d, how=how).where(pf(f))
            if key_choice == "fact":
                gb, sel = [f.c], {"g0": f.c}
            elif key_choice == "dim":
                gb, sel = [d.name], {"g0": d.name}
            else:
                gb, sel = [f.c, d.name], {"g0": f.c, "g1": d.name}
            items = dict(sel)
            for i, nm in enumerate(agg_names):
                mkfn, _ = AGGS[nm]
                # aggregate over a numeric expr of the FACT side
                items[f"v{i}"] = mkfn(af(f))
            return q.group_by(*gb).select(**items).collect()

        import re as _re

        def _qual(x):
            # qualify bare column refs a/b/c as f.<col>; word boundaries
            # keep function names (abs, ceil) intact
            return _re.sub(r"\b([abc])\b", r"f.\1", x)

        agg_sql = ", ".join(
            f"{AGGS[nm][1]}({_qual(asql)}) AS v{i}"
            for i, nm in enumerate(agg_names))
        gsel = keys[1]
        galias = ", ".join(f"{c} AS g{i}"
                           for i, c in enumerate(gsel.split(", ")))
        sql = (f"SELECT {galias}, {agg_sql} FROM fuzz f {sql_join} fuzzdim d "
               f"ON f.c = d.d WHERE {_qual(psql)} "
               f"GROUP BY {gsel}")
        return (run, sql, len(gsel.split(", ")), list(agg_names))

    return st.tuples(
        st.sampled_from(["inner", "left"]),
        bool_expr(),
        st.sampled_from(["fact", "dim", "both"]),
        st.lists(st.sampled_from(sorted(AGGS)), min_size=1, max_size=3,
                 unique=True),
        num_expr(1),
    ).map(mk)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=joined_agg_query())
def test_joined_aggregates_match_duckdb(tbl, dim_tbl, duck_joined, q):
    run, sql, n_keys, agg_names = q
    got_rows = run(tbl, dim_tbl)
    exp_rows = duck_joined.execute(sql).fetchall()
    assert len(got_rows) == len(exp_rows), sql

    def norm(v):
        if isinstance(v, float):
            return round(v, 6)
        return v

    got = sorted([tuple(norm(r[f"g{i}"]) for i in range(n_keys))
                  + tuple(norm(r[f"v{i}"]) for i in range(len(agg_names)))
                  for r in got_rows], key=lambda t: tuple(str(x) for x in t))
    exp = sorted([tuple(norm(v) for v in row) for row in exp_rows],
                 key=lambda t: tuple(str(x) for x in t))
    for g, e in zip(got, exp):
        for gv, ev in zip(g, e):
            if isinstance(gv, float) and ev is not None:
                assert math.isclose(gv, float(ev),
                                    rel_tol=1e-6, abs_tol=1e-6), (g, e, sql)
            else:
                assert gv == ev, (g, e, sql)


# -- window-function fuzzing -------------------------------------------------
# random running aggregates (the engine's UDA window form: ROWS UNBOUNDED
# PRECEDING..CURRENT ROW) and ranking/navigation functions vs DuckDB with
# an explicit ROWS frame and a tie-free composite order key.

WIN_AGGS = {
    "sum": "sum", "min": "min", "max": "max", "count": "count",
    "mean": "avg",
}


def window_query():
    def mk(parts):
        agg_name, (af, asql), part_by = parts
        import re as _re

        def run(f):
            import pixeltable_spark as _pxt
            fn = getattr(_pxt.functions, agg_name)
            kwargs = {"order_by": [f.k]}
            if part_by:
                kwargs["group_by"] = f.c
            sel = {"k": f.k, "v": fn(af(f), **kwargs)}
            return f.select(**sel).order_by(f.k).collect()

        part_sql = "PARTITION BY c " if part_by else ""
        expr = _re.sub(r"\b([abc])\b", r"\1", asql)
        sql = (f"SELECT k, {WIN_AGGS[agg_name]}({expr}) OVER "
               f"({part_sql}ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING "
               f"AND CURRENT ROW) AS v FROM fuzz ORDER BY k")
        return (run, sql)

    return st.tuples(
        st.sampled_from(sorted(WIN_AGGS)),
        num_expr(1),
        st.booleans(),
    ).map(mk)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=window_query())
def test_running_windows_match_duckdb(tbl, duck, q):
    run, sql = q
    got = {r["k"]: r["v"] for r in run(tbl)}
    exp = dict(duck.execute(sql).fetchall())
    assert got.keys() == exp.keys()
    for k in got:
        g, e = got[k], exp[k]
        if g is None or e is None:
            assert g is None and e is None, (k, g, e, sql)
        elif isinstance(g, float):
            assert math.isclose(g, float(e), rel_tol=1e-9, abs_tol=1e-9), \
                (k, g, e, sql)
        else:
            assert g == e, (k, g, e, sql)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(fn_name=st.sampled_from(["rank", "dense_rank", "row_number"]))
def test_ranking_windows_match_duckdb(tbl, duck, fn_name):
    import pixeltable_spark as _pxt
    fn = getattr(_pxt.functions, fn_name)
    got = {r["k"]: r["v"] for r in tbl.select(
        k=tbl.k, v=fn(group_by=tbl.c, order_by=[tbl.a, tbl.k])
    ).order_by(tbl.k).collect()}
    sqlfn = {"rank": "rank()", "dense_rank": "dense_rank()",
             "row_number": "row_number()"}[fn_name]
    exp = dict(duck.execute(
        f"SELECT k, {sqlfn} OVER (PARTITION BY c ORDER BY a, k) "
        "FROM fuzz ORDER BY k").fetchall())
    assert got == exp


# ---------------------------------------------------------------------------
# weighted-Jaccard differential suite: random corpora + random thresholds
# vs the DuckDB formulation (multiset semantics, max_df cap included)
# ---------------------------------------------------------------------------

def _wj_corpus(seed: int):
    rng = random.Random(seed)
    vocab = [f"w{j}" for j in range(rng.randint(5, 18))]
    rows = []
    n = rng.randint(6, 20)
    for i in range(n):
        toks = [rng.choice(vocab) for _ in range(rng.randint(1, 30))]
        rows.append((i, " ".join(toks)))
    if rng.random() < 0.7 and n > 2:   # seeded dup / near-dup
        rows.append((n, rows[0][1]))
        rows.append((n + 1, rows[1][1] + " " + rng.choice(vocab)))
    return rows


_WJ_ORACLE = r"""
WITH toks AS (SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS words
              FROM {tbl}),
tf0 AS (SELECT doc_id, term, count(*) AS cnt
        FROM (SELECT doc_id, unnest(words) AS term FROM toks)
        WHERE term <> '' GROUP BY 1, 2),
hot AS (SELECT term FROM tf0 GROUP BY term HAVING count(*) > {max_df}),
tf AS (SELECT * FROM tf0 WHERE term NOT IN (SELECT term FROM hot)),
tot AS (SELECT doc_id, sum(cnt) AS tot FROM tf GROUP BY 1),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 sum(least(a.cnt, b.cnt)) AS im
          FROM tf a JOIN tf b ON a.term = b.term AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT id_a, id_b,
       round(CAST(im AS DOUBLE) / (ta.tot + tb.tot - im), 6) AS wj
FROM inter JOIN tot ta ON ta.doc_id = id_a JOIN tot tb ON tb.doc_id = id_b
WHERE CAST(im AS DOUBLE) / (ta.tot + tb.tot - im) >= {th}
ORDER BY id_a, id_b"""


@pytest.mark.parametrize("seed", range(710, 722))
def test_weighted_jaccard_matches_duckdb(spark, seed):
    import duckdb as _dd

    from pixeltable_spark.operators.dedup import weighted_jaccard_pairs

    rng = random.Random(seed * 31)
    rows = _wj_corpus(seed)
    th = round(rng.uniform(0.05, 0.8), 2)
    max_df = rng.randint(2, len(rows)) if rng.random() < 0.5 else None
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted((r["id_a"], r["id_b"], r["wjaccard"]) for r in
                 weighted_jaccard_pairs(df, threshold=th,
                                        max_df=max_df).collect())
    con = _dd.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = _WJ_ORACLE.format(tbl="t", th=th,
                            max_df=max_df if max_df is not None else 10**9)
    want = [(a, b, round(w, 6)) for a, b, w in con.execute(sql).fetchall()]
    assert got == want, (seed, th, max_df)


# -- funnel vs nested-min SQL on random event streams -----------------------

def _funnel_oracle_sql(steps: list) -> str:
    """Generate the nested-min CTE chain for an arbitrary step list —
    the same formulation as the q101/q114 oracle, parameterized."""
    ctes = [f"s1 AS (SELECT user_id, min(ts) AS t FROM ev "
            f"WHERE event_type = '{steps[0]}' GROUP BY 1)"]
    for i, s in enumerate(steps[1:], start=2):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(e.ts) AS t "
            f"FROM ev e JOIN s{i - 1} USING (user_id) "
            f"WHERE e.event_type = '{s}' AND e.ts > s{i - 1}.t "
            f"GROUP BY 1)")
    arms = [f"SELECT {i} AS step, '{s}' AS event_type, "
            f"(SELECT count(*) FROM s{i}) AS users"
            for i, s in enumerate(steps, start=1)]
    return ("WITH " + ",\n".join(ctes) + "\nSELECT step, event_type, users"
            " FROM (" + " UNION ALL ".join(arms) + ")"
            " WHERE users > 0 ORDER BY step")


@pytest.mark.parametrize("seed", range(6))
def test_funnel_matches_duckdb(spark, seed):
    """Random event streams — duplicate timestamps included to exercise
    the strict-ordering tie semantics — through operators/timeseries.py
    funnel vs the generated nested-min oracle."""
    import datetime as dt

    from pixeltable_spark.operators.timeseries import funnel
    rng = random.Random(7000 + seed)
    types = ["A", "B", "C", "D"]
    k = rng.choice([2, 3])
    steps = rng.sample(types, k)
    base = dt.datetime(2024, 1, 1)
    rows = [(rng.randrange(8),
             base + dt.timedelta(minutes=rng.randrange(40)),  # ties likely
             rng.choice(types))
            for _ in range(150)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    got = sorted((r["step"], r["event_type"], r["users"])
                 for r in funnel(df, "ts", "event_type", steps).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE ev "
                "(user_id BIGINT, ts TIMESTAMP, event_type VARCHAR)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", rows)
    want = sorted(tuple(r) for r in
                  con.execute(_funnel_oracle_sql(steps)).fetchall())
    assert got == want, f"steps={steps}"


# -- interval_join: binned path vs theta path vs DuckDB ---------------------

@pytest.mark.parametrize("seed", range(5))
def test_interval_join_binned_matches_theta_and_duckdb(spark, seed):
    from pixeltable_spark.operators.joins import interval_join
    rng = random.Random(8000 + seed)

    def mk(n, id0):
        out = []
        for i in range(n):
            lo = rng.uniform(0, 100)
            out.append((id0 + i, round(lo, 3),
                        round(lo + rng.uniform(0, 30), 3)))
        return out

    lrows, rrows = mk(40, 0), mk(40, 1000)
    left = spark.createDataFrame(lrows, "lid long, lo double, hi double")
    right = spark.createDataFrame(rrows, "rid long, lo double, hi double")
    w = rng.choice([3.0, 10.0, 45.0])
    binned = sorted((r["lid"], r["rid"]) for r in interval_join(
        left, right, "lo", "hi", "lo", "hi", bin_width=w).collect())
    assert len(binned) == len(set(binned)), "duplicate pair emitted"
    theta = sorted((r["lid"], r["rid"]) for r in interval_join(
        left, right, "lo", "hi", "lo", "hi").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE l (lid BIGINT, lo DOUBLE, hi DOUBLE)")
    con.execute("CREATE TABLE r (rid BIGINT, lo DOUBLE, hi DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", lrows)
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", rrows)
    want = sorted(tuple(r) for r in con.execute(
        "SELECT lid, rid FROM l JOIN r "
        "ON l.lo <= r.hi AND r.lo <= l.hi").fetchall())
    assert binned == theta == want, f"w={w}"


# -- gap_fill on random series vs generated DuckDB oracles ------------------

_GF_SQL = {
    "null": """
WITH agged AS (SELECT k, CAST(floor(epoch(ts)/{e})*{e} AS BIGINT) AS bucket,
                      avg(v) AS v FROM ev GROUP BY 1, 2),
spans AS (SELECT k, min(bucket) lo, max(bucket) hi FROM agged GROUP BY 1),
spine AS (SELECT k, unnest(generate_series(lo, hi, {e})) AS bucket
          FROM spans)
SELECT s.k, s.bucket, round(a.v, 6) AS value, a.v IS NULL AS filled
FROM spine s LEFT JOIN agged a USING (k, bucket) ORDER BY k, bucket""",
    "locf": """
WITH agged AS (SELECT k, CAST(floor(epoch(ts)/{e})*{e} AS BIGINT) AS bucket,
                      avg(v) AS v FROM ev GROUP BY 1, 2),
spans AS (SELECT k, min(bucket) lo, max(bucket) hi FROM agged GROUP BY 1),
spine AS (SELECT k, unnest(generate_series(lo, hi, {e})) AS bucket
          FROM spans),
dense AS (SELECT s.k, s.bucket, a.v, a.v IS NULL AS filled
          FROM spine s LEFT JOIN agged a USING (k, bucket))
SELECT k, bucket,
       round(last_value(v IGNORE NULLS) OVER (
         PARTITION BY k ORDER BY bucket ROWS UNBOUNDED PRECEDING), 6)
         AS value, filled
FROM dense ORDER BY k, bucket""",
    "linear": """
WITH agged AS (SELECT k, CAST(floor(epoch(ts)/{e})*{e} AS BIGINT) AS bucket,
                      avg(v) AS v FROM ev GROUP BY 1, 2),
spans AS (SELECT k, min(bucket) lo, max(bucket) hi FROM agged GROUP BY 1),
spine AS (SELECT k, unnest(generate_series(lo, hi, {e})) AS bucket
          FROM spans),
dense AS (SELECT s.k, s.bucket, a.v, a.v IS NULL AS filled
          FROM spine s LEFT JOIN agged a USING (k, bucket)),
f AS (SELECT *,
  last_value(v IGNORE NULLS) OVER w_prev AS pv,
  last_value(CASE WHEN NOT filled THEN bucket END IGNORE NULLS)
    OVER w_prev AS pb,
  first_value(v IGNORE NULLS) OVER w_next AS nv,
  first_value(CASE WHEN NOT filled THEN bucket END IGNORE NULLS)
    OVER w_next AS nb
  FROM dense
  WINDOW w_prev AS (PARTITION BY k ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         w_next AS (PARTITION BY k ORDER BY bucket
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
SELECT k, bucket,
       round(CASE WHEN NOT filled THEN v
                  ELSE pv + (nv - pv) * (bucket - pb) / (nb - pb) END, 6)
         AS value, filled
FROM f ORDER BY k, bucket""",
}


@pytest.mark.parametrize("seed", range(4))
def test_gap_fill_matches_duckdb(spark, seed):
    """Random sparse series through every fill mode vs generated
    DuckDB spine+window oracles (the q98 oracle, parameterized)."""
    import datetime as dt

    from pixeltable_spark.operators.timeseries import gap_fill
    rng = random.Random(9000 + seed)
    every = rng.choice([60, 300, 3600])
    base = dt.datetime(2024, 1, 1)
    rows = [(rng.randrange(3),
             base + dt.timedelta(seconds=rng.randrange(20000)),
             round(rng.uniform(0, 100), 3))
            for _ in range(80)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    con = duckdb.connect()
    con.execute("CREATE TABLE ev (k BIGINT, ts TIMESTAMP, v DOUBLE)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", rows)
    for fill in ("null", "locf", "linear"):
        got = sorted(
            (r["k"], r["bucket"],
             None if r["value"] is None else round(r["value"], 6),
             r["filled"])
            for r in gap_fill(df, "ts", "v", every, by=["k"],
                              fill=fill).collect())
        want = sorted(tuple(r) for r in con.execute(
            _GF_SQL[fill].format(e=every)).fetchall())
        assert len(got) == len(want), f"fill={fill} every={every}"
        for g, w in zip(got, want):
            assert g[:2] == w[:2] and g[3] == w[3], \
                f"fill={fill}: {g} vs {w}"
            if g[2] is None or w[2] is None:
                assert g[2] == w[2], f"fill={fill}: {g} vs {w}"
            else:
                # random avg()s land on 6th-decimal rounding boundaries
                # (summation order); allow 1 ulp at that digit
                assert abs(g[2] - w[2]) <= 2e-6, \
                    f"fill={fill}: {g} vs {w}"
