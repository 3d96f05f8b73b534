"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB at
the same sf, compare row-count + column names + values (column-name-sorted,
row-sorted, order-insensitive).

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

ROOT = "/root/repo"
sys.path.insert(0, ROOT)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
import pixeltable_spark as pxt  # noqa: E402

sys.path.insert(0, ROOT + "/tools")
from py_oracles import PY_ORACLES  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        try:
            return v.replace(tzinfo=None).isoformat()
        except TypeError:
            return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_val(x) for x in v)
    return v


def vals_equal(a, b):
    a, b = norm_val(a), norm_val(b)
    if isinstance(a, float) and isinstance(b, (float, int)):
        if math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9):
            return a == float(b) or "close"
        return False
    return a == b


def compare_rows(cols, srows_t, ocols_raw, orows):
    """Shared row/value compare: srows_t are spark tuples in `cols`
    order; orows are oracle tuples in ocols_raw order."""
    ocols = sorted(ocols_raw)
    if cols != ocols:
        return f"SCHEMA MISMATCH spark={cols} oracle={ocols}"
    if len(srows_t) != len(orows):
        return f"ROWCOUNT spark={len(srows_t)} oracle={len(orows)}"
    s_sorted = sorted(srows_t, key=lambda t: tuple(str(x) for x in t))
    oidx = [ocols_raw.index(c) for c in cols]
    o_sorted = sorted(
        [tuple(norm_val(r[i]) for i in oidx) for r in orows],
        key=lambda t: tuple(str(x) for x in t),
    )
    n_close = 0
    for i, (sr, orow) in enumerate(zip(s_sorted, o_sorted)):
        for c, (sv, ov) in zip(cols, zip(sr, orow)):
            eq = vals_equal(sv, ov)
            if eq is False:
                return f"VALUE row{i} col={c} spark={sv!r} oracle={ov!r}"
            if eq == "close":
                n_close += 1
    exact = ("EXACT" if n_close == 0
             else f"CLOSE({n_close} float cells differ in repr)")
    return f"OK {len(s_sorted)} rows [{exact}]"


def compare_py(name, sdf, py_oracle, sf_dir):
    """Compare a Spark result against a numpy/python replay oracle
    (tools/py_oracles.py) — the value gate for non-SQL-expressible
    algorithms (k-means, SVD, BPE merges, ICWS draws)."""
    cols = sorted(sdf.columns)
    srows = [tuple(norm_val(r[c]) for c in cols) for r in sdf.collect()]
    ocols, orows = py_oracle(sf_dir)
    res = compare_rows(cols, srows, ocols, orows)
    return res.replace("OK ", "OK(py-replay) ") if res.startswith("OK") \
        else res


def compare(name, sdf, con, sql):
    cols = sorted(sdf.columns)
    srows = sdf.collect()
    orel = con.sql(sql)
    ocols_raw = orel.columns
    orows = orel.fetchall()
    ocols = sorted(ocols_raw)
    if cols != ocols:
        return f"SCHEMA MISMATCH spark={cols} oracle={ocols}"
    if len(srows) != len(orows):
        return f"ROWCOUNT spark={len(srows)} oracle={len(orows)}"
    s_sorted = sorted(
        [tuple(norm_val(r[c]) for c in cols) for r in srows],
        key=lambda t: tuple(str(x) for x in t),
    )
    oidx = [ocols_raw.index(c) for c in cols]
    o_sorted = sorted(
        [tuple(norm_val(r[i]) for i in oidx) for r in orows],
        key=lambda t: tuple(str(x) for x in t),
    )
    n_close = 0
    for i, (sr, orow) in enumerate(zip(s_sorted, o_sorted)):
        for c, (sv, ov) in zip(cols, zip(sr, orow)):
            eq = vals_equal(sv, ov)
            if eq is False:
                return f"VALUE row{i} col={c} spark={sv!r} oracle={ov!r}"
            if eq == "close":
                n_close += 1
    exact = "EXACT" if n_close == 0 else f"CLOSE({n_close} float cells differ in repr)"
    return f"OK {len(srows)} rows [{exact}]"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = pxt.get_session()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                res = compare(name, sdf, con, oracles[name])
            elif name in PY_ORACLES:
                res = compare_py(name, sdf, PY_ORACLES[name], sf_dir)
            else:
                res = f"ROWS-ONLY {sdf.count()} rows (no oracle)"
        except Exception as e:  # noqa: BLE001
            res = f"ERROR {type(e).__name__}: {str(e)[:300]}"
        dt = time.time() - t0
        status = "PASS" if res.startswith(("OK", "ROWS-ONLY")) else "FAIL"
        if status == "FAIL":
            failed.append(name)
        print(f"{status} {name:28s} {dt:6.1f}s  {res}")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
