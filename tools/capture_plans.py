"""Capture .explain("formatted") for declared queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [query_name ...]
    tag: subdirectory under plans/ and filename suffix, e.g. "r11_before"
         writes plans/r11/<query>_before.txt when tag is "r11_before"
         (tag format: <dir>_<suffix>).

Each query function is invoked (side effects included — mutation
batteries run their commits), then the RETURNED DataFrame's formatted
physical plan is written. No actions are triggered beyond what the
query function itself runs.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entrymod  # noqa: E402
import pixeltable_spark as pxt  # noqa: E402


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    dirname, _, suffix = tag.partition("_")
    outdir = os.path.join(ROOT, "plans", dirname)
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = pxt.get_session(app_name="pxt_plan_capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    if not names:
        names = list(qs)
    for name in names:
        fn = qs[name]
        short = name.split("_", 1)[0]
        try:
            df = fn(spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR capturing plan: {type(e).__name__}: {e}"
        path = os.path.join(outdir, f"{short}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') of the returned "
                    f"DataFrame\n{plan}\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
