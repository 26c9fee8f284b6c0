"""Physical-plan review: print .explain("formatted") for the key
operators and assert the plan properties we design for:

* parquet scans prune columns (ReadSchema carries only what's used)
* filters push down to the scan (PushedFilters)
* the alias-dict / canonical-map joins are BroadcastHashJoin
* whole-stage codegen covers the relational operators
"""

import os
import sys
from contextlib import redirect_stdout
from io import StringIO
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pyspark.sql.functions as F

from tortank_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    buf = StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def check(name, plan, must_contain):
    missing = [m for m in must_contain if m not in plan]
    status = "ok  " if not missing else "FAIL"
    print(f"{status} {name}" + (f" — missing {missing}" if missing else ""))
    return not missing


def main():
    # AQE defers physical planning, hiding codegen ids from explain();
    # disable it here — this script inspects static plans only.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-review")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ok = True

    # 1. extraction input scan prunes to url+text
    pages = spark.read.parquet(f"{SF_DIR}/documents.parquet").selectExpr(
        "CAST(doc_id AS STRING) AS url", "text", "lang", "source"
    )
    from tortank_spark.extract import extract_triples

    p = plan_of(extract_triples(pages))
    ok &= check("extract column pruning", p, ["ReadSchema"])
    assert "n_chars" not in p, "extraction must not read unused columns"
    print("   scan reads:", [l.strip() for l in p.splitlines()
                             if "ReadSchema" in l][:1])

    # 2. pattern filter pushes predicates to the scan
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.filter(F.col("l_returnflag") == "A").select("l_orderkey")
    p = plan_of(q)
    ok &= check("filter pushdown", p, ["PushedFilters: [IsNotNull(l_returnflag)"])

    # 3. q3-style join broadcasts the small dim
    import __spark_entry__ as m

    p = plan_of(m._q_top_revenue(spark, SF_DIR))
    ok &= check("broadcast join in q3", p, ["BroadcastHashJoin"])

    # 4. canonical rewrite uses broadcast joins and no Python stage
    from tortank_spark.canonicalize import rewrite_canonical
    from tortank_spark.schema import TRIPLE_SCHEMA

    t = spark.createDataFrame([("u", "a", "iri", "p", "b", "iri", None, None)],
                              TRIPLE_SCHEMA)
    cmap = spark.createDataFrame([("a", "a")], "iri string, canonical string")
    p = plan_of(rewrite_canonical(t, cmap))
    ok &= check("rewrite broadcast", p, ["BroadcastHashJoin"])
    assert "EvalPython" not in p and "MapInPandas" not in p, (
        "canonical rewrite must stay JVM-side"
    )

    # 5. whole-stage codegen spans the aggregation
    p = plan_of(m._q_pricing_summary(spark, SF_DIR))
    ok &= check("WSCG on q1", p, ["codegen id :", "HashAggregate"])

    # 6. serializers are pure column expressions (no Python eval)
    from tortank_spark.serialize import to_ntriples

    p = plan_of(to_ntriples(t))
    # createDataFrame leaves an applySchemaToPythonRDD scan marker; the
    # check is that no Python *eval* operator exists in the plan
    assert "EvalPython" not in p and "MapInPandas" not in p, (
        "serializer must not invoke Python"
    )
    ok &= check("serializer JVM-only", p, ["Project"])

    print()
    print("ALL PLAN CHECKS PASS" if ok else "PLAN CHECK FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
