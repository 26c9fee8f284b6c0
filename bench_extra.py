"""Extra per-query benchmarks (guide §1): NOT part of the driver
contract — bench.py is the frozen measurement harness. This file
exists so optimization work can time individual headline queries in
isolation (same `.count()` methodology as bench.py), capture
`.explain("formatted")` plans, and use the noop sink to time full
materialization without sink cost.

Usage:
  python bench_extra.py [query ...]        # time listed (default: headline)
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py dedup_winnow
  PLANS_DIR=plans/r06 SUFFIX=_before python bench_extra.py --plans kg_extract_embedded

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), REPEATS (default 2, min-of-N),
     NOOP=1 to use the noop sink instead of .count().
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("REPEATS", "2"))
NOOP = os.environ.get("NOOP", "0") == "1"

HEADLINE = [
    "kg_extract_turtle", "kg_connected_components", "kg_entity_link",
    "r1_pattern_filter", "r5_union_dedup", "q1_pricing_summary",
    "q3_top_revenue", "dedup_exact", "dedup_minhash_lsh",
    "text_token_count", "sim_topk_cosine", "text_winnow",
    "dedup_winnow", "mm_features", "kg_extract_embedded",
]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dump_plans = "--plans" in sys.argv
    names = args or HEADLINE

    from tortank_spark.session import get_spark

    spark = get_spark("bench-extra", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # untimed warmup, same as bench.py: fork python workers + Arrow init
    try:
        qs["kg_extract_turtle"](spark, SF_DIR).count()
    except Exception:
        pass

    plans_dir = os.environ.get("PLANS_DIR")
    suffix = os.environ.get("SUFFIX", "")
    out = {}
    for name in names:
        if dump_plans and plans_dir:
            df = qs[name](spark, SF_DIR)
            Path(plans_dir).mkdir(parents=True, exist_ok=True)
            with open(Path(plans_dir) / f"{name}{suffix}.txt", "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
            continue
        walls = []
        for _ in range(REPEATS):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            if NOOP:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            walls.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(walls), "samples": walls}
        print(f"{name:28s} min {min(walls):8.3f}s  samples {walls}",
              flush=True)
    print(json.dumps({k: v["min"] for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
