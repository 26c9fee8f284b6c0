"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Measures:
* KG extraction throughput (docs + triples/sec) on a deterministic
  synthetic corpus sized by sf, at TWO parallelism levels — the sandbox
  stand-in for the north rule's N vs 4N executor scaling. Each leg runs
  in its own subprocess (clean JVM) and reports cold (first pass) and
  warm (min pass; excludes one-time python-worker fork/import, which a
  long-lived cluster job pays once).

  IMPORTANT — this sandbox host is CPU-burst-throttled: ~32 cores for
  ~10 s, then a sustained budget of only ~4-6 cores (measured; see
  BASELINE.md "host characterization"). Sustained runs above the budget
  are throttle-bound regardless of code quality, so the scaling pair
  defaults to N=1 vs 4N=4 cores — fully inside the sustained budget —
  which yields stable, reproducible efficiency. Override with
  SPARK_GRAFT_SCALE_SMALL / SPARK_GRAFT_SCALE_BIG on real hardware
  (e.g. 8 / 32).
* headline query wall times at full configured parallelism.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE_SMALL = int(os.environ.get("SPARK_GRAFT_SCALE_SMALL", "1"))
SCALE_BIG = int(os.environ.get("SPARK_GRAFT_SCALE_BIG", "4"))


def _sf_of(path: str) -> float:
    try:
        return float(Path(path).name.replace("sf", ""))
    except ValueError:
        return 0.1


SF = _sf_of(SF_DIR)
# ~360k pages per sf-unit: each extraction pass is ~50 CPU-seconds of
# parse work — heavy enough to be parse-bound, small enough to fit the
# sandbox host's CPU burst budget (this host is burst-throttled: ~10s of
# full 32-core speed, then ~6 sustained cores; measured in
# BASELINE.md §measured). Legs sleep beforehand to refill the budget.
N_PAGES = max(1024, int(SF * 120_000))
COOLDOWN_S = int(os.environ.get("SPARK_GRAFT_BENCH_COOLDOWN", "45"))


def _leg(cpus: int, n_pages: int) -> dict:
    """One extraction leg in a clean subprocess; three passes, report
    cold (first) and warm (min) — warm excludes python-worker fork and
    import cost, which a long-lived cluster job pays once."""
    code = f"""
import json, sys, time
sys.path.insert(0, {str(Path(__file__).resolve().parent)!r})
from tortank_spark.session import get_spark
from tortank_spark import fixtures
from tortank_spark.extract import extract_triples, triples_only
import pyspark.sql.functions as F
spark = get_spark("bench-leg", cpus={cpus}, shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
pages = fixtures.make_pages(spark, n_pages={n_pages},
                            n_partitions={cpus} * 2,
                            include_broken=False).persist()
n_docs = pages.count()
walls = []
n_triples = 0
for _ in range(3):
    t0 = time.time()
    n_triples = triples_only(extract_triples(pages)).agg(
        F.count("*")).collect()[0][0]
    walls.append(time.time() - t0)
print("LEG " + json.dumps({{"cpus": {cpus}, "docs": n_docs,
                            "triples": n_triples,
                            "cold": round(walls[0], 3),
                            "warm": round(min(walls), 3)}}))
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "TZ": "UTC"},
    )
    for line in out.stdout.splitlines():
        if line.startswith("LEG "):
            return json.loads(line[4:])
    raise RuntimeError(f"bench leg failed: {out.stderr[-2000:]}")


def main():
    t_all = time.time()
    time.sleep(COOLDOWN_S)  # let the host CPU-burst budget refill
    leg_big = _leg(SCALE_BIG, N_PAGES)
    time.sleep(COOLDOWN_S)
    leg_small = _leg(SCALE_SMALL, N_PAGES)
    w_small, w_big = leg_small["warm"], leg_big["warm"]
    speedup = w_small / w_big if w_big > 0 else 0.0
    efficiency = speedup / (SCALE_BIG / SCALE_SMALL)

    queries = {
        "extract_local_small": w_small,
        "extract_local_big": w_big,
    }

    from tortank_spark.session import get_spark

    spark = get_spark("bench-queries", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    headline = [
        "kg_extract_turtle",
        "kg_connected_components",
        "kg_entity_link",
        "r1_pattern_filter",
        "r5_union_dedup",
        "q1_pricing_summary",
        "q3_top_revenue",
        "dedup_exact",
        "dedup_minhash_lsh",
        "text_token_count",
        "sim_topk_cosine",
    ]
    qs = entrymod.queries()
    for name in headline:
        t0 = time.time()
        try:
            qs[name](spark, SF_DIR).count()
            queries[name] = round(time.time() - t0, 3)
        except Exception as e:  # a failing query must not kill the bench
            queries[name] = -1.0
            print(f"bench query {name} failed: {e}", file=sys.stderr)

    total = round(time.time() - t_all, 3)
    out = {
        "metric": "e2e_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF,
        "extract_docs": leg_big["docs"],
        "extract_triples": leg_big["triples"],
        "triples_per_sec": round(leg_big["triples"] / w_big, 1) if w_big else None,
        "docs_per_sec": round(leg_big["docs"] / w_big, 1) if w_big else None,
        "scaling": {
            "cpus_small": SCALE_SMALL,
            "cpus_big": SCALE_BIG,
            "wall_small_sec": w_small,
            "wall_big_sec": w_big,
            "cold_small_sec": leg_small["cold"],
            "cold_big_sec": leg_big["cold"],
            "speedup": round(speedup, 3),
            "efficiency": round(efficiency, 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
