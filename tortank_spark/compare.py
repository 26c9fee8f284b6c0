"""Triple-set comparison harness — the reference's fixture semantics as
DataFrame ops.

The reference compares docs with
``input.difference(output).len() == 0 && input.len() == output.len()``
(/root/reference/src/tests/mod.rs:63-89), an O(n*m) nested loop. Here
the same set semantics are two anti-joins — shuffle-hash/SMJ picked by
Catalyst, linear in data size, scale-out across the cluster — grouped
per url and aggregated into precision/recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from .schema import TRIPLE_COLS

KEY = ["url", *TRIPLE_COLS]
_NULL = "\x00"  # sentinel: SQL equality drops NULL join keys, so
# nullable columns (o_datatype, o_lang) are coalesced before joining


def _dedup(df: DataFrame) -> DataFrame:
    cols = [F.coalesce(F.col(c), F.lit(_NULL)).alias(c) for c in KEY]
    return df.select(*cols).dropDuplicates(KEY)


def pr_per_url(got: DataFrame, want: DataFrame) -> DataFrame:
    """Per-url tp/fp/fn + precision/recall via anti/semi joins."""
    g, w = _dedup(got), _dedup(want)
    tp = g.join(w, KEY, "left_semi").groupBy("url").agg(F.count("*").alias("tp"))
    fp = g.join(w, KEY, "left_anti").groupBy("url").agg(F.count("*").alias("fp"))
    fn = w.join(g, KEY, "left_anti").groupBy("url").agg(F.count("*").alias("fn"))
    urls = w.select("url").union(g.select("url")).distinct()
    out = (
        urls.join(tp, "url", "left")
        .join(fp, "url", "left")
        .join(fn, "url", "left")
        .fillna(0, ["tp", "fp", "fn"])
    )
    return out.withColumn(
        "precision",
        F.when(F.col("tp") + F.col("fp") > 0,
               F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(1.0)),
    ).withColumn(
        "recall",
        F.when(F.col("tp") + F.col("fn") > 0,
               F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(1.0)),
    )


def pr_overall(got: DataFrame, want: DataFrame) -> dict:
    """Aggregate micro precision/recall over the whole corpus."""
    per = pr_per_url(got, want).agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
    ).collect()[0]
    tp, fp, fn = per["tp"] or 0, per["fp"] or 0, per["fn"] or 0
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": tp / (tp + fp) if tp + fp else 1.0,
        "recall": tp / (tp + fn) if tp + fn else 1.0,
    }
