"""Deterministic sampling operators for training-data pipelines:
reproducible stratified subsets (per-language eval carve-outs, ablation
slices, human-review draws) that every rerun — and the DuckDB oracle —
reproduces bit-for-bit. No RNG state: the sampling key is a hash of
the row id, so the draw is a pure function of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def stratified_sample(
    df: DataFrame, strata_col: str, id_col: str, k: int,
    n_salts: int = 64,
) -> DataFrame:
    """Exactly ``k`` rows per stratum (fewer iff the stratum is
    smaller), chosen as the k smallest md5(id) values — a
    deterministic uniform draw that is reproducible across reruns,
    engines (md5 is byte-identical in Spark and DuckDB), and any
    partitioning. ``id_col`` must be unique; it breaks the (already
    astronomically unlikely) hash ties, making the order total.

    Scale shape — the naive formulation (one row_number window
    partitioned by stratum) sorts EACH ENTIRE STRATUM in a single
    task: a web-scale 'en' stratum is one straggler/OOM. This runs a
    two-level tournament instead: level 1 takes a local top-k within
    (stratum, salt) — ``n_salts`` hash-derived salts, so every window
    partition holds ~1/n_salts of the stratum — and level 2 re-ranks
    the surviving k * n_salts candidates per stratum (bounded rows by
    construction). The salt NEVER affects the result (the final
    top-k of a total order is partitioning-invariant), so the oracle
    replays a plain per-stratum row_number — which is also why the
    driver check stays a FULL value oracle without replicating
    xxhash64 salting in SQL."""
    key = F.md5(F.col(id_col).cast("string"))
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
    lvl1 = Window.partitionBy(strata_col, "_salt").orderBy(
        "_key", id_col
    )
    lvl2 = Window.partitionBy(strata_col).orderBy("_key", id_col)
    cand = (
        df.withColumn("_key", key)
        .withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(lvl1))
        .filter(F.col("_rn") <= k)
    )
    return (
        cand.withColumn("_rn2", F.row_number().over(lvl2))
        .filter(F.col("_rn2") <= k)
        .drop("_key", "_salt", "_rn", "_rn2")
    )
