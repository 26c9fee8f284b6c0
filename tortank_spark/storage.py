"""Storage-layout helpers for the 100-TB deployment: bucketed tables
for shuffle-free co-located joins, and explicit salting for skewed
join keys the optimizer cannot split.

Why this module exists: the two expensive join families in the KG
pipeline are (a) triple-table self-joins on ``s`` (pattern chains,
difference/intersection between snapshot generations) and (b) joins
against canonical/entity maps on a zipf-skewed key. (a) is solved by
LAYOUT — write both sides bucketed by the join key and Catalyst plans
a SortMergeJoin with NO Exchange on either side; (b) is solved at
runtime by AQE skew splitting, with ``salted_join`` as the explicit
fallback for engines/paths where AQE cannot help (e.g. a join followed
by a positional window, or a build side too large to broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+sorted) managed table. Joins and
    aggregations on ``bucket_cols`` between tables bucketed the same
    way run WITHOUT a shuffle on either side (verified by plan test).
    At 100 TB the bucket count is sized so one bucket of the fact
    table is one comfortable task input (~n_buckets = size / 256 MB)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big side gets a random-but-deterministic
    salt derived from its other columns; the small side is exploded
    n_salts ways. A hot key that would land on one reducer spreads over
    ``n_salts`` of them at the cost of replicating the small side's hot
    rows. Columns of both inputs are preserved (small's key column is
    deduplicated). Prefer AQE skew-join where it applies; this is the
    explicit tool for paths AQE cannot rewrite.

    Only join types where an unmatched SMALL row produces no output are
    allowed: under right/full outer joins the exploded small side would
    emit every unmatched small row ``n_salts`` times (silent
    duplication), so those are rejected."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} (got {how!r}): "
            "right/full outer would duplicate unmatched small-side rows "
            "n_salts times"
        )
    big_cols = [c for c in big.columns if c != key]
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big_cols]) if big_cols
        else F.monotonically_increasing_id(),
        F.lit(n_salts),
    ).cast("int")
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")
