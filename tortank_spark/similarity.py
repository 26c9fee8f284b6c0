"""Similarity search over an embedding column (array<float>).

* ``topk_cosine`` — exact brute-force top-k, entirely JVM-side: the dot
  product is ``aggregate(zip_with(...))`` column expressions inside
  whole-stage codegen; top-k is a single ORDER BY LIMIT (Spark's
  TakeOrderedAndProject — no full sort materialization).
* ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH (fixed
  seed) assigns each vector a bit-bucket; the query only scans its own
  bucket (and optionally neighboring probes). At 10^9 vectors this
  turns a full scan into a partition-pruned scan of ~1/2^bits of the
  data; signatures are computed once in a vectorized pandas stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_to_query(df: DataFrame, vec_col: str, query: list) -> DataFrame:
    """Add a ``cosine`` column = cos(vec, query); query is broadcast as
    a literal array (driver-side constant folding)."""
    q = F.array([F.lit(float(x)) for x in query])
    vec = F.col(vec_col).cast("array<double>")
    cos = _dot(vec, q) / (
        F.greatest(_norm(vec), F.lit(1e-12)) * F.greatest(_norm(q), F.lit(1e-12))
    )
    return df.withColumn("cosine", cos)


def topk_cosine(
    df: DataFrame, vec_col: str, query: list, k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity."""
    scored = cosine_to_query(df, vec_col, query)
    return (
        scored.select(id_col, F.round("cosine", 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_bits, dim)).astype(np.float64)


def lsh_bucket_signatures(
    df: DataFrame, vec_col: str, dim: int, n_bits: int = 8,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, bucket) — random-hyperplane sign bits packed to a long.
    Vectorized: one matmul per Arrow batch."""
    planes = _hyperplanes(dim, n_bits)
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, False),
            StructField("bucket", LongType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (1 << np.arange(n_bits, dtype=np.int64))
        for pdf in batches:
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].values]
            )
            bits = (mat @ planes.T) > 0
            buckets = (bits.astype(np.int64) * weights).sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].values, "bucket": buckets})

    return df.select(id_col, vec_col).mapInPandas(gen, schema=schema)


def lsh_bucketed_topk(
    df: DataFrame, vec_col: str, query: list, k: int = 10,
    n_bits: int = 8, id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.
    At scale the bucket column is a partition key and this becomes a
    partition-pruned scan; here it is a filter + the exact scorer."""
    dim = len(query)
    planes = _hyperplanes(dim, n_bits)
    qbits = (planes @ np.asarray(query, dtype=np.float64)) > 0
    qbucket = int(
        (qbits.astype(np.int64) * (1 << np.arange(n_bits, dtype=np.int64))).sum()
    )
    sigs = lsh_bucket_signatures(df, vec_col, dim, n_bits, id_col)
    in_bucket = df.join(
        sigs.filter(F.col("bucket") == qbucket).select(id_col), id_col, "left_semi"
    )
    return topk_cosine(in_bucket, vec_col, query, k, id_col)
