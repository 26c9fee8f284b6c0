"""Deduplication operators for training-data pipelines.

Four tiers, cheapest first — the standard web-corpus dedup ladder:

1. exact: hash-groupBy on a normalized fingerprint (one shuffle).
2. MinHash + LSH: shingle -> k minhashes -> band buckets -> candidate
   pairs only within buckets (never a cross join). Classic
   Broder/LSH construction; all parameters seeded and deterministic.
3. SimHash: 64-bit signature; near-dups share signature up to a few
   bits — banded by 16-bit chunks for candidate generation.
4. verification: exact n-gram Jaccard on candidate pairs only.

Scale notes: candidate generation is groupBy(bucket) + self-join within
bucket — worst case quadratic per bucket, so bucket width (bands/rows)
is the skew knob; AQE skew-join handles residual hot buckets. All
signatures are computed in one Arrow pandas stage over the text column.
"""

from __future__ import annotations

import hashlib
import re
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from .textops import doc_fingerprint

_TOKEN_RE = re.compile(r"\s+")
_MERSENNE = (1 << 61) - 1
_MAXH = (1 << 32) - 1


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """One representative (min id) per distinct normalized text."""
    return (
        df.withColumn("_fp", doc_fingerprint(F.col(text_col)))
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dups"))
        .withColumnRenamed("_fp", "fingerprint")
    )


def _shingles(tokens: list, k: int = 3):
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def _hash64(s: str) -> int:
    return struct.unpack("<Q", hashlib.blake2b(s.encode(), digest_size=8).digest())[0]


def _minhash_params(n_hashes: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, signature[array<long>]) per doc; vectorized over Arrow
    batches with numpy (a*x+b mod p universal hashing)."""
    a, b = _minhash_params(n_hashes)
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, False),
            StructField("signature", ArrayType(LongType()), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_sigs = [], []
            for did, text in zip(pdf[id_col].values, pdf[text_col].values):
                toks = _TOKEN_RE.split((text or "").lower().strip())
                sh = _shingles([t for t in toks if t], shingle_k)
                if not sh:
                    sig = np.zeros(n_hashes, dtype=np.int64)
                else:
                    xs = np.fromiter(
                        ((_hash64(s) & _MAXH) for s in sh),
                        dtype=np.int64,
                        count=len(sh),
                    )
                    # (a*x + b) mod p, then min over shingles per hash fn
                    m = (a[:, None] * xs[None, :] + b[:, None]) % _MERSENNE
                    sig = m.min(axis=1)
                out_ids.append(did)
                out_sigs.append(sig.tolist())
            yield pd.DataFrame({id_col: out_ids, "signature": out_sigs})

    return df.select(id_col, text_col).mapInPandas(gen, schema=schema)


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, bands: int = 16
) -> DataFrame:
    """Band the signature, bucket-join within (band, band-hash):
    candidates never require a cross join. Returns (a, b) pairs a<b."""
    n_hashes = bands  # rows per band derived below
    banded = sigs.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(
                    F.slice(
                        F.col("signature"),
                        i * (F.size("signature") / bands).cast("int") + 1,
                        (F.size("signature") / bands).cast("int"),
                    ).cast("string")
                ),
            )
        ).alias("band", "bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b")
        )
        .distinct()
    )
    return pairs


def minhash_jaccard_estimate(
    sigs: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Estimated Jaccard = fraction of matching minhash positions."""
    sa = sigs.select(F.col(id_col).alias("a"), F.col("signature").alias("_sa"))
    sb = sigs.select(F.col(id_col).alias("b"), F.col("signature").alias("_sb"))
    j = pairs.join(sa, "a").join(sb, "b")
    match = F.size(
        F.filter(
            F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda v: v
        )
    )
    return j.select(
        "a", "b", (match / F.size("_sa")).alias("jaccard_est")
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.7,
    n_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline -> (a, b, jaccard_est)."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes)
    pairs = lsh_candidate_pairs(sigs, id_col, bands)
    est = minhash_jaccard_estimate(sigs, pairs, id_col)
    return est.filter(F.col("jaccard_est") >= threshold)


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over tokens (Charikar); near-dups differ in few
    bits. Vectorized with numpy bit-count accumulation."""
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, False),
            StructField("simhash", LongType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            ids, sigs = [], []
            for did, text in zip(pdf[id_col].values, pdf[text_col].values):
                toks = [t for t in _TOKEN_RE.split((text or "").lower()) if t]
                acc = np.zeros(64, dtype=np.int64)
                for t in toks:
                    h = np.uint64(_hash64(t))
                    acc += np.where((h >> bits) & np.uint64(1), 1, -1)
                sig = int(((acc > 0).astype(np.uint64) << bits).sum(dtype=np.uint64))
                ids.append(did)
                sigs.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
            yield pd.DataFrame({id_col: ids, "simhash": sigs})

    return df.select(id_col, text_col).mapInPandas(gen, schema=schema)


def simhash_candidate_pairs(sigs: DataFrame, id_col: str) -> DataFrame:
    """Band the 64-bit simhash into four 16-bit chunks; docs sharing any
    chunk are candidates (catches up to ~3-bit differences by pigeonhole)."""
    chunks = [
        F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF))
        .alias(f"c{i}")
        for i in range(4)
    ]
    banded = sigs.select(id_col, "simhash", *chunks)
    banded = banded.select(
        id_col,
        "simhash",
        F.posexplode(F.array("c0", "c1", "c2", "c3")).alias("band", "chunk"),
    )
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            _hamming64(F.col("l.simhash"), F.col("r.simhash")).alias("hamming"),
        )
        .distinct()
    )


def _hamming64(x, y):
    return F.bit_count(x.bitwiseXOR(y))


def ngram_jaccard_pairs(
    df: DataFrame, pairs: DataFrame, id_col: str, text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram (word-shingle) Jaccard on candidate pairs — the
    verification stage. JVM-side: shingle arrays via transform over a
    token sequence, intersection/union sizes via array functions."""
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "")
    sh = F.when(
        F.size(toks) < n, F.array(F.concat_ws(" ", toks))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i + 1, n)
            ),
        )
    )
    with_sh = df.select(F.col(id_col), F.array_distinct(sh).alias("_sh"))
    a = with_sh.select(F.col(id_col).alias("a"), F.col("_sh").alias("_sha"))
    b = with_sh.select(F.col(id_col).alias("b"), F.col("_sh").alias("_shb"))
    j = pairs.join(a, "a").join(b, "b")
    inter = F.size(F.array_intersect("_sha", "_shb"))
    union = F.size(F.array_union("_sha", "_shb"))
    return j.select(
        "a", "b",
        (inter / F.greatest(union, F.lit(1))).alias("jaccard"),
    )
