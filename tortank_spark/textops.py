"""Text-analysis operators for training-data pipelines over the
``documents`` table: token counting, quality scoring, fingerprinting,
language identification.

Everything except language-ID is pure column expressions (JVM,
whole-stage codegen). Language-ID is an Arrow-batched pandas UDF using
a tiny built-in stopword profile — the classic n-gram/stopword
heuristic, no external models.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import StringType, StructField, StructType

_WS = r"\s+"

# tiny deterministic stopword profiles (public common-word lists)
_LANG_PROFILES = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "that", "it", "for"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "est", "que"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "es": {"el", "la", "de", "y", "los", "que", "un", "una", "es", "en"},
    "nl": {"de", "het", "een", "en", "van", "is", "dat", "op", "te", "niet"},
}


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, _WS))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored token estimate: count word pieces + digits + symbol
    runs with one regex — a cheap stand-in for a real tokenizer that
    stays JVM-side."""
    pieces = F.regexp_extract_all(
        F.lower(text), F.lit(r"([a-z]{1,6}|[0-9]|[^a-z0-9\s])"), 1
    )
    return F.size(pieces)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality features,
    all column expressions."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = F.length(F.regexp_replace(t, r"[^\p{Punct}]", ""))
    stop = F.array([F.lit(w) for w in sorted(_LANG_PROFILES["en"])])
    toks = F.split(F.lower(F.trim(t)), _WS)
    n_stop = F.size(F.array_intersect(toks, stop))
    return df.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_tokens.alias("q_n_tokens"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("q_punct_ratio"),
        (n_stop / F.greatest(n_tokens, F.lit(1))).alias("q_stopword_ratio"),
        (n_chars / F.greatest(n_tokens, F.lit(1))).alias("q_avg_token_len"),
    )


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 over the
    whitespace-normalized, lowercased token stream — the exact-dedup
    key. (A rolling/polynomial variant lives in dedup.simhash.)"""
    norm = F.concat_ws(" ", F.split(F.lower(F.trim(text)), _WS))
    return F.md5(norm)


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str = "text",
    k: int = 5, w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD'03 — the standard rolling-hash fingerprint selection): char
    k-grams over the whitespace-normalized lowercase text, each hashed
    with md5-low-64 (deliberately SQL-reproducible, same idiom as
    simhash's token hash); every window of ``w`` consecutive k-gram
    hashes contributes its minimum, taking the RIGHTMOST position on
    ties (the paper's rule); output = distinct
    (id, pos, fp) rows. Guarantee: two documents sharing any substring
    of length >= w + k - 1 share at least one fingerprint.

    Texts shorter than k characters (after normalization) emit a
    single (pos=0, hash-of-whole-text) row so every doc has >= 1
    fingerprint. Hash comparisons happen in uint64 on both engines;
    the emitted fp is the two's-complement int64 of the uint64 hash.

    Scale shape: one Arrow pandas stage (numpy sliding windows), no
    shuffle; downstream near-dup candidate generation is a bucket
    equi-join on fp — identical join geometry to MinHash-LSH."""
    import hashlib

    import numpy as np
    from pyspark.sql.types import LongType

    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, False),
            StructField("pos", LongType(), False),
            StructField("fp", LongType(), False),
        ]
    )

    def _h64(sgram: str) -> int:
        return int(hashlib.md5(sgram.encode()).hexdigest()[:16], 16)

    def _signed(u: int) -> int:
        return u - (1 << 64) if u >= (1 << 63) else u

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, poss, fps = [], [], []
            for did, text in zip(pdf[id_col].values, pdf[text_col].values):
                norm = " ".join((text or "").lower().split())
                n_grams = len(norm) - k + 1
                if n_grams <= 0:
                    ids.append(did)
                    poss.append(0)
                    fps.append(_signed(_h64(norm)))
                    continue
                hs = np.fromiter(
                    (_h64(norm[i : i + k]) for i in range(n_grams)),
                    dtype=np.uint64, count=n_grams,
                )
                ww = min(w, n_grams)
                win = np.lib.stride_tricks.sliding_window_view(hs, ww)
                # rightmost min: argmin over the REVERSED window
                idx = (ww - 1) - np.argmin(win[:, ::-1], axis=1)
                sel_pos = np.arange(len(win)) + idx
                pairs = {(int(p), int(hs[p])) for p in sel_pos}
                for p, u in sorted(pairs):
                    ids.append(did)
                    poss.append(p)
                    fps.append(_signed(u))
            yield pd.DataFrame({id_col: ids, "pos": poss, "fp": fps})

    return df.select(id_col, text_col).mapInPandas(gen, schema=schema)


def winnow_dedup_pairs(
    df: DataFrame, id_col: str, text_col: str = "text",
    k: int = 5, w: int = 4, min_shared: int = 12, max_df: int = 50,
    eager: bool = True,
) -> DataFrame:
    """Near-dup candidate pairs from shared winnowing fingerprints
    (the MOSS construction over winnow_fingerprints): docs sharing at
    least ``min_shared`` distinct fingerprint values become a pair
    with their overlap count. Fingerprints occurring in more than
    ``max_df`` documents are dropped BEFORE the self-join — boilerplate
    phrases produce ubiquitous fingerprints whose buckets go quadratic
    (the same role a stopword cap plays in MOSS); at 10^9 docs this
    filter is what keeps the fp equi-join's biggest bucket bounded
    (and it is a hard cap on skew: no bucket exceeds max_df rows per
    side regardless of corpus growth). Join geometry is identical to
    the MinHash band join: bucketed equi-join, never a cross join.

    Cache lifetime follows dedup.minhash_dedup_pairs: the fingerprint
    table feeds the df-cap aggregate AND both self-join sides, so it
    is always persisted; ``eager`` (default) materializes the small
    pair output and releases it, ``eager=False`` hands the handle to
    the caller via dedup.release_caches."""
    from .dedup import _attach_caches

    fps = (
        winnow_fingerprints(df, id_col, text_col, k, w)
        .select(id_col, "fp").distinct().persist()
    )
    rare = fps.groupBy("fp").agg(F.count("*").alias("_df")).filter(
        F.col("_df") <= max_df
    ).select("fp")
    narrowed = fps.join(rare, "fp")
    l = narrowed.select(F.col(id_col).alias("a"), "fp")
    r = narrowed.select(F.col(id_col).alias("b"), "fp")
    out = (
        l.join(r, (l["fp"] == r["fp"]) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    if not eager:
        return _attach_caches(out, [fps])
    try:
        return out.localCheckpoint(eager=True)
    finally:
        fps.unpersist()


def detect_language(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Stopword-profile language ID as an Arrow pandas UDF (the n-gram
    heuristic of SURVEY/brief; no per-row Python dispatch — batch-level
    pandas string ops)."""
    fields = df.schema.fields + [StructField(out_col, StringType(), True)]
    schema = StructType(fields)
    cols = [f.name for f in df.schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = pdf[text_col].fillna("").str.lower().str.split()
            preds = []
            for ts in toks:
                s = set(ts)
                best, best_n = "und", 0
                for lang, prof in _LANG_PROFILES.items():
                    n = len(s & prof)
                    if n > best_n:
                        best, best_n = lang, n
                preds.append(best)
            pdf[out_col] = preds
            yield pdf[cols + [out_col]]

    return df.mapInPandas(gen, schema=schema)
