"""KG profiling reports computed from the extracted triple table —
the discovery pass a KG build runs between extraction and layout
decisions (which entities are hot, which predicates describe them),
complementing the per-predicate schema report (kg_predicate_stats in
the driver contract) with the per-ENTITY view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def inlink_profile(
    triples: DataFrame, s: str = "s", p: str = "p", o: str = "o",
    o_kind: str = "o_kind",
) -> DataFrame:
    """Per-object-IRI inlink descriptor -> (iri, n_inlinks,
    n_subjects, n_preds, top_pred, top_pred_n): how often each entity
    is referenced, by how many distinct subjects, through how many
    distinct predicates, and which predicate dominates — the web
    anchor-text aggregation idea lifted to triples (an entity's
    inlink profile is its popularity prior for linking/ranking and
    its partition-skew early warning: the max n_inlinks row IS the
    celebrity key a bucketed layout must plan for).

    Deterministic: top_pred ties break to the smallest predicate IRI
    via min(struct(-count, pred)) — an aggregate, not a window, so
    celebrity objects reduce tree-style (the propagate_labels argmax
    idiom). Literal objects are excluded by o_kind, not by parsing o.

    Scale shape: one (o, p) count with map-side partial aggregation,
    one rollup per o, plus one distinct-subject count per o (its own
    two-phase hash agg) joined back — three shuffles total, all on
    the object key, AQE-skew-splittable."""
    ti = triples.filter(F.col(o_kind) == "iri").select(
        F.col(s).alias("_s"), F.col(p).alias("_p"), F.col(o).alias("iri")
    )
    per_pred = ti.groupBy("iri", "_p").agg(F.count("*").alias("c"))
    rollup = (
        per_pred.groupBy("iri")
        .agg(
            F.sum("c").alias("n_inlinks"),
            F.count("*").alias("n_preds"),
            F.min(F.struct((-F.col("c")).alias("nc"),
                           F.col("_p").alias("pred"))).alias("w"),
        )
        .select(
            "iri", "n_inlinks", "n_preds",
            F.col("w.pred").alias("top_pred"),
            (-F.col("w.nc")).alias("top_pred_n"),
        )
    )
    subj = ti.groupBy("iri").agg(
        F.countDistinct("_s").alias("n_subjects")
    )
    return rollup.join(subj, "iri").select(
        "iri", "n_inlinks", "n_subjects", "n_preds",
        "top_pred", "top_pred_n",
    )


def key_skew(
    df: DataFrame, key: str, top_k: int = 50,
) -> DataFrame:
    """Exact heavy-hitter / skew report for a prospective shuffle or
    partition key -> (key, n, rank, share_ppm, total_rows, n_keys,
    skew_ppm): the top-``top_k`` hottest key values with their exact
    row counts, each key's share of the table in ppm, and the global
    max-over-mean skew ratio in ppm — the measurement that decides a
    salting factor / AQE skew threshold BEFORE the expensive join
    runs, instead of discovering the celebrity key from a straggler
    task. (tortank holds one document in memory and has no analogue;
    this is the operational complement the 100-TB layout tools in
    storage.py plan from.)

    Deterministic: ties in n break to the smallest key string, so the
    report value-hashes. Scale shape: one map-side-combinable count
    per key (the only shuffle, on the audited key itself — at
    pathological skew the combiner has already collapsed each hot key
    to one row per input partition), ONE 1-row global aggregate
    broadcast back by cross join, and the top-k as orderBy+limit,
    which Spark plans as TakeOrderedAndProject (per-partition heaps,
    never a global sort). All ratios in exact integer ppm (x * 1e6
    DIV total), engine-reproducible.
    """
    counts = df.select(F.col(key).cast("string").alias("key")).groupBy(
        "key").agg(F.count("*").alias("n"))
    totals = counts.agg(
        F.sum("n").alias("total_rows"),
        F.count("*").alias("n_keys"),
        F.max("n").alias("_max_n"),
    )
    top = (
        counts.orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(top_k)
    )
    from pyspark.sql import Window

    rank = F.row_number().over(
        Window.orderBy(F.col("n").desc(), F.col("key").asc())
    )
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rank", rank.cast("long"))
        .select(
            "key", "n", "rank",
            F.expr("n * CAST(1000000 AS BIGINT) DIV total_rows")
            .alias("share_ppm"),
            "total_rows", "n_keys",
            F.expr(
                "_max_n * CAST(1000000 AS BIGINT) * n_keys DIV total_rows"
            ).alias("skew_ppm"),
        )
    )
