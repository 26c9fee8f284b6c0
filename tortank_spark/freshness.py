"""Crawl-freshness merge: last-wins fact resolution across recrawls.

A web-scale KG sees the same (subject, predicate) asserted by many
crawls of many pages over time (tortank's single-document model never
faces this — its statement dedup, turtle_doc.rs:284-293, collapses
only EXACT duplicates within one doc). At 10^12 documents the triple
table is an append-only observation log, and downstream consumers
need the SNAPSHOT view: for each (s, p), the object asserted by the
most recent observation, plus the observation history stats that
drive recrawl scheduling (how contested is this fact, when was it
first/last seen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def latest_facts(
    facts: DataFrame,
    s: str = "s", p: str = "p", o: str = "o",
    src: str = "src", ts: str = "ts",
) -> DataFrame:
    """Last-wins snapshot of an observation log -> (s, p, o_latest,
    src_latest, last_seen, first_seen, n_obs, n_distinct_o).

    ``facts`` rows are observations: subject ``s`` had predicate ``p``
    with object ``o`` according to source page ``src`` crawled at
    ``ts``. The winner per (s, p) is the observation with the highest
    (ts, o, src) — timestamp first, then object and source as a
    DETERMINISTIC total-order tie-break, so two pages crawled in the
    same instant resolve identically on every engine/rerun (the SCD2
    total-order lesson, events.scd2_history). ``n_distinct_o`` is the
    contestedness signal: >1 means sources disagree over time and the
    fact is a recrawl-priority / provenance-review candidate.

    Scale shape: ONE shuffle on (s, p). The winner is
    max(struct(ts, o, src)) — an AGGREGATE with map-side partial
    combine, not a row_number window, so a celebrity subject (the
    rdf:type funnel) reduces tree-style instead of sorting one
    partition. The distinct-object count rides the same grouping
    (Spark plans the count-distinct expand on the already-shuffled
    key). No joins, no second pass over the log.
    """
    w = F.max(
        F.struct(
            F.col(ts).alias("ts"),
            F.col(o).alias("o"),
            F.col(src).alias("src"),
        )
    ).alias("w")
    return (
        facts.groupBy(F.col(s).alias("s"), F.col(p).alias("p"))
        .agg(
            w,
            F.min(ts).alias("first_seen"),
            F.count("*").alias("n_obs"),
            F.countDistinct(o).alias("n_distinct_o"),
        )
        .select(
            "s", "p",
            F.col("w.o").alias("o_latest"),
            F.col("w.src").alias("src_latest"),
            F.col("w.ts").alias("last_seen"),
            "first_seen", "n_obs", "n_distinct_o",
        )
    )


def crawl_delta(
    old: DataFrame, new: DataFrame, key_cols: list[str] | None = None,
) -> DataFrame:
    """Recrawl KG diff -> one row per triple that APPEARED or
    DISAPPEARED between two crawl snapshots, tagged
    ``change in ('added','removed')`` — the update feed a downstream
    consumer ingests instead of re-reading the whole new crawl, and
    the KG-construction analogue of the reference's set ``difference``
    (turtle_doc.rs:301-312) lifted from one in-memory document to two
    crawl-scale triple tables.

    ``key_cols`` (default: all shared columns) define triple identity;
    rows are compared with SET semantics (duplicates within one crawl
    collapse, matching the reference's statement dedup P23).

    Scale shape: ONE shuffle total. Both snapshots are tagged with
    integer presence flags and unioned, then a single groupBy on the
    triple identity takes max(flag) per side (map-side partial
    combine collapses each snapshot's duplicates before the exchange);
    the XOR filter keeps only one-sided rows. Two anti-joins — the
    obvious formulation — would shuffle BOTH tables TWICE; this
    shuffles each once. Nulls in key columns (o_datatype/o_lang)
    group null-safely. For repeated diffing at 100 TB, store both
    snapshots with storage.write_triples_pbucketed so the exchange
    disappears entirely into co-bucketed scans.
    """
    if key_cols is None:
        key_cols = [c for c in old.columns if c in set(new.columns)]
    o = old.select(*key_cols).withColumn(
        "_in_old", F.lit(1)).withColumn("_in_new", F.lit(0))
    n = new.select(*key_cols).withColumn(
        "_in_old", F.lit(0)).withColumn("_in_new", F.lit(1))
    both = o.unionByName(n)
    agg = both.groupBy(*key_cols).agg(
        F.max("_in_old").alias("_old"), F.max("_in_new").alias("_new"))
    return (
        agg.filter(F.col("_old") != F.col("_new"))
        .select(
            F.when(F.col("_new") == 1, F.lit("added"))
            .otherwise(F.lit("removed")).alias("change"),
            *key_cols,
        )
    )
