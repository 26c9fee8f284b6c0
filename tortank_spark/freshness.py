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
