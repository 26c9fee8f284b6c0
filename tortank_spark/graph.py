"""Graph-analytic operators over edge tables derived from the triple
store (degree, triangles) — the structural-quality building blocks a
KG pipeline runs after canonicalization (triangle counts feed
clustering coefficients, spam/link-farm heuristics, and motif stats).

Scale design: triangle enumeration uses the degree-ordered orientation
(Schank/Wagner "node-iterator-core"; the MapReduce formulation is
Suri/Vassilvitskii's MR node-iterator++): every undirected edge is
directed from its lower-(degree, id) endpoint to the higher one, which
bounds every vertex's out-degree by O(sqrt(m)) and therefore the wedge
(2-path) stage by O(m^1.5) TOTAL — without it, one celebrity node of
degree d generates d^2 wedges and a single straggler partition at web
scale. All joins are equi-joins on vertex ids (AQE-splittable); no
per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def canonical_edges(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Distinct undirected edges as (a, b) with a < b; self-loops
    dropped (a triangle never contains one)."""
    a = F.least(F.col(src), F.col(dst)).alias("a")
    b = F.greatest(F.col(src), F.col(dst)).alias("b")
    return edges.select(a, b).filter(F.col("a") != F.col("b")).distinct()


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst", eager: bool = True) -> DataFrame:
    """Exact per-node triangle participation counts -> (node, n_tri):
    how many triangles each vertex belongs to (each triangle counts
    once at each of its three vertices — the clustering-coefficient
    numerator). Deterministic, integer-exact, fully SQL-replayable.

    Plan shape (3 shuffles beyond the edge scan, all equi-joins):
      1. degree aggregation over the canonical edge list;
      2. orientation join (edges x degrees, twice) — directs each
         edge low->high in the (degree, id) total order;
      3. wedge join on the shared LOW endpoint with a (deg, id)
         ordering guard so each unordered wedge appears once, then
         closure = one more equi-join probing the oriented edge set
         for the (v, w) closing edge.
    The orientation bound makes step 3's biggest key group O(sqrt(m))
    — the difference between a web-scale run and a straggler.

    Cache lifetime follows the dedup builders: the canonical edge
    list feeds 3 plan branches and the oriented edge set another 3 —
    unpersisted, the whole distinct-self-join chain upstream re-runs
    ~6x (measured 61 s -> ~8 s on the sf0.01 co-purchase graph).
    ``eager`` (default) materializes the small per-node output and
    releases both caches; ``eager=False`` returns
    ``(df, dedup.CacheHandle)``."""
    from .dedup import CacheHandle

    e = canonical_edges(edges, src, dst).persist()
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    ed = e.join(da, "a").join(db, "b")
    # orient low -> high in the (degree, id) total order (id breaks
    # degree ties, so the order is total and the orientation acyclic)
    a_low = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_low, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_low, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(a_low, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_hi"),
    ).persist()
    o1 = oriented.select(
        F.col("lo"), F.col("hi").alias("v"), F.col("deg_hi").alias("dv")
    )
    o2 = oriented.select(
        F.col("lo"), F.col("hi").alias("w"), F.col("deg_hi").alias("dw")
    )
    # each unordered wedge {v, w} at apex lo appears once: require
    # v < w in the same (degree, id) order used for the orientation
    wedge = o1.join(o2, "lo").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(
        F.col("lo").alias("v"), F.col("hi").alias("w")
    )
    tri = wedge.join(closing, ["v", "w"]).select("lo", "v", "w")
    nodes = (
        tri.select(F.col("lo").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
    )
    out = nodes.groupBy("node").agg(F.count("*").alias("n_tri"))
    if not eager:
        return out, CacheHandle([e, oriented])
    try:
        return out.localCheckpoint(eager=True)
    finally:
        e.unpersist()
        oriented.unpersist()
