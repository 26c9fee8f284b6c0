"""End-to-end KG-construction pipeline with per-partition checkpoints,
lineage and metrics (the north rule's resumable-batch contract).

Stages (all pure batch DataFrame transforms):
  pages -> extract (vectorized parse UDF) -> entity linking (broadcast
  alias join) -> sameAs connected-components canonicalization ->
  materialize partitioned triple tables + lineage + metrics.

Resumability model: the page table is split into K *buckets* by
pmod(xxhash64(url), K) — a deterministic, data-independent partitioner,
so a rerun sees the same buckets. Each bucket is processed and written
independently (idempotent overwrite of its own output directory); a
bucket directory containing a _MANIFEST.json marks completion and is
skipped on rerun. Crash between buckets -> rerun does only the missing
buckets. On a real cluster the bucket count is sized so one bucket is
one comfortable job (e.g. 1024 buckets over 10^12 docs); checkpoint
granularity and shuffle width are then independent knobs.

Canonicalization runs globally AFTER the buckets: each bucket writes a
sameAs edge sidecar; connected components + canonical rewrite run once
over the union of sidecars. At 100 TB the edge table is tiny relative
to the triples, so the global CC job is cheap, and the rewrite is two
broadcast joins over the bucketed triple files.
"""

from __future__ import annotations

import argparse
import json
import os
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from . import fixtures
from .canonicalize import connected_components, rewrite_canonical, sameas_edges
from .extract import extract_embedded, extract_triples, triples_only
from .linking import best_link_per_mention, detect_mentions, link_mentions, links_as_triples
from .schema import TRIPLE_COLS


def bucket_of(url_col, n_buckets: int):
    return F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("int")


def _manifest_key(out: Path, n_buckets: int) -> str:
    """Content hash over the full ordered set of bucket manifests —
    the resume key for the global canonicalization phase. Any bucket
    re-run in the CURRENT invocation also forces the global phase
    (checked separately); re-runs in PRIOR crashed invocations are
    caught because every manifest carries a fresh run_id nonce, so a
    rewritten bucket always changes this key even when its stats are
    byte-identical."""
    import hashlib

    h = hashlib.sha256()
    for b in range(n_buckets):
        h.update(f"bucket={b}:".encode())
        h.update((out / f"bucket={b}" / "_MANIFEST.json").read_bytes())
    return h.hexdigest()


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = 8,
    alias_dict: DataFrame | None = None,
    min_link_score: float = 0.2,
    syntax_mode: str = "turtle",
) -> dict:
    """Run (or resume) the pipeline; returns run metrics.

    ``syntax_mode``: 'turtle' parses each page as a standalone Turtle
    document (quarantine rows on parse failure — the reference's
    whole-doc contract); 'embedded' runs the fused four-syntax
    extractor (extract.extract_embedded) so Common-Crawl-style HTML
    pages carrying JSON-LD islands / RDFa / microdata / inline Turtle
    all contribute — there a page with zero embedded markup is a
    normal empty page, not a parse failure, and lineage records
    n_triples=0 with parse_ok=true.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    done, ran = [], []
    # Materialize the page table ONCE, hash-partitioned by bucket
    # (partitionBy -> one directory per bucket). Each bucket job then
    # scans exactly its own files. The round-1 design filtered the full
    # source per bucket — at 1,024 buckets over 100 TB that cumulative
    # rescan is ~100 PB; this layout makes per-bucket input IO
    # O(total/n_buckets) and survives a source that is expensive or
    # non-replayable. On a real lake this step is "write the landing
    # table bucketed" (Iceberg bucket transform) and is itself resumable
    # via the _SUCCESS marker.
    pages_dir = out / "pages_bucketed"
    layout_file = out / "_LAYOUT.json"
    if layout_file.exists():
        # a resume MUST use the layout it was started with: bucket
        # assignment is a function of n_buckets, so a changed value
        # would silently skip (smaller) or fabricate-empty (larger)
        # buckets — refuse loudly instead
        layout = json.loads(layout_file.read_text())
        if layout["n_buckets"] != n_buckets:
            raise ValueError(
                f"out_dir {out} was bucketed with n_buckets="
                f"{layout['n_buckets']}; resuming with {n_buckets} would "
                "drop or invent buckets — use a fresh out_dir"
            )
    else:
        # the layout record is written BEFORE the bucketed write: a
        # crash between the parquet _SUCCESS commit and a trailing
        # layout write would leave a committed table with no layout,
        # letting a later resume with a different n_buckets slip past
        # the guard above
        layout_file.write_text(json.dumps({"n_buckets": n_buckets}))
    if not (pages_dir / "_SUCCESS").exists():
        (
            pages.withColumn("_bucket", bucket_of(F.col("url"), n_buckets))
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(str(pages_dir))
        )
    for b in range(n_buckets):
        bdir = out / f"bucket={b}"
        manifest = bdir / "_MANIFEST.json"
        if manifest.exists():
            done.append(b)
            continue
        bpath = pages_dir / f"_bucket={b}"
        # every manifest carries a fresh run_id nonce: bucket stats are
        # counts only, so two runs with different configs (e.g. a new
        # alias_dict) can produce byte-identical stats — the nonce makes
        # any bucket RE-RUN change the global phase's manifest_key, so a
        # crash between a bucket rewrite and the global phase can never
        # leave a stale triples_canonical behind a matching resume key
        run_id = uuid.uuid4().hex
        if not bpath.exists():  # bucket got no pages: nothing to do
            manifest.parent.mkdir(parents=True, exist_ok=True)
            manifest.write_text(json.dumps(
                {"docs": 0, "triples": 0, "parse_failures": 0,
                 "run_id": run_id}, indent=1
            ))
            ran.append(b)
            continue
        bucket_pages = spark.read.parquet(str(bpath))
        stats = _run_bucket(
            spark,
            bucket_pages,
            str(bdir),
            alias_dict,
            min_link_score,
            syntax_mode,
        )
        stats["run_id"] = run_id
        manifest.write_text(json.dumps(stats, indent=1))
        ran.append(b)
    # global canonicalization over the union of bucket edge sidecars.
    # Resume guard: the phase is keyed to the full set of bucket
    # manifests — on a pure resume (no bucket ran, manifest set
    # unchanged, outputs committed) the phase is SKIPPED entirely (zero
    # Spark jobs). At 100 TB re-running it would be a full
    # scan+shuffle+rewrite of the whole triple table to reproduce bytes
    # that already exist.
    cmap_dir = out / "canonical_map"
    canon_dir = out / "triples_canonical"
    global_file = out / "_GLOBAL.json"
    manifest_key = _manifest_key(out, n_buckets)
    global_skipped = False
    n_triples = None
    if not ran and global_file.exists():
        g = json.loads(global_file.read_text())
        if (
            g.get("manifest_key") == manifest_key
            and (cmap_dir / "_SUCCESS").exists()
            and (canon_dir / "_SUCCESS").exists()
        ):
            n_triples = g["n_canonical_triples"]
            global_skipped = True
    if not global_skipped:
        edges = spark.read.parquet(str(out / "bucket=*" / "sameas_edges"))
        cmap = connected_components(edges)
        cmap.write.mode("overwrite").parquet(str(cmap_dir))
        cmap = spark.read.parquet(str(cmap_dir))
        triples = spark.read.parquet(str(out / "bucket=*" / "triples"))
        # the output count rides on the write job itself (Observation
        # metric) — re-reading triples_canonical just to count it is a
        # second full scan of the largest table in the pipeline
        from pyspark.sql import Observation

        canon_obs = Observation("canonical_count")
        canonical = rewrite_canonical(triples, cmap).observe(
            canon_obs, F.count(F.lit(1)).alias("n")
        )
        # materialize as a PARTITIONED triple table (the north rule's
        # final stage): directories keyed by pmod(xxhash64(p), 64) so
        # bound-predicate pattern scans prune to 1/64 of the data, with
        # subject-salted clustering inside each bucket so the zipf-hot
        # predicate (rdf:type is often >20% of a web KG) never funnels
        # one writer task — see storage.write_triples_pbucketed
        from .storage import write_triples_pbucketed

        write_triples_pbucketed(canonical, str(canon_dir))
        n_triples = int(canon_obs.get["n"])
        global_file.write_text(json.dumps({
            "manifest_key": manifest_key,
            "n_canonical_triples": n_triples,
        }))
    wall = time.time() - t0
    run_stats = {
        "buckets_total": n_buckets,
        "buckets_skipped": done,
        "buckets_ran": ran,
        "global_phase": "skipped" if global_skipped else "ran",
        "n_canonical_triples": n_triples,
        "wall_sec": round(wall, 3),
    }
    (out / "_RUN.json").write_text(json.dumps(run_stats, indent=1))
    return run_stats


def _run_bucket(
    spark: SparkSession,
    pages: DataFrame,
    bdir: str,
    alias_dict: DataFrame | None,
    min_link_score: float,
    syntax_mode: str = "turtle",
) -> dict:
    pages = pages.persist()
    if syntax_mode == "embedded":
        emb = extract_embedded(pages).persist()
        triples = emb.select(
            "url", "s", "s_kind", "p", "o", "o_kind",
            "o_datatype", "o_lang",
        ).distinct()  # a triple may arrive via two syntaxes; the
        # canonical table is a set, per the reference's statement dedup
        extracted = None
    else:
        extracted = extract_triples(pages).persist()
        triples = triples_only(extracted)

    link_triples = None
    if alias_dict is not None:
        mentions = detect_mentions(pages)
        links = best_link_per_mention(
            link_mentions(mentions, alias_dict, min_link_score)
        )
        link_triples = links_as_triples(links)
        all_triples = triples.unionByName(link_triples)
    else:
        all_triples = triples

    all_triples.write.mode("overwrite").parquet(f"{bdir}/triples")
    sameas_edges(triples).write.mode("overwrite").parquet(
        f"{bdir}/sameas_edges"
    )
    # lineage: url -> bucket + per-doc counts + parse status. The
    # embedded extractor emits good triples only (no quarantine rows),
    # so its lineage left-joins the full page set back in: EVERY page
    # gets a row, zero-markup pages as (0, true, null).
    if syntax_mode == "embedded":
        lineage = (
            pages.select("url").distinct()
            .join(triples.groupBy("url").agg(
                F.count("*").alias("n_triples")), "url", "left")
            .select(
                "url",
                F.coalesce(F.col("n_triples"), F.lit(0)).alias("n_triples"),
                F.lit(True).alias("parse_ok"),
                F.lit(None).cast("string").alias("error"),
            )
        )
    else:
        lineage = extracted.groupBy("url").agg(
            F.sum(F.when(F.col("s").isNotNull(), 1).otherwise(0)).alias("n_triples"),
            F.min(F.col("parse_ok").cast("int")).cast("boolean").alias("parse_ok"),
            F.first("error", ignorenulls=True).alias("error"),
        )
    lineage.write.mode("overwrite").parquet(f"{bdir}/lineage")
    agg = lineage.agg(
        F.count("*").alias("docs"),
        F.sum("n_triples").alias("triples"),
        F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).alias("parse_failures"),
    ).collect()[0]
    pages.unpersist()
    if extracted is not None:
        extracted.unpersist()
    else:
        emb.unpersist()
    return {
        "docs": agg["docs"],
        "triples": int(agg["triples"] or 0),
        "parse_failures": int(agg["parse_failures"] or 0),
    }


def main():
    ap = argparse.ArgumentParser(description="tortank-spark KG pipeline")
    ap.add_argument("--out", required=True)
    ap.add_argument("--pages", type=int, default=256)
    ap.add_argument(
        "--input", default=None,
        help="page-table source instead of synthesized fixtures: "
             "table:<catalog.db.name> (Iceberg via session catalog), "
             "iceberg:<path>, or a parquet directory "
             "(sources.pagetable.read_pages resolution ladder)",
    )
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument(
        "--syntax", choices=["turtle", "embedded"], default="turtle",
        help="page parse mode: whole-doc Turtle (reference contract) "
             "or the fused four-syntax embedded-markup extractor",
    )
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from .session import get_spark

    spark = get_spark("tortank-pipeline", cpus=args.cpus)
    spark.sparkContext.setLogLevel("WARN")
    if args.input:
        from .sources.pagetable import read_pages

        pages = read_pages(spark, args.input)
    else:
        pages = fixtures.make_pages(spark, n_pages=args.pages,
                                    n_partitions=max(args.cpus, 8))
    alias_dict = fixtures.make_alias_dict(spark)
    stats = run_pipeline(spark, pages, args.out, n_buckets=args.buckets,
                         alias_dict=alias_dict, syntax_mode=args.syntax)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
