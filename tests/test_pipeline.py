"""End-to-end pipeline: checkpointed buckets, resume semantics, lineage,
canonicalization wiring."""

import json

import pyspark.sql.functions as F

from tortank_spark import fixtures
from tortank_spark.pipeline import run_pipeline


def test_pipeline_end_to_end_and_resume(spark, tmp_path):
    out = str(tmp_path / "kg")
    pages = fixtures.make_pages(spark, n_pages=48, n_partitions=4,
                                include_broken=True)
    alias = fixtures.make_alias_dict(spark)
    stats = run_pipeline(spark, pages, out, n_buckets=2, alias_dict=alias)
    assert stats["buckets_ran"] == [0, 1]
    assert stats["n_canonical_triples"] > 0

    assert stats["global_phase"] == "ran"

    # full resume: nothing re-runs — including the GLOBAL phase: the
    # canonical outputs' files must be byte-for-byte untouched (no
    # Spark job rewrote them; at 100 TB a resume re-running the global
    # rewrite would rescan+reshuffle the whole triple table)
    def _canon_state():
        return sorted(
            (str(p.relative_to(tmp_path)), p.stat().st_mtime_ns,
             p.stat().st_size)
            for p in (tmp_path / "kg" / "triples_canonical").rglob("*")
            if p.is_file()
        )

    canon_before = _canon_state()
    stats2 = run_pipeline(spark, pages, out, n_buckets=2, alias_dict=alias)
    assert stats2["buckets_ran"] == []
    assert stats2["buckets_skipped"] == [0, 1]
    assert stats2["global_phase"] == "skipped"
    assert stats2["n_canonical_triples"] == stats["n_canonical_triples"]
    assert _canon_state() == canon_before

    # partial resume: drop one manifest -> only that bucket re-runs,
    # and the bucket re-run forces the global phase to re-run too
    (tmp_path / "kg" / "bucket=1" / "_MANIFEST.json").unlink()
    stats3 = run_pipeline(spark, pages, out, n_buckets=2, alias_dict=alias)
    assert stats3["buckets_ran"] == [1]
    assert stats3["global_phase"] == "ran"
    assert stats3["n_canonical_triples"] == stats["n_canonical_triples"]

    # crash-recovery: a PRIOR invocation re-ran a bucket (fresh run_id
    # nonce in its manifest, possibly byte-identical stats otherwise)
    # but died before the global phase. The next resume must NOT skip
    # the global phase against the stale _GLOBAL.json key.
    mpath = tmp_path / "kg" / "bucket=1" / "_MANIFEST.json"
    m = json.loads(mpath.read_text())
    m["run_id"] = "deadbeef" * 4  # what a crashed re-run left behind
    mpath.write_text(json.dumps(m, indent=1))
    stats4 = run_pipeline(spark, pages, out, n_buckets=2, alias_dict=alias)
    assert stats4["buckets_ran"] == []          # manifest exists -> skip
    assert stats4["global_phase"] == "ran"      # but key changed -> rerun

    # lineage: the broken page is quarantined with an error message
    lineage = spark.read.parquet(out + "/bucket=*/lineage")
    bad = lineage.filter(~F.col("parse_ok")).collect()
    assert len(bad) == 1 and bad[0]["error"]

    # canonicalization: fixture 0001/0013 sameAs collapsed
    canon = spark.read.parquet(out + "/triples_canonical")
    assert canon.filter(F.col("s").contains("ns#ComplexResource")).count() == 0

    # the canonical table is a PARTITIONED layout (p_bucket dirs), and
    # a bound-predicate scan through the pruning reader matches a plain
    # full-scan filter
    import os as _os

    from tortank_spark.storage import scan_pattern_pbucketed

    assert any(e.startswith("p_bucket=")
               for e in _os.listdir(out + "/triples_canonical"))
    some_p = canon.select("p").first()["p"]
    pruned = scan_pattern_pbucketed(spark, out + "/triples_canonical",
                                    p=some_p)
    assert pruned.count() == canon.filter(F.col("p") == some_p).count() > 0

    # manifest carries per-bucket metrics
    m = json.loads((tmp_path / "kg" / "bucket=0" / "_MANIFEST.json").read_text())
    assert {"docs", "triples", "parse_failures"} <= set(m)
