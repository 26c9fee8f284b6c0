"""Sources (RDF/JSON, N-Triples) and Structured-Streaming ingest."""

import json

import pyspark.sql.functions as F


def test_rdf_json_roundtrip(spark, tmp_path):
    """Write triples as RDF/JSON, read them back through the source —
    values and kinds must survive (the reference round-trips fixture
    0027 the same way)."""
    from tortank_spark.extract import extract_triples, triples_only
    from tortank_spark.serialize import to_rdf_json
    from tortank_spark.sources import rdf_json_to_triples
    from tortank_spark.sources.rdfjson import RDF_JSON_SCHEMA

    pages = spark.createDataFrame(
        [("u1",
          '@prefix foaf: <http://foaf.com/>.\n'
          '[ foaf:name "Alice" ] foaf:knows [ foaf:name "Bob" ; '
          'foaf:age 34 ] .')],
        "url string, text string",
    )
    t = triples_only(extract_triples(pages, fixture_mode=True))
    js = [r["value"] for r in to_rdf_json(t).collect()]
    raw = spark.read.json(
        spark.sparkContext.parallelize(js), schema=RDF_JSON_SCHEMA
    )
    back = rdf_json_to_triples(raw)
    want = {tuple(r) for r in t.drop("url").collect()}
    got = {tuple(r) for r in back.drop("url").collect()}
    assert got == want
    assert len(got) == 4


def test_ntriples_source(spark, tmp_path):
    from tortank_spark.sources import read_ntriples_lines

    p = tmp_path / "data.nt"
    p.write_text(
        '<http://a> <http://p> "x"@en .\n'
        "_:b1 <http://q> <http://c> .\n"
        "this line is garbage\n"
        '<http://a> a <http://T> .\n'
    )
    out = read_ntriples_lines(spark, str(p))
    good = out.filter(F.col("parse_ok") & F.col("s").isNotNull())
    bad = out.filter(~F.col("parse_ok"))
    assert good.count() == 3
    assert bad.count() == 1


def test_stream_ntriples_directory(spark, tmp_path):
    from tortank_spark.streaming import stream_ntriples_directory

    ind = tmp_path / "in"
    ind.mkdir()
    (ind / "a.nt").write_text('<http://a> <http://p> "1" .\n' * 3)
    (ind / "b.nt").write_text("<http://b> <http://q> <http://c> .\n")
    outp = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_ntriples_directory(spark, str(ind), outp, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(outp)
    assert got.filter(F.col("parse_ok")).count() >= 2
    # restart with no new files: checkpoint prevents reprocessing
    q2 = stream_ntriples_directory(spark, str(ind), outp, ckpt)
    q2.awaitTermination(120)
    n1 = spark.read.parquet(outp).count()
    (ind / "c.nt").write_text("<http://d> <http://q> <http://e> .\n")
    q3 = stream_ntriples_directory(spark, str(ind), outp, ckpt)
    q3.awaitTermination(120)
    n2 = spark.read.parquet(outp).count()
    assert n2 == n1 + 1
