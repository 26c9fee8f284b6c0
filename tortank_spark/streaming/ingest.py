"""Structured-Streaming ingest wrappers (SURVEY.md §2.4).

The reference's nearest construct is a pull-based incremental
N-Triples statement parser (turtle_doc.rs:338-361) — i.e. resumable
consumption of an append-only source. The Spark-native equivalents:

* ``stream_ntriples_directory`` — readStream.text over a landing
  directory; each micro-batch runs the SAME vectorized parse stage as
  batch mode (every pipeline stage is a pure DataFrame transform, so
  ``foreachBatch`` reuses them verbatim). Checkpointing/exactly-once is
  Spark's streaming checkpoint; this composes with (rather than
  replaces) the bucket-manifest resume model of pipeline.py.
* ``stream_extract`` — the generic page-stream variant for a streaming
  page source (e.g. Kafka value -> url/text columns upstream).

Delivery semantics: ``foreachBatch`` is at-least-once — a micro-batch
retried after a crash between the sink write and the checkpoint commit
re-runs the handler. The sink is therefore made idempotent by keying
each batch to its own ``batch_id=N`` subdirectory and OVERWRITING it:
a replayed batch rewrites identical data in place instead of appending
duplicates, giving effective exactly-once output for deterministic
transforms (the standard Spark idempotent-foreachBatch pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..extract import extract_triples


def stream_extract(
    pages_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """pages stream (url, text, ...) -> parquet triple sink with
    streaming checkpoints. ``trigger_once`` drains available data and
    stops — the incremental-batch pattern."""

    def handle(batch_df: DataFrame, batch_id: int):
        out = extract_triples(batch_df)
        # idempotent on foreachBatch retry: a replayed batch_id
        # overwrites its own directory rather than appending dups
        out.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")

    writer = (
        pages_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_ntriples_directory(
    spark: SparkSession,
    in_dir: str,
    out_path: str,
    checkpoint_path: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Watch a directory of N-Triples files; parse each line-batch with
    the vectorized stage (lines are whole statements, so the page
    parser applies with url = input file)."""
    lines = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 16)
        .load(in_dir)
        .selectExpr("'stream' AS url", "value AS text")
    )
    return stream_extract(lines, out_path, checkpoint_path, trigger_once)
