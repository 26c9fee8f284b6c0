"""Line-oriented N-Triples source (SURVEY.md S3).

The reference exposes a pull-based incremental statement parser
(turtle_doc.rs:338-361). In Spark, N-Triples' line-orientation makes
this a text scan + the same vectorized parse stage: spark.read.text
splits on lines for free (and splits *files* across tasks — the
streaming-ingest story is readStream.text + the same function)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..grammar.turtle import parse_document
from ..schema import EXTRACT_SCHEMA


def read_ntriples_lines(spark: SparkSession, path: str) -> DataFrame:
    """Read an N-Triples file into extraction rows; each line is an
    independent statement so ordinary text splits parallelize it."""
    lines = spark.read.text(path)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "s", "s_kind", "p", "o", "o_kind", "o_datatype",
                "o_lang", "parse_ok", "error"]
        for pdf in batches:
            rows = []
            for line in pdf["value"].values:
                if not line or line.isspace():
                    continue
                triples, err = parse_document(line)
                if err is not None:
                    rows.append((path, None, None, None, None, None, None,
                                 None, False, err))
                else:
                    rows.extend((path, *t, True, None) for t in triples)
            yield pd.DataFrame(rows, columns=cols)

    return lines.mapInPandas(gen, schema=EXTRACT_SCHEMA)
