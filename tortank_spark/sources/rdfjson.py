"""RDF/JSON source (SURVEY.md S4/S5): read the reference's
{subject, predicate, object} x {type, datatype?, lang?, value} encoding
(turtle_doc.rs:136-159, 228-240, 906-990) into the canonical triple
schema with spark.read.json + from_json-style struct access — all
JVM-side."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.types import StringType, StructField, StructType

_NODE = StructType(
    [
        StructField("type", StringType()),
        StructField("datatype", StringType()),
        StructField("lang", StringType()),
        StructField("value", StringType()),
    ]
)
RDF_JSON_SCHEMA = StructType(
    [
        StructField("subject", _NODE),
        StructField("predicate", _NODE),
        StructField("object", _NODE),
    ]
)


def _kind(col):
    return (
        F.when(col == "uri", F.lit("iri"))
        .when(col == "bnode", F.lit("bnode"))
        .otherwise(F.lit("literal"))
    )


def _value(node):
    # bnode values carry the bare label in RDF/JSON; canonical form is _:label
    return F.when(
        node["type"] == "bnode", F.concat(F.lit("_:"), node["value"])
    ).otherwise(node["value"])


def rdf_json_to_triples(df: DataFrame, url: str = "rdf-json") -> DataFrame:
    """df with subject/predicate/object struct columns -> triple rows.
    Typed-value coercion (turtle_doc.rs:906-990) is canonical-lexical
    here: xsd:integer/decimal/double/boolean values pass through as
    their lexical forms, matching the parser's canonicalization."""
    return df.select(
        F.lit(url).alias("url"),
        _value(F.col("subject")).alias("s"),
        _kind(F.col("subject")["type"]).alias("s_kind"),
        F.col("predicate")["value"].alias("p"),
        _value(F.col("object")).alias("o"),
        _kind(F.col("object")["type"]).alias("o_kind"),
        F.col("object")["datatype"].alias("o_datatype"),
        F.col("object")["lang"].alias("o_lang"),
    )


def read_rdf_json(
    spark: SparkSession, path: str, array: bool = True
) -> DataFrame:
    """Read RDF/JSON triples. ``array=True`` reads the reference's
    to_file(json=true) layout — ONE file holding ONE JSON array
    (turtle_doc.rs:450-481; written by serialize.write_rdf_json_array).
    ``array=False`` reads the distributed JSON-lines layout written by
    serialize.write_rdf_json (splittable, the 100-TB path)."""
    raw = spark.read.json(path, schema=RDF_JSON_SCHEMA, multiLine=array)
    return rdf_json_to_triples(raw, url=path)
