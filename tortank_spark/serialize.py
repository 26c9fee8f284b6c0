"""Serializers — the reference's Display/as_turtle/RDF-JSON sinks as
pure column expressions (SURVEY.md §2.1 S6-S9). Everything here is
JVM-side (whole-stage codegen); no Python runs per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from .grammar.lexical import RDF_TYPE, XSD_STRING

# the reference's built-in prefix table for pretty Turtle output,
# longest-match-first (turtle_doc.rs:55-123). Reproduced as data (it is
# part of the observable output format), applied with a coalesce ladder.
PRETTY_PREFIXES = [
    ("rdf:", "http://www.w3.org/1999/02/22-rdf-syntax-ns#"),
    ("rdfs:", "http://www.w3.org/2000/01/rdf-schema#"),
    ("xsd:", "http://www.w3.org/2001/XMLSchema#"),
    ("foaf:", "http://xmlns.com/foaf/0.1/"),
    ("dc:", "http://purl.org/dc/elements/1.1/"),
    ("dcterms:", "http://purl.org/dc/terms/"),
    ("skos:", "http://www.w3.org/2004/02/skos/core#"),
    ("prov:", "http://www.w3.org/ns/prov#"),
    ("schema:", "http://schema.org/"),
    ("owl:", "http://www.w3.org/2002/07/owl#"),
    ("ex:", "http://example.org/"),
]


def _fmt_term(value: Column, kind: Column) -> Column:
    """IRIs -> <iri>; bnodes already carry the _: prefix; used for s/p."""
    return F.when(kind == "iri", F.concat(F.lit("<"), value, F.lit(">"))).otherwise(
        value
    )


def _fmt_literal(df_cols) -> Column:
    """Canonical N-Triples literal rendering incl. the reference's
    quote-style selection: values containing '\"""' or ending with '\"'
    switch to long-single-quote delimiters (turtle_doc.rs:1193-1211)."""
    o, dt, lang = df_cols
    esc = F.regexp_replace(o, "'''", "\\\\'''")
    needs_single = o.endswith('"') | o.contains('"""')
    quoted = F.when(
        needs_single, F.concat(F.lit("'''"), esc, F.lit("'''"))
    ).otherwise(F.concat(F.lit('"'), o, F.lit('"')))
    with_dt = F.when(
        dt.isNotNull(), F.concat(quoted, F.lit("^^<"), dt, F.lit(">"))
    ).otherwise(
        F.when(lang.isNotNull(), F.concat(quoted, F.lit("@"), lang)).otherwise(
            quoted
        )
    )
    return with_dt


def ntriples_line() -> Column:
    """One canonical N-Triples line per row (Display for Statement,
    turtle_doc.rs:1248-1257)."""
    s = _fmt_term(F.col("s"), F.col("s_kind"))
    p = F.concat(F.lit("<"), F.col("p"), F.lit(">"))
    o = F.when(
        F.col("o_kind") == "literal",
        _fmt_literal((F.col("o"), F.col("o_datatype"), F.col("o_lang"))),
    ).otherwise(_fmt_term(F.col("o"), F.col("o_kind")))
    return F.concat(s, F.lit(" "), p, F.lit(" "), o, F.lit("."))


def to_ntriples(df: DataFrame) -> DataFrame:
    return df.select(ntriples_line().alias("value"))


def write_ntriples(df: DataFrame, path: str, partitions: int | None = None):
    """S6 to_file (N-Triples): a text sink; chunked buffering is Spark's
    task/partition model (turtle_doc.rs:425-487)."""
    out = to_ntriples(df)
    if partitions:
        out = out.repartition(partitions)
    out.write.mode("overwrite").text(path)


def rdf_json_struct() -> Column:
    """S9 RDF/JSON node encoding {type, datatype?, lang?, value} exactly
    as the reference emits it (turtle_doc.rs:1017-1099): bnode values
    drop the '_:' prefix; lang literals omit datatype."""

    def node(value: Column, kind: Column, dt=None, lang=None) -> Column:
        typ = (
            F.when(kind == "iri", F.lit("uri"))
            .when(kind == "bnode", F.lit("bnode"))
            .otherwise(F.lit("literal"))
        )
        val = F.when(
            kind == "bnode", value.substr(F.lit(3), F.length(value))
        ).otherwise(value)
        return F.struct(
            typ.alias("type"),
            (dt if dt is not None else F.lit(None).cast("string")).alias("datatype"),
            (lang if lang is not None else F.lit(None).cast("string")).alias("lang"),
            val.alias("value"),
        )

    return F.struct(
        node(F.col("s"), F.col("s_kind")).alias("subject"),
        node(F.col("p"), F.lit("iri")).alias("predicate"),
        node(
            F.col("o"), F.col("o_kind"), F.col("o_datatype"), F.col("o_lang")
        ).alias("object"),
    )


def to_rdf_json(df: DataFrame) -> DataFrame:
    """One JSON string per triple; dropDuplicates mirrors the
    reference's output dedup (turtle_doc.rs:992-1004)."""
    return df.dropDuplicates(
        ["s", "s_kind", "p", "o", "o_kind", "o_datatype", "o_lang"]
    ).select(F.to_json(rdf_json_struct(), {"ignoreNullFields": "true"}).alias("value"))


def write_rdf_json(df: DataFrame, path: str):
    to_rdf_json(df).write.mode("overwrite").text(path)


def compact_iri(col: Column) -> Column:
    """S8 longest-match prefix compaction for pretty Turtle
    (turtle_doc.rs:105-123): a when-ladder over the built-in prefix
    table, longest namespace first; rdf:type compacts to 'a'."""
    expr = None
    ladder = sorted(PRETTY_PREFIXES, key=lambda kv: -len(kv[1]))
    for pfx, ns in ladder:
        hit = col.startswith(ns)
        rep = F.concat(
            F.lit(pfx), col.substr(F.lit(len(ns) + 1), F.length(col))
        )
        expr = F.when(hit, rep) if expr is None else expr.when(hit, rep)
    out = expr.otherwise(F.concat(F.lit("<"), col, F.lit(">")))
    return F.when(col == RDF_TYPE, F.lit("a")).otherwise(out)


def to_turtle_pretty(df: DataFrame) -> DataFrame:
    """S8 as_turtle, reduced to its relational core: group by subject,
    collect (predicate, object) pairs, render one block per subject
    (turtle_doc.rs:1330-1381). Literal xsd:string drops its datatype and
    integers/booleans render bare (turtle_doc.rs:1286-1323)."""
    obj = F.when(
        F.col("o_kind") == "literal",
        F.when(
            F.col("o_datatype").isin(
                "http://www.w3.org/2001/XMLSchema#integer",
                "http://www.w3.org/2001/XMLSchema#boolean",
            ),
            F.col("o"),
        )
        .when(
            F.col("o_datatype") == XSD_STRING,
            F.concat(F.lit('"'), F.col("o"), F.lit('"')),
        )
        .otherwise(_fmt_literal((F.col("o"), F.col("o_datatype"), F.col("o_lang")))),
    ).otherwise(
        F.when(F.col("o_kind") == "iri", compact_iri(F.col("o"))).otherwise(
            F.col("o")
        )
    )
    po = F.concat(compact_iri(F.col("p")), F.lit(" "), obj)
    subj = F.when(F.col("s_kind") == "iri", compact_iri(F.col("s"))).otherwise(
        F.col("s")
    )
    grouped = (
        df.select(subj.alias("subject"), po.alias("po"))
        .groupBy("subject")
        .agg(F.collect_list("po").alias("pos"))
    )
    return grouped.select(
        F.concat(
            F.col("subject"),
            F.lit(" "),
            F.concat_ws(" ;\n\t", F.col("pos")),
            F.lit(" ."),
        ).alias("value")
    )
