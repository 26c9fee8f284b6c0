"""Serializers — the reference's Display/as_turtle/RDF-JSON sinks as
pure column expressions (SURVEY.md §2.1 S6-S9). Everything row-wise is
JVM-side (whole-stage codegen); no Python runs per row.

Byte fidelity (S7): ``ntriples_line`` reproduces the reference's
``Display`` output byte-for-byte (turtle_doc.rs:1188-1270):

* Quoted (string-ish) literals use the LONG double-quote separator
  ``\"\"\"`` by default, switching to ``'''`` when the value ends with
  ``\"`` or contains ``\"\"\"`` (turtle_doc.rs:1198-1205; quote tokens
  lib.rs:36-39). The reference's ``value.replace("'''", "\\'\\'\\'")``
  is a byte-level no-op in Rust, so values are emitted raw.
* Natively-typed literals (Integer/Decimal/Double/Boolean and coerced
  Date/DateTime) use a plain ``\"`` pair (turtle_doc.rs:1212-1238).
  Coerced temporals are recognized by their canonical lexical form
  (the parser canonicalizes at coercion time; a value that LOOKS
  canonical would have coerced). xsd:time never coerces with the
  reference's format ladder (see grammar/lexical.py) so time literals
  always take the Quoted path.
* DateTime offsets: the reference renders DateTime in the value's own
  UTC offset (chrono to_rfc3339, turtle_doc.rs:1225-1231). The default
  parse canonicalizes instants to UTC ``Z`` (same chrono equality
  class), so non-UTC inputs serialize as their UTC instant; pass
  ``preserve_datetime_offset=True`` to parse_document/TurtleParser for
  byte-parity with chrono on non-UTC values too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from .grammar.lexical import (
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATE_TIME,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
)

# the reference's built-in prefix table for pretty Turtle output
# (turtle_doc.rs:55-104), reproduced as data — it is part of the
# observable output format. Longest-namespace-first application
# reproduces PREFIX_OR_NONE's sort (turtle_doc.rs:106-111).
PRETTY_PREFIXES = [
    ("rdf:", "http://www.w3.org/1999/02/22-rdf-syntax-ns#"),
    ("org:", "http://www.w3.org/ns/org#"),
    ("rdfs:", "http://www.w3.org/2000/01/rdf-schema#"),
    ("xsd:", "http://www.w3.org/2001/XMLSchema#"),
    ("foaf:", "http://xmlns.com/foaf/0.1/"),
    ("dc:", "http://purl.org/dc/elements/1.1/"),
    ("dcterms:", "http://purl.org/dc/terms/"),
    ("skos:", "http://www.w3.org/2004/02/skos/core#"),
    ("prov:", "http://www.w3.org/ns/prov#"),
    ("schema:", "http://schema.org/"),
    ("dcat:", "http://www.w3.org/ns/dcat#"),
    ("adms:", "http://www.w3.org/ns/adms#"),
    ("tree:", "https://w3id.org/tree#"),
    ("qunit:", "http://qudt.org/vocab/unit/"),
    ("quantitykind:", "http://qudt.org/vocab/quantitykind/"),
    ("vs:", "http://www.w3.org/2003/06/sw-vocab-status/ns#"),
    ("tribont:", "https://w3id.org/tribont/core#"),
    ("conceptscheme:", "http://data.vlaanderen.be/id/conceptscheme/"),
    ("cidoc:", "http://www.cidoc-crm.org/cidoc-crm/"),
    ("mu:", "http://mu.semte.ch/vocabularies/core/"),
    ("besluit:", "http://data.vlaanderen.be/ns/besluit#"),
    ("mandaat:", "http://data.vlaanderen.be/ns/mandaat#"),
    ("eli:", "http://data.europa.eu/eli/ontology#"),
    ("euvoc:", "http://publications.europa.eu/ontology/euvoc#"),
    ("mobiliteit:", "https://data.vlaanderen.be/ns/mobiliteit#"),
    ("ldes:", "http://w3id.org/ldes#"),
    ("owl:", "http://www.w3.org/2002/07/owl#"),
    ("qb:", "http://purl.org/linked-data/cube#"),
    ("time:", "http://www.w3.org/2006/time#"),
    ("geo:", "http://www.w3.org/2003/01/geo/wgs84_pos#"),
    ("vcard:", "http://www.w3.org/2006/vcard/ns#"),
    ("cc:", "http://creativecommons.org/ns#"),
    ("rdfa:", "http://www.w3.org/ns/rdfa#"),
    ("ssn:", "http://www.w3.org/ns/ssn/"),
    ("rr:", "http://www.w3.org/ns/r2rml#"),
    ("wot:", "http://xmlns.com/wot/0.1/"),
    ("dbo:", "http://dbpedia.org/ontology/"),
    ("dbp:", "http://dbpedia.org/property/"),
    ("ex:", "http://example.org/"),
    ("bibo:", "http://purl.org/ontology/bibo/"),
    ("obo:", "http://purl.obolibrary.org/obo/"),
    ("ext:", "http://mu.semte.ch/vocabularies/ext/"),
    ("qudt:", "http://qudt.org/schema/qudt/"),
]

# native-typed literals that always render with a plain '"' pair
_NATIVE_DTS = (XSD_INTEGER, XSD_DECIMAL, XSD_DOUBLE, XSD_BOOLEAN)
# canonical lexical forms the parser emits at coercion time. The
# offset alternative only arises under preserve_datetime_offset mode
# (chrono to_rfc3339 keeps the value's own offset). Shape alone is
# NOT sufficient to conclude "coerced": a range-invalid value like
# 2024-13-05T...+02:00 matches the shape but fails chrono coercion
# and stays verbatim — the reference then renders it via the QUOTED
# path. _is_native therefore additionally requires the value to
# actually parse as a timestamp (try_to_timestamp, JVM-side), which
# also closes the same latent flaw for Z-shaped invalid values.
_CANON_DATETIME_RE = (
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}(Z|[+-]\d{2}:\d{2})$"
)
_CANON_DATE_RE = r"^\d{4}-\d{2}-\d{2}$"


def _fmt_term(value: Column, kind: Column) -> Column:
    """IRIs -> <iri>; bnodes already carry the _: prefix; used for s/p."""
    return F.when(kind == "iri", F.concat(F.lit("<"), value, F.lit(">"))).otherwise(
        value
    )


def _is_native(o: Column, dt: Column) -> Column:
    """True when the literal is a reference native type (Integer/
    Decimal/Double/Boolean always; Date/DateTime iff coerced, i.e. the
    lexical form is the parser's canonical output).

    Residual fidelity edge (ADVICE r04): the validity gate uses JVM
    ``try_to_timestamp``, whose accepted grammar is not byte-identical
    to chrono's coercion at extreme edges — leap-second ``:60``
    values, offsets beyond +/-18:00. Such values would route Quoted
    here where the reference might render them native. All of them are
    outside valid xsd:dateTime AND fail this repo's own parser
    coercion (grammar/lexical.parse_instant), so no value that reaches
    this sink through the pipeline can hit the divergence; it only
    matters for hand-built triple rows fed directly to the serializer
    with a pre-canonicalized-but-invalid lexical form. If byte parity
    at these edges ever matters, gate on parse_instant via a small UDF
    instead."""
    return (
        dt.isin(*_NATIVE_DTS)
        | ((dt == XSD_DATE) & o.rlike(_CANON_DATE_RE))
        | ((dt == XSD_DATE_TIME) & o.rlike(_CANON_DATETIME_RE)
           & F.try_to_timestamp(o).isNotNull())
    )


def _quoted_value(o: Column) -> Column:
    """Quoted-literal body with the reference's separator selection
    (turtle_doc.rs:1198-1205): default LONG quote, long-single when the
    value ends with '\"' or contains '\"\"\"'. Values are raw — the
    reference's ''' replacement is a no-op."""
    needs_single = o.endswith('"') | o.contains('"""')
    return F.when(
        needs_single, F.concat(F.lit("'''"), o, F.lit("'''"))
    ).otherwise(F.concat(F.lit('"""'), o, F.lit('"""')))


def _fmt_literal(df_cols) -> Column:
    """Reference Display for a literal node (turtle_doc.rs:1193-1238)."""
    o, dt, lang = df_cols
    native = F.concat(F.lit('"'), o, F.lit('"'), F.lit("^^<"), dt, F.lit(">"))
    quoted = _quoted_value(o)
    with_suffix = F.when(
        dt.isNotNull(), F.concat(quoted, F.lit("^^<"), dt, F.lit(">"))
    ).otherwise(
        F.when(lang.isNotNull(), F.concat(quoted, F.lit("@"), lang)).otherwise(
            quoted
        )
    )
    return F.when(_is_native(o, dt), native).otherwise(with_suffix)


def ntriples_line() -> Column:
    """One canonical line per row (Display for Statement,
    turtle_doc.rs:1248-1257: '{subject} {predicate} {object}.')."""
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
    """JSON-lines sink — the distributed-friendly layout (one object per
    line, splittable); ``read_rdf_json`` reads it back."""
    to_rdf_json(df).write.mode("overwrite").text(path)


def write_rdf_json_array(df: DataFrame, path: str, buf_size: int = 1024):
    """S9 to_file(json=true): ONE file holding ONE JSON array
    (turtle_doc.rs:450-481). An array file is inherently single-writer,
    so this streams partitions through the driver with a bounded buffer
    (toLocalIterator — never a full collect); use ``write_rdf_json``
    for the scale path. The reference's chunked writer drops the comma
    between chunks (turtle_doc.rs:457-471 joins within a chunk only),
    which is only valid JSON when unchunked; we emit the corrected
    always-valid form."""
    import itertools

    with open(path, "w", encoding="utf-8") as fh:
        fh.write("[")
        first = True
        it = to_rdf_json(df).toLocalIterator()
        while True:
            chunk = list(itertools.islice(it, buf_size))
            if not chunk:
                break
            if not first:
                fh.write(",")
            fh.write(",".join(r["value"] for r in chunk))
            first = False
        fh.write("]\n")


# --------------------------------------------------------------- S8 ---

def _compact_iri_expr(col: Column, with_prefix: bool) -> Column:
    """PREFIX_OR_NONE (turtle_doc.rs:106-123): longest-namespace-first
    substring replace; falls back to <iri>. When ``with_prefix`` the
    result is a struct (text, prefix) so callers can collect the used
    prefixes for the @prefix header."""
    expr = None
    pfx_expr = None
    ladder = sorted(PRETTY_PREFIXES, key=lambda kv: -len(kv[1]))
    for pfx, ns in ladder:
        hit = col.contains(ns)
        rep = F.replace(col, F.lit(ns), F.lit(pfx))
        expr = F.when(hit, rep) if expr is None else expr.when(hit, rep)
        pf = F.lit(pfx)
        pfx_expr = F.when(hit, pf) if pfx_expr is None else pfx_expr.when(hit, pf)
    text = expr.otherwise(F.concat(F.lit("<"), col, F.lit(">")))
    # rdf:type compacts all the way to 'a' (SPECIAL_TTL_RDF_TYPE_PREFIX)
    text = F.when(col == RDF_TYPE, F.lit("a")).otherwise(text)
    if not with_prefix:
        return text
    return F.struct(
        text.alias("text"), pfx_expr.otherwise(F.lit(None)).alias("prefix")
    )


def compact_iri(col: Column) -> Column:
    """S8 prefix compaction of one IRI column."""
    return _compact_iri_expr(col, with_prefix=False)


def _turtle_object() -> Column:
    """object_to_turtle (turtle_doc.rs:1278-1329): integers/booleans
    bare; double/decimal/date/dateTime/time as '"lex"^^xsd:t'; plain
    strings keep the Display quoting but drop ^^xsd:string; other
    literals keep full Display; IRIs compact."""
    o, dt, lang = F.col("o"), F.col("o_datatype"), F.col("o_lang")
    bare = dt.isin(XSD_INTEGER, XSD_BOOLEAN)
    xsd_short = {
        XSD_DOUBLE: "double", XSD_DECIMAL: "decimal", XSD_DATE: "date",
        XSD_DATE_TIME: "dateTime",
    }
    lit_disp = _fmt_literal((o, dt, lang))
    compact_native = None
    for full, short in xsd_short.items():
        rep = F.concat(F.lit('"'), o, F.lit('"'), F.lit(f"^^xsd:{short}"))
        cond = (dt == full) & _is_native(o, dt)
        compact_native = (
            F.when(cond, rep) if compact_native is None
            else compact_native.when(cond, rep)
        )
    lit_out = F.when(bare, o).otherwise(
        compact_native.otherwise(
            F.when(dt == XSD_STRING, _quoted_value(o)).otherwise(lit_disp)
        )
    )
    return F.when(
        F.col("o_kind") == "literal", lit_out
    ).otherwise(
        F.when(F.col("o_kind") == "iri", compact_iri(F.col("o"))).otherwise(
            F.col("o")
        )
    )


def to_turtle_pretty(df: DataFrame) -> DataFrame:
    """S8 as_turtle blocks (turtle_doc.rs:1330-1381): one row per
    subject; within a block, predicates joined ';\\n' (later predicates
    tab-indented), per-predicate objects comma-joined in CHUNKS OF 2,
    chunk continuation lines indented two (first predicate) or three
    tabs. Subjects keep their Display form (the reference groups on
    subject.to_string() — subjects are not compacted). Predicate order
    within a block and block order are sorted here; the reference
    iterates HashMaps, i.e. leaves both unspecified."""
    subj = _fmt_term(F.col("s"), F.col("s_kind"))
    pred = _compact_iri_expr(F.col("p"), with_prefix=True)
    obj = _turtle_object()
    # object-side prefixes count as "used" too (PREFIX_OR_NONE inserts
    # into used_prefixes from object_to_turtle, turtle_doc.rs:1283)
    opfx = F.when(
        F.col("o_kind") == "iri",
        _compact_iri_expr(F.col("o"), with_prefix=True)["prefix"],
    )
    grouped = (
        df.select(subj.alias("subject"), pred.alias("pred"), obj.alias("obj"),
                  opfx.alias("opfx"))
        .groupBy("subject", F.col("pred.text").alias("p"))
        .agg(
            F.collect_list("obj").alias("objs"),
            F.array_union(
                F.collect_set("pred.prefix"), F.collect_set("opfx")
            ).alias("_pfx"),
        )
        .groupBy("subject")
        .agg(
            F.sort_array(F.collect_list(F.struct("p", "objs"))).alias("preds"),
            F.flatten(F.collect_set("_pfx")).alias("_pfx"),
        )
    )

    def chunk_join(objs: Column, idx: Column) -> Column:
        # chunks(2).join(", ") within, ",\n\t\t{extra}" between
        n = F.size(objs)
        chunks = F.transform(
            F.sequence(F.lit(0), F.floor((n - 1) / 2).cast("int")),
            lambda i: F.concat_ws(", ", F.slice(objs, i * 2 + 1, 2)),
        )
        sep = F.when(idx == 0, F.lit(",\n\t\t")).otherwise(F.lit(",\n\t\t\t"))
        return F.array_join(
            F.transform(
                chunks,
                lambda c, j: F.when(j == 0, c).otherwise(F.concat(sep, c)),
            ),
            "",
        )

    block = F.concat(
        F.col("subject"),
        F.lit(" "),
        F.array_join(
            F.transform(
                F.col("preds"),
                lambda pr, i: F.concat(
                    F.when(i == 0, F.lit("")).otherwise(F.lit("\t")),
                    pr["p"],
                    F.lit(" "),
                    chunk_join(pr["objs"], i),
                ),
            ),
            ";\n",
        ),
        F.lit("."),
    )
    return grouped.select(block.alias("value"), F.col("_pfx").alias("_prefixes"))


_PREFIX_NS = dict(PRETTY_PREFIXES)


def turtle_document(df: DataFrame) -> str:
    """Assemble the full as_turtle document: '@prefix k <v>.' header for
    every used prefix (xsd always included, turtle_doc.rs:1332), blank
    line, subject blocks joined by blank lines. Driver-side assembly —
    pretty Turtle is a human/report format and the facade's contract
    is ONE string (the reference returns String, turtle_doc.rs:1330),
    so the document itself is inherently driver-resident; the blocks
    stream through toLocalIterator (one sorted partition at a time)
    rather than a full collect, so peak memory is the output string
    plus one partition, not 2x the document. The scale sink is
    write_ntriples / write_turtle_pretty."""
    used = {"xsd:"}
    parts = []
    for r in to_turtle_pretty(df).orderBy("value").toLocalIterator():
        used.update(p for p in (r["_prefixes"] or []) if p)
        parts.append(r["value"])
    header = "\n".join(
        f"@prefix {p} <{_PREFIX_NS[p]}>." for p in sorted(used)
    )
    return header + "\n\n" + "\n\n".join(parts)


def write_turtle_pretty(df: DataFrame, path: str) -> None:
    """Stream the pretty-Turtle document to ``path`` without ever
    materializing it as one string: header first (prefixes gathered in
    one small distributed aggregate), then sorted subject blocks via
    toLocalIterator. Pretty Turtle is single-file by nature (one
    header, inter-block separators), so a single bounded-memory driver
    writer is the honest scale path — same stance as
    write_rdf_json_array."""
    pretty = to_turtle_pretty(df)
    used = {"xsd:"}
    for r in (
        pretty.select(F.explode("_prefixes").alias("p")).distinct().collect()
    ):
        if r["p"]:
            used.add(r["p"])
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(
            f"@prefix {p} <{_PREFIX_NS[p]}>." for p in sorted(used)
        ))
        # byte-identical to turtle_document(df): blocks separated (not
        # terminated) by blank lines after the header
        for r in pretty.select("value").orderBy("value").toLocalIterator():
            fh.write("\n\n")
            fh.write(r["value"])
