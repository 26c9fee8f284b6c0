"""Triple-set relational algebra as pure DataFrame operators (SURVEY.md
§2.3, R1-R10).

Each operator maps a reference method on TurtleDoc (an O(n·m) Vec scan
— /root/reference/src/turtle/turtle_doc.rs:301-423) onto the
Catalyst-optimized equivalent: filters push down to the scan, set ops
become hash anti/semi joins, dedup becomes a shuffle-free aggregate
where possible. All operators are shape-preserving on the canonical
triple schema so they compose.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from .schema import TRIPLE_COLS


def pattern_filter(
    df: DataFrame,
    s: Optional[str] = None,
    p: Optional[str] = None,
    o: Optional[str] = None,
) -> DataFrame:
    """R1 list_statements(s?,p?,o?): each bound position is an equality
    predicate (turtle_doc.rs:405-423). Expressed declaratively so
    Catalyst pushes the predicates into the source scan."""
    out = df
    if s is not None:
        out = out.filter(F.col("s") == s)
    if p is not None:
        out = out.filter(F.col("p") == p)
    if o is not None:
        out = out.filter(F.col("o") == o)
    return out


def tt_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """R5 doc1 + doc2: union with full dedup (turtle_doc.rs:1165-1186,
    O(n^2) contains-loop there; one shuffle here)."""
    return a.unionByName(b, allowMissingColumns=True).dropDuplicates(TRIPLE_COLS)


def _row_cond(a: DataFrame, b: DataFrame):
    """Null-safe full-row equality (o_datatype/o_lang are nullable; SQL
    '=' would silently drop NULL keys from semi/anti joins)."""
    cond = None
    for c in TRIPLE_COLS:
        e = a[c].eqNullSafe(b[c])
        cond = e if cond is None else (cond & e)
    return cond


def tt_difference(a: DataFrame, b: DataFrame) -> DataFrame:
    """R3 difference: statements in a and not in b
    (turtle_doc.rs:301-312) as a null-safe left-anti join."""
    bb = b.select(*TRIPLE_COLS).alias("_b")
    aa = a.alias("_a")
    return aa.join(bb, _row_cond(aa, bb), "left_anti")


def tt_intersection(a: DataFrame, b: DataFrame) -> DataFrame:
    """R4 intersection (turtle_doc.rs:314-325) as a null-safe left-semi
    join."""
    bb = b.select(*TRIPLE_COLS).alias("_b")
    aa = a.alias("_a")
    return aa.join(bb, _row_cond(aa, bb), "left_semi")


def add_statement(df: DataFrame, row: tuple) -> DataFrame:
    """R6 add_statement: insert one triple if absent
    (turtle_doc.rs:284-293)."""
    spark = df.sparkSession
    one = spark.createDataFrame([row], df.select(*TRIPLE_COLS).schema)
    return tt_union(df.select(*TRIPLE_COLS), one)


def all_subjects(df: DataFrame) -> DataFrame:
    """R7 all_subjects: distinct subject terms (turtle_doc.rs:327-336;
    the reference's Vec::dedup relies on doc ordering — distinct is the
    set-equal strengthening, SURVEY.md R7)."""
    return df.select("s", "s_kind").distinct()


def count_statements(df: DataFrame) -> DataFrame:
    """R8 len() as a 1-row DataFrame (map-side partial agg, no wide
    shuffle)."""
    return df.agg(F.count("*").alias("n_statements"))


def subject_group_counts(df: DataFrame) -> DataFrame:
    """R9 subject grouping (the pretty-printer's groupBy,
    turtle_doc.rs:1330-1381) reduced to its aggregation core."""
    return df.groupBy("s", "s_kind").agg(F.count("*").alias("n")).orderBy(
        F.desc("n"), "s"
    )


def spo_objects_for(df: DataFrame, p: str) -> DataFrame:
    """Convenience: project objects of one predicate — the query-path
    demo (reference tests/query.rs:6-35)."""
    return pattern_filter(df, p=p).select("s", "o", "o_kind")


def parse_pattern_filter(
    df: DataFrame,
    s: Optional[str] = None,
    p: Optional[str] = None,
    o: Optional[str] = None,
    prefixes: Optional[dict] = None,
    base: Optional[str] = None,
) -> DataFrame:
    """R2 parse_and_list_statements (turtle_doc.rs:363-401): bound terms
    are given in Turtle syntax ('ex:Alice', '"42"^^xsd:integer',
    '<http://...>', '_:b1') and parsed with the same grammar before
    becoming equality predicates. Literal bindings match on
    (o, o_datatype, o_lang) with null-safe comparison."""
    from .grammar.turtle import BNODE_K, LIT_K, parse_term

    out = df
    if s is not None:
        node = parse_term(s, prefixes, base, "subject")
        val = ("_:" + node.value) if node.kind == BNODE_K else node.value
        out = out.filter(F.col("s") == val)
    if p is not None:
        node = parse_term(p, prefixes, base, "predicate")
        out = out.filter(F.col("p") == node.value)
    if o is not None:
        node = parse_term(o, prefixes, base, "object")
        if node.kind == LIT_K:
            out = out.filter(
                (F.col("o") == node.value)
                & F.col("o_datatype").eqNullSafe(F.lit(node.datatype))
                & F.col("o_lang").eqNullSafe(F.lit(node.lang))
            )
        else:
            val = ("_:" + node.value) if node.kind == BNODE_K else node.value
            out = out.filter((F.col("o") == val) & (F.col("o_kind") != "literal"))
    return out
