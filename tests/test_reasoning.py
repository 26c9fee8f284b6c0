"""RDFS entailment (reasoning.rdfs_entailment): per-rule unit pins,
literal guards, cycles, and the single-instance-pass plan shape."""

import pyspark.sql.functions as F

from tortank_spark.reasoning import rdfs_entailment


def _triples(spark, rows, lit=False):
    if lit:
        return spark.createDataFrame(rows, "s string, p string, o string, is_lit boolean")
    return spark.createDataFrame(rows, "s string, p string, o string")


def _set(df):
    return {(r["s"], r["p"], r["o"]) for r in df.collect()}


def test_rdfs7_subproperty_instance(spark):
    t = _triples(spark, [
        ("p", "rdfs:subPropertyOf", "q"),
        ("q", "rdfs:subPropertyOf", "r"),
        ("x", "p", "y"),
    ])
    got = _set(rdfs_entailment(t))
    # rdfs5 closes p ⊑ r; rdfs7 lifts the instance through BOTH hops
    assert ("p", "rdfs:subPropertyOf", "r") in got
    assert ("x", "q", "y") in got and ("x", "r", "y") in got
    assert len(got) == 6


def test_rdfs2_3_domain_range_and_9(spark):
    t = _triples(spark, [
        ("buys", "rdfs:domain", "Customer"),
        ("buys", "rdfs:range", "Product"),
        ("Customer", "rdfs:subClassOf", "Agent"),
        ("Agent", "rdfs:subClassOf", "Entity"),
        ("alice", "buys", "widget"),
    ])
    got = _set(rdfs_entailment(t))
    assert ("alice", "rdf:type", "Customer") in got
    assert ("widget", "rdf:type", "Product") in got
    # rdfs9 lifts the DERIVED type through the closed class hierarchy
    assert ("alice", "rdf:type", "Agent") in got
    assert ("alice", "rdf:type", "Entity") in got
    assert ("Customer", "rdfs:subClassOf", "Entity") in got  # rdfs11


def test_domain_inherited_through_subproperty(spark):
    # p ⊑ q, q domain C: (x p y) must still type x as C in one pass
    t = _triples(spark, [
        ("p", "rdfs:subPropertyOf", "q"),
        ("q", "rdfs:domain", "C"),
        ("x", "p", "y"),
    ])
    assert ("x", "rdf:type", "C") in _set(rdfs_entailment(t))


def test_rdfs3_skips_literal_objects(spark):
    t = _triples(spark, [
        ("name", "rdfs:range", "Label", False),
        ("x", "name", "Alice", True),
        ("x", "knows", "y", False),
        ("knows", "rdfs:range", "Person", False),
    ], lit=True)
    out = rdfs_entailment(t, literal_col="is_lit")
    got = _set(out)
    assert ("Alice", "rdf:type", "Label") not in got
    assert ("y", "rdf:type", "Person") in got
    # entailed rows are resource-flagged; asserted literal kept as-is
    flags = {(r["s"], r["p"], r["o"]): r["is_lit"] for r in out.collect()}
    assert flags[("x", "name", "Alice")] is True
    assert flags[("y", "rdf:type", "Person")] is False


def test_subclass_cycle_terminates(spark):
    t = _triples(spark, [
        ("A", "rdfs:subClassOf", "B"),
        ("B", "rdfs:subClassOf", "A"),
        ("x", "rdf:type", "A"),
    ])
    got = _set(rdfs_entailment(t))
    assert ("x", "rdf:type", "B") in got
    assert ("A", "rdfs:subClassOf", "A") in got  # cycle ⇒ reflexive pair
    # {A⊑B, B⊑A, A⊑A, B⊑B, x:A, x:B}
    assert len(got) == 6


def test_idempotent_closure(spark):
    t = _triples(spark, [
        ("buys", "rdfs:domain", "Customer"),
        ("Customer", "rdfs:subClassOf", "Agent"),
        ("alice", "buys", "widget"),
    ])
    once = rdfs_entailment(t)
    twice = rdfs_entailment(once)
    assert _set(once) == _set(twice)


def test_instance_side_single_pass_plan(spark):
    """The big-table strata must be broadcast joins: no SortMergeJoin
    and no Exchange keyed on instance columns anywhere in the plan
    below the final distinct (the schema-closure loop runs on the tiny
    side before the plan under test is even built)."""
    t = _triples(spark, [
        ("p", "rdfs:subPropertyOf", "q"),
        ("p", "rdfs:domain", "C"),
        ("C", "rdfs:subClassOf", "D"),
        ("x", "p", "y"),
    ])
    out = rdfs_entailment(t)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_shacl_validate_all_violation_classes(spark):
    """minCount via absent property (left-join case), maxCount,
    datatype mismatch, lang-literal-vs-datatype, nodeKind — and a
    fully-conforming shape emits nothing."""
    from tortank_spark.reasoning import shacl_validate

    T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    XSD = "http://www.w3.org/2001/XMLSchema#"
    triples = spark.createDataFrame([
        ("e1", "iri", T, "C", "iri", None, None),
        ("e1", "iri", "p:name", "Ada", "literal", XSD + "string", None),
        ("e1", "iri", "p:age", "x", "literal", XSD + "string", None),
        ("e1", "iri", "p:addr", "_:1", "bnode", None, None),
        ("e1", "iri", "p:addr", "_:2", "bnode", None, None),
        ("e2", "iri", T, "C", "iri", None, None),
        ("e2", "iri", "p:age", "3", "literal", XSD + "integer", None),
        ("e2", "iri", "p:tag", "hi", "literal", None, "en"),
        ("e2", "iri", "p:ref", "lit", "literal", XSD + "string", None),
        ("e3", "iri", T, "Other", "iri", None, None),  # not targeted
        ("e3", "iri", "p:age", "y", "literal", XSD + "string", None),
    ], "s string, s_kind string, p string, o string, o_kind string,"
       " o_datatype string, o_lang string")
    shapes = spark.createDataFrame([
        ("sh1", "C", "p:name", 1, None, XSD + "string", None),
        ("sh2", "C", "p:age", None, None, XSD + "integer", None),
        ("sh3", "C", "p:addr", None, 1, None, "bnode"),
        ("sh4", "C", "p:tag", None, None, XSD + "string", None),
        ("sh5", "C", "p:ref", None, None, None, "iri"),
    ], "shape_id string, target_class string, path string,"
       " min_count int, max_count int, datatype string, node_kind string")
    got = {(r["s"], r["shape_id"], r["code"], r["expected"], r["got"])
           for r in shacl_validate(triples, shapes).collect()}
    assert got == {
        ("e1", "sh2", "datatype", XSD + "integer", XSD + "string"),
        ("e1", "sh3", "maxCount", "1", "2"),
        ("e2", "sh1", "minCount", "1", "0"),
        ("e2", "sh4", "datatype", XSD + "string", "literal"),
        ("e2", "sh5", "nodeKind", "iri", XSD + "string"),
    }
    # untargeted class e3 produced nothing, conforming e1/p:name nothing


def test_shacl_validate_broadcasts_shapes(spark):
    from tests.test_plans import plan_of
    from tortank_spark.reasoning import shacl_validate

    T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    triples = spark.createDataFrame(
        [("e1", "iri", T, "C", "iri", None, None)],
        "s string, s_kind string, p string, o string, o_kind string,"
        " o_datatype string, o_lang string")
    shapes = spark.createDataFrame(
        [("sh1", "C", "p:x", 1, None, None, None)],
        "shape_id string, target_class string, path string,"
        " min_count int, max_count int, datatype string, node_kind string")
    plan = plan_of(shacl_validate(triples, shapes))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
