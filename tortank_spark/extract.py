"""Vectorized triple-extraction stage — the engine's "scan".

The whole reference parse pipeline (grammar rules P1-P24, SURVEY.md
§2.2) runs as ONE Arrow-batched ``mapInPandas`` stage over the page
table: state is document-scoped (prefix redefinition mid-doc,
turtle_doc.rs:489-540) so a document is the natural unit of work, and
documents are rows. Arrow moves batches JVM<->Python zero-copy; the
per-doc parse is pure Python but amortized across 2k-row batches —
there is no per-row Python UDF dispatch.

Scale design (100 TB / 10^12 docs):
* embarrassingly parallel — no shuffle; parallelism = input splits.
  Column pruning reaches the parquet scan (only url+text are read).
* blank-node labels are salted with sha1(url) so they are globally
  unique with zero coordination (partition-salted counters,
  SURVEY.md §4) while preserving the reference's per-doc allocation
  order.
* parse failures become quarantine rows (parse_ok=false, error) —
  never job failures.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from .grammar.turtle import parse_document
from .schema import DOC_METRICS_SCHEMA, EXTRACT_SCHEMA, TRIPLE_SCHEMA

_COLS = ["url", "s", "s_kind", "p", "o", "o_kind", "o_datatype", "o_lang",
         "parse_ok", "error"]


def _salt(url: str) -> str:
    return hashlib.sha1(url.encode("utf-8", "surrogatepass")).hexdigest()[:12] + "-"


def _extract_batches(
    batches, fixture_mode: bool,
    seed_prefixes=None, well_known_prefix=None,
):
    """Arrow-native extraction stage: consumes pyarrow RecordBatches,
    yields pyarrow RecordBatches (mapInArrow). Building ``pa.array``
    columns directly skips BOTH pandas conversions the previous
    mapInPandas shape paid (object-dtype DataFrame build + Spark's
    pandas->Arrow serialize on yield; ~50 us/page measured on the
    ~4 KB filler corpus — guide §4.2: hand whole batches to the
    columnar layer, don't route them through pandas). Columnar
    accumulation stays: one python list per output column beats a
    list of 10-tuples by ~2x on array construction — this is the
    per-triple hot path, measurably visible at 500k triples/batch."""
    import pyarrow as pa

    for rb in batches:
        cols = {c: [] for c in _COLS}
        ap = {c: cols[c].append for c in _COLS}
        for url, text in zip(
            rb.column(0).to_pylist(), rb.column(1).to_pylist()
        ):
            prefix = "" if fixture_mode else _salt(url)
            triples, err = parse_document(
                text or "", bnode_prefix=prefix,
                seed_prefixes=seed_prefixes,
                well_known_prefix=well_known_prefix,
            )
            if err is not None or not triples:
                ap["url"](url)
                ap["s"](None); ap["s_kind"](None); ap["p"](None)
                ap["o"](None); ap["o_kind"](None)
                ap["o_datatype"](None); ap["o_lang"](None)
                ap["parse_ok"](err is None)
                ap["error"](err)
            else:
                n = len(triples)
                cols["url"].extend([url] * n)
                cols["s"].extend(t[0] for t in triples)
                cols["s_kind"].extend(t[1] for t in triples)
                cols["p"].extend(t[2] for t in triples)
                cols["o"].extend(t[3] for t in triples)
                cols["o_kind"].extend(t[4] for t in triples)
                cols["o_datatype"].extend(t[5] for t in triples)
                cols["o_lang"].extend(t[6] for t in triples)
                cols["parse_ok"].extend([True] * n)
                cols["error"].extend([None] * n)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(cols[c], type=pa.bool_())
                if c == "parse_ok"
                else pa.array(cols[c], type=pa.string())
                for c in _COLS
            ],
            _COLS,
        )


def extract_triples(
    pages: DataFrame,
    fixture_mode: bool = False,
    seed_prefixes: dict | None = None,
    well_known_prefix: str | None = None,
) -> DataFrame:
    """pages(url, text, ...) -> raw extraction rows incl. quarantine rows.

    ``fixture_mode`` disables url-salting of blank-node labels so labels
    are the reference's deterministic per-doc counter ``_:1, _:2, ...``
    (turtle_doc.rs:33-51) — used by the fixture P/R harness.
    ``seed_prefixes`` (R10, turtle_doc.rs:264-283) and
    ``well_known_prefix`` (skolemization, turtle_doc.rs:733-747) are
    broadcast to every parser call as plain closure constants — tiny
    dicts ride the task closure; a huge external prefix table would use
    ``spark.sparkContext.broadcast`` instead.
    """
    cols = pages.select("url", "text")  # explicit pruning to the scan
    return cols.mapInArrow(
        lambda it: _extract_batches(it, fixture_mode, seed_prefixes,
                                    well_known_prefix),
        schema=EXTRACT_SCHEMA,
    )


def triples_only(extracted: DataFrame) -> DataFrame:
    """Keep good triple rows with the canonical triple schema."""
    return extracted.filter(F.col("parse_ok") & F.col("s").isNotNull()).select(
        *[f.name for f in TRIPLE_SCHEMA.fields]
    )


def doc_metrics(pages: DataFrame, fixture_mode: bool = False) -> DataFrame:
    """Per-document lineage/metrics rows: parse status, triple count,
    byte-fidelity witness (sha1 of text) — the per-row invariant of
    BASELINE.json input_hint is checked against this table.

    Standalone auditing entry point ONLY: it re-parses every document.
    A job that already runs extract_triples must derive its lineage
    from those extraction rows instead (as pipeline._run_bucket does) —
    calling both doubles the parse CPU for nothing."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, text in zip(pdf["url"].values, pdf["text"].values):
                text = text or ""
                prefix = "" if fixture_mode else _salt(url)
                triples, err = parse_document(text, bnode_prefix=prefix)
                sha = hashlib.sha1(text.encode("utf-8", "surrogatepass")).hexdigest()
                out.append(
                    (url, err is None, len(triples), err, sha, len(text))
                )
            yield pd.DataFrame(
                out,
                columns=["url", "parse_ok", "n_triples", "error",
                         "text_sha1", "n_chars"],
            )

    return pages.select("url", "text").mapInPandas(gen, schema=DOC_METRICS_SCHEMA)


_EMBEDDED_SCHEMA = None  # built lazily to avoid import-time Spark types


def _embedded_schema():
    global _EMBEDDED_SCHEMA
    if _EMBEDDED_SCHEMA is None:
        from pyspark.sql.types import StringType, StructField, StructType

        from .schema import TRIPLE_FIELDS

        _EMBEDDED_SCHEMA = StructType(
            [StructField("syntax", StringType(), False)] + TRIPLE_FIELDS
        )
    return _EMBEDDED_SCHEMA


def extract_embedded(
    pages: DataFrame, fixture_mode: bool = False, text_col: str = "text",
) -> DataFrame:
    """Unified embedded-KG extraction — the north star's 'embedded
    RDFa/JSON-LD/Turtle in page text' as ONE operator. Every page is
    scanned once and run through all four parsers (Turtle grammar,
    JSON-LD island expansion, RDFa-Lite attribute scan, HTML microdata
    itemscope scan); the output is the union of each syntax's good
    triples tagged with
    ``syntax in ('turtle','jsonld','rdfa','microdata')``.

    Single-pass by construction: one ``mapInPandas`` stage, so the
    page table is read ONCE (a DataFrame-level union of the four
    standalone extractors would scan 100 TB four times). A page may
    legitimately contribute triples in several syntaxes. Per-syntax
    quarantine semantics differ by design — a JSON-LD page is not a
    Turtle parse failure — so this operator emits good triples only;
    per-page parse auditing stays with the standalone extractors
    (extract_triples / jsonld.extract_jsonld / rdfa.extract_rdfa)."""
    from .jsonld import _expand_island, find_islands
    from .microdata import extract_microdata_triples
    from .rdfa import extract_rdfa_triples

    out_cols = ["syntax"] + _COLS[:8]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {c: [] for c in out_cols}

            def add(syntax, url, ts):
                k = len(ts)
                if not k:
                    return
                cols["syntax"].extend([syntax] * k)
                cols["url"].extend([url] * k)
                for j, c in enumerate(_COLS[1:8]):
                    cols[c].extend(t[j] for t in ts)

            for url, text in zip(pdf["url"].values, pdf["_emb_text"].values):
                text = text or ""
                prefix = "" if fixture_mode else _salt(url)
                t_ts, t_err = parse_document(text, bnode_prefix=prefix)
                if t_err is None:
                    add("turtle", url, t_ts)
                # conservative per-syntax dispatch (guide §1.2 "per-
                # task work"): each scanner can only ever emit when its
                # trigger token occurs somewhere in the page — JSON-LD
                # islands need a (case-insensitive) 'application/ld+
                # json' script type, every RDFa emission requires a
                # property= or typeof= attribute, every microdata
                # emission an itemscope. A substring test over the
                # lowered page is exactly conservative (false positives
                # just run the scanner and emit nothing, false
                # negatives are impossible), and skips 2-3 full HTML
                # scans on the typical single-syntax page.
                low = text.lower()
                if "ld+json" in low:
                    counter, j_ts, seen = 0, [], set()
                    for payload in find_islands(text):
                        ts, j_err, counter = _expand_island(
                            payload, prefix, counter)
                        if j_err is not None:
                            j_ts = []
                            break
                        for t in ts:
                            if t not in seen:
                                seen.add(t)
                                j_ts.append(t)
                    add("jsonld", url, j_ts)
                if "property" in low or "typeof" in low:
                    r_ts, _ = extract_rdfa_triples(text, bnode_prefix=prefix)
                    add("rdfa", url, r_ts)
                if "itemscope" in low:
                    m_ts, _ = extract_microdata_triples(
                        text, bnode_prefix=prefix)
                    add("microdata", url, m_ts)
            yield pd.DataFrame(cols)

    sel = pages.select("url", F.col(text_col).alias("_emb_text"))
    return sel.mapInPandas(gen, schema=_embedded_schema())
