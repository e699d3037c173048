"""Deterministic NER-mention + pattern-OpenIE triple extraction.

Replaces the reference's per-document LLM call + tuple-grammar parser
(entity_extractor.py:28-41 LLM call; :135-179 ``##`` / ``<|>`` record
parse; :181-236 entity record parse; :238-270 relationship record parse)
with a deterministic dependency-pattern grammar applied inside an
Arrow-batched ``mapInPandas`` — a 1→N (UDTF-shaped) transform, per
SURVEY.md §2.3 X1-X4 and BASELINE.json input_hint ("no per-row Python").

The grammar below is the machine-checkable analogue of the reference's
prompt spec (prompt.py:16-144): entity types from schema.yaml:2-139,
relation vocabulary AUTHORED/REVIEWED/BELONGS_TO/ASSIGNED_TO/MERGES_FROM/
MERGES_TO/MEMBER_OF/MANAGES/WORKS_AT/WORKS_ON/CREATED (prompt.py:62-69),
strength bands 6-10 (prompt.py:77-81), naming standards (Person full name
with email; Organization with domain; Repository as owner/repo; Issue as
"Issue <KEY-n>"; PR as "Pull Request #<n>" — prompt.py:34-48).

Output: ONE unified DataFrame (kind ∈ {mention, triple}) so the expensive
UDF runs exactly once per page; the pipeline materializes it at a stage
boundary and filters twice.  Mirrors the reference emitting entities and
relationships from a single parse (entity_extractor.py:150-179) —
source-doc tracking included (sources ← url, entity_extractor.py:219-224).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from knowledgegraph_spark.config import DEFAULT_STRENGTH, STRENGTH_BY_PRED

# --- mention sub-grammars --------------------------------------------------

_P = r"(?:[A-Z][a-z]+|[A-Z]\.) [A-Z][a-z]+(?: \([a-z0-9._%+-]+@[a-z0-9.-]+\))?"
_ORG = r"[A-Z][A-Za-z]*(?: [A-Z][A-Za-z]*)*(?: \[[a-z0-9.-]+\])?"
_REPO = r"[a-z0-9-]+/[a-z0-9-]+"
_BRANCH = r"[a-z0-9][a-z0-9/_-]*"
_PR = r"Pull Request #\d+"
_ISSUE = r"Issue [A-Z]+-\d+"

_PERSON_PARSE = re.compile(
    r"^((?:[A-Z][a-z]+|[A-Z]\.) [A-Z][a-z]+)(?: \(([a-z0-9._%+-]+@[a-z0-9.-]+)\))?$"
)
_ORG_PARSE = re.compile(
    r"^([A-Z][A-Za-z]*(?: [A-Z][A-Za-z]*)*)(?: \[([a-z0-9.-]+)\])?$"
)

# --- sentence-level dependency patterns -------------------------------------
# Each: (compiled regex, handler producing (mentions, triples)).
# Handlers receive the match and return lists of dicts.


def _person(m_str: str, **attrs) -> dict:
    pm = _PERSON_PARSE.match(m_str)
    return {"name": pm.group(1), "type": "Person", "email": pm.group(2), **attrs}


def _org(m_str: str) -> dict:
    om = _ORG_PARSE.match(m_str)
    return {"name": om.group(1), "type": "Organization", "domain": om.group(2)}


def _simple(name: str, typ: str, **attrs) -> dict:
    return {"name": name, "type": typ, "email": None, "domain": None, **attrs}


def _pattern_table():
    """(regex, handler, relation_tag, literal) rows.

    ``relation_tag`` is the per-pattern provenance tag folded into the
    edge's ``relationTags`` array (reference merges relationTag STRING[]
    per relation, systematic_merge_provider.py:1010-1087, schema.yaml:152).
    Attribute-bearing patterns populate the per-type attribute fields the
    reference's entity-record parse extracts (entity_extractor.py:181-236,
    field specs entity_config.yaml:18-491): role, worksAt, title, status,
    location, labels.

    ``literal`` is a substring every line matching the pattern must
    contain — the cheap dispatch run before the anchored regex.  A C-level
    ``in`` check (~100 ns) replaces a failed regex attempt (~1 µs), so a
    line that matches nothing (most web text) costs len(table) substring
    scans instead of len(table) regex engine invocations.  Guards are
    NECESSARY conditions only; the regex remains the sole decider, so
    first-match-wins semantics are bit-identical to the unguarded cascade
    (tests/test_extraction.py golden parity).
    """
    def works_at(m):
        p, o = _person(m.group(1)), _org(m.group(2))
        return [p, o], [(p, "WORKS_AT", o)]

    def works_at_role(m):
        o = _org(m.group(2))
        p = _person(m.group(1), role=m.group(3), worksAt=_ORG_PARSE.match(m.group(2)).group(1))
        return [p, o], [(p, "WORKS_AT", o)]

    def holds_title(m):
        p = _person(m.group(1), title=m.group(2))
        return [p], []

    def based_in(m):
        p = _person(m.group(1), location=m.group(2))
        return [p], []

    def issue_status(m):
        s = _simple(m.group(1), "Issue", status=m.group(2))
        return [s], []

    def pr_labels(m):
        s = _simple(m.group(1), "CodeChangeRequest", labels=[m.group(2), m.group(3)])
        return [s], []

    def works_on(m):
        p, o = _person(m.group(1)), _simple(m.group(2), "Project")
        return [p, o], [(p, "WORKS_ON", o)]

    def member_of(m):
        p, o = _person(m.group(1)), _simple(m.group(2), "Team")
        return [p, o], [(p, "MEMBER_OF", o)]

    def manages(m):
        p, o = _person(m.group(1)), _simple(m.group(2), "Team")
        return [p, o], [(p, "MANAGES", o)]

    def authored(m):
        p, o = _person(m.group(1)), _simple(m.group(2), "CodeChangeRequest")
        return [p, o], [(p, "AUTHORED", o)]

    def reviewed(m):
        p, o = _person(m.group(1)), _simple(m.group(2), "CodeChangeRequest")
        return [p, o], [(p, "REVIEWED", o)]

    def pr_belongs(m):
        s, o = _simple(m.group(1), "CodeChangeRequest"), _simple(m.group(2), "Repository")
        return [s, o], [(s, "BELONGS_TO", o)]

    def assigned(m):
        s, o = _simple(m.group(1), "Issue"), _person(m.group(2))
        return [s, o], [(s, "ASSIGNED_TO", o)]

    def merges(m):
        s = _simple(m.group(1), "CodeChangeRequest")
        b1 = _simple(m.group(2), "Branch")
        b2 = _simple(m.group(3), "Branch")
        return [s, b1, b2], [(s, "MERGES_FROM", b1), (s, "MERGES_TO", b2)]

    def created_repo(m):
        p, o = _person(m.group(1)), _simple(m.group(2), "Repository")
        return [p, o], [(p, "CREATED", o)]

    def created_event(m):
        p, o = _person(m.group(1)), _simple(m.group(2), "Event")
        return [p, o], [(p, "CREATED", o)]

    def issue_topic(m):
        s, o = _simple(m.group(1), "Issue"), _simple(m.group(2), "Topic")
        return [s, o], [(s, "BELONGS_TO", o)]

    _ROLE = r"[A-Z][a-z]+(?: [A-Z][a-z]+)*"
    return [
        # attribute-bearing works-at first: the plain works-at regex would
        # otherwise swallow the " as a ..." suffix into the org name
        (
            re.compile(rf"^({_P}) works at ({_ORG}) as a ({_ROLE})\.$"),
            works_at_role,
            "works_at:role",
            " works at ",
        ),
        (re.compile(rf"^({_P}) works at ({_ORG})\.$"), works_at, "works_at", " works at "),
        (re.compile(rf"^({_P}) works on Project ([A-Z][a-z]+)\.$"), works_on, "works_on", " works on Project "),
        (re.compile(rf"^({_P}) is a member of the ([A-Z][a-z]+) team\.$"), member_of, "member_of", " is a member of the "),
        (re.compile(rf"^({_P}) manages the ([A-Z][a-z]+) team\.$"), manages, "manages", " manages the "),
        (re.compile(rf"^({_P}) authored ({_PR})\.$"), authored, "authored", " authored Pull Request "),
        (re.compile(rf"^({_P}) reviewed ({_PR})\.$"), reviewed, "reviewed", " reviewed Pull Request "),
        (re.compile(rf"^({_PR}) belongs to ({_REPO})\.$"), pr_belongs, "belongs_to:repo", " belongs to "),
        (re.compile(rf"^({_ISSUE}) is assigned to ({_P})\.$"), assigned, "assigned_to", " is assigned to "),
        (
            re.compile(rf"^({_PR}) merges branch ({_BRANCH}) into branch ({_BRANCH})\.$"),
            merges,
            "merges",
            " merges branch ",
        ),
        (re.compile(rf"^({_P}) created the repository ({_REPO})\.$"), created_repo, "created:repo", " created the repository "),
        (re.compile(rf'^({_P}) created the "([^"]+)" event\.$'), created_event, "created:event", ' created the "'),
        (re.compile(rf'^({_ISSUE}) belongs to the topic "([^"]+)"\.$'), issue_topic, "belongs_to:topic", ' belongs to the topic "'),
        (re.compile(rf'^({_P}) holds the title "([^"]+)"\.$'), holds_title, None, ' holds the title "'),
        (re.compile(rf"^({_P}) is based in ([A-Z][a-z]+)\.$"), based_in, None, " is based in "),
        (re.compile(rf"^({_ISSUE}) has status ([A-Z][a-z]+)\.$"), issue_status, None, " has status "),
        (
            re.compile(rf'^({_PR}) is labeled "([a-z-]+)" and "([a-z-]+)"\.$'),
            pr_labels,
            None,
            ' is labeled "',
        ),
    ]


_PATTERNS = _pattern_table()

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("kind", T.StringType(), False),  # mention | triple | error
        T.StructField("ord", T.IntegerType(), True),   # mention order in page
        T.StructField("name", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("domain", T.StringType(), True),
        # per-type attributes (entity_extractor.py:181-236 record parse)
        T.StructField("role", T.StringType(), True),
        T.StructField("worksAt", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("labels", T.ArrayType(T.StringType()), True),
        T.StructField("subj_name", T.StringType(), True),
        T.StructField("subj_type", T.StringType(), True),
        T.StructField("pred", T.StringType(), True),
        T.StructField("obj_name", T.StringType(), True),
        T.StructField("obj_type", T.StringType(), True),
        T.StructField("strength", T.FloatType(), True),
        # mention rows: the source sentence (feeds rawDescriptions);
        # triple rows: the source sentence; error rows: the error message
        T.StructField("description", T.StringType(), True),
        T.StructField("relation_tag", T.StringType(), True),
    ]
)

_NULL_MENTION = {
    "name": None, "type": None, "email": None, "domain": None,
    "role": None, "worksAt": None, "title": None, "status": None,
    "location": None, "labels": None,
}
_NULL_TRIPLE = {
    "subj_name": None, "subj_type": None, "pred": None,
    "obj_name": None, "obj_type": None, "strength": None, "relation_tag": None,
}

# A page whose text exceeds this is quarantined, not processed: a single
# pathological page (a multi-hundred-MB crawl artifact) must not blow a
# worker's memory or stall its task at web scale.
MAX_TEXT_BYTES = 10_000_000


def extract_page_py(url, warc_ts, text: str, max_text_bytes: int = MAX_TEXT_BYTES) -> list[dict]:
    """Pure-Python per-page extraction (unit-testable without Spark).

    Raises on pathological input (oversized page); the Spark wrapper
    catches per page and quarantines (kind='error') so one poisoned page
    never kills the job (reference failed-doc ledger,
    vespa_email_pipeline.py:61,105-127).
    """
    rows: list[dict] = []
    if not text:
        return rows
    if len(text) > max_text_bytes:
        raise ValueError(
            f"page text {len(text)} bytes exceeds max_text_bytes={max_text_bytes}"
        )
    ordinal = 0
    for line in text.split("\n"):
        line = line.strip()
        if not line:
            continue
        for pat, handler, tag, lit in _PATTERNS:
            if lit not in line:  # cheap dispatch before the regex engine
                continue
            m = pat.match(line)
            if m is None:
                continue
            mentions, triples = handler(m)
            for mm in mentions:
                rows.append(
                    {
                        "url": url, "warc_ts": warc_ts, "kind": "mention",
                        "ord": ordinal,
                        **{k: mm.get(k) for k in _NULL_MENTION},
                        **_NULL_TRIPLE,
                        "description": line,
                    }
                )
                ordinal += 1
            for s, pred, o in triples:
                rows.append(
                    {
                        "url": url, "warc_ts": warc_ts, "kind": "triple",
                        "ord": None,
                        **_NULL_MENTION,
                        "subj_name": s["name"], "subj_type": s["type"],
                        "pred": pred, "obj_name": o["name"], "obj_type": o["type"],
                        "strength": STRENGTH_BY_PRED.get(pred, DEFAULT_STRENGTH),
                        "description": line,
                        "relation_tag": tag,
                    }
                )
            break  # first matching pattern wins (grammar is unambiguous)
    return rows


def extract_mentions_and_triples(
    pages_text: DataFrame, max_text_bytes: int = MAX_TEXT_BYTES
) -> DataFrame:
    """pages(url, warc_ts, text, lang) → unified extracted rows.

    Scale notes: the UDF is CPU-bound and embarrassingly parallel — the
    stage scales linearly with input partitions (this is the stage that
    must dominate for the N→4N scaling-efficiency target).  Only
    (url, warc_ts, text) are shipped into Arrow; all other columns pruned.
    Non-English pages are filtered before the UDF (predicate reaches the
    parquet scan — reference's doc_type routing, prompt_factory.py:48-74).

    Per-page failures quarantine as kind='error' rows (description = the
    error) instead of failing the task: one poisoned page out of 10^9
    must cost one ledger row, not the job.
    """
    src = (
        pages_text
        .filter(F.col("lang") == "en")
        .select("url", "warc_ts", "text")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in EXTRACTED_SCHEMA.fields]
        for pdf in batches:
            out: list[dict] = []
            for url, ts, text in zip(pdf["url"], pdf["warc_ts"], pdf["text"]):
                try:
                    out.extend(extract_page_py(url, ts, text, max_text_bytes))
                except Exception as exc:  # noqa: BLE001 — quarantine, never die
                    out.append(
                        {
                            "url": url, "warc_ts": ts, "kind": "error",
                            "ord": None, **_NULL_MENTION, **_NULL_TRIPLE,
                            "description": f"{type(exc).__name__}: {exc}"[:500],
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    return src.mapInPandas(run, schema=EXTRACTED_SCHEMA)


def extract_pages(
    pages: DataFrame, max_text_bytes: int = MAX_TEXT_BYTES
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → unified extracted rows,
    html→text and mention/triple extraction fused into ONE Python crossing.

    ``with_extracted_text`` + ``extract_mentions_and_triples`` are two
    back-to-back Python eval nodes, so the full text column is serialized
    JVM→Python→JVM twice (guide §4: you cannot remove the boundary, but
    you control how often the bytes cross it).  This operator runs the
    exact same two pure-Python kernels (``html_text.extract_text_py``
    then ``extract_page_py``) inside one ``mapInPandas``, halving the
    Arrow traffic for the widest column in the pipeline.  Semantics are
    identical by construction: the lang filter still reaches the scan,
    ``extract_text_py`` runs OUTSIDE the quarantine try (an html-stage
    failure kills the task exactly as the separate UDF did), and
    per-page extraction failures quarantine as kind='error'.
    """
    from knowledgegraph_spark.operators.html_text import extract_text_py

    src = (
        pages
        .filter(F.col("lang") == "en")
        .select("url", "warc_ts", "html", "text")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in EXTRACTED_SCHEMA.fields]
        for pdf in batches:
            out: list[dict] = []
            for url, ts, html, pre_text in zip(
                pdf["url"], pdf["warc_ts"], pdf["html"], pdf["text"]
            ):
                text = extract_text_py(html, pre_text)
                try:
                    out.extend(extract_page_py(url, ts, text, max_text_bytes))
                except Exception as exc:  # noqa: BLE001 — quarantine, never die
                    out.append(
                        {
                            "url": url, "warc_ts": ts, "kind": "error",
                            "ord": None, **_NULL_MENTION, **_NULL_TRIPLE,
                            "description": f"{type(exc).__name__}: {exc}"[:500],
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    return src.mapInPandas(run, schema=EXTRACTED_SCHEMA)


def mentions_of(extracted: DataFrame) -> DataFrame:
    """Mention rows with a stable mention_id and pruned columns."""
    return (
        extracted.filter(F.col("kind") == "mention")
        .select(
            "url", "warc_ts", "ord", "name", "type", "email", "domain",
            "role", "worksAt", "title", "status", "location", "labels",
            "description",
        )
    )


def triples_of(extracted: DataFrame) -> DataFrame:
    """Raw (pre-canonicalization) triple rows."""
    return (
        extracted.filter(F.col("kind") == "triple")
        .select(
            "url", "warc_ts", "subj_name", "subj_type", "pred",
            "obj_name", "obj_type", "strength", "description", "relation_tag",
        )
    )


def errors_of(extracted: DataFrame) -> DataFrame:
    """Quarantined page rows (kind='error'): url + error message."""
    return (
        extracted.filter(F.col("kind") == "error")
        .select("url", "warc_ts", F.col("description").alias("error"))
    )
