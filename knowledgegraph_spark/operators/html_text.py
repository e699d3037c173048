"""HTML → main-text extraction (trafilatura-style), as an Arrow-batched UDF.

Replaces the reference's document parse/normalize stage
(vespa_integration.py:520-583 joins chunk lists into content;
vespa_integration.py:1003-1020 builds ``text = title + "\\n\\n" + content``).
Our input is raw HTML bytes (BASELINE.json input_hint), so the stage is a
boilerplate-stripping main-content extractor with a frozen, byte-stable
output contract:

    extracted_text = <title>\n\n<paragraph 1>\n<paragraph 2>...

Contract details (byte-identity is a correctness gate — BASELINE.md):
  * main content = the first ``<article>`` element if present, else the
    whole ``<body>`` after dropping nav/aside/header/footer/script/style
    and elements whose class contains "ads".
  * title = first ``<h1>`` inside main content, else ``<title>``.
  * block text = ``<p>``/``<h2>``..``<h6>``/``<li>`` contents in document
    order, tags stripped, HTML entities unescaped, internal whitespace
    collapsed to single spaces, blocks joined with "\n".
  * rows with NULL html pass through their pre-extracted ``text`` column
    untouched (the input table may carry either form).

All row-level work happens inside a pandas UDF over Arrow batches — no
per-row Python at the Spark row level (input_hint requirement).
"""

from __future__ import annotations

import re
from html import unescape

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_DROP_BLOCKS = re.compile(
    r"<(script|style|nav|aside|header|footer)\b.*?</\1\s*>",
    re.S | re.I,
)
_DROP_CLASSED = re.compile(
    r"""<(div|section)\b[^>]*class\s*=\s*["'][^"']*\bads?\b[^"']*["'].*?</\1\s*>""",
    re.S | re.I,
)
_ARTICLE = re.compile(r"<article\b[^>]*>(.*?)</article\s*>", re.S | re.I)
_BODY = re.compile(r"<body\b[^>]*>(.*?)</body\s*>", re.S | re.I)
_H1 = re.compile(r"<h1\b[^>]*>(.*?)</h1\s*>", re.S | re.I)
_TITLE = re.compile(r"<title\b[^>]*>(.*?)</title\s*>", re.S | re.I)
_BLOCK = re.compile(r"<(p|h[2-6]|li)\b[^>]*>(.*?)</\1\s*>", re.S | re.I)
_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")


def _clean_fragment(frag: str) -> str:
    """Strip residual tags, unescape entities, collapse whitespace."""
    return _WS.sub(" ", unescape(_TAG.sub(" ", frag))).strip()


def extract_text_py(html: bytes | None, pre_text: str | None) -> str | None:
    """Pure-Python core (unit-testable without Spark)."""
    if html is None:
        return pre_text
    try:
        doc = html.decode("utf-8", errors="replace")
    except Exception:
        return pre_text
    doc = _DROP_BLOCKS.sub(" ", doc)
    doc = _DROP_CLASSED.sub(" ", doc)

    m = _ARTICLE.search(doc)
    main = m.group(1) if m else (_BODY.search(doc).group(1) if _BODY.search(doc) else doc)

    h1 = _H1.search(main)
    if h1 is not None:
        title = _clean_fragment(h1.group(1))
    else:
        t = _TITLE.search(doc)
        title = _clean_fragment(t.group(1)) if t else ""

    blocks = [_clean_fragment(b) for _, b in _BLOCK.findall(main)]
    blocks = [b for b in blocks if b]
    body = "\n".join(blocks)
    if not body:
        # tag-soup fallback: whole main content as one block
        body = _clean_fragment(main)
    return f"{title}\n\n{body}" if title else body


def _extract_text_batch(html: pd.Series, pre_text: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_text_py(h, t) for h, t in zip(html, pre_text)],
        dtype="object",
    )


def extracted_text(html_col: Column, text_col: Column) -> Column:
    """Column expression: byte-stable extracted text for a pages row."""
    # UDF built lazily: pandas_udf registration needs an active session.
    from pyspark.sql import types as T

    udf = F.pandas_udf(_extract_text_batch, T.StringType())
    return udf(html_col, text_col)


def with_extracted_text(pages_df, out_col: str = "text"):
    """pages(url, warc_ts, html, text, lang) → same with ``text`` filled.

    The html column is dropped after extraction so downstream stages never
    re-ship page bytes through shuffles (100 TB posture: html is by far the
    widest column; prune it at the earliest stage boundary).
    """
    return pages_df.withColumn(
        out_col, extracted_text(F.col("html"), F.col("text"))
    ).drop("html")
