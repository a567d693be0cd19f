"""Search-result highlighting / summary snippets (SURVEY.md F-7).

Reference capability being re-expressed: fastcatsearch's
BasicHighlightAndSummary (server:…BasicHighlightAndSummary [M per
SURVEY.md]) — wrap matched terms in tags and cut a summary window around
the densest match region. Implemented as ONE Arrow-batched pandas UDF over
(content, query term list): vectorized per batch, regex work in pandas' C
string paths, Python loop only over rows (string assembly is inherently
per-row).
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PRE_TAG = "<em>"
POST_TAG = "</em>"


def _compile(terms: tuple[str, ...]) -> re.Pattern:
    alts = "|".join(sorted((re.escape(t) for t in set(terms)), key=len, reverse=True))
    # token boundaries: the analyzer's token grammar is [a-z0-9]+ runs over
    # LOWERCASED text, and term matching here is IGNORECASE — so the
    # boundary classes must be case-insensitive too ([a-zA-Z0-9]); with
    # lowercase-only classes a term embedded in an UPPERCASE run (e.g.
    # 'spark' in 'XSPARKX') would wrongly read as boundary-delimited
    return re.compile(rf"(?<![a-zA-Z0-9])({alts})(?![a-zA-Z0-9])", re.IGNORECASE)


def highlight_full_series(content: pd.Series, terms: tuple[str, ...]) -> pd.Series:
    """Whole-field highlight (no summary window): every boundary-delimited
    term occurrence tagged. Pure vectorized pandas str.replace — this is
    the reference's highlight-without-summary mode and the SQL-mirrorable
    face of F-7 (DuckDB: regexp_replace(text, pat, '<em>\\1</em>', 'g'))."""
    if not terms:
        return content.fillna("")
    pat = _compile(terms)
    return content.fillna("").str.replace(
        pat, rf"{PRE_TAG}\1{POST_TAG}", regex=True
    )


def highlight_series(
    content: pd.Series,
    terms: tuple[str, ...],
    summary_len: int = 120,
) -> pd.Series:
    """content → tagged snippet of ≤ summary_len chars centred on the
    window with the most matches (ties → earliest)."""
    if not terms:
        return content.str.slice(0, summary_len)
    pat = _compile(terms)

    def one(text: str) -> str:
        if not text:
            return ""
        hits = [m.start() for m in pat.finditer(text)]
        if not hits:
            return text[:summary_len]
        # densest window: slide over match positions
        best_i, best_n = 0, 1
        j = 0
        for i, start in enumerate(hits):
            while hits[j] < start - summary_len + 1:
                j += 1
            n = i - j + 1
            if n > best_n:
                best_i, best_n = j, n
        w0 = max(0, hits[best_i] - 10)
        window = text[w0 : w0 + summary_len]
        return pat.sub(rf"{PRE_TAG}\1{POST_TAG}", window)

    return content.map(one)


def highlight_udf(terms: list[str], summary_len: int | None = 120):
    """Arrow-batched highlight UDF; ``summary_len=None`` → whole-field
    highlight (no snippet window)."""
    from pyspark.sql.functions import pandas_udf

    tterms = tuple(terms)

    @pandas_udf("string")
    def hl(content: pd.Series) -> pd.Series:
        if summary_len is None:
            return highlight_full_series(content, tterms)
        return highlight_series(content, tterms, summary_len)

    return hl


def highlight_hits(
    hits: DataFrame,
    corpus: DataFrame,
    terms: list[str],
    summary_len: int = 120,
    content_col: str = "content",
) -> DataFrame:
    """Join top-k hits back to stored content and add a ``snippet`` column
    (Q-5 hydration + F-7 in one broadcast join — hits are ≤ k rows)."""
    hl = highlight_udf(terms, summary_len)
    return corpus.join(F.broadcast(hits), "doc_id").withColumn(
        "snippet", hl(F.col(content_col))
    )
