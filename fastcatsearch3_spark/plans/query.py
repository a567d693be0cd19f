"""Query model + parser (SURVEY.md Q-1, Q-2).

The reference parses HTTP search params into a Query object tree
(core:ir.query.Query / Clause; server search action [K]). Our surface is a
small text grammar covering the same clause algebra:

    merge segment          → AND(merge, segment)           (AND is default)
    merge OR segment       → OR(merge, segment)
    merge -deprecated      → AND(merge) NOT(deprecated)
    parseIndexBuffer       → query-side analysis expands camelCase exactly
                             like the index side (same analyzer), so this
                             becomes AND(parse, index, buffer)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.functions.analyzer import tokenize_text


@dataclass
class ParsedQuery:
    terms: list[str]
    not_terms: list[str] = field(default_factory=list)
    op: str = "AND"  # AND | OR

    def __post_init__(self):
        if self.op not in ("AND", "OR"):
            raise ValueError(f"unsupported op: {self.op}")


def parse_query(text: str, cfg: EngineConfig | None = None) -> ParsedQuery:
    """Parse + analyze a query string (Q-1 then Q-2: the query side runs
    the SAME analyzer as the index side — core:ir.analysis reuse [K])."""
    cfg = cfg or EngineConfig()
    raw = text.split()
    op = "AND"
    pos_words: list[str] = []
    neg_words: list[str] = []
    for w in raw:
        if w.upper() == "OR":
            op = "OR"
        elif w.upper() == "AND":
            op = "AND"
        elif w.startswith("-") and len(w) > 1:
            neg_words.append(w[1:])
        elif w.upper() == "NOT":
            neg_words.append("\0PENDING")
        else:
            if neg_words and neg_words[-1] == "\0PENDING":
                neg_words[-1] = w
            else:
                pos_words.append(w)
    neg_words = [w for w in neg_words if w != "\0PENDING"]
    terms: list[str] = []
    for w in pos_words:
        terms.extend(tokenize_text(w, cfg))
    nterms: list[str] = []
    for w in neg_words:
        nterms.extend(tokenize_text(w, cfg))
    # de-dup, order-preserving (duplicate query terms score once, matching
    # set-semantics BM25 — and the DuckDB oracle's DISTINCT term list)
    seen: set[str] = set()
    terms = [t for t in terms if not (t in seen or seen.add(t))]
    seen = set()
    nterms = [t for t in nterms if not (t in seen or seen.add(t))]
    return ParsedQuery(terms=terms, not_terms=nterms, op=op)
