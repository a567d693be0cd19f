"""Frozen pure-pandas BM25 oracle (SURVEY.md §5.2 layer 3, FIXTURES.md B2).

Exhaustive scoring (no pruning, no packing) over a pandas corpus, sharing
ONLY the tokenizer with the engine. Used to generate expected top-k
fixtures and to assert rank-identity of both engine paths.

Adaptation note (SURVEY.md §0): the reference mount is empty in this
sandbox, so "reference fixtures" are produced by this deterministic
oracle rather than by a fastcatsearch3 binary.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.functions.analyzer import get_analyzer


def bm25_topk_oracle(
    docs: pd.DataFrame,  # columns: doc_id, content
    terms: list[str],
    k: int = 10,
    op: str = "AND",
    cfg: EngineConfig | None = None,
    allow_doc_ids: set[int] | None = None,
    not_terms: list[str] | None = None,
    groups: list[int] | None = None,
) -> pd.DataFrame:
    """Returns DataFrame (doc_id, score) — top-k, score desc / doc_id asc.
    With ``groups`` (synonym expansion, aligned with ``terms``), AND
    requires every group matched by ≥1 member term."""
    cfg = cfg or EngineConfig()
    if groups is not None:
        assert len(groups) == len(terms)
        # a term credits EVERY group it belongs to (same rule as the
        # engine's parse_query group merge — a query word that is also
        # another word's synonym satisfies both AND gates)
        gmap: dict[str, set] = {}
        for t, g in zip(terms, groups):
            gids = (g,) if isinstance(g, int) else tuple(g)
            gmap.setdefault(t, set()).update(gids)
    terms = list(dict.fromkeys(terms))
    not_terms = list(dict.fromkeys(not_terms or []))
    tok = get_analyzer(cfg)(docs["content"], cfg)
    doc_ids = docs["doc_id"].to_numpy()

    dls = np.array([len(t) for t in tok], dtype=np.float64)
    n_docs = len(docs)
    avgdl = dls.sum() / n_docs if n_docs else 0.0

    # tf per (doc, term) for query terms only; df per term over all docs
    counts = [pd.Series(t).value_counts() if t else pd.Series(dtype=int) for t in tok]
    rows = []
    for i, c in enumerate(counts):
        for term in terms:
            tfv = int(c.get(term, 0))
            if tfv:
                rows.append((i, term, tfv))
    dfmap = {t: sum(1 for c in counts if c.get(t, 0) > 0) for t in terms}

    scores: dict[int, float] = {}
    hit_terms: dict[int, int] = {}
    hit_groups: dict[int, set] = {}
    for i, term, tfv in rows:
        dfv = dfmap[term]
        idf = math.log(1.0 + (n_docs - dfv + 0.5) / (dfv + 0.5))
        s = idf * tfv * (cfg.k1 + 1.0) / (
            tfv + cfg.k1 * (1.0 - cfg.b + cfg.b * dls[i] / avgdl)
        )
        scores[i] = scores.get(i, 0.0) + s
        hit_terms[i] = hit_terms.get(i, 0) + 1
        if groups is not None:
            hit_groups.setdefault(i, set()).update(gmap[term])

    need_groups = (
        len({gid for gs in gmap.values() for gid in gs})
        if groups is not None
        else None
    )
    items = []
    excluded: set[int] = set()
    if not_terms:
        for i, c in enumerate(counts_for(tok, not_terms)):
            if c:
                excluded.add(i)
    for i, s in scores.items():
        if op == "AND":
            if groups is not None:
                if len(hit_groups.get(i, ())) < need_groups:
                    continue
            elif hit_terms[i] < len(terms):
                continue
        if i in excluded:
            continue
        did = int(doc_ids[i])
        if allow_doc_ids is not None and did not in allow_doc_ids:
            continue
        items.append((did, s))
    items.sort(key=lambda x: (-x[1], x[0]))
    return pd.DataFrame(items[:k], columns=["doc_id", "score"])


def counts_for(tok: pd.Series, terms: list[str]) -> list[int]:
    tset = set(terms)
    return [sum(1 for w in t if w in tset) for t in tok]
