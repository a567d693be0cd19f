"""related_keywords: significant terms over a query's match set (the
reference's related-search-keywords service / Lucene-ES significant-terms
aggregation). Cross-checked against a full pandas recomputation of the
coverage x PMI-lift score; driver-level oracle coverage is the
`related_keywords` DuckDB entry."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.functions.analyzer import ANALYZERS
from fastcatsearch3_spark.index import IndexStore
from fastcatsearch3_spark.operators.build import build_index
from fastcatsearch3_spark.operators.ingest import normalize_corpus
from fastcatsearch3_spark.plans.search import related_keywords

CFG = EngineConfig(num_shards=2)


@pytest.fixture(scope="module")
def corpus_pd() -> pd.DataFrame:
    rows = [
        (1, "spark merge table hash"),
        (2, "slow merge line"),
        (3, "spark merge hash vector"),
        (4, "spark slow value"),
        (5, "spark merge hash table"),
        (6, "table line value"),
        (7, "spark merge vector"),
        (8, "line value slow"),
    ]
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "src1",
            "n_chars": [len(r[1]) for r in rows],
        }
    )


@pytest.fixture(scope="module")
def store(spark, corpus_pd, tmp_path_factory) -> IndexStore:
    root = str(tmp_path_factory.mktemp("idx"))
    build_index(
        spark, normalize_corpus(spark.createDataFrame(corpus_pd)), root, CFG
    )
    return IndexStore(root)


def _expected(
    corpus_pd: pd.DataFrame,
    qterms: list[str],
    top_n: int,
    min_fg_df: int,
) -> list[tuple[str, int, int, float]]:
    tok = ANALYZERS[CFG.analyzer]
    docs = {
        r["doc_id"]: set(tok(pd.Series([r["text"]]), CFG)[0])
        for _, r in corpus_pd.iterrows()
    }
    match = [d for d, toks in docs.items() if all(t in toks for t in qterms)]
    m, n = len(match), len(docs)
    fg: dict[str, int] = {}
    for d in match:
        for t in docs[d]:
            fg[t] = fg.get(t, 0) + 1
    bg: dict[str, int] = {}
    for toks in docs.values():
        for t in toks:
            bg[t] = bg.get(t, 0) + 1
    out = []
    for t, f in fg.items():
        if t in qterms or f < min_fg_df:
            continue
        score = (f / m) * math.log(f * n / (m * bg[t]))
        if score > 0:
            out.append((t, f, bg[t], score))
    out.sort(key=lambda r: (-r[3], r[0]))
    return out[:top_n]


def test_related_keywords_matches_pandas(spark, store, corpus_pd):
    got = related_keywords(
        spark,
        store,
        "spark merge",
        normalize_corpus(spark.createDataFrame(corpus_pd)),
        top_n=10,
        min_fg_df=2,
    ).collect()
    exp = _expected(corpus_pd, ["spark", "merge"], 10, 2)
    assert [(r["term"], r["fg_df"], r["bg_df"]) for r in got] == [
        (t, f, b) for t, f, b, _ in exp
    ]
    for r, (_, _, _, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, abs=1e-9)
    # hash/vector dominate: in every spark+merge doc, rarer in the corpus
    assert got[0]["term"] in ("hash", "vector")


def test_related_keywords_excludes_query_terms(spark, store, corpus_pd):
    fields = normalize_corpus(spark.createDataFrame(corpus_pd))
    got = related_keywords(spark, store, "spark merge", fields, top_n=50)
    terms = {r["term"] for r in got.collect()}
    assert not terms & {"spark", "merge"}


def test_related_keywords_min_fg_df(spark, store, corpus_pd):
    fields = normalize_corpus(spark.createDataFrame(corpus_pd))
    got = {
        r["term"]: r["fg_df"]
        for r in related_keywords(
            spark, store, "spark merge", fields, top_n=50, min_fg_df=3
        ).collect()
    }
    assert got and all(v >= 3 for v in got.values())
    exp = {
        t: f for t, f, _, _ in _expected(corpus_pd, ["spark", "merge"], 50, 3)
    }
    assert got == exp


def test_related_keywords_empty_query(spark, store, corpus_pd):
    fields = normalize_corpus(spark.createDataFrame(corpus_pd))
    assert related_keywords(spark, store, "", fields).count() == 0


def test_related_excludes_placeholder_expansions(spark, store, corpus_pd):
    """ADVICE r04: a prefix/wildcard query's lexicon EXPANSIONS drive the
    match set and must be excluded, not just the literal placeholder."""
    fields = normalize_corpus(spark.createDataFrame(corpus_pd))
    got = related_keywords(
        spark, store, "spar* merge", fields, top_n=50, min_fg_df=1
    )
    terms = {r["term"] for r in got.collect()}
    # 'spark' is the expansion of 'spar*' — present in every matched doc,
    # so without the fix it would top the list
    assert "spark" not in terms and "merge" not in terms
    assert terms  # other significant terms still surface
