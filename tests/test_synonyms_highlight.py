"""Synonym expansion (F-6) + highlighting (F-7)."""

from __future__ import annotations

import pandas as pd
import pytest

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.index import IndexStore
from fastcatsearch3_spark.operators import build as B
from fastcatsearch3_spark.operators.ingest import load_documents
from fastcatsearch3_spark.plans.highlight import highlight_hits, highlight_series
from fastcatsearch3_spark.plans.query import parse_query
from fastcatsearch3_spark.plans.search import search_index
from tests.oracle import bm25_topk_oracle

CFG = EngineConfig(num_shards=4)
SF = "/root/testdata/sf0.001"
SYN = {"spark": ["vector"], "merge": ["join"]}


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("syn_index"))
    B.build_index(spark, load_documents(spark, SF), root, CFG)
    return IndexStore(root)


@pytest.fixture(scope="module")
def docs_pd(spark):
    return (
        load_documents(spark, SF).select("doc_id", "content").toPandas()
    )


def test_parse_query_synonym_groups():
    pq = parse_query("spark merge", CFG, synonyms=SYN)
    assert pq.terms == ["spark", "vector", "merge", "join"]
    assert pq.groups == [(0,), (0,), (1,), (1,)]
    assert pq.n_groups == 2


def test_parse_query_overlapping_groups():
    """A query word that is also another word's synonym must credit BOTH
    groups (ADVICE r01: first-wins dedup made it stricter than the
    reference's AND(OR(syn...)) expansion)."""
    pq = parse_query("spark merge", CFG, synonyms={"spark": ["merge"]})
    # terms: spark(g0), merge(appears as spark's synonym g0 AND as its own
    # query word g1) — merge must carry both group ids
    assert pq.terms == ["spark", "merge"]
    assert pq.groups == [(0,), (0, 1)]
    assert pq.n_groups == 2


def test_overlapping_group_search_matches_oracle(spark, store, docs_pd):
    """End-to-end: with overlapping groups, a doc containing only 'merge'
    satisfies both AND gates (merge covers g0 as spark's synonym and g1 as
    itself), so results equal a plain one-term 'merge' query's docs."""
    pq = parse_query("spark merge", CFG, synonyms={"spark": ["merge"]})
    got = search_index(spark, store, pq, k=10).toPandas()
    want = bm25_topk_oracle(
        docs_pd, pq.terms, k=10, op="AND", cfg=CFG, groups=pq.groups
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].to_numpy() == pytest.approx(
        want["score"].to_numpy(), abs=1e-6
    )


@pytest.mark.parametrize("op", ["AND", "OR"])
def test_synonym_search_rank_identical_to_oracle(spark, store, docs_pd, op):
    pq = parse_query("spark merge", CFG, synonyms=SYN)
    pq.op = op
    got = search_index(spark, store, pq, k=10).toPandas()
    want = bm25_topk_oracle(
        docs_pd, pq.terms, k=10, op=op, cfg=CFG, groups=pq.groups
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].to_numpy() == pytest.approx(
        want["score"].to_numpy(), abs=1e-6
    )


def test_synonym_and_widens_results(spark, store, docs_pd):
    """Group-AND (any synonym member) must admit at least every doc the
    strict AND admits, and genuinely use the synonym (docs with vector
    but not spark qualify)."""
    strict = search_index(spark, store, parse_query("spark merge", CFG), k=500).toPandas()
    syn = search_index(
        spark, store, parse_query("spark merge", CFG, synonyms=SYN), k=500
    ).toPandas()
    assert set(strict["doc_id"]) <= set(syn["doc_id"])
    assert len(syn) > len(strict)


def test_highlight_series_tags_and_window():
    s = pd.Series(
        [
            "alpha beta gamma delta",
            "nothing here",
            "",
            "xx sparky spark yy",  # 'sparky' must NOT match (token boundary)
        ]
    )
    out = highlight_series(s, ("beta", "spark"), summary_len=40)
    assert "<em>beta</em>" in out[0]
    assert out[1] == "nothing here"
    assert out[2] == ""
    assert "<em>spark</em>" in out[3] and "<em>sparky</em>" not in out[3]


def test_highlight_uppercase_run_boundary():
    """ADVICE r01: a term inside an UPPERCASE alphanumeric run is NOT
    boundary-delimited under the analyzer's grammar and must not be
    tagged; standalone uppercase forms still match (IGNORECASE)."""
    s = pd.Series(["SPARK and XSPARKX here"])
    out = highlight_series(s, ("spark",), summary_len=80)
    assert "<em>SPARK</em>" in out[0]
    assert "XSPARKX" in out[0] and "<em>XSPARKX" not in out[0]
    assert "X<em>" not in out[0]


def test_highlight_hits_join(spark, store):
    pq = parse_query("spark merge", CFG)
    hits = search_index(spark, store, pq, k=5)
    corpus = load_documents(spark, SF)
    out = highlight_hits(hits, corpus, pq.terms, summary_len=80).toPandas()
    assert len(out) == 5
    assert out["snippet"].str.contains("<em>").all()
    assert (out["snippet"].str.len() <= 80 + 20 * len("<em></em>")).all()
