"""match_doc_ids: the distributed no-ranking match-set path feeding facets
over search results (A-1..A-3 ∘ Q-3/Q-4). Cross-checked per-query against
a pandas recomputation; driver-level oracle coverage is `search_facet`."""

from __future__ import annotations

import pandas as pd
import pytest

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.functions.analyzer import ANALYZERS
from fastcatsearch3_spark.index import IndexStore
from fastcatsearch3_spark.operators.build import build_index
from fastcatsearch3_spark.operators.ingest import normalize_corpus
from fastcatsearch3_spark.plans.search import match_doc_ids
from fastcatsearch3_spark.streaming import incremental as inc

CFG = EngineConfig(num_shards=2)


@pytest.fixture(scope="module")
def corpus_pd() -> pd.DataFrame:
    rows = [
        (1, "spark merge table"),
        (2, "slow merge line"),
        (3, "merge merge merge"),
        (4, "spark slow value"),
        (5, "spark merge slow"),
        (6, "table line value"),
    ]
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en", "fr", "en", "fr", "en", "en"],
            "source": "src1",
            "n_chars": [len(r[1]) for r in rows],
        }
    )


@pytest.fixture(scope="module")
def store(spark, corpus_pd, tmp_path_factory) -> IndexStore:
    root = str(tmp_path_factory.mktemp("idx"))
    build_index(spark, normalize_corpus(spark.createDataFrame(corpus_pd)), root, CFG)
    return IndexStore(root)


def _expected(corpus_pd: pd.DataFrame, pos: list[str], neg: list[str] = (),
              op: str = "AND") -> set[int]:
    out = set()
    for _, r in corpus_pd.iterrows():
        toks = set(ANALYZERS[CFG.analyzer](pd.Series([r["text"]]), CFG)[0])
        hit = all(t in toks for t in pos) if op == "AND" else any(
            t in toks for t in pos
        )
        if hit and not any(t in toks for t in neg):
            out.add(r["doc_id"])
    return out


@pytest.mark.parametrize(
    "query,pos,neg,op",
    [
        ("spark merge", ["spark", "merge"], [], "AND"),
        ("spark OR table", ["spark", "table"], [], "OR"),
        ("merge -slow", ["merge"], ["slow"], "AND"),
    ],
)
def test_match_set(spark, store, corpus_pd, query, pos, neg, op):
    got = {r["doc_id"] for r in match_doc_ids(spark, store, query).collect()}
    assert got == _expected(corpus_pd, pos, neg, op)


def test_match_set_respects_tombstones(spark, store, corpus_pd, tmp_path):
    import shutil

    root = str(tmp_path / "idx2")
    shutil.copytree(store.root, root)
    corpus = normalize_corpus(spark.createDataFrame(corpus_pd))
    inc.delete_by_pk(spark, root, corpus.where("doc_id = 1"))
    got = {
        r["doc_id"]
        for r in match_doc_ids(spark, IndexStore(root), "spark merge").collect()
    }
    assert got == _expected(corpus_pd, ["spark", "merge"]) - {1}
