"""rescore_topk: two-phase ranking (Lucene QueryRescorer / ES rescore) —
BM25 window re-scored by a secondary (phrase) query, final = query_weight
x first + rescore_weight x second. Cross-checked against the standalone
query paths; driver-level oracle coverage is `search_rescore`."""

from __future__ import annotations

import pandas as pd
import pytest

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.index import IndexStore
from fastcatsearch3_spark.operators.build import build_index
from fastcatsearch3_spark.operators.ingest import normalize_corpus
from fastcatsearch3_spark.plans.search import rescore_topk, search_index

CFG = EngineConfig(num_shards=2, store_positions=True)


@pytest.fixture(scope="module")
def corpus_pd() -> pd.DataFrame:
    rows = [
        (1, "table hash join"),
        (2, "hash table join"),
        (3, "table merge hash"),
        (4, "table hash table hash"),
        (5, "table value line"),
        (6, "hash value line"),
        (7, "merge value line"),
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


def test_rescore_blend_and_order(spark, store):
    got = rescore_topk(
        spark, store, "table OR hash", '"table hash"', k=7, window=7
    ).collect()
    # every row: score == first + rescore (weights 1/1)
    for r in got:
        assert r["score"] == pytest.approx(
            r["first_score"] + r["rescore"], abs=1e-12
        )
    # phrase docs (1, 4) outrank phrase-less docs with the same first-pass
    # terms; ordering is by blended score desc then doc_id
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)
    ranked = [r["doc_id"] for r in got]
    assert set(ranked[:2]) == {1, 4}


def test_rescore_second_equals_standalone_phrase(spark, store):
    phrase = {
        r["doc_id"]: r["score"]
        for r in search_index(spark, store, '"table hash"', k=7).collect()
    }
    got = rescore_topk(
        spark, store, "table OR hash", '"table hash"', k=7, window=7
    ).collect()
    for r in got:
        exp = phrase.get(r["doc_id"], 0.0)
        assert r["rescore"] == pytest.approx(exp, abs=1e-9)


def test_rescore_weights(spark, store):
    got = rescore_topk(
        spark,
        store,
        "table OR hash",
        '"table hash"',
        k=7,
        window=7,
        query_weight=0.25,
        rescore_weight=2.0,
    ).collect()
    for r in got:
        assert r["score"] == pytest.approx(
            0.25 * r["first_score"] + 2.0 * r["rescore"], abs=1e-12
        )


def test_rescore_window_bounds_second_pass(spark, store):
    # window=1 keeps only the best first-pass doc; nothing outside it may
    # appear even if it would win after rescoring
    got = rescore_topk(
        spark, store, "table OR hash", '"table hash"', k=1, window=1
    ).collect()
    first = search_index(spark, store, "table OR hash", k=1).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in first]


def test_rescore_k_gt_window_raises(spark, store):
    with pytest.raises(ValueError):
        rescore_topk(spark, store, "table", '"table hash"', k=5, window=2)
