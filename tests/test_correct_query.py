"""Whole-query did-you-mean (plans/search.correct_query): per-token best
lexicon correction in one job; in-lexicon tokens self-map at dist 0,
no-candidate tokens are omitted, analysis runs the index analyzer."""

from __future__ import annotations

import pandas as pd

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.index import IndexStore
from fastcatsearch3_spark.operators.build import build_index
from fastcatsearch3_spark.operators.ingest import normalize_corpus
from fastcatsearch3_spark.plans.search import correct_query


def test_correct_query_semantics(spark, tmp_path):
    rows = [
        (1, "spark merge table fast scan"),
        (2, "slow merge line table query"),
        (3, "merge merge merge stable spark"),
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "s",
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    root = str(tmp_path / "idx")
    build_index(
        spark,
        normalize_corpus(spark.createDataFrame(pdf)),
        root,
        EngineConfig(num_shards=2),
    )
    store = IndexStore(root)
    got = correct_query(
        spark, store, "qery mrege Table zzzzzzzzz"
    ).toPandas()
    # analyzer lowercases "Table"; zzzzzzzzz (no candidate ≤2) is omitted
    assert list(got["word"]) == ["qery", "mrege", "table"]
    assert list(got["suggestion"]) == ["query", "merge", "table"]
    assert list(got["dist"]) == [1, 2, 0]
    # camelCase splits like the index side: one row per analyzed token
    got2 = correct_query(spark, store, "mergeTable").toPandas()
    assert list(got2["suggestion"]) == ["merge", "table"]
    # empty query → empty frame with the pinned schema
    got3 = correct_query(spark, store, "   ")
    assert got3.count() == 0
    assert got3.columns == ["pos", "word", "suggestion", "dist", "df"]
