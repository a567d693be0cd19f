"""Collection facade: the reference's collection-centric lifecycle driven
through one object (build → append → delete → compact → search/suggest)."""

from __future__ import annotations

import pandas as pd

from fastcatsearch3_spark import Collection, EngineConfig
from fastcatsearch3_spark.operators.ingest import normalize_corpus


def _pdf(rows):
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "s",
            "n_chars": [len(r[1]) for r in rows],
        }
    )


def test_collection_lifecycle(spark, tmp_path):
    col = Collection(spark, str(tmp_path / "idx"), EngineConfig(num_shards=2))
    base = normalize_corpus(
        spark.createDataFrame(_pdf([(1, "spark merge table"),
                                    (2, "slow merge line")]))
    )
    col.build(base)
    assert col.stats()["n_docs"] == 2

    col.append(spark.createDataFrame(_pdf([(3, "spark merge value")])))
    got = {r["doc_id"] for r in col.search("spark merge", k=10).collect()}
    assert got == {1, 3}

    col.delete(normalize_corpus(spark.createDataFrame(_pdf([(1, "x")]))))
    got = {r["doc_id"] for r in col.search("spark merge", k=10).collect()}
    assert got == {3}

    col.compact()
    assert col.stats()["n_docs"] == 2  # doc 1 purged
    got = {r["doc_id"] for r in col.search("spark merge", k=10).collect()}
    assert got == {3}
    assert {r["doc_id"] for r in col.match("merge").collect()} == {2, 3}
    terms = [r["term"] for r in col.suggest("s", k=10).collect()]
    assert "spark" in terms and "slow" in terms
