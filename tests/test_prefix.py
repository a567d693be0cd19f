"""Prefix (wildcard) term queries: parser placeholders + lexicon expansion
into synonym-style groups (reference's prefix clause, P-4 on the search
path). End-to-end rank identity is covered by the `bm25_prefix` driver
oracle; these tests pin the parser/expansion contract."""

from __future__ import annotations

import pytest

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.plans.query import parse_query

CFG = EngineConfig()


def test_prefix_placeholder_and_groups():
    pq = parse_query("spar* merge", CFG)
    assert pq.terms == ["spar*", "merge"]
    assert pq.groups == [(0,), (1,)]
    assert pq.op == "AND"
    assert pq.n_groups == 2


def test_field_qualified_prefix():
    cfg = EngineConfig(indexed_fields=("content", "repo"))
    pq = parse_query("repo:spa* merge", cfg)
    assert pq.terms == ["repo:spa*", "merge"]


def test_prefix_rejected_in_not_clause():
    with pytest.raises(ValueError, match="NOT"):
        parse_query("merge -spar*", CFG)


def test_prefix_stem_must_be_single_token():
    with pytest.raises(ValueError, match="one token"):
        parse_query("foo.bar*", CFG)


def test_prefix_expansion_end_to_end(spark, tmp_path):
    """"s*" over a 4-doc corpus must behave as OR(spark, slow) within its
    group, AND'd with the other term; engine scores == exhaustive oracle
    with explicit synonym groups."""
    import pandas as pd

    from fastcatsearch3_spark.index import IndexStore
    from fastcatsearch3_spark.operators.build import build_index
    from fastcatsearch3_spark.operators.ingest import normalize_corpus
    from fastcatsearch3_spark.plans.search import search_index
    from tests.oracle import bm25_topk_oracle

    rows = [
        (1, "spark merge table"),
        (2, "slow merge line"),
        (3, "merge merge merge"),
        (4, "spark slow value"),
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "src1",
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    corpus = normalize_corpus(spark.createDataFrame(pdf))
    cfg = EngineConfig(num_shards=2)
    root = str(tmp_path / "idx")
    build_index(spark, corpus, root, cfg)
    got = search_index(spark, IndexStore(root), "s* merge", k=10).toPandas()

    sdf = corpus.select("doc_id", "content").toPandas()
    # expansion of "s*" here = {spark, slow} (one group), merge = other group
    exp = bm25_topk_oracle(
        sdf,
        ["spark", "slow", "merge"],
        k=10,
        op="AND",
        cfg=cfg,
        groups=[0, 0, 1],
    )
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert got["score"].to_numpy() == pytest.approx(
        exp["score"].to_numpy(), abs=1e-6
    )


def test_prefix_no_match_returns_empty(spark, tmp_path):
    import pandas as pd

    from fastcatsearch3_spark.index import IndexStore
    from fastcatsearch3_spark.operators.build import build_index
    from fastcatsearch3_spark.operators.ingest import normalize_corpus
    from fastcatsearch3_spark.plans.search import search_index

    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            "text": ["spark merge"],
            "lang": "en",
            "source": "src1",
            "n_chars": [11],
        }
    )
    corpus = normalize_corpus(spark.createDataFrame(pdf))
    cfg = EngineConfig(num_shards=1)
    root = str(tmp_path / "idx")
    build_index(spark, corpus, root, cfg)
    got = search_index(spark, IndexStore(root), "zz* merge", k=10).toPandas()
    assert len(got) == 0


def test_fuzzy_placeholder_and_groups():
    pq = parse_query("sparc~1 merge", CFG)
    assert pq.terms == ["sparc~1", "merge"]
    assert pq.groups == [(0,), (1,)]
    # bare "~" defaults to Lucene's distance 2
    assert parse_query("sparc~ merge", CFG).terms == ["sparc~2", "merge"]


def test_fuzzy_rejected_in_not_clause():
    with pytest.raises(ValueError, match="NOT"):
        parse_query("merge -sparc~1", CFG)


def test_fuzzy_expansion_end_to_end(spark, tmp_path):
    """"sparl~1" expands to {spark, spar-like terms within distance 1} as
    ONE group; scores match the exhaustive oracle with explicit groups —
    the same credit semantics as prefix/synonym groups."""
    import pandas as pd

    from fastcatsearch3_spark.index import IndexStore
    from fastcatsearch3_spark.operators.build import build_index
    from fastcatsearch3_spark.operators.ingest import normalize_corpus
    from fastcatsearch3_spark.plans.search import search_index
    from tests.oracle import bm25_topk_oracle

    rows = [
        (1, "spark merge table"),
        (2, "sparks merge line"),
        (3, "merge merge merge"),
        (4, "spark slow value"),
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "src1",
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    corpus = normalize_corpus(spark.createDataFrame(pdf))
    cfg = EngineConfig(num_shards=2)
    root = str(tmp_path / "idx")
    build_index(spark, corpus, root, cfg)
    store = IndexStore(root)
    # lev(sparl, spark)=1, lev(sparl, sparks)=2 → only spark expands
    got = search_index(spark, store, "sparl~1 merge", k=10).toPandas()
    sdf = corpus.select("doc_id", "content").toPandas()
    exp = bm25_topk_oracle(
        sdf, ["spark", "merge"], k=10, op="AND", cfg=cfg, groups=[0, 1]
    )
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert got["score"].to_numpy() == pytest.approx(
        exp["score"].to_numpy(), abs=1e-6
    )
    # distance 2 pulls in sparks too — one group of {spark, sparks}
    got2 = search_index(spark, store, "sparl~2 merge", k=10).toPandas()
    exp2 = bm25_topk_oracle(
        sdf, ["spark", "sparks", "merge"], k=10, op="AND", cfg=cfg,
        groups=[0, 0, 1],
    )
    assert list(got2["doc_id"]) == list(exp2["doc_id"])
    assert got2["score"].to_numpy() == pytest.approx(
        exp2["score"].to_numpy(), abs=1e-6
    )
    # an AND-required fuzzy term with NO candidates matches nothing
    got3 = search_index(spark, store, "zzzzzzz~1 merge", k=10).toPandas()
    assert len(got3) == 0


def test_fuzzy_distance_out_of_range_raises():
    with pytest.raises(ValueError, match="must be 1 or 2"):
        parse_query("spark~3 merge", CFG)
    # standalone ~N stays min-should-match, never fuzzy
    pq = parse_query("spark join vector ~3", CFG)
    assert pq.msm == 3 and "~" not in "".join(pq.terms)


def test_fuzzy_unqualified_never_expands_into_field_namespace(spark, tmp_path):
    """An unqualified fuzzy stem must not pull field-qualified lexicon
    keys into its expansion group (lev('repo:x','repos') == 2 would
    otherwise leak the repo posting into a content query)."""
    import pandas as pd

    from fastcatsearch3_spark.config import EngineConfig
    from fastcatsearch3_spark.index import IndexStore
    from fastcatsearch3_spark.operators.build import build_index
    from fastcatsearch3_spark.operators.ingest import normalize_corpus
    from fastcatsearch3_spark.plans.search import search_index

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["repos merge", "table merge"],
            "lang": "en",
            "source": "x",  # doc 2's repo field would be within lev 2
            "n_chars": [11, 11],
        }
    )
    cfg = EngineConfig(num_shards=1, indexed_fields=("content", "repo"))
    corpus = normalize_corpus(spark.createDataFrame(pdf))
    root = str(tmp_path / "idx")
    build_index(spark, corpus, root, cfg)
    got = search_index(
        spark, IndexStore(root), "repos~2 merge", k=10
    ).toPandas()
    # only doc 1 matches: doc 2 can only be reached via a repo-field key
    assert got["doc_id"].tolist() == [1]
