"""Field collapse / result bundling (the reference's result grouping).

The driver oracle (`search_collapse`) checks the end result against
DuckDB; these tests pin the engine-side semantics against a brute-force
pandas reference built from the *unbundled* search, plus the edge cases
the oracle query never hits (per_group=1 shape, k > n_groups,
collapse-on-doc_id identity, empty query)."""

from __future__ import annotations

import pandas as pd
import pytest

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.operators import build as B
from fastcatsearch3_spark.operators.ingest import load_documents
from fastcatsearch3_spark.index import IndexStore
from fastcatsearch3_spark.plans.query import ParsedQuery
from fastcatsearch3_spark.plans.search import search_collapse, search_index

SF = "/root/testdata/sf0.001"
CFG = EngineConfig()


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_collapse"))
    B.build_index(spark, load_documents(spark, SF), root, CFG)
    return IndexStore(root)


@pytest.fixture(scope="module")
def corpus(spark):
    return load_documents(spark, SF)


def _brute(spark, store, corpus, terms, op, k, per_group):
    """Reference: full scored match set -> pandas groupby ranking."""
    full = (
        search_index(
            spark, store, ParsedQuery(terms=terms, op=op), _return_all=True
        )
        .join(corpus.select("doc_id", "repo"), "doc_id")
        .toPandas()
    )
    full = full.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    )
    full["rank_in_group"] = full.groupby("repo").cumcount() + 1
    hits = full.groupby("repo")["doc_id"].transform("size")
    full["group_hits"] = hits
    best = full[full.rank_in_group == 1].sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    )
    keep_groups = list(best.repo.iloc[:k])
    out = full[full.repo.isin(keep_groups) & (full.rank_in_group <= per_group)]
    return out[["repo", "doc_id", "score", "group_hits", "rank_in_group"]]


@pytest.mark.parametrize("per_group", [1, 2, 3])
def test_collapse_matches_bruteforce(spark, store, corpus, per_group):
    got = search_collapse(
        spark, store, ParsedQuery(terms=["vector", "stream"], op="OR"),
        "repo", k=5, per_group=per_group, corpus_df=corpus,
    ).toPandas()
    want = _brute(
        spark, store, corpus, ["vector", "stream"], "OR", 5, per_group
    )
    a = got.sort_values(["repo", "doc_id"]).reset_index(drop=True)
    b = want.sort_values(["repo", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["repo", "doc_id", "group_hits", "rank_in_group"]],
        b[["repo", "doc_id", "group_hits", "rank_in_group"]],
        check_dtype=False,
    )
    assert a.score.to_numpy() == pytest.approx(b.score.to_numpy())


def test_collapse_k_exceeds_groups(spark, store, corpus):
    out = search_collapse(
        spark, store, ParsedQuery(terms=["spark"], op="AND"), "repo",
        k=10_000, per_group=1, corpus_df=corpus,
    ).toPandas()
    # one row per matching group, rank 1 everywhere, bundle sizes sum to
    # the total match count
    assert (out.rank_in_group == 1).all()
    assert out.repo.is_unique
    total = search_index(
        spark, store, ParsedQuery(terms=["spark"], op="AND"),
        _return_all=True,
    ).count()
    assert int(out.group_hits.sum()) == total


def test_collapse_on_doc_id_is_identity_ranking(spark, store, corpus):
    """Collapsing on the unique key degenerates to plain top-k search."""
    got = search_collapse(
        spark, store, ParsedQuery(terms=["spark"], op="AND"), "doc_id",
        k=7, per_group=1, corpus_df=corpus,
    ).toPandas()
    want = search_index(
        spark, store, ParsedQuery(terms=["spark"], op="AND"), k=7
    ).toPandas()
    assert list(got.doc_id) == list(want.doc_id)
    assert (got.group_hits == 1).all()
    assert got.score.to_numpy() == pytest.approx(want.score.to_numpy())


def test_collapse_no_match(spark, store, corpus):
    out = search_collapse(
        spark, store,
        ParsedQuery(terms=["zzzznotaterm"], op="AND"), "repo",
        k=5, corpus_df=corpus,
    )
    assert out.count() == 0
