"""function_score: static stored-field boost folded into ranking (ES
function_score / field_value_factor). A doc-dependent factor breaks top-k
early termination, so the plan scores the FULL match set and takes the
global top-k after boosting — pinned here against the unboosted path and
a pandas recomputation. Driver-level oracle coverage is `function_score`."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.index import IndexStore
from fastcatsearch3_spark.operators.build import build_index
from fastcatsearch3_spark.operators.ingest import normalize_corpus
from fastcatsearch3_spark.plans.search import function_score, search_index

CFG = EngineConfig(num_shards=2)


@pytest.fixture(scope="module")
def corpus_pd() -> pd.DataFrame:
    rows = [
        (1, "spark merge table", 10),
        (2, "spark merge line", 5000),
        (3, "spark merge merge", 40),
        (4, "spark slow value", 70),
        (5, "spark merge slow", 900),
        (6, "table line value", 20),
    ]
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "src1",
            "n_chars": [r[2] for r in rows],
        }
    )


@pytest.fixture(scope="module")
def store(spark, corpus_pd, tmp_path_factory) -> IndexStore:
    root = str(tmp_path_factory.mktemp("idx"))
    build_index(
        spark, normalize_corpus(spark.createDataFrame(corpus_pd)), root, CFG
    )
    return IndexStore(root)


def _fields(spark, corpus_pd):
    return spark.createDataFrame(corpus_pd[["doc_id", "n_chars"]])


def test_function_score_reorders_by_factor(spark, store, corpus_pd):
    base = {
        r["doc_id"]: r["score"]
        for r in search_index(
            spark, store, "spark merge", k=10, mode="taat"
        ).collect()
    }
    got = function_score(
        spark, store, "spark merge", _fields(spark, corpus_pd), "n_chars", k=10
    ).collect()
    assert {r["doc_id"] for r in got} == set(base)
    exp = sorted(
        (
            (
                d,
                base[d],
                math.log(
                    1.0
                    + float(
                        corpus_pd.loc[corpus_pd.doc_id == d, "n_chars"].iloc[0]
                    )
                ),
            )
            for d in base
        ),
        key=lambda t: (-(t[1] * t[2]), t[0]),
    )
    assert [r["doc_id"] for r in got] == [d for d, _, _ in exp]
    for r, (_, s, f) in zip(got, exp):
        assert r["score"] == pytest.approx(s, abs=1e-9)
        assert r["factor"] == pytest.approx(f, abs=1e-12)
        assert r["final"] == pytest.approx(s * f, abs=1e-9)
    # the big doc (n_chars=5000) must have been promoted to rank 1
    assert got[0]["doc_id"] == 2


def test_function_score_sum_and_weight(spark, store, corpus_pd):
    got = function_score(
        spark,
        store,
        "spark merge",
        _fields(spark, corpus_pd),
        "n_chars",
        k=10,
        modifier="sqrt",
        weight=0.5,
        boost_mode="sum",
    ).collect()
    for r in got:
        n = float(
            corpus_pd.loc[corpus_pd.doc_id == r["doc_id"], "n_chars"].iloc[0]
        )
        assert r["factor"] == pytest.approx(0.5 * math.sqrt(n), abs=1e-12)
        assert r["final"] == pytest.approx(r["score"] + r["factor"], abs=1e-12)


def test_function_score_bad_args(spark, store, corpus_pd):
    with pytest.raises(ValueError):
        function_score(
            spark, store, "spark", _fields(spark, corpus_pd), "n_chars",
            modifier="exp",
        )
    with pytest.raises(ValueError):
        function_score(
            spark, store, "spark", _fields(spark, corpus_pd), "n_chars",
            boost_mode="max",
        )


def test_function_score_gauss_decay(spark, store, corpus_pd):
    got = function_score(
        spark,
        store,
        "spark merge",
        _fields(spark, corpus_pd),
        "n_chars",
        k=10,
        modifier="gauss",
        origin=40.0,
        scale=30.0,
    ).collect()
    assert got
    for r in got:
        n = float(
            corpus_pd.loc[corpus_pd.doc_id == r["doc_id"], "n_chars"].iloc[0]
        )
        d = abs(n - 40.0) / 30.0
        assert r["factor"] == pytest.approx(
            math.exp(-math.log(2.0) * d * d), abs=1e-12
        )
        assert r["final"] == pytest.approx(r["score"] * r["factor"], abs=1e-9)
    # the on-origin doc (n_chars=40) carries factor 1.0 and wins
    assert got[0]["doc_id"] == 3
    # half-life pin: at |x-origin| == scale the factor is exactly 0.5
    exp_half = {
        r["doc_id"]: r["factor"]
        for r in function_score(
            spark, store, "spark merge", _fields(spark, corpus_pd),
            "n_chars", k=10, modifier="exp", origin=40.0, scale=30.0,
        ).collect()
    }
    lin = {
        r["doc_id"]: r["factor"]
        for r in function_score(
            spark, store, "spark merge", _fields(spark, corpus_pd),
            "n_chars", k=10, modifier="linear", origin=10.0, scale=15.0,
        ).collect()
    }
    # doc 3: n_chars=40, |40-10|/15 = 2 → linear max(0, 1 - 2/2) = 0
    assert lin[3] == pytest.approx(0.0, abs=1e-12)
    # doc 3 sits ON the origin → exp factor exactly 1.0; doc 1 (n_chars
    # 10) is at distance == scale → the half-life pin, factor 0.5
    assert exp_half[3] == pytest.approx(1.0, abs=1e-12)
    assert exp_half[1] == pytest.approx(0.5, abs=1e-12)


def test_function_score_decay_requires_origin_scale(spark, store, corpus_pd):
    with pytest.raises(ValueError):
        function_score(
            spark, store, "spark", _fields(spark, corpus_pd), "n_chars",
            modifier="gauss",
        )
    with pytest.raises(ValueError):
        function_score(
            spark, store, "spark", _fields(spark, corpus_pd), "n_chars",
            modifier="exp", origin=10.0, scale=0.0,
        )


def test_function_score_missing_and_negative_fields(spark, store, corpus_pd):
    """ADVICE r04: a matching doc with no fields_df row keeps its BM25
    score (left join, neutral factor); negative raw values are clamped so
    sqrt/ln1p never emit NaN finals."""
    base = {
        r["doc_id"]: r["score"]
        for r in search_index(spark, store, "spark merge", k=10).collect()
    }
    fpd = corpus_pd[["doc_id", "n_chars"]].copy()
    fpd = fpd[fpd["doc_id"] != 1]  # doc 1: no factor row at all
    fpd.loc[fpd["doc_id"] == 3, "n_chars"] = -50  # doc 3: negative value
    fields = spark.createDataFrame(fpd)
    out = function_score(
        spark, store, "spark merge", fields, "n_chars", k=10
    ).toPandas()
    got = out.set_index("doc_id")
    assert set(base) <= set(got.index)  # nothing silently dropped
    # missing row -> multiplicative neutral: plain BM25 survives
    assert got.loc[1, "factor"] == pytest.approx(1.0)
    assert got.loc[1, "final"] == pytest.approx(base[1], abs=1e-9)
    # negative value clamped: ln1p(0) = 0, never NaN
    assert got.loc[3, "factor"] == pytest.approx(0.0)
    assert not out["final"].isna().any()


def test_function_score_missing_substitute(spark, store, corpus_pd):
    """ES field_value_factor.missing: substitute a raw value through the
    modifier for docs without a field row."""
    fpd = corpus_pd[["doc_id", "n_chars"]]
    fields = spark.createDataFrame(fpd[fpd["doc_id"] != 1])
    out = (
        function_score(
            spark, store, "spark merge", fields, "n_chars",
            k=10, missing=99.0,
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "factor"] == pytest.approx(math.log(100.0))


def test_function_score_sum_missing_neutral(spark, store, corpus_pd):
    base = {
        r["doc_id"]: r["score"]
        for r in search_index(spark, store, "spark merge", k=10).collect()
    }
    fpd = corpus_pd[["doc_id", "n_chars"]]
    fields = spark.createDataFrame(fpd[fpd["doc_id"] != 1])
    out = (
        function_score(
            spark, store, "spark merge", fields, "n_chars",
            k=10, boost_mode="sum",
        )
        .toPandas()
        .set_index("doc_id")
    )
    # additive neutral: factor 0, final == plain BM25
    assert out.loc[1, "factor"] == pytest.approx(0.0)
    assert out.loc[1, "final"] == pytest.approx(base[1], abs=1e-9)
