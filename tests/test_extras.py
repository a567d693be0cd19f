"""Round-2 extras: caret boosts, spell suggest, field sort, range facet,
more-like-this, embedding-LSH dedup, IVF ANN.

Each feature is also oracle-checked by the driver (__spark_entry__); these
tests pin the engine-side semantics that the oracle can't see (boost
threading through parse/expansion, subset relations vs brute force)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.dataops import similarity as SIM
from fastcatsearch3_spark.operators import build as B
from fastcatsearch3_spark.operators.ingest import load_documents
from fastcatsearch3_spark.index import IndexStore
from fastcatsearch3_spark.plans.query import parse_query
from fastcatsearch3_spark.plans.search import (
    more_like_this,
    range_facet,
    search_index,
    search_sorted,
    spell_suggest,
)

SF = "/root/testdata/sf0.001"
CFG = EngineConfig()


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_extras"))
    B.build_index(spark, load_documents(spark, SF), root, CFG)
    return IndexStore(root)


# --- caret boosts ---------------------------------------------------------

def test_parse_boost_flat():
    pq = parse_query("spark merge^3", CFG)
    assert pq.terms == ["spark", "merge"]
    assert pq.boosts == {"merge": 3.0}


def test_parse_boost_tree_and_fractional():
    pq = parse_query("(spark^2.5 OR merge) table", CFG)
    assert pq.boosts == {"spark": 2.5}
    assert pq.tree is not None


def test_parse_boost_camelcase_covers_all_tokens():
    pq = parse_query("parseIndexBuffer^2", CFG)
    assert pq.boosts == {"parse": 2.0, "index": 2.0, "buffer": 2.0}


def test_parse_boost_max_merge():
    pq = parse_query("spark^2 spark^4", CFG)
    assert pq.boosts == {"spark": 4.0}


def test_boost_changes_ranking(spark, store):
    base = search_index(spark, store, parse_query("vector OR stream", CFG), k=50)
    boosted = search_index(
        spark, store, parse_query("vector OR stream^5", CFG), k=50
    )
    b = base.toPandas().set_index("doc_id")["score"]
    s = boosted.toPandas().set_index("doc_id")["score"]
    common = b.index.intersection(s.index)
    assert len(common) > 0
    # boosted scores strictly dominate wherever stream contributes
    assert (s[common] >= b[common] - 1e-12).all()
    assert (s[common] > b[common] + 1e-12).any()


def test_boost_one_term_query_scales_score(spark, store):
    base = search_index(spark, store, parse_query("spark", CFG), k=5).toPandas()
    b2 = search_index(spark, store, parse_query("spark^2", CFG), k=5).toPandas()
    m = base.merge(b2, on="doc_id", suffixes=("_1", "_2"))
    assert len(m) == len(base)
    assert np.allclose(m["score_2"], 2.0 * m["score_1"], rtol=1e-9)


def test_boost_survives_prefix_expansion(spark, store):
    pq = parse_query("spar*^3 merge", CFG)
    assert pq.boosts == {"spar*": 3.0}
    hits = search_index(spark, store, pq, k=5).toPandas()
    plain = search_index(spark, store, parse_query("spark^3 merge", CFG), k=5).toPandas()
    # 'spar*' expands to exactly 'spark' in this vocabulary
    pd.testing.assert_frame_equal(hits, plain)


# --- spell suggest --------------------------------------------------------

def test_spell_suggest_ranking(spark, store):
    out = spell_suggest(spark, store, "qery", max_dist=2, k=10).toPandas()
    assert list(out["term"])[0] == "query"  # dist 1 before any dist 2
    assert (out["dist"] <= 2).all()
    assert "qery" not in set(out["term"])


def test_spell_suggest_no_match(spark, store):
    out = spell_suggest(spark, store, "zzzzzzzzz", max_dist=1, k=10)
    assert out.count() == 0


# --- field sort + range facet --------------------------------------------

def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_search_sorted_matches_pandas_oracle(spark, store):
    d = _docs(spark).select("doc_id", "n_chars")
    out = search_sorted(
        spark, store, "spark merge", d,
        [F.desc("n_chars"), F.asc("doc_id")], k=5,
    ).toPandas()
    pdf = _docs(spark).toPandas()
    match = pdf[
        pdf["text"].str.contains(r"\bspark\b")
        & pdf["text"].str.contains(r"\bmerge\b")
    ]
    exp = match.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True]
    ).head(5)["doc_id"].tolist()
    assert out["doc_id"].tolist() == exp


def test_search_sorted_offset_paging(spark, store):
    d = _docs(spark).select("doc_id", "n_chars")
    cols = [F.desc("n_chars"), F.asc("doc_id")]
    full = search_sorted(spark, store, "spark merge", d, cols, k=10).toPandas()
    page2 = search_sorted(
        spark, store, "spark merge", d, cols, k=5, offset=5
    ).toPandas()
    assert page2["doc_id"].tolist() == full["doc_id"].tolist()[5:10]


def test_range_facet_buckets(spark):
    d = _docs(spark).select("doc_id", "n_chars")
    out = range_facet(d, "n_chars", width=100).toPandas()
    assert (out["range_hi"] - out["range_lo"] == 100).all()
    assert out["cnt"].sum() == d.count()
    pdf = d.toPandas()
    exp = (pdf["n_chars"] // 100).value_counts().sort_index()
    got = dict(zip(out["range_lo"] // 100, out["cnt"]))
    assert got == exp.to_dict()


# --- more-like-this -------------------------------------------------------

def test_more_like_this_excludes_seed(spark, store):
    out = more_like_this(
        spark, store, doc_id=7, corpus_df=load_documents(spark, SF), m=5, k=10
    ).toPandas()
    assert 7 not in set(out["doc_id"])
    assert len(out) == 10
    assert (out["score"].values[:-1] >= out["score"].values[1:] - 1e-12).all()


def test_more_like_this_missing_doc(spark, store):
    out = more_like_this(
        spark, store, doc_id=10**9, corpus_df=load_documents(spark, SF)
    )
    assert out.count() == 0


# --- embedding LSH dedup + IVF ANN ---------------------------------------

def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_embedding_lsh_pairs_subset_of_brute(spark):
    from fastcatsearch3_spark.dataops.dedup import embedding_top_pairs

    lsh = SIM.embedding_lsh_pairs(_emb(spark), limit=50).toPandas()
    brute = embedding_top_pairs(_emb(spark), top=500).toPandas()
    bm = {
        (a, b): s
        for a, b, s in zip(brute["vec_a"], brute["vec_b"], brute["sim_e4"])
    }
    assert len(lsh) > 0
    for a, b, s in zip(lsh["vec_a"], lsh["vec_b"], lsh["sim_e4"]):
        assert a < b
        if (a, b) in bm:  # brute is top-500-truncated; verify overlap values
            assert bm[(a, b)] == s


def test_embedding_lsh_recall_on_planted_near_dups(spark):
    # the testdata embeddings are near-orthogonal (max cosine ≈ 0.48) —
    # true near-dups must be planted to measure recall: 200 random base
    # vectors + 10 copies perturbed to cosine ≈ 0.999
    rng = np.random.default_rng(7)
    base = rng.normal(size=(200, 64))
    rows = [
        (int(i), [float(x) for x in base[i]]) for i in range(200)
    ]
    planted = []
    for j in range(10):
        twin = base[j] + rng.normal(size=64) * 0.02
        rows.append((200 + j, [float(x) for x in twin]))
        planted.append((j, 200 + j))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    lsh = SIM.embedding_lsh_pairs(emb, limit=50).toPandas()
    got = set(zip(lsh["vec_a"], lsh["vec_b"]))
    # sim ≈ 0.999 → θ ≈ 0.029π → per-band collision ≈ 0.79, miss-all-4
    # ≈ 2e-3 per pair; all 10 planted pairs must surface
    assert set(planted) <= got
    top10 = list(zip(lsh["vec_a"][:10], lsh["vec_b"][:10]))
    assert set(top10) == set(planted)


def test_ivf_ann_subset_of_brute(spark):
    ivf = SIM.ivf_ann_topk(_emb(spark), probe_id=0, k=10).toPandas()
    brute = SIM.brute_force_topk(_emb(spark), probe_id=0, k=500).toPandas()
    bm = dict(zip(brute["vec_id"], brute["sim_e4"]))
    assert len(ivf) == 10
    assert 0 not in set(ivf["vec_id"])
    for v, s in zip(ivf["vec_id"], ivf["sim_e4"]):
        assert bm.get(v) == s
    # the probe's own list is always scanned → its nearest neighbor in the
    # same cell must be found; sanity: ≥half of brute top-10 recalled
    assert len(set(ivf["vec_id"]) & set(brute["vec_id"][:10])) >= 5
