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


def test_search_cache_hits_and_epoch_invalidation(spark, tmp_path):
    """Same query twice = one real search; an append changes the index
    epoch, so the third call misses; results stay identical throughout."""
    col = Collection(
        spark, str(tmp_path / "idx"), EngineConfig(num_shards=2),
        cache_size=8,
    )
    col.build(normalize_corpus(spark.createDataFrame(_pdf(
        [(1, "spark merge table"), (2, "slow merge line")]
    ))))
    r1 = col.search("spark merge", k=5).collect()
    r2 = col.search("spark merge", k=5).collect()
    assert col.cache_misses == 1 and col.cache_hits == 1
    assert [(r["doc_id"], r["score"]) for r in r1] == [
        (r["doc_id"], r["score"]) for r in r2
    ]
    col.append(spark.createDataFrame(_pdf([(3, "spark merge value")])))
    r3 = col.search("spark merge", k=5).collect()
    assert col.cache_misses == 2  # epoch changed → stale entry unreachable
    assert {r["doc_id"] for r in r3} == {1, 3}
    # DataFrame-valued kwargs bypass the cache entirely
    allow = spark.createDataFrame([(1,)], "doc_id long")
    col.search("spark merge", k=5, allow_doc_ids=allow).collect()
    assert col.cache_misses == 2 and len(col._cache) == 2


def test_search_collections_federated_merge(spark, tmp_path):
    """cn=a,b: per-collection stats stay independent; the global top-k is
    exactly the (score desc, doc_id) merge of the per-collection top-k."""
    from fastcatsearch3_spark.plans.search import (
        search_collections,
        search_index,
    )

    cfg = EngineConfig(num_shards=2)
    ca = Collection(spark, str(tmp_path / "a"), cfg)
    cb = Collection(spark, str(tmp_path / "b"), cfg)
    ca.build(normalize_corpus(spark.createDataFrame(_pdf(
        [(1, "spark merge table"), (2, "spark merge merge"), (3, "other")]
    ))))
    cb.build(normalize_corpus(spark.createDataFrame(_pdf(
        [(11, "spark merge"), (12, "spark text merge plan")]
    ))))
    got = search_collections(
        spark, {"a": ca.store, "b": cb.store}, "spark merge", k=3
    ).toPandas()
    ra = search_index(spark, ca.store, "spark merge", k=3).toPandas()
    rb = search_index(spark, cb.store, "spark merge", k=3).toPandas()
    ra["collection"], rb["collection"] = "a", "b"
    want = (
        pd.concat([ra, rb])
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(3)
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["collection"].tolist() == want["collection"].tolist()
    assert (got["score"].to_numpy() == want["score"].to_numpy()).all()
    # doc 11's short collection-b corpus gives different stats than a's —
    # both collections must appear in the merged list for this query
    assert set(got["collection"]) == {"a", "b"}


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


def test_shared_cache_cross_process(spark, tmp_path):
    """SURVEY §10.5: a result computed by ANOTHER driver process serves
    this process's first lookup from the shared sqlite cache; an append
    (new epoch) invalidates it for both."""
    import subprocess
    import sys

    root = str(tmp_path / "sharedidx")
    col = Collection(
        spark, root, EngineConfig(num_shards=2), cache_size=8,
        shared_cache=True,
    )
    col.build(normalize_corpus(spark.createDataFrame(_pdf(
        [(1, "spark merge table"), (2, "slow merge line"),
         (3, "spark value row")]
    ))))

    # process B computes the result and publishes it to the shared cache
    worker = f"""
import sys
sys.path.insert(0, {repr("/root/repo")})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from fastcatsearch3_spark import Collection
col = Collection(spark, {repr(root)}, cache_size=8, shared_cache=True)
rows = col.search("spark merge", k=5).collect()
print("WORKER_ROWS", [(r["doc_id"], round(r["score"], 6)) for r in rows])
assert col.cache_misses == 1 and col.shared_hits == 0
"""
    r = subprocess.run(
        [sys.executable, "-c", worker], capture_output=True, text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    want = next(
        ln for ln in r.stdout.splitlines() if ln.startswith("WORKER_ROWS")
    )

    # process A (this one): first lookup is a SHARED hit — no search ran
    rows = col.search("spark merge", k=5).collect()
    assert col.shared_hits == 1 and col.cache_misses == 0
    got = "WORKER_ROWS " + str(
        [(r["doc_id"], round(r["score"], 6)) for r in rows]
    )
    assert got == want

    # mutation invalidates: new epoch → miss in BOTH tiers, fresh result
    col.append(spark.createDataFrame(_pdf([(4, "spark merge extra")])))
    rows2 = col.search("spark merge", k=5).collect()
    assert col.cache_misses == 1
    assert {r["doc_id"] for r in rows2} >= {4}


def test_collection_explain_and_fsck(spark, tmp_path):
    """The facade exposes score explain and the integrity audit; explain
    partials reconcile with search scores and a fresh build audits
    clean."""
    import pytest as _pt

    col = Collection(spark, str(tmp_path / "idx"), EngineConfig(num_shards=2))
    corpus = normalize_corpus(
        spark.createDataFrame(
            _pdf(
                [
                    (1, "spark merge table"),
                    (2, "slow merge line"),
                    (3, "merge merge value spark"),
                ]
            )
        )
    )
    col.build(corpus)
    hits = col.search("spark merge", k=5).toPandas()
    ex = col.explain("spark merge", k=5).toPandas()
    sums = ex.groupby("doc_id")["partial"].sum()
    for _, r in hits.iterrows():
        assert sums[r["doc_id"]] == _pt.approx(r["score"], abs=1e-9)
    report = col.fsck(corpus=corpus)
    assert report["ok"], report


def test_collection_rescore_function_score_related(spark, tmp_path):
    """The facade exposes the late-r4 serving ops; each reconciles with
    its plans/search twin on the same store."""
    import pytest as _pt

    from fastcatsearch3_spark.plans.search import (
        function_score,
        related_keywords,
        rescore_topk,
    )

    col = Collection(
        spark,
        str(tmp_path / "idx"),
        EngineConfig(num_shards=2, store_positions=True),
        cache_size=0,
    )
    raw = spark.createDataFrame(
        _pdf(
            [
                (1, "table hash join"),
                (2, "hash table join"),
                (3, "table merge hash"),
                (4, "table hash table hash"),
                (5, "table value line"),
            ]
        )
    )
    corpus = normalize_corpus(raw)
    col.build(corpus)

    got = col.rescore("table OR hash", '"table hash"', k=5, window=5)
    exp = rescore_topk(
        spark, col.store, "table OR hash", '"table hash"', k=5, window=5
    )
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in exp.collect()
    ]

    fields = raw.select("doc_id", "n_chars")
    got = col.function_score("table", fields, "n_chars", k=5).collect()
    exp = function_score(
        spark, col.store, "table", fields, "n_chars", k=5
    ).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in exp]
    for g, e in zip(got, exp):
        assert g["final"] == _pt.approx(e["final"], abs=1e-12)

    got = col.related("table hash", corpus, top_n=5, min_fg_df=1).collect()
    exp = related_keywords(
        spark, col.store, "table hash", corpus, top_n=5, min_fg_df=1
    ).collect()
    assert [(r["term"], r["fg_df"], r["bg_df"]) for r in got] == [
        (r["term"], r["fg_df"], r["bg_df"]) for r in exp
    ]
