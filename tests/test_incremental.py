"""Incremental indexing / deletes / streaming / compaction (ST-1..ST-4,
J-7, P-7). Rank-identity after every mutation is asserted against the
frozen pandas oracle over the *logically live* corpus."""

from __future__ import annotations

import pandas as pd
import pytest

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.index import IndexStore
from fastcatsearch3_spark.operators import build as B
from fastcatsearch3_spark.operators.ingest import normalize_corpus
from fastcatsearch3_spark.plans.query import parse_query
from fastcatsearch3_spark.plans.search import search_index
from fastcatsearch3_spark.streaming import incremental as inc
from fixtures.gen_corpus import gen_corpus, gen_corpus_delta
from tests.oracle import bm25_topk_oracle

CFG = EngineConfig(num_shards=4)
BASE_N = 200


def _live_pd(base: pd.DataFrame, *updates: pd.DataFrame, tombstones=None) -> pd.DataFrame:
    """Pandas mirror of upsert semantics: latest (by apply order) per
    (repo, path) wins; tombstoned pks removed."""
    frames = [base, *updates]
    allpd = pd.concat(frames, ignore_index=True)
    allpd["_ord"] = range(len(allpd))
    latest = allpd.sort_values("_ord").groupby(["repo", "path"], as_index=False).last()
    if tombstones is not None:
        keys = set(zip(tombstones["repo"], tombstones["path"]))
        latest = latest[
            ~latest.apply(lambda r: (r["repo"], r["path"]) in keys, axis=1)
        ]
    return latest.drop(columns=["_ord"])


def _norm_pd(spark, pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        normalize_corpus(
            spark.createDataFrame(pdf[["repo", "path", "commit", "lang", "content"]])
        )
        .select("doc_id", "content")
        .toPandas()
    )


def _oracle_ids(spark, live_pd: pd.DataFrame, text: str, k=10,
                physical_pd: pd.DataFrame | None = None):
    """Oracle over the live corpus. With ``physical_pd`` (all segment
    copies), stats are computed over the physical corpus and live docs act
    as an allow-list — the engine's documented pre-compaction semantics."""
    pq = parse_query(text, CFG)
    if physical_pd is None:
        sdf = _norm_pd(spark, live_pd)
        return bm25_topk_oracle(sdf, pq.terms, k=k, op=pq.op, cfg=CFG,
                                not_terms=pq.not_terms)
    allow = set(_norm_pd(spark, live_pd)["doc_id"])
    sdf = _norm_pd(spark, physical_pd)
    return bm25_topk_oracle(sdf, pq.terms, k=k, op=pq.op, cfg=CFG,
                            not_terms=pq.not_terms, allow_doc_ids=allow)


def _engine_ids(spark, root: str, text: str, k=10) -> pd.DataFrame:
    return search_index(spark, IndexStore(root), text, k=k).toPandas()


def _assert_rank_identical(engine: pd.DataFrame, oracle: pd.DataFrame):
    assert list(engine["doc_id"]) == list(oracle["doc_id"])
    assert engine["score"].to_numpy() == pytest.approx(
        oracle["score"].to_numpy(), abs=1e-6
    )


@pytest.fixture(scope="module")
def base_pd() -> pd.DataFrame:
    return gen_corpus(BASE_N, seed=42)


@pytest.fixture(scope="module")
def root(spark, base_pd, tmp_path_factory) -> str:
    root = str(tmp_path_factory.mktemp("incr_index"))
    corpus = normalize_corpus(spark.createDataFrame(base_pd))
    B.build_index(spark, corpus, root, CFG, n_segments=1)
    return root


def test_append_updates_and_supersedes(spark, base_pd, root):
    new, upd, _ = gen_corpus_delta(BASE_N)
    batch = pd.concat([new, upd], ignore_index=True)
    m = inc.append_segment(spark, root, spark.createDataFrame(batch), CFG)
    assert m["segment_id"] == 1 and m["n_docs"] == len(batch)
    assert m["lineage"]["tombstones"] == len(upd)  # 20 updated pks superseded

    # updated docs carry a marker token; all 20 must be findable
    hits = _engine_ids(spark, root, "updatedContent new_revision", k=30)
    assert len(hits) == 20

    # rank identity over the live corpus (stats over the physical corpus —
    # superseded docs still weigh on df/avgdl until compaction, by contract)
    live = _live_pd(base_pd, new, upd)
    phys = pd.concat([base_pd, new, upd], ignore_index=True)
    for text in ("index merge", "parse OR buffer", "segment -error"):
        _assert_rank_identical(
            _engine_ids(spark, root, text),
            _oracle_ids(spark, live, text, physical_pd=phys),
        )

    # superseded old versions must be unreachable: old doc_ids of updated
    # pks never appear for a query matching their (old) content
    old_ids = set(
        normalize_corpus(spark.createDataFrame(base_pd.iloc[:20]))
        .toPandas()["doc_id"]
    )
    got = set(_engine_ids(spark, root, "index", k=300)["doc_id"])
    assert not (got & old_ids)


def test_delete_by_pk_then_rank_identity(spark, base_pd, root):
    new, upd, tomb = gen_corpus_delta(BASE_N)
    n = inc.delete_by_pk(spark, root, spark.createDataFrame(tomb))
    assert n == len(tomb)
    live = _live_pd(base_pd, new, upd, tombstones=tomb)
    phys = pd.concat([base_pd, new, upd], ignore_index=True)
    for text in ("index merge", "scan OR sort"):
        _assert_rank_identical(
            _engine_ids(spark, root, text),
            _oracle_ids(spark, live, text, physical_pd=phys),
        )


def test_compaction_preserves_results(spark, base_pd, root):
    new, upd, tomb = gen_corpus_delta(BASE_N)
    live = _live_pd(base_pd, new, upd, tombstones=tomb)
    m = inc.compact(spark, root, CFG)
    store = IndexStore(root)
    assert store.segments() == [0]
    assert not store.has_deletes()
    assert m["n_docs"] == len(live)
    assert store.stats()["n_docs"] == len(live)  # avgdl/stats purged of dead docs
    # post-compaction scores match the LIVE-corpus oracle exactly: the
    # stats drift from superseded/tombstoned docs is purged with them
    # (rankings may legitimately reshuffle relative to pre-compaction)
    for text in ("index merge", "parse OR buffer", "segment -error"):
        _assert_rank_identical(
            _engine_ids(spark, root, text), _oracle_ids(spark, live, text)
        )


def test_streaming_available_now(spark, base_pd, tmp_path):
    """ST-1: drain a parquet drop-dir via Structured Streaming, one segment
    per batch; result is rank-identical to the oracle over the union."""
    root = str(tmp_path / "stream_index")
    corpus = normalize_corpus(spark.createDataFrame(base_pd))
    B.build_index(spark, corpus, root, CFG, n_segments=1)

    new, upd, _ = gen_corpus_delta(BASE_N)
    drop = tmp_path / "drop"
    drop.mkdir()
    pd.concat([new, upd], ignore_index=True).to_parquet(drop / "batch0.parquet")
    inc.run_incremental_stream(
        spark, str(drop), root, checkpoint_dir=str(tmp_path / "ckpt"), cfg=CFG
    )
    store = IndexStore(root)
    assert store.segments() == [0, 1]
    live = _live_pd(base_pd, new, upd)
    phys = pd.concat([base_pd, new, upd], ignore_index=True)
    _assert_rank_identical(
        _engine_ids(spark, root, "index merge"),
        _oracle_ids(spark, live, "index merge", physical_pd=phys),
    )
    # restart with nothing new: checkpoint makes the drain a no-op
    inc.run_incremental_stream(
        spark, str(drop), root, checkpoint_dir=str(tmp_path / "ckpt"), cfg=CFG
    )
    assert IndexStore(root).segments() == [0, 1]


def test_recover_interrupted_compact(tmp_path):
    """Swap-crash recovery (ADVICE r01): mid-window states roll back to
    the .old copies; post-commit states just clear leftovers."""
    from fastcatsearch3_spark.index import recover_interrupted_compact

    def mk(root, names):
        for n in names:
            d = root / n
            d.mkdir(parents=True)
            (d / "marker").write_text(n)

    # state 1: only postings renamed aside (crash before new rename-in)
    r1 = tmp_path / "s1"
    mk(r1, ["postings.old", "docmap", "deletes", "manifest"])
    assert recover_interrupted_compact(r1)
    assert (r1 / "postings" / "marker").read_text() == "postings.old"
    assert not (r1 / "postings.old").exists()

    # state 2: all aside, new postings in, crash before new docmap in —
    # partial new postings must be discarded, old everything restored
    r2 = tmp_path / "s2"
    mk(r2, ["postings.old", "docmap.old", "deletes.old", "manifest.old"])
    mk(r2, ["postings"])  # the new, partial copy
    assert recover_interrupted_compact(r2)
    assert (r2 / "postings" / "marker").read_text() == "postings.old"
    assert (r2 / "docmap" / "marker").read_text() == "docmap.old"
    assert (r2 / "deletes").exists() and (r2 / "manifest").exists()

    # state 3: committed (both new dirs in), .old leftovers cleared
    r3 = tmp_path / "s3"
    mk(r3, ["postings", "docmap", "deletes.old", "manifest.old"])
    assert recover_interrupted_compact(r3)
    assert (r3 / "postings" / "marker").read_text() == "postings"
    assert not (r3 / "deletes.old").exists()
    assert not (r3 / "deletes").exists()  # new epoch starts tombstone-free

    # state 4: clean index — no-op
    r4 = tmp_path / "s4"
    mk(r4, ["postings", "docmap"])
    assert not recover_interrupted_compact(r4)
