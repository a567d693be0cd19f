"""Snapshot / restore (operators/snapshot.py): point-in-time copies are
consistent (epoch-checked), independent of later source mutations,
restorable atomically, and audit clean."""

from __future__ import annotations

from pathlib import Path

import pandas as pd
import pytest

from fastcatsearch3_spark import Collection, EngineConfig
from fastcatsearch3_spark.index import IndexStore
from fastcatsearch3_spark.operators.fsck import fsck_index
from fastcatsearch3_spark.operators.ingest import normalize_corpus
from fastcatsearch3_spark.operators.snapshot import (
    restore_index,
    snapshot_index,
)
from fastcatsearch3_spark.plans.search import search_index


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


def _collection(spark, tmp_path):
    col = Collection(
        spark, str(tmp_path / "idx"), EngineConfig(num_shards=2)
    )
    col.build(
        normalize_corpus(
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
    )
    return col


def test_snapshot_serves_identically_and_survives_source_mutation(
    spark, tmp_path
):
    col = _collection(spark, tmp_path)
    want = col.search("spark merge", k=10).toPandas()

    snap = tmp_path / "backup"
    manifest = snapshot_index(col.store, snap)
    assert manifest["source_epoch"] == col.store.epoch()
    assert (snap / "snapshot.json").exists()

    # mutate the source AFTER the snapshot — the copy must not move
    col.append(spark.createDataFrame(_pdf([(4, "spark merge extra")])))
    got = search_index(
        spark, IndexStore(str(snap)), "spark merge", k=10
    ).toPandas()
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert got["score"].to_numpy() == pytest.approx(
        want["score"].to_numpy(), abs=1e-12
    )
    # and the snapshot audits clean
    report = fsck_index(spark, IndexStore(str(snap)))
    assert report["ok"], report


def test_snapshot_detects_concurrent_mutation(spark, tmp_path):
    col = _collection(spark, tmp_path)
    store = col.store
    epochs = iter([store.epoch(), "DIFFERENT-EPOCH"])
    store.epoch = lambda: next(epochs)  # race injected at the seam
    with pytest.raises(RuntimeError, match="epoch changed"):
        snapshot_index(store, tmp_path / "torn")
    assert not (tmp_path / "torn").exists()
    assert not list(tmp_path.glob(".tmp-snap-*"))  # tmp cleaned up


def test_restore_swaps_atomically_and_keeps_old(spark, tmp_path):
    col = _collection(spark, tmp_path)
    want = col.search("spark merge", k=10).toPandas()
    snap = tmp_path / "backup"
    snapshot_index(col.store, snap)

    # wreck the live index, then restore over it
    col.append(spark.createDataFrame(_pdf([(9, "noise noise noise")])))
    dest = Path(col.store.root)
    restore_index(snap, dest)
    got = search_index(
        spark, IndexStore(str(dest)), "spark merge", k=10
    ).toPandas()
    assert list(got["doc_id"]) == list(want["doc_id"])
    olds = list(dest.parent.glob(f"{dest.name}.old-*"))
    assert len(olds) == 1  # previous index kept for the operator

    # restore into a fresh location too
    fresh = tmp_path / "fresh"
    restore_index(snap, fresh)
    got2 = search_index(
        spark, IndexStore(str(fresh)), "spark merge", k=10
    ).toPandas()
    assert list(got2["doc_id"]) == list(want["doc_id"])
    assert not (fresh / "snapshot.json").exists()


def test_restore_verify_rejects_corrupt_snapshot(spark, tmp_path):
    """VERDICT r04 #8: restore_index(verify=True) fscks the restored copy
    BEFORE the swap — a corrupt snapshot raises and the live index stays
    exactly as it was."""
    col = _collection(spark, tmp_path)
    want = col.search("spark merge", k=10).toPandas()
    snap = tmp_path / "backup"
    snapshot_index(col.store, snap)

    # rot the snapshot: truncate one postings parquet file
    victim = next((snap / "postings").rglob("*.parquet"))
    victim.write_bytes(victim.read_bytes()[: 100])

    dest = Path(col.store.root)
    with pytest.raises(RuntimeError, match="corrupt"):
        restore_index(snap, dest, spark=spark, verify=True)
    # old index untouched (no swap, no .old copy, no tmp litter)
    assert not list(dest.parent.glob(f"{dest.name}.old-*"))
    assert not list(dest.parent.glob(".tmp-restore-*"))
    got = col.search("spark merge", k=10).toPandas()
    assert list(got["doc_id"]) == list(want["doc_id"])


def test_restore_verify_passes_clean_snapshot(spark, tmp_path):
    col = _collection(spark, tmp_path)
    want = col.search("spark merge", k=10).toPandas()
    snap = tmp_path / "backup"
    snapshot_index(col.store, snap)
    fresh = tmp_path / "fresh"
    manifest = restore_index(
        snap, fresh, spark=spark, verify=True, sha_sample_mod=1
    )
    assert manifest["fsck"] == "ok"
    got = search_index(
        spark, IndexStore(str(fresh)), "spark merge", k=10
    ).toPandas()
    assert list(got["doc_id"]) == list(want["doc_id"])


def test_restore_verify_requires_spark(spark, tmp_path):
    col = _collection(spark, tmp_path)
    snap = tmp_path / "backup"
    snapshot_index(col.store, snap)
    with pytest.raises(ValueError, match="SparkSession"):
        restore_index(snap, tmp_path / "x", verify=True)
