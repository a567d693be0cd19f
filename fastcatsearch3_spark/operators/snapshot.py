"""Consistent index snapshot / restore (collection backup).

The reference ships collection backup/restore through its admin surface
[M — SURVEY.md §1]; at 10^12 docs the equivalent operational need is a
point-in-time copy of an index an operator can restore after a storage
incident (complementing ``operators/fsck.py``, which tells them they
need one). Spark-first this is NOT a job at all — segments are immutable
Parquet and every mutation publishes atomically, so a snapshot is a
file-level copy made CONSISTENT by the store's epoch token:

  1. read ``epoch`` (stats mtime ⊕ segment set ⊕ deletes listing),
  2. copy the durable subtrees (stats, manifest, lexicon, postings,
     docmap, deletes) into ``dest/.tmp-*``,
  3. re-read ``epoch``; any concurrent build/append/delete/compact
     changed it → the copy may be torn → raise (caller retries),
  4. atomically rename into place and write ``snapshot.json``
     (source epoch, per-subtree file counts/bytes, wall time).

Derived per-epoch artifacts (``.denied`` masks, fuzzy deletion tables,
result caches) are deliberately NOT copied — they rebuild lazily from
the durable state on first use, exactly as after a fresh deploy.

``restore_index`` is the inverse: copy into ``.tmp-*`` beside the
target, atomically swap, and leave the previous index (if any) under
``<dest>.old-<ts>`` until the caller deletes it.
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time
from pathlib import Path

# durable state, in copy order; optional entries may be absent
_SUBTREES = ("manifest", "lexicon", "postings", "docmap", "deletes")


def _copy_tree(src: Path, dst: Path) -> tuple[int, int]:
    """copytree + (file_count, byte_count) of what was copied."""
    shutil.copytree(src, dst)
    files = [p for p in dst.rglob("*") if p.is_file()]
    return len(files), sum(p.stat().st_size for p in files)


def snapshot_index(store, dest: str | Path) -> dict:
    """Point-in-time copy of ``store``'s durable state into ``dest``
    (must not exist). Returns the snapshot manifest. Raises RuntimeError
    when a concurrent mutation lands mid-copy (epoch changed — the copy
    may mix two index versions and is discarded)."""
    src = Path(store.root)
    dest = Path(dest)
    if dest.exists():
        raise ValueError(f"snapshot destination exists: {dest}")
    epoch_before = store.epoch()
    t0 = time.monotonic()
    tmp = Path(
        tempfile.mkdtemp(prefix=".tmp-snap-", dir=str(dest.parent))
    )
    try:
        counts: dict[str, dict] = {}
        shutil.copy2(src / "stats.json", tmp / "stats.json")
        for sub in _SUBTREES:
            if (src / sub).exists():
                n, nbytes = _copy_tree(src / sub, tmp / sub)
                counts[sub] = {"files": n, "bytes": nbytes}
        if store.epoch() != epoch_before:
            raise RuntimeError(
                "index mutated during snapshot (epoch changed) — "
                "discarded; retry when no build/append/compact is racing"
            )
        manifest = {
            "source_root": str(src),
            "source_epoch": epoch_before,
            "subtrees": counts,
            "wall_s": round(time.monotonic() - t0, 3),
            "created_unix": int(time.time()),
        }
        (tmp / "snapshot.json").write_text(
            json.dumps(manifest, indent=2, sort_keys=True)
        )
        tmp.rename(dest)  # atomic publish
        return manifest
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def restore_index(
    snapshot: str | Path,
    dest: str | Path,
    spark=None,
    verify: bool = False,
    sha_sample_mod: int = 16,
) -> dict:
    """Restore a snapshot into ``dest`` (atomic swap; a pre-existing
    index at ``dest`` is kept beside it as ``<dest>.old-<unix>`` until
    the caller deletes it). Returns the snapshot manifest restored.

    ``verify=True`` (VERDICT r04 next-round #8) runs ``fsck_index`` on
    the restored copy BEFORE the swap — the snapshot bytes may have
    rotted or been truncated in storage since they were taken, and an
    atomic swap of corrupt bytes would replace a working index with a
    broken one. A failed check raises RuntimeError with the offending
    checks and leaves ``dest`` untouched (the verified-bad copy is
    deleted). ``sha_sample_mod`` passes through to fsck's deterministic
    1/mod content-hash sample (full recheck with 1 — at 100 TB the
    sampled audit is the routine mode). Requires ``spark``."""
    snapshot = Path(snapshot)
    dest = Path(dest)
    manifest = json.loads((snapshot / "snapshot.json").read_text())
    if verify and spark is None:
        raise ValueError("verify=True requires a SparkSession")
    tmp = Path(
        tempfile.mkdtemp(prefix=".tmp-restore-", dir=str(dest.parent))
    )
    try:
        shutil.rmtree(tmp)  # copytree wants to create it
        shutil.copytree(
            snapshot, tmp, ignore=shutil.ignore_patterns("snapshot.json")
        )
        if verify:
            from fastcatsearch3_spark.index import IndexStore
            from fastcatsearch3_spark.operators.fsck import fsck_index

            try:
                report = fsck_index(
                    spark,
                    IndexStore(str(tmp)),
                    sha_sample_mod=sha_sample_mod,
                )
            except Exception as e:
                # a truncated/rotted file makes the scan itself throw
                # (parquet footer errors) before fsck can record a
                # violation — equally corrupt, equally refused
                raise RuntimeError(
                    "restore verification failed — snapshot is corrupt "
                    f"(fsck could not read it: {type(e).__name__}), "
                    "existing index left untouched"
                ) from e
            bad = {
                name: r
                for name, r in report.items()
                if isinstance(r, dict) and not r.get("ok", True)
            }
            if bad:
                raise RuntimeError(
                    "restore verification failed — snapshot is corrupt, "
                    f"existing index left untouched: {bad}"
                )
            manifest = dict(manifest, fsck="ok")
        if dest.exists():
            dest.rename(dest.parent / f"{dest.name}.old-{int(time.time())}")
        tmp.rename(dest)
        return manifest
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
