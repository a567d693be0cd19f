"""Shared (cross-process) search-result cache — SURVEY §10.5.

The reference's search-result cache lives inside one server process per
collection [M]; a Spark serving tier runs MANY driver processes against
the same index root, so the cache belongs next to the index: a sqlite
file under ``<root>/.cache/results.db`` that any process can read/write
(sqlite serializes concurrent writers; readers never block readers).

Correctness model is identical to the in-process cache: every entry is
keyed by the index EPOCH (IndexStore.epoch() — any build/append/delete/
compact changes it), so a mutated index can never serve stale results;
entries from dead epochs are purged opportunistically on write. Values
are the ≤ k collected result rows (never O(corpus)) pickled with their
schema — the same artifact-local trust domain as the index files
themselves.
"""

from __future__ import annotations

import pickle
import sqlite3
from pathlib import Path


class SharedResultCache:
    def __init__(self, index_root: str):
        self.path = Path(index_root, ".cache", "results.db")
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with self._conn() as con:
            con.execute(
                "CREATE TABLE IF NOT EXISTS results ("
                " key TEXT PRIMARY KEY, epoch TEXT NOT NULL,"
                " payload BLOB NOT NULL)"
            )

    def _conn(self) -> sqlite3.Connection:
        con = sqlite3.connect(str(self.path), timeout=10.0)
        con.execute("PRAGMA journal_mode=WAL")  # readers don't block
        return con

    def get(self, key: str, epoch: str):
        """(schema_json, rows) or None. Epoch mismatch = miss (the entry
        belongs to a superseded index state)."""
        with self._conn() as con:
            row = con.execute(
                "SELECT epoch, payload FROM results WHERE key = ?", (key,)
            ).fetchone()
        if row is None or row[0] != epoch:
            return None
        return pickle.loads(row[1])

    def put(self, key: str, epoch: str, schema_json: str, rows: list) -> None:
        blob = pickle.dumps((schema_json, rows), protocol=4)
        with self._conn() as con:
            con.execute(
                "INSERT OR REPLACE INTO results (key, epoch, payload)"
                " VALUES (?, ?, ?)",
                (key, epoch, blob),
            )
            # opportunistic GC: entries from superseded epochs can never
            # hit again (epoch is part of every lookup) — drop them
            con.execute("DELETE FROM results WHERE epoch != ?", (epoch,))

    def size(self) -> int:
        with self._conn() as con:
            return int(
                con.execute("SELECT count(*) FROM results").fetchone()[0]
            )
