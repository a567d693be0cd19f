"""SymSpell deletion-neighborhood fuzzy artifact (SURVEY §12.4).

Layers: variant generator + Levenshtein unit properties, artifact-vs-scan
expansion parity on a real index (content + field namespaces), search
integration (bm25_fuzzy-shaped query identical with/without artifact),
and epoch staleness (mutated index → artifact ignored until rebuilt).
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.index import IndexStore
from fastcatsearch3_spark.operators import build as B
from fastcatsearch3_spark.operators.fuzzy import (
    deletion_variants,
    fuzzy_expand,
    fuzzy_index_build,
    levenshtein,
)
from fastcatsearch3_spark.operators.ingest import load_documents
from fastcatsearch3_spark.plans.search import search_index

SF = "/root/testdata/sf0.001"
CFG = EngineConfig(num_shards=4, indexed_fields=("content", "repo"))


# ---------------------------------------------------------------------------
# unit layer
# ---------------------------------------------------------------------------

def _ref_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    dp = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        dp[i][0] = i
    for j in range(lb + 1):
        dp[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            dp[i][j] = min(
                dp[i - 1][j] + 1,
                dp[i][j - 1] + 1,
                dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return dp[la][lb]


def test_levenshtein_matches_reference():
    rng = np.random.default_rng(7)
    words = [
        "".join(rng.choice(list("abc"), size=int(rng.integers(0, 7))))
        for _ in range(40)
    ]
    for a, b in itertools.combinations(words, 2):
        want = _ref_lev(a, b)
        got = levenshtein(a, b, cap=3)
        assert got == (want if want <= 3 else 4), (a, b)


def test_deletion_variants_shape():
    vs = deletion_variants("abc", 1)
    assert set(vs) == {"abc", "ab", "ac", "bc"}
    vs2 = deletion_variants("abc", 2)
    assert set(vs2) == {"abc", "ab", "ac", "bc", "a", "b", "c"}
    # d=2 count bound: 1 + L + L(L-1)/2
    w = "abcdefgh"
    assert len(deletion_variants(w, 2)) <= 1 + 8 + 28


def test_symmetric_delete_recall_property():
    """The SymSpell candidate rule is a SUPERSET of lev<=d: any pair
    within distance d shares a deletion variant."""
    rng = np.random.default_rng(11)
    words = [
        "".join(rng.choice(list("abcd"), size=int(rng.integers(1, 8))))
        for _ in range(60)
    ]
    for a, b in itertools.combinations(words, 2):
        d = _ref_lev(a, b)
        if d <= 2:
            va, vb = set(deletion_variants(a, 2)), set(deletion_variants(b, 2))
            assert va & vb, (a, b, d)


# ---------------------------------------------------------------------------
# artifact vs scan parity on a real index
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fuzzy_idx"))
    B.build_index(spark, load_documents(spark, SF), root, CFG)
    st = IndexStore(root)
    fuzzy_index_build(spark, st, max_dist=2)
    return st


def _scan_expand(spark, store, stem: str, d: int, limit: int) -> list[str]:
    """The pre-artifact lexicon-scan expansion, reproduced verbatim."""
    from pyspark.sql import functions as F

    pref, base = (
        (stem.rsplit(":", 1)[0] + ":", stem.rsplit(":", 1)[1])
        if ":" in stem
        else ("", stem)
    )
    lex = store.lexicon(spark)
    if pref:
        lex = lex.where(F.col("term").startswith(pref))
    else:
        lex = lex.where(~F.col("term").contains(":"))
    payload = F.expr(f"substring(term, {len(pref) + 1})")
    ln = len(base)
    rows = (
        lex.where((F.length(payload) >= ln - d) & (F.length(payload) <= ln + d))
        .withColumn("dist", F.levenshtein(payload, F.lit(base)))
        .where(F.col("dist") <= d)
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(limit)
        .collect()
    )
    return [r["term"] for r in rows]


@pytest.mark.parametrize("stem,d", [
    ("hash", 2), ("spark", 1), ("tabel", 2), ("merg", 1),
    ("repo:src1", 1), ("repo:scr1", 2), ("zzzzzz", 1),
])
def test_artifact_matches_scan(spark, store, stem, d):
    art = fuzzy_expand(spark, store, stem, d, limit=32)
    assert art is not None  # current-epoch artifact present
    scan = _scan_expand(spark, store, stem, d, limit=32)
    assert art == scan


def test_search_uses_artifact_identically(spark, store, tmp_path_factory):
    """The same fuzzy query returns identical hits with and without the
    artifact (a second index without one exercises the scan fallback)."""
    got_art = search_index(spark, store, "hash~2 merge", k=10).toPandas()

    root2 = str(tmp_path_factory.mktemp("fuzzy_idx_noart"))
    B.build_index(spark, load_documents(spark, SF), root2, CFG)
    st2 = IndexStore(root2)
    got_scan = search_index(spark, st2, "hash~2 merge", k=10).toPandas()
    assert got_art["doc_id"].tolist() == got_scan["doc_id"].tolist()
    np.testing.assert_allclose(
        got_art["score"].to_numpy(), got_scan["score"].to_numpy(), atol=1e-9
    )


def test_stale_artifact_ignored(spark, store, tmp_path_factory):
    """After the index mutates (delete → new epoch), the old artifact must
    not serve; fuzzy_expand returns None until rebuilt for the new epoch."""
    import shutil

    from fastcatsearch3_spark.streaming.incremental import delete_by_pk

    root3 = str(tmp_path_factory.mktemp("fuzzy_idx_stale"))
    shutil.rmtree(root3)
    shutil.copytree(store.root, root3)
    st3 = IndexStore(root3)
    assert fuzzy_expand(spark, st3, "hash", 2, 32) is not None
    keys = (
        load_documents(spark, SF)
        .limit(1)
        .select("repo", "path")
    )
    delete_by_pk(spark, root3, keys)
    assert fuzzy_expand(spark, st3, "hash", 2, 32) is None  # stale epoch
    fuzzy_index_build(spark, st3, max_dist=2)
    assert fuzzy_expand(spark, st3, "hash", 2, 32) is not None


# ---------------------------------------------------------------------------
# prefix-truncated artifact (SymSpell prefixLength)
# ---------------------------------------------------------------------------

def _artifact_rows(spark, root: str):
    import glob
    import json as _json
    from pathlib import Path

    import pyarrow.parquet as pq

    st = IndexStore(root)
    out = Path(root, "fuzzy", st.epoch())
    assert (out / "meta.json").exists()
    n = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(str(out / "data" / "*.parquet"))
    )
    return n, _json.loads((out / "meta.json").read_text())


def test_prefix_truncated_artifact(spark, store, tmp_path_factory):
    """prefix_length bounds the artifact (fewer variant rows) while the
    meta-driven probe keeps expansions identical to the scan on this
    lexicon; the exact-Levenshtein verify keeps precision exact by
    construction."""
    import shutil

    root4 = str(tmp_path_factory.mktemp("fuzzy_idx_prefix"))
    shutil.rmtree(root4)
    shutil.copytree(store.root, root4)
    st4 = IndexStore(root4)

    full_rows, full_meta = _artifact_rows(spark, root4)
    assert full_meta["prefix_length"] is None

    # a full artifact can serve any prefix request → reuse, no rebuild
    fuzzy_index_build(spark, st4, max_dist=2, prefix_length=4)
    _, meta_after = _artifact_rows(spark, root4)
    assert meta_after["prefix_length"] is None

    # force a prefix build: drop the artifact, rebuild truncated
    shutil.rmtree(f"{root4}/fuzzy")
    fuzzy_index_build(spark, st4, max_dist=2, prefix_length=4)
    trunc_rows, trunc_meta = _artifact_rows(spark, root4)
    assert trunc_meta["prefix_length"] == 4
    assert trunc_rows < full_rows  # the point: bounded blow-up

    # expansion parity vs the scan on real stems (incl. >P-length ones)
    for stem, d in [
        ("hash", 2), ("spark", 1), ("tabel", 2), ("merg", 1),
        ("repo:scr1", 2), ("zzzzzz", 1),
    ]:
        art = fuzzy_expand(spark, st4, stem, d, limit=32)
        assert art is not None
        scan = _scan_expand(spark, st4, stem, d, limit=32)
        # precision is exact by construction (full-term verify); recall
        # can in theory drop for edits astride the window — must not on
        # this vocab
        assert art == scan, (stem, d)

    # a request the truncated artifact cannot serve (wider window)
    # replaces it with a full build
    fuzzy_index_build(spark, st4, max_dist=2, prefix_length=None)
    _, meta_full_again = _artifact_rows(spark, root4)
    assert meta_full_again["prefix_length"] is None
