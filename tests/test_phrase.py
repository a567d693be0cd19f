"""Positional postings + phrase queries (SURVEY.md J-5).

Layers: positions codec round-trip (property), phrase kernel vs an
independent pandas re-implementation (rank-identity incl. completeness),
and compaction preserving positions byte-exactly.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.functions.vbyte import (
    decode_positions_blob,
    encode_positions_blob,
    split_positions_bytes,
    vbyte_encode,
)
from fastcatsearch3_spark.index import IndexStore
from fastcatsearch3_spark.operators import build as B
from fastcatsearch3_spark.operators.ingest import load_documents
from fastcatsearch3_spark.plans.query import parse_query
from fastcatsearch3_spark.plans.search import search_index

CFG = EngineConfig(num_shards=4, store_positions=True)
SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------

def _encode_entry(positions: np.ndarray) -> bytes:
    d = positions.astype(np.int64).copy()
    d[1:] -= positions[:-1]
    return vbyte_encode(d.astype(np.uint64)).tobytes()


@pytest.mark.parametrize("seed", range(5))
def test_positions_blob_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n_entries = int(rng.integers(1, 400))
    entries = []
    for _ in range(n_entries):
        tf = int(rng.integers(1, 12))
        pos = np.sort(
            rng.choice(np.arange(0, 5000), size=tf, replace=False)
        ).astype(np.int64)
        entries.append(pos)
    tfs = np.array([e.size for e in entries], dtype=np.uint64)
    entry_bytes = np.array([_encode_entry(e) for e in entries], dtype=object)
    blob = encode_positions_blob(entry_bytes, block_size=64)

    flat, starts = decode_positions_blob(blob, tfs)
    want = np.concatenate(entries)
    assert flat.astype(np.int64).tolist() == want.tolist()
    assert starts.tolist() == np.concatenate(
        ([0], np.cumsum(tfs.astype(np.int64))[:-1])
    ).tolist()

    back = split_positions_bytes(blob, tfs)
    assert back == [bytes(b) for b in entry_bytes]


# ---------------------------------------------------------------------------
# end-to-end
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pos_index"))
    B.build_index(spark, load_documents(spark, SF), root, CFG)
    return IndexStore(root)


@pytest.fixture(scope="module")
def docs_pd(spark):
    return load_documents(spark, SF).select("doc_id", "content").toPandas()


def _phrase_docs(docs_pd: pd.DataFrame, phrase: list[str]) -> set[int]:
    out = set()
    for _, r in docs_pd.iterrows():
        t = re.findall(r"[a-z0-9]+", str(r["content"]).lower())
        for i in range(len(t) - len(phrase) + 1):
            if t[i : i + len(phrase)] == phrase:
                out.add(int(r["doc_id"]))
                break
    return out


@pytest.mark.parametrize("qtext,phrase", [
    ('"table value"', ["table", "value"]),
    ('"key agg row"', ["key", "agg", "row"]),
])
def test_phrase_rank_identical(spark, store, docs_pd, qtext, phrase):
    pq = parse_query(qtext, CFG)
    assert pq.phrases == [phrase]
    got = search_index(spark, store, pq, k=10).toPandas()

    want_docs = _phrase_docs(docs_pd, phrase)
    # expected = AND search over the same terms restricted to phrase docs
    and_hits = search_index(
        spark, store, parse_query(" ".join(phrase), CFG), k=10_000
    ).toPandas()
    expect = and_hits[and_hits["doc_id"].isin(want_docs)].head(10)
    assert got["doc_id"].tolist() == expect["doc_id"].tolist()
    np.testing.assert_allclose(
        got["score"].to_numpy(), expect["score"].to_numpy(), atol=1e-9
    )


def test_phrase_completeness_vs_bruteforce(spark, store, docs_pd):
    """Every phrase doc (not just top-k) must be retrievable."""
    phrase = ["table", "value"]
    got = search_index(spark, store, parse_query('"table value"', CFG), k=10_000).toPandas()
    assert set(got["doc_id"]) == _phrase_docs(docs_pd, phrase)


def test_phrase_requires_positions(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nopos_index"))
    cfg = EngineConfig(num_shards=2)
    B.build_index(spark, load_documents(spark, SF), root, cfg)
    with pytest.raises(ValueError, match="store_positions"):
        search_index(
            spark, IndexStore(root), parse_query('"table value"', cfg), k=5
        ).collect()


def test_compact_preserves_positions(spark, store, docs_pd, tmp_path_factory):
    """Compaction must carry the positions sidecar through the re-pack
    (byte-reuse path) — phrase results identical after compact."""
    import shutil

    from fastcatsearch3_spark.streaming.incremental import compact

    root2 = str(tmp_path_factory.mktemp("pos_compact"))
    shutil.rmtree(root2)
    shutil.copytree(store.root, root2)
    compact(spark, root2, CFG)
    before = search_index(
        spark, store, parse_query('"table value"', CFG), k=20
    ).toPandas()
    after = search_index(
        spark, IndexStore(root2), parse_query('"table value"', CFG), k=20
    ).toPandas()
    assert before["doc_id"].tolist() == after["doc_id"].tolist()
    np.testing.assert_allclose(
        before["score"].to_numpy(), after["score"].to_numpy(), atol=1e-9
    )


def test_proximity_slop(spark, tmp_path):
    """'"a c"~1' matches "a b c" (gap 2) and "a c" (gap 1) but not
    "a x y c" (gap 3); slop=0 matches only the adjacent form."""
    import pandas as pd

    from fastcatsearch3_spark.config import EngineConfig
    from fastcatsearch3_spark.index import IndexStore
    from fastcatsearch3_spark.operators.build import build_index
    from fastcatsearch3_spark.operators.ingest import normalize_corpus
    from fastcatsearch3_spark.plans.query import parse_query
    from fastcatsearch3_spark.plans.search import search_index

    rows = [
        (1, "alpha charlie end"),          # adjacent
        (2, "alpha bravo charlie end"),    # gap 2
        (3, "alpha x1 x2 charlie end"),    # gap 3
        (4, "charlie alpha end"),          # reversed, gap 1
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "s",
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    cfg = EngineConfig(num_shards=2, store_positions=True)
    root = str(tmp_path / "idx")
    build_index(spark, normalize_corpus(spark.createDataFrame(pdf)), root, cfg)
    store = IndexStore(root)

    pq = parse_query('"alpha charlie"~1', cfg)
    assert pq.phrases == [["alpha", "charlie"]] and pq.phrase_slops == [1]

    # slop=1 window [1-1, 1+1] = [0, 2]: adjacent (d=1) and gap-2 (d=2);
    # the reversed doc has d=-1 and needs slop >= 2
    got1 = {r["doc_id"] for r in search_index(spark, store, '"alpha charlie"~1', k=10).collect()}
    assert got1 == {1, 2}

    got0 = {r["doc_id"] for r in search_index(spark, store, '"alpha charlie"', k=10).collect()}
    assert got0 == {1}

    # slop=2 window [-1, 3]: adds the gap-3 doc AND the reversed doc
    got2 = {r["doc_id"] for r in search_index(spark, store, '"alpha charlie"~2', k=10).collect()}
    assert got2 == {1, 2, 3, 4}


def _proximity_docs(docs_pd: pd.DataFrame, phrase: list[str], slop: int) -> set[int]:
    """Brute-force ordered-window check: doc matches iff some anchor s
    (may hang off the doc start) has term j at a position in
    [s+j, s+j+slop] for every j."""
    out = set()
    n = len(phrase)
    for _, r in docs_pd.iterrows():
        t = re.findall(r"[a-z0-9]+", str(r["content"]).lower())
        for s in range(-slop, len(t)):
            ok = True
            for j in range(n):
                lo, hi = max(0, s + j), min(len(t) - 1, s + j + slop)
                if not any(t[p] == phrase[j] for p in range(lo, hi + 1)):
                    ok = False
                    break
            if ok:
                out.add(int(r["doc_id"]))
                break
    return out


@pytest.mark.parametrize("qtext,phrase,slop", [
    ('"table value"~1', ["table", "value"], 1),
    ('"table value"~2', ["table", "value"], 2),
    ('"key agg row"~1', ["key", "agg", "row"], 1),
])
def test_proximity_matches_bruteforce(spark, store, docs_pd, qtext, phrase, slop):
    pq = parse_query(qtext, CFG)
    assert pq.phrases == [phrase] and pq.phrase_slops == [slop]
    got = set(
        search_index(spark, store, pq, k=10_000).toPandas()["doc_id"]
    )
    want_prox = _proximity_docs(docs_pd, phrase, slop)
    # engine result = AND(terms) ∩ proximity docs
    and_docs = set(
        search_index(
            spark, store, parse_query(" ".join(phrase), CFG), k=10_000
        ).toPandas()["doc_id"]
    )
    assert got == (want_prox & and_docs)


# ---------------------------------------------------------------------------
# phrase under OR semantics ('"a b" OR c': the phrase is ONE optional
# SHOULD clause — presence-gated scoring of its member terms)
# ---------------------------------------------------------------------------

def test_parse_phrase_or_marks_phrase_only_terms():
    cfg = EngineConfig()
    pq = parse_query('"table hash" OR vector', cfg)
    assert pq.op == "OR"
    assert pq.phrases == [["table", "hash"]]
    assert pq.terms == ["table", "hash", "vector"]
    assert pq.phrase_only_terms == ["table", "hash"]
    # a phrase member that ALSO appears as a free word is not phrase-only
    pq2 = parse_query('"table hash" OR table', cfg)
    assert pq2.phrase_only_terms == ["hash"]
    # under AND nothing changes semantically, but the field is still filled
    pq3 = parse_query('"table hash" vector', cfg)
    assert pq3.op == "AND"
    assert pq3.phrase_only_terms == ["table", "hash"]


def _or_phrase_store(spark, tmp_path):
    from fastcatsearch3_spark.operators.ingest import normalize_corpus

    rows = [
        (1, "alpha charlie end"),        # phrase matches
        (2, "charlie alpha delta end"),  # members NOT adjacent + free term
        (3, "delta end"),                # free term only
        (4, "omega end"),                # no clause at all
        (5, "alpha end"),                # lone phrase member → no match
        (6, "alpha charlie delta end"),  # phrase AND free term
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "s",
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    cfg = EngineConfig(num_shards=2, store_positions=True)
    root = str(tmp_path / "orph_idx")
    B.build_index(spark, normalize_corpus(spark.createDataFrame(pdf)), root, cfg)
    return IndexStore(root), cfg, pdf


def test_phrase_or_pinned_ranking(spark, tmp_path):
    from tests.oracle import bm25_topk_oracle

    store, cfg, pdf = _or_phrase_store(spark, tmp_path)
    docs = pdf.rename(columns={"text": "content"})[["doc_id", "content"]]

    pq = parse_query('"alpha charlie" OR delta', cfg)
    got = (
        search_index(spark, store, pq, k=10)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert set(got["doc_id"]) == {1, 2, 3, 6}

    # expected score = (phrase matched ? bm25(alpha)+bm25(charlie) : 0)
    #                + (delta present ? bm25(delta) : 0), per doc
    per_term = {
        t: dict(
            bm25_topk_oracle(docs, [t], k=100, op="OR", cfg=cfg)
            .itertuples(index=False, name=None)
        )
        for t in ("alpha", "charlie", "delta")
    }
    expect = {
        1: per_term["alpha"][1] + per_term["charlie"][1],
        2: per_term["delta"][2],
        3: per_term["delta"][3],
        6: per_term["alpha"][6] + per_term["charlie"][6] + per_term["delta"][6],
    }
    got_map = dict(zip(got["doc_id"], got["score"]))
    for did, s in expect.items():
        np.testing.assert_allclose(got_map[did], s, atol=1e-9)


def test_phrase_or_proximity_clause(spark, tmp_path):
    """'"alpha charlie"~2 OR delta': slop widens the phrase clause only."""
    store, cfg, _ = _or_phrase_store(spark, tmp_path)
    got = {
        r["doc_id"]
        for r in search_index(
            spark, store, parse_query('"alpha charlie"~2 OR delta', cfg), k=10
        ).collect()
    }
    # slop 2 admits doc 2's reversed "charlie alpha" (d=-1 ∈ [-1, 3]) —
    # doc 2 now matches BOTH clauses; doc 5 still matches neither
    assert got == {1, 2, 3, 6}


def test_phrase_or_corpus_vs_bruteforce(spark, store, docs_pd):
    """'"table value" OR agg' on the sf0.001 corpus: match set and scores
    vs an independent pandas composition of per-clause oracles."""
    from tests.oracle import bm25_topk_oracle

    pq = parse_query('"table value" OR agg', CFG)
    assert pq.phrase_only_terms == ["table", "value"]
    got = search_index(spark, store, pq, k=10_000).toPandas()

    phrase_docs = _phrase_docs(docs_pd, ["table", "value"])
    docs = docs_pd[["doc_id", "content"]]
    per_term = {
        t: dict(
            bm25_topk_oracle(docs, [t], k=10_000_000, op="OR", cfg=CFG)
            .itertuples(index=False, name=None)
        )
        for t in ("table", "value", "agg")
    }
    expect: dict[int, float] = {}
    for did in set(per_term["agg"]) | phrase_docs:
        s = 0.0
        if did in phrase_docs:
            s += per_term["table"][did] + per_term["value"][did]
        s += per_term["agg"].get(did, 0.0)
        expect[did] = s
    assert set(got["doc_id"]) == set(expect)
    got_map = dict(zip(got["doc_id"], got["score"]))
    for did, s in expect.items():
        np.testing.assert_allclose(got_map[did], s, atol=1e-9)


def test_phrase_or_batch_matches_single(spark, store):
    """The batch kernel scores '"a b" OR c' identically to search_index."""
    from fastcatsearch3_spark.plans.search import search_many

    q = '"table value" OR agg'
    single = search_index(spark, store, parse_query(q, CFG), k=10).toPandas()
    batch = search_many(
        spark, store, {"p_or": q, "q_and": "table value"}, k=10
    ).toPandas()
    b = batch[batch["query_id"] == "p_or"].reset_index(drop=True)
    assert b["doc_id"].tolist() == single["doc_id"].tolist()
    np.testing.assert_allclose(
        b["score"].to_numpy(), single["score"].to_numpy(), atol=1e-9
    )


def test_phrase_or_synonym_group(spark, tmp_path):
    """'"alpha charlie" OR delta' with delta→omega synonyms (r4, SURVEY
    §12.1): the synonym group {delta, omega} is ONE SHOULD clause beside
    the phrase clause — any member's presence matches the group, every
    present member scores, and the phrase members stay presence-gated."""
    from tests.oracle import bm25_topk_oracle

    store, cfg, pdf = _or_phrase_store(spark, tmp_path)
    docs = pdf.rename(columns={"text": "content"})[["doc_id", "content"]]

    pq = parse_query(
        '"alpha charlie" OR delta', cfg, synonyms={"delta": ["omega"]}
    )
    assert pq.groups is not None and pq.phrases == [["alpha", "charlie"]]
    got = search_index(spark, store, pq, k=10).toPandas()
    # doc 4 ("omega end") now matches through the synonym group
    assert set(got["doc_id"]) == {1, 2, 3, 4, 6}

    per_term = {
        t: dict(
            bm25_topk_oracle(docs, [t], k=100, op="OR", cfg=cfg)
            .itertuples(index=False, name=None)
        )
        for t in ("alpha", "charlie", "delta", "omega")
    }
    expect = {
        1: per_term["alpha"][1] + per_term["charlie"][1],
        2: per_term["delta"][2],
        3: per_term["delta"][3],
        4: per_term["omega"][4],
        6: per_term["alpha"][6]
        + per_term["charlie"][6]
        + per_term["delta"][6],
    }
    got_map = dict(zip(got["doc_id"], got["score"]))
    for did, s in expect.items():
        np.testing.assert_allclose(got_map[did], s, atol=1e-9)


def test_phrase_or_prefix_group_msm(spark, tmp_path):
    """'"alpha charlie" OR del* ~2': the lexicon-expanded prefix group and
    the phrase are the two SHOULD clauses; msm=2 keeps only docs matching
    BOTH (doc 6), not phrase-only (1) or prefix-only (2, 3) docs."""
    from tests.oracle import bm25_topk_oracle

    store, cfg, pdf = _or_phrase_store(spark, tmp_path)
    docs = pdf.rename(columns={"text": "content"})[["doc_id", "content"]]

    pq = parse_query('"alpha charlie" OR del* ~2', cfg)
    got = search_index(spark, store, pq, k=10).toPandas()
    assert set(got["doc_id"]) == {6}
    per_term = {
        t: dict(
            bm25_topk_oracle(docs, [t], k=100, op="OR", cfg=cfg)
            .itertuples(index=False, name=None)
        )
        for t in ("alpha", "charlie", "delta")
    }
    np.testing.assert_allclose(
        got["score"].iloc[0],
        per_term["alpha"][6] + per_term["charlie"][6] + per_term["delta"][6],
        atol=1e-9,
    )


def test_phrase_or_synonym_batch_matches_single(spark, tmp_path):
    """The batch kernel scores the synonym-group phrase-OR query
    identically to search_index (same clause algebra in search_many)."""
    from fastcatsearch3_spark.plans.search import search_many

    store, cfg, _ = _or_phrase_store(spark, tmp_path)
    pq = parse_query(
        '"alpha charlie" OR delta', cfg, synonyms={"delta": ["omega"]}
    )
    single = search_index(spark, store, pq, k=10).toPandas()
    batch = search_many(
        spark, store, {"syn_or": pq, "other": "delta"}, k=10
    ).toPandas()
    b = batch[batch["query_id"] == "syn_or"].reset_index(drop=True)
    assert b["doc_id"].tolist() == single["doc_id"].tolist()
    np.testing.assert_allclose(
        b["score"].to_numpy(), single["score"].to_numpy(), atol=1e-9
    )
