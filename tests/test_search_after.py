"""Cursor pagination (search_index ``after`` — Lucene searchAfter):
pages must concatenate to the single-query ranking EXACTLY, including
across exact-float score ties (duplicate docs), for every scoring path
(AND/BMW, OR/MaxScore, msm, phrase, wildcard groups)."""

from __future__ import annotations

import pandas as pd
import pytest

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.index import IndexStore
from fastcatsearch3_spark.operators.build import build_index
from fastcatsearch3_spark.operators.ingest import normalize_corpus
from fastcatsearch3_spark.plans.search import search_index

# duplicate contents force EXACT float score ties — the hard case for a
# cursor (tie resolution is global doc_id order, invisible to a shard)
ROWS = [
    (1, "spark merge table fast scan"),
    (2, "spark merge table fast scan"),
    (3, "spark merge table fast scan"),
    (4, "slow merge line table query spark"),
    (5, "merge merge merge stable spark"),
    (6, "spark slow value tables window merge"),
    (7, "query window scan merge spark table"),
    (8, "query window scan merge spark table"),
    (9, "spark merge big part column"),
    (10, "merge spark data row group line"),
]


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in ROWS],
            "text": [r[1] for r in ROWS],
            "lang": "en",
            "source": "s",
            "n_chars": [len(r[1]) for r in ROWS],
        }
    )
    corpus = normalize_corpus(spark.createDataFrame(pdf))
    root = str(tmp_path_factory.mktemp("after_idx"))
    build_index(
        spark, corpus, root, EngineConfig(num_shards=4, store_positions=True)
    )
    return IndexStore(root)


def _paginate(spark, store, query, page, total):
    """Collect `total` results in pages of `page` via the cursor."""
    out = []
    cursor = None
    while len(out) < total:
        got = search_index(
            spark, store, query, k=page, after=cursor
        ).collect()
        if not got:
            break
        out.extend((r["doc_id"], r["score"]) for r in got)
        cursor = (got[-1]["score"], got[-1]["doc_id"])
    return out


@pytest.mark.parametrize(
    "query",
    [
        "spark merge",  # AND / BMW intersection, heavy exact ties
        "spark OR window",  # OR / MaxScore (unlimited under cursor)
        "spark merge table ~2",  # msm (TAAT)
        '"spark merge"',  # phrase (positions)
        "s?ark* merge",  # wildcard group
    ],
)
def test_pages_concatenate_to_full_ranking(spark, store, query):
    full = [
        (r["doc_id"], r["score"])
        for r in search_index(spark, store, query, k=10).collect()
    ]
    assert len(full) >= 3, "fixture must match enough docs"
    for page in (1, 2, 3):
        paged = _paginate(spark, store, query, page, len(full))
        assert paged == full, (query, page)


def test_cursor_mid_tie_run(spark, store):
    """A cursor pointing INSIDE a run of exact-equal scores must resume
    at the next doc_id of that run."""
    full = search_index(spark, store, "spark merge", k=10).collect()
    scores = [r["score"] for r in full]
    # find a tie run (duplicate docs guarantee one)
    tie_at = next(
        i for i in range(len(scores) - 1) if scores[i] == scores[i + 1]
    )
    cur = (full[tie_at]["score"], full[tie_at]["doc_id"])
    nxt = search_index(spark, store, "spark merge", k=3, after=cur).collect()
    want = [(r["doc_id"], r["score"]) for r in full[tie_at + 1 : tie_at + 4]]
    assert [(r["doc_id"], r["score"]) for r in nxt] == want


def test_after_past_the_end_is_empty(spark, store):
    full = search_index(spark, store, "spark merge", k=10).collect()
    last = (full[-1]["score"], full[-1]["doc_id"])
    # drain whatever ranks below the last of the first page — then the
    # cursor at the true final hit must return nothing
    rest = _paginate(spark, store, "spark merge", 5, 10_000)
    tail = (rest[-1][1], rest[-1][0]) if rest else last
    got = search_index(spark, store, "spark merge", k=5, after=tail)
    assert got.count() == 0


def test_after_offset_mutually_exclusive(spark, store):
    with pytest.raises(ValueError, match="mutually exclusive"):
        search_index(
            spark, store, "spark merge", k=3, offset=2, after=(1.0, 1)
        )
