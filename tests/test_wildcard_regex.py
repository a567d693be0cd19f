"""General wildcard (``d?ta*``) and regex (``/d.ta/``) term queries:
parser placeholders + lexicon expansion into synonym-style groups (the
Lucene MultiTermQuery family — WildcardQuery / RegexpQuery — beyond the
trailing-``*`` prefix fast path that landed in r1). End-to-end rank
identity is covered by the ``bm25_wildcard`` / ``bm25_regex`` driver
oracles; these tests pin the parser/expansion contract and the
single-vs-batch path parity."""

from __future__ import annotations

import pandas as pd
import pytest

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.plans.query import parse_query, placeholder_kind

CFG = EngineConfig()


# ---------------------------------------------------------------- parser


def test_wildcard_placeholder_and_groups():
    pq = parse_query("t?ble merge", CFG)
    assert pq.terms == ["t?ble", "merge"]
    assert pq.groups == [(0,), (1,)]
    assert pq.op == "AND"


def test_wildcard_is_lowercased_like_the_analyzer():
    assert parse_query("T?bLe merge", CFG).terms == ["t?ble", "merge"]


def test_interior_and_multi_star_are_wildcards_not_prefixes():
    assert placeholder_kind("d*ta") == "wildcard"
    assert placeholder_kind("da*ta*") == "wildcard"
    assert placeholder_kind("da*") == "prefix"
    assert placeholder_kind("d?ta*") == "wildcard"


def test_regex_placeholder():
    pq = parse_query("/t.ble/ merge", CFG)
    assert pq.terms == ["/t.ble/", "merge"]
    assert placeholder_kind("/t.ble/") == "regex"


def test_field_qualified_wildcard_and_regex():
    cfg = EngineConfig(indexed_fields=("content", "repo"))
    assert parse_query("repo:sp?rk merge", cfg).terms == [
        "repo:sp?rk",
        "merge",
    ]
    assert parse_query("repo:/sp.rk/ merge", cfg).terms == [
        "repo:/sp.rk/",
        "merge",
    ]
    with pytest.raises(ValueError, match="unknown search field"):
        parse_query("nofield:sp?rk", cfg)
    with pytest.raises(ValueError, match="unknown search field"):
        parse_query("nofield:/sp.rk/", cfg)


def test_wildcard_regex_rejected_in_not_clause():
    with pytest.raises(ValueError, match="NOT"):
        parse_query("merge -t?ble", CFG)
    with pytest.raises(ValueError, match="NOT"):
        parse_query("merge -/t.ble/", CFG)


def test_wildcard_without_literal_raises():
    with pytest.raises(ValueError, match="no literal"):
        parse_query("?* merge", CFG)
    with pytest.raises(ValueError, match="no literal"):
        parse_query("** merge", CFG)


def test_wildcard_fuzzy_combination_raises():
    with pytest.raises(ValueError, match="wildcard and fuzzy"):
        parse_query("d?ta~2 merge", CFG)


def test_bad_regex_raises():
    with pytest.raises(ValueError, match="bad regex"):
        parse_query("/[unclosed/ merge", CFG)


def test_tree_mode_accepts_wildcard_and_regex_leaves():
    pq = parse_query("(t?ble OR /h.sh/) merge", CFG)
    assert pq.tree is not None
    assert set(pq.terms) == {"t?ble", "/h.sh/", "merge"}


# ------------------------------------------------- regex→prefix pushdown


def test_wildcard_to_regex_translation():
    from fastcatsearch3_spark.plans.search import _wildcard_to_regex

    rx, lead = _wildcard_to_regex("d?ta*")
    assert rx == "d.ta.*"
    assert lead == "d"
    rx, lead = _wildcard_to_regex("data*x")
    assert lead == "data"
    # regex metachars in the literal portion are escaped
    rx, _ = _wildcard_to_regex("a.b*")
    assert rx == "a\\.b.*"


def test_regex_literal_prefix_is_conservative():
    from fastcatsearch3_spark.plans.search import _regex_literal_prefix

    assert _regex_literal_prefix("data.*") == "data"
    # a quantifier makes the previous char optional/repeatable
    assert _regex_literal_prefix("dat?a") == "da"
    assert _regex_literal_prefix("dat*a") == "da"
    assert _regex_literal_prefix("dat{0,2}") == "da"
    # '+' keeps the previous char (at least one occurrence)
    assert _regex_literal_prefix("dat+a") == "dat"
    # top-level alternation voids any leading literal
    assert _regex_literal_prefix("ab|cd") == ""
    assert _regex_literal_prefix("^data") == ""


# ------------------------------------------------------------ end-to-end


def _mini_index(spark, tmp_path, rows):
    from fastcatsearch3_spark.index import IndexStore
    from fastcatsearch3_spark.operators.build import build_index
    from fastcatsearch3_spark.operators.ingest import normalize_corpus

    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "src1",
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    corpus = normalize_corpus(spark.createDataFrame(pdf))
    cfg = EngineConfig(num_shards=2)
    root = str(tmp_path / "idx")
    build_index(spark, corpus, root, cfg)
    return IndexStore(root), corpus, cfg


ROWS = [
    (1, "spark merge table"),
    (2, "slow merge line table"),
    (3, "merge merge merge stable"),
    (4, "spark slow value tables"),
]


def test_wildcard_expansion_end_to_end(spark, tmp_path):
    """"t?ble" expands to exactly {table} here (NOT stable/tables — '?'
    is one char and the match is whole-term), so ranking must equal the
    literal query "table merge"."""
    from fastcatsearch3_spark.plans.search import search_index

    store, _, _ = _mini_index(spark, tmp_path, ROWS)
    got = search_index(spark, store, "t?ble merge", k=10).toPandas()
    want = search_index(spark, store, "table merge", k=10).toPandas()
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert got["score"].to_numpy() == pytest.approx(
        want["score"].to_numpy(), abs=1e-9
    )


def test_wildcard_group_semantics_match_oracle(spark, tmp_path):
    """"*able*" (leading + trailing) expands to {table, stable, tables} as
    ONE group AND'd with merge; engine scores == exhaustive oracle with
    explicit groups."""
    from fastcatsearch3_spark.plans.search import search_index
    from tests.oracle import bm25_topk_oracle

    store, corpus, cfg = _mini_index(spark, tmp_path, ROWS)
    got = search_index(spark, store, "*able* merge", k=10).toPandas()
    sdf = corpus.select("doc_id", "content").toPandas()
    exp = bm25_topk_oracle(
        sdf,
        ["table", "stable", "tables", "merge"],
        k=10,
        op="AND",
        cfg=cfg,
        groups=[0, 0, 0, 1],
    )
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert got["score"].to_numpy() == pytest.approx(
        exp["score"].to_numpy(), abs=1e-6
    )


def test_regex_expansion_end_to_end(spark, tmp_path):
    """"/tables?/" expands to {table, tables} (full match; 'stable' does
    not match because the pattern is anchored), one group AND merge."""
    from fastcatsearch3_spark.plans.search import search_index
    from tests.oracle import bm25_topk_oracle

    store, corpus, cfg = _mini_index(spark, tmp_path, ROWS)
    got = search_index(spark, store, "/tables?/ merge", k=10).toPandas()
    sdf = corpus.select("doc_id", "content").toPandas()
    exp = bm25_topk_oracle(
        sdf,
        ["table", "tables", "merge"],
        k=10,
        op="AND",
        cfg=cfg,
        groups=[0, 0, 1],
    )
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert got["score"].to_numpy() == pytest.approx(
        exp["score"].to_numpy(), abs=1e-6
    )


def test_wildcard_no_match_returns_empty(spark, tmp_path):
    from fastcatsearch3_spark.plans.search import search_index

    store, _, _ = _mini_index(spark, tmp_path, ROWS)
    got = search_index(spark, store, "zz?zz merge", k=10).toPandas()
    assert len(got) == 0


def test_batch_path_parity(spark, tmp_path):
    """search_many must expand wildcard/regex placeholders identically to
    the single-query path (same _expand_prefixes entry)."""
    from fastcatsearch3_spark.plans.search import search_index, search_many

    store, _, _ = _mini_index(spark, tmp_path, ROWS)
    queries = {"wc": "*able* merge", "rx": "/tables?/ merge"}
    batch = (
        search_many(spark, store, queries, k=10)
        .toPandas()
        .sort_values(["query_id", "score", "doc_id"], ascending=[True, False, True])
    )
    for qid, text in queries.items():
        single = search_index(spark, store, text, k=10).toPandas()
        part = batch[batch["query_id"] == qid]
        assert list(part["doc_id"]) == list(single["doc_id"])
        assert part["score"].to_numpy() == pytest.approx(
            single["score"].to_numpy(), abs=1e-9
        )


# --------------------------------------------- review-finding regressions


def test_regex_with_colon_or_group_classifies_as_regex():
    """Review finding #1: a regex payload containing ':' (e.g. a
    non-capturing group) must classify as 'regex', never leak into the
    wildcard/field split (which silently matched nothing)."""
    assert placeholder_kind("/(?:sl|r)ow/") == "regex"
    assert placeholder_kind("/a:b/") == "regex"
    assert placeholder_kind("repo:/a:b/") == "regex"


def test_regex_group_pattern_end_to_end(spark, tmp_path):
    """A directly-constructed ParsedQuery carrying '/(?:tables?|stable)/'
    (parens can't ride the text grammar) must expand to
    {table, tables, stable} as one group — the same result as the
    equivalent wildcard query."""
    from fastcatsearch3_spark.plans.query import ParsedQuery
    from fastcatsearch3_spark.plans.search import search_index

    store, _, _ = _mini_index(spark, tmp_path, ROWS)
    pq = ParsedQuery(
        terms=["/(?:tables?|stable)/", "merge"],
        op="AND",
        groups=[(0,), (1,)],
    )
    got = search_index(spark, store, pq, k=10).toPandas()
    want = search_index(spark, store, "*able* merge", k=10).toPandas()
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert got["score"].to_numpy() == pytest.approx(
        want["score"].to_numpy(), abs=1e-9
    )


def test_python_only_regex_raises_clean_valueerror(spark, tmp_path):
    """Review finding #4: a Python-only construct ((?P<name>...)) passes
    parse-time validation but must surface as a clean ValueError at
    expansion, not a raw JVM PatternSyntaxException traceback."""
    from fastcatsearch3_spark.plans.query import ParsedQuery
    from fastcatsearch3_spark.plans.search import search_index

    store, _, _ = _mini_index(spark, tmp_path, ROWS)
    pq = ParsedQuery(
        terms=["/(?P<g>tab)le/", "merge"], op="AND", groups=[(0,), (1,)]
    )
    with pytest.raises(ValueError, match="JVM regex"):
        search_index(spark, store, pq, k=10).collect()


def test_unqualified_prefix_does_not_leak_field_namespace(spark, tmp_path):
    """Review finding #3: 'r*' on a multi-field index must expand to
    content terms only ({row} here), never 'repo:…' keys — on BOTH the
    arrow probe and the Spark fallback."""
    from fastcatsearch3_spark.index import IndexStore
    from fastcatsearch3_spark.operators.build import build_index
    from fastcatsearch3_spark.operators.ingest import normalize_corpus
    from fastcatsearch3_spark.plans.search import search_index

    rows = [
        (1, "row merge table"),
        (2, "row merge line"),
        (3, "merge merge value"),
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": "repoalpha",  # source→repo; indexes "repo:repoalpha"
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    corpus = normalize_corpus(spark.createDataFrame(pdf))
    cfg = EngineConfig(num_shards=2, indexed_fields=("content", "repo"))
    root = str(tmp_path / "idx")
    build_index(spark, corpus, root, cfg)
    store = IndexStore(root)
    # sanity: the leak candidate exists in the lexicon
    lex_terms = {r["term"] for r in store.lexicon(spark).collect()}
    assert "repo:repoalpha" in lex_terms and "row" in lex_terms

    want = search_index(spark, store, "row merge", k=10).toPandas()
    got = search_index(spark, store, "r* merge", k=10).toPandas()
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert got["score"].to_numpy() == pytest.approx(
        want["score"].to_numpy(), abs=1e-9
    )

    # Spark fallback path (arrow probe disabled) must agree
    store2 = IndexStore(root)
    store2.prefix_df_arrow = lambda *a, **k: None
    got2 = search_index(spark, store2, "r* merge", k=10).toPandas()
    assert list(got2["doc_id"]) == list(want["doc_id"])
    assert got2["score"].to_numpy() == pytest.approx(
        want["score"].to_numpy(), abs=1e-9
    )


def test_wildcard_translation_matches_fnmatch_property():
    """Property: the wildcard→regex translation agrees with Python's
    fnmatch semantics for '*' and '?' over random patterns/candidates
    (no char-class support on either side here)."""
    import fnmatch
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fastcatsearch3_spark.plans.search import _wildcard_to_regex

    alphabet = "abc*?"

    @settings(max_examples=300, deadline=None)
    @given(
        pat=st.text(alphabet=alphabet, min_size=1, max_size=8),
        cand=st.text(alphabet="abc", max_size=8),
    )
    def check(pat, cand):
        rx, lead = _wildcard_to_regex(pat)
        got = re.fullmatch(f"(?:{rx})", cand) is not None
        want = fnmatch.fnmatchcase(cand, pat)
        assert got == want, (pat, cand, got, want)
        # the literal lead is sound: any match must start with it
        if want and lead:
            assert cand.startswith(lead)

    check()


def test_tree_mode_not_wildcard(spark, tmp_path):
    """Tree mode allows placeholders under NOT (expansion rewrites the
    leaf to OR(expansions) inside the NOT): '(merge NOT t?ble)' must
    equal '(merge NOT table)' here."""
    from fastcatsearch3_spark.plans.search import search_index

    store, _, _ = _mini_index(spark, tmp_path, ROWS)
    got = search_index(spark, store, "(merge NOT t?ble)", k=10).toPandas()
    want = search_index(spark, store, "(merge NOT table)", k=10).toPandas()
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert got["score"].to_numpy() == pytest.approx(
        want["score"].to_numpy(), abs=1e-9
    )
