"""Golden-case tests for the analysis chain (SURVEY.md §5.2 layer 1)."""

from __future__ import annotations

import pandas as pd
import pytest

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.functions.analyzer import tokenize_series, tokenize_text

GOLDEN = [
    ("hello world", ["hello", "world"]),
    ("Hello, World!", ["hello", "world"]),
    ("parseIndexBuffer", ["parse", "index", "buffer"]),
    ("merge_segment_file", ["merge", "segment", "file"]),
    ("dotted.path.Name", ["dotted", "path", "name"]),
    ("HTTPServer", ["http", "server"]),
    ("sha256 0xDEADbeef", ["sha256", "0x", "dea", "dbeef"]),
    ("x = foo(bar, 12)", ["x", "foo", "bar", "12"]),
    ("", []),
    ("   \t\n ", []),
    # CJK runs → overlapping bigrams; isolated char → unigram
    ("한국어", ["한국", "국어"]),
    ("가", ["가"]),
    ("검색엔진 test", ["검색", "색엔", "엔진", "test"]),
    ("ab가나다cd", ["ab", "가나", "나다", "cd"]),
    ("日本語テスト", ["日本", "本語", "語テ", "テス", "スト"]),
    ("a가b", ["a", "가", "b"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_golden(text, expected):
    assert tokenize_text(text) == expected


def test_series_matches_scalar():
    texts = [t for t, _ in GOLDEN]
    out = tokenize_series(pd.Series(texts))
    for text, toks in zip(texts, out):
        assert toks == tokenize_text(text)


def test_stopwords_and_minlen():
    cfg = EngineConfig(stopwords=("the", "a"), min_token_len=2)
    assert tokenize_text("the a quick b fox", cfg) == ["quick", "fox"]


def test_emit_original_compound():
    cfg = EngineConfig(emit_original_compound=True)
    toks = tokenize_text("parseIndexBuffer plain", cfg)
    assert toks == ["parse", "index", "buffer", "plain", "parseindexbuffer"]


def test_whitespace_analyzer_matches_duckdb_semantics():
    cfg = EngineConfig(analyzer="whitespace")
    from fastcatsearch3_spark.functions.analyzer import ANALYZERS

    s = pd.Series(["the Fast KEY order", ""])
    out = ANALYZERS["whitespace"](s, cfg)
    assert out.iloc[0] == ["the", "fast", "key", "order"]
    assert out.iloc[1] == []


def test_null_safe():
    out = tokenize_series(pd.Series([None, "ok"]))
    assert out.iloc[0] == []
    assert out.iloc[1] == ["ok"]
