"""Deterministic rule-shaped corpus generator (FIXTURES.md B1).

Produces the BASELINE.json input_hint table
(repo, path, commit, lang, content) as code-like text: camelCase /
snake_case identifiers composed from a fixed vocabulary, Zipfian term
draws (so hot terms create real merge skew, exercising I-6), and a CJK
span in ~10% of docs (exercising F-3). Seeded — no wall clock, no
external data. Used by unit tests, rank-identity fixtures and bench.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_WORDS = [
    # 120 code-ish stems; Zipf rank order
    "index", "merge", "segment", "parse", "buffer", "query", "score", "term",
    "doc", "shard", "block", "byte", "hash", "join", "scan", "sort", "read",
    "write", "open", "close", "flush", "cache", "batch", "stream", "token",
    "field", "group", "filter", "range", "match", "boost", "limit", "page",
    "count", "stat", "meta", "node", "job", "task", "pool", "lock", "sync",
    "async", "retry", "error", "warn", "info", "debug", "trace", "config",
    "schema", "table", "column", "row", "value", "key", "map", "list", "set",
    "tree", "heap", "stack", "queue", "graph", "path", "file", "dir", "disk",
    "memory", "cpu", "net", "http", "json", "xml", "yaml", "proto", "codec",
    "encode", "decode", "pack", "unpack", "split", "concat", "slice", "copy",
    "move", "swap", "init", "start", "stop", "run", "exec", "eval", "test",
    "mock", "stub", "bench", "perf", "prof", "trace2", "log", "audit", "auth",
    "user", "admin", "client", "server", "master", "worker", "agent", "proxy",
    "router", "handler", "service", "module", "plugin", "driver", "engine",
    "kernel", "core", "util", "helper", "factory", "builder",
]

_CJK_POOL = list("검색엔진색인분석질의점수문서한국어처리형태소가나다라마바사아자차카타파하上海高速道路日本語解析器インデックス")

_EXTS = {"py": "py", "java": "java", "scala": "scala", "md": "md"}


def _zipf_probs(n: int, s: float = 1.1) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = 1.0 / ranks**s
    return p / p.sum()


def gen_corpus(n_docs: int, seed: int = 42, cjk_frac: float = 0.10) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    probs = _zipf_probs(len(_WORDS))
    exts = list(_EXTS)
    rows = []
    for i in range(n_docs):
        n_tokens = int(rng.integers(20, 220))
        words = rng.choice(_WORDS, size=n_tokens, p=probs)
        parts = []
        j = 0
        while j < len(words):
            style = rng.integers(0, 5)
            if style == 0 and j + 1 < len(words):  # camelCase pair
                parts.append(words[j] + words[j + 1].capitalize())
                j += 2
            elif style == 1 and j + 1 < len(words):  # snake_case pair
                parts.append(words[j] + "_" + words[j + 1])
                j += 2
            elif style == 2:
                parts.append(words[j] + "(")
                j += 1
            else:
                parts.append(words[j])
                j += 1
        if rng.random() < cjk_frac:
            span = "".join(rng.choice(_CJK_POOL, size=int(rng.integers(2, 12))))
            parts.insert(int(rng.integers(0, len(parts))), span)
        content = " ".join(parts)
        ext = exts[int(rng.integers(0, len(exts)))]
        repo = f"org{i % 7}/repo{i % 53}"
        path = f"src/pkg{i % 13}/{_WORDS[i % len(_WORDS)]}{i}.{ext}"
        commit = hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()
        rows.append((repo, path, commit, _EXTS[ext], content))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def gen_corpus_delta(base_n: int, seed: int = 43):
    """Incremental fixtures (FIXTURES.md B5): 50 new docs, 20 updates of
    existing (same repo+path, new commit), 10 tombstone doc keys."""
    new = gen_corpus(50, seed=seed)
    new["path"] = "inc/" + new["path"]  # distinct pk from every base doc
    base = gen_corpus(base_n, seed=42)
    upd = base.iloc[:20].copy()
    upd["commit"] = [
        hashlib.sha1(f"{seed}:upd:{i}".encode()).hexdigest() for i in range(20)
    ]
    upd["content"] = upd["content"] + " updatedContent new_revision"
    tomb = base.iloc[20:30][["repo", "path", "commit"]].copy()
    return new, upd, tomb


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    out = sys.argv[2] if len(sys.argv) > 2 else "fixtures/corpus_small.parquet"
    # small row groups keep the file splittable → parallel scans
    gen_corpus(n).to_parquet(out, index=False, row_group_size=8192)
    print(f"wrote {n} docs to {out}")
