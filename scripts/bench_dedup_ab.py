"""Interleaved A/B benchmark: old-vs-new dedup pipeline (minhash / simhash).

Protocol (see BENCH/BASELINE.md methodology): this shared host shows
one-sided co-tenant noise of +-20-35%, so the two variants run ALTERNATELY
inside one warm pinned JVM (order flipping every rep, untimed warmup pass
first, cache cleared between runs); medians AND best-of are reported.
The 'old' variant is the dedup module extracted from a git ref (default:
the round-2 HEAD), the 'new' one is the working tree.

Usage:
  python scripts/bench_dedup_ab.py [--docs 5000] [--reps 3] [--cpus 8]
        [--old-ref 49954f5] [--corpus DIR]   # DIR: reuse existing parquet

Without --corpus, a deterministic near-dup corpus is generated (seed 7):
gen_corpus code-like text plus ~2% planted near-duplicates (90% token
overlap) — the workload shape MinHash exists for.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def gen_dedup_corpus(n_docs: int, out: Path, seed: int = 7,
                     dup_frac: float = 0.02, n_files: int = 16) -> None:
    import numpy as np
    import pandas as pd
    sys.path.insert(0, str(REPO))
    from fixtures.gen_corpus import gen_corpus

    n_orig = int(n_docs * (1 - dup_frac))
    pdf = gen_corpus(n_orig, seed=seed)
    texts = pdf["content"].tolist()
    rng = np.random.default_rng(seed + 1)
    # planted near-dups: copy an earlier doc, replace ~10% of tokens
    for i in range(n_docs - n_orig):
        src = texts[int(rng.integers(0, n_orig))]
        toks = src.split(" ")
        n_mut = max(1, len(toks) // 10)
        for j in rng.integers(0, len(toks), size=n_mut):
            toks[int(j)] = f"mut{int(rng.integers(0, 9999))}"
        texts.append(" ".join(toks))
    full = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    out.mkdir(parents=True, exist_ok=True)
    chunk = (len(full) + n_files - 1) // n_files
    for i in range(n_files):
        part = full.iloc[i * chunk:(i + 1) * chunk]
        if len(part):
            part.to_parquet(out / f"part-{i:04d}.parquet", index=False,
                            row_group_size=8192)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--old-ref", default="49954f5")
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--ops", default="minhash,simhash")
    args = ap.parse_args()

    old_src = subprocess.run(
        ["git", "show", f"{args.old_ref}:fastcatsearch3_spark/dataops/dedup.py"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout

    if args.corpus:
        corpus = args.corpus
    else:
        corpus = str(Path(tempfile.mkdtemp(prefix="dedup_ab_")) / "docs")
        print(f"generating {args.docs}-doc corpus -> {corpus}", flush=True)
        gen_dedup_corpus(args.docs, Path(corpus))

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    result = {"docs": args.docs, "cpus": args.cpus, "reps": args.reps,
              "old_ref": args.old_ref, "corpus": corpus, "ops": {}}
    for op in args.ops.split(","):
        cmd = [
            "taskset", "-c", f"0-{args.cpus - 1}",
            sys.executable, str(REPO / "scripts/_dedup_ab_worker.py"),
            op, corpus, str(args.cpus), str(args.reps),
        ]
        r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                           env=env, input=old_src)
        if r.returncode != 0:
            print(r.stdout[-2000:], r.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"{op} failed")
        raw = json.loads(r.stdout.strip().splitlines()[-1])
        result["ops"][op] = {
            v: {"runs": raw[v],
                "median": round(statistics.median(raw[v]), 2),
                "best": round(min(raw[v]), 2)}
            for v in ("old", "new")
        } | {"rows": raw["rows"]}
        print(f"{op}: old median {result['ops'][op]['old']['median']}s "
              f"new median {result['ops'][op]['new']['median']}s "
              f"rows={raw['rows']}", flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
