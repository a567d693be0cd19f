"""Interleaved A/B of the cold index-build path: a git ref vs working tree.

VERDICT r3 #1: BENCH_r03's unpinned single passes showed index_build
12.6 s (vs r2 8.8) and index_build_positions 10.5 s (vs r2 4.0) with no
controlled evidence either way. This applies the WARM_AB protocol to the
build path: alternating FULL fresh-JVM runs of the ref tree (a git
worktree) and HEAD on the same host, pinned to the same cores, each run
timing REPS cold builds of both the plain and the positions index after
one untimed warmup build. Per-variant MEDIANS over all runs compare.

Usage:
  python scripts/bench_build_ab.py [--ref 21cba44] [--rounds 3]
        [--reps 3] [--cpus 8] [--sf-dir /root/testdata/sf0.1]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="21cba44")  # r2 HEAD
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    wt = Path(tempfile.mkdtemp(prefix="fcs3_ref_tree_")) / "tree"
    subprocess.run(
        ["git", "worktree", "add", "--detach", str(wt), args.ref],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        acc: dict[str, dict[str, list[float]]] = {"old": {}, "new": {}}
        for rnd in range(args.rounds):
            order = ("old", "new") if rnd % 2 == 0 else ("new", "old")
            for variant in order:
                tree = str(wt) if variant == "old" else str(REPO)
                cmd = [
                    "taskset", "-c", f"0-{args.cpus - 1}",
                    sys.executable, str(REPO / "scripts/_build_ab_worker.py"),
                    tree, args.sf_dir, str(args.cpus), str(args.reps),
                ]
                env = dict(os.environ)
                env["PYTHONPATH"] = tree
                r = subprocess.run(cmd, capture_output=True, text=True, env=env)
                if r.returncode != 0:
                    print(r.stderr[-4000:], file=sys.stderr)
                    raise SystemExit(f"{variant} run failed")
                got = json.loads(r.stdout.strip().splitlines()[-1])
                for q, times in got.items():
                    acc[variant].setdefault(q, []).extend(times)
                print(f"round {rnd} {variant}: "
                      + " ".join(f"{q}={min(v):.2f}" for q, v in got.items()),
                      flush=True)
        summary = {
            q: {
                "old_median": round(statistics.median(acc["old"][q]), 3),
                "new_median": round(statistics.median(acc["new"][q]), 3),
                "old_best": min(acc["old"][q]),
                "new_best": min(acc["new"][q]),
            }
            for q in acc["old"]
        }
        print(json.dumps({
            "ref": args.ref, "rounds": args.rounds, "reps": args.reps,
            "cpus": args.cpus, "sf_dir": args.sf_dir,
            "queries": summary, "raw": acc,
        }))
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", str(wt)],
                       cwd=REPO, capture_output=True)


if __name__ == "__main__":
    main()
