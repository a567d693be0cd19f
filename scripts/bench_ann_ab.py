"""Interleaved A/B of the ANN query entries: a git ref vs working tree.

VERDICT r4 "what's wrong" #1 / next-round #2: BENCH_r04's unpinned single
pass showed ann_ivf 1.791 s vs r3's 1.507 (+19%) with no controlled
evidence either way (r4's IVF work was build/refresh-side; the query
path is unchanged). This applies the BUILD_AB/WARM_AB protocol to the
ANN entries (brute force, hyperplane LSH, IVF, scalar-quantized):
alternating fresh-JVM runs of the ref tree (a git worktree) and HEAD on
the same pinned cores, one untimed warmup per entry, REPS timed reps per
run; per-variant MEDIANS over all runs compare.

Usage:
  python scripts/bench_ann_ab.py [--ref f571780] [--rounds 3]
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
    ap.add_argument("--ref", default="f571780")  # r3 HEAD (bench of record)
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
                    sys.executable, str(REPO / "scripts/_ann_ab_worker.py"),
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
            if q in acc["new"]
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
