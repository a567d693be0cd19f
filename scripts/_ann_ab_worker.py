"""One ANN timing pass against a given repo tree (worker for
bench_ann_ab.py).

Usage: python scripts/_ann_ab_worker.py REPO_ROOT SF_DIR CPUS REPS
Times REPS runs of each ANN entry exactly as bench.py invokes them
(same calls, same probe, same k) after one untimed warmup; prints one
JSON line {"ann_brute_force": [..], "ann_lsh": [..], "ann_ivf": [..],
"ann_quantized": [..]}.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    repo, sf_dir, cpus, reps = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    )
    sys.path.insert(0, repo)
    from fastcatsearch3_spark.dataops import similarity as SIM

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    entries = {
        "ann_brute_force": lambda: SIM.brute_force_topk(
            emb, probe_id=0, k=10
        ).count(),
        "ann_lsh": lambda: SIM.lsh_ann_topk(emb, probe_id=0, k=10).count(),
        "ann_ivf": lambda: SIM.ivf_ann_topk(emb, probe_id=0, k=10).count(),
        "ann_quantized": lambda: (
            SIM.quantized_ann_topk(emb, probe_id=0, k=10).count()
            if hasattr(SIM, "quantized_ann_topk")
            else 0
        ),
    }
    # one untimed warmup of each entry (python worker pool + JIT), so
    # every timed rep is steady-state like bench.py's min-of-2 policy
    for fn in entries.values():
        fn()
    out: dict[str, list[float]] = {}
    for name, fn in entries.items():
        out[name] = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            out[name].append(round(time.monotonic() - t0, 3))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
