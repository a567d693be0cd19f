"""Measure IVF ANN recall@10 vs brute force: fixed-sample centroids vs
k-means-trained centroids (VERDICT r2 item 8's done criterion).

Computes ground truth with numpy (exact cosine top-k), then runs
ivf_ann_topk with train_iters=0 and train_iters=3 for N probe ids and
reports mean recall@10 for both. Usage:

  python scripts/ivf_recall.py [sf_dir] [n_probes] [n_centroids] [nprobe]
"""

from __future__ import annotations

import json
import sys

import numpy as np
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
from fastcatsearch3_spark.dataops import similarity as SIM  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_centroids = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    nprobe = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    k = 10

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = unit @ unit.T

    # deterministic probe ids spread over the id range
    probes = [int(ids[(i * len(ids)) // n_probes]) for i in range(n_probes)]

    def truth(pid: int) -> set[int]:
        row = sims[np.searchsorted(ids, pid)].copy()
        row[np.searchsorted(ids, pid)] = -2
        order = np.lexsort((ids, -row))
        return set(int(ids[j]) for j in order[:k])

    out = {"sf_dir": sf_dir, "n_probes": n_probes,
           "n_centroids": n_centroids, "nprobe": nprobe, "k": k}
    for label, iters in (("fixed", 0), ("kmeans", 3)):
        recalls = []
        for pid in probes:
            got = set(
                r["vec_id"]
                for r in SIM.ivf_ann_topk(
                    emb, probe_id=pid, k=k, n_centroids=n_centroids,
                    nprobe=nprobe, train_iters=iters,
                ).collect()
            )
            recalls.append(len(got & truth(pid)) / k)
        out[label] = {
            "mean_recall_at_10": round(float(np.mean(recalls)), 4),
            "min": round(float(np.min(recalls)), 4),
            "max": round(float(np.max(recalls)), 4),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
