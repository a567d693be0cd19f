"""Recall report: IVF REFRESH (warm-start + changed-lists-only rewrite)
vs FULL REBUILD after an append (VERDICT r3 #8 done criterion).

Scenario: index the first 80% of the embeddings, append the rest, then
either (a) refresh the artifact (ivf_index_build(refresh=True)) or
(b) rebuild it from scratch over the full relation. Both artifacts are
queried with ivf_index_topk for N probes; recall@10 vs numpy exact
cosine ground truth is reported for both, plus the fraction of list
partitions the refresh actually rewrote.

Usage: python scripts/ivf_refresh_recall.py [sf_dir] [n_probes]
       [n_centroids] [nprobe]
"""

from __future__ import annotations

import json
import sys
import tempfile

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

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
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )

    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = unit @ unit.T
    cut = int(np.quantile(ids, 0.8))
    base = emb.where(F.col("vec_id") <= cut)
    probes = [int(ids[(i * len(ids)) // n_probes]) for i in range(n_probes)]

    def truth(pid: int) -> set[int]:
        r = sims[np.searchsorted(ids, pid)].copy()
        r[np.searchsorted(ids, pid)] = -2
        order = np.lexsort((ids, -r))
        return set(int(ids[j]) for j in order[:k])

    vec_of = {int(i): [float(x) for x in mat[j]] for j, i in enumerate(ids)}

    out = {"sf_dir": sf_dir, "n_probes": n_probes,
           "n_centroids": n_centroids, "nprobe": nprobe, "k": k,
           "base_cut": cut, "n_total": len(ids)}
    idx_r = tempfile.mkdtemp(prefix="ivf_refresh_")
    idx_f = tempfile.mkdtemp(prefix="ivf_full_")
    SIM.ivf_index_build(base, idx_r, n_centroids=n_centroids, train_iters=3)
    info = SIM.ivf_index_build(
        emb, idx_r, n_centroids=None, train_iters=1, refresh=True
    )
    out["refresh_changed_lists"] = len(info["changed_cids"])
    SIM.ivf_index_build(emb, idx_f, n_centroids=n_centroids, train_iters=3)

    for label, idx in (("refresh", idx_r), ("full_rebuild", idx_f)):
        recalls = []
        for pid in probes:
            got = {
                int(r["vec_id"])
                for r in SIM.ivf_index_topk(
                    spark, idx, vec_of[pid], k=k, nprobe=nprobe,
                    exclude_vec_id=pid,
                ).collect()
            }
            recalls.append(len(got & truth(pid)) / k)
        out[label] = {
            "mean_recall_at_10": round(float(np.mean(recalls)), 4),
            "min": round(float(np.min(recalls)), 4),
            "max": round(float(np.max(recalls)), 4),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
