"""Similarity search over an embedding column (array<float>).

Engine extension beyond the fastcatsearch3 reference (which has no vector
search). Two paths:

  * brute_force_topk — exact cosine top-k against one probe vector; the
    correctness baseline. O(n) per query but embarrassingly parallel and
    broadcast-friendly (the probe is one row).
  * lsh_ann_topk — random-hyperplane LSH: vectors hash to a sign-bit
    bucket; only the probe's bucket is scanned. The hyperplanes are
    deterministic pseudo-randoms derived from md5 (seeded, no RNG state),
    INLINED as literals so the DuckDB oracle evaluates the identical
    matrix. At 100 TB the bucketed scan touches ~n / 2^planes vectors and
    the bucket map can be a bucketed/partitioned table.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIM = 64
PLANES = 6  # 2^6 = 64 buckets


def hyperplanes(planes: int = PLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane matrix in [-1, 1): value
    (i, j) = md5(f"{i}:{j}") first 8 hex digits / 2^32 * 2 - 1. Pure
    function of (i, j) — identical in any language."""
    out = []
    for i in range(planes):
        row = []
        for j in range(dim):
            h = int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16)
            row.append(h / 2**32 * 2.0 - 1.0)
        out.append(row)
    return out


def _dvec(col: str) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(c) -> Column:
    return F.sqrt(_dot(c, c))


def bucket_of(vec_col: str, planes: list[list[float]]) -> Column:
    """Sign-bit LSH bucket id: bit i = 1 iff dot(vec, plane_i) > 0."""
    acc = F.lit(0).cast("long")
    for i, row in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in row])
        bit = F.when(_dot(vec_col, plane) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        acc = acc + F.shiftleft(bit, i)
    return acc


def brute_force_topk(emb: DataFrame, probe_id: int, k: int = 10) -> DataFrame:
    """Exact cosine top-k vs the probe vector. Output: vec_id, sim_e4."""
    v = emb.withColumn("vec", _dvec("embedding"))
    probe = v.where(F.col("vec_id") == probe_id).select(
        F.col("vec").alias("qvec")
    )
    sim = _dot("vec", "qvec") / (_norm("vec") * _norm("qvec"))
    return (
        v.crossJoin(F.broadcast(probe))
        .where(F.col("vec_id") != probe_id)
        .select(
            "vec_id", F.round(sim * 10000).cast("long").alias("sim_e4")
        )
        .orderBy(F.desc("sim_e4"), F.asc("vec_id"))
        .limit(k)
    )


def lsh_ann_topk(
    emb: DataFrame, probe_id: int, k: int = 10, planes: int = PLANES
) -> DataFrame:
    """Approximate cosine top-k: exact scoring restricted to the probe's
    LSH bucket. Output: vec_id, sim_e4 (subset of brute-force results)."""
    hp = hyperplanes(planes)
    v = emb.withColumn("vec", _dvec("embedding")).withColumn(
        "bucket", bucket_of("vec", hp)
    )
    probe = v.where(F.col("vec_id") == probe_id).select(
        F.col("vec").alias("qvec"), F.col("bucket").alias("qbucket")
    )
    sim = _dot("vec", "qvec") / (_norm("vec") * _norm("qvec"))
    return (
        v.join(F.broadcast(probe), F.col("bucket") == F.col("qbucket"))
        .where(F.col("vec_id") != probe_id)
        .select("vec_id", F.round(sim * 10000).cast("long").alias("sim_e4"))
        .orderBy(F.desc("sim_e4"), F.asc("vec_id"))
        .limit(k)
    )
