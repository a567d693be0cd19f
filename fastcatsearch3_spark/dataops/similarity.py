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


def hyperplanes(
    planes: int = PLANES, dim: int = DIM, salt: str = ""
) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane matrix in [-1, 1): value
    (i, j) = md5(f"{salt}{i}:{j}") first 8 hex digits / 2^32 * 2 - 1. Pure
    function of (salt, i, j) — identical in any language. ``salt`` yields
    independent matrices per LSH band (empty = the ann_lsh_topk matrix)."""
    out = []
    for i in range(planes):
        row = []
        for j in range(dim):
            h = int(hashlib.md5(f"{salt}{i}:{j}".encode()).hexdigest()[:8], 16)
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


def _safe_cos(a: str, b: str) -> Column:
    """Cosine that maps a zero-norm operand to 0.0 instead of null/NaN —
    keeps centroid-assignment argmax deterministic for degenerate
    embeddings (an all-zero padding row assigns to the lowest cid rather
    than to a null struct that would drop it or write a null-cid list)."""
    den = _norm(a) * _norm(b)
    return F.when(den > 0, _dot(a, b) / den).otherwise(F.lit(0.0))


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


def embedding_lsh_pairs(
    emb: DataFrame,
    bands: int = 4,
    planes: int = 8,
    limit: int = 50,
) -> DataFrame:
    """Near-duplicate embedding pairs via banded hyperplane LSH — the
    SCALE path for the all-pairs ``embedding_cosine_pairs`` baseline
    (which stays the documented O(n²) correctness oracle).

    Candidate generation: each vector gets ``bands`` independent sign-bit
    signatures (``planes`` bits each, per-band salted hyperplanes); a pair
    is a candidate iff it collides in ≥1 band. Exact cosine runs ONLY on
    candidates (the lesson of the round-1 MinHash verify bug: never join
    verification back to an all-pairs relation). Collision probability per
    band is (1 - θ/π)^planes, so high-cosine pairs survive with near-1
    recall at bands=4/planes=8 while the candidate count stays ≈
    Σ_bucket |bucket|² / 2 ≪ n²/2. At 100 TB the band signatures are one
    narrow shuffle (vec_id, band, key) and buckets are bounded by design
    (planes sizes the bucket count to the corpus).

    Output: (vec_a, vec_b, sim_e4), top ``limit`` by similarity —
    a subset of the brute-force pairs relation, deterministic."""
    v = emb.withColumn("vec", _dvec("embedding"))
    sig = None
    for b in range(bands):
        hp = hyperplanes(planes, salt=f"b{b}:")
        s = v.select(
            "vec_id",
            F.lit(b).alias("band"),
            bucket_of("vec", hp).alias("band_key"),
        )
        sig = s if sig is None else sig.unionByName(s)
    left = sig.select(
        F.col("vec_id").alias("vec_a"), "band", "band_key"
    )
    right = sig.select(
        F.col("vec_id").alias("vec_b"), "band", "band_key"
    )
    cand = (
        left.join(right, ["band", "band_key"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    va = v.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("avec"))
    vb = v.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("bvec"))
    sim = _dot("avec", "bvec") / (_norm("avec") * _norm("bvec"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(sim * 10000).cast("long").alias("sim_e4"),
        )
        .orderBy(F.desc("sim_e4"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(limit)
    )


def kmeans_centroids(
    emb: DataFrame,
    n_centroids: int = 8,
    iters: int = 3,
    init: list[tuple[int, list[float]]] | None = None,
) -> list[tuple[int, list[float]]]:
    """SPHERICAL Lloyd's k-means over the embedding column, as ``iters``
    iterative DataFrame jobs (the near_dup_clusters propagation pattern):
    each round is one broadcast-assign pass (cosine argmax against the
    tiny centroid table — a hash aggregate with map-side partial combine,
    no window shuffle) plus one per-dimension mean of the UNIT-normalized
    members (posexplode → (cid, pos) hash agg, rows ∝ n×dim). Averaging
    unit vectors — not raw vectors — is the correct centroid update under
    a cosine assignment (vector magnitudes would otherwise dominate the
    mean; cosine argmax itself is scale-invariant, so the centroid needs
    no re-normalization). The centroid table is O(k·dim) — it is
    collected to the driver between rounds, which both truncates lineage
    (no per-iteration plan doubling) and is the natural representation for
    the broadcast join of the next round. Determinism: init is the
    vec_id < k vectors; assignment ties break to the lowest cid; every
    centroid dimension is rounded to 6 decimals per round so an SQL oracle
    summing in a different order converges to bit-identical centroids;
    a cluster that loses all members keeps its previous centroid.

    Returns [(cid, centroid_vector)] — feed to ``ivf_ann_topk`` via
    ``train_iters`` or persist as the IVF index's centroid artifact."""
    spark = emb.sparkSession
    raw = _dvec("embedding")
    nrm = F.sqrt(
        F.aggregate(
            F.zip_with(raw, raw, lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x,
        )
    )
    safe = F.when(nrm > 0, nrm).otherwise(F.lit(1.0))
    v = emb.select(
        "vec_id",
        raw.alias("vec"),
        F.transform(raw, lambda x: x / safe).alias("uvec"),
    )
    if init is not None:
        # warm start (IVF refresh on append): continue Lloyd from the
        # previous epoch's centroids instead of re-seeding — the usual
        # incremental k-means move; a round or two re-balances the new
        # mass without forgetting the old structure
        cents = [(int(c), list(vec)) for c, vec in init]
    else:
        cents = [
            (int(r["vec_id"]), list(r["vec"]))
            for r in v.where(F.col("vec_id") < n_centroids).collect()
        ]
    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(c, vec) for c, vec in cents], "cid int, cvec array<double>"
        )
        csim = _safe_cos("vec", "cvec")
        assign = (
            v.crossJoin(F.broadcast(cdf))
            .select("vec_id", "cid", csim.alias("csim"), "uvec")
            .groupBy("vec_id")
            .agg(
                F.max_by(
                    F.struct("cid", "uvec"), F.struct(F.col("csim"), -F.col("cid"))
                ).alias("best")
            )
            .select(F.col("best.cid").alias("cid"), F.col("best.uvec").alias("uvec"))
        )
        means = (
            assign.select("cid", F.posexplode("uvec").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("val"), 6).alias("m"))
            .groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select("cid", F.col("pm.m").alias("cvec"))
            .collect()
        )
        got = {int(r["cid"]): list(r["cvec"]) for r in means}
        cents = [(c, got.get(c, vec)) for c, vec in cents]
    return cents


def ivf_ann_topk(
    emb: DataFrame,
    probe_id: int,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    train_iters: int = 0,
) -> DataFrame:
    """IVF-style approximate top-k: vectors are partitioned into
    ``n_centroids`` inverted lists by nearest centroid; the probe scans
    only its ``nprobe`` nearest lists.

    Training: with ``train_iters=0`` the centroids are the vectors with
    vec_id < n_centroids (a deterministic fixed sample); with
    ``train_iters>0`` they are k-means-refined by that many Lloyd rounds
    (``kmeans_centroids`` — same init, so iters=0 degenerates to the
    fixed sample). Training only moves the centroid VALUES; the serving
    plan shape below is identical either way. Assignment
    is a broadcast join against the tiny centroid table + a ``max_by``
    hash aggregate (map-side partial combine — NOT a row_number window,
    which would sort-shuffle n×C rows), so at 100 TB it is one narrow
    pass; the probe side scans ~nprobe/n_centroids of the corpus, and the
    assignment column is the natural bucketing key for a persisted
    inverted-list layout. Output: (vec_id, sim_e4) — a subset of the
    brute-force scan's results."""
    v = emb.withColumn("vec", _dvec("embedding"))
    if train_iters > 0:
        trained = kmeans_centroids(emb, n_centroids, iters=train_iters)
        cents = emb.sparkSession.createDataFrame(
            trained, "cid int, cvec array<double>"
        )
    else:
        cents = v.where(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cid"), F.col("vec").alias("cvec")
        )
    csim = _safe_cos("vec", "cvec")
    scored = v.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", csim.alias("csim")
    )
    # argmax with deterministic tie-break: struct orders lexicographically,
    # so max (csim, -cid) = highest csim, then lowest cid
    assign = scored.groupBy("vec_id").agg(
        F.max_by("cid", F.struct(F.col("csim"), -F.col("cid"))).alias("cid")
    )
    probe_lists = (
        scored.where(F.col("vec_id") == probe_id)
        .orderBy(F.desc("csim"), F.asc("cid"))
        .limit(nprobe)
        .select("cid")
    )
    probe = v.where(F.col("vec_id") == probe_id).select(
        F.col("vec").alias("qvec")
    )
    sim = _dot("vec", "qvec") / (_norm("vec") * _norm("qvec"))
    return (
        v.join(assign, "vec_id")
        .join(F.broadcast(probe_lists), "cid")
        .where(F.col("vec_id") != probe_id)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", F.round(sim * 10000).cast("long").alias("sim_e4"))
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


def quantized_ann_topk(
    emb: DataFrame,
    probe_id: int,
    k: int = 10,
    rescore_mult: int = 4,
) -> DataFrame:
    """Scalar-quantized (int8-style) ANN with exact rescoring — the
    memory-bandwidth scale path for embedding scans: each vector is
    quantized to q_i = round(127·x_i / max|x|) (4× smaller than float32
    when stored as int8, so the first-pass scan moves 4× less data),
    candidates are the top ``rescore_mult × k`` by QUANTIZED cosine, and
    the final ranking rescores only those candidates against the exact
    float vectors (the standard SQ + refine design). Zero vectors are
    excluded (quantization undefined). Deterministic end to end — both
    passes tie-break on vec_id. Output: (vec_id, sim_e4) with EXACT
    similarities, a subset of the brute-force scan's results."""
    v = emb.withColumn("vec", _dvec("embedding")).withColumn(
        "mx", F.array_max(F.transform("vec", lambda x: F.abs(x)))
    ).where(F.col("mx") > 0)
    qv = v.withColumn(
        "q",
        F.transform("vec", lambda x: F.round(F.lit(127.0) * x / F.col("mx"))),
    )
    qprobe = qv.where(F.col("vec_id") == probe_id).select(
        F.col("q").alias("pq"), F.col("vec").alias("qvec")
    )
    qsim = _dot("q", "pq") / (_norm("q") * _norm("pq"))
    cand = (
        qv.crossJoin(F.broadcast(qprobe))
        .where(F.col("vec_id") != probe_id)
        .select("vec_id", "vec", "qvec", qsim.alias("qsim"))
        .orderBy(F.desc("qsim"), F.asc("vec_id"))
        .limit(rescore_mult * k)
    )
    sim = _dot("vec", "qvec") / (_norm("vec") * _norm("qvec"))
    return (
        cand.select(
            "vec_id", F.round(sim * 10000).cast("long").alias("sim_e4")
        )
        .orderBy(F.desc("sim_e4"), F.asc("vec_id"))
        .limit(k)
    )


def _auto_ncentroids(n_vectors: int) -> int:
    """~sqrt(n), clamped to [4, 65536] and to n — the standard IVF sizing
    heuristic (probe cost n/k ≈ centroid-scan cost k at k = sqrt(n))."""
    import math

    return int(max(4, min(65536, min(n_vectors, round(math.sqrt(n_vectors))))))


def ivf_index_build(
    emb: DataFrame,
    out_dir: str,
    n_centroids: int | None = 16,
    train_iters: int = 3,
    refresh: bool = False,
    resize_on_growth: bool = False,
) -> dict:
    """Persist the IVF artifact — built once per corpus epoch (like the
    search index and the MinHash band table) so query-time cost is
    centroid-table lookup + an nprobe-pruned scan. Layout under
    ``out_dir``:

      centroids/     (cid, cvec) — k·dim doubles, spherical-k-means
                     trained (``kmeans_centroids``); read whole (tiny)
      lists/         (vec_id, vec) PARTITIONED BY cid — the inverted
                     lists; a probe reading ``cid IN (...)`` touches only
                     its nprobe partitions (directory-level pruning, the
                     parquet analogue of IVF list seeks)
      manifest.json  {n_centroids, train_iters, dim} — probe validation

    Assignment is the same broadcast cosine-argmax hash aggregate as
    ``ivf_ann_topk`` (one narrow pass; no window shuffle); the partitioned
    write shuffles on cid once, at build time, never at query time.

    Lifecycle (VERDICT r3 #8):

      * ``n_centroids=None`` auto-sizes to ~sqrt(n) (the standard IVF
        heuristic: probe cost n/k ≈ centroid-scan cost k at k = sqrt(n)),
        clamped to [4, 65536] and to n.
      * ``refresh=True`` over an existing artifact inherits the manifest
        geometry (pass ``n_centroids=None`` or the same value; a different
        value forces a full rebuild) and warm-starts Lloyd from
        the PREVIOUS centroids (incremental k-means: a round re-balances
        appended mass without forgetting structure) and rewrites ONLY the
        list partitions whose membership changed — dynamic partition
        overwrite; unchanged cid directories are untouched on disk, so an
        append that lands in a few lists costs those lists, not the
        corpus.
      * ``resize_on_growth=True`` (with ``refresh=True`` and
        ``n_centroids=None`` — an explicitly pinned k is never grown)
        lets the geometry GROW when the corpus has outgrown it: if the
        sqrt(n)
        auto-size target reaches >= 2x the inherited k, the previous
        centroids are kept and the extra cids are seeded from appended
        vectors (left-anti join against the previous lists, lowest
        vec_id first — deterministic; no unseen vectors → geometry kept),
        then Lloyd re-balances. Existing
        clusters keep their identity (query caches keyed on cid stay
        mostly valid); only lists whose membership actually moved are
        rewritten. Off by default: plain refresh preserves geometry
        exactly, and whether/when to grow is the caller's policy.

    Returns {"n_centroids", "dim", "n_vectors", "refreshed", "resized",
    "changed_cids"} (changed_cids is None on a full build)."""
    import json
    from pathlib import Path

    spark = emb.sparkSession
    n_vectors = emb.count()
    prev_cents = None
    resized = False
    sizing_delegated = n_centroids is None  # growth only when auto-sized
    if refresh and Path(out_dir, "manifest.json").exists():
        prev = json.loads(Path(out_dir, "manifest.json").read_text())
        rows = spark.read.parquet(str(Path(out_dir) / "centroids")).collect()
        prev_cents = sorted(
            ((int(r["cid"]), list(r["cvec"])) for r in rows)
        )
        if n_centroids is not None and n_centroids != prev["n_centroids"]:
            prev_cents = None  # geometry change → full rebuild
        else:
            n_centroids = prev["n_centroids"]
            target = _auto_ncentroids(n_vectors)
            if (
                resize_on_growth
                and sizing_delegated
                and target >= 2 * n_centroids
            ):
                # grow the geometry in place: keep every previous
                # centroid (cluster identity survives) and seed the new
                # cids from vectors the previous epoch never saw
                old_ids = spark.read.parquet(
                    str(Path(out_dir) / "lists")
                ).select("vec_id")
                seeds = (
                    emb.join(old_ids, "vec_id", "left_anti")
                    .select("vec_id", _dvec("embedding").alias("vec"))
                    .orderBy("vec_id")
                    .limit(target - n_centroids)
                    .collect()
                )
                # no unseen vectors (re-refresh of an already-indexed
                # corpus) → nothing to seed from; keep the geometry — an
                # undersized ORIGINAL build is a full-rebuild decision
                prev_cents = prev_cents + [
                    (n_centroids + i, list(r["vec"]))
                    for i, r in enumerate(seeds)
                ]
                n_centroids += len(seeds)
                resized = bool(seeds)
    if n_centroids is None:
        n_centroids = _auto_ncentroids(n_vectors)
    cents = kmeans_centroids(
        emb, n_centroids, iters=train_iters, init=prev_cents
    )
    cdf = spark.createDataFrame(cents, "cid int, cvec array<double>")
    v = emb.select("vec_id", _dvec("embedding").alias("vec"))
    csim = _safe_cos("vec", "cvec")
    assign = (
        v.crossJoin(F.broadcast(cdf))
        .select("vec_id", "cid", csim.alias("csim"), "vec")
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct("cid", "vec"), F.struct(F.col("csim"), -F.col("cid"))
            ).alias("best")
        )
        .select("vec_id", F.col("best.cid").alias("cid"), F.col("best.vec").alias("vec"))
    )
    changed_cids = None
    if prev_cents is not None:
        # membership diff vs the previous lists: a cid must be rewritten
        # iff it GAINS a vector (new/moved-in) or LOSES one (moved-out /
        # deleted). Everything else keeps its files byte-identical.
        old = spark.read.parquet(str(Path(out_dir) / "lists")).select(
            "vec_id", F.col("cid").alias("old_cid")
        )
        diff = (
            assign.select("vec_id", "cid")
            .join(old, "vec_id", "full_outer")
            .where(
                F.col("cid").isNull()
                | F.col("old_cid").isNull()
                | (F.col("cid") != F.col("old_cid"))
            )
        )
        changed_cids = sorted(
            int(c)
            for r in diff.select(
                F.array("cid", "old_cid").alias("cs")
            ).collect()
            for c in r["cs"]
            if c is not None
        )
        changed_cids = sorted(set(changed_cids))
    cdf.write.mode("overwrite").parquet(str(Path(out_dir) / "centroids"))
    if changed_cids is None:
        # full build: static overwrite replaces the whole lists dir
        (
            assign.repartition("cid")
            .write.mode("overwrite")
            .partitionBy("cid")
            .parquet(str(Path(out_dir) / "lists"))
        )
    elif changed_cids:
        writer = assign.where(F.col("cid").isin(changed_cids))
        live = {
            int(r["cid"])
            for r in writer.select("cid").distinct().collect()
        }
        (
            writer.repartition("cid")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cid")
            .parquet(str(Path(out_dir) / "lists"))
        )
        # a changed cid that lost its LAST member writes no partition —
        # dynamic overwrite leaves its old directory; drop it explicitly
        import shutil

        for c in changed_cids:
            if c not in live:
                shutil.rmtree(
                    Path(out_dir) / "lists" / f"cid={c}", ignore_errors=True
                )
    dim = len(cents[0][1]) if cents else 0
    Path(out_dir, "manifest.json").write_text(
        json.dumps(
            {
                "n_centroids": n_centroids,
                "train_iters": train_iters,
                "dim": dim,
                "n_vectors": int(n_vectors),
            }
        )
    )
    return {
        "n_centroids": n_centroids,
        "dim": dim,
        "n_vectors": int(n_vectors),
        "refreshed": prev_cents is not None,
        "resized": resized,
        "changed_cids": changed_cids,
    }


def ivf_index_topk(
    spark,
    index_dir: str,
    probe_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Query the persisted IVF artifact: nearest ``nprobe`` centroids are
    chosen DRIVER-side from the collected centroid table (k·dim doubles —
    the same O(k) scale as a lexicon lookup), then the inverted lists are
    read with ``cid IN (...)`` so parquet partition pruning skips every
    other list directory — query cost ∝ nprobe/n_centroids of the corpus
    regardless of corpus size. ``probe_vec`` is any query vector (not
    required to be a corpus member). Output: (vec_id, sim_e4) top-k by
    exact cosine within the probed lists."""
    import json
    import math
    from pathlib import Path

    manifest = json.loads(Path(index_dir, "manifest.json").read_text())
    cents = spark.read.parquet(str(Path(index_dir) / "centroids")).collect()
    pn = math.sqrt(sum(x * x for x in probe_vec))
    if len(probe_vec) != manifest["dim"]:
        raise ValueError(
            f"probe dim {len(probe_vec)} != index dim {manifest['dim']}"
        )

    def cos(cvec) -> float:
        d = sum(x * y for x, y in zip(probe_vec, cvec))
        n = math.sqrt(sum(x * x for x in cvec))
        return d / (pn * n) if pn > 0 and n > 0 else -2.0

    ranked = sorted(cents, key=lambda r: (-cos(r["cvec"]), r["cid"]))
    cids = [int(r["cid"]) for r in ranked[:nprobe]]
    lists = spark.read.parquet(str(Path(index_dir) / "lists")).where(
        F.col("cid").isin(cids)
    )
    if exclude_vec_id is not None:
        lists = lists.where(F.col("vec_id") != exclude_vec_id)
    qvec = F.array(*[F.lit(float(x)) for x in probe_vec])
    sim = _dot("vec", qvec) / (_norm("vec") * _norm(qvec))
    return (
        lists.select(
            "vec_id", F.round(sim * 10000).cast("long").alias("sim_e4")
        )
        .orderBy(F.desc("sim_e4"), F.asc("vec_id"))
        .limit(k)
    )
