"""Deduplication operators for large-scale training-data pipelines.

These are engine extensions beyond the fastcatsearch3 reference surface
(the reference dedups only by primary key at index time —
core:ir.document.PrimaryKeyIndexWriter [K per SURVEY.md]); they are
first-class here because a 100 TB corpus engine must dedup before it
indexes. Every operator is pure DataFrame algebra (joins + aggregations
inside Catalyst/codegen) so the DuckDB oracle can mirror it exactly:

  * exact_dedup            — hash-groupBy on sha256(content)
  * shingles               — word n-gram shingle relation (the shared base)
  * jaccard_top_pairs      — n-gram Jaccard similarity, top-N pairs
  * minhash_signatures     — K-permutation MinHash, portable md5 form
  * minhash_lsh_pairs      — banded LSH candidates + exact-Jaccard verify
  * simhash                — 63-bit SimHash from tf-weighted md5 bit votes
  * simhash_top_pairs      — banded Hamming-distance near-dup pairs

Portability trick: instead of integer hash families (whose overflow / mod
semantics differ across engines), the MinHash "permutations" are
h_i(s) = md5(i || ':' || s) compared LEXICOGRAPHICALLY — min over a set of
md5 strings is a perfectly valid uniform permutation surrogate and is
bit-identical in any engine with md5(). Scale notes per operator below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.operators.build import tokens_raw_column


def _pin(df: DataFrame) -> DataFrame:
    """Pin a SMALL, multiply-referenced relation (signatures, candidate
    pairs, per-candidate shingle sets — all ∝ docs or ∝ near-dups, never
    ∝ token stream).

    Mode is gated on the deploy target, because the two mechanisms trade
    exactly the property that differs between them:

      * on a CLUSTER → ``persist(DISK_ONLY)``: blocks stay recomputable
        from lineage after an executor loss (localCheckpoint truncates
        lineage and stores unreplicated executor-local blocks — a single
        lost executor kills a 100 TB job);
      * on ``local[*]`` → ``localCheckpoint(eager=False)``: there are no
        executor losses distinct from driver death (one JVM), so the
        fragility localCheckpoint trades away does not exist — and it
        skips the columnar-cache serialize/scan cost that measures ~2×
        on small corpora (BENCH/DEDUP_AB_r03.md variant study).

    The corpus-sized shingle relation is deliberately NEVER pinned: its
    one reuse (candidate verification) re-derives shingles for candidate
    docs only, which is cheaper at every scale than materializing the
    full token stream."""
    if df.sparkSession.sparkContext.master.startswith("local"):
        return df.localCheckpoint(eager=False)
    return df.persist(StorageLevel.DISK_ONLY)


def _pin_iter(df: DataFrame) -> DataFrame:
    """Pin + lineage-truncate inside an iterative loop (label propagation):
    without truncation the plan doubles per round. Uses a RELIABLE
    checkpoint (replicated storage, survives executor loss) when the
    session has a checkpoint dir configured; falls back to eager
    localCheckpoint otherwise (fine on local mode / short loops)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)

NUM_HASHES = 16
BANDS = 4  # rows per band = NUM_HASHES // BANDS
MAX_BUCKET = 256  # band buckets above this are dropped (see _cap_buckets)
SIMHASH_BITS = 63  # fits signed BIGINT
SIMHASH_BANDS = 3  # 21 bits each


# ---------------------------------------------------------------------------
# exact dedup — scales as one hash aggregate (map-side partial combine)
# ---------------------------------------------------------------------------

def exact_dedup(docs: DataFrame) -> DataFrame:
    """One row per distinct content: the surviving doc (min doc_id) and the
    duplicate count. Input: driver `documents` shape (doc_id, text)."""
    return (
        docs.groupBy(F.sha2(F.col("text"), 256).alias("content_sha256"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
        .select("content_sha256", "keep_id", "n_copies")
    )


# ---------------------------------------------------------------------------
# shingle relation — base for Jaccard / MinHash
# ---------------------------------------------------------------------------

def shingles(
    docs: DataFrame, cfg: EngineConfig | None = None, n: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """(doc_id, shingle): word n-gram shingles over the analyzed token
    stream, DISTINCT per doc by default. At scale this relation is ~dl rows
    per doc; it shuffles once per consumer (join/agg) and never
    materializes per-doc sets. Consumers whose aggregates are duplicate-
    insensitive (min() for MinHash, collect_set for the verify) pass
    ``distinct=False`` and skip the dedup shuffle entirely."""
    cfg = cfg or EngineConfig()
    toks = tokens_raw_column(cfg)
    parts = ", ".join(f"toks[i + {k}]" for k in range(n))
    sh = F.expr(
        f"transform(sequence(0, size(toks) - {n}), i -> concat_ws(' ', {parts}))"
    )
    out = (
        docs.withColumn("toks", toks(F.col("text")))
        .where(F.size("toks") >= n)
        .where(F.col("toks")[0] != "")  # all-empty token stream guard
        .select("doc_id", F.explode_outer(sh).alias("shingle"))
        .where(F.col("shingle").isNotNull())
    )
    return out.distinct() if distinct else out


def _pair_jaccard(sh: DataFrame, cand: DataFrame | None = None) -> DataFrame:
    """(doc_a, doc_b, inter, union, jaccard). Without ``cand``: every pair
    sharing ≥1 shingle (the all-pairs correctness baseline — the self-join
    shuffles on shingle; Zipf-hot shingles would skew it, so AQE skew-join
    stays on). With ``cand`` (doc_a, doc_b — an LSH candidate set): exact
    Jaccard restricted to those pairs — the shingle relation is first
    semi-joined down to candidate doc_ids, and the pair restriction is
    applied BEFORE the intersection groupBy, so total cost is proportional
    to the candidates' shingles, never all pairs."""
    if cand is not None:
        cand_docs = (
            cand.select(F.col("doc_a").alias("doc_id"))
            .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        # the restricted relation is small (candidates' shingles) and is
        # read 3× below (sizes + both self-join sides) — pin it so the
        # analyzer/shingle pipeline runs once, not per reference
        sh = _pin(sh.join(F.broadcast(cand_docs), "doc_id", "left_semi"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )
    if cand is not None:
        pairs = pairs.join(F.broadcast(cand), ["doc_a", "doc_b"], "left_semi")
    inter = pairs.groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter"))
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("sz", "sz_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "sz", "sz_b"
            ),
            "doc_b",
        )
        .withColumn("union", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .withColumn("jaccard", F.col("inter") / F.col("union"))
    )


def jaccard_top_pairs(
    docs: DataFrame, cfg: EngineConfig | None = None, n: int = 3, top: int = 50
) -> DataFrame:
    """Top-N most-similar doc pairs by n-gram Jaccard (exact, all-pairs
    over shared shingles). Output: doc_a, doc_b, jaccard_e4."""
    pairs = _pair_jaccard(shingles(docs, cfg, n))
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            F.round(F.col("jaccard") * 10000).cast("long").alias("jaccard_e4"),
        )
        .orderBy(F.desc("jaccard_e4"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(top)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    docs: DataFrame, cfg: EngineConfig | None = None, n: int = 3,
    num_hashes: int = NUM_HASHES,
    sh: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, sig_0..sig_{K-1}): K-permutation MinHash signature in the
    portable md5-string form. One aggregate pass over the shingle relation
    (K min() columns — map-side combinable, no shuffle amplification).
    Pass ``sh`` to reuse an already-computed shingle relation."""
    if sh is None:
        sh = shingles(docs, cfg, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _band_rows(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc_id, band, band_key) rows from a signature relation, built in
    ONE pass: all band keys are computed in a single projection and
    exploded, so the signature aggregate upstream is read exactly once
    (the previous per-band select + union re-read it ``bands`` times)."""
    rows = num_hashes // bands
    band_structs = [
        F.struct(
            F.lit(b).cast("int").alias("band"),
            F.md5(
                F.concat(*[F.col(f"sig_{b * rows + r}") for r in range(rows)])
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", "bb.band", "bb.band_key")


def _cap_buckets(banded: DataFrame, max_bucket: int | None) -> DataFrame:
    """Drop band buckets larger than ``max_bucket`` before a candidate
    join. A bucket with B members contributes B(B−1)/2 candidate pairs,
    and on low-diversity (template-heavy) corpora single buckets capture
    hundreds of docs, degenerating the band equi-join to O(n²) — measured
    on the A/B near-dup corpus: 4.3 M candidate pairs at 25 k docs with a
    1,026-doc bucket in one SimHash band (BENCH/DEDUP_AB_r03.md). An
    oversized bucket carries almost no discriminating information, so
    dropping it is the standard LSH cost/recall trade; true near-dups
    still meet in the other bands' smaller buckets. One count aggregate
    over the (bands × n)-row band relation — cheap at every scale."""
    if max_bucket is None:
        return banded
    ok = (
        banded.groupBy("band", "band_key")
        .agg(F.count("*").alias("bsz"))
        .where(F.col("bsz") <= max_bucket)
        .select("band", "band_key")
    )
    return banded.join(ok, ["band", "band_key"], "left_semi")


def minhash_lsh_pairs(
    docs: DataFrame,
    cfg: EngineConfig | None = None,
    n: int = 3,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    top: int = 50,
    max_bucket: int | None = MAX_BUCKET,
) -> DataFrame:
    """Banded-LSH candidate pairs verified with exact Jaccard.

    Scale path: signatures are K small columns per doc; each band is one
    md5 over its rows; the candidate join is an equi-join on band_key —
    cost proportional to true near-duplicates, NOT all pairs (this is the
    shingle self-join's scalable replacement); buckets above
    ``max_bucket`` are dropped (``_cap_buckets``). Output:
    doc_a, doc_b, jaccard_e4 — top-N by verified similarity."""
    verified = _lsh_verified(docs, cfg, n, num_hashes, bands, max_bucket)
    return (
        verified.select(
            "doc_a",
            "doc_b",
            F.round(F.col("jaccard") * 10000).cast("long").alias("jaccard_e4"),
        )
        .orderBy(F.desc("jaccard_e4"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(top)
    )


def _lsh_verified(
    docs: DataFrame,
    cfg: EngineConfig | None = None,
    n: int = 3,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    max_bucket: int | None = MAX_BUCKET,
) -> DataFrame:
    """Verified LSH pairs (doc_a < doc_b, exact ``jaccard``), unlimited —
    the shared feeder for top-pairs reporting and cluster assignment.

    Materialization discipline (the 100 TB shape): the corpus-sized
    shingle relation is NEVER pinned — it streams once into the signature
    aggregate. Only the tiny relations are persisted: ``sig`` (one row ×
    K md5 strings per doc; read by both sides of the band self-join) and
    ``cand`` (≈ true near-dups; referenced 3×). Verification re-derives
    shingles for CANDIDATE docs only (a broadcast semi-join pushed ahead
    of tokenization), so its analyzer cost is ∝ candidates — cheaper at
    every scale than writing the full token stream to storage."""
    sig = _pin(minhash_signatures(docs, cfg, n, num_hashes))
    banded = _cap_buckets(_band_rows(sig, num_hashes, bands), max_bucket)
    a = banded.alias("a")
    b_ = banded.alias("b")
    cand = (
        a.join(b_, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    cand = _pin(cand)
    # Verify restricted to the LSH candidates — cost ∝ candidates, not all
    # pairs. Shape: per-candidate-doc shingle SETS (bounded by
    # |candidates| × dl) + two broadcast joins of the tiny pair list;
    # exact Jaccard via array_intersect. No pair self-join, no pair groupBy.
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_corpus = docs.join(F.broadcast(cand_docs), "doc_id", "left_semi")
    docsets = _pin(  # read twice below (a-side, b-side)
        shingles(cand_corpus, cfg, n, distinct=False)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("shset"))
    )
    verified = (
        docsets.select(F.col("doc_id").alias("doc_a"), F.col("shset").alias("set_a"))
        .join(F.broadcast(cand), "doc_a")
        .join(
            F.broadcast(
                docsets.select(
                    F.col("doc_id").alias("doc_b"), F.col("shset").alias("set_b")
                )
            ),
            "doc_b",
        )
        .withColumn("inter", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("set_a") + F.size("set_b") - F.col("inter")),
        )
    )
    return verified.select("doc_a", "doc_b", "jaccard")


def dedup_against(
    base: DataFrame,
    batch: DataFrame,
    cfg: EngineConfig | None = None,
    n: int = 3,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    min_jaccard: float = 0.5,
    max_bucket: int | None = MAX_BUCKET,
) -> DataFrame:
    """Incremental (cross-corpus) dedup: flag BATCH docs that duplicate
    the BASE corpus, never re-deduping the base itself — the daily-ingest
    shape at 100 TB (the curated store is deduped once; every new crawl
    probes it). Output one row per duplicated batch doc:
    (doc_id, match_id, kind, jaccard_e4) — ``match_id`` = smallest
    matching base doc; kind 'exact' (sha256 equality, jaccard_e4=10000)
    or 'near' (banded-MinHash candidate against the base's band table,
    verified cross-corpus Jaccard ≥ ``min_jaccard``, best match by
    (jaccard desc, match_id asc)). Batch docs that exact-match skip the
    near path.

    Scale shape: exact = one equi-join on the content hash (output ∝
    batch); near = the batch's band rows equi-joined against the base
    band relation — in production base signatures/bands are a persisted
    per-epoch artifact (built once, like the index), so per-ingest cost
    ∝ batch + candidates, never ∝ base. Verification semi-joins both
    shingle relations down to candidate docs first (same discipline as
    ``_lsh_verified``: cost ∝ candidates)."""
    cfg = cfg or EngineConfig()

    exact = _exact_against(
        base.select(
            F.col("doc_id").alias("match_id"),
            F.sha2("text", 256).alias("sha"),
        ),
        batch,
    )
    rest = batch.join(exact.select("doc_id"), "doc_id", "left_anti")

    # One analyzer+shingle pass per corpus streams into its signature
    # aggregate (nothing corpus-sized is pinned); the tiny signature
    # relations are persisted because the band join reads one per side
    # (same discipline as _lsh_verified; in production the base half is
    # a persisted per-epoch artifact — minhash_index_build).
    sig_rest = _pin(minhash_signatures(rest, cfg, n, num_hashes))
    sig_base = _pin(minhash_signatures(base, cfg, n, num_hashes))

    cand = _pin(
        _band_rows(sig_rest, num_hashes, bands)
        .join(
            # base-side oversized buckets capped (the base is the big
            # side; one degenerate bucket would fan every batch probe out
            # to hundreds of verify candidates)
            _cap_buckets(
                _band_rows(sig_base, num_hashes, bands), max_bucket
            ).select("band", "band_key", F.col("doc_id").alias("match_id")),
            ["band", "band_key"],
        )
        .select("doc_id", "match_id")
        .distinct()
    )
    # verification shingles re-derived for candidate docs ONLY: broadcast
    # semi-join ahead of tokenization, cost ∝ candidates (Jaccard is over
    # shingle SETS, so distinct=True)
    sh_rest = shingles(
        rest.join(
            F.broadcast(cand.select("doc_id").distinct()), "doc_id", "left_semi"
        ),
        cfg, n,
    )
    sh_base = shingles(
        base.join(
            F.broadcast(
                cand.select(F.col("match_id").alias("doc_id")).distinct()
            ),
            "doc_id",
            "left_semi",
        ),
        cfg, n,
    ).withColumnRenamed("doc_id", "match_id")
    return exact.unionByName(
        _verify_near(cand, sh_rest, sh_base, min_jaccard)
    )


def _exact_against(base_sha: DataFrame, batch: DataFrame) -> DataFrame:
    """Exact-duplicate half shared by dedup_against and the persisted-
    artifact probe: batch content hashes equi-joined to a (match_id, sha)
    base relation; smallest matching base doc wins. Pinned — read twice
    (output + the near path's anti-join)."""
    return (
        batch.select("doc_id", F.sha2("text", 256).alias("sha"))
        .join(base_sha, "sha")
        .groupBy("doc_id")
        .agg(F.min("match_id").alias("match_id"))
        .select(
            "doc_id",
            "match_id",
            F.lit("exact").alias("kind"),
            F.lit(10000).cast("long").alias("jaccard_e4"),
        )
    ).transform(_pin)


def minhash_index_build(
    docs: DataFrame,
    out_dir: str,
    cfg: EngineConfig | None = None,
    n: int = 3,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    max_bucket: int | None = MAX_BUCKET,
) -> None:
    """Persist the corpus's dedup artifact — built ONCE per curated-
    corpus epoch (like the search index) so each ingest batch pays only
    its own tokenize + two equi-joins. Layout under ``out_dir``:

      bands/     (doc_id, band, band_key) — MinHash band table, sorted
                 within partitions for compression locality (the probe is
                 a shuffle equi-join, so no min/max pruning is claimed)
      sha/       (match_id, sha) — content hashes for the exact half, so
                 a probe never re-scans or re-hashes the base corpus
      manifest.json — {n, num_hashes, bands, analyzer} — probe parameters
                 are VALIDATED against this (a mismatched probe would
                 silently find zero candidates otherwise)
    """
    import json
    from pathlib import Path

    cfg = cfg or EngineConfig()
    # straight-line pipeline (shingles -> signatures -> one-pass band rows
    # -> write): every relation is consumed exactly once, nothing pinned
    sig = minhash_signatures(docs, cfg, n, num_hashes)
    (
        # oversized buckets are dropped at BUILD time so every future
        # probe inherits the cap without re-scanning the band table
        _cap_buckets(_band_rows(sig, num_hashes, bands), max_bucket)
        .sortWithinPartitions("band", "band_key")
        .write.mode("overwrite")
        .parquet(str(Path(out_dir) / "bands"))
    )
    (
        docs.select(
            F.col("doc_id").alias("match_id"),
            F.sha2("text", 256).alias("sha"),
        )
        .write.mode("overwrite")
        .parquet(str(Path(out_dir) / "sha"))
    )
    Path(out_dir, "manifest.json").write_text(
        json.dumps(
            {
                "n": n,
                "num_hashes": num_hashes,
                "bands": bands,
                "analyzer": cfg.analyzer,
                "max_bucket": max_bucket,
            }
        )
    )


def dedup_against_index(
    spark,
    index_dir: str,
    base: DataFrame,
    batch: DataFrame,
    cfg: EngineConfig | None = None,
    n: int = 3,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    min_jaccard: float = 0.5,
    max_bucket: int | None = MAX_BUCKET,
) -> DataFrame:
    """``dedup_against`` probing the PERSISTED artifact
    (``minhash_index_build``) instead of recomputing base signatures or
    content hashes: per-ingest cost = batch tokenize/minhash + a sha
    equi-join + a band equi-join against the on-disk tables +
    candidate-restricted verify, where base shingles are re-derived ONLY
    for candidate base docs (pushed semi-join into the base scan —
    ``base`` is read solely for those few docs). Probe parameters are
    validated against the artifact's manifest: a mismatch (different
    hash family, band count, shingle width, or analyzer) would otherwise
    produce disjoint band keys and silently miss every near-dup. Same
    output contract as ``dedup_against``."""
    import json
    from pathlib import Path

    cfg = cfg or EngineConfig()
    want = {
        "n": n, "num_hashes": num_hashes, "bands": bands,
        "analyzer": cfg.analyzer, "max_bucket": max_bucket,
    }
    manifest = json.loads(Path(index_dir, "manifest.json").read_text())
    if manifest != want:
        raise ValueError(
            f"minhash index at {index_dir} was built with {manifest}, "
            f"probe asked for {want} — rebuild or match parameters"
        )
    exact = _exact_against(
        spark.read.parquet(str(Path(index_dir) / "sha")), batch
    )
    rest = batch.join(exact.select("doc_id"), "doc_id", "left_anti")
    sig_rest = _pin(minhash_signatures(rest, cfg, n, num_hashes))
    base_bands = spark.read.parquet(str(Path(index_dir) / "bands"))
    cand = _pin(
        _band_rows(sig_rest, num_hashes, bands)
        .join(
            base_bands.select(
                "band", "band_key", F.col("doc_id").alias("match_id")
            ),
            ["band", "band_key"],
        )
        .select("doc_id", "match_id")
        .distinct()
    )
    # batch shingles re-derived for candidate docs only (same push-ahead
    # semi-join as the base side below)
    sh_rest = shingles(
        rest.join(
            F.broadcast(cand.select("doc_id").distinct()), "doc_id", "left_semi"
        ),
        cfg, n,
    )
    # base shingles ONLY for candidate docs: the semi-join pushes the
    # candidate ids into the base scan before any tokenization happens
    cand_base = base.join(
        F.broadcast(
            cand.select(F.col("match_id").alias("doc_id")).distinct()
        ),
        "doc_id",
        "left_semi",
    )
    sh_base = shingles(cand_base, cfg, n).withColumnRenamed(
        "doc_id", "match_id"
    )
    return exact.unionByName(
        _verify_near(cand, sh_rest, sh_base, min_jaccard)
    )


def _verify_near(
    cand: DataFrame, sh_rest: DataFrame, sh_base: DataFrame,
    min_jaccard: float,
) -> DataFrame:
    """Cross-corpus candidate verification shared by dedup_against and
    dedup_against_index: exact Jaccard over candidate shingle sets, best
    base match per batch doc by (jaccard desc, match_id asc)."""
    sets_rest = sh_rest.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("set_a")
    )
    sets_base = sh_base.groupBy("match_id").agg(
        F.collect_set("shingle").alias("set_b")
    )
    return (
        sets_rest.join(F.broadcast(cand), "doc_id")
        .join(F.broadcast(sets_base), "match_id")
        .withColumn("inter", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("set_a") + F.size("set_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .groupBy("doc_id")
        .agg(
            F.max(
                F.struct(F.col("jaccard"), (-F.col("match_id")).alias("nid"))
            ).alias("m")
        )
        .select(
            "doc_id",
            (-F.col("m.nid")).cast("long").alias("match_id"),
            F.lit("near").alias("kind"),
            F.round(F.col("m.jaccard") * 10000).cast("long").alias(
                "jaccard_e4"
            ),
        )
    )


def near_dup_clusters(
    docs: DataFrame,
    cfg: EngineConfig | None = None,
    n: int = 3,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
    threshold_e4: int = 6000,
    max_iters: int = 20,
) -> DataFrame:
    """(doc_id, cluster_id): connected components over verified near-dup
    pairs (round(jaccard·1e4) ≥ threshold_e4); cluster_id = min doc_id of
    the component, singletons map to themselves — the canonicalization
    step a dedup pipeline runs after pair generation (keep one doc per
    cluster).

    Scale shape: iterative min-label propagation over the edge list, which
    after LSH verification is ≈|true near-duplicates| (tiny next to the
    corpus). Rounds = component diameter — near-dup clusters are shallow
    (a dup of a dup of a dup), so this converges in a handful of rounds;
    each round is two hash joins + a groupBy on the edge relation, with a
    local checkpoint to truncate lineage. The convergence check is a
    count of changed labels (one scalar per round, no data collect)."""
    # thresholded in e4 space so the DuckDB oracle's integer comparison
    # can never disagree at the rounding boundary
    edges = (
        _lsh_verified(docs, cfg, n, num_hashes, bands)
        .where(
            F.round(F.col("jaccard") * 10000).cast("long") >= threshold_e4
        )
        .select("doc_a", "doc_b")
    )
    und = _pin_iter(
        edges.unionByName(
            edges.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        ).distinct()
    )
    labels = _pin_iter(
        und.select(F.col("doc_a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iters):
        neighbor_min = (
            und.join(labels, und["doc_b"] == labels["node"])
            .groupBy(F.col("doc_a").alias("node2"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nmin"), F.col("label")) < F.col("label"))
                .cast("int")
                .alias("changed"),
            )
        )
        new_labels = _pin_iter(new_labels)
        changed = new_labels.agg(F.sum("changed")).collect()[0][0] or 0
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    return (
        docs.select("doc_id")
        .join(labels, docs["doc_id"] == labels["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("doc_id")).alias("cluster_id"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(docs: DataFrame, cfg: EngineConfig | None = None,
            bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): tf-weighted bit-vote SimHash over md5(term) bits,
    packed into a signed BIGINT (63 bits). Ties (vote sum == 0) resolve to
    bit 0.

    Shape: ONE hash aggregate with ``bits`` conditional-sum columns over
    the (doc, term, tf) relation — no row explosion. (The previous design
    exploded 63 rows per (doc, term) before aggregating, a 63× shuffle-row
    amplification of the token stream; wide codegen'd aggregates compute
    the identical integer votes with zero amplification.) Bit j of md5 is
    bit (3 - j%4) of hex digit j//4; the 16 digit values are projected
    once and each vote column reads its digit."""
    cfg = cfg or EngineConfig()
    toks = tokens_raw_column(cfg)
    tf = (
        docs.withColumn("toks", toks(F.col("text")))
        .select("doc_id", F.explode_outer("toks").alias("term"))
        .where(F.col("term").isNotNull() & (F.col("term") != ""))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", F.md5("term"))
    )
    ndigits = (bits + 3) // 4
    digit_cols = {
        f"d_{i}": F.expr(
            f"instr('0123456789abcdef', substring(h, {i + 1}, 1)) - 1"
        )
        for i in range(ndigits)
    }
    tf = tf.withColumns(digit_cols)
    vote_aggs = [
        F.sum(
            F.col("tf")
            * (
                F.shiftright(F.col(f"d_{j // 4}"), 3 - j % 4).bitwiseAND(F.lit(1))
                * 2
                - 1
            )
        ).alias(f"v_{j}")
        for j in range(bits)
    ]
    votes = tf.groupBy("doc_id").agg(*vote_aggs)
    packed = None
    for j in range(bits):
        term = F.when(
            F.col(f"v_{j}") > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed + term
    return votes.select("doc_id", packed.alias("simhash"))


def simhash_top_pairs(
    docs: DataFrame, cfg: EngineConfig | None = None, top: int = 50,
    bands: int = SIMHASH_BANDS, bits: int = SIMHASH_BITS,
    max_bucket: int | None = MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share ≥1 of ``bands`` bit-bands
    (equi-join — the scalable step), ranked by Hamming distance ascending.
    Buckets above ``max_bucket`` are dropped before the self-join
    (``_cap_buckets``) — SimHash bands degenerate especially hard on
    template-heavy corpora because similar token DISTRIBUTIONS (not just
    near-dup pairs) collide. Output: doc_a, doc_b, hamming."""
    width = bits // bands
    mask = (1 << width) - 1
    # (doc_id, int64) — one tiny row per doc, pinned once; referenced by
    # the band self-join sides + the two hamming-join sides below
    sh = _pin(simhash(docs, cfg, bits))
    band_structs = [
        F.struct(
            F.lit(b).cast("int").alias("band"),
            F.shiftright(F.col("simhash"), b * width)
            .bitwiseAND(F.lit(mask))
            .alias("band_key"),
        )
        for b in range(bands)
    ]
    banded = _cap_buckets(
        sh.select(
            "doc_id", F.explode(F.array(*band_structs)).alias("bb")
        ).select("doc_id", "bb.band", "bb.band_key"),
        max_bucket,
    )
    a = banded.alias("a")
    b_ = banded.alias("b")
    cand = (
        a.join(b_, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ha = sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("simhash", "h_a")
    hb = sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("simhash", "h_b")
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("long").alias("hamming"),
        )
        .orderBy(F.asc("hamming"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(top)
    )


# ---------------------------------------------------------------------------
# embedding near-dup (brute force; the LSH scale path lives in similarity.py)
# ---------------------------------------------------------------------------

def embedding_top_pairs(emb: DataFrame, top: int = 50) -> DataFrame:
    """Top-N most-cosine-similar embedding pairs, exact all-pairs.
    O(n²) — the correctness baseline; similarity.lsh_ann is the scale
    path. Output: vec_a, vec_b, sim_e4."""
    v = emb.withColumn("vec", F.transform("embedding", lambda x: x.cast("double")))
    dot = F.aggregate(
        F.zip_with("a_vec", "b_vec", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def norm(c: str) -> Column:
        return F.sqrt(
            F.aggregate(
                F.zip_with(c, c, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
            )
        )

    a = v.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("a_vec"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("b_vec"))
    return (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(dot / (norm("a_vec") * norm("b_vec")) * 10000)
            .cast("long")
            .alias("sim_e4"),
        )
        .orderBy(F.desc("sim_e4"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(top)
    )
