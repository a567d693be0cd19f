"""Query serving over the packed index (SURVEY.md §3.1, Q-3..Q-6).

Reference read path: SearchAction → Query tree → per-segment
SegmentSearcher doc-at-a-time clause evaluation → per-node top-k →
cluster merge (server:…job.ClusterSearchJob [K]). Spark mapping:

  Q-3  candidate fetch: postings scan filtered to the analyzed query
       terms — an `isin` predicate pushed to Parquet (bloom filter on
       `term` set at write time), NOT a join, so only matching row-groups
       are read;
  Q-4  scoring: applyInPandas kernel per (segment_id, shard) group —
       every group holds all of its docs' postings for all query terms,
       so AND/OR/NOT and block-max pruning are shard-local and exact;
  Q-6  scatter-gather: each group emits its local top-k; the global
       orderBy(score desc, doc_id asc).limit(k) compiles to Spark's
       TakeOrderedAndProject — the same partial/final top-k merge the
       reference's ClusterSearchJob hand-rolls over netty;
  Q-5  hydrate: the ≤ k×groups surviving hits are joined (broadcast)
       back to docmap for doc_ids, then optionally to the corpus for
       stored fields.

Filters/deletes (P-2..P-7) resolve to shard-local docno sets cogrouped
into the kernel so exclusion happens BEFORE top-k selection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.plans.query import ParsedQuery, parse_query
from fastcatsearch3_spark.plans.scoring import TermPostings, bm25_idf, score_group

KERNEL_SCHEMA = "segment_id int, shard int, docno bigint, score double"


def _make_kernel(
    qidf: dict[str, float],
    not_terms: set[str],
    *,
    k: int,
    op: str,
    mode: str,
    k1: float,
    b: float,
    avgdl: float,
    n_required: int,
    with_mask: bool,
    allow_active: bool,
    term_groups: dict[str, tuple[int, ...]] | None = None,
    n_groups: int | None = None,
    msm: int | None = None,
    phrases: list[list[str]] | None = None,
    term_avgdl: dict[str, float] | None = None,
):
    """Build the per-(segment, shard) scoring function (U-5).
    ``term_avgdl``: per-term avgdl overrides for field-qualified terms
    (per-field BM25 length norm)."""

    _EMPTY = pd.DataFrame(
        {
            "segment_id": pd.Series([], dtype="int32"),
            "shard": pd.Series([], dtype="int32"),
            "docno": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float64"),
        }
    )

    def score_rows(pdf: pd.DataFrame, mask_pdf: pd.DataFrame | None) -> pd.DataFrame:
        if len(pdf) == 0:
            return _EMPTY
        seg = int(pdf["segment_id"].iloc[0])
        shard = int(pdf["shard"].iloc[0])
        pos_blobs = (
            pdf["positions"] if "positions" in pdf.columns else [None] * len(pdf)
        )
        pos_tps, neg_tps, pos_groups = [], [], []
        by_term: dict[str, TermPostings] = {}
        for term, blob, pblob in zip(pdf["term"], pdf["postings"], pos_blobs):
            tp = TermPostings(
                term=term,
                idf=qidf.get(term, 0.0),
                blob=bytes(blob),
                pos_blob=bytes(pblob) if pblob is not None else None,
                avgdl=(term_avgdl or {}).get(term),
            )
            by_term[term] = tp
            if term in not_terms:
                neg_tps.append(tp)
            else:
                pos_tps.append(tp)
                if term_groups is not None:
                    pos_groups.append(term_groups[term])
        phrase_tps = None
        if phrases:
            phrase_tps = []
            for ph in phrases:
                if any(t not in by_term for t in ph):
                    return _EMPTY  # a phrase term absent here → no match
                phrase_tps.append([by_term[t] for t in ph])
        if op == "AND":
            # required coverage in this shard: every term (or, with synonym
            # groups, every group) must have at least one posting list here
            covered = (
                len({gid for gs in pos_groups for gid in gs})
                if term_groups is not None
                else len(pos_tps)
            )
            required = n_groups if term_groups is not None else n_required
            if covered < required:
                return _EMPTY
        if not pos_tps:
            return _EMPTY
        allow = deny = None
        if allow_active:
            # an allow-filter is in force: an empty allow set for this
            # shard means nothing here passes the filter
            a = (
                mask_pdf.loc[mask_pdf["kind"] == 1, "docno"].to_numpy(np.int64)
                if mask_pdf is not None and len(mask_pdf)
                else np.zeros(0, dtype=np.int64)
            )
            allow = np.sort(a).astype(np.uint64)
        if mask_pdf is not None and len(mask_pdf):
            d = mask_pdf.loc[mask_pdf["kind"] == -1, "docno"].to_numpy(np.int64)
            if d.size:
                deny = np.sort(d).astype(np.uint64)
        docnos, scores = score_group(
            pos_tps,
            k=k,
            op=op,
            mode=mode,
            k1=k1,
            b=b,
            avgdl=avgdl,
            not_terms=neg_tps,
            allow_docnos=allow,
            deny_docnos=deny,
            groups=pos_groups if term_groups is not None else None,
            n_groups=n_groups,
            msm=msm,
            phrase_tps=phrase_tps,
        )
        return pd.DataFrame(
            {
                "segment_id": np.full(docnos.size, seg, dtype=np.int32),
                "shard": np.full(docnos.size, shard, dtype=np.int32),
                "docno": docnos.astype(np.int64),
                "score": scores,
            }
        )

    if with_mask:
        def cogrouped(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            return score_rows(left, right)

        return cogrouped

    def grouped(pdf: pd.DataFrame) -> pd.DataFrame:
        return score_rows(pdf, None)

    return grouped


def search_index(
    spark: SparkSession,
    store,  # fastcatsearch3_spark.index.IndexStore
    query: str | ParsedQuery,
    k: int = 10,
    mode: str = "bmw",
    allow_doc_ids: DataFrame | None = None,
    apply_deletes: bool = True,
    hydrate: bool = False,
    corpus_df: DataFrame | None = None,
    offset: int = 0,
) -> DataFrame:
    """Top-k BM25 search. Returns (doc_id, score) ordered by
    (score desc, doc_id asc); with ``hydrate``, stored corpus fields too.
    ``offset`` pages past the first N results (the reference's sn/ln
    paging, O-2): each shard kernel keeps offset+k local hits so the
    global merge can skip offset rows exactly."""
    cfg = store.config()
    pq = parse_query(query, cfg) if isinstance(query, str) else query
    stats = store.stats()
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    # field-qualified terms normalize against their own field's avgdl
    avgdl_by_field = stats.get("avgdl_by_field") or {}
    term_avgdl = {
        t: avgdl_by_field[t.split(":", 1)[0]]
        for t in pq.terms + pq.not_terms
        if ":" in t and t.split(":", 1)[0] in avgdl_by_field
    }

    all_terms = list(dict.fromkeys(pq.terms + pq.not_terms))
    if not pq.terms or n_docs == 0:
        return spark.createDataFrame([], "doc_id long, score double")

    lex = (
        store.lexicon(spark)
        .where(F.col("term").isin(all_terms))
        .select("term", "df")
        .collect()
    )
    dfmap = {r["term"]: r["df"] for r in lex}
    if pq.op == "AND":
        if pq.groups is None:
            if any(t not in dfmap for t in pq.terms):
                return spark.createDataFrame([], "doc_id long, score double")
        else:
            # synonym groups: AND fails only if a whole group is missing
            # (a term credits every group it belongs to)
            present_groups = {
                gid for t, gs in zip(pq.terms, pq.groups) if t in dfmap
                for gid in gs
            }
            if len(present_groups) < pq.n_groups:
                return spark.createDataFrame([], "doc_id long, score double")
    terms = [t for t in pq.terms if t in dfmap]
    term_groups = (
        {t: gs for t, gs in zip(pq.terms, pq.groups) if t in dfmap}
        if pq.groups is not None
        else None
    )
    not_terms = [t for t in pq.not_terms if t in dfmap]
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    if pq.msm is not None and pq.op == "OR":
        # enough distinct terms/groups must exist at all to reach msm
        n_present = (
            len({gid for gs in term_groups.values() for gid in gs})
            if term_groups is not None
            else len(terms)
        )
        if n_present < pq.msm:
            return spark.createDataFrame([], "doc_id long, score double")
    qidf = {t: float(bm25_idf(n_docs, dfmap[t])) for t in terms}

    phrases = [ph for ph in pq.phrases if all(t in dfmap for t in ph)]
    if pq.phrases and len(phrases) < len(pq.phrases):
        # a phrase containing an unindexed term can never match
        return spark.createDataFrame([], "doc_id long, score double")
    if phrases and pq.op != "AND":
        raise ValueError("phrase queries are supported under AND semantics")
    postings_df = store.postings(spark)
    if phrases and "positions" not in postings_df.columns:
        raise ValueError(
            "phrase query against an index without positions — rebuild with "
            "EngineConfig(store_positions=True)"
        )
    fetch_terms = terms + not_terms
    # explicit projection: the positions sidecar column is scanned ONLY
    # when a phrase needs it (column pruning = Lucene's .pos file split)
    cols = ["segment_id", "shard", "term", "postings"] + (
        ["positions"] if phrases else []
    )
    cand = (
        store.postings(spark)
        .where(F.col("term").isin(fetch_terms))
        .select(*cols)
    )

    masks = []
    if allow_doc_ids is not None:
        allowed = (
            store.docmap(spark)
            .join(allow_doc_ids.select("doc_id"), "doc_id")
            .select("segment_id", "shard", "docno", F.lit(1).alias("kind"))
        )
        masks.append(allowed)
    if apply_deletes:
        # the shard-local denied set is materialized ONCE per index epoch
        # (IndexStore.denied_mask) — not recomputed per query; a tombstone
        # written at segment N masks copies in segments < N only (the
        # re-ingested copy in segment N itself stays live) — the
        # reference's per-segment DeleteIdSet (core:ir.index.DeleteIdSet
        # [K]) applied to older segments
        denied = store.denied_mask(spark)
        if denied is not None:
            masks.append(
                denied.select(
                    "segment_id", "shard", "docno", F.lit(-1).alias("kind")
                )
            )

    kernel = _make_kernel(
        qidf,
        set(not_terms),
        k=offset + k,  # each shard must hold enough hits to page past offset
        op=pq.op,
        mode=mode,
        k1=cfg.k1,
        b=cfg.b,
        avgdl=avgdl,
        n_required=len(terms),
        with_mask=bool(masks),
        allow_active=allow_doc_ids is not None,
        term_groups=term_groups,
        n_groups=pq.n_groups if term_groups is not None else None,
        msm=pq.msm,
        phrases=phrases or None,
        term_avgdl=term_avgdl or None,
    )
    if masks:
        mask_df = masks[0]
        for m in masks[1:]:
            mask_df = mask_df.unionByName(m)
        hits = (
            cand.groupBy("segment_id", "shard")
            .cogroup(mask_df.groupBy("segment_id", "shard"))
            .applyInPandas(kernel, KERNEL_SCHEMA)
        )
    else:
        hits = cand.groupBy("segment_id", "shard").applyInPandas(
            kernel, KERNEL_SCHEMA
        )

    # Q-5 hydrate docnos → doc_ids. The kernel output is result-sized
    # (≤ (offset+k) rows per (segment, shard) group), so collect it and
    # PUSH the hit keys into the docmap scan as predicates: segment_id
    # prunes partitions, (shard, docno IN …) prunes row groups (docmap is
    # written sorted by (shard, docno); at cluster scale it would also be
    # bucketed by shard). The previous shape — full docmap scan + broadcast
    # join — read the entire docmap per query, the dominant per-query cost
    # at 10^12 docs. The collect is bounded by the result size, the same
    # class as the final toPandas, never O(corpus).
    hit_rows = hits.collect()
    if not hit_rows:
        out = spark.createDataFrame([], "doc_id long, score double")
    else:
        hits_df = spark.createDataFrame(hit_rows, schema=hits.schema)
        by_part: dict[tuple[int, int], list[int]] = {}
        for r in hit_rows:
            by_part.setdefault((r["segment_id"], r["shard"]), []).append(
                r["docno"]
            )
        seg_pred = F.col("segment_id").isin(
            sorted({seg for seg, _ in by_part})
        )
        part_pred = None
        for (seg, sh), dns in sorted(by_part.items()):
            c = (
                (F.col("segment_id") == seg)
                & (F.col("shard") == sh)
                & F.col("docno").isin(dns)
            )
            part_pred = c if part_pred is None else (part_pred | c)
        dm = (
            store.docmap(spark)
            .select("segment_id", "shard", "docno", "doc_id")
            .where(seg_pred & part_pred)
        )
        out = (
            dm.join(F.broadcast(hits_df), ["segment_id", "shard", "docno"])
            .select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .offset(offset)
            .limit(k)
        )
    if hydrate:
        if corpus_df is not None:
            corpus = corpus_df
        elif store.has_corpus():
            corpus = store.corpus(spark)
        else:
            raise ValueError(
                "hydrate=True needs stored fields: pass corpus_df= or keep a "
                "corpus/ copy in the index root (the index itself stores only "
                "doc_ids — SURVEY.md Q-5)"
            )
        out = (
            corpus.join(F.broadcast(out), "doc_id")
            .select("doc_id", "score", "repo", "path", "commit", "lang", "content")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
    return out
