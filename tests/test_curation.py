"""Curation dataops: stratified sampling, mixture weights, benchmark
contamination, sequence packing.

The driver oracle checks each against DuckDB end-to-end; these tests pin
the semantics the oracle can't see — determinism across runs and
partitionings, statistical behavior of the hash sampler, planted
contamination, and the packing invariants (chunk reconstruction)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fastcatsearch3_spark.dataops import curation as CU

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_sample_deterministic_and_partition_invariant(spark, docs):
    a = CU.sample_stratified(docs, {"en": 0.5}, salt="s1").toPandas()
    b = (
        CU.sample_stratified(docs.repartition(13), {"en": 0.5}, salt="s1")
        .toPandas()
    )
    assert sorted(a.doc_id) == sorted(b.doc_id)
    # a different salt draws a different (but again deterministic) sample
    c = CU.sample_stratified(docs, {"en": 0.5}, salt="s2").toPandas()
    assert sorted(a.doc_id) != sorted(c.doc_id)


def test_sample_rates_respected(spark, docs):
    n_en = docs.where(F.col("lang") == "en").count()
    full = CU.sample_stratified(docs, {"en": 1.0}, salt="x").toPandas()
    assert len(full) == n_en  # rate 1.0 keeps the whole stratum
    assert set(full.stratum) == {"en"}  # others default to rate 0
    half = CU.sample_stratified(docs, {"en": 0.5}, salt="x").toPandas()
    assert 0.3 * n_en < len(half) < 0.7 * n_en
    # the sample is a subset of the stratum, u below the cutoff
    assert set(half.doc_id) <= set(full.doc_id)
    assert (half.u_e6 < 500_000 + 1).all()


def test_mixture_weights_inverse_to_share(spark, docs):
    out = CU.mixture_weights(
        docs, {"en": 0.5, "fr": 0.5}
    ).toPandas().set_index("stratum")
    assert abs(out.share_e6.sum() - 1_000_000) <= len(out)  # shares sum to 1
    # weight = target/share exactly (to rounding)
    for s in ("en", "fr"):
        share = out.loc[s, "share_e6"] / 1e6
        assert out.loc[s, "weight_e6"] == pytest.approx(
            0.5 / share * 1e6, abs=len(out) + 2
        )
    # unlisted strata get weight 0
    others = out.drop(["en", "fr"])
    assert (others.weight_e6 == 0).all()


def test_contamination_planted(spark):
    words = " ".join(f"w{i}" for i in range(12))
    rows = [
        (1, words + " tail one", "eval"),
        (2, "prefix " + words, "train"),        # shares the 8-grams of `words`
        (3, "completely different text " * 5, "train"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = CU.ngram_contamination(
        df.where(F.col("src") != "x"), df.where(F.col("src") == "eval"), n=8
    ).toPandas()
    assert set(out.doc_id) == {2}
    # w0..w11 = 12 tokens -> 5 8-grams; 'prefix w0..w11' shares exactly those 5
    assert int(out.shared_ngrams.iloc[0]) == 5


def test_contamination_excludes_eval_docs(spark, docs):
    ev = docs.where(F.col("source") == "src0")
    out = CU.ngram_contamination(docs, ev, n=8)
    ev_ids = {r.doc_id for r in ev.select("doc_id").collect()}
    assert not (set(r.doc_id for r in out.collect()) & ev_ids)


def test_pack_sequences_invariants(spark, docs):
    cap = 256
    out = CU.pack_sequences(docs, capacity=cap, n_buckets=4).toPandas()
    assert (out.tokens > 0).all()
    for _, grp in out.groupby("bucket"):
        g = grp.sort_values("doc_id").reset_index(drop=True)
        cum = 0
        for r in g.itertuples():
            # (seq_id, start_off) is exactly the running-total chunking
            assert r.seq_id == cum // cap
            assert r.start_off == cum % cap
            cum += r.tokens
    # partition-invariant: same packing after a repartition
    out2 = CU.pack_sequences(
        docs.repartition(17), capacity=cap, n_buckets=4
    ).toPandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
