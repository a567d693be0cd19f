"""Training-data pipeline operators (dataops/): dedup, similarity,
text stats, multimodal plumbing. Cross-engine parity is covered by the
driver's DuckDB oracle; these tests pin the algebraic invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.dataops import dedup as D
from fastcatsearch3_spark.dataops import multimodal as MM
from fastcatsearch3_spark.dataops import similarity as SIM
from fastcatsearch3_spark.dataops import textstats as TS

CFG = EngineConfig()
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup_with_planted_duplicates(spark, docs):
    twice = docs.unionByName(
        docs.limit(5).withColumn(
            "doc_id", docs.doc_id + 1_000_000
        )
    )
    out = D.exact_dedup(twice).toPandas()
    assert (out["n_copies"] == 2).sum() == 5
    # survivor is always the smaller doc_id (the original)
    dups = out[out["n_copies"] == 2]
    assert (dups["keep_id"] < 1_000_000).all()


def test_minhash_candidates_subset_of_jaccard_domain(spark, docs):
    """Every LSH candidate pair must carry the same verified Jaccard as the
    exhaustive top-pairs relation (same pair → same score)."""
    lsh = D.minhash_lsh_pairs(docs, CFG, top=1000).toPandas()
    exact = D.jaccard_top_pairs(docs, CFG, top=10**6).toPandas()
    merged = lsh.merge(exact, on=["doc_a", "doc_b"], suffixes=("_l", "_e"))
    assert len(merged) == len(lsh)
    assert (merged["jaccard_e4_l"] == merged["jaccard_e4_e"]).all()


def test_planted_near_duplicate_is_found(spark, docs):
    """A doc with one appended word (Jaccard ≈ 0.97 — high enough that the
    16-hash/4-band LSH miss probability is ~2e-4) must surface in the
    Jaccard top pairs, the MinHash-LSH candidates, and the SimHash pairs."""
    row = docs.orderBy("doc_id").limit(1).toPandas().iloc[0]
    words = row["text"].split() + ["zzzmutant"]
    clone = pd.DataFrame(
        [{
            "doc_id": 9_999_999, "text": " ".join(words), "lang": row["lang"],
            "source": row["source"], "n_chars": len(" ".join(words)),
        }]
    )
    planted = docs.unionByName(spark.createDataFrame(clone))
    top = D.jaccard_top_pairs(planted, CFG, top=50).toPandas()
    mine = top[(top["doc_a"] == row["doc_id"]) & (top["doc_b"] == 9_999_999)]
    assert len(mine) == 1 and mine.iloc[0]["jaccard_e4"] >= 9000
    lsh = D.minhash_lsh_pairs(planted, CFG, top=50).toPandas()
    assert ((lsh["doc_a"] == row["doc_id"]) & (lsh["doc_b"] == 9_999_999)).any()
    # and simhash: hamming distance of the clone pair is far below random
    sh = D.simhash_top_pairs(planted, CFG, top=50).toPandas()
    pair = sh[(sh["doc_a"] == row["doc_id"]) & (sh["doc_b"] == 9_999_999)]
    assert len(pair) == 1 and pair.iloc[0]["hamming"] <= 8


def test_simhash_is_deterministic(spark, docs):
    a = D.simhash(docs.limit(50), CFG).toPandas().set_index("doc_id")
    b = D.simhash(docs.limit(50), CFG).toPandas().set_index("doc_id")
    pd.testing.assert_frame_equal(a.sort_index(), b.sort_index())


def test_lsh_ann_subset_of_brute_force(spark, emb):
    """LSH results are exact cosine scores over a bucket subset: every hit
    must appear in the brute-force ranking with the identical score."""
    brute = SIM.brute_force_topk(emb, probe_id=0, k=10**6).toPandas()
    lsh = SIM.lsh_ann_topk(emb, probe_id=0, k=100).toPandas()
    merged = lsh.merge(brute, on="vec_id", suffixes=("_l", "_b"))
    assert len(merged) == len(lsh) > 0
    assert (merged["sim_e4_l"] == merged["sim_e4_b"]).all()


def test_lang_id_prefers_english_on_english_stopwords(spark):
    pdf = pd.DataFrame(
        [
            {"doc_id": 1, "text": "the cat of the house is in a tree",
             "lang": "x", "source": "s", "n_chars": 1},
            {"doc_id": 2, "text": "der hund ist ein und das haus zu",
             "lang": "x", "source": "s", "n_chars": 1},
            {"doc_id": 3, "text": "xyzzy qwerty", "lang": "x", "source": "s",
             "n_chars": 1},
        ]
    )
    out = (
        TS.lang_id(spark.createDataFrame(pdf), CFG)
        .toPandas()
        .set_index("doc_id")["pred_lang"]
    )
    assert out[1] == "en" and out[2] == "de" and out[3] == "und"


def test_fingerprint_stable_and_set_determined(spark, docs):
    """k-min fingerprints depend only on the shingle set: deterministic
    across runs, and a doc_id-relabelled copy of a doc gets the identical
    fingerprint."""
    fp = TS.fingerprint(docs.limit(30), CFG).toPandas()
    again = TS.fingerprint(docs.limit(30), CFG).toPandas()
    assert fp.sort_values("doc_id").reset_index(drop=True).equals(
        again.sort_values("doc_id").reset_index(drop=True)
    )
    relabeled = docs.limit(1).withColumn("doc_id", docs.doc_id + 777_000)
    both = TS.fingerprint(docs.limit(1).unionByName(relabeled), CFG).toPandas()
    assert both["fingerprint"].nunique() == 1 and len(both) == 2


def test_multimodal_fake_decode_roundtrip(spark, docs):
    out = MM.extract_features(docs.limit(20), kind="raw").toPandas()
    assert len(out) == 20
    assert (out["n_bytes"] > 0).all()
    assert (out["width"] * out["height"] >= out["n_bytes"]).all()
    feats = np.stack(out["feature"].to_numpy())
    assert feats.shape == (20, 8)
    assert np.allclose(feats.sum(axis=1), 1.0, atol=1e-3)


def test_multimodal_missing_codec_raises(spark, docs):
    missing = [
        kind for kind in ("image", "audio", "video")
        if not MM.codec_available(kind)
    ]
    if not missing:
        pytest.skip("all codec libraries installed — nothing to probe")
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        MM.extract_features(docs.limit(1), kind=missing[0]).collect()


@pytest.mark.skipif(
    not MM.codec_available("image"),
    reason="Pillow not installed — decoder('image') degrades to the "
    "documented NotImplementedError (probe in multimodal.codec_available)",
)
def test_multimodal_real_image_codec(spark):
    """Integration: when Pillow IS present the registry returns a real
    decode and the same mapInPandas plumbing extracts true dimensions
    and pixel stats from encoded PNG payloads."""
    import io

    from PIL import Image

    rows = []
    for i, (w, h, color) in enumerate([(5, 3, 0), (4, 4, 128), (2, 7, 255)]):
        im = Image.new("L", (w, h), color)
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        rows.append((i, bytearray(buf.getvalue()), "image"))
    df = spark.createDataFrame(
        rows, "doc_id bigint, payload binary, modality string"
    )
    out = (
        MM.extract_features(df, kind="image")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["width"].tolist() == [5, 4, 2]
    assert out["height"].tolist() == [3, 4, 7]
    assert np.allclose(out["mean_byte"].tolist(), [0.0, 128.0, 255.0])
    feats = np.stack(out["feature"].to_numpy())
    assert np.allclose(feats.sum(axis=1), 1.0, atol=1e-3)


def test_dedup_against_planted(spark):
    """Exact copy → 'exact'; long doc with 2 appended words → 'near' with
    jaccard = 38/40; novel text → no row; base is never self-deduped."""
    from fastcatsearch3_spark.dataops.dedup import dedup_against

    base_text = " ".join(f"w{i}" for i in range(40))
    base = spark.createDataFrame(
        [(1, base_text), (2, "some other document entirely here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (101, base_text),
            (102, base_text + " xx yy"),
            (103, "zz yy xx ww vv uu tt ss"),
        ],
        "doc_id long, text string",
    )
    out = dedup_against(base, batch).toPandas().set_index("doc_id")
    assert out.loc[101, "kind"] == "exact"
    assert out.loc[101, "match_id"] == 1
    assert out.loc[101, "jaccard_e4"] == 10000
    # 40 tokens → 38 shingles; +2 words → 40 shingles, 38 shared
    assert out.loc[102, "kind"] == "near"
    assert out.loc[102, "match_id"] == 1
    assert out.loc[102, "jaccard_e4"] == round(38 / 40 * 10000)
    assert 103 not in out.index and len(out) == 2


def test_dedup_against_index_equals_direct(spark, tmp_path):
    """Probing the persisted band table == computing base bands inline."""
    from fastcatsearch3_spark.dataops.dedup import (
        dedup_against,
        dedup_against_index,
        minhash_index_build,
    )

    base_text = " ".join(f"w{i}" for i in range(40))
    base = spark.createDataFrame(
        [(1, base_text), (2, "some other document entirely here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(101, base_text), (102, base_text + " xx yy"), (103, "zz yy xx")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "mh_index")
    minhash_index_build(base, idx)
    direct = dedup_against(base, batch).toPandas().sort_values("doc_id")
    via_idx = (
        dedup_against_index(spark, idx, base, batch)
        .toPandas()
        .sort_values("doc_id")
    )
    assert direct.reset_index(drop=True).equals(via_idx.reset_index(drop=True))


def test_unigram_logprob_planted(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "a b")], "doc_id long, text string"
    )
    out = TS.unigram_logprob(docs).toPandas().set_index("doc_id")
    # cf: a=4, b=1, total=5
    assert out.loc[1, "avg_logprob_e4"] == round(math.log(4 / 5) * 10000)
    want2 = (math.log(4 / 5) + math.log(1 / 5)) / 2
    assert out.loc[2, "avg_logprob_e4"] == round(want2 * 10000)


def test_char_entropy_planted(spark):
    """'aaaa' → 0 bits; 'ab' → 1 bit; 'abcd' → 2 bits."""
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd")], "doc_id long, text string"
    )
    out = TS.char_entropy(docs).toPandas().set_index("doc_id")
    assert out.loc[1, "entropy_e4"] == 0 and out.loc[1, "n_chars"] == 4
    assert out.loc[2, "entropy_e4"] == 10000
    assert out.loc[3, "entropy_e4"] == 20000


def test_quantized_ann_subset_of_brute_force(spark):
    """Quantized candidates rescore EXACTLY, so every returned (vec_id,
    sim_e4) must appear in the brute-force relation with the same score;
    at rescore_mult covering the corpus, results equal brute force."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bf = SIM.brute_force_topk(emb, probe_id=0, k=10).toPandas()
    qz = SIM.quantized_ann_topk(emb, probe_id=0, k=10, rescore_mult=4).toPandas()
    bf_all = SIM.brute_force_topk(emb, probe_id=0, k=10_000).toPandas()
    exact = dict(zip(bf_all["vec_id"], bf_all["sim_e4"]))
    assert all(exact[v] == s for v, s in zip(qz["vec_id"], qz["sim_e4"]))
    # with the candidate pool = whole corpus, quantization can't miss
    full = SIM.quantized_ann_topk(
        emb, probe_id=0, k=10, rescore_mult=10_000
    ).toPandas()
    assert full["vec_id"].tolist() == bf["vec_id"].tolist()
    assert full["sim_e4"].tolist() == bf["sim_e4"].tolist()


def test_repetition_stats_planted(spark):
    """'a b a b a b' : bigrams [ab,ba,ab,ba,ab] → top 3/5; trigrams
    [aba,bab,aba,bab] → 2 distinct of 4 → dup 1/2. A no-repeat doc
    scores 0 dup and 1/total top share."""
    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "w x y z q r")],
        "doc_id long, text string",
    )
    out = (
        TS.repetition_stats(docs).toPandas().set_index("doc_id")
    )
    assert out.loc[1, "n_bigrams"] == 5
    assert out.loc[1, "top_bigram_frac_e4"] == 6000
    assert out.loc[1, "dup_trigram_frac_e4"] == 5000
    assert out.loc[2, "n_bigrams"] == 5
    assert out.loc[2, "top_bigram_frac_e4"] == 2000
    assert out.loc[2, "dup_trigram_frac_e4"] == 0


def test_multimodal_resize_matches_pointwise(spark, docs):
    """Vectorized nearest-neighbor resize == a per-row python resampler."""
    out = MM.resize(docs.limit(15), out_w=4, out_h=3).toPandas()
    src = docs.limit(15).select("doc_id", "text").toPandas()
    by_id = dict(zip(src["doc_id"], src["text"]))
    assert len(out) == 15
    for _, r in out.iterrows():
        buf = by_id[r["doc_id"]].encode("utf-8")
        n = len(buf)
        w = max(int(np.sqrt(n)), 1)
        h = (n + w - 1) // w
        want = [
            buf[min((ro * h // 3) * w + (co * w // 4), n - 1)]
            for ro in range(3)
            for co in range(4)
        ]
        assert list(r["pixels"]) == want


def test_multimodal_resize_empty_payload(spark):
    # empty payloads first AND last in the batch (the trailing case would
    # gather one past the flat buffer without the global index clamp)
    empty = spark.createDataFrame(
        [(1, ""), (2, "abcdef"), (3, "")], "doc_id long, text string"
    ).coalesce(1)
    out = MM.resize(empty, out_w=2, out_h=2).toPandas().set_index("doc_id")
    assert list(out.loc[1, "pixels"]) == [0, 0, 0, 0]
    assert all(p > 0 for p in out.loc[2, "pixels"])
    assert list(out.loc[3, "pixels"]) == [0, 0, 0, 0]


def test_multimodal_frame_sample(spark, docs):
    """Every 3rd 50-byte frame; sums and lengths match a python cut."""
    out = MM.frame_sample(docs.limit(10), frame_bytes=50, every=3).toPandas()
    src = docs.limit(10).select("doc_id", "text").toPandas()
    for _, s in src.iterrows():
        buf = s["text"].encode("utf-8")
        frames = [buf[i : i + 50] for i in range(0, len(buf), 50)][::3]
        got = out[out["doc_id"] == s["doc_id"]].sort_values("frame_idx")
        assert got["frame_idx"].tolist() == list(range(0, 3 * len(frames), 3))
        assert got["frame_len"].tolist() == [len(f) for f in frames]
        assert got["byte_sum"].tolist() == [sum(f) for f in frames]


def test_near_dup_clusters_transitive(spark):
    """A~B and B~C near-dups (A never banded with C directly) must land in
    ONE cluster labelled min(doc_id); unrelated docs stay singletons."""
    import pandas as pd

    from fastcatsearch3_spark.dataops.dedup import near_dup_clusters

    words = [f"w{i}" for i in range(40)]
    base = " ".join(words)
    b = " ".join(["x0" if w == "w39" else w for w in words])   # ~A (1 edit)
    c = " ".join(
        ["x0" if w == "w39" else ("x1" if w == "w0" else w) for w in words]
    )                                                          # ~B (2 edits)
    rows = pd.DataFrame(
        {
            "doc_id": [10, 20, 30, 40],
            "text": [base, b, c, "totally different words entirely here"],
            "lang": "en",
            "source": "s",
            "n_chars": [len(base), len(b), len(c), 36],
        }
    )
    out = (
        near_dup_clusters(spark.createDataFrame(rows), n=3, threshold_e4=5000)
        .toPandas()
        .set_index("doc_id")["cluster_id"]
        .to_dict()
    )
    assert out[10] == out[20] == out[30] == 10
    assert out[40] == 40


def test_ivf_index_matches_inline_and_prunes(spark, tmp_path, sf_dir):
    """The persisted IVF artifact returns the same top-k as the inline
    k-means IVF for the same parameters, and its list scan reads ONLY the
    nprobe probed cid partitions (directory-level pruning)."""
    from pyspark.sql import functions as F

    from fastcatsearch3_spark.dataops.similarity import (
        ivf_ann_topk,
        ivf_index_build,
        ivf_index_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "ivf_idx")
    ivf_index_build(emb, idx, n_centroids=16, train_iters=3)

    probe_id = 7
    probe_vec = [
        float(x)
        for x in emb.where(F.col("vec_id") == probe_id).collect()[0]["embedding"]
    ]
    inline = ivf_ann_topk(
        emb, probe_id=probe_id, k=10, n_centroids=16, nprobe=4, train_iters=3
    ).collect()
    indexed = ivf_index_topk(
        spark, idx, probe_vec, k=10, nprobe=4, exclude_vec_id=probe_id
    ).collect()
    assert [(r["vec_id"], r["sim_e4"]) for r in indexed] == [
        (r["vec_id"], r["sim_e4"]) for r in inline
    ]

    # pruning: the filtered scan must actually read only the probed cid
    # directories (input_file_name() reflects the executed, pruned scan —
    # DataFrame.inputFiles() is pre-pruning and lists everything)
    lists = spark.read.parquet(f"{idx}/lists").where(
        F.col("cid").isin([0, 1])
    )
    touched = {
        r["f"].split("cid=")[1].split("/")[0]
        for r in lists.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    }
    assert touched <= {"0", "1"} and touched


def test_ivf_refresh_incremental(spark, tmp_path, sf_dir):
    """IVF lifecycle (VERDICT r3 #8): refresh on append warm-starts from
    the previous centroids and rewrites ONLY the changed list partitions;
    the refreshed lists are exactly the full relation's assignment under
    the refreshed centroids (correctness invariant), and auto-sizing
    picks ~sqrt(n) centroids."""
    import os

    from pyspark.sql import functions as F

    from fastcatsearch3_spark.dataops.similarity import ivf_index_build

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "ivf_refresh")
    info0 = ivf_index_build(emb, idx, n_centroids=8, train_iters=2)
    assert info0["refreshed"] is False and info0["changed_cids"] is None

    # snapshot per-partition mtimes before the refresh
    def dir_mtimes():
        out = {}
        for d in os.listdir(f"{idx}/lists"):
            if d.startswith("cid="):
                p = f"{idx}/lists/{d}"
                out[d] = max(
                    os.path.getmtime(os.path.join(p, f))
                    for f in os.listdir(p)
                    if not f.startswith(("_", "."))
                )
        return out

    before = dir_mtimes()

    # append: clones of existing vectors (land in existing clusters)
    appended = emb.select("vec_id", "embedding").unionByName(
        emb.limit(12).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    info1 = ivf_index_build(
        appended, idx, n_centroids=None, train_iters=1, refresh=True
    )
    assert info1["refreshed"] is True
    assert info1["n_centroids"] == 8  # inherited from the manifest
    changed = set(info1["changed_cids"])
    assert changed  # the clones landed somewhere

    # invariant: on-disk lists == assignment of the FULL relation under
    # the refreshed centroids (recompute independently)
    cents = {
        int(r["cid"]): list(r["cvec"])
        for r in spark.read.parquet(f"{idx}/centroids").collect()
    }
    import numpy as np

    lists = {
        int(r["vec_id"]): int(r["cid"])
        for r in spark.read.parquet(f"{idx}/lists").collect()
    }
    rows = appended.collect()
    assert len(lists) == len(rows)
    cm = np.array([cents[c] for c in sorted(cents)])
    cm_n = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    for r in rows:
        v = np.array(list(r["embedding"]), dtype=float)
        sims = cm_n @ (v / np.linalg.norm(v))
        want = int(np.argmax(np.round(sims, 12)))  # ties → lowest cid
        assert lists[int(r["vec_id"])] == sorted(cents)[want]

    # only changed partitions were rewritten
    after = dir_mtimes()
    for d, t in before.items():
        cid = int(d.split("=")[1])
        if cid not in changed:
            assert after[d] == t, f"unchanged {d} was rewritten"

    # auto-sizing: n_centroids=None → ~sqrt(n)
    idx2 = str(tmp_path / "ivf_auto")
    info2 = ivf_index_build(emb, idx2, n_centroids=None, train_iters=1)
    import math

    n = emb.count()
    assert info2["n_centroids"] == max(4, min(n, round(math.sqrt(n))))


def test_ivf_refresh_resize_on_growth(spark, sf_dir, tmp_path):
    """SURVEY §12 #6: ``refresh=True, resize_on_growth=True`` grows the
    geometry when the corpus has outgrown it (sqrt(n) target >= 2x the
    inherited k): previous centroids keep their cids, the extra cids are
    seeded from appended vectors, and the refreshed lists still equal the
    full relation's assignment under the refreshed centroids."""
    import json
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from fastcatsearch3_spark.dataops.similarity import ivf_index_build

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "ivf_grow")

    base = emb.where(F.col("vec_id") < 60)
    info0 = ivf_index_build(base, idx, n_centroids=None, train_iters=2)
    k0 = info0["n_centroids"]
    assert k0 == round(math.sqrt(60))  # 8

    # resize_on_growth: 500 vectors → sqrt target 22 >= 2*8 → grow,
    # extra cids seeded from the appended (previously-unseen) vectors
    info1 = ivf_index_build(
        emb, idx, n_centroids=None, train_iters=1,
        refresh=True, resize_on_growth=True,
    )
    n = emb.count()
    target = max(4, min(n, round(math.sqrt(n))))
    assert info1["resized"] is True and info1["refreshed"] is True
    assert info1["n_centroids"] == target
    manifest = json.loads(open(f"{idx}/manifest.json").read())
    assert manifest["n_centroids"] == target

    # correctness invariant: on-disk lists == the full relation's
    # cosine-argmax assignment under the refreshed centroids
    cents = {
        int(r["cid"]): list(r["cvec"])
        for r in spark.read.parquet(f"{idx}/centroids").collect()
    }
    assert len(cents) == target
    lists = {
        int(r["vec_id"]): int(r["cid"])
        for r in spark.read.parquet(f"{idx}/lists").collect()
    }
    rows = emb.collect()
    assert len(lists) == len(rows)
    order = sorted(cents)
    cm = np.array([cents[c] for c in order])
    cm_n = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    for r in rows:
        v = np.array(list(r["embedding"]), dtype=float)
        sims = cm_n @ (v / np.linalg.norm(v))
        want = int(np.argmax(np.round(sims, 12)))  # ties → lowest cid
        assert lists[int(r["vec_id"])] == order[want]

    # plain refresh inherits the grown geometry; a further resize
    # refresh is below the growth threshold → no-op on k
    info_plain = ivf_index_build(
        emb, idx, n_centroids=None, train_iters=1, refresh=True
    )
    assert info_plain["n_centroids"] == target and not info_plain["resized"]
    info2 = ivf_index_build(
        emb, idx, n_centroids=None, train_iters=1,
        refresh=True, resize_on_growth=True,
    )
    assert info2["n_centroids"] == target and not info2["resized"]
