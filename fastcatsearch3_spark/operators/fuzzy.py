"""SymSpell-style deletion-neighborhood fuzzy-term artifact (SURVEY §12.4).

Symmetric-delete spelling correction (Wolf Garbe's SymSpell — public
algorithm): if lev(q, t) <= d, then deleting <= d characters from q and
<= d characters from t reaches a common string. So precompute every
lexicon term's deletion variants ONCE as a persisted artifact; at query
time generate the stem's variants (driver-side, |variants| ~= 1 + L +
L(L-1)/2 for d=2) and probe the artifact with a pushed ``variant IN``
filter. Candidate generation is O(stem deletions) instead of the
vocab-sized ``levenshtein()`` scan in plans/search._expand_prefixes;
candidates then verify with an exact Levenshtein and rank
(dist asc, df desc, term asc) — result-identical to the scan path
(parity-tested in tests/test_fuzzy_artifact.py).

Layout (the minhash_index_build pattern — per-epoch, atomic publish):

    <root>/fuzzy/<epoch>/data/    (ns, variant, term, df) parquet,
                                  range-partitioned + sorted by variant
                                  so probes prune to a few row groups
    <root>/fuzzy/<epoch>/meta.json  {max_dist, epoch, n_terms}

``ns`` is the field namespace ("" = content, else the "repo:"-style
prefix) — distance is measured on the term PAYLOAD, and unqualified stems
never expand into a field's namespace, mirroring the scan path exactly.

Scale note: artifact rows ~= Σ_terms (1 + L + L(L-1)/2) at d=2 (~30-40×
the lexicon for code tokens). That is SymSpell's published space trade;
probe cost is independent of vocab size. For long-token vocabs,
``prefix_length`` (SymSpell's prefixLength) generates variants from only
the first P characters of each term, bounding per-term variants at
1 + P + P(P-1)/2 regardless of term length. The probe truncates the
query stem the same way (P is recorded in meta.json, so probes always
match the built layout) and the exact-Levenshtein verify still runs on
FULL terms — precision stays exact; only candidate recall can drop, and
only for pairs whose edits fall beyond/astride the prefix window
(SymSpell's documented "negligible loss" trade; pure prefix-shifts of
k <= d still intersect, since k leading deletions on one prefix and k
trailing on the other meet at the shared window). Default is None =
full-term variants = exact parity with the scan.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def deletion_variants(word: str, max_dist: int) -> list[str]:
    """All strings reachable from ``word`` by deleting <= max_dist chars
    (the word itself included), deduped, deterministic order."""
    seen = {word}
    frontier = [word]
    for _ in range(max_dist):
        nxt = []
        for w in frontier:
            for i in range(len(w)):
                v = w[:i] + w[i + 1 :]
                if v not in seen:
                    seen.add(v)
                    nxt.append(v)
        frontier = nxt
    return sorted(seen)


def levenshtein(a: str, b: str, cap: int) -> int:
    """Exact edit distance, early-exited past ``cap`` (returns cap + 1).
    Candidate sets are probe-sized (tens of rows), so a pure-python DP is
    cheaper than shipping them back through a Spark job."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        best = cur[0]
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
            best = min(best, cur[j])
        if best > cap:
            return cap + 1
        prev = cur
    return prev[lb] if prev[lb] <= cap else cap + 1


def _split_ns(term: str) -> tuple[str, str]:
    """"repo:spark" → ("repo:", "spark"); bare content terms → ("", t).
    Analyzer tokens cannot contain ':', so any ':' marks a field key."""
    if ":" in term:
        pref, payload = term.split(":", 1)
        return pref + ":", payload
    return "", term


FUZZY_SCHEMA = "ns string, variant string, term string, df long"


def fuzzy_index_build(
    spark: SparkSession, store, max_dist: int = 2,
    prefix_length: int | None = None,
) -> str:
    """Build (or refresh) the deletion-neighborhood artifact for the
    store's CURRENT epoch. Idempotent per epoch; concurrent builders race
    on an atomic rename (loser discards). Returns the artifact dir.

    ``prefix_length`` (SymSpell prefixLength, module docstring): variants
    are generated from each payload's first P chars, bounding artifact
    rows per term at 1 + P + P(P-1)/2 for any term length. None (default)
    keeps full-term variants (exact scan parity). An artifact already
    published for this epoch is reused when it can serve the request
    (its max_dist covers the request and its window is at least as wide);
    otherwise it is replaced.

    One mapInPandas pass over the lexicon: per term, emit its payload's
    deletion variants (vectorized across the partition's terms, python
    string slicing only — no per-row Spark machinery). The output is
    range-partitioned and sorted by ``variant`` so a probe's pushed IN
    filter prunes to a handful of row groups — the same serving trick as
    the sorted lexicon (IndexStore._lexicon_lookup_arrow)."""
    ep = store.epoch()
    out = Path(store.root, "fuzzy", ep)
    meta_p = out / "meta.json"
    if meta_p.exists():
        try:
            meta = json.loads(meta_p.read_text())
        except Exception:  # noqa: BLE001 — unreadable → rebuild
            meta = None
        if meta is not None and int(meta["max_dist"]) >= int(max_dist):
            built_p = meta.get("prefix_length")
            if built_p is None or (
                prefix_length is not None and int(built_p) >= int(prefix_length)
            ):
                return str(out)
        shutil.rmtree(out, ignore_errors=True)

    d = int(max_dist)
    plen = None if prefix_length is None else int(prefix_length)

    def gen(batches):
        for pdf in batches:
            ns_l, var_l, term_l, df_l = [], [], [], []
            for term, df in zip(pdf["term"], pdf["df"]):
                ns, payload = _split_ns(str(term))
                root = payload if plen is None else payload[:plen]
                for v in deletion_variants(root, d):
                    ns_l.append(ns)
                    var_l.append(v)
                    term_l.append(term)
                    df_l.append(int(df))
            yield pd.DataFrame(
                {
                    "ns": pd.Series(ns_l, dtype=object),
                    "variant": pd.Series(var_l, dtype=object),
                    "term": pd.Series(term_l, dtype=object),
                    "df": pd.Series(df_l, dtype="int64"),
                }
            )

    lex = store.lexicon(spark).select("term", "df")
    n_terms = lex.count()
    rows = lex.mapInPandas(gen, FUZZY_SCHEMA)
    tmp = out.with_name(out.name + f".tmp-{id(store) & 0xFFFF}")
    shutil.rmtree(tmp, ignore_errors=True)
    (
        rows.repartitionByRange(F.col("variant"))
        .sortWithinPartitions("variant")
        .write.mode("overwrite")
        .option("parquet.block.size", 1 << 20)
        .parquet(str(tmp / "data"))
    )
    (tmp / "meta.json").write_text(
        json.dumps({
            "max_dist": d, "epoch": ep, "n_terms": int(n_terms),
            "prefix_length": plen,
        })
    )
    if not out.exists():
        tmp.rename(out)
    else:  # concurrent builder published first
        shutil.rmtree(tmp, ignore_errors=True)
    # GC stale epochs (best effort)
    for p in out.parent.iterdir():
        if p.name != out.name and not p.name.endswith(".tmp"):
            shutil.rmtree(p, ignore_errors=True)
    return str(out)


def _artifact_dir(store, max_dist: int) -> tuple[Path, int | None] | None:
    """(dir, prefix_length) of the current-epoch artifact if present and
    built for >= max_dist; None otherwise."""
    out = Path(store.root, "fuzzy", store.epoch())
    meta_p = out / "meta.json"
    if not meta_p.exists():
        return None
    try:
        meta = json.loads(meta_p.read_text())
        if int(meta["max_dist"]) < max_dist:
            return None
        plen = meta.get("prefix_length")
    except Exception:  # noqa: BLE001 — unreadable meta → treat as absent
        return None
    return out, (None if plen is None else int(plen))


def _probe_rowgroups(
    data_dir: Path, pref: str, variants: list[str]
) -> list[tuple[str, int]]:
    """Driver-side probe with MANUAL parquet row-group pruning: per file,
    keep only row groups whose sorted-variant [min, max] statistics
    intersect a probe variant, read just those, exact-filter in Arrow.
    pyarrow's ``dataset().to_table(filter=isin)`` decodes every row group
    before filtering (measured 0.26 s vs 0.025 s on a 43M-row artifact);
    footer statistics make point lookups O(matching groups). parquet-mr's
    string-stat truncation keeps min/max valid BOUNDS (max is incremented
    when truncated), so the pruning is never lossy; a group without
    statistics is read (safe)."""
    import glob

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    vset = sorted(variants)
    varr = pa.array(vset, type=pa.string())
    out: dict[str, int] = {}
    for f in sorted(glob.glob(str(data_dir / "*.parquet"))):
        pf = pq.ParquetFile(f)
        md = pf.metadata
        vidx = md.schema.to_arrow_schema().get_field_index("variant")
        groups = []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(vidx).statistics
            if st is None or not st.has_min_max:
                groups.append(g)
                continue
            if any(st.min <= v <= st.max for v in vset):
                groups.append(g)
        if not groups:
            continue
        tbl = pf.read_row_groups(
            groups, columns=["ns", "variant", "term", "df"]
        )
        mask = pc.and_(
            pc.equal(tbl.column("ns"), pref),
            pc.is_in(tbl.column("variant"), value_set=varr),
        )
        t = tbl.filter(mask)
        out.update(
            zip(t.column("term").to_pylist(), t.column("df").to_pylist())
        )
    return list(out.items())


def fuzzy_expand(
    spark: SparkSession | None,
    store,
    stem: str,
    max_dist: int,
    limit: int,
) -> list[str] | None:
    """Expand a (possibly field-qualified) stem against the artifact:
    candidates from the deletion-neighborhood probe, exact-Levenshtein
    verified, ranked (dist asc, df desc, term asc), capped at ``limit`` —
    byte-identical ordering to the lexicon-scan path. Returns None when
    no current-epoch artifact exists (caller falls back to the scan).

    The probe reads driver-side via pyarrow with a pushed
    ``ns == pref AND variant IN (...)`` filter (row-group pruned — no
    Spark job, O(stem deletions) work); a Spark fallback covers exotic
    filesystems with identical results."""
    got = _artifact_dir(store, max_dist)
    if got is None:
        return None
    out, plen = got
    pref, payload = _split_ns(stem)
    # probe with the same window the artifact was built with (meta-driven,
    # so a prefix-truncated artifact is always probed consistently)
    probe_root = payload if plen is None else payload[:plen]
    variants = deletion_variants(probe_root, max_dist)
    cand: list[tuple[str, int]] | None = None
    try:
        cand = _probe_rowgroups(out / "data", pref, variants)
    except Exception:  # noqa: BLE001 — any reader failure → Spark probe
        cand = None
    if cand is None:
        if spark is None:
            return None
        rows = (
            spark.read.parquet(str(out / "data"))
            .where((F.col("ns") == pref) & F.col("variant").isin(variants))
            .select("term", "df")
            .distinct()
            .collect()
        )
        cand = [(r["term"], r["df"]) for r in rows]
    scored = []
    for term, df in cand:
        dist = levenshtein(_split_ns(term)[1], payload, max_dist)
        if dist <= max_dist:
            scored.append((dist, -int(df), term))
    scored.sort()
    return [t for _, _, t in scored[:limit]]
