"""Engine configuration — pinned constants for deterministic builds.

The reference declares per-collection settings in XML
(core:ir.config.CollectionConfig / ir.settings.SchemaSetting [K per
SURVEY.md §1]); we pin them in one frozen dataclass that is serialized
into every build manifest so a resumed or merged build can verify it is
operating under identical semantics (BM25 params, analyzer version,
shard/bucket counts).
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field


# 1.1.0: dictionary-driven Korean morphological analyzer (korean_morph)
# joined the registry; dictionary contents/version ride the config into
# every manifest, so segment_complete() rejects resume across dictionary
# changes (the reindex guard).
ANALYZER_VERSION = "1.1.0"


@dataclass(frozen=True)
class EngineConfig:
    """All knobs that affect index bytes or scores.

    k1/b are the BM25 constants mandated by BASELINE.json (Robertson
    defaults, pinned: k1=1.2, b=0.75). ``num_shards`` is the number of
    document shards per segment (the scatter-gather unit, mirroring the
    reference's data-node partitioning of collections — SURVEY.md Q-6);
    ``block_size`` is the posting block length for block-max metadata
    (SURVEY.md I-9 / O-3).

    At 100 TB scale, ``num_shards`` should be sized so one shard's docmap
    (doc_id + dl, ~16 B/doc) fits comfortably in executor memory
    (~1M docs/shard ⇒ 16 MB); per-task pack memory is bounded separately
    by the pack repartition width (shuffle partitions).
    """

    k1: float = 1.2
    b: float = 0.75
    num_shards: int = 8
    block_size: int = 128
    min_token_len: int = 1
    max_token_len: int = 64
    emit_original_compound: bool = False
    # store within-doc token positions (a separate blob column, pruned from
    # every non-phrase query's scan) — enables phrase queries (J-5); off by
    # default like Lucene's IndexOptions: positions cost ~1-2 bytes/token
    store_positions: bool = False
    # searchable fields (the reference's multiple IndexSettings per
    # collection, SURVEY.md §1 [K]): corpus columns indexed side by side.
    # "content" terms are stored bare; any other field f stores its terms
    # as "f:term" (terms are [a-z0-9]+ / CJK bigrams, so ':' is unambiguous)
    # and scores with its own per-field avgdl (per-field length norm).
    # Query syntax: "repo:spark" → field-qualified term.
    indexed_fields: tuple[str, ...] = ("content",)
    stopwords: tuple[str, ...] = field(default_factory=tuple)
    # prefix (wildcard) terms "spar*" expand against the sorted lexicon at
    # query time; cap the expansion (highest-df first, like the reference's
    # prefix clause limit) so a 1-char prefix can't fan out unboundedly
    max_prefix_expansion: int = 32
    # hydrate strategy threshold (cost-based plan choice): below this
    # docmap size a single-job broadcast join beats the two-job hit-key
    # pushdown (a second scheduling round dominates small-index latency);
    # above it the pushdown's pruned docmap scan is the only shape that
    # survives 10^12 docs
    hydrate_pushdown_min_docs: int = 10_000_000
    analyzer: str = "standard"
    analyzer_version: str = ANALYZER_VERSION
    # user dictionary entries for the korean_morph analyzer —
    # "word" or "compound=part1+part2" (fastcatsearch's user-dictionary
    # format [M]). Part of the config on purpose: a dictionary edit
    # changes index bytes, so it must trip the manifest reindex guard.
    user_dict: tuple[str, ...] = field(default_factory=tuple)
    # index-time synonym dictionary: each entry is one bidirectional group
    # of ANALYZED tokens, "tok1,tok2[,tok3...]" (the reference applies its
    # synonym dictionary at analysis time as well as query time [M]; cf.
    # Lucene's index-time SynonymFilter with expand=true). Any occurrence
    # of a group member additionally emits the other members — appended
    # AFTER the document's own token stream so original token positions
    # (phrase adjacency) are untouched. Changes df and index bytes, so it
    # rides the manifest config and trips the reindex guard; query-side
    # expansion (plans/query.py) remains the no-reindex fallback.
    index_synonyms: tuple[str, ...] = field(default_factory=tuple)
    # on-disk layout revision: bump whenever docmap/postings schema or blob
    # format changes, so resume (I-8) rejects segments built under an older
    # layout instead of silently mixing formats
    index_format: int = 2

    def to_dict(self) -> dict:
        """JSON-stable dict (round-trips through manifests identically)."""
        d = asdict(self)
        d["stopwords"] = list(d["stopwords"])
        d["indexed_fields"] = list(d["indexed_fields"])
        d["user_dict"] = list(d["user_dict"])
        d["index_synonyms"] = list(d["index_synonyms"])
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "EngineConfig":
        d = dict(d)
        if "stopwords" in d and d["stopwords"] is not None:
            d["stopwords"] = tuple(d["stopwords"])
        if "indexed_fields" in d and d["indexed_fields"] is not None:
            d["indexed_fields"] = tuple(d["indexed_fields"])
        if "user_dict" in d and d["user_dict"] is not None:
            d["user_dict"] = tuple(d["user_dict"])
        if "index_synonyms" in d and d["index_synonyms"] is not None:
            d["index_synonyms"] = tuple(d["index_synonyms"])
        return cls(**d)
