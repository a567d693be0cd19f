"""Collection facade — the reference's collection-centric surface.

fastcatsearch3 users operate on a *collection* (create → full index →
incremental add/update/delete → compact → search/facet/suggest;
server:org.fastcatsearch collection lifecycle [K]). This facade binds the
engine's operators to one index root so a reference user can drive the
whole lifecycle through a single object:

    col = Collection(spark, "/data/idx", EngineConfig(num_shards=256))
    col.build(corpus_df)                     # full index (resumable)
    col.append(new_docs_df)                  # add/update batch (J-7)
    col.delete(keys_df)                      # tombstone by pk (ST-2)
    col.compact()                            # merge segments (ST-4/I-6)
    col.search('"exact phrase" repo:spark -slow ~2', k=10)
    col.match("spark merge")                 # full match set (facet feeder)
    col.suggest("spa")                       # autocomplete
    col.stats()                              # n_docs / avgdl / config

Thin by design: every method is a one-line binding to the operator that
already owns the logic (and its tests/oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fastcatsearch3_spark.config import EngineConfig
from fastcatsearch3_spark.index import IndexStore


class Collection:
    def __init__(
        self, spark: SparkSession, index_root: str,
        cfg: EngineConfig | None = None,
    ):
        self.spark = spark
        self.root = str(index_root)
        self._cfg = cfg

    @property
    def cfg(self) -> EngineConfig:
        if self._cfg is None:
            self._cfg = IndexStore(self.root).config()
        return self._cfg

    @property
    def store(self) -> IndexStore:
        return IndexStore(self.root)

    def build(self, corpus: DataFrame, **kw) -> dict:
        from fastcatsearch3_spark.operators.build import build_index

        return build_index(self.spark, corpus, self.root, self.cfg, **kw)

    def append(self, docs: DataFrame) -> dict:
        from fastcatsearch3_spark.streaming.incremental import append_segment

        return append_segment(self.spark, self.root, docs, self.cfg)

    def delete(self, keys: DataFrame) -> int:
        from fastcatsearch3_spark.streaming.incremental import delete_by_pk

        return delete_by_pk(self.spark, self.root, keys)

    def compact(self) -> dict:
        from fastcatsearch3_spark.streaming.incremental import compact

        return compact(self.spark, self.root, self.cfg)

    def search(self, query, k: int = 10, **kw) -> DataFrame:
        from fastcatsearch3_spark.plans.search import search_index

        return search_index(self.spark, self.store, query, k=k, **kw)

    def match(self, query, **kw) -> DataFrame:
        from fastcatsearch3_spark.plans.search import match_doc_ids

        return match_doc_ids(self.spark, self.store, query, **kw)

    def suggest(self, prefix: str, k: int = 10) -> DataFrame:
        from fastcatsearch3_spark.plans.search import suggest_terms

        return suggest_terms(self.spark, self.store, prefix, k=k)

    def stats(self) -> dict:
        return self.store.stats()
