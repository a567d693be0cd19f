"""fastcatsearch3_spark — a from-scratch PySpark-native full-text engine.

A brand-new implementation (NOT a port) of the capabilities of the
`lupfeliz/fastcatsearch3` Java search server, re-expressed Spark-first:

- inverted-index build as a DataFrame pipeline (tokenize → tf → pack),
- segments as immutable Parquet partition-groups,
- delta-gap + variable-byte compressed postings (vectorized numpy codec),
- BM25 top-k query serving with block-max pruning in Arrow kernels,
- salted skew-aware segment merge, resumable builds with lineage manifests,
- incremental indexing via Structured Streaming `Trigger.AvailableNow`.

Reference parity map lives in SURVEY.md §2 (operator ids S-*/P-*/J-*/A-*/
W-*/O-*/T-*/F-*/I-*/ST-*/U-*/Q-* are cited in docstrings throughout).
"""

from fastcatsearch3_spark.collection import Collection
from fastcatsearch3_spark.config import EngineConfig

__version__ = "0.2.0"

__all__ = ["Collection", "EngineConfig", "__version__"]
