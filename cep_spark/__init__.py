"""cep_spark — a PySpark-native complex-event-processing engine.

Brand-new implementation of the query capabilities of yuvadius/CEP
(SASE-style SEQ / AND / OR / Kleene / negation patterns with predicate
conditions over a time window), re-expressed Spark-first:

* batch:     partition-amortized mapInPandas NFA (default), per-key
             applyInPandas, or pure-DataFrame self-joins (join_planner)
* streaming: applyInPandasWithState NFA with event-time watermarks,
             watermark-sealed exactly-once emission (stream / sink)
* windows:   tumbling / sliding / session (windows)
* skew:      window-sliced hot-key decomposition (skew)
* plus large-scale pipeline operators: dedup (exact / fingerprint /
  n-gram Jaccard / MinHash-LSH / SimHash), kNN + hyperplane-LSH
  similarity, text stats, multimodal binary plumbing (pipeline)

See SURVEY.md for the blueprint and semantics pinning.
"""

from .batch import run_batch
from .engine import CepEngine
from .compiler import compile_pattern
from .conditions import TRUE, attr, lit
from .pattern import And_, Ev, Kleene, Neg, Or_, Pattern, Seq
from .sources import PushStream

__all__ = [
    "PushStream",
    "attr",
    "lit",
    "TRUE",
    "And_",
    "Ev",
    "Kleene",
    "Neg",
    "Or_",
    "Pattern",
    "Seq",
    "compile_pattern",
    "run_batch",
    "CepEngine",
]
