"""cep_spark — a PySpark-native complex-event-processing engine.

Brand-new implementation of the query capabilities of yuvadius/CEP
(SASE-style SEQ / AND / OR / Kleene / negation patterns with predicate
conditions over a time window), re-expressed Spark-first:

* batch:     groupBy(key).applyInPandas NFA  /  pure-DataFrame self-joins
* streaming: transformWithStateInPandas NFA with event-time watermarks
* plus large-scale pipeline operators (dedup, similarity, text stats).

See SURVEY.md for the blueprint and semantics pinning.
"""

from .conditions import attr, lit, TRUE
from .pattern import And_, Ev, Kleene, Neg, Or_, Pattern, Seq
from .compiler import compile_pattern
from .batch import run_batch

__all__ = [
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
]
