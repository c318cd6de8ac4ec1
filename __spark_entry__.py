"""Driver contract for the spark-graft builder (PySpark target).

CEP pattern queries run on the `events` table (key=user_id,
symbol=event_type, ts/event_id ordering — the stand-in for the
reference's NASDAQ ticks, FIXTURES.md §2).  Oracle SQL is GENERATED
from the very same compiled pattern by cep_spark.join_planner, so Spark
plan and DuckDB oracle share one definition and one column naming.

Pipeline operators (dedup / similarity / text stats) run on
`documents` / `embeddings` (cep_spark.pipeline).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from datetime import timedelta

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from cep_spark.compiler import compile_pattern
from cep_spark.conditions import TRUE, attr, lit
from cep_spark.join_planner import oracle_sql_for, plan_join
from cep_spark.pattern import And_, Ev, Kleene, Neg, Or_, Pattern, Seq

# ---------------------------------------------------------------------------
# CEP pattern catalog (events table) — one entry per operator family of
# SURVEY.md §2.1 (O1..O7), plus condition-algebra coverage (§2.2).


def _p(struct, where=None, window=timedelta(hours=12)):
    return Pattern(
        struct,
        where=where if where is not None else TRUE,
        window=window,
        key="user_id",
        ts_col="ts",
        tiebreak_col="event_id",
    )


CEP_PATTERNS = {
    # O1: event primitive + unary predicate (C1/C2/C4)
    "cep_one_arg": _p(
        Ev("a", where=(attr("a", "event_type") == lit("purchase")) & (attr("a", "value") > lit(150.0)))
    ),
    # O2: SEQ
    "cep_seq2": _p(Seq(Ev("a", event_type="signup"), Ev("b", event_type="purchase"))),
    # O2 + multi-var condition (C3/C4/C5: arithmetic + comparison + AND)
    "cep_seq3_cond": _p(
        Seq(Ev("a", event_type="view"), Ev("b", event_type="click"), Ev("c", event_type="purchase")),
        where=(attr("b", "value") > attr("a", "value"))
        & (attr("c", "value") + attr("b", "value") > attr("a", "value")),
        window=timedelta(hours=24),
    ),
    # O3: AND (unordered conjunction)
    "cep_and3": _p(
        And_(Ev("a", event_type="view"), Ev("b", event_type="click"), Ev("c", event_type="error")),
        window=timedelta(hours=12),
    ),
    # O4: OR (disjunction of alternatives)
    "cep_or2": _p(
        Or_(
            Seq(Ev("a", event_type="signup"), Ev("t", event_type="purchase")),
            Seq(Ev("b", event_type="click"), Ev("t", event_type="purchase")),
        ),
        window=timedelta(hours=6),
    ),
    # O6: negation (gap-scoped)
    "cep_neg": _p(
        Seq(Ev("a", event_type="signup"), Neg(Ev("n", event_type="error")), Ev("b", event_type="purchase")),
        window=timedelta(hours=24),
    ),
    # O6 with a multi-var negation condition
    "cep_neg_cond": _p(
        Seq(
            Ev("a", event_type="view"),
            Neg(
                Ev(
                    "n",
                    where=(attr("n", "event_type") == lit("error"))
                    & (attr("n", "value") > attr("a", "value")),
                )
            ),
            Ev("b", event_type="purchase"),
        ),
        window=timedelta(hours=24),
    ),
    # O5: Kleene closure (bounded here so the DuckDB oracle is exact; the
    # unbounded powerset path is exercised by the NFA executor in pytest)
    "cep_kleene": _p(
        Seq(
            Ev("a", event_type="signup"),
            Kleene(Ev("k", event_type="click"), max_len=3),
            Ev("c", event_type="purchase"),
        ),
        window=timedelta(hours=24),
    ),
    # O7: nesting SEQ(a, AND(b,c), d)
    "cep_nested": _p(
        Seq(
            Ev("a", event_type="signup"),
            And_(Ev("b", event_type="view"), Ev("c", event_type="click")),
            Ev("d", event_type="purchase"),
        ),
        window=timedelta(hours=48),
    ),
    # impossible pattern -> 0 rows (reference "nonsense" test category)
    "cep_nonsense": _p(
        And_(
            Ev("a", where=(attr("a", "event_type") == lit("signup")) & (attr("a", "value") > lit(1e12))),
            Ev("b", event_type="purchase"),
        ),
        window=timedelta(minutes=1),
    ),
}


def _cep_query(pat: Pattern) -> Callable[[SparkSession, str], DataFrame]:
    cp = compile_pattern(pat)

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return plan_join(df, cp)

    return run


# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: SEQ(signup -> click -> purchase) within
    24h per user — the canonical funnel CEP pattern."""
    pat = _p(
        Seq(Ev("a", event_type="signup"), Ev("b", event_type="click"), Ev("c", event_type="purchase")),
        window=timedelta(hours=24),
    )
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    return plan_join(df, compile_pattern(pat))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cep_spark import windows
    from cep_spark.pipeline import registry as _pipeline_registry

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, pat in CEP_PATTERNS.items():
        out[name] = _cep_query(pat)
    out.update(windows.QUERIES)
    out.update(_pipeline_registry.queries())
    return out


def oracle_sql() -> dict[str, str]:
    from cep_spark import windows
    from cep_spark.pipeline import registry as _pipeline_registry

    out = {name: oracle_sql_for(compile_pattern(pat), "events") for name, pat in CEP_PATTERNS.items()}
    out.update(windows.ORACLES)
    out.update(_pipeline_registry.oracle_sql())
    return out
