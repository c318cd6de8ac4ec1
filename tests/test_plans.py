"""Physical-plan regression tests: the optimizations we claim must be
visible in `.explain` — predicate pushdown to parquet, column pruning,
broadcast of the small side (SURVEY.md §4)."""

from __future__ import annotations

from datetime import timedelta

import pytest

from cep_spark.compiler import compile_pattern
from cep_spark.conditions import attr
from cep_spark.join_planner import plan_join
from cep_spark.pattern import Ev, Pattern, Seq

SF = "/root/testdata/sf0.001"


def _explain(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_join_path_pushdown_and_pruning(spark, events):
    pat = Pattern(
        Seq(Ev("a", event_type="view"), Ev("b", event_type="purchase")),
        where=(attr("b", "value") > attr("a", "value")),
        window=timedelta(hours=12),
        key="user_id", ts_col="ts", tiebreak_col="event_id",
    )
    plan = _formatted(plan_join(events, compile_pattern(pat)))
    # unary event-type equalities reach the parquet scan
    assert "EqualTo(event_type,view)" in plan
    assert "EqualTo(event_type,purchase)" in plan
    # column pruning: the untouched props column never leaves the scan
    assert "props" not in plan


def test_nfa_path_pushdown_and_pruning(spark, events):
    from cep_spark.batch import run_batch

    pat = Pattern(
        Seq(Ev("a", event_type="signup"), Ev("b", event_type="purchase")),
        window=timedelta(hours=24),
        key="user_id", ts_col="ts", tiebreak_col="event_id",
    )
    plan = _formatted(run_batch(events, compile_pattern(pat), mode="flat"))
    # the OR-of-unaries prefilter is pushed into the scan
    assert "event_type" in plan and "PushedFilters" in plan
    assert "props" not in plan  # pruned
    assert "value" not in plan  # pattern references no value column


def test_knn_broadcasts_queries(spark):
    from cep_spark.pipeline.embeddings import q_knn_bruteforce

    plan = _explain(q_knn_bruteforce(spark, SF))
    assert "Broadcast" in plan  # query side broadcast, corpus streams


def test_whole_stage_codegen_in_join_path(spark, events):
    pat = Pattern(
        Seq(Ev("a", event_type="view"), Ev("b", event_type="purchase")),
        window=timedelta(hours=12),
        key="user_id", ts_col="ts", tiebreak_col="event_id",
    )
    df = plan_join(events, compile_pattern(pat))
    df.collect()  # AQE finalizes THIS plan only when this frame executes
    plan = _formatted(df)
    assert "codegen id" in plan  # joins+projections run inside WSCG spans
