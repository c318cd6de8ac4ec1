"""Window-sliced hot-key execution == plain per-key NFA (exactness of
the time-salting decomposition), incl. a zipf-hot conversation."""

from __future__ import annotations

from datetime import timedelta

import pytest

from cep_spark.batch import run_batch
from cep_spark.compiler import compile_pattern
from cep_spark.conditions import TRUE, attr
from cep_spark.pattern import Ev, Kleene, Neg, Pattern, Seq
from cep_spark.skew import run_batch_auto, run_batch_sliced

SF = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "struct,where,window",
    [
        (Seq(Ev("a", event_type="signup"), Ev("b", event_type="purchase")), None, 24),
        (
            Seq(Ev("a", event_type="view"), Ev("b", event_type="click"), Ev("c", event_type="purchase")),
            (attr("b", "value") > attr("a", "value")),
            12,
        ),
        (
            Seq(Ev("a", event_type="signup"), Neg(Ev("n", event_type="error")), Ev("b", event_type="purchase")),
            None,
            24,
        ),
        (
            Seq(Ev("a", event_type="signup"), Kleene(Ev("k", event_type="click"), max_len=3),
                Ev("c", event_type="purchase")),
            None,
            12,
        ),
        # leading neg: candidates reach one slice further back (3-replica path)
        (
            Seq(Neg(Ev("n", event_type="error")), Ev("a", event_type="signup"),
                Ev("b", event_type="purchase")),
            None,
            12,
        ),
        # trailing neg: candidates stay inside the 2-replica range
        (
            Seq(Ev("a", event_type="signup"), Ev("b", event_type="purchase"),
                Neg(Ev("n", event_type="error"))),
            None,
            12,
        ),
    ],
)
def test_sliced_equals_plain_events(spark, events_df, struct, where, window):
    pat = Pattern(
        struct,
        where=where if where is not None else TRUE,
        window=timedelta(hours=window),
        key="user_id",
        ts_col="ts",
        tiebreak_col="event_id",
    )
    cp = compile_pattern(pat)
    assert _canon(run_batch_sliced(events_df, cp)) == _canon(run_batch(events_df, cp, mode="flat"))


def test_sliced_equals_plain_hot_conversation(spark):
    """One conversation holds ~50% of all turns (FIXTURES skew shape)."""
    from cep_spark.transcripts import gen_transcripts

    pdf = gen_transcripts(n_conv=40, seed=7, skew=0.5)
    df = spark.createDataFrame(pdf)
    pat = Pattern(
        Seq(Ev("u", role="user"), Ev("a", role="assistant"), Ev("t", role="tool")),
        window=timedelta(minutes=10),
        key="conv_id",
        ts_col="ts",
        tiebreak_col="turn_idx",
    )
    cp = compile_pattern(pat)
    plain = _canon(run_batch(df, cp, mode="flat"))
    sliced = _canon(run_batch_sliced(df, cp))
    assert sliced == plain and len(plain) > 0
    # the hot key's work is actually split across many slice groups
    hot_events = pdf[pdf.conv_id == "c00000000"]
    span_s = (hot_events.ts.max() - hot_events.ts.min()).total_seconds()
    assert span_s / 600 > 4  # >4 slices exist for the hot conversation


def test_sliced_fractional_second_window(spark):
    """Slices are computed in exact microsecond arithmetic — a window
    that is not a whole number of seconds must still partition matches
    exactly (regression: unix_timestamp() second-truncation)."""
    from cep_spark.transcripts import gen_transcripts

    pdf = gen_transcripts(n_conv=30, seed=11)
    df = spark.createDataFrame(pdf)
    pat = Pattern(
        Seq(Ev("u", role="user"), Ev("a", role="assistant")),
        window=timedelta(seconds=90, milliseconds=500),
        key="conv_id",
        ts_col="ts",
        tiebreak_col="turn_idx",
    )
    cp = compile_pattern(pat)
    plain = _canon(run_batch(df, cp, mode="flat"))
    assert _canon(run_batch_sliced(df, cp)) == plain and len(plain) > 0


def test_auto_path_null_keys(spark):
    """Null-key rows must flow to the plain path (grouped as one null
    key, same as run_batch), not silently vanish from both branches."""
    import pandas as pd

    from cep_spark.transcripts import gen_transcripts

    pdf = gen_transcripts(n_conv=20, seed=13)
    null_part = gen_transcripts(n_conv=2, seed=14)
    null_part["conv_id"] = None
    both = pd.concat([pdf, null_part], ignore_index=True)
    df = spark.createDataFrame(both)
    pat = Pattern(
        Seq(Ev("u", role="user"), Ev("a", role="assistant")),
        window=timedelta(minutes=10),
        key="conv_id",
        ts_col="ts",
        tiebreak_col="turn_idx",
    )
    cp = compile_pattern(pat)
    from collections import Counter

    plain = Counter(tuple(r) for r in run_batch(df, cp, mode="flat").collect())
    auto = Counter(tuple(r) for r in run_batch_auto(df, cp, hot_threshold=5).collect())
    assert auto == plain
    assert any(k[0] is None for k in plain)  # null-key matches exist


def test_sliced_leading_neg_crosses_slice_boundary(spark):
    """A leading-neg candidate in the PREVIOUS slice must still kill the
    match (the 3-replica path): error at 9.5min (slice 0), signup at
    10.5min + purchase at 11min (slice 1), window 10min — the forbidden
    event is outside the 2-replica group of the match's slice."""
    import pandas as pd

    ts0 = pd.Timestamp("2026-01-01")  # epoch-aligned slice boundaries
    rows = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "event_id": [1, 2, 3],
            "event_type": ["error", "signup", "purchase"],
            "ts": [ts0 + pd.Timedelta(minutes=m) for m in (9.5, 10.5, 11.0)],
        }
    )
    df = spark.createDataFrame(rows)
    pat = Pattern(
        Seq(Neg(Ev("n", event_type="error")), Ev("a", event_type="signup"),
            Ev("b", event_type="purchase")),
        window=timedelta(minutes=10),
        key="user_id", ts_col="ts", tiebreak_col="event_id",
    )
    cp = compile_pattern(pat)
    assert run_batch(df, cp, mode="flat").count() == 0  # plain: suppressed
    assert run_batch_sliced(df, cp).count() == 0  # sliced must agree


def test_auto_path(spark, events_df):
    pat = Pattern(
        Seq(Ev("a", event_type="signup"), Ev("b", event_type="purchase")),
        window=timedelta(hours=24),
        key="user_id",
        ts_col="ts",
        tiebreak_col="event_id",
    )
    cp = compile_pattern(pat)
    plain = _canon(run_batch(events_df, cp, mode="flat"))
    assert _canon(run_batch_auto(events_df, cp, hot_threshold=10)) == plain
    assert _canon(run_batch_auto(events_df, cp, hot_threshold=10**9)) == plain


def test_multi_sliced_equals_multi_plain(spark, events_df):
    """Window-sliced prefix-shared MULTI execution == run_batch_multi
    (incl. a leading-neg pattern forcing the 3-replica path and a
    trailing-neg pattern)."""
    from cep_spark.batch import run_batch_multi
    from cep_spark.skew import run_batch_multi_sliced

    def mk(struct, pid, where=None):
        return Pattern(struct, where=where if where is not None else TRUE,
                       window=timedelta(hours=12), key="user_id",
                       ts_col="ts", tiebreak_col="event_id", pattern_id=pid)

    cps = [
        compile_pattern(mk(Seq(Ev("a", event_type="signup"),
                               Ev("b", event_type="view"),
                               Ev("c", event_type="purchase")), "m0")),
        compile_pattern(mk(Seq(Ev("a", event_type="signup"),
                               Ev("b", event_type="view"),
                               Ev("d", event_type="click")), "m1",
                           where=attr("d", "value") > attr("a", "value"))),
        compile_pattern(mk(Seq(Neg(Ev("n", event_type="error")),
                               Ev("a", event_type="signup"),
                               Ev("b", event_type="purchase")), "m2")),
        compile_pattern(mk(Seq(Ev("a", event_type="signup"),
                               Ev("b", event_type="purchase"),
                               Neg(Ev("n", event_type="error"))), "m3")),
    ]
    emit = ("event_id",)

    def canon(df):
        return sorted(
            (r["user_id"], r["pattern_id"], r["alt_id"],
             tuple((m["var"], m["event_id"]) for m in r["matched"]))
            for r in df.collect()
        )

    plain = canon(run_batch_multi(events_df, cps, emit_cols=emit))
    sliced = canon(run_batch_multi_sliced(events_df, cps, emit_cols=emit))
    assert plain == sliced and len(plain) > 0


def test_multi_auto_routes_hot_keys(spark, events_df):
    """run_batch_multi_auto with a tiny threshold (everything hot) ==
    with an infinite threshold (everything cold) == run_batch_multi."""
    from cep_spark.batch import run_batch_multi
    from cep_spark.skew import run_batch_multi_auto

    def mk(struct, pid):
        return Pattern(struct, where=TRUE, window=timedelta(hours=12),
                       key="user_id", ts_col="ts", tiebreak_col="event_id",
                       pattern_id=pid)

    cps = [
        compile_pattern(mk(Seq(Ev("a", event_type="signup"),
                               Ev("b", event_type="purchase")), "a0")),
        compile_pattern(mk(Seq(Ev("a", event_type="signup"),
                               Ev("b", event_type="click")), "a1")),
    ]
    emit = ("event_id",)

    def canon(df):
        return sorted(
            (r["user_id"], r["pattern_id"], r["alt_id"],
             tuple(m["event_id"] for m in r["matched"]))
            for r in df.collect()
        )

    want = canon(run_batch_multi(events_df, cps, emit_cols=emit))
    all_hot = canon(run_batch_multi_auto(events_df, cps, emit_cols=emit,
                                         hot_threshold=1))
    all_cold = canon(run_batch_multi_auto(events_df, cps, emit_cols=emit,
                                          hot_threshold=10**9))
    assert want == all_hot == all_cold and len(want) > 0
