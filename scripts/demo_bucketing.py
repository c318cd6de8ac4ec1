#!/usr/bin/env python
"""Bucketing demo: CEP over a bucketed+sorted table runs with ZERO
shuffle exchanges on BOTH physical paths, vs the same plans over a
plain parquet source.

This is the 100 TB pre-partitioning story (SURVEY.md §4 / README
"Scale design"): write the event table ONCE bucketed by the partition
key (`bucketBy(n, key).sortBy(key, ts, tiebreak)`), then

* every fixed-arity CEP pattern — a k-way self-join on that key —
  runs as a co-located join without moving a byte across the network
  (only the match output shuffles), and
* the NFA executor (`run_batch(..., assume_clustered=True)`) skips its
  repartition: the mapInPandas matcher reads each bucket's key-sorted
  rows in place.

On Iceberg the same layout is a bucket partition transform.

Run: python scripts/demo_bucketing.py   (SPARK_GRAFT_SF_DIR to scale)
Prints: RESULT <source>/<path> shuffle-exchanges: <n> rows: <matches>
"""

from __future__ import annotations

import os
import re
import shutil
import sys
import tempfile
from datetime import timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    wh = tempfile.mkdtemp(prefix="cep_bucket_wh_")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", wh)
        # force sort-merge joins so shuffle elimination is visible (at
        # real scale neither side is broadcastable anyway)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .appName("cep-bucketing-demo")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cep_spark.compiler import compile_pattern
    from cep_spark.join_planner import plan_join
    from cep_spark.pattern import Ev, Pattern, Seq

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    (
        ev.write.bucketBy(8, "user_id")
        .sortBy("user_id", "ts", "event_id")
        .format("parquet")
        .mode("overwrite")
        .saveAsTable("ev_bucketed")
    )
    bt = spark.table("ev_bucketed")
    pat = Pattern(
        Seq(Ev("a", event_type="signup"), Ev("b", event_type="purchase")),
        window=timedelta(hours=24),
        key="user_id", ts_col="ts", tiebreak_col="event_id",
    )
    cp = compile_pattern(pat)
    from cep_spark.batch import run_batch

    def nfa(src, clustered):
        # the saved bucketed table is bucket-hashed by user_id and
        # sorted (user_id, ts, event_id) within each bucket file — the
        # exact layout assume_clustered asserts
        return run_batch(src, cp, mode="flat", assume_clustered=clustered)

    counts = {}
    jobs = [
        ("plain/join", plan_join(ev, cp)),
        ("bucketed/join", plan_join(bt, cp)),
        ("plain/nfa", nfa(ev, False)),
        ("bucketed/nfa", nfa(bt, True)),
    ]
    for name, df in jobs:
        df.collect()  # finalize the AQE plan
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        shuf = len(re.findall(r"\(\d+\) Exchange", plan))
        counts[name] = (shuf, df.count())
        print(f"RESULT {name} shuffle-exchanges: {shuf} rows: {counts[name][1]}",
              flush=True)
    spark.stop()
    shutil.rmtree(wh, ignore_errors=True)
    rows = {counts[n][1] for n in counts}
    ok = (
        counts["bucketed/join"][0] == 0
        and counts["bucketed/nfa"][0] == 0
        and counts["plain/join"][0] > 0
        and counts["plain/nfa"][0] > 0
        and len(rows) == 1
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
