#!/usr/bin/env python
"""spark-submit entry point: flagship CEP query, cluster-style packaging.

Usage (BASELINE deployment shape; master/SF via env):

    python scripts/make_zip.py                      # -> /tmp/cep_spark.zip
    spark-submit --master local[8] \
        --py-files /tmp/cep_spark.zip \
        scripts/submit_flagship.py

The driver imports cep_spark ONLY from the --py-files zip (no repo on
sys.path), proving the package is cluster-shippable."""

import json
import os
import time

from pyspark.sql import SparkSession


def main():
    spark = (
        SparkSession.builder.appName("cep-spark-flagship")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    from datetime import timedelta

    from cep_spark.batch import run_batch
    from cep_spark.compiler import compile_pattern
    from cep_spark.pattern import Ev, Pattern, Seq

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    pat = Pattern(
        Seq(Ev("a", event_type="signup"), Ev("b", event_type="purchase")),
        window=timedelta(hours=24),
        key="user_id",
        ts_col="ts",
        tiebreak_col="event_id",
    )
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    t0 = time.perf_counter()
    n = run_batch(df, compile_pattern(pat), mode="flat").count()
    print(json.dumps({"matches": n, "sec": round(time.perf_counter() - t0, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
