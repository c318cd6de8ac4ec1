"""Embedding-table operators: brute-force kNN and hyperplane-LSH pairs.

Dot products are computed as a left fold over the array in DOUBLE on
BOTH sides (Spark `aggregate(zip_with(...))`, DuckDB
`list_inner_product(::DOUBLE[])`) so the accumulation order is
identical; emitted scores are rounded to ROUND_DP.

Scale notes (100 TB path):
* knn_bruteforce: the query set is a small dimension table — Spark
  broadcasts it (explicit `broadcast()`); the corpus side streams
  through one scan, top-k per query via window row_number.  This is
  the exact baseline any ANN variant is measured against.
* ann_lsh_pairs: random-hyperplane signatures (literal plane vectors,
  shared constants) -> banded equi-join on 4-bit band keys -> exact
  cosine verification on candidates only.  All equi-joins; candidate
  volume is controlled by bands x bits.  The oracle replicates the
  same planes, so the (deterministic) approximation is exactly
  checked.
"""

from __future__ import annotations

import numpy as np

ROUND_DP = 6
KNN_K = 5
KNN_QUERY_MOD = 50  # queries = vec_id % KNN_QUERY_MOD == 0
LSH_BANDS = 8
LSH_BITS = 4  # bits per band
EMB_DIM = 64
ANN_COS_T = 0.42  # verification threshold for candidate pairs

_rng = np.random.default_rng(20260816)
# plane values rounded so the literals are identical in both lowerings
PLANES = np.round(_rng.standard_normal((LSH_BANDS * LSH_BITS, EMB_DIM)), 6).tolist()


def _r6(c):
    # floor(x*1e6 + 0.5)/1e6 — identical double arithmetic to the SQL oracle
    from pyspark.sql import functions as F

    return F.floor(c * 1000000.0 + 0.5) / 1000000.0


def _read_emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _spark_dot(a: str, b: str) -> str:
    # left-fold dot product in DOUBLE (matches DuckDB list_inner_product)
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)"


def _spark_norm_expr(a: str) -> str:
    return f"sqrt({_spark_dot(a, a)})"


# ---------------------------------------------------------------------------
# 1. brute-force cosine top-k


def q_knn_bruteforce(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = _read_emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") % KNN_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = F.broadcast(q).join(e, F.col("vec_id") != F.col("query_id"))
    cos = F.expr(_spark_dot("qv", "v")) / (
        F.expr(_spark_norm_expr("qv")) * F.expr(_spark_norm_expr("v"))
    )
    scored = pairs.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
                _r6(F.col("cos")).alias("score"))
    )


SQL_KNN = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % {KNN_QUERY_MOD} = 0),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_inner_product(q.qv, e.v) /
         (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(e.v, e.v))) AS cos
  FROM q JOIN e ON e.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, floor((cos) * 1000000 + 0.5) / 1000000 AS score
FROM ranked WHERE rank <= {KNN_K}
"""

# ---------------------------------------------------------------------------
# 2. hyperplane-LSH candidate pairs + exact cosine verification


def q_ann_lsh_pairs(spark, sf_dir):
    from pyspark.sql import functions as F

    e = _read_emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    band_structs = []
    for b in range(LSH_BANDS):
        bits = []
        for k in range(LSH_BITS):
            plane = PLANES[b * LSH_BITS + k]
            arr = f"array({', '.join(f'cast({x!r} as double)' for x in plane)})"
            bits.append(f"(case when {_spark_dot(arr, 'v')} >= 0.0 then '1' else '0' end)")
        band_structs.append(
            F.struct(F.lit(b).alias("band"), F.expr(f"concat({', '.join(bits)})").alias("bkey"))
        )
    banded = (
        e.select("vec_id", F.explode(F.array(*band_structs)).alias("bk"))
        .select("vec_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
        .cache()  # 32 plane dot products per row; both join sides read it
    )
    x, y = banded.alias("x"), banded.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("vec_id_a"), F.col("y.vec_id").alias("vec_id_b"))
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("vec_id_a"), F.col("v").alias("va"))
    eb = e.select(F.col("vec_id").alias("vec_id_b"), F.col("v").alias("vb"))
    cos = F.expr(_spark_dot("va", "vb")) / (
        F.expr(_spark_norm_expr("va")) * F.expr(_spark_norm_expr("vb"))
    )
    return (
        cand.join(ea, "vec_id_a")
        .join(eb, "vec_id_b")
        .select("vec_id_a", "vec_id_b", _r6(cos).alias("score"))
        .filter(F.col("score") >= ANN_COS_T)
    )


def _sql_ann_lsh() -> str:
    bands = []
    for b in range(LSH_BANDS):
        bits = []
        for k in range(LSH_BITS):
            plane = PLANES[b * LSH_BITS + k]
            arr = f"[{', '.join(repr(x) for x in plane)}]::DOUBLE[]"
            bits.append(f"(CASE WHEN list_inner_product({arr}, v) >= 0.0 THEN '1' ELSE '0' END)")
        bands.append(f"SELECT vec_id, {b} AS band, concat({', '.join(bits)}) AS bkey FROM e")
    banded = "\nUNION ALL\n".join(bands)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
banded AS ({banded}),
cand AS (
  SELECT DISTINCT x.vec_id AS vec_id_a, y.vec_id AS vec_id_b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id)
SELECT vec_id_a, vec_id_b,
       floor((list_inner_product(a.v, b.v) /
             (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v)))) * 1000000 + 0.5) / 1000000 AS score
FROM cand
JOIN e a ON a.vec_id = vec_id_a
JOIN e b ON b.vec_id = vec_id_b
WHERE floor((list_inner_product(a.v, b.v) /
            (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v)))) * 1000000 + 0.5) / 1000000 >= {ANN_COS_T}
"""


SQL_ANN_LSH = _sql_ann_lsh()

QUERIES = {
    "emb_knn_bruteforce": q_knn_bruteforce,
    "emb_ann_lsh_pairs": q_ann_lsh_pairs,
}

ORACLES = {
    "emb_knn_bruteforce": SQL_KNN,
    "emb_ann_lsh_pairs": SQL_ANN_LSH,
}
