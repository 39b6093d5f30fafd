"""Similarity search over embedding columns (array<float>).

Two paths, both pure built-in expressions:

* **brute-force cosine top-k** — ``zip_with`` dot product + ``aggregate``
  norm, one pass over the table, no shuffle except the final top-k. The
  correctness baseline; also the right plan when the query set is small
  (broadcast the queries and let every partition score its rows locally).
* **LSH-bucketed ANN** — random-hyperplane signatures (deterministic planes
  derived from md5 of the dimension index, so every engine reproduces them),
  candidates = rows sharing a signature bucket, exact re-rank inside the
  bucket. Scales as O(rows/buckets) per query at 10^12-row scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against the row with ``query_id``.

    The single query vector is cross-broadcast (1 row) — no shuffle of the
    big side; ordering ties broken by id for determinism.
    """
    query = embeddings.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("query_vec")
    )
    scored = (
        embeddings.crossJoin(F.broadcast(query))
        .filter(F.col(id_col) != query_id)
        .select(
            id_col,
            F.round(
                cosine(
                    F.col(vec_col).cast("array<double>"),
                    F.col("query_vec").cast("array<double>"),
                ),
                6,
            ).cast("double").alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def _plane_component(dim_index: Column, plane: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    md5-derived, reproducible in any engine."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"plane{plane}:"), dim_index.cast("string"))), 1, 8),
        16,
        10,
    ).cast("double")
    return h / F.lit(4294967296.0) - 0.5


def lsh_signature(vec: Column, planes: int = 8) -> Column:
    """Random-hyperplane sign signature packed into an int."""
    dims = F.transform(vec, lambda x, i: F.struct(x.alias("v"), i.alias("i")))

    def _projector(plane: int):
        # NB: a plain `lambda acc, d, p=p:` would read as a 3-arg lambda to
        # PySpark's arity inspection; close over the plane index instead.
        return lambda acc, d: acc + d["v"] * _plane_component(d["i"], plane)

    sig = F.lit(0)
    for p in range(planes):
        proj = F.aggregate(dims, F.lit(0.0), _projector(p))
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(0)
    return sig


def ann_topk_lsh(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only rows in the query's LSH bucket.

    At scale: write the table bucketed by ``lsh_bucket`` once, then each
    query prunes to one bucket (partition pruning) before the exact re-rank.
    """
    with_sig = embeddings.withColumn(
        "lsh_bucket", lsh_signature(F.col(vec_col).cast("array<double>"), planes)
    )
    query = with_sig.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("query_vec"), F.col("lsh_bucket").alias("query_bucket")
    )
    candidates = (
        with_sig.join(F.broadcast(query), F.col("lsh_bucket") == F.col("query_bucket"))
        .filter(F.col(id_col) != query_id)
        .select(
            id_col,
            F.round(
                cosine(
                    F.col(vec_col).cast("array<double>"),
                    F.col("query_vec").cast("array<double>"),
                ),
                6,
            ).cast("double").alias("cosine_sim"),
        )
    )
    return candidates.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)
