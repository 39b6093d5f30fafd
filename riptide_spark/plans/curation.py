"""The composed corpus-curation pass — the query a 100 TB training-data
pipeline partitions its corpus on.

Three stages over (id, text), all reusing the individually-oracled
operators (``operators/dedup.py``, ``oracle_queries.quality_keep_expr``):

1. **exact dedup** — md5 fingerprint groupBy, keep the min id;
2. **near-dup clusters** — MinHash-LSH candidate pairs → connected
   components, keep the cluster canonical (transitive: A~B, B~C ⇒ one
   survivor even though A and C never shared a bucket);
3. **Gopher-rule quality filter** — pure codegen boolean.

One verdict per document with precedence
``exact_dup > near_dup > low_quality > kept``.

Scale shape: stage 1 is one shuffle on a 16-byte key; stage 2 composes
only the bucketed/capped LSH cascade plus the adaptive connected
components; stage 3 is expression-only. Nothing is all-pairs
(gated by ``test_plans.test_dedup_cascade_plan_has_no_cartesian_or_nested_loop``
and re-asserted at the sf1 scale dial by ``bench.py --scale-dial``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import oracle_queries as OQ
from ..operators.dedup import (
    connected_components,
    exact_fingerprint,
    minhash_candidate_pairs,
)


def curation_verdicts(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One (id, verdict, quality_ok) row per document; see module doc."""
    fp = corpus.select(
        F.col(id_col), F.col(text_col), exact_fingerprint(F.col(text_col)).alias("fp")
    )
    keep = fp.groupBy("fp").agg(F.min(id_col).alias("keep_id"))
    flagged = fp.join(keep, "fp")
    pairs = minhash_candidate_pairs(corpus, text_col, id_col, materialize=True)
    comp = connected_components(pairs).select(
        F.col("node").alias(id_col), F.col("component").alias("comp")
    )
    out = flagged.join(comp, id_col, "left")
    quality_keep = F.expr(OQ.quality_keep_expr(OQ.SPARK, text_col))
    verdict = (
        F.when(F.col(id_col) != F.col("keep_id"), F.lit("exact_dup"))
        .when(
            F.col("comp").isNotNull() & (F.col("comp") != F.col(id_col)),
            F.lit("near_dup"),
        )
        .when(~quality_keep, F.lit("low_quality"))
        .otherwise(F.lit("kept"))
    )
    return out.select(
        F.col(id_col),
        verdict.alias("verdict"),
        quality_keep.cast("boolean").alias("quality_ok"),
    )
