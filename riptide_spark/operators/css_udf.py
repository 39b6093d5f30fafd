"""Spark operator for CSS-JSON field extraction (the fast CSS path).

Field configs are plain data captured in the UDF closure (broadcast with
the task like the reference ships selector schemas to its strategy workers);
output is ``map<string, array<string>>`` plus a conflict-audit column when
merging against another extraction source (J3 of SURVEY.md §2.4 — the
column-level ``coalesce`` of two extraction strategies).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.css_extract import FieldConfig, extract_fields, merge_results

FIELDS_TYPE = T.MapType(T.StringType(), T.ArrayType(T.StringType()))


def css_extract_udf(fields: dict[str, FieldConfig]):
    """Build a pandas UDF extracting the configured fields per document."""

    @F.pandas_udf(FIELDS_TYPE)
    def extract(html: pd.Series, url: pd.Series) -> pd.Series:
        out = []
        for h, u in zip(html, url):
            if h is None:
                out.append({})
                continue
            if isinstance(h, (bytes, bytearray, memoryview)):
                h = bytes(h).decode("utf-8", errors="replace")
            try:
                out.append(extract_fields(h, u or "", fields))
            except Exception:
                out.append({})
        return pd.Series(out)

    return extract


def with_css_fields(
    df: DataFrame,
    fields: dict[str, FieldConfig],
    html_col: str = "html",
    url_col: str = "url",
    out_col: str = "css_fields",
) -> DataFrame:
    return df.withColumn(out_col, css_extract_udf(fields)(F.col(html_col), F.col(url_col)))


def merge_extractions_udf(policies: dict[str, str] | None = None, default_policy: str = "CssWins"):
    """Merge two map<string,array<string>> columns with conflict audit."""
    audit_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("field", T.StringType()),
                T.StructField("css_value", T.StringType()),
                T.StructField("other_value", T.StringType()),
                T.StructField("resolution", T.StringType()),
                T.StructField("policy_used", T.StringType()),
            ]
        )
    )
    result_type = T.StructType(
        [
            T.StructField("merged", FIELDS_TYPE),
            T.StructField("conflicts", audit_type),
        ]
    )

    @F.pandas_udf(result_type)
    def merge(css: pd.Series, other: pd.Series) -> pd.DataFrame:
        rows = []
        for c, o in zip(css, other):
            merged, conflicts = merge_results(
                {k: list(v) for k, v in (c or {}).items()},
                {k: list(v) for k, v in (o or {}).items()},
                policies,
                default_policy,
            )
            rows.append({"merged": merged, "conflicts": conflicts})
        return pd.DataFrame(rows, columns=["merged", "conflicts"])

    return merge
