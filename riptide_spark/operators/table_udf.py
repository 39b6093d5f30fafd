"""Spark operator: per-document HTML table extraction (E20)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.tables import extract_tables

TABLE_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("headers", T.ArrayType(T.StringType())),
            T.StructField("rows", T.ArrayType(T.ArrayType(T.StringType()))),
            T.StructField("caption", T.StringType()),
            T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        ]
    )
)


def tables_udf(mode: str = "all", selector: str | None = None,
               min_rows: int = 0, min_cols: int = 0):
    @F.pandas_udf(TABLE_TYPE)
    def extract(html: pd.Series) -> pd.Series:
        out = []
        for value in html:
            if value is None:
                out.append([])
                continue
            if isinstance(value, (bytes, bytearray, memoryview)):
                value = bytes(value).decode("utf-8", errors="replace")
            try:
                tables = extract_tables(value, mode, selector, min_rows, min_cols)
            except Exception:
                tables = []
            out.append(
                [
                    {
                        "headers": t.headers,
                        "rows": t.rows,
                        "caption": t.caption,
                        "metadata": t.metadata,
                    }
                    for t in tables
                ]
            )
        return pd.Series(out)

    return extract


def with_tables(df: DataFrame, html_col: str = "html", out_col: str = "tables",
                mode: str = "all", **kwargs) -> DataFrame:
    return df.withColumn(out_col, tables_udf(mode, **kwargs)(F.col(html_col)))
