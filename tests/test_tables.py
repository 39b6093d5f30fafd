"""HTML table extraction (E20) unit + Spark operator tests."""

from __future__ import annotations

from riptide_spark.functions.tables import extract_tables

HTML = """
<html><body>
<table id="t1" class="data">
  <caption> Quarterly numbers </caption>
  <thead><tr><th>Region</th><th>Q1</th><th>Q2</th></tr></thead>
  <tbody>
    <tr><td>North</td><td>10</td><td>20</td></tr>
    <tr><td>South</td><td>30</td><td>40</td></tr>
  </tbody>
</table>
<table id="t2">
  <tr><th>K</th><th>V</th></tr>
  <tr><td>a</td><td>1</td></tr>
</table>
<table id="t3">
  <tr><td>no</td><td>headers</td></tr>
</table>
</body></html>
"""


def test_extract_all_tables():
    tables = extract_tables(HTML, "all")
    assert len(tables) == 3
    t1 = tables[0]
    assert t1.headers == ["Region", "Q1", "Q2"]
    assert t1.rows == [["North", "10", "20"], ["South", "30", "40"]]
    assert t1.caption == "Quarterly numbers"
    assert t1.metadata["id"] == "t1"
    assert t1.metadata["class"] == "data"


def test_first_row_th_headers():
    t2 = extract_tables(HTML, "all")[1]
    assert t2.headers == ["K", "V"]
    assert t2.rows == [["a", "1"]]


def test_headerless_table():
    t3 = extract_tables(HTML, "all")[2]
    assert t3.headers == []
    assert t3.rows == [["no", "headers"]]


def test_with_headers_mode_filters():
    tables = extract_tables(HTML, "with_headers")
    assert [t.metadata["id"] for t in tables] == ["t1", "t2"]


def test_by_selector_and_min_size():
    tables = extract_tables(HTML, "by_selector", selector="table.data")
    assert len(tables) == 1 and tables[0].metadata["id"] == "t1"
    tables = extract_tables(HTML, "min_size", min_rows=2, min_cols=3)
    assert len(tables) == 1 and tables[0].metadata["id"] == "t1"


def test_tables_udf_spark(spark):
    from riptide_spark.operators.table_udf import with_tables

    df = spark.createDataFrame([("u1", HTML.encode())], "url string, html binary")
    row = with_tables(df).collect()[0]
    assert len(row["tables"]) == 3
    first = row["tables"][0]
    assert list(first["headers"]) == ["Region", "Q1", "Q2"]
    assert [list(r) for r in first["rows"]] == [["North", "10", "20"], ["South", "30", "40"]]
    assert first["metadata"]["id"] == "t1"
