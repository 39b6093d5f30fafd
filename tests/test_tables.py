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


def test_colspan_expands_columns():
    """extractor.rs:328-366: a colspan=2 cell covers two column slots."""
    html = (
        "<table><tr><th>A</th><th>B</th><th>C</th></tr>"
        "<tr><td colspan='2'>wide</td><td>x</td></tr>"
        "<tr><td>a</td><td>b</td><td>c</td></tr></table>"
    )
    t = extract_tables(html, "all")[0]
    assert t.headers == ["A", "B", "C"]
    assert t.rows == [["wide", "wide", "x"], ["a", "b", "c"]]


def test_rowspan_fills_next_rows():
    html = (
        "<table><tr><td rowspan='2'>tall</td><td>x</td></tr>"
        "<tr><td>y</td></tr>"
        "<tr><td>a</td><td>b</td></tr></table>"
    )
    t = extract_tables(html, "all")[0]
    assert t.rows == [["tall", "x"], ["tall", "y"], ["a", "b"]]


def test_rowspan_and_colspan_combined():
    """A 2x2 spanning cell covers four slots (the spans_over grid)."""
    html = (
        "<table>"
        "<tr><td rowspan='2' colspan='2'>big</td><td>r1</td></tr>"
        "<tr><td>r2</td></tr>"
        "<tr><td>a</td><td>b</td><td>c</td></tr></table>"
    )
    t = extract_tables(html, "all")[0]
    assert t.rows == [["big", "big", "r1"], ["big", "big", "r2"], ["a", "b", "c"]]


def test_header_colspan_expansion():
    html = (
        "<table><tr><th colspan='2'>AB</th><th>C</th></tr>"
        "<tr><td>1</td><td>2</td><td>3</td></tr></table>"
    )
    t = extract_tables(html, "all")[0]
    assert t.headers == ["AB", "AB", "C"]


def test_invalid_span_attribute_defaults_to_one():
    html = (
        "<table><tr><td colspan='x' rowspan='0'>a</td><td>b</td></tr>"
        "<tr><td>c</td><td>d</td></tr></table>"
    )
    t = extract_tables(html, "all")[0]
    assert t.rows == [["a", "b"], ["c", "d"]]


def test_tables_udf_spark(spark):
    from riptide_spark.operators.table_udf import with_tables

    df = spark.createDataFrame([("u1", HTML.encode())], "url string, html binary")
    row = with_tables(df).collect()[0]
    assert len(row["tables"]) == 3
    first = row["tables"][0]
    assert list(first["headers"]) == ["Region", "Q1", "Q2"]
    assert [list(r) for r in first["rows"]] == [["North", "10", "20"], ["South", "30", "40"]]
    assert first["metadata"]["id"] == "t1"


def test_mid_table_th_row_is_a_body_row():
    """extractor.rs:256-263 skips a th-bearing row ONLY at row_index 0
    (once headers exist); a mid-table th row is a body row and receives
    grid rowspan coverage. Round 3 dropped every th-bearing row — the
    divergence ADVICE r3 flagged; this pins the parity fix."""
    html = (
        "<table><tr><th>A</th><th>B</th></tr>"
        "<tr><td rowspan='2'>tall</td><td>x</td></tr>"
        "<tr><th>mid-header</th><th>h2</th></tr>"
        "<tr><td>a</td><td>b</td></tr></table>"
    )
    t = extract_tables(html, "all")[0]
    assert t.headers == ["A", "B"]
    # row_index 0 is the skipped header row; index 2 (the mid-table th
    # row) is emitted WITH the rowspan slot materialized at column 0.
    assert t.rows == [["tall", "x"], ["tall", "mid-header", "h2"], ["a", "b"]]


def test_explicit_tbody_rows_all_emitted():
    """With an explicit <tbody>, the reference takes the tbody branch
    (extractor.rs:228-241): every tbody row is a body row, including
    th-bearing ones — no index-0 skip in that branch."""
    html = (
        "<table><thead><tr><th>H1</th><th>H2</th></tr></thead>"
        "<tbody><tr><th>k</th><td>v</td></tr>"
        "<tr><td>a</td><td>b</td></tr></tbody></table>"
    )
    t = extract_tables(html, "all")[0]
    assert t.headers == ["H1", "H2"]
    assert t.rows == [["k", "v"], ["a", "b"]]


def test_rowspan_over_empty_physical_row():
    """An empty <tr> still advances the physical row counter; the covered
    slot is emitted as that physical row's only cell."""
    html = (
        "<table><tr><td rowspan='2'>tall</td><td>x</td></tr>"
        "<tr></tr>"
        "<tr><td>a</td><td>b</td></tr></table>"
    )
    t = extract_tables(html, "all")[0]
    assert t.rows == [["tall", "x"], ["tall"], ["a", "b"]]


def test_thead_with_td_only_cells_yields_headers():
    """ADVICE r4 #1: with ANY `thead tr` present the reference's
    extract_multi_level_headers takes that row's cells as headers —
    extract_row_cells selects `td, th` (extractor.rs:300-312), so a
    td-only thead row still yields headers and the fallback never runs
    (a tbody's leading th row must stay a body row)."""
    html = (
        "<table><thead><tr><td>A</td><td>B</td></tr></thead>"
        "<tr><th>not-a-header</th><th>either</th></tr>"
        "<tr><td>a</td><td>b</td></tr></table>"
    )
    t = extract_tables(html, "all")[0]
    assert t.headers == ["A", "B"]
    # The th row sits at body row_index 0 with headers non-empty → the
    # extractor.rs:256-263 skip consumes it; only the td row is a body row.
    assert t.rows == [["a", "b"]]


def test_multi_row_thead_last_row_is_main_headers():
    """build_hierarchical_header_structure (extractor.rs:503-512): the
    LAST thead row becomes the main headers (most specific level);
    earlier rows are sub-header levels this flat representation drops."""
    html = (
        "<table><thead>"
        "<tr><th colspan='2'>Group</th></tr>"
        "<tr><th>K</th><th>V</th></tr>"
        "</thead><tr><td>a</td><td>1</td></tr></table>"
    )
    t = extract_tables(html, "all")[0]
    assert t.headers == ["K", "V"]
    assert t.rows == [["a", "1"]]


def test_fallback_takes_all_cells_of_first_first_child_tr_only():
    """extract_fallback_headers (extractor.rs:464-482): no thead → the
    FIRST `tr:first-child` match in document order decides; when it
    bears a th, ALL its cells (td included) become headers. A later
    first-child tr (e.g. a nested table's) is never consulted."""
    html = (
        "<table><tr><th>K</th><td>V</td></tr>"
        "<tr><td>a</td><td>1</td></tr></table>"
    )
    t = extract_tables(html, "all")[0]
    assert t.headers == ["K", "V"]
    assert t.rows == [["a", "1"]]
    # First first-child tr is td-only → NO headers, even though a later
    # row bears th cells (the old fallback scanned every first-child tr).
    html2 = (
        "<table><tr><td>x</td><td>y</td></tr>"
        "<tr><th>late</th><th>th</th></tr>"
        "<tr><td>a</td><td>b</td></tr></table>"
    )
    t2 = extract_tables(html2, "all")[0]
    assert t2.headers == []
    assert t2.rows == [["x", "y"], ["late", "th"], ["a", "b"]]
