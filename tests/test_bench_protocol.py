"""Unit tests for bench.py's measurement-protocol helpers (no Spark).

The scaling criterion (BASELINE.md north rule) is only as trustworthy as
the harness that measures it, so the two pieces of pure logic the round-5
protocol hardening added get pinned here:

* ``_matched_core_sets`` — rate-matched core pinning that removes the
  host's heterogeneous-vCPU confounder from the N→4N efficiency ratio
  (BENCH.md "host heterogeneity"; the round-5 boot probed a 1.6-1.7×
  per-core spread that mechanically capped a naive 1→4 pair at ~0.88).
* ``merge_scale_dial_record`` — best-of-N pooling that dedups runs by a
  unique run_id stamp, not by timing equality (ADVICE r4 #3: two distinct
  runs whose rounded timings tie must both count toward the advertised
  best-of-N).
"""

from __future__ import annotations

import bench


def _fake_rates(rates):
    return lambda secs=2.0: dict(rates)


def test_matched_sets_pick_fastest_high_and_mean_matched_low(monkeypatch):
    # Core 5 is fastest but an outlier; cores 1-3 cluster near the top;
    # cores 0 and 4 are the degraded vCPUs a naive 0..N-1 pin would use.
    rates = {0: 400.0, 1: 590.0, 2: 600.0, 3: 610.0, 4: 410.0, 5: 700.0}
    monkeypatch.setattr(bench, "_probe_core_rates", _fake_rates(rates))
    low_pin, high_pin, info = bench._matched_core_sets(1, 4)

    assert info["high_cores"] == [1, 2, 3, 5]  # the 4 fastest
    assert high_pin == "1,2,3,5"
    # mean of the high set is 625; core 3 (610) is nearest → the low level
    # runs on hardware representative of the high set, ratio ≈ 1.
    assert low_pin == "3"
    assert 0.95 <= info["hw_ratio_low_over_high"] <= 1.05
    assert info["spread_all"] == round(700.0 / 400.0, 3)


def test_matched_sets_low_subset_of_high(monkeypatch):
    rates = {c: 500.0 + c for c in range(8)}
    monkeypatch.setattr(bench, "_probe_core_rates", _fake_rates(rates))
    low_pin, high_pin, _ = bench._matched_core_sets(2, 4)
    high = {int(c) for c in high_pin.split(",")}
    low = {int(c) for c in low_pin.split(",")}
    assert low < high and len(low) == 2 and len(high) == 4


def test_matched_sets_fall_back_without_probe_data(monkeypatch):
    monkeypatch.setattr(bench, "_probe_core_rates", _fake_rates({0: 1.0}))
    low_pin, high_pin, info = bench._matched_core_sets(1, 4)
    assert (low_pin, high_pin) == ("0-0", "0-3")
    assert info == {}


def _dial_run(run_id, wall):
    return {
        "metric": "scale dial sf0.1→sf1.0 wall growth (input ×10)",
        "value": 2.0,
        "unit": "ratio",
        "cpus": 32,
        "run_id": run_id,
        "per_sf": {
            "0.1": {
                "docs": 100,
                "dedup_corpus_rows": 10,
                "plan_gates": {},
                "queries": {"extract": wall},
            },
            "1.0": {
                "docs": 1000,
                "dedup_corpus_rows": 100,
                "plan_gates": {},
                "queries": {"extract": wall * 2.0},
            },
        },
        "growth": {"extract": 2.0},
    }


def test_merge_dedups_on_run_id_not_timing_equality(monkeypatch, tmp_path):
    # Two genuinely distinct runs whose rounded timings tie exactly: both
    # must count (ADVICE r4 #3). A third with a REPEATED run_id must not.
    record = tmp_path / "record.json"
    monkeypatch.setattr(bench, "SCALE_DIAL_RECORD", str(record))
    monkeypatch.setattr(bench, "SCALE_DIAL_PRIOR", ())

    first = bench.merge_scale_dial_record(_dial_run("aaa", 5.0))
    record.write_text(__import__("json").dumps(first))

    second = bench.merge_scale_dial_record(_dial_run("bbb", 5.0))
    assert "best-of-2" in second["metric"]
    record.write_text(__import__("json").dumps(second))

    replay = bench.merge_scale_dial_record(_dial_run("bbb", 5.0))
    assert "best-of-2" in replay["metric"]


def test_merge_takes_per_cell_minimum(monkeypatch, tmp_path):
    record = tmp_path / "record.json"
    monkeypatch.setattr(bench, "SCALE_DIAL_RECORD", str(record))
    monkeypatch.setattr(bench, "SCALE_DIAL_PRIOR", ())

    first = bench.merge_scale_dial_record(_dial_run("aaa", 8.0))
    record.write_text(__import__("json").dumps(first))
    merged = bench.merge_scale_dial_record(_dial_run("bbb", 5.0))
    assert merged["best_wall_sec"]["0.1"]["extract"] == 5.0
    assert merged["best_wall_sec"]["1.0"]["extract"] == 10.0
