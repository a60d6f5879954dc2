"""bench.py canary logic — pure-function tests (no Spark).

The bench's host-noise self-defense: every batch times a fixed canary
trio; `_canary_verdict` compares each batch's canary against a rolling
floor and names the batches to retry. These tests pin the decision
table, including the synthetic-contamination case the r6 verdict asked
for (a run sampled during host/VM contention must come out flagged,
and a uniformly-slow run must not be able to raise the floor)."""

from __future__ import annotations

import json

import bench


def test_healthy_run_self_calibrates_without_history():
    floor, ratio, over = bench._canary_verdict([1.02, 1.00, 1.05], None)
    assert floor == 1.00
    assert ratio == 1.05
    assert over == []


def test_contaminated_batches_are_named_against_stored_floor():
    # batches 1 and 3 sampled during contention (>1.3x the known floor)
    floor, ratio, over = bench._canary_verdict([1.05, 1.9, 1.1, 2.6], 1.0)
    assert floor == 1.0
    assert ratio == 2.6
    assert over == [1, 3]


def test_uniform_contamination_cannot_raise_the_floor():
    # every batch slow (the 137.6s r6 run shape): the stored floor wins
    # the min, so ALL batches are over tolerance -> run flagged, floor
    # unchanged
    floor, ratio, over = bench._canary_verdict([1.8, 2.1, 1.9], 1.0)
    assert floor == 1.0
    assert over == [0, 1, 2]
    assert ratio > bench.CANARY_TOLERANCE


def test_faster_run_lowers_the_floor():
    floor, ratio, over = bench._canary_verdict([0.8, 0.85], 1.0)
    assert floor == 0.8
    assert over == []
    assert ratio == 0.85 / 0.8


def test_floor_file_roundtrip_and_mismatch_invalidation(tmp_path, monkeypatch):
    p = tmp_path / "floor.json"
    monkeypatch.setattr(bench, "CANARY_FLOOR_PATH", p)
    assert bench._load_floor() is None  # no file yet
    bench._store_floor(1.234)
    assert bench._load_floor() == 1.234
    # floor recorded for a different SF dir must not be reused
    data = json.loads(p.read_text())
    data["sf_dir"] = "/somewhere/else"
    p.write_text(json.dumps(data))
    assert bench._load_floor() is None
