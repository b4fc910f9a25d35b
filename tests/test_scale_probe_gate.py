"""Unit gate for scripts/scale_probe.py's judgment rules.

The 100x scale gate (VERDICT r11 item 2) runs real families against a
~2 GB sf10 directory; its JUDGMENT logic — canary budget scaling,
retry-min, empty/error handling — must not need that data to be
proven. These tests drive ``run_gate`` with fake runners and pin each
rule, so a regression in the gate itself fails in pytest, not on the
next noisy sf10 campaign.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_SPEC = importlib.util.spec_from_file_location(
    "scale_probe",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "scale_probe.py"),
)
scale_probe = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(scale_probe)

run_gate = scale_probe.run_gate
SLACK = scale_probe.ABS_SLACK_SEC

RECORDED = {"q1_pricing_summary": 10.0, "fam_a": 20.0, "fam_b": 4.0}
NAMES = list(RECORDED)


def _runner(walls, rows=100):
    """Fake runner: walls[name] is a float or a list popped per call."""
    def run(name):
        w = walls[name]
        if isinstance(w, list):
            w = w.pop(0)
        if w is None:
            return {"error": "child exploded"}
        return {"rows": rows if not isinstance(rows, dict) else rows[name],
                "sec": w}
    return run


def _silent(_msg):
    pass


def test_all_within_budget_passes():
    results, failures = run_gate(
        NAMES, RECORDED, _runner({"q1_pricing_summary": 10.0, "fam_a": 25.0, "fam_b": 5.0}),
        mult=2.0, log=_silent)
    assert failures == []
    assert all(r["status"] == "ok" for r in results.values())


def test_slow_family_fails_after_two_slow_runs():
    # fam_a budget = 2*20 + 5 = 45; both runs at 120s -> SLOW, judged on min
    walls = {"q1_pricing_summary": 10.0, "fam_a": [120.0, 118.0], "fam_b": 4.0}
    results, failures = run_gate(NAMES, RECORDED, _runner(walls), mult=2.0, log=_silent)
    assert results["fam_a"]["status"] == "SLOW"
    assert results["fam_a"]["sec"] == 118.0  # min of the two walls
    assert len(failures) == 1 and failures[0].startswith("fam_a:")


def test_transient_noise_passes_on_retry():
    # first run over budget, retry well under -> ok (min-of-2 rule)
    walls = {"q1_pricing_summary": 10.0, "fam_a": [120.0, 30.0], "fam_b": 4.0}
    results, failures = run_gate(NAMES, RECORDED, _runner(walls), mult=2.0, log=_silent)
    assert failures == []
    assert results["fam_a"]["status"] == "ok"
    assert results["fam_a"]["sec"] == 30.0


def test_canary_scales_later_budgets_but_not_itself():
    # q1 at 3x its recording: later budgets scale by 3 (fam_a 90s fits
    # 2*20*3+5=125), but q1 itself is judged UNSCALED — a genuine q1
    # regression (wall > 2*10+5=25) must still fail.
    walls = {"q1_pricing_summary": [30.0, 30.0], "fam_a": 90.0, "fam_b": 4.0}
    results, failures = run_gate(NAMES, RECORDED, _runner(walls), mult=2.0, log=_silent)
    assert results["q1_pricing_summary"]["status"] == "SLOW"
    assert results["fam_a"]["status"] == "ok"
    assert results["fam_a"]["budget_sec"] == 2.0 * 20.0 * 3.0 + SLACK
    # only q1 failed
    assert len(failures) == 1 and failures[0].startswith("q1_pricing_summary:")


def test_canary_never_shrinks_budgets():
    # q1 faster than its recording must clamp host_factor at 1.0, not
    # tighten later budgets below the recorded curve.
    walls = {"q1_pricing_summary": 5.0, "fam_a": 25.0, "fam_b": 4.0}
    results, failures = run_gate(NAMES, RECORDED, _runner(walls), mult=2.0, log=_silent)
    assert failures == []
    assert results["fam_a"]["budget_sec"] == 2.0 * 20.0 + SLACK


def test_empty_result_always_fails():
    rows = {"q1_pricing_summary": 100, "fam_a": 0, "fam_b": 100}
    results, failures = run_gate(
        NAMES, RECORDED,
        _runner({"q1_pricing_summary": 10.0, "fam_a": 1.0, "fam_b": 4.0}, rows=rows),
        mult=2.0, log=_silent)
    assert results["fam_a"]["status"] == "EMPTY"
    assert any("fam_a" in f for f in failures)


def test_child_error_always_fails():
    walls = {"q1_pricing_summary": 10.0, "fam_a": None, "fam_b": 4.0}
    results, failures = run_gate(NAMES, RECORDED, _runner(walls), mult=2.0, log=_silent)
    assert results["fam_a"]["status"] == "ERROR"
    assert any("fam_a" in f for f in failures)
    # an errored family must not poison the rest of the campaign
    assert results["fam_b"]["status"] == "ok"


def test_empty_canary_leaves_budgets_unscaled():
    """r13 ADVICE: a 0-row q1 is a broken query/dataset, not a host
    signal — its wall must NOT set host_factor (a meaningless 3x wall
    would triple every later budget and mask real regressions)."""
    rows = {"q1_pricing_summary": 0, "fam_a": 100, "fam_b": 100}
    walls = {"q1_pricing_summary": 30.0, "fam_a": 25.0, "fam_b": 4.0}
    results, failures = run_gate(
        NAMES, RECORDED, _runner(walls, rows=rows), mult=2.0, log=_silent)
    assert results["q1_pricing_summary"]["status"] == "EMPTY"
    assert results["fam_a"]["budget_sec"] == 2.0 * 20.0 + SLACK  # unscaled
    assert any("q1_pricing_summary" in f for f in failures)


def test_errored_canary_logs_unscaled_budgets():
    """r13 ADVICE: when q1 ERRORs, later budgets run unscaled — and
    the gate must SAY so instead of silently gating raw on a possibly
    noisy host."""
    msgs = []
    walls = {"q1_pricing_summary": None, "fam_a": 25.0, "fam_b": 4.0}
    results, failures = run_gate(NAMES, RECORDED, _runner(walls), mult=2.0,
                                 log=msgs.append)
    assert results["q1_pricing_summary"]["status"] == "ERROR"
    assert results["fam_a"]["budget_sec"] == 2.0 * 20.0 + SLACK  # unscaled
    assert any("UNSCALED" in m for m in msgs)


def test_filtered_out_canary_logs_unscaled_budgets():
    """r13 ADVICE: `--only fam_a` drops the canary from the list — the
    gate must announce that budgets are unscaled for the whole run."""
    msgs = []
    results, failures = run_gate(
        ["fam_a"], RECORDED, _runner({"fam_a": 25.0}), mult=2.0, log=msgs.append)
    assert failures == []
    assert any("UNSCALED" in m for m in msgs)


def test_probe_families_have_recorded_thresholds():
    """Every gated family must have a checked-in threshold (and the
    thresholds file must not carry dead names)."""
    import json
    with open(scale_probe.THRESHOLDS_PATH) as f:
        walls = json.load(f)["walls_sec"]
    assert set(scale_probe.PROBE_FAMILIES) == set(walls)
    assert all(w > 0 for w in walls.values())


def test_note_retention_keyed_to_described_families():
    """r14 ADVICE: the --record notes-preservation must track the
    SPECIFIC families the note describes, not 'any family skipped' —
    once every described family is re-recorded fresh, the note dies
    even if unrelated families were skipped."""
    from scripts.scale_probe import retained_note_families

    prior = {"notes": "soak-sourced walls", "notes_families": ["a", "b"]}
    walls = {"a": 1.0, "b": 2.0, "c": 3.0}
    # only unrelated 'c' re-recorded -> both subjects survive
    assert retained_note_families(prior, walls, ["c"]) == ["a", "b"]
    # 'a' re-recorded -> note now describes only 'b'
    assert retained_note_families(prior, walls, ["a", "c"]) == ["b"]
    # every described family re-recorded (but 'c' skipped!) -> note dies
    assert retained_note_families(prior, walls, ["a", "b"]) == []
    # a described family pruned from PROBE_FAMILIES (no wall) -> dropped
    assert retained_note_families(prior, {"b": 2.0}, []) == ["b"]
    # legacy file without notes_families -> nothing retained
    assert retained_note_families({"notes": "x"}, walls, []) == []


def test_record_drift_warning_on_inflated_rerecord():
    """r14: an inflated recording loosens every future gate run, so
    --record warns (not fails) when a re-recorded wall exceeds 1.5x its
    prior value; new families and small moves stay silent."""
    from scripts.scale_probe import record_drift_warnings

    prior = {"a": 100.0, "b": 10.0}
    msgs = record_drift_warnings(prior, {"a": 160.0, "b": 12.0, "new": 50.0})
    assert len(msgs) == 1 and msgs[0].startswith("a:")
    assert record_drift_warnings(prior, {"a": 149.0}) == []
    assert record_drift_warnings({}, {"a": 1.0}) == []


def test_special_families_are_gated_nonregistry_variants():
    """r15 (VERDICT r14 item 4): the coarse-trigger drain is gated as a
    SPECIAL family — a run-configuration variant of a registered query,
    not a new registry name (the registry is frozen). Pin that every
    special is in the probe list, shadows no registry name, every
    non-special probe family IS a registry name, and the coarse variant
    really passes files_per_trigger=None (the whole point of the gate:
    a trigger-config regression must change this string to hide)."""
    from data_engineering_rag_spark.plans import REGISTRY

    specials = scale_probe.SPECIAL_FAMILIES
    assert set(specials) <= set(scale_probe.PROBE_FAMILIES)
    assert not set(specials) & set(REGISTRY)
    for name in scale_probe.PROBE_FAMILIES:
        if name not in specials:
            assert name in REGISTRY, f"probe family not registered: {name}"
    coarse = specials["stream_user_totals_state_v2_coarse"]
    assert "files_per_trigger=None" in coarse
    assert "user_totals_state_v2_stream" in coarse
