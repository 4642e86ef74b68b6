"""Bench artifact contract (VERDICT r4 items 1+8).

Round 4's official benchmark artifact was rc=124/parsed=null: bench.py
printed its single JSON line only after ALL auxiliary sections, so the
driver's wall-clock timeout destroyed every number, including the core fps
measured 20+ minutes earlier. These tests pin the fixed contract of
bench.run_sections with a fake clock and stub sections — pure host logic,
no device or compile involved:

  (a) the core result line is emitted BEFORE any auxiliary section runs;
  (b) a wall-clock deadline skips the remaining sections and records them
      in 'skipped_sections' instead of silently dropping them;
  (c) a raising section degrades to '{name}_error' and later sections
      still run;
  (d) every emitted line is a superset of the previous one (the driver
      parses the LAST JSON line of stdout — each must parse on its own).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


class FakeClock:
    def __init__(self):
        self.t = 100.0

    def __call__(self):
        return self.t


def _scheduler(sections, budget_s, clock):
    emitted = []
    result = {"metric": "core", "value": 1.0}
    bench.run_sections(result, sections, budget_s, clock=clock,
                       emit=lambda r: emitted.append(dict(r)))
    return result, emitted


def test_core_line_emitted_before_any_section():
    clock = FakeClock()
    order = []

    def section(res):
        order.append("section_ran")
        return {"aux": 1}

    result, emitted = _scheduler([("aux", section)], 60.0, clock)
    # first emission is the bare core result — a timeout landing inside
    # the first section still leaves a parsable core line on stdout
    assert emitted[0] == {"metric": "core", "value": 1.0}
    assert "aux" not in emitted[0]
    assert result["aux"] == 1


def test_deadline_skips_remaining_and_records_them():
    clock = FakeClock()
    ran = []

    def fast(res):
        ran.append("fast")
        clock.t += 10.0
        return {"fast": 1}

    def slow(res):
        ran.append("slow")
        clock.t += 100.0          # blows through the budget
        return {"slow": 1}

    def late(res):
        ran.append("late")
        return {"late": 1}

    result, emitted = _scheduler(
        [("fast", fast), ("slow", slow), ("late", late), ("later", late)],
        60.0, clock)
    assert ran == ["fast", "slow"]          # 'late'/'later' never started
    assert result["skipped_sections"] == ["late", "later"]
    assert result["fast"] == 1 and result["slow"] == 1
    assert "late" not in result
    # per-section wall time recorded for budget calibration
    assert result["bench_section_s"]["slow"] == 100.0


def test_zero_budget_skips_everything_but_emits_core():
    clock = FakeClock()
    result, emitted = _scheduler(
        [("a", lambda r: {"a": 1}), ("b", lambda r: {"b": 1})], 0.0, clock)
    assert emitted[0] == {"metric": "core", "value": 1.0}
    assert result["skipped_sections"] == ["a", "b"]
    assert "a" not in result and "b" not in result


def test_raising_section_degrades_and_later_sections_run():
    clock = FakeClock()

    def boom(res):
        raise RuntimeError("relay exploded")

    result, _ = _scheduler(
        [("boom", boom), ("after", lambda r: {"after": 1})], 60.0, clock)
    assert "relay exploded" in result["boom_error"]
    assert result["after"] == 1


def test_emissions_grow_monotonically():
    clock = FakeClock()
    sections = [(f"s{i}", (lambda i: lambda r: {f"k{i}": i})(i))
                for i in range(4)]
    _, emitted = _scheduler(sections, 60.0, clock)
    # core + one per section + the final (skipped/total) line
    assert len(emitted) == 1 + 4 + 1
    for prev, cur in zip(emitted, emitted[1:]):
        missing = {k: v for k, v in prev.items()
                   if k not in cur or (k != "bench_section_s"
                                       and cur[k] != v)}
        assert not missing, f"line shrank or mutated: {missing}"


def test_sections_see_accumulated_result():
    # bench_mfu reads real_fps/rotated_fps from the accumulated result —
    # the scheduler must pass the live dict, not a copy
    clock = FakeClock()

    def first(res):
        return {"real_fps": 50.0}

    def second(res):
        assert res["real_fps"] == 50.0
        return {"derived": res["real_fps"] * 2}

    result, _ = _scheduler([("a", first), ("b", second)], 60.0, clock)
    assert result["derived"] == 100.0
