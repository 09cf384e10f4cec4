"""Unit tests for the scaling protocol's DRAM-floor cleanliness rule.

The rule under test is ``tools/run_scaling._apply_mem_rule`` (v2,
guarded-reference): a round's in-region DRAM gauges must each be >= ``frac``
x the cross-round best for that region type, where the reference best is
taken over CPU-clean rounds only — the bandwidth probe reads system-wide
DRAM traffic, so readings from rounds with foreign CPU load anywhere are
inflated by the neighbor's own memory traffic and invalid as quiet-host
references (this exact failure declassified genuinely clean rounds twice
before the guard existed; see run_scaling.py docstring).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from run_scaling import _apply_mem_rule  # noqa: E402


def _round(n, clean_cpu, small_mem, large_mem):
    return {"round": n, "clean_cpu": clean_cpu,
            "small_mem": small_mem, "large_mem": large_mem}


def test_contaminated_round_reading_never_sets_the_floor():
    # The poisoning scenario: a CPU-contaminated round records an inflated
    # 9.3 GB/s (neighbor traffic on top of its own); the two CPU-clean
    # rounds read ~5.5-6.1. Under v1 (all-rounds max) the floor would be
    # 0.75 * 9.3 = 6.98 and both clean rounds would be declassified; under
    # v2 the reference pool is the clean rounds themselves.
    rounds = [_round(1, True, 5.5, 6.1),
              _round(2, False, 5.4, 9.3),
              _round(3, True, 5.6, 5.9)]
    _apply_mem_rule(rounds, frac=0.75)
    assert rounds[0]["mem_clean"] and rounds[0]["clean"]
    assert rounds[2]["mem_clean"] and rounds[2]["clean"]
    assert not rounds[1]["clean"]  # clean_cpu False dominates regardless


def test_dram_contaminated_cpu_clean_round_is_still_declassified():
    # The instrument must still bite: a CPU-clean round whose 32-wide
    # region achieved less than frac x another CPU-clean round's reading
    # ran under memory contention invisible to the CPU gauges.
    rounds = [_round(1, True, 5.5, 5.9),
              _round(2, True, 5.4, 2.7)]  # 2.7 < 0.75 * 5.9
    _apply_mem_rule(rounds, frac=0.75)
    assert rounds[0]["clean"]
    assert rounds[1]["clean_cpu"] and not rounds[1]["mem_clean"]
    assert not rounds[1]["clean"]


def test_no_cpu_clean_round_falls_back_to_all_rounds_max():
    # With zero CPU-clean rounds nothing can be clean anyway (clean
    # requires clean_cpu), but mem_clean should still classify against the
    # v1 all-rounds max rather than crash or pass everything.
    rounds = [_round(1, False, 5.5, 9.3),
              _round(2, False, 5.4, 5.0)]  # 5.0 < 0.75 * 9.3
    _apply_mem_rule(rounds, frac=0.75)
    assert rounds[0]["mem_clean"]
    assert not rounds[1]["mem_clean"]
    assert not any(r["clean"] for r in rounds)


def test_legacy_round_without_gauges_keeps_recorded_flag():
    rounds = [{"round": 1, "clean_cpu": True, "clean": True},
              _round(2, True, 5.5, 5.9)]
    _apply_mem_rule(rounds, frac=0.75)
    assert rounds[0]["mem_clean"] is None
    assert rounds[0]["clean"] is True
    assert rounds[1]["clean"]


class _FakeCompleted:
    def __init__(self, rc, stdout=""):
        self.returncode = rc
        self.stdout = stdout
        self.stderr = ""


def test_run_level_once_retries_then_gives_up(monkeypatch):
    # A benchmark JVM death (py4j ConnectionRefused under host memory
    # pressure) aborted a 9-round protocol run mid-region on 2026-08-20.
    # The region must retry once and then report failure as None so the
    # caller can discard the round instead of SystemExit-ing the protocol.
    import run_scaling

    calls = []
    monkeypatch.setattr(
        run_scaling.subprocess, "run",
        lambda cmd, **kw: calls.append(cmd) or _FakeCompleted(1))
    assert run_scaling.run_level_once(8, 1000) is None
    assert len(calls) == 2


def test_run_level_once_recovers_on_retry(monkeypatch):
    import run_scaling

    outs = [_FakeCompleted(1), _FakeCompleted(0, '{"runs": [1.5]}\n')]
    monkeypatch.setattr(run_scaling.subprocess, "run",
                        lambda cmd, **kw: outs.pop(0))
    assert run_scaling.run_level_once(8, 1000) == {"runs": [1.5]}
    assert not outs


def test_run_level_once_single_call_on_success(monkeypatch):
    import run_scaling

    calls = []
    monkeypatch.setattr(
        run_scaling.subprocess, "run",
        lambda cmd, **kw: calls.append(cmd)
        or _FakeCompleted(0, 'noise\n{"runs": [2.0]}\n'))
    assert run_scaling.run_level_once(8, 1000) == {"runs": [2.0]}
    assert len(calls) == 1


# --- rule v3: region wall-time anomaly ------------------------------------

from run_scaling import _apply_time_rule  # noqa: E402


def _tround(n, clean_cpu, small_sec, large_sec, **extra):
    d = {"round": n, "clean_cpu": clean_cpu,
         "small_sec": small_sec, "large_sec": large_sec}
    d.update(extra)
    return d


def test_time_rule_flags_cpu_quiet_slow_region():
    # Identical work per region: a CPU-clean round whose 8c suite ran 2.15x
    # the CPU-clean median (fresh2 round 6: 181s vs ~84-98s norm) is stalled
    # by contention no CPU gauge saw. Median over r1/r2/r3 small = 85.
    rounds = [_tround(1, True, 84.0, 44.0),
              _tround(2, True, 85.0, 45.0),
              _tround(3, True, 86.0, 44.5),
              _tround(4, True, 181.0, 44.0)]
    _apply_time_rule(rounds, headroom=1.3)
    assert all(r["time_clean"] for r in rounds[:3])
    assert all(r["clean"] for r in rounds[:3])
    assert not rounds[3]["time_clean"] and not rounds[3]["clean"]


def test_time_rule_reference_is_median_not_max():
    # v2's failure mode: one outlier round captured the per-region
    # reference and declassified everyone else. A MEDIAN reference over
    # CPU-clean rounds is not capturable by a single round: the fast
    # outlier neither declassifies the normal rounds nor is itself flagged
    # (fast is never contamination).
    rounds = [_tround(1, True, 84.0, 44.0),
              _tround(2, True, 86.0, 45.0),
              _tround(3, True, 40.0, 20.0)]  # anomalously FAST outlier
    _apply_time_rule(rounds, headroom=1.3)
    assert all(r["time_clean"] and r["clean"] for r in rounds)


def test_time_rule_exclusion_is_direction_blind():
    # A slow CONTROL region excludes the round exactly like a slow suite
    # region, even though a slow control (denominator) would have
    # FLATTERED the gate ratio (fresh2 round 3: mix-32c 78.7s vs ~21s
    # median inflated its normalized ratio to 3.252).
    rounds = [_tround(1, True, 84.0, 44.0, mix_small_sec=38.0,
                      mix_large_sec=21.0),
              _tround(2, True, 85.0, 45.0, mix_small_sec=39.0,
                      mix_large_sec=20.5),
              _tround(3, True, 84.5, 44.5, mix_small_sec=38.5,
                      mix_large_sec=78.7)]
    _apply_time_rule(rounds, headroom=1.3)
    assert rounds[0]["clean"] and rounds[1]["clean"]
    assert not rounds[2]["time_clean"] and not rounds[2]["clean"]


def test_time_rule_cpu_dirty_rounds_do_not_set_reference():
    # A CPU-contaminated round's slow regions must not drag the reference
    # median up: with it in the pool the 120s round would pass at
    # headroom 1.3 (median 120 -> cap 156); against the CPU-clean median
    # (85) it is correctly flagged.
    rounds = [_tround(1, True, 84.0, 44.0),
              _tround(2, True, 86.0, 45.0),
              _tround(3, False, 170.0, 80.0),
              _tround(4, False, 165.0, 85.0),
              _tround(5, True, 120.0, 44.0)]
    _apply_time_rule(rounds, headroom=1.3)
    assert rounds[0]["clean"] and rounds[1]["clean"]
    assert not rounds[4]["time_clean"]


def test_time_rule_single_cpu_clean_round_falls_back_to_all_rounds():
    # With < 2 CPU-clean rounds the CPU-clean reference is
    # self-referential; fall back to the all-rounds median (the gate
    # needs >= 3 clean rounds regardless, so nothing can PASS off the
    # vacuous case).
    rounds = [_tround(1, True, 84.0, 44.0),
              _tround(2, False, 90.0, 46.0),
              _tround(3, False, 86.0, 45.0)]
    _apply_time_rule(rounds, headroom=1.3)
    assert rounds[0]["time_clean"] and rounds[0]["clean"]
    assert not rounds[1]["clean"]  # clean_cpu False dominates


def test_time_rule_skips_regions_a_round_does_not_carry():
    # Legacy rounds predate the agg/mix control regions; a missing or
    # zero region must be skipped, not treated as infinitely fast/slow.
    rounds = [_tround(1, True, 84.0, 44.0, agg_small_sec=20.0),
              _tround(2, True, 85.0, 45.0, agg_small_sec=21.0),
              _tround(3, True, 84.5, 44.5)]  # no agg region
    _apply_time_rule(rounds, headroom=1.3)
    assert all(r["time_clean"] for r in rounds)


# ----------------------------------------------------------- rule v4 (r5)

from run_scaling import _apply_time_rule_v4  # noqa: E402


def test_time_rule_v4_catches_contaminated_majority():
    # ADVICE r4 (medium): under v3 the median reference is captured when
    # >= half the CPU-clean rounds are stalled — 3 of 4 rounds at ~2x
    # quiet time all classify time_clean at headroom 1.3 because the
    # median sits at the stalled value. v4's min anchor (contamination is
    # one-sided slow; the fast tail is the quiet-host truth) flags them.
    rounds = [_tround(1, True, 84.0, 44.0),
              _tround(2, True, 168.0, 88.0),
              _tround(3, True, 170.0, 87.0),
              _tround(4, True, 169.0, 89.0)]
    _apply_time_rule(rounds, headroom=1.3)
    assert all(r["time_clean"] for r in rounds)  # v3's documented blind spot
    _apply_time_rule_v4(rounds, headroom=1.3)
    assert rounds[0]["time_clean"] and rounds[0]["clean"]
    assert not any(r["time_clean"] for r in rounds[1:])


def test_time_rule_v4_quiet_variance_within_headroom_stays_clean():
    # Normal quiet-round jitter (<= headroom x the fastest round) must not
    # be flagged: the min anchor tightens the reference, not the headroom.
    rounds = [_tround(1, True, 84.0, 44.0),
              _tround(2, True, 96.0, 50.0),   # 1.14x / 1.14x the min
              _tround(3, True, 105.0, 55.0)]  # 1.25x / 1.25x the min
    _apply_time_rule_v4(rounds, headroom=1.3)
    assert all(r["time_clean"] and r["clean"] for r in rounds)


def test_time_rule_v4_cpu_dirty_rounds_do_not_set_reference():
    # A CPU-dirty FAST round must not tighten the reference for clean
    # rounds (same guard as v3: the anchor pool is CPU-clean rounds only).
    rounds = [_tround(1, False, 60.0, 30.0),  # dirty, anomalously fast? no:
              _tround(2, True, 84.0, 44.0),   # clean rounds set the anchor
              _tround(3, True, 100.0, 52.0)]
    _apply_time_rule_v4(rounds, headroom=1.3)
    assert rounds[1]["time_clean"] and rounds[2]["time_clean"]
