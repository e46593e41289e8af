"""bench/scaling.py --assert-efficiency guard (VERDICT r3 #8): pure logic,
no Spark — the ladder itself runs out-of-band."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench"))

from scaling import check_efficiency  # noqa: E402


def _best(s2=100, s8=100, s32=100):
    return {2: {"steal_jiffies": s2}, 8: {"steal_jiffies": s8},
            32: {"steal_jiffies": s32}}


def test_pass_when_all_above_target():
    ok, msg = check_efficiency({"2->8": 0.85, "8->32": 0.81}, _best(), 0.8)
    assert ok and "0.85" in msg


def test_fail_on_quiet_window_regression():
    ok, msg = check_efficiency({"2->8": 0.62, "8->32": 0.9}, _best(), 0.8)
    assert not ok
    assert "2->8" in msg and "regression" in msg


def test_skip_when_failing_pair_contended():
    # the failing pair's windows both stole heavily -> abstain, not fail
    ok, msg = check_efficiency(
        {"2->8": 0.62}, _best(s2=9000, s8=8000), 0.8)
    assert ok and "contention" in msg


def test_quiet_side_of_contended_pair_still_fails():
    # one endpoint quiet is NOT enough to skip: max(steal) over the pair
    # must exceed the threshold for the abstain
    ok, _ = check_efficiency({"2->8": 0.62}, _best(s2=50, s8=50_000), 0.8)
    assert ok          # contended endpoint -> abstain
    ok, _ = check_efficiency({"2->8": 0.62}, _best(s2=50, s8=60), 0.8)
    assert not ok      # both quiet -> genuine regression
