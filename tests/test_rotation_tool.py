"""tools/rotation.py contract: the generated order puts never-verified
first, then regressions, then stalest-green; the freshness check
catches breaches. Pure-python (no Spark) — fast registry-integrity
guard, since r6 proved hand-maintained rotation drifts."""

import sys

sys.path.insert(0, "/root/repo")

from tools import rotation


def test_derive_order_priorities(monkeypatch):
    folded_green = {"a_old": 3, "b_fresh": 6, "c_regressed": 4}
    folded_rows = {"a_old": 3, "b_fresh": 6, "c_regressed": 6}

    monkeypatch.setattr(
        rotation, "fold", lambda max_round=None: (folded_green, folded_rows, 6)
    )
    names = ["b_fresh", "a_old", "z_new", "c_regressed", "m_new"]
    ordered, labels = rotation.derive_order(names)
    # never-verified first (alphabetical), then the red regression,
    # then greens stalest-first
    assert ordered == ["m_new", "z_new", "c_regressed", "a_old", "b_fresh"]
    assert labels["m_new"] == "never verified"
    assert "RED at r6" in labels["c_regressed"]
    assert labels["a_old"] == "green r3"


def test_check_flags_breach_outside_window(monkeypatch):
    # entry at the freshness limit sitting OUTSIDE the window = breach
    n = rotation.WINDOW
    green = {f"q{i:03d}": 6 for i in range(n)}
    green["stale"] = 6 - rotation.FRESHNESS_LIMIT  # breaches at r7
    rows = dict(green)
    monkeypatch.setattr(rotation, "fold", lambda max_round=None: (green, rows, 6))
    monkeypatch.setattr(rotation, "_registry_meta", lambda: ({}, {}))
    ordered = [f"q{i:03d}" for i in range(n)] + ["stale"]
    assert rotation.check(ordered) == 1  # breach detected
    # with the stale entry inside the window, the breach is paid
    ordered_paid = ["stale"] + [f"q{i:03d}" for i in range(n)]
    assert rotation.check(ordered_paid) == 0


def test_priority_refresh_promotes_changed_code(monkeypatch):
    """r9: a gate flagged in PRIORITY_REFRESH sorts ahead of the
    stale-green cohort until re-verified past its `since` round, then
    the promotion expires."""
    green = {"a_old": 5, "changed": 6, "b_fresh": 6}
    rows = dict(green)
    monkeypatch.setattr(
        rotation, "fold", lambda max_round=None: (green, rows, 6)
    )
    prio = {"changed": {"since": 6, "reason": "rounding fix"}}
    monkeypatch.setattr(rotation, "_registry_meta", lambda: ({}, prio))
    ordered, labels = rotation.derive_order(["b_fresh", "a_old", "changed"])
    assert ordered == ["changed", "a_old", "b_fresh"]
    assert "CODE CHANGED" in labels["changed"]
    # re-verified at r7 (> since) => promotion expires
    green2 = dict(green, changed=7)
    monkeypatch.setattr(
        rotation, "fold", lambda max_round=None: (green2, dict(green2), 7)
    )
    ordered2, labels2 = rotation.derive_order(["b_fresh", "a_old", "changed"])
    assert ordered2 == ["a_old", "b_fresh", "changed"]
    assert labels2["changed"] == "green r7"


def test_check_audits_retirement_hygiene(monkeypatch):
    """r9: a retired gate still in the registry, a rationale-less
    retirement, and an unregistered PRIORITY entry are all breaches."""
    n = rotation.WINDOW
    green = {f"q{i:03d}": 6 for i in range(n)}
    rows = dict(green)
    monkeypatch.setattr(rotation, "fold", lambda max_round=None: (green, rows, 6))
    ordered = [f"q{i:03d}" for i in range(n)]

    monkeypatch.setattr(
        rotation, "_registry_meta", lambda: ({"q000": "subsumed"}, {})
    )
    assert rotation.check(ordered) == 1  # retired-but-registered
    monkeypatch.setattr(
        rotation, "_registry_meta", lambda: ({"gone": "  "}, {})
    )
    assert rotation.check(ordered) == 1  # no rationale
    monkeypatch.setattr(
        rotation,
        "_registry_meta",
        lambda: ({}, {"ghost": {"since": 6, "reason": "x"}}),
    )
    assert rotation.check(ordered) == 1  # priority names unregistered gate
    monkeypatch.setattr(
        rotation, "_registry_meta", lambda: ({"gone": "subsumed by q001"}, {})
    )
    assert rotation.check(ordered) == 0  # clean retirement passes


def test_registry_order_matches_tool(tmp_path):
    """The committed GATE_ORDER must be exactly what the tool derives from
    the CORRECTNESS files that existed when it was generated — hand edits
    (the r6 failure mode) fail here. Boundary-aware since r8: the order is
    derived at the registry's stamped REGISTRY_AS_OF round, so a newer
    driver-landed CORRECTNESS file no longer turns the committed order red
    (the r7 round-boundary failure). `rotation.py check` remains the
    cross-boundary freshness alarm."""
    as_of = rotation.registry_as_of()
    assert as_of is not None, "registry is missing the REGISTRY_AS_OF stamp"
    names = rotation.registered_names()
    ordered, _ = rotation.derive_order(names, max_round=as_of)
    from pg_parquet_spark.operators.registry import GATE_ORDER

    assert GATE_ORDER == ordered
    # Deliberately NO "stamp == newest file" assertion: that would be red at
    # every round boundary (the r7 failure mode). `rotation.py check` is the
    # cross-boundary freshness alarm; the round workflow runs `apply` first.


def test_check_displacement_allowance(monkeypatch):
    """r13: at exact saturation the due cohort fills the whole window,
    so an ACTIVE priority promotion must displace one at-limit gate —
    check allows the displaced gate outside the window iff it is over
    limit by EXACTLY one round, sits immediately after the cut (next
    window front-loads it), and capacity exists 1:1 with promoted
    entries. Everything else stays a hard breach."""
    n = rotation.WINDOW
    lim = rotation.FRESHNESS_LIMIT
    # window: 1 promoted changed-code gate + n-1 due gates; 1 displaced
    green = {f"q{i:03d}": 6 - lim for i in range(n - 1)}  # at-limit due
    green["promoted"] = 6
    green["displaced"] = 6 - lim  # over by exactly 1 at r7
    rows = dict(green)
    monkeypatch.setattr(rotation, "fold", lambda max_round=None: (green, rows, 6))
    prio = {"promoted": {"since": 6, "reason": "code changed"}}
    monkeypatch.setattr(rotation, "_registry_meta", lambda: ({}, prio))
    window = ["promoted"] + [f"q{i:03d}" for i in range(n - 1)]

    # displaced gate right after the cut, 1:1 with the promotion: ok
    assert rotation.check(window + ["displaced"]) == 0

    # no active promotion => no capacity => breach
    monkeypatch.setattr(rotation, "_registry_meta", lambda: ({}, {}))
    plain_window = [f"q{i:03d}" for i in range(n - 1)] + ["extra_fresh"]
    green["extra_fresh"] = 6
    rows["extra_fresh"] = 6
    assert rotation.check(plain_window + ["displaced"]) == 1

    # two displaced on one promotion => second is beyond capacity
    monkeypatch.setattr(rotation, "_registry_meta", lambda: ({}, prio))
    green["displaced2"] = 6 - lim
    rows["displaced2"] = 6 - lim
    assert rotation.check(window + ["displaced", "displaced2"]) == 1

    # over limit by MORE than one round is never excusable
    green["displaced"] = 6 - lim - 1
    rows["displaced"] = 6 - lim - 1
    del green["displaced2"], rows["displaced2"]
    assert rotation.check(window + ["displaced"]) == 1
