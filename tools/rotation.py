"""Derive the registry's GATE_ORDER from folded CORRECTNESS_r0*.json files.

VERDICT r6 "Next round" #1: the hand-maintained GATE_ORDER arithmetic
produced a wrong inline comment (claimed 6 spilled entries where the fold
shows 26), so the rotation is now *generated*, never hand-computed.

Rotation contract (driver verifies a 50-name prefix per round):

1. Queries with **no driver row ever** come first — a first-ever hard
   verification takes precedence over freshness (VERDICT r2 #2).
2. Queries whose **newest row is red** (a regression after an earlier
   green) come next — they need re-verification before anything stale.
3. Everything else orders by **newest-green round ascending** (stalest
   first), alphabetical within a round for determinism.

Invariant checked by `check`: after this round's window runs, no entry's
newest green row may be older than FRESHNESS_LIMIT rounds.

Usage:
    python tools/rotation.py print          # show the derived order + report
    python tools/rotation.py apply          # rewrite registry.py's GATE_ORDER
    python tools/rotation.py check          # fail if the prefix breaches freshness
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGISTRY = os.path.join(REPO, "pg_parquet_spark", "operators", "registry.py")
WINDOW = 50  # names the driver's per-round correctness run covers
FRESHNESS_LIMIT = 2  # max rounds since an entry's newest green row


def fold(max_round: int | None = None) -> tuple[dict[str, int], dict[str, int], int]:
    """Return (newest_green, newest_row, current_round) from CORRECTNESS files.

    ``max_round`` ignores files newer than that round. The order test uses it
    with the registry's stamped ``REGISTRY_AS_OF`` so a driver-landed
    CORRECTNESS file can't turn the committed order retroactively wrong
    (VERDICT r7 "What's wrong" #1 — the test was deterministically red at
    every round boundary). ``check`` still folds everything: freshness is a
    cross-boundary alarm by design.
    """
    newest_green: dict[str, int] = {}
    newest_row: dict[str, int] = {}
    latest = 0
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", f)
        if not m:
            continue
        rn = int(m.group(1))
        if max_round is not None and rn > max_round:
            continue
        latest = max(latest, rn)
        with open(f) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            newest_row[name] = max(newest_row.get(name, 0), rn)
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                newest_green[name] = max(newest_green.get(name, 0), rn)
    return newest_green, newest_row, latest


def registered_names() -> list[str]:
    sys.path.insert(0, REPO)
    from pg_parquet_spark.operators import registry

    return list(registry.all_queries().keys())


def _registry_meta() -> tuple[dict[str, str], dict[str, dict]]:
    """(RETIRED, PRIORITY_REFRESH) from the registry — empty pre-r9."""
    sys.path.insert(0, REPO)
    from pg_parquet_spark.operators import registry

    return (
        getattr(registry, "RETIRED", {}),
        getattr(registry, "PRIORITY_REFRESH", {}),
    )


def registry_as_of() -> int | None:
    """Round stamped into registry.py by the last ``apply`` (None pre-r8)."""
    with open(REGISTRY) as fh:
        m = re.search(r"^REGISTRY_AS_OF = (\d+)$", fh.read(), flags=re.M)
    return int(m.group(1)) if m else None


def derive_order(
    names: list[str], max_round: int | None = None
) -> tuple[list[str], dict[str, str]]:
    """Order `names` per the rotation contract; also return a label per name."""
    newest_green, newest_row, _latest = fold(max_round)
    _, priority = _registry_meta()

    def is_priority(n: str) -> bool:
        # changed-code promotion (VERDICT r8 #3): active only until the
        # gate is re-verified after the flagged round, then it expires
        meta = priority.get(n)
        return meta is not None and newest_green.get(n, 0) <= meta["since"]

    def key(n: str):
        if n not in newest_row:
            return (0, 0, n)  # never verified
        if newest_row[n] > newest_green.get(n, 0):
            return (1, 0, n)  # newest row is red — regression
        if is_priority(n):
            return (2, newest_green[n], n)  # changed code since last green
        return (3, newest_green[n], n)  # stalest green first

    ordered = sorted(names, key=key)
    labels = {}
    for n in ordered:
        if n not in newest_row:
            labels[n] = "never verified"
        elif newest_row[n] > newest_green.get(n, 0):
            labels[n] = f"RED at r{newest_row[n]} (last green r{newest_green.get(n, 0) or '-'})"
        elif is_priority(n):
            labels[n] = (
                f"green r{newest_green[n]} but CODE CHANGED "
                f"({priority[n]['reason']})"
            )
        else:
            labels[n] = f"green r{newest_green[n]}"
    return ordered, labels


def render_block(ordered: list[str], labels: dict[str, str]) -> str:
    lines = ["GATE_ORDER = ["]
    prev = None
    for i, n in enumerate(ordered):
        lab = labels[n]
        if lab != prev:
            lines.append(f"    # -- {lab} " + "-" * max(1, 60 - len(lab)))
            prev = lab
        if i == WINDOW:
            lines.append(f"    # ==== window cut at {WINDOW}: entries below are NOT verified this round ====")
        lines.append(f'    "{n}",')
    lines.append("]")
    return "\n".join(lines)


def apply(ordered: list[str], labels: dict[str, str]) -> None:
    _, _, latest = fold()
    with open(REGISTRY) as fh:
        src = fh.read()
    block = f"REGISTRY_AS_OF = {latest}\n\n" + render_block(ordered, labels)
    # Replace the stamp (if present) together with the order block so the
    # pair can never drift apart.
    new, count = re.subn(
        r"(?:REGISTRY_AS_OF = \d+\n\n)?GATE_ORDER = \[.*?\n\]",
        block,
        src,
        count=1,
        flags=re.S,
    )
    if count != 1:
        raise SystemExit("could not find GATE_ORDER block in registry.py")
    with open(REGISTRY, "w") as fh:
        fh.write(new)
    print(f"wrote {len(ordered)} names to {REGISTRY} (REGISTRY_AS_OF = {latest})")


def check(ordered: list[str]) -> int:
    """Verify the upcoming window pays every freshness breach, and audit
    retirement hygiene (a retired gate must be OUT of the registry and
    carry a rationale — removals are a policy act, never an accident)."""
    newest_green, newest_row, latest = fold()
    upcoming = latest + 1
    window = set(ordered[:WINDOW])
    bad = []
    retired, priority = _registry_meta()
    for n, why in retired.items():
        if n in ordered:
            bad.append((n, "RETIRED but still registered"))
        if not (isinstance(why, str) and why.strip()):
            bad.append((n, "RETIRED without a rationale"))
    for n, meta in priority.items():
        if n in retired:
            bad.append((n, "PRIORITY_REFRESH and RETIRED are exclusive"))
        if n not in ordered:
            bad.append((n, "PRIORITY_REFRESH names an unregistered gate"))
        elif (
            newest_green.get(n, 0) <= meta["since"] and n not in window
        ):
            bad.append(
                (n, "changed-code gate not re-verified and outside the window")
            )
    # Displacement allowance (r13): at exact saturation (WINDOW × cycle
    # registered names) the due cohort alone fills every window, so an
    # ACTIVE priority-refresh promotion necessarily pushes one at-limit
    # gate out — without this clause the two hygiene mechanisms are
    # mutually exclusive (discovered when the r13 ADVICE closures
    # changed two r12-green gates' code). A gate over-limit by EXACTLY
    # one round may sit outside the window iff (a) displacement
    # capacity exists — one active promoted entry inside the window per
    # displaced gate — and (b) it sits immediately after the window
    # cut, where tier-3 stalest-first ordering mechanically front-loads
    # it into the NEXT window (the slip is bounded at one round, once).
    # Anything older, or displaced beyond capacity, is a hard breach.
    promoted_in_window = [
        n
        for n, meta in priority.items()
        if n in window and newest_green.get(n, 0) <= meta["since"]
    ]
    displacement_slots = ordered[WINDOW : WINDOW + len(promoted_in_window)]
    displaced_ok: list[str] = []
    for n in ordered:
        if n in window:
            continue  # will be refreshed this round
        last = newest_green.get(n)
        if last is None:
            bad.append((n, "never verified and outside the window"))
        elif upcoming - last > FRESHNESS_LIMIT:
            if (
                upcoming - last == FRESHNESS_LIMIT + 1
                and n in displacement_slots
            ):
                displaced_ok.append(n)
                continue
            bad.append((n, f"newest green r{last}, {upcoming - last} rounds old at r{upcoming}"))
    if bad:
        print(f"FRESHNESS BREACH ({len(bad)}):")
        for n, why in bad:
            print(f"  {n}: {why}")
        return 1
    outside_limit = sorted(
        (upcoming - newest_green[n], n)
        for n in ordered[WINDOW:]
        if n in newest_green and n not in displaced_ok
    )
    note = (
        f"; {len(displaced_ok)} at-limit entr"
        f"{'y' if len(displaced_ok) == 1 else 'ies'} displaced by "
        f"priority refresh ({', '.join(sorted(displaced_ok))}) — "
        "front of next window, slip bounded at one round"
        if displaced_ok
        else ""
    )
    if outside_limit:
        worst = outside_limit[-1]
        print(
            f"ok: window covers all breaches; worst entry outside the window is "
            f"{worst[1]} at {worst[0]} rounds old (limit {FRESHNESS_LIMIT})"
            + note
        )
    else:
        print("ok: window covers every registered entry" + note)
    return 0


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "print"
    names = registered_names()
    ordered, labels = derive_order(names)
    if cmd == "print":
        newest_green, _, latest = fold()
        print(f"registry: {len(names)} names; latest round r{latest}; window {WINDOW}")
        for i, n in enumerate(ordered):
            cut = " <== window cut" if i == WINDOW else ""
            print(f"{i:3d} {n:35s} {labels[n]}{cut}")
        return 0
    if cmd == "apply":
        apply(ordered, labels)
        return check(ordered)
    if cmd == "check":
        return check(ordered)
    print(__doc__)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
