"""Round-end invariant checklist — one command for the per-round
contract the build runs under (see the registry docstring and
ROADMAP.md):

1. GATE_ORDER was regenerated THIS round (REGISTRY_AS_OF == the newest
   CORRECTNESS round on disk) and `rotation.py check` passes (freshness
   window + retirement/priority hygiene).
2. SOAK_r{N}.json exists for the round under construction (newest
   CORRECTNESS round + 1).
3. The 17-query headline bench set is FROZEN (BASELINE comparability —
   the one thing a well-meaning refactor must never change).
4. Every registered gate has BOTH a query and an oracle, keys match
   exactly, and the window prefix is fully runnable.
5. Retired gates are really out of the driver surface but still carry
   implementations + oracles for the local suite.

Usage: python tools/verify_round.py   (exit 0 = all green)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FROZEN_HEADLINE = [
    "q1_pricing_summary", "q5_local_supplier_volume",
    "q_join_inner_broadcast", "q_join_left", "q_agg_distinct",
    "q_agg_rollup", "q_window_rank", "q_window_frame", "q_topk",
    "q_union_all", "q_scalar_json", "q_text_features", "q_dedup_exact",
    "q_dedup_minhash_lsh", "q_sim_cosine_topk", "q_asof_join",
    "q_sessionize_batch",
]


def main() -> int:
    failures: list[str] = []

    def check(name: str, ok: bool, detail: str = "") -> None:
        print(f"{'ok  ' if ok else 'FAIL'}  {name}" + (f": {detail}" if detail else ""))
        if not ok:
            failures.append(name)

    from tools import rotation

    _, _, latest = rotation.fold()
    as_of = rotation.registry_as_of()
    check(
        "rotation applied this round",
        as_of == latest,
        f"REGISTRY_AS_OF={as_of}, newest CORRECTNESS=r{latest}",
    )
    names = rotation.registered_names()
    ordered, _ = rotation.derive_order(names)
    check("rotation freshness + hygiene", rotation.check(ordered) == 0)

    soak = os.path.join(REPO, f"SOAK_r{latest + 1:02d}.json")
    check(f"SOAK_r{latest + 1:02d}.json emitted", os.path.exists(soak))

    from bench import HEADLINE

    check(
        "headline bench set frozen (17 queries)",
        list(HEADLINE) == FROZEN_HEADLINE,
        "set drifted — BASELINE comparability broken" if list(HEADLINE) != FROZEN_HEADLINE else "",
    )

    from pg_parquet_spark.operators import registry

    qs, os_ = registry.all_queries(), registry.all_oracles()
    check(
        "every gate has query AND oracle",
        set(qs) == set(os_),
        f"only-query={sorted(set(qs) - set(os_))[:3]} only-oracle={sorted(set(os_) - set(qs))[:3]}",
    )
    window = registry.GATE_ORDER[:50]
    check(
        "window prefix fully registered",
        all(n in qs for n in window),
        f"missing={[n for n in window if n not in qs][:3]}",
    )
    full_q = registry.all_queries(include_retired=True)
    full_o = registry.all_oracles(include_retired=True)
    bad_retired = [
        n
        for n in registry.RETIRED
        if n in qs or n not in full_q or n not in full_o
    ]
    check("retired gates out of surface but locally covered", not bad_retired, str(bad_retired))

    print(f"\n{'ALL GREEN' if not failures else f'{len(failures)} FAILURE(S): ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
