"""Emit the driver-visible soak artifact SOAK_r{N}.json (VERDICT r7 #6).

SCALE.md recorded soak walls and the ANN recall table as prose, so
round-over-round soak regressions weren't diffable the way BENCH_r{N}
is. This wraps tools/scale_soak.py (10× corpus, per-stage walls +
physical-plan assertions) and tools/ann_sweep.py (IVF/PQ recall &
latency vs brute force) into one JSON file per round.

Usage: python tools/soak_artifact.py <round> [--docs N] [--embeddings N]
Writes /root/repo/SOAK_r{NN}.json and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("round", type=int)
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--embeddings", type=int, default=20_000)
    ap.add_argument("--queries", type=int, default=4)
    args = ap.parse_args()

    from tools import ann_sweep, scale_soak

    t0 = time.time()
    soak = scale_soak.run(args.docs, args.embeddings)
    sweep = ann_sweep.run(args.queries, args.embeddings)
    artifact = {
        "round": args.round,
        "wall_sec": round(time.time() - t0, 1),
        "scale10x": soak,
        "ann_sweep": sweep,
    }
    path = os.path.join(REPO, f"SOAK_r{args.round:02d}.json")
    with open(path, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"wrote": path, "plan_ok": soak["plan_ok"]}))
    return 0 if soak["plan_ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
