"""Scaling-efficiency evidence: same job, same input, N vs 4N cores.

Sandbox proxy for the north rule's "N and 4N executors" (no real cluster
here): run bench.py in separate processes at local[8] and local[32] on the
SAME pre-generated corpus and report throughput at both plus
efficiency = (throughput@32 / throughput@8) / 4.

Writes BENCH/BASELINE.md. Run:  python bench/scaling.py [corpus_n]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cores: int, n: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores), BENCH_N=str(n))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("BENCH_N", "50000"))
    # warm the shared corpus once (generation excluded from timings)
    r8 = run_at(8, n)
    r32 = run_at(32, n)
    t8 = r8["queries"]["q_neardup_corpus"]
    t32 = r32["queries"]["q_neardup_corpus"]
    thr8, thr32 = n / t8, n / t32
    eff = (thr32 / thr8) / 4
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE.md — measured numbers

Scaling evidence for the north rule's two-cluster-size criterion, sandbox
form (no real cluster available): the SAME flagship near-dup pipeline on the
SAME pre-generated {n:,}-file synthetic corpus (planted clusters, see
deduplipy_spark/sources/datagen.py) at two parallelism levels.

| parallelism | pipeline wall (s) | throughput (files/s) |
|---|---|---|
| local[8]  (N)  | {t8:.1f} | {thr8:,.1f} |
| local[32] (4N) | {t32:.1f} | {thr32:,.1f} |

**Scaling efficiency (N -> 4N) = (thr@32 / thr@8) / 4 = {eff:.3f}**
(target >= 0.8 per BASELINE.json; single-machine caveat: local[8] vs
local[32] share memory bandwidth and the same JVM heap layout, so this is a
conservative proxy for separate-executor scaling.)

Full bench JSON:

- local[8]:  `{json.dumps(r8)}`
- local[32]: `{json.dumps(r32)}`

Reference baseline context: the reference publishes no numbers (BASELINE.md);
its design ceiling is single-threaded pandas at ~2k rows.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"eff": round(eff, 3), "thr8": round(thr8, 1),
                      "thr32": round(thr32, 1)}))


if __name__ == "__main__":
    main()
