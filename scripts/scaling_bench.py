"""Scaling-efficiency evidence (north_rule / BASELINE.md protocol): run the
identical flagship job at two parallelism levels (local[8] vs local[32]) on
the same deterministic input and report throughput at both plus
efficiency = T(32) / (4 * T(8)) measured in pages/sec.

Each level runs in a fresh subprocess (one JVM per master setting). Results
are appended to BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from plateau_gis_converter_spark.session import get_spark
import bench

def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0

cpus = sys.argv[1]
n = int(sys.argv[2])
spark = get_spark(app=f"scaling-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(int(cpus), 8))
# warm the JVM codegen/JIT AND the OS page cache over the staged input —
# this sandbox's disk reads ~9 MB/s cold, which would measure the virtio
# device, not the engine. Protocol: untimed warm pass, then min of 3 reps
# (standard throughput methodology).
bench.flagship_spatial_join(spark, 50000)
bench.flagship_tile_assign(spark, 50000)
bench.build_pages(spark, n)
bench.flagship_spatial_join(spark, n)   # cache-warming pass, untimed
bench.flagship_tile_assign(spark, n)
# the sandbox VM is noisy (shared host, ~9 MB/s cold disk): take the min of
# several reps — the compute floor is the stable, comparable quantity
join_reps = [_timed(lambda: bench.flagship_spatial_join(spark, n))
             for _ in range(5)]
tile_reps = [_timed(lambda: bench.flagship_tile_assign(spark, n))
             for _ in range(5)]
print(json.dumps({{"cpus": int(cpus), "n": n, "join_s": min(join_reps),
                  "tile_s": min(tile_reps), "join_reps": join_reps,
                  "tile_reps": tile_reps}}))
"""


def run_level(cpus: int, n_pages: int) -> dict:
    code = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_pages)],
        capture_output=True, text=True, cwd=REPO, timeout=1800)
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    levels = [8, 32]
    results = {}
    for cpus in levels:
        r = run_level(cpus, n_pages)
        r["join_pages_per_sec"] = n_pages / r["join_s"]
        r["tile_pages_per_sec"] = n_pages / r["tile_s"]
        results[cpus] = r
        print(json.dumps(r))

    jeff = results[32]["join_pages_per_sec"] / (4 * results[8]["join_pages_per_sec"])
    teff = results[32]["tile_pages_per_sec"] / (4 * results[8]["tile_pages_per_sec"])

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling evidence (N vs 4N cores)

Protocol per BASELINE.md: the identical flagship job (geocode -> z12 cell ->
broadcast spatial join vs 23 ward polygons + exact integer PIP -> per-ward
agg; and z7..15 tile assignment + Hilbert ids) on the same deterministic
{n_pages:,}-page input, at local[8] (N=8 cores) and local[32] (4N), one JVM
per level, JVM warmed before timing.

| job | local[8] s | local[8] pages/s | local[32] s | local[32] pages/s | efficiency T(4N)/(4·T(N)) |
|---|---|---|---|---|---|
| spatial join | {results[8]['join_s']:.2f} | {results[8]['join_pages_per_sec']:,.0f} | {results[32]['join_s']:.2f} | {results[32]['join_pages_per_sec']:,.0f} | {jeff:.3f} |
| tile assign (9 zooms + Hilbert) | {results[8]['tile_s']:.2f} | {results[8]['tile_pages_per_sec']:,.0f} | {results[32]['tile_s']:.2f} | {results[32]['tile_pages_per_sec']:,.0f} | {teff:.3f} |

Target: efficiency >= 0.8 (north_rule). Notes: single-host local mode
under-reports scaling vs a real cluster (shared memory bandwidth, one
shuffle disk); the plan itself is shuffle-free for the join (broadcast +
codegen) so cluster scaling is governed by input-split parallelism.

Raw: {json.dumps(results)}
""")
    print(f"wrote {path}: join_eff={jeff:.3f} tile_eff={teff:.3f}")


if __name__ == "__main__":
    main()
