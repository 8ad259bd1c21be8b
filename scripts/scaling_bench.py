"""Scaling-efficiency evidence (north_rule / BASELINE.md protocol): run the
identical flagship job at three parallelism levels (local[8], local[16],
local[32]) on the same deterministic input and report throughput at each,
efficiency between levels, and per-job JVM CPU utilization (cpu-seconds /
(wall * cores)) so saturation vs contention is visible directly.

Each level runs in a fresh subprocess (one JVM per master setting). Results
are written to BENCH/BASELINE.md.

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
import glob, json, os, sys, time
os.environ["SPARK_GRAFT_BENCH_INPLAN"] = "1"
sys.path.insert(0, {repo!r})
from plateau_gis_converter_spark.session import get_spark
import bench


def jvm_pid():
    me = os.getpid()
    for p in glob.glob("/proc/[0-9]*/stat"):
        try:
            parts = open(p).read().split()
            if int(parts[3]) == me and parts[1] == "(java)":
                return int(parts[0])
        except Exception:
            pass
    return None


HZ = os.sysconf("SC_CLK_TCK")


def jvm_cpu_s(pid):
    parts = open(f"/proc/{{pid}}/stat").read().split()
    return (int(parts[13]) + int(parts[14])) / HZ


def _timed(fn, pid):
    c0 = jvm_cpu_s(pid) if pid else 0.0
    t0 = time.time()
    fn()
    wall = time.time() - t0
    cpu = (jvm_cpu_s(pid) - c0) if pid else 0.0
    return wall, cpu


cpus = sys.argv[1]
n = int(sys.argv[2])
spark = get_spark(app=f"scaling-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(int(cpus), 8))
pid = jvm_pid()
# warm the JVM codegen/JIT (in-plan input: no disk in the measured path —
# this sandbox reads ~9 MB/s cold, which would measure the virtio device,
# not the engine). Protocol: untimed warm pass, then min of 5 reps.
bench.flagship_spatial_join(spark, 50000)
bench.flagship_tile_assign(spark, 50000)
bench.flagship_spatial_join(spark, n)   # JIT warm pass at full size, untimed
bench.flagship_tile_assign(spark, n)
reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "4"))
join_reps = [_timed(lambda: bench.flagship_spatial_join(spark, n), pid)
             for _ in range(reps)]
tile_reps = [_timed(lambda: bench.flagship_tile_assign(spark, n), pid)
             for _ in range(reps)]

def floor(reps):
    wall, cpu = min(reps, key=lambda r: r[0])
    return {{"wall_s": wall, "cpu_s": cpu,
             "cpu_util": cpu / (wall * int(cpus))}}

print(json.dumps({{"cpus": int(cpus), "n": n,
                  "join": floor(join_reps), "tile": floor(tile_reps),
                  "join_reps": join_reps, "tile_reps": tile_reps}}))
"""


def run_level(cpus: int, n_pages: int, reps: int = 1) -> dict:
    code = CHILD.format(repo=REPO)
    env = dict(os.environ, SPARK_GRAFT_SCALING_REPS=str(reps))
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_pages)],
        capture_output=True, text=True, cwd=REPO, timeout=3600, env=env)
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def _spin(n):
    s = 0
    for i in range(n):
        s += i * i
    return s


def hardware_ceiling() -> dict:
    """Strong-scaling calibration of THIS host: fixed total CPU-bound work
    split over 8/16/32 processes. The guest topology exposes no SMT pairs
    (each vCPU its own core), so any sub-linear ceiling here is hypervisor
    oversubscription — measured, not assumed."""
    import concurrent.futures as cf

    chunks = [2_000_000] * 64
    res = {}
    for workers in (8, 16, 32):
        t0 = time.time()
        with cf.ProcessPoolExecutor(workers) as ex:
            list(ex.map(_spin, chunks))
        res[str(workers)] = time.time() - t0
    return res


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    levels = [8, 16, 32]
    cycles = int(os.environ.get("SPARK_GRAFT_SCALING_CYCLES", "3"))

    # INTERLEAVED cycles: every cycle measures the hardware ceiling AND
    # one rep of every level back-to-back, so this VM's minute-scale
    # hypervisor swings hit all levels alike instead of making whichever
    # level ran in a fast minute look (super)linear. Floors are taken
    # per level ACROSS cycles; the ceiling is the best calibration pass.
    acc = {c: {"join_reps": [], "tile_reps": []} for c in levels}
    hw_walls: dict[str, list] = {"8": [], "16": [], "32": []}
    for cycle in range(cycles):
        cal = hardware_ceiling()
        for w in ("8", "16", "32"):
            hw_walls[w].append(cal[w])
        for cpus in levels:
            r = run_level(cpus, n_pages, reps=1)
            acc[cpus]["join_reps"] += r["join_reps"]
            acc[cpus]["tile_reps"] += r["tile_reps"]
            print(json.dumps({"cycle": cycle, "cpus": cpus,
                              "join": r["join_reps"],
                              "tile": r["tile_reps"]}))

    hw = {w: min(ws) for w, ws in hw_walls.items()}
    hw["speedup_8_16"] = hw["8"] / hw["16"]
    hw["speedup_8_32"] = hw["8"] / hw["32"]
    # paired PER-CYCLE ceilings too (same-minute comparison)
    hw["cycle_speedup_8_32"] = [a / b for a, b in
                                zip(hw_walls["8"], hw_walls["32"])]
    print(json.dumps({"hardware": hw}))

    def _median(xs):
        xs = sorted(xs)
        m = len(xs) // 2
        return xs[m] if len(xs) % 2 else (xs[m - 1] + xs[m]) / 2

    # PAIRED efficiencies: within one cycle all levels ran back-to-back
    # (same host weather), so the per-cycle ratio is the noise-robust
    # estimator; the median across cycles is reported alongside floors.
    paired = {}
    for job in ("join", "tile"):
        e16, e32, e32n = [], [], []
        for c in range(cycles):
            w8 = acc[8][f"{job}_reps"][c][0]
            w16 = acc[16][f"{job}_reps"][c][0]
            w32 = acc[32][f"{job}_reps"][c][0]
            e16.append(w8 / w16 / 2)
            e32.append(w8 / w32 / 4)
            e32n.append((w8 / w32) / hw["cycle_speedup_8_32"][c])
        paired[job] = {"eff_8_16": _median(e16), "eff_8_32": _median(e32),
                       "eff_8_32_vs_hw": _median(e32n),
                       "cycles_8_16": e16, "cycles_8_32": e32}

    results = {}
    for cpus in levels:
        r = {"cpus": cpus, "n": n_pages,
             "join_reps": acc[cpus]["join_reps"],
             "tile_reps": acc[cpus]["tile_reps"]}
        for job in ("join", "tile"):
            wall, cpu = min(r[f"{job}_reps"], key=lambda t: t[0])
            r[job] = {"wall_s": wall, "cpu_s": cpu,
                      "cpu_util": cpu / (wall * cpus),
                      "pages_per_sec": n_pages / wall}
        results[cpus] = r

    def eff(job, a, b):
        return results[a][job]["wall_s"] / results[b][job]["wall_s"] / (b / a)

    def norm(job, a, b, hw_speedup):
        return (results[a][job]["wall_s"] / results[b][job]["wall_s"]
                / hw_speedup)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")

    def row(job, label):
        cells = [label]
        for c in levels:
            d = results[c][job]
            cells.append(f"{d['wall_s']:.2f} s / {d['pages_per_sec']:,.0f} "
                         f"p/s / util {d['cpu_util']:.2f}")
        cells.append(f"{eff(job, 8, 16):.3f}")
        cells.append(f"{eff(job, 8, 32):.3f}")
        cells.append(f"{norm(job, 8, 32, hw['speedup_8_32']):.3f}")
        return "| " + " | ".join(cells) + " |"

    with open(path, "w") as f:
        f.write(f"""# BENCH/BASELINE — N vs 2N vs 4N scaling evidence

Protocol per BASELINE.md: the identical flagship job (geocode -> z12 cell ->
broadcast spatial join vs 23 ward polygons + exact integer PIP -> per-ward
agg; and z7..15 tile assignment + pure-Catalyst Hilbert ids) on the same
deterministic {n_pages:,}-page in-plan input, at local[8] / local[16] /
local[32], one fresh JVM per (level, cycle). Protocol: {os.environ.get(
    "SPARK_GRAFT_SCALING_CYCLES", "3")} INTERLEAVED cycles — each cycle
runs the hardware calibration plus one JIT-warmed rep of EVERY level
back-to-back, so this VM's minute-scale hypervisor swings (~10x) hit all
levels alike instead of making whichever level landed in a fast minute
look (super)linear; floors are per level across cycles; every rep incl.
JVM cpu-seconds is in the raw block. "util" = JVM cpu-seconds /
(wall * cores) for the floor rep — direct evidence of whether cores were
saturated (util ~1) or the job ran out of parallelism/was preempted.

## Hardware ceiling of this sandbox (measured, not assumed)

Strong-scaling calibration (fixed CPU-bound work, process pool):
8 -> 16 workers speedup **{hw['speedup_8_16']:.2f}x** (ideal 2x),
8 -> 32 workers speedup **{hw['speedup_8_32']:.2f}x** (ideal 4x).
The guest topology exposes each vCPU as its own core (no SMT pairs), so the
sub-linear ceiling is hypervisor oversubscription. Any engine is capped at
raw efficiency {hw['speedup_8_32'] / 4:.2f} on the 8->32 comparison here;
the normalized column divides by this measured ceiling.

## Results (floors; per cell: wall / throughput / cpu-util)

| job | local[8] | local[16] | local[32] | eff 8->16 | raw eff 8->32 | 8->32 vs HW ceiling |
|---|---|---|---|---|---|---|
{row('join', 'spatial join')}
{row('tile', 'tile assign (9 zooms + Hilbert)')}

## Paired per-cycle efficiencies (noise-robust estimator)

Floors above may come from DIFFERENT cycles (different host weather);
the paired estimator compares levels WITHIN each cycle (run back-to-back
in the same minutes) and reports the median across cycles — this is the
number to read on this VM:

| job | paired eff 8->16 (median) | paired raw eff 8->32 (median) | paired 8->32 vs same-cycle HW ceiling |
|---|---|---|---|
| spatial join | {paired['join']['eff_8_16']:.3f} | {paired['join']['eff_8_32']:.3f} | {paired['join']['eff_8_32_vs_hw']:.3f} |
| tile assign | {paired['tile']['eff_8_16']:.3f} | {paired['tile']['eff_8_32']:.3f} | {paired['tile']['eff_8_32_vs_hw']:.3f} |

## Per-cycle dispersion (VERDICT r4 #3)

One bad minute must be visible, not buried in a median. Per-cycle paired
raw efficiencies, min / median / max across the {os.environ.get(
    "SPARK_GRAFT_SCALING_CYCLES", "3")} cycles:

| job | 8->16 cycles | 8->32 cycles |
|---|---|---|
| spatial join | {min(paired['join']['cycles_8_16']):.3f} / {_median(paired['join']['cycles_8_16']):.3f} / {max(paired['join']['cycles_8_16']):.3f} — {[round(x, 3) for x in paired['join']['cycles_8_16']]} | {min(paired['join']['cycles_8_32']):.3f} / {_median(paired['join']['cycles_8_32']):.3f} / {max(paired['join']['cycles_8_32']):.3f} — {[round(x, 3) for x in paired['join']['cycles_8_32']]} |
| tile assign | {min(paired['tile']['cycles_8_16']):.3f} / {_median(paired['tile']['cycles_8_16']):.3f} / {max(paired['tile']['cycles_8_16']):.3f} — {[round(x, 3) for x in paired['tile']['cycles_8_16']]} | {min(paired['tile']['cycles_8_32']):.3f} / {_median(paired['tile']['cycles_8_32']):.3f} / {max(paired['tile']['cycles_8_32']):.3f} — {[round(x, 3) for x in paired['tile']['cycles_8_32']]} |

## Reading

* north_rule asks >= 0.8 efficiency between N and 4N EXECUTORS. On this
  single host the 8->16 point is the least-confounded proxy (hypervisor
  ceiling {hw['speedup_8_16']:.2f}/2 = {hw['speedup_8_16'] / 2:.2f} of
  ideal); the 8->32 point is bounded by the measured
  {hw['speedup_8_32']:.2f}x host ceiling, and the normalized column reads
  efficiency against that ceiling.
* Plan audit: the join is shuffle-free (broadcast hash join with the exact
  integer PIP inside the join condition, whole-stage codegen, zero Python);
  tile assignment is map-only explode + codegen Hilbert fold. Neither has a
  serialization point, so on a real N->4N executor cluster both scale with
  input splits; cross-executor JVMs on separate hosts do not share this
  box's hypervisor slice.
* cpu-util near 1.0 at a level means the cores were saturated doing engine
  work (scaling limited by the host); util well below 1.0 would instead
  indicate missing parallelism in the plan — the numbers distinguish these.

Raw: {json.dumps({"hardware": hw, "paired": paired, "levels": {str(k): v for k, v in results.items()}})}
""")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
