#!/usr/bin/env python3
"""Machine-state probe bracketing bench captures (VERDICT r13 #1).

The only cross-round perf signal that moved in r12/r13 was the
ENVIRONMENT (a ~1.18x uniform slowdown on untouched code at 0.15%
steal), and adjudicating it required arguing from uniformity every
time. This probe samples everything observable about the machine's
performance state, plus a fixed micro-sentinel whose throughput a
cross-round comparison can normalize by, and prints ONE JSON object:

- /proc/stat jiffies (user/system/idle/iowait/steal) — the steal
  bracketing bench_steal.sh already does, now with the full vector;
- cpufreq scaling_cur_freq per cpu and thermal zone temps — absent on
  this VM (no /sys/devices/system/cpu/*/cpufreq, no thermal zones),
  recorded as null so an artifact is explicit about what could not be
  observed rather than silently omitting it;
- loadavg and MemAvailable;
- the micro-sentinel, pinned to cpu 0 (sched_setaffinity):
  * mem_bw_proxy_gbps — best-of-5 two-pass a = b + 0.5*c over
    8M-element float64 arrays (3 x 64 MiB, far beyond LLC): memory-
    bandwidth bound. The numpy spelling is TWO streaming passes
    (multiply: read c + write a = 16 B/elem; add: read a + read b +
    write a = 24 B/elem), so the real traffic is ~40 B/element and
    that is what is counted — this is a bandwidth PROXY for
    cross-round ratio normalization, not a STREAM-comparable figure
    (r13/r14 captures named it mem_triad_gbps and counted 24 B/elem
    over the SAME kernel: old_value = new_value * 24/40);
  * cpu_gflops — best-of-5 256x256 float64 matmul (in-cache): ALU /
    effective-frequency bound.
  Together they split "memory bandwidth degraded" from "cpu slowed"
  — the two machine-state drifts a VM can't see via steal alone.

Used by tools/bench_steal.sh before/after each capture; the pair is
injected into BENCH_FULL.json's env.machine so the committed artifact
carries its own machine context.
"""
import json
import os
import sys
import time


def proc_stat():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    keys = ["user", "nice", "system", "idle", "iowait",
            "irq", "softirq", "steal", "guest", "guest_nice"]
    return dict(zip(keys, map(int, parts[1:11])))


def cpufreq_khz():
    vals = []
    base = "/sys/devices/system/cpu"
    try:
        for name in sorted(os.listdir(base)):
            p = os.path.join(base, name, "cpufreq", "scaling_cur_freq")
            if name.startswith("cpu") and name[3:].isdigit() \
                    and os.path.exists(p):
                with open(p) as f:
                    vals.append(int(f.read().strip()))
    except OSError:
        pass
    if not vals:
        return None
    return {"n": len(vals), "min": min(vals), "max": max(vals),
            "mean": sum(vals) // len(vals)}


def thermal_c():
    zones = {}
    base = "/sys/class/thermal"
    try:
        for name in sorted(os.listdir(base)):
            p = os.path.join(base, name, "temp")
            if name.startswith("thermal_zone") and os.path.exists(p):
                with open(p) as f:
                    zones[name] = int(f.read().strip()) / 1000.0
    except OSError:
        pass
    return zones or None


def mem_available_mb():
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("MemAvailable:"):
                return int(line.split()[1]) // 1024
    return None


def sentinel():
    import numpy as np
    try:
        os.sched_setaffinity(0, {0})
    except OSError:
        pass  # unpinned is better than no sentinel
    n = 8 * 1024 * 1024
    b = np.full(n, 1.5)
    c = np.full(n, 2.5)
    a = np.empty(n)
    best_bw = 0.0
    for _ in range(5):
        t0 = time.perf_counter()
        np.multiply(c, 0.5, out=a)  # read c, write a: 16 B/elem
        np.add(a, b, out=a)         # read a+b, write a: 24 B/elem
        dt = time.perf_counter() - t0
        best_bw = max(best_bw, 40.0 * n / dt / 1e9)
    m = np.full((256, 256), 1.0 / 256)
    best_mm = 0.0
    reps = 40
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(reps):
            m = m @ m
        dt = time.perf_counter() - t0
        best_mm = max(best_mm, reps * 2.0 * 256 ** 3 / dt / 1e9)
    return {"mem_bw_proxy_gbps": round(best_bw, 2),
            "cpu_gflops": round(best_mm, 2)}


def main():
    state = {
        "ts": time.time(),
        "proc_stat": proc_stat(),
        "loadavg": list(os.getloadavg()),
        "mem_available_mb": mem_available_mb(),
        "cpufreq_khz": cpufreq_khz(),
        "thermal_c": thermal_c(),
        "sentinel": sentinel() if "--no-sentinel" not in sys.argv
        else None,
    }
    print(json.dumps(state))


if __name__ == "__main__":
    main()
