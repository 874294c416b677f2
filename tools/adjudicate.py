#!/usr/bin/env python3
"""Adjudicate a driver-side hash-fail from artifacts alone.

Compares a Verify run's digests.json (canonical per-gate digest of the
written parquet, see Verify.digestOf) against the repo's committed
clean-run digests for the run's scale factor (DIGESTS_sf*.json — the
run's run_meta.json names the right baseline; an explicit path
overrides):

  - digest MATCH  -> the Spark output is content-identical to the run
    the builder proved green against the DuckDB oracle; any hash-fail
    the driver reported for that gate is a compare-side flake (the r9
    parts_abc_analysis / r10-r11 store_vacuum_plan signature). Proven,
    no re-run needed.
  - digest DIFF   -> the gate's output really changed; re-run the
    oracle compare for that gate.

Usage: tools/adjudicate.py <verify_out_dir> [committed_digests.json]
"""
import json, os, sys


def baseline_for(out_dir):
    """Pick the committed baseline for the run's SF: run_meta.json
    (written by Verify alongside digests.json) names it; fall back to
    the sf0.01 baseline for pre-meta runs."""
    meta_path = os.path.join(out_dir, "run_meta.json")
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
        name = meta.get("baseline")
        if not name:
            sf = meta.get("sf_dir", "").rstrip("/").split("/")[-1] or "sf0.01"
            name = f"DIGESTS_{sf}.json"
        return name
    return "DIGESTS_sf0.01.json"


def main(out_dir, committed=None):
    committed = committed or baseline_for(out_dir)
    print(f"baseline: {committed}")
    got = json.load(open(os.path.join(out_dir, "digests.json")))
    ref = json.load(open(committed))
    match = diff = 0
    for name in sorted(set(got) | set(ref)):
        g, r = got.get(name), ref.get(name)
        if g == r and g is not None:
            match += 1
        else:
            diff += 1
            print(f"DIFF {name}: run={g} committed={r}")
    print(f"\n{match} match, {diff} differ "
          f"({'all driver hash-fails on matching gates are flakes' if diff == 0 else 'differing gates need a real oracle re-run'})")
    return 1 if diff else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1],
                  *(sys.argv[2:3] or [])))
