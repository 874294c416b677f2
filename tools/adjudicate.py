#!/usr/bin/env python3
"""Adjudicate a driver-side hash-fail from artifacts alone.

Compares a Verify run's digests.json (canonical per-gate digest of the
written parquet, see Verify.digestOf) against the repo's committed
clean-run digests (DIGESTS_sf0.01.json by default):

  - digest MATCH  -> the Spark output is byte-identical to the run the
    builder proved green against the DuckDB oracle; any hash-fail the
    driver reported for that gate is a compare-side flake (the r9
    parts_abc_analysis / r10 store_vacuum_plan signature). Proven, no
    re-run needed.
  - digest DIFF   -> the gate's output really changed; re-run the
    oracle compare for that gate.

Usage: tools/adjudicate.py <verify_out_dir> [committed_digests.json]
"""
import json, os, sys


def main(out_dir, committed="DIGESTS_sf0.01.json"):
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
