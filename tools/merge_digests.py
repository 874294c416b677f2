#!/usr/bin/env python3
"""Merge a subset Verify run's digests into the committed baseline.

Completes the `--since` incremental workflow (VERDICT r13 #7): after
`runMain graft.Verify <sfDir> <out> --since <rev>` (or SPARK_GRAFT_ONLY)
has been green through tools/check.py, fold ONLY that run's per-gate
digests into the committed DIGESTS_sf*.json for the run's scale factor
— the full serial 3-SF sweep remains the round-close gate; this keeps
the baseline current between sweeps without 3 full runs per wave.

Usage: python3 tools/merge_digests.py <verify_out_dir>
(reads <out>/run_meta.json to pick the right DIGESTS_sf*.json)
"""
import json
import sys


def main():
    out = sys.argv[1]
    meta = json.load(open(f"{out}/run_meta.json"))
    baseline = meta["baseline"]
    new = json.load(open(f"{out}/digests.json"))
    bad = {k: v for k, v in new.items()
           if v == "error" or v.startswith("digest-error")}
    if bad:
        sys.exit(f"refusing to merge errored digests: {sorted(bad)}")
    d = json.load(open(baseline))
    changed = {k for k, v in new.items() if d.get(k) != v}
    d.update(new)
    with open(baseline, "w") as f:
        f.write("{\n")
        ks = sorted(d)
        for i, k in enumerate(ks):
            comma = "," if i < len(ks) - 1 else ""
            f.write(json.dumps(k) + ": " + json.dumps(d[k]) + comma + "\n")
        f.write("}")
    print(f"{baseline}: merged {len(new)} gate(s), "
          f"{len(changed)} changed: {sorted(changed)}")


if __name__ == "__main__":
    main()
