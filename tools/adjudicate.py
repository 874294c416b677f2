#!/usr/bin/env python3
"""Adjudicate a driver-side hash-fail from artifacts alone.

Compares a Verify run's digests.json (canonical per-gate digest of the
written parquet, see Verify.digestOf) against the repo's committed
clean-run digests for the run's scale factor (DIGESTS_sf*.json — the
run's run_meta.json names the right baseline; an explicit path
overrides):

  - digest MATCH  -> the Spark output is content-identical to the run
    the builder proved green against the DuckDB oracle. But content-
    identical does NOT yet name the driver's failure mechanism: the
    r10-r11 store_vacuum_plan adjudications concluded "compare-side
    flake" from a digest match alone, and were wrong — the real cause
    was a deterministic DTYPE mismatch (uncast oracle column typed
    HUGEINT by DuckDB -> pandas float64 vs Spark int64; equal values,
    different rendering). So for every digest-matching RED gate this
    tool now also runs the single-gate exact-value compare with
    check_dtype=True plus the type-class parity sweep, and reports one
    of:
      value+dtype parity -> genuine compare-side flake (transient)
      TYPE MISMATCH      -> deterministic; fix the oracle's CAST
      VALUE MISMATCH     -> the committed baseline itself was wrong
  - digest DIFF   -> the gate's output really changed; re-run the
    oracle compare for that gate.

Red gates come from --correctness CORRECTNESS_rN.json (driver format:
{gate: {hash_match: bool, ...}}) or --red gate1,gate2. The dtype
compare needs the testdata (--sf overrides run_meta.json's sf_dir).

Usage: tools/adjudicate.py <verify_out_dir> [committed_digests.json]
           [--correctness CORRECTNESS_rN.json | --red g1,g2]
           [--sf /root/testdata/sf0.01]
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


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


def sf_for(out_dir):
    meta_path = os.path.join(out_dir, "run_meta.json")
    if os.path.exists(meta_path):
        return json.load(open(meta_path)).get("sf_dir")
    return None


def dtype_adjudicate(out_dir, sf_dir, gate):
    """Single-gate exact-value + dtype compare vs the DuckDB oracle.
    Returns (verdict, detail): verdict in {"value+dtype parity",
    "TYPE MISMATCH", "VALUE MISMATCH", "error"}."""
    from typeparity import connect, gate_parity
    import pandas as pd
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if gate not in oracles:
        return "error", "gate has no oracle (rows-only gate)"
    if not glob.glob(f"{out_dir}/{gate}/*.parquet"):
        return "error", "no spark output in this run"
    con = connect(sf_dir)
    try:
        parity = gate_parity(con, out_dir, gate, oracles[gate])
    except Exception as e:
        return "error", f"describe error: {e}"
    if parity:
        return "TYPE MISMATCH", "; ".join(parity)
    try:
        got = con.sql(f"SELECT * FROM '{out_dir}/{gate}/*.parquet'").df()
        exp = con.sql(oracles[gate]).df()
    except Exception as e:
        return "error", f"exec error: {e}"
    cols = sorted(got.columns)
    if sorted(exp.columns) != cols:
        return "VALUE MISMATCH", f"columns {sorted(exp.columns)} != {cols}"
    g = got[cols].sort_values(cols, ignore_index=True)
    e = exp[cols].sort_values(cols, ignore_index=True)
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=True,
                                      check_exact=True)
        return "value+dtype parity", f"{len(g)} rows exact incl. dtypes"
    except AssertionError as ex:
        first = " | ".join(str(ex).split("\n")[:4])
        # distinguish: same values, differing pandas dtype
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            return "TYPE MISMATCH", f"values equal, dtypes differ: {first}"
        except AssertionError:
            return "VALUE MISMATCH", first


def main(out_dir, committed=None, red=None, sf_dir=None):
    committed = committed or baseline_for(out_dir)
    sf_dir = sf_dir or sf_for(out_dir)
    print(f"baseline: {committed}")
    got = json.load(open(os.path.join(out_dir, "digests.json")))
    ref = json.load(open(committed))
    match = diff = 0
    matching = set()
    for name in sorted(set(got) | set(ref)):
        g, r = got.get(name), ref.get(name)
        if g == r and g is not None:
            match += 1
            matching.add(name)
        elif g is None:
            diff += 1
            print(f"DIFF {name}: absent from this run (subset run?)")
        else:
            diff += 1
            print(f"DIFF {name}: run={g} committed={r}")
    print(f"\n{match} match, {diff} differ "
          f"({'digest-matching gates are content-identical to the proven-green baseline' if diff == 0 else 'differing gates need a real oracle re-run'})")
    rc = 1 if diff else 0
    for gate in sorted(red or []):
        if gate not in matching:
            print(f"red {gate}: digest DIFFERS -> not adjudicable from "
                  "artifacts; re-run the oracle compare")
            rc = 1
            continue
        if not sf_dir:
            print(f"red {gate}: digest matches, but no sf_dir known "
                  "(pass --sf) — cannot run the dtype compare")
            rc = 1
            continue
        verdict, detail = dtype_adjudicate(out_dir, sf_dir, gate)
        print(f"red {gate}: digest matches; dtype compare -> "
              f"{verdict} ({detail})")
        if verdict != "value+dtype parity":
            rc = 1
    return rc


def parse_args(argv):
    out_dir, committed, red, sf_dir = None, None, [], None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--red":
            red += [g for g in argv[i + 1].split(",") if g]
            i += 2
        elif a == "--correctness":
            corr = json.load(open(argv[i + 1]))
            red += [k for k, v in corr.items()
                    if isinstance(v, dict) and not (
                        v.get("hash_match", True)
                        and v.get("rows_match", True)
                        and v.get("schema_match", True))]
            i += 2
        elif a == "--sf":
            sf_dir = argv[i + 1]
            i += 2
        elif out_dir is None:
            out_dir = a
            i += 1
        else:
            committed = a
            i += 1
    return out_dir, committed, red, sf_dir


if __name__ == "__main__":
    sys.exit(main(*parse_args(sys.argv[1:])))
