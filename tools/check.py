#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the parquet outputs produced by `sbt "runMain graft.Verify <sf> <out>"`
plus out/oracle_sql.json, runs each oracle in DuckDB over the same testdata
tables, and compares: column names (sorted), row counts, and exact values
after sorting rows. Reports per-query PASS/FAIL with diffs.
"""
import json, sys, glob, os
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from typeparity import gate_parity

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}");  n_fail += 1;  continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}");  n_fail += 1;  continue
        # Type-class parity (the store_vacuum_plan lesson): a gate can
        # be exact-value equal yet deterministically red in any dtype-
        # sensitive compare when DuckDB types an oracle column
        # differently (e.g. an uncast SUM // COUNT is HUGEINT ->
        # pandas float64 vs Spark int64). Fail it here even though the
        # value compare below would pass.
        try:
            parity = gate_parity(con, out_dir, name, oracles[name])
        except Exception as e:
            parity = [f"describe error: {e}"]
        if parity:
            print(f"FAIL {name}: type parity: " + "; ".join(parity))
            n_fail += 1;  continue
        g = got[gc].sort_values(gc, ignore_index=True)
        e = exp[ec].sort_values(ec, ignore_index=True)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}");  n_fail += 1;  continue
        try:
            import pandas as pd
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(g)} rows)");  n_pass += 1
        except AssertionError as ex:
            msg = str(ex).split("\n")
            print(f"FAIL {name}: {' | '.join(msg[:6])}")
            # show first differing cells
            for c in gc:
                neq = (g[c] != e[c])
                try:
                    both_nan = g[c].isna() & e[c].isna()
                    neq = neq & ~both_nan
                except Exception:
                    pass
                if neq.any():
                    i = neq.idxmax()
                    print(f"  col {c} row {i}: got={g[c][i]!r} exp={e[c][i]!r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
