#!/usr/bin/env python3
"""Registry-wide oracle/Spark TYPE parity sweep.

The r10-r12 store_vacuum_plan lesson: a gate can be exact-value green
yet deterministically hash-red in any dtype- or rendering-sensitive
compare, because DuckDB typed one oracle column differently from the
Spark output (there: an uncast `SUM(BIGINT)*k // COUNT(*)` is HUGEINT,
which pandas materializes as float64 -> `161290.0` vs Spark's int64
`161290`). The judge's one-off DESCRIBE sweep found exactly one such
column in 425 gates; this tool makes that sweep permanent.

For every gate in <out_dir>/oracle_sql.json it DuckDB-DESCRIBEs both
sides — the oracle SQL (bound against the testdata views, never
executed) and the Spark-written parquet — and asserts the per-column
TYPE CLASS matches:

  int       TINYINT/SMALLINT/INTEGER/BIGINT (+ unsigned)
  hugeint   HUGEINT / INT128  (never legal: Spark has no int128, so a
            HUGEINT oracle column is always a missing CAST)
  float     FLOAT/DOUBLE
  decimal   DECIMAL(p,s)
  ... and str/bool/date/timestamp/binary/list/struct/map verbatim.

Cross-class combos are failures even when values compare equal —
that's the whole point. Usable standalone or via check.py (which calls
`gate_parity` per gate so the validation loop can never re-admit the
bug class).

Usage: tools/typeparity.py <sf_dir> <verify_out_dir>
"""
import glob
import json
import os
import sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def type_class(t):
    """Collapse a DuckDB type name to the class the compare cares
    about. HUGEINT stays its own class on purpose."""
    u = t.upper()
    if u.startswith("DECIMAL"):
        return "decimal"
    if u.endswith("[]") or u.startswith("LIST") or u.startswith("ARRAY"):
        return "list"
    if u.startswith("STRUCT"):
        return "struct"
    if u.startswith("MAP"):
        return "map"
    if u.startswith("TIMESTAMP"):
        return "timestamp"
    if u in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if u in ("HUGEINT", "UHUGEINT", "INT128"):
        return "hugeint"
    if u in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if u == "VARCHAR":
        return "str"
    if u == "BOOLEAN":
        return "bool"
    if u == "DATE":
        return "date"
    if u in ("BLOB", "BYTEA", "BINARY", "VARBINARY"):
        return "binary"
    return u.lower()


def describe(con, sql):
    """column -> DuckDB type for an arbitrary SELECT (bind only)."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


def gate_parity(con, out_dir, name, oracle_sql):
    """Compare type classes for one gate. Returns a list of mismatch
    strings (empty = parity). Raises if either side fails to bind."""
    spark = describe(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
    oracle = describe(con, oracle_sql)
    bad = []
    for c in sorted(set(spark) | set(oracle)):
        if c not in spark or c not in oracle:
            bad.append(f"column {c!r} only on "
                       f"{'spark' if c in spark else 'oracle'} side")
            continue
        sc, oc = type_class(spark[c]), type_class(oracle[c])
        if sc != oc:
            bad.append(f"column {c!r}: spark {spark[c]} ({sc}) != "
                       f"oracle {oracle[c]} ({oc})")
    return bad


def main(sf_dir, out_dir):
    con = connect(sf_dir)
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracles):
        if not glob.glob(f"{out_dir}/{name}/*.parquet"):
            n_skip += 1
            continue
        try:
            bad = gate_parity(con, out_dir, name, oracles[name])
        except Exception as e:
            print(f"FAIL {name}: describe error: {e}")
            n_fail += 1
            continue
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            n_fail += 1
        else:
            n_pass += 1
    skip = f", {n_skip} skipped (no spark output)" if n_skip else ""
    print(f"\ntype parity: {n_pass} pass, {n_fail} fail{skip}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
