#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate.

Usage: python3 scripts/selfcheck.py <verify_out_dir> <sf_dir> [q1,q2,...]

Reads each <out>/<name> parquet result written by graft.Verify plus
<out>/oracle_sql.json, runs every oracle against DuckDB views of the
sf-dir tables, and compares row count, column names, and value hashes
(columns sorted by name, rows sorted, floats as-is after the query's own
rounding). Dev tool only — the real gate is the driver's.
"""
import glob
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    return out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    if only is not None:
        known = set(oracle) | {os.path.basename(p)
                               for p in glob.glob(os.path.join(out_dir, "q*"))
                               if os.path.isdir(p)}
        for name in sorted(only - known):
            print(f"FAIL {name}: unknown query (not in oracle_sql.json or {out_dir})")
            failures += 1
    # Queries with a result dump but no oracle → rows-only check (the
    # driver's weaker gate for non-SQL-expressible ops).
    for path in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(path)
        if name in oracle or not os.path.isdir(path):
            continue
        if only is not None and name not in only:
            continue
        files = glob.glob(f"{path}/*.parquet")
        n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        if n > 0:
            print(f"OK   {name}: {n} rows (rows-only, no oracle)")
        else:
            print(f"FAIL {name}: empty result (rows-only check)")
            failures += 1
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        pq = os.path.join(out_dir, name)
        files = glob.glob(f"{pq}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet at {pq}")
            failures += 1
            continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})")
        g_cols, g_rows = got.columns, got.fetchall()
        try:
            exp = con.sql(oracle[name])
            e_cols, e_rows = exp.columns, exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if sorted(g_cols) != sorted(e_cols):
            print(f"FAIL {name}: columns {sorted(g_cols)} != {sorted(e_cols)}")
            failures += 1
            continue
        # Dtype-parity guard: the driver hashes pandas REPRESENTATIONS, so a
        # DuckDB type promotion (BIGINT sum -> HUGEINT, rendered as float64)
        # hash-mismatches even when values are equal. Flag any oracle column
        # whose DuckDB type is HUGEINT/DECIMAL while the Spark parquet column
        # is not — the oracle must CAST back to the Spark column's type.
        g_types = dict(zip(g_cols, [str(t).upper() for t in got.types]))
        e_types = dict(zip(e_cols, [str(t).upper() for t in exp.types]))
        promoted = [c for c in e_cols
                    if (e_types[c] in ("HUGEINT", "UHUGEINT")
                        or e_types[c].startswith("DECIMAL"))
                    and g_types.get(c, "") != e_types[c]]
        if promoted:
            det = ", ".join(f"{c}: duck={e_types[c]} spark={g_types.get(c)}"
                            for c in promoted)
            print(f"FAIL {name}: oracle dtype promotion ({det}) — CAST the "
                  f"oracle column to the Spark column's type")
            failures += 1
            continue
        if len(g_rows) != len(e_rows):
            print(f"FAIL {name}: rows {len(g_rows)} != {len(e_rows)}")
            failures += 1
            continue
        cg, ce = canon(g_rows, g_cols), canon(e_rows, e_cols)
        if cg != ce:
            bad = [i for i, (a, b) in enumerate(zip(cg, ce)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {bad}")
            for i in bad:
                print(f"   spark: {cg[i]}\n   duck : {ce[i]}")
            failures += 1
            continue
        print(f"OK   {name}: {len(g_rows)} rows")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
