#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each query's
parquet output from Verify, run its DuckDB oracle over the same testdata
tables, and compare (rows, schema names, COLUMN TYPES, sorted-value hash).

The type check exists because the driver's hash is dtype-sensitive: DuckDB
sum(BIGINT) returns HUGEINT while Spark writes BIGINT, and the driver's
pandas conversion renders the two differently even when every value is
equal (the round-8 16-query red class). We compare DESCRIBE-level DuckDB
types of the Spark parquet vs the oracle result and fail on ANY divergence
— including within the signed-int family, which the driver happens to
render uniformly today but is not contractually bound to."""
import json
import math
import os
import sys

import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "target/verify_out"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def described_types(sql):
    """column name -> DuckDB type string, via DESCRIBE (exact types,
    unlike cursor.description's coarse codes)."""
    return {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}


ok = fail = 0
for name in sorted(oracles):
    qdir = f"{OUT}/{name}"
    if not os.path.isdir(qdir):
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
    got_cols = [d[0] for d in got.description]
    got_rows = got.fetchall()
    try:
        exp = con.execute(oracles[name])
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fail += 1
        continue
    exp_cols = [d[0] for d in exp.description]
    exp_rows = exp.fetchall()
    if sorted(got_cols) != sorted(exp_cols):
        print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
        fail += 1
        continue
    got_t = described_types(f"SELECT * FROM '{qdir}/*.parquet'")
    exp_t = described_types(f"({oracles[name]})")
    type_diffs = [(c, got_t[c], exp_t[c]) for c in sorted(got_t)
                  if got_t[c] != exp_t[c]]
    if type_diffs:
        print(f"FAIL {name}: column-type divergence "
              + "; ".join(f"{c}: spark={g} oracle={e}"
                          for c, g, e in type_diffs))
        fail += 1
        continue
    if len(got_rows) != len(exp_rows):
        print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
        fail += 1
        continue
    gk, ek = table_key(got_rows, got_cols), table_key(exp_rows, exp_cols)
    if gk != ek:
        diff = [i for i, (a, b) in enumerate(zip(gk, ek)) if a != b][:3]
        print(f"FAIL {name}: value mismatch at sorted rows {diff}")
        for i in diff[:2]:
            print(f"   got: {gk[i]}")
            print(f"   exp: {ek[i]}")
        fail += 1
        continue
    print(f"ok   {name} ({len(got_rows)} rows)")
    ok += 1

# rows-only queries (no oracle): existence + rows>=0
for name in sorted(os.listdir(OUT)):
    if name.startswith("q_") and name not in oracles and os.path.isdir(f"{OUT}/{name}"):
        n = con.execute(f"SELECT count(*) FROM '{OUT}/{name}/*.parquet'").fetchone()[0]
        print(f"rows-only {name}: {n} rows")

print(f"\n{ok} ok, {fail} fail of {len(oracles)} oracle queries")
sys.exit(1 if fail else 0)
