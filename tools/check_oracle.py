#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate (NOT library code).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>.parquet the Verify main dumped, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same source tables,
and compares row sets (columns sorted by name, rows sorted, values
stringified). Prints one line per query.
"""
import json, sys, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out

fails = 0
for name in sorted(oracle):
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        exp = con.execute(oracle[name])
        exp_cols = [d[0] for d in exp.description]
        exp_rows = exp.fetchall()
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            fails += 1
            continue
        g, e = canon(got_rows, got_cols), canon(exp_rows, exp_cols)
        if g == e:
            print(f"PASS {name} ({len(g)} rows)")
        else:
            fails += 1
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows")
            only_g = [x for x in g if x not in set(e)][:3]
            only_e = [x for x in e if x not in set(g)][:3]
            for x in only_g: print(f"   spark-only: {x[:200]}")
            for x in only_e: print(f"   oracle-only: {x[:200]}")
    except Exception as ex:
        fails += 1
        print(f"ERROR {name}: {ex}")

# rows-only queries: check parquet exists and has rows
import glob, os
for d in sorted(glob.glob(f"{out_dir}/q*")):
    name = os.path.basename(d)
    if name in oracle: continue
    try:
        n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
        print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only, {n} rows)")
        if n == 0: fails += 1
    except Exception as ex:
        fails += 1
        print(f"ERROR {name}: {ex}")

print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
