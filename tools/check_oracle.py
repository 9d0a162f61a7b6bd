#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare to the Verify parquet dump
(column names sorted, values compared row-by-row after a full sort)."""
import sys, json, glob, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"MISSING-SPARK {name}"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}"); fail += 1; continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"SCHEMA {name}: spark={gc} oracle={ec}"); fail += 1; continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    e = exp[gc].sort_values(gc).reset_index(drop=True)
    if len(g) != len(e):
        print(f"ROWS {name}: spark={len(g)} oracle={len(e)}"); fail += 1; continue
    mismatch = None
    for c in gc:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if a is None and b is None: continue
            if isinstance(a, float) and isinstance(b, float):
                if (math.isnan(a) and math.isnan(b)) or a == b: continue
                mismatch = (c, i, a, b); break
            if a != b:
                # pandas NaN vs None
                if (a is None or (isinstance(a,float) and math.isnan(a))) and (b is None or (isinstance(b,float) and math.isnan(b))): continue
                mismatch = (c, i, a, b); break
        if mismatch: break
    # dtype check (loose): report differing dtypes even when values match
    dt = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in gc if str(got[c].dtype) != str(exp[c].dtype)]
    if mismatch:
        print(f"VALUE {name}: col={mismatch[0]} row={mismatch[1]} spark={mismatch[2]!r} oracle={mismatch[3]!r}"); fail += 1
    elif dt:
        print(f"DTYPE {name}: {dt}"); fail += 1
    else:
        print(f"OK {name} ({len(g)} rows)"); ok += 1
no_oracle = [d.split('/')[-1] for d in glob.glob(f"{out_dir}/*") if '/' in d and not d.endswith('.json') and d.split('/')[-1] not in oracle]
print(f"\n{ok} ok, {fail} fail; rows-only (no oracle): {sorted(no_oracle)}")
