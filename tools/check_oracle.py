#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle comparison:
run Verify first (writes parquet per query + oracle_sql.json), then this
script compares each Spark result against DuckDB on the same tables —
columns sorted by name, values hashed. Usage:
  python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, hashlib
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetch_df()
    except Exception as e:
        fails.append((name, f"duckdb error: {e}"))
        continue
    try:
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetch_df()
    except Exception as e:
        fails.append((name, f"spark result missing: {e}"))
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        fails.append((name, f"schema: oracle={list(exp.columns)} spark={list(got.columns)}"))
        continue
    if exp.dtypes.tolist() != got.dtypes.tolist():
        print(f"  [warn] {name} dtypes differ: {dict(zip(exp.columns, zip(exp.dtypes, got.dtypes)))}")
    if len(exp) != len(got):
        fails.append((name, f"rows: oracle={len(exp)} spark={len(got)}"))
        continue
    def h(df):
        return hashlib.md5(df.astype(str).to_csv(index=False).encode()).hexdigest()
    if h(exp) != h(got):
        diff = (exp.astype(str) != got.astype(str))
        badcols = [c for c in exp.columns if diff[c].any()]
        i = diff.any(axis=1).idxmax()
        fails.append((name, f"hash mismatch cols={badcols} first row {i}:\n  oracle: {exp.loc[i].to_dict()}\n  spark:  {got.loc[i].to_dict()}"))
    else:
        print(f"  [ok] {name} rows={len(exp)}")

print()
if fails:
    for n, msg in fails: print(f"[FAIL] {n}: {msg}")
    sys.exit(1)
print(f"ALL {len(oracle)} ORACLE QUERIES MATCH")
