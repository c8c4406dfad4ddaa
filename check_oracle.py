# Dev-loop oracle pre-checker (emulates the driver's DuckDB compare).
# Usage: python3 check_oracle.py /root/testdata/sf0.01 /tmp/v1
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output"); fails.append(name); continue
    sp = pd.read_parquet(spark_dir)
    try:
        du = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb error {e}"); fails.append(name); continue
    sp = sp.reindex(sorted(sp.columns), axis=1)
    du = du.reindex(sorted(du.columns), axis=1)
    if list(sp.columns) != list(du.columns):
        print(f"FAIL {name}: cols spark={list(sp.columns)} duck={list(du.columns)}")
        fails.append(name); continue
    if len(sp) != len(du):
        print(f"FAIL {name}: rows spark={len(sp)} duck={len(du)}")
        fails.append(name); continue
    # sort rows for order-insensitivity, then exact compare
    sp2 = sp.sort_values(list(sp.columns)).reset_index(drop=True)
    du2 = du.sort_values(list(du.columns)).reset_index(drop=True)
    ok, baddetail = True, None
    for c in sp.columns:
        a, b = sp2[c], du2[c]
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
            same = np.array_equal(a.to_numpy(dtype=float), b.to_numpy(dtype=float), equal_nan=True)
        elif "datetime" in str(a.dtype) or "datetime" in str(b.dtype):
            same = np.array_equal(a.to_numpy("datetime64[us]"), b.to_numpy("datetime64[us]"))
        else:
            same = a.astype(str).equals(b.astype(str))
        if not same:
            ok = False
            mask = ~(a.astype(str) == b.astype(str))
            i = int(np.argmax(mask.to_numpy())) if mask.any() else 0
            baddetail = f"col {c} row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r} (dtypes {a.dtype}/{b.dtype})"
            break
    if ok:
        print(f"ok   {name} ({len(sp)} rows)")
    else:
        print(f"FAIL {name}: {baddetail}"); fails.append(name)

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
