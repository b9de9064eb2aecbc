#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/selfcheck.py [sfDir] [outDir] [--only q44,q46]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran (or run
with --run to invoke it). Registers each parquet fixture as a DuckDB view
named after the table, executes every oracle_sql.json entry, and compares
against the Spark-written parquet under outDir/<query>/ with columns
sorted by name and rows sorted by all columns.
"""
import json, math, subprocess, sys
import duckdb

args = []
only = None
run = False
argv = sys.argv[1:]
i = 0
while i < len(argv):
    a = argv[i]
    if a.startswith("--only="):
        only = set(a.split("=", 1)[1].split(","))
    elif a == "--only":  # two-token form: --only q44,q46
        if i + 1 >= len(argv):
            sys.exit("--only requires a comma-separated query list")
        i += 1
        only = set(argv[i].split(","))
    elif a == "--run":
        run = True
    elif a.startswith("--"):
        sys.exit(f"unrecognized flag: {a}")
    else:
        args.append(a)
    i += 1
sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
out_dir = args[1] if len(args) > 1 else "/tmp/verify"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if run:
    subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
                   check=True)

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
if only is not None:
    oracle = {k: v for k, v in oracle.items() if k in only}

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def cells_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb or abs(fa - fb) < 1e-9 * max(1.0, abs(fa))
    except (TypeError, ValueError):
        pass
    if (a is None) != (b is None):
        try:  # pandas NaN vs None
            if a is None and isinstance(b, float) and math.isnan(b): return True
            if b is None and isinstance(a, float) and math.isnan(a): return True
        except TypeError:
            pass
        return False
    return str(a) == str(b)

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        expect = norm(con.execute(sql).fetchdf())
        got = norm(con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf())
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    if list(expect.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(expect.columns)}")
        fails += 1
        continue
    if len(expect) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(expect)}")
        fails += 1
        continue
    bad = []
    for i in range(len(expect)):
        for c in expect.columns:
            a, b = expect[c].iloc[i], got[c].iloc[i]
            if not cells_equal(a, b):
                bad.append((i, c, a, b))
    if bad:
        print(f"FAIL {name}: {len(bad)} cell diffs, first: {bad[:3]}")
        fails += 1
    else:
        exact = "exact"
        print(f"PASS {name} ({len(expect)} rows, {exact})")
print(f"\n{len(oracle) - fails}/{len(oracle)} oracle queries pass")
sys.exit(1 if fails else 0)
