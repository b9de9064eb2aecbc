#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate — DRIVER-EXACT mode.

Usage: python3 tools/selfcheck.py [sfDir] [outDir] [--only q44,q46] [--run]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran (or run
with --run to invoke it). Registers each parquet fixture as a DuckDB view
named after the table, executes every oracle_sql.json entry, and compares
against the Spark-written parquet under outDir/<query>/ with columns
sorted by name and rows sorted by all columns.

Comparison contract (mirrors the driver's hash, which is computed over
TYPED values — see round-5 verdict: q83/q98/q99 were value-identical but
hash-red because DuckDB sum(BIGINT) returns HUGEINT while Spark writes
BIGINT):
  1. Column NAMES must match after sorting.
  2. Column DTYPE KINDS must match (int vs float vs object vs bool vs
     datetime). DuckDB HUGEINT surfaces as float64/object in pandas, so a
     dtype-kind mismatch is exactly the class the old tolerance hid.
  3. Cell values must be EXACTLY equal — no float tolerance. A row set
     that only matches under 1e-9 tolerance prints a WARN and FAILs,
     because the driver's typed hash would reject it.
A typed row-hash (sha256 over sorted rows of `repr`-ed typed values) is
printed per query so two runs can be diffed without the full dump.
"""
import hashlib, json, math, subprocess, sys
import duckdb

args = []
only = None
run = False
json_out = None
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
    elif a.startswith("--json="):  # driver-style per-query artifact
        json_out = a.split("=", 1)[1]
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

def kind(dtype):
    """Collapse a pandas dtype to the kind the driver's typed hash sees."""
    k = dtype.kind  # i/u int, f float, b bool, M datetime, O object, ...
    return {"u": "i"}.get(k, k)

def typed_hash(df):
    h = hashlib.sha256()
    for row in df.itertuples(index=False, name=None):
        h.update(repr(row).encode())
        h.update(b"\n")
    return h.hexdigest()[:16]

def cells_exact(a, b):
    """Exact typed equality — what the driver's hash enforces."""
    a_nan = isinstance(a, float) and math.isnan(a)
    b_nan = isinstance(b, float) and math.isnan(b)
    if (a is None or a_nan) and (b is None or b_nan):
        return True
    if (a is None or a_nan) or (b is None or b_nan):
        return False
    if isinstance(a, float) and isinstance(b, float):
        return a == b
    if type(a) is not type(b):
        # numpy vs python scalars of the same kind are fine; int vs float is not
        af, bf = isinstance(a, (int,)) or "int" in type(a).__name__, \
                 isinstance(b, (int,)) or "int" in type(b).__name__
        if af != bf and ("float" in type(a).__name__ or isinstance(a, float)
                         or "float" in type(b).__name__ or isinstance(b, float)):
            return False
    return str(a) == str(b)

def cells_loose(a, b):
    """The old tolerant compare — used only to diagnose, never to pass."""
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
        try:
            if a is None and isinstance(b, float) and math.isnan(b): return True
            if b is None and isinstance(a, float) and math.isnan(a): return True
        except TypeError:
            pass
        return False
    return str(a) == str(b)

fails = 0
warn_loose = []
results = {}
def record(name, rows_match, schema_match, hash_match,
           spark_rows=None, oracle_rows=None, err=None):
    results[name] = {"rows_match": rows_match, "schema_match": schema_match,
                     "hash_match": hash_match, "spark_rows": spark_rows,
                     "oracle_rows": oracle_rows}
    if err:
        results[name]["err"] = err
for name, sql in sorted(oracle.items()):
    try:
        expect = norm(con.execute(sql).fetchdf())
        got = norm(con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf())
    except Exception as e:
        print(f"FAIL {name}: {e}")
        record(name, None, None, None, err=str(e)[:200])
        fails += 1
        continue
    if list(expect.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(expect.columns)}")
        record(name, len(expect) == len(got), False, False,
               len(got), len(expect))
        fails += 1
        continue
    if len(expect) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(expect)}")
        record(name, False, True, False, len(got), len(expect))
        fails += 1
        continue
    # Dtype-kind gate: catches HUGEINT (float64/object) vs BIGINT (int64)
    # even when every printed value matches.
    dt_bad = [(c, str(expect[c].dtype), str(got[c].dtype))
              for c in expect.columns
              if kind(expect[c].dtype) != kind(got[c].dtype)]
    if dt_bad:
        print(f"FAIL {name}: dtype kind mismatch (oracle vs spark): {dt_bad}")
        record(name, True, False, False, len(got), len(expect))
        fails += 1
        continue
    bad = []
    loose_only = []
    for i in range(len(expect)):
        for c in expect.columns:
            a, b = expect[c].iloc[i], got[c].iloc[i]
            if not cells_exact(a, b):
                if cells_loose(a, b):
                    loose_only.append((i, c, a, b))
                else:
                    bad.append((i, c, a, b))
    if bad or loose_only:
        detail = []
        if bad:
            detail.append(f"{len(bad)} hard diffs, first: {bad[:3]}")
        if loose_only:
            detail.append(f"{len(loose_only)} tolerance-only diffs "
                          f"(WOULD FAIL DRIVER HASH), first: {loose_only[:3]}")
            warn_loose.append(name)
        print(f"FAIL {name}: " + "; ".join(detail))
        record(name, True, True, False, len(got), len(expect))
        fails += 1
    else:
        print(f"PASS {name} ({len(expect)} rows, exact, "
              f"hash {typed_hash(got)})")
        record(name, True, True, True, len(got), len(expect))
if json_out:
    with open(json_out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {json_out}")
if warn_loose:
    print(f"\nWARN: {len(warn_loose)} queries pass only under float "
          f"tolerance and would be red at the driver: {warn_loose}")
print(f"\n{len(oracle) - fails}/{len(oracle)} oracle queries pass (driver-exact)")
sys.exit(1 if fails else 0)
