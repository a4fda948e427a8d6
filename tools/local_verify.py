#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify.scala's
parquet dumps + oracle_sql.json, run each oracle in DuckDB against the
same test tables, compare schema + sorted values exactly.

Usage: python3 tools/local_verify.py [sfdir] [outdir]
(run `sbt "runMain graft.Verify <sfdir> <outdir>"` first)
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# Verify.scala's failure manifest: any query that threw is a hard FAIL
# here even though it has no output dir (r13: 20 silent absences read
# as all-green); the expected/dumped counts also gate coverage shrinkage
try:
    errs = json.load(open(f"{outdir}/errors.json"))
    man = json.load(open(f"{outdir}/manifest.json"))
except FileNotFoundError:
    errs, man = {}, None
for k, v in sorted(errs.items()):
    print(f"FAIL {k}: query threw: {v[:160]}")
if man:
    print(f"manifest: expected={man['expected']} dumped={man['dumped']} failed={man['failed']}")
# dev knob mirroring Verify.scala's SPARK_GRAFT_ONLY subset dumps
only = os.environ.get("SPARK_GRAFT_ONLY")
if only:
    keep = {k.strip() for k in only.split(",")}
    oracle = {k: v for k, v in oracle.items() if k in keep}
ok = fail = 0
for name, sql in sorted(oracle.items()):
    if name in errs:
        continue  # already a hard FAIL via the errors.json count below
    pdir = f"{outdir}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output dir"); fail += 1; continue
    try:
        spark_df = con.sql(f"SELECT * FROM read_parquet('{pdir}/*.parquet')").df()
        duck_df = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        print(f"FAIL {name}: columns spark={sc} duck={dc}"); fail += 1; continue
    # the driver's hash is dtype-sensitive: an uncast DuckDB HUGEINT /
    # DECIMAL aggregate surfaces as float64 against Spark's int64 and
    # fails the gate even when values are equal (r10 t21). Catch both
    # the declared-type leak and any dtype-kind divergence here.
    rel = con.sql(sql)
    leaks = [f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
             if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()]
    if leaks:
        print(f"FAIL {name}: oracle emits HUGEINT/DECIMAL (cast to BIGINT/DOUBLE): {leaks}")
        fail += 1; continue
    kind_mismatch = [f"{c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype}"
                     for c in sc if spark_df[c].dtype.kind != duck_df[c].dtype.kind]
    if kind_mismatch:
        print(f"FAIL {name}: dtype kind mismatch {kind_mismatch}"); fail += 1; continue
    s = spark_df[sc].sort_values(sc).reset_index(drop=True)
    d = duck_df[dc].sort_values(dc).reset_index(drop=True)
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); fail += 1; continue
    # exact value compare (driver hashes values; emulate with exact match)
    try:
        mismatch = None
        for c in sc:
            a, b = s[c], d[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                neq = ~((a.isna() & b.isna()) | (a == b))
            else:
                neq = ~((a.isna() & b.isna()) | (a.astype(object) == b.astype(object)))
            if neq.any():
                i = neq.idxmax()
                mismatch = f"col {c} row {i}: spark={a[i]!r} duck={b[i]!r}"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}"); fail += 1
        else:
            print(f"OK   {name} ({len(s)} rows)"); ok += 1
    except Exception as e:
        print(f"FAIL {name}: compare error {e}"); fail += 1

# queries without oracle: rows-only
for pdir in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(pdir.rstrip('/'))
    if name in oracle: continue
    try:
        df = con.sql(f"SELECT * FROM read_parquet('{pdir}/*.parquet')").df()
        n = len(df)
        # the driver sorts rows-only outputs too — reproduce its crash
        # on unhashable (ndarray) cells so it can't ship again (r10 a14/t22)
        df.sort_values(list(df.columns))
        print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    except Exception as e:
        print(f"ROWS {name}: read/sort error {e}"); fail += 1

fail += len(errs)
# enforce the manifest, don't just print it: a reused outdir with stale
# dirs (or dumps missing without an errors.json entry) must fail the gate
if man:
    actual_dirs = len(glob.glob(f"{outdir}/*/"))
    if actual_dirs != man['dumped']:
        print(f"FAIL manifest: dumped={man['dumped']} but {actual_dirs} output dirs found")
        fail += 1
print(f"\n{ok} OK, {fail} FAIL")
sys.exit(1 if fail else 0)
