#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfdir> <outdir> [query ...]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran (or run with
--run to invoke it). Compares each <outdir>/<name> parquet against the oracle
SQL in <outdir>/oracle_sql.json executed by DuckDB over the same sf tables:
columns sorted by name, rows sorted, exact value equality.
"""
import json, sys, subprocess, glob, os

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    args = [a for a in sys.argv[1:] if a != "--run" and not a.startswith("--exclude")]
    run = "--run" in sys.argv
    # --exclude=a,b,c — drop queries from the sweep (the negts.py slice
    # uses this for the watermark-bound streaming set; see tools/negts.py)
    excl = set()
    for a in sys.argv[1:]:
        if a.startswith("--exclude="):
            excl.update(a.split("=", 1)[1].split(","))
    sfdir, outdir = args[0], args[1]
    only = set(args[2:])
    if run:
        subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
                       check=True, cwd="/root/repo")
    import duckdb, pandas as pd
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if (only and name not in only) or name in excl:
            continue
        res_dir = f"{outdir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result at {res_dir}")
            n_fail += 1
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        def norm(df):
            df = df[sorted(df.columns)]
            return df.sort_values(by=list(df.columns)).reset_index(drop=True)
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        if not s.equals(d):
            # dtype-tolerant comparison fallback
            diff_cols = [c for c in s.columns if not s[c].equals(d[c])]
            really = []
            for c in diff_cols:
                try:
                    if (s[c].astype("object") == d[c].astype("object")).all():
                        continue
                except Exception:
                    pass
                really.append(c)
            if really:
                print(f"FAIL {name}: value mismatch in {really}")
                for c in really[:2]:
                    mask = ~(s[c].astype("object") == d[c].astype("object"))
                    print("  spark:", s[mask].head(3).to_dict("records"))
                    print("  duck :", d[mask].head(3).to_dict("records"))
                n_fail += 1
                continue
            dts = {c: (str(s[c].dtype), str(d[c].dtype)) for c in diff_cols}
            print(f"PASS {name} ({len(s)} rows) [dtype diff: {dts}]")
            n_pass += 1
            continue
        print(f"PASS {name} ({len(s)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
