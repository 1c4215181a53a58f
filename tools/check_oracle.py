#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py [sf_dir[,sf_dir2,...]] [out_dir]
           [--skip-verify] [--only=q1,q2,...]

Runs graft.Verify (unless --skip-verify), then for each query parquet in
out_dir, runs the matching oracle SQL in DuckDB (tables registered as
views over sf_dir/*.parquet) and compares: row count, column names
(sorted), and values (column-sorted, row-order as produced).

THE GATE IS THREE SCALE FACTORS, not one: pass a comma-separated sf_dir
list (each gets its own out_dir suffix) —

    python3 tools/check_oracle.py \\
        /root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1

The sf0.001 leg is NOT redundant with the bigger ones: scale-DOWN
robustness catches a different bug class (round 7's q32b value-vs-rank
sketch bound only failed there, where sketches are exact and tiny-corpus
edge cases bind). Run all three before claiming a round green.
"""
import glob
import json
import os
import subprocess
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_verify(sf_dir, out_dir, only=()):
    names = " " + " ".join(only) if only else ""
    cmd = ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}{names}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    sys.stdout.write("\n".join(l for l in r.stdout.splitlines()
                               if "error" in l.lower() or "failed" in l.lower()) + "\n")
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-2000:])
        sys.exit(1)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for robust compare (mimics a value-hash)
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        if col.dtype == object and len(col) and isinstance(col.iloc[0], (list,)):
            out[c] = col.apply(lambda v: json.dumps(list(v)))
        else:
            out[c] = col.astype(str)
    return out


def check_one(sf_dir, out_dir, only=()):
    if "--skip-verify" not in sys.argv:
        run_verify(sf_dir, out_dir, only)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    qdirs = sorted(d for d in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(d))
    if only:
        qdirs = [d for d in qdirs if os.path.basename(d) in only]
    n_pass = n_fail = n_nosql = 0
    for qd in qdirs:
        name = os.path.basename(qd)
        files = glob.glob(os.path.join(qd, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no parquet output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            # an EMPTY rows-only output means the approximate query broke
            # entirely — count it as a failure, not a weak pass
            if len(got) > 0:
                print(f"ROWS-ONLY  {name}: rows={len(got)}")
                n_nosql += 1
            else:
                print(f"FAIL  {name}: rows-only query returned 0 rows")
                n_fail += 1
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns differ: spark={list(g.columns)} oracle={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows differ: spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        neq = (g.values != e.values)
        if neq.any():
            idx = list(zip(*neq.nonzero()))[:5]
            print(f"FAIL  {name}: {neq.sum()} cell mismatches; first: ")
            for (i, j) in idx:
                print(f"        row {i} col {g.columns[j]}: spark={g.iloc[i, j]!r} oracle={e.iloc[i, j]!r}")
            n_fail += 1
            continue
        print(f"PASS  {name}: rows={len(g)}")
        n_pass += 1
    print(f"\n[{sf_dir}] {n_pass} pass, {n_fail} fail, {n_nosql} rows-only")
    return n_fail


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only = ()
    for a in sys.argv[1:]:
        # --only q110_adc_refine,q112_dsir_weights : run and compare just
        # these queries (dev iteration on a new oracle without the
        # ~10-min full sweep)
        if a.startswith("--only="):
            only = tuple(a[len("--only="):].split(","))
    sf_dirs = (args[0] if args else "/root/testdata/sf0.01").split(",")
    out_base = args[1] if len(args) > 1 else "/tmp/verify_out"
    total_fail = 0
    for sf_dir in sf_dirs:
        out_dir = out_base if len(sf_dirs) == 1 \
            else out_base + "_" + os.path.basename(sf_dir.rstrip("/"))
        total_fail += check_one(sf_dir, out_dir, only)
    sys.exit(1 if total_fail else 0)


if __name__ == "__main__":
    main()
