#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<name> parquet (Spark result) and runs the
matching SQL from oracle_sql.json in DuckDB over <sfDir>'s tables;
compares after sorting columns by name and rows by all columns.
"""
import sys, json, glob, os, re
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("float64") if df[c].isna().any() else df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def run_scripted(con, spec):
    """Execute a graft.ScriptedOracle recipe: setup temp tables, then
    per-round statements with {r}/{p} substituted until the stop probe
    reads 0 (fixpoint) or max_rounds is spent, then the final SELECT
    with {r} = last executed round and {used} = rounds whose stop was
    nonzero. Mirrors the contract documented in ScriptedOracle.scala;
    temp tables are dropped afterwards so recipes can't collide."""
    created = []
    def ex(sql):
        m = re.match(r"\s*CREATE TEMP TABLE (\w+)", sql, re.I)
        if m:
            created.append(m.group(1))
        con.execute(sql)
    try:
        for s in spec["setup"]:
            ex(s)
        used, last = 0, 0
        for r in range(1, spec["max_rounds"] + 1):
            sub = lambda s: s.replace("{r}", str(r)).replace("{p}", str(r - 1))
            for s in spec["round"]:
                ex(sub(s))
            last = r
            if con.execute(sub(spec["stop"])).fetchone()[0] == 0:
                break
            used += 1
        else:
            if spec.get("require_fixpoint"):
                raise RuntimeError(
                    f"no fixpoint within {spec['max_rounds']} rounds "
                    "(exact-semantics oracle would be silently wrong)")
        fin = spec["final"].replace("{r}", str(last)).replace("{used}", str(used))
        return con.sql(fin).df()
    finally:
        for t in reversed(created):
            con.execute(f"DROP TABLE IF EXISTS {t}")

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    # ORACLE_SCRIPTED=1: for queries carrying a ScriptedOracle recipe
    # (oracle_scripted.json, dumped by graft.Verify), run the iterative
    # temp-table form instead of the single-statement SQL — the
    # bench-scale (sf0.1) path for the heavy transitive closures. The
    # default stays the plain SQL: that is what the driver's own gate
    # executes, so local runs mirror it unless explicitly asked.
    scripted = {}
    if os.environ.get("ORACLE_SCRIPTED", "") not in ("", "0"):
        spath = f"{out}/oracle_scripted.json"
        if os.path.exists(spath):
            scripted = json.load(open(spath))
    # ORACLE_SKIP=a,b,c — skip named queries. For big-SF local runs
    # where an oracle formulation is intractable in DuckDB (e.g.
    # dedup_clusters' recursive transitive closure is quadratic in
    # component size); the driver's gate runs at sf0.01 where all pass.
    skip = set(filter(None, os.environ.get("ORACLE_SKIP", "").split(",")))
    # ORACLE_STRICT=1 (set by verify-many.sh / CI-like wrappers): any
    # skip is a failure — a stale exported ORACLE_SKIP must not be able
    # to produce a silently-weakened green.
    strict = os.environ.get("ORACLE_STRICT", "") not in ("", "0")
    unknown = skip - set(oracle)
    if unknown:
        print(f"WARN ORACLE_SKIP names unknown queries: {sorted(unknown)}")
    n_ok = n_bad = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name} (ORACLE_SKIP)"); n_skip += 1; continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            raw = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            if name in scripted:
                exp_raw = run_scripted(con, scripted[name])
            else:
                rel = con.sql(sql)
                # Driver-divergence lint: the driver's pandas-based checker
                # materializes HUGEINT (bare integer SUM) as float64 -> hash
                # mismatch vs Spark int64, and dies sorting list-typed
                # columns. Both are local-green/driver-red classes (round 1)
                # — make them hard failures here.
                bad_types = [f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
                             if t in ("HUGEINT", "UHUGEINT") or "[]" in t or t.startswith("DECIMAL")]
                if bad_types:
                    print(f"FAIL {name}: driver-unsafe oracle column types {bad_types} "
                          f"(CAST sums to BIGINT / stringify arrays)")
                    n_bad += 1; continue
                exp_raw = rel.df()
            # schema-level check (not value-level: first row may be NULL
            # and a 0-row local result can be >0 rows at driver scale)
            import pyarrow.parquet as pq
            arr_cols = [f.name for f in pq.read_schema(sorted(files)[0])
                        if "list" in str(f.type) or "struct" in str(f.type)]
            if arr_cols:
                print(f"FAIL {name}: spark output has array-typed columns {arr_cols} "
                      f"(driver checker cannot sort these)")
                n_bad += 1; continue
            got = norm(raw)
            exp = norm(exp_raw)
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(exp.columns)}")
            n_bad += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}"); n_bad += 1; continue
        diff_cols = []
        for c in got.columns:
            a, b = got[c], exp[c]
            if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                eq = ((a.isna() & b.isna()) | (a == b)).all()
            else:
                eq = a.equals(b)
            if not eq:
                diff_cols.append(c)
        if diff_cols:
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:2]:
                m = ~(((got[c].isna()) & (exp[c].isna())) | (got[c] == exp[c]))
                idx = m[m].index[:3]
                for i in idx:
                    print(f"   row {i} col {c}: spark={got[c][i]!r} duck={exp[c][i]!r}")
            n_bad += 1
        else:
            tag = ", scripted" if name in scripted else ""
            print(f"OK   {name} ({len(got)} rows{tag})"); n_ok += 1
    # queries with no oracle entry
    print(f"\n{n_ok} ok, {n_bad} bad, {n_skip} skipped, "
          f"{len(oracle)} total with oracle")
    if n_skip and strict:
        print(f"FAIL strict mode: {n_skip} queries skipped via "
              f"ORACLE_SKIP={os.environ.get('ORACLE_SKIP')}")
        sys.exit(1)
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
