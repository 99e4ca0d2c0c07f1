#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: register the sfDir parquet tables as
DuckDB views, run the oracle SQL, load the Spark parquet result, sort columns
by name and rows by value, and compare cell-by-cell EXACTLY (floats included:
the engine contract is bit-identical floats via decimal/integer arithmetic,
so any difference is a real defect). Float mismatches are labeled near-miss
when within 1e-9 relative, to distinguish ulp drift from logic errors.

Dtype gates (round-9 lesson: q283, after round-8's q261/q262/q264):
 1. DESCRIBE-based logical-type probe on BOTH sides. The DBAPI cursor
    description degrades UNION ALL-shaped outputs to the generic NUMBER
    (exactly how q283's HUGEINT slipped past round 9's description-based
    probe), but `DESCRIBE <sql>` reports the true types for every shape.
 2. Pandas-path simulation of the driver's actual hash route: the Spark
    side read via pyarrow/pandas, the oracle side via duckdb's .df(),
    then the per-column pandas dtype CLASSES compared. This is the layer
    where HUGEINT becomes float64 against Spark's int64 — simulating it
    directly means any future duckdb/pandas rendering quirk fails here
    even if the DESCRIBE probe has a blind spot of its own.
"""
import json, sys, glob, math
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t)), [cols[i] for i in idx]

def tclass(t):
    """Coarse class of a DuckDB logical type (from DESCRIBE)."""
    t = str(t).upper()
    if "HUGEINT" in t: return "hugeint"
    if "DECIMAL" in t: return "decimal"
    if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST", "UNION")):
        return "nested"
    if any(k in t for k in ("TINYINT","SMALLINT","INTEGER","BIGINT")): return "int"
    if any(k in t for k in ("FLOAT","DOUBLE","REAL")): return "float"
    if "BOOL" in t: return "bool"
    if any(k in t for k in ("TIMESTAMP","DATE","TIME")): return "time"
    return "other"

def pclass(dt):
    """Coarse class of a pandas dtype (the driver's hash substrate)."""
    s = str(dt)
    if s.startswith(("int", "uint", "Int", "UInt")): return "int"
    if s.startswith(("float", "Float")): return "float"
    if s.startswith(("bool", "boolean")): return "bool"
    if s.startswith(("datetime", "timedelta")): return "time"
    return "object"

def describe_types(con, sql):
    return {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}

def check_one(con, name, files, sql):
    """Returns (ok: bool, message: str)."""
    spark_sql = f"SELECT * FROM read_parquet({files!r})"
    try:
        gtypes = describe_types(con, spark_sql)
        etypes = describe_types(con, sql)
    except Exception as e:
        return False, f"DESCRIBE failed: {e}"
    # Gate 1a: driver-unhashable logical types on EITHER side. The driver
    # hashes through pandas, which (a) renders DuckDB HUGEINT/DECIMAL as
    # float64 while Spark-side int64/Decimal stays — hash mismatch even
    # when values are identical — and (b) crashes sort_values on
    # array/struct/map cells (unhashable numpy.ndarray).
    why = {"hugeint": "pandas renders float64 (Spark side stays int64)",
           "decimal": "pandas renders float64 one side only",
           "nested": "pandas sort_values crashes on unhashable cells"}
    ubad = [(side, c, why[tclass(t)])
            for side, types in (("spark", gtypes), ("oracle", etypes))
            for c, t in types.items() if tclass(t) in why]
    if ubad:
        return False, ("driver-unhashable dtype: "
                       + ", ".join(f"{side}:{c} is {w}" for side, c, w in ubad))
    # Gate 1b: type-class drift between the sides (int vs float etc).
    tbad = [(c, tclass(gtypes[c]), tclass(etypes[c]))
            for c in etypes if c in gtypes and tclass(gtypes[c]) != tclass(etypes[c])]
    if tbad:
        return False, ("dtype drift (driver pandas hash would differ): "
                       + ", ".join(f"{c} spark={a} oracle={b}" for c, a, b in tbad))
    # Gate 2: simulate the driver's pandas hash path dtype-for-dtype —
    # both sides through duckdb's .df() rendering (the round-9 board
    # evidence pins this as the driver's substrate: DATE columns pass the
    # driver, which rules out a pyarrow-read spark side where date32
    # becomes object against duckdb's datetime64). With identical
    # renderers, any dtype divergence left is a genuine logical-type
    # difference — HUGEINT→float64 against parquet int64 (q283's class)
    # shows up here even if the DESCRIBE probe grows a blind spot.
    try:
        gdf = con.execute(spark_sql).df()
        edf = con.execute(sql).df()
    except Exception as e:
        return False, f"pandas-path load failed: {e}"
    if sorted(gdf.columns) != sorted(edf.columns):
        return False, f"cols spark={sorted(gdf.columns)} oracle={sorted(edf.columns)}"
    pbad = [(c, str(gdf[c].dtype), str(edf[c].dtype))
            for c in sorted(edf.columns)
            if pclass(gdf[c].dtype) != pclass(edf[c].dtype)]
    if pbad:
        return False, ("pandas dtype drift (driver hash substrate): "
                       + ", ".join(f"{c} spark={a} oracle={b}" for c, a, b in pbad))
    # Gate 3: exact cell-by-cell value compare (via DBAPI fetch, which
    # normalizes hugeint-free scalars losslessly).
    cur = con.execute(spark_sql)
    gcols = [d[0] for d in cur.description]; got = cur.fetchall()
    cur = con.execute(sql)
    ecols = [d[0] for d in cur.description]; exp = cur.fetchall()
    g, gc = canon(got, gcols)
    e, ec = canon(exp, ecols)
    if gc != ec:
        return False, f"cols spark={gc} oracle={ec}"
    if len(g) != len(e):
        return False, f"rows spark={len(g)} oracle={len(e)}"
    for i, (rg, re_) in enumerate(zip(g, e)):
        for j, (a, b) in enumerate(zip(rg, re_)):
            if a == b: continue
            if isinstance(a, float) and isinstance(b, float):
                if (math.isnan(a) and math.isnan(b)) or a == b: continue
                near = abs(a - b) <= 1e-9 * max(abs(a), abs(b), 1.0)
                lbl = "float-NEAR-MISS (ulp drift)" if near else "float-mismatch"
                return False, f"row {i} col {ec[j]}: spark={a!r} oracle={b!r} ({lbl})"
            return False, f"row {i} col {ec[j]}: spark={a!r} oracle={b!r} (mismatch)"
    return True, f"{len(g)} rows"

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            ok, msg = check_one(con, name, files, oracle[name])
        except Exception as e:
            ok, msg = False, f"checker error: {e}"
        if ok:
            print(f"PASS {name} ({msg})"); n_pass += 1
        else:
            print(f"FAIL {name}: {msg}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
