#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: register the sfDir parquet tables as
DuckDB views, run the oracle SQL, load the Spark parquet result, sort columns
by name and rows by value, and compare cell-by-cell EXACTLY (floats included:
the engine contract is bit-identical floats via decimal/integer arithmetic,
so any difference is a real defect). Float mismatches are labeled near-miss
when within 1e-9 relative, to distinguish ulp drift from logic errors.
"""
import json, sys, glob, math
import duckdb

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t)), [cols[i] for i in idx]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            cur = con.execute(f"SELECT * FROM read_parquet({files!r})")
            gdesc = list(cur.description); got = cur.fetchall()
            gcols = [d[0] for d in gdesc]
            cur = con.execute(oracle[name])
            edesc = list(cur.description); exp = cur.fetchall()
            ecols = [d[0] for d in edesc]
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        # Driver parity: its compare goes through pandas, where DuckDB
        # HUGEINT (SUM/list_sum over BIGINT) becomes float64 and no longer
        # string-matches Spark's int64. fetchall() hides that (hugeint->int),
        # so flag type-class drift from the cursor descriptions directly.
        def tclass(t):
            t = str(t).upper()
            if "HUGEINT" in t: return "hugeint"
            if any(k in t for k in ("TINYINT","SMALLINT","INTEGER","BIGINT")): return "int"
            if any(k in t for k in ("FLOAT","DOUBLE","DECIMAL")): return "float"
            return "other"
        gtypes = {d[0]: tclass(d[1]) for d in gdesc}
        etypes = {d[0]: tclass(d[1]) for d in edesc}
        tbad = [(c, gtypes.get(c), etypes.get(c)) for c in etypes
                if etypes[c] == "hugeint" or (c in gtypes and gtypes[c] != etypes[c]
                   and {"int", "float"} == {gtypes[c], etypes[c]})]
        if tbad:
            print(f"FAIL {name}: dtype drift (driver pandas hash would differ): "
                  + ", ".join(f"{c} spark={a} oracle={b}" for c, a, b in tbad))
            n_fail += 1; continue
        # Driver parity, part 2 (round-8 lesson: q261/q262/q264). The
        # driver hashes through pandas, which (a) renders DuckDB DECIMAL
        # as float64 while Spark parquet decimal stays Decimal objects —
        # hash mismatch even when values are identical — and (b) crashes
        # sort_values on array/struct/map cells (unhashable numpy.ndarray).
        # Any such column on EITHER side is a gate defect here, even if
        # the local cell-by-cell compare would pass.
        def unhashable(t):
            t = str(t).upper()
            if "DECIMAL" in t: return "decimal (pandas renders float64 one side only)"
            if "HUGEINT" in t: return "hugeint (pandas renders float64)"
            if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST", "UNION")):
                return "nested (pandas sort_values crashes)"
            return None
        ubad = [(side, d[0], why) for side, desc in (("spark", gdesc), ("oracle", edesc))
                for d in desc for why in [unhashable(d[1])] if why]
        if ubad:
            print(f"FAIL {name}: driver-unhashable dtype: "
                  + ", ".join(f"{side}:{c} is {why}" for side, c, why in ubad))
            n_fail += 1; continue
        g, gc = canon(got, gcols)
        e, ec = canon(exp, ecols)
        if gc != ec:
            print(f"FAIL {name}: cols spark={gc} oracle={ec}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}"); n_fail += 1; continue
        bad = None
        for i, (rg, re_) in enumerate(zip(g, e)):
            for j, (a, b) in enumerate(zip(rg, re_)):
                if a == b: continue
                if isinstance(a, float) and isinstance(b, float):
                    if (math.isnan(a) and math.isnan(b)) or a == b: continue
                    near = abs(a - b) <= 1e-9 * max(abs(a), abs(b), 1.0)
                    bad = (i, ec[j], a, b,
                           "float-NEAR-MISS (ulp drift)" if near else "float-mismatch"); break
                bad = (i, ec[j], a, b, "mismatch"); break
            if bad: break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r} ({bad[4]})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
