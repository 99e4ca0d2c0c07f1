#!/usr/bin/env python3
"""Self-test for check_oracle.py's dtype gates (round-9 lesson, q283).

Injects deliberately bad oracle queries in every output shape that has
bitten a round — plain SELECT, aggregate, and UNION ALL (the shape whose
DBAPI cursor description degrades to NUMBER and blinded the round-9
probe) — and asserts the checker FAILs each, plus a good case PASSes.

Usage: python3 tools/check_oracle_selftest.py   (exit 0 = all good)
"""
import json, os, shutil, sys, tempfile
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_oracle

CASES = {
    # name -> (spark_side_sql (written to parquet), oracle_sql, expect_pass)
    "good_int": (
        "SELECT CAST(1 AS BIGINT) AS a, 'x' AS b",
        "SELECT CAST(1 AS BIGINT) AS a, 'x' AS b", True),
    "good_union": (
        "SELECT CAST(1 AS BIGINT) AS a UNION ALL SELECT CAST(2 AS BIGINT)",
        "SELECT CAST(1 AS BIGINT) AS a UNION ALL SELECT CAST(2 AS BIGINT)", True),
    "hugeint_plain": (
        "SELECT CAST(7 AS BIGINT) AS s",
        "SELECT SUM(x) AS s FROM (SELECT CAST(7 AS BIGINT) AS x)", False),
    "hugeint_union": (
        "SELECT CAST(1 AS BIGINT) AS s UNION ALL SELECT CAST(2 AS BIGINT)",
        "SELECT SUM(x) AS s FROM (SELECT CAST(1 AS BIGINT) AS x) "
        "UNION ALL SELECT SUM(x) FROM (SELECT CAST(2 AS BIGINT) AS x)", False),
    "decimal_plain": (
        "SELECT CAST(3 AS BIGINT) AS d",
        "SELECT CAST(3 AS DECIMAL(38,0)) AS d", False),
    "decimal_union": (
        "SELECT CAST(3 AS BIGINT) AS d UNION ALL SELECT CAST(4 AS BIGINT)",
        "SELECT CAST(3 AS DECIMAL(38,0)) AS d "
        "UNION ALL SELECT CAST(4 AS DECIMAL(38,0))", False),
    "list_plain": (
        "SELECT 1 AS i",
        "SELECT [1, 2] AS i", False),
    "list_union": (
        "SELECT 1 AS i UNION ALL SELECT 2",
        "SELECT [1] AS i UNION ALL SELECT [2]", False),
    "int_vs_float": (
        "SELECT CAST(1 AS BIGINT) AS f",
        "SELECT CAST(1 AS DOUBLE) AS f", False),
    "spark_side_decimal": (
        "SELECT CAST(5 AS DECIMAL(38,0)) AS d",
        "SELECT CAST(5 AS BIGINT) AS d", False),
    "value_mismatch": (
        "SELECT CAST(1 AS BIGINT) AS a",
        "SELECT CAST(2 AS BIGINT) AS a", False),
}

def main():
    tmp = tempfile.mkdtemp(prefix="oracle_selftest_")
    sf = os.path.join(tmp, "sf"); out = os.path.join(tmp, "out")
    os.makedirs(sf); os.makedirs(out)
    con = duckdb.connect()
    # checker requires the fixture tables to exist as views
    for t in check_oracle.TABLES:
        con.execute(f"COPY (SELECT 1 AS one) TO '{sf}/{t}.parquet' (FORMAT PARQUET)")
    oracle = {}
    for name, (spark_sql, oracle_sql, _) in CASES.items():
        qd = os.path.join(out, name); os.makedirs(qd)
        con.execute(f"COPY ({spark_sql}) TO '{qd}/part-0.parquet' (FORMAT PARQUET)")
        oracle[name] = oracle_sql
    json.dump(oracle, open(os.path.join(out, "oracle_sql.json"), "w"))

    con2 = duckdb.connect()
    for t in check_oracle.TABLES:
        con2.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = []
    for name, (_, sql, expect_pass) in CASES.items():
        import glob
        files = glob.glob(f"{out}/{name}/*.parquet")
        ok, msg = check_oracle.check_one(con2, name, files, sql)
        verdict = "ok" if ok == expect_pass else "WRONG"
        print(f"{verdict:5s} {name}: checker={'PASS' if ok else 'FAIL'} "
              f"expected={'PASS' if expect_pass else 'FAIL'} ({msg})")
        if ok != expect_pass:
            bad.append(name)
    shutil.rmtree(tmp)
    if bad:
        print(f"SELFTEST FAIL: {bad}"); return 1
    print("SELFTEST PASS: every injected dtype leak caught, good cases pass")
    return 0

if __name__ == "__main__":
    sys.exit(main())
