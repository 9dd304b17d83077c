#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/prevalidate.py <sfDir> <verifyOutDir> [query ...]

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB (tables = <sfDir>/*.parquet),
sorts columns by name, and compares values exactly (row order must
match too, since every query has a total ORDER BY).
"""
import json, sys, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # list-valued cells (numpy arrays / lists) -> tuples for comparison
    if hasattr(v, "tolist"):
        return tuple(norm_cell(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            duck_rel = con.sql(sql)
            status, detail = wide_decimal_check(spark_rel, duck_rel)
            if status is None:
                spark_df = spark_rel.df()
                duck_df = duck_rel.df()
                spark_df = spark_df[sorted(spark_df.columns)]
                duck_df = duck_df[sorted(duck_df.columns)]
                status, detail = compare(spark_df, duck_df)
        except Exception as e:
            status, detail = "ERROR", str(e).split("\n")[0][:300]
        if status == "PASS":
            n_pass += 1
            print(f"PASS {name} rows={len(spark_df)}")
        else:
            n_fail += 1
            print(f"FAIL {name}: {status} {detail}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

def wide_decimal_check(spark_rel, duck_rel):
    """HARD GATE: no DECIMAL column of ANY precision may reach the
    external gate. The driver's hash canonicalizes trailing zeros of
    decimal renderings on one side only (VERDICT r13: 9/9 wide-decimal
    discriminator; VERDICT r17: the same trap bites at DECIMAL(18,2) —
    q247/q249 failed hash with exactly-equal values because one cell's
    rendering ended in a zero at its scale), so a DECIMAL output column
    is a LATENT hash failure even when every value matches locally.
    Emit exact integers as BIGINT (micros/cents) or O(1) ratios as
    DOUBLE. Checked on the DECLARED relation types (this duckdb's
    .df() converts decimals to float64, hiding the class from value
    compare).
    """
    for side, rel in (("spark", spark_rel), ("duck", duck_rel)):
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ)
            if t.startswith("DECIMAL"):
                return "DECIMAL", (f"side={side} col={col} type={t}: DECIMAL "
                                   "column in a gated output (emit BIGINT/DOUBLE)")
    return None, None

def compare(a, b):
    if list(a.columns) != list(b.columns):
        return "COLS", f"spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return "NROWS", f"spark={len(a)} duck={len(b)}"
    for col in a.columns:
        av, bv = list(a[col]), list(b[col])
        for i, (x, y) in enumerate(zip(av, bv)):
            x, y = norm_cell(x), norm_cell(y)
            # None, float NaN and pandas NaT are all "null" (x != x);
            # normed tuples never contain raw NaN (norm_cell strings it)
            xn = x is None or (not isinstance(x, tuple) and x != x)
            yn = y is None or (not isinstance(y, tuple) and y != y)
            if xn and yn:
                continue
            if xn != yn or (not xn and x != y):
                return "VALUE", f"col={col} row={i} spark={x!r} duck={y!r}"
    # dtype sanity (loose: both numeric-int, both float, etc.)
    for col in a.columns:
        ka, kb = a[col].dtype.kind, b[col].dtype.kind
        if ka != kb and {ka, kb} not in ({"i", "O"}, {"M", "O"}):
            return "DTYPE", f"col={col} spark={a[col].dtype} duck={b[col].dtype}"
    return "PASS", ""

if __name__ == "__main__":
    main()
