#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output) and runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
named after the parquet tables in <sfDir>. Reports per-query row-count,
schema (sorted column names), and value match, both order-sensitive and
order-insensitive.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                results[name] = "MISSING_SPARK_OUTPUT"; continue
            spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            scols = sorted(spark_rel.columns)
            sproj = con.sql(f"SELECT {', '.join(scols)} FROM read_parquet({files!r})")
            sdata = sproj.fetchall()
            duck_rel = con.sql(sql)
            dcols = sorted(duck_rel.columns)
            # re-project duckdb result to sorted column order
            dproj = con.sql(f"SELECT {', '.join(dcols)} FROM ({sql})")
            ddata = dproj.fetchall()
            if scols != dcols:
                results[name] = f"SCHEMA_MISMATCH spark={scols} duck={dcols}"; continue
            # The driver's hasher is TYPE-sensitive (q52 round-5 postmortem:
            # rows+values matched but DuckDB's windowed sum() widened to
            # HUGEINT → hash red). repr()-compare below is blind to that, so
            # check column types explicitly before the value compare.
            stypes = dict(zip(sproj.columns, (str(t) for t in sproj.types)))
            dtypes = dict(zip(dproj.columns, (str(t) for t in dproj.types)))
            tdiff = {c: (stypes[c], dtypes[c]) for c in scols if stypes[c] != dtypes[c]}
            if tdiff:
                results[name] = f"TYPE_MISMATCH (spark, duck) per col: {tdiff}"; continue
            if len(sdata) != len(ddata):
                results[name] = f"ROWCOUNT_MISMATCH spark={len(sdata)} duck={len(ddata)}"; continue
            srows = [tuple(norm(v) for v in r) for r in sdata]
            drows = [tuple(norm(v) for v in r) for r in ddata]
            ordered = srows == drows
            unordered = sorted(srows) == sorted(drows)
            if ordered:
                results[name] = f"OK ({len(sdata)} rows)"
            elif unordered:
                results[name] = f"OK_UNORDERED_ONLY ({len(sdata)} rows)"
            else:
                diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sorted(srows), sorted(drows))) if a != b][:3]
                results[name] = f"VALUE_MISMATCH n={len(sdata)} first_diffs={diffs}"
        except Exception as e:
            results[name] = f"ERROR {str(e).splitlines()[0][:200]}"
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('OK (') else 'WARN' if v.startswith('OK_') else 'FAIL'} {k}: {v}")
    print(f"\n{n_ok}/{len(results)} matching")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
