#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ spark parquet result, runs the
matching oracle SQL from oracle_sql.json in DuckDB (tables = parquet
files in sfDir), sorts columns by name and rows by all columns, and
diffs values. Exit code 1 on any mismatch.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel):
    df = rel.fetchdf()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            if math.isnan(a) and math.isnan(b):
                return True
            return math.isclose(float(a), float(b), rel_tol=1e-12, abs_tol=1e-12)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; MakeScaled output
        # (target/sf1, target/sf10) is a Spark directory of part files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    report = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows, oracle_rows, err=None):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    for name, sql in sorted(oracle.items()):
        try:
            got = canon(con, con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
            want = canon(con, con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            failed.append(name)
            record(name, False, False, False, -1, -1, str(e)[:300])
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            failed.append(name)
            record(name, len(got) == len(want), False, False, len(got), len(want))
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            failed.append(name)
            record(name, False, True, False, len(got), len(want))
            continue
        ok = True
        for col in got.columns:
            ga, wa = got[col].tolist(), want[col].tolist()
            for i, (a, b) in enumerate(zip(ga, wa)):
                if not cells_equal(a, b):
                    print(f"FAIL {name}: col {col} row {i}: {a!r} vs {b!r}")
                    ok = False
                    break
            if not ok:
                break
        if ok:
            print(f"ok   {name} ({len(got)} rows)")
        else:
            failed.append(name)
        record(name, True, True, ok, len(got), len(want))
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} passed")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(dict(sorted(report.items())), f, indent=2)
            f.write("\n")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
