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

# The simhash oracles are BRUTE-FORCE truth (DedupQueries.simhashBrutePairCtes)
# and therefore exact only while the engine's SimhashAnchorCap does not bind
# on this corpus — the dedup_cap_binding census (dumped by the same Verify run)
# publishes exactly that precondition as rows_beyond_cap per surface. If the
# census reports binding at the compared scale, the engine result is a LOWER
# BOUND and a green hash would be an accident of the corpus; fail the row
# explicitly instead (round-15 verdict item 5: a future corpus/cap change must
# not silently turn exact oracles back into lower bounds).
SIMHASH_CENSUS_SURFACE = {
    "dedup_simhash": "simhash31_blocks",
    "dedup_simhash_wide": "simhash62_blocks",
    "dedup_survivors_simhash": "simhash31_blocks",
    "dedup_survivors_wide": "simhash62_blocks",
}


def precondition_failure(name, binding):
    """Failure record if `name`'s brute-force oracle precondition is
    violated (cap-binding census reports binding), else None."""
    surface = SIMHASH_CENSUS_SURFACE.get(name)
    if surface is None or binding.get(surface, 0) <= 0:
        return None
    msg = (f"precondition failed: cap-binding census reports "
           f"{surface} rows_beyond_cap={binding[surface]} at this "
           f"scale — engine pairs are a lower bound, brute-force "
           f"oracle comparison is not meaningful")
    print(f"FAIL {name}: {msg}")
    return {"rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": -1, "oracle_rows": -1, "err": msg}


def simhash_binding(con, out_dir):
    """surface -> rows_beyond_cap from the dumped census, {} if absent."""
    path = f"{out_dir}/dedup_cap_binding"
    if not os.path.isdir(path):
        return {}
    try:
        rows = con.sql(
            f"SELECT surface, rows_beyond_cap FROM "
            f"read_parquet('{path}/*.parquet')").fetchall()
        return {s: int(r) for s, r in rows}
    except Exception as e:
        print(f"WARNING: could not read cap-binding census: {e}",
              file=sys.stderr)
        return {}


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


def connect(sf_dir, mem_gb=None):
    con = duckdb.connect()
    if mem_gb:
        con.execute(f"SET memory_limit='{mem_gb}GB'")
    for t in TABLES:
        # driver testdata is one file per table; MakeScaled output
        # (target/sf1, target/sf10) is a Spark directory of part files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def compare_one(con, out_dir, name, sql):
    """One query's record dict: spark parquet vs oracle SQL, canon'd."""
    try:
        got = canon(con, con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
        want = canon(con, con.sql(sql))
    except Exception as e:
        print(f"FAIL {name}: error {e}")
        return {"rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": -1, "oracle_rows": -1,
                "err": str(e)[:300]}
    rec = {"rows_match": True, "schema_match": True, "hash_match": True,
           "spark_rows": len(got), "oracle_rows": len(want), "err": None}
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        rec.update(rows_match=len(got) == len(want), schema_match=False,
                   hash_match=False)
        return rec
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        rec.update(rows_match=False, hash_match=False)
        return rec
    for col in got.columns:
        for i, (a, b) in enumerate(zip(got[col].tolist(), want[col].tolist())):
            if not cells_equal(a, b):
                print(f"FAIL {name}: col {col} row {i}: {a!r} vs {b!r}")
                rec["hash_match"] = False
                return rec
    print(f"ok   {name} ({len(got)} rows)")
    return rec


def main(sf_dir, out_dir, json_out=None):
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    report = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows, oracle_rows, err=None):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    binding = simhash_binding(con, out_dir)
    for name, sql in sorted(oracle.items()):
        rec = precondition_failure(name, binding) or \
            compare_one(con, out_dir, name, sql)
        if not (rec["rows_match"] and rec["schema_match"] and
                rec["hash_match"]):
            failed.append(name)
        record(name, rec["rows_match"], rec["schema_match"],
               rec["hash_match"], rec["spark_rows"], rec["oracle_rows"],
               rec["err"])
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} passed")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(dict(sorted(report.items())), f, indent=2)
            f.write("\n")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
