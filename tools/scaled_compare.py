#!/usr/bin/env python3
"""Per-query scaled-decade DuckDB compare with subprocess isolation.

The sf1+ decades are where the oracle, not the engine, is the scaling
bottleneck (round-15 verdict item 2): a brute-force truth CTE can OOM
the whole python process or blow a wall budget, and one such query must
not cost the rest of the artifact. So each query runs in its OWN child
process under a DuckDB memory limit and a wall timeout; the parent
merges per-query records into the artifact JSON, preserving existing
rows for queries not in this run (the artifact accretes across
sessions — CORRECTNESS_SF1.json was built over two rounds).

Per-query oracle selection: if the engine dumped oracle_sql_scaled.json
(DedupQueries.scaledOracles — index-form pair enumeration for the
queries whose brute CTEs OOM at sf1), the child uses the scaled form and
stamps the record with "oracle": "indexed". `--xcheck` proves each
scaled override row-identical to its committed brute twin at a decade
where both run (sf0.1) — the license for trusting the overrides where
the brute form cannot be evaluated.

Usage:
  scaled_compare.py SFDIR OUTDIR ARTIFACT Q1[,Q2...] [--timeout SEC] [--mem GB]
  scaled_compare.py --child SFDIR OUTDIR QUERY [MEM_GB]   (internal)
  scaled_compare.py --xcheck SFDIR OUTDIR OUT_JSON [Q1,...] [--mem GB]

Pass `all` as the query list to run every query with a dumped parquet
directory under OUTDIR.
"""
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import compare  # noqa: E402


def load_oracle(out_dir, name):
    """(sql, form): the scaled-decade override if the engine dumped one
    for this query (index-form pair enumeration — see
    DedupQueries.scaledOracles), else the committed brute oracle."""
    scaled_path = f"{out_dir}/oracle_sql_scaled.json"
    if os.path.exists(scaled_path):
        scaled = json.load(open(scaled_path))
        if name in scaled:
            return scaled[name], "indexed"
    return json.load(open(f"{out_dir}/oracle_sql.json"))[name], "brute"


# Queries whose committed oracle is a recursive-CTE transitive closure
# that cannot terminate at sf1 (quadratic-OUTPUT reach over a saturated
# component — dedup_survivors_simhash's sampled graph carries ~8.6M
# edges). The procedural twin keeps the committed SQL as the single
# source for the EDGE SET and the output shape, and replaces only the
# closure with min-label propagation + pointer jumping driven from
# Python (each step a plain DuckDB aggregate; fixpoint = exact
# component minimum, the same `least(src, min(dst)) AS rep` the reach
# CTE folds to). Engine-independent twice over: different algorithm
# (label prop vs the engine's edge contraction) AND different engine
# (DuckDB vs Spark).
PROCEDURAL_CC = {"dedup_survivors_simhash"}


def procedural_cc_sql(con, committed_sql):
    """Materialize the committed oracle's edge set, run pointer-jumping
    min-label CC to fixpoint, return a SELECT reproducing the committed
    output shape (doc_id, rep[, stride])."""
    cut = committed_sql.index("reach(src, dst) AS (")
    edges_sql = (committed_sql[:cut].rstrip().rstrip(",")
                 .replace("WITH RECURSIVE", "WITH", 1)
                 + "\nSELECT src, dst FROM e")
    con.execute("CREATE TEMP TABLE cc_e AS " + edges_sql)
    con.execute("""CREATE TEMP TABLE cc_lab AS
        SELECT src AS node, least(src, min(dst)) AS rep
        FROM cc_e GROUP BY src""")
    for it in range(64):
        con.execute("""CREATE TEMP TABLE cc_lab2 AS
            SELECT n.node, least(n.rep, coalesce(m.mn, n.rep)) AS rep
            FROM cc_lab n LEFT JOIN (
              SELECT e.dst AS node, min(l.rep) AS mn
              FROM cc_e e JOIN cc_lab l ON l.node = e.src
              GROUP BY e.dst) m ON m.node = n.node""")
        # pointer jumping: adopt the label of your label
        con.execute("""CREATE TEMP TABLE cc_lab3 AS
            SELECT a.node, b.rep FROM cc_lab2 a JOIN cc_lab2 b
            ON b.node = a.rep""")
        changed = con.sql("""SELECT count(*) FROM cc_lab3 a
            JOIN cc_lab b ON a.node = b.node AND a.rep <> b.rep""").fetchone()[0]
        con.execute("DROP TABLE cc_lab; DROP TABLE cc_lab2")
        con.execute("ALTER TABLE cc_lab3 RENAME TO cc_lab")
        if changed == 0:
            break
    else:
        raise RuntimeError("label propagation did not converge in 64 rounds")
    # output shape from the committed tail: SELECT src AS doc_id,
    # least(...) AS rep[, (SELECT ... FROM nn) AS stride] FROM reach
    tail = committed_sql[cut:]
    m = re.search(r"(\(SELECT CAST\(greatest\(\(cn \+ \d+\) // \d+, 1\)\s*"
                  r"AS BIGINT\) FROM nn\)) AS stride", tail, re.S)
    stride_sel = ""
    if m:
        stride_expr = m.group(1).replace(
            "FROM nn", "FROM (SELECT count(*) AS cn FROM documents) nn")
        stride_sel = f", {stride_expr} AS stride"
    return f"SELECT node AS doc_id, rep{stride_sel} FROM cc_lab"


def child(sf_dir, out_dir, name, mem_gb):
    con = compare.connect(sf_dir, mem_gb=mem_gb)
    sql, form = load_oracle(out_dir, name)
    if name in PROCEDURAL_CC:
        sql = procedural_cc_sql(con, sql)
        form = "procedural-cc"
    binding = compare.simhash_binding(con, out_dir)
    rec = compare.precondition_failure(name, binding) or \
        compare.compare_one(con, out_dir, name, sql)
    if form != "brute":
        rec["oracle"] = form
    print("RECORD " + json.dumps(rec))
    return 0


def xcheck(sf_dir, out_dir, out_json, names=None, mem_gb=24):
    """Oracle-of-the-oracle: at a decade where BOTH formulations run
    (sf0.1), evaluate each scaled override AND its committed brute twin
    and assert row-identical canonical output. This is what licenses the
    index-form overrides at sf1+, where the brute form cannot run."""
    scaled = json.load(open(f"{out_dir}/oracle_sql_scaled.json"))
    brute = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(names or set(scaled) | (PROCEDURAL_CC & set(brute))):
        con = compare.connect(sf_dir, mem_gb=mem_gb)
        import time
        t0 = time.time()
        try:
            a_sql = procedural_cc_sql(con, brute[name]) \
                if name in PROCEDURAL_CC else scaled[name]
            a = compare.canon(con, con.sql(a_sql))
            tb = time.time()
            b = compare.canon(con, con.sql(brute[name]))
            same_schema = list(a.columns) == list(b.columns)
            same_rows = len(a) == len(b)
            same = same_schema and same_rows and all(
                compare.cells_equal(x, y)
                for col in a.columns
                for x, y in zip(a[col].tolist(), b[col].tolist()))
            results[name] = {
                "identical": bool(same), "rows": len(a),
                "indexed_sec": round(tb - t0, 2),
                "brute_sec": round(time.time() - tb, 2)}
            print(f"[xcheck] {name}: "
                  f"{'IDENTICAL' if same else 'MISMATCH'} ({len(a)} rows, "
                  f"indexed {results[name]['indexed_sec']}s, "
                  f"brute {results[name]['brute_sec']}s)", flush=True)
        except Exception as e:
            results[name] = {"identical": False, "err": str(e)[:300]}
            print(f"[xcheck] {name}: ERROR {e}", flush=True)
        con.close()
        with open(out_json, "w") as f:
            json.dump({"sf_dir": sf_dir, "method":
                       "each scaled (index-form) oracle and its committed "
                       "brute-force twin evaluated in DuckDB on the same "
                       "tables; canonical (name-sorted columns, row-sorted) "
                       "frames compared cell-exact", "queries": results}, f,
                      indent=1)
            f.write("\n")
    bad = [n for n, r in results.items() if not r.get("identical")]
    print(f"xcheck: {len(results) - len(bad)}/{len(results)} identical"
          + (f"; MISMATCH: {bad}" if bad else ""))
    return 1 if bad else 0


def main(argv):
    if argv[0] == "--child":
        sf_dir, out_dir, name = argv[1:4]
        mem_gb = int(argv[4]) if len(argv) > 4 else None
        return child(sf_dir, out_dir, name, mem_gb)
    if argv[0] == "--xcheck":
        # scaled_compare.py --xcheck SFDIR OUTDIR OUT_JSON [Q1,Q2,...] [--mem GB]
        sf_dir, out_dir, out_json = argv[1:4]
        names = None
        mem_gb = 24
        rest = argv[4:]
        for i, a in enumerate(rest):
            if a == "--mem":
                mem_gb = int(rest[i + 1])
            elif i == 0 and not a.startswith("--"):
                names = a.split(",")
        return xcheck(sf_dir, out_dir, out_json, names, mem_gb)
    sf_dir, out_dir, artifact = (os.path.abspath(p) for p in argv[:3])
    names = argv[3].split(",")
    timeout = 900
    mem_gb = 48
    for i, a in enumerate(argv):
        if a == "--timeout":
            timeout = int(argv[i + 1])
        if a == "--mem":
            mem_gb = int(argv[i + 1])
    if names == ["all"]:
        names = sorted(d for d in os.listdir(out_dir)
                       if os.path.isdir(f"{out_dir}/{d}"))
    art = {}
    if os.path.exists(artifact):
        art = json.load(open(artifact))
    for name in names:
        cmd = [sys.executable, os.path.abspath(__file__), "--child",
               sf_dir, out_dir, name, str(mem_gb)]
        err = None
        rec = None
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout,
                               cwd=os.path.dirname(os.path.abspath(__file__)))
            for line in r.stdout.splitlines():
                if line.startswith("RECORD "):
                    rec = json.loads(line[len("RECORD "):])
            if rec is None:
                tail = (r.stdout + r.stderr).strip().splitlines()[-1:] or [""]
                err = (f"oracle child died (exit {r.returncode}): "
                       f"{tail[0]}")[:300]
        except subprocess.TimeoutExpired:
            err = f"oracle exceeded the {timeout}s per-query wall budget"
        if rec is None:
            rec = {"rows_match": False, "schema_match": False,
                   "hash_match": False, "spark_rows": -1, "oracle_rows": -1,
                   "err": err}
            print(f"FAIL {name}: {err}")
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        print(f"[scaled] {name}: {'green' if ok else 'FAILED'}", flush=True)
        art[name] = rec
        # write-through per query: a killed parent still leaves every
        # completed row in the artifact
        with open(artifact, "w") as f:
            json.dump(dict(sorted(art.items(),
                                  key=lambda kv: (kv[0] == "_meta", kv[0]))),
                      f, indent=1)
            f.write("\n")
    greens = sum(1 for k, v in art.items() if k != "_meta"
                 and v.get("hash_match"))
    total = sum(1 for k in art if k != "_meta")
    print(f"artifact now {greens}/{total} green -> {artifact}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
