#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify output against DuckDB executing SparkEntry.oracleSql over
the same parquet tables, compares row counts, sorted-column names, and
value hashes. Usage: tools/check.py <sfDir> <verifyOutDir> [query ...]

Two properties keep this gate at least as strict as the driver's:

* dtype-faithful hashing: a float cell always renders with a float
  marker (``1000000.0``), so an int64 Spark column vs a float64 oracle
  column (e.g. DuckDB HUGEINT materialized by pandas) FAILS here the
  same way it fails the driver — the old ``:.10g``-only format
  collapsed ``1000000.0`` to ``1000000`` and masked that class.
* oracle type sweep: every oracle SQL is ``DESCRIBE``d before running
  and any output column whose DuckDB type is outside the portable set
  (BIGINT / VARCHAR / DOUBLE / DATE / TIMESTAMP) is a hard failure.
  DuckDB silently widens SUM(BIGINT) and mixed ``//`` to HUGEINT; the
  sweep turns that into a local failure before the driver ever sees it.

``tools/check.py --sweep`` runs the type sweep alone over every oracle
(no Verify output needed).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB output types that round-trip through pandas with the same
# canonical rendering Spark's parquet output gets. The int family is
# safe (pandas int32/int64 render identically); the widening types
# (HUGEINT, DECIMAL) materialize as float64/object and re-render.
ALLOWED_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT",
                 "VARCHAR", "DOUBLE", "DATE", "TIMESTAMP"}


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values for hashing
    def cell(v):
        if isinstance(v, float):
            s = f"{v:.10g}"
            # keep the float marker: int-vs-float dtype drift must FAIL
            if s.replace("-", "").isdigit():
                s += ".0"
            return s
        s = str(v)
        # DuckDB DATE -> pandas datetime64 renders a spurious midnight;
        # normalize so date-valued cells compare equal across engines
        if s.endswith(" 00:00:00"):
            return s[:-9]
        return s
    df = df.map(cell)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def bad_types(con, sql):
    """Columns of this oracle whose DuckDB type is outside ALLOWED_TYPES."""
    desc = con.execute(f"DESCRIBE {sql}").df()
    return [(r["column_name"], r["column_type"])
            for _, r in desc.iterrows()
            if r["column_type"] not in ALLOWED_TYPES]


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def sweep(sf_dir, oracle_path):
    con = connect(sf_dir)
    oracle = json.load(open(oracle_path))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            bad = bad_types(con, sql)
        except Exception as e:
            print(f"FAIL {name}: describe error {e}")
            n_fail += 1
            continue
        if bad:
            print(f"FAIL {name}: non-portable oracle types {bad}")
            n_fail += 1
    print(f"== sweep: {n_fail} oracle(s) with non-portable types")
    sys.exit(1 if n_fail else 0)


def main():
    if sys.argv[1] == "--sweep":
        sweep(sys.argv[2], sys.argv[3])
        return
    # --json-out FILE: write a durable per-query verdict artifact (the
    # committed CORRECTNESS_local_r{N}.json the round close checks in).
    # An empty result set is a FAILURE: round 12 shipped with an empty
    # driver artifact, and this flag exists so that can never look green.
    args = sys.argv[1:]
    json_out = None
    if "--json-out" in args:
        i = args.index("--json-out")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = {}
    def fail(name, msg):
        print(f"FAIL {name}: {msg}")
        results[name] = f"fail: {msg.splitlines()[0][:160]}"
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        bad = bad_types(con, sql)
        if bad:
            fail(name, f"non-portable oracle types {bad}")
            n_fail += 1
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            fail(name, "no spark output")
            n_fail += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in spark_files]))
        try:
            exp = norm(con.execute(sql).df())
        except Exception as e:
            fail(name, f"oracle error {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            fail(name, f"columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
        elif len(got) != len(exp):
            fail(name, f"rows {len(got)} != {len(exp)}")
            n_fail += 1
        elif not got.equals(exp):
            diff = (got != exp).any(axis=1)
            i = diff.idxmax()
            fail(name, f"value mismatch at row {i}:\n  spark={got.loc[i].to_dict()}\n  duck ={exp.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            results[name] = "pass"
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    ok = n_fail == 0 and n_pass > 0
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                       "green": ok, "queries": results}, f, indent=1,
                      sort_keys=True)
        print(f"== wrote {json_out} (green={ok})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
