#!/usr/bin/env python3
"""Oracle-rewrite equivalence gate.

When an oracle's SQL is reworked for cost (the r14 inverted-index /
MATERIALIZED diet), the rewrite must certify THE SAME thing: run the
old and new SQL in DuckDB over identical views and require the sorted
result sets to match exactly, before the new text ships.

Usage: tools/oracle_equiv.py <sf> <old_oracle_sql.json> <new_oracle_sql.json>

Only oracles whose SQL text differs are run. Exit nonzero on any
mismatch.
"""
import duckdb, json, sys, time
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.astype(str).sort_values(by=list(df.columns)) \
             .reset_index(drop=True)


def main():
    sf, old_path, new_path = sys.argv[1], sys.argv[2], sys.argv[3]
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    changed = [k for k in sorted(new) if old.get(k) != new.get(k)]
    print(f"changed oracles: {len(changed)}: {changed}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('/root/testdata/sf{sf}/{t}.parquet')")
    fails = 0
    for k in changed:
        t0 = time.time(); a = norm(con.execute(old[k]).df())
        t1 = time.time(); b = norm(con.execute(new[k]).df())
        t2 = time.time()
        ok = a.equals(b)
        print(f"{k}: old={t1-t0:.1f}s new={t2-t1:.1f}s rows={len(a)} "
              f"{'EQ' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            fails += 1
    print("FAILS", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
