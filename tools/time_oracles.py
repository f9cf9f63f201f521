#!/usr/bin/env python3
"""Per-oracle DuckDB cost sweep — the budget the r13 verdict demanded.

Times every oracle at the given SF and writes
/tmp/oracle_times_<sf>.json. The driver-side correctness gate went
dark (empty CORRECTNESS_r12/r13.json) when the oracle suite outgrew
the driver's budget; run this after adding an oracle and keep the
sf0.01 total comfortably under ~120 s.

Usage: tools/time_oracles.py [sf] [oracle_sql.json]
"""
import duckdb, json, time, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else '0.01'
    path = sys.argv[2] if len(sys.argv) > 2 \
        else '/tmp/verify_out/oracle_sql.json'
    oracle = json.load(open(path))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('/root/testdata/sf{sf}/{t}.parquet')")
    times = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            times[name] = round(time.time() - t0, 2)
        except Exception as e:
            times[name] = f"ERR {str(e)[:80]}"
        print(name, times[name], flush=True)
    tot = sum(v for v in times.values() if isinstance(v, float))
    print("TOTAL", round(tot, 1))
    json.dump(times, open(f'/tmp/oracle_times_{sf}.json', 'w'), indent=1)


if __name__ == "__main__":
    main()
