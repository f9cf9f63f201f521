#!/usr/bin/env python3
"""Probe: how deep a BPE replay oracle can DuckDB run at sf0.01?

Replicates PipelineQueries.oBpeTrain(n) SQL-gen and times it against the
sf0.01 documents table. Used to pick the certified replay depth for the
deep-merge p-query (the Spark side trains at any depth; the oracle's CTE
chain is the binding constraint).
"""
import sys, time
import duckdb

OTOKS = r"string_split_regex(trim(text), '\s+')"


def obpe(n: int, where: str = "") -> str:
    parts = [f"""WITH w0 AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
    list_transform(generate_series(1, length(word)),
      i -> substr(word, i, 1)) AS syms
  FROM (SELECT unnest({OTOKS}) AS word FROM documents{where})
  WHERE length(word) > 0
  GROUP BY word)"""]
    for k in range(1, n + 1):
        p = k - 1
        parts.append(f""",
c{k} AS (
  SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS pc FROM (
    SELECT cnt, syms[pos] AS l, syms[pos + 1] AS r FROM (
      SELECT cnt, syms,
        unnest(generate_series(1, len(syms) - 1)) AS pos
      FROM w{p} WHERE len(syms) >= 2))
  GROUP BY l, r),
win{k} AS (SELECT l, r, pc FROM c{k} ORDER BY pc DESC, l, r LIMIT 1),
m{k} AS (
  SELECT word, cnt, syms, pos,
    CASE WHEN pos < len(syms) AND syms[pos] = win.l
         AND syms[pos + 1] = win.r THEN 1 ELSE 0 END AS mt
  FROM (SELECT word, cnt, syms,
          unnest(generate_series(1, len(syms))) AS pos
        FROM w{p}), win{k} win),
g{k} AS (
  SELECT word, cnt, syms, pos,
    CASE WHEN mt = 1 AND (pos - MIN(pos) OVER (PARTITION BY word, grp))
         % 2 = 0 THEN 1 ELSE 0 END AS act
  FROM (SELECT *, CASE WHEN mt = 1 THEN pos - ROW_NUMBER()
          OVER (PARTITION BY word, mt ORDER BY pos) END AS grp
        FROM m{k})),
w{k} AS (
  SELECT word, cnt,
    list(CASE WHEN act = 1 THEN syms[pos] || syms[pos + 1]
         ELSE syms[pos] END ORDER BY pos) AS syms
  FROM (SELECT *, LAG(act, 1, 0) OVER (PARTITION BY word ORDER BY pos)
          AS pa FROM g{k})
  WHERE pa = 0 GROUP BY word, cnt)""")
    parts.append("\n" + "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS it, l AS lhs, r AS rhs, "
        f"pc AS pair_count FROM win{k}" for k in range(1, n + 1)))
    return "".join(parts)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    depths = [int(d) for d in sys.argv[2:]] or [3, 8, 16]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')")
    nw = con.execute(
        f"SELECT count(DISTINCT word) FROM (SELECT unnest({OTOKS}) AS word "
        f"FROM documents) WHERE length(word) > 0").fetchone()[0]
    print(f"distinct words: {nw}")
    for n in depths:
        t0 = time.time()
        rows = con.execute(obpe(n)).fetchall()
        dt = time.time() - t0
        print(f"n={n}: {dt:.1f}s, {len(rows)} rows, last={rows[-1]}")


if __name__ == "__main__":
    main()
