#!/usr/bin/env python3
"""Prototype: validate the transcripts-derivation CTE runs in DuckDB and
produces sane rows. The same template (with {STR} swapped) must run in Spark."""
import duckdb, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

CTE = """
WITH t0 AS (
  SELECT event_id AS e, ts, user_id,
         cast(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS int) AS turn_idx
  FROM events
), t1 AS (
  SELECT e, ts, turn_idx,
    concat('conv-', lpad(cast(user_id AS {STR}), 6, '0')) AS conv_id,
    CASE cast(turn_idx % 4 AS int) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' WHEN 2 THEN 'system' ELSE 'tool' END AS role,
    CASE WHEN turn_idx % 4 = 3 THEN
      CASE cast(e % 4 AS int) WHEN 0 THEN 'bash' WHEN 1 THEN 'search' WHEN 2 THEN 'editor' ELSE 'browser' END
    ELSE NULL END AS tool,
    CASE WHEN e % 97 = 0 THEN 4 ELSE cast(e % 4 AS int) END AS variant,
    CASE WHEN e % 7 = 0 THEN 'error' WHEN e % 7 = 1 THEN 'fail' ELSE 'ok' END AS status,
    cast(e % 24 AS int) AS fac, cast(e % 8 AS int) AS sev,
    CASE cast(e % 12 AS int) WHEN 0 THEN 'Jan' WHEN 1 THEN 'Feb' WHEN 2 THEN 'Mar' WHEN 3 THEN 'Apr' WHEN 4 THEN 'May' WHEN 5 THEN 'Jun' WHEN 6 THEN 'Jul' WHEN 7 THEN 'Aug' WHEN 8 THEN 'Sep' WHEN 9 THEN 'Oct' WHEN 10 THEN 'Nov' ELSE 'Dec' END AS mon,
    cast(1 + e % 28 AS int) AS dd, cast(e % 24 AS int) AS hh, cast(e % 60 AS int) AS mi, cast((e * 7) % 60 AS int) AS ss
  FROM t0
), transcripts AS (
  SELECT conv_id, turn_idx, role, tool, ts,
    CASE variant
      WHEN 0 THEN concat('<', cast(fac * 8 + sev AS {STR}), '>', mon, ' ', lpad(cast(dd AS {STR}), 2, ' '), ' ',
                         lpad(cast(hh AS {STR}), 2, '0'), ':', lpad(cast(mi AS {STR}), 2, '0'), ':', lpad(cast(ss AS {STR}), 2, '0'),
                         ' host-', cast(e % 10 AS {STR}), ' prog-', cast(e % 6 AS {STR}), '[', cast(100 + e % 900 AS {STR}), ']: action=',
                         CASE cast(e % 5 AS int) WHEN 0 THEN 'login' WHEN 1 THEN 'logout' WHEN 2 THEN 'read' WHEN 3 THEN 'write' ELSE 'exec' END,
                         ' status=', status)
      WHEN 1 THEN concat('event=tool_call tool=', coalesce(tool, 'none'), ' duration_ms=', cast(e % 5000 AS {STR}), ' ok=', CASE WHEN e % 3 = 0 THEN 'false' ELSE 'true' END)
      WHEN 2 THEN concat('{"event":"turn","role":"', role, '","tokens":', cast(10 + e % 4000 AS {STR}), ',"status":"', status, '"}')
      WHEN 3 THEN concat(conv_id, ',', cast(turn_idx AS {STR}), ',', role, ',', cast(e % 2500 AS {STR}))
      ELSE concat('~~CORRUPT#', cast(e AS {STR}), '##')
    END AS text
  FROM t1
)
"""

con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
q = CTE.replace("{STR}", "varchar") + " SELECT * FROM transcripts ORDER BY conv_id, turn_idx LIMIT 12"
for row in con.execute(q).fetchall():
    print(row)
print(con.execute(CTE.replace("{STR}", "varchar") +
    " SELECT count(*), count(tool), sum(CASE WHEN text LIKE '<%' THEN 1 ELSE 0 END) FROM transcripts").fetchall())
