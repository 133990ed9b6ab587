-- Self-contained ClickHouse migration demo: run with
--   python -m clickhouse_vs_dbt_spark script tools/migration_demo.sql
-- Every statement below is ClickHouse syntax, executed end-to-end by
-- dialect.run_clickhouse_script (tables are managed Spark tables).

CREATE TABLE demo_events (k UInt64, v Float64, ver UInt32)
ENGINE = ReplacingMergeTree(ver) ORDER BY k;

CREATE MATERIALIZED VIEW demo_mv ENGINE = AggregatingMergeTree
ORDER BY k POPULATE
AS SELECT k, count() AS n, sum(toDecimal64(v, 2)) AS s
FROM demo_events GROUP BY k;

INSERT INTO demo_events VALUES (1, 2.5, 1), (1, 3.5, 2), (2, 9.0, 1), (3, 4.0, 1);

ALTER TABLE demo_events DELETE WHERE k = 3;

OPTIMIZE TABLE demo_events FINAL;

SELECT k, v FROM demo_events FINAL ORDER BY k LIMIT 1 BY k;

SELECT k, n, toFloat64(s) AS total FROM demo_mv ORDER BY k;

-- round-7 surface: star modifiers, -State/-Merge, WITH TIES, EXPLAIN
SELECT * EXCEPT (ver) REPLACE (v * 2 AS v) FROM demo_events ORDER BY k;

SELECT k, sumMerge(s) AS total FROM
  (SELECT k, sumState(toDecimal64(v, 2)) AS s
   FROM demo_events GROUP BY k, ver)
GROUP BY k ORDER BY k;

SELECT v FROM demo_events ORDER BY v LIMIT 2 WITH TIES;

EXPLAIN SYNTAX SELECT countIf(v > 3) FROM demo_events;
