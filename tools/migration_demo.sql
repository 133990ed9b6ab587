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

-- round-8 surface: MV state aggregates, partition lifecycle,
-- z-tests, window derivative
CREATE MATERIALIZED VIEW demo_mv_avg ENGINE = AggregatingMergeTree
ORDER BY k POPULATE
AS SELECT k, avg(v) AS mean_v, uniqExact(ver) AS n_vers
FROM demo_events GROUP BY k;

SELECT k, round(mean_v, 4) AS mean_v, n_vers FROM demo_mv_avg ORDER BY k;

CREATE TABLE demo_part (k UInt64, v Float64, y UInt16)
ENGINE = MergeTree PARTITION BY y ORDER BY k;

INSERT INTO demo_part VALUES (1, 1.0, 2023), (2, 2.0, 2024), (3, 3.0, 2024);

ALTER TABLE demo_part DETACH PARTITION 2023;
ALTER TABLE demo_part ATTACH PARTITION 2023;
ALTER TABLE demo_part UPDATE v = v * 10 IN PARTITION 2024 WHERE k = 2;
ALTER TABLE demo_part FREEZE PARTITION 2024;

SELECT k, v, y FROM demo_part ORDER BY k;

SELECT round(meanZTest(1.0, 1.0, 0.95)(v, k % 2).1, 4) AS z FROM demo_part;
