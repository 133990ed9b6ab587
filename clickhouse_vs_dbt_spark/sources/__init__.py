from clickhouse_vs_dbt_spark.sources.ssb_csv import SSB_SCHEMAS, read_ssb_csv

__all__ = ["SSB_SCHEMAS", "read_ssb_csv"]
