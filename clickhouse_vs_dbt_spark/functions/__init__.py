from clickhouse_vs_dbt_spark.functions.datefns import to_iso_week, to_year, to_yyyymm

__all__ = ["to_iso_week", "to_year", "to_yyyymm"]
