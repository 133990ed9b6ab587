from clickhouse_vs_dbt_spark.plans.models import Materialization, Model, ModelRunner
from clickhouse_vs_dbt_spark.plans.star import build_star, star_sql

__all__ = ["Materialization", "Model", "ModelRunner", "build_star", "star_sql"]
