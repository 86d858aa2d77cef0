from data_wrangling_spark.plans.registry import QUERIES, QuerySpec, oracle_sql, queries, register

__all__ = ["QUERIES", "QuerySpec", "oracle_sql", "queries", "register"]
