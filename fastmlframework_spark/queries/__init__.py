from fastmlframework_spark.queries.registry import all_queries, all_oracles, query

__all__ = ["all_queries", "all_oracles", "query"]
