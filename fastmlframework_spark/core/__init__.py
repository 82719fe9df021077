from fastmlframework_spark.core.session import get_spark, stop_spark
from fastmlframework_spark.core.tables import TABLES, load_table, load_tables

__all__ = ["get_spark", "stop_spark", "TABLES", "load_table", "load_tables"]
