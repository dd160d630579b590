from esxsnmp_tsdb_spark.functions import tsdb, text, vector

__all__ = ["tsdb", "text", "vector"]
