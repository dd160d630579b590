"""esxsnmp_tsdb_spark — a PySpark-native analytics engine with the query
surface of the esnet ESxSNMP TSDB (reference: esnet/esxsnmp-tsdb), rebuilt
Spark-first.

The reference is a hierarchical, file-backed, RRD-style time-series store
(see SURVEY.md §1).  This engine re-expresses its data model as columnar
Parquet + DataFrames and its operators as Catalyst-optimizable DataFrame
transforms, then extends the surface with the relational, LLM-data-pipeline,
and streaming operators mandated by BASELINE.json's north star.

Layout:
- ``session``    — tuned SparkSession factory (AQE, UTC, shuffle sizing)
- ``sources``    — table catalog: fixture parquet loading + view registration
- ``operators``  — one pure ``(spark, sf_dir) -> DataFrame`` function per
  SURVEY.md §2 op key, registered in ``registry``
- ``functions``  — reusable column-level helpers (vector math, text stats)
- ``streaming``  — Structured Streaming twins of the batch operators
- ``plans``      — plan-inspection helpers (pushdown/broadcast assertions)
"""

from esxsnmp_tsdb_spark import registry

__all__ = ["registry"]
__version__ = "0.1.0"
