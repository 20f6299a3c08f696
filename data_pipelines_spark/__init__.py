"""data_pipelines_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference geospatial ETL platform
(openearthplatforminitiative/data-pipelines): flood-forecast ensemble
analytics, zonal statistics, grid/raster long-form processing — plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB pipeline needs.

Everything is expressed declaratively on the DataFrame API so Catalyst /
Tungsten / AQE plan the physical execution; Python UDFs appear only where
the built-in operators genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
