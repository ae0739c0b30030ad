"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference AACT clinical-trials pipeline
(``Fretch-troy1001/clinical-trials-data-pipeline-analyis``).

Layout
------
- ``session``    SparkSession factory (AQE, UTC, sane shuffle defaults)
- ``config``     injectable pipeline constants (analysis_date, caps, weights)
- ``schemas``    explicit StructTypes for every bronze table
- ``sources``    CSV / Parquet readers and writers (medallion layer IO)
- ``functions``  column-expression library (cleaning, text, vectors)
- ``operators``  engine operators beyond plain expressions (dedup,
                 similarity search, surrogate keys, date spine, multimodal)
- ``plans``      the medallion pipeline itself (bronze -> silver -> gold)
                 plus the TPC-H-shaped analog query suite used by the
                 driver contract in ``__spark_entry__.py``
- ``streaming``  Structured Streaming variants of the batch transforms

Everything is DataFrame-first: logical plans are declared with the
DataFrame / Spark SQL API and Catalyst picks the physical strategy. No
row-at-a-time Python UDFs exist in any hot path.
"""

__version__ = "0.1.0"
