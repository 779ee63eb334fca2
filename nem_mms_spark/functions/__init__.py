"""Analytics / training-data-pipeline operators over document tables.

All hot-path expressions are JVM-side built-ins (`pyspark.sql.functions`);
Python appears only behind Arrow-vectorized UDFs where Spark lacks a
primitive (multimodal decode stubs).
"""
