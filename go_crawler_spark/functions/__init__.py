"""Column-expression libraries (all JVM-side unless noted).

Modules host pure functions ``(spark, sf_dir) -> DataFrame`` used by the
driver contract in ``__spark_entry__.py`` plus reusable Column builders
consumed by the crawl engine. Per-row Python UDFs are forbidden; the
only Python kernels are vectorized pandas/Arrow UDFs in
``go_crawler_spark.functions.kernels``.
"""
