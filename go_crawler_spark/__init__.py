"""go_crawler_spark — a PySpark-native crawl-frontier + analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference crawler (nrad-K/go-crawler, studied at /root/reference),
re-expressed Spark-first: DataFrame/SQL logical plans, Catalyst-optimized
physical execution, vectorized Arrow/pandas UDF kernels only where the
built-in operators cannot express the semantics.

Subpackages
-----------
operators/   frontier dedupe (anti-join + Bloom shards), politeness
             window dequeue, pagination expansion
sources/     synthetic corpus generator, seed lists, robots tables,
             snapshot-committed parquet tables (Iceberg-style local stand-in)
functions/   column-expression libraries: URL ops, Japanese text parsing
             ladders, dedup sketches (MinHash/SimHash), text stats,
             similarity search
plans/       per-round crawl DAG assembly (generate / execute / scrape)
streaming/   incremental (micro-batch) frontier drain
"""

__version__ = "0.1.0"
