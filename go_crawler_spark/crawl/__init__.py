"""Crawl-frontier engine (the north-rule core).

A brand-new PySpark-native URL-frontier + fetch scheduler re-expressing
the dataflow of nrad-K/go-crawler (SURVEY.md §0-§4) — NOT a port:

- ``codec``        deterministic image codec + PSNR + phash (payload truth)
- ``canonicalize`` shared URL canonicalization kernel (pandas UDF + pure py)
- ``corpus``       seeded synthetic web generator (image+caption corpus)
- ``simulator``    pure-Python reference simulator → golden crawl trace
- ``store``        snapshot table store (parquet dirs + atomic pointer;
                   stands in for Iceberg, absent from this container)
- ``bloom``        partitioned Bloom shards broadcast + vectorized probe
- ``engine``       the per-round DataFrame iteration (dequeue → fetch →
                   verify → discover → dedupe → commit)
"""
