"""shardpack_spark — a PySpark-native analytics engine with the data model
of the ShardPack sharded container format (reference: jsam/shardpack) plus a
full relational / streaming / LLM-data-pipeline operator surface.

Layout
------
- ``session``    : SparkSession factory tuned for the target workload.
- ``tables``     : loaders for the driver's parquet tables.
- ``queries``    : the declared query registry (name -> builder + oracle SQL).
- ``operators``  : library operators (as-of join, dedup, similarity, text).
- ``format``     : ShardPack codec + Python DataSource V2 (read/write/stream).
- ``streaming``  : Structured Streaming helpers (windows, watermark, dedup).

Everything is DataFrame-first: logical plans are declared via the DataFrame /
SQL API and Catalyst picks the physical strategy.  Python only runs in the
ShardPack codec path (Arrow-batched) and in explicitly-vectorized UDFs.
"""

__version__ = "0.1.0"
