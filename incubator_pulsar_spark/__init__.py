"""incubator_pulsar_spark — a PySpark-native engine with the query and
data-processing capabilities of the reference pub-sub platform
(NeatGuyCoding/incubator-pulsar, studied read-only at /root/reference).

This is NOT a port: the reference is a distributed message broker
(topics, producers/consumers, compaction, TableView, windowed functions,
dedup, delayed delivery, retry/DLQ). This package re-expresses those
semantics as idiomatic Spark DataFrame / Structured Streaming operators,
plus the batch-analytics and LLM-data-pipeline surface (dedup, similarity
search, text analysis, multimodal plumbing) needed at 100 TB scale.

Layout
------
- ``session``     : tuned SparkSession builder (AQE, shuffle sizing, Arrow)
- ``envelope``    : the message-envelope data model (SURVEY §1.1)
- ``registry``    : schema registry + compatibility checker (SURVEY §1.2)
- ``operators/``  : compaction, tableview, dedup, routing, windows, delay,
                    retry/DLQ, ttl/seek (SURVEY §2.3-2.5)
- ``functions/``  : text analysis, fuzzy dedup (minhash/simhash/jaccard),
                    embedding similarity, multimodal plumbing
- ``sources/``    : source/sink wrappers (file, jdbc, kafka, generator)
- ``streaming/``  : Structured-Streaming variants (stateful count windows,
                    streaming tableview/dedup/delay/retry)
- ``plans/``      : composed analytics queries (bench + correctness harness)
"""

__version__ = "0.1.0"
