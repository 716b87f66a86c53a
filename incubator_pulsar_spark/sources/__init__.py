"""Sources & sinks (Pulsar IO surface, SURVEY §2.1).

The reference's connector framework is ``pulsar-io/core``:
``Source.read()`` / ``Sink.write(Record)`` / ``BatchSource``
(discover → prepare → readNext). Spark-first, those collapse onto
``spark.read``/``readStream`` formats and ``writeStream``/``foreachBatch``
— this package provides the topic-shaped wrappers plus the connector
surfaces the test harness can exercise locally (file, JDBC-API,
data-generator, multi-topic, pattern subscription).
"""
