"""Source/sink descriptors (connectors).

Reference: Samza system descriptors — KafkaInput/Output/SystemDescriptor
(/root/reference samza-kafka/.../descriptors/), HDFS readers/writers
(samza-hdfs/), EventHubs (samza-azure/), Elasticsearch producer
(samza-elasticsearch/), in-memory test system (samza-core/.../system/
inmemory/). SURVEY.md §2.6 maps each to a Spark connector.
"""

from samza_spark.sources.descriptors import (
    FileSource,
    FileSink,
    KafkaSource,
    KafkaSink,
    MemorySource,
    MemorySink,
    ConsoleSink,
    ElasticsearchSink,
    AzureBlobAvroSink,
    RateSource,
    Startpoint,
    KinesisSource,
    EventHubsSource,
    bootstrap_table,
    KAFKA_WIRE_DDL,
    from_kafka_records,
    to_kafka_records,
)

__all__ = [
    "FileSource",
    "FileSink",
    "KafkaSource",
    "KafkaSink",
    "MemorySource",
    "MemorySink",
    "ConsoleSink",
    "ElasticsearchSink",
    "AzureBlobAvroSink",
    "RateSource",
    "Startpoint",
    "KinesisSource",
    "EventHubsSource",
    "bootstrap_table",
    "KAFKA_WIRE_DDL",
    "from_kafka_records",
    "to_kafka_records",
]
