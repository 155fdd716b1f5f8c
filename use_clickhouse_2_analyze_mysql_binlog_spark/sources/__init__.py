"""Sources: Kafka config, canal protobuf decode, ingest transform."""
