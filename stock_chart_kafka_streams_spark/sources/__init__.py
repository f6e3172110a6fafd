"""Sources: test-data adapters, Kafka stream source, deterministic generator."""
