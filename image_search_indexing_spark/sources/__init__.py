"""Table sources/sinks: checkpoint catalog, parquet/json readers and writers."""
