"""Sources & sinks: synthetic raw generation, schema-reconciling readers,
partitioned writers."""
