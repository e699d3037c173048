"""Sources & sinks: pages input, warehouse catalog, export formats."""
