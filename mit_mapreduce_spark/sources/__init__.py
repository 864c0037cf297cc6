"""Sources/sinks."""
