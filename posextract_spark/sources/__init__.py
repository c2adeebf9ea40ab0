"""Sources/sinks: synthetic pages corpus, table catalog, CSV parity."""
