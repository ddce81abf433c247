"""Sources: Spark session factory, synthetic corpus generation, table IO."""
