"""Sources: synthetic page corpus, relational testdata loaders, table IO."""
