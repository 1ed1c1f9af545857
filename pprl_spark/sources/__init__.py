"""Sources: synthetic FEBRL-style document generator, table readers."""
