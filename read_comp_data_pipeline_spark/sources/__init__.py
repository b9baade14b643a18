"""Sources: WAL generator/reader and shared-testdata table loaders."""
