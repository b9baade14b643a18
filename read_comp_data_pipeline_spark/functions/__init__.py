"""Functions: extraction pandas UDFs, classifier exprs, URL predicates."""
