"""Plans: the operator catalog (queries + DuckDB oracles) and relational W1."""
