"""Pipeline plans: the relational query catalog, medallion stages,
quality engine, incremental extraction, and ML."""
