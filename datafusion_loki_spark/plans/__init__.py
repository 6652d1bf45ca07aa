"""Query library: each module exports QUERIES (name → (spark, sf_dir) → DataFrame)
and ORACLES (name → DuckDB SQL) used by __spark_entry__.py."""
