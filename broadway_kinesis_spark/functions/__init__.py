"""Column-level helper functions (all JVM-side built-ins; no row-at-a-time UDFs)."""
