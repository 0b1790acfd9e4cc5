"""Query plans: relational surface + registry entries per domain."""
