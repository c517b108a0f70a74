"""Column-level functions (the reference's scalar surface) and aggregates."""
