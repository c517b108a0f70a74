"""Plan inspection helpers (pushdown / codegen / shuffle assertions)."""
