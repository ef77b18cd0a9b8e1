"""Reusable engine operators: dedup family, upsert/merge, nested flatten,
similarity search — the building blocks behind the registered queries."""
