"""Serving layer: the reference's 8 Lambda analytics endpoints as
parameterized PySpark query functions (SURVEY §3.1, §2.13)."""
