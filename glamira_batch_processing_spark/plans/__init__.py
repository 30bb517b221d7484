"""Logical-plan layer: the dbt-like model pipeline and the driver-contract
query registry."""
