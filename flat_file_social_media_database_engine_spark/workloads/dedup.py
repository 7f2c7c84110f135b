"""Filled in incrementally — see workloads/__init__.py registry."""
