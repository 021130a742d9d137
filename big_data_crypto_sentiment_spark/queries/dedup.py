"""Placeholder — filled in as operators land."""

QUERIES = {}
ORACLE = {}
