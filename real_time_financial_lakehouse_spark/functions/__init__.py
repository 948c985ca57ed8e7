"""Reusable column-expression builders (all JVM-side built-ins)."""
