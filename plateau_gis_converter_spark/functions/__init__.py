"""Catalyst column-expression helpers — the JVM/codegen fast path."""
