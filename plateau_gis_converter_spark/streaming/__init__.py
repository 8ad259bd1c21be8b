"""Structured Streaming wrappers.

The reference is strictly batch (SURVEY §1.4/§2.8: bounded channels, one
pass, no watermarks); these streaming variants cover the same operator
semantics for unbounded input — the engine's extension beyond the reference.
"""
