"""Scalar function layer (SURVEY §2.9) — pure Column expressions, no UDFs."""
