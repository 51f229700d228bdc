"""Operator implementations (each a thin, Catalyst-friendly DataFrame recipe)."""
