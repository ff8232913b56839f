"""Relational operators: as-of joins, champions, top-k, dedup, similarity."""
