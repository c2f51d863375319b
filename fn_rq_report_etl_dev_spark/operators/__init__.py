"""Composite relational operators: window dedup, merge upsert, retention,
the near-duplicate detection family, and similarity search."""
