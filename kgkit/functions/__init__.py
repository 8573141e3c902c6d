"""Column-level helpers: SQL-expressible scheme ops, vector math."""
