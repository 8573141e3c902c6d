"""KG pipeline + training-data operators (SURVEY §2, FIXTURES.md)."""
