"""NER evaluation metrics as native Spark aggregations (SURVEY §2.8)."""
