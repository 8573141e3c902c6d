"""Sources: pages table, alias dictionary, dataset readers (SURVEY §2.1)."""
