"""Pipelines: crawl driver, dedup, similarity, text analysis, relational."""
