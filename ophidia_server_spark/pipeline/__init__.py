"""LLM-training-data pipeline operators (extension surface beyond the
reference; first-class per BASELINE.json north star): deduplication,
similarity search, text analysis, multimodal column plumbing.
"""
