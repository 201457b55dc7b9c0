"""LLM-data-pipeline operators (the north-star extension surface): dedup,
similarity search, text analysis, event-time windows, multimodal plumbing.
"""
