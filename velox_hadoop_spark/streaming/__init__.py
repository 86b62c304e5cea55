"""Structured Streaming surface: windowed aggregation, watermarked
dedup, sessionization — batch-equivalent forms registered as queries."""
