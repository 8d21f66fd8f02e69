"""Structured Streaming operators (readStream -> transform -> writeStream)."""
