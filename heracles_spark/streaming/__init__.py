"""Structured Streaming over key-organized tables. The reference has no
streaming surface (SURVEY §2.9); this is the rebuild's native extension:
file-source ingest into key-organized tables plus watermarked windowed
aggregation, expressed with stock readStream/writeStream."""
