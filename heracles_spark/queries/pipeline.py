"""LLM-data-pipeline query corpus over documents/embeddings — filled in
alongside heracles_spark.operators."""

from __future__ import annotations

QUERIES: dict = {}
