"""LLM-training-data-pipeline operators (north star, SURVEY.md §7 step 6):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search, text analysis, multimodal columns.

Populated incrementally; each op ships with a DuckDB oracle where
SQL-expressible (md5-based hashing makes even MinHash oracle-able).
"""

from __future__ import annotations


def specs():
    return []
