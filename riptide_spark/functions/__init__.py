"""Pure-Python per-document functions (no Spark imports): the extraction
core, gate oracle, chunker, language ID, and text statistics."""
