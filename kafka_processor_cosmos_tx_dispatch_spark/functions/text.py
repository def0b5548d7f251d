"""Text-analysis column functions (filled in the LLM-pipeline phase)."""
