"""Vector column functions (filled in the similarity-search phase)."""
