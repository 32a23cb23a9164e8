"""Custom operators beyond stock DataFrame methods (SURVEY §7 M4 +
build-brief LLM-pipeline surface): as-of join, dedup family, similarity
search, text analysis. All are DataFrame->DataFrame compositions —
distributed, no driver collects."""
