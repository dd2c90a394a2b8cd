"""Plans: checkpoint manifest, lineage metrics, resume (SURVEY.md §4.3)."""
