"""Plans: streaming pipeline assembly (reference topology) and the batch
query catalog (declared engine surface, SURVEY.md §2B)."""
