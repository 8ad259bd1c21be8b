"""Plans: query registry (driver contract), pipeline composition, lineage."""
