"""Command-line entry points (scenario factory, dataset statistics)."""
