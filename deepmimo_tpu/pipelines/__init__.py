"""Scenario-acquisition pipelines (OSM -> 3D scene -> ray tracer -> convert)."""
