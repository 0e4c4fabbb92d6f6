"""Downstream integrations (Sionna adapter, MATLAB export)."""
