"""Converters: ray-tracer outputs -> standardized DeepMIMO scenarios."""

from .converter import convert

__all__ = ["convert"]
