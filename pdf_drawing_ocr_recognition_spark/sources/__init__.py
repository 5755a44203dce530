"""Sources: pages table reader + pattern registry."""

from .pages import read_pages
from .pattern_registry import load_patterns, save_patterns, validate_pattern

__all__ = ["read_pages", "load_patterns", "save_patterns", "validate_pattern"]
