"""Placeholder — populated in later build steps."""
