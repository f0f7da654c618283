"""Placeholder; populated in this build round."""
