"""Readers and table loaders."""
