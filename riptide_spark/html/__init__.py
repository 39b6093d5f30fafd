"""Pinned deterministic HTML engine (DOM, selectors, URL resolution)."""
