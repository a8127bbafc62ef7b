"""Shared CLI helpers."""

from __future__ import annotations


def _manifest_prefix(path: str) -> str:
    """Run prefix from a --from value: strips .senna.json (or .json)
    instead of slicing a fixed width off arbitrary names."""
    if path.endswith(".senna.json"):
        return path[: -len(".senna.json")]
    if path.endswith(".json"):
        return path[: -len(".json")]
    return path
