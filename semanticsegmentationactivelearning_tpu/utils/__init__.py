"""Host-side helpers: CLI plumbing, logging, metrics output."""

from . import cli

__all__ = ["cli"]
