"""Pure-function kernels: nn primitives, losses, metrics, acquisition."""

from . import nn

__all__ = ["nn"]
