"""Low-level batched DP primitives and Pallas kernels."""

from .recurrence import linear_recurrence, maxplus_recurrence

__all__ = ["linear_recurrence", "maxplus_recurrence"]
