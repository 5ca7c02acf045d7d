"""Utilities: timers, checkpointing."""

from sobfu_tpu.utils.timers import ScopeTime, SampledScopeTime

__all__ = ["ScopeTime", "SampledScopeTime"]
