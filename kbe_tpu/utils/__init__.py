"""Cross-cutting utilities: logging, profiling, torch checkpoint
conversion."""

from kbe_tpu.utils.logging import MetricsWriter, StageTimer

__all__ = ["MetricsWriter", "StageTimer"]
