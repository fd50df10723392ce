"""Training harness: config, losses, metrics, optimizer, trainer, checkpoints."""

from mvkpconv_tpu.training.config import KPConfig
from mvkpconv_tpu.training import losses, metrics

__all__ = ["KPConfig", "losses", "metrics"]
