from vspbfr_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from vspbfr_tpu.utils.logging import Logger, ScoreTracker

__all__ = ["save_checkpoint", "load_checkpoint", "Logger", "ScoreTracker"]
