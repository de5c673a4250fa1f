from vspbfr_tpu.utils.checkpoint import (load_checkpoint, save_checkpoint,
                                          wait_for_saves)
from vspbfr_tpu.utils.logging import Logger, ScoreTracker

__all__ = ["save_checkpoint", "load_checkpoint", "wait_for_saves",
           "Logger", "ScoreTracker"]
