from vspbfr_tpu.losses.gan import (
    d_logistic_loss,
    g_nonsaturating_loss,
    r1_penalty,
)
from vspbfr_tpu.losses.kd import kd_loss

__all__ = [
    "d_logistic_loss",
    "g_nonsaturating_loss",
    "r1_penalty",
    "kd_loss",
]
