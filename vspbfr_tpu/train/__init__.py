from vspbfr_tpu.train.state import EMA_DECAY_DEFAULT, TrainState, ema_update, make_adam

__all__ = ["TrainState", "ema_update", "make_adam", "EMA_DECAY_DEFAULT"]
