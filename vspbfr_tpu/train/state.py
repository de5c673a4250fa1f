"""Train state, optimizers, EMA.

Reference hyperparameter conventions replicated:
  * lazy-regularization-scaled Adam (`restoration_train.py:397-409`):
    lr * r/(r+1), betas (0, 0.99^(r/(r+1))) for reg period r
    (G: r=4 -> 0.8, D: r=16 -> 16/17; diffuser uses r=4,
    `code_diffuser_train.py:301-311`).
  * EMA of G params with decay 0.5^(32/10000) ~= 0.99779
    (`restoration_train.py:137`, `accumulate` `:46-51`).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax

EMA_DECAY_DEFAULT = 0.5 ** (32.0 / 10_000.0)


def make_adam(lr: float, reg_every: int | None = None) -> optax.GradientTransformation:
    """Adam with the reference's lazy-reg ratio folded into lr/beta2."""
    if reg_every:
        ratio = reg_every / (reg_every + 1.0)
        return optax.adam(lr * ratio, b1=0.0, b2=0.99 ** ratio)
    return optax.adam(lr, b1=0.0, b2=0.99)


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        import jax.numpy as jnp
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads: Any) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def ema_update(ema_params: Any, params: Any,
               decay: float = EMA_DECAY_DEFAULT) -> Any:
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                        ema_params, params)
