"""GAN losses: softplus D, non-saturating G, R1 gradient penalty.

Re-design of `restoration_train.py:54-79`. The reference needs the
`no_weight_gradients` context (`op/conv2d_gradfix.py:12-19`) so that R1's
double backward skips weight grads; in JAX the R1 penalty differentiates
w.r.t. the *images* explicitly, and the optimizer's grad is taken w.r.t.
params through that value — no special machinery, just `jax.grad` twice.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def d_logistic_loss(real_pred: jnp.ndarray, fake_pred: jnp.ndarray) -> jnp.ndarray:
    """softplus(-D(real)) + softplus(D(fake)) (`restoration_train.py:60-64`)."""
    return jnp.mean(jax.nn.softplus(-real_pred)) + jnp.mean(jax.nn.softplus(fake_pred))


def g_nonsaturating_loss(fake_pred: jnp.ndarray) -> jnp.ndarray:
    """softplus(-D(fake)) (`restoration_train.py:76-79`)."""
    return jnp.mean(jax.nn.softplus(-fake_pred))


def r1_penalty(d_apply: Callable[[jnp.ndarray], jnp.ndarray],
               real: jnp.ndarray) -> jnp.ndarray:
    """E[ ||d D(x)/d x||^2 ] (`restoration_train.py:66-73`).

    d_apply must close over (possibly trainable) D params; the returned value
    is differentiable w.r.t. them, reproducing the lazy-R1 term
    `r1/2 * penalty * d_reg_every` when scaled by the caller.
    """
    def summed(x):
        return jnp.sum(d_apply(x))

    grad = jax.grad(summed)(real)
    return jnp.mean(jnp.sum(jnp.square(grad), axis=tuple(range(1, real.ndim))))
