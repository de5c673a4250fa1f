"""KD loss for diffuser training (`code_diffuser_train.py:64-91`).

Returns (kl_term, l1_term). Reference quirk Q3 (SURVEY.md §3D): the KL term
is computed and logged but NOT added to the optimized loss; only the L1 term
trains the diffuser. Both are returned so trainers replicate that choice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kd_loss(pred: jnp.ndarray, target: jnp.ndarray,
            temperature: float = 0.15) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-element KL(log_softmax(pred/T) || softmax(target/T)) + L1."""
    logp = jax.nn.log_softmax(pred / temperature, axis=-1)
    q = jax.nn.softmax(target / temperature, axis=-1)
    logq = jax.nn.log_softmax(target / temperature, axis=-1)
    # torch F.kl_div(logp, q, reduction='batchmean' semantics per element set)
    kl = jnp.sum(q * (logq - logp)) / pred.shape[0]
    l1 = jnp.mean(jnp.abs(pred - target))
    return kl, l1
