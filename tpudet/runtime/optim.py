"""Minimal optimizers with a *runtime* learning rate.

The reference feeds ``lr`` through a placeholder every step and the drivers divide it
by 10 at fixed epochs (testSSD300.py:62-66), so the learning rate must be a traced
scalar argument of the jitted train step — not baked into an optax schedule. These are
small pure-pytree implementations of the two optimizers the reference uses:

  * Momentum 0.9 (tf.train.MomentumOptimizer — all models except CenterNet)
  * Adam (tf.train.AdamOptimizer defaults — CenterNet.py:154)
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class MomentumState(NamedTuple):
    velocity: Any


class Momentum:
    """accum = mu * accum + grad; param -= lr * accum (TF MomentumOptimizer)."""

    def __init__(self, momentum: float = 0.9):
        self.momentum = momentum

    def init(self, params):
        return MomentumState(jax.tree.map(jnp.zeros_like, params))

    def update(self, grads, state: MomentumState, params, lr):
        v = jax.tree.map(lambda v, g: self.momentum * v + g, state.velocity, grads)
        new_params = jax.tree.map(lambda p, v_: p - lr * v_, params, v)
        return new_params, MomentumState(v)


class AdamState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


class Adam:
    """TF-style Adam: lr_t = lr*sqrt(1-b2^t)/(1-b1^t); p -= lr_t * m/(sqrt(v)+eps)."""

    def __init__(self, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
        self.b1, self.b2, self.eps = b1, b2, eps

    def init(self, params):
        return AdamState(
            jnp.zeros((), jnp.int32),
            jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, params),
        )

    def update(self, grads, state: AdamState, params, lr):
        count = state.count + 1
        b1t = self.b1 ** count.astype(jnp.float32)
        b2t = self.b2 ** count.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: self.b1 * m + (1 - self.b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda n, g: self.b2 * n + (1 - self.b2) * g * g, state.nu, grads)
        lr_t = lr * jnp.sqrt(1.0 - b2t) / (1.0 - b1t)
        new_params = jax.tree.map(
            lambda p, m, n: p - lr_t * m / (jnp.sqrt(n) + self.eps), params, mu, nu
        )
        return new_params, AdamState(count, mu, nu)
