"""Functional on-device replay buffer (the CycleGAN 50-image history pool).

The reference's ``ReplayBuffer`` (trainer/utils.py:120-140) is a host-side
Python list with per-element coin flips: append until full; once full, with
p=0.5 swap the new fake with a random stored one and train D on the old one,
else pass the new one through. Here the pool lives on device as part of the
train state and the same per-element policy runs under explicit PRNG keys
inside the jitted step — no host round-trips.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    data: jnp.ndarray  # (max_size, H, W, C)
    size: jnp.ndarray  # scalar int32

    @staticmethod
    def create(max_size: int, shape, dtype=jnp.float32) -> "ReplayBuffer":
        return ReplayBuffer(
            data=jnp.zeros((max_size,) + tuple(shape), dtype),
            size=jnp.zeros((), jnp.int32),
        )


def push_and_pop(buf: ReplayBuffer, items: jnp.ndarray, key):
    """Insert a batch of fakes, returning the batch D should train on.

    ``items``: (B, H, W, C). Per element: if the pool isn't full, store and
    return it; else with p>0.5 swap with (and return) a uniformly random
    stored element, else return it unchanged.
    """
    max_size = buf.data.shape[0]

    def step(carry, inp):
        data, size = carry
        item, k = inp
        k1, k2 = jax.random.split(k)
        coin = jax.random.uniform(k1) > 0.5
        idx = jax.random.randint(k2, (), 0, max_size)

        def not_full(_):
            new_data = jax.lax.dynamic_update_index_in_dim(data, item, size, 0)
            return (new_data, size + 1), item

        def full(_):
            def swap(_):
                old = jax.lax.dynamic_index_in_dim(data, idx, 0, keepdims=False)
                new_data = jax.lax.dynamic_update_index_in_dim(data, item, idx, 0)
                return (new_data, size), old

            def passthrough(_):
                return (data, size), item

            return jax.lax.cond(coin, swap, passthrough, None)

        return jax.lax.cond(size < max_size, not_full, full, None)

    keys = jax.random.split(key, items.shape[0])
    (data, size), out = jax.lax.scan(step, (buf.data, buf.size), (items, keys))
    return ReplayBuffer(data=data, size=size), out
