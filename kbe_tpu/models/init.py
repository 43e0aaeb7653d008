"""Reference-parity weight initialization.

The reference re-initializes every Conv weight after module construction
with a 4-way selector (utils/utils.py:101-114): normal(0, gain) /
xavier-normal(gain) [the default, gain 1.4] / orthogonal(gain) /
he (kaiming fan-in). Flax's default is lecun_normal, so from-scratch
training dynamics differ unless this is applied. ``apply_weights_init``
walks an existing param pytree and redraws every 4-D conv kernel
(biases and PReLU slopes are untouched, like the reference).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _draw(rng: jax.Array, shape, init_type: str, gain: float) -> jax.Array:
    """One conv kernel in Flax HWIO layout. torch fan counts: fan_in =
    in_ch * kh * kw, fan_out = out_ch * kh * kw."""
    kh, kw, cin, cout = shape
    fan_in = cin * kh * kw
    fan_out = cout * kh * kw
    if init_type == "normal":
        return gain * jax.random.normal(rng, shape, jnp.float32)
    if init_type == "xavier":
        std = gain * jnp.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(rng, shape, jnp.float32)
    if init_type == "he":
        std = jnp.sqrt(2.0 / fan_in)
        return std * jax.random.normal(rng, shape, jnp.float32)
    if init_type == "orthogonal":
        # torch flattens to (out, in*kh*kw) and orthogonalizes rows
        flat = jax.random.normal(rng, (cout, fan_in), jnp.float32)
        q, r = jnp.linalg.qr(flat.T if fan_in >= cout else flat)
        q = q * jnp.sign(jnp.diag(r))[None, :]
        mat = q.T if fan_in >= cout else q
        return gain * mat.reshape(cout, kh, kw, cin).transpose(1, 2, 3, 0)
    raise ValueError(f"unknown init_type {init_type!r}")


def apply_weights_init(params: Any, rng: jax.Array,
                       init_type: str = "xavier",
                       gain: float = 1.4) -> Any:
    """Redraw every conv kernel (4-D leaf named 'kernel') in ``params``.

    ``init_type``: 'normal' | 'xavier' (reference default, gain 1.4) |
    'orthogonal' | 'he' | 'none' (return params unchanged, the
    reference's init_type='None')."""
    if init_type in ("none", "None", None):
        return params
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    n_kernels = sum(
        1 for path, leaf in leaves
        if getattr(leaf, "ndim", 0) == 4
        and str(path[-1]).find("kernel") >= 0)
    keys = iter(jax.random.split(rng, max(n_kernels, 1)))

    def maybe_redraw(path, leaf):
        if getattr(leaf, "ndim", 0) == 4 \
                and str(path[-1]).find("kernel") >= 0:
            return _draw(next(keys), leaf.shape, init_type, gain).astype(
                leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(maybe_redraw, params)
