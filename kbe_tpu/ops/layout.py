"""Activation re-layout for conv-output consumers.

On TPU, XLA assigns convolution outputs an MXU-friendly tiled layout.
When such an activation feeds a large data reorganization — here the
splat renderers' records pack (stack + reshape + transpose into
(chunks, planes * 8, 128) DMA blocks, ops/splat_banded.py) — the layout
conversion is lowered catastrophically: the 68-channel inpaint-bootstrap
render measured 543 ms when its context payload came from a conv vs
60 ms for the identical payload passed as a program input (v5e, 1024^2).
An `optimization_barrier` does not help (it pins the bad layout), and a
flattening copy still pays ~70 ms for the conversion itself.

Routing the activation through an identity matmul re-materializes it in
the canonical layout at MXU speed: the same render drops to 71 ms.
The product is exact for bf16 inputs (one non-zero product per output,
f32 accumulation), so `relayout` is safe wherever activations are
bf16-valued — which all bf16-mode network outputs are, even after an
`astype(float32)`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def relayout(x: jax.Array) -> jax.Array:
    """Re-materialize ``x`` in canonical layout via a bf16 identity
    matmul over the trailing (channel) dimension.

    Lossless only for bf16-representable values — use on activations of
    bf16-mode networks. Shape and dtype are preserved.
    """
    c = x.shape[-1]
    eye = jnp.eye(c, dtype=jnp.bfloat16)
    out = jnp.einsum("...c,cf->...f", x.astype(jnp.bfloat16), eye,
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)

