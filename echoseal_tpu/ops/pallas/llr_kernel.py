"""Pallas TPU kernel: fused despread + moment-normalised LLR.

One VMEM pass computes, per candidate row, the entire payload-LLR chain of
``ops.demod.payload_llr`` -- despread by the PN symbols, unit-power
normalisation, Gaussian-mixture amplitude/noise moment estimate, scale and
clip -- with the row block resident in VMEM (the XLA path materialises the
despread intermediate between its reductions).

Shapes are MXU/VPU-native: payload chips are (rows, 1024) f32, row blocks
of 8 (f32 sublane tile), 1024 = 8 x 128 lanes.  Numerics match
``payload_llr`` to f32 rounding (pinned by tests/test_pallas.py, which
runs the kernel in interpreter mode on CPU and natively on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8
N_PAYLOAD = 1024
CLIP = 16.0


def _kernel(chips_ref, pn_ref, out_ref):
    z = chips_ref[:, :] * pn_ref[:, :]
    power = jnp.mean(z * z, axis=-1, keepdims=True) + 1e-20
    zn = z * jax.lax.rsqrt(power)
    amp = jnp.clip(jnp.mean(jnp.abs(zn), axis=-1, keepdims=True), 0.05, 1.0)
    sigma2 = jnp.maximum(1.0 - amp * amp, 0.05)
    out_ref[:, :] = jnp.clip(2.0 * amp * zn / sigma2, -CLIP, CLIP)


@functools.partial(jax.jit, static_argnames=("interpret",))
def payload_llr_pallas(chips: jnp.ndarray, pn_sy: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """(N, 1024) payload chips x (N, 1024) +-1 PN -> (N, 1024) LLRs.

    ``N`` is padded up to a multiple of ROWS internally.
    """
    n = chips.shape[0]
    n_pad = -(-n // ROWS) * ROWS
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0))
        chips = jnp.pad(chips, pad)
        pn_sy = jnp.pad(pn_sy, pad, constant_values=1.0)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, N_PAYLOAD), jnp.float32),
        grid=(n_pad // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, N_PAYLOAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, N_PAYLOAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, N_PAYLOAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(chips.astype(jnp.float32), pn_sy.astype(jnp.float32))
    return out[:n]
