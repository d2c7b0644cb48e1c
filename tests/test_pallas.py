"""Pallas kernels: parity with the jnp reference ops (interpret mode)."""
import numpy as np

import jax.numpy as jnp

from echoseal_tpu.core.params import FRAME_LEN, HDR_L, PRE_L
from echoseal_tpu.ops.demod import payload_llr
from echoseal_tpu.ops.pallas.llr_kernel import payload_llr_pallas


def test_payload_llr_pallas_parity(rng):
    n = 13  # deliberately not a multiple of the row block
    chips = rng.standard_normal((n, FRAME_LEN)).astype(np.float32) * 0.01
    pn = (2.0 * rng.integers(0, 2, (n, 1024)) - 1.0).astype(np.float32)

    ref = np.asarray(payload_llr(jnp.asarray(chips), jnp.asarray(pn)))
    got = np.asarray(payload_llr_pallas(
        jnp.asarray(chips[:, PRE_L + HDR_L:]), jnp.asarray(pn),
        interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
