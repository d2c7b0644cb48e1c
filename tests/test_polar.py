"""Polar codec: encoder parity, CRC, hard-decision path, vectorised SCL."""
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from echoseal_tpu.ops.polar import (
    crc8_bits,
    crc8_check_batch,
    crc8_matrix,
    encode_batch,
    encode_np,
    hard_decode_batch,
    pack_info_bits,
    polar_spec,
    polar_transform,
    polar_transform_np,
)
from echoseal_tpu.ops.scl import scl_decode_np

GOLD = np.load(Path(__file__).parent / "golden" / "reference_vectors.npz")
SPEC = polar_spec()


def test_encode_parity_with_reference():
    for i in range(GOLD["payloads"].shape[0]):
        payload = GOLD["payloads"][i].tobytes()
        np.testing.assert_array_equal(encode_np(payload, SPEC),
                                      GOLD["codewords"][i])


def test_polar_transform_is_involution(rng):
    u = rng.integers(0, 2, size=(4, 1024)).astype(np.uint8)
    np.testing.assert_array_equal(polar_transform_np(polar_transform_np(u)), u)
    d = np.asarray(polar_transform(polar_transform(jnp.asarray(u, jnp.int32))))
    np.testing.assert_array_equal(d.astype(np.uint8), u)


def test_crc8_linear_matrix_matches_bitwise(rng):
    m = crc8_matrix(440)
    for _ in range(5):
        bits = rng.integers(0, 2, size=440).astype(np.uint8)
        lin = (bits.astype(np.int64) @ m) % 2
        np.testing.assert_array_equal(lin.astype(np.uint8), crc8_bits(bits))


def test_encode_batch_matches_host(rng):
    infos = rng.integers(0, 2, size=(3, 440)).astype(np.uint8)
    dev = np.asarray(encode_batch(jnp.asarray(infos), SPEC))
    for i in range(3):
        host = encode_np(np.packbits(infos[i]).tobytes(), SPEC)
        np.testing.assert_array_equal(dev[i].astype(np.uint8), host)


def test_hard_decode_clean(rng):
    payloads = [rng.bytes(55) for _ in range(3)]
    llr = np.stack([
        (2.0 * encode_np(p, SPEC).astype(np.float32) - 1.0) * 6.0
        for p in payloads
    ])
    info, ok = hard_decode_batch(jnp.asarray(llr), SPEC)
    assert bool(np.all(np.asarray(ok)))
    for i, p in enumerate(payloads):
        assert pack_info_bits(np.asarray(info[i])) == p


def test_hard_decode_rejects_noise(rng):
    llr = rng.standard_normal((2, 1024)).astype(np.float32) * 4.0
    _, ok = hard_decode_batch(jnp.asarray(llr), SPEC)
    assert not bool(np.any(np.asarray(ok)))


def test_scl_noiseless(rng):
    payload = rng.bytes(55)
    llr = (2.0 * encode_np(payload, SPEC).astype(np.float32) - 1.0) * 5.0
    out = scl_decode_np(llr, SPEC, list_size=8)
    assert bool(out["crc_ok"][0])
    assert pack_info_bits(out["info_bits"][0]) == payload
    assert np.all(np.diff(out["metrics"]) >= 0)  # sorted by metric


def test_scl_awgn_sigma015(rng):
    """Reference FEC operating point: decodes at sigma=0.15 (test_polar.py)."""
    sigma = 0.15
    payloads = [rng.bytes(55) for _ in range(4)]
    llr = np.stack([
        (2.0 / sigma**2)
        * ((2.0 * encode_np(p, SPEC).astype(np.float32) - 1.0)
           + sigma * rng.standard_normal(1024).astype(np.float32))
        for p in payloads
    ])
    out = scl_decode_np(llr, SPEC, list_size=8)
    for i, p in enumerate(payloads):
        assert bool(out["crc_ok"][i, 0])
        assert pack_info_bits(out["info_bits"][i, 0]) == p


def test_scl_flipped_sign_fails(rng):
    """Sign convention check: negated LLRs must not decode."""
    payload = rng.bytes(55)
    llr = -(2.0 * encode_np(payload, SPEC).astype(np.float32) - 1.0) * 5.0
    out = scl_decode_np(llr, SPEC, list_size=2)
    decoded = (
        bool(out["crc_ok"][0])
        and pack_info_bits(out["info_bits"][0]) == payload
    )
    assert not decoded


def test_crc_check_batch_device(rng):
    bits = rng.integers(0, 2, size=(4, 440)).astype(np.int32)
    crcs = np.stack([crc8_bits(b) for b in bits]).astype(np.int32)
    ok = crc8_check_batch(jnp.asarray(bits), jnp.asarray(crcs), SPEC.crc_mat)
    assert bool(np.all(np.asarray(ok)))
    bad = crcs.copy()
    bad[:, 0] ^= 1
    ok2 = crc8_check_batch(jnp.asarray(bits), jnp.asarray(bad), SPEC.crc_mat)
    assert not bool(np.any(np.asarray(ok2)))
