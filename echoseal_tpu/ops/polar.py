"""Polar(N, K) code structure: frozen sets, CRC-8, encoder, hard decoder.

The code is CRC-aided: the K = info + 8 "data" bits occupy the K most
reliable synthesized channels of the 3GPP reliability ordering (most->least
convention: the first K table entries are the information set, matching
rtwm/fastpolar.py:220-227).  CRC-8 uses poly 0x07, init 0, no final XOR --
a purely *linear* map over GF(2), which we exploit on device: the CRC of a
batch of candidate bit-vectors is one integer matmul mod 2.

The polar transform (encode butterfly) is its own inverse over GF(2); the
hard-decision "fast path" of the list decoder is therefore: threshold the
LLRs, run the same butterfly, read the data positions, check CRC
(fastpolar.py:261-276) -- all trivially batched.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from echoseal_tpu.core.params import CRC_SIZE, K_DEFAULT, N_DEFAULT
from echoseal_tpu.data.q1024 import reliability_sequence

CRC_POLY = 0x07


# ------------------------------------------------------------------- CRC-8
def crc8_bits(bits: np.ndarray) -> np.ndarray:
    """Bitwise CRC-8 (poly 0x07) of a {0,1} bit vector -> 8 bits MSB-first."""
    reg = 0
    for bit in np.asarray(bits).astype(np.uint8):
        reg ^= (int(bit) & 1) << 7
        reg = ((reg << 1) ^ CRC_POLY) & 0xFF if reg & 0x80 else (reg << 1) & 0xFF
    return np.unpackbits(np.array([reg], dtype=np.uint8))


@lru_cache(maxsize=8)
def crc8_matrix(n_bits: int) -> np.ndarray:
    """(n_bits, 8) GF(2) generator matrix: crc(v) == (v @ M) % 2."""
    m = np.zeros((n_bits, 8), dtype=np.int32)
    for i in range(n_bits):
        e = np.zeros(n_bits, dtype=np.uint8)
        e[i] = 1
        m[i] = crc8_bits(e)
    return m


def crc8_check_batch(info_bits, crc_bits, crc_mat) -> jnp.ndarray:
    """Vectorised CRC check: (..., info) x (..., 8) -> (...,) bool."""
    calc = jnp.mod(
        jnp.einsum("...i,ij->...j", info_bits.astype(jnp.int32),
                   jnp.asarray(crc_mat)),
        2,
    )
    return jnp.all(calc == crc_bits.astype(jnp.int32), axis=-1)


# ----------------------------------------------------------- code structure
# eq=False => identity hash, so the (lru-cached, hence unique) spec can be a
# static argument to jitted functions despite holding numpy arrays.
@dataclass(frozen=True, eq=False)
class PolarSpec:
    """Static structure of a Polar(N, K) CRC-aided code."""

    N: int
    K: int
    crc_size: int
    frozen: np.ndarray       # (N,) bool, True = frozen
    data_pos: np.ndarray     # (K,) int64 indices of data (info+crc) bits
    crc_mat: np.ndarray      # (K - crc_size, 8) GF(2) CRC generator

    @property
    def n_stages(self) -> int:
        return int(np.log2(self.N))

    @property
    def info_len(self) -> int:
        return self.K - self.crc_size


@lru_cache(maxsize=8)
def polar_spec(N: int = N_DEFAULT, K: int = K_DEFAULT,
               crc_size: int = CRC_SIZE) -> PolarSpec:
    if N <= 0 or (N & (N - 1)) != 0:
        raise ValueError("N must be a positive power of 2")
    if not 0 < K <= N:
        raise ValueError("need 0 < K <= N")
    if not 0 < crc_size < K:
        raise ValueError("need 0 < crc_size < K")
    rel = reliability_sequence(N)
    frozen = np.ones(N, dtype=bool)
    frozen[rel[:K]] = False
    data_pos = np.flatnonzero(~frozen)
    return PolarSpec(N=N, K=K, crc_size=crc_size, frozen=frozen,
                     data_pos=data_pos, crc_mat=crc8_matrix(K - crc_size))


# -------------------------------------------------------------- transform
def polar_transform_np(u: np.ndarray) -> np.ndarray:
    """GF(2) butterfly x = u G_N on the host (last axis = code axis)."""
    x = np.asarray(u, dtype=np.uint8).copy()
    N = x.shape[-1]
    n = int(np.log2(N))
    for s in range(n):
        half = 1 << s
        y = x.reshape(x.shape[:-1] + (N // (2 * half), 2, half))
        y[..., 0, :] ^= y[..., 1, :]
        x = y.reshape(x.shape)
    return x


def polar_transform(u: jnp.ndarray) -> jnp.ndarray:
    """GF(2) butterfly on device (int dtype, last axis = code axis)."""
    x = u
    N = x.shape[-1]
    n = int(np.log2(N))
    lead = x.shape[:-1]
    for s in range(n):
        half = 1 << s
        y = x.reshape(lead + (N // (2 * half), 2, half))
        left = jnp.bitwise_xor(y[..., 0, :], y[..., 1, :])
        x = jnp.stack([left, y[..., 1, :]], axis=-2).reshape(lead + (N,))
    return x


# ------------------------------------------------------------------ encode
def encode_np(payload: bytes, spec: PolarSpec | None = None) -> np.ndarray:
    """Host encoder: payload bytes -> (N,) uint8 codeword bits."""
    spec = spec or polar_spec()
    if len(payload) * 8 != spec.info_len:
        raise ValueError(f"payload must be {spec.info_len // 8} bytes")
    info = np.unpackbits(np.frombuffer(payload, dtype=np.uint8))
    data = np.concatenate([info, crc8_bits(info)])
    u = np.zeros(spec.N, dtype=np.uint8)
    u[spec.data_pos] = data
    return polar_transform_np(u)


def encode_batch(info_bits: jnp.ndarray, spec: PolarSpec) -> jnp.ndarray:
    """Device encoder: (..., info_len) {0,1} -> (..., N) codeword bits."""
    info = info_bits.astype(jnp.int32)
    crc = jnp.mod(
        jnp.einsum("...i,ij->...j", info, jnp.asarray(spec.crc_mat)), 2
    )
    data = jnp.concatenate([info, crc], axis=-1)
    u = jnp.zeros(info.shape[:-1] + (spec.N,), dtype=jnp.int32)
    u = u.at[..., jnp.asarray(spec.data_pos)].set(data)
    return polar_transform(u)


# ------------------------------------------------- hard-decision fast path
def hard_decode_batch(llr: jnp.ndarray, spec: PolarSpec):
    """Batched hard decode: (..., N) LLR (positive => bit 1).

    Returns (info_bits (..., info_len) int32, crc_ok (...,) bool).
    """
    hard = (llr > 0.0).astype(jnp.int32)
    u_hat = polar_transform(hard)
    data = u_hat[..., jnp.asarray(spec.data_pos)]
    info = data[..., : spec.info_len]
    crc = data[..., spec.info_len:]
    ok = crc8_check_batch(info, crc, spec.crc_mat)
    # the all-zero word is a valid codeword with CRC 0, so silent/garbage
    # windows would "pass" -- real payloads are AEAD blobs, never all-zero
    ok = ok & jnp.any(info != 0, axis=-1)
    return info, ok


def pack_info_bits(info_bits: np.ndarray) -> bytes:
    """(info_len,) {0,1} -> payload bytes."""
    return np.packbits(np.asarray(info_bits, dtype=np.uint8)).tobytes()
