"""Host-side crypto: key schedule, AEAD seal/open, AES-CTR PN keystream.

All crypto stays on the host CPU by design (SURVEY.md sec 7.1): PN bits and
band indices are *inputs* to the TPU programs, and AEAD verification consumes
their *outputs*.  This keeps the device code pure, static-shaped and
batchable.

Wire-compatible with the reference channel:

* HKDF-SHA256(info=b"EchoSeal:KDF:v1", 64 bytes) over the 32-byte master key
  -> aead_key (first 32) + prng_key (last 32)        (crypto.py:14-30)
* AEAD: IETF ChaCha20-Poly1305, 12-byte random nonce  (crypto.py:33-37)
* PN keystream: AES-128-ECB used as a CTR block function, sub-key =
  BLAKE2s(prng_key, digest_size=16, person=b"EchoSeal"); counter space per
  frame is ``(frame_ctr << 64) | block_idx`` as 16-byte big-endian blocks
  (utils.py:93-124); bytes -> bits MSB-first.
"""
from __future__ import annotations

import hashlib
import secrets

import numpy as np
from cryptography.hazmat.primitives import hashes
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes
from cryptography.hazmat.primitives.ciphers.aead import ChaCha20Poly1305
from cryptography.hazmat.primitives.kdf.hkdf import HKDF

_KDF_INFO = b"EchoSeal:KDF:v1"
_PN_PERSON = b"EchoSeal"


def derive_subkeys(master_key: bytes) -> tuple[bytes, bytes]:
    """HKDF split of the master key into (aead_key, prng_key)."""
    if len(master_key) != 32:
        raise ValueError("master_key must be 32 bytes (256 bit)")
    okm = HKDF(
        algorithm=hashes.SHA256(), length=64, salt=None, info=_KDF_INFO
    ).derive(master_key)
    return okm[:32], okm[32:]


class PnStream:
    """Deterministic AES-128-ECB-in-CTR-layout pseudo-random bit stream.

    The per-frame counter space reserves 2**64 blocks per frame counter, so
    streams for different frames never collide.  Unlike the reference's
    one-block-at-a-time Python loop, this implementation assembles the whole
    counter-block buffer for a batch of frames and encrypts it with a single
    OpenSSL call -- PN generation for thousands of candidate counters costs a
    single AES pass.
    """

    def __init__(self, prng_key: bytes) -> None:
        sub_key = hashlib.blake2s(
            prng_key, digest_size=16, person=_PN_PERSON
        ).digest()
        self._cipher = Cipher(algorithms.AES(sub_key), modes.ECB())

    # -------------------------------------------------------------- raw bytes
    def block_bytes(self, frame_ctrs: np.ndarray, n_bytes: int) -> np.ndarray:
        """Return a (len(frame_ctrs), n_bytes) uint8 array of keystream."""
        ctrs = np.asarray(frame_ctrs, dtype=np.uint64).ravel()
        n_blocks = (n_bytes + 15) // 16
        # counter block = 16-byte big-endian of (ctr << 64) | blk
        # => bytes [0:8] = ctr big-endian, bytes [8:16] = blk big-endian.
        buf = np.zeros((ctrs.size, n_blocks, 16), dtype=np.uint8)
        hi = ctrs[:, None].byteswap().view(np.uint8).reshape(ctrs.size, 8)
        buf[:, :, :8] = hi[:, None, :]
        blks = np.arange(n_blocks, dtype=np.uint64).byteswap()
        buf[:, :, 8:] = blks.view(np.uint8).reshape(n_blocks, 8)[None, :, :]
        enc = self._cipher.encryptor()
        ks = enc.update(buf.tobytes()) + enc.finalize()
        out = np.frombuffer(ks, dtype=np.uint8).reshape(ctrs.size, n_blocks * 16)
        return out[:, :n_bytes]

    def bits(self, frame_ctr: int, n_bits: int) -> np.ndarray:
        """PN bits {0,1} uint8 for one frame (MSB-first per byte)."""
        return self.bits_batch(np.array([frame_ctr]), n_bits)[0]

    def bits_batch(self, frame_ctrs: np.ndarray, n_bits: int) -> np.ndarray:
        """PN bits for many frames at once: (len(frame_ctrs), n_bits) uint8."""
        raw = self.block_bytes(frame_ctrs, (n_bits + 7) // 8)
        return np.unpackbits(raw, axis=1)[:, :n_bits]


class SecureChannel:
    """AEAD seal/open plus the PN-bit facade (reference crypto.py:12-48)."""

    def __init__(self, master_key: bytes) -> None:
        aead_key, prng_key = derive_subkeys(master_key)
        self._aead = ChaCha20Poly1305(aead_key)
        self._pn = PnStream(prng_key)

    # ---------------------------------------------------------------- AEAD
    def seal(self, plaintext: bytes) -> bytes:
        """nonce(12) || ciphertext || tag(16)."""
        nonce = secrets.token_bytes(12)
        return nonce + self._aead.encrypt(nonce, plaintext, b"")

    def open(self, blob: bytes) -> bytes:
        """Inverse of :meth:`seal`; raises on authentication failure."""
        if len(blob) < 12 + 16:
            raise ValueError("ciphertext too short")
        return self._aead.decrypt(blob[:12], blob[12:], b"")

    def open_any_layout(self, blob: bytes) -> tuple[bytes | None, str | None]:
        """Try nonce-front then nonce-tail AEAD layouts (detector.py:418-448)."""
        if len(blob) >= 12:
            try:
                return self._aead.decrypt(blob[:12], blob[12:], b""), "nonce-front"
            except Exception:
                pass
            try:
                return self._aead.decrypt(blob[-12:], blob[:-12], b""), "nonce-tail"
            except Exception:
                pass
        return None, None

    # ------------------------------------------------------------------ PN
    def pn_bits(self, frame_ctr: int, n_bits: int) -> np.ndarray:
        return self._pn.bits(frame_ctr, n_bits)

    def pn_bits_batch(self, frame_ctrs: np.ndarray, n_bits: int) -> np.ndarray:
        return self._pn.bits_batch(frame_ctrs, n_bits)
