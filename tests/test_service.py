"""Multi-key serving pool: per-tenant verifiers, LRU bounds, isolation."""
import numpy as np

from echoseal_tpu.core.params import FRAME_LEN
from echoseal_tpu.models.embedder import BatchEmbedder
from echoseal_tpu.models.service import VerifierPool

FS = 48_000
KEY_A = bytes.fromhex("aa" * 32)
KEY_B = bytes.fromhex("bb" * 32)


def _clips(key, n=2):
    be = BatchEmbedder(key)
    T = 3 * FS
    Tpad = 1 << 18
    n_frames = -(-T // FRAME_LEN)
    scale = 10.0 ** (be.p.floor_rel_dbfs / 20.0)
    clips = np.zeros((n, Tpad), dtype=np.float32)
    for i in range(n):
        fr = be.frames(np.arange(i * 7, i * 7 + n_frames),
                       session_nonce=bytes(8))
        clips[i, :T] = fr.reshape(-1)[:T] * scale
    return clips, np.full(n, T, dtype=np.int32)


def test_pool_per_key_isolation():
    pool = VerifierPool(max_keys=4, max_ctr=2048)
    ca, nva = _clips(KEY_A)
    cb, nvb = _clips(KEY_B)
    assert pool.verify(KEY_A, ca, nva).all()
    assert pool.verify(KEY_B, cb, nvb).all()
    # cross-key: tenant B's verifier must reject tenant A's clips
    assert not pool.verify(KEY_B, ca, nva).any()
    assert set(pool.cached_keys) == {KEY_A, KEY_B}


def test_pool_lru_eviction_still_correct():
    pool = VerifierPool(max_keys=1, max_ctr=2048)
    ca, nva = _clips(KEY_A)
    cb, nvb = _clips(KEY_B)
    assert pool.verify(KEY_A, ca, nva).all()
    assert pool.verify(KEY_B, cb, nvb).all()     # evicts A
    assert pool.cached_keys == [KEY_B]
    assert pool.verify(KEY_A, ca, nva).all()     # rebuilt transparently
    assert pool.cached_keys == [KEY_A]
