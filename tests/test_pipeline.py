"""Batched verify pipeline + shard_map scale-out."""
import numpy as np
import pytest

from echoseal_tpu.core.params import FRAME_LEN
from echoseal_tpu.models.embedder import BatchEmbedder
from echoseal_tpu.models.pipeline import BatchVerifier

FS = 48_000


@pytest.fixture(scope="module")
def batch(key32):
    """8 watermarked 3 s clips cut from mid-stream counters + verifier."""
    be = BatchEmbedder(key32)
    T = 3 * FS
    Tpad = 1 << 18
    n_frames = -(-T // FRAME_LEN)
    rng = np.random.default_rng(1)
    clips = np.zeros((8, Tpad), dtype=np.float32)
    scale = 10.0 ** (be.p.floor_rel_dbfs / 20.0)
    for i in range(8):
        sc = int(rng.integers(0, 2000))
        fr = be.frames(np.arange(sc, sc + n_frames), session_nonce=bytes(8))
        clips[i, :T] = fr.reshape(-1)[:T] * scale
    nv = np.full(8, T, dtype=np.int32)
    return clips, nv, BatchVerifier(key32, max_ctr=4096)


def test_batch_verify_true_positives(batch):
    clips, nv, bv = batch
    assert bool(np.all(bv.verify_batch(clips, nv)))


def test_batch_verify_rejects_noise(batch, rng):
    clips, nv, bv = batch
    noise = (0.05 * rng.standard_normal(clips.shape)).astype(np.float32)
    assert not bool(np.any(bv.verify_batch(noise, nv)))


def test_batch_verify_wrong_key(batch, key32):
    clips, nv, _ = batch
    bv_bad = BatchVerifier(bytes.fromhex("99" * 32), max_ctr=4096)
    assert not bool(np.any(bv_bad.verify_batch(clips, nv)))


def test_shard_map_verify_multidevice(batch):
    import jax

    from echoseal_tpu.parallel.mesh import shard_verify, streams_mesh

    clips, nv, bv = batch
    n_dev = len(jax.devices())
    assert n_dev >= 2, "conftest should provide 8 virtual CPU devices"
    mesh = streams_mesh()
    run = shard_verify(bv, mesh)
    out = run(clips, nv)
    jax.block_until_ready(out)
    assert int(out["n_crc_ok"]) >= 8        # every clip has a decode
    verdicts = bv.finish_host(out)
    assert bool(np.all(verdicts))
