"""TX engine: golden parity with the reference and device/host agreement.

Golden frames in reference_vectors.npz were produced by the reference
``WatermarkEmbedder._make_frame_chips`` (rtwm/embedder.py:78-151) with the
payload frozen to ``payloads[0]`` and frame_ctr in {0, 5, 1000}.
"""
from pathlib import Path

import numpy as np
import pytest

from echoseal_tpu.core.bandplan import hop_schedule
from echoseal_tpu.core.crypto import SecureChannel
from echoseal_tpu.core.params import FRAME_LEN, MIX_HEADROOM, TxParams
from echoseal_tpu.models.embedder import (
    BatchEmbedder,
    WatermarkEmbedder,
    synthesize_frame_np,
)

GOLD = np.load(Path(__file__).parent / "golden" / "reference_vectors.npz")


@pytest.mark.parametrize("ctr", [0, 5, 1000])
def test_frame_chips_golden_parity(key32, ctr):
    sec = SecureChannel(key32)
    hop = hop_schedule(key32)
    payload = GOLD["payloads"][0].tobytes()
    frame = synthesize_frame_np(sec, hop, ctr, payload)
    np.testing.assert_allclose(
        frame, GOLD[f"frame_{ctr}"], rtol=1e-5, atol=1e-6
    )


def test_make_frame_chips_uses_live_payload(key32):
    tx = WatermarkEmbedder(key32)
    f1 = tx._make_frame_chips()
    f2 = tx._make_frame_chips()
    assert f1.shape == (FRAME_LEN,)
    assert not np.allclose(f1, f2)  # random nonce/padding => distinct frames


def test_process_increments_counter_and_rolls_buffer(key32):
    tx = WatermarkEmbedder(key32)
    block = np.zeros(1024, dtype=np.float32)
    out = tx.process(block)
    assert out.shape == block.shape
    assert tx.frame_ctr == 1           # one 1215-chip frame generated
    assert tx._chip_buf.size == FRAME_LEN - 1024
    tx.process(np.zeros(FRAME_LEN, dtype=np.float32))
    assert tx.frame_ctr == 2


def test_process_embeds_in_silence(key32):
    tx = WatermarkEmbedder(key32)
    out = tx.process(np.zeros(4 * FRAME_LEN, dtype=np.float32))
    assert float(np.max(np.abs(out))) > 0.0  # absolute floor keeps WM alive


def test_process_never_clips(key32):
    tx = WatermarkEmbedder(key32)
    host = 0.97 * np.sign(np.sin(np.arange(8192) * 0.1)).astype(np.float32)
    out = tx.process(host)
    assert float(np.max(np.abs(out))) <= MIX_HEADROOM + 1e-6


def test_payload_layout(key32):
    tx = WatermarkEmbedder(key32)
    tx.frame_ctr = 1234
    blob = tx._build_payload()
    assert len(blob) == 55
    plain = tx.sec.open(blob)
    assert plain[:4] == b"ESAL"
    assert int.from_bytes(plain[4:8], "big") == 1234
    assert plain[8:16] == tx._session_nonce
    assert len(plain) == 27


def test_batch_embedder_matches_host_synthesis(key32):
    be = BatchEmbedder(key32)
    ctrs = np.array([0, 3, 7, 42])
    nonce = b"12345678"
    frames = be.frames(ctrs, session_nonce=nonce)
    assert frames.shape == (4, FRAME_LEN)

    # regenerate one frame host-side from the decoded payload to pin parity
    sec = SecureChannel(key32)
    hop = hop_schedule(key32)
    # host/device IIR agree to f32 accumulation error, not bit-exactness
    for i, ctr in enumerate(ctrs):
        # payloads differ per call (random nonce), so check structure instead:
        assert np.max(np.abs(frames[i])) <= 3.0 + 1e-6
        assert frames[i].dtype == np.float32


def test_batch_device_frame_close_to_host(key32):
    """Same payload through host float64 scipy and device f32 scan."""
    import jax.numpy as jnp

    from echoseal_tpu.core.params import HDR_L, PRE_L
    from echoseal_tpu.core.sequences import (
        bits_to_bpsk,
        header_bits_batch,
        mls63,
    )
    from echoseal_tpu.models.embedder import synthesize_frames_device
    from echoseal_tpu.ops import filters

    sec = SecureChannel(key32)
    hop = hop_schedule(key32)
    payload = GOLD["payloads"][0].tobytes()
    ctrs = np.array([0, 5, 1000])

    host = np.stack(
        [synthesize_frame_np(sec, hop, int(c), payload) for c in ctrs]
    )

    info = np.stack(
        [np.unpackbits(np.frombuffer(payload, dtype=np.uint8))] * len(ctrs)
    )
    hdr = header_bits_batch(ctrs)
    pn = sec.pn_bits_batch(ctrs, FRAME_LEN)[:, PRE_L + HDR_L :]
    bidx = hop.indices(ctrs)
    sos = filters.all_band_sos(48_000)
    dev = np.asarray(
        synthesize_frames_device(
            jnp.asarray(info),
            jnp.asarray(hdr),
            jnp.asarray(pn),
            jnp.asarray(bits_to_bpsk(sec.pn_bits(0, HDR_L))),
            jnp.asarray(bits_to_bpsk(mls63())),
            jnp.asarray(sos[bidx]),
        )
    )
    np.testing.assert_allclose(dev, host, atol=2e-5)
