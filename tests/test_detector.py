"""RX engine: full TX -> RX roundtrips, negative cases, contract edges.

Capability note (measured, see ops/demod.py docstring): the reference wire
format -- 48 kHz chip rate through a 2 kHz order-4 Butterworth with the
polar info set on the LEAST reliable channels (the reference's
fastpolar.py:220-227 indexes its ascending-reliability table from the
front) -- is decodable only for digitally-clean captures.  The committed
reference decodes NOTHING (its matched-filter LLRs sit at chance; its own
tests/test_roundtrip_quick.py fails).  This detector recovers chips exactly
on clean captures, so positive tests here assert strictly more capability
than the reference ships, and negative tests pin the honest envelope.
"""
import numpy as np
import pytest

from echoseal_tpu.core.params import FRAME_LEN
from echoseal_tpu.models.embedder import BatchEmbedder, WatermarkEmbedder
from echoseal_tpu.models.detector import WatermarkDetector

FS = 48_000


def make_stream(key, host, block=1024):
    tx = WatermarkEmbedder(key)
    out = [tx.process(host[i : i + block]) for i in range(0, host.size, block)]
    return np.concatenate(out) if out else np.zeros(0, np.float32)


@pytest.fixture(scope="module")
def wm_silence(key32):
    return make_stream(key32, np.zeros(4 * FS, dtype=np.float32))


def test_roundtrip_silence_host(key32, wm_silence):
    det = WatermarkDetector(key32, list_size=32)
    r = det.verify_detailed(wm_silence, FS)
    assert r.authentic
    assert r.stage == "hard"          # exact chip recovery on clean capture
    assert r.frame_ctr is not None


def test_roundtrip_repeat_same_session(key32, wm_silence):
    det = WatermarkDetector(key32, list_size=32)
    assert det.verify(wm_silence, FS) is True
    # same session nonce verifies again (anti-replay latch accepts repeats)
    assert det.verify(wm_silence, FS) is True


def test_antireplay_different_session(key32):
    det = WatermarkDetector(key32, list_size=32)
    wm1 = make_stream(key32, np.zeros(4 * FS, dtype=np.float32))
    assert det.verify(wm1, FS) is True
    # a different TX session has a different 8-byte nonce -> rejected
    wm2 = make_stream(key32, np.zeros(4 * FS, dtype=np.float32))
    assert det.verify(wm2, FS) is False
    # fresh detector accepts the second session
    assert WatermarkDetector(key32, list_size=32).verify(wm2, FS) is True


def test_wrong_key_rejected(key32, wm_silence):
    det = WatermarkDetector(bytes.fromhex("bb" * 32), list_size=8)
    assert det.verify(wm_silence, FS) is False


def test_plain_noise_rejected(key32, rng):
    noise = (0.1 * rng.standard_normal(4 * FS)).astype(np.float32)
    det = WatermarkDetector(key32, list_size=8)
    assert det.verify(noise, FS) is False


def test_lowpass_strips_watermark(key32, wm_silence):
    """LPF below 4 kHz removes every hop band (reference
    test_false_positive.py behaviour)."""
    from scipy.signal import butter, lfilter

    b, a = butter(8, 3500 / (FS / 2), "low")
    stripped = lfilter(b, a, wm_silence).astype(np.float32)
    det = WatermarkDetector(key32, list_size=8)
    assert det.verify(stripped, FS) is False


def test_short_clip_rejected(key32, wm_silence):
    det = WatermarkDetector(key32, list_size=8)
    assert det.verify(wm_silence[: 2 * FS], FS) is False   # <3 s contract


def test_empty_clip_rejected(key32):
    det = WatermarkDetector(key32, list_size=8)
    assert det.verify(np.zeros(0, dtype=np.float32), FS) is False


def test_mid_stream_clip(key32):
    """Random 3.5 s excerpt from a longer stream still verifies."""
    long_wm = make_stream(key32, np.zeros(8 * FS, dtype=np.float32))
    start = 3 * FS + 517          # unaligned offset, frames ctr ~118+
    clip = long_wm[start : start + int(3.5 * FS)]
    det = WatermarkDetector(key32, list_size=32)
    r = det.verify_detailed(clip, FS)
    assert r.authentic


def test_441khz_resample_path(key32):
    """44.1 kHz input exercises the resampler and must not crash
    (reference test_edge_cases.py contract: just returns a bool)."""
    det = WatermarkDetector(key32, list_size=8)
    noise = (0.01 * np.random.default_rng(0).standard_normal(
        int(3.5 * 44_100))).astype(np.float32)
    assert isinstance(det.verify(noise, 44_100), bool)


def test_verify_raw_frame(key32):
    tx = WatermarkEmbedder(key32)
    frame = tx._make_frame_chips()
    det = WatermarkDetector(key32, list_size=32)
    assert det.verify_raw_frame(frame) is True


def test_verify_raw_frame_wrong_key(key32):
    tx = WatermarkEmbedder(key32)
    frame = tx._make_frame_chips()
    det = WatermarkDetector(bytes.fromhex("cc" * 32), list_size=8)
    assert det.verify_raw_frame(frame) is False


def test_batch_embedder_stream_verifies(key32):
    be = BatchEmbedder(key32)
    host = np.zeros(4 * FS, dtype=np.float32)
    wm = be.embed(host, session_nonce=b"unittest")
    det = WatermarkDetector(key32, list_size=32)
    assert det.verify(wm, FS) is True


def test_alternate_pn_convention_stream(key32):
    """The variant-1 rung accepts streams spread with the alternate PN.

    The reference detector retries with the PN keystream RESTARTED at the
    payload (detector.py:305-312, pn_variant=1); this pins our ladder's
    equivalent rung end-to-end: a whole stream spread with that convention
    verifies via stage 'hard-alt'/'scl-alt' (per-frame wire noise means
    any single frame may fail either convention's FEC -- the stream-level
    ladder is the contract, exactly as for the primary convention).
    """
    from scipy.signal import lfilter

    from echoseal_tpu.core.bandplan import hop_schedule
    from echoseal_tpu.core.crypto import SecureChannel
    from echoseal_tpu.core.params import HDR_L, N_DEFAULT, TxParams
    from echoseal_tpu.core.sequences import bits_to_bpsk, header_bits
    from echoseal_tpu.ops import filters
    from echoseal_tpu.ops.polar import encode_np, polar_spec

    sec = SecureChannel(key32)
    hop = hop_schedule(key32)
    spec = polar_spec()
    pre_sy = bits_to_bpsk(TxParams().preamble)
    hdr_pn_sy = bits_to_bpsk(sec.pn_bits(0, HDR_L))
    frames = []
    for ctr in range(160):
        payload = sec.seal(b"ESAL" + ctr.to_bytes(4, "big") + b"ALTPNPNA"
                           + b"\x11" * 11)
        data_sy = bits_to_bpsk(encode_np(payload, spec))
        hdr_sy = bits_to_bpsk(header_bits(ctr)) * hdr_pn_sy
        pn_alt = bits_to_bpsk(sec.pn_bits(ctr, N_DEFAULT))
        lo, hi = hop.band(ctr)
        b, a = filters.butter_coeffs(lo, hi, FS)
        zi0 = np.zeros(max(len(a), len(b)) - 1, dtype=np.float64)
        y_pre, zi1 = lfilter(b, a, pre_sy, zi=zi0)
        y_rest, _ = lfilter(
            b, a, np.concatenate((hdr_sy, data_sy * pn_alt)), zi=zi1)
        frames.append(np.concatenate((y_pre, y_rest)).astype(np.float32))
    stream = np.concatenate(frames) * 0.0178

    det = WatermarkDetector(key32, list_size=32)
    r = det.verify_detailed(stream, FS)
    assert r.authentic
    assert r.stage in ("hard-alt", "scl-alt")
