"""REAL codec round-trips (stdlib audioop): the measured envelope pins.

The reference claims codec survival with no test (reference
README.md:163; SURVEY.md §6).  This image has no ffmpeg/lame/sox, but
stdlib ``audioop`` ships actual encoder/decoder pairs for G.711
mu-law / A-law (8-bit companding) and IMA ADPCM (4-bit differential),
plus a real linear-interpolation rate converter -- so these rows are
genuine encode->decode round-trips, not simulations.  Verdicts are
pinned to the measured envelope (benchmarks/codec_envelope.json); if a
demod improvement flips a rejected row to True, update the pin -- the
wrong-key rows must NEVER flip.
"""
import numpy as np
import pytest

from echoseal_tpu.models.robust import RobustEmbedder, RobustVerifier
from echoseal_tpu.utils import channels

pytest.importorskip("audioop")

FS = 48_000


@pytest.fixture(scope="module")
def v2_clip(key32):
    tx = RobustEmbedder(key32)
    tx._session_nonce = b"codecpin"
    host = (0.15 * np.sin(2 * np.pi * 700 * np.arange(6 * FS) / FS)
            ).astype(np.float32)
    wm = tx.process(host)
    return np.ascontiguousarray(wm[FS : FS + 4 * FS])


def test_ulaw_roundtrip_bitwidth():
    """mu-law is a real 8-bit codec: output is quantised, non-identical."""
    rng = np.random.default_rng(0)
    x = (0.3 * rng.standard_normal(4096)).astype(np.float32)
    y = channels.codec_ulaw(x)
    err = x - y
    assert 1e-4 < float(np.sqrt(np.mean(err * err))) < 0.05
    # companding: small samples get FINER steps than large ones
    assert np.unique(np.round(y * 32767)).size < 256 + 1


def test_v2_survives_ulaw(key32, v2_clip):
    y = channels.codec_ulaw(v2_clip)
    assert RobustVerifier(key32).verify(y, FS) is True
    assert RobustVerifier(bytes.fromhex("44" * 32)).verify(y, FS) is False


def test_v2_survives_alaw(key32, v2_clip):
    assert RobustVerifier(key32).verify(
        channels.codec_alaw(v2_clip), FS) is True


def test_v2_adpcm_envelope(key32, v2_clip):
    """IMA ADPCM (4-bit differential) survives: the measured pin.

    Measured accept 1.0 over independent (nonce, excerpt) draws
    (benchmarks/codec_envelope.json) -- the 8x-oversampled v2 chips keep
    enough per-chip energy below ADPCM's slope-noise knee.  Wrong key
    must reject regardless.
    """
    y = channels.codec_adpcm(v2_clip)
    assert RobustVerifier(key32).verify(y, FS) is True
    assert RobustVerifier(bytes.fromhex("44" * 32)).verify(y, FS) is False


def test_v2_ratecv_capture(key32, v2_clip):
    """48 kHz playback captured by a 44.1 kHz clock via audioop.ratecv."""
    y = channels.codec_ratecv(v2_clip, FS, 44_100)
    assert RobustVerifier(key32).verify(y, 44_100) is True


def test_compat_rejects_real_codec_gracefully(key32):
    """Compat (digitally-clean carrier) rejects an 8-bit trunk capture.

    Measured envelope (benchmarks/codec_envelope.json): compat accept 0.0
    through every real codec, wrong-key accept 0.0 -- graceful rejection,
    no false positives.  If a demod improvement flips the right-key row
    to True, update the pin; the wrong-key row must NEVER flip.
    """
    from echoseal_tpu.models.detector import WatermarkDetector
    from echoseal_tpu.models.embedder import BatchEmbedder

    be = BatchEmbedder(key32)
    wm = be.embed(np.zeros(5 * FS, dtype=np.float32),
                  session_nonce=b"codecrej")
    y = channels.codec_ulaw(wm[: 4 * FS])
    assert WatermarkDetector(key32, list_size=16).verify(y, FS) is False
    assert WatermarkDetector(bytes.fromhex("44" * 32),
                             list_size=8).verify(y, FS) is False
