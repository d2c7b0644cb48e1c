"""Robust (v2) profile: roundtrips through channels compat cannot survive.

Measured envelope at oversample=8 (core/profiles.py): clean, loud-host
(watermark 11x below host), and MP3-128k-sim captures verify; heavy AWGN
needs the higher-regularisation profile planned next round.
"""
import numpy as np
import pytest

from echoseal_tpu.models.robust import RobustEmbedder, RobustVerifier
from echoseal_tpu.utils import channels

FS = 48_000


@pytest.fixture(scope="module")
def wm_loud_host(key32):
    host = (0.2 * np.sin(2 * np.pi * 700 * np.arange(4 * FS) / FS)
            ).astype(np.float32)
    tx = RobustEmbedder(key32)
    return tx.process(host)


def test_v2_loud_host_roundtrip(key32, wm_loud_host):
    """Host 11x louder than the watermark -- impossible in compat mode."""
    assert RobustVerifier(key32).verify(wm_loud_host, FS) is True


def test_v2_mp3_sim_roundtrip(key32, wm_loud_host):
    mp3 = channels.codec_sim(wm_loud_host[: int(3.5 * FS)], 128.0)
    assert RobustVerifier(key32).verify(mp3, FS) is True


def test_v2_silence_host(key32):
    tx = RobustEmbedder(key32)
    wm = tx.process(np.zeros(4 * FS, dtype=np.float32))
    assert RobustVerifier(key32).verify(wm, FS) is True


def test_v2_reverb_acoustic_capture(key32, wm_loud_host):
    """Acoustic capture: v2 survives room reverb (the reference's "3 s
    smartphone recording" scenario, README.md:10 -- untested there).

    Measured envelope (benchmarks/reverb_envelope.json): hard decode to
    12 dB direct-to-reverberant ratio, SCL rung carries 6..0 dB at every
    RT60 up to 800 ms, boundary -3 dB.  Pinned here at a mid point
    (6 dB, 150 ms -- phone at arm's length) and a far-field extreme; the
    wrong-key rejection must hold under reverb too.
    """
    rv = RobustVerifier(key32)
    mid = channels.reverb(wm_loud_host, 150.0, direct_to_reverb_db=6.0,
                          rng=np.random.default_rng(5))
    assert rv.verify(mid, FS) is True
    far = channels.reverb(wm_loud_host, 400.0, direct_to_reverb_db=0.0,
                          rng=np.random.default_rng(5))
    assert rv.verify(far, FS) is True
    wrong = RobustVerifier(bytes.fromhex("33" * 32))
    assert wrong.verify(mid, FS) is False


def test_v2_wrong_key_rejected(key32, wm_loud_host):
    assert RobustVerifier(bytes.fromhex("33" * 32)).verify(
        wm_loud_host, FS) is False


def test_v2_short_clip_rejected(key32, wm_loud_host):
    assert RobustVerifier(key32).verify(wm_loud_host[: 2 * FS], FS) is False


def test_v2_timescale_grid(key32, wm_loud_host):
    """+5% playback speed recovers through the resample search grid."""
    scaled = channels.time_scale(wm_loud_host, 1.05)
    rv = RobustVerifier(key32, timescale_grid=(1.0, 0.9524))
    assert rv.verify(scaled, FS) is True


def test_v2_timescale_unknown_factor(key32, wm_loud_host):
    """Arbitrary playback-speed changes recover with NO caller hint.

    The recovery ladder (models/robust.py verify_detailed): sync-only
    scaled-template scan pins the correction to the 0.33% grid, then the
    inter-peak spacing estimator refines to ~5e-5 residual -- inside the
    demod window's ~2e-4 chip-coherence limit.  Factors here are NOT on
    the scan grid and no timescale_grid hint is given; a 5-point random
    sweep (rng-drawn factors in [0.95, 1.05]) recovered 5/5 -- these two
    keep CI fast while covering both ladder exits (fine-refine from the
    unscaled clip's own peaks, and the full scan path).
    """
    for f in (1.0012, 1.0065):
        scaled = channels.time_scale(wm_loud_host, f)
        r = RobustVerifier(key32).verify_detailed(scaled, FS)
        assert r.authentic, f"factor {f} not recovered"
        assert r.timescale is not None    # went through the recovery ladder


def test_v2_noise_only_rejected(key32, rng):
    noise = (0.1 * rng.standard_normal(4 * FS)).astype(np.float32)
    assert RobustVerifier(key32).verify(noise, FS) is False


@pytest.fixture(scope="module")
def wm_speech_host(key32):
    """Watermark under a wideband speech-surrogate host (VERDICT r4 #3).

    channels.speech_host synthesizes formant-filtered pulse-train
    speech (pitch contours, fricative onsets, syllabic envelope) at the
    same 0.15-ish level as the tone fixtures -- the host class the
    reference actually targets (live speech) but never measured.
    """
    host = channels.speech_host(4.0, FS, rng=np.random.default_rng(42))
    tx = RobustEmbedder(key32)
    # block-wise embed: the live TX path calls process() per ~21 ms
    # block, so the watermark level tracks the syllabic envelope (a
    # single whole-signal call would flat-scale against the global rms)
    return np.concatenate([tx.process(host[i: i + 1024])
                           for i in range(0, host.size, 1024)])


def test_v2_speech_host_roundtrip(key32, wm_speech_host):
    assert RobustVerifier(key32).verify(wm_speech_host, FS) is True


def test_v2_speech_host_mp3_128k(key32, wm_speech_host):
    """REAL MPEG-1 Layer III at 128 kbps under the speech host.

    The real codec's masking-driven bit allocation gives the watermark
    bands bits wherever the watermark is the band's signal, so the
    in-repo L3 codec (the literal reference claim) passes; the crude
    ``codec_sim`` (per-bin magnitude-proportional noise, no masking
    model) is measurably HARSHER than any real codec on a broadband
    host and fails here even at 192 kbps -- pinned as the documented
    envelope break in test_v2_speech_host_sim_breaks below.
    """
    mp3 = channels.codec_mpeg1_l3(wm_speech_host[: int(3.5 * FS)], 128)
    assert RobustVerifier(key32).verify(mp3, FS) is True


def test_v2_speech_host_sim_breaks(key32, wm_speech_host):
    """Documented envelope: the windowed-DFT codec SIM over-penalises a
    broadband host (noise in every bin proportional to host magnitude,
    no masking allocation) and kills the watermark where a real
    perceptual codec does not.  Measured False; if a demod improvement
    flips this row, update the pin -- it guards the CLAIM WORDING (the
    MP3 survival claim holds for real codecs, not for this sim on
    speech)."""
    sim = channels.codec_sim(wm_speech_host[: int(3.5 * FS)], 128.0)
    assert RobustVerifier(key32).verify(sim, FS) is False


def test_v2_speech_host_reverb(key32, wm_speech_host):
    cap = channels.reverb(wm_speech_host, 150.0, direct_to_reverb_db=6.0,
                          rng=np.random.default_rng(9))
    assert RobustVerifier(key32).verify(cap, FS) is True


def test_v2_speech_host_wrong_key(wm_speech_host):
    assert RobustVerifier(b"\x07" * 32).verify(wm_speech_host, FS) is False


def test_speech_host_is_speech_shaped():
    """The surrogate is wideband, nonstationary, and level-calibrated."""
    x = channels.speech_host(3.0, FS, rng=np.random.default_rng(1))
    assert x.shape == (3 * FS,) and x.dtype == np.float32
    # deterministic for a pinned rng
    y = channels.speech_host(3.0, FS, rng=np.random.default_rng(1))
    np.testing.assert_array_equal(x, y)
    # active-region RMS calibrated to the requested level, then peak-
    # normalised under the mixer headroom (speech crest factor >10 dB)
    act = np.abs(x) > 1e-6
    rms = float(np.sqrt(np.mean(x[act] ** 2)))
    assert 0.05 <= rms <= 0.18
    assert float(np.abs(x).max()) <= 0.7 + 1e-6
    # syllabic nonstationarity: frame energies span >= 20 dB
    fr = x[: (x.size // 4800) * 4800].reshape(-1, 4800)
    e = np.sqrt(np.mean(fr ** 2, axis=1)) + 1e-12
    assert 20.0 * np.log10(e.max() / (np.percentile(e, 10) + 1e-12)) > 20.0
    # wideband: energy both below 1 kHz (voicing) and above 2 kHz
    # (formants/fricatives), unlike any pure-tone fixture
    spec = np.abs(np.fft.rfft(x)) ** 2
    f = np.fft.rfftfreq(x.size, 1.0 / FS)
    lo = spec[(f > 80) & (f < 1000)].sum()
    hi = spec[(f > 2000) & (f < 9000)].sum()
    assert lo > 0 and hi > 0
    assert hi / (lo + hi) > 0.02
