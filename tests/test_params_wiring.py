"""RxParams knobs are load-bearing (VERDICT r2 item 5 / ADVICE r2).

Round 2 shipped `tight_delta/wide_delta/max_tries/peak_limit/timescale_grid`
as dataclass fields that the detector never read (it used module constants).
These tests pin the wiring: a non-default knob must change the engine's
behavior, and the legacy-plaintext acceptance must be a config decision.
"""
import numpy as np
import pytest

from echoseal_tpu.core.params import MAGIC, RxParams
from echoseal_tpu.models.embedder import BatchEmbedder

FS = 48_000


@pytest.fixture(scope="module")
def wm_clip(key32):
    """3.2 s clean watermark-only clip (floor level, silence host)."""
    be = BatchEmbedder(key32)
    T = int(3.2 * FS)
    scale = 10.0 ** (be.p.floor_rel_dbfs / 20.0)
    return be.chip_stream(T, start_ctr=0, session_nonce=bytes(8)) * scale


def test_peak_limit_reaches_scan_stage(key32, wm_clip, monkeypatch):
    """A non-default RxParams.peak_limit changes the candidate lattice."""
    from echoseal_tpu.models import detector as det

    seen = {}
    orig = det._scan_stage

    def spy(*args, **kwargs):
        seen["peak_limit"] = kwargs.get("peak_limit")
        out = orig(*args, **kwargs)
        seen["peak_shape"] = tuple(out["peak_idx"].shape)
        return out

    monkeypatch.setattr(det, "_scan_stage", spy)
    d = det.WatermarkDetector(key32, params=RxParams(peak_limit=7,
                                                     list_size=8))
    assert d.verify(wm_clip, FS) is True
    assert seen["peak_limit"] == 7
    assert seen["peak_shape"] == (4, 7)      # candidate count follows knob


def test_max_tries_budget(key32, wm_clip, monkeypatch):
    """RxParams.max_tries caps the candidate batch at 2*max_tries rows.

    Observed via the bucket helper, which sees the TRUE candidate count
    before static-shape padding.  (Whether candidate #1 of a random-padded
    clip decodes hard is rounding/rng-adjacent -- deliberately not
    asserted; the budget arithmetic is what this knob owns.)
    """
    from echoseal_tpu.models import detector as det

    seen: list[int] = []
    orig = det._cand_bucket

    def spy(n):
        seen.append(n)
        return orig(n)

    monkeypatch.setattr(det, "_cand_bucket", spy)
    d = det.WatermarkDetector(key32, params=RxParams(max_tries=1,
                                                     list_size=8))
    d.verify(wm_clip, FS)
    assert seen and max(seen) <= 2

    seen.clear()
    d = det.WatermarkDetector(key32, params=RxParams(max_tries=400,
                                                     list_size=8))
    d.verify(wm_clip, FS)
    assert seen and max(seen) > 2       # bigger budget -> more candidates


def test_timescale_grid_and_list_size_from_params(key32):
    from echoseal_tpu.models.robust import RobustVerifier

    v = RobustVerifier(key32, params=RxParams(list_size=16,
                                              timescale_grid=(1.02, 0.98)))
    assert v.timescale_grid == (1.02, 0.98)
    assert v._list_size == 16
    # explicit kwargs win over the params container
    v2 = RobustVerifier(key32, list_size=64,
                        params=RxParams(list_size=16))
    assert v2._list_size == 64


# ------------------------------------------------------- legacy plaintext
def _legacy_blob(ctr: int, nonce: bytes = b"\x07" * 8) -> bytes:
    """55-byte unsealed payload that spells magic+ctr+nonce (no AEAD)."""
    blob = MAGIC + ctr.to_bytes(4, "big") + nonce
    return blob + bytes(55 - len(blob))


def test_pipeline_legacy_plaintext_off_by_default(key32):
    from echoseal_tpu.models.pipeline import BatchVerifier

    blob = _legacy_blob(5)
    assert BatchVerifier(key32)._accept_blob(blob, 5, None) is None
    opt_in = BatchVerifier(key32, accept_legacy_plaintext=True)
    assert opt_in._accept_blob(blob, 5, None) == b"\x07" * 8
    # even opted in, a counter mismatch still rejects
    assert opt_in._accept_blob(blob, 6, None) is None


def test_detector_legacy_plaintext_gate(key32):
    from echoseal_tpu.models.detector import WatermarkDetector

    bits = np.unpackbits(np.frombuffer(_legacy_blob(5), np.uint8))
    # default: reference parity (rtwm/detector.py:206-212) -> accepted
    d = WatermarkDetector(key32)
    assert d._accept(bits, 5) is not None
    # gated off: the unauthenticated path is closed
    d2 = WatermarkDetector(key32,
                           params=RxParams(accept_legacy_plaintext=False))
    assert d2._accept(bits, 5) is None


def test_explicit_kwargs_win_over_params(key32):
    """Explicit ctor kwargs override the RxParams container.

    Both used to be silently discarded when ``params`` was given
    (detector built its RxParams only when params was None; the robust
    verifier overwrote fs_target from params unconditionally).
    """
    from echoseal_tpu.models.detector import WatermarkDetector
    from echoseal_tpu.models.robust import RobustVerifier

    d = WatermarkDetector(key32, list_size=8, params=RxParams())
    assert d._list_size == 8
    assert d.p.fs_target == 48_000            # untouched fields keep params
    d2 = WatermarkDetector(key32, fs_target=44_100,
                           params=RxParams(list_size=16))
    assert d2.fs_target == 44_100 and d2._list_size == 16

    rv = RobustVerifier(key32, list_size=8,
                        params=RxParams(list_size=64,
                                        timescale_grid=(1.0, 1.01)))
    assert rv._list_size == 8
    assert rv.timescale_grid == (1.0, 1.01)   # non-overridden field flows
