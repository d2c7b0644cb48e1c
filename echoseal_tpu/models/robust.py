"""Robust (v2) waveform: oversampled-chip TX and verifier.

Same crypto, frame layout (63/128/1024 chips), hop schedule, payload
format and mixing law as the compat path -- but each chip is HELD for
``profile.oversample`` samples before the band-pass, concentrating its
energy in band, and the polar info set follows the standard convention.
The result survives real channels (loud hosts, MP3-style codecs, moderate
noise) that the reference wire format physically cannot
(core/profiles.py).

The receiver reuses the chip-domain machinery end-to-end: LS demod against
the oversampled forward model, then the SAME header decode / LLR / SCL /
AEAD chain as compat -- only the demod matrices and sync templates change.
"""
from __future__ import annotations

import functools
import secrets
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla
from scipy.signal import lfilter

from echoseal_tpu.core.bandplan import BAND_PLAN, hop_schedule
from echoseal_tpu.core.crypto import SecureChannel
from echoseal_tpu.core.params import (
    EPS,
    FRAME_LEN,
    HDR_L,
    MAGIC,
    MIX_HEADROOM,
    PRE_L,
    TxParams,
)
from echoseal_tpu.core.profiles import ROBUST, WaveformProfile, profile_spec
from echoseal_tpu.core.sequences import bits_to_bpsk, header_bits, mls63
from echoseal_tpu.models.detector import resample_to
from echoseal_tpu.models.embedder import db_to_lin
from echoseal_tpu.ops import demod, filters
from echoseal_tpu.ops.polar import encode_np, hard_decode_batch, pack_info_bits
from echoseal_tpu.ops.scl import scl_decode

MIN_CLIP_SECONDS = 3.0
# LS regularisation ladder for the oversampled model: the in-band energy
# concentration makes conditioning mild, so two profiles suffice
LAM_PROFILES = (1e-6, 1e-3)


# --------------------------------------------------------------- host model
@lru_cache(maxsize=32)
def _chip_pulse(lo: float, hi: float, fs: int, S: int, span: int) -> np.ndarray:
    """Zero-state filtered S-sample box pulse, length ``span``."""
    b, a = filters.butter_coeffs(lo, hi, fs)
    box = np.zeros(span)
    box[:S] = 1.0
    return lfilter(b, a, box)


@lru_cache(maxsize=32)
def robust_demod_matrix(lo: float, hi: float, fs: int, S: int,
                        lam: float) -> np.ndarray:
    """(FRAME_LEN, span) float32 LS chip-recovery matrix."""
    span = FRAME_LEN * S
    g = _chip_pulse(lo, hi, fs, S, span)
    T = np.zeros((span, FRAME_LEN))
    for j in range(FRAME_LEN):
        L = span - j * S
        T[j * S :, j] = g[:L]
    A = T.T @ T + lam * np.eye(FRAME_LEN)
    M = sla.cho_solve(sla.cho_factor(A), T.T)
    return M.astype(np.float32)


@lru_cache(maxsize=8)
def robust_templates(fs: int, S: int) -> np.ndarray:
    """(4, 63*S) unit-norm sync templates (filtered oversampled MLS)."""
    pre = np.repeat(bits_to_bpsk(mls63(), dtype=np.float64), S)
    out = []
    for lo, hi in BAND_PLAN:
        b, a = filters.butter_coeffs(lo, hi, fs)
        t = lfilter(b, a, pre)
        out.append((t / (np.linalg.norm(t) + 1e-12)).astype(np.float32))
    return np.stack(out)


# ------------------------------------------------------------------ TX side
class RobustEmbedder:
    """Streaming v2 watermark mixer (same `process` surface as compat)."""

    def __init__(self, key32: bytes, params: TxParams | None = None,
                 profile: WaveformProfile = ROBUST) -> None:
        self.p = params or TxParams()
        self.profile = profile
        self.sec = SecureChannel(key32)
        self._hop = hop_schedule(key32)
        self._spec = profile_spec(profile)
        self.frame_ctr = 0
        self._chip_buf = np.empty(0, dtype=np.float32)
        self._session_nonce = secrets.token_bytes(8)
        self._preamble_sy = bits_to_bpsk(self.p.preamble)
        self._hdr_pn_sy = bits_to_bpsk(self.sec.pn_bits(0, HDR_L))

    def process(self, samples: np.ndarray) -> np.ndarray:
        x = np.asarray(samples).astype(np.float32, copy=False)
        in_rms = float(np.sqrt(np.mean(x * x)) + EPS) if x.size else EPS
        while self._chip_buf.size < x.size:
            self._chip_buf = np.concatenate(
                (self._chip_buf, self._make_frame()))
            self.frame_ctr = (self.frame_ctr + 1) % (2**32)
        chips = self._chip_buf[: x.size]
        self._chip_buf = self._chip_buf[x.size :]
        scale = max(db_to_lin(self.p.target_rel_db) * in_rms,
                    db_to_lin(self.p.floor_rel_dbfs))
        headroom = max(MIX_HEADROOM - float(np.max(np.abs(x), initial=0.0)),
                       0.0)
        peak = float(np.max(np.abs(chips), initial=0.0)) + EPS
        scale = min(scale, headroom / peak) if peak > 0.0 else 0.0
        return x + chips * scale

    def embed(self, host: np.ndarray,
              session_nonce: bytes | None = None) -> np.ndarray:
        if session_nonce is not None:
            self._session_nonce = session_nonce
        return self.process(host)

    def _make_frame(self) -> np.ndarray:
        S = self.profile.oversample
        ctr = self.frame_ctr
        band = self._hop.band(ctr)
        meta = (MAGIC + ctr.to_bytes(4, "big") + self._session_nonce
                + secrets.token_bytes(11))
        payload = self.sec.seal(meta)
        data_sy = bits_to_bpsk(encode_np(payload, self._spec))
        hdr_sy = bits_to_bpsk(header_bits(ctr)) * self._hdr_pn_sy
        pn = self.sec.pn_bits(ctr, FRAME_LEN)[PRE_L + HDR_L :]
        spread = data_sy * bits_to_bpsk(pn)
        sym = np.concatenate([self._preamble_sy, hdr_sy, spread])
        up = np.repeat(sym.astype(np.float64), S)
        b, a = filters.butter_coeffs(band[0], band[1], self.p.fs)
        chips = lfilter(b, a, up)
        peak = float(np.max(np.abs(chips))) + EPS
        if peak > 3.0:
            chips = chips / peak
        return chips.astype(np.float32)


# ------------------------------------------------------------------ RX side
@functools.partial(jax.jit, static_argnames=("span", "peaks"))
def _robust_scan(x, n_valid, templates, m_stack, hdr_pn_sy, pre_sy,
                 span: int, peaks: int = 4):
    """Sync + demod + header for a v2 clip.  m_stack: (4, P, 1215, span)."""
    T = x.shape[-1]
    corr = demod.normalized_xcorr(x, templates)
    lag = jnp.arange(corr.shape[-1])
    corr = jnp.where(lag[None, :] <= n_valid - span, corr, -jnp.inf)
    idx, val = demod.topk_nms(corr, peaks, span // 2)        # (4, K)

    starts = jnp.clip(idx, 0, T - span)
    widx = starts[..., None] + jnp.arange(span)
    win = x[widx]                                            # (4, K, span)
    win = win * jax.lax.rsqrt(jnp.mean(win * win, -1, keepdims=True) + 1e-30)

    chips = jnp.einsum("bnw,bpkw->bpnk", win, m_stack,
                       precision=jax.lax.Precision.HIGHEST)  # (4,P,K,1215)
    pre = demod.preamble_score(chips, pre_sy)
    hdr_ok, lo16, hdr_score = demod.header_decode(chips, hdr_pn_sy)
    return dict(peak_idx=idx, peak_val=val, chips=chips, pre=pre,
                hdr_ok=hdr_ok, hdr_lo16=lo16, hdr_score=hdr_score)


class RobustVerifier:
    """Single-clip v2 verifier (same verify surface as WatermarkDetector)."""

    def __init__(self, key32: bytes, *, fs_target: int = 48_000,
                 list_size: int = 32,
                 profile: WaveformProfile = ROBUST,
                 timescale_grid: tuple[float, ...] = (1.0,)) -> None:
        self.profile = profile
        self.fs_target = fs_target
        self.sec = SecureChannel(key32)
        self._hop = hop_schedule(key32)
        self._spec = profile_spec(profile)
        self._list_size = int(list_size)
        self.session_nonce: bytes | None = None
        self.timescale_grid = timescale_grid

        S = profile.oversample
        self._templates = jnp.asarray(robust_templates(fs_target, S))
        m = np.stack([
            np.stack([robust_demod_matrix(lo, hi, fs_target, S, lam)
                      for lam in LAM_PROFILES])
            for lo, hi in BAND_PLAN
        ])
        self._m_stack = jnp.asarray(m)
        self._pre_sy = jnp.asarray(bits_to_bpsk(mls63()))
        self._hdr_pn_sy = jnp.asarray(bits_to_bpsk(self.sec.pn_bits(0, HDR_L)))

    def verify(self, audio: np.ndarray, fs_in: int) -> bool:
        return self.verify_detailed(audio, fs_in)[0]

    def verify_detailed(self, audio: np.ndarray, fs_in: int):
        signal = resample_to(self.fs_target, audio, fs_in)
        if signal.size < int(MIN_CLIP_SECONDS * self.fs_target):
            return False, None
        for factor in self.timescale_grid:
            sig = signal if factor == 1.0 else resample_to(
                self.fs_target, signal, int(round(self.fs_target * factor)))
            ok, ctr, peaks = self._verify_once(sig)
            if ok:
                return True, ctr
            # time-scale recovery: the coarse grid only needs to get sync
            # peaks to show (residual <~1.5% keeps the 504-sample preamble
            # correlated); inter-frame peak spacing then pins the true
            # scale to ~5e-5, and one corrective resample makes the frame
            # coherent again.  Handles the +-5% playback-speed case.
            est = self._estimate_timescale(peaks)
            if est is not None and abs(est - 1.0) > 2e-4:
                total = factor * est
                sig2 = resample_to(
                    self.fs_target, signal,
                    int(round(self.fs_target * total)))
                ok, ctr, _ = self._verify_once(sig2)
                if ok:
                    return True, ctr
        return False, None

    def _estimate_timescale(self, peaks: np.ndarray | None) -> float | None:
        """Modal scale ratio from same-band sync-peak spacings."""
        if peaks is None:
            return None
        span = self.profile.span
        ratios = []
        for b in range(peaks.shape[0]):
            pos = np.sort(peaks[b][peaks[b] >= 0])
            for d in np.diff(pos):
                k = int(round(d / span))
                if k >= 1 and abs(d / (k * span) - 1.0) < 0.06:
                    ratios.append(d / (k * span))
        if len(ratios) < 2:
            return None
        return float(np.median(ratios))

    def _verify_once(self, signal: np.ndarray):
        span = self.profile.span
        T = signal.size
        Tpad = 1 << max(17, (T + span - 1).bit_length())
        x = np.zeros(Tpad, dtype=np.float32)
        x[:T] = signal
        out = _robust_scan(jnp.asarray(x), jnp.int32(T), self._templates,
                           self._m_stack, self._hdr_pn_sy, self._pre_sy,
                           span=span)
        out = {k: np.asarray(v) for k, v in out.items()}
        peaks = np.where(np.isfinite(out["peak_val"]), out["peak_idx"], -1)

        nb, npf, nk, _ = out["chips"].shape
        rows = []   # (band, prof, k, ctr)
        for b in range(nb):
            for k in range(nk):
                start = int(out["peak_idx"][b, k])
                ctr_est = int(round(start / span))
                for p in range(npf):
                    lo16 = int(out["hdr_lo16"][b, p, k])
                    cands = []
                    if out["hdr_ok"][b, p, k] and self._hop.index(lo16) == b:
                        cands.append(lo16)
                    cands += [c for c in range(max(0, ctr_est - 3),
                                               ctr_est + 4)
                              if self._hop.index(c) == b and c not in cands]
                    for c in cands:
                        rows.append((b, p, k, c))
        if not rows:
            return False, None, peaks

        bands = np.array([r[0] for r in rows])
        profs = np.array([r[1] for r in rows])
        ks = np.array([r[2] for r in rows])
        ctrs = np.array([r[3] for r in rows], dtype=np.int64)
        chips = out["chips"][bands, profs, ks].astype(np.float32)
        uniq, inv = np.unique(ctrs, return_inverse=True)
        pn = self.sec.pn_bits_batch(uniq, FRAME_LEN)[:, PRE_L + HDR_L :]
        pn_sy = 2.0 * pn[inv].astype(np.float32) - 1.0

        llr = np.asarray(demod.payload_llr(jnp.asarray(chips),
                                           jnp.asarray(pn_sy)))
        info, crc_ok = hard_decode_batch(jnp.asarray(llr), self._spec)
        info = np.asarray(info)
        for i in np.flatnonzero(np.asarray(crc_ok)):
            if self._accept(info[i], int(ctrs[i])):
                return True, int(ctrs[i]), peaks

        # SCL pass over the best rows
        quality = np.mean(np.abs(llr), axis=-1)
        sel = np.argsort(-quality, kind="stable")[:32]
        res = scl_decode(jnp.asarray(llr[sel]), self._spec, self._list_size)
        ok = np.asarray(res["crc_ok"])
        bits = np.asarray(res["info_bits"])
        for rloc, r in enumerate(sel):
            for li in np.flatnonzero(ok[rloc]):
                if self._accept(bits[rloc, li], int(ctrs[r])):
                    return True, int(ctrs[r]), peaks
        return False, None, peaks

    def _accept(self, info_bits: np.ndarray, frame_ctr: int) -> bool:
        blob = pack_info_bits(info_bits)
        plain, _ = self.sec.open_any_layout(blob)
        if plain is None or not plain.startswith(MAGIC):
            return False
        if int.from_bytes(plain[4:8], "big") != frame_ctr:
            return False
        nonce = plain[8:16]
        if self.session_nonce is None:
            self.session_nonce = nonce
            return True
        return nonce == self.session_nonce
