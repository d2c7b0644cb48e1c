"""Batched multi-stream verification -- the serving/throughput pipeline.

Where ``WatermarkDetector.verify`` preserves the reference's full fallback
ladder for one clip, this pipeline verifies THOUSANDS of clips per device
dispatch (the BASELINE.json north star: >=1000x real-time per chip):

* All per-key randomness is precomputed once into device tables: the PN
  payload keystream for every frame counter below ``max_ctr`` (one AES
  pass on the host) and the HMAC hop schedule.  The device program is then
  completely crypto-free and static-shaped.
* Per clip: 4-band sync correlation -> top-``peaks`` NMS peaks -> direct
  LS demod + refinement at ``n_offsets`` alignments -> header decode ->
  counter resolution against the hop table (header-gated, time-estimated)
  -> PN gather -> LLR -> hard-decision polar + CRC.
* The host finishes with the AEAD open + magic/ctr checks per clip
  (microseconds each) -- crypto stays host-side by design (SURVEY.md 7.1).

Scale-out: `shard_map` over a 1-D ``streams`` mesh axis -- clips are
independent, so the only collective is an optional verdict-count psum
(echoseal_tpu/parallel/mesh.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from echoseal_tpu.core.bandplan import hop_schedule
from echoseal_tpu.core.crypto import SecureChannel
from echoseal_tpu.core.params import FRAME_LEN, HDR_L, MAGIC, PRE_L, WIDE_DELTA
from echoseal_tpu.core.sequences import bits_to_bpsk, mls63
from echoseal_tpu.ops import demod
from echoseal_tpu.ops.polar import hard_decode_batch, pack_info_bits, polar_spec

DEFAULT_MAX_CTR = 16_384     # ~7 min of stream @ 39.5 frames/s
DEFAULT_PEAKS = 2            # sync peaks examined per band per clip
N_OFFSETS = len(demod.SYNC_OFFSETS)


@functools.partial(
    jax.jit, static_argnames=("peaks",))
def _batch_verify_stage(
    x: jnp.ndarray,           # (B, Tpad) float32 clips, zero padded
    n_valid: jnp.ndarray,     # (B,) int32 true lengths
    templates: jnp.ndarray,   # (4, 63)
    m_direct: jnp.ndarray,    # (4, 1215, W_DIRECT)  exact-inversion profile
    t_fwd: jnp.ndarray,       # (4, W_DIRECT, 1215)
    pre_sy: jnp.ndarray,      # (63,)
    hdr_pn_sy: jnp.ndarray,   # (128,)
    pn_table: jnp.ndarray,    # (MAX_CTR, 1024) int8 payload PN bits
    hop_table: jnp.ndarray,   # (MAX_CTR,) int32 band index per counter
    peaks: int = DEFAULT_PEAKS,
):
    B, T = x.shape

    # ---- sync & peaks ---------------------------------------------------
    corr = demod.normalized_xcorr(x, templates)            # (B, 4, T-62)
    lag = jnp.arange(corr.shape[-1])
    corr = jnp.where(lag[None, None, :] <= (n_valid[:, None, None]
                                            - FRAME_LEN), corr, -jnp.inf)
    idx, val = demod.topk_nms(corr, peaks, FRAME_LEN // 2)  # (B, 4, P)
    valid = jnp.isfinite(val)

    # ---- windows at offsets --------------------------------------------
    # ONE wide gather per peak; the +-2 alignment offsets come from static
    # slices of it (5x less gather traffic than per-offset windows)
    offs = np.asarray(demod.SYNC_OFFSETS)
    span = int(offs.max() - offs.min())
    wide_w = demod.W_DIRECT + span
    s0 = jnp.clip(idx + int(offs.min()), 0, T - wide_w)     # (B, 4, P)
    widx = s0[..., None] + jnp.arange(wide_w)
    wide = jnp.take_along_axis(x[:, None, None, :],
                               widx.reshape(B, 1, 1, -1), axis=-1)
    wide = wide.reshape(B, 4, -1, wide_w)                   # (B,4,P,wide)
    win = jnp.stack([wide[..., o : o + demod.W_DIRECT]
                     for o in range(span + 1)], axis=3)     # (B,4,P,O,W)
    win = win.reshape(B, 4, -1, demod.W_DIRECT)             # (B,4,P*O,W)
    win = win * jax.lax.rsqrt(jnp.mean(win * win, -1, keepdims=True) + 1e-30)

    # ---- demod + refine (exact-inversion profile) -----------------------
    chips = jnp.einsum("bfnw,fkw->bfnk", win, m_direct,
                       precision=jax.lax.Precision.HIGHEST)
    chips = demod.refine_chips(win, chips, t_fwd[None, :, None],
                               m_direct[None, :, None], pre_sy, iters=4)

    # ---- pick best offset per peak by preamble score ---------------------
    pre = demod.preamble_score(chips, pre_sy).reshape(B, 4, peaks, N_OFFSETS)
    best_o = jnp.argmax(jnp.abs(pre), axis=-1)              # (B, 4, P)
    flat = (jnp.arange(peaks)[None, None, :] * N_OFFSETS + best_o)
    chips = jnp.take_along_axis(
        chips.reshape(B, 4, peaks * N_OFFSETS, FRAME_LEN),
        flat[..., None], axis=2)                            # (B,4,P,1215)
    pre_best = jnp.take_along_axis(
        pre.reshape(B, 4, peaks * N_OFFSETS), flat, axis=-1)

    # ---- header + counter resolution -------------------------------------
    hdr_ok, lo16, hdr_score = demod.header_decode(chips, hdr_pn_sy)
    ctr_est = jnp.round(idx.astype(jnp.float32) / FRAME_LEN).astype(jnp.int32)
    max_ctr = pn_table.shape[0]
    band_ids = jnp.arange(4, dtype=jnp.int32)[None, :, None]

    # The 16-bit header identifies the counter ABSOLUTELY below 2**16 (and
    # max_ctr <= 2**16 here), so a readable header resolves ctr = lo16 for
    # a clip cut from anywhere in the stream -- unlike the reference's
    # +-200-around-the-time-estimate search (detector.py:122-142), which
    # silently fails on clips recorded later than ~5 s into a session.
    lo16c = jnp.clip(lo16, 0, max_ctr - 1)
    hdr_resolved = hdr_ok & (hop_table[lo16c] == band_ids) & (lo16 < max_ctr)

    # fallback for unreadable headers: nearest band-matching counter around
    # the time estimate (the reference's tight/wide ladder collapsed)
    deltas = jnp.arange(-WIDE_DELTA, WIDE_DELTA + 1, dtype=jnp.int32)
    cand = jnp.clip(ctr_est[..., None] + deltas, 0, max_ctr - 1)  # (B,4,P,D)
    match_nohdr = hop_table[cand] == band_ids[..., None]
    dist = jnp.abs(deltas)[None, None, None, :] + jnp.where(
        match_nohdr, 0, 1 << 20)
    j = jnp.argmin(dist, axis=-1)
    ctr_fb = jnp.take_along_axis(cand, j[..., None], axis=-1)[..., 0]

    ctr = jnp.where(hdr_resolved, lo16c, ctr_fb)
    any_match = hdr_resolved | jnp.any(match_nohdr, axis=-1)

    # ---- PN gather, LLR, hard decode -------------------------------------
    pn_sy = 2.0 * pn_table[ctr].astype(jnp.float32) - 1.0   # (B,4,P,1024)
    llr = demod.payload_llr(chips, pn_sy)
    spec = polar_spec()
    info, crc_ok = hard_decode_batch(llr, spec)
    crc_ok = crc_ok & valid & any_match

    # select the first CRC-passing candidate per clip and pack its payload
    # to bytes ON DEVICE -- the host then downloads ~60 B/clip instead of
    # the full (4, P, 440) bit tensor (matters on thin host<->device links)
    flat_ok = crc_ok.reshape(B, -1)
    best = jnp.argmax(flat_ok, axis=-1)                     # first True
    sel_ok = jnp.take_along_axis(flat_ok, best[:, None], -1)[:, 0]
    sel_info = jnp.take_along_axis(
        info.reshape(B, -1, info.shape[-1]), best[:, None, None], 1)[:, 0]
    sel_ctr = jnp.take_along_axis(
        ctr.reshape(B, -1), best[:, None], -1)[:, 0]
    pow2 = (2 ** jnp.arange(7, -1, -1, dtype=jnp.int32))
    blob = jnp.sum(sel_info.reshape(B, -1, 8) * pow2, axis=-1).astype(
        jnp.uint8)                                          # (B, 55)

    return dict(
        ok=sel_ok, blob=blob, blob_ctr=sel_ctr,
        crc_ok=crc_ok,             # (B, 4, P)
        info_bits=info,            # (B, 4, P, 440)
        ctr=ctr,                   # (B, 4, P)
        peak_idx=idx, peak_val=val,
        pre_score=pre_best, hdr_ok=hdr_ok, hdr_score=hdr_score,
    )


class BatchVerifier:
    """High-throughput multi-clip verifier (one device program per batch)."""

    def __init__(self, key32: bytes, *, fs: int = 48_000,
                 max_ctr: int = DEFAULT_MAX_CTR,
                 peaks: int = DEFAULT_PEAKS) -> None:
        self.fs = fs
        self.sec = SecureChannel(key32)
        self._hop = hop_schedule(key32)
        self.peaks = int(peaks)

        self._templates = jnp.asarray(demod.sync_templates(fs))
        md, _ = demod.all_demod_matrices(fs)
        self._m_direct = jnp.asarray(md[:, 0])     # exact-inversion profile
        self._t_fwd = jnp.asarray(demod.all_forward_matrices(fs))
        self._pre_sy = jnp.asarray(bits_to_bpsk(mls63()))
        self._hdr_pn_sy = jnp.asarray(bits_to_bpsk(self.sec.pn_bits(0, HDR_L)))

        # per-key device tables: one AES sweep covers every counter
        ctrs = np.arange(max_ctr, dtype=np.int64)
        pn = self.sec.pn_bits_batch(ctrs, FRAME_LEN)[:, PRE_L + HDR_L :]
        self._pn_table = jnp.asarray(pn.astype(np.int8))
        self._hop_table = jnp.asarray(self._hop.indices(ctrs).astype(np.int32))

    # ------------------------------------------------------------------ API
    def run_device(self, clips: np.ndarray, n_valid: np.ndarray | None = None):
        """Raw device stage outputs for a (B, T) float32 batch."""
        clips = jnp.asarray(clips, dtype=jnp.float32)
        B, T = clips.shape
        if n_valid is None:
            n_valid = np.full(B, T, dtype=np.int32)
        return _batch_verify_stage(
            clips, jnp.asarray(n_valid, dtype=jnp.int32),
            self._templates, self._m_direct, self._t_fwd,
            self._pre_sy, self._hdr_pn_sy, self._pn_table, self._hop_table,
            peaks=self.peaks,
        )

    def verify_batch(self, clips: np.ndarray,
                     n_valid: np.ndarray | None = None, *,
                     expected_nonce: bytes | None = None) -> np.ndarray:
        """(B, T) float32 clips -> (B,) bool verdicts."""
        out = self.run_device(clips, n_valid)
        return self.finish_host(out, expected_nonce=expected_nonce)

    def finish_host(self, out, *,
                    expected_nonce: bytes | None = None) -> np.ndarray:
        """AEAD verdicts from the device outputs (downloads ~60 B/clip)."""
        return self.finish_host_detailed(out, expected_nonce=expected_nonce)[0]

    def finish_host_detailed(self, out, *, expected_nonce: bytes | None = None):
        """(verdicts (B,) bool, nonces (B,) list[bytes|None]).

        Unlike the single-clip detector (which latches the first authentic
        session nonce -- models/detector.py), a serving batch mixes clips
        from many sessions, so the anti-replay policy is the CALLER's:
        either pass ``expected_nonce`` to enforce one session across the
        batch, or consume the returned per-clip nonces and apply a
        per-stream latch upstream.  Without either, a frame sealed in a
        different session still verifies (AEAD+ctr only) -- by design for
        multi-tenant serving, but callers wanting the reference detector's
        replay protection must use one of the two hooks.
        """
        ok = np.asarray(out["ok"])
        blobs = np.asarray(out["blob"])
        ctrs = np.asarray(out["blob_ctr"])
        verdicts = np.zeros(ok.shape[0], dtype=bool)
        nonces: list[bytes | None] = [None] * ok.shape[0]
        for i in np.flatnonzero(ok):
            blob = blobs[i].tobytes()
            plain, _ = self.sec.open_any_layout(blob)
            if plain is None and blob[:4] == MAGIC:
                plain = blob
            if plain is None or not plain.startswith(MAGIC):
                continue
            if int.from_bytes(plain[4:8], "big") != int(ctrs[i]):
                continue
            nonce = plain[8:16]
            if expected_nonce is not None and nonce != expected_nonce:
                continue
            verdicts[i] = True
            nonces[i] = nonce
        return verdicts, nonces
