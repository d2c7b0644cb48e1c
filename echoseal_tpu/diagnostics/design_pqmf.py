"""Generator for the MPEG-1 filterbank window pair (data/pqmf512.py).

The ISO 11172-3 Table C/D coefficients are not reproducible in-image,
so the committed window pair is DESIGNED for the exact ISO filterbank
structure instead: alternating least squares on the true analysis
(C.1.3 matrixing, ``cos((2k+1)(n-16)pi/64)`` phase) and synthesis
(2.4.3.2.2 V/U machinery) equations, targeting a unit impulse delayed
by 481 samples.  Both half-problems are LINEAR:

* given the analysis window C, the output is linear in the synthesis
  window D, and decouples into 32 independent 16-unknown least-squares
  systems (one per output polyphase residue);
* given D, the output is linear in C (512 unknowns, one dense system).

Four alternations from a Kaiser lowpass initialiser converge to
~64 dB white-noise reconstruction SNR at unit gain -- flat to within
the measurement across tones 440 Hz - 15 kHz (59-73 dB).

Run: ``python -m echoseal_tpu.diagnostics.design_pqmf [--iters 6]``
prints the achieved SNR and (with ``--emit``) the base64 payload to
paste into data/pqmf512.py.
"""
from __future__ import annotations

import argparse
import base64
import zlib

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view


def _analyze(x: np.ndarray, C: np.ndarray) -> np.ndarray:
    xp = np.concatenate([np.zeros(511), x])
    W = sliding_window_view(xp, 512)[31::32]
    zX = (W * C[::-1][None, :])[:, ::-1]
    y = zX.reshape(-1, 8, 64).sum(axis=1)
    k = np.arange(32)
    M = np.cos((2 * k[:, None] + 1) * (np.arange(64)[None, :] - 16)
               * np.pi / 64)
    return y @ M.T


def _synth(s: np.ndarray, D: np.ndarray) -> np.ndarray:
    n = np.arange(64)
    k = np.arange(32)
    N = np.cos((16 + n[:, None]) * (2 * k[None, :] + 1) * np.pi / 64)
    V = s @ N.T
    Vp = np.concatenate([np.zeros((16, 64)), V])
    out = np.zeros((s.shape[0], 32))
    for i in range(8):
        out += Vp[16 - 2 * i: 16 - 2 * i + s.shape[0], :32] \
            * D[64 * i: 64 * i + 32][None, :]
        out += Vp[15 - 2 * i: 15 - 2 * i + s.shape[0], 32:] \
            * D[64 * i + 32: 64 * i + 64][None, :]
    return out.reshape(-1)


def design(n_iter: int = 6, delay: int = 481):
    from scipy.signal import firwin

    p = firwin(512, 1.1 / 64, window=("kaiser", 7.0))
    sgn = np.repeat((-1.0) ** np.arange(8), 64)
    C, D = p * sgn, p * sgn * 32.0
    L = 32 * 100
    T = L // 32
    n = np.arange(64)
    k = np.arange(32)
    N = np.cos((16 + n[:, None]) * (2 * k[None, :] + 1) * np.pi / 64)
    Mk = np.cos((2 * k[:, None] + 1) * (n[None, :] - 16) * np.pi / 64)
    Xs = []
    for q in range(32):
        x = np.zeros(L)
        x[32 * 20 + q] = 1.0
        Xs.append(x)

    for it in range(n_iter):
        # ---- LS on D given C: decoupled per output residue j ------------
        Vs = [_analyze(Xs[q], C) @ N.T for q in range(32)]
        Dn = np.zeros(512)
        for j in range(32):
            rows, tgt = [], []
            for q in range(32):
                Vp = np.concatenate([np.zeros((16, 64)), Vs[q]])
                A = np.zeros((T, 16))
                for i in range(8):
                    A[:, i] = Vp[16 - 2 * i: 16 - 2 * i + T, j]
                    A[:, 8 + i] = Vp[15 - 2 * i: 15 - 2 * i + T, 32 + j]
                y = np.zeros(T)
                gi = 32 * 20 + q + delay
                if gi % 32 == j:
                    y[gi // 32] = 1.0
                rows.append(A)
                tgt.append(y)
            sol, *_ = np.linalg.lstsq(np.concatenate(rows),
                                      np.concatenate(tgt), rcond=None)
            for i in range(8):
                Dn[64 * i + j] = sol[i]
                Dn[64 * i + 32 + j] = sol[8 + i]
        D = Dn
        # ---- LS on C given D: one dense 512-unknown system ---------------
        Amat = np.zeros((32 * T * 32, 512))
        b = np.zeros(32 * T * 32)
        for q in range(32):
            xp = np.concatenate([np.zeros(511), Xs[q]])
            idx_t = np.arange(T)
            for i in range(512):
                col = xp[32 * idx_t + 542 - i]
                if not col.any():
                    continue
                sig = np.outer(col, Mk[:, i % 64])
                Amat[q * T * 32: (q + 1) * T * 32, i] = _synth(sig, D)
            b[q * T * 32 + 32 * 20 + q + delay] = 1.0
        C, *_ = np.linalg.lstsq(Amat, b, rcond=None)

        rng = np.random.default_rng(1)
        xt = rng.standard_normal(32 * 300)
        yt = _synth(_analyze(xt, C), D)
        err = yt[delay: delay + 6000] - xt[:6000]
        snr = 10 * np.log10(np.mean(xt[:6000] ** 2) / np.mean(err ** 2))
        print(f"iter {it}: white-noise reconstruction snr = {snr:.1f} dB",
              flush=True)
    return C, D


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--emit", action="store_true",
                    help="print the base64 payload for data/pqmf512.py")
    args = ap.parse_args()
    C, D = design(args.iters)
    if args.emit:
        blob = zlib.compress(
            np.concatenate([C, D]).astype("<f8").tobytes(), 9)
        print(base64.b64encode(blob).decode())


if __name__ == "__main__":
    main()
