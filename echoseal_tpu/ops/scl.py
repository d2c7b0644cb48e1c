"""Vectorised CRC-aided successive-cancellation list (SCL) decoding.

This replaces the reference's object-graph, pointer-chasing list decoder
(rtwm/fastpolar.py:59-359) with a dense, static-shape formulation built for
XLA/TPU:

* the decode tree is walked by ONE ``lax.scan`` over the N leaf bits;
* the L list paths live on a batch axis -- path forking/pruning is a single
  ``lax.top_k`` over 2L candidate metrics followed by gathers along that
  axis (no copy-on-write trees, no clone budgets);
* per-level alpha (LLR) and beta (partial-sum) buffers are fixed-size arrays
  in the scan carry; the level-recompute schedule is a pure function of the
  leaf index, so every branch is a *scalar*-predicate ``lax.cond`` that XLA
  executes one-sided -- total work is the optimal O(N log N) per path, not
  O(N^2);
* frames/streams batch on a leading axis, so thousands of decodes run as one
  device program.

Numerics match the reference: exact (logaddexp) f/g combines with the
"positive LLR => bit 1" convention (fastpolar.py:18-29) and the exact
path-metric penalty ``log1p(exp(-|llr|)) (+ |llr| if decision disagrees)``
(fastpolar.py:32-40).  Tie-breaking in the path sort follows the reference's
stable candidate ordering (path index, then bit value).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from echoseal_tpu.ops.polar import PolarSpec, crc8_check_batch

BIG_METRIC = 1e30


def _f_combine(a, b):
    """Exact LLR f-combine: llr of u_left given (a, b)."""
    return jnp.logaddexp(a, b) - jnp.logaddexp(0.0, a + b)


def _g_combine(a, b, u_left):
    """Exact LLR g-combine given the left partial sum."""
    return b + (1.0 - 2.0 * u_left.astype(a.dtype)) * a


def _penalties(leaf_llr):
    """(pen_bit0, pen_bit1) path-metric penalties for a leaf LLR."""
    mag = jnp.abs(leaf_llr)
    soft = jnp.log1p(jnp.exp(-mag))
    pen0 = soft + jnp.where(leaf_llr >= 0.0, mag, 0.0)
    pen1 = soft + jnp.where(leaf_llr >= 0.0, 0.0, mag)
    return pen0, pen1


def _gather_paths(tree, parent):
    """Gather every per-path array in ``tree`` along the list axis (axis 1)."""

    def gather(arr):
        idx = parent.reshape(parent.shape + (1,) * (arr.ndim - 2))
        return jnp.take_along_axis(arr, idx.astype(jnp.int32), axis=1)

    return jax.tree_util.tree_map(gather, tree)


@partial(jax.jit, static_argnames=("spec", "list_size"))
def _scl_decode_dense(llr: jnp.ndarray, spec: PolarSpec, list_size: int):
    """Dense-state reference formulation (kept as the parity oracle for
    ``scl_decode``; eagerly gathers full per-path state on every fork).

    Args:
      llr: (B, N) float32, positive favours bit 1.
      spec: static code structure.
      list_size: number of surviving paths L.

    Returns dict with paths sorted by ascending metric along axis 1:
      info_bits: (B, L, info_len) int32
      crc_ok:    (B, L) bool
      metrics:   (B, L) float32
    """
    N, n, L = spec.N, spec.n_stages, int(list_size)
    llr = llr.astype(jnp.float32)
    B = llr.shape[0]
    root = llr[:, None, :]  # (B, 1, N) -- shared by all paths until forking

    frozen = jnp.asarray(spec.frozen)

    alphas = tuple(
        jnp.zeros((B, L, N >> l), jnp.float32) for l in range(1, n + 1)
    )
    betas = tuple(
        jnp.zeros((B, L, 2, N >> l), jnp.int32) for l in range(1, n + 1)
    )
    u = jnp.zeros((B, L, N), jnp.int32)
    metric = jnp.concatenate(
        [jnp.zeros((B, 1)), jnp.full((B, L - 1), BIG_METRIC)], axis=1
    ).astype(jnp.float32) if L > 1 else jnp.zeros((B, 1), jnp.float32)

    def body(carry, phi):
        alphas, betas, u, metric = carry
        alphas = list(alphas)
        betas = list(betas)

        # ---- 1) recompute alphas down the active path -------------------
        for l in range(1, n + 1):
            seg = N >> l
            need = (phi & ((1 << (n - l)) - 1)) == 0
            phi_l = phi >> (n - l)
            parent = root if l == 1 else alphas[l - 2]
            left, right = parent[..., :seg], parent[..., seg:]
            beta_left = betas[l - 1][:, :, 0, :]

            def recompute(left=left, right=right, beta_left=beta_left,
                          phi_l=phi_l, l=l):
                g_val = lambda: _g_combine(left, right, beta_left)
                f_val = lambda: jnp.broadcast_to(
                    _f_combine(left, right), (B, L, left.shape[-1])
                )
                return jax.lax.cond((phi_l & 1) == 1, g_val, f_val)

            alphas[l - 1] = jax.lax.cond(
                need, recompute, lambda a=alphas[l - 1]: a
            )

        leaf = alphas[n - 1][..., 0]  # (B, L)
        pen0, pen1 = _penalties(leaf)

        # ---- 2) leaf decision -------------------------------------------
        def frozen_branch(alphas, betas, u, metric):
            return alphas, betas, u, metric + pen0, jnp.zeros((B, L), jnp.int32)

        def info_branch(alphas, betas, u, metric):
            cand = jnp.stack([metric + pen0, metric + pen1], axis=-1)
            cand = cand.reshape(B, 2 * L)  # ordered (path0,b0),(path0,b1),...
            neg_vals, idx = jax.lax.top_k(-cand, L)
            parent = idx >> 1
            bits = (idx & 1).astype(jnp.int32)
            tree = (alphas, betas, u)
            g_alphas, g_betas, g_u = _gather_paths(tree, parent)
            return g_alphas, g_betas, g_u, -neg_vals, bits

        alphas, betas, u, metric, bits = jax.lax.cond(
            frozen[phi],
            frozen_branch,
            info_branch,
            tuple(alphas), tuple(betas), u, metric,
        )
        alphas = list(alphas)
        betas = list(betas)

        # ---- 3) record the decision -------------------------------------
        u = jax.lax.dynamic_update_slice(u, bits[:, :, None], (0, 0, phi))
        betas[n - 1] = jax.lax.dynamic_update_slice(
            betas[n - 1], bits[:, :, None, None], (0, 0, phi & 1, 0)
        )

        # ---- 4) propagate partial sums up completed subtrees -------------
        for l in range(n, 1, -1):
            span = 1 << (n - l + 1)
            prop = ((phi + 1) & (span - 1)) == 0
            slot = (phi >> (n - l + 1)) & 1

            def combine(bl=betas[l - 1], bp=betas[l - 2], slot=slot):
                left, right = bl[:, :, 0, :], bl[:, :, 1, :]
                seg = jnp.concatenate(
                    [jnp.bitwise_xor(left, right), right], axis=-1
                )
                return jax.lax.dynamic_update_slice(
                    bp, seg[:, :, None, :], (0, 0, slot, 0)
                )

            betas[l - 2] = jax.lax.cond(
                prop, combine, lambda b=betas[l - 2]: b
            )

        return (tuple(alphas), tuple(betas), u, metric), None

    (alphas, betas, u, metric), _ = jax.lax.scan(
        body, (alphas, betas, u, metric), jnp.arange(N, dtype=jnp.int32)
    )

    data = u[..., jnp.asarray(spec.data_pos)]
    info = data[..., : spec.info_len]
    crc = data[..., spec.info_len:]
    crc_ok = crc8_check_batch(info, crc, spec.crc_mat)

    order = jnp.argsort(metric, axis=-1, stable=True)
    info = jnp.take_along_axis(info, order[..., None], axis=1)
    crc_ok = jnp.take_along_axis(crc_ok, order, axis=1)
    metric = jnp.take_along_axis(metric, order, axis=1)
    return {"info_bits": info, "crc_ok": crc_ok, "metrics": metric}


def _take_rows(arr: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    """Gather path rows: arr (B, L, ...) indexed by src (B, L) on axis 1."""
    idx = src.reshape(src.shape + (1,) * (arr.ndim - 2)).astype(jnp.int32)
    return jnp.take_along_axis(arr, idx, axis=1)


@partial(jax.jit, static_argnames=("spec", "list_size"))
def scl_decode(llr: jnp.ndarray, spec: PolarSpec, list_size: int):
    """List-decode a batch of LLR vectors.

    Args:
      llr: (B, N) float32, positive favours bit 1.
      spec: static code structure.
      list_size: number of surviving paths L.

    Returns dict with paths sorted by ascending metric along axis 1:
      info_bits: (B, L, info_len) int32
      crc_ok:    (B, L) bool
      metrics:   (B, L) float32

    Memory-traffic design (the dense formulation ``_scl_decode_dense``
    gathers EVERY per-path buffer on EVERY fork -- ~0.5 GB per info bit at
    B=128, L=256):

    * Path forks never touch the alpha/beta buffers.  Each level keeps a
      per-path SOURCE INDEX map (B, L); a fork permutes the 2n tiny index
      maps, and a buffer is physically gathered only when its level is
      recomputed/propagated -- which happens on the optimal O(N log N)
      schedule, so total gather traffic drops ~two orders of magnitude.
    * The decision history ``u`` is not carried at all: the scan emits
      (parent, bit) per leaf and a reverse-scan TRACEBACK reconstructs
      every surviving path's bits once at the end (classic SCL traceback).
    * Frozen leaves reuse the fork machinery with the bit-1 penalty masked
      to BIG_METRIC: a single (B, 2L) top_k replaces the traced branch --
      path order within equal metrics differs from the dense version, but
      the surviving path SET and all metrics are identical.
    """
    N, n, L = spec.N, spec.n_stages, int(list_size)
    llr = llr.astype(jnp.float32)
    B = llr.shape[0]
    root = llr[:, None, :]  # (B, 1, N) -- shared by all paths, never forked

    frozen = jnp.asarray(spec.frozen)
    ident = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (B, L))

    alphas = tuple(
        jnp.zeros((B, L, N >> l), jnp.float32) for l in range(1, n + 1)
    )
    betas = tuple(
        jnp.zeros((B, L, 2, N >> l), jnp.int32) for l in range(1, n + 1)
    )
    src_a = tuple(ident for _ in range(n))
    src_b = tuple(ident for _ in range(n))
    metric = jnp.concatenate(
        [jnp.zeros((B, 1)), jnp.full((B, L - 1), BIG_METRIC)], axis=1
    ).astype(jnp.float32) if L > 1 else jnp.zeros((B, 1), jnp.float32)

    def body(carry, phi):
        alphas, betas, src_a, src_b, metric = carry
        alphas, betas = list(alphas), list(betas)
        src_a, src_b = list(src_a), list(src_b)

        # ---- 1) recompute alphas down the active path -------------------
        # (level l is refreshed every 2^(n-l) leaves; parents were already
        # refreshed earlier in this loop when needed, so reads see this
        # step's values -- same schedule as the reference's lazy tree)
        for l in range(1, n + 1):
            seg = N >> l
            need = (phi & ((1 << (n - l)) - 1)) == 0
            phi_l = phi >> (n - l)

            def recompute(l=l, seg=seg, phi_l=phi_l):
                parent = (root if l == 1
                          else _take_rows(alphas[l - 2], src_a[l - 2]))
                left, right = parent[..., :seg], parent[..., seg:]
                beta_left = _take_rows(betas[l - 1], src_b[l - 1])[:, :, 0, :]
                g_val = lambda: _g_combine(left, right, beta_left)
                f_val = lambda: jnp.broadcast_to(
                    _f_combine(left, right), (B, L, seg))
                return jax.lax.cond((phi_l & 1) == 1, g_val, f_val), ident

            alphas[l - 1], src_a[l - 1] = jax.lax.cond(
                need, recompute,
                lambda a=alphas[l - 1], s=src_a[l - 1]: (a, s))

        leaf = alphas[n - 1][..., 0]  # level n refreshes every step
        pen0, pen1 = _penalties(leaf)
        pen1 = jnp.where(frozen[phi], BIG_METRIC, pen1)

        # ---- 2) fork: one top_k, index-map permutation only --------------
        cand = jnp.stack([metric + pen0, metric + pen1], axis=-1)
        cand = cand.reshape(B, 2 * L)  # ordered (path0,b0),(path0,b1),...
        neg_vals, idx = jax.lax.top_k(-cand, L)
        parent = (idx >> 1).astype(jnp.int32)
        bits = (idx & 1).astype(jnp.int32)
        metric = -neg_vals
        src_a = [jnp.take_along_axis(s, parent, axis=1) for s in src_a]
        src_b = [jnp.take_along_axis(s, parent, axis=1) for s in src_b]

        # ---- 3) record the decision (level-n beta is (B, L, 2, 1)) -------
        bn = _take_rows(betas[n - 1], src_b[n - 1])
        betas[n - 1] = jax.lax.dynamic_update_slice(
            bn, bits[:, :, None, None], (0, 0, phi & 1, 0))
        src_b[n - 1] = ident

        # ---- 4) propagate partial sums up completed subtrees -------------
        for l in range(n, 1, -1):
            span = 1 << (n - l + 1)
            prop = ((phi + 1) & (span - 1)) == 0
            slot = (phi >> (n - l + 1)) & 1

            def combine(l=l, slot=slot):
                child = _take_rows(betas[l - 1], src_b[l - 1])
                left, right = child[:, :, 0, :], child[:, :, 1, :]
                seg = jnp.concatenate(
                    [jnp.bitwise_xor(left, right), right], axis=-1)
                dest = _take_rows(betas[l - 2], src_b[l - 2])
                return jax.lax.dynamic_update_slice(
                    dest, seg[:, :, None, :], (0, 0, slot, 0)), ident

            betas[l - 2], src_b[l - 2] = jax.lax.cond(
                prop, combine,
                lambda b=betas[l - 2], s=src_b[l - 2]: (b, s))

        carry = (tuple(alphas), tuple(betas), tuple(src_a), tuple(src_b),
                 metric)
        return carry, (parent, bits)

    (alphas, betas, src_a, src_b, metric), (parents, bits) = jax.lax.scan(
        body, (alphas, betas, src_a, src_b, metric),
        jnp.arange(N, dtype=jnp.int32))

    # ---- traceback: reconstruct u for the L survivors --------------------
    def tb(cur, rec):
        parent, b = rec
        out = jnp.take_along_axis(b, cur, axis=1)
        return jnp.take_along_axis(parent, cur, axis=1), out

    _, u_rev = jax.lax.scan(tb, ident, (parents, bits), reverse=True)
    u = jnp.moveaxis(u_rev, 0, -1)  # (B, L, N)

    data = u[..., jnp.asarray(spec.data_pos)]
    info = data[..., : spec.info_len]
    crc = data[..., spec.info_len:]
    crc_ok = crc8_check_batch(info, crc, spec.crc_mat)

    order = jnp.argsort(metric, axis=-1, stable=True)
    info = jnp.take_along_axis(info, order[..., None], axis=1)
    crc_ok = jnp.take_along_axis(crc_ok, order, axis=1)
    metric = jnp.take_along_axis(metric, order, axis=1)
    return {"info_bits": info, "crc_ok": crc_ok, "metrics": metric}


def scl_decode_np(llr: np.ndarray, spec: PolarSpec, list_size: int):
    """Convenience host entry: accepts (N,) or (B, N) numpy LLRs."""
    arr = np.asarray(llr, dtype=np.float32)
    squeeze = arr.ndim == 1
    if squeeze:
        arr = arr[None]
    out = scl_decode(jnp.asarray(arr), spec, list_size)
    res = {k: np.asarray(v) for k, v in out.items()}
    if squeeze:
        res = {k: v[0] for k, v in res.items()}
    return res
