"""Fused transfer-function classification + opacity correction + front-to-back
compositing.

The compositing recurrence C += T*c*a; T *= (1-a) is a monoid on (C, T)
pairs:

    (C1, T1) . (C2, T2) = (C1 + T1*C2, T1*T2)

so a ray's S steps combine in any bracketing (SURVEY.md §5.7) — the key to
both the TPU kernel below and the multi-device ring compositor
(ovr_tpu.parallel.bricks).

Three implementations:

- `composite_over` — pure-jnp tree reduction over the step axis (log2(S)
  elementwise passes, fully parallel on the VPU; reverse-differentiable).
- `tf_composite_reference` — classify + correct + composite in plain jnp,
  the correctness oracle.
- `tf_composite_pallas` — the fused Pallas TPU kernel: a (S, 128-ray) block
  per grid step, marching GROUP=8 steps at a time on the sublane axis; TF
  lookup inside the kernel via 128-lane `take_along_axis` chunks (the lane
  gather Mosaic supports), intra-group over-combine via `pltpu.roll`, and a
  sequential carry across groups. Reads the raw density samples exactly once
  from HBM and writes only (R, 4) outputs — no (R, S, 4) rgba intermediate
  ever exists. Wrapped in a custom VJP whose backward runs the jnp reference
  (recompute, no residuals) so training paths stay correct.

Reference semantics being fused: `sample_transfer_function`
(shaders_common.h:356-367), opacity correction (shaders_raymarching.cu:
117-122), front-to-back blend (:160-166).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ovr_tpu.core.sampling import classify, opacity_correction

GROUP = 8  # steps combined per tree pass (one vreg of sublanes)
RAY_TILE = 128  # rays per kernel instance (one vreg of lanes)
CHUNK = 128  # TF-table lanes per gather chunk


# ---------------------------------------------------------------------------
# pure-jnp building blocks
# ---------------------------------------------------------------------------

def composite_over(rgb: jnp.ndarray, alpha: jnp.ndarray
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Front-to-back composite along axis 1. rgb (R, S, 3), alpha (R, S) ->
    (color (R, 3), alpha (R,)). Tree reduction over the over-monoid."""
    c = rgb * alpha[..., None]  # premultiplied per-step contribution
    t = 1.0 - alpha
    s = c.shape[1]
    # pad to a power of two with identity elements (C=0, T=1)
    n = 1
    while n < s:
        n *= 2
    if n != s:
        c = jnp.pad(c, ((0, 0), (0, n - s), (0, 0)))
        t = jnp.pad(t, ((0, 0), (0, n - s)), constant_values=1.0)
    while c.shape[1] > 1:
        c0, c1 = c[:, 0::2], c[:, 1::2]
        t0, t1 = t[:, 0::2], t[:, 1::2]
        c = c0 + t0[..., None] * c1
        t = t0 * t1
    return c[:, 0], 1.0 - t[:, 0]


def tf_composite_reference(sigma, dt, color_table, alpha_table, value_range,
                           base):
    """Oracle: classify + opacity-correct + composite (no early exit —
    matches the monoid reduction exactly; early exit only skips work whose
    contribution is < 1e-4 of transmittance)."""
    rgb, a = classify(color_table, alpha_table, value_range, sigma)
    a = jnp.where(dt > 0, opacity_correction(a, base, dt), 0.0)
    rgb = jnp.clip(rgb, 0.0, 1.0)
    return composite_over(rgb, a)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _tf_lookup(chunks, c, n_orig):
    """Piecewise-linear nodal table lookup inside the kernel.

    chunks: tuple of (GROUP, CHUNK) vregs — the (N,) table split into
    128-lane chunks, each replicated across sublanes. c: (GROUP, 128)
    continuous coordinates in [0, n_orig - 1]. Returns (GROUP, 128).
    """
    i0 = jnp.clip(jnp.floor(c), 0.0, float(n_orig - 1)).astype(jnp.int32)
    f = c - i0.astype(c.dtype)
    i1 = jnp.minimum(i0 + 1, n_orig - 1)

    def gather(idx):
        out = jnp.zeros_like(c)
        for k, chunk in enumerate(chunks):
            local = idx - k * CHUNK
            ok = (local >= 0) & (local < CHUNK)
            g = jnp.take_along_axis(chunk, jnp.clip(local, 0, CHUNK - 1),
                                    axis=1)
            out = jnp.where(ok, g, out)
        return out

    return gather(i0) * (1.0 - f) + gather(i1) * f


def _combine_group(cs, t):
    """Over-combine GROUP sublane steps (front at sublane 0).

    cs: list of (GROUP, 128) premultiplied color channels; t: (GROUP, 128)
    transmittances. log2(GROUP) roll passes; after them, row 0 holds the
    full composite of the group. Returns per-channel (1, 128) rows and the
    (1, 128) group transmittance.
    """
    span = 1
    while span < GROUP:
        # partner of row i is row i + span; pltpu.roll needs a non-negative
        # shift, and roll-up-by-span == roll-by-(GROUP - span). The wrapped
        # rows (i >= GROUP - span) carry garbage but are never consumed by
        # row 0's combine tree.
        cs_shift = [pltpu.roll(x, GROUP - span, 0) for x in cs]
        t_shift = pltpu.roll(t, GROUP - span, 0)
        cs = [a + t * b for a, b in zip(cs, cs_shift)]
        t = t * t_shift
        span *= 2
    return [x[0:1] for x in cs], t[0:1]


def _kernel(sigma_ref, dt_ref, tab_ref, vr_ref, base_ref, out_ref, *,
            n_groups, n_orig, n_chunks):
    """One 128-ray tile: fused classify/correct/composite over all steps.

    tab_ref: (4, n_chunks, CHUNK) — rows r/g/b/alpha of the nodal TF table,
    pre-chunked on the host. vr_ref (1, 2) and base_ref (1, 1) in SMEM.
    """
    vr_lo = vr_ref[0, 0]
    vr_hi = vr_ref[0, 1]
    # NB: pl.reciprocal requires a vector operand on real Mosaic lowering;
    # plain division is correct for this one-time scalar.
    vr_scale = 1.0 / (vr_hi - vr_lo)
    base = base_ref[0, 0]

    # stage the table chunks as sublane-replicated vregs (static unroll)
    def chunks_of(ch):
        return tuple(
            jnp.broadcast_to(tab_ref[ch, k:k + 1, :], (GROUP, CHUNK))
            for k in range(n_chunks))

    rtab, gtab, btab, atab = (chunks_of(0), chunks_of(1), chunks_of(2),
                              chunks_of(3))

    def group_body(g, carry):
        cr, cg, cb, tr = carry  # (1, 128) each
        s = sigma_ref[pl.ds(g * GROUP, GROUP), :]  # (GROUP, 128)
        dt = dt_ref[pl.ds(g * GROUP, GROUP), :]
        # normalize_value (sampling.py:100-105) then nodal coordinate
        v = jnp.clip((jnp.clip(s, vr_lo, vr_hi) - vr_lo) * vr_scale,
                     0.0, 1.0)
        c = v * float(n_orig - 1)
        a_raw = _tf_lookup(atab, c, n_orig)
        r = jnp.clip(_tf_lookup(rtab, c, n_orig), 0.0, 1.0)
        gg = jnp.clip(_tf_lookup(gtab, c, n_orig), 0.0, 1.0)
        b = jnp.clip(_tf_lookup(btab, c, n_orig), 0.0, 1.0)
        # opacity correction 1-(1-a)^(base*dt) with the nearly_equal skip
        # (shaders_raymarching.cu:75,117-122); dt==0 rows are inactive pads
        k = base * dt
        a_c = jnp.clip(a_raw, 0.0, 1.0 - 1e-7)
        corrected = jnp.clip(1.0 - jnp.exp(k * jnp.log1p(-a_c)), 0.0, 1.0)
        a = jnp.where(jnp.abs(k - 1.0) < 1e-7, jnp.clip(a_raw, 0.0, 1.0),
                      corrected)
        a = jnp.where(dt > 0.0, a, 0.0)

        (gcr, gcg, gcb), gt = _combine_group([r * a, gg * a, b * a], 1.0 - a)
        return (cr + tr * gcr, cg + tr * gcg, cb + tr * gcb, tr * gt)

    zero = jnp.zeros((1, RAY_TILE), jnp.float32)
    one = jnp.ones((1, RAY_TILE), jnp.float32)
    cr, cg, cb, tr = jax.lax.fori_loop(
        0, n_groups, group_body, (zero, zero, zero, one))
    out_ref[0:1, :] = cr
    out_ref[1:2, :] = cg
    out_ref[2:3, :] = cb
    out_ref[3:4, :] = 1.0 - tr


def _chunk_tables(color_table: jnp.ndarray, alpha_table: jnp.ndarray
                  ) -> jnp.ndarray:
    """Host-side layout: stack r/g/b/alpha nodal tables into
    (4, n_chunks, CHUNK), padding the tail with the last node (coordinates
    are clamped to n_orig - 1, so pads are never interpolated against)."""
    rgba = jnp.concatenate(
        [color_table.astype(jnp.float32),
         alpha_table.astype(jnp.float32)[:, None]], axis=1)  # (N, 4)
    n = rgba.shape[0]
    pad = (-n) % CHUNK
    if pad:
        rgba = jnp.concatenate([rgba, jnp.tile(rgba[-1:], (pad, 1))], axis=0)
    return rgba.T.reshape(4, -1, CHUNK)


@jax.custom_vjp
def tf_composite_pallas(sigma, dt, color_table, alpha_table, value_range,
                        base):
    """Fused kernel entry: sigma (R, S), dt (R, S) -> (color (R, 3),
    alpha (R,)). R and S are padded internally (pads carry dt=0)."""
    return _tf_composite_fwd_impl(sigma, dt, color_table, alpha_table,
                                  value_range, base)


def _tf_composite_fwd_impl(sigma, dt, color_table, alpha_table, value_range,
                           base, interpret=None):
    if interpret is None:
        # Mosaic targets TPU only; elsewhere (CPU tests) run interpreted.
        interpret = jax.default_backend() != "tpu"
    r, s = sigma.shape
    pad_r = (-r) % RAY_TILE
    pad_s = (-s) % GROUP
    if pad_r or pad_s:
        sigma = jnp.pad(sigma, ((0, pad_r), (0, pad_s)))
        dt = jnp.pad(dt, ((0, pad_r), (0, pad_s)))  # pads have dt=0
    r_pad, s_pad = sigma.shape
    n_groups = s_pad // GROUP

    tab = _chunk_tables(color_table, alpha_table)  # (4, n_chunks, CHUNK)
    n_orig = alpha_table.shape[0]
    n_chunks = tab.shape[1]

    # steps on sublanes: transpose to (S, R)
    kernel = functools.partial(_kernel, n_groups=n_groups, n_orig=n_orig,
                               n_chunks=n_chunks)
    out = pl.pallas_call(
        kernel,
        grid=(r_pad // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((s_pad, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_chunks, CHUNK), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((4, RAY_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, r_pad), jnp.float32),
        interpret=interpret,
    )(sigma.T.astype(jnp.float32), dt.T.astype(jnp.float32), tab,
      jnp.asarray(value_range, jnp.float32).reshape(1, 2),
      jnp.asarray(base, jnp.float32).reshape(1, 1))
    return out[:3, :r].T, out[3, :r]


def _fwd(sigma, dt, color_table, alpha_table, value_range, base):
    out = tf_composite_pallas(sigma, dt, color_table, alpha_table,
                              value_range, base)
    return out, (sigma, dt, color_table, alpha_table, value_range, base)


def _bwd(res, g):
    """Backward = autodiff of the jnp reference (recompute; no residual
    storage beyond the inputs, which the caller already holds)."""
    sigma, dt, color_table, alpha_table, value_range, base = res
    _, vjp = jax.vjp(tf_composite_reference, sigma, dt, color_table,
                     alpha_table, value_range, base)
    return vjp(g)


tf_composite_pallas.defvjp(_fwd, _bwd)
