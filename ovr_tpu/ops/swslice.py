"""Fused shear-warp slice loop as a single Pallas TPU kernel.

The XLA version of the slice loop (render.shearwarp) writes its carry
(color/gradient/depth/transmittance over the intermediate grid) to HBM
every slice and materializes each resampled plane and its classification.
This kernel fuses the whole loop:

  grid = (row_tiles, n_slices)      # slices minor: executed sequentially
  per step: the plane's two voxel slabs stream HBM->VMEM (scalar-prefetched
  z indices drive the BlockSpec index maps) and are z-lerped; resampling is
  two MXU matmuls with a *windowed* K dimension — the interpolation
  matrices are 2-banded, so a row tile of the ray fan only reads a
  contiguous window of ~r_tile*Nr/Hi source rows (the window offset per
  (tile, slice) is scalar-prefetched):

      t1  = wr_loc @ plane[w0:w0+W]    (R,  W ) x (W,  Nc) -> (R, Nc)
      smp = t1 @ wc.T                  (R,  Nc) x (Nc, Wi) -> (R, Wi)

  vs the naive (Hi, Nr) x (Nr, Nc) chain this cuts the row-resample MAC
  count by ~Nr/W per slice and never recomputes work across tiles (the
  round-2 column-tiled kernel re-ran the full row resample once per
  128-lane tile); the windowed sums match the full ones up to 1-ulp
  hat-weight rounding (the excluded terms are exact zeros).
  Classification is a two-tap 128-lane table gather per lane chunk, opacity
  correction uses the exact per-pixel plane/ray interval overlap (slab test
  inline), and the result over-composites directly into the output block,
  which stays resident in VMEM for all slices of a row tile and is flushed
  to HBM once.

Data-dependent work avoidance (round 4 — the reference's two defining
optimizations, re-expressed for a tile-synchronous kernel):

  * Macrocell empty-slice skipping (`accel/spatial_partition.h:56-96`,
    `accel/dda.h:30-148`): the caller passes the macrocell majorant grid in
    traversal order; `_active_slices` reduces it to a per-(tile, slice)
    activity bit (is any majorant nonzero inside the tile's source-row
    window of the slice's two slabs?) and compacts the active slice indices
    into a prefetched per-tile schedule `jf[t, i]` with count `n_act[t]`.
    The kernel's grid stays (tiles, n_slices); steps past `n_act[t]` repeat
    the last active slice's block indices — Pallas elides the re-fetch when
    a block index is unchanged — and skip all compute, so empty planes cost
    neither DMA nor FLOPs.
  * Early ray termination (`shaders_raymarching.cu:110`, alpha >= 0.9999):
    after each composited slice the kernel ANDs, over the tile, "this ray
    can still contribute" = (transmittance > 1e-4) AND (the ray's box-exit
    parameter lies ahead of the current plane). When no ray can, a
    scalar-memory flag kills all remaining compute for the tile (the plane
    schedule is front-to-back, so the test is monotone).

Shading modes (static):
  0 none     — emission-absorption only
  1 diffuse  — gradient shading; the world gradient is the *analytic*
               derivative of the bilinear reconstruction, evaluated as two
               extra matmuls with the interpolation matrices' derivative
               (plus the along-ray difference for the axial component)
  2 shadow   — diffuse + per-sample shadow from the light-transmittance
               lattice, resampled with the same machinery (streamed like
               the volume with its own prefetched z indices)

Native-dtype residency (`array.h:68-106` — the reference samples u8/u16
volumes as normalized-integer textures): the volume may stream as float32,
bfloat16, uint8 or uint16. Integer slabs are cast on the VPU after the DMA
and the normalization scale (1/int_max) is folded into the row
interpolation weights (S_GS), so HBM footprint and traffic shrink 2-4x
while every downstream quantity stays in normalized units.

`bf16=True` additionally runs every matmul with bfloat16 operands (f32
accumulation via preferred_element_type).

Reference semantics fused: trilinear sampling (`shaders_common.h:186-193`,
factorized per plane), TF classification (`:356-367`), opacity correction
(`shaders_raymarching.cu:117-122`), gradient shading + shadow modulation
(`:125-159`), front-to-back over (`:160-166`), early exit (`:110`),
macrocell skipping (`accel/dda.h`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128  # fan-width padding granularity = one vreg of lanes
CHUNK = 128  # TF-table lanes per gather chunk
MC = 16  # macrocell edge in voxels (accel.MACROCELL_SIZE)
T_EPS = 1e-4  # termination transmittance (alpha >= 0.9999)

# scalar vector layout (SMEM input, shape (1, N_SCALARS)).
# S_LO1/EX1/LO2/EX2 are the SAMPLE box (voxel texel coordinates); the
# S_C* entries are the CLIP box (ray-interval clamp) — they differ only on
# the bricked path (parallel.bricks), where each device samples its local
# slab but integrates exactly its ownership interval. S_SMP0/S_SMPSC map
# traversal depth z_rel to the local grid's axial texel coordinate
# (c = (z_rel - S_SMP0) * S_SMPSC - 0.5); unbricked they reduce to
# (0, NA/EXA). S_OFF folds the slice-subrange offset (slice0 + jitter).
(S_LO1, S_EX1, S_LO2, S_EX2, S_EW1, S_EW2, S_DW1, S_DW2, S_HALF, S_DZ,
 S_OFF, S_VLO, S_VSCALE, S_BASE, S_LAM0, S_NA, S_DLAM, S_EXA,
 S_ORTHO, S_LD1, S_LD2, S_LDA, S_K1O, S_K2O, S_INVDA, S_DZDLAM, S_NLA,
 S_W00, S_W01, S_W02, S_W10, S_W11, S_W12, S_W20, S_W21, S_W22,
 S_CLO1, S_CEX1, S_CLO2, S_CEX2, S_CLA, S_CHA, S_SMP0, S_SMPSC,
 S_GLO1, S_GEX1, S_GLO2, S_GEX2) = range(48)
# up to 4 extra directional lights, 4 slots each: d_w1, d_w2, d_axis, I
S_EL0 = 48
# normalized-integer / storage scale folded into the row weights
S_GS = 64
# fan cell spacings (p and q axes) — the FD-gradient step
S_DP = 65
S_DQ = 66
# first padded-fan row's q value (the kernel rebuilds each tile's halo-
# extended q rows arithmetically — Mosaic cannot concatenate 1D vectors)
S_QLO = 67
N_SCALARS = 72


def _tf_gather(tab_ref, ch, idx, n_chunks):
    """Two-tap nodal gather: tab_ref (4, n_chunks, 1, CHUNK); idx
    (R, CHUNK) int32 node indices. Returns (R, CHUNK)."""
    r = idx.shape[0]
    out = jnp.zeros(idx.shape, jnp.float32)
    for k in range(n_chunks):
        local = idx - k * CHUNK
        ok = (local >= 0) & (local < CHUNK)
        tile = jnp.broadcast_to(tab_ref[ch, k], (r, CHUNK))
        g = jnp.take_along_axis(tile, jnp.clip(local, 0, CHUNK - 1), axis=1)
        out = jnp.where(ok, g, out)
    return out


def _interp_w(pos, n):
    """Hat-function interpolation weights (O, n) for clamped positions."""
    i = jax.lax.broadcasted_iota(jnp.int32, (pos.shape[0], n), 1
                                 ).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - i))


def _interp_dw(pos, n):
    """d(weights)/d(pos): (O, n), -sign inside the unit support."""
    i = jax.lax.broadcasted_iota(jnp.int32, (pos.shape[0], n), 1
                                 ).astype(jnp.float32)
    d = pos[:, None] - i
    return jnp.where((jnp.abs(d) < 1.0) & (jnp.abs(d) > 0.0),
                     -jnp.sign(d), 0.0)


def _dot(a, b, bf16, trans_b=False):
    """MXU matmul with optional bfloat16 operands, f32 accumulation.
    trans_b contracts b's dim 1 (saves materializing b.T)."""
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    dims = (((1,), (1,)), ((), ())) if trans_b else (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def _dot_t(a, b, bf16):
    """(K, R) x (C, K) -> (R, C): contract a's dim 0 with b's dim 1
    (neither transpose materialized)."""
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, (((0,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _up(x):
    """Integer / compact slabs -> f32 on the VPU after the DMA (Mosaic
    has no direct uint8/16 -> f32 cast; hop via int32)."""
    if x.dtype == jnp.float32:
        return x
    if x.dtype in (jnp.uint8, jnp.uint16):
        return x.astype(jnp.int32).astype(jnp.float32)
    return x.astype(jnp.float32)


def _axis_rng(o, d, lo, ext):
    """Per-axis slab-test entry/exit parameters (ray o + t*d vs
    [lo, lo+ext]); the degenerate-direction convention matches
    `core.sampling.intersect_box`."""
    small = jnp.abs(d) < 1e-12
    dd = jnp.where(small, 1.0, d)
    a = (lo - o) / dd
    b = (lo + ext - o) / dd
    lo_t = jnp.where(small, jnp.where(o >= lo, -3.4e38, 3.4e38),
                     jnp.minimum(a, b))
    hi_t = jnp.where(small, jnp.where(o <= lo + ext, 3.4e38, -3.4e38),
                     jnp.maximum(a, b))
    return lo_t, hi_t


def _tile_geometry(sc, pg_ref, qg_ref, geom, r_tile, wi_p, col_chunk):
    """Precompute the tile's SLICE-INDEPENDENT per-pixel ray geometry
    into geom (2, R, Wi): [l_in (clip-box entry, clamped >= 0), exit_t
    (clip-box exit)] — the inline slab test the column loop otherwise
    rebuilt every (slice, chunk). `speed` stays a cheap per-chunk
    recompute (one sqrt); a third plane pushed the shadow kernel 140 KB
    over the 16 MB VMEM limit at the 1024 scale."""
    ortho = sc(S_ORTHO) > 0.5
    pg = pg_ref[0, :]
    qg = qg_ref[:, 0]
    d2 = jnp.where(ortho, sc(S_DW2), qg)
    o2 = jnp.where(ortho, qg, sc(S_EW2))
    l2, h2 = _axis_rng(o2, d2, sc(S_CLO2), sc(S_CEX2))  # (R,)
    la = sc(S_CLA)
    ha = sc(S_CHA)
    for w in range(wi_p // col_chunk):
        cs = slice(w * col_chunk, (w + 1) * col_chunk)
        pgc = pg[cs]
        d1 = jnp.where(ortho, sc(S_DW1), pgc)
        o1 = jnp.where(ortho, pgc, sc(S_EW1))
        l1, h1 = _axis_rng(o1, d1, sc(S_CLO1), sc(S_CEX1))  # (CC,)
        geom[0, :, cs] = jnp.maximum(
            jnp.maximum(jnp.maximum(l1[None, :], l2[:, None]), la), 0.0)
        geom[1, :, cs] = jnp.minimum(
            jnp.minimum(h1[None, :], h2[:, None]), ha)


def _slice_body(js, j_pos, t, sc, make_dots, n_w, row_base, light_pk,
                light_pk1, pg_ref, qg_ref, tab_ref, out_ref, prev_s,
                t1_scr, smp_scr, g1_scr, c0_ref, *, n_r, n_c, n_orig,
                n_chunks, r_tile, wi_p, wi_i, mode, l_r, l_c, bf16,
                col_chunk, n_extra, win_c, term, fd, n_cb=None, l_cb=None,
                cw_lane=0, geom=None):
    """Resample, classify, shade and composite ONE slice plane into
    out_ref (8, R, Wi) — the VMEM compositing accumulator, rows
    [c_r, c_g, c_b, g_x, g_y, g_z, depth, trans]. Shared by the
    BlockSpec-pipelined kernel (`_kernel`) and the persistent manual-DMA
    kernel (`_kernel_persist`).

    `make_dots(fz)` -> (row_dot, row_dot_t): contract interpolation rows
    (R, n_w) with the z-lerped slab window — the caller binds them over
    whatever buffers its streaming scheme fills. `row_base` is the
    window's first source row (f32). `j_pos` is the schedule step (the
    axial-FD prev_s is valid only for j_pos > 0). Returns the tile's
    "any ray can still contribute" bool (early termination)."""
    jf = js.astype(jnp.float32)
    z_rel = (jf + sc(S_OFF)) * sc(S_DZ)
    lam = z_rel * sc(S_DLAM) + sc(S_LAM0)
    ortho = sc(S_ORTHO) > 0.5

    # z-lerp weight (fz recomputed to match the prefetched
    # k0 = clip(floor(c), 0, n_a - 2)); axial texel mapping goes
    # through the sample box (S_SMP0/S_SMPSC) = the global box unbricked
    c = jnp.clip((z_rel - sc(S_SMP0)) * sc(S_SMPSC) - 0.5, 0.0,
                 sc(S_NA) - 1.0)
    kf = jnp.clip(jnp.floor(c), 0.0, sc(S_NA) - 2.0)
    fz = c - kf
    row_dot, row_dot_t = make_dots(fz)
    # buffer widths: the persistent path pads the streamed buffers' minor
    # dims to 128 lanes (HBM DMA slice alignment); the clipped positions
    # never exceed the REAL extents, so pad columns carry zero hat weight
    n_cb = n_c if n_cb is None else n_cb
    l_cb = l_c if l_cb is None else l_cb
    if True:
        # row-shared quantities (independent of fan columns). Shaded modes
        # resample one HALO row beyond each tile edge (the fan q grid is
        # uniform, so the halo q values are just +-dq) and take the
        # gradient by central finite differences over the fan — the
        # reference's own gradient is an FD
        # (`shaders_common.h:195-215`), and this removes the two extra
        # full-width gradient matmuls per plane.
        pg = pg_ref[0, :]  # (Wi,)
        qg = qg_ref[:, 0]  # (R,)
        fd_on = mode >= 1 and fd
        rows = r_tile + 2 if fd_on else r_tile
        if fd_on:
            # q is a uniform grid: tile t's halo-extended rows are
            # qlo + (t*R - 1 + i) * dq, i in [0, R+2)
            base = sc(S_QLO) + (t * r_tile - 1).astype(jnp.float32) * sc(
                S_DQ)
            ri = jax.lax.broadcasted_iota(
                jnp.int32, (rows, 1), 0).astype(jnp.float32)[:, 0]
            qge = base + ri * sc(S_DQ)
        else:
            qge = qg
        x2e = jnp.where(ortho, qge + sc(S_DW2) * lam,
                        sc(S_EW2) + qge * lam)
        vr = jnp.clip((x2e - sc(S_LO2)) / sc(S_EX2) * n_r - 0.5, 0.0,
                      n_r - 1.0)
        vr_loc = jnp.clip(vr - row_base, 0.0, n_w - 1.0)
        # storage scale (normalized-int 1/max) folds into the row weights
        wr = _interp_w(vr_loc, n_w) * sc(S_GS)  # (rows, W)
        t1 = t12 = None
        if win_c:
            # transposed (Nc, rows | 2R) row-resample accumulator in
            # scratch: each column chunk below dynamic-slices a sublane-
            # aligned K window out of it, cutting the column contraction
            # from Nc to win_c MACs per output (the hat matrix is
            # 2-banded); the analytic-gradient path stacks the d/d(row)
            # resample into the extra lanes
            if mode >= 1 and not fd:
                t1_scr[:, 0:r_tile] = row_dot_t(wr)
                t1_scr[:, r_tile:2 * r_tile] = row_dot_t(
                    _interp_dw(vr_loc, n_w) * sc(S_GS))
            else:
                t1_scr[:, 0:rows] = row_dot_t(wr)
        elif mode >= 1 and not fd:
            # analytic path: stack value + d/d(row) weight rows into one
            # matmul (M = 2R fills the MXU)
            wrs = jnp.concatenate(
                [wr, _interp_dw(vr_loc, n_w) * sc(S_GS)], axis=0)
            t12 = row_dot(wrs)  # (2R, Nc): [t1; g2row]
            t1 = t12[:r_tile]
        else:
            t1 = row_dot(wr)  # (rows, Nc)
            if cw_lane:
                # lane-windowed column contraction: stage the row
                # resample in scratch so each column chunk below slices a
                # 128-aligned K window out of it — the column hat matrix
                # is 2-banded, so both the hat build (VPU) and the
                # contraction (MXU) shrink from n_cb to cw_lane MACs per
                # output
                t1_scr[0:rows, :] = t1
        x2 = x2e[1:r_tile + 1] if fd_on else x2e  # (R,)
        if mode == 2:
            cl = jnp.clip(z_rel / sc(S_EXA) * sc(S_NLA) - 0.5, 0.0,
                          sc(S_NLA) - 1.0)
            kl = jnp.clip(jnp.floor(cl), 0.0, sc(S_NLA) - 2.0)
            fzl = cl - kl
            # the lattice spans the GLOBAL box (S_G*), not the sample box
            lplane = light_pk * (1.0 - fzl) + light_pk1 * fzl
            lvr = jnp.clip((x2 - sc(S_GLO2)) / sc(S_GEX2) * l_r - 0.5, 0.0,
                           l_r - 1.0)
            lt = _dot(_interp_w(lvr, l_r), lplane, bf16)  # (R, Lc)

        if geom is None:
            d2 = jnp.where(ortho, sc(S_DW2), qg)
            o2 = jnp.where(ortho, qg, sc(S_EW2))
            l2, h2 = _axis_rng(o2, d2, sc(S_CLO2), sc(S_CEX2))  # (R,)
            la = sc(S_CLA)
            ha = sc(S_CHA)

        if fd_on:
            # pass A: resample the whole (halo-extended) fan plane into
            # scratch — the only per-plane matmul work
            for w in range(wi_p // col_chunk):
                cs = slice(w * col_chunk, (w + 1) * col_chunk)
                x1c = jnp.where(ortho, pg[cs] + sc(S_DW1) * lam,
                                sc(S_EW1) + pg[cs] * lam)
                vcc = jnp.clip((x1c - sc(S_LO1)) / sc(S_EX1) * n_c - 0.5,
                               0.0, n_c - 1.0)
                if cw_lane:
                    c0 = pl.multiple_of(c0_ref[js, w] * 128, 128)
                    vcl = jnp.clip(vcc - c0.astype(jnp.float32), 0.0,
                                   cw_lane - 1.0)
                    t1w = t1_scr[0:rows, pl.dslice(c0, cw_lane)]
                    smp_scr[0:rows, cs] = _dot(
                        t1w, _interp_w(vcl, cw_lane), bf16, trans_b=True)
                elif win_c:
                    c0 = c0_ref[js, w] * 8
                    vcl = jnp.clip(vcc - c0.astype(jnp.float32), 0.0,
                                   win_c - 1.0)
                    t1w = t1_scr[pl.dslice(c0, win_c), 0:rows]
                    smp_scr[0:rows, cs] = _dot_t(
                        t1w, _interp_w(vcl, win_c), bf16)
                else:
                    smp_scr[0:rows, cs] = _dot(
                        t1, _interp_w(vcc, n_cb), bf16, trans_b=True)
            # lateral gradient (d smp / d x1) by central FD over the fan
            # columns, one-sided at the fan border; Dx1 = dp (ortho) or
            # dp * lam (perspective central projection)
            lamf = jnp.where(ortho, 1.0, lam)
            s_mid = smp_scr[1:r_tile + 1, :]
            # pltpu.roll needs non-negative shifts: wi_p-1 == -1 circular
            fwd = pltpu.roll(s_mid, wi_p - 1, 1) - s_mid
            bwd = s_mid - pltpu.roll(s_mid, 1, 1)
            col = jax.lax.broadcasted_iota(jnp.int32, (r_tile, wi_p), 1)
            cen = 0.5 * (fwd + bwd)
            # one-sided at the REAL fan's last column (wi_i - 1), matching
            # the XLA fallback's unpadded border; pad columns are discarded
            g1v = jnp.where(col == 0, fwd,
                            jnp.where(col >= wi_i - 1, bwd, cen))
            g1_scr[:, :] = g1v / (sc(S_DP) * lamf)

        any_alive = jnp.zeros((), jnp.bool_)

        # sweep the fan width in column chunks: the interpolation matrix,
        # classification and shading never materialize wider than one chunk
        for w in range(wi_p // col_chunk):
            cs = slice(w * col_chunk, (w + 1) * col_chunk)
            pgc = pg[cs]  # (CC,)
            x1 = jnp.where(ortho, pgc + sc(S_DW1) * lam,
                           sc(S_EW1) + pgc * lam)
            vc = jnp.clip((x1 - sc(S_LO1)) / sc(S_EX1) * n_c - 0.5, 0.0,
                          n_c - 1.0)
            smp2 = t1w = vc_loc = wc = None
            if fd_on:
                smp = smp_scr[1:r_tile + 1, cs]  # resampled in pass A
            elif win_c:
                c0 = c0_ref[js, w] * 8
                vc_loc = jnp.clip(vc - c0.astype(jnp.float32), 0.0,
                                  win_c - 1.0)
                wc = _interp_w(vc_loc, win_c)  # (CC, Wc)
                if mode >= 1:
                    t1w = t1_scr[pl.dslice(c0, win_c), 0:2 * r_tile]
                    smp2 = _dot_t(t1w, wc, bf16)  # (2R, CC)
                    smp = smp2[:r_tile]
                else:
                    t1w = t1_scr[pl.dslice(c0, win_c), 0:r_tile]
                    smp = _dot_t(t1w, wc, bf16)  # (R, CC)
            elif mode >= 1:
                wc = _interp_w(vc, n_cb)  # (CC, Nc)
                smp2 = _dot(t12, wc, bf16, trans_b=True)  # (2R, CC)
                smp = smp2[:r_tile]
            elif cw_lane:
                c0 = pl.multiple_of(c0_ref[js, w] * 128, 128)
                vcl = jnp.clip(vc - c0.astype(jnp.float32), 0.0,
                               cw_lane - 1.0)
                t1w = t1_scr[0:r_tile, pl.dslice(c0, cw_lane)]
                smp = _dot(t1w, _interp_w(vcl, cw_lane), bf16,
                           trans_b=True)  # (R, CC)
            else:
                smp = _dot(t1, _interp_w(vc, n_cb), bf16,
                           trans_b=True)  # (R, CC)

            # exact per-pixel plane/ray interval overlap (inline slab
            # test). The quantities are SLICE-INDEPENDENT: the persistent
            # kernel precomputes them once per tile (`_tile_geometry`)
            # instead of per (slice, chunk) — they were ~half the
            # per-chunk VPU chain
            pp = jnp.broadcast_to(pgc[None, :], (r_tile, col_chunk))
            qq = jnp.broadcast_to(qg[:, None], (r_tile, col_chunk))
            if geom is None:
                d1 = jnp.where(ortho, sc(S_DW1), pgc)
                o1 = jnp.where(ortho, pgc, sc(S_EW1))
                l1, h1 = _axis_rng(o1, d1, sc(S_CLO1), sc(S_CEX1))
                l_in = jnp.maximum(jnp.maximum(
                    jnp.maximum(l1[None, :], l2[:, None]), la), 0.0)
                exit_t = jnp.minimum(
                    jnp.minimum(h1[None, :], h2[:, None]), ha)
                speed = jnp.where(ortho, 1.0,
                                  jnp.sqrt(pp * pp + qq * qq + 1.0))
            else:
                l_in = geom[0, :, cs]
                exit_t = geom[1, :, cs]
                speed = jnp.where(ortho, 1.0,
                                  jnp.sqrt(pp * pp + qq * qq + 1.0))
            l_out = jnp.maximum(exit_t, l_in)
            seg_lo = jnp.maximum(lam - sc(S_HALF), l_in)
            seg_hi = jnp.minimum(lam + sc(S_HALF), l_out)
            dt_w = jnp.maximum(seg_hi - seg_lo, 0.0) * speed

            # classify per 128-lane sub-chunk: value -> two-tap lookup
            v = jnp.clip((smp - sc(S_VLO)) * sc(S_VSCALE), 0.0, 1.0)
            cc = v * (n_orig - 1)
            i0_f = jnp.clip(jnp.floor(cc), 0.0, n_orig - 1.0)
            f = cc - i0_f
            parts = {0: [], 1: [], 2: [], 3: []}
            for u in range(col_chunk // CHUNK):
                sl = slice(u * CHUNK, (u + 1) * CHUNK)
                i0 = i0_f[:, sl].astype(jnp.int32)
                i1 = jnp.minimum(i0 + 1, n_orig - 1)
                fw = f[:, sl]
                for ch in range(4):
                    lo_v = _tf_gather(tab_ref, ch, i0, n_chunks)
                    hi_v = _tf_gather(tab_ref, ch, i1, n_chunks)
                    parts[ch].append(lo_v * (1.0 - fw) + hi_v * fw)

            def cat(xs):
                return xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=1)

            r = jnp.clip(cat(parts[0]), 0.0, 1.0)
            g = jnp.clip(cat(parts[1]), 0.0, 1.0)
            b = jnp.clip(cat(parts[2]), 0.0, 1.0)
            a_raw = cat(parts[3])

            # opacity correction 1 - (1-a)^(base*dt), nearly_equal skip
            k = sc(S_BASE) * dt_w
            a_c = jnp.clip(a_raw, 0.0, 1.0 - 1e-7)
            a = jnp.clip(1.0 - jnp.exp(k * jnp.log1p(-a_c)), 0.0, 1.0)
            a = jnp.where(jnp.abs(k - 1.0) < 1e-7,
                          jnp.clip(a_raw, 0.0, 1.0), a)
            a = jnp.where(dt_w > 0.0, a, 0.0)
            a = jnp.minimum(a, 1.0 - 1e-6)  # over_scan's A_MAX

            if mode >= 1:
                if fd:
                    # fan-FD gradient (reference semantics,
                    # shaders_common.h:195-215): lateral from the
                    # precomputed full-width FD, row-wise from halo rows
                    g1 = g1_scr[:, cs]
                    g2 = (smp_scr[2:r_tile + 2, cs] - smp_scr[0:r_tile, cs]
                          ) * (0.5 / (sc(S_DQ) * lamf))
                elif win_c:
                    dwc = _interp_dw(vc_loc, win_c)
                    # rows [R:] are d2/drow-dcol — wasted, but K=win_c is
                    # small and it avoids a lane reslice
                    g1 = _dot_t(t1w, dwc, bf16)[:r_tile] * (
                        n_c / sc(S_EX1))
                    g2 = smp2[r_tile:] * (n_r / sc(S_EX2))
                else:
                    dwc = _interp_dw(vc, n_cb)
                    g1 = _dot(t1, dwc, bf16,
                              trans_b=True) * (n_c / sc(S_EX1))
                    g2 = smp2[r_tile:] * (n_r / sc(S_EX2))
                ds = jnp.where(j_pos > 0,
                               (smp - prev_s[:, cs]) / sc(S_DZDLAM), 0.0)
                k1 = jnp.where(ortho, sc(S_K1O), pp)
                k2 = jnp.where(ortho, sc(S_K2O), qq)
                ga = (ds - g1 * k1 - g2 * k2) * sc(S_INVDA)
                n1, n2, na = -g1, -g2, -ga
                inv = jax.lax.rsqrt(n1 * n1 + n2 * n2 + na * na + 1e-12)
                cos_nl = jnp.abs(sc(S_LD1) * n1 + sc(S_LD2) * n2
                                 + sc(S_LDA) * na) * inv
                if mode == 2:
                    lvc = jnp.clip(
                        (x1 - sc(S_GLO1)) / sc(S_GEX1) * l_c - 0.5,
                        0.0, l_c - 1.0)
                    sh = _dot(lt, _interp_w(lvc, l_cb), bf16, trans_b=True)
                    shadow = jnp.clip(sh, 0.0, 1.0)
                else:
                    shadow = 0.0
                # total = primary (x0.5, intensity 2 folded) + extra dir
                # lights (integrator._march_step's shade formula)
                total = cos_nl
                for i in range(n_extra):
                    b0 = S_EL0 + 4 * i
                    ce = jnp.abs(sc(b0) * n1 + sc(b0 + 1) * n2
                                 + sc(b0 + 2) * na) * inv
                    total = total + 0.5 * ce * sc(b0 + 3)
                shade = 0.5 + total * (1.0 - shadow)
                r = jnp.clip(r * shade, 0.0, 1.0)
                g = jnp.clip(g * shade, 0.0, 1.0)
                b = jnp.clip(b * shade, 0.0, 1.0)
                nu1, nu2, nua = n1 * inv, n2 * inv, na * inv
                ncx = jnp.clip(
                    sc(S_W00) * nu1 + sc(S_W01) * nu2 + sc(S_W02) * nua,
                    0.0, 1.0)
                ncy = jnp.clip(
                    sc(S_W10) * nu1 + sc(S_W11) * nu2 + sc(S_W12) * nua,
                    0.0, 1.0)
                ncz = jnp.clip(
                    sc(S_W20) * nu1 + sc(S_W21) * nu2 + sc(S_W22) * nua,
                    0.0, 1.0)

            trans = out_ref[7, :, cs]
            aw = trans * a
            out_ref[0, :, cs] += aw * r
            out_ref[1, :, cs] += aw * g
            out_ref[2, :, cs] += aw * b
            if mode >= 1:
                out_ref[3, :, cs] += aw * ncx
                out_ref[4, :, cs] += aw * ncy
                out_ref[5, :, cs] += aw * ncz
                prev_s[:, cs] = smp
            out_ref[6, :, cs] += aw * (lam * speed)
            trans_next = trans * (1.0 - a)
            out_ref[7, :, cs] = trans_next
            if term:
                # a ray still matters if it is unsaturated AND its box exit
                # lies ahead of this (front-to-back) plane
                any_alive = any_alive | jnp.any(
                    (trans_next > T_EPS) & (exit_t > lam))

        return any_alive


def _kernel(k0_ref, k0l_ref, w0_ref, wb_ref, c0_ref, jf_ref, na_ref,
            vol0a_ref, vol0b_ref, vol1a_ref, vol1b_ref, lg0_ref, lg1_ref,
            pg_ref, qg_ref, tab_ref, sc_ref, out_ref, prev_s, t1_scr,
            smp_scr, g1_scr, alive_ref, *, n_r, n_c, n_orig, n_chunks,
            r_tile, wi_p, wi_i, win, mode, l_r, l_c, bf16, paired,
            col_chunk, n_extra, win_c, sub, term, fd):
    """One (row tile, slice-schedule step) grid step of the BlockSpec-
    pipelined kernel. out_ref (8, R, Wi) doubles as the compositing
    accumulator (VMEM-resident until the tile changes).

    Step j of tile t processes slice jf_ref[t, j] of the global plane
    schedule (the compacted active-slice list); steps >= na_ref[t] and
    steps after the tile's rays saturate are skipped.

    `paired`: block-pair streaming — each slab arrives as two consecutive
    (WB=win)-row HBM blocks (vol*a/vol*b at block rows wb, wb+1) instead of
    the full plane, so HBM traffic and VMEM scale with the row *window*,
    not the plane (the 1024^3-class path). Unpaired: vol*b alias vol*a and
    hold the whole plane."""
    t = pl.program_id(0)
    j = pl.program_id(1)
    n_slices = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        out_ref[0:7, :, :] = jnp.zeros((7, r_tile, wi_p), jnp.float32)
        out_ref[7, :, :] = jnp.ones((r_tile, wi_p), jnp.float32)
        if mode >= 1:
            prev_s[:, :] = jnp.zeros((r_tile, wi_p), jnp.float32)
        if term:
            alive_ref[0, 0] = 1

    def sc(i):
        return sc_ref[0, i]

    js = jf_ref[t, j]  # actual slice index in the global schedule
    go = j < na_ref[t]
    if term:
        go = go & (alive_ref[0, 0] == 1)

    @pl.when(go)
    def _body():
        # window of source rows this row tile touches (prefetched in units
        # of `sub` rows so Mosaic can prove sublane alignment of the
        # dynamic slice). Paired mode avoids value-level dynamic slicing
        # (no Mosaic lowering): interpolation rows are built in block-PAIR
        # coordinates and the row matmul splits across the two blocks.
        w0 = w0_ref[t, js] * sub
        if paired:
            row_base = (wb_ref[t, js] * win).astype(jnp.float32)
            n_w = 2 * win

            def make_dots(fz):
                plane_a = (_up(vol0a_ref[0]) * (1.0 - fz)
                           + _up(vol1a_ref[0]) * fz)
                plane_b = (_up(vol0b_ref[0]) * (1.0 - fz)
                           + _up(vol1b_ref[0]) * fz)

                def row_dot(w):
                    return (_dot(w[:, :win], plane_a, bf16)
                            + _dot(w[:, win:], plane_b, bf16))

                def row_dot_t(w):  # (R, n_w) -> (Nc, R)
                    return (_dot_t(plane_a, w[:, :win], bf16)
                            + _dot_t(plane_b, w[:, win:], bf16))

                return row_dot, row_dot_t
        else:
            row_base = w0.astype(jnp.float32)
            n_w = win

            def make_dots(fz):
                win0 = _up(vol0a_ref[0, pl.dslice(w0, win), :])
                win1 = _up(vol1a_ref[0, pl.dslice(w0, win), :])
                plane_w = win0 * (1.0 - fz) + win1 * fz  # (W, Nc)

                def row_dot(w):
                    return _dot(w, plane_w, bf16)

                def row_dot_t(w):  # (R, n_w) -> (Nc, R)
                    return _dot_t(plane_w, w, bf16)

                return row_dot, row_dot_t

        any_alive = _slice_body(
            js, j, t, sc, make_dots, n_w, row_base, lg0_ref[0], lg1_ref[0],
            pg_ref, qg_ref, tab_ref, out_ref, prev_s, t1_scr, smp_scr,
            g1_scr, c0_ref, n_r=n_r, n_c=n_c, n_orig=n_orig,
            n_chunks=n_chunks, r_tile=r_tile, wi_p=wi_p, wi_i=wi_i,
            mode=mode, l_r=l_r, l_c=l_c, bf16=bf16, col_chunk=col_chunk,
            n_extra=n_extra, win_c=win_c, term=term, fd=fd)
        if term:
            alive_ref[0, 0] = any_alive.astype(jnp.int32)

    @pl.when(j == n_slices - 1)
    def _emit():
        out_ref[7, :, :] = 1.0 - out_ref[7, :, :]


def _kernel_persist(k0_ref, k0l_ref, w0_ref, jf_ref, na_ref, c0l_ref,
                    vol_hbm, lg_hbm, pg_ref, qg_ref, tab_ref, sc_ref,
                    out_hbm, acc, prev_s, smp_scr, g1_scr, t1_scr, geom,
                    vbuf, vsem, lbuf, lsem, osem, *, n_r, n_c, n_cb, n_orig,
                    n_chunks, r_tile, wi_p, wi_i, win, mode, l_a, l_r,
                    l_c, l_cb, bf16, col_chunk, n_extra, sub, term, fd,
                    cw_lane):
    """Persistent manual-DMA kernel: ONE grid step per row tile; the
    tile's compacted active-slice schedule runs as an in-kernel while
    loop with explicit double-buffered async copies of the EXACT
    source-row windows (`shaders_raymarching.cu:87-171` — the streaming
    hot loop the BlockSpec pipeline approximated with block pairs).

    vs `_kernel`: no per-(tile, slice) grid-step sequencing (~n_tiles x
    n_slices steps collapse to n_tiles), slab DMA is one `win`-row window
    per slab instead of two consecutive blocks (half the traffic), and
    early ray termination breaks the *DMA chain*, not just compute — a
    saturated tile stops reading HBM entirely (the reference's biggest
    win on opaque TFs, `:110`). The compositing accumulator `acc` is an
    explicit single-buffered VMEM scratch flushed to HBM once per tile
    (the BlockSpec out pipeline would double-buffer 2x4 MB at the 1024
    scale)."""
    t = pl.program_id(0)
    n = na_ref[t]

    acc[0:7, :, :] = jnp.zeros((7, r_tile, wi_p), jnp.float32)
    acc[7, :, :] = jnp.ones((r_tile, wi_p), jnp.float32)
    if mode >= 1:
        prev_s[:, :] = jnp.zeros((r_tile, wi_p), jnp.float32)

    def sc(i):
        return sc_ref[0, i]

    # hoisted slab-test geometry: worth ~4% at the 1024 scale, but the
    # shadow kernel (mode 2) sits 20 KB under the VMEM limit without it —
    # it keeps the per-chunk recompute instead
    use_geom = mode != 2
    if use_geom:
        _tile_geometry(sc, pg_ref, qg_ref, geom, r_tile, wi_p, col_chunk)

    def key_of(j):
        """(slab index, window row) the volume copies of step j read."""
        js = jf_ref[t, j]
        return k0_ref[js], pl.multiple_of(w0_ref[t, js] * sub, sub)

    def vol_dmas(slot, j):
        """The slice-j volume slab copies (recreated for wait)."""
        k, r0 = key_of(j)
        return [
            pltpu.make_async_copy(
                vol_hbm.at[k, pl.dslice(r0, win), :], vbuf.at[slot, 0],
                vsem.at[slot, 0]),
            pltpu.make_async_copy(
                vol_hbm.at[k + 1, pl.dslice(r0, win), :], vbuf.at[slot, 1],
                vsem.at[slot, 1]),
        ]

    def lg_dmas(slot, j):
        js = jf_ref[t, j]
        kl = k0l_ref[js]
        return [
            pltpu.make_async_copy(
                lg_hbm.at[kl], lbuf.at[slot, 0], lsem.at[slot, 0]),
            pltpu.make_async_copy(
                lg_hbm.at[jnp.minimum(kl + 1, l_a - 1)], lbuf.at[slot, 1],
                lsem.at[slot, 1]),
        ]

    @pl.when(n > 0)
    def _warmup():
        for d in vol_dmas(0, 0):
            d.start()
        if mode == 2:
            for d in lg_dmas(0, 0):
                d.start()

    def cond(state):
        j, alive, *_ = state
        return jnp.logical_and(j < n, alive)

    def body(state):
        # `slot`/`lslot`: which buffer holds step j's slabs; `pend`/
        # `lpend`: whether a copy into it is in flight (False when step
        # j-1's data was reused — consecutive slices often share their
        # slab pair and window, and re-copying them cost the 512^3-class
        # configs ~45 GB/frame; the BlockSpec pipeline elides those by
        # block-index equality, this loop by key equality)
        j, alive, slot, pend, lslot, lpend = state
        k, r0 = key_of(j)

        nxt = jnp.minimum(j + 1, n - 1)
        k1, r1 = key_of(nxt)
        same_v = jnp.logical_and(k1 == k, r1 == r0)
        go_v = jnp.logical_and(j + 1 < n, jnp.logical_not(same_v))
        nslot = jnp.where(same_v, slot, 1 - slot)

        @pl.when(go_v)
        def _prefetch_v():
            for d in vol_dmas(1 - slot, j + 1):
                d.start()

        if mode == 2:
            js_c = jf_ref[t, j]
            js_n = jf_ref[t, nxt]
            same_l = k0l_ref[js_n] == k0l_ref[js_c]
            go_l = jnp.logical_and(j + 1 < n, jnp.logical_not(same_l))
            nlslot = jnp.where(same_l, lslot, 1 - lslot)

            @pl.when(go_l)
            def _prefetch_l():
                for d in lg_dmas(1 - lslot, j + 1):
                    d.start()
        else:
            nlslot = lslot
            go_l = jnp.asarray(False)

        @pl.when(pend)
        def _wait_v():
            for d in vol_dmas(slot, j):
                d.wait()

        if mode == 2:
            @pl.when(lpend)
            def _wait_l():
                for d in lg_dmas(lslot, j):
                    d.wait()

        js = jf_ref[t, j]
        row_base = (w0_ref[t, js] * sub).astype(jnp.float32)

        def make_dots(fz):
            plane_w = (_up(vbuf[slot, 0]) * (1.0 - fz)
                       + _up(vbuf[slot, 1]) * fz)  # (W, Nc)

            def row_dot(w):
                return _dot(w, plane_w, bf16)

            def row_dot_t(w):  # (R, n_w) -> (Nc, R)
                return _dot_t(plane_w, w, bf16)

            return row_dot, row_dot_t

        any_alive = _slice_body(
            js, j, t, sc, make_dots, win, row_base, lbuf[lslot, 0],
            lbuf[lslot, 1], pg_ref, qg_ref, tab_ref, acc, prev_s, t1_scr,
            smp_scr, g1_scr, c0l_ref, n_r=n_r, n_c=n_c, n_orig=n_orig,
            n_chunks=n_chunks, r_tile=r_tile, wi_p=wi_p, wi_i=wi_i,
            mode=mode, l_r=l_r, l_c=l_c, bf16=bf16, col_chunk=col_chunk,
            n_extra=n_extra, win_c=0, term=term, fd=fd, n_cb=n_cb,
            l_cb=l_cb, cw_lane=cw_lane, geom=geom if use_geom else None)
        return (j + 1, any_alive if term else jnp.asarray(True),
                nslot, go_v, nlslot, go_l)

    state0 = (jnp.int32(0), jnp.asarray(True), jnp.int32(0),
              jnp.asarray(True), jnp.int32(0), jnp.asarray(mode == 2))
    j_end, _, slot_e, pend_e, lslot_e, lpend_e = jax.lax.while_loop(
        cond, body, state0)

    # early termination leaves at most one prefetched copy un-waited
    # (body(j) starts slice j+1's DMA before computing j)
    @pl.when(jnp.logical_and(j_end < n, pend_e))
    def _drain_v():
        for d in vol_dmas(slot_e, j_end):
            d.wait()

    if mode == 2:
        @pl.when(jnp.logical_and(j_end < n, lpend_e))
        def _drain_l():
            for d in lg_dmas(lslot_e, j_end):
                d.wait()

    acc[7, :, :] = 1.0 - acc[7, :, :]
    out_dma = pltpu.make_async_copy(
        acc, out_hbm.at[:, pl.dslice(t * r_tile, r_tile), :], osem)
    out_dma.start()
    out_dma.wait()


def _window_offsets(scalars, pg, qg_p, k0, n_slices, n_r, r_tile, win, sub,
                    halo=False):
    """Per-(row tile, slice) source-row window offsets (T, S) int32 in
    units of `sub` rows: floor(min over the tile's rows of vr) - 1, clamped
    so the static-width window stays inside [0, n_r). `halo` extends the
    tile's row extremes by one fan step each way — the FD-gradient path
    samples one halo row beyond each tile edge (q -/+ dq), which can map up
    to b_max voxel rows below the tile's own minimum."""
    del pg, k0
    t = qg_p.shape[0] // r_tile
    dt = qg_p.dtype
    qa = qg_p.reshape(t, r_tile)[:, 0][:, None]  # (T, 1)
    qb = qg_p.reshape(t, r_tile)[:, -1][:, None]
    jf = jnp.arange(n_slices, dtype=dt)[None, :]  # (1, S)
    z_rel = (jf + scalars[S_OFF]) * scalars[S_DZ]
    lam = z_rel * scalars[S_DLAM] + scalars[S_LAM0]
    ortho = scalars[S_ORTHO] > 0.5

    def vr_of(q):
        x2 = jnp.where(ortho, q + scalars[S_DW2] * lam,
                       scalars[S_EW2] + q * lam)
        return jnp.clip((x2 - scalars[S_LO2]) / scalars[S_EX2] * n_r - 0.5,
                        0.0, n_r - 1.0)

    lo = jnp.minimum(vr_of(qa), vr_of(qb))
    if halo:
        dq = scalars[S_DQ].astype(dt)
        lo = jnp.minimum(lo, jnp.minimum(vr_of(qa - dq), vr_of(qb + dq)))
    w0 = (jnp.floor(lo).astype(jnp.int32) - 1) // sub
    return jnp.clip(w0, 0, max(n_r - win, 0) // sub)


def _col_offsets(scalars, pg_p, n_slices, n_c, cc, win_c, granule=8,
                 n_clip=None):
    """Per-(slice, column chunk) voxel-column window offsets (S, Wc)
    int32 in units of `granule` columns (vc is monotone in p for a fixed
    slice, so chunk extremes bound the window). `n_clip` bounds the
    window's end (defaults to n_c; the persistent lane windows clip
    against the PADDED buffer width so the top window reaches the pad)."""
    wcn = pg_p.shape[0] // cc
    dt = pg_p.dtype
    pa = pg_p.reshape(wcn, cc)[:, 0][None, :]  # (1, Wc)
    pb = pg_p.reshape(wcn, cc)[:, -1][None, :]
    jf = jnp.arange(n_slices, dtype=dt)[:, None]  # (S, 1)
    z_rel = (jf + scalars[S_OFF]) * scalars[S_DZ]
    lam = z_rel * scalars[S_DLAM] + scalars[S_LAM0]
    ortho = scalars[S_ORTHO] > 0.5

    def vc_of(p):
        x1 = jnp.where(ortho, p + scalars[S_DW1] * lam,
                       scalars[S_EW1] + p * lam)
        return jnp.clip((x1 - scalars[S_LO1]) / scalars[S_EX1] * n_c - 0.5,
                        0.0, n_c - 1.0)

    lo = jnp.minimum(vc_of(pa), vc_of(pb))
    c0 = (jnp.floor(lo).astype(jnp.int32) - 1) // granule
    n_end = n_c if n_clip is None else n_clip
    return jnp.clip(c0, 0, max(n_end - win_c, 0) // granule)


def _active_slices(maj_v, k0, w0s, n_r, win, sub, mode, eps=1.19e-7):
    """Per-(tile, slice) activity from the traversal-ordered macrocell
    majorant grid maj_v (MA, MR, MC): is any majorant > eps inside the
    tile's source-row window of the slice's slab pair?

    Semantics match the reference's DDA skip (`accel/spatial_partition.h:
    56-96`): a slice whose covering macrocells all have zero majorant
    classifies to zero opacity everywhere in the tile, so skipping it is
    exact. Mode >= 1 dilates activity one slice backward so the axial
    finite-difference term (prev_s) is always computed from the adjacent
    plane. Returns active (T, S) bool.
    """
    ma, mr, _ = maj_v.shape
    m2 = maj_v.max(axis=2)  # (MA, MR) — conservative over all columns
    # slab pair (k0, k0+1) can straddle two a-cells
    m2 = jnp.maximum(m2, jnp.concatenate([m2[1:], m2[-1:]], 0))
    # sliding max over the r-cells a row window can cover
    nrc = min(win // MC + 1 + (1 if sub > MC else 0), mr)
    m3 = jax.lax.reduce_window(
        m2, -jnp.inf, jax.lax.max, window_dimensions=(1, nrc),
        window_strides=(1, 1), padding=((0, 0), (0, nrc - 1)))  # (MA, MR)
    a0 = jnp.clip(k0 // MC, 0, ma - 1)  # (S,)
    rc0 = jnp.clip((w0s * sub) // MC, 0, mr - 1)  # (T, S)
    idx = a0[None, :] * mr + rc0
    active = jnp.take(m3.reshape(-1), idx) > eps  # (T, S)
    if mode >= 1:
        # include each active slice's predecessor (zero-alpha, but its
        # sample field feeds the axial FD of the next plane)
        nxt = jnp.concatenate(
            [active[:, 1:], jnp.zeros_like(active[:, :1])], 1)
        active = active | nxt
    return active


def _compact_schedule(active):
    """Compact a (T, S) activity mask into (jf (T, S) int32, n_act (T,)):
    ascending active slice indices first, then the last active index
    repeated (so trailing grid steps keep identical block indices and
    Pallas elides their DMA)."""
    t, s = active.shape
    order = jnp.argsort(jnp.logical_not(active).astype(jnp.int32), axis=1,
                        stable=True)  # (T, S) active indices first, sorted
    n_act = active.sum(axis=1).astype(jnp.int32)  # (T,)
    last = jnp.take_along_axis(
        order, jnp.maximum(n_act - 1, 0)[:, None], axis=1)  # (T, 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (t, s), 1)
    jf = jnp.where(pos < n_act[:, None], order, last)
    return jf.astype(jnp.int32), n_act


def _storage_plan(grid_v, n_r, n_c, bf16, win_r):
    """Pick the streamed dtype + sublane granule for the volume's storage
    dtype, falling back to bfloat16 when integer tiling constraints do not
    hold (`array.h:68-106` native normalized-int residency)."""
    dt = grid_v.dtype
    win = win_r if win_r else n_r

    def ok(s):
        return n_r % s == 0 and (not win_r or win_r % s == 0)

    if dt == jnp.uint8 and ok(32):
        return jnp.uint8, 32
    if dt == jnp.uint16 and ok(16):
        return jnp.uint16, 16
    if dt == jnp.bfloat16 or (dt in (jnp.uint8, jnp.uint16) and ok(16)):
        return jnp.bfloat16, 16
    if bf16 and ok(16):
        return jnp.bfloat16, 16
    return jnp.float32, 8


from ovr_tpu.core.sampling import storage_scale  # noqa: E402


def slice_composite_pallas(grid_v, rgba_tab, scalars, pg, qg, k0,
                           n_slices: int, mode: int = 0, lgrid=None,
                           k0l=None, interpret=None, r_tile: int = 256,
                           win_r: int = 0, bf16: bool = False,
                           n_extra: int = 0, win_c: int = 0,
                           col_chunk: int = 0, majorant_v=None,
                           term: bool = True, fd: bool = True,
                           persistent: bool = False, win_lane: int = 0):
    """Run the fused slice loop. grid_v (A, Nr, Nc) traversal-ordered
    volume (float32, bfloat16, uint8 or uint16 — integer slabs stream
    natively and normalize in-kernel); rgba_tab (K, 4) merged nodal table;
    scalars (N_SCALARS,) f32 (S_* layout); pg (Wi,), qg (Hi,); k0
    (n_slices,) int32 slab indices (clip(floor(c), 0, A-2)); mode 0/1/2 =
    none/diffuse/shadow; lgrid (La, Lr, Lc) traversal-ordered shadow
    lattice + its k0l for mode 2. `r_tile` rows of the ray fan per grid
    tile; `win_r` (0 = all Nr) is the static source-row window each tile
    reads per slice. `majorant_v` (MA, MR, MC): traversal-ordered
    macrocell majorants enabling per-(tile, slice) empty-slice skipping;
    `term` enables early ray termination (alpha >= 0.9999 + box exit).
    Returns (8, Hi, Wi): premultiplied r, g, b, grad_cam xyz, depth, alpha.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_a, n_r, n_c = grid_v.shape
    hi_i = qg.shape[0]
    wi_i = pg.shape[0]
    n_orig = rgba_tab.shape[0]
    pad_t = (-n_orig) % CHUNK
    tab = rgba_tab.astype(jnp.float32)
    if pad_t:
        tab = jnp.concatenate([tab, jnp.tile(tab[-1:], (pad_t, 1))], 0)
    n_chunks = tab.shape[0] // CHUNK
    tab = tab.T.reshape(4, n_chunks, 1, CHUNK)

    if lgrid is None:
        lgrid = jnp.zeros((2, 8, 128), jnp.float32)
        k0l = jnp.zeros((n_slices,), jnp.int32)
    l_a, l_r, l_c = lgrid.shape

    # pad the fan: columns to LANES, rows to r_tile. Padding CONTINUES the
    # uniform fan lattice (p/q are regular grids) so the shaded modes' FD
    # gradients see real neighbor rays at the pad seam; pad outputs are
    # sliced off.
    dp = pg[1] - pg[0] if wi_i > 1 else jnp.ones((), pg.dtype)
    dq = qg[1] - qg[0] if hi_i > 1 else jnp.ones((), qg.dtype)
    pad_w = (-wi_i) % LANES
    pg_p = (jnp.concatenate(
        [pg, pg[-1] + dp * jnp.arange(1, pad_w + 1, dtype=pg.dtype)])
        if pad_w else pg)
    r_tile = min(r_tile, -(-hi_i // 8) * 8)
    pad_h = (-hi_i) % r_tile
    qg_p = (jnp.concatenate(
        [qg, qg[-1] + dq * jnp.arange(1, pad_h + 1, dtype=qg.dtype)])
        if pad_h else qg)
    wi_p = wi_i + pad_w
    hi_p = hi_i + pad_h
    n_tiles = hi_p // r_tile

    vdt, sub = _storage_plan(grid_v, n_r, n_c, bf16, win_r)
    gs = storage_scale(grid_v.dtype)
    win = min(win_r, n_r) if win_r else n_r
    sc_f = scalars.astype(jnp.float32)
    sc_f = sc_f.at[S_GS].set(jnp.float32(gs))
    sc_f = sc_f.at[S_DP].set(dp.astype(jnp.float32))
    sc_f = sc_f.at[S_DQ].set(dq.astype(jnp.float32))
    sc_f = sc_f.at[S_QLO].set(qg_p[0].astype(jnp.float32))
    w0s = _window_offsets(sc_f, pg_p, qg_p.astype(jnp.float32),
                          k0, n_slices, n_r, r_tile, win, sub,
                          halo=(mode >= 1 and fd))

    if majorant_v is not None:
        active = _active_slices(majorant_v, k0, w0s, n_r, win, sub, mode)
        jfc, n_act = _compact_schedule(active)
    else:
        jfc = jnp.broadcast_to(
            jnp.arange(n_slices, dtype=jnp.int32)[None, :],
            (n_tiles, n_slices))
        n_act = jnp.full((n_tiles,), n_slices, jnp.int32)

    grid_hbm = grid_v if grid_v.dtype == vdt else grid_v.astype(vdt)
    paired = win < n_r and not persistent
    if persistent:
        wb = jnp.zeros_like(w0s)
    elif paired:
        # block-pair streaming: slab rows arrive as two consecutive
        # win-row blocks (wb, wb+1); pad rows so block wb+1 always exists
        n_blocks = (n_r - win) // win + 2
        pad_rows = n_blocks * win - n_r
        if pad_rows:
            grid_hbm = jnp.concatenate(
                [grid_hbm,
                 jnp.repeat(grid_hbm[:, -1:, :], pad_rows, axis=1)], axis=1)
        wb = (w0s * sub) // win
    else:
        wb = jnp.zeros_like(w0s)

    if (win_c and win_c < n_c and col_chunk and wi_p % col_chunk == 0
            and not persistent):
        cc = col_chunk  # windowed contraction: chunk fixed by the window
    else:
        win_c = 0
        # column chunk: full fan width unless the per-chunk interpolation
        # weights (wc, + dwc when shaded) would blow VMEM (shaded kernels
        # keep a bigger live set, so their chunk budget is tighter — this
        # is what lets r_tile stay 64 at the 1024^3 scale)
        # shaded chunks stay tight: widening them (cc 256 via w_mult=1
        # for the FD path) compile-OOMs VMEM at the 1024-scale r_tile 64
        w_mult = 2 if mode >= 1 else 1
        cap = (3 << 20) if mode == 0 else (1 << 20)
        m = wi_p // LANES
        cc = wi_p
        for k in range(m, 0, -1):
            if m % k:
                continue
            cc = k * LANES
            if cc * n_c * 4 * w_mult <= cap:
                break
    if win_c:
        c0s = _col_offsets(sc_f, pg_p.astype(jnp.float32), n_slices, n_c,
                           cc, win_c)
    else:
        # unused without the windowed contraction — keep it tiny: SMEM
        # pads the minor dim to 128 lanes, so a (S, 16) placeholder would
        # cost 512 KB of scarce SMEM (the r_tile-32 shadow OOM)
        c0s = jnp.zeros((1, 1), jnp.int32)

    if persistent:
        # HBM DMA slices need 128-aligned minor dims: pad the volume's and
        # lattice's column dim (clipped positions never index the pad, so
        # pad columns carry zero interpolation weight)
        pad_c = (-n_c) % LANES
        n_cb = n_c + pad_c
        if pad_c:
            grid_hbm = jnp.concatenate(
                [grid_hbm, jnp.repeat(grid_hbm[:, :, -1:], pad_c, axis=2)],
                axis=2)
        lg_f = lgrid.astype(jnp.float32)
        pad_lc = (-l_c) % LANES
        l_cb = l_c + pad_lc
        if pad_lc:
            lg_f = jnp.concatenate(
                [lg_f, jnp.repeat(lg_f[:, :, -1:], pad_lc, axis=2)],
                axis=2)
        # lane-windowed column contraction: only for the shaded fan-FD
        # stencil (pass A dominates there; measured +7% diffuse, +52%
        # shadow at 1024^3). Mode 0 measured SLOWER with it — the t1
        # staging round-trip plus the narrower column chunks cost more
        # than the K cut saves when there is no pass A.
        cw_lane = win_lane if (0 < win_lane < n_cb and mode >= 1
                               and fd) else 0
        if cw_lane:
            cc = min(cc, LANES)  # per-128-lane-chunk windows
            c0l = _col_offsets(sc_f, pg_p.astype(jnp.float32), n_slices,
                               n_c, cc, cw_lane, granule=128, n_clip=n_cb)
        else:
            c0l = jnp.zeros((1, 1), jnp.int32)
        kernel = functools.partial(
            _kernel_persist, n_r=n_r, n_c=n_c, n_cb=n_cb, n_orig=n_orig,
            n_chunks=n_chunks, r_tile=r_tile, wi_p=wi_p, wi_i=wi_i,
            win=win, mode=mode, l_a=l_a, l_r=l_r, l_c=l_c, l_cb=l_cb,
            bf16=bf16, col_chunk=cc, n_extra=n_extra, sub=sub, term=term,
            fd=fd, cw_lane=cw_lane)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # volume (HBM)
                pl.BlockSpec(memory_space=pltpu.ANY),  # light lattice
                pl.BlockSpec((1, wi_p), lambda t, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r_tile, 1), lambda t, *_: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, n_chunks, 1, CHUNK),
                             lambda t, *_: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N_SCALARS), lambda t, *_: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((8, r_tile, wi_p), jnp.float32),  # acc
                pltpu.VMEM((r_tile, wi_p) if mode >= 1 else (8, 8),
                           jnp.float32),  # prev_s
                pltpu.VMEM((r_tile + 8, wi_p) if (mode >= 1 and fd)
                           else (8, 8), jnp.float32),  # smp_scr
                pltpu.VMEM((r_tile, wi_p) if (mode >= 1 and fd)
                           else (8, 8), jnp.float32),  # g1_scr
                pltpu.VMEM((r_tile + 8, n_cb) if cw_lane else (8, 8),
                           jnp.float32),  # t1_scr (lane-window staging)
                pltpu.VMEM((2, r_tile, wi_p) if mode != 2 else (1, 8, 128),
                           jnp.float32),  # geom (slab-test hoisting)
                pltpu.VMEM((2, 2, win, n_cb), vdt),  # vbuf
                pltpu.SemaphoreType.DMA((2, 2)),  # vsem
                pltpu.VMEM((2, 2, l_r, l_cb) if mode == 2
                           else (1, 1, 8, 128), jnp.float32),  # lbuf
                pltpu.SemaphoreType.DMA((2, 2)),  # lsem
                pltpu.SemaphoreType.DMA(()),  # osem
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, hi_p, wi_p), jnp.float32),
            interpret=interpret,
        )(k0.astype(jnp.int32), k0l.astype(jnp.int32), w0s, jfc, n_act,
          c0l, grid_hbm, lg_f,
          pg_p.astype(jnp.float32).reshape(1, wi_p),
          qg_p.astype(jnp.float32).reshape(r_tile * n_tiles, 1), tab,
          sc_f.reshape(1, N_SCALARS))
        return out[:, :hi_i, :wi_i]

    kernel = functools.partial(
        _kernel, n_r=n_r, n_c=n_c, n_orig=n_orig, n_chunks=n_chunks,
        r_tile=r_tile, wi_p=wi_p, wi_i=wi_i, win=win, mode=mode, l_r=l_r,
        l_c=l_c,
        bf16=bf16, paired=paired, col_chunk=cc, n_extra=n_extra,
        win_c=win_c, sub=sub, term=term, fd=fd)
    # index maps dereference the compacted schedule: block indices for
    # grid step (t, j) come from slice jf[t, j]; steps past n_act repeat
    # the last active slice, so their blocks are already resident and the
    # pipeline skips the copy.
    if paired:
        vol_specs = [
            pl.BlockSpec((1, win, n_c),
                         lambda t, j, k0_, kl_, w0_, wb_, c0_, jf_, na_: (
                             k0_[jf_[t, j]], wb_[t, jf_[t, j]], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win, n_c),
                         lambda t, j, k0_, kl_, w0_, wb_, c0_, jf_, na_: (
                             k0_[jf_[t, j]], wb_[t, jf_[t, j]] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win, n_c),
                         lambda t, j, k0_, kl_, w0_, wb_, c0_, jf_, na_: (
                             k0_[jf_[t, j]] + 1, wb_[t, jf_[t, j]], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win, n_c),
                         lambda t, j, k0_, kl_, w0_, wb_, c0_, jf_, na_: (
                             k0_[jf_[t, j]] + 1, wb_[t, jf_[t, j]] + 1, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        stub_r = min(max(8, sub), n_r)
        stub = pl.BlockSpec((1, stub_r, min(128, n_c)),
                            lambda t, j, k0_, kl_, w0_, wb_, c0_, jf_, na_:
                            (0, 0, 0),
                            memory_space=pltpu.VMEM)
        vol_specs = [
            pl.BlockSpec((1, n_r, n_c),
                         lambda t, j, k0_, kl_, w0_, wb_, c0_, jf_, na_: (
                             k0_[jf_[t, j]], 0, 0),
                         memory_space=pltpu.VMEM),
            stub,
            pl.BlockSpec((1, n_r, n_c),
                         lambda t, j, k0_, kl_, w0_, wb_, c0_, jf_, na_: (
                             k0_[jf_[t, j]] + 1, 0, 0),
                         memory_space=pltpu.VMEM),
            stub,
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(n_tiles, n_slices),
        in_specs=vol_specs + [
            pl.BlockSpec((1, l_r, l_c),
                         lambda t, j, k0_, kl_, w0_, wb_, c0_, jf_, na_: (
                             kl_[jf_[t, j]], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_r, l_c),
                         lambda t, j, k0_, kl_, w0_, wb_, c0_, jf_, na_: (
                             jnp.minimum(kl_[jf_[t, j]] + 1, l_a - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wi_p),
                         lambda t, j, k0_, kl_, w0_, wb_, c0_, jf_, na_: (
                             0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, 1),
                         lambda t, j, k0_, kl_, w0_, wb_, c0_, jf_, na_: (
                             t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_chunks, 1, CHUNK),
                         lambda t, j, k0_, kl_, w0_, wb_, c0_, jf_, na_: (
                             0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_SCALARS),
                         lambda t, j, k0_, kl_, w0_, wb_, c0_, jf_, na_: (
                             0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, r_tile, wi_p),
                               lambda t, j, k0_, kl_, w0_, wb_, c0_, jf_,
                               na_: (0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((r_tile, wi_p) if mode >= 1 else (8, 8),
                       jnp.float32),
            pltpu.VMEM((n_c, 2 * r_tile if (mode >= 1 and not fd)
                        else r_tile + 8) if win_c else (8, 8),
                       jnp.float32),
            pltpu.VMEM((r_tile + 8, wi_p) if (mode >= 1 and fd)
                       else (8, 8), jnp.float32),
            pltpu.VMEM((r_tile, wi_p) if (mode >= 1 and fd) else (8, 8),
                       jnp.float32),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, hi_p, wi_p), jnp.float32),
        interpret=interpret,
    )(k0.astype(jnp.int32), k0l.astype(jnp.int32), w0s, wb, c0s, jfc,
      n_act, grid_hbm, grid_hbm, grid_hbm, grid_hbm,
      lgrid.astype(jnp.float32), lgrid.astype(jnp.float32),
      pg_p.astype(jnp.float32).reshape(1, wi_p),
      qg_p.astype(jnp.float32).reshape(r_tile * n_tiles, 1), tab,
      sc_f.reshape(1, N_SCALARS))
    return out[:, :hi_i, :wi_i]
