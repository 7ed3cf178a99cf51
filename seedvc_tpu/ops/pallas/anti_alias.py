"""Fused anti-aliased snake activation — Pallas TPU kernel.

TPU-native equivalent of the reference CUDA kernel
(``modules/bigvgan/alias_free_activation/cuda/anti_alias_activation_cuda.cu``):
one pass over HBM computing

    2x kaiser-sinc upsample (replicate-padded) -> snakebeta -> 2x kaiser-sinc
    low-pass downsample (replicate-padded)

The unfused composition (``seedvc_tpu/nn/snake.py``) reads/writes the 2x
intermediate from HBM; this kernel keeps it in VMEM.  The polyphase
decomposition is derived exactly from the composition (verified by
``tests/test_pallas_anti_alias.py``):

  up   (K=12, ratio 2, replicate pad 5, trim 15/15):
      u0[s] = u[2s]   = 2 * sum_j f[2j]   * x[clamp(s+j-3)]
      u1[s] = u[2s+1] = 2 * sum_j f[2j+1] * x[clamp(s+j-2)]
  down (K=12, stride 2, replicate pad (5, 6)):
      out[t] = sum_j g[2j+1]*s0c[t+j-2] + sum_j g[2j]*s1c[t+j-3]
  where s0/s1 = snake(u0/u1) and the c-subscript clamps are in *u index
  space*: u_c[m<0] = u[0] (phase 0) and u_c[m>2T-1] = u[2T-1] (phase 1) —
  i.e. the left halo of BOTH phases replicates s0[0] and the right halo of
  both phases replicates s1[T-1].

x-level clamping is realised by an 8-sample edge pad applied by the caller;
u-level clamping is patched in-kernel on the global first/last tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seedvc_tpu.dsp.filters import kaiser_sinc_filter1d

_K = 12
_HALO = 8  # covers max x offset: |j - 3| + tile spill

# sin^2 via range-reduced cosine polynomial: Mosaic's full-precision sin
# lowers to ~100+ VPU ops; sin^2(y) = 0.5 - 0.5 cos(2y) with period-pi
# reduction and a degree-7-in-theta^2 least-squares fit is ~20 ops at
# max abs error 1.9e-10 (validated over y in [-300, 300]).
_COS_C = (1.0000000001396678, -0.49999999903985304, 0.04166666418826992,
          -0.0013888867475997221, 2.4800691078186138e-05,
          -2.7536987215763688e-07, 2.0620714282439055e-09,
          -9.7749677186398614e-12)
_INV_PI = float(1.0 / np.pi)
_PI = float(np.pi)


def _sin2(y: jax.Array) -> jax.Array:
    """sin(y)^2 with |err| <= 2e-10; y f32, any magnitude << 2^23."""
    n = jnp.floor(y * _INV_PI + 0.5)
    z = y - n * _PI                      # (-pi/2, pi/2]; theta = 2z
    t = 4.0 * z * z                      # theta^2 in [0, pi^2]
    ct = jnp.float32(_COS_C[7])
    for k in range(6, -1, -1):
        ct = ct * t + jnp.float32(_COS_C[k])
    return 0.5 - 0.5 * ct


def _make_kernel_clean(TT: int, CT: int, T: int):
    f = kaiser_sinc_filter1d(0.25, 0.3, _K)
    g = kaiser_sinc_filter1d(0.25, 0.3, _K)
    SU = TT + 6
    last_tile = (T - 1) // TT
    r_last = (T - 1) - last_tile * TT + 3

    # local x-row of global sample 0 is _HALO; of sample T-1 is below:
    r_x_last = (T - 1) - last_tile * TT + _HALO

    def kernel(prev_ref, cur_ref, next_ref, alpha_ref, invb_ref, out_ref):
        ti = pl.program_id(1)

        alpha = alpha_ref[0, :]
        inv_beta = invb_ref[0, :]

        # Halo assembly from the auto-pipelined prev/cur/next blocks (the
        # previous manual-DMA version stalled every tile on its own fetch —
        # Pallas double-buffers BlockSpec inputs for free).
        x = jnp.concatenate(
            [prev_ref[0, TT - _HALO:, :], cur_ref[0], next_ref[0, :_HALO, :]],
            axis=0)
        # x-level replicate clamping, in-kernel: on the global first/last
        # tiles the halo blocks hold out-of-range data (clamped index maps),
        # so overwrite rows before sample 0 / after sample T-1 with the edge
        # samples (the reference's replication padding).
        xrow = jax.lax.broadcasted_iota(jnp.int32, (TT + 2 * _HALO, 1), 0)
        x = jnp.where(jnp.logical_and(ti == 0, xrow < _HALO),
                      x[_HALO: _HALO + 1, :], x)
        x = jnp.where(jnp.logical_and(ti == last_tile, xrow > r_x_last),
                      x[r_x_last: r_x_last + 1, :], x)

        # Shared shifted views: u0 reads x offsets 2..7, u1 reads 3..8 —
        # materialise the union (7 sublane shifts instead of 12).
        v = [x[o: o + SU, :] for o in range(2, 9)]
        u0 = jnp.zeros((SU, CT), jnp.float32)
        u1 = jnp.zeros((SU, CT), jnp.float32)
        for j in range(6):
            u0 += (2.0 * float(f[2 * j])) * v[j]
            u1 += (2.0 * float(f[2 * j + 1])) * v[j + 1]

        s0 = u0 + inv_beta * _sin2(u0 * alpha)
        s1 = u1 + inv_beta * _sin2(u1 * alpha)

        row = jax.lax.broadcasted_iota(jnp.int32, (SU, 1), 0)
        first = (ti == 0)
        last = (ti == last_tile)
        edge_left = s0[3:4, :]
        left_mask = jnp.logical_and(first, row < 3)
        s0 = jnp.where(left_mask, edge_left, s0)
        s1 = jnp.where(left_mask, edge_left, s1)
        edge_right = s1[r_last: r_last + 1, :]
        right_mask = jnp.logical_and(last, row > r_last)
        s0 = jnp.where(right_mask, edge_right, s0)
        s1 = jnp.where(right_mask, edge_right, s1)

        out = jnp.zeros((TT, CT), jnp.float32)
        for j in range(6):
            out += float(g[2 * j + 1]) * s0[j + 1: j + 1 + TT, :]
            out += float(g[2 * j]) * s1[j: j + TT, :]
        out_ref[0] = out.astype(out_ref.dtype)

    return kernel


def _make_kernel_grouped(TT: int, Cg: int, G: int, T: int):
    """Grouped kernel: G independent time-tiles side by side in the lane
    dim (lane group p = global tile G*ti + p), so every VPU pass — above
    all the two sin() evaluations per sample — runs on fully dense
    (TT+16, G*Cg=128) registers instead of C-padded-to-128 ones.  For the
    C=24 BigVGAN stage that is a 4x cut in VPU work (profiling: that one
    stage's activations cost 26.9 ms of a 142 ms vocoder forward).

    Semantics identical to ``_make_kernel_clean``: all edge patches are
    static (the global first/last tile index, its lane group, and the
    clamp rows are compile-time constants), masked per lane group.
    """
    f = kaiser_sinc_filter1d(0.25, 0.3, _K)
    g = kaiser_sinc_filter1d(0.25, 0.3, _K)
    SU = TT + 6
    R = TT + 2 * _HALO
    last_tile = (T - 1) // TT
    last_macro = last_tile // G
    last_group = last_tile % G
    r_last = (T - 1) - last_tile * TT + 3
    r_x_last = (T - 1) - last_tile * TT + _HALO
    M = G * TT

    def kernel(xh_ref, alpha_ref, invb_ref, out_ref):
        ti = pl.program_id(1)

        alpha = alpha_ref[0, :]      # (G*Cg,) tiled per group
        inv_beta = invb_ref[0, :]

        # Input arrives pre-packed by the XLA wrapper:
        # x[r, p*Cg + c] = x_global[(G*ti+p)*TT + r - 8, c].
        x = xh_ref[0, 0]             # (R, G*Cg)

        row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        grp = jax.lax.broadcasted_iota(jnp.int32, (1, G * Cg), 1) // Cg
        # x-level replicate clamping (static masks; see _make_kernel_clean)
        x = jnp.where((ti == 0) & (row < _HALO) & (grp == 0),
                      x[_HALO: _HALO + 1, :], x)
        x = jnp.where((ti == last_macro) & (row > r_x_last)
                      & (grp == last_group),
                      x[r_x_last: r_x_last + 1, :], x)

        v = [x[o: o + SU, :] for o in range(2, 9)]
        u0 = jnp.zeros((SU, G * Cg), jnp.float32)
        u1 = jnp.zeros((SU, G * Cg), jnp.float32)
        for j in range(6):
            u0 += (2.0 * float(f[2 * j])) * v[j]
            u1 += (2.0 * float(f[2 * j + 1])) * v[j + 1]

        s0 = u0 + inv_beta * _sin2(u0 * alpha)
        s1 = u1 + inv_beta * _sin2(u1 * alpha)

        urow = jax.lax.broadcasted_iota(jnp.int32, (SU, 1), 0)
        left = (ti == 0) & (urow < 3) & (grp == 0)
        edge_left = s0[3:4, :]
        s0 = jnp.where(left, edge_left, s0)
        s1 = jnp.where(left, edge_left, s1)
        right = ((ti == last_macro) & (urow > r_last) & (grp == last_group))
        edge_right = s1[r_last: r_last + 1, :]
        s0 = jnp.where(right, edge_right, s0)
        s1 = jnp.where(right, edge_right, s1)

        out = jnp.zeros((TT, G * Cg), jnp.float32)
        for j in range(6):
            out += float(g[2 * j + 1]) * s0[j + 1: j + 1 + TT, :]
            out += float(g[2 * j]) * s1[j: j + TT, :]
        # stays lane-packed; the XLA wrapper unpacks (Mosaic cannot lower a
        # lane-group -> sublane regrouping efficiently)
        out_ref[0, 0] = out.astype(out_ref.dtype)

    return kernel


def _anti_alias_grouped(x: jax.Array, alpha: jax.Array, inv_beta: jax.Array,
                        tile_t: int) -> jax.Array:
    """Grouped-lane path for C <= 64; x (B, T, C) f32.

    The lane packing/unpacking (G time-tiles side by side in the 128-lane
    dim) happens HERE in XLA — two cheap transposes — so the kernel body is
    pure dense VPU work on (TT+16, 128) registers.
    """
    B, T, C = x.shape
    Cg = 32 if C <= 32 else 64
    G = 128 // Cg
    TT = min(tile_t, max(8, T))
    R = TT + 2 * _HALO
    n_t = -(-T // TT)
    n_m = -(-n_t // G)
    n_t = n_m * G
    Tp = n_t * TT
    xp = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)), mode="edge")
    if Cg != C:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, Cg - C)))
        alpha = jnp.pad(alpha, (0, Cg - C), constant_values=1.0)
        inv_beta = jnp.pad(inv_beta, (0, Cg - C), constant_values=1.0)
    alpha_t = jnp.tile(alpha, G).reshape(1, G * Cg).astype(jnp.float32)
    invb_t = jnp.tile(inv_beta, G).reshape(1, G * Cg).astype(jnp.float32)

    # Per-tile halo windows (halo values at the global edges are garbage
    # from the wrap-around roll; the kernel's static edge patches overwrite
    # every row they influence).
    xm = xp.reshape(B, n_t, TT, Cg)
    prev_tail = jnp.roll(xm, 1, axis=1)[:, :, TT - _HALO:, :]
    next_head = jnp.roll(xm, -1, axis=1)[:, :, :_HALO, :]
    xh = jnp.concatenate([prev_tail, xm, next_head], axis=2)  # (B,n_t,R,Cg)
    # pack G tiles into lanes: (B, n_m, R, G*Cg)
    xh = xh.reshape(B, n_m, G, R, Cg).transpose(0, 1, 3, 2, 4) \
           .reshape(B, n_m, R, G * Cg)

    kernel = _make_kernel_grouped(TT, Cg, G, T)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_m),
        in_specs=[
            pl.BlockSpec((1, 1, R, G * Cg), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * Cg), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * Cg), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TT, G * Cg), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_m, TT, G * Cg), jnp.float32),
        interpret=(jax.default_backend() == "cpu"),
    )(xh, alpha_t, invb_t)
    # unpack lane groups back to time order
    out = out.reshape(B, n_m, TT, G, Cg).transpose(0, 1, 3, 2, 4) \
             .reshape(B, Tp, Cg)
    return out[:, :T, :C]


@functools.partial(jax.jit, static_argnames=("logscale", "tile_t"))
def anti_alias_snake(x: jax.Array, alpha: jax.Array, beta: jax.Array,
                     logscale: bool = True, tile_t: int = 256) -> jax.Array:
    # tile_t=256 measured best on v5e across the BigVGAN stage shapes
    # (46.6 ms act chain vs 50.1 at 512, 55.0 at 1024, 50.5 at 128).
    """Fused up2x -> snakebeta -> down2x.  x: (B, T, C) -> (B, T, C)."""
    B, T, C = x.shape
    in_dtype = x.dtype
    if logscale:
        alpha = jnp.exp(alpha)
        inv_beta = 1.0 / (jnp.exp(beta) + 1e-9)
    else:
        inv_beta = 1.0 / (beta + 1e-9)

    if C <= 64:
        # Lane-grouped path: 128//Cg independent time-tiles packed into the
        # lane dim so VPU passes (especially sin) run fully dense.
        return _anti_alias_grouped(x.astype(jnp.float32), alpha, inv_beta,
                                   tile_t).astype(in_dtype)

    TT = min(tile_t, max(8, T))
    # Lane (channel) dim must be 128-aligned for HBM slicing: pad C up.
    Cp = -(-C // 128) * 128
    CT = 128
    n_t = -(-T // TT)
    n_c = Cp // CT

    # Pad time to a tile multiple (values in the pad region never influence
    # retained outputs: the kernel replicate-clamps past sample T-1).
    Tp = n_t * TT
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (0, Tp - T), (0, 0)), mode="edge")
    if Cp != C:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, Cp - C)))
        alpha = jnp.pad(alpha, (0, Cp - C), constant_values=1.0)
        inv_beta = jnp.pad(inv_beta, (0, Cp - C), constant_values=1.0)

    kernel = _make_kernel_clean(TT, CT, T)
    last_t = n_t - 1
    out = pl.pallas_call(
        kernel,
        grid=(B, n_t, n_c),
        in_specs=[
            # prev / cur / next time-tiles: the halo is assembled in-kernel
            # from the neighbouring auto-pipelined (double-buffered) blocks.
            pl.BlockSpec((1, TT, CT),
                         lambda b, t, c: (b, jnp.maximum(t - 1, 0), c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TT, CT), lambda b, t, c: (b, t, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TT, CT),
                         lambda b, t, c: (b, jnp.minimum(t + 1, last_t), c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CT), lambda b, t, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CT), lambda b, t, c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TT, CT), lambda b, t, c: (b, t, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, Cp), jnp.float32),
        interpret=(jax.default_backend() == "cpu"),
    )(xp, xp, xp, alpha.reshape(1, Cp).astype(jnp.float32),
      inv_beta.reshape(1, Cp).astype(jnp.float32))
    return out[:, :T, :C].astype(in_dtype)
