"""Pallas TPU kernels for the 2-D lifting step.

One grid program per (tile, channel) plane: the whole level's plane is
staged through VMEM once and both separable passes (H then V, with the
wrap-mode boundary taps) plus the quadrant split run on-chip without
intermediate HBM round-trips — the kernel-level formulation of
library/lifting.c:43-76's sLift2d. The arithmetic inside the kernel is
the same vectorized int16/int32 lifting code as the XLA path
(ops/wavelets.py), so results are bit-identical; what changes is the
memory choreography.

Planes must have even dims (the fused odd-dimension fake row/col is
materialized by the caller) and fit VMEM (~16 MB — every Ako tile
level does). Enable via AKO_TPU_PALLAS=1 or the use_pallas argument of
forward_tile; the XLA path remains the default and the fallback.

Status: bit-exact and tested in interpreter mode; on-chip Mosaic
lowering currently rejects the lane-strided even/odd split (gather
and strided-slice lowering limits). The hardware-native formulation —
validated piecewise, to be wired in next: even/odd split along
SUBLANES is free via `pltpu.bitcast(int16 plane, int32)` (rows pack in
pairs; ev = (v << 16) >> 16, od = v >> 16, re-interleave by packing),
and the H pass becomes transpose -> V-split-lift -> transpose. That
removes every gather from the kernel. The XLA path is already
compute-light (~30 ms for a 5 MP image), so this is an optimization,
not a correctness gap.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ako_tpu.core.settings import Wavelet, Wrap
from ako_tpu.ops.wavelets import lift1d, unlift1d_pair, _interleave


def pallas_enabled() -> bool:
    return os.environ.get("AKO_TPU_PALLAS", "0") not in ("", "0")


def _interpret() -> bool:
    # CPU backends run the kernels in interpreter mode (tests)
    return jax.default_backend() == "cpu"


@functools.lru_cache(maxsize=256)
def _lift2d_kernel(wavelet: Wavelet, wrap: Wrap, h: int, w: int):
    th, tw = h // 2, w // 2

    def kernel(x_ref, ll_ref, b_ref, c_ref, d_ref):
        x = x_ref[0]
        lp_h, hp_h = lift1d(wavelet, wrap, x, 0, axis=-1)
        ll, cq = lift1d(wavelet, wrap, lp_h, 0, axis=-2)
        bq, dq = lift1d(wavelet, wrap, hp_h, 0, axis=-2)
        ll_ref[0] = ll
        b_ref[0] = bq
        c_ref[0] = cq
        d_ref[0] = dq

    quad = jax.ShapeDtypeStruct((1, th, tw), jnp.int16)

    def run(planes):
        n = planes.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                pl.BlockSpec((1, th, tw), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(4)
            ),
            out_shape=tuple(
                jax.ShapeDtypeStruct((n, th, tw), jnp.int16) for _ in range(4)
            ),
            interpret=_interpret(),
        )(planes)

    return run


def lift2d_pallas(wavelet: Wavelet, wrap: Wrap, x):
    """x: (..., h, w) int16 with even h, w -> (ll, b, c, d) quadrants
    (..., h/2, w/2); bit-identical to ops.wavelets.lift2d on even
    dims."""
    batch = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    assert h % 2 == 0 and w % 2 == 0, "pallas lift requires even dims"
    flat = x.reshape((-1, h, w))
    run = _lift2d_kernel(wavelet, wrap, h, w)
    ll, b, c, d = run(flat)
    out_shape = batch + (h // 2, w // 2)
    return (
        ll.reshape(out_shape),
        b.reshape(out_shape),
        c.reshape(out_shape),
        d.reshape(out_shape),
    )


@functools.lru_cache(maxsize=256)
def _unlift2d_kernel(wavelet: Wavelet, wrap: Wrap, th: int, tw: int):
    h, w = th * 2, tw * 2

    def kernel(ll_ref, b_ref, c_ref, d_ref, out_ref):
        ll, b, c, d = ll_ref[0], b_ref[0], c_ref[0], d_ref[0]
        ev_l, od_l = unlift1d_pair(wavelet, wrap, ll, c, axis=-2)
        ev_r, od_r = unlift1d_pair(wavelet, wrap, b, d, axis=-2)

        def merge(lp, hp):
            ev, od = unlift1d_pair(wavelet, wrap, lp, hp, axis=-1)
            return _interleave(ev, od, axis=-1)

        out_ref[0] = _interleave(merge(ev_l, ev_r), merge(od_l, od_r), axis=-2)

    def run(ll, b, c, d):
        n = ll.shape[0]
        spec = pl.BlockSpec((1, th, tw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[spec, spec, spec, spec],
            out_specs=pl.BlockSpec(
                (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.int16),
            interpret=_interpret(),
        )(ll, b, c, d)

    return run


def unlift2d_pallas(wavelet: Wavelet, wrap: Wrap, ll, b, c, d):
    """Inverse of lift2d_pallas (even output dims only)."""
    batch = ll.shape[:-2]
    th, tw = ll.shape[-2], ll.shape[-1]
    run = _unlift2d_kernel(wavelet, wrap, th, tw)
    out = run(
        ll.reshape((-1, th, tw)),
        b.reshape((-1, th, tw)),
        c.reshape((-1, th, tw)),
        d.reshape((-1, th, tw)),
    )
    return out.reshape(batch + (th * 2, tw * 2))
