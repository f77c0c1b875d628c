"""Pallas TPU kernels for the 2-D lifting step.

One grid program per (tile, channel) plane: the whole level's plane is
staged through VMEM once and both separable passes (H then V, with the
wrap-mode boundary taps) plus the quadrant split run on-chip without
intermediate HBM round-trips — the kernel-level formulation of
library/lifting.c:43-76's sLift2d. The arithmetic is the same
int16/int32 lifting code as the XLA path (ops/wavelets.py lift_core /
unlift1d_pair), so results are bit-identical; what changes is the
memory choreography.

Mosaic-lowerable formulation (round 1's kernels used lane-strided
even/odd slices, which Mosaic rejects): every even/odd split and
interleave runs along SUBLANES via the int16<->int32 bitcast (two
int16 sublanes pack into one int32, even row in the low half-word),
and the H pass becomes transpose -> V-lift -> transpose. No gathers,
no strided slices, no sublane stack/concat (which crash Mosaic).

Two wirings, selected by AKO_TPU_PALLAS_MODE:
- "fused" (default): transposes happen inside the kernel (single
  pallas_call per level).
- "split": the V-only kernel is called twice with XLA transposes
  between — the fallback if Mosaic rejects in-kernel int16 transposes.

Planes must have even dims (the fused odd-dimension fake row/col is
materialized by the caller) and fit VMEM (~16 MB — every Ako tile
level does). Enable via AKO_TPU_PALLAS=1 or the use_pallas argument of
forward_tile; the XLA path remains the default and the fallback.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ako_tpu.core.settings import Wavelet, Wrap
from ako_tpu.ops.wavelets import lift_core, unlift1d_pair


def pallas_enabled() -> bool:
    return os.environ.get("AKO_TPU_PALLAS", "0") not in ("", "0")


def _mode() -> str:
    return os.environ.get("AKO_TPU_PALLAS_MODE", "fused")


def _interpret() -> bool:
    # CPU backends run the kernels in interpreter mode (tests)
    return jax.default_backend() == "cpu"


def _vsplit(x):
    """Even/odd rows of int16 (h, w) as int32 streams (h/2, w), via the
    sublane bitcast: two int16 sublanes pack into one int32 with the
    even row in the low half-word (verified on-chip). Mosaic crashes on
    sublane stack/concat interleaves and rejects strided slices; the
    bitcast lowers cleanly in both Mosaic and interpreter modes."""
    v = pltpu.bitcast(x, jnp.int32)  # (h/2, w)
    return (v << 16) >> 16, v >> 16  # sign-extended even, odd


def _vmerge(ev, od):
    """Interleave int16 row streams back: inverse of _vsplit."""
    packed = (od.astype(jnp.int32) << 16) | (ev.astype(jnp.int32) & 0xFFFF)
    return pltpu.bitcast(packed, jnp.int16)


def _vlift(wavelet: Wavelet, wrap: Wrap, x):
    """Forward lift along rows (axis -2) of an even-height plane."""
    ev, od = _vsplit(x)
    return lift_core(wavelet, wrap, ev, od, axis=-2)


def _vunlift(wavelet: Wavelet, wrap: Wrap, lp, hp):
    """Inverse lift along rows; returns the merged plane."""
    ev, od = unlift1d_pair(wavelet, wrap, lp, hp, axis=-2)
    return _vmerge(ev, od)


def _t(x):
    return jnp.swapaxes(x, -1, -2)


@functools.lru_cache(maxsize=256)
def _lift2d_kernel(wavelet: Wavelet, wrap: Wrap, h: int, w: int):
    th, tw = h // 2, w // 2

    def kernel(x_ref, ll_ref, b_ref, c_ref, d_ref):
        # H pass as transpose -> V-lift -> transpose, then the V pass
        xt = _t(x_ref[0])  # (w, h)
        lp_t, hp_t = _vlift(wavelet, wrap, xt)  # (w/2, h)
        ll, c = _vlift(wavelet, wrap, _t(lp_t))  # (h/2, w/2)
        b, d = _vlift(wavelet, wrap, _t(hp_t))
        ll_ref[0] = ll
        b_ref[0] = b
        c_ref[0] = c
        d_ref[0] = d

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


@functools.lru_cache(maxsize=256)
def _vlift_kernel(wavelet: Wavelet, wrap: Wrap, h: int, w: int):
    """V-only forward lift kernel: (n, h, w) -> (lp, hp) (n, h/2, w).
    Used by the "split" wiring (XLA transposes around it)."""

    def kernel(x_ref, lp_ref, hp_ref):
        lp, hp = _vlift(wavelet, wrap, x_ref[0])
        lp_ref[0] = lp
        hp_ref[0] = hp

    def run(planes):
        n = planes.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(
                pl.BlockSpec((1, h // 2, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(2)
            ),
            out_shape=tuple(
                jax.ShapeDtypeStruct((n, h // 2, w), jnp.int16) for _ in range(2)
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
    if _mode() == "split":
        vk_h = _vlift_kernel(wavelet, wrap, w, h)  # on transposed planes
        lp_t, hp_t = vk_h(_t(flat))
        vk_v = _vlift_kernel(wavelet, wrap, h, w // 2)
        ll, c = vk_v(_t(lp_t))
        b, d = vk_v(_t(hp_t))
    else:
        ll, b, c, d = _lift2d_kernel(wavelet, wrap, h, w)(flat)
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
        left = _vunlift(wavelet, wrap, ll_ref[0], c_ref[0])  # (h, tw)
        right = _vunlift(wavelet, wrap, b_ref[0], d_ref[0])
        # H unlift of each row stream: transpose -> V-unlift -> transpose
        out_ref[0] = _t(_vunlift(wavelet, wrap, _t(left), _t(right)))

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


@functools.lru_cache(maxsize=256)
def _vunlift_kernel(wavelet: Wavelet, wrap: Wrap, th: int, w: int):
    """V-only inverse kernel: (n, th, w) lp/hp -> (n, 2*th, w)."""

    def kernel(lp_ref, hp_ref, out_ref):
        out_ref[0] = _vunlift(wavelet, wrap, lp_ref[0], hp_ref[0])

    def run(lp, hp):
        n = lp.shape[0]
        spec = pl.BlockSpec((1, th, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[spec, spec],
            out_specs=pl.BlockSpec(
                (1, 2 * th, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, 2 * th, w), jnp.int16),
            interpret=_interpret(),
        )(lp, hp)

    return run


def unlift2d_pallas(wavelet: Wavelet, wrap: Wrap, ll, b, c, d):
    """Inverse of lift2d_pallas (even output dims only)."""
    batch = ll.shape[:-2]
    th, tw = ll.shape[-2], ll.shape[-1]
    ll, b, c, d = (
        a.reshape((-1, th, tw)) for a in (ll, b, c, d)
    )
    if _mode() == "split":
        vk_v = _vunlift_kernel(wavelet, wrap, th, tw)
        left = vk_v(ll, c)  # (n, h, tw)
        right = vk_v(b, d)
        vk_h = _vunlift_kernel(wavelet, wrap, tw, th * 2)
        out = _t(vk_h(_t(left), _t(right)))
    else:
        out = _unlift2d_kernel(wavelet, wrap, th, tw)(ll, b, c, d)
    return out.reshape(batch + (th * 2, tw * 2))
