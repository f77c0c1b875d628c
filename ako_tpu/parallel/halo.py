"""Sharded-single-tile lifting: halo exchange over the mesh.

One tile's planes are sharded by *rows* over a 1-D mesh axis; each
dyadic lift level runs as a shard_map program in which the H pass is
purely local and the V pass's boundary taps arrive from the
neighboring shard via a cyclic `lax.ppermute` (1 row each way for
CDF 5/3, 2 rows for DD 13/7 — see ops/wavelets.py). Results are
bit-exact with the single-chip path: the halo rows are precisely the
values the wrap-mode substitutions would have read, and a cyclic
permute delivers the REPEAT wrap value for free on the edge shards.

Levels stay sharded while every shard still holds an even number of
rows with enough stencil depth; the small residual levels (a few KB)
run replicated — the classic coarse-level gather of parallel wavelet
transforms. This is the TPU equivalent the reference has no
counterpart for (SURVEY.md §2.4.2; reference tiles are independent,
library/encode.c:115)."""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ako_tpu.core.geometry import LiftLevel, LiftSchedule
from ako_tpu.core.settings import Wavelet, Wrap
from ako_tpu.ops.lifting import _quantize_gate
from ako_tpu.ops.wavelets import (
    _interleave,
    effective_wavelet,
    lift1d,
    lift2d,
    unlift1d_pair,
    unlift2d,
)

# Minimum rows a shard must keep for the DD137 V-stencil's MIRROR /
# second-tap substitutions to stay shard-local on the edge shards.
_MIN_LOCAL_EVENS = 4


def _can_shard(lvl: LiftLevel, n_shards: int) -> bool:
    if lvl.fake_last_row or lvl.fake_last_col:
        return False
    local_evens = lvl.current_h // (2 * n_shards)
    return (
        lvl.current_h % (2 * n_shards) == 0 and local_evens >= _MIN_LOCAL_EVENS
    )


def _lift2d_local(weff: Wavelet, wrap: Wrap, axis_name: str, x):
    """shard_map body: one 2-D lift on a row-shard of the plane(s)."""
    lp_h, hp_h = lift1d(weff, wrap, x, 0, axis=-1)
    ll, c = lift1d(weff, wrap, lp_h, 0, axis=-2, axis_name=axis_name)
    b, d = lift1d(weff, wrap, hp_h, 0, axis=-2, axis_name=axis_name)
    return ll, b, c, d


def _unlift2d_local(weff: Wavelet, wrap: Wrap, axis_name: str, ll, b, c, d):
    """shard_map body: inverse 2-D lift on row-shards of the quadrants."""
    ev_l, od_l = unlift1d_pair(weff, wrap, ll, c, axis=-2, axis_name=axis_name)
    ev_r, od_r = unlift1d_pair(weff, wrap, b, d, axis=-2, axis_name=axis_name)

    def merge(lp, hp):
        ev, od = unlift1d_pair(weff, wrap, lp, hp, axis=-1)
        return _interleave(ev, od, axis=-1)

    return _interleave(merge(ev_l, ev_r), merge(od_l, od_r), axis=-2)


def forward_tile_sharded(
    planes,
    schedule: LiftSchedule,
    wavelet: Wavelet,
    wrap: Wrap,
    qg: Sequence[Tuple[Tuple[int, ...], Tuple[int, ...]]],
    mesh: Mesh,
    axis_name: str = "rows",
):
    """Row-sharded forward_tile: planes (channels, tile_h, tile_w)
    int16 -> serialized stream (coeff_count,) int16, identical to
    ops.lifting.forward_tile's output."""
    n = mesh.shape[axis_name]
    channels = planes.shape[-3]
    row_spec = P(None, axis_name, None)
    replicated = NamedSharding(mesh, P())

    level_chunks: List[jnp.ndarray] = []
    cur = jax.lax.with_sharding_constraint(planes, NamedSharding(mesh, row_spec))
    sharded = True

    for lvl, (qs, gs) in zip(schedule.levels, qg):
        weff = effective_wavelet(wavelet, lvl.target_w, lvl.target_h)
        if sharded and _can_shard(lvl, n):
            f = shard_map(
                functools.partial(_lift2d_local, weff, wrap, axis_name),
                mesh=mesh,
                in_specs=(row_spec,),
                out_specs=(row_spec,) * 4,
            )
            ll, b, c, d = f(cur)
        else:
            if sharded:
                cur = jax.lax.with_sharding_constraint(cur, replicated)
                sharded = False
            ll, b, c, d = lift2d(weff, wrap, cur, lvl)

        q = jnp.asarray(qs, dtype=jnp.int32).reshape(channels, 1, 1)
        g = jnp.asarray(gs, dtype=jnp.int32).reshape(channels, 1, 1)
        cq = _quantize_gate(c, q, g).reshape(channels, -1)
        bq = _quantize_gate(b, q, g).reshape(channels, -1)
        dq = _quantize_gate(d, q, g).reshape(channels, -1)
        head = jnp.asarray(qs, dtype=jnp.int16).reshape(channels, 1)
        chunk = jnp.concatenate([head, cq, bq, dq], axis=-1)
        level_chunks.append(chunk.reshape(-1))
        cur = ll

    lp_flat = cur.reshape(-1)
    out = jnp.concatenate([lp_flat] + level_chunks[::-1], axis=-1)
    return jax.lax.with_sharding_constraint(out, replicated)


def inverse_tile_sharded(
    coeffs,
    schedule: LiftSchedule,
    wavelet: Wavelet,
    wrap: Wrap,
    channels: int,
    mesh: Mesh,
    axis_name: str = "rows",
):
    """Row-sharded inverse_tile: serialized stream -> planes
    (channels, tile_h, tile_w) int16, identical to
    ops.lifting.inverse_tile's output."""
    from ako_tpu.ops.intmath import i16, i32

    n = mesh.shape[axis_name]
    row_spec = P(None, axis_name, None)

    lp_n = channels * schedule.lp_h * schedule.lp_w
    cur = coeffs[:lp_n].reshape(channels, schedule.lp_h, schedule.lp_w)
    off = lp_n
    sharded = False

    for lvl in reversed(schedule.levels):
        hw, hh = lvl.target_w, lvl.target_h
        nvals = channels * (1 + 3 * hh * hw)
        chunk = coeffs[off : off + nvals].reshape(channels, 1 + 3 * hh * hw)
        off += nvals

        q = i32(chunk[..., 0]).reshape(channels, 1, 1, 1)
        quads = chunk[..., 1:].reshape(channels, 3, hh, hw)
        dequant = jnp.where(q > 1, i16(i32(quads) * q), quads)
        c = dequant[..., 0, :, :]
        b = dequant[..., 1, :, :]
        d = dequant[..., 2, :, :]

        weff = effective_wavelet(wavelet, hw, hh)
        if _can_shard(lvl, n):
            if not sharded:
                sharded = True
            spec = NamedSharding(mesh, row_spec)
            cur = jax.lax.with_sharding_constraint(cur, spec)
            b = jax.lax.with_sharding_constraint(b, spec)
            c = jax.lax.with_sharding_constraint(c, spec)
            d = jax.lax.with_sharding_constraint(d, spec)
            f = shard_map(
                functools.partial(_unlift2d_local, weff, wrap, axis_name),
                mesh=mesh,
                in_specs=(row_spec,) * 4,
                out_specs=row_spec,
            )
            cur = f(cur, b, c, d)
        else:
            cur = unlift2d(weff, wrap, cur, b, c, d, lvl)

    return jax.lax.with_sharding_constraint(cur, NamedSharding(mesh, P()))
