"""Sharded-single-tile lifting: halo exchange over the mesh.

One tile's planes are sharded by *rows* over a 1-D mesh axis; each
dyadic lift level runs as shard_map programs in which the H pass is
purely local and the V pass's boundary taps arrive from the
neighboring shard via a cyclic `lax.ppermute` (1 row each way for
CDF 5/3, 2 rows for DD 13/7 — see ops/wavelets.py). Results are
bit-exact with the single-chip path: the halo rows are precisely the
values the wrap-mode substitutions would have read, and a cyclic
permute delivers the REPEAT wrap value for free on the edge shards.

Levels whose row count is not divisible by the shard count (odd
plus-one-rule dims, ragged pyramids) are handled by PAD + CRAFT: the
V-pass input is padded to equal per-shard blocks and the pad rows are
*constructed* so that the generic sharded stencil reads exactly the
values the wrap-mode substitutions would have produced at the TRUE
boundary — including the nonlinear (truncating-division) hp chain,
whose first pad value is synthesized from the last valid rows so the
int16 modular arithmetic cancels (`_pad_*` below). This covers CLAMP
and ZERO wraps (and Haar under every wrap: its lifting reads no
neighbors); MIRROR/REPEAT levels with a remainder fall back to
replicated compute — their edge substitutions read *position-varying*
values that a value-only pad cannot express. A fake plus-one-rule row
is materialized before padding, so odd-height levels shard too.

The residual small levels (a few KB) run replicated — the classic
coarse-level gather of parallel wavelet transforms. `plan_levels`
reports statically how many levels shard for a given schedule/mesh;
tests assert the count so a planner regression can never silently
replicate everything (tests/test_parallel.py). This is the TPU
equivalent the reference has no counterpart for (SURVEY.md §2.4.2;
reference tiles are independent, library/encode.c:115)."""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ako_tpu.core.geometry import LiftLevel, LiftSchedule
from ako_tpu.core.settings import Wavelet, Wrap
from ako_tpu.ops.intmath import div4, div16, div32, i16, i32
from ako_tpu.ops.lifting import _quantize_gate
from ako_tpu.ops.wavelets import (
    _interleave,
    _sl,
    effective_wavelet,
    lift1d,
    unlift1d_pair,
)

# Minimum evens a shard must keep for the DD137 V-stencil's MIRROR /
# second-tap substitutions and ppermute halo slices to stay local.
_MIN_LOCAL_EVENS = 4


class _Plan(NamedTuple):
    m: int  # evens per shard (local rows = 2m)
    pad_pairs: int  # (even, odd) pad pairs appended after the valid 2T rows


def _shard_plan(
    lvl: LiftLevel, n: int, wrap: Wrap, weff: Wavelet
) -> Optional[_Plan]:
    T = lvl.target_h
    m = -(-T // n)
    if m < _MIN_LOCAL_EVENS:
        return None
    pad_pairs = m * n - T
    if (
        pad_pairs > 0
        and weff != Wavelet.HAAR
        and wrap not in (Wrap.CLAMP, Wrap.ZERO)
    ):
        return None  # position-varying MIRROR/REPEAT edge substitutions
    return _Plan(m, pad_pairs)


def plan_levels(
    schedule: LiftSchedule, n_shards: int, wavelet: Wavelet, wrap: Wrap
) -> List[bool]:
    """Static per-level shard decision for a schedule on an
    `n_shards`-way row mesh — True where the level's V pass runs
    sharded. Mirrors forward_tile_sharded's planning exactly (the
    forward stays sharded monotonically; once a level replicates, the
    smaller remainder stays replicated)."""
    out = []
    sharded = True
    for lvl in schedule.levels:
        weff = effective_wavelet(wavelet, lvl.target_w, lvl.target_h)
        sharded = sharded and _shard_plan(lvl, n_shards, wrap, weff) is not None
        out.append(sharded)
    return out


def _rows(x, lo, hi):
    return _sl(x, lo, hi, -2)


def _pad_fwd(arr, T: int, pad_pairs: int, wrap: Wrap, weff: Wavelet):
    """Append 2*pad_pairs crafted rows to the (..., 2T, w) V-input so
    the generic sharded stencil reproduces the true-edge wrap
    substitutions bit-exactly (module docstring). Derivations:

    CLAMP  — even taps past the edge read e_{T-1}: pad evens with it.
      DD137's lp additionally reads hp_{T+j}; the stencil computes
      hp_pad_j = o_pad_j + div16(-16·e_{T-1}) = o_pad_j − e_{T-1}
      (exact: a multiple of 16), so o_pad = hp_{T-1} + e_{T-1} makes
      every pad hp equal hp_{T-1}, the CLAMP substitution value; the
      int16 store of the sum wraps, and the later subtraction of
      e_{T-1} wraps it back.
    ZERO   — even taps read 0: zero pad evens. DD137 pad 0's hp sees
      ev_l1 = e_{T-1}, rest 0, so o_pad0 = −div16(e_{T-1}) cancels it;
      later pads see only zeros.
    HAAR   — no neighbor taps at all; pad values are never read by
      valid outputs."""
    if pad_pairs == 0:
        return arr
    last_e = _rows(arr, 2 * T - 2, 2 * T - 1)
    zero = jnp.zeros_like(last_e)
    if weff == Wavelet.HAAR:
        rows = [zero] * (2 * pad_pairs)
    elif wrap == Wrap.CLAMP:
        if weff == Wavelet.DD137:
            o_last = i32(_rows(arr, 2 * T - 1, 2 * T))
            e_last = i32(last_e)
            e_prev = i32(_rows(arr, 2 * T - 4, 2 * T - 3))
            hp_last = i16(o_last + div16(e_prev - 17 * e_last))
            po = i16(i32(hp_last) + e_last)
        else:  # CDF53: lp never reads forward hp taps
            po = last_e
        rows = [last_e, po] * pad_pairs
    else:  # ZERO
        if weff == Wavelet.DD137:
            po0 = i16(-div16(i32(last_e)))
        else:
            po0 = zero
        rows = [zero, po0] + [zero, zero] * (pad_pairs - 1)
    return jnp.concatenate([arr] + rows, axis=-2)


def _pad_inv(ll, c, T: int, pad_pairs: int, wrap: Wrap, weff: Wavelet):
    """Pad one (lp-quadrant, hp-quadrant) pair of the inverse V pass
    from T to T+pad_pairs rows. hp pads are read directly (CLAMP →
    copies of hp_{T-1}, ZERO/HAAR → zeros); lp pads are crafted so the
    *computed* pad evens equal the even-tap substitution values
    (ev_{T-1} for CLAMP, 0 for ZERO), with the same truncating-division
    cancellation as the forward (derivations in the forward's twin;
    the DD137/ZERO case needs a distinct second pad: pad 1's hp_l2 tap
    still reaches the last valid hp row)."""
    if pad_pairs == 0:
        return ll, c
    hp1 = _rows(c, T - 1, T)  # hp_{T-1}
    zero = jnp.zeros_like(hp1)
    if weff == Wavelet.HAAR:
        lp_pads = [zero] * pad_pairs
        hp_pads = [zero] * pad_pairs
    elif wrap == Wrap.CLAMP:
        hp_pads = [hp1] * pad_pairs
        lp1 = i32(_rows(ll, T - 1, T))
        h1 = i32(hp1)
        h2 = i32(_rows(c, T - 2, T - 1))
        if weff == Wavelet.DD137:
            h3 = i32(_rows(c, T - 3, T - 2))
            ev_last = i32(i16(lp1 - div32(8 * h1 + 9 * h2 - h3)))
            # pad j >= 1 sees hp taps (-h1 - h1 + 9(h1 + h1)) = 16*h1;
            # keep the exact truncating div32, NOT h1/2 algebra
            lp_pads = [i16(ev_last + div32(17 * h1 - h2))] + [
                i16(ev_last + div32(16 * h1))
            ] * (pad_pairs - 1)
        else:  # CDF53
            ev_last = i32(i16(lp1 - div4(h2 + h1)))
            lp_pads = [i16(ev_last + div4(2 * h1))] * pad_pairs
    else:  # ZERO
        hp_pads = [zero] * pad_pairs
        h1 = i32(hp1)
        h2 = i32(_rows(c, T - 2, T - 1))
        if weff == Wavelet.DD137:
            lp_pads = [i16(div32(9 * h1 - h2))]
            if pad_pairs > 1:
                lp_pads.append(i16(div32(-h1)))
            lp_pads += [zero] * (pad_pairs - 2)
        else:  # CDF53
            lp_pads = [i16(div4(h1))] + [zero] * (pad_pairs - 1)
    ll_p = jnp.concatenate([ll] + lp_pads[:pad_pairs], axis=-2)
    c_p = jnp.concatenate([c] + hp_pads[:pad_pairs], axis=-2)
    return ll_p, c_p


def _v_lift_local(weff: Wavelet, wrap: Wrap, axis_name: str, x):
    return lift1d(weff, wrap, x, 0, axis=-2, axis_name=axis_name)


def _v_unlift_local(
    weff: Wavelet,
    wrap: Wrap,
    axis_name: str,
    ignore_col: bool,
    ll,
    b,
    c,
    d,
):
    """shard_map body for the inverse level: V unlifts with halo
    exchange, then the row-local H merges and the even/odd interleave
    (pairs stay shard-local: every shard holds an even row count)."""
    ev_l, od_l = unlift1d_pair(weff, wrap, ll, c, axis=-2, axis_name=axis_name)
    ev_r, od_r = unlift1d_pair(weff, wrap, b, d, axis=-2, axis_name=axis_name)

    def merge(lp, hp):
        ev, od = unlift1d_pair(weff, wrap, lp, hp, axis=-1)
        if ignore_col:
            od = _sl(od, 0, -1, -1)
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
    row_sh = NamedSharding(mesh, row_spec)
    replicated = NamedSharding(mesh, P())

    level_chunks: List[jnp.ndarray] = []
    cur = planes
    sharded = True

    for lvl, (qs, gs) in zip(schedule.levels, qg):
        weff = effective_wavelet(wavelet, lvl.target_w, lvl.target_h)
        plan = _shard_plan(lvl, n, wrap, weff) if sharded else None
        if plan is not None:
            T = lvl.target_h
            x = cur
            if lvl.fake_last_row:
                x = jnp.concatenate([x, _rows(x, -1, None)], axis=-2)
            if plan.pad_pairs:
                z = jnp.zeros(
                    x.shape[:-2] + (2 * plan.pad_pairs, x.shape[-1]), x.dtype
                )
                x = jnp.concatenate([x, z], axis=-2)
            x = jax.lax.with_sharding_constraint(x, row_sh)
            h_lift = shard_map(
                lambda a: lift1d(weff, wrap, a, lvl.fake_last_col, axis=-1),
                mesh=mesh,
                in_specs=(row_spec,),
                out_specs=(row_spec,) * 2,
            )
            lp_h, hp_h = h_lift(x)
            if plan.pad_pairs:
                # replace the garbage pad rows with the crafted values
                lp_h = _pad_fwd(_rows(lp_h, 0, 2 * T), T, plan.pad_pairs, wrap, weff)
                hp_h = _pad_fwd(_rows(hp_h, 0, 2 * T), T, plan.pad_pairs, wrap, weff)
                lp_h = jax.lax.with_sharding_constraint(lp_h, row_sh)
                hp_h = jax.lax.with_sharding_constraint(hp_h, row_sh)
            v_lift = shard_map(
                functools.partial(_v_lift_local, weff, wrap, axis_name),
                mesh=mesh,
                in_specs=(row_spec,),
                out_specs=(row_spec,) * 2,
            )
            ll, c = v_lift(lp_h)
            b, d = v_lift(hp_h)
            if plan.pad_pairs:
                ll, b = _rows(ll, 0, T), _rows(b, 0, T)
                c, d = _rows(c, 0, T), _rows(d, 0, T)
        else:
            if sharded:
                cur = jax.lax.with_sharding_constraint(cur, replicated)
                sharded = False
            from ako_tpu.ops.wavelets import lift2d

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
    from ako_tpu.ops.intmath import i16 as _i16, i32 as _i32

    n = mesh.shape[axis_name]
    row_spec = P(None, axis_name, None)
    row_sh = NamedSharding(mesh, row_spec)

    lp_n = channels * schedule.lp_h * schedule.lp_w
    cur = coeffs[:lp_n].reshape(channels, schedule.lp_h, schedule.lp_w)
    off = lp_n

    for lvl in reversed(schedule.levels):
        hw, hh = lvl.target_w, lvl.target_h
        nvals = channels * (1 + 3 * hh * hw)
        chunk = coeffs[off : off + nvals].reshape(channels, 1 + 3 * hh * hw)
        off += nvals

        q = _i32(chunk[..., 0]).reshape(channels, 1, 1, 1)
        quads = chunk[..., 1:].reshape(channels, 3, hh, hw)
        dequant = jnp.where(q > 1, _i16(_i32(quads) * q), quads)
        c = dequant[..., 0, :, :]
        b = dequant[..., 1, :, :]
        d = dequant[..., 2, :, :]

        weff = effective_wavelet(wavelet, hw, hh)
        plan = _shard_plan(lvl, n, wrap, weff)
        if plan is not None:
            if plan.pad_pairs:
                cur, c = _pad_inv(cur, c, hh, plan.pad_pairs, wrap, weff)
                b, d = _pad_inv(b, d, hh, plan.pad_pairs, wrap, weff)
            args = [
                jax.lax.with_sharding_constraint(a, row_sh)
                for a in (cur, b, c, d)
            ]
            f = shard_map(
                functools.partial(
                    _v_unlift_local,
                    weff,
                    wrap,
                    axis_name,
                    bool(lvl.fake_last_col),
                ),
                mesh=mesh,
                in_specs=(row_spec,) * 4,
                out_specs=row_spec,
            )
            out = f(*args)
            # drop pad rows and (when the height is odd) the fake odd
            # row in one slice
            cur = _rows(out, 0, lvl.current_h)
        else:
            from ako_tpu.ops.wavelets import unlift2d

            cur = unlift2d(weff, wrap, cur, b, c, d, lvl)

    return jax.lax.with_sharding_constraint(cur, NamedSharding(mesh, P()))
