"""Exact model of the reference encoder's 5x5-tile workarea spill.

For a 5x5 tile the reference `akoLift` places the second lift level's
aux buffer at `lp + ((target_w * 2) * (target_h * 2)) * 2` = lp + 32
int16s (library/lifting.c:232), but its 16-int16 extent [32, 48)
exceeds the plane allocation `5*5 + akoPlanesSpacing(5, 5)` = 45
(library/misc.c:104-107): the last 3 int16s spill into the NEXT
channel's plane start. The spilled values are positions 1..3 of the
fake-last-row H-lift output row `[LP0, LP1, HP0, HP1]`
(library/lifting.c:64-66 writes it at `aux + current_h * target_w * 2`
= aux[12..16); row layout per library/wavelet-cdf53.c:57-124). Because
the lowpass serialization pass runs only after every level of every
channel (library/lifting.c:279-291) and channels are processed in
descending order, channel k's wire LP[0], LP[1] (plane offsets 0 and 1;
offset 2 is an already-serialized highpass position) end up replaced by
channel k-1's spill, for every k >= 1.

The corruption is fully deterministic — a pure function of channel
k-1's formatted tile plane — so this module reproduces the reference
blob bit-exactly from our (correct) blob. 5x5 is the unique tile shape
whose spill reaches a later plane: `12*tw*th > w*h + 2w + 2h` has no
other solution for any non-first lift level (brute-force swept to
400x400 in test_differential::test_5x5_is_the_only_spill_shape), and
only the bottom-right corner tile of a grid can be 5x5.

PARITY.md "Known divergences" item 9 records why we do NOT replicate
this in the production encoder: like divergences 1 and 7 it is an
uninitialized/overflowed-workarea artifact, and our correct encoding is
decoded bit-identically by the reference's own decoder.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ako_tpu.core import geometry
from ako_tpu.core.container import HEAD_SIZE, head_read
from ako_tpu.core.settings import Compression, Settings, Wavelet
from ako_tpu.decode import read_tile_stream, tile_block_sizes
from ako_tpu.ops.colorspace import to_planar_yuv
from ako_tpu.ops.lifting import forward_tile  # noqa: F401  (doc anchor)
from ako_tpu.ops.wavelets import effective_wavelet, lift1d, lift2d


def stomp_values(prev_plane_i16: np.ndarray, wavelet: Wavelet, wrap) -> tuple[int, int]:
    """The two int16s channel k-1's level-2 aux spill writes over
    channel k's LP[0], LP[1] in a 5x5 tile: positions 1 and 2 of the
    H-lift output row of the last row of k-1's level-1 LL."""
    import jax.numpy as jnp

    x = jnp.asarray(prev_plane_i16, dtype=jnp.int16)[None]  # (1, 5, 5)
    sched = geometry.lift_schedule(5, 5)
    lvl1, lvl2 = sched.levels
    ll1, *_ = lift2d(effective_wavelet(wavelet, lvl1.target_w, lvl1.target_h), wrap, x, lvl1)
    row = ll1[0, 2, :]  # last row of the 3x3 LL, 3 values
    lp, hp = lift1d(
        effective_wavelet(wavelet, lvl2.target_w, lvl2.target_h), wrap, row[None], 1, axis=-1
    )
    return int(lp[0, 1]), int(hp[0, 0])


def expected_ref_blob(img: np.ndarray, s_encode: Settings, ours: bytes) -> bytes | None:
    """Predict the reference encoder's blob from our (correct) blob.

    Returns `ours` unchanged when the 5x5 spill quirk does not apply;
    otherwise splices a corner-tile block whose channel-1.. LP[0],LP[1]
    carry the modeled spill values. None when the patched corner block
    no longer fits its compression budget (the reference would fail).
    The container head supplies the *effective* wire settings (e.g. the
    YCoCg auto-switch); `s_encode` supplies discard_non_visible, which
    the head does not store."""
    channels, w, h, s = head_read(ours)
    s = dataclasses.replace(s, discard_non_visible=s_encode.discard_non_visible)
    if s.wavelet == Wavelet.NONE or channels < 2:
        return ours
    grid = geometry.tile_grid(w, h, s.tiles_dimension)
    corner = grid[-1]
    if (corner.w, corner.h) != (5, 5):
        return ours

    view = memoryview(ours)
    cursor = HEAD_SIZE
    for t in grid[:-1]:
        _, cursor = read_tile_stream(view, cursor, t, s, channels)
    prefix = bytes(view[:cursor])
    values, _end = read_tile_stream(view, cursor, corner, s, channels)
    values = np.array(values, dtype=np.int16, copy=True)

    tile_px = img[corner.y : corner.y + 5, corner.x : corner.x + 5]
    planes = np.asarray(
        to_planar_yuv(np.asarray(tile_px, dtype=np.uint8)[None], s.color, s.discard_non_visible)
    )[0]
    per_ch = geometry.tile_data_size(5, 5) // 2  # int16s per channel block
    assert values.size == per_ch * channels
    for k in range(1, channels):
        v0, v1 = stomp_values(planes[k - 1], s.wavelet, s.wrap)
        values[4 * k + 0] = v0
        values[4 * k + 1] = v1

    tds, _spacing = tile_block_sizes(corner, s, channels)
    if s.compression != Compression.NONE:
        from ako_tpu.runtime.kagari import compress_block

        block = compress_block(values, tds)
        if block is None:
            return None
    else:
        block = values.tobytes()
    return prefix + block
