"""Decode orchestrator: .ako blob -> image.

Mirror of the encode split (reference: library/decode.c:38-250): host
parses the container and entropy-decodes per-tile blocks into int16
coefficient streams; the device stage (unlift + inverse color +
interleave) runs as one jitted program per tile shape, batched over
same-shaped tiles. Decoded pixels are bit-identical to the reference
decoder's output.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ako_tpu.core import container, geometry
from ako_tpu.core.events import Event, EventsCallback
from ako_tpu.core.settings import (
    AkoError,
    Color,
    Compression,
    Settings,
    Status,
    Wavelet,
    Wrap,
)
from ako_tpu.ops.colorspace import to_interleaved_u8
from ako_tpu.ops.lifting import inverse_tile


@functools.lru_cache(maxsize=256)
def _tile_decoder(
    tile_w: int,
    tile_h: int,
    channels: int,
    wavelet: Wavelet,
    wrap: Wrap,
    color: Color,
):
    """Jitted device program: (T, coeff_count) int16 -> (T, tile_h,
    tile_w, channels) u8 tiles."""
    schedule = geometry.lift_schedule(tile_w, tile_h)

    def fn(coeffs):
        if wavelet == Wavelet.NONE:
            planes = coeffs.reshape(coeffs.shape[:-1] + (channels, tile_h, tile_w))
        else:
            planes = inverse_tile(coeffs, schedule, wavelet, wrap, channels)
        return to_interleaved_u8(planes, color, channels)

    return jax.jit(fn)


def _tail_layout(schedule, channels: int, n_levels: int = 2):
    """Serialized-stream layout of the largest `n_levels` levels (the
    stream's tail): (split_offset, [(head_count, body_len) per level]).
    Level chunks are [q-head][C][B][D] per channel (ops/lifting.py)."""
    n_levels = min(n_levels, len(schedule.levels))
    total = schedule.coeff_count(channels)
    tail_levels = schedule.levels[:n_levels]  # encode order: largest first
    tail_size = sum(
        channels * (1 + 3 * lvl.target_w * lvl.target_h) for lvl in tail_levels
    )
    # stream order within the tail: smallest of the pair first
    stream_order = list(reversed(tail_levels))
    return total - tail_size, stream_order


@functools.lru_cache(maxsize=256)
def _tile_decoder_split(
    tile_w: int,
    tile_h: int,
    channels: int,
    wavelet: Wavelet,
    wrap: Wrap,
    color: Color,
):
    """Upload-lean decoder: the largest levels' highpass bodies arrive
    as int8 (they are small after quantization), q-heads and the rest
    as int16 — roughly halving the dominant host->device transfer.
    Exactness is unaffected: the host checks |body| <= 127 first and
    falls back to the int16 program otherwise (decode())."""
    schedule = geometry.lift_schedule(tile_w, tile_h)
    split, stream_order = _tail_layout(schedule, channels)

    def fn(head16, bodies8, heads16):
        parts = [head16]
        off8 = 0
        hidx = 0
        for lvl in stream_order:
            body_len = 3 * lvl.target_w * lvl.target_h
            for _c in range(channels):
                parts.append(heads16[..., hidx : hidx + 1])
                hidx += 1
                parts.append(
                    bodies8[..., off8 : off8 + body_len].astype(jnp.int16)
                )
                off8 += body_len
        coeffs = jnp.concatenate(parts, axis=-1)
        planes = inverse_tile(coeffs, schedule, wavelet, wrap, channels)
        return to_interleaved_u8(planes, color, channels)

    return jax.jit(fn), split, stream_order


def split_streams_for_upload(streams_batch: np.ndarray, schedule, channels: int):
    """Host-side split of a (T, n) int16 stream batch into
    (head16, bodies8, heads16) for _tile_decoder_split, or None when
    any tail body value exceeds int8 range (caller falls back)."""
    split, stream_order = _tail_layout(schedule, channels)
    head16 = streams_batch[:, :split]
    tail = streams_batch[:, split:]
    bodies = []
    heads = []
    off = 0
    for lvl in stream_order:
        body_len = 3 * lvl.target_w * lvl.target_h
        for _c in range(channels):
            heads.append(tail[:, off : off + 1])
            off += 1
            bodies.append(tail[:, off : off + body_len])
            off += body_len
    bodies_cat = np.concatenate(bodies, axis=1)
    # upcast before abs: np.abs(int16 -32768) wraps to -32768 and would
    # slip past the range check, then corrupt to 0 in the int8 cast
    if bodies_cat.size and np.abs(bodies_cat.astype(np.int32)).max() > 127:
        return None
    return (
        head16,
        bodies_cat.astype(np.int8),
        np.concatenate(heads, axis=1),
    )


def _run_tile_decoder(streams_batch: np.ndarray, tw, th, channels, s):
    """Pick the upload-lean split program when the tail fits int8,
    else the plain int16 program; returns the device array (async).
    Bulk uploads ride the chunked-parallel transfer path."""
    from ako_tpu.runtime.transfer import device_put_parallel

    schedule = geometry.lift_schedule(tw, th)
    if s.wavelet != Wavelet.NONE and len(schedule.levels) >= 2:
        parts = split_streams_for_upload(streams_batch, schedule, channels)
        if parts is not None:
            fn, _, _ = _tile_decoder_split(tw, th, channels, s.wavelet, s.wrap, s.color)
            return fn(
                device_put_parallel(parts[0]),
                device_put_parallel(parts[1]),
                jnp.asarray(parts[2]),
            )
    fn = _tile_decoder(tw, th, channels, s.wavelet, s.wrap, s.color)
    return fn(device_put_parallel(streams_batch))


#: Upper bound on decoded image bytes (w*h*channels). The reference
#: relies on malloc failing for absurd headers (status
#: NO_ENOUGH_MEMORY, encode.c:94-98); a compiled-program pipeline must
#: reject them before attempting allocation/compilation. Override via
#: ako_tpu.decode.MAX_IMAGE_BYTES for genuinely huge images.
MAX_IMAGE_BYTES = 1 << 31


def _check_decode_budget(image_w: int, image_h: int, channels: int) -> None:
    if image_w * image_h * channels > MAX_IMAGE_BYTES:
        raise AkoError(Status.NO_ENOUGH_MEMORY, "image exceeds MAX_IMAGE_BYTES")


def _fire(events, tile_no, total, event, user):
    if events is not None:
        events(tile_no, total, event, user)


def tile_block_sizes(t, s: Settings, channels: int):
    """(tile_data_size bytes, planes_spacing elements) for one tile —
    the decode-side size contract (reference decode.c:133-142)."""
    if s.wavelet != Wavelet.NONE:
        return (
            geometry.tile_data_size(t.w, t.h) * channels,
            geometry.planes_spacing(t.w, t.h),
        )
    return t.w * t.h * channels * 2, 0


def read_tile_stream(view, cursor: int, t, s: Settings, channels: int):
    """Entropy-decode (or raw-copy) one tile block from `view` at
    `cursor`; returns (int16 values, new_cursor). Raises
    AkoError(BROKEN_INPUT) on truncation/corruption. Single source of
    truth for the per-tile block walk — used by every decode surface."""
    tds, spacing = tile_block_sizes(t, s, channels)
    if s.compression != Compression.NONE:
        from ako_tpu.runtime.kagari import decompress_block

        res = decompress_block(view[cursor:], tds, tds + spacing)
        if res is None:
            raise AkoError(Status.BROKEN_INPUT)
        values, consumed = res
        return values, cursor + consumed
    if cursor + tds > len(view):
        raise AkoError(Status.BROKEN_INPUT)
    values = np.frombuffer(view[cursor : cursor + tds], dtype=np.int16).copy()
    return values, cursor + tds


def decode(
    blob: bytes,
    events: Optional[EventsCallback] = None,
    events_user=None,
) -> Tuple[np.ndarray, Settings, int]:
    """Decode an .ako blob. Returns (image uint8 (h, w, channels),
    settings-from-header, channels); raises AkoError on failure."""
    if blob is None:
        raise AkoError(Status.INVALID_INPUT)
    view = memoryview(blob)
    channels, image_w, image_h, s = container.head_read(view)
    _check_decode_budget(image_w, image_h, channels)
    cursor = container.HEAD_SIZE

    grid = geometry.tile_grid(image_w, image_h, s.tiles_dimension)
    total = len(grid)

    # Host: entropy-decode every tile block into its coefficient stream
    streams: list[np.ndarray] = []
    for t in grid:
        _fire(events, t.index, total, Event.COMPRESSION_START, events_user)
        values, cursor = read_tile_stream(view, cursor, t, s, channels)
        _fire(events, t.index, total, Event.COMPRESSION_END, events_user)
        streams.append(values)

    # Device: batched unlift + format per tile shape
    image = np.empty((image_h, image_w, channels), dtype=np.uint8)
    by_shape: dict[tuple[int, int], list[geometry.TilePlacement]] = {}
    for t in grid:
        by_shape.setdefault((t.w, t.h), []).append(t)

    from ako_tpu.runtime.transfer import device_get_parallel

    for (tw, th), tiles in by_shape.items():
        t0 = tiles[0].index
        _fire(events, t0, total, Event.WAVELET_START, events_user)
        batch = np.stack([streams[t.index] for t in tiles], axis=0)
        pixels = device_get_parallel(_run_tile_decoder(batch, tw, th, channels, s))
        _fire(events, t0, total, Event.WAVELET_END, events_user)
        _fire(events, t0, total, Event.FORMAT_START, events_user)
        for i, t in enumerate(tiles):
            image[t.y : t.y + th, t.x : t.x + tw, :] = pixels[i]
        _fire(events, t0, total, Event.FORMAT_END, events_user)

    return image, s, channels


def decode_tiles_iter(blob: bytes):
    """Streaming decode: yield (tile_placement, pixels uint8 (th, tw,
    channels)) as each tile block is consumed, in tile row-major order.

    The format is tile-streamable — every tile block is independently
    decodable once the 16-byte header is read (the reference documents
    this property; SURVEY.md §5 checkpoint/resume analog). A truncated
    blob yields the tiles that fit and then raises AkoError."""
    view = memoryview(blob)
    channels, image_w, image_h, s = container.head_read(view)
    _check_decode_budget(image_w, image_h, channels)
    cursor = container.HEAD_SIZE
    grid = geometry.tile_grid(image_w, image_h, s.tiles_dimension)

    for t in grid:
        values, cursor = read_tile_stream(view, cursor, t, s, channels)
        fn = _tile_decoder(t.w, t.h, channels, s.wavelet, s.wrap, s.color)
        pixels = np.asarray(fn(jnp.asarray(values[None])))[0]
        yield t, pixels
