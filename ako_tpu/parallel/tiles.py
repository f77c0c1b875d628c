"""Tile-data-parallelism: the independent-tile grid sharded over chips.

Ako tiles are fully independent (own pyramid, own quantization heads,
own entropy block — SURVEY.md §2.4), so the grid's natural TPU mapping
is a leading batch dimension sharded over a 1-D "tiles" mesh axis.
The per-tile compute (format + lift + fused quantization, and the
inverse) contains no cross-tile ops, so GSPMD partitions it with zero
communication; the only collective is the implicit gather when the
serialized streams are fetched for host entropy coding (the bitstream
gather of SURVEY.md §2.4.3).

Replaces the reference's sequential tile loop (library/encode.c:115,
library/decode.c:128) with one SPMD program per distinct tile shape.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ako_tpu.core import geometry
from ako_tpu.core.settings import Color, Settings, Wavelet, Wrap
from ako_tpu.ops.colorspace import to_interleaved_u8, to_planar_yuv
from ako_tpu.ops.lifting import forward_tile, inverse_tile
from ako_tpu.ops.quantization import level_qg


def pad_batch(n: int, n_shards: int) -> int:
    """Tiles are padded to a multiple of the mesh size; the pad tiles
    are discarded after the gather."""
    return (n + n_shards - 1) // n_shards * n_shards


@functools.lru_cache(maxsize=128)
def _sharded_tile_encoder(
    mesh: Mesh,
    axis_name: str,
    tile_w: int,
    tile_h: int,
    channels: int,
    wavelet: Wavelet,
    wrap: Wrap,
    color: Color,
    discard_non_visible: bool,
    quantization: int,
    gate: int,
    chroma_loss: int,
):
    schedule = geometry.lift_schedule(tile_w, tile_h)
    qg = level_qg(schedule, channels, quantization, gate, chroma_loss)
    batch_spec = NamedSharding(mesh, P(axis_name))

    def fn(tiles_u8):
        planes = to_planar_yuv(tiles_u8, color, discard_non_visible)
        if wavelet == Wavelet.NONE:
            return planes.reshape(planes.shape[:-3] + (-1,))
        return forward_tile(planes, schedule, wavelet, wrap, qg)

    return jax.jit(fn, in_shardings=batch_spec, out_shardings=batch_spec)


@functools.lru_cache(maxsize=128)
def _sharded_tile_decoder(
    mesh: Mesh,
    axis_name: str,
    tile_w: int,
    tile_h: int,
    channels: int,
    wavelet: Wavelet,
    wrap: Wrap,
    color: Color,
):
    schedule = geometry.lift_schedule(tile_w, tile_h)
    batch_spec = NamedSharding(mesh, P(axis_name))

    def fn(coeffs):
        if wavelet == Wavelet.NONE:
            planes = coeffs.reshape(coeffs.shape[:-1] + (channels, tile_h, tile_w))
        else:
            planes = inverse_tile(coeffs, schedule, wavelet, wrap, channels)
        return to_interleaved_u8(planes, color, channels)

    return jax.jit(fn, in_shardings=batch_spec, out_shardings=batch_spec)


def encode_tiles_sharded(
    image: np.ndarray,
    s: Settings,
    mesh: Mesh,
    axis_name: str = "tiles",
) -> list:
    """Device stage of encode over a mesh; returns per-tile int16
    streams in row-major tile order (same contract as
    encode.encode_tiles_device)."""
    image_h, image_w, channels = image.shape
    grid = geometry.tile_grid(image_w, image_h, s.tiles_dimension)
    n_shards = mesh.shape[axis_name]

    by_shape: dict[tuple[int, int], list[geometry.TilePlacement]] = {}
    for t in grid:
        by_shape.setdefault((t.w, t.h), []).append(t)

    out: list[Optional[np.ndarray]] = [None] * len(grid)
    for (tw, th), tiles in by_shape.items():
        fn = _sharded_tile_encoder(
            mesh,
            axis_name,
            tw,
            th,
            channels,
            s.wavelet,
            s.wrap,
            s.color,
            bool(s.discard_non_visible),
            s.quantization,
            s.gate,
            s.chroma_loss,
        )
        batch = np.stack(
            [image[t.y : t.y + th, t.x : t.x + tw, :] for t in tiles], axis=0
        )
        padded = pad_batch(len(tiles), n_shards)
        if padded != len(tiles):
            batch = np.concatenate(
                [batch, np.zeros((padded - len(tiles),) + batch.shape[1:], np.uint8)]
            )
        coeffs = np.asarray(fn(jnp.asarray(batch)))
        for i, t in enumerate(tiles):
            out[t.index] = coeffs[i]
    return out


@functools.lru_cache(maxsize=128)
def _sharded_tile_encoder_fused(
    mesh: Mesh,
    axis_name: str,
    tile_w: int,
    tile_h: int,
    channels: int,
    wavelet: Wavelet,
    wrap: Wrap,
    color: Color,
    discard_non_visible: bool,
    quantization: int,
    gate: int,
    chroma_loss: int,
):
    """SPMD fused encode + bitstream gather: tiles sharded over the
    mesh run format+lift+Kagari locally. Only the (tiny) per-tile sizes
    are replicated eagerly; the compressed planes stay sharded, and the
    caller gathers them through `_bucket_gather` at a width bounded by
    the actual compressed sizes — the TPU-native form of the
    reference's sequential blob append (library/encode.c:170-182;
    SURVEY.md §2.4.3) without moving budget-width planes over ICI."""
    from ako_tpu.encode import _tile_encoder_fused_raw

    fn, capacity, budget = _tile_encoder_fused_raw(
        tile_w, tile_h, channels, wavelet, wrap, color,
        discard_non_visible, quantization, gate, chroma_loss,
    )
    batch_spec = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())
    fwd_jit = jax.jit(fn.fwd, in_shardings=batch_spec, out_shardings=batch_spec)
    pack_jit = jax.jit(
        fn.pack,
        in_shardings=batch_spec,
        out_shardings=(batch_spec, replicated),
    )
    return fwd_jit, pack_jit, capacity, budget


def _bucket_width(m: int, budget: int) -> int:
    """Smallest power-of-two >= m (clamped to budget): the all-gather
    width is bounded by twice the largest actual compressed size while
    keeping the number of compiled gather programs logarithmic."""
    return min(geometry.pow2_bucket(m, 64), budget)


@functools.lru_cache(maxsize=512)
def _bucket_gather(mesh: Mesh, axis_name: str, width: int):
    """Jitted ICI all-gather of the first `width` byte columns of a
    tile-sharded compressed plane."""
    batch_spec = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        lambda b: b[:, :width],
        in_shardings=batch_spec,
        out_shardings=replicated,
    )


def encode_image_sharded(
    image: np.ndarray,
    s: Settings,
    mesh: Mesh,
    axis_name: str = "tiles",
) -> bytes:
    """Full multi-chip encode: tile grid sharded over the mesh, blocks
    gathered via ICI, container assembled on host. Byte-identical to
    the single-chip encode()."""
    from ako_tpu.core import container
    from ako_tpu.encode import _CAPACITY_MARGIN, checked_settings
    from ako_tpu.runtime.kagari import BLOCK_HEAD, compress_block
    from ako_tpu.core.settings import AkoError, Status

    s = checked_settings(s)
    image_h, image_w, channels = image.shape
    head = container.head_write(channels, image_w, image_h, s)
    grid = geometry.tile_grid(image_w, image_h, s.tiles_dimension)
    n_shards = mesh.shape[axis_name]

    by_shape: dict[tuple[int, int], list[geometry.TilePlacement]] = {}
    for t in grid:
        by_shape.setdefault((t.w, t.h), []).append(t)

    blocks: list[Optional[bytes]] = [None] * len(grid)
    for (tw, th), tiles in by_shape.items():
        fwd, pack, capacity, budget = _sharded_tile_encoder_fused(
            mesh, axis_name, tw, th, channels, s.wavelet, s.wrap, s.color,
            bool(s.discard_non_visible), s.quantization, s.gate, s.chroma_loss,
        )
        batch = np.stack(
            [image[t.y : t.y + th, t.x : t.x + tw, :] for t in tiles], axis=0
        )
        padded = pad_batch(len(tiles), n_shards)
        if padded != len(tiles):
            batch = np.concatenate(
                [batch, np.zeros((padded - len(tiles),) + batch.shape[1:], np.uint8)]
            )
        stream_dev = fwd(jnp.asarray(batch))
        comp_bytes, totals_dev = pack(stream_dev)
        totals = np.asarray(totals_dev)

        fallback = []
        for i, t in enumerate(tiles):
            n = int(totals[i])
            if n > budget or n >= capacity - _CAPACITY_MARGIN:
                fallback.append(i)
        ok = [i for i in range(len(tiles)) if i not in set(fallback)]
        if ok:
            # gather only up to the largest actual compressed size
            # (bucketed): moved bytes scale with content, not budget
            m = int(max(totals[i] for i in ok))
            gather = _bucket_gather(mesh, axis_name, _bucket_width(m, budget))
            host_bytes = np.asarray(gather(comp_bytes))
            for i in ok:
                n = int(totals[i])
                blocks[tiles[i].index] = (
                    BLOCK_HEAD.pack(n) + host_bytes[i, :n].tobytes()
                )
        if fallback:
            # near-capacity tiles: reuse the sharded coefficient stream
            # (no recompute), host coder decides exact failure semantics
            streams = np.asarray(stream_dev[jnp.asarray(fallback)])
            for j, i in enumerate(fallback):
                block = compress_block(streams[j], capacity + BLOCK_HEAD.size)
                if block is None:
                    raise AkoError(Status.ERROR, "incompressible tile")
                blocks[tiles[i].index] = block

    return head + b"".join(blocks)


def decode_image_sharded(
    blob: bytes,
    mesh: Mesh,
    axis_name: str = "tiles",
):
    """Full multi-chip decode: host entropy decode (independent
    blocks), tile batch sharded over the mesh for unlift+format, pixel
    planes gathered. Bit-identical to the single-chip decode()."""
    from ako_tpu.core import container
    from ako_tpu.decode import _check_decode_budget, read_tile_stream

    view = memoryview(blob)
    channels, image_w, image_h, s = container.head_read(view)
    _check_decode_budget(image_w, image_h, channels)
    cursor = container.HEAD_SIZE
    grid = geometry.tile_grid(image_w, image_h, s.tiles_dimension)

    streams = []
    for t in grid:
        values, cursor = read_tile_stream(view, cursor, t, s, channels)
        streams.append(values)

    image = np.empty((image_h, image_w, channels), dtype=np.uint8)
    decode_tiles_sharded(streams, grid, image, s, channels, mesh, axis_name)
    return image, s, channels


def decode_tiles_sharded(
    streams: list,
    grid: list,
    image: np.ndarray,
    s: Settings,
    channels: int,
    mesh: Mesh,
    axis_name: str = "tiles",
) -> None:
    """Device stage of decode over a mesh; writes pixels into `image`
    in place (same contract as the loop in decode.decode)."""
    n_shards = mesh.shape[axis_name]
    by_shape: dict[tuple[int, int], list[geometry.TilePlacement]] = {}
    for t in grid:
        by_shape.setdefault((t.w, t.h), []).append(t)

    for (tw, th), tiles in by_shape.items():
        fn = _sharded_tile_decoder(
            mesh, axis_name, tw, th, channels, s.wavelet, s.wrap, s.color
        )
        batch = np.stack([streams[t.index] for t in tiles], axis=0)
        padded = pad_batch(len(tiles), n_shards)
        if padded != len(tiles):
            batch = np.concatenate(
                [batch, np.zeros((padded - len(tiles),) + batch.shape[1:], np.int16)]
            )
        pixels = np.asarray(fn(jnp.asarray(batch)))
        for i, t in enumerate(tiles):
            image[t.y : t.y + th, t.x : t.x + tw, :] = pixels[i]
