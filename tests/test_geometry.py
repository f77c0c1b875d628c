"""Geometry math parity vs the reference library (property tests)."""

import numpy as np
import pytest

from ako_tpu.core import geometry

from . import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="reference not mounted")


DIMS = [1, 2, 3, 4, 5, 7, 8, 9, 16, 17, 31, 64, 150, 300, 512, 1024, 1280, 1632, 2464]


def test_divide_plus_one_rule():
    lib = oracle.load()
    for v in range(1, 4000):
        assert geometry.divide_plus_one(v) == lib.akoDividePlusOneRule(v)


def test_planes_spacing():
    lib = oracle.load()
    for w in DIMS:
        for h in DIMS:
            assert geometry.planes_spacing(w, h) == lib.akoPlanesSpacing(w, h)


def test_tile_data_size():
    for w in DIMS:
        for h in DIMS:
            assert geometry.tile_data_size(w, h) == oracle.ref_tile_data_size(w, h)


def test_tile_dimension_and_count():
    lib = oracle.load()
    for image_d in [8, 64, 100, 333, 1024, 1280]:
        for tiles_dim in [0, 8, 16, 64, 256, 512]:
            for pos in range(0, image_d, max(tiles_dim, 64)):
                assert geometry.tile_dimension(pos, image_d, tiles_dim) == (
                    lib.akoTileDimension(pos, image_d, tiles_dim)
                )
    for w in [64, 100, 1024, 1632]:
        for h in [64, 100, 1280, 2464]:
            for tiles_dim in [0, 8, 64, 256, 512]:
                assert geometry.image_tiles_no(w, h, tiles_dim) == lib.akoImageTilesNo(
                    w, h, tiles_dim
                )
                assert geometry.image_max_tile_data_size(
                    w, h, tiles_dim
                ) == lib.akoImageMaxTileDataSize(w, h, tiles_dim)


def test_lift_schedule_consistency():
    """Level sum must reproduce tile_data_size, and the schedule must
    end when either dim <= 2."""
    for w in DIMS:
        for h in DIMS:
            sched = geometry.lift_schedule(w, h)
            size = 0
            for lvl in sched.levels:
                assert lvl.current_w > 2 and lvl.current_h > 2
                assert lvl.target_w == geometry.divide_plus_one(lvl.current_w)
                assert lvl.target_h == geometry.divide_plus_one(lvl.current_h)
                size += lvl.target_w * lvl.target_h * 2 * 3 + 2
            size += sched.lp_w * sched.lp_h * 2
            assert size == geometry.tile_data_size(w, h)


def test_tile_grid_order():
    grid = geometry.tile_grid(100, 70, 64)
    assert [(t.x, t.y, t.w, t.h) for t in grid] == [
        (0, 0, 64, 64),
        (64, 0, 36, 64),
        (0, 64, 64, 6),
        (64, 64, 36, 6),
    ]
    assert geometry.tile_grid(100, 70, 0) == [geometry.TilePlacement(0, 0, 0, 100, 70)]
