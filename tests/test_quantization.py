"""Quantization / gate curve parity vs the reference (same libm)."""

import pytest

from ako_tpu.core.geometry import lift_schedule
from ako_tpu.ops.quantization import gate, quantization

from . import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="reference not mounted")


FACTORS = [0, 1, 2, 4, 8, 15, 16, 17, 32, 64, 100, 512, 1000, 4096, 8192]
TILES = [(8, 8), (64, 48), (512, 512), (1024, 1280), (1632, 2464), (100, 333)]


def test_curve_parity_all_levels():
    checked = 0
    for tw, th in TILES:
        sched = lift_schedule(tw, th)
        for lvl in sched.levels:
            for factor in FACTORS:
                for mul in (1, 2, 3):
                    assert quantization(
                        factor, mul, tw, th, lvl.current_w, lvl.current_h
                    ) == oracle.ref_quantization(
                        factor, mul, tw, th, lvl.current_w, lvl.current_h
                    )
                    assert gate(
                        factor, mul, tw, th, lvl.current_w, lvl.current_h
                    ) == oracle.ref_gate(
                        factor, mul, tw, th, lvl.current_w, lvl.current_h
                    )
                    checked += 1
    assert checked > 500
