"""Scalar golden model of the lifting wavelets (pure NumPy loops).

The analog of the reference's research DWT prototypes
(resources/research/{cdf53,dd137}.cpp): the simplest possible
formulation of each 1-D forward/inverse lift, written as explicit
element loops so every boundary case is visible. The production
vectorized kernels (ops/wavelets.py) are property-tested against this
model in tests/test_research.py.

All divisions truncate toward zero (C semantics); every store wraps to
int16."""

from __future__ import annotations

import numpy as np

from ako_tpu.core.settings import Wavelet, Wrap


def _i16(v: int) -> int:
    v &= 0xFFFF
    return v - 0x10000 if v >= 0x8000 else v


def _divt(a: int, b: int) -> int:
    q = abs(a) // b
    return -q if a < 0 else q


def _tap(arr, i, wrap: Wrap, dist: int = 1):
    """Boundary-substituting element access on the even/odd sequences.
    The substitution depends on the tap distance, not just the index:
    the reference uses x[0]/x[-1] for the +-1 taps but x[1],x[2] /
    x[-3],x[-2] (MIRROR) or doubled edges (CLAMP) for the +-2 taps
    (wavelet-dd137.c first/last-values cases)."""
    n = len(arr)
    if 0 <= i < n:
        return int(arr[i])
    if wrap == Wrap.REPEAT:
        return int(arr[i % n])
    if wrap == Wrap.ZERO:
        return 0
    if wrap == Wrap.CLAMP:
        return int(arr[0]) if i < 0 else int(arr[-1])
    # MIRROR
    if dist == 1:
        return int(arr[0]) if i < 0 else int(arr[-1])
    # dist == 2: out-of-range by up to two on either side
    return int(arr[i + 3]) if i < 0 else int(arr[i - 3])


def lift1d(wavelet: Wavelet, wrap: Wrap, x: np.ndarray):
    """Forward lift of an even-length 1-D int16 signal -> (lp, hp)."""
    x = np.asarray(x, dtype=np.int16)
    ev = x[0::2].astype(np.int64)
    od = x[1::2].astype(np.int64)
    t = len(ev)
    hp = np.zeros(t, np.int16)
    lp = np.zeros(t, np.int16)

    if wavelet == Wavelet.HAAR:
        for i in range(t):
            lp[i] = _i16(int(ev[i]))
            hp[i] = _i16(int(od[i]) - int(ev[i]))
        return lp, hp

    if wavelet == Wavelet.CDF53:
        for i in range(t):
            hp[i] = _i16(int(od[i]) - _divt(_tap(ev, i, wrap) + _tap(ev, i + 1, wrap), 2))
        for i in range(t):
            lp[i] = _i16(int(ev[i]) + _divt(_tap(hp, i - 1, wrap) + _tap(hp, i, wrap), 4))
        return lp, hp

    for i in range(t):  # DD137
        hp[i] = _i16(
            int(od[i])
            + _divt(
                _tap(ev, i - 1, wrap)
                + _tap(ev, i + 2, wrap, 2)
                - 9 * (_tap(ev, i, wrap) + _tap(ev, i + 1, wrap)),
                16,
            )
        )
    for i in range(t):
        lp[i] = _i16(
            int(ev[i])
            + _divt(
                -_tap(hp, i - 2, wrap, 2)
                - _tap(hp, i + 1, wrap)
                + 9 * (_tap(hp, i - 1, wrap) + _tap(hp, i, wrap)),
                32,
            )
        )
    return lp, hp


def unlift1d(wavelet: Wavelet, wrap: Wrap, lp: np.ndarray, hp: np.ndarray):
    """Inverse lift -> the original even-length signal."""
    lp = np.asarray(lp, dtype=np.int16)
    hp = np.asarray(hp, dtype=np.int16)
    t = len(lp)
    ev = np.zeros(t, np.int16)
    od = np.zeros(t, np.int16)

    if wavelet == Wavelet.HAAR:
        for i in range(t):
            ev[i] = _i16(int(lp[i]))
            od[i] = _i16(int(lp[i]) + int(hp[i]))
    elif wavelet == Wavelet.CDF53:
        for i in range(t):
            ev[i] = _i16(int(lp[i]) - _divt(_tap(hp, i - 1, wrap) + _tap(hp, i, wrap), 4))
        for i in range(t):
            od[i] = _i16(int(hp[i]) + _divt(_tap(ev, i, wrap) + _tap(ev, i + 1, wrap), 2))
    else:
        for i in range(t):
            ev[i] = _i16(
                int(lp[i])
                - _divt(
                    -_tap(hp, i - 2, wrap, 2)
                    - _tap(hp, i + 1, wrap)
                    + 9 * (_tap(hp, i - 1, wrap) + _tap(hp, i, wrap)),
                    32,
                )
            )
        for i in range(t):
            od[i] = _i16(
                int(hp[i])
                - _divt(
                    _tap(ev, i - 1, wrap)
                    + _tap(ev, i + 2, wrap, 2)
                    - 9 * (_tap(ev, i, wrap) + _tap(ev, i + 1, wrap)),
                    16,
                )
            )

    out = np.zeros(2 * t, np.int16)
    out[0::2] = ev
    out[1::2] = od
    return out
