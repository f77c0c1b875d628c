"""Standalone rANS (range asymmetric numeral system) coder.

The analog of the reference's resources/research/ans1 prototypes
(Duda 2014 groundwork for the format's reserved MANBAVARAN method,
reference library/ako.h:71 — which the reference never implemented,
library/compression.c:39). Kept out of the codec pipeline so container
output stays byte-exact with the reference; this was the research
stepping stone for the production Manbavaran coder — now implemented
natively (runtime/native/akort.c) with a block-parallel device decoder
(ops/manba_device.py), opt-in via AKO_TPU_MANBAVARAN=1.

Static-model byte-wise rANS: 32-bit state, 8-bit renormalization,
frequencies quantized to a 12-bit (4096) probability scale. Decoder
consumes bytes in reverse encode order, as usual for rANS."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

PROB_BITS = 12
PROB_SCALE = 1 << PROB_BITS
STATE_LO = 1 << 23  # renormalization threshold


def build_model(data: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Quantized frequency/cumulative tables over byte symbols.
    Every present symbol keeps freq >= 1 after scaling."""
    data = np.asarray(data, dtype=np.uint8)
    hist = np.bincount(data, minlength=256).astype(np.int64)
    total = int(hist.sum())
    if total == 0:
        raise ValueError("empty input")
    freq = (hist * PROB_SCALE) // total
    freq[(hist > 0) & (freq == 0)] = 1
    # fix the rounding drift on the most frequent symbol
    drift = PROB_SCALE - int(freq.sum())
    freq[int(np.argmax(freq))] += drift
    if freq[int(np.argmax(freq))] < 1:
        raise ValueError("model degenerate")
    cum = np.zeros(257, np.int64)
    cum[1:] = np.cumsum(freq)
    return freq, cum


def encode(data: np.ndarray, freq: np.ndarray, cum: np.ndarray) -> bytes:
    """rANS-encode bytes under the static model; returns the payload
    (renormalized bytes in encode order + final 4-byte state)."""
    data = np.asarray(data, dtype=np.uint8)
    out: List[int] = []
    x = STATE_LO
    for sym in data[::-1]:  # encode in reverse so decode is forward
        f = int(freq[sym])
        c = int(cum[sym])
        # renormalize: keep x < (STATE_LO >> PROB_BITS << 8) * f
        x_max = ((STATE_LO >> PROB_BITS) << 8) * f
        while x >= x_max:
            out.append(x & 0xFF)
            x >>= 8
        x = ((x // f) << PROB_BITS) + (x % f) + c
    # out holds renormalized bytes newest-first; decoder reads them back
    payload = bytes(out[::-1])
    return x.to_bytes(4, "little") + payload


def decode(blob: bytes, count: int, freq: np.ndarray, cum: np.ndarray) -> np.ndarray:
    """Inverse of encode: recover `count` bytes."""
    x = int.from_bytes(blob[:4], "little")
    stream = blob[4:]
    pos = 0
    # symbol lookup: slot -> symbol (12-bit table)
    slots = np.zeros(PROB_SCALE, np.uint8)
    for s in range(256):
        lo, hi = int(cum[s]), int(cum[s + 1])
        if hi > lo:
            slots[lo:hi] = s
    out = np.zeros(count, np.uint8)
    for i in range(count):
        slot = x & (PROB_SCALE - 1)
        sym = int(slots[slot])
        f = int(freq[sym])
        c = int(cum[sym])
        x = f * (x >> PROB_BITS) + slot - c
        while x < STATE_LO and pos < len(stream):
            x = (x << 8) | stream[pos]
            pos += 1
        out[i] = sym
    return out


def roundtrip(data: np.ndarray) -> bytes:
    """Convenience: model + encode; used by the research tests."""
    freq, cum = build_model(data)
    return encode(data, freq, cum)
