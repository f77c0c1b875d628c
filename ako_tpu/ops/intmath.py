"""Integer helpers reproducing C arithmetic semantics in XLA.

The reference does all math on int-promoted values and truncates to
int16 at every array store; C integer division truncates toward zero.
jnp's `//` floors, so every division here goes through explicit
truncating forms. Power-of-two divisions use a branch-free bias+shift
(the form XLA lowers signed division to anyway) to stay VPU-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def i16(x):
    return x.astype(jnp.int16)


def i32(x):
    return x.astype(jnp.int32)


def div2(x):
    """Truncating /2 on int32 (C semantics on negatives)."""
    return (x + ((x >> 31) & 1)) >> 1


def div4(x):
    return (x + ((x >> 31) & 3)) >> 2


def div16(x):
    return (x + ((x >> 31) & 15)) >> 4


def div32(x):
    return (x + ((x >> 31) & 31)) >> 5


def divt(x, d):
    """Truncating division with runtime divisor (lax.div is C-style)."""
    return lax.div(x, d)
