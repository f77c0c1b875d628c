"""Chunked-parallel host<->device transfers.

The tunneled link serializes per-transfer but scales across concurrent
streams (~4x with 4 threads measured), so every bulk transfer splits
along the leading axis into chunks moved by a thread pool — uploads
via jax.device_put per chunk then a device-side concatenate (cheap),
downloads via per-chunk fetches into a preallocated host buffer.
On a direct-attached accelerator the chunking is harmless.
"""

from __future__ import annotations

import concurrent.futures as cf
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

#: transfers below this size aren't worth the thread fan-out
_MIN_PARALLEL_BYTES = 1 << 20
_CHUNKS = 4

_pool: Optional[cf.ThreadPoolExecutor] = None
_pool_lock = threading.Lock()


def _get_pool() -> cf.ThreadPoolExecutor:
    global _pool
    if _pool is None:
        with _pool_lock:
            if _pool is None:
                _pool = cf.ThreadPoolExecutor(
                    max_workers=_CHUNKS, thread_name_prefix="ako-xfer"
                )
    return _pool


def device_put_parallel(arr: np.ndarray, chunks: int = _CHUNKS):
    """Upload a host array, chunked along axis 0 across threads;
    returns a single device array."""
    arr = np.ascontiguousarray(arr)
    if arr.nbytes < _MIN_PARALLEL_BYTES or arr.shape[0] < chunks:
        return jnp.asarray(arr)
    parts = np.array_split(arr, chunks, axis=0)
    futs = [_get_pool().submit(jax.device_put, p) for p in parts]
    return jnp.concatenate([f.result() for f in futs], axis=0)


def device_get_parallel(dev, chunks: int = _CHUNKS) -> np.ndarray:
    """Fetch a device array, chunked along axis 0 across threads."""
    shape = dev.shape
    nbytes = dev.dtype.itemsize * int(np.prod(shape))
    if nbytes < _MIN_PARALLEL_BYTES or (shape and shape[0] < chunks):
        return np.asarray(dev)
    bounds = np.array_split(np.arange(shape[0]), chunks)
    slices = [slice(int(b[0]), int(b[-1]) + 1) for b in bounds if len(b)]
    futs = [_get_pool().submit(lambda s=s: np.asarray(dev[s])) for s in slices]
    return np.concatenate([f.result() for f in futs], axis=0)
