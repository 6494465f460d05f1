"""Windowed row gather: cache-resident replacement for large-table
XLA gathers.

XLA-TPU row gathers are fast while the SOURCE table is cache-resident
and collapse beyond ~300k rows (measured: the solver's ncc neighbor
gather 5.9 -> 65 ms and the S-direction gathers ~8 -> 54 ms going from
164k to 656k padded vertices, BASELINE.md).  Because both the vertex
table and the index tables are Hilbert-ordered (TriangleMesh.
spatial_sort), consecutive index rows target a narrow band of the
table: this op scans over fixed-size row blocks, dynamic-slices the
up-to-``n_bands`` windows a host-verified schedule assigned to each
block (ops.meshdata.gather_schedule), and gathers block rows from
those small in-cache windows.  Rows the schedule could not cover (a
bounded, typically <1% tail) are fixed up exactly afterwards with one
small gather+scatter.

Counterpart of the reference's directly-indexed C loops over the
vertex array (/root/reference/ch_shrinkwrap/conj_grad_utils.c:123-370),
which never face this problem at reference scales.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def windowed_gather(src, idx_flat, starts, uncov, window=2048,
                    block_size=16384):
    """``src[idx_flat]`` for a (Vp, C) table via banded block windows.

    Parameters
    ----------
    src : (Vp, C) array
    idx_flat : (R,) int32, in [0, Vp); don't-care rows may hold any
        in-range value
    starts : (nb, n_bands) i32 window starts from ``gather_schedule``
        (nb = ceil(R / block_size))
    uncov : (U,) i32 flat row ids needing the exact fixup, -1 padded
    """
    R = idx_flat.shape[0]
    C = src.shape[1]
    nb = -(-R // block_size)
    Rp = nb * block_size
    idx_p = idx_flat
    if Rp != R:
        idx_p = jnp.concatenate(
            [idx_flat, jnp.zeros(Rp - R, idx_flat.dtype)])
    idx_b = idx_p.reshape(nb, block_size)
    n_bands = starts.shape[1]

    def body(_, inp):
        ib, st = inp
        out = jnp.zeros((block_size, C), src.dtype)
        for a in range(n_bands):
            w0 = st[a]
            win = lax.dynamic_slice(src, (w0, 0), (window, C))
            loc = ib - w0
            inw = (loc >= 0) & (loc < window)
            g = win[jnp.clip(loc, 0, window - 1)]
            out = jnp.where(inw[:, None], g, out)
        return None, out

    _, res = lax.scan(body, None, (idx_b, starts))
    res = res.reshape(Rp, C)[:R]

    # exact fixup of the uncovered tail: route -1 pads to a dummy row
    valid = uncov >= 0
    tgt = jnp.where(valid, uncov, R)
    uval = src[idx_flat[jnp.clip(uncov, 0, R - 1)]]
    res = jnp.concatenate([res, jnp.zeros((1, C), res.dtype)])
    res = res.at[tgt].set(uval, mode='drop')
    return res[:R]
