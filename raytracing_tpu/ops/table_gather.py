"""Differentiable per-ray table lookup — the TPU-native gather/scatter pair.

``table_lookup(table (L, F), ids (B,)) -> tuple of F (B,) arrays`` with:

* **Forward**: a Pallas kernel that replicates each field's column across
  the 8 sublanes and fetches all 1024 rays of an (8, 128) tile with one
  ``take_along_axis`` per 128-lane table chunk — the megakernel's
  ``resolve()`` trick (ops/megakernel_block.py) as a standalone op.
  XLA's row gather lowers element-serially on TPU (~1.4 ms for 131k rows
  from a 500-row table, tools/fbprof.py); this kernel moves the same
  data in ~µs. Values are exact f32 (no one-hot matmul rounding).
  The output is field-major 3-D ``(F, n_rows, TILE)`` so the per-field
  unpack is a leading-axis slice — a (B, F) row-major output needed a
  minor-axis transpose that cost more than the gather itself
  (tools/fbprof2.py).
* **Backward**: the cotangent of a gather is a scatter-add — XLA's
  slowest TPU op (~26M updates/s). Instead the custom VJP computes
  ``table_bar = onehotᵀ(ids) @ cot`` as ONE (L, B)×(B, F) matmul on the
  MXU at HIGHEST precision: 0/1 one-hot rows make each output element an
  f32 sum of the selected cotangents — the same reduction a scatter-add
  performs, at matrix-unit speed.

This is what makes decision-replay differentiation (diff/replay_fast.py)
run at wavefront speed: one lookup per bounce replaces ~25 per-bounce
XLA gathers (measured 441 ms → 84 ms forward per 131k×20 chunk) and the
backward never scatters.

On CPU (tests / interpret) the forward uses plain ``jnp.take`` —
bit-identical values, no Mosaic dependency.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
GROUPS = 8


def _pallas_gather(table_rep: jnp.ndarray, ids2: jnp.ndarray, F: int,
                   n_chunks: int) -> jnp.ndarray:
    """(GROUPS·F, L) replicated table, (rows, TILE) i32 ids →
    (F, rows, TILE) gathered values (field-major: no relayout to slice)."""
    n_rows = ids2.shape[0]
    n_sub = 1
    for cand in (32, 16, 8, 4, 2):
        if (n_rows // GROUPS) % cand == 0:
            n_sub = cand
            break
    S = GROUPS * n_sub
    grid = (n_rows // S,)

    def kernel(tab_ref, idx_ref, out_ref):
        for s in range(n_sub):
            sl = slice(s * GROUPS, (s + 1) * GROUPS)
            idx = idx_ref[sl, :]
            for f in range(F):
                rows = None
                for c in range(n_chunks):
                    local = jnp.clip(idx - c * TILE, 0, TILE - 1)
                    g = jnp.take_along_axis(
                        tab_ref[f * GROUPS:(f + 1) * GROUPS,
                                c * TILE:(c + 1) * TILE],
                        local, axis=1)
                    if rows is None:
                        rows = g
                    else:
                        use = (idx >= c * TILE) & (idx < (c + 1) * TILE)
                        rows = jnp.where(use, g, rows)
                out_ref[f, sl, :] = rows

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(table_rep.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, S, TILE), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, n_rows, TILE), jnp.float32),
    )(table_rep, ids2)


def _lookup_fwd_impl(table: jnp.ndarray, ids: jnp.ndarray):
    L, F = table.shape
    B = ids.shape[0]
    idc = jnp.clip(ids, 0, L - 1)
    if jax.default_backend() == "cpu":
        vals = jnp.take(table, idc, axis=0)
        return tuple(vals[:, f] for f in range(F))
    assert L % TILE == 0, f"table rows must pad to a multiple of {TILE}"
    assert B % (GROUPS * TILE) == 0, \
        f"batch must be a multiple of {GROUPS * TILE}"
    # field-replicated layout: rows [f·8, f·8+8) all hold column f
    rep = jnp.repeat(table.T, GROUPS, axis=0)  # (F·8, L)
    out = _pallas_gather(rep, idc.reshape(B // TILE, TILE), F, L // TILE)
    return tuple(out[f].reshape(B) for f in range(F))


@jax.custom_vjp
def table_lookup(table: jnp.ndarray, ids: jnp.ndarray):
    """Rows of ``table`` (L, F) at ``ids`` (B,) i32 (clipped into range;
    callers mask invalid lanes downstream) as a tuple of F (B,) columns.
    Differentiable w.r.t. table."""
    return _lookup_fwd_impl(table, ids)


def _fwd(table, ids):
    return _lookup_fwd_impl(table, ids), (ids, table.shape[0])


def _bwd(res, cot):
    ids, L = res
    idc = jnp.clip(ids, 0, L - 1)
    cot_mat = jnp.stack(cot, axis=-1)  # (B, F)
    # one-hot rows are exact 0/1; HIGHEST precision accumulates the
    # selected cotangents in f32 on the MXU — the scatter-add's sum,
    # without the scatter
    oh = (idc[:, None] == jnp.arange(L, dtype=ids.dtype)[None, :])
    table_bar = jax.lax.dot_general(
        oh.astype(cot_mat.dtype), cot_mat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    return table_bar, None


table_lookup.defvjp(_fwd, _bwd)
