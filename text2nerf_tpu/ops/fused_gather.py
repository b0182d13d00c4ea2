"""Corner-packed feature gathers — the TPU fast path for factor sampling.

Profiling on TPU v5e shows XLA row-gather cost is per-row (~5 ns/row) and
essentially independent of row width (64 B vs 256 B rows cost the same).
Bilinear plane sampling therefore pays 4x too much when fetching the four
corners as separate gathers, and the reference's 3 planes + 3 lines
(tensoRF.py:205-220) cost 18 gathered rows per sample.

The fix: pre-pack each plane into a table whose row (y, x) holds all four
bilinear corners ``[p(y,x), p(y,x+1), p(y+1,x), p(y+1,x+1)]`` (edge-clamped)
and each line into rows ``[l(y), l(y+1)]``.  One gather per plane and per
line → 6 rows per sample, a ~3-4x reduction in gather cost.  Packing is a
cheap shifted-concat (fully fused by XLA) done inside the jit region, so
gradients flow back to the canonical parameters and training sees the same
optimizer state layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_plane(plane):
    """(H, W, C) → (H*W, 4C) corner-packed table (edge-clamped)."""
    h, w, c = plane.shape
    p = jnp.pad(plane, ((0, 1), (0, 1), (0, 0)), mode="edge")
    packed = jnp.concatenate(
        [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], axis=-1
    )
    return packed.reshape(h * w, 4 * c)


def pack_line(line):
    """(L, C) → (L, 2C) pair-packed table (edge-clamped)."""
    p = jnp.pad(line, ((0, 1), (0, 0)), mode="edge")
    return jnp.concatenate([p[:-1], p[1:]], axis=-1)


def _coords(u, size: int):
    f = (u + 1.0) * 0.5 * (size - 1)
    i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, size - 1)
    t = jnp.clip(f - i0.astype(f.dtype), 0.0, 1.0)
    return i0, t


def sample_packed_plane(packed, h: int, w: int, c: int, x, y, dtype=None):
    """Bilinear sample from a corner-packed plane table.

    Args:
      packed: (H*W, 4C) from :func:`pack_plane`.
      x, y: (N,) normalized coords in [-1, 1] (x indexes W, y indexes H).
      dtype: optional compute dtype (bf16 on the eval fast path) for the
        gathered values and lerp — index math stays fp32, so bf16 never
        misindexes; it only rounds the interpolation (~1e-3 relative).

    Returns: (N, C) in ``dtype`` (or the table dtype).
    """
    x0, tx = _coords(x, w)
    y0, ty = _coords(y, h)
    if dtype is not None:
        packed = packed.astype(dtype)
        tx, ty = tx.astype(dtype), ty.astype(dtype)
    rows = jnp.take(packed, y0 * w + x0, axis=0)  # (N, 4C)
    f00 = rows[:, 0 * c : 1 * c]
    f01 = rows[:, 1 * c : 2 * c]
    f10 = rows[:, 2 * c : 3 * c]
    f11 = rows[:, 3 * c : 4 * c]
    tx = tx[:, None]
    ty = ty[:, None]
    top = f00 * (1.0 - tx) + f01 * tx
    bot = f10 * (1.0 - tx) + f11 * tx
    return top * (1.0 - ty) + bot * ty


def sample_packed_line(packed, l: int, c: int, y, dtype=None):
    """Linear sample from a pair-packed line table. Returns (N, C)."""
    y0, ty = _coords(y, l)
    if dtype is not None:
        packed = packed.astype(dtype)
        ty = ty.astype(dtype)
    rows = jnp.take(packed, y0, axis=0)  # (N, 2C)
    return rows[:, :c] * (1.0 - ty[:, None]) + rows[:, c:] * ty[:, None]


def _hat_weights(y, size: int, dtype=None):
    """(N, size) linear-interpolation weights as hat functions at the grid
    nodes: w[n, i] = max(0, 1 - |f_n - i|) with f clamped to [0, size-1].
    Nonzero only at the two bracketing nodes, where it equals the lerp
    weights up to ~1 ulp (1-(1-t) rounding).

    Index math stays fp32 (codebase convention, cf. sample_packed_plane):
    the absolute coordinate f spans [0, size-1], where bf16's ≥1.0 ulp
    past row 128 would destroy the fractional part — only the FINISHED
    weights (each in [0, 1]) are cast to ``dtype``."""
    f = jnp.clip((y + 1.0) * 0.5 * (size - 1), 0.0, size - 1)
    iota = jnp.arange(size, dtype=f.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(f[:, None] - iota[None, :]))
    return w.astype(dtype) if dtype is not None else w


def sample_line_hat(line, y, dtype=None):
    """Linear sample of a (L, C) line via a hat-weight MATMUL.

    TPU rationale: the line tables are tiny (≤ a few hundred rows), so the
    (N, L) hat-weight matrix times the table runs on the MXU in
    microseconds — replacing a per-row gather in the forward AND, far more
    importantly, the ~14.6 ns/row scatter-add in the backward (the
    transpose of a matmul is a matmul).  Scatters were the training
    step's dominant cost (PERF.md); plane tables stay gathered (a 90 000-
    wide one-hot is not materializable).

    Precision: HIGHEST (fp32-equivalent passes) so training numerics match
    the lerp path to ~1e-7; pass ``dtype=bf16`` on eval paths for speed.
    Returns (N, C).
    """
    w = _hat_weights(y, line.shape[0], dtype)
    v = line.astype(dtype) if dtype is not None else line
    return jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )


# ---------------------------------------------------------------------------
# Group-packed gathers: G ray-consecutive samples per gathered row.
#
# Samples along a ray drift at most ``step / unit`` grid cells per step
# (≈ step_ratio when n_to_reso equalizes the units), so a group of G
# consecutive samples spans at most (G-1)·drift + 1 cells per axis.  Packing
# each table row with a ``block``-wide neighborhood lets ONE gathered row
# serve all G samples' bilinear corners — and, critically, the gather's
# transpose becomes ONE scatter-add row per group instead of per sample.
# TPU scatter-add costs ~23 ns/row regardless of width (PERF.md), so G=2
# halves the dominant backward cost of the training step.  The per-sample
# values are recovered by contracting the block against combined
# interpolation weights (zero except at the bilinear corners) — within
# ~1 ulp of the per-sample path (contraction-order rounding only).
# ---------------------------------------------------------------------------


def pack_plane_block(plane, block: int = 4):
    """(H, W, C) → (H*W, block²·C): row (y, x) holds the edge-clamped
    neighborhood ``plane[y : y+block, x : x+block]`` flattened y-major."""
    h, w, c = plane.shape
    p = jnp.pad(plane, ((0, block - 1), (0, block - 1), (0, 0)), mode="edge")
    parts = [
        p[dy : dy + h, dx : dx + w]
        for dy in range(block)
        for dx in range(block)
    ]
    return jnp.concatenate(parts, axis=-1).reshape(h * w, block * block * c)


def pack_line_block(line, block: int = 4):
    """(L, C) → (L, block·C): row y holds ``line[y : y+block]`` clamped."""
    l, _ = line.shape
    p = jnp.pad(line, ((0, block - 1), (0, 0)), mode="edge")
    return jnp.concatenate([p[d : d + l] for d in range(block)], axis=-1)


def _axis_weights(i0, t, base, block: int):
    """Per-sample 1D interpolation weights spread over the packing block.

    i0, t: (N, G) integer cell + fractional offset from :func:`_coords`;
    base: (N,) block base cell (min over the group).  Returns (G, block, N)
    channel-major weights ``wb`` with ``wb[g, b] = (1-t)·[b == i0-base] +
    t·[b == i0-base+1]`` — i.e. the linear-interp weights of sample g
    placed at their block positions, zero elsewhere.  Contracting the
    gathered block row against these weights IS the per-sample lerp
    (the round-2 masked-select extraction lost on exactly this glue:
    4 corner selects × block² positions of compare+where traffic; the
    weighted contraction needs only block multiply-adds per axis).
    """
    d = (i0 - base[:, None]).T  # (G, N)
    t_t = t.T
    zero = jnp.zeros((), t_t.dtype)
    return jnp.stack(
        [
            jnp.where(d == b, 1.0 - t_t, zero)
            + jnp.where(d == b - 1, t_t, zero)
            for b in range(block)
        ],
        axis=1,
    )  # (G, block, N)


def sample_packed_plane_groups(
    packed, h: int, w: int, c: int, x, y, *, block: int = 4, dtype=None
):
    """Bilinear sample G ray-consecutive points per gathered block row.

    Args:
      packed: (H*W, block²·C) from :func:`pack_plane_block`.
      x, y: (N, G) normalized coords; each group's integer cells must span
        at most ``block - 2`` per axis (+1 for the bilinear upper corner;
        callers check via ``tensorf.grouping_block`` — out-of-block spans
        would silently read 0, so the guard must be conservative).

    Returns: list of G (C, N) channel-major arrays.  Channel-major
    matters: N is the minor (lane) dimension and is 128-aligned at real
    batch sizes, so the big temporaries pad to ~1x — a (N, C=16) layout
    pads 8x in TPU (8, 128) tiles and OOMs the production train step.

    Implementation: weighted contraction of the block row against the
    outer product of the per-axis weights (``_axis_weights``): the sample
    value is Σ_{py,px} wy[py]·wx[px]·row[(py·block+px)·C:+C].  Equal to
    the per-sample bilinear lerp up to fp reassociation (the weight
    product is formed before multiplying the corner value).
    """
    n, g = x.shape
    x0, tx = _coords(x, w)
    y0, ty = _coords(y, h)
    bx = jnp.min(x0, axis=1)
    by = jnp.min(y0, axis=1)
    rows = jnp.take(packed, by * w + bx, axis=0)  # (N, block²·C)
    if dtype is not None:
        rows = rows.astype(dtype)
        tx, ty = tx.astype(dtype), ty.astype(dtype)
    rows_t = rows.T  # (block²·C, N): lane-aligned minor dim
    wx = _axis_weights(x0, tx, bx, block)  # (G, block, N)
    wy = _axis_weights(y0, ty, by, block)
    out = []
    for gi in range(g):
        pf = None
        for py in range(block):
            # contract the x axis first within row py, then weight by wy
            acc = None
            for px in range(block):
                p = py * block + px
                term = rows_t[p * c : (p + 1) * c] * wx[gi, px][None, :]
                acc = term if acc is None else acc + term
            term = acc * wy[gi, py][None, :]
            pf = term if pf is None else pf + term
        out.append(pf)
    return out


def sample_packed_line_groups(
    packed, l: int, c: int, y, *, block: int = 4, dtype=None
):
    """Linear-sample G consecutive points per gathered row. y: (N, G);
    returns a list of G (C, N) arrays (see sample_packed_plane_groups)."""
    n, g = y.shape
    y0, ty = _coords(y, l)
    base = jnp.min(y0, axis=1)
    rows = jnp.take(packed, base, axis=0)  # (N, block·C)
    if dtype is not None:
        rows = rows.astype(dtype)
        ty = ty.astype(dtype)
    rows_t = rows.T
    wl = _axis_weights(y0, ty, base, block)  # (G, block, N)
    out = []
    for gi in range(g):
        f = None
        for b in range(block):
            term = rows_t[b * c : (b + 1) * c] * wl[gi, b][None, :]
            f = term if f is None else f + term
        out.append(f)
    return out
