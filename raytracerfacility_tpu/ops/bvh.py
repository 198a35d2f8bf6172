"""LBVH build in pure XLA: Morton sort + Karras radix tree + skip links.

TPU replacement for OptiX acceleration-structure builds
(ref RayTracer.cu:1251-1598 BuildGAS / :1618-1715 BuildIAS). The reference
leans on driver-side BVH construction and RT-core traversal; here the whole
build is jit-compiled array code:

1. triangle centroids -> 30-bit Morton codes over the scene AABB
2. stable sort (ties broken by primitive index, so duplicate codes --
   e.g. heavily-instanced canopies -- still give a ~log-depth tree)
3. Karras 2012 binary radix tree: every internal node's (range, split) is
   computed independently with vectorized binary searches -- no sequential
   build loop
4. bottom-up AABB fit by fixed-point iteration (tree depth is bounded by
   the 62-bit key length, so 64 passes converge)
5. **threaded (stackless) layout**: nodes are emitted in DFS preorder with
   a precomputed skip link. Preorder for a radix tree over sorted leaves is
   simply the lexicographic order by (range start asc, range size desc),
   and skip(n) = pos(n) + 2*size(n) - 1 -- both O(1) per node. Traversal
   then needs no per-ray stack: hit -> node+1, miss/leaf -> skip[node].
   That is the property that makes traversal a dense, divergence-tolerant
   while-loop on the VPU (ops/traverse.py).

Leaves are collapsed to ``leaf_size`` triangles by cutting the tree at the
highest node covering <= leaf_size sorted primitives; the cut node's skip
link jumps over its (never-visited) descendants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

MAX_DEPTH_PASSES = 64  # >= max radix-tree depth with 62-bit tie-broken keys

# Integers smuggled through float32 rows are biased with bit 30 so their bit
# patterns are *normal* floats: TPU hardware flushes denormals to zero, which
# silently zeroed raw small-int patterns (skip links!). Bias keeps the
# exponent field non-zero; decode masks bits 30-31 off.
INT_BIAS = 0x40000000


def encode_int_column(i: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(
        (i.astype(jnp.int32) | INT_BIAS), jnp.float32
    )


def decode_int_column(f: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(f, jnp.int32) & (INT_BIAS - 1)


@struct.dataclass
class BVH:
    """Threaded BVH in DFS preorder, packed for single-gather traversal.

    ``nodes`` packs one preorder node per row so a traversal step is ONE
    row gather: cols 0-2 = aabb min, 3-5 = aabb max, col 6 = skip link
    (int32 bitcast), col 7 = leaf meta (int32 bitcast:
    ``count << 27 | start``; 0 for internal nodes — count > 0 IS the leaf
    flag). ``tris`` packs Morton-ordered triangles: cols 0-8 = v0/e1/e2,
    col 9 = original primitive id (int32 bitcast), cols 10-11 pad.

    Row-packing matters: the traversal loop body is unrolled so XLA fuses
    many steps into one kernel with the tables VMEM-resident; packed rows
    keep that at one gather per step instead of six.
    """

    nodes: jax.Array  # (M, 8) f32 (+bitcast int32 meta columns)
    tris: jax.Array  # (N, 12) f32 (+bitcast prim id column)
    tri_prim: jax.Array  # (N,) int32 original primitive index
    leaf_size: int = struct.field(pytree_node=False, default=4)
    has_curves: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_nodes(self) -> int:
        return self.nodes.shape[0]

    # convenience views (tests / debugging)
    @property
    def aabb_min(self) -> jax.Array:
        return self.nodes[:, 0:3]

    @property
    def aabb_max(self) -> jax.Array:
        return self.nodes[:, 3:6]

    @property
    def skip(self) -> jax.Array:
        return decode_int_column(self.nodes[:, 6])

    @property
    def leaf_meta(self) -> jax.Array:
        return decode_int_column(self.nodes[:, 7])


def pack_nodes(
    aabb_min: jax.Array,
    aabb_max: jax.Array,
    skip: jax.Array,
    leaf_start: jax.Array,
    leaf_count: jax.Array,
) -> jax.Array:
    meta = jnp.where(leaf_count > 0, (leaf_count << 27) | leaf_start, 0)
    return jnp.concatenate(
        [
            aabb_min,
            aabb_max,
            encode_int_column(skip)[:, None],
            encode_int_column(meta)[:, None],
        ],
        axis=1,
    )


def pack_tris(
    v0: jax.Array,
    e1: jax.Array,
    e2: jax.Array,
    prim: jax.Array,
    instance: jax.Array | None = None,
    kind: jax.Array | None = None,
) -> jax.Array:
    """col 10 carries the instance slot (for the BSSRDF same-instance probe,
    ref BSSDF.cuh:18-24); col 11 carries the primitive kind (0 = triangle,
    1 = sphere-swept curve segment, ops/curve.py encoding)."""
    n = v0.shape[0]
    if instance is None:
        instance = jnp.zeros(n, jnp.int32)
    if kind is None:
        kind = jnp.zeros(n, jnp.int32)
    return jnp.concatenate(
        [
            v0,
            e1,
            e2,
            encode_int_column(prim)[:, None],
            encode_int_column(instance)[:, None],
            encode_int_column(kind)[:, None],
        ],
        axis=1,
    )


def _expand_bits(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = v & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def morton_codes(centroids: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """30-bit Morton codes of points normalized to the [lo, hi] box."""
    extent = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((centroids - lo) / extent, 0.0, 0.99999994)
    xyz = (q * 1024.0).astype(jnp.uint32)
    return (
        (_expand_bits(xyz[..., 0]) << 2)
        | (_expand_bits(xyz[..., 1]) << 1)
        | _expand_bits(xyz[..., 2])
    )


def _clz32(x: jax.Array) -> jax.Array:
    """Count leading zeros of uint32 (vectorized binary reduction)."""
    x = x.astype(jnp.uint32)
    n = jnp.full(x.shape, 32, jnp.int32)
    for s in (16, 8, 4, 2, 1):
        y = x >> jnp.uint32(s)
        gt = y > 0
        n = jnp.where(gt, n - s, n)
        x = jnp.where(gt, y, x)
    return n - x.astype(jnp.int32)  # x ends as 0 or 1


def _delta(codes: jax.Array, i: jax.Array, j: jax.Array, n: int) -> jax.Array:
    """Length of the common prefix of the 62-bit keys (code<<32 | index) at
    i and j; -1 when j is out of range (Karras 2012 convention)."""
    valid = (j >= 0) & (j < n)
    j_safe = jnp.clip(j, 0, n - 1)
    ci = codes[i]
    cj = codes[j_safe]
    same = ci == cj
    prefix_code = _clz32(ci ^ cj)
    prefix_idx = 32 + _clz32(i.astype(jnp.uint32) ^ j_safe.astype(jnp.uint32))
    prefix = jnp.where(same, prefix_idx, prefix_code)
    return jnp.where(valid, prefix, -1)


def _prim_aabbs(v0, e1, e2, kind):
    """Per-primitive AABBs: triangle hull or sphere-swept-segment hull."""
    p1 = v0 + e1
    p2 = v0 + e2
    tri_min = jnp.minimum(jnp.minimum(v0, p1), p2)
    tri_max = jnp.maximum(jnp.maximum(v0, p1), p2)
    if kind is None:
        return tri_min, tri_max
    r0 = e2[:, 0:1]
    r1 = e2[:, 0:1] + e2[:, 1:2]
    cur_min = jnp.minimum(v0 - r0, p1 - r1)
    cur_max = jnp.maximum(v0 + r0, p1 + r1)
    is_curve = (kind == 1)[:, None]
    return (
        jnp.where(is_curve, cur_min, tri_min),
        jnp.where(is_curve, cur_max, tri_max),
    )


def build_bvh(
    v0: jax.Array,
    e1: jax.Array,
    e2: jax.Array,
    leaf_size: int = 4,
    instance: jax.Array | None = None,
    kind: jax.Array | None = None,
    has_curves: bool | None = None,
) -> BVH:
    """Build the threaded LBVH for a primitive soup.

    Fully jittable when ``has_curves`` is passed explicitly (it is a static
    layout flag; deriving it from ``kind`` requires a concrete value)."""
    n = v0.shape[0]
    if has_curves is None:
        has_curves = kind is not None and bool(jnp.any(kind == 1))
    if n == 1:
        # degenerate single-leaf tree
        bmin, bmax = _prim_aabbs(v0, e1, e2, kind)
        prim = jnp.array([0], jnp.int32)
        return BVH(
            nodes=pack_nodes(
                bmin, bmax, jnp.array([1], jnp.int32),
                jnp.array([0], jnp.int32), jnp.array([1], jnp.int32),
            ),
            tris=pack_tris(v0, e1, e2, prim, instance, kind),
            tri_prim=prim,
            leaf_size=leaf_size,
            has_curves=has_curves,
        )

    tri_min, tri_max = _prim_aabbs(v0, e1, e2, kind)  # (N, 3)
    centroid = (tri_min + tri_max) * 0.5
    scene_lo = jnp.min(tri_min, axis=0)
    scene_hi = jnp.max(tri_max, axis=0)

    codes = morton_codes(centroid, scene_lo, scene_hi)
    order = jnp.argsort(codes, stable=True).astype(jnp.int32)
    codes = codes[order]

    # ---- Karras topology: per internal node i in [0, n-2]
    i = jnp.arange(n - 1, dtype=jnp.int32)
    d_right = _delta(codes, i, i + 1, n)
    d_left = _delta(codes, i, i - 1, n)
    d = jnp.where(d_right > d_left, 1, -1).astype(jnp.int32)
    delta_min = _delta(codes, i, i - d, n)

    # upper bound for the range length (doubling search, vectorized)
    l_max = jnp.full(n - 1, 2, jnp.int32)
    for _ in range(32):
        probe = _delta(codes, i, i + l_max * d, n) > delta_min
        grew = probe & (l_max < 2 * n)
        l_max = jnp.where(grew, l_max * 2, l_max)
    # binary search the exact length
    l = jnp.zeros(n - 1, jnp.int32)
    t = l_max // 2
    for _ in range(32):
        cond = (t > 0) & (_delta(codes, i, i + (l + t) * d, n) > delta_min)
        l = jnp.where(cond, l + t, l)
        t = t // 2
    j = i + l * d
    first = jnp.minimum(i, j)
    last = jnp.maximum(i, j)

    # split search: find the highest differing bit position inside [first,last]
    delta_node = _delta(codes, i, j, n)
    s = jnp.zeros(n - 1, jnp.int32)
    t = (l + 1) // 2  # ceil(l / 2)
    for _ in range(32):
        cond = (t > 0) & (
            _delta(codes, i, i + (s + t) * d, n) > delta_node
        )
        s = jnp.where(cond, s + t, s)
        t = jnp.where(t > 1, (t + 1) // 2, 0)
    split = i + s * d + jnp.minimum(d, 0)

    # children: node ids — internal nodes are 0..n-2, leaves are n-1..2n-2
    left_is_leaf = split == first
    right_is_leaf = (split + 1) == last
    left = jnp.where(left_is_leaf, split + (n - 1), split)
    right = jnp.where(right_is_leaf, split + 1 + (n - 1), split + 1)

    # ---- node ranges (leaf index ranges, all 2n-1 nodes)
    leaf_ids = jnp.arange(n, dtype=jnp.int32)
    range_first = jnp.concatenate([first, leaf_ids])
    range_last = jnp.concatenate([last, leaf_ids])
    size = range_last - range_first + 1  # (2n-1,)

    # ---- bottom-up AABB fit (fixed-point; depth <= MAX_DEPTH_PASSES)
    leaf_min = tri_min[order]
    leaf_max = tri_max[order]
    node_min = jnp.concatenate([jnp.full((n - 1, 3), jnp.inf), leaf_min])
    node_max = jnp.concatenate([jnp.full((n - 1, 3), -jnp.inf), leaf_max])

    def fit(_, carry):
        nmin, nmax = carry
        new_min = jnp.minimum(nmin[left], nmin[right])
        new_max = jnp.maximum(nmax[left], nmax[right])
        nmin = nmin.at[: n - 1].set(new_min)
        nmax = nmax.at[: n - 1].set(new_max)
        return nmin, nmax

    node_min, node_max = jax.lax.fori_loop(
        0, MAX_DEPTH_PASSES, fit, (node_min, node_max)
    )

    # ---- leaf cut at <= leaf_size primitives
    parent = jnp.zeros(2 * n - 1, jnp.int32)
    parent = parent.at[left].set(jnp.arange(n - 1, dtype=jnp.int32))
    parent = parent.at[right].set(jnp.arange(n - 1, dtype=jnp.int32))
    parent_size = size[parent]
    is_root = jnp.arange(2 * n - 1) == 0  # root is always internal node 0
    is_cut_leaf = (size <= leaf_size) & ((parent_size > leaf_size) | is_root)

    # ---- preorder layout: sort by (range start asc, size desc)
    order_by_size = jnp.argsort(-size, stable=True)
    order_by_start = jnp.argsort(range_first[order_by_size], stable=True)
    perm = order_by_size[order_by_start]  # perm[p] = node id at preorder pos p

    pre_min = node_min[perm]
    pre_max = node_max[perm]
    pre_size = size[perm]
    pre_first = range_first[perm]
    skip = (
        jnp.arange(2 * n - 1, dtype=jnp.int32) + 2 * pre_size - 1
    )
    pre_leaf = is_cut_leaf[perm]

    return BVH(
        nodes=pack_nodes(
            pre_min,
            pre_max,
            skip.astype(jnp.int32),
            pre_first.astype(jnp.int32),
            jnp.where(pre_leaf, pre_size, 0).astype(jnp.int32),
        ),
        tris=pack_tris(
            v0[order], e1[order], e2[order], order,
            None if instance is None else instance[order],
            None if kind is None else kind[order],
        ),
        tri_prim=order,
        leaf_size=leaf_size,
        has_curves=has_curves,
    )
