"""Scene bake: store -> CompiledScene device buffers.

This is the TPU analog of the reference's GAS/IAS/SBT build chain
(ref RayTracer.cu:1251-1715 BuildGAS/BuildIAS, :1835-2055 BuildSBT):

* vertex-prep CUDA kernels -> batched matmul bakes:
  - plain meshes: instance transform applied to positions (w=1) and
    normals/tangents (w=0, plain matrix like the reference,
    RayDataDefinations.hpp:375)
  - skinned meshes: 8-bone LBS (ref CopySkinnedVerticesKernel,
    RayTracer.cu:1194-1249)
  - instanced meshes: per-instance matrix bake + per-instance color
    override (ref CopyVerticesInstancedKernel, RayTracer.cu:1148-1175)
  - strands: tube tessellation (OptiX builtin curve IS has no TPU
    equivalent; analytic intersection is a later milestone —
    SURVEY.md section 7.3 item 4)
* SBT records -> flat material table + per-triangle instance slots.

Triangle count is padded to a multiple (degenerate, never-hit triangles) so
small scene edits reuse the jit cache instead of recompiling.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from raytracerfacility_tpu.enums import MaterialType, RendererType
from raytracerfacility_tpu.scene.compiled import (
    CompiledScene,
    GeometryBuffers,
    MaterialTable,
    handle_words,
)
from raytracerfacility_tpu.scene.mesh import Mesh
from raytracerfacility_tpu.ops.texture import build_texture_stack


def _refit_update(cur: tuple, new: tuple, start):
    """In-place row update of the geometry buffers for one refit group:
    one contiguous lax.dynamic_update_slice per field, all fields in ONE
    jitted program (eager per-field ops would pay the tunnel's per-op
    dispatch + remote-compile-per-shape costs). One compile per distinct
    group row count (scenes have few)."""
    import jax

    return tuple(
        jax.lax.dynamic_update_slice(
            g, n, (start,) + (0,) * (g.ndim - 1))
        for g, n in zip(cur, new)
    )


def _refit_update_jit(cur, new, start):
    import jax

    global _REFIT_JIT
    if _REFIT_JIT is None:
        _REFIT_JIT = jax.jit(_refit_update)
    return _REFIT_JIT(cur, new, start)


_REFIT_JIT = None


def _transform_points(matrix: np.ndarray, pts: np.ndarray) -> np.ndarray:
    return pts @ matrix[:3, :3].T + matrix[:3, 3]


def _transform_dirs(matrix: np.ndarray, dirs: np.ndarray) -> np.ndarray:
    return dirs @ matrix[:3, :3].T


def skin_vertices(
    positions: np.ndarray,
    normals: np.ndarray,
    tangents: np.ndarray,
    bone_ids: np.ndarray,
    bone_weights: np.ndarray,
    bone_matrices: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """8-bone linear blend skinning (ref RayTracer.cu:1194-1249).

    ``bone_ids`` entries < 0 are unused slots (their weight must be 0, the
    reference guards with id checks; we clamp and rely on zero weights).
    """
    from raytracerfacility_tpu import native

    out = native.skin_vertices(
        positions, normals, tangents, bone_ids, bone_weights, bone_matrices
    )
    if out is not None:
        return out
    ids = np.maximum(bone_ids, 0)
    w = bone_weights[..., None, None]  # (N, 8, 1, 1)
    mats = bone_matrices[ids]  # (N, 8, 4, 4)
    blended = np.sum(mats * w, axis=1)  # (N, 4, 4)
    pos = np.einsum("nij,nj->ni", blended[:, :3, :3], positions) + blended[:, :3, 3]
    nrm = np.einsum("nij,nj->ni", blended[:, :3, :3], normals)
    tan = np.einsum("nij,nj->ni", blended[:, :3, :3], tangents)
    return pos.astype(np.float32), nrm.astype(np.float32), tan.astype(np.float32)


def tessellate_strands(
    strand_points: np.ndarray,  # (S, >=4): x, y, z, thickness[, r, g, b, a]
    segments: np.ndarray,  # (C,) start index per curve segment
    radial: int = 6,
    mode: str = "linear",
) -> Mesh:
    """Tessellate swept-curve segments into a triangle tube.

    Phase-1 stand-in for OptiX's builtin ROUND_LINEAR/QUADRATIC/CUBIC
    intersectors (ref RayTracer.cu:1773-1787): each segment's control points
    are evaluated to a polyline with per-point radius, then swept with a
    ``radial``-gon. Shading normals come from the tube surface, which matches
    the reference's offset-surface normal (CurveSplineDefinations.hpp:314-387)
    in the linear case.
    """
    pts = np.asarray(strand_points, np.float32)
    segments = np.asarray(segments, np.int32)
    n_ctrl = {"linear": 2, "quadratic": 3, "cubic": 4}[mode]
    n_eval = {"linear": 2, "quadratic": 4, "cubic": 6}[mode]

    positions, normals, colors, tris, uvs = [], [], [], [], []
    for seg_start in segments:
        ctrl = pts[seg_start : seg_start + n_ctrl]
        if ctrl.shape[0] < n_ctrl:
            continue
        u = np.linspace(0.0, 1.0, n_eval, dtype=np.float32)
        if mode == "linear":
            center = (1 - u)[:, None] * ctrl[0, :3] + u[:, None] * ctrl[1, :3]
            radius = (1 - u) * ctrl[0, 3] + u * ctrl[1, 3]
        elif mode == "quadratic":
            # uniform quadratic B-spline basis
            b = np.stack(
                [(1 - u) ** 2 / 2, 0.5 + u * (1 - u), u**2 / 2], axis=-1
            )
            center = b @ ctrl[:, :3]
            radius = b @ ctrl[:, 3]
        else:  # cubic uniform B-spline
            b = np.stack(
                [
                    (1 - u) ** 3 / 6,
                    (3 * u**3 - 6 * u**2 + 4) / 6,
                    (-3 * u**3 + 3 * u**2 + 3 * u + 1) / 6,
                    u**3 / 6,
                ],
                axis=-1,
            )
            center = b @ ctrl[:, :3]
            radius = b @ ctrl[:, 3]
        col = ctrl[0, 4:8] if ctrl.shape[1] >= 8 else np.ones(4, np.float32)

        # sweep
        tangent = np.gradient(center, axis=0)
        tangent /= np.maximum(np.linalg.norm(tangent, axis=-1, keepdims=True), 1e-8)
        helper = np.where(
            np.abs(tangent[:, 0:1]) > 0.9,
            np.array([[0, 0, 1]], np.float32),
            np.array([[1, 0, 0]], np.float32),
        )
        side = np.cross(tangent, helper)
        side /= np.maximum(np.linalg.norm(side, axis=-1, keepdims=True), 1e-8)
        up = np.cross(tangent, side)
        base = len(positions)
        ring_angles = np.linspace(0, 2 * np.pi, radial, endpoint=False)
        for i in range(n_eval):
            for a in ring_angles:
                offset = side[i] * np.cos(a) + up[i] * np.sin(a)
                positions.append(center[i] + offset * radius[i])
                normals.append(offset)
                colors.append(col)
                uvs.append([u[i], a / (2 * np.pi)])
        for i in range(n_eval - 1):
            for k in range(radial):
                k2 = (k + 1) % radial
                a = base + i * radial + k
                b_ = base + i * radial + k2
                c = base + (i + 1) * radial + k
                d = base + (i + 1) * radial + k2
                tris.append([a, c, b_])
                tris.append([b_, c, d])
    if not positions:
        return Mesh(np.zeros((3, 3), np.float32), np.array([[0, 1, 2]], np.int32))
    return Mesh(
        np.array(positions, np.float32),
        np.array(tris, np.int32),
        normals=np.array(normals, np.float32),
        colors=np.array(colors, np.float32),
        tex_coords=np.array(uvs, np.float32),
    )


def _bake_analytic_curves(geom, transform: np.ndarray, mode: str):
    """Bake strands into sphere-swept linear prim rows (kind=1; encoding in
    ops/curve.py). Radii scale by the transform's uniform-scale factor."""
    from raytracerfacility_tpu.ops.curve import subdivide_strand_segments

    sub = subdivide_strand_segments(
        geom.strand_points, geom.curve_segments, mode,
        tex_coords=geom.strand_tex_coords)
    if sub is None:
        return None
    p0 = _transform_points(transform, sub["p0"])
    p1 = _transform_points(transform, sub["p1"])
    scale = float(np.linalg.norm(transform[:3, 0]))
    r0 = sub["r0"] * scale
    r1 = sub["r1"] * scale
    n = p0.shape[0]
    zeros3 = np.zeros((n, 3, 3), np.float32)
    tex = np.zeros((n, 3, 2), np.float32)
    tex[:, 0, 0] = sub["tex0"]
    tex[:, 1, 0] = sub["tex1"]
    color = np.zeros((n, 3, 4), np.float32)
    color[:, 0] = sub["color0"]
    color[:, 1] = sub["color1"]
    e2 = np.zeros((n, 3), np.float32)
    e2[:, 0] = r0
    e2[:, 1] = r1 - r0
    # parent-spline payload for the exact-surface Newton refinement
    # (ops/curve.py::refine_swept_hit): world control points ride the
    # otherwise-unused normal slots, radii/order/param-range ride `data`
    ctrl_w = _transform_points(
        transform, sub["ctrl"].reshape(-1, 3)).reshape(n, 4, 3)
    ctrl_r = sub["ctrl_r"] * scale
    normal = ctrl_w[:, 0:3, :].astype(np.float32)  # rows c0, c1, c2
    data = np.zeros((n, 3, 4), np.float32)
    data[:, 0, :3] = ctrl_w[:, 3, :]  # c3
    data[:, 0, 3] = ctrl_r[:, 3]  # r3
    data[:, 1, :3] = ctrl_r[:, :3]  # r0, r1, r2
    data[:, 1, 3] = sub["order"]
    data[:, 2, 0] = sub["u0"]
    data[:, 2, 1] = sub["u1"]
    return {
        "v0": p0.astype(np.float32),
        "e1": (p1 - p0).astype(np.float32),
        "e2": e2,
        "normal": normal,
        "tangent": zeros3,
        "tex_coord": tex,
        "color": color,
        "data": data,
        "kind": np.ones(n, np.int32),
    }


def _geometry_object_bake(geom):
    """Corner-gather one geometry in OBJECT space (no transform).

    This is the host-side cost of a bake; it happens once per geometry
    VERSION and is shared by every instance of that geometry (the
    reference shares one compacted BLAS across instances the same way,
    ref RayTracer.cu:1618-1715). Returns a dict of numpy corner arrays,
    or None. Curves and skinned meshes return None here (their bake
    depends on transform scale / bone state and keeps the per-part
    path)."""
    if geom.renderer_type in (RendererType.CURVE, RendererType.SKINNED):
        return None
    mesh = geom.mesh
    if mesh is None or mesh.num_triangles == 0:
        return None
    from raytracerfacility_tpu import native

    ident = np.eye(4, dtype=np.float32)
    packed = native.pack_corners(
        {
            "positions": mesh.positions,
            "normals": mesh.normals,
            "tangents": mesh.tangents,
            "colors": mesh.colors,
            "tex_coords": mesh.tex_coords,
            "data": mesh.data,
        },
        mesh.triangles,
        ident,
    )
    if packed is None:
        tris = mesh.triangles
        c0, c1, c2 = tris[:, 0], tris[:, 1], tris[:, 2]
        p = mesh.positions
        v0 = p[c0]
        packed = {
            "v0": v0,
            "e1": p[c1] - v0,
            "e2": p[c2] - v0,
            "normal": np.stack([mesh.normals[c0], mesh.normals[c1],
                                mesh.normals[c2]], axis=1),
            "tangent": np.stack([mesh.tangents[c0], mesh.tangents[c1],
                                 mesh.tangents[c2]], axis=1),
            "tex_coord": np.stack([mesh.tex_coords[c0], mesh.tex_coords[c1],
                                   mesh.tex_coords[c2]], axis=1),
            "color": np.stack([mesh.colors[c0], mesh.colors[c1],
                               mesh.colors[c2]], axis=1),
            "data": np.stack([mesh.data[c0], mesh.data[c1],
                              mesh.data[c2]], axis=1),
        }
    packed["kind"] = np.zeros(mesh.num_triangles, np.int32)
    return packed


def _transform_part_batched(obj: dict, matrices: np.ndarray,
                           instance_colors=None) -> dict:
    """Apply one or many instance transforms to an object-space bake as
    ONE batched einsum (the vertex-prep-kernel equivalent, ref
    CopyVertices*Kernel RayTracer.cu:1148-1192): positions
    rotate+translate, edge vectors and normal/tangent corners rotate
    (plain matrix like the reference, RayDataDefinations.hpp:375).
    ``matrices`` is (4,4) or (I,4,4); batching replaces the reference's
    per-instance vertex copy loop, so bake cost is one vectorized pass
    regardless of instance count.

    Runs in HOST numpy deliberately: the arithmetic is tiny (MFLOPs even
    at 1000 instances) while eager device ops through the tunneled
    runtime cost ~1.5 ms dispatch each AND a 30-300 s remote compile per
    new op shape — a device-side bake measured minutes of first-build
    latency for zero steady-state win."""
    m = np.asarray(matrices, np.float32)
    if m.ndim == 2:
        m = m[None]
    rot = m[:, :3, :3]  # (I, 3, 3)
    tr = m[:, :3, 3]  # (I, 3)
    i = rot.shape[0]
    t = obj["v0"].shape[0]

    def rot_pts(x):  # (T, 3) -> (I*T, 3)
        return np.einsum("ipq,tq->itp", rot, x).reshape(-1, 3)

    def rot_corners(x):  # (T, 3, 3) -> (I*T, 3, 3)
        return np.einsum("ipq,tcq->itcp", rot, x).reshape(-1, 3, 3)

    out = {
        "v0": (rot_pts(obj["v0"])
               + np.repeat(tr, t, axis=0)).astype(np.float32),
        "e1": rot_pts(obj["e1"]).astype(np.float32),
        "e2": rot_pts(obj["e2"]).astype(np.float32),
        "normal": rot_corners(obj["normal"]).astype(np.float32),
        "tangent": rot_corners(obj["tangent"]).astype(np.float32),
        "tex_coord": np.tile(obj["tex_coord"], (i, 1, 1)),
        "data": np.tile(obj["data"], (i, 1, 1)),
        "kind": np.tile(obj["kind"], (i,)),
    }
    if instance_colors is not None and len(instance_colors):
        # per-instance color override (ref RayTracer.cu:1169-1173)
        col = np.repeat(np.asarray(instance_colors, np.float32), t, axis=0)
        out["color"] = np.broadcast_to(
            col[:, None, :], (col.shape[0], 3, col.shape[1])).copy()
    else:
        out["color"] = np.tile(obj["color"], (i, 1, 1))
    return out


def _geometry_world_mesh(geom, transform: np.ndarray):
    """Bake one geometry under one instance transform into world-space
    per-corner primitive arrays. Returns dict of numpy arrays."""
    if geom.renderer_type == RendererType.CURVE:
        from raytracerfacility_tpu.enums import GeometryType

        mode = {
            GeometryType.LINEAR: "linear",
            GeometryType.QUADRATIC_BSPLINE: "quadratic",
            GeometryType.CUBIC_BSPLINE: "cubic",
        }.get(geom.geometry_type, "linear")
        if getattr(geom, "curve_mode", "analytic") == "analytic":
            return _bake_analytic_curves(geom, transform, mode)
        mesh = tessellate_strands(geom.strand_points, geom.curve_segments, mode=mode)
    else:
        mesh = geom.mesh
    if mesh is None or mesh.num_triangles == 0:
        return None

    positions, normals_v, tangents_v = mesh.positions, mesh.normals, mesh.tangents
    colors_v, uvs_v, data_v = mesh.colors, mesh.tex_coords, mesh.data

    if geom.renderer_type == RendererType.SKINNED:
        positions, normals_v, tangents_v = skin_vertices(
            positions, normals_v, tangents_v,
            geom.bone_ids, geom.bone_weights, geom.bone_matrices,
        )

    # Instanced/Default meshes go through _geometry_object_bake +
    # _transform_part_batched (shared object bake, batched device
    # transform); this host path serves skinned meshes and tessellated
    # curves. Fused native bake (transform + corner gather in one C++
    # pass, raytracerfacility_tpu/native); numpy fallback below.
    from raytracerfacility_tpu import native

    packed = native.pack_corners(
        {
            "positions": positions,
            "normals": normals_v,
            "tangents": tangents_v,
            "colors": colors_v,
            "tex_coords": uvs_v,
            "data": data_v,
        },
        mesh.triangles,
        np.asarray(transform, np.float32),
    )
    if packed is not None:
        packed["kind"] = np.zeros(mesh.num_triangles, np.int32)
        return packed
    tris = mesh.triangles
    positions = _transform_points(transform, positions)
    normals_v = _transform_dirs(transform, normals_v)
    tangents_v = _transform_dirs(transform, tangents_v)

    c0, c1, c2 = tris[:, 0], tris[:, 1], tris[:, 2]
    v0 = positions[c0]
    return {
        "v0": v0,
        "e1": positions[c1] - v0,
        "e2": positions[c2] - v0,
        "normal": np.stack([normals_v[c0], normals_v[c1], normals_v[c2]], axis=1),
        "tangent": np.stack([tangents_v[c0], tangents_v[c1], tangents_v[c2]], axis=1),
        "tex_coord": np.stack([uvs_v[c0], uvs_v[c1], uvs_v[c2]], axis=1),
        "color": np.stack([colors_v[c0], colors_v[c1], colors_v[c2]], axis=1),
        "data": np.stack([data_v[c0], data_v[c1], data_v[c2]], axis=1),
        "kind": np.zeros(tris.shape[0], np.int32),
    }


def build_compiled_scene(
    scene,
    pad_to_multiple: int = 256,
    build_bvh: bool = False,
    leaf_size: int = 4,
    cache: dict | None = None,
) -> CompiledScene:
    """Compile the scene store. ``cache`` (a dict the caller owns, usually
    ``RayTracerScene._build_cache``) enables INCREMENTAL rebuilds, the
    equivalent of the reference rebuilding only dirty GAS and reusing the
    rest (ref RayTracer.cu:1638-1643; version checks
    RayTracerLayer.cpp:60,131,193-197):

    * per-instance baked parts are keyed by (geometry key, geometry
      version, transform bytes) — editing one object re-bakes one part;
    * the assembled geometry buffers, BVH and Pallas tables are keyed by
      the whole part-key tuple — material-VALUE edits re-bake no
      triangles and rebuild no BVH, only the (tiny) material tables.
    """
    cache = {} if cache is None else cache
    parts = []
    part_keys = []
    inst_material: list[int] = []
    inst_handles: list[tuple[int, int]] = []
    material_slot: dict[int, int] = {}

    # material table (order of first use, like SBT record order)
    mat_list = []
    textures = []

    def tex_index(img) -> int:
        if img is None:
            return -1
        textures.append(np.asarray(img, np.float32))
        return len(textures) - 1

    def material_index(key: int) -> int:
        if key in material_slot:
            return material_slot[key]
        mat = scene.materials[key]
        slot = len(mat_list)
        material_slot[key] = slot
        p = mat.properties
        mat_list.append(
            dict(
                material_type=int(mat.material_type),
                albedo=np.asarray(p.albedo_color, np.float32),
                transmission=p.transmission,
                roughness=p.roughness,
                metallic=p.metallic,
                emission=p.emission,
                subsurface_factor=p.subsurface_factor,
                subsurface_color=np.asarray(p.subsurface_color, np.float32),
                subsurface_radius=np.asarray(p.subsurface_radius, np.float32),
                albedo_tex=tex_index(mat.albedo_texture),
                normal_tex=tex_index(mat.normal_texture),
                metallic_tex=tex_index(mat.metallic_texture),
                roughness_tex=tex_index(mat.roughness_texture),
                btf=mat.btf,
            )
        )
        return slot

    # ---- group scene instances by (geometry, version): all members of a
    # group share ONE object-space corner bake (the BLAS-sharing analog,
    # ref RayTracer.cu:1618-1715) and transform to world space in ONE
    # batched device op per group. Curves and skinned meshes keep the
    # per-part host bake (their geometry depends on transform scale /
    # bone state).
    groups: dict = {}
    group_order: list = []
    for handle, inst in scene.instances.items():
        geom = scene.geometries.get(inst.geometry_key)
        if geom is None or inst.material_key not in scene.materials:
            continue
        slot = len(inst_material)
        inst_material.append(material_index(inst.material_key))
        inst_handles.append(handle_words(inst.entity_handle))
        gkey = (inst.geometry_key, geom.version)
        if gkey not in groups:
            groups[gkey] = {"geom": geom, "members": []}
            group_order.append(gkey)
        groups[gkey]["members"].append((handle, inst, slot))

    # hard supported ceiling for the denormalized world bake, checked
    # BEFORE any part is baked: every instance contributes full triangle
    # rows (~80 B/tri across the geometry buffers + derived trace
    # tables), so instances x tris is bounded by HBM — unlike the
    # reference's shared-BLAS design (ref RayTracer.cu:1618-1715: one
    # GAS per geometry + N lightweight instance records). 128M rows
    # ~= 10 GB on a 16 GB part; past that, fail with the remedy instead
    # of a host/device OOM mid-bake.
    projected_rows = 0
    for gkey in group_order:
        grp = groups[gkey]
        mesh = getattr(grp["geom"], "mesh", None)
        tris = getattr(mesh, "triangles", None) if mesh is not None else None
        if tris is None:
            continue  # curves/strands tessellate later; meshes dominate scale
        nsub = (len(grp["geom"].instance_matrices)
                if grp["geom"].renderer_type == RendererType.INSTANCED
                and grp["geom"].instance_matrices is not None else 1)
        projected_rows += int(np.asarray(tris).shape[0]) * nsub * len(
            grp["members"])
    if projected_rows > 128_000_000:
        raise ValueError(
            f"scene bakes to {projected_rows:,} world triangle rows, over "
            "the denormalized-bake ceiling (128M rows ~= 10 GB HBM). For "
            "heavy instancing use the shared-geometry engine: "
            "scene.builder.compile_shared_instanced + "
            "ops.pallas_inst.trace_closest_instanced stores O(unique "
            "triangles) and a per-instance transform table.")

    for gkey, grp in ((k, groups[k]) for k in group_order):
        geom = grp["geom"]
        members = grp["members"]
        shared = geom.renderer_type in (RendererType.DEFAULT,
                                        RendererType.INSTANCED)
        if shared:
            ob = cache.get(("objbake", gkey[0]))
            if ob is None or ob[0] != geom.version:
                ob = (geom.version, _geometry_object_bake(geom))
                cache[("objbake", gkey[0])] = ob
            obj = ob[1]
        else:
            obj = None
        if shared and obj is not None:
            if geom.renderer_type == RendererType.INSTANCED:
                sub = np.asarray(geom.instance_matrices, np.float32)
                colors = (np.asarray(geom.instance_colors, np.float32)
                          if geom.instance_colors is not None
                          and len(geom.instance_colors) else None)
            else:
                sub = np.eye(4, dtype=np.float32)[None]
                colors = None
            # member transforms compose with the geometry's sub-instance
            # matrices on host ((members*sub, 4, 4) — tiny), then ONE
            # batched device transform for the whole group
            mats = np.einsum(
                "mpq,sqr->mspr",
                np.stack([m[1].global_transform for m in members]),
                sub,
            ).reshape(-1, 4, 4)
            wkey = (gkey, mats.tobytes(),
                    None if colors is None else colors.tobytes(),
                    tuple(m[2] for m in members))
            cached = cache.get(("gworld", gkey[0]))
            if cached is not None and cached[0] == wkey:
                part = cached[1]
            else:
                tiled_colors = (np.tile(colors, (len(members), 1))
                                if colors is not None else None)
                part = _transform_part_batched(obj, mats, tiled_colors)
                tris_per = obj["v0"].shape[0]
                part["instance"] = np.repeat(
                    np.asarray([m[2] for m in members], np.int32),
                    sub.shape[0] * tris_per)
                cache[("gworld", gkey[0])] = (wkey, part)
            parts.append(part)
            part_keys.append((gkey, wkey))
            continue
        # per-part host path (curves, skinned, empty meshes)
        for handle, inst, slot in members:
            key = (inst.geometry_key, geom.version,
                   inst.global_transform.tobytes())
            cached = cache.get(("part", handle))
            if cached is not None and cached[0] == key:
                baked = cached[1]
            else:
                baked = _geometry_world_mesh(geom, inst.global_transform)
                if baked is not None:
                    cache[("part", handle)] = (key, baked)
            if baked is None:
                continue
            part = dict(baked)  # don't mutate the cached bake
            part["instance"] = np.full(part["v0"].shape[0], slot, np.int32)
            parts.append(part)
            part_keys.append((handle, key, inst.material_key, slot))

    if not parts:  # empty scene: single degenerate triangle
        parts.append(
            {
                "v0": np.zeros((1, 3), np.float32),
                "e1": np.zeros((1, 3), np.float32),
                "e2": np.zeros((1, 3), np.float32),
                "normal": np.zeros((1, 3, 3), np.float32),
                "tangent": np.zeros((1, 3, 3), np.float32),
                "tex_coord": np.zeros((1, 3, 2), np.float32),
                "color": np.ones((1, 3, 4), np.float32),
                "data": np.zeros((1, 3, 4), np.float32),
                "instance": np.zeros(1, np.int32),
                "kind": np.zeros(1, np.int32),
            }
        )
        part_keys.append((0, ("__empty__",), 0))
        if not inst_material:
            inst_material.append(0)
            inst_handles.append((0, 0))
        if not mat_list:
            mat_list.append(
            dict(
                material_type=0,
                albedo=np.ones(3, np.float32),
                transmission=0.0,
                roughness=1.0,
                metallic=0.3,
                emission=0.0,
                subsurface_factor=0.0,
                subsurface_color=np.ones(3, np.float32),
                subsurface_radius=np.zeros(3, np.float32),
                albedo_tex=-1,
                normal_tex=-1,
                metallic_tex=-1,
                roughness_tex=-1,
                btf=None,
            )
        )

    # prune cache entries for instances / geometries that left the scene
    live = {("part", h) for h in scene.instances}
    live |= {("objbake", g) for g in scene.geometries}
    live |= {("gworld", g) for g in scene.geometries}
    for k in [k for k in cache
              if isinstance(k, tuple) and k[0] in ("part", "objbake", "gworld")
              and k not in live]:
        del cache[k]

    # On the TPU path every trace consumer (camera, estimator, LiDAR,
    # alpha/shadow any-hit) dispatches through the Pallas trace table; the
    # LBVH walker's only remaining TPU consumer is the BSSRDF disk probe
    # (models/pathtracer.py). When no material has subsurface enabled,
    # skip the LBVH build: its jitted program costs several LARGE remote
    # Mosaic/XLA compiles (~minutes cold through this runtime's compile
    # service) that would gate first-render latency for nothing. Decided
    # HERE so the effective value rides the ensemble cache key (the skip
    # depends on materials, which the key does not otherwise carry).
    if build_bvh:
        import os

        import jax as _jax_bvh

        _pbflag = os.environ.get("RTF_TPU_PALLAS_BRUTE")
        _pallas_on = ((_jax_bvh.default_backend() == "tpu")
                      if _pbflag is None else _pbflag == "1")
        if _pallas_on and not any(
                float(m["subsurface_factor"]) > 0.0 for m in mat_list):
            build_bvh = False

    # ---- geometry-ensemble cache: everything downstream of the triangle
    # soup (buffers, BVH, Pallas tables) is a pure function of the baked
    # parts + their material-slot assignment; a matching key means zero
    # geometry work this build (material-only edits land here)
    ensemble_key = (tuple(part_keys), pad_to_multiple, build_bvh, leaf_size)
    # refit signature: the part structure with shared-group member
    # transforms EXCLUDED — when ONLY those transforms changed, the edit
    # is the reference's IAS-refit case (ref RayTracer.cu:1618-1715) and
    # the ensemble updates in place: O(changed group) host bake + device
    # upload (lax.dynamic_update_slice per field — contiguous, since a
    # group's rows are contiguous in concat order) and a device-side
    # re-pack of the derived tables from the updated buffers. No host
    # re-concat and no full-ensemble re-upload (the tunnel moves ~12 MB/s;
    # a 1M-triangle ensemble is ~180 MB = the actual edit-latency wall).
    def _part_sig(pk):
        if len(pk) == 2 and isinstance(pk[1], tuple):  # shared (gkey, wkey)
            gkey, wkey = pk
            return ("shared", gkey, wkey[2], wkey[3])
        return ("leaf",) + pk  # per-part path keys include the transform
    part_sigs = (tuple(_part_sig(pk) for pk in part_keys),
                 pad_to_multiple, build_bvh, leaf_size)
    part_ranges = []
    _start = 0
    for p in parts:
        _n = int(p["v0"].shape[0])
        part_ranges.append((_start, _n))
        _start += _n

    ens = cache.get("ensemble")
    if ens is not None and ens[0] == ensemble_key:
        geometry = ens[1]["geometry"]
        has_curves = ens[1]["has_curves"]
        num_tris = ens[1]["num_tris"]
    elif (ens is not None and ens[1].get("part_sigs") == part_sigs):
        # ---- IAS-refit analog: update the changed groups' rows in place
        geometry = ens[1]["geometry"]
        has_curves = ens[1]["has_curves"]
        num_tris = ens[1]["num_tris"]
        old_keys = ens[1]["part_keys"]
        changed = [i for i, pk in enumerate(part_keys) if pk != old_keys[i]]
        fields = ("v0", "e1", "e2", "normal", "tangent", "tex_coord",
                  "color", "data")
        rows_updated = 0
        for i in changed:
            start, count = part_ranges[i]
            rows_updated += count
            new = tuple(jnp.asarray(parts[i][f]) for f in fields)
            cur = tuple(getattr(geometry, f) for f in fields)
            upd = _refit_update_jit(cur, new, jnp.int32(start))
            geometry = geometry.replace(**dict(zip(fields, upd)))
        cache["refit_stats"] = {
            "refit": True, "parts_changed": len(changed),
            "rows_updated": rows_updated, "total_rows": num_tris,
        }
        ens = None  # derived tables rebuild (device-side, zero transfer)
    else:
        ens = None
        cache.pop("refit_stats", None)
        # host concat + ONE device upload per field: eager per-part device
        # ops would pay tunnel dispatch + remote-compile latency per shape
        merged = {
            k: np.concatenate([np.asarray(p[k]) for p in parts], axis=0)
            for k in parts[0]
        }
        num_tris = merged["v0"].shape[0]
        pad = (-num_tris) % pad_to_multiple
        if pad:
            for k, arr in merged.items():
                fill = np.zeros((pad,) + arr.shape[1:], arr.dtype)
                merged[k] = np.concatenate([arr, fill], axis=0)

        has_curves = bool((merged["kind"] != 0).any())
        geometry = GeometryBuffers(
            **{k: jnp.asarray(v) for k, v in merged.items()},
            has_curves=has_curves,
        )

    texels, tex_sizes = build_texture_stack(textures)

    # MLVQ table: pack all BTF materials present in the scene
    btf_objects = [m.pop("btf") for m in mat_list]
    btf_slots = []
    btf_table = None
    present = [b for b in btf_objects if b is not None]
    if present:
        from raytracerfacility_tpu.mlvq.btf import pack_btf_table

        btf_table = pack_btf_table(present)
    counter = 0
    for b in btf_objects:
        if b is None:
            btf_slots.append(-1)
        else:
            btf_slots.append(counter)
            counter += 1

    materials = MaterialTable(
        material_type=jnp.asarray([m["material_type"] for m in mat_list], jnp.int32),
        albedo=jnp.asarray(np.stack([m["albedo"] for m in mat_list])),
        transmission=jnp.asarray([m["transmission"] for m in mat_list], jnp.float32),
        roughness=jnp.asarray([m["roughness"] for m in mat_list], jnp.float32),
        metallic=jnp.asarray([m["metallic"] for m in mat_list], jnp.float32),
        emission=jnp.asarray([m["emission"] for m in mat_list], jnp.float32),
        subsurface_factor=jnp.asarray(
            [m["subsurface_factor"] for m in mat_list], jnp.float32
        ),
        subsurface_color=jnp.asarray(
            np.stack([m["subsurface_color"] for m in mat_list])
        ),
        subsurface_radius=jnp.asarray(
            np.stack([m["subsurface_radius"] for m in mat_list])
        ),
        albedo_tex=jnp.asarray([m["albedo_tex"] for m in mat_list], jnp.int32),
        normal_tex=jnp.asarray([m["normal_tex"] for m in mat_list], jnp.int32),
        metallic_tex=jnp.asarray([m["metallic_tex"] for m in mat_list], jnp.int32),
        roughness_tex=jnp.asarray([m["roughness_tex"] for m in mat_list], jnp.int32),
        btf_index=jnp.asarray(btf_slots, jnp.int32),
        texels=texels,
        tex_sizes=tex_sizes,
    )

    if ens is not None:
        bvh = ens[1]["bvh"]
        pallas_tris = ens[1]["pallas_tris"]
        fused_geom = ens[1]["fused_geom"]
    else:
        bvh = None
        if build_bvh:
            import jax

            from raytracerfacility_tpu.ops.bvh import build_bvh as _build

            # jit the whole build: one compiled program per (shape,
            # leaf_size) instead of an eager op storm (also how per-frame
            # rebuilds of animated scenes stay cheap)
            bvh = jax.jit(
                _build,
                static_argnames=("leaf_size", "has_curves"),
            )(
                geometry.v0, geometry.e1, geometry.e2,
                leaf_size=leaf_size, instance=geometry.instance,
                kind=geometry.kind, has_curves=has_curves,
            )

        # Pallas trace table: on by default on TPU (where it collapses the
        # whole trace into one op-execution; see ops/pallas_brute.py), off
        # on CPU (interpret mode is slow); RTF_TPU_PALLAS_BRUTE=1/0
        # overrides. Curve rows dispatch in-kernel by their kind flag.
        pallas_tris = None
        fused_geom = None
        import os

        import jax

        flag = os.environ.get("RTF_TPU_PALLAS_BRUTE")
        enabled = (jax.default_backend() == "tpu") if flag is None else flag == "1"
        if enabled:
            from raytracerfacility_tpu.ops.pallas_brute import pack_tri_table

            pallas_tris = pack_tri_table(
                geometry.v0, geometry.e1, geometry.e2,
                kind=geometry.kind if has_curves else None)
        cache["ensemble"] = (ensemble_key, dict(
            geometry=geometry, has_curves=has_curves, num_tris=num_tris,
            bvh=bvh, pallas_tris=pallas_tris, fused_geom=None,
            part_sigs=part_sigs, part_keys=tuple(part_keys),
            part_ranges=tuple(part_ranges),
        ))
        ens = cache["ensemble"]

    compiled = CompiledScene(
        geometry=geometry,
        materials=materials,
        instance_material=jnp.asarray(inst_material, jnp.int32),
        instance_handle=jnp.asarray(np.array(inst_handles, np.uint32)),
        btf=btf_table,
        bvh=bvh,
        pallas_tris=pallas_tris,
        num_tris=int(num_tris),
    )

    # Fused whole-path mega-kernel tables (ops/pallas_fused.py): eligible
    # when every shading feature can be specialized away statically —
    # triangle-only geometry, Default materials, no textures / BTF /
    # subsurface. The renderer additionally checks the per-render config
    # (Scene lighting, no cubemap, no alpha test) before dispatching.
    if not has_curves:
        import os as _os

        import jax as _jax

        flag = _os.environ.get("RTF_TPU_FUSED")
        enabled = (_jax.default_backend() == "tpu") if flag is None else flag == "1"
        eligible = btf_table is None and all(
            m["material_type"] == 0
            and m["albedo_tex"] < 0
            and m["normal_tex"] < 0
            and m["metallic_tex"] < 0
            and m["roughness_tex"] < 0
            and float(m["subsurface_factor"]) <= 0.0
            for m in mat_list
        )
        if enabled and eligible:
            from raytracerfacility_tpu.ops.pallas_fused import (
                pack_fused_tables,
                pack_material_table,
            )

            from raytracerfacility_tpu.ops.pallas_fused import auto_chunk

            if fused_geom is None:
                chunk = auto_chunk(compiled.geometry.num_triangles)
                table, sub_aabbs, chunk_aabbs, mat_table = pack_fused_tables(
                    compiled, chunk=chunk)
                fused_geom = (table, sub_aabbs, chunk_aabbs)
                ens[1]["fused_geom"] = fused_geom
                ens[1]["fused_chunk"] = chunk
                compiled = compiled.replace(
                    fused=(table, sub_aabbs, chunk_aabbs, mat_table),
                    fused_chunk=chunk)
            else:
                # geometry unchanged: only re-pack the material constants
                compiled = compiled.replace(
                    fused=fused_geom + (pack_material_table(compiled.materials),),
                    fused_chunk=int(ens[1].get(
                        "fused_chunk",
                        auto_chunk(compiled.geometry.num_triangles))))

    return compiled


def compile_shared_instanced(scene, chunk: int = 512, sub: int = 32):
    """Shared-geometry instanced trace tables from a RayTracerScene —
    the O(unique triangles) alternative to the denormalized world bake
    for heavy-instancing scenes (the reference's shared-BLAS + instance
    records, ref RayTracer.cu:1618-1715 / OptixInstance :1663-1670).

    Every DEFAULT/INSTANCED mesh instance becomes one instance record
    (member transform composed with the geometry's sub-instance
    matrices); geometry is baked ONCE per (geometry, version) in object
    space. Curves and skinned meshes are not shared (their bake depends
    on transform/bones) and raise.

    Returns the table dict for
    :func:`raytracerfacility_tpu.ops.pallas_inst.trace_closest_instanced`
    plus ``instance_material`` ((I,) material slot per instance record,
    indexing ``scene``'s material order) in the same dict.
    """
    from raytracerfacility_tpu.ops.pallas_inst import pack_instanced_tables

    geoms = []           # object-space (v0, e1, e2) per unique geometry
    geom_index: dict = {}
    instance_geom: list = []
    matrices: list = []
    inst_material: list = []
    mat_slots = {k: i for i, k in enumerate(scene.materials)}

    for handle, inst in scene.instances.items():
        geom = scene.geometries.get(inst.geometry_key)
        if geom is None or inst.material_key not in scene.materials:
            continue
        if geom.renderer_type not in (RendererType.DEFAULT,
                                      RendererType.INSTANCED):
            raise ValueError(
                f"shared instancing requires mesh geometry; instance "
                f"{handle} has renderer_type={geom.renderer_type}")
        gkey = (inst.geometry_key, geom.version)
        if gkey not in geom_index:
            obj = _geometry_object_bake(geom)
            if obj is None:
                continue
            geom_index[gkey] = len(geoms)
            geoms.append((obj["v0"], obj["e1"], obj["e2"]))
        g = geom_index[gkey]
        if geom.renderer_type == RendererType.INSTANCED:
            sub_mats = np.asarray(geom.instance_matrices, np.float32)
        else:
            sub_mats = np.eye(4, dtype=np.float32)[None]
        for m in np.einsum("pq,sqr->spr",
                           np.asarray(inst.global_transform, np.float32),
                           sub_mats):
            instance_geom.append(g)
            matrices.append(m)
            inst_material.append(mat_slots[inst.material_key])

    if not geoms:
        raise ValueError("no mesh instances to compile")
    tables = pack_instanced_tables(
        geoms, np.asarray(instance_geom, np.int32), matrices,
        chunk=chunk, sub=sub)
    tables["instance_material"] = np.asarray(inst_material, np.int32)
    return tables
