"""Flagship benchmark scene: the bedroom workload (BASELINE.md north star:
1280x720, spp 64, max_depth 65, 72 shapes, ~2M triangles, tent filter).

The reference snapshot ships the bedroom's OBJ meshes and textures as git-LFS
*pointers* (no bytes), so the real geometry is unavailable.  This module
loads the real scene.xml — camera, both area emitters, all 64 BSDFs, all 72
shape records with their true transforms — and substitutes each missing OBJ
with a deterministic procedural mesh whose triangle budget is estimated from
the LFS size field (~90 bytes/triangle for these OBJs, ~2M total).  The
result is a "bedroom-class" workload with realistic BVH depth, material mix,
and occlusion, fully reproducible across runs.  If real OBJ bytes are ever
present, they are used as-is.
"""
from __future__ import annotations

import os
import re

import numpy as np

from .mesh import HostMesh, sphere
from .obj import is_lfs_pointer

REFERENCE_BEDROOM = "/root/reference/data/bedroom/scene.xml"

# shell bounds must enclose the real camera at (3.456, 1.212, 3.299)
# (data/bedroom/scene.xml to_world); blobs stay in the inner furniture box
_ROOM_LO = np.array([-3.6, -0.05, -3.6], np.float32)
_ROOM_HI = np.array([4.6, 3.0, 4.6], np.float32)
_BLOB_LO = np.array([-2.5, 0.0, -2.5], np.float32)
_BLOB_HI = np.array([2.3, 2.4, 2.3], np.float32)


def _hash01(seed: int, n: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.random(n, dtype=np.float64).astype(np.float32)


def _lfs_size(path: str) -> int:
    try:
        with open(path, "rb") as f:
            head = f.read(200).decode(errors="replace")
        mch = re.search(r"size (\d+)", head)
        return int(mch.group(1)) if mch else 100_000
    except OSError:
        return 100_000


def placeholder_mesh(seed: int, n_tris: int) -> HostMesh:
    """Deterministic displaced-sphere blob with ~n_tris triangles, placed
    inside the room box; stands in for a missing OBJ mesh."""
    # the bedroom's carpet OBJ alone is ~1.5M triangles (131MB of the 176MB
    # LFS total) — allow single meshes that large
    n_tris = int(np.clip(n_tris, 64, 1_600_000))
    # sphere(n_theta, n_phi) -> ~2 * n_theta * n_phi tris
    n_theta = max(4, int(np.sqrt(n_tris / 4)))
    n_phi = max(8, 2 * n_theta)
    base = sphere(radius=1.0, n_theta=n_theta, n_phi=n_phi)
    rng = np.random.default_rng(seed)
    # radial displacement: few random low-frequency lobes -> blobby furniture
    v = base.vertices
    disp = np.zeros(len(v), np.float32)
    for _ in range(6):
        d = rng.normal(size=3).astype(np.float32)
        d /= np.linalg.norm(d)
        disp += 0.15 * np.cos(3.0 * (v @ d) + rng.uniform(0, 6.28)).astype(
            np.float32
        )
    v = v * (1.0 + disp[:, None] * 0.5)
    # anisotropic scale + placement in the room
    scale = 0.12 + 0.45 * rng.random(3).astype(np.float32)
    pos = _BLOB_LO + (0.1 + 0.8 * rng.random(3).astype(np.float32)) * (
        _BLOB_HI - _BLOB_LO
    )
    v = v * scale + pos
    return HostMesh(
        v.astype(np.float32), base.faces, None, base.uvs, flat=True
    )


def bedroom_dict(res=(1280, 720), spp: int = 64,
                 tri_budget: int = 2_000_000) -> dict:
    """The flagship scene dict: real XML skeleton + placeholder geometry for
    LFS-pointer meshes, plus a floor/walls shell so light stays in the room."""
    from .xml import load_xml_dict

    d = load_xml_dict(REFERENCE_BEDROOM)
    if res is not None:
        d["sensor"]["film"]["width"] = res[0]
        d["sensor"]["film"]["height"] = res[1]
        d["sensor"].setdefault("sampler", {})["sample_count"] = spp

    # estimate per-mesh triangle budgets from LFS sizes
    sizes = {}
    total = 0
    for key, val in d.items():
        if isinstance(val, dict) and val.get("type") == "obj":
            sz = _lfs_size(val["filename"])
            sizes[key] = sz
            total += sz
    seed_base = 1234
    i = 0
    for key, val in list(d.items()):
        if not (isinstance(val, dict) and val.get("type") == "obj"):
            continue
        if not is_lfs_pointer(val["filename"]):
            continue  # real data present: use it
        n_tris = max(64, int(tri_budget * sizes[key] / max(total, 1)))
        hm = placeholder_mesh(seed_base + i, n_tris)
        i += 1
        tw = val.get("to_world")
        repl = {
            "type": "mesh",
            "vertices": hm.vertices,
            "faces": hm.faces,
            "uvs": hm.uvs,
        }
        if tw is not None:
            repl["to_world"] = tw
        if "bsdf" in val:
            repl["bsdf"] = val["bsdf"]
        if "emitter" in val:
            repl["emitter"] = val["emitter"]
        d[key] = repl

    # textured BSDFs reference LFS-pointer JPG/PNGs — swap for checkerboards
    _strip_missing_textures(d)

    # room shell (floor + 4 walls + ceiling) so paths terminate indoors
    from ..core import math as cm

    lo, hi = _ROOM_LO, _ROOM_HI
    cx, cy, cz = (lo + hi) / 2
    sx, sy, sz = (hi - lo) / 2
    walls = {
        "floor": (cm.matmul4(cm.translate([cx, lo[1], cz]), cm.rotate([1, 0, 0], -90), cm.scale_mat([sx, sz, 1]))),
        "ceilwall": (cm.matmul4(cm.translate([cx, hi[1], cz]), cm.rotate([1, 0, 0], 90), cm.scale_mat([sx, sz, 1]))),
        "wall_zlo": (cm.matmul4(cm.translate([cx, cy, lo[2]]), cm.scale_mat([sx, sy, 1]))),
        "wall_zhi": (cm.matmul4(cm.translate([cx, cy, hi[2]]), cm.rotate([0, 1, 0], 180), cm.scale_mat([sx, sy, 1]))),
        "wall_xlo": (cm.matmul4(cm.translate([lo[0], cy, cz]), cm.rotate([0, 1, 0], 90), cm.scale_mat([sz, sy, 1]))),
        "wall_xhi": (cm.matmul4(cm.translate([hi[0], cy, cz]), cm.rotate([0, 1, 0], -90), cm.scale_mat([sz, sy, 1]))),
    }
    for name, tw in walls.items():
        d[f"_shell_{name}"] = {
            "type": "rectangle",
            "to_world": tw,
            # subdivide: room-sized triangles would blow up BVH node bounds
            "subdiv": 16,
            "bsdf": {"type": "diffuse", "reflectance": [0.65, 0.6, 0.55]},
        }
    return d


def _strip_missing_textures(d):
    for v in list(d.values()):
        if isinstance(v, dict):
            if (
                v.get("type") == "bitmap"
                and "filename" in v
                and is_lfs_pointer(v["filename"])
            ):
                v.clear()
                v.update(
                    {"type": "checkerboard", "color0": [0.5, 0.45, 0.4],
                     "color1": [0.3, 0.28, 0.25]}
                )
            else:
                _strip_missing_textures(v)


def load_flagship(res=(1280, 720), spp: int = 64, tri_budget: int = 2_000_000,
                  cache_dir: str | None = "/root/repo/.scene_cache"):
    """Compile the flagship scene; results are disk-cached (the SAH build of
    a 2M-triangle scene takes minutes — one .npz round trip is ~seconds)."""
    import os
    import pickle

    from .build import load_dict

    from .bvh8 import COLLAPSE, LEAF_CAP, SBVH, SBVH_ALPHA, WIDTH

    key = f"flagship_{res[0]}x{res[1]}_spp{spp}_t{tri_budget}_v10"
    if LEAF_CAP != 8:  # leaf-row layout derives from LEAF_CAP (bvh8.py)
        key += f"_lc{LEAF_CAP}"
    if WIDTH != 8:     # node-row layout derives from WIDTH
        key += f"_w{WIDTH}"
    if COLLAPSE != "area":  # wide-tree shape derives from the strategy
        key += f"_c{COLLAPSE}"
    if SBVH:           # spatial-split build changes the whole tree
        key += f"_sbvh{SBVH_ALPHA:g}"
    if cache_dir:
        path = os.path.join(cache_dir, key + ".pkl")
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    import dataclasses

                    import jax

                    host = pickle.load(f)
                    hs = host["scene"]
                    # pre-round-4 pickles lack BVH.layout (pickle restores
                    # __dict__ directly); stamp the layout the key encodes
                    # (== the current env default) instead of rebuilding
                    # the multi-minute SAH tree
                    if getattr(hs.bvh, "layout", None) is None:
                        from .bvh8 import DEFAULT_LAYOUT
                        from .types import BVH

                        vals = {
                            f.name: getattr(hs.bvh, f.name, None)
                            for f in dataclasses.fields(BVH)
                        }
                        vals["layout"] = DEFAULT_LAYOUT
                        hs = dataclasses.replace(hs, bvh=BVH(**vals))
                    scene = jax.tree_util.tree_map(
                        lambda x: jax.numpy.asarray(x)
                        if isinstance(x, np.ndarray)
                        else x,
                        hs,
                    )
                    return scene, host["meta"]
            except Exception:
                pass
    scene, meta = load_dict(bedroom_dict(res, spp, tri_budget))
    if cache_dir:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        host_scene = jax.tree_util.tree_map(
            lambda x: np.asarray(x), scene
        )
        with open(os.path.join(cache_dir, key + ".pkl"), "wb") as f:
            pickle.dump({"scene": host_scene, "meta": meta}, f)
    return scene, meta
