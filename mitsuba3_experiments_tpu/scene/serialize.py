"""Scene <-> dict round trip — the /root/reference/to_dict.py analog.

The reference converts a loaded Mitsuba scene back into a load_dict-able
dict and asserts the re-render is allclose (to_dict.py:8-65).  Here the
compiled Scene's flat arrays serialize into a single "mesh"-typed dict (plus
material/emitter/camera tables) that build.load_dict compiles back into an
equivalent scene; tests assert geometry/table equality and render allclose.
"""
from __future__ import annotations

import numpy as np

from .types import Scene


def scene_to_dict(scene: Scene, meta: dict | None = None) -> dict:
    """Serialize a compiled scene into a loadable dict (one mesh per
    (material, emitter) bucket so bindings survive the round trip)."""
    g = scene.geometry
    v = np.asarray(g.vertices)
    f = np.asarray(g.faces)
    nrm = np.asarray(g.normals)
    uv = np.asarray(g.uvs)
    fm = np.asarray(g.face_mat)
    fe = np.asarray(g.face_emitter)
    flat = np.asarray(g.face_flat)

    cam = scene.camera
    w, h = cam.resolution
    tan = np.asarray(cam.tan_half_fov)
    fov = float(np.rad2deg(2.0 * np.arctan(tan[0])))
    out: dict = {
        "type": "scene",
        "sensor": {
            "type": "perspective",
            "fov": fov,
            "fov_axis": "x",
            "to_world": np.asarray(cam.to_world),
            "film": {"width": w, "height": h},
        },
    }

    mats = scene.materials
    kinds = np.asarray(mats.kind)
    base = np.asarray(mats.base_color)
    params = np.asarray(mats.params)
    twosided = np.asarray(mats.twosided)
    rad = np.asarray(scene.emitters.radiance)

    from .types import BSDFKind

    def mat_dict(mid: int) -> dict:
        k = kinds[mid]
        bc = base[mid].tolist()
        p = params[mid]
        if k == BSDFKind.DIFFUSE:
            d = {"type": "diffuse", "reflectance": bc}
        elif k == BSDFKind.CONDUCTOR:
            d = {"type": "conductor", "eta": p[0:3].tolist(), "k": p[3:6].tolist(),
                 "specular_reflectance": bc}
        elif k == BSDFKind.ROUGH_CONDUCTOR:
            d = {"type": "roughconductor", "eta": p[0:3].tolist(),
                 "k": p[3:6].tolist(), "alpha": float(p[6]),
                 "specular_reflectance": bc}
        elif k == BSDFKind.DIELECTRIC:
            d = {"type": "dielectric", "int_ior": float(p[0]), "ext_ior": 1.0,
                 "specular_reflectance": bc}
        elif k == BSDFKind.ROUGH_DIELECTRIC:
            d = {"type": "roughdielectric", "int_ior": float(p[0]),
                 "ext_ior": 1.0, "alpha": float(p[6])}
        elif k == BSDFKind.PLASTIC:
            d = {"type": "plastic", "int_ior": float(p[0]), "ext_ior": 1.0,
                 "diffuse_reflectance": bc}
        elif k == BSDFKind.ROUGH_PLASTIC:
            d = {"type": "roughplastic", "int_ior": float(p[0]), "ext_ior": 1.0,
                 "alpha": float(p[6]), "diffuse_reflectance": bc}
        elif k == BSDFKind.NULL:
            d = {"type": "null"}
        else:  # MASK
            nested = int(np.asarray(mats.nested_id)[mid])
            d = {"type": "mask", "opacity": bc, "bsdf": mat_dict(nested)}
        if twosided[mid] and d["type"] not in (
            "dielectric", "roughdielectric", "null"
        ):
            d = {"type": "twosided", "bsdf": d}
        return d

    # one mesh per (mat, emitter) bucket
    for mid in np.unique(fm):
        for eid in np.unique(fe[fm == mid]):
            sel = (fm == mid) & (fe == eid)
            faces = f[sel]
            used = np.unique(faces)
            remap = np.full(v.shape[0], -1, np.int64)
            remap[used] = np.arange(len(used))
            entry = {
                "type": "mesh",
                "vertices": v[used],
                "faces": remap[faces].astype(np.int32),
                "uvs": uv[used],
                "bsdf": mat_dict(int(mid)),
            }
            if not flat[sel].all():
                entry["normals"] = nrm[used]
            if eid >= 0:
                entry["emitter"] = {
                    "type": "area", "radiance": rad[int(eid)].tolist()
                }
            out[f"mesh_{mid}_{eid}"] = entry
    return out
