"""Scene (de)serialization: JSON scene files for the CLI and Python API.

The reference's "scene format" is a hardcoded C++ table (Sphere.cpp:7-23)
edited and recompiled per experiment; its camera is likewise hardcoded
(src/rt.cpp:755-759). Here a scene (sphere soup + homogeneous medium,
optionally a camera) round-trips through a plain JSON document, so
experiments are data, not code:

    {
      "sigma_a": 0.001, "sigma_s": 0.009,
      "spheres": [
        {"radius": 1e5, "center": [-1e5-49, 0, 0], "albedo": [0.5, 0.5, 0.5],
         "radiance": [0, 0, 0], "material": 0,
         "eta": [0, 0, 0], "kappa": [0, 0, 0], "alpha": 0.0},
        ...
      ],
      "camera": {"origin": [0, 11.2, 214], "direction": [0, -0.042612, -1],
                 "fov_scale": 0.5095}          # optional
    }

Values are written as exact python floats (repr round-trip), so a saved
scene reconstructs bit-identically; the static emitter/light index tuples
are re-derived by make_scene, exactly as for the built-in constructors.
"""
from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from .camera import Camera
from .scene import Scene, make_scene

__all__ = ["scene_to_dict", "scene_from_dict", "save_scene", "load_scene"]


def scene_to_dict(scene: Scene, camera: Camera | None = None) -> dict:
    """Plain-python dict of the scene (and optionally camera), JSON-ready."""
    r = np.asarray(scene.radius, np.float64)
    c = np.asarray(scene.center, np.float64)
    alb = np.asarray(scene.albedo, np.float64)
    rad = np.asarray(scene.radiance, np.float64)
    mat = np.asarray(scene.material, np.int64)
    eta = np.asarray(scene.eta, np.float64)
    kap = np.asarray(scene.kappa, np.float64)
    alp = np.asarray(scene.alpha, np.float64)
    spheres = [
        {
            "radius": float(r[i]), "center": list(map(float, c[i])),
            "albedo": list(map(float, alb[i])),
            "radiance": list(map(float, rad[i])),
            "material": int(mat[i]),
            "eta": list(map(float, eta[i])),
            "kappa": list(map(float, kap[i])),
            "alpha": float(alp[i]),
        }
        for i in range(scene.count)
    ]
    out = {
        "sigma_a": float(np.asarray(scene.medium.sigma_a)),
        "sigma_s": float(np.asarray(scene.medium.sigma_s)),
        "spheres": spheres,
    }
    g = float(np.asarray(scene.medium.g))
    if g != 0.0:
        out["g"] = g      # HG anisotropy; omitted when isotropic
    fld = scene.medium.density
    if fld is not None:
        # heterogeneous density field (media/density.py); omitted when
        # homogeneous
        p = np.asarray(fld.params, np.float64)
        dd = {
            "kind": fld.kind,
            "majorant": float(fld.majorant),
            "max_null": int(fld.max_null),
        }
        if fld.kind == "grid":
            dd["shape"] = list(p.shape)
            dd["params"] = list(map(float, p.reshape(-1)))
            dd["origin"] = list(map(float, fld.grid_origin))
            dd["spacing"] = list(map(float, fld.grid_spacing))
            dd["n_march"] = int(fld.n_march)
        else:
            dd["params"] = [list(map(float, row)) for row in p.reshape(
                -1, p.shape[-1] if p.ndim > 1 else p.shape[0])]
        out["density"] = dd
    if camera is not None:
        out["camera"] = {
            "origin": list(map(float, np.asarray(camera.origin, np.float64))),
            "direction": list(map(float,
                                  np.asarray(camera.direction, np.float64))),
            "fov_scale": float(np.asarray(camera.fov_scale)),
        }
    return out


def scene_from_dict(d: dict, dtype=jnp.float32):
    """(Scene, Camera | None) from a scene dict. Missing per-sphere fields
    default like the reference Sphere constructor (zeros; material 0)."""
    spheres = []
    for s in d["spheres"]:
        spheres.append((
            float(s.get("radius", 0.0)),
            tuple(s.get("center", (0.0, 0.0, 0.0))),
            tuple(s.get("albedo", (0.0, 0.0, 0.0))),
            tuple(s.get("radiance", (0.0, 0.0, 0.0))),
            int(s.get("material", 0)),
            tuple(s.get("eta", (0.0, 0.0, 0.0))),
            tuple(s.get("kappa", (0.0, 0.0, 0.0))),
            float(s.get("alpha", 0.0)),
        ))
    density = None
    if "density" in d:
        from ..media.density import DensityField

        dd = d["density"]
        p = np.asarray(dd["params"], np.float64)
        if dd["kind"] == "exp_height":
            p = p.reshape(-1)[:2]
        kw = {}
        if dd["kind"] == "grid":
            p = p.reshape(dd["shape"])
            kw = dict(grid_origin=tuple(dd["origin"]),
                      grid_spacing=tuple(dd["spacing"]),
                      n_march=int(dd.get("n_march", 32)))
        density = DensityField(
            params=jnp.asarray(p, dtype), kind=str(dd["kind"]),
            majorant=float(dd.get("majorant", 1.0)),
            max_null=int(dd.get("max_null", 64)), **kw)
    scene = make_scene(spheres, sigma_a=float(d.get("sigma_a", 0.001)),
                       sigma_s=float(d.get("sigma_s", 0.009)),
                       g=float(d.get("g", 0.0)), density=density,
                       dtype=dtype)
    camera = None
    if "camera" in d:
        c = d["camera"]
        # only normalize when the stored direction is NOT already unit to
        # f32 precision — save_scene writes normalized directions, and
        # renormalizing them could flip last-ulp bits, breaking the
        # bit-identical round-trip guarantee
        raw = np.asarray(c["direction"], np.float64)
        if abs(float((raw.astype(np.float32).astype(np.float64) ** 2).sum())
               - 1.0) > 1e-6:
            raw = raw / np.linalg.norm(raw)
        camera = Camera(
            origin=jnp.asarray(c["origin"], dtype),
            direction=jnp.asarray(raw, dtype),
            fov_scale=jnp.asarray(c.get("fov_scale", 0.5095), dtype),
        )
    return scene, camera


def save_scene(path: str, scene: Scene, camera: Camera | None = None) -> None:
    with open(path, "w") as f:
        json.dump(scene_to_dict(scene, camera), f, indent=1)
        f.write("\n")


def load_scene(path: str, dtype=jnp.float32):
    """(Scene, Camera | None) from a JSON scene file."""
    with open(path) as f:
        return scene_from_dict(json.load(f), dtype=dtype)
