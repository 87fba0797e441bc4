"""Scene representation: structure-of-arrays sphere soup as a differentiable pytree.

The reference hardcodes a global ``std::vector<Sphere>`` (include/Sphere.h:49,
Sphere.cpp:7-23) with fields radius / center / albedo / radiance / material /
eta / kappa / alpha. Here the scene is a pytree of jnp arrays: every float
field is a leaf, so the whole scene is differentiable (inverse rendering) and
shardable. Material codes follow the reference (include/Sphere.h:18-21):

  0 = Lambertian, 1 = Beckmann microfacet conductor, 2 = smooth dielectric,
  3 = volumetric boundary (participating-medium shell).

The homogeneous-medium coefficients (sigma_a, sigma_s) live on the scene too,
mirroring the call-site constants at reference src/rt.cpp:794.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

LAMBERT = 0
MICROFACET = 1
DIELECTRIC = 2
VOLUME_BOUNDARY = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Medium:
    """Participating medium (sigma_t = sigma_a + sigma_s).

    g: Henyey-Greenstein anisotropy in (-1, 1); 0 (the default, and the
    reference's only behavior) is isotropic. g != 0 is supported by the
    engine volume family (media/medium.hg_phase) and by all three fused
    Pallas kernels — render + diff (baked / traced with diff_g=True) and
    the geometric dual kernel (kernels/dual.hg_phase: the phase value
    toward the theta-dependent light direction carries dual tangents).

    density: optional spatially-varying density field (media/density.py;
    ours — the reference medium is strictly homogeneous). None (default)
    is the homogeneous medium. When set, sigma_a(x)/sigma_s(x) =
    sigma_a/sigma_s * density(x); supported by BOTH volume distance
    families (free-flight and equi-angular — the EA transform is pure
    geometry, only Tr/T/sigma_s(xt) swap to the field forms) in the
    engine and in all three fused kernels (render, diff — incl. traced
    fog_k via diff_field=True, free-flight-only — and the geometric dual
    kernel); the voxel-grid field is engine-only."""

    sigma_a: jnp.ndarray
    sigma_s: jnp.ndarray
    g: jnp.ndarray | float = 0.0
    density: "object | None" = None     # media.density.DensityField

    @property
    def sigma_t(self) -> jnp.ndarray:
        return self.sigma_a + self.sigma_s


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    radius: jnp.ndarray     # (S,)   radius; r == 0 => point light (Sphere.h:14)
    center: jnp.ndarray     # (S, 3)
    albedo: jnp.ndarray     # (S, 3) diffuse color `c`
    radiance: jnp.ndarray   # (S, 3) emission; any channel > 0 => emitter
    material: jnp.ndarray   # (S,)   int32 material code
    eta: jnp.ndarray        # (S, 3) conductor IOR (real part)
    kappa: jnp.ndarray      # (S, 3) conductor IOR (imaginary part)
    alpha: jnp.ndarray      # (S,)   Beckmann roughness
    medium: Medium
    # --- static (trace-time) light structure, computed by make_scene.
    # Emitter SETS are decided at scene construction; integrators specialize
    # on them instead of scanning all spheres per bounce (the reference scans
    # every sphere every bounce, vptShadeMethods.h:1293-1303 — on TPU that
    # multiplies every NEE/MIS tensor by S for no benefit).
    emitter_idx: tuple = dataclasses.field(
        default=(), metadata=dict(static=True))      # any-channel emitters
    mis_light_idx: tuple = dataclasses.field(
        default=(), metadata=dict(static=True))      # r > 0 && radiance.x > 0
    point_idx: tuple = dataclasses.field(
        default=(), metadata=dict(static=True))      # r == 0 (point sources)

    @property
    def count(self) -> int:
        return self.radius.shape[0]

    def is_emitter(self) -> jnp.ndarray:
        """Any-channel emitter test, matching the light-pick loop of the
        active integrator (reference vptShadeMethods.h:1296)."""
        return jnp.any(self.radiance > 0.0, axis=-1)

    def is_emitter_red(self) -> jnp.ndarray:
        """radiance.x > 0 test used by MIS's spherical-light scan
        (reference misSamplingFunctions.h:29,106)."""
        return self.radiance[..., 0] > 0.0

    def astype(self, dtype) -> "Scene":
        f = lambda a: a.astype(dtype)
        return dataclasses.replace(
            self,
            radius=f(self.radius), center=f(self.center), albedo=f(self.albedo),
            radiance=f(self.radiance),
            eta=f(self.eta), kappa=f(self.kappa), alpha=f(self.alpha),
            medium=Medium(f(self.medium.sigma_a), f(self.medium.sigma_s),
                          f(jnp.asarray(self.medium.g)),
                          self.medium.density if self.medium.density is None
                          else dataclasses.replace(
                              self.medium.density,
                              params=f(self.medium.density.params))),
        )


def make_scene(
    spheres: Sequence[tuple],
    sigma_a: float = 0.001,
    sigma_s: float = 0.009,
    g: float = 0.0,
    density=None,
    dtype=jnp.float32,
) -> Scene:
    """Build a Scene from (radius, center, albedo, radiance, material, eta,
    kappa, alpha) tuples — the reference Sphere constructor order
    (include/Sphere.h:23)."""
    import numpy as np

    n = len(spheres)
    radius = np.zeros((n,), np.float64)
    center = np.zeros((n, 3), np.float64)
    albedo = np.zeros((n, 3), np.float64)
    radiance = np.zeros((n, 3), np.float64)
    material = np.zeros((n,), np.int32)
    eta = np.zeros((n, 3), np.float64)
    kappa = np.zeros((n, 3), np.float64)
    alpha = np.zeros((n,), np.float64)
    for i, (r, p, c, rad, m, e, k, a) in enumerate(spheres):
        radius[i] = r
        center[i] = p
        albedo[i] = c
        radiance[i] = rad
        material[i] = m
        eta[i] = e
        kappa[i] = k
        alpha[i] = a
    emitter_idx = tuple(int(i) for i in np.flatnonzero((radiance > 0).any(-1)))
    mis_light_idx = tuple(
        int(i) for i in np.flatnonzero((radiance[:, 0] > 0) & (radius > 0))
    )
    point_idx = tuple(int(i) for i in np.flatnonzero(radius == 0))
    as_ = lambda a: jnp.asarray(a, dtype)
    return Scene(
        radius=as_(radius), center=as_(center), albedo=as_(albedo),
        radiance=as_(radiance), material=jnp.asarray(material),
        eta=as_(eta), kappa=as_(kappa), alpha=as_(alpha),
        medium=Medium(jnp.asarray(sigma_a, dtype), jnp.asarray(sigma_s, dtype),
                      jnp.asarray(g, dtype), density),
        emitter_idx=emitter_idx, mis_light_idx=mis_light_idx,
        point_idx=point_idx,
    )


_Z3 = (0.0, 0.0, 0.0)

# Aluminum spectral IOR used by the reference scenes (Sphere.cpp:17).
ALUMINUM_ETA = (1.66058, 0.88143, 0.521467)
ALUMINUM_KAPPA = (9.2282, 6.27077, 4.83803)
# Gold spectral IOR from the commented alternates (Sphere.cpp:82).
GOLD_ETA = (0.143245, 0.377423, 1.43919)
GOLD_KAPPA = (3.98479, 2.3847, 1.60434)


# The reference's ACTIVE scene table (Sphere.cpp:7-23) as exact python
# floats — also consumed by the f64 replay oracle (core/replay.py), which
# must NOT go through jnp (without x64, jnp silently truncates to f32).
CORNELL_VPT_SPHERES = (
    (1e5, (-1e5 - 49, 0, 0), (0.5, 0.5, 0.5), _Z3, LAMBERT, _Z3, _Z3, 0.0),
    (1e5, (1e5 + 49, 0, 0), (0.0, 0.0, 0.5), _Z3, LAMBERT, _Z3, _Z3, 0.0),
    (1e5, (0, 0, -1e5 - 81.6), (0.5, 0.5, 0.5), _Z3, LAMBERT, _Z3, _Z3, 0.0),
    (1e5, (0, -1e5 - 40.8, 0), (0.5, 0.5, 0.5), _Z3, LAMBERT, _Z3, _Z3, 0.0),
    (1e5, (0, 1e5 + 40.8, 0), (0.5, 0.5, 0.5), _Z3, LAMBERT, _Z3, _Z3, 0.0),
    (16.5, (-23, -24.3, -34.6), _Z3, _Z3, MICROFACET, ALUMINUM_ETA, ALUMINUM_KAPPA, 0.09),
    (16.5, (23, -24.3, -3.6), (0.0, 0.0, 0.9), _Z3, LAMBERT, _Z3, _Z3, 0.0),
    (2.0, (0, 24.3, -35), _Z3, (100, 100, 0), LAMBERT, _Z3, _Z3, 0.0),
    (0.0, (-23, 24.3, 0), _Z3, (6000, 0, 0), LAMBERT, _Z3, _Z3, 0.0),
    (2.0, (23, 24.3, 35), _Z3, (75, 75, 60), LAMBERT, _Z3, _Z3, 0.0),
)


def cornell_vpt(dtype=jnp.float32) -> Scene:
    """The reference's ACTIVE scene (Sphere.cpp:7-23): 5 giant-sphere walls,
    an aluminum microfacet sphere, a blue Lambertian sphere, two spherical
    area lights and one point light."""
    return make_scene(list(CORNELL_VPT_SPHERES), dtype=dtype)


def sigma_comparison(dtype=jnp.float32) -> Scene:
    """Commented alternate "ESCENA DOS" (Sphere.cpp:28-46): microfacet walls,
    two diffuse spheres, one point light — for comparing sigma settings."""
    return make_scene(
        [
            (1e5, (-1e5 - 49, 0, 0), _Z3, _Z3, MICROFACET, ALUMINUM_ETA, ALUMINUM_KAPPA, 0.03),
            (1e5, (1e5 + 49, 0, 0), _Z3, _Z3, MICROFACET, ALUMINUM_ETA, ALUMINUM_KAPPA, 0.03),
            (1e5, (0, 0, -1e5 - 81.6), (0.25, 0.75, 0.25), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (1e5, (0, -1e5 - 40.8, 0), (0.25, 0.75, 0.75), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (1e5, (0, 1e5 + 40.8, 0), (0.75, 0.75, 0.25), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (16.5, (-23, -24.3, -34.6), (0.75, 0.75, 0.25), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (16.5, (23, -24.3, -3.6), (0.4, 0.3, 0.2), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (0.0, (14, -24.3, -35), _Z3, (2000, 2000, 3000), LAMBERT, _Z3, _Z3, 0.0),
        ],
        dtype=dtype,
    )


def light_near_camera(dtype=jnp.float32) -> Scene:
    """Commented alternate "ESCENA 3" (Sphere.cpp:49-62): source close to the
    camera, two diffuse spheres, no walls."""
    return make_scene(
        [
            (30.0, (0, 11.2, 165), (0.0, 0.25, 0.75), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (16.5, (0, -10, 200), (0.75, 0.75, 0.75), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (0.0, (0, 11.2, 204), _Z3, (400, 400, 400), LAMBERT, _Z3, _Z3, 0.0),
        ],
        dtype=dtype,
    )


def near_point_area_sources(dtype=jnp.float32) -> Scene:
    """Commented alternate "fuentes de area que tienden a puntuales"
    (Sphere.cpp:65-77): walls + aluminum sphere + one small area source."""
    return make_scene(
        [
            (1e5, (-1e5 - 49, 0, 0), (0.75, 0.25, 0.25), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (1e5, (1e5 + 49, 0, 0), (0.25, 0.25, 0.75), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (1e5, (0, 0, -1e5 - 81.6), (0.25, 0.75, 0.25), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (1e5, (0, -1e5 - 40.8, 0), (0.25, 0.75, 0.75), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (16.5, (-23, -24.3, -34.6), _Z3, _Z3, MICROFACET, ALUMINUM_ETA, ALUMINUM_KAPPA, 0.03),
            (12.0, (24, 24.3, -50), _Z3, (0, 800, 800), LAMBERT, _Z3, _Z3, 0.0),
        ],
        dtype=dtype,
    )


def one_primitive_infinite(dtype=jnp.float32) -> Scene:
    """Commented alternate "1 primitive infinite" (Sphere.cpp:79-89): no
    walls, three metal spheres floating in space, three point lights."""
    return make_scene(
        [
            (16.5, (-23, -24.3, -34.6), _Z3, _Z3, MICROFACET, ALUMINUM_ETA, ALUMINUM_KAPPA, 0.03),
            (16.5, (23, -24.3, -3.6), _Z3, _Z3, MICROFACET, GOLD_ETA, GOLD_KAPPA, 0.3),
            (100.0, (0, -24.3, -200), _Z3, _Z3, MICROFACET, GOLD_ETA, GOLD_KAPPA, 0.02),
            (0.0, (24, 24.3, -3.6), _Z3, (2000, 2000, 2000), LAMBERT, _Z3, _Z3, 0.0),
            (0.0, (-24, 10, -34.6), _Z3, (2000, 5000, 1000), LAMBERT, _Z3, _Z3, 0.0),
            (0.0, (0, -24.3, -30), _Z3, (4000, 8000, 4000), LAMBERT, _Z3, _Z3, 0.0),
        ],
        dtype=dtype,
    )


def simple_cornell(dtype=jnp.float32) -> Scene:
    """Commented alternate simple Cornell (Sphere.cpp:91-106): gray walls,
    one diffuse sphere, two point lights."""
    return make_scene(
        [
            (1e5, (-1e5 - 49, 0, 0), (0.5, 0.5, 0.5), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (1e5, (1e5 + 49, 0, 0), (0.5, 0.5, 0.5), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (1e5, (0, 0, -1e5 - 81.6), (0.5, 0.5, 0.5), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (1e5, (0, -1e5 - 40.8, 0), (0.5, 0.5, 0.5), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (1e5, (0, 1e5 + 40.8, 0), (0.5, 0.5, 0.5), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (16.5, (23, -24.3, -3.6), (0.5, 0.5, 0.0), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (0.0, (-23, 0, -10.6), (1, 1, 1), (6000, 6000, 6000), LAMBERT, _Z3, _Z3, 0.0),
            (0.0, (23, 24.3, -50), (1, 1, 1), (4000, 4000, 4000), LAMBERT, _Z3, _Z3, 0.0),
        ],
        dtype=dtype,
    )


def medium_shell(dtype=jnp.float32) -> Scene:
    """Capability scene (ours; the reference keeps these code paths alive
    but ships no material-3 scene): gray walls, a volumetric boundary
    sphere (material 3) in front of a diffuse sphere, one point light and
    one area light — exercises intersectVPT / multipleT / visibilityVPT and
    the marching surface tracer (vptShadeMethods.h:398-495)."""
    return make_scene(
        [
            (1e5, (-1e5 - 49, 0, 0), (0.6, 0.3, 0.3), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (1e5, (1e5 + 49, 0, 0), (0.3, 0.3, 0.6), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (1e5, (0, 0, -1e5 - 81.6), (0.5, 0.5, 0.5), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (1e5, (0, -1e5 - 40.8, 0), (0.5, 0.5, 0.5), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (1e5, (0, 1e5 + 40.8, 0), (0.5, 0.5, 0.5), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (14.0, (0, -10.0, -10.0), (1, 1, 1), _Z3, VOLUME_BOUNDARY, _Z3, _Z3, 0.0),
            (10.0, (20, -30.8, -40.0), (0.7, 0.6, 0.2), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (0.0, (-20, 24.3, 10), _Z3, (4000, 3500, 3000), LAMBERT, _Z3, _Z3, 0.0),
            (2.0, (23, 24.3, 35), _Z3, (75, 75, 60), LAMBERT, _Z3, _Z3, 0.0),
        ],
        dtype=dtype,
    )


def foggy_cornell(dtype=jnp.float32) -> Scene:
    """Heterogeneous capability scene (ours): the reference's active Cornell
    geometry immersed in GROUND FOG — an exp_height density field
    d(x) = exp(-k (y - y0)) anchored at the floor (y0 = -40.8, k = 0.06:
    density 1.0 at the floor, ~0.007 at the ceiling) with a denser medium
    (sigma_t = 0.04). Free-flight distances invert in closed form
    (media/density.py); transmittance is a single expm1."""
    from ..media.density import exp_height

    return make_scene(
        list(CORNELL_VPT_SPHERES), sigma_a=0.004, sigma_s=0.036,
        # majorant: the floor wall is a giant sphere whose surface dips
        # ~0.012 below y=-40.8 at the side walls — 1.01 covers it
        density=exp_height(k=0.06, y0=-40.8, majorant=1.01, dtype=dtype),
        dtype=dtype,
    )


def blob_cloud(dtype=jnp.float32) -> Scene:
    """Heterogeneous capability scene (ours): three overlapping Gaussian
    density blobs ("smoke puffs") hanging between the camera and an open
    two-sphere arrangement lit by a point light (geometry from the
    light_near_camera alternate, Sphere.cpp:49-62). Distance sampling is
    delta (Woodcock) tracking against the majorant; transmittance is the
    closed-form erf line integral (media/density.py)."""
    from ..media.density import blobs

    return make_scene(
        [
            (12.0, (-18, -8, 150), (0.75, 0.3, 0.2), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            (12.0, (18, -8, 160), (0.2, 0.4, 0.75), _Z3, LAMBERT, _Z3, _Z3, 0.0),
            # sphere light (not a point source: the reference's missing-else
            # quirk zeroes point-light medium NEE, media/nee.py — a sphere
            # emitter keeps the in-scattered blob glow on the default
            # estimator)
            (3.0, (0, 35, 190), _Z3, (130, 130, 115), LAMBERT, _Z3, _Z3, 0.0),
        ],
        sigma_a=0.004, sigma_s=0.04,
        density=blobs([
            # cx, cy, cz, radius, weight
            (-8.0, 2.0, 178.0, 9.0, 0.9),
            (8.0, -2.0, 170.0, 12.0, 0.7),
            (0.0, 10.0, 162.0, 8.0, 1.0),
        ], majorant=1.8, dtype=dtype),
        dtype=dtype,
    )


SCENES = {
    "cornell_vpt": cornell_vpt,
    "foggy_cornell": foggy_cornell,
    "blob_cloud": blob_cloud,
    "medium_shell": medium_shell,
    "sigma_comparison": sigma_comparison,
    "light_near_camera": light_near_camera,
    "near_point_area_sources": near_point_area_sources,
    "one_primitive_infinite": one_primitive_infinite,
    "simple_cornell": simple_cornell,
}
