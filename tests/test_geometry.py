import jax
import jax.numpy as jnp
import numpy as np

from vpt.geometry import intersect as geo
from vpt.scene import scene as sc


def tiny_scene(dtype=jnp.float64):
    # unit sphere at origin + big sphere behind + point light
    return sc.make_scene(
        [
            (1.0, (0, 0, 0), (0.5, 0.5, 0.5), (0, 0, 0), 0, (0, 0, 0), (0, 0, 0), 0.0),
            (2.0, (0, 0, -10), (0.5, 0.5, 0.5), (0, 0, 0), 0, (0, 0, 0), (0, 0, 0), 0.0),
            (0.0, (0, 5, 0), (0, 0, 0), (100, 100, 100), 0, (0, 0, 0), (0, 0, 0), 0.0),
        ],
        dtype=dtype,
    )


def test_roots_basic():
    s = tiny_scene()
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t1, t2, det = geo.sphere_roots(o, d, s)
    np.testing.assert_allclose(t1[0, 0], 4.0, rtol=1e-12)
    np.testing.assert_allclose(t2[0, 0], 6.0, rtol=1e-12)
    assert bool(det[0, 0])
    # sphere 1: center z=-10 r=2 -> t in [13, 17]
    np.testing.assert_allclose(t1[0, 1], 13.0, rtol=1e-12)
    np.testing.assert_allclose(t2[0, 1], 17.0, rtol=1e-12)
    # point light r=0: no hit
    assert not bool(det[0, 2])


def test_nearest_hit_and_miss():
    s = tiny_scene()
    o = jnp.array([[0.0, 0.0, 5.0], [0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    hit, t, idx = geo.nearest_hit(o, d, s)
    assert bool(hit[0]) and not bool(hit[1])
    np.testing.assert_allclose(t[0], 4.0, rtol=1e-12)
    assert t[1] == 0.0  # reference leaves t = 0 on miss
    assert int(idx[0]) == 0


def test_inside_sphere_rescue():
    """From inside a sphere, t1 < 0, the rescue returns t2 (Sphere.h:34)."""
    s = tiny_scene()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit, t, idx = geo.nearest_hit(o, d, s)
    assert bool(hit[0])
    np.testing.assert_allclose(t[0], 1.0, rtol=1e-12)


def test_on_surface_epsilon_rescue():
    """A ray starting ON the sphere surface must not re-hit at t ~ 0."""
    s = tiny_scene()
    o = jnp.array([[0.0, 0.0, 1.0]])  # on the unit sphere
    d = jnp.array([[0.0, 0.0, -1.0]])  # through the sphere
    hit, t, idx = geo.nearest_hit(o, d, s)
    assert bool(hit[0])
    np.testing.assert_allclose(t[0], 2.0, rtol=1e-9)  # exits at z=-1


def test_visibility_from_light():
    s = tiny_scene()
    # point occluded by the unit sphere from the light at (0,5,0)
    x_blocked = jnp.array([[0.0, -3.0, 0.0]])
    x_clear = jnp.array([[3.0, 5.0, 0.0]])
    light = s.center[2]
    assert not bool(geo.visibility(light, x_blocked, s)[0])
    assert bool(geo.visibility(light, x_clear, s)[0])


def test_skip_volume_spheres():
    spheres = [
        (1.0, (0, 0, 0), (0.5, 0.5, 0.5), (0, 0, 0), sc.VOLUME_BOUNDARY, (0, 0, 0), (0, 0, 0), 0.0),
        (2.0, (0, 0, -10), (0.5, 0.5, 0.5), (0, 0, 0), 0, (0, 0, 0), (0, 0, 0), 0.0),
    ]
    s = sc.make_scene(spheres, dtype=jnp.float64)
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit, t, idx = geo.nearest_hit(o, d, s, skip_volume=True)
    assert bool(hit[0]) and int(idx[0]) == 1
    np.testing.assert_allclose(t[0], 13.0, rtol=1e-12)


def test_giant_sphere_f32_accuracy():
    """Walls of radius 1e5: f32 stable quadratic must localize the hit to
    ~1e-2 absolute (documented f32 tolerance in vpt.geometry.intersect)."""
    wall = [(1e5, (-1e5 - 49, 0, 0), (0.5, 0.5, 0.5), (0, 0, 0), 0, (0, 0, 0), (0, 0, 0), 0.0)]
    s32 = sc.make_scene(wall, dtype=jnp.float32)
    s64 = sc.make_scene(wall, dtype=jnp.float64)
    o = jnp.array([[0.0, 11.2, 214.0]])
    d = jnp.array([[-0.5, -0.02, -1.0]])
    d = d / jnp.linalg.norm(d)
    _, t32, _ = geo.nearest_hit(o.astype(jnp.float32), d.astype(jnp.float32), s32)
    _, t64, _ = geo.nearest_hit(o, d, s64)
    assert abs(float(t32[0]) - float(t64[0])) < 3e-2


def test_cos_theta_max():
    s = tiny_scene()
    x = jnp.array([[0.0, 0.0, 2.0]])
    cm = geo.cos_theta_max(s, jnp.array([0]), x)
    np.testing.assert_allclose(cm[0], np.sqrt(1 - 0.25), rtol=1e-12)
