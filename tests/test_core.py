import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt.core import vecmath as vm
from vpt.core import rng


def test_dot_cross_normalize():
    a = jnp.array([[1.0, 2.0, 3.0], [0.0, 0.0, 2.0]])
    b = jnp.array([[4.0, 5.0, 6.0], [1.0, 0.0, 0.0]])
    np.testing.assert_allclose(vm.dot(a, b), [32.0, 0.0])
    np.testing.assert_allclose(vm.cross(a, b)[0], [-3.0, 6.0, -3.0])
    n = vm.normalize(a)
    np.testing.assert_allclose(vm.norm(n), [1.0, 1.0], rtol=1e-6)


def test_onb_orthonormal():
    key = jax.random.PRNGKey(0)
    n = vm.normalize(jax.random.normal(key, (128, 3)))
    s, t = vm.build_onb(n)
    np.testing.assert_allclose(vm.dot(s, t), 0.0, atol=1e-5)
    np.testing.assert_allclose(vm.dot(s, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(vm.dot(t, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(vm.norm(s), 1.0, rtol=1e-5)
    np.testing.assert_allclose(vm.norm(t), 1.0, rtol=1e-5)


def test_to_local_roundtrip():
    key = jax.random.PRNGKey(1)
    n = vm.normalize(jax.random.normal(key, (64, 3)))
    w = vm.normalize(jax.random.normal(jax.random.fold_in(key, 1), (64, 3)))
    local = vm.to_local(n, w)
    # n maps to +z
    np.testing.assert_allclose(vm.to_local(n, n)[:, 2], 1.0, atol=1e-5)
    back = vm.from_local(n, local)
    np.testing.assert_allclose(back, w, atol=1e-5)


def test_display_value_matches_reference_formula():
    # toDisplayValue(x) = int(pow(clamp(x), 1/2.2) * 255 + .5)
    # (mathUtilities.h:43-45)
    xs = jnp.array([-0.5, 0.0, 0.25, 0.5, 1.0, 2.0])
    got = vm.to_display_value(xs)
    want = [int(np.power(np.clip(x, 0, 1), 1 / 2.2) * 255 + 0.5) for x in np.array(xs)]
    np.testing.assert_array_equal(np.array(got), want)


def test_rng_streams_distinct_and_deterministic():
    key = jax.random.PRNGKey(7)
    a = rng.uniform(rng.fold(key, rng.Tag.RR), (100,))
    b = rng.uniform(rng.fold(key, rng.Tag.DISTANCE), (100,))
    a2 = rng.uniform(rng.fold(key, rng.Tag.RR), (100,))
    assert not np.allclose(a, b)
    np.testing.assert_array_equal(a, a2)
    assert float(jnp.min(a)) >= 0.0 and float(jnp.max(a)) < 1.0


def test_native_ppm_matches_python():
    """The C extension (if built) must produce byte-identical P3 files and
    identical tonemap/read results to the pure-Python reference impl."""
    import importlib
    import tempfile, os
    import numpy as np
    import vpt.io.ppm as P

    if not P.native_available():
        import pytest
        pytest.skip("native _ppmio not built")
    rng = np.random.default_rng(3)
    img = rng.random((24, 32, 3)) * 1.5
    with tempfile.TemporaryDirectory() as tmp:
        nat, py = os.path.join(tmp, "nat.ppm"), os.path.join(tmp, "py.ppm")
        P.write_ppm(nat, img)
        saved = P._ppmio
        try:
            P._ppmio = None
            P.write_ppm(py, img)
            q_py = P.tonemap(img)
        finally:
            P._ppmio = saved
        assert open(nat, "rb").read() == open(py, "rb").read()
        assert np.array_equal(P.tonemap(img), q_py)
        assert np.array_equal(P.read_ppm(nat), q_py)


def test_erand48_matches_libc():
    """The erand48 oracle backend must be bit-exact vs glibc (SURVEY §7.2)."""
    import ctypes
    import numpy as np
    from vpt.core.rng import erand48_state, erand48_sequence

    try:
        libc = ctypes.CDLL("libc.so.6")
    except OSError:
        import pytest
        pytest.skip("no glibc")
    libc.erand48.restype = ctypes.c_double
    seed = (ctypes.c_ushort * 3)(0x1234, 0xABCD, 0x5678)
    ref = [libc.erand48(seed) for _ in range(64)]
    mine, _ = erand48_sequence(erand48_state([0x1234, 0xABCD, 0x5678]), 64)
    assert np.array_equal(ref, mine)


def test_write_png_decodes_to_tonemap():
    """write_png emits a valid 8-bit RGB PNG whose pixels equal the
    clamp+gamma-2.2 quantizer output (decoded with PIL)."""
    import tempfile, os
    import numpy as np
    import pytest
    import vpt.io.ppm as P

    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(7)
    img = rng.random((17, 23, 3)) * 1.4
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "t.png")
        P.write_png(path, img)
        decoded = np.asarray(PIL.open(path))
    assert np.array_equal(decoded,
                          np.clip(P.tonemap(img), 0, 255).astype(np.uint8))


def test_look_at_camera():
    import numpy as np
    import vpt

    cam = vpt.look_at((1.0, 2.0, 3.0), (1.0, 2.0, -7.0))
    np.testing.assert_allclose(np.asarray(cam.direction), [0, 0, -1],
                               atol=1e-7)
    assert float(cam.fov_scale) == np.float32(0.5095)


def test_image_metrics():
    import numpy as np
    from vpt.utils.metrics import mse, psnr, rel_mse

    a = np.zeros((4, 4, 3))
    b = np.full((4, 4, 3), 0.1)
    assert abs(mse(a, b) - 0.01) < 1e-12
    assert abs(psnr(b, b)) == float("inf")
    assert abs(psnr(a, b) - 20.0) < 1e-9
    # rel_mse down-weights bright pixels: same absolute error, brighter ref
    bright = np.full((4, 4, 3), 10.0)
    assert rel_mse(bright + 0.1, bright) < rel_mse(b + 0.1, b)
