"""JSON scene file round-trip + CLI --scene-file / --dump-scene drive.

The reference's scene "format" is a recompiled C++ table (Sphere.cpp:7-23);
vpt.scene.io makes scenes data. Round-trips must be exact: floats are
serialized at full repr precision and make_scene re-derives the static
emitter/light index tuples.
"""
import json

import numpy as np
import pytest

import vpt
from vpt.scene.io import scene_to_dict, scene_from_dict


def test_round_trip_exact(tmp_path):
    scene = vpt.cornell_vpt()
    cam = vpt.default_camera()
    path = tmp_path / "scene.json"
    vpt.save_scene(str(path), scene, cam)
    back, cam2 = vpt.load_scene(str(path))

    for f in ("radius", "center", "albedo", "radiance", "material",
              "eta", "kappa", "alpha"):
        np.testing.assert_array_equal(np.asarray(getattr(scene, f)),
                                      np.asarray(getattr(back, f)), err_msg=f)
    assert float(back.medium.sigma_a) == float(scene.medium.sigma_a)
    assert float(back.medium.sigma_s) == float(scene.medium.sigma_s)
    assert back.emitter_idx == scene.emitter_idx
    assert back.mis_light_idx == scene.mis_light_idx
    assert back.point_idx == scene.point_idx
    np.testing.assert_allclose(np.asarray(cam2.origin),
                               np.asarray(cam.origin))
    np.testing.assert_allclose(np.asarray(cam2.direction),
                               np.asarray(cam.direction), atol=1e-7)
    assert float(cam2.fov_scale) == float(cam.fov_scale)


def test_missing_fields_default_like_reference():
    d = {"spheres": [{"radius": 2.0, "center": [0, 24.3, -35],
                      "radiance": [100, 100, 0]}]}
    scene, cam = scene_from_dict(d)
    assert cam is None
    assert scene.emitter_idx == (0,)
    assert float(scene.medium.sigma_a) == np.float32(0.001)  # rt.cpp:794
    assert int(np.asarray(scene.material)[0]) == 0


def test_cli_scene_file_and_dump(tmp_path):
    from vpt.cli import main

    # dump the default scene, re-render from the file, byte-compare outputs
    sf = tmp_path / "cornell.json"
    assert main(["--dump-scene", str(sf)]) == 0
    d = json.loads(sf.read_text())
    assert len(d["spheres"]) == 10 and "camera" in d

    out_a = tmp_path / "a.ppm"
    out_b = tmp_path / "b.ppm"
    common = ["4", "--width", "16", "--height", "12", "--max-bounces", "4",
              "--renderer", "scan", "--chunk-pixels", "192"]
    assert main(common + ["-o", str(out_a)]) == 0
    assert main(common + ["--scene-file", str(sf), "-o", str(out_b)]) == 0
    assert out_a.read_bytes() == out_b.read_bytes()

    # sigma flag still overrides the file
    out_c = tmp_path / "c.ppm"
    assert main(common + ["--scene-file", str(sf), "--sigma-s", "0.05",
                          "-o", str(out_c)]) == 0
    assert out_c.read_bytes() != out_b.read_bytes()


def test_density_field_round_trip(tmp_path):
    """Heterogeneous scenes (Medium.density) survive the JSON round trip:
    field kind/params/majorant/max_null and the rendered image match."""
    import vpt
    from vpt.scene.io import save_scene, load_scene

    for name in ("foggy_cornell", "blob_cloud"):
        scene = vpt.SCENES[name]()
        p = tmp_path / f"{name}.json"
        save_scene(str(p), scene)
        loaded, _ = load_scene(str(p))
        f0, f1 = scene.medium.density, loaded.medium.density
        assert f1 is not None and f1.kind == f0.kind
        assert f1.majorant == f0.majorant and f1.max_null == f0.max_null
        np.testing.assert_allclose(np.asarray(f1.params).ravel(),
                                   np.asarray(f0.params).ravel(), rtol=1e-6)
        cfg = vpt.RenderConfig(width=16, height=8, spp=4, max_bounces=6,
                               renderer="persistent")
        a = np.asarray(vpt.render(scene, vpt.default_camera(), cfg))
        b = np.asarray(vpt.render(loaded, vpt.default_camera(), cfg))
        np.testing.assert_array_equal(a, b)
