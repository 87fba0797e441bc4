import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax.numpy as jnp
import vpt
from vpt.kernels.wavefront import build_tile_renderer

scene = vpt.cornell_vpt(); cam = vpt.default_camera()
W, H, SPP = 32, 16, 4   # 512 px, lanes=8*128=1024 -> 1 tile; use tile_rows=... hmm
# use tile_rows so we get multiple tiles: R=8 -> LANES=1024; W*H=512 -> 1 tile.
# pick W=64,H=32 => 2048 px -> 2 tiles at R=8
W, H = 64, 32
rn = build_tile_renderer(scene, cam, W, H, SPP, max_bounces=5, tile_rows=8,
                         interpret=True)
rs = build_tile_renderer(scene, cam, W, H, SPP, max_bounces=5, tile_rows=8,
                         scatter_tiles=True, interpret=True)
n_tiles, lanes = rn.num_tiles, rn.lanes_per_tile
print("tiles", n_tiles, "lanes", lanes, flush=True)
full = np.asarray(rn.make_raw(n_tiles)(jnp.int32(3), jnp.int32(0)))
bases = (jnp.arange(n_tiles) * lanes).astype(jnp.int32)
scat = np.asarray(rs.make_raw_scatter(n_tiles)(jnp.int32(3), bases))
print("scatter == contiguous (bit):", np.array_equal(full, scat), flush=True)
# reversed tile order: program i renders tile sel[i]
rev = np.asarray(rs.make_raw_scatter(n_tiles)(jnp.int32(3), bases[::-1]))
rev_fixed = rev.reshape(n_tiles, lanes, 3)[::-1].reshape(-1, 3)
print("reversed scatter == contiguous:", np.array_equal(full, rev_fixed), flush=True)

cfg = vpt.RenderConfig(width=W, height=H, spp=SPP, max_bounces=5)
img = np.asarray(vpt.render_adaptive(scene, cam, cfg, boost=2.0, frac=0.5,
                                     interpret=True))
print("adaptive finite:", np.isfinite(img).all(), "shape", img.shape,
      "mean", img.mean(), flush=True)
plain = np.asarray(rn(3)).reshape(H, W, 3)
print("plain mean", plain.mean(), flush=True)
