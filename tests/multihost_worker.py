"""Worker process for the multi-controller DCN rehearsal tests.

Not a test module: spawned by tests/test_multihost.py, one process per
"host". Runs JAX multi-controller on CPU with gloo cross-process
collectives — the same jax.distributed + global-mesh + shard_map path a TPU
pod uses (DCN replaced by gloo over localhost), per SURVEY.md §2.12 and the
dist/multihost.py docstring.

argv: <mode> <process_id> <num_processes> <port> <out.npz> [local_devices]
mode: "smoke" (collectives only) | "full" (sharded render + assemble +
SPMD train steps)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

mode = sys.argv[1]
pid = int(sys.argv[2])
nproc = int(sys.argv[3])
port = sys.argv[4]
out = sys.argv[5]
local_dev = int(sys.argv[6]) if len(sys.argv) > 6 else 4

# The image pre-imports jax (sitecustomize) with the TPU tunnel platform:
# platform choice must go through jax.config, but XLA_FLAGS is still read
# at (CPU) backend init, which happens after jax.distributed.initialize.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={local_dev}"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vpt.dist import multihost  # noqa: E402

multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.local_device_count() == local_dev
mesh = multihost.global_mesh()


def fetch_replicated(x):
    """Host value of a replicated global array (every process holds a
    replica; addressable_shards[0] is this host's copy)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return np.asarray(x.addressable_shards[0].data)
    return np.asarray(x)


if mode == "smoke":
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    n = jax.device_count()
    x = multihost_utils.host_local_array_to_global_array(
        jnp.arange(float(local_dev)) + float(local_dev) * pid, mesh,
        P("data"))
    s = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
    total = float(fetch_replicated(s))
    assert total == n * (n - 1) / 2, total
    np.savez(out, total=total, nproc=jax.process_count(), ndev=n)
    print(f"[{pid}] smoke ok total={total}", flush=True)
    sys.exit(0)

if mode == "kernel":
    # round 5 (VERDICT #7): the PRODUCTION fast path across process
    # boundaries — interpret-mode fused diff pair under shard_map on the
    # 2-process gloo mesh (make_sharded_kernel_train_step), the last
    # distributed configuration this rig can express. Loss must match the
    # single-process run of the identical program (pure re-partitioning).
    #
    # HARNESS PATCH (upstream single-controller assumption): interpret-
    # mode Pallas sizes its simulated-shared-memory thread barriers by the
    # GLOBAL device count (threading.Barrier(num_devices),
    # jax/_src/pallas/mosaic/interpret/interpret_pallas_call.py) — under
    # multi-controller each process only runs its LOCAL shards, so the
    # barrier can never fill and every worker deadlocks (observed:
    # io_callback threads parked in _barrier). Our per-device kernels do
    # no cross-device DMAs/semaphores — each pallas_call is independent,
    # the only collective is the XLA psum OUTSIDE the kernel — so
    # localizing the barrier to the process's own device threads is
    # semantically sound here. TPU hardware has no such barrier; this
    # touches the CPU interpreter only.
    import threading  # noqa: E402

    from jax._src.pallas.mosaic.interpret import (  # noqa: E402
        interpret_pallas_call as _ipc,
    )

    _orig_init = _ipc._initialize_shared_memory

    def _localized_init(device_id, num_devices, num_cores_per_device, *,
                        interpret_params):
        _orig_init(device_id, num_devices, num_cores_per_device,
                   interpret_params=interpret_params)
        sm = _ipc._get_shared_memory()
        local_n = jax.local_device_count()
        if sm.num_devices > local_n and not getattr(sm, "_localized", False):
            sm.barrier = threading.Barrier(
                local_n, action=_ipc._update_clocks_for_global_barrier)
            sm.clean_up_barrier = threading.Barrier(
                local_n, action=_ipc._clear_shared_memory)
            sm._localized = True

    _ipc._initialize_shared_memory = _localized_init

    import optax  # noqa: E402

    import vpt  # noqa: E402
    from vpt.dist.train_fast import make_sharded_kernel_train_step  # noqa: E402
    from vpt.kernels.diff import pack_params  # noqa: E402

    scene = vpt.cornell_vpt()
    camera = vpt.default_camera()
    W, H = 8, 8       # dryrun-sized: the interpret diff-pair compile is
    opt = optax.adam(1e-2)   # minutes even at tiny shapes; W=16 wedged
    params = pack_params(scene)
    opt_state = opt.init(params)
    target = jnp.zeros((W * H, 3), jnp.float32)
    step = make_sharded_kernel_train_step(
        scene, camera, W, H, spp=2, optimizer=opt, mesh=mesh,
        max_bounces=3, tile_rows=8, interpret=True)
    p2, opt_state, loss = step(params, opt_state, target, 0)
    p2, opt_state, loss2 = step(p2, opt_state, target, 1)
    loss = float(fetch_replicated(loss))
    finite = all(np.isfinite(fetch_replicated(v)).all()
                 for v in jax.tree_util.tree_leaves(p2))
    # any-leaf motion over two steps, computed ON DEVICE as a replicated
    # reduction: per-process host fetches of individual updated leaves
    # proved flaky on the non-coordinator process, while the replicated
    # jit value is consistent across processes by construction

    @jax.jit
    def _max_delta(a, b):
        ds = [jnp.max(jnp.abs(x.astype(jnp.float32) - y))
              for x, y in zip(jax.tree_util.tree_leaves(a),
                              jax.tree_util.tree_leaves(b))]
        return jnp.max(jnp.stack(ds))

    moved = float(fetch_replicated(_max_delta(params, p2))) > 0.0
    np.savez(out, loss=loss, loss2=float(fetch_replicated(loss2)),
             finite=finite, moved=moved,
             nproc=jax.process_count(), ndev=jax.device_count())
    print(f"[{pid}] kernel ok loss={loss} finite={finite}", flush=True)
    sys.exit(0)

# mode == "full": sharded render -> DCN image assembly -> SPMD train steps
import optax  # noqa: E402

import vpt  # noqa: E402
from vpt import dist  # noqa: E402
from vpt.integrators import engine  # noqa: E402

scene = vpt.cornell_vpt()
camera = vpt.default_camera()
W, H, SPP, B = 32, 24, 4, 4

cfg = vpt.RenderConfig(width=W, height=H, spp=SPP, max_bounces=B, seed=7)
flat = dist.render_sharded(scene, camera, cfg, mesh, backend="engine")
img = multihost.assemble_image(flat.reshape(-1, 3), cfg)
assert np.isfinite(img).all()

spec = engine.IntegratorSpec(max_bounces=B)
opt = optax.adam(1e-2)
step = dist.make_train_step(mesh, spec, W, H, SPP, opt)
params = dist.scene_params(scene, camera)
params = {**params, "sigma_a": params["sigma_a"] * 2.0}
opt_state = opt.init(params)
npix = W * H
n_data = mesh.shape["data"]
padded = -(-npix // n_data) * n_data
pixel_ids = np.minimum(np.arange(padded, dtype=np.int32), npix - 1)
target = jnp.asarray(img.reshape(-1, 3)[pixel_ids])
key = jax.random.PRNGKey(3)
losses = []
for i in range(2):
    params, opt_state, loss = step(params, opt_state, scene, camera,
                                   target, jnp.asarray(pixel_ids),
                                   jax.random.fold_in(key, i))
    losses.append(float(fetch_replicated(loss)))

finite = all(np.isfinite(fetch_replicated(v)).all()
             for v in jax.tree_util.tree_leaves(params))
np.savez(out, img=img, losses=np.asarray(losses), finite=finite,
         nproc=jax.process_count(), ndev=jax.device_count())
print(f"[{pid}] full ok losses={losses} finite={finite}", flush=True)
