"""Multi-controller (multi-"host") DCN rehearsal.

BASELINE.md's scaling contract covers 1 chip -> 1 host -> >=2 hosts; single
host is exercised everywhere else (8-virtual-device mesh). These tests
rehearse the >=2-hosts leg for real: two separate processes bring up
`jax.distributed` (dist/multihost.initialize) with 4 CPU devices each,
build ONE global 8-device (data, sample) mesh, and run the actual product
code paths — render_sharded, assemble_image's process_allgather (the DCN
hop), and make_train_step's cross-process psum — with gloo standing in for
DCN. The single-process 8-device run of the identical program is the
oracle: multi-controller SPMD must be a pure re-partitioning, so images and
losses must agree to f32 reduction-order noise.

The reference is a single process with one OpenMP loop (src/rt.cpp:767);
this file is the evidence that the TPU-native replacement actually crosses
host boundaries, not just ICI.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port():
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    # the pytest process pins XLA_FLAGS for its own 8-device backend; the
    # workers pick their own count
    env.pop("XLA_FLAGS", None)
    return env


def _launch(mode, nproc, tmp_path, timeout, tag=""):
    port = _free_port()
    local_dev = 8 // nproc  # 8 global devices regardless of process count
    outs = [str(tmp_path / f"w{tag}{i}.npz") for i in range(nproc)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, mode, str(i), str(nproc), str(port),
             outs[i], str(local_dev)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=_clean_env(), cwd=os.path.join(HERE, ".."),
        )
        for i in range(nproc)
    ]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            logs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return [np.load(o) for o in outs]


def test_two_process_collectives_smoke(tmp_path):
    """2 processes x 4 devices: global mesh forms, a cross-process psum over
    the data axis reduces values owned by BOTH processes."""
    res = _launch("smoke", 2, tmp_path, timeout=420)
    for r in res:
        assert int(r["nproc"]) == 2
        assert int(r["ndev"]) == 8
        assert float(r["total"]) == 28.0  # sum(0..7): needs both hosts' data


@pytest.mark.slow
def test_two_process_kernel_train_matches_single_process(tmp_path):
    """Round 5 (VERDICT #7): the production fast path
    (make_sharded_kernel_train_step — fused diff pair under shard_map with
    psum'd loss/grads) across 2 PROCESSES, interpret mode, vs the
    single-process 8-device run of the identical program."""
    multi = _launch("kernel", 2, tmp_path, timeout=2400)
    single = _launch("kernel", 1, tmp_path, timeout=2400, tag="s")[0]
    for r in multi:
        assert bool(r["finite"]) and bool(r["moved"])
        assert int(r["ndev"]) == 8
    for k in ("loss", "loss2"):
        assert np.isclose(float(multi[0][k]), float(multi[1][k]),
                          rtol=0, atol=0)
        assert np.isclose(float(multi[0][k]), float(single[k]),
                          rtol=1e-5, atol=1e-8), \
            (k, float(multi[0][k]), float(single[k]))


@pytest.mark.slow
def test_two_process_render_and_train_match_single_process(tmp_path):
    """The full product path across 2 processes — render_sharded +
    assemble_image + 2 SPMD train steps — agrees with the single-process
    8-device run of the identical program."""
    multi = _launch("full", 2, tmp_path, timeout=1800)
    single = _launch("full", 1, tmp_path, timeout=1800, tag="s")[0]

    img0, img1 = multi[0]["img"], multi[1]["img"]
    # every host assembled the same full frame over DCN
    np.testing.assert_array_equal(img0, img1)
    # multi-controller == single-controller (pure re-partitioning)
    np.testing.assert_allclose(img0, single["img"], rtol=0, atol=1e-6)
    np.testing.assert_allclose(multi[0]["losses"], multi[1]["losses"],
                               rtol=0, atol=0)
    np.testing.assert_allclose(multi[0]["losses"], single["losses"],
                               rtol=1e-5, atol=1e-7)
    assert bool(single["finite"]) and bool(multi[0]["finite"])
