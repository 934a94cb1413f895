"""Multi-host runtime tests: host work partitioning + a real 2-process
jax.distributed smoke test over a local TCP coordinator."""

import os
import subprocess
import sys
import textwrap

import pytest

from dvo_slam_tpu.parallel.distributed import HostWorkPartition


def test_partition_determinism():
    parts = [HostWorkPartition(i, 4) for i in range(4)]
    owners = [[p.owns_keyframe(k) for p in parts] for k in range(12)]
    for row in owners:
        assert sum(row) == 1  # exactly one owner per keyframe
    shards = [p.frame_shard(103) for p in parts]
    covered = []
    for a, b in shards:
        covered.extend(range(a, b))
    assert covered == list(range(103))
    items = list(range(10))
    gathered = sorted(sum((p.local_items(items) for p in parts), []))
    assert gathered == items


_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
    sys.path.insert(0, {repo!r})
    import jax, jax.numpy as jnp
    # the sandbox site hook pre-imports jax._src.config with
    # JAX_PLATFORMS=axon latched; override through the live config
    jax.config.update("jax_platforms", "cpu")
    from dvo_slam_tpu.parallel.distributed import initialize, HostWorkPartition

    pid = int(sys.argv[1])
    ok = initialize("127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert ok, "expected multi-process runtime"
    assert jax.process_count() == 2
    part = HostWorkPartition.current()
    # a cross-host collective over DCN: global psum of per-process values
    from jax.experimental import multihost_utils
    total = multihost_utils.process_allgather(jnp.asarray([pid + 1.0]))
    assert float(total.sum()) == 3.0, total
    print(f"proc {{pid}} OK", flush=True)
    """
)


@pytest.mark.skipif(
    os.environ.get("DVO_SKIP_MULTIHOST") == "1", reason="multihost disabled"
)
@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = 21357
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("{port}", str(port)).format(repo=repo))
    env = dict(os.environ)
    # keep the axon site hook out of the workers entirely (it would
    # pre-import jax against the TPU tunnel before the script runs)
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    )
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"proc {pid} OK" in out


_DP_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
    sys.path.insert(0, {repo!r})
    import jax, jax.numpy as jnp
    import numpy as np
    import re
    jax.config.update("jax_platforms", "cpu")
    from dvo_slam_tpu.parallel.distributed import initialize

    pid = int(sys.argv[1])
    ok = initialize("127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert ok and jax.process_count() == 2

    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P
    from dvo_slam_tpu.config import TrackerConfig
    from dvo_slam_tpu.ops.camera import Intrinsics
    from dvo_slam_tpu.parallel import mesh as mesh_lib
    from dvo_slam_tpu.parallel.multistream import make_multistream_tracker
    from dvo_slam_tpu.utils import synthetic

    cfg = TrackerConfig(first_level=1, last_level=0, max_iterations_per_level=8)
    K = Intrinsics(40.0, 40.0, 19.5, 14.5)
    shape, T = (30, 40), 3
    iu = np.zeros((1, T) + shape, np.uint8)
    du = np.zeros((1, T) + shape, np.uint16)
    poses = synthetic.circular_trajectory(T, radius=0.02 + 0.01 * pid)
    for t in range(T):
        i_img, d_img, v = synthetic.render_frame(poses[t], K, shape, seed=9 * pid + t)
        iu[0, t] = np.clip(i_img, 0, 255).astype(np.uint8)
        du[0, t] = np.where(v, d_img * 5000.0, 0).astype(np.uint16)

    mesh = mesh_lib.make_mesh(2)
    run = make_multistream_tracker(cfg, K, mesh)

    # --- program identity: with local batch 1 per process, the per-device
    # DP program must contain exactly the single-stream tracker's gather
    # shapes (DP sidesteps the batched-gather lowering entirely)
    def gather_shapes(text):
        return sorted(set(re.findall(r"f32\\[[0-9,]*\\]\\{?[0-9,]*\\}?.* gather\\(", text)))

    gi = jnp.asarray(iu.repeat(2, axis=0))  # global shape [2, T, H, W]
    gd = jnp.asarray(du.repeat(2, axis=0))
    dp_txt = run.jitted.lower(
        jax.ShapeDtypeStruct((2, T) + shape, jnp.uint8),
        jax.ShapeDtypeStruct((2, T) + shape, jnp.uint16),
    ).compile().as_text()
    single = make_multistream_tracker(cfg, K)
    ss_txt = single.lower(
        jax.ShapeDtypeStruct((1, T) + shape, jnp.uint8),
        jax.ShapeDtypeStruct((1, T) + shape, jnp.uint16),
    ).compile().as_text()
    dp_g, ss_g = gather_shapes(dp_txt), gather_shapes(ss_txt)
    assert dp_g == ss_g, (dp_g, ss_g)
    # and the local-batch-1 program must not contain any cross-batch form
    n = shape[0] * shape[1]
    assert not re.search(r"f32\\[2,32,%d\\]" % n, dp_txt)

    # --- execution identity: the DP result's local shard equals the
    # locally-run single-stream tracker on the same frames
    shard = jax.sharding.NamedSharding(mesh, P("batch"))
    gshape = (2,) + iu.shape[1:]
    g_i = jax.make_array_from_process_local_data(shard, iu, gshape)
    g_d = jax.make_array_from_process_local_data(shard, du, gshape)
    out = run.jitted(g_i, g_d)
    local_out = np.asarray(out.addressable_data(0))
    ref = np.asarray(single(jnp.asarray(iu), jnp.asarray(du)))
    # same math, but SPMD partitioning may schedule reductions slightly
    # differently than the plain-jit comparator; the while-loop solver
    # amplifies ulp-level drift, so gate at sub-0.1mm not bit-exactness
    np.testing.assert_allclose(local_out[0], ref[0], rtol=0, atol=1e-4)
    print(f"proc {{pid}} DP OK", flush=True)
    """
)


@pytest.mark.skipif(
    os.environ.get("DVO_SKIP_MULTIHOST") == "1", reason="multihost disabled"
)
@pytest.mark.slow
def test_two_process_dp_multistream_program_identity(tmp_path):
    """BASELINE.md roadmap hypothesis 1(a), validated for real: the DP
    multistream engine over 2 processes with local batch 1 compiles to the
    single-stream tracker's program per device (identical gather shapes)
    and produces bit-identical per-stream trajectories."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = 21441
    script = tmp_path / "dp_worker.py"
    script.write_text(
        _DP_WORKER.replace("{port}", str(port))
        .replace("{repo!r}", repr(repo))
        .replace("{{pid}}", "{pid}")
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    )
    env["JAX_PLATFORMS"] = "cpu"
    # ONE local device per process (the conftest's virtual 8-device flag
    # would give every process 8 devices and break the 2-device mesh)
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} DP OK" in out
