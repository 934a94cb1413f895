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
