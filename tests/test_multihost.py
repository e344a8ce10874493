"""Multi-host training entry: 2 simulated JAX processes join through
jax.distributed, build one global mesh, assemble a global batch from
per-process local shards, and run a reduction that sees both shards
(reference multi-node: scripts/train.sh accelerate --deepspeed_multinode).
"""
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from easyanimate_tpu.parallel import (MeshConfig, create_mesh,
                                          init_distributed, local_batch_size,
                                          make_global_batch, data_spec)
    import jax.numpy as jnp
    import numpy as np

    pid = int(sys.argv[1]); port = sys.argv[2]
    init_distributed(f"127.0.0.1:{{port}}", 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()  # 2 local x 2 hosts

    mesh = create_mesh(MeshConfig(dp=4, sp=1, tp=1))
    # per-process local slice of the global batch: process i holds rows
    # [2i, 2i+1] with value == global row index
    assert local_batch_size(4) == 2
    local = np.arange(2 * pid, 2 * pid + 2, dtype=np.float32)
    local = np.tile(local[:, None, None, None, None], (1, 1, 1, 4, 4))
    batch = make_global_batch(mesh, {{"latents": local}},
                              {{"latents": data_spec("latents")}})
    arr = batch["latents"]
    assert arr.shape == (4, 1, 1, 4, 4), arr.shape

    with mesh:
        total = jax.jit(lambda x: jnp.sum(jnp.mean(x, axis=(1, 2, 3, 4))))(arr)
    # rows are 0,1,2,3 -> sum of means = 6 (sees BOTH processes' shards)
    np.testing.assert_allclose(float(total), 6.0)
    print(f"proc {{pid}} OK", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_batch(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO))
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=2").strip()
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK" in out
