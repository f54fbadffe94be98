"""Multi-host (DCN) smoke test: REAL multi-process JAX over the engine's sharding.

Spawns 2 OS processes x 2 CPU devices each, brings up ``jax.distributed``, builds
a global 4-device dp mesh, assembles a globally-sharded batch from process-local
rows (``parallel.distributed.shard_host_batch``), and checks that

- a jitted batch reduction (the shape of every CG reduction in the engine)
  produces the exact global result on every process, and
- the compiled HLO contains a cross-replica ``all-reduce`` — the collective that
  rides DCN between hosts (falsifiable, not just "it ran").

The reference has no multi-node capability at all (SURVEY.md §2 component 6);
this pins the "multi-host via jax distributed arrays — same code path" claim
(SURVEY.md §5).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ["TNML_REPO"])
    import numpy as np

    from tnml_tpu.parallel import distributed as dist

    pid = int(sys.argv[1])
    dist.initialize(coordinator_address=os.environ["TNML_COORD"],
                    num_processes=2, process_id=pid)
    import jax
    import jax.numpy as jnp

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    dp = dist.global_data_parallel()
    assert dp.n == 4

    # global batch 8, feature dim 3; process p holds rows [4p, 4p+4)
    n_global, f = 8, 3
    lo, hi = dist.process_local_rows(n_global)
    assert (hi - lo) == 4 and lo == 4 * pid
    full = (np.arange(n_global * f, dtype=np.float32) + 1.0).reshape(n_global, f)
    X = dist.shard_host_batch(dp, full[lo:hi])
    assert X.shape == (n_global, f)

    # the engine's CG-reduction shape: contract over the (sharded) batch axis
    fn = jax.jit(lambda x: jnp.sum(x * x),
                 out_shardings=dp.replicated())
    hlo = fn.lower(X).compile().as_text()
    assert "all-reduce" in hlo, "no cross-process collective in the reduction"
    got = float(fn(X))
    want = float((full * full).sum())
    assert abs(got - want) < 1e-3 * want, (got, want)
    print(f"proc {pid} OK: {got} == {want}")
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_reduction(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_")) and k != "PYTHONPATH"}
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        # multi-process CPU collectives ride gloo over the distributed runtime
        "JAX_CPU_COLLECTIVES_IMPLEMENTATION": "gloo",
        "TNML_COORD": coord,
        "TNML_REPO": REPO,
        # keep BLAS single-threaded: 2 procs x N threads thrash CI boxes
        "OPENBLAS_NUM_THREADS": "1",
    })
    procs = [subprocess.Popen([sys.executable, str(script), str(p)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for p in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    assert "proc 0 OK" in outs[0] and "proc 1 OK" in outs[1]
