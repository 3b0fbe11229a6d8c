"""True multi-process SPMD launch — the reference's MPI analogue, TPU-style.

The reference scales by launching N MPI ranks, each owning its cells, with
ghost exchanges through PETSc (reference dolfinx_materials/solvers.py:66,88-96
and demos/jax/finite_strain_elastoplasticity.py:26-53 run under ``mpirun``).
The TPU-native equivalent is JAX multi-controller SPMD: N processes each own a
slice of the device grid, ``jax.distributed`` wires them into ONE global mesh,
and the very same ``shard_map`` programs from :mod:`.sharding` run unchanged —
collectives that rode a single process's virtual mesh now cross process
boundaries through the distributed runtime (gloo on CPU, ICI/DCN on real pods).

Three pieces:

- :func:`initialize`: per-process bring-up (backend config + coordinator
  handshake). Must run before any other JAX backend touch.
- :func:`global_device_mesh`: the (num_processes, devices_per_process) global
  ``Mesh`` with the process axis OUTERMOST — the dcn x ici layout every kernel
  in :mod:`.sharding` already accepts, so cross-process traffic is exactly the
  hierarchically-lowered outer-axis stage.
- :func:`launch`: host-side launcher spawning N worker processes on localhost
  (the CI-sized stand-in for a real multi-host job launcher).

Validated end-to-end in tests/test_multiprocess.py: the fused dof-sharded
Newton step produces the same ``u`` across 1-process x 8-device and
2-process x 4-device runs.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import time


def pick_free_port() -> int:
    """A free TCP port on localhost for the jax.distributed coordinator."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def initialize(
    process_id: int,
    num_processes: int,
    coordinator: str,
    local_devices: int = 4,
    enable_x64: bool = False,
):
    """Bring up this process as one controller of a multi-process CPU job.

    Must be the FIRST JAX call in the process (before any backend touch): the
    platform/device-count/collectives configs only apply pre-initialization.
    CPU cross-process collectives use the gloo transport baked into jaxlib.
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", int(local_devices))
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if enable_x64:
        jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes),
        process_id=int(process_id),
    )
    return jax


def global_device_mesh(axis=("dcn", "ici")):
    """Global (num_processes, devices_per_process) mesh, process axis outer.

    All kernels in :mod:`.sharding` take ``axis=("dcn", "ici")`` and lower
    their collectives hierarchically over it, so the wide dof traffic stays
    within a process and only the reduced stage crosses processes.
    """
    import jax
    import numpy as np
    from jax.sharding import Mesh

    nproc = jax.process_count()
    per = jax.device_count() // nproc
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs).reshape(nproc, per), tuple(axis))


def allgather(x):
    """Fetch a (possibly cross-process-sharded) jax.Array fully to this host."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x, tiled=True)


def launch(
    worker_argv,
    num_processes: int,
    coordinator_port: int | None = None,
    timeout: float = 900.0,
    env_extra: dict | None = None,
    cwd: str | None = None,
):
    """Spawn ``num_processes`` workers of ``worker_argv`` on localhost.

    Each worker receives three extra args: ``process_id num_processes
    coordinator`` (host:port). Returns the list of CompletedProcess-like
    results; raises RuntimeError with all captured output if any worker fails.
    This is the CI-scale stand-in for a real cluster launcher (srun/mpirun in
    the reference's world); on real multi-host TPU pods the runtime provides
    the coordinator instead.
    """
    port = coordinator_port or pick_free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_NUM_CPU_DEVICES", None)
    if env_extra:
        env.update(env_extra)

    procs = []
    for pid in range(num_processes):
        argv = list(worker_argv) + [str(pid), str(num_processes), coord]
        procs.append(
            subprocess.Popen(
                argv,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
                cwd=cwd,
            )
        )

    deadline = time.time() + timeout
    outs, rcs = [None] * num_processes, [None] * num_processes
    try:
        for i, p in enumerate(procs):
            remaining = max(1.0, deadline - time.time())
            try:
                out, _ = p.communicate(timeout=remaining)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
                out = (out or "") + "\n[launcher] TIMEOUT — killed"
            outs[i], rcs[i] = out, p.returncode
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    if any(rc != 0 for rc in rcs):
        report = "\n".join(
            f"--- worker {i} (rc={rcs[i]}) ---\n{(outs[i] or '')[-4000:]}"
            for i in range(num_processes)
        )
        raise RuntimeError(f"multi-process launch failed:\n{report}")
    return outs
