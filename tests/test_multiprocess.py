"""ACTUALLY-distributed runs: jax.distributed across >= 2 local processes.

The reference's scaling axis is genuine multi-process MPI with ghost exchanges
(reference dolfinx_materials/solvers.py:66,88-96; the finite-strain demo runs
under mpirun, demos/jax/finite_strain_elastoplasticity.py:26-53). The virtual
8-device tests (test_sharding.py) validate the SPMD *programs*; these tests
validate the missing layer — that the SAME fused dof-sharded Newton step,
compiled per-process by the multi-controller runtime with gloo cross-process
CPU collectives, agrees BIT-FOR-BIT with the single-process result.

Workers are launched as real OS processes (tests/_mp_worker.py) with a
localhost jax.distributed coordinator — the CI-sized stand-in for a multi-host
pod. Each worker owns devices_per_process virtual CPU devices; the global mesh
is (num_processes, devices_per_process) with the process axis as the "dcn"
outer axis, so cross-process collectives are exactly the hierarchical outer
stage the sharding kernels already emit.
"""

import os
import sys

import numpy as np
import pytest

from dolfinx_materials_tpu.parallel import multiprocess as mp

pytestmark = pytest.mark.mp  # multi-process tier (default lane skips it)

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
WORKER = os.path.join(HERE, "_mp_worker.py")

# every configuration solves the identical global problem on 8 total devices
CONFIGS = {1: 8, 2: 4, 4: 2}


@pytest.fixture(scope="module")
def results(tmp_path_factory):
    """Run the worker at 1, 2 and 4 processes; return {nproc: npz dict}."""
    out = {}
    base = tmp_path_factory.mktemp("mp")
    for nproc, per in CONFIGS.items():
        f = str(base / f"mp{nproc}.npz")
        mp.launch(
            [sys.executable, WORKER, f, str(per)],
            nproc,
            cwd=REPO,
            timeout=600,
        )
        if nproc == 1:
            out[nproc] = dict(np.load(f))
        else:
            out[nproc] = dict(np.load(f))
    return out


@pytest.mark.parametrize("nproc", [2, 4])
@pytest.mark.parametrize("layout", ["replicated", "sharded"])
def test_multiprocess_bitwise_parity(results, nproc, layout):
    """u, plastic state and |R| from an N-process run must agree bit-for-bit
    with the single-process 8-device run (same XLA program, same device grid
    shape — only the controller count differs)."""
    ref, got = results[1], results[nproc]
    for field in (f"u_{layout}", f"p_{layout}", f"res_{layout}"):
        assert np.array_equal(ref[field], got[field]), (
            f"{field}: nproc={nproc} deviates from single-process "
            f"(max|diff| = {np.abs(ref[field] - got[field]).max():.3e})"
        )


def test_multiprocess_solution_is_physical(results):
    """The distributed solve actually converged and went plastic."""
    r = results[2]
    assert float(r["res_sharded"][0]) < 1e-8 * 70e3
    assert r["p_sharded"].max() > 1e-4
    assert np.isfinite(r["u_sharded"]).all()


def test_multiprocess_blocked_step(tmp_path):
    """The fused BLOCKED multi-field step (cross-field coupling blocks) also
    agrees bit-for-bit between 1-process and 2-process runs."""
    outs = {}
    for nproc, per in ((1, 8), (2, 4)):
        f = str(tmp_path / f"blk{nproc}.npz")
        mp.launch(
            [sys.executable, WORKER, f, str(per), "--blocked"],
            nproc,
            cwd=REPO,
            timeout=600,
        )
        outs[nproc] = dict(np.load(f))
    assert np.array_equal(outs[1]["z_blocked"], outs[2]["z_blocked"])
    assert np.array_equal(outs[1]["res_blocked"], outs[2]["res_blocked"])
    assert float(outs[2]["res_blocked"][0]) < 1e-7 * 70e3
