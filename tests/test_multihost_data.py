"""Multi-host (process-sharded) data feeding — VERDICT r4 missing #2.

The reference feeds pods with DistributedSampler over up to 32 SLURM ranks
(main_pretrain.py:236-251); the TPU equivalent is per-process loading of
the global-batch rows this process's devices own, assembled with
jax.make_array_from_process_local_data (SURVEY §2.4).
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest
import jax

from mtp_tpu.data.loader import Loader
from mtp_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                   process_batch_rows, put_global_batch,
                                   put_global_tree)
from mtp_tpu.utils.config import MeshConfig


class _ScalarDs:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.float32(i)}


def _collate(samples):
    return {"x": np.stack([s["x"] for s in samples])}


def test_loader_batch_rows_disjoint_and_complete():
    """Two 'processes' with complementary batch_rows see the SAME epoch
    permutation and together cover every global batch exactly once — the
    DistributedSampler contract."""
    ds = _ScalarDs(16)
    g = 4
    l0 = Loader(ds, g, _collate, seed=7, batch_rows=[0, 1])
    l1 = Loader(ds, g, _collate, seed=7, batch_rows=[2, 3])
    full = Loader(ds, g, _collate, seed=7)
    got0 = [b["x"] for b in l0.epoch(0)]
    got1 = [b["x"] for b in l1.epoch(0)]
    want = [b["x"] for b in full.epoch(0)]
    assert len(got0) == len(got1) == len(want) == 4
    for a, b, w in zip(got0, got1, want):
        np.testing.assert_array_equal(np.concatenate([a, b]), w)
    # same split through the fork-worker path
    l0w = Loader(ds, g, _collate, seed=7, batch_rows=[0, 1], num_workers=2)
    got0w = [b["x"] for b in l0w.epoch(0)]
    for a, b in zip(got0w, got0):
        np.testing.assert_array_equal(a, b)


def test_loader_batch_rows_validation():
    with pytest.raises(ValueError):
        Loader(_ScalarDs(8), 4, _collate, batch_rows=[0, 4])


def test_process_rows_single_process_full():
    """On one process every row is addressable; put_global_batch degrades to
    the plain sharded device_put."""
    mesh = make_mesh(MeshConfig(data=4, model=1))
    rows = process_batch_rows(mesh, 8)
    np.testing.assert_array_equal(rows, np.arange(8))
    x = np.arange(8, dtype=np.float32)
    arr = put_global_batch(mesh, x)
    assert arr.shape == (8,)
    np.testing.assert_array_equal(np.asarray(arr), x)
    with pytest.raises(ValueError):
        process_batch_rows(mesh, 6)  # not divisible by data axis


_TWO_PROC_SCRIPT = textwrap.dedent("""
    import os, sys
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import numpy as np
    import jax
    # the environment pins an axon PJRT plugin via sitecustomize; the
    # platform override must go through jax.config after import (same
    # dance as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    # multi-process CPU needs the gloo cross-process collectives backend
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=sys.argv[1],
                               num_processes=2, process_id=int(sys.argv[2]))
    sys.path.insert(0, {repo!r})
    from mtp_tpu.data.loader import Loader
    from mtp_tpu.parallel.mesh import (make_mesh, process_batch_rows,
                                       put_global_tree)
    from mtp_tpu.utils.config import MeshConfig

    class Ds:
        def __len__(self):
            return 8
        def __getitem__(self, i):
            return {{"x": np.float32(i)}}

    def collate(samples):
        return {{"x": np.stack([s["x"] for s in samples])}}

    assert jax.process_count() == 2 and len(jax.devices()) == 4
    mesh = make_mesh(MeshConfig(data=4, model=1))
    G = 4
    rows = process_batch_rows(mesh, G)
    assert len(rows) == 2, rows   # 2 of 4 rows per process
    loader = Loader(Ds(), G, collate, seed=3, batch_rows=rows)
    import jax.numpy as jnp
    tot = 0.0
    for local in loader.epoch(0):
        assert local["x"].shape == (2,)
        g = put_global_tree(mesh, local, G)
        assert g["x"].shape == (G,)
        tot += float(jax.jit(lambda t: t["x"].sum())(g))
    # every dataset element exactly once across the epoch
    assert tot == sum(range(8)), tot
    print("OK", tot)
""")


@pytest.mark.slow
def test_two_process_cpu_smoke(tmp_path):
    """2 real processes × 2 CPU devices: jax.distributed rendezvous, each
    process loads only its rows, the assembled global array sums every
    dataset element exactly once per epoch."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    addr = f"localhost:{port}"
    script = tmp_path / "two_proc.py"
    script.write_text(_TWO_PROC_SCRIPT.format(
        repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen([sys.executable, str(script), addr, str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}:\n{out}"
        assert "OK" in out, f"proc {i}:\n{out}"
