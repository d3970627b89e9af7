"""Worker for the 2-process multihost test (run via subprocess).

Each process owns half the QP batch; jax.distributed + a global mesh over
both processes' CPU devices drive init_multihost + solve_qp_sharded end to
end — the smallest faithful model of a multi-host TPU pod run
(SURVEY §5.8). Usage: python _multihost_worker.py <coord> <nproc> <pid>
"""

import sys

coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from qpth_tpu.parallel import init_multihost  # noqa: E402

init_multihost(coordinator_address=coord, num_processes=nproc,
               process_id=pid)
assert jax.process_count() == nproc, jax.process_count()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import qpth_tpu  # noqa: E402
from qpth_tpu.parallel import batch_mesh, solve_qp_sharded  # noqa: E402
from qpth_tpu.parallel.multihost import local_batch_slice  # noqa: E402

# Deterministic global problem; every process builds the same arrays and
# feeds only its local shard.
B, nz, m = 8, 6, 4
rng = np.random.RandomState(0)
L = rng.randn(nz, nz)
Q = L @ L.T + 1e-3 * np.eye(nz)
G = rng.randn(m, nz)
z0 = rng.randn(nz)
h = G @ z0 + rng.rand(B, m)
p = rng.randn(B, nz)

mesh = batch_mesh()  # all devices across both processes
n_global_dev = len(jax.devices())
assert n_global_dev >= nproc, n_global_dev

sl = local_batch_slice(B)
sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("batch"))
p_global = jax.make_array_from_process_local_data(sharding, p[sl], (B, nz))
h_global = jax.make_array_from_process_local_data(sharding, h[sl], (B, m))

z = solve_qp_sharded(jnp.asarray(Q), p_global, jnp.asarray(G), h_global,
                     mesh=mesh)

# Every process checks its addressable shard against a local solve.
z_ref = np.asarray(qpth_tpu.solve_qp(jnp.asarray(Q), jnp.asarray(p),
                                     jnp.asarray(G), jnp.asarray(h)))
for shard in z.addressable_shards:
    i0 = shard.index[0].start or 0
    got = np.asarray(shard.data)
    want = z_ref[i0:i0 + got.shape[0]]
    np.testing.assert_allclose(got, want, atol=1e-8)

print(f"proc {pid}: OK ({n_global_dev} global devices)")
