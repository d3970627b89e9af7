from .sharding import (batch_mesh, batch_sharding,  # noqa: F401
                       solve_qp_sharded)
