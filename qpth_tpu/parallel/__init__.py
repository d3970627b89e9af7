from .intra import prefactor_qp_tp  # noqa: F401
from .multihost import init_multihost, local_batch_slice  # noqa: F401
from .sharding import (batch_mesh, batch_sharding,  # noqa: F401
                       solve_qp_sharded)
