"""qpth_tpu — a TPU-native batched differentiable QP solver.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
locuslab/qpth (the OptNet solver): a batched Mehrotra predictor-corrector
interior-point forward pass and exact implicit-KKT gradients to all six
problem parameters, designed TPU-first — pivot-free Cholesky KKT algebra,
``lax.while_loop`` iteration, ``custom_vjp`` gradients, batch sharding over
device meshes, and Pallas kernels for the hot factor/solve path.
"""

from . import nn, parallel, profiling, solvers, sparse, utils  # noqa: F401
from .config import (KKTSolver, QPSolution, QPSolvers,  # noqa: F401
                     SolverConfig, SolveStats)
from .qp import (DEFAULT_CONFIG, QPFunction, prefactor_qp,  # noqa: F401
                 solve_qp, solve_qp_eq, solve_qp_full)
from .diagqp import solve_qp_diag, solve_qp_diag_full  # noqa: F401
from .bandqp import solve_qp_banded, solve_qp_banded_full  # noqa: F401
from .core.banded import GeneralG  # noqa: F401  (g_spec for solve_qp_banded)
from .core.single import solve_single  # noqa: F401
from .sparse import SpQPFunction  # noqa: F401

__version__ = "0.3.0"
