"""Direct parity vs the reference implementation (locuslab/qpth, torch-CPU).

These tests run the *actual reference solver* (mounted read-only at
/root/reference) on identical problems and require matching solutions and
gradients. Skipped automatically when torch or the reference checkout is
unavailable.
"""

import sys

import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import qpth_tpu

from conftest import make_feasible_qp

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_qpfunction():
    """Import the reference QPFunction with a cvxpy stub (cvxpy is not
    installed here and only the PDIPM path is exercised)."""
    import types

    if "cvxpy" not in sys.modules:
        sys.modules["cvxpy"] = types.ModuleType("cvxpy")
    sys.path.insert(0, "/root/reference")
    try:
        from qpth.qp import QPFunction as RefQPFunction
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    finally:
        sys.path.remove("/root/reference")
    return RefQPFunction


@pytest.mark.parametrize("neq,nbatch", [(0, 4), (3, 4), (2, 1)])
def test_solution_parity(rng, ref_qpfunction, neq, nbatch):
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=10, nineq=6, neq=neq,
                                        nbatch=nbatch)
    t = lambda x: torch.tensor(np.asarray(x), dtype=torch.float64)
    e = torch.tensor([])
    z_ref = ref_qpfunction(verbose=-1)(
        t(Q), t(p), t(G), t(h),
        t(A) if neq else e, t(b) if neq else e).detach().numpy()

    z = np.asarray(qpth_tpu.solve_qp(
        *[jnp.asarray(v) if v is not None else None
          for v in (Q, p, G, h, A, b)]))
    npt.assert_allclose(z, z_ref.reshape(z.shape), atol=1e-8, rtol=1e-6)


def test_gradient_parity(rng, ref_qpfunction):
    """Gradients w.r.t. all six params match the reference autograd,
    using batched params (so no broadcast-reduction semantics differ)."""
    B = 3
    Q, p, G, h, A, b = make_feasible_qp(rng, nz=8, nineq=4, neq=2, nbatch=B)
    Qb = np.broadcast_to(Q, (B,) + Q.shape).copy()

    tt = [torch.tensor(np.asarray(v), dtype=torch.float64,
                       requires_grad=True)
          for v in (Qb, p, G, h, A, b)]
    z_ref = ref_qpfunction(verbose=-1)(*tt)
    z_true = rng.randn(*z_ref.shape)
    loss = 0.5 * ((z_ref - torch.tensor(z_true)) ** 2).sum()
    loss.backward()
    ref_grads = [x.grad.numpy() for x in tt]

    import jax

    def jloss(*theta):
        z = qpth_tpu.solve_qp(*theta)
        return 0.5 * jnp.sum((z - z_true) ** 2)

    grads = jax.grad(jloss, argnums=tuple(range(6)))(
        *[jnp.asarray(v) for v in (Qb, p, G, h, A, b)])

    names = "Q p G h A b".split()
    for name, g, gr in zip(names, grads, ref_grads):
        npt.assert_allclose(np.asarray(g), gr, atol=1e-6, rtol=1e-4,
                            err_msg=f"grad mismatch for {name}")
