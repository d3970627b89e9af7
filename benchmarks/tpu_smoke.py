"""Shape-matrix smoke test on the real TPU: forward+grad across sizes,
batch shapes, shared/batched params, eq constraints, warm starts."""
import sys, itertools
sys.path.insert(0, __import__('os').path.join(__import__('os').path.dirname(__file__), '..'))
import jax, jax.numpy as jnp, numpy as np
jax.config.update('jax_compilation_cache_dir','/root/.jax_cache')
import qpth_tpu

npr = np.random.RandomState(0)

def make(B, n, m, neq, shared):
    shp = () if shared else (B,)
    L = npr.rand(*shp, n, n).astype(np.float32)
    Q = L @ np.swapaxes(L,-1,-2) + n*np.eye(n, dtype=np.float32)
    G = npr.randn(*shp, m, n).astype(np.float32)
    z0 = npr.randn(*shp, n).astype(np.float32)
    s0 = npr.rand(*shp, m).astype(np.float32)
    h = (np.einsum('...mn,...n->...m', G, z0) + s0).astype(np.float32)
    p = npr.randn(B, n).astype(np.float32)
    if neq:
        A = npr.randn(*shp, neq, n).astype(np.float32)
        b = np.einsum('...mn,...n->...m', A, z0).astype(np.float32)
    else:
        A = b = None
    return Q, p, G, h, A, b

cases = [
    # (B, n, m, neq, shared)
    (128, 10, 50, 0, True),
    (128, 10, 50, 3, True),
    (96, 7, 5, 2, False),     # B not power of two, <128
    (256, 33, 17, 5, False),  # B=2*128
    (384, 20, 20, 0, False),  # B=3*128
    (200, 16, 24, 4, False),  # B>128 not multiple of 128 (lane padding)
    (64, 1, 1, 0, False),     # degenerate tiny
    (128, 48, 136, 0, False), # m at the lanes VMEM boundary
    (128, 48, 137, 0, False), # just past it (hybrid blocked path)
    (128, 48, 200, 3, False), # hybrid path, eq constraints
]
cfg = qpth_tpu.SolverConfig(check_Q_spd=False, max_iter=6)
bad = 0
for (B, n, m, neq, shared) in cases:
    try:
        Q, p, G, h, A, b = make(B, n, m, neq, shared)
        args = [jnp.asarray(v) if v is not None else None for v in (Q, p, G, h, A, b)]
        sol = jax.jit(lambda *a: qpth_tpu.solve_qp_full(*a, config=cfg))(*args)
        r = float(np.median(np.asarray(sol.stats.best_resids)))
        g = jax.jit(jax.grad(lambda p_: (qpth_tpu.solve_qp(
            args[0], p_, args[2], args[3], args[4], args[5], config=cfg)**2).sum()))(args[1])
        gm = float(jnp.abs(g).max())
        ok = np.isfinite(r) and np.isfinite(gm)
        print(f'B={B:4d} n={n:3d} m={m:3d} neq={neq} shared={int(shared)}: '
              f'resid {r:9.2e} |g| {gm:9.2e} {"OK" if ok else "BAD"}', flush=True)
        bad += not ok
    except Exception as e:
        print(f'B={B} n={n} m={m} neq={neq} shared={int(shared)}: FAIL {type(e).__name__}: {str(e)[:140]}', flush=True)
        bad += 1
# Structured diagonal-Q/G path (core/diag.py) on hardware: fwd + grads,
# neq = 0 (pure elementwise) and neq > 0 (MXU normal equations).
for (B, n, neq) in [(256, 64, 0), (256, 64, 24)]:
    try:
        q = 0.5 + npr.rand(n).astype(np.float32)
        g = -(0.5 + npr.rand(n).astype(np.float32))
        x0 = npr.randn(n).astype(np.float32)
        h = (g * x0 + npr.rand(B, n)).astype(np.float32)
        p = npr.randn(B, n).astype(np.float32)
        if neq:
            A = npr.randn(neq, n).astype(np.float32)
            b = np.broadcast_to(A @ x0, (B, neq)).astype(np.float32)
        else:
            A = b = None
        args = [jnp.asarray(v) if v is not None else None
                for v in (q, p, g, h, A, b)]
        sol = jax.jit(lambda *a: qpth_tpu.solve_qp_diag_full(
            *a, config=cfg))(*args)
        r = float(np.median(np.asarray(sol.stats.best_resids)))
        gr = jax.jit(jax.grad(lambda p_: (qpth_tpu.solve_qp_diag(
            args[0], p_, args[2], args[3], args[4], args[5],
            config=cfg) ** 2).sum()))(args[1])
        gm = float(jnp.abs(gr).max())
        ok = np.isfinite(r) and np.isfinite(gm)
        print(f'diag B={B:4d} n={n:3d} neq={neq}: resid {r:9.2e} '
              f'|g| {gm:9.2e} {"OK" if ok else "BAD"}', flush=True)
        bad += not ok
    except Exception as e:
        print(f'diag B={B} n={n} neq={neq}: FAIL {type(e).__name__}: '
              f'{str(e)[:140]}', flush=True)
        bad += 1
# General fixed-pattern tier (RCM + banded + pair-scattered G^T D G) on
# hardware: scrambled band, 2-entry inequality rows, fwd + grads.
try:
    B, n, w = 128, 48, 2
    perm0 = npr.permutation(n)
    qi = [(i, j) for i in range(n) for j in range(n) if abs(i - j) <= w]
    Qi = np.array([(perm0[i], perm0[j]) for (i, j) in qi]).T
    gi = []
    for r_ in range(n):
        c = npr.randint(0, n - 1)
        gi += [(r_, perm0[c]), (r_, perm0[c + 1])]
    Gi = np.array(gi).T
    Qv = np.zeros((B, Qi.shape[1]), np.float32)
    look = {}
    for k, (i, j) in enumerate(zip(*Qi)):
        if i == j:
            Qv[:, k] = 2.0 * w + 1 + npr.rand(B)
        elif (int(j), int(i)) in look:
            Qv[:, k] = Qv[:, look[(int(j), int(i))]]
        else:
            Qv[:, k] = npr.randn(B) * 0.3
            look[(int(i), int(j))] = k
    Gv = npr.randn(B, Gi.shape[1]).astype(np.float32)
    p = npr.randn(B, n).astype(np.float32)
    z0 = npr.randn(B, n)
    Gd = np.zeros((B, n, n), np.float32)
    np.add.at(Gd, (np.arange(B)[:, None], Gi[0][None], Gi[1][None]), Gv)
    h = (np.einsum('bmn,bn->bm', Gd, z0)
         + npr.rand(B, n) + 0.2).astype(np.float32)
    f = qpth_tpu.SpQPFunction(Qi, (n, n), Gi, (n, n),
                              np.zeros((2, 0), int), (0, n), config=cfg)
    assert f.structure == 'general', f.structure
    args = [jnp.asarray(v) for v in (Qv, p, Gv, h)]
    empty = jnp.zeros((B, 0), jnp.float32)
    z = jax.jit(lambda *a: f(*a, empty, empty))(*args)
    gr = jax.jit(jax.grad(lambda Qv_: (f(
        Qv_, args[1], args[2], args[3], empty, empty) ** 2).sum()))(args[0])
    zm, gm = float(jnp.abs(z).max()), float(jnp.abs(gr).max())
    ok = np.isfinite(zm) and np.isfinite(gm)
    print(f'general B={B:4d} n={n:3d}: |z| {zm:9.2e} |dQv| {gm:9.2e} '
          f'{"OK" if ok else "BAD"}', flush=True)
    bad += not ok
except Exception as e:
    print(f'general: FAIL {type(e).__name__}: {str(e)[:140]}', flush=True)
    bad += 1
print('FAILURES:', bad)
