"""Shared test utilities: finite-difference gradient checking against the
staged AD (the rebuild's version of the reference's implicit gradient
verification — SURVEY.md §4 test-pyramid plan)."""

from __future__ import annotations

import numpy as np

from tensor_ops_tpu.ops import ir


def loop_gmul(lm: int, lo: int, ln: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Triple-loop oracle for gmul's reverse-indexed contraction semantics
    (mirrors ``Nested.gmul'``, reference ``src/Data/Nested.hs:451-473``):
    out[m,n] = sum_o x[m, o1..ok] * y[ok..o1, n]."""
    ms = x.shape[:lm]
    os_ = x.shape[lm:]
    ns = y.shape[lo:]
    out = np.zeros(ms + ns, dtype=np.float64)
    for mi in np.ndindex(*ms) if ms else [()]:
        for ni in np.ndindex(*ns) if ns else [()]:
            acc = 0.0
            for oi in np.ndindex(*os_) if os_ else [()]:
                acc += x[mi + oi] * y[tuple(reversed(oi)) + ni]
            out[mi + ni] = acc
    return out


def fd_grad(op, be, xs, slot: int, out_slot: int = 0, eps: float = 1e-6):
    """Central finite differences of scalar-output ``op`` w.r.t. input
    ``slot``."""
    xs = [np.asarray(x, dtype=np.float64) for x in xs]
    g = np.zeros_like(xs[slot])
    indices = list(np.ndindex(*xs[slot].shape)) if xs[slot].shape else [()]
    for idx in indices:
        xp = [x.copy() for x in xs]
        xm = [x.copy() for x in xs]
        xp[slot][idx] += eps
        xm[slot][idx] -= eps
        fp = float(np.asarray(ir.run(op, be, xp)[out_slot]))
        fm = float(np.asarray(ir.run(op, be, xm)[out_slot]))
        g[idx] = (fp - fm) / (2 * eps)
    return g


def check_grads(op, be, xs, atol: float = 1e-5, rtol: float = 1e-4):
    """Assert staged-AD grads match finite differences for every input."""
    assert op.out_stack == ((),), "check_grads needs scalar output"
    _, grads = ir.value_and_grad(op, be, xs)
    for slot in range(len(xs)):
        fd = fd_grad(op, be, xs, slot)
        got = np.asarray(grads[slot])
        np.testing.assert_allclose(got, fd, atol=atol, rtol=rtol,
                                   err_msg=f"grad mismatch at slot {slot}")
