"""Finite-difference gradient checks for every primitive op — BASELINE
config 2 ("gradient-check suite: gradTOp vs finite differences on every
TOp primitive")."""

import numpy as np
import pytest

from tensor_ops_tpu import prim as P
from tensor_ops_tpu.ops import ir

from helpers import check_grads


from tensor_ops_tpu.testing import rand as r  # noqa: E402


def sq(shape):
    """Reduce a tensor to a scalar smoothly: sum of squares, via
    duplicate >> transp-the-copy >> full contraction."""
    sh = tuple(shape)
    return (
        P.duplicate(sh)
        >> P.second(P.transp_op(sh), front=[sh])
        >> P.gmul((), sh, ())
    )


def test_grad_gmul_cases(nb):
    for ms, os, ns in [((2,), (3,), ()), ((2,), (3,), (4,)), ((2,), (3, 4), (5,)), ((), (3,), ())]:
        x = r(1, *(ms + os))
        y = r(2, *(tuple(reversed(os)) + ns))
        out_shape = ms + ns
        op = P.gmul(ms, os, ns) >> sq(out_shape)
        check_grads(op, nb, (x, y))


def test_grad_transp(nb):
    x = r(3, 2, 3)
    op = P.transp_op((2, 3)) >> sq((3, 2))
    check_grads(op, nb, (x,))


def test_grad_sum_rows(nb):
    x = r(4, 4, 3)
    op = P.sum_rows((4, 3)) >> sq((3,))
    check_grads(op, nb, (x,))


def test_grad_sum_op(nb):
    xs = (r(5, 3), r(6, 3), r(7, 3))
    op = P.sum_op(3, (3,)) >> sq((3,))
    check_grads(op, nb, xs)


def test_grad_scale(nb):
    x = r(8, 3)
    op = P.scale((3,), -1.7) >> sq((3,))
    check_grads(op, nb, (x,))


def test_grad_replicate(nb):
    x = r(9, 3)
    op = P.replicate_op((3,), 2) >> P.dot(3)
    check_grads(op, nb, (x,))


def test_grad_konst_drops(nb):
    x = r(10, 3)
    # konst contributes no gradient; x flows through dot with the constant
    op = P.konst(2.0, (3,), n=1).second(front=[(3,)]) >> P.dot(3)
    _, grads = ir.value_and_grad(op, nb, (x,))
    np.testing.assert_allclose(grads[0], np.full(3, 2.0))


def test_grad_diag_getdiag(nb):
    v = r(11, 4)
    op = P.diag_op(4, 2) >> sq((4, 4))
    check_grads(op, nb, (v,))
    m = r(12, 4, 4)
    op2 = P.get_diag_op(4, 2) >> sq((4,))
    check_grads(op2, nb, (m,))


def test_grad_map_with_and_without_closed_form(nb):
    import jax.numpy as jnp

    x = np.abs(r(13, 3)) + 0.5
    op = P.map_op((3,), lambda a: jnp.log(a), lambda a: 1.0 / a) >> sq((3,))
    check_grads(op, nb, (x,))
    # derivative derived via jax.grad (the reference's `ad`-package path)
    op2 = P.map_op((3,), lambda a: jnp.tanh(a) * a) >> sq((3,))
    check_grads(op2, nb, (np.asarray(x),))


def test_grad_zipn(nb):
    xs = (r(14, 3), r(15, 3), r(16, 3))
    op = P.zip3_op((3,), lambda a, b, c: a * b * c,
                   lambda a, b, c: (b * c, a * c, a * b)) >> sq((3,))
    check_grads(op, nb, xs)


def test_grad_inner_outer(nb):
    x, y = r(17, 3), r(18, 4)
    op = P.outer((3,), (4,)) >> sq((3, 4))
    check_grads(op, nb, (x, y))
    w, v = r(19, 3, 4), r(20, 4)
    op2 = P.inner((3,), 4, ()) >> sq((3,))
    check_grads(op2, nb, (w, v))


def test_grad_deep_chain(nb):
    """Deep composed chain: tape-based transposition stays exact (and
    O(depth), unlike the reference's recompute chain rule)."""
    import jax.numpy as jnp

    op = P.identity([(3,)])
    for _ in range(12):
        op = op >> P.map_op((3,), lambda a: jnp.tanh(a))
    op = op >> sq((3,))
    check_grads(op, nb, (r(21, 3),))
