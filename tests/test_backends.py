"""NumPy-oracle vs JAX/XLA backend parity (<=1e-6 forward and backward —
BASELINE.md target; achieved at ~1e-12 in f64)."""

import numpy as np

import tensor_ops_tpu as T
from tensor_ops_tpu import prim as P
from tensor_ops_tpu.ops import ir
from tensor_ops_tpu.models import (
    act_logistic,
    act_softmax,
    cross_entropy,
    gen_net,
    squared_error,
)
from tensor_ops_tpu.models.feedforward import Network
from tensor_ops_tpu.backend.rng import Rng

TOL = 1e-9


def r(seed, *shape):
    return np.random.default_rng(seed).normal(size=shape)


def _to_jax(jb, xs):
    return tuple(jb.asarray(x) for x in xs)


def assert_parity(op, nb, jb, xs, grad=False):
    outs_n = ir.run(op, nb, xs)
    outs_j = ir.run(op, jb, _to_jax(jb, xs))
    for a, b in zip(outs_n, outs_j):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=TOL)
    if grad:
        _, gn = ir.value_and_grad(op, nb, xs)
        _, gj = ir.value_and_grad(op, jb, _to_jax(jb, xs))
        for a, b in zip(gn, gj):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=TOL)


def test_gmul_parity(nb, jb):
    for ms, os, ns in [((2,), (3,), ()), ((2,), (3, 4), (5,)), ((), (3,), ()), ((2, 3), (4,), (5, 2))]:
        x = r(1, *(ms + os))
        y = r(2, *(tuple(reversed(os)) + ns))
        assert_parity(P.gmul(ms, os, ns), nb, jb, (x, y))


def test_pipeline_grad_parity(nb, jb):
    # full softmax + cross-entropy pipeline
    from tensor_ops_tpu.models.neuralnet import softmax

    v = r(3, 5)
    t = np.zeros(5)
    t[2] = 1.0
    op = P.first(softmax(5), rest=[(5,)]) >> cross_entropy(5)
    assert_parity(op, nb, jb, (v, t), grad=True)


def test_network_training_parity(nb, jb):
    rng = Rng(nb, seed=7)
    net = gen_net(nb, 6, 3, [(5, act_logistic())], act_softmax(), rng)
    x = r(4, 6)
    y = np.zeros(3)
    y[1] = 1.0
    loss = cross_entropy(3)
    jnet = Network(net.op, _to_jax(jb, net.params))
    # loss values
    assert abs(net.loss_value(loss, nb, x, y) - float(jnet.loss_value(loss, jb, jb.asarray(x), jb.asarray(y)))) < TOL
    # 5 sgd steps
    n1, n2 = net, jnet
    for k in range(5):
        n1 = n1.train(loss, 0.1, nb, x, y)
        n2 = n2.train(loss, 0.1, jb, jb.asarray(x), jb.asarray(y))
    for a, b in zip(n1.params, n2.params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=TOL)


def test_jit_cache_reuse(jb):
    """Repeated runs reuse the same compiled program (cache keyed on the
    op object)."""
    op = P.mat_vec(3, 2)
    from tensor_ops_tpu import engine

    f1 = engine.compile_run(op, jb)
    f2 = engine.compile_run(op, jb)
    assert f1 is f2
