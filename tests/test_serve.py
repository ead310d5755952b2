"""Predictor/serving tests."""

import numpy as np

from tensor_ops_tpu.backend.rng import Rng
from tensor_ops_tpu.models import act_logistic, act_softmax, gen_net
from tensor_ops_tpu.models.fast import FusedMLP
from tensor_ops_tpu.models.serve import Predictor


def make(jb):
    rng = Rng(jb, seed=0)
    return gen_net(jb, 6, 3, [(8, act_logistic())], act_softmax(), rng)


def test_predictor_network_path(jb):
    net = make(jb)
    p = Predictor(net, jb, buckets=(4, 16))
    p.warmup()
    x = np.random.default_rng(0).uniform(0, 1, size=(5, 6))
    probs = p.predict(x)
    assert probs.shape == (5, 3)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-6)
    # single sample squeezes
    one = p.predict(x[0])
    np.testing.assert_allclose(one, probs[0], atol=1e-9)
    assert p.latency()["n"] >= 2


def test_predictor_bucketing_pads_correctly(jb):
    net = make(jb)
    p = Predictor(net, jb, buckets=(8,))
    x = np.random.default_rng(1).uniform(0, 1, size=(3, 6))
    probs = p.predict(x)
    direct = np.asarray([np.asarray(net.run(jb, jb.asarray(xi))) for xi in x])
    np.testing.assert_allclose(probs, direct, atol=1e-9)


def test_predictor_fused_path(jb):
    net = make(jb)
    fm = FusedMLP.from_network(net, precision="highest")
    p = Predictor(fm, buckets=(8,))
    x = np.random.default_rng(2).uniform(0, 1, size=(4, 6))
    probs = p.predict(x)
    assert probs.shape == (4, 3)
    labels = p.predict_class(x)
    assert labels.shape == (4,)
