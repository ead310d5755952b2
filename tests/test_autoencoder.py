"""Autoencoder tests (``AutoEncoder.hs`` semantics)."""

import numpy as np

from tensor_ops_tpu.backend.rng import Rng
from tensor_ops_tpu.models import act_logistic, gen_net, squared_error
from tensor_ops_tpu.models.autoencoder import Encoder


def make_enc(be, seed=5):
    rng = Rng(be, seed=seed)
    e = gen_net(be, 6, 2, [], act_logistic(), rng)
    d = gen_net(be, 2, 6, [], act_logistic(), rng)
    return Encoder(e, d)


def test_encode_decode_shapes(nb):
    enc = make_enc(nb)
    x = np.random.default_rng(0).uniform(0.1, 0.9, size=6)
    z = enc.encode(nb, x)
    assert np.asarray(z).shape == (2,)
    xr = enc.decode(nb, z)
    assert np.asarray(xr).shape == (6,)
    np.testing.assert_allclose(
        np.asarray(enc.encode_decode(nb, x)), np.asarray(xr), atol=1e-12
    )


def test_grad_matches_finite_differences(nb):
    enc = make_enc(nb)
    loss = squared_error(6)
    x = np.random.default_rng(1).uniform(0.1, 0.9, size=6)
    gE, gD = enc.grad(loss, nb, x)
    eps = 1e-6
    # check a few encoder-weight entries
    for idx in [(0, 0), (1, 3)]:
        for k, grads in ((0, gE),):
            pp = [p.copy() for p in enc.encoder.params]
            pm = [p.copy() for p in enc.encoder.params]
            pp[k][idx] += eps
            pm[k][idx] -= eps
            from tensor_ops_tpu.models.feedforward import Network

            ep = Encoder(Network(enc.encoder.op, tuple(pp)), enc.decoder)
            em = Encoder(Network(enc.encoder.op, tuple(pm)), enc.decoder)
            fd = (ep.test_loss(loss, nb, x) - em.test_loss(loss, nb, x)) / (2 * eps)
            assert abs(fd - grads[k][idx]) < 1e-5
    # decoder bias entry
    pp = [p.copy() for p in enc.decoder.params]
    pm = [p.copy() for p in enc.decoder.params]
    pp[1][2] += eps
    pm[1][2] -= eps
    from tensor_ops_tpu.models.feedforward import Network

    ep = Encoder(enc.encoder, Network(enc.decoder.op, tuple(pp)))
    em = Encoder(enc.encoder, Network(enc.decoder.op, tuple(pm)))
    fd = (ep.test_loss(loss, nb, x) - em.test_loss(loss, nb, x)) / (2 * eps)
    assert abs(fd - gD[1][2]) < 1e-5


def test_training_reduces_reconstruction_loss(nb):
    enc = make_enc(nb, seed=7)
    loss = squared_error(6)
    rng = np.random.default_rng(2)
    # data on a 2D manifold in 6D
    zs = rng.uniform(0.2, 0.8, size=(30, 2))
    proj = rng.normal(size=(2, 6))
    data = 1 / (1 + np.exp(-(zs @ proj)))
    l0 = float(np.mean([enc.test_loss(loss, nb, x) for x in data]))
    e = enc
    for _ in range(30):
        for x in data:
            e = e.train(loss, 0.5, nb, x)
    l1 = float(np.mean([e.test_loss(loss, nb, x) for x in data]))
    assert l1 < 0.5 * l0, (l0, l1)


def test_parity_numpy_jax(nb, jb):
    from tensor_ops_tpu.models.feedforward import Network

    enc = make_enc(nb, seed=9)
    jenc = Encoder(
        Network(enc.encoder.op, tuple(jb.asarray(p) for p in enc.encoder.params)),
        Network(enc.decoder.op, tuple(jb.asarray(p) for p in enc.decoder.params)),
    )
    loss = squared_error(6)
    x = np.random.default_rng(3).uniform(0.1, 0.9, size=6)
    a = enc.test_loss(loss, nb, x)
    b = jenc.test_loss(loss, jb, jb.asarray(x))
    assert abs(a - b) < 1e-9
    gE1, gD1 = enc.grad(loss, nb, x)
    gE2, gD2 = jenc.grad(loss, jb, jb.asarray(x))
    for p, q in zip(gE1 + gD1, gE2 + gD2):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q), atol=1e-9)
