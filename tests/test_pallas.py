"""Pallas fused-kernel tests. On CPU these run in interpret mode (exact),
so the numerics contract is testable without a TPU; the real-hardware
equivalents run in bench.py."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from tensor_ops_tpu.ops.pallas_kernels import (
    fused_linear,
    fused_mlp_forward,
    pick_tiles,
)


from tensor_ops_tpu.testing import rand as r  # noqa: E402


def test_fused_linear_matches_xla():
    x = jnp.asarray(r(0, 16, 48), dtype=jnp.float32)
    w = jnp.asarray(r(1, 24, 48) * 0.2, dtype=jnp.float32)
    b = jnp.asarray(r(2, 24), dtype=jnp.float32)
    for act, f in [
        ("identity", lambda z: z),
        ("relu", lambda z: jnp.maximum(z, 0)),
        ("logistic", jax.nn.sigmoid),
        ("tanh", jnp.tanh),
    ]:
        y = fused_linear(x, w, b, act, "highest")
        want = f(jnp.dot(x, w.T, precision=lax.Precision.HIGHEST) + b)
        np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-6)


def test_fused_linear_odd_shapes():
    x = jnp.asarray(r(3, 7, 13), dtype=jnp.float32)
    w = jnp.asarray(r(4, 5, 13) * 0.2, dtype=jnp.float32)
    b = jnp.asarray(r(5, 5), dtype=jnp.float32)
    y = fused_linear(x, w, b, "relu", "highest")
    want = jnp.maximum(jnp.dot(x, w.T, precision=lax.Precision.HIGHEST) + b, 0)
    assert y.shape == (7, 5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-6)


def test_fused_linear_custom_vjp_matches_autodiff():
    x = jnp.asarray(r(6, 8, 20), dtype=jnp.float32)
    w = jnp.asarray(r(7, 12, 20) * 0.2, dtype=jnp.float32)
    b = jnp.asarray(r(8, 12), dtype=jnp.float32)

    def pal(x, w, b):
        return jnp.sum(fused_linear(x, w, b, "logistic", "highest") ** 2)

    def ref(x, w, b):
        z = jnp.dot(x, w.T, precision=lax.Precision.HIGHEST) + b
        return jnp.sum(jax.nn.sigmoid(z) ** 2)

    gp = jax.grad(pal, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(ref, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


def test_fused_mlp_forward_matches_chain():
    x = jnp.asarray(r(9, 10, 30), dtype=jnp.float32)
    ws = [jnp.asarray(r(10, 20, 30) * 0.2, dtype=jnp.float32),
          jnp.asarray(r(11, 6, 20) * 0.2, dtype=jnp.float32)]
    bs = [jnp.asarray(r(12, 20), dtype=jnp.float32),
          jnp.asarray(r(13, 6), dtype=jnp.float32)]
    y = fused_mlp_forward(x, ws, bs, ["logistic", "identity"],
                          softmax_out=True, precision="highest")
    h = jax.nn.sigmoid(jnp.dot(x, ws[0].T, precision=lax.Precision.HIGHEST) + bs[0])
    want = jax.nn.softmax(jnp.dot(h, ws[1].T, precision=lax.Precision.HIGHEST) + bs[1], axis=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-6)
    # softmax over real classes only (padded lanes masked)
    np.testing.assert_allclose(np.asarray(y).sum(axis=1), 1.0, atol=1e-6)


def test_pick_tiles_divide_padded_dims():
    for B, K, O in [(64, 784, 300), (4096, 4096, 4096), (7, 13, 5), (1024, 300, 100)]:
        tb, to, tk = pick_tiles(B, K, O)
        assert tb % 8 == 0 and to % 128 == 0 and tk % 128 == 0


def test_fused_mlp_model_roundtrip(jb):
    """FusedMLP.from_network parity with the IR path (highest precision)."""
    from tensor_ops_tpu.backend.rng import Rng
    from tensor_ops_tpu.models import act_logistic, act_softmax, gen_net
    from tensor_ops_tpu.models.fast import FusedMLP
    from tensor_ops_tpu.models.training import batched_run

    rng = Rng(jb, seed=0)
    net = gen_net(jb, 12, 4, [(8, act_logistic())], act_softmax(), rng)
    fm = FusedMLP.from_network(net, ["logistic", "identity"], precision="highest")
    xb = jb.asarray(r(14, 6, 12))
    y_ir = np.asarray(batched_run(net, jb)(xb, *net.params))
    y_f = np.asarray(fm.run(xb))
    np.testing.assert_allclose(y_f, y_ir, atol=1e-6)
    v, fm2 = fm.train(0.1, xb, jb.asarray(np.eye(4)[[0, 1, 2, 3, 0, 1]]))
    assert np.isfinite(float(v))


def test_fused_mlp_train_step_matches_xla_autodiff():
    """The whole-step mega-kernel == XLA value_and_grad + SGD update
    (exact at highest precision)."""
    from tensor_ops_tpu.ops.pallas_kernels import fused_mlp_train_step

    rr = np.random.default_rng(0)
    B, dims = 16, [12, 8, 6, 4]
    ws = [jnp.asarray(rr.normal(size=(dims[k + 1], dims[k])) * 0.3, jnp.float32)
          for k in range(3)]
    bs = [jnp.asarray(rr.normal(size=(dims[k + 1],)) * 0.3, jnp.float32)
          for k in range(3)]
    x = jnp.asarray(rr.uniform(0, 1, size=(B, 12)), jnp.float32)
    y = jnp.asarray(np.eye(4)[rr.integers(0, 4, size=B)], jnp.float32)

    def loss_fn(ws, bs):
        h = x
        for k in range(2):
            h = jax.nn.sigmoid(
                jnp.dot(h, ws[k].T, precision=lax.Precision.HIGHEST) + bs[k])
        z = jnp.dot(h, ws[2].T, precision=lax.Precision.HIGHEST) + bs[2]
        p = jax.nn.softmax(z, axis=1)
        return -jnp.mean(jnp.sum(y * jnp.log(p), axis=1))

    v_ref, (gw, gb) = jax.value_and_grad(loss_fn, argnums=(0, 1))(ws, bs)
    ws_ref = [w - 0.1 * g for w, g in zip(ws, gw)]
    bs_ref = [b - 0.1 * g for b, g in zip(bs, gb)]

    v_pal, ws_pal, bs_pal = fused_mlp_train_step(
        x, y, ws, bs, 0.1, ["logistic", "logistic", "identity"],
        precision="highest")
    assert abs(float(v_ref) - float(v_pal)) < 1e-6
    for a, b in zip(ws_ref + bs_ref, list(ws_pal) + list(bs_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fusedmlp_train_fullfused(jb):
    from tensor_ops_tpu.backend.rng import Rng
    from tensor_ops_tpu.models import act_logistic, act_softmax, gen_net
    from tensor_ops_tpu.models.fast import FusedMLP

    rng = Rng(jb, seed=0)
    net = gen_net(jb, 12, 4, [(8, act_logistic())], act_softmax(), rng)
    fm = FusedMLP.from_network(net, precision="highest")
    # compare both paths in f32 (the mega-kernel computes in f32)
    fm = FusedMLP(tuple(w.astype(jnp.float32) for w in fm.weights),
                  tuple(b.astype(jnp.float32) for b in fm.biases),
                  fm.acts, fm.softmax_out, "highest")
    rr = np.random.default_rng(1)
    xb = jnp.asarray(rr.uniform(0, 1, size=(10, 12)), jnp.float32)
    yb = jnp.asarray(np.eye(4)[rr.integers(0, 4, size=10)], jnp.float32)
    v1, fm1 = fm.train(0.1, xb, yb)
    v2, fm2 = fm.train_fullfused(0.1, xb, yb)
    assert abs(float(v1) - float(v2)) < 1e-5
    for a, b in zip(fm1.weights, fm2.weights):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_int8_weight_quantization_roundtrip():
    from tensor_ops_tpu.ops.pallas_kernels import quantize_weights_int8

    w = jnp.asarray(r(20, 6, 10) * 0.7, jnp.float32)
    q, s = quantize_weights_int8(w)
    assert q.dtype == jnp.int8 and s.shape == (6, 1)
    w2 = q.astype(jnp.float32) * s
    # per-channel max error bounded by half a quantization step
    step = np.asarray(s)[:, 0] if np.asarray(s).ndim == 2 else np.asarray(s)
    err = np.abs(np.asarray(w) - np.asarray(w2)).max(axis=1)
    assert (err <= step * 0.5 + 1e-7).all()


def test_fused_linear_w8_close_to_full_precision():
    from tensor_ops_tpu.ops.pallas_kernels import (
        fused_linear,
        fused_linear_w8,
        quantize_weights_int8,
    )

    x = jnp.asarray(r(21, 8, 16), jnp.float32)
    w = jnp.asarray(r(22, 6, 16) * 0.3, jnp.float32)
    b = jnp.asarray(r(23, 6) * 0.1, jnp.float32)
    q, s = quantize_weights_int8(w)
    y8 = fused_linear_w8(x, q, s, b, "logistic", "highest")
    y32 = fused_linear(x, w, b, "logistic", "highest")
    # int8 weight error propagates mildly through logistic
    np.testing.assert_allclose(np.asarray(y8), np.asarray(y32), atol=0.02)


def test_fused_linear_w8a8_close_to_full_precision():
    """int8 x int8 -> int32 MXU path: per-row activation quantization on
    top of per-channel weight quantization stays within the combined
    quantization error of the f32 result."""
    from tensor_ops_tpu.ops.pallas_kernels import (
        fused_linear,
        fused_linear_w8a8,
        quantize_weights_int8,
    )

    x = jnp.asarray(r(31, 8, 16), jnp.float32)
    w = jnp.asarray(r(32, 6, 16) * 0.3, jnp.float32)
    b = jnp.asarray(r(33, 6) * 0.1, jnp.float32)
    q, s = quantize_weights_int8(w)
    y8 = fused_linear_w8a8(x, q, s, b, "logistic")
    y32 = fused_linear(x, w, b, "logistic", "highest")
    np.testing.assert_allclose(np.asarray(y8), np.asarray(y32), atol=0.03)


def test_fused_linear_w8a8_int32_exact():
    """With integer-valued inputs that need no rounding, the int8 MXU
    path is EXACT: the int32 accumulator carries no float error."""
    from tensor_ops_tpu.ops.pallas_kernels import fused_linear_w8a8

    rr = np.random.default_rng(7)
    x = jnp.asarray(rr.integers(-127, 128, size=(5, 12)), jnp.float32)
    wq = jnp.asarray(rr.integers(-127, 128, size=(9, 12)), jnp.int8)
    sw = jnp.ones((9, 1), jnp.float32)
    b = jnp.zeros((9,), jnp.float32)
    y = fused_linear_w8a8(x, wq, sw, b, "identity")
    # per-row activation scale is amax/127; with integer x in [-127,127]
    # the quantized values reproduce x / sx exactly only when amax==127,
    # so force that: include a 127 in every row
    x = x.at[:, 0].set(127.0)
    y = fused_linear_w8a8(x, wq, sw, b, "identity")
    want = np.asarray(x) @ np.asarray(wq, np.float32).T
    np.testing.assert_allclose(np.asarray(y), want, rtol=0, atol=1e-4)


def test_fused_mlp_w8a8_matches_per_layer_chain():
    """The whole-MLP int8 megakernel computes the SAME math as the
    per-layer fused_linear_w8a8 chain (same per-row dynamic quantization
    between layers), so the two agree to float round-off."""
    from tensor_ops_tpu.ops.pallas_kernels import (
        fused_linear_w8a8,
        fused_mlp_w8a8_forward,
        quantize_weights_int8,
    )

    N, L, B = 128, 3, 5
    ws = [jnp.asarray(r(40 + k, N, N) * 0.2, jnp.float32) for k in range(L)]
    bs = [jnp.asarray(r(50 + k, N) * 0.1, jnp.float32) for k in range(L)]
    qs, ss = zip(*(quantize_weights_int8(w) for w in ws))
    x = jnp.asarray(r(60, B, N), jnp.float32)

    h = x
    for k in range(L):
        h = fused_linear_w8a8(h, qs[k], ss[k], bs[k],
                              "relu" if k < L - 1 else "identity")
    y1 = np.asarray(h)

    wq3 = jnp.stack(qs)
    sw2 = jnp.stack([s.reshape(-1) for s in ss])
    b2 = jnp.stack(bs)
    y2 = np.asarray(fused_mlp_w8a8_forward(x, wq3, sw2, b2, "relu"))
    np.testing.assert_allclose(y2, y1, rtol=1e-5, atol=1e-4)


def test_quantized_mlp_run_fused_uniform_stack():
    from tensor_ops_tpu.models.fast import QuantizedMLP
    from tensor_ops_tpu.ops.pallas_kernels import quantize_weights_int8

    N, L = 128, 3
    ws = [jnp.asarray(r(70 + k, N, N) * 0.2, jnp.float32) for k in range(L)]
    bs = [jnp.asarray(r(80 + k, N) * 0.1, jnp.float32) for k in range(L)]
    qs, ss = zip(*(quantize_weights_int8(w) for w in ws))
    qm = QuantizedMLP(tuple(qs), tuple(ss), tuple(bs),
                      ("logistic", "logistic", "identity"))
    x = jnp.asarray(r(90, 4, N), jnp.float32)
    p1 = np.asarray(qm.run(x))
    p2 = np.asarray(qm.run_fused(x))
    np.testing.assert_allclose(p2, p1, rtol=1e-5, atol=1e-5)
    # non-uniform stack refuses cleanly
    bad = QuantizedMLP((qs[0], qs[1][:64]), (ss[0], ss[1][:64]),
                       (bs[0], bs[1][:64]), ("relu", "identity"))
    with pytest.raises(ValueError):
        bad.run_fused(x)


@pytest.mark.parametrize("mode", ["w8", "w8a8"])
def test_quantized_mlp_matches_fused(jb, mode):
    from tensor_ops_tpu.backend.rng import Rng
    from tensor_ops_tpu.models import act_logistic, act_softmax, gen_net
    from tensor_ops_tpu.models.fast import FusedMLP, QuantizedMLP

    rng = Rng(jb, seed=0)
    net = gen_net(jb, 10, 4, [(8, act_logistic())], act_softmax(), rng)
    fm = FusedMLP.from_network(net, precision="highest")
    qm = QuantizedMLP.from_fused(fm, mode=mode)
    x = jnp.asarray(r(24, 5, 10), jnp.float32)
    pf = np.asarray(fm.run(x))
    pq = np.asarray(qm.run(x))
    np.testing.assert_allclose(pq.sum(axis=1), 1.0, atol=1e-5)
    assert (pf.argmax(axis=1) == pq.argmax(axis=1)).all()
    np.testing.assert_allclose(pq, pf, atol=0.05)


def test_fused_rnn_step_matches_recurrent_network(nb):
    """fused_rnn_step == the IR fullyConnected step: y is the
    pre-activation, new state is logistic(z) (Recurrent.hs:97-125)."""
    from tensor_ops_tpu.backend.rng import Rng
    from tensor_ops_tpu.models import act_logistic
    from tensor_ops_tpu.models.recurrent import fully_connected
    from tensor_ops_tpu.ops.pallas_kernels import fused_rnn_step

    rng = Rng(nb, seed=31)
    net = fully_connected(act_logistic(), nb, 3, 5, rng)
    wS, wX, bb = net.params
    (s0,) = net.states
    x = r(30, 3)
    y_ref, net2 = net.run(nb, x)
    y, snew = fused_rnn_step(
        jnp.asarray(x[None], jnp.float32), jnp.asarray(s0[None], jnp.float32),
        jnp.asarray(wX, jnp.float32), jnp.asarray(wS, jnp.float32),
        jnp.asarray(bb, jnp.float32), "logistic", "highest")
    np.testing.assert_allclose(np.asarray(y)[0], np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(snew)[0], np.asarray(net2.states[0]),
                               atol=1e-5)


def test_fused_rnn_scan_bptt_matches_ir(nb):
    """lax.scan over fused_rnn_step: sequence loss and parameter
    gradients match the IR ScanOp path."""
    from tensor_ops_tpu.backend.rng import Rng
    from tensor_ops_tpu.models import act_logistic, squared_error
    from tensor_ops_tpu.models.recurrent import fully_connected
    from tensor_ops_tpu.ops.pallas_kernels import fused_rnn_step

    rng = Rng(nb, seed=32)
    net = fully_connected(act_logistic(), nb, 2, 3, rng)
    wS, wX, bb = (jnp.asarray(p, jnp.float32) for p in net.params)
    s0 = jnp.asarray(net.states[0], jnp.float32)
    xs = r(33, 4, 2).astype(np.float32)
    tg = r(34, 4, 3).astype(np.float32)

    def seq_loss(wX, wS, bb, s0):
        def step(s, xt):
            y, snew = fused_rnn_step(xt[None], s[None], wX, wS, bb,
                                     "logistic", "highest")
            return snew[0], y[0]

        _, ys = lax.scan(step, s0, jnp.asarray(xs))
        return jnp.sum((jnp.asarray(tg) - ys) ** 2)

    v = float(seq_loss(wX, wS, bb, s0))
    want = float(np.asarray(net.seq_loss(squared_error(3), nb, xs, tg)))
    assert abs(v - want) < 1e-4, (v, want)

    g = jax.grad(seq_loss, argnums=(0, 1, 2))(wX, wS, bb, s0)
    _, gS_ir, gP_ir = net.seq_grad(squared_error(3), nb, xs, tg)
    # IR params order: (wS, wX, b)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(gP_ir[1]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(gP_ir[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g[2]), np.asarray(gP_ir[2]), atol=1e-4)


def test_fused_rnn_model_trains(nb):
    from tensor_ops_tpu.backend.rng import Rng
    from tensor_ops_tpu.models import act_logistic
    from tensor_ops_tpu.models.fast import FusedRNN
    from tensor_ops_tpu.models.recurrent import fully_connected

    rng = Rng(nb, seed=41)
    net = fully_connected(act_logistic(), nb, 1, 4, rng)
    frnn = FusedRNN.from_recurrent(net)
    t = np.linspace(0, 2 * np.pi, 13, dtype=np.float32)
    xs = np.sin(t[:-1]).reshape(-1, 1)
    # target only the first output unit tracks the next sample
    tg = np.zeros((12, 4), np.float32)
    tg[:, 0] = np.sin(t[1:])
    v0, m = frnn.train(0.02, 0.05, xs, tg)
    for _ in range(60):
        v, m = m.train(0.02, 0.05, xs, tg)
    assert v < 0.7 * v0, (v0, v)
    ys, s_final = m.seq_forward(xs)
    assert np.asarray(ys).shape == (12, 4) and np.asarray(s_final).shape == (4,)


def test_fused_autoencoder_style_mse_training(jb):
    """FusedMLP with loss_kind='mse' and no softmax trains an
    encoder-decoder reconstruction (the autoencoder fast path)."""
    from tensor_ops_tpu.backend.rng import Rng
    from tensor_ops_tpu.models import act_logistic, gen_net
    from tensor_ops_tpu.models.fast import FusedMLP

    rng = Rng(jb, seed=51)
    # 8 -> 3 -> 8 bottleneck as one chain
    net = gen_net(jb, 8, 8, [(3, act_logistic())], act_logistic(), rng)
    fm = FusedMLP.from_network(net, softmax_out=False, precision="highest")
    fm = FusedMLP(fm.weights, fm.biases, fm.acts, False, "highest", "mse")
    rr = np.random.default_rng(0)
    # rank-2 data through a logistic squashing -> reconstructable via a
    # 3-unit bottleneck
    z = rr.uniform(-1, 1, size=(16, 2))
    proj = rr.normal(size=(2, 8))
    xb = jnp.asarray(1 / (1 + np.exp(-(z @ proj))), jnp.float32)
    v0, m = fm.train(0.5, xb, xb)
    for _ in range(400):
        v, m = m.train(0.5, xb, xb)
    assert m.loss_kind == "mse"
    assert v < 0.3 * v0, (v0, v)


def test_fused_linear_mixed_dtype_grads():
    """bf16 activations with an f32 bias: custom-VJP cotangent dtypes must
    match the primal dtypes (regression)."""
    x = jnp.asarray(r(60, 8, 16), jnp.bfloat16)
    w = jnp.asarray(r(61, 4, 16) * 0.2, jnp.bfloat16)
    b = jnp.asarray(r(62, 4) * 0.1, jnp.float32)

    def f(x, w, b):
        return jnp.sum(fused_linear(x, w, b, "relu").astype(jnp.float32))

    gx, gw, gb = jax.grad(f, argnums=(0, 1, 2))(x, w, b)
    assert gx.dtype == jnp.bfloat16 and gw.dtype == jnp.bfloat16
    assert gb.dtype == jnp.float32


def test_pick_tiles_full_k_policy():
    """Perf regression guard: the fwd path streams the FULL contraction
    dim in one pass for K<=8192 (the 96%-of-peak config, BENCH.md) and
    falls back to a 512-deep K loop beyond."""
    from tensor_ops_tpu.ops.pallas_kernels import pick_tiles

    tb, to, tk = pick_tiles(4096, 4096, 4096)
    assert (tb, to, tk) == (512, 512, 4096)
    tb, to, tk = pick_tiles(4096, 16384, 4096)
    assert tk == 512
    # small dims collapse to one padded tile
    tb, to, tk = pick_tiles(64, 784, 300)
    assert tb == 64 and to == 384 and tk == 896


def test_fused_rnn_impl_parity_and_preservation():
    """The default XLA cell and the pallas kernel produce the same
    sequence outputs (f64 on CPU: tight), and ``impl`` survives train."""
    import dataclasses

    from tensor_ops_tpu.models.fast import FusedRNN

    rr = np.random.default_rng(3)
    i, o, T = 5, 7, 11
    m = FusedRNN(
        wX=jnp.asarray(rr.normal(size=(o, i)) * 0.3, jnp.float32),
        wS=jnp.asarray(rr.normal(size=(o, o)) * 0.3, jnp.float32),
        b=jnp.zeros((o,), jnp.float32), s0=jnp.zeros((o,), jnp.float32))
    assert m.impl == "xla"
    mp = dataclasses.replace(m, impl="pallas", _cache={})
    xs = rr.normal(size=(T, i)).astype(np.float32)
    tg = (0.3 * rr.normal(size=(T, o))).astype(np.float32)
    ys_x, sf_x = m.seq_forward(xs)
    ys_p, sf_p = mp.seq_forward(xs)
    # tight on CPU (both impls f32); the real TPU runs default matmul
    # precision (bf16 multiplies) with different op orders per impl
    tol = 5e-2 if os.environ.get("TOPS_TEST_TPU") == "1" else 1e-5
    np.testing.assert_allclose(np.asarray(ys_x), np.asarray(ys_p),
                               atol=tol, rtol=tol)
    v_x, m2 = m.train(0.01, 0.001, xs, tg)
    v_p, _ = mp.train(0.01, 0.001, xs, tg)
    assert abs(v_x - v_p) < 20 * tol * max(1.0, abs(v_x))
    assert m2.impl == "xla"


def test_predictor_default_uses_whole_mlp_kernel():
    """Serving default: the whole-MLP single-kernel path (fastest at the
    latency-critical buckets, BENCH.md)."""
    from tensor_ops_tpu.models.fast import FusedMLP
    from tensor_ops_tpu.models.serve import Predictor

    rr = np.random.default_rng(4)
    m = FusedMLP(
        weights=[jnp.asarray(rr.normal(size=(6, 4)) * 0.3, jnp.float32),
                 jnp.asarray(rr.normal(size=(3, 6)) * 0.3, jnp.float32)],
        biases=[jnp.zeros((6,), jnp.float32), jnp.zeros((3,), jnp.float32)],
        acts=["logistic", "identity"], softmax_out=True)
    p = Predictor(m)
    assert p.use_fused_kernel is True
    out = p.predict(rr.uniform(0, 1, size=(5, 4)))
    assert out.shape == (5, 3)
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-5)


def test_quantized_run_fused_applies_final_activation():
    """Regression (code review): with softmax_out=False the megakernel
    emits raw logits — run_fused must still apply acts[-1] so it equals
    run() exactly."""
    from tensor_ops_tpu.models.fast import QuantizedMLP
    from tensor_ops_tpu.ops.pallas_kernels import quantize_weights_int8

    N = 128
    ws = [jnp.asarray(r(95 + k, N, N) * 0.2, jnp.float32) for k in range(2)]
    bs = [jnp.asarray(r(97 + k, N) * 0.1, jnp.float32) for k in range(2)]
    qs, ss = zip(*(quantize_weights_int8(w) for w in ws))
    qm = QuantizedMLP(tuple(qs), tuple(ss), tuple(bs), ("relu", "relu"),
                      softmax_out=False)
    x = jnp.asarray(r(99, 4, N), jnp.float32)
    y_run = np.asarray(qm.run(x))
    y_fused = np.asarray(qm.run_fused(x))
    assert (y_fused >= 0).all()  # relu applied
    np.testing.assert_allclose(y_fused, y_run, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("B,o,i", [(1, 6, 16), (33, 10, 40), (40, 130, 257),
                                   (5, 128, 128)])
def test_fused_linear_w8a8_odd_shapes(B, o, i):
    """Padding paths: batch not a 32-multiple, odd feature dims — the
    int8 kernel must pad to legal tiles and strip exactly."""
    from tensor_ops_tpu.ops.pallas_kernels import (
        fused_linear_w8a8,
        quantize_acts_int8,
        quantize_weights_int8,
    )

    x = jnp.asarray(r(200 + B, B, i), jnp.float32)
    w = jnp.asarray(r(201 + B, o, i) * 0.3, jnp.float32)
    b = jnp.asarray(r(202 + B, o) * 0.1, jnp.float32)
    q, s = quantize_weights_int8(w)
    y = fused_linear_w8a8(x, q, s, b, "identity")
    assert y.shape == (B, o)
    # reference: same quantized math in plain numpy
    xq, sx = quantize_acts_int8(x)
    want = (np.asarray(xq, np.int32) @ np.asarray(q, np.int32).T
            ).astype(np.float32) * np.asarray(sx) * np.asarray(s).T \
        + np.asarray(b)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-5)
