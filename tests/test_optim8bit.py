"""8-bit Adam (block-wise absmax moments): the contract is convergence
with 4x less optimizer memory — NOT bitwise equality with f32 adam —
plus the framework invariants every optimizer must keep: deterministic
crash/resume, checkpoint round-trips of int8 state, mesh + ZeRO-1
composition."""

import numpy as np
import pytest

import jax

from tensor_ops_tpu.backend.rng import Rng
from tensor_ops_tpu.models import (
    act_logistic,
    act_softmax,
    adam,
    adam8bit,
    cross_entropy,
    gen_net,
)
from tensor_ops_tpu.models.trainer import fit

multi = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices (see conftest note)"
)


def _task(n=256, seed=0):
    r = np.random.default_rng(seed)
    X = r.uniform(-1, 1, size=(n, 2))
    labels = (X[:, 0] * X[:, 1] > 0).astype(int)  # the dots quadrants
    return X, np.eye(2)[labels]


def _net(jb, seed=0):
    return gen_net(jb, 2, 2, [(16, act_logistic())], act_softmax(),
                   Rng(jb, seed=seed))


def test_adam8bit_converges_like_adam(jb):
    X, Y = _task()
    loss = cross_entropy(2)
    kw = dict(epochs=30, batch_size=64, lr=0.02, verbose=False,
              prefetch=0, log_every=10)
    r8 = fit(_net(jb, seed=1), loss, jb, X, Y, optimizer=adam8bit(), **kw)
    rf = fit(_net(jb, seed=1), loss, jb, X, Y, optimizer=adam(), **kw)
    l8, lf = r8.history[-1]["loss"], rf.history[-1]["loss"]
    l0 = r8.history[0]["loss"]
    assert l8 < 0.5 * l0, (l0, l8)          # it actually learns
    assert l8 < max(2.0 * lf, 0.05), (l8, lf)  # and tracks f32 adam


def test_adam8bit_state_is_int8_and_small(jb):
    net = _net(jb)
    opt = adam8bit(block=64)
    params = tuple(net.params)
    t, qs = opt.init(params)
    assert t == 0
    total_code_bytes = 0
    for (mq, ms, vq, vs), p in zip(qs, params):
        assert np.asarray(mq).dtype == np.int8
        assert np.asarray(vq).dtype == np.int8
        assert mq.shape[1] == 64 and ms.shape == (mq.shape[0], 1)
        total_code_bytes += mq.size + vq.size
    n_param = sum(int(np.prod(p.shape)) for p in params)
    # codes are 1 byte/element (padded to blocks); scales are 1/block
    assert total_code_bytes <= 2 * (n_param + 64 * len(params))

    # one update step moves params and requantizes finite moments
    grads = tuple(p * 0 + 0.01 for p in params)
    (t1, qs1), new_p = opt.update((t, qs), params, grads, 0.1)
    assert t1 == 1
    for a, b in zip(new_p, params):
        assert not np.allclose(np.asarray(a), np.asarray(b))
    for mq, ms, vq, vs in qs1:
        assert np.all(np.isfinite(np.asarray(ms)))
        assert np.asarray(mq).dtype == np.int8


def test_adam8bit_numpy_backend(nb):
    """The xp-dispatch keeps the numpy oracle path working."""
    X, Y = _task(n=64)
    res = fit(_net(nb, seed=2), cross_entropy(2), nb, X, Y, epochs=2,
              batch_size=32, lr=0.02, optimizer=adam8bit(block=32),
              verbose=False, prefetch=0, log_every=1)
    assert all(np.isfinite(h["loss"]) for h in res.history)
    assert res.history[-1]["loss"] < res.history[0]["loss"] * 1.5


def test_adam8bit_resume_bit_exact(jb, tmp_path):
    """Quantized moments are still deterministic state: crash/resume ==
    the uninterrupted run bit-exactly (int8 codes round-trip the
    checkpoint)."""
    X, Y = _task(n=128)
    loss = cross_entropy(2)
    ck = str(tmp_path / "a8.npz")
    kw = dict(batch_size=32, lr=0.02, optimizer=adam8bit(),
              verbose=False, prefetch=0, log_every=1)
    fit(_net(jb, seed=3), loss, jb, X, Y, epochs=1, checkpoint_path=ck,
        checkpoint_every=2, **kw)
    resumed = fit(_net(jb, seed=3), loss, jb, X, Y, epochs=2,
                  checkpoint_path=ck, checkpoint_every=2, resume=True,
                  **kw)
    straight = fit(_net(jb, seed=3), loss, jb, X, Y, epochs=2, **kw)
    assert resumed.steps == straight.steps == 8
    for a, b in zip(resumed.net.params, straight.net.params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=0, rtol=0)


@multi
def test_adam8bit_mesh_and_zero1(jb):
    """adam8bit on a dp x tp mesh with shard_opt_state=True: the int8
    code blocks shard over data (zero1 extends their inherited spec on
    the block axis) and training stays finite and learning."""
    from tensor_ops_tpu.models import squared_error
    from tensor_ops_tpu.parallel.mesh import (DATA_AXIS, make_mesh,
                                              zero1_place)

    mesh = make_mesh(8, shape=(4, 2))
    h = 16
    net = gen_net(jb, h, h, [(h, act_logistic())] * 2, act_logistic(),
                  Rng(jb, seed=4))
    opt = adam8bit(block=4)  # (64, 4) blocks: 64 % dp == 0 -> shards
    state, cons = zero1_place(opt.init(tuple(net.params)), mesh)
    assert cons is not None
    _, qs = state
    assert any(DATA_AXIS in str(x.sharding.spec)
               for leaf in qs for x in leaf)

    r = np.random.default_rng(5)
    X = r.uniform(0, 1, size=(64, h))
    Y = r.uniform(0, 1, size=(64, h))
    res = fit(net, squared_error(h), jb, X, Y, epochs=2, batch_size=16,
              lr=0.02, optimizer=adam8bit(block=4), mesh=mesh,
              shard_opt_state=True, verbose=False, prefetch=0,
              log_every=1)
    assert all(np.isfinite(hh["loss"]) for hh in res.history)
    assert res.history[-1]["loss"] < res.history[0]["loss"]


def test_adam8bit_memory_accounting(jb):
    """training_memory_report and plan_meshes charge adam8bit ~1 byte
    per code element + per-block scales instead of full-dtype moments."""
    from tensor_ops_tpu.models.optim import moment_footprint
    from tensor_ops_tpu.utils.profiling import training_memory_report

    net = _net(jb)
    bytes_per = np.dtype(net.params[0].dtype).itemsize
    n_param = sum(int(np.prod(p.shape)) for p in net.params)
    foot = moment_footprint(adam8bit(block=256), bytes_per)
    assert foot == 2 * (1 + bytes_per / 256)
    # the report is EXACT for adam8bit: codes + scales, each leaf
    # padded up to whole blocks — so on a TINY net the default block
    # size honestly reports MORE than f32 adam (padding dominates),
    # while a block matched to the leaves wins
    blk = 32
    r8 = training_memory_report(net, optimizer=adam8bit(block=blk),
                                batch_size=32)
    rf = training_memory_report(net, optimizer=adam(), batch_size=32)
    want = sum(2 * (-(-int(np.prod(p.shape)) // blk) * (blk + bytes_per))
               for p in net.params)
    assert r8["per_device"]["optimizer_bytes"] == want
    assert (r8["per_device"]["optimizer_bytes"]
            < rf["per_device"]["optimizer_bytes"])
    r256 = training_memory_report(net, optimizer=adam8bit(),
                                  batch_size=32)
    assert (r256["per_device"]["optimizer_bytes"]
            > rf["per_device"]["optimizer_bytes"])  # padding, honestly

    from tensor_ops_tpu.parallel.plan import plan_meshes

    p8 = plan_meshes(net, 4, batch_size=64, optimizer=adam8bit())
    pf = plan_meshes(net, 4, batch_size=64, optimizer=adam())
    by_shape = lambda ps: {tuple(p["mesh_shape"].values()):  # noqa: E731
                           p["training_state_bytes_per_device"]
                           for p in ps}
    b8, bf = by_shape(p8), by_shape(pf)
    assert all(b8[k] < bf[k] for k in b8)

# -- stochastic rounding (VERDICT r3 item 8) --------------------------------


def test_adam8bit_sr_unbiased_and_rescues_stalled_moments():
    """The deterministic-rounding pathology: a moment increment smaller
    than half a quantization step rounds to zero FOREVER when its block
    holds one large moment — the element never moves.  SR accumulates
    it in expectation.  Long-horizon drift: 10k steps on a separable
    quadratic, SR's loss must track f32 adam within a bound while
    nearest-rounding stalls the small coordinates."""
    from tensor_ops_tpu.models.optim import adam as _adam

    # one block of 256: element 0 carries a huge gradient, the rest tiny
    n = 256
    target = np.zeros(n)
    w0 = np.ones(n)
    g_scale = np.full(n, 1e-3)
    g_scale[0] = 1.0

    def run(opt, steps=10_000):
        w = (w0.copy(),)
        st = opt.init(w)
        for _ in range(steps):
            g = (g_scale * (w[0] - target),)
            st, w = opt.update(st, w, g, 0.01)
        return w[0]

    w_adam = run(_adam())
    w_det = run(adam8bit())
    w_sr = run(adam8bit(stochastic_rounding=True))

    def loss(w):
        return float(np.sum(g_scale * (w - target) ** 2))

    # f32 adam drives everything to ~0; SR stays within a small gap
    assert loss(w_adam) < 1e-6
    gap_sr = loss(w_sr) - loss(w_adam)
    gap_det = loss(w_det) - loss(w_adam)
    assert gap_sr < 0.05, f"SR drifted from adam: {gap_sr}"
    # and SR demonstrably rescues the stalled small coordinates
    assert gap_sr < 0.2 * gap_det, (gap_sr, gap_det)
    # the small coords moved under SR, stalled under nearest rounding
    assert np.abs(w_sr[1:]).mean() < 0.5 * np.abs(w_det[1:]).mean()


def test_adam8bit_sr_resume_bit_exact_and_footprint(jb, tmp_path):
    """SR noise is counter-based (step, leaf) — crash/resume chains are
    bit-identical; the state layout and moment_footprint are unchanged;
    the jax (jitted, traced-t) path trains finitely."""
    from tensor_ops_tpu.models.optim import moment_footprint

    opt = adam8bit(stochastic_rounding=True)
    assert (moment_footprint(opt, 8)
            == moment_footprint(adam8bit(), 8))
    assert opt.struct_key() != adam8bit().struct_key()  # distinct config

    X, Y = _task(n=128)
    loss = cross_entropy(2)
    ck = str(tmp_path / "a8sr.npz")
    kw = dict(batch_size=32, lr=0.02, optimizer=opt,
              verbose=False, prefetch=0, log_every=1)
    fit(_net(jb, seed=3), loss, jb, X, Y, epochs=1, checkpoint_path=ck,
        checkpoint_every=2, **kw)
    resumed = fit(_net(jb, seed=3), loss, jb, X, Y, epochs=2,
                  checkpoint_path=ck, checkpoint_every=2, resume=True,
                  **kw)
    straight = fit(_net(jb, seed=3), loss, jb, X, Y, epochs=2, **kw)
    assert resumed.steps == straight.steps == 8
    assert all(np.isfinite(h["loss"]) for h in straight.history)
    for a, b in zip(resumed.net.params, straight.net.params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=0, rtol=0)


@multi
def test_adam8bit_zero23_quantization_amplifies_reduction_order(jb):
    """adam8bit composed with zero_stage>=2 is APPROXIMATELY equal to
    the replicated run, not bit-equal: the reduce-scattered batch
    gradient differs from the all-reduced one by summation-order
    epsilon, and the int8 block quantization's decision thresholds
    amplify an epsilon flip to ~1e-2 relative moment error (measured
    ~1e-5 on the params after 8 steps).  ZeRO-1 (same all-reduce as
    replicated) stays bit-exact; full-precision optimizers stay at
    1e-9 under every stage.  This is a quantization property, not a
    sharding bug — the test pins the honest tolerance band."""
    from tensor_ops_tpu.models import cross_entropy
    from tensor_ops_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, shape=(8, 1))
    r = np.random.default_rng(7)
    X = r.normal(size=(256, 16))
    W = r.normal(size=(16, 4))
    Y = np.eye(4)[np.argmax(X @ W, axis=1)]
    loss = cross_entropy(4)

    def mknet():
        return gen_net(jb, 16, 4, [(32, act_logistic())], act_logistic(),
                       Rng(jb, seed=3))

    kw = dict(epochs=2, batch_size=64, lr=0.05, mesh=mesh, verbose=False)
    rep = fit(mknet(), loss, jb, X, Y, optimizer=adam8bit(), **kw)
    z1 = fit(mknet(), loss, jb, X, Y, optimizer=adam8bit(),
             shard_opt_state=True, **kw)
    for a, b in zip(z1.net.params, rep.net.params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=0, rtol=0)  # zero1: bit-exact
    for stage in (2, 3):
        z = fit(mknet(), loss, jb, X, Y, optimizer=adam8bit(),
                zero_stage=stage, **kw)
        for a, b in zip(z.net.params, rep.net.params):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=0)
        assert all(np.isfinite(h["loss"]) for h in z.history)


@multi
def test_adam8bit_exact_reduction_matches_replicated(jb):
    """adam8bit(exact_reduction=True) under zero_stage 2 and 3 equals
    the replicated run at 1e-9 (measured exactly equal here): the
    trainer pins each mean gradient replicated-then-sharded, so the
    partitioner emits the replicated run's all-reduce followed by a
    free local slice instead of a differently-ordered reduce-scatter —
    the opt-in exactness mode for the ~1e-3 default band pinned by
    the test above.  Costs all-reduce bytes (2x) — the default stays
    fast."""
    from tensor_ops_tpu.models import cross_entropy
    from tensor_ops_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, shape=(4, 2))  # dp x tp, per the VERDICT ask
    r = np.random.default_rng(7)
    X = r.normal(size=(256, 16))
    W = r.normal(size=(16, 4))
    Y = np.eye(4)[np.argmax(X @ W, axis=1)]
    loss = cross_entropy(4)

    def mknet():
        return gen_net(jb, 16, 4, [(32, act_logistic())], act_logistic(),
                       Rng(jb, seed=3))

    kw = dict(epochs=2, batch_size=64, lr=0.05, mesh=mesh, verbose=False)
    rep = fit(mknet(), loss, jb, X, Y, optimizer=adam8bit(), **kw)
    for stage in (2, 3):
        z = fit(mknet(), loss, jb, X, Y,
                optimizer=adam8bit(exact_reduction=True),
                zero_stage=stage, **kw)
        for a, b in zip(z.net.params, rep.net.params):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-9, rtol=0)
    # the flag is structural: caches and checkpoint validation must
    # distinguish it, and plain construction defaults to off
    assert adam8bit(exact_reduction=True).struct_key() \
        != adam8bit().struct_key()
    assert not adam8bit().exact_reduction
