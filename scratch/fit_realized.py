"""Measure fit()'s REALIZED end-to-end throughput at the flagship
config (784/300/100/10, batch 4096, sgd) on the real chip — the
production number next to bench.py's fori_loop step-rate headline
(VERDICT round-4 weak #1), chained vs unchained.

Method: one warm fit() first (absorbs every jit compile via the
net.op._compiled structural cache), then a timed fit() whose wall clock
covers EVERYTHING production covers: loader, transfers/gathers,
dispatch, snapshot rebinds, logging bookkeeping.  60k-row MNIST-shaped
synthetic dataset (14 full + 1 ragged step per epoch — the honest
epoch structure of the reference's own workload).
"""

import sys
import time

import numpy as np

import tensor_ops_tpu as T
from tensor_ops_tpu.backend.rng import Rng
from tensor_ops_tpu.models import act_logistic, act_softmax, cross_entropy, gen_net
from tensor_ops_tpu.models.trainer import fit

BATCH = 4096
ROWS = 60000
STEPS_PER_EPOCH = (ROWS + BATCH - 1) // BATCH  # 15 (14 full + ragged)


def make(be):
    return gen_net(be, 784, 10, [(300, act_logistic()), (100, act_logistic())],
                   act_softmax(), Rng(be, seed=0))


def run(chain_steps, epochs, **kw):
    be = T.JaxBackend()
    net = make(be)
    r = np.random.default_rng(1)
    X = r.uniform(0, 1, size=(ROWS, 784)).astype(np.float32)
    Y = np.eye(10, dtype=np.float32)[r.integers(0, 10, ROWS)]
    loss = cross_entropy(10)
    # warm: compiles every program this configuration will use
    fit(net, loss, be, X, Y, epochs=2, batch_size=BATCH, lr=0.02,
        chain_steps=chain_steps, verbose=False, **kw)
    t0 = time.perf_counter()
    res = fit(net, loss, be, X, Y, epochs=epochs, batch_size=BATCH, lr=0.02,
              chain_steps=chain_steps, verbose=False, **kw)
    wall = time.perf_counter() - t0
    # samples actually consumed: full epochs with one ragged tail each
    samples = epochs * ROWS
    return res.steps, wall, samples / wall


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "unchained"):
        steps, wall, rate = run(1, epochs=34)  # ~510 dispatches
        print(f"unchained: {steps} steps in {wall:.2f}s -> "
              f"{rate/1e6:.2f}M samples/s "
              f"({wall/steps*1e6:.0f}us/step realized)")
    if which in ("both", "chained"):
        steps, wall, rate = run("auto", epochs=140)  # ~2100 steps
        print(f"chained:   {steps} steps in {wall:.2f}s -> "
              f"{rate/1e6:.2f}M samples/s "
              f"({wall/steps*1e6:.0f}us/step realized)")
    if which == "prod":
        # the full production loop: metrics JSONL + periodic checkpoints
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            steps, wall, rate = run(
                "auto", epochs=140,
                metrics_path=os.path.join(d, "m.jsonl"),
                checkpoint_path=os.path.join(d, "ck.npz"),
                checkpoint_every=500)
        print(f"chained+prod: {steps} steps in {wall:.2f}s -> "
              f"{rate/1e6:.2f}M samples/s")
