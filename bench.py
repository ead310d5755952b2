#!/usr/bin/env python
"""Benchmark: flagship MNIST MLP (784 -> 300 -> 100 -> 10, logistic hidden
+ softmax out, cross-entropy — the reference's headline workload,
``/root/reference/app/MNIST.hs:89-104``) training throughput on the
available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is measured against the closest stand-in for the
reference's CPU path (the reference publishes no numbers — BASELINE.md):
this framework's own NumPy-oracle per-sample SGD on the same host, in
samples/second.
"""

from __future__ import annotations

import json
import time

import numpy as np


def make_net(be, seed=0):
    from tensor_ops_tpu.backend.rng import Rng
    from tensor_ops_tpu.models import act_logistic, act_softmax, gen_net

    rng = Rng(be, seed=seed)
    return gen_net(
        be, 784, 10,
        [(300, act_logistic()), (100, act_logistic())],
        act_softmax(), rng,
    )


def make_data(n, seed=1):
    r = np.random.default_rng(seed)
    x = r.uniform(0, 1, size=(n, 784))
    y = np.eye(10)[r.integers(0, 10, size=n)]
    return x, y


def bench_tpu(batch=1024, steps=30):
    import jax

    import tensor_ops_tpu as T
    from tensor_ops_tpu.models import cross_entropy
    from tensor_ops_tpu.models.training import batched_step

    be = T.JaxBackend()
    net = make_net(be)
    loss = cross_entropy(10)
    x, y = make_data(batch)
    xb, yb = be.asarray(x), be.asarray(y)
    step = batched_step(net, loss, be)

    params = net.params
    # warmup / compile
    v, params = step(0.02, xb, yb, *params)
    jax.block_until_ready(params)

    t0 = time.perf_counter()
    for _ in range(steps):
        v, params = step(0.02, xb, yb, *params)
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0
    return steps / dt, batch * steps / dt, float(v)


def bench_cpu_baseline(n_samples=60):
    """Per-sample SGD on the NumPy float64 oracle — the reference-shaped
    CPU path (per-sample SGD over C-backed dense kernels)."""
    import tensor_ops_tpu as T
    from tensor_ops_tpu.models import cross_entropy

    be = T.NumpyBackend()
    net = make_net(be)
    loss = cross_entropy(10)
    x, y = make_data(n_samples, seed=2)
    # warm caches
    net = net.train(loss, 0.02, be, x[0], y[0])
    t0 = time.perf_counter()
    m = net
    for k in range(1, n_samples):
        m = m.train(loss, 0.02, be, x[k], y[k])
    dt = time.perf_counter() - t0
    return (n_samples - 1) / dt


def main():
    steps_per_sec, samples_per_sec, last_loss = bench_tpu()
    base_samples_per_sec = bench_cpu_baseline()
    result = {
        "metric": "mnist_mlp_train_throughput",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / base_samples_per_sec, 2),
        "detail": {
            "batch": 1024,
            "tpu_steps_per_sec": round(steps_per_sec, 2),
            "cpu_oracle_per_sample_sgd_samples_per_sec": round(base_samples_per_sec, 1),
            "final_loss": round(last_loss, 4),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
