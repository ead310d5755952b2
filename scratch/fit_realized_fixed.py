"""Realized fit() with chain_shuffle='device_fixed' (shuffle-once):
the grid + decomposition of scratch/fit_realized.py for the third
shuffle mode.  Run serially on the TPU."""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import tensor_ops_tpu as T  # noqa: E402
from tensor_ops_tpu.models import cross_entropy, fit, sgd  # noqa: E402

from bench import make_data, make_net  # noqa: E402


def main():
    be = T.JaxBackend()
    net = make_net(be)
    n, batch = 65536, 4096
    X, Y = make_data(n)
    spe = n // batch

    def run(epochs, log_every):
        t0 = time.perf_counter()
        res = fit(net, cross_entropy(10), be, X, Y, epochs=epochs,
                  batch_size=batch, lr=0.02, optimizer=sgd(),
                  chain_steps="auto", chain_shuffle="device_fixed",
                  log_every=log_every, verbose=False)
        for p in res.net.params:
            np.asarray(p)
        return time.perf_counter() - t0

    sweep, rows = [], []
    for le, ep in [(50, 200), (50, 800), (400, 200), (400, 800),
                   (3200, 400), (3200, 1600)]:
        steps = ep * spe
        wall = min(run(ep, le) for _ in range(3))
        row = dict(tag=f"fixed_log{le}_ep{ep}", steps=steps,
                   wall_s=round(wall, 3),
                   us_per_step=round(1e6 * wall / steps, 2),
                   samples_per_s=round(steps * batch / wall, 1))
        rows.append(row)
        print(json.dumps(row), flush=True)
        sweep.append((steps, le, wall))

    A = np.array([[s, s // le + 1, 1.0] for s, le, _ in sweep])
    wv = np.array([w for _, _, w in sweep])
    (a, b, c), *_ = np.linalg.lstsq(A, wv, rcond=None)
    print(json.dumps(dict(tag="decomposition_device_fixed",
                          marginal_us_per_step=round(1e6 * a, 2),
                          per_window_overhead_ms=round(1e3 * b, 2),
                          per_run_constant_s=round(c, 2),
                          marginal_samples_per_s=round(batch / a, 1))))


if __name__ == "__main__":
    main()
