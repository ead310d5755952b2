"""Offload per-step overhead on the real chip: flagship fit step with
adam, on-device vs pinned-host moments (differential timing)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax

import tensor_ops_tpu as T
from tensor_ops_tpu.backend.rng import Rng
from tensor_ops_tpu.models import act_logistic, act_softmax, adam, cross_entropy, gen_net
from tensor_ops_tpu.models.trainer import make_opt_step

be = T.JaxBackend()
net = gen_net(be, 784, 10, [(300, act_logistic()), (100, act_logistic())],
              act_softmax(), Rng(be, seed=0))
loss = cross_entropy(10)
B = 4096
r = np.random.default_rng(0)
xb = be.asarray(r.uniform(0, 1, size=(B, 784)).astype(np.float32))
yb = be.asarray(np.eye(10)[r.integers(0, 10, size=B)].astype(np.float32))

def run(offload):
    opt = adam()
    step = make_opt_step(net, loss, be, opt, offload=offload)
    state = opt.init(net.params)
    if offload:
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, jax.memory.Space.Host)
            if isinstance(x, jax.Array) else x, state)
    params = net.params
    # warm
    v, state, params = step(0.05, xb, yb, state, params)
    jax.block_until_ready(v)
    N = 200
    t0 = time.perf_counter()
    for _ in range(N):
        v, state, params = step(0.05, xb, yb, state, params)
    jax.block_until_ready(v)
    dt = (time.perf_counter() - t0) / N
    return dt, float(v)

for name, off in [("on_device", False), ("offload", True)]:
    times = [run(off) for _ in range(3)]
    best = min(t for t, _ in times)
    print(f"{name}: {best*1e6:.1f} us/step ({B/best/1e6:.1f}M samples/s), loss {times[0][1]:.4f}")
