import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from tensor_ops_tpu.backend.jax_backend import JaxBackend
from tensor_ops_tpu.backend.rng import Rng
from tensor_ops_tpu.models import act_logistic, squared_error
from tensor_ops_tpu.models.recurrent import gen_net as gen_rnet
from tensor_ops_tpu.ops import ir

be = JaxBackend(dtype=jnp.float32)
h = 2048
loss = squared_error(h)

def setup(n):
    net = gen_rnet(be, h, h, [(h, act_logistic(), act_logistic())],
                   act_logistic(), None, Rng(be, seed=0))
    r = np.random.default_rng(1)
    xs = be.asarray(r.uniform(-1, 1, size=(n, h)).astype(np.float32))
    ts = be.asarray(r.uniform(-1, 1, size=(n, h)).astype(np.float32))
    return net, (xs,) + net.states + net.params + (ts,)

def run(n, off, remat):
    net, args = setup(n)
    g = net._seq_graph(loss, n, remat_every=remat, offload_tape=off)
    fn = jax.jit(lambda *a: ir.grad(g, be, a))
    comp = fn.lower(*args).compile()
    ma = comp.memory_analysis()
    out = fn(*args)
    jax.block_until_ready(out)
    # single timed call, fully synced
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        walls.append(time.perf_counter() - t0)
    s = float(np.asarray(out[0]).sum())
    print(f"n={n} off={off} remat={remat}: temp {ma.temp_size_in_bytes/1e6:.1f} MB, "
          f"wall {min(walls)*1e3:.2f} ms, chk {s:.4f}")

run(256, False, None)
run(1024, False, None)
run(1024, True, None)
