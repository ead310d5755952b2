import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
Host, Dev = jax.memory.Space.Host, jax.memory.Space.Device
n, k, d = 16, 4, 8
W = jnp.asarray(np.random.default_rng(0).normal(size=(d, d)) * 0.3, jnp.float32)
xs = jnp.asarray(np.random.default_rng(1).normal(size=(n, d)), jnp.float32)
s0 = jnp.zeros((d,), jnp.float32)

def fwd_mixed(W, s0, xs):
    # emit BOTH a device value and a host value per step
    def f(c, x):
        nc = jnp.tanh(W @ c + x)
        return nc, (nc * 2.0, jax.device_put(c, Host))
    return jax.lax.scan(f, s0, xs)

def fwd_block_mixed(W, s0, xs):
    xb = xs.reshape(n // k, k, d)
    def f(c, x):
        nc = jnp.tanh(W @ c + x)
        return nc, nc * 2.0
    def blk(c, x_blk):
        c_end, ys = jax.lax.scan(f, c, x_blk)
        return c_end, (ys, jax.device_put(c, Host))
    return jax.lax.scan(blk, s0, xb)

for name, fn in [("mixed plain eager", fwd_mixed),
                 ("mixed block eager", fwd_block_mixed)]:
    try:
        s_fin, (ys, tape) = fn(W, s0, xs)
        jax.block_until_ready(s_fin)
        print(name, "OK", ys.sharding.memory_kind, tape.sharding.memory_kind)
    except Exception as e:
        print(name, "FAIL:", type(e).__name__, str(e)[:150].replace("\n", " "))
