import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
Host, Dev = jax.memory.Space.Host, jax.memory.Space.Device
n, k, d = 16, 4, 8
W = jnp.asarray(np.random.default_rng(0).normal(size=(d, d)) * 0.3, jnp.float32)
xs = jnp.asarray(np.random.default_rng(1).normal(size=(n, d)), jnp.float32)
s0 = jnp.zeros((d,), jnp.float32)

def fwd_plain_off(W, s0, xs):
    def f(c, x):
        return jnp.tanh(W @ c + x), jax.device_put(c, Host)
    return jax.lax.scan(f, s0, xs)

def fwd_block_off(W, s0, xs):
    xb = xs.reshape(n // k, k, d)
    def f(c, x):
        return jnp.tanh(W @ c + x), None
    def blk(c, x_blk):
        c_end, _ = jax.lax.scan(f, c, x_blk)
        return c_end, jax.device_put(c, Host)
    return jax.lax.scan(blk, s0, xb)

for name, fn in [("plain+off eager", fwd_plain_off),
                 ("plain+off jit", jax.jit(fwd_plain_off)),
                 ("block+off eager", fwd_block_off),
                 ("block+off jit", jax.jit(fwd_block_off))]:
    try:
        s_fin, tape = fn(W, s0, xs)
        jax.block_until_ready(s_fin)
        print(name, "OK", tape.sharding.memory_kind)
    except Exception as e:
        print(name, "FAIL:", type(e).__name__, str(e)[:120].replace("\n", " "))
