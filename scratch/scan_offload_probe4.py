import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
Host = jax.memory.Space.Host
n, k, d = 16, 4, 8
W = jnp.asarray(np.random.default_rng(0).normal(size=(d, d)) * 0.3)  # f64 under x64
print("dtype:", W.dtype)
xs = jnp.asarray(np.random.default_rng(1).normal(size=(n, d)))
s0 = jnp.zeros((d,), W.dtype)
def fwd_block_off(W, s0, xs):
    xb = xs.reshape(n // k, k, d)
    def f(c, x):
        return jnp.tanh(W @ c + x), None
    def blk(c, x_blk):
        c_end, _ = jax.lax.scan(f, c, x_blk)
        return c_end, jax.device_put(c, Host)
    return jax.lax.scan(blk, s0, xb)
try:
    s_fin, tape = fwd_block_off(W, s0, xs)
    jax.block_until_ready(s_fin)
    print("f64 block+off OK", tape.sharding.memory_kind, tape.dtype)
except Exception as e:
    print("f64 block+off FAIL:", type(e).__name__, str(e)[:200].replace("\n", " "))
