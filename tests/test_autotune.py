"""Pallas tile autotuner: candidate generation, the measured sweep
(CPU interpret mode — mechanics, not speed), on-disk persistence, and
the cache-hit path through ``pick_tiles`` / the mlp kernels
(VERDICT round-3 item 6)."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tensor_ops_tpu.ops import autotune  # noqa: E402
from tensor_ops_tpu.ops.autotune import (  # noqa: E402
    TileCache,
    autotune_linear,
    autotune_mlp_forward,
    autotune_mlp_train_step,
    linear_candidates,
    make_key,
)
from tensor_ops_tpu.ops.pallas_kernels import (  # noqa: E402
    fused_linear,
    fused_mlp_forward,
    fused_mlp_train_step,
    pick_tiles,
)


@pytest.fixture
def tile_cache(tmp_path, monkeypatch):
    """Point the module singleton at a fresh per-test cache file (and
    mask the packaged table) so no test outcome depends on this
    machine's real ``~/.cache`` contents."""
    path = str(tmp_path / "tiles.json")
    cache = TileCache(path)
    monkeypatch.setattr(autotune, "_CACHE", cache)
    monkeypatch.setattr(autotune, "_packaged", {})
    return cache


def test_linear_candidates_vmem_legal_and_contain_heuristic(tile_cache):
    cands = linear_candidates(4096, 4096, 4096, save_z=False)
    assert pick_tiles(4096, 4096, 4096) in cands
    for tb, to, tk in cands:
        vmem = 2 * (tb * tk + to * tk) * 4 + tb * to * 4 + 2 * tb * to * 4
        assert vmem <= 48 * 1024 * 1024, (tb, to, tk)
    # small problems collapse to few candidates, never zero
    assert linear_candidates(64, 784, 300, save_z=True)


def test_autotune_linear_persists_and_pick_tiles_hits(tile_cache):
    best = autotune_linear(64, 784, 300, act="logistic", cache=tile_cache)
    # the winner is on disk with provenance
    on_disk = json.load(open(tile_cache.path))
    key = make_key("linear", B=64, K=784, O=300, save_z=0, dtype="float32")
    assert on_disk[key]["tiles"] == list(best)
    assert on_disk[key]["us"] > 0 and on_disk[key]["candidates"] >= 1
    # the hot path takes the tuned entry (trace-time dict probe)
    assert pick_tiles(64, 784, 300) == best
    # a different shape still falls back to the heuristic
    assert pick_tiles(128, 512, 512) == (128, 512, 512)


def test_tuned_tiles_do_not_change_results(tile_cache):
    """Tile choice is a schedule, not semantics: fused_linear output is
    identical before and after a tuned entry lands."""
    r = np.random.default_rng(1)
    x = jnp.asarray(r.normal(size=(32, 100)), jnp.float32)
    w = jnp.asarray(r.normal(size=(40, 100)) * 0.2, jnp.float32)
    b = jnp.asarray(r.normal(size=(40,)), jnp.float32)
    before = np.asarray(fused_linear(x, w, b, "tanh", "highest"))
    autotune_linear(32, 100, 40, act="tanh", precision="highest",
                    cache=tile_cache)
    jax.clear_caches()  # force retrace through the now-hit cache
    after = np.asarray(fused_linear(x, w, b, "tanh", "highest"))
    np.testing.assert_array_equal(before, after)


def test_autotune_mlp_forward_block_b_flows_into_default(tile_cache):
    dims = [16, 12, 4]
    acts = ["logistic", "identity"]
    bb = autotune_mlp_forward(32, dims, acts, cache=tile_cache)
    assert bb >= 8
    # block_b=None consults the cache for this exact (B, dims) key
    r = np.random.default_rng(2)
    ws = [jnp.asarray(r.normal(size=(dims[k + 1], dims[k])) * 0.3,
                      jnp.float32) for k in range(2)]
    bs = [jnp.asarray(r.normal(size=(dims[k + 1],)) * 0.1, jnp.float32)
          for k in range(2)]
    x = jnp.asarray(r.uniform(0, 1, size=(32, 16)), jnp.float32)
    tuned = np.asarray(fused_mlp_forward(x, ws, bs, acts))
    explicit = np.asarray(fused_mlp_forward(x, ws, bs, acts, block_b=bb))
    np.testing.assert_array_equal(tuned, explicit)


def test_autotune_mlp_train_step_persists(tile_cache):
    dims = [16, 12, 4]
    acts = ["logistic", "identity"]
    bb = autotune_mlp_train_step(32, dims, acts, cache=tile_cache)
    key = make_key("mlp_train", B=32, dims="16x12x4", precision="default")
    assert json.load(open(tile_cache.path))[key]["tiles"] == [bb]
    # and the default block_b=None path picks it up
    r = np.random.default_rng(3)
    ws = [jnp.asarray(r.normal(size=(dims[k + 1], dims[k])) * 0.3,
                      jnp.float32) for k in range(2)]
    bs = [jnp.asarray(r.normal(size=(dims[k + 1],)) * 0.1, jnp.float32)
          for k in range(2)]
    x = jnp.asarray(r.uniform(0, 1, size=(32, 16)), jnp.float32)
    y = jnp.asarray(np.eye(4)[r.integers(0, 4, size=32)], jnp.float32)
    loss, nw, nb = fused_mlp_train_step(x, y, ws, bs, 0.05, acts)
    assert np.isfinite(float(loss))


def test_cache_survives_process_boundary_simulation(tile_cache):
    """A fresh TileCache on the same path (== new process) sees the
    tuned entry; corrupt files degrade to empty, never crash."""
    autotune_linear(64, 784, 300, cache=tile_cache)
    fresh = TileCache(tile_cache.path)
    key = make_key("linear", B=64, K=784, O=300, save_z=0, dtype="float32")
    assert fresh.get(key) is not None
    with open(tile_cache.path, "w") as f:
        f.write("{corrupt")
    assert TileCache(tile_cache.path).get(key) is None


def test_packaged_table_fallback(tile_cache, monkeypatch, tmp_path):
    """A miss in the user cache falls through to the packaged
    ``ops/tuned_tiles.json`` table; a user-cache entry for the same key
    wins over it; a foreign device kind never matches."""
    key = make_key("linear", B=96, K=96, O=96, save_z=0, dtype="float32")
    pkg = tmp_path / "tuned_tiles.json"
    pkg.write_text(json.dumps({key: {"tiles": [96, 128, 128], "us": 1.0,
                                     "candidates": 1}}))
    monkeypatch.setattr(autotune, "_PACKAGED_PATH", str(pkg))
    monkeypatch.setattr(autotune, "_packaged", None)
    assert autotune.get_tuned("linear", B=96, K=96, O=96, save_z=0,
                              dtype="float32") == (96, 128, 128)
    # user cache shadows the packaged entry
    tile_cache.put(key, {"tiles": [8, 128, 128], "us": 0.5, "candidates": 1})
    assert autotune.get_tuned("linear", B=96, K=96, O=96, save_z=0,
                              dtype="float32") == (8, 128, 128)
    # the shipped table's real entries are keyed by device kind, so a
    # CPU test run never consumes the v5e winners
    monkeypatch.setattr(autotune, "_PACKAGED_PATH",
                        autotune.__file__.replace("autotune.py",
                                                  "tuned_tiles.json"))
    monkeypatch.setattr(autotune, "_packaged", None)
    for k in autotune._packaged_tiles():
        assert "dev=" in k


# ---- round-5 coverage: the contested serving + RNN kernels ----------
# (VERDICT round-4 item 4: "point the autotuner at the contested
# kernels" — these check the sweep MECHANICS on CPU interpret mode;
# the speed numbers come from the on-device run recorded in BENCH.md.)


def test_autotune_linear_w8_persists_and_kernel_consumes(tile_cache):
    from tensor_ops_tpu.ops.autotune import autotune_linear_w8
    from tensor_ops_tpu.ops.pallas_kernels import fused_linear_w8

    r = np.random.default_rng(4)
    x = jnp.asarray(r.normal(size=(32, 100)), jnp.float32)
    wq = jnp.asarray(r.integers(-127, 128, size=(40, 100)), jnp.int8)
    sc = jnp.asarray(r.uniform(0.01, 0.1, size=(40, 1)), jnp.float32)
    b = jnp.asarray(r.normal(size=(40,)), jnp.float32)
    before = np.asarray(fused_linear_w8(x, wq, sc, b, "logistic"))
    best = autotune_linear_w8(32, 100, 40, act="logistic",
                              cache=tile_cache)
    key = make_key("linear_w8", B=32, K=100, O=40, save_z=0,
                   dtype="float32")
    on_disk = json.load(open(tile_cache.path))
    assert on_disk[key]["tiles"] == list(best)
    # tile choice is a schedule, not semantics — and the explicit
    # tiles= override takes the same path the tuned default does
    explicit = np.asarray(fused_linear_w8(x, wq, sc, b, "logistic",
                                          tiles=best))
    np.testing.assert_array_equal(before, explicit)


def test_autotune_linear_w8a8_persists_and_kernel_consumes(tile_cache):
    from tensor_ops_tpu.ops.autotune import autotune_linear_w8a8
    from tensor_ops_tpu.ops.pallas_kernels import fused_linear_w8a8

    r = np.random.default_rng(5)
    x = jnp.asarray(r.normal(size=(32, 100)), jnp.float32)
    wq = jnp.asarray(r.integers(-127, 128, size=(40, 100)), jnp.int8)
    sc = jnp.asarray(r.uniform(0.01, 0.1, size=(40, 1)), jnp.float32)
    b = jnp.asarray(r.normal(size=(40,)), jnp.float32)
    before = np.asarray(fused_linear_w8a8(x, wq, sc, b, "identity"))
    best = autotune_linear_w8a8(32, 100, 40, cache=tile_cache)
    assert best[0] % 32 == 0  # int8 sublane tile rule
    key = make_key("linear_w8a8", B=32, K=100, O=40)
    assert json.load(open(tile_cache.path))[key]["tiles"] == list(best)
    # the default (tiles=None) path consults get_tuned for this key
    jax.clear_caches()
    after = np.asarray(fused_linear_w8a8(x, wq, sc, b, "identity"))
    np.testing.assert_array_equal(before, after)


def test_autotune_mlp_w8a8_persists_and_kernel_consumes(tile_cache):
    from tensor_ops_tpu.ops.autotune import autotune_mlp_w8a8
    from tensor_ops_tpu.ops.pallas_kernels import fused_mlp_w8a8_forward

    r = np.random.default_rng(6)
    B, N, L = 8, 128, 2
    x = jnp.asarray(r.normal(size=(B, N)), jnp.float32)
    wqs = jnp.asarray(r.integers(-127, 128, size=(L, N, N)), jnp.int8)
    sws = jnp.asarray(r.uniform(0.01, 0.1, size=(L, N)), jnp.float32)
    bs = jnp.asarray(r.normal(size=(L, N)) * 0.1, jnp.float32)
    before = np.asarray(fused_mlp_w8a8_forward(x, wqs, sws, bs, "relu"))
    best = autotune_mlp_w8a8(B, N, L, cache=tile_cache)
    assert N % best[0] == 0 and N % best[1] == 0
    key = make_key("mlp_w8a8", B=B, N=N, L=L)
    assert json.load(open(tile_cache.path))[key]["tiles"] == list(best)
    jax.clear_caches()
    after = np.asarray(fused_mlp_w8a8_forward(x, wqs, sws, bs, "relu"))
    np.testing.assert_array_equal(before, after)


def test_autotune_rnn_step_persists_and_impl_consumes(tile_cache):
    from tensor_ops_tpu.ops.autotune import autotune_rnn_step
    from tensor_ops_tpu.ops.pallas_kernels import _rnn_step_impl

    r = np.random.default_rng(7)
    B, I, O = 16, 20, 12
    x = jnp.asarray(r.normal(size=(B, I)), jnp.float32)
    s = jnp.asarray(r.normal(size=(B, O)), jnp.float32)
    wx = jnp.asarray(r.normal(size=(O, I)) * 0.3, jnp.float32)
    ws = jnp.asarray(r.normal(size=(O, O)) * 0.3, jnp.float32)
    b = jnp.asarray(r.normal(size=(O,)) * 0.1, jnp.float32)
    y0, s0, _ = _rnn_step_impl(x, s, wx, ws, b, "logistic", "default")
    best = autotune_rnn_step(B, I, O, cache=tile_cache)
    key = make_key("rnn_step", B=B, I=I, O=O)
    assert json.load(open(tile_cache.path))[key]["tiles"] == list(best)
    jax.clear_caches()
    y1, s1, _ = _rnn_step_impl(x, s, wx, ws, b, "logistic", "default")
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
