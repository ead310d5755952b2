"""Driver entry-point smoke tests (single-chip compile path; the
multi-chip dryrun is covered in tests/test_parallel.py)."""

import numpy as np

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (32, 10)
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-5)  # softmax rows
