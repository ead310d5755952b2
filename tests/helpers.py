"""Shared test utilities — re-exported from the public
:mod:`tensor_ops_tpu.testing` module (single source of truth)."""

from tensor_ops_tpu.testing import check_grads, fd_grad, loop_gmul  # noqa: F401
