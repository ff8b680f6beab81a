"""JAX profiler integration (absent in the reference, SURVEY.md section 5)."""

import contextlib

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block.

    View with TensorBoard or xprof pointed at ``log_dir``.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
