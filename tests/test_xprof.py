"""utils.xprof parses jax.profiler traces; on non-TPU backends the TPU
plane is absent and the summary degrades gracefully to zero totals."""

import jax
import jax.numpy as jnp
import pytest


def test_summarize_cpu_trace(tmp_path):
    tf = pytest.importorskip("tensorflow")  # noqa: F841 (proto dep)
    from dehaze_tpu.utils.xprof import summarize

    logdir = str(tmp_path / "trace")
    f = jax.jit(lambda x: (x * 2 + 1).sum())
    x = jnp.ones((256, 256))
    f(x).block_until_ready()
    with jax.profiler.trace(logdir):
        f(x).block_until_ready()
    lines, total = summarize(logdir, steps=1)
    assert lines and total >= 0.0


def test_summarize_missing_dir(tmp_path):
    from dehaze_tpu.utils.xprof import summarize

    with pytest.raises(FileNotFoundError):
        summarize(str(tmp_path / "nope"))
