"""Distribution tests on the 8-virtual-device CPU mesh: mesh construction,
DP/TP shardings, sharded training steps, and the driver dryrun entry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from big_linear_algebra_tpu.parallel import (
    batch_sharding,
    default_mesh,
    make_mesh,
    replicate,
    shard_params_tp,
)


def test_virtual_device_count():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"


def test_make_mesh_shapes():
    mesh = make_mesh({"data": 4, "model": 2})
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh({"data": 3})


def test_dp_training_step_matches_single_device(rng):
    """The DP-sharded mnist_nn step must produce the same updated params as
    the unsharded step (XLA inserts the gradient psum)."""
    from big_linear_algebra_tpu.models import mnist_nn

    cfg = mnist_nn.Config(learn_rate=0.5)
    params = mnist_nn.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(rng.random((64, 784)), jnp.float32)
    onehot = jnp.asarray(np.eye(10, dtype=np.float32)[
        rng.integers(0, 10, 64)])
    mask = jnp.ones((64,), jnp.float32)

    p_single, c_single, l_single = mnist_nn.train_step(
        jax.tree.map(jnp.copy, params), x, onehot, mask, cfg)

    mesh = default_mesh()
    bsh = batch_sharding(mesh)
    repl = replicate(mesh)
    p_sharded = jax.device_put(jax.tree.map(jnp.copy, params), repl)
    p_dp, c_dp, l_dp = mnist_nn.train_step(
        p_sharded,
        jax.device_put(x, bsh),
        jax.device_put(onehot, bsh),
        jax.device_put(mask, bsh),
        cfg,
    )
    assert float(c_dp) == float(c_single)
    np.testing.assert_allclose(float(l_dp), float(l_single), rtol=1e-5)
    for k in p_single:
        np.testing.assert_allclose(
            np.asarray(p_dp[k]), np.asarray(p_single[k]), rtol=1e-5,
            atol=1e-6, err_msg=k)


def test_tp_sharded_forward_matches(rng):
    from big_linear_algebra_tpu.models import mnist_nn

    params = mnist_nn.init_params(jax.random.key(1))
    x = jnp.asarray(rng.random((16, 784)), jnp.float32)
    want = np.asarray(mnist_nn.forward(params, x))

    mesh = make_mesh({"data": 4, "model": 2})
    tp = shard_params_tp(mesh, params)
    got = np.asarray(mnist_nn.forward(tp, jax.device_put(
        x, NamedSharding(mesh, P("data")))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_prefetch_with_sharding(rng):
    from big_linear_algebra_tpu.data import prefetch_to_device

    mesh = default_mesh()
    bsh = batch_sharding(mesh)
    batches = [rng.random((16, 8)).astype(np.float32) for _ in range(3)]
    out = list(prefetch_to_device(iter(batches), size=2, sharding=bsh))
    assert len(out) == 3
    assert out[0].sharding == bsh
    np.testing.assert_array_equal(np.asarray(out[1]), batches[1])


def test_dryrun_multichip():
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "graft_entry", Path(__file__).resolve().parents[1] / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles():
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "graft_entry2", Path(__file__).resolve().parents[1] / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    # lowering (trace + shape check) is enough off-TPU; full compile of the
    # reference-scale U-Net is the driver's single-chip check
    jax.jit(fn).lower(*args)
