import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_nnunet_tpu.models.factory import get_network_from_plans
from fast_nnunet_tpu.parallel.mesh import (data_sharding, make_mesh, replicate,
                                           shard_batch)
from fast_nnunet_tpu.training.optimizers import nnunet_sgd
from fast_nnunet_tpu.training.schedules import poly_lr_jax
from fast_nnunet_tpu.training.train_step import (create_train_state, make_train_step,
                                                 make_val_step)

KW = {"n_stages": 2, "features_per_stage": [4, 8],
      "kernel_sizes": [[3, 3, 3]] * 2, "strides": [[1, 1, 1], [2, 2, 2]],
      "n_conv_per_stage": [1, 1], "n_conv_per_stage_decoder": [1],
      "nonlin": "torch.nn.LeakyReLU"}
PATCH = (8, 8, 8)
K = 2


def _setup(batch=2, compute_dtype=jnp.float32):
    net = get_network_from_plans("PlainConvUNet", KW, (), 1, K)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, *PATCH, 1)),
                      deep_supervision=True)
    opt = nnunet_sgd(poly_lr_jax(1e-2, 100))
    state = create_train_state(params, opt)
    step = make_train_step(net, opt, batch_dice=True, n_ds_levels=2,
                           compute_dtype=compute_dtype)
    rng = np.random.RandomState(0)
    # learnable toy task: segment a bright cube
    data = rng.rand(batch, *PATCH, 1).astype(np.float32) * 0.1
    y = np.zeros((batch, *PATCH), np.int32)
    data[:, 2:6, 2:6, 2:6, 0] += 1.0
    y[:, 2:6, 2:6, 2:6] = 1
    y_ds = y[:, ::2, ::2, ::2]
    return net, state, step, (jnp.asarray(data), (jnp.asarray(y), jnp.asarray(y_ds)))


def test_loss_decreases():
    net, state, step, (data, targets) = _setup()
    jstep = jax.jit(step)
    losses = []
    for _ in range(12):
        state, loss = jstep(state, data, targets)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_val_step():
    net, state, step, (data, targets) = _setup()
    vstep = jax.jit(make_val_step(net, num_heads=K, batch_dice=True, n_ds_levels=2,
                                  compute_dtype=jnp.float32))
    loss, tp, fp, fn = vstep(state.params, data, targets)
    assert tp.shape == (K - 1,)
    assert np.isfinite(float(loss))


def test_train_step_on_8_device_mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(n_data=8)
    net, state, step, _ = _setup(batch=8)
    rng = np.random.RandomState(1)
    data = rng.rand(8, *PATCH, 1).astype(np.float32)
    y = (data[..., 0] > 0.5).astype(np.int32)
    targets = (jnp.asarray(y), jnp.asarray(y[:, ::2, ::2, ::2]))

    state = replicate(mesh, state)
    batch = shard_batch(mesh, (jnp.asarray(data),) + targets)
    jstep = jax.jit(step)
    state2, loss = jstep(state, batch[0], batch[1:])
    assert np.isfinite(float(loss))
    # params remain replicated after the step
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_batch_dice_matches_across_shardings():
    """batch_dice on a sharded batch must equal the single-device result
    (the DDP AllGatherGrad parity check)."""
    mesh = make_mesh(n_data=8)
    net, state, step, _ = _setup(batch=8)
    rng = np.random.RandomState(2)
    data = rng.rand(8, *PATCH, 1).astype(np.float32)
    y = (data[..., 0] > 0.6).astype(np.int32)
    targets = (jnp.asarray(y), jnp.asarray(y[:, ::2, ::2, ::2]))
    jstep = jax.jit(step)

    _, loss_single = jstep(state, jnp.asarray(data), targets)

    state_r = replicate(mesh, state)
    batch = shard_batch(mesh, (jnp.asarray(data),) + targets)
    _, loss_sharded = jstep(state_r, batch[0], batch[1:])
    np.testing.assert_allclose(float(loss_single), float(loss_sharded), rtol=1e-5)
