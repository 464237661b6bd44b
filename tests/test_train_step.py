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


# --------------------------------------------------------------- batch_stats BN
def _setup_bn(batch=2):
    kw = dict(KW, norm_op="torch.nn.modules.batchnorm.BatchNorm3d",
              norm_op_kwargs={"eps": 1e-5, "affine": True})
    net = get_network_from_plans("PlainConvUNet", kw, (), 1, K)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, *PATCH, 1)),
                      deep_supervision=True)
    opt = nnunet_sgd(poly_lr_jax(1e-2, 100))
    state = create_train_state(params, opt)
    step = make_train_step(net, opt, batch_dice=True, n_ds_levels=2)
    rng = np.random.RandomState(0)
    data = rng.rand(batch, *PATCH, 1).astype(np.float32)
    y = (data[..., 0] > 0.5).astype(np.int32)
    return net, state, step, (jnp.asarray(data),
                              (jnp.asarray(y), jnp.asarray(y[:, ::2, ::2, ::2])))


def test_bn_network_has_running_stats_and_updates_them():
    net, state, step, (data, targets) = _setup_bn()
    assert "batch_stats" in state.params
    means0 = jax.tree_util.tree_map(np.asarray, state.params["batch_stats"])
    state2, loss = jax.jit(step)(state, data, targets)
    assert np.isfinite(float(loss))
    # running averages moved toward the batch statistics (torch momentum 0.1)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        means0, jax.tree_util.tree_map(np.asarray, state2.params["batch_stats"]))
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    # the optimizer never sees batch_stats: momentum slots (the only
    # non-scalar opt-state leaves) exist for trainable params only
    n_momentum = sum(1 for l in jax.tree_util.tree_leaves(state2.opt_state)
                     if getattr(l, "ndim", 0) >= 1)
    n_params = len(jax.tree_util.tree_leaves(state2.params["params"]))
    n_stats = len(jax.tree_util.tree_leaves(state2.params["batch_stats"]))
    assert n_stats > 0 and n_momentum == n_params


def test_bn_eval_uses_running_averages():
    net, state, step, (data, targets) = _setup_bn()
    jstep = jax.jit(step)
    for _ in range(5):
        state, _ = jstep(state, data, targets)
    # eval (plain apply) normalizes with running stats: deterministic and
    # batch-size independent
    out_full = net.apply(state.params, data, deep_supervision=False)
    out_one = net.apply(state.params, data[:1], deep_supervision=False)
    np.testing.assert_allclose(np.asarray(out_full[:1]), np.asarray(out_one),
                               rtol=2e-4, atol=2e-4)
    # and differs from train-mode (current-batch) normalization
    out_train, _ = net.apply(state.params, data, deep_supervision=False,
                             mutable=["batch_stats"])
    assert float(np.abs(np.asarray(out_train) - np.asarray(out_full)).max()) > 1e-4


def test_bn_checkpoint_roundtrip_carries_stats(tmp_path):
    from fast_nnunet_tpu.training.checkpoint import (load_checkpoint,
                                                     restore_params,
                                                     save_checkpoint)
    net, state, step, (data, targets) = _setup_bn()
    state, _ = jax.jit(step)(state, data, targets)
    f = str(tmp_path / "ck.fnnx")
    save_checkpoint(f, network_weights=jax.device_get(state.params))
    ck = load_checkpoint(f)
    template = jax.device_get(net.init(jax.random.PRNGKey(1),
                                       jnp.zeros((1, *PATCH, 1)),
                                       deep_supervision=True))
    restored = restore_params(template, ck["network_weights"])
    a = jax.tree_util.tree_leaves(restored["batch_stats"])
    b = jax.tree_util.tree_leaves(jax.device_get(state.params)["batch_stats"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_orbax_checkpoint_roundtrip(tmp_path):
    """backend='orbax' writes a directory checkpoint; load_checkpoint
    dispatches on path type and returns the same dict contract."""
    from fast_nnunet_tpu.training.checkpoint import (load_checkpoint,
                                                     restore_params,
                                                     save_checkpoint)
    net, state, step, (data, targets) = _setup()
    state, _ = jax.jit(step)(state, data, targets)
    f = str(tmp_path / "ck_orbax")
    save_checkpoint(f, network_weights=state.params,
                    optimizer_state=state.opt_state, current_epoch=3,
                    trainer_name="NNUNetTrainer",
                    extras={"train_step": 1}, backend="orbax")
    import os
    assert os.path.isdir(f)
    ck = load_checkpoint(f)
    assert ck["current_epoch"] == 3 and ck["train_step"] == 1
    assert ck["trainer_name"] == "NNUNetTrainer"
    template = jax.device_get(net.init(jax.random.PRNGKey(1),
                                       jnp.zeros((1, *PATCH, 1)),
                                       deep_supervision=True))
    restored = restore_params(template, ck["network_weights"])
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(jax.device_get(state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restorable too (resume keeps momentum)
    opt = restore_params(jax.device_get(state.opt_state), ck["optimizer_state"])
    assert len(jax.tree_util.tree_leaves(opt)) == \
        len(jax.tree_util.tree_leaves(state.opt_state))
