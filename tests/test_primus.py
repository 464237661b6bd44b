import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_nnunet_tpu.models.primus import Primus, make_3d_rope


def test_rope_shapes():
    angles = make_3d_rope((4, 4, 4), 66)
    assert angles.shape == (64, 33)


@pytest.fixture(scope="module")
def tiny_primus():
    net = Primus(input_channels=1, embed_dim=96, patch_embed_size=(8, 8, 8),
                 num_classes=3, depth=2, num_heads=3, patch_size=(16, 16, 16),
                 drop_path_rate=0.0)
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    return net, params


@pytest.mark.slow
def test_primus_forward(tiny_primus):
    net, params = tiny_primus
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 16, 1), jnp.float32)
    out = net.apply(params, x)
    assert out.shape == (2, 16, 16, 16, 3)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_primus_ds_tuple():
    # micro net: this only checks the deep_supervision return contract, so
    # don't pay the module fixture's init compile in the fast suite
    net = Primus(input_channels=1, embed_dim=32, patch_embed_size=(8, 8, 8),
                 num_classes=2, depth=1, num_heads=2, patch_size=(16, 8, 8),
                 drop_path_rate=0.0)
    x = jnp.zeros((1, 16, 8, 8, 1))
    # jit init+apply: two cached compiles instead of eager per-op dispatch
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda p: net.apply(p, x, deep_supervision=True))(params)
    assert isinstance(out, tuple) and len(out) == 1


def test_primus_patch_divisibility():
    net = Primus(input_channels=1, embed_dim=96, patch_embed_size=(8, 8, 8),
                 num_classes=2, depth=1, num_heads=3, patch_size=(12, 16, 16))
    with pytest.raises(AssertionError):
        net.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 16, 16, 1)))


@pytest.mark.slow
def test_primus_trainer_step():
    """One NaN-guarded AdamW step on a toy task."""
    import optax
    from fast_nnunet_tpu.models.primus import Primus
    from fast_nnunet_tpu.training.optimizers import nnunet_adamw
    from fast_nnunet_tpu.training.train_step import create_train_state, make_loss_fn
    from fast_nnunet_tpu.training.train_step import TrainState

    net = Primus(input_channels=1, embed_dim=48, patch_embed_size=(8, 8, 8),
                 num_classes=2, depth=1, num_heads=2, patch_size=(8, 8, 8),
                 drop_path_rate=0.0)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 8, 1), jnp.float32)
    y = (x[..., 0] > 0.5).astype(jnp.int32)
    params = net.init(jax.random.PRNGKey(0), x)
    opt = nnunet_adamw(1e-3)
    state = create_train_state(params, opt)
    loss_fn = make_loss_fn(has_regions=False, has_ignore=False, ignore_label=None,
                           batch_dice=True)

    def loss_of(p):
        return loss_fn(net.apply(p, x), y)

    @jax.jit
    def step(state):
        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        return TrainState(step=state.step + 1,
                          params=optax.apply_updates(state.params, updates),
                          opt_state=new_opt), loss

    losses = []
    for _ in range(6):
        state, loss = step(state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
