import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_nnunet_tpu.training.losses import (
    binary_cross_entropy_with_logits, dc_and_bce_loss, dc_and_ce_loss,
    deep_supervision_weights, deep_supervised_loss, hard_tp_fp_fn,
    robust_cross_entropy, soft_dice_loss, topk_cross_entropy)


def _logits_for(labels, K, sharp=10.0):
    """logits that strongly predict `labels`"""
    oh = jax.nn.one_hot(labels, K)
    return sharp * oh - sharp / 2


def test_dice_perfect_prediction():
    y = jnp.asarray(np.random.RandomState(0).randint(0, 3, (2, 8, 8, 8)))
    logits = _logits_for(y, 3, sharp=50.0)
    loss = soft_dice_loss(logits, y, batch_dice=False, do_bg=False)
    assert float(loss) == pytest.approx(-1.0, abs=1e-3)


def test_dice_worst_prediction():
    y = jnp.zeros((1, 8, 8, 8), jnp.int32)
    logits = _logits_for(jnp.ones_like(y), 2, sharp=50.0)  # predict all fg, gt all bg
    loss = soft_dice_loss(logits, y, batch_dice=False, do_bg=False)
    assert float(loss) > -1e-3  # dice ~ 0


def test_dice_scatter_matches_onehot_path():
    rng = np.random.RandomState(1)
    K = 4
    y = jnp.asarray(rng.randint(0, K, (2, 6, 6, 6)))
    logits = jnp.asarray(rng.randn(2, 6, 6, 6, K).astype(np.float32))
    a = soft_dice_loss(logits, y, batch_dice=True, do_bg=False)
    y_oh = jax.nn.one_hot(y, K)
    b = soft_dice_loss(logits, y_oh, batch_dice=True, do_bg=False)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_dice_ignore_mask():
    rng = np.random.RandomState(2)
    y = jnp.asarray(rng.randint(0, 2, (1, 6, 6, 6)))
    logits = jnp.asarray(rng.randn(1, 6, 6, 6, 2).astype(np.float32))
    mask = jnp.asarray(rng.rand(1, 6, 6, 6) > 0.3)
    # masking == physically removing those voxels: emulate by forcing the masked
    # voxels to agree perfectly in both pred... easier: changing masked voxels
    # must not change the loss
    y2 = jnp.where(mask, y, 1 - y)
    a = soft_dice_loss(logits, y, loss_mask=mask, batch_dice=False, do_bg=False)
    b = soft_dice_loss(logits, y2, loss_mask=mask, batch_dice=False, do_bg=False)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_ce_matches_manual():
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(2, 4, 4, 4, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 3, (2, 4, 4, 4)))
    got = robust_cross_entropy(logits, y)
    p = jax.nn.log_softmax(logits, axis=-1)
    want = -jnp.take_along_axis(p, y[..., None], axis=-1).mean()
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_ce_ignore_index():
    logits = jnp.asarray(np.random.RandomState(4).randn(1, 4, 4, 4, 2).astype(np.float32))
    y = jnp.zeros((1, 4, 4, 4), jnp.int32)
    y_ign = y.at[0, 0].set(2)  # ignore label = 2 (out of range for gather!)
    a = robust_cross_entropy(logits, y_ign, ignore_index=2)
    # equals mean CE over the non-ignored region
    ce_full = -jax.nn.log_softmax(logits, -1)[..., 0]
    want = ce_full[0, 1:].mean()
    np.testing.assert_allclose(float(a), float(want), rtol=1e-5)


def test_topk():
    logits = jnp.zeros((1, 4, 4, 4, 2))
    y = jnp.zeros((1, 4, 4, 4), jnp.int32)
    # uniform logits -> all CE equal -> topk == mean
    a = topk_cross_entropy(logits, y, k_percent=10)
    b = robust_cross_entropy(logits, y)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_dc_and_ce_with_ignore_runs():
    rng = np.random.RandomState(5)
    logits = jnp.asarray(rng.randn(2, 6, 6, 6, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 3, (2, 6, 6, 6)))
    y = y.at[0, 0, 0, 0].set(3)  # ignore label 3
    loss = dc_and_ce_loss(logits, y, batch_dice=True, ignore_label=3)
    assert np.isfinite(float(loss))


def test_dc_and_bce_regions():
    rng = np.random.RandomState(6)
    logits = jnp.asarray(rng.randn(2, 6, 6, 6, 2).astype(np.float32))
    regions = jnp.asarray((rng.rand(2, 6, 6, 6, 2) > 0.5).astype(np.float32))
    loss = dc_and_bce_loss(logits, regions, batch_dice=True)
    assert np.isfinite(float(loss))
    # with ignore channel
    regions_i = jnp.concatenate(
        [regions, (rng.rand(2, 6, 6, 6, 1) > 0.8).astype(jnp.float32)], -1)
    loss_i = dc_and_bce_loss(logits, regions_i, batch_dice=True, has_ignore=True)
    assert np.isfinite(float(loss_i))


def test_ds_weights():
    w = deep_supervision_weights(4)
    assert w[-1] == 0
    assert w[0] == pytest.approx(w[1] * 2)
    assert w.sum() == pytest.approx(1.0)
    assert deep_supervision_weights(1).tolist() == [1.0]


def test_ds_loss_skips_zero_weight():
    calls = []

    def fake_loss(o, t):
        calls.append(o.shape)
        return jnp.mean(o)

    outs = [jnp.ones((1, 8)), jnp.ones((1, 4)), jnp.ones((1, 2))]
    tgts = [None, None, None]
    deep_supervised_loss(fake_loss, outs, tgts)
    assert len(calls) == 2  # lowest res excluded


def test_hard_tp_fp_fn_labels():
    y = jnp.asarray([[[0, 1], [2, 1]]])  # (1, 2, 2)
    logits = _logits_for(jnp.asarray([[[0, 1], [1, 1]]]), 3, 50.0)
    tp, fp, fn = hard_tp_fp_fn(logits, y, 3)
    assert tp.tolist() == [1, 2, 0]
    assert fp.tolist() == [0, 1, 0]
    assert fn.tolist() == [0, 0, 1]


def test_hard_tp_fp_fn_with_ignore():
    y = jnp.asarray([[[0, 1], [2, 3]]])  # 3 = ignore
    logits = _logits_for(jnp.asarray([[[0, 1], [2, 2]]]), 3, 50.0)
    tp, fp, fn = hard_tp_fp_fn(logits, y, 3, ignore_label=3)
    assert tp.tolist() == [1, 1, 1]
    assert fp.tolist() == [0, 0, 0]  # the voxel at ignore doesn't count as fp
    assert fn.tolist() == [0, 0, 0]
