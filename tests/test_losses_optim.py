"""Loss-value golden tests on fixed tensors (reference net.py:705-762
formulas) and optimizer semantic tests (Keras SGD momentum, CLR schedule,
global-norm clipping)."""

import jax
import jax.numpy as jnp
import numpy as np

from ursonet_tpu.train import losses, optim


def test_softmax_loss_value():
    # Hand-computed: logits [0,0], target [0.3,0.7] -> CE = -0.3*log(.5)-0.7*log(.5)
    y_gt = jnp.asarray([[0.3, 0.7]])
    y_pred = jnp.asarray([[0.0, 0.0]])
    got = float(losses.softmax_loss(y_gt, y_pred))
    np.testing.assert_allclose(got, -np.log(0.5), rtol=1e-6)


def test_softmax_loss_soft_targets():
    rng = np.random.RandomState(0)
    y_gt = rng.rand(4, 8).astype(np.float32)
    y_gt /= y_gt.sum(1, keepdims=True)
    logits = rng.randn(4, 8).astype(np.float32)
    got = float(losses.softmax_loss(jnp.asarray(y_gt), jnp.asarray(logits)))
    # naive
    p = np.exp(logits - logits.max(1, keepdims=True))
    p /= p.sum(1, keepdims=True)
    want = float(np.mean(-np.sum(y_gt * np.log(p), axis=1)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_one_minus_dot():
    q = jnp.asarray([[0.0, 0.0, 0.0, 1.0]])
    got = float(losses.one_minus_dot_loss(q, -q))  # sign-invariant
    np.testing.assert_allclose(got, 0.0, atol=1e-7)
    q2 = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    np.testing.assert_allclose(float(losses.one_minus_dot_loss(q, q2)), 1.0)


def test_mse_loss():
    a = jnp.asarray([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]])
    b = jnp.zeros((2, 3))
    np.testing.assert_allclose(float(losses.mse_loss(a, b)), 14.0 / 6.0,
                               rtol=1e-6)


def test_rel_loss_frobenius_semantics():
    # The reference divides by the Frobenius norm of the WHOLE gt batch
    # tensor (net.py:757), not per-row.
    y_gt = jnp.asarray([[3.0, 0.0, 0.0], [4.0, 0.0, 0.0]])   # ||Y|| = 5
    y_pred = y_gt + jnp.asarray([[1.0, 0, 0], [0, 0, 0]])    # ||diff|| = 1
    np.testing.assert_allclose(float(losses.rel_loss(y_gt, y_pred)), 1.0 / 5.0,
                               rtol=1e-6)


def test_arcos_loss():
    q = jnp.asarray([[0.0, 0.0, 0.0, 1.0]])
    q10 = jnp.asarray(
        [[0, 0, 0, np.cos(np.deg2rad(5.0))]], dtype=jnp.float32)
    q10 = q10 / jnp.linalg.norm(q10)
    np.testing.assert_allclose(float(losses.arcos_loss(q, q)), 0.0, atol=1e-3)


def test_l2_regularization_excludes_bn():
    params = {
        'conv1': {'kernel': jnp.ones((2, 2)), 'bias': jnp.ones((2,))},
        'bn_conv1': {'bn': {'scale': jnp.ones((4,)) * 100,
                            'bias': jnp.ones((4,)) * 100}},
    }
    # wd * (mean(kernel²) + mean(bias²)) = 1e-2 * (1 + 1); BN excluded
    got = float(losses.l2_regularization(params, 1e-2))
    np.testing.assert_allclose(got, 0.02, rtol=1e-6)


def test_compute_losses_modes():
    from ursonet_tpu.config import Config
    cfg = Config()
    cfg.REGRESS_LOC = True
    cfg.REGRESS_ORI = True
    cfg.LOSS_WEIGHTS = {'loc_loss': 2.0, 'ori_loss': 3.0}
    outputs = {'loc': jnp.ones((2, 3)), 'ori': jnp.asarray([[0, 0, 0, 1.0]] * 2)}
    batch = {'gt_loc': jnp.ones((2, 3)) * 2, 'gt_ori': jnp.asarray([[0, 0, 0, 1.0]] * 2)}
    total, parts = losses.compute_losses(outputs, batch, cfg)
    assert set(parts) == {'loc_loss', 'ori_loss'}
    np.testing.assert_allclose(float(total),
                               2.0 * float(parts['loc_loss']) + 0.0, rtol=1e-6)


def test_keras_sgd_semantics():
    # v = m*v - lr*g; w += v  (two steps, by hand)
    opt = optim.keras_sgd(0.1, momentum=0.9)
    params = {'w': jnp.asarray([1.0])}
    state = opt.init(params)
    g = {'w': jnp.asarray([1.0])}
    up1, state = opt.update(g, state)
    np.testing.assert_allclose(np.asarray(up1['w']), [-0.1], rtol=1e-6)
    up2, state = opt.update(g, state)
    # v2 = 0.9*(-0.1) - 0.1 = -0.19
    np.testing.assert_allclose(np.asarray(up2['w']), [-0.19], rtol=1e-6)


def test_clr_triangular_schedule():
    # clr_callback.py:104-111: cycle peaks at step_size, returns to base at
    # 2*step_size.
    sch = optim.clr_schedule(1e-4, 5e-4, 100, 'triangular')
    np.testing.assert_allclose(float(sch(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sch(100)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sch(200)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sch(50)), 3e-4, rtol=1e-6)


def test_clr_triangular2_halves():
    sch = optim.clr_schedule(0.0, 1.0, 10, 'triangular2')
    np.testing.assert_allclose(float(sch(10)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(sch(30)), 0.5, rtol=1e-6)


def test_make_optimizer_clips_global_norm():
    from ursonet_tpu.config import Config
    cfg = Config()
    cfg.OPTIMIZER = 'SGD'
    cfg.LEARNING_RATE = 1.0
    cfg.LEARNING_MOMENTUM = 0.0
    cfg.GRADIENT_CLIP_NORM = 1.0
    opt = optim.make_optimizer(cfg)
    params = {'a': jnp.asarray([0.0, 0.0]), 'b': jnp.asarray([0.0])}
    state = opt.init(params)
    g = {'a': jnp.asarray([3.0, 0.0]), 'b': jnp.asarray([4.0])}  # norm 5
    up, _ = opt.update(g, state)
    flat = np.concatenate([np.asarray(up['a']), np.asarray(up['b'])])
    np.testing.assert_allclose(np.linalg.norm(flat), 1.0, rtol=1e-5)


def test_make_optimizer_adam():
    from ursonet_tpu.config import Config
    cfg = Config()
    cfg.OPTIMIZER = 'ADAM'
    opt = optim.make_optimizer(cfg)
    params = {'a': jnp.asarray([1.0])}
    state = opt.init(params)
    up, _ = opt.update({'a': jnp.asarray([1.0])}, state, params)
    assert np.isfinite(np.asarray(up['a'])).all()
