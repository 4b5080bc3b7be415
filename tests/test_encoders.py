"""Golden tests for the soft-assignment encoders.

The vectorized encoders must reproduce the reference formulas
(utils.py:246-396) exactly; the tests re-derive those formulas with naive
per-bin loops and compare.
"""

import itertools

import numpy as np

from ursonet_tpu import se3
from ursonet_tpu.ops import encoders


def _naive_encode_ori(oris, nr_bins, beta, min_lim, max_lim):
    """Direct loop transcription of the reference math (utils.py:261-315)."""
    d = 3
    nr_total = nr_bins ** d
    delta = beta / nr_bins
    var = delta ** 2 / 12

    lin = np.linspace(0.0, 1.0, nr_bins)
    H_list = list(itertools.product(lin, repeat=d))
    H_ori = np.asarray(H_list) * (np.asarray(max_lim) - np.asarray(min_lim)) + np.asarray(min_lim)
    H_quat = np.zeros((nr_total, 4), np.float32)
    for i in range(nr_total):
        H_quat[i] = se3.euler2quat(H_ori[i, 0], H_ori[i, 1], H_ori[i, 2])

    boundary = np.logical_or(H_ori[:, 0] == max_lim[0], H_ori[:, 2] == max_lim[2])
    gimbal = np.logical_and(np.abs(H_ori[:, 1]) == max_lim[1], H_ori[:, 0] != min_lim[0])
    redundant = np.logical_or(boundary, gimbal)

    out = np.zeros((len(oris), nr_total), np.float32)
    for i in range(len(oris)):
        dots = np.abs(np.sum(oris[i] * H_quat, axis=-1))
        H = np.exp(-2 * (np.arccos(np.minimum(1.0, dots)) / np.pi) ** 2 / var)
        H[redundant] = 0
        out[i] = H / H.sum()
    return out, H_quat, redundant


def random_quats(rng, n):
    q = rng.randn(n, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q *= np.where(q[:, 3:4] < 0, -1.0, 1.0)
    return q.astype(np.float32)


def test_encode_ori_matches_naive():
    rng = np.random.RandomState(0)
    oris = random_quats(rng, 5)
    min_lim, max_lim = np.array([-180, -90, -180]), np.array([180, 90, 180])
    got, got_quat, got_mask = encoders.encode_ori(oris, 8, 6.0, min_lim, max_lim)
    want, want_quat, want_mask = _naive_encode_ori(oris, 8, 6.0, min_lim, max_lim)
    np.testing.assert_array_equal(got_mask, want_mask)
    np.testing.assert_allclose(got_quat, want_quat, atol=1e-6)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # PMFs sum to 1, no mass on redundant bins
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)
    assert np.all(got[:, got_mask] == 0)


def test_encode_ori_fast_matches_full():
    rng = np.random.RandomState(1)
    oris = random_quats(rng, 3)
    grid = encoders.build_ori_grid(8)
    full, H_quat, mask = encoders.encode_ori(oris, 8, 6.0,
                                             np.array([-180, -90, -180]),
                                             np.array([180, 90, 180]))
    fast = encoders.encode_ori_fast(oris, 6.0, H_quat, mask)
    np.testing.assert_allclose(np.asarray(fast), full, atol=1e-6)
    np.testing.assert_allclose(grid.quat, H_quat)


def test_encode_ori_peak_at_true_bin():
    # The PMF must peak at the bin whose quaternion is closest to GT.
    grid = encoders.build_ori_grid(12)
    q = np.asarray(se3.euler2quat(30.0, 20.0, -40.0), np.float32)
    pmf = encoders.encode_ori_pmf(q[None], grid.quat, grid.mask, 6.0, 12)[0]
    dots = np.abs(grid.quat @ q)
    dots[grid.mask] = -1
    assert pmf.argmax() == dots.argmax()


def test_encode_ori_jnp_matches_numpy():
    import jax.numpy as jnp
    rng = np.random.RandomState(2)
    oris = random_quats(rng, 4)
    grid = encoders.build_ori_grid(8)
    np_pmf = encoders.encode_ori_pmf(oris, grid.quat, grid.mask, 6.0, 8)
    j_pmf = encoders.encode_ori_pmf(jnp.asarray(oris), jnp.asarray(grid.quat),
                                    jnp.asarray(grid.mask), 6.0, 8, xp=jnp)
    # arccos near |dot|≈1 amplifies f32 matmul noise: semantic tolerance
    # (near-equidistant bins can even swap argmax at this grid resolution).
    np.testing.assert_allclose(np.asarray(j_pmf), np_pmf, atol=2e-3)


def _naive_encode_loc(locs, nr_bins, beta, min_lim, max_lim):
    """Loop transcription of utils.encode_loc (utils.py:354-396) with
    ascending grid order (ordering is decode-invariant)."""
    from scipy import stats
    d = 3
    delta = beta / nr_bins
    cov = np.identity(3) * delta ** 2 / 12
    lin = np.linspace(0.0, 1.0, nr_bins)
    H_list = list(itertools.product(lin, repeat=d))
    H = np.asarray(H_list) * (np.asarray(max_lim) - np.asarray(min_lim)) + np.asarray(min_lim)
    H[:, 0] = H[:, 0] * H[:, 2]
    H[:, 1] = H[:, 1] * H[:, 2]
    out = np.zeros((len(locs), nr_bins ** d), np.float32)
    for i in range(len(locs)):
        Z = locs[i, 2]
        X = locs[i, 0] * Z
        Y = locs[i, 1] * Z
        p = stats.multivariate_normal.pdf(H, mean=[X, Y, Z], cov=cov)
        out[i] = p / p.sum()
    return out, H


def test_encode_loc_matches_naive():
    rng = np.random.RandomState(3)
    # (image_x, image_y, Z) samples within the grid bounds
    locs = np.stack([rng.uniform(-0.5, 0.5, 6), rng.uniform(-0.5, 0.5, 6),
                     rng.uniform(5, 35, 6)], axis=1)
    min_lim = np.array([-1.0, -0.75, 5.0])
    max_lim = np.array([1.0, 0.75, 40.0])
    got, got_map = encoders.encode_loc(locs, 8, 6.0, min_lim, max_lim)
    want, want_map = _naive_encode_loc(locs, 8, 6.0, min_lim, max_lim)
    np.testing.assert_allclose(got_map, want_map, atol=1e-5)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_loc_grid_backprojection():
    grid = encoders.build_loc_grid(4, 6.0, [-1, -1, 2.0], [1, 1, 10.0])
    # Every bin's (x, y) must equal image-plane coordinate times its depth:
    # reconstruct image coords and verify they lie on the linspace.
    lin = np.linspace(0, 1, 4)
    zs = lin * 8.0 + 2.0
    np.testing.assert_allclose(np.unique(grid.map3d[:, 2]), zs, atol=1e-5)


def test_decode_roundtrip_ori():
    """Encode → decode must recover the quaternion up to quantization."""
    import jax.numpy as jnp
    from ursonet_tpu.ops import decode
    rng = np.random.RandomState(4)
    qs = random_quats(rng, 8)
    encoded, H_quat, mask = encoders.encode_ori(qs, 16, 6.0,
                                                np.array([-180, -90, -180]),
                                                np.array([180, 90, 180]))
    q_dec = np.asarray(decode.decode_ori_encoded(jnp.asarray(encoded), H_quat))
    errs = [se3.angle_between_quats(q_dec[i], qs[i]).item() for i in range(8)]
    # 16 bins/dim → quantization floor of a few degrees
    assert max(errs) < 10.0
    # eigh path agrees with power iteration
    q_dec2 = np.asarray(decode.decode_ori_encoded(jnp.asarray(encoded), H_quat,
                                                  use_eigh=True))
    for a, b in zip(q_dec, q_dec2):
        assert min(np.linalg.norm(a - b), np.linalg.norm(a + b)) < 1e-3


def test_decode_roundtrip_loc():
    import jax.numpy as jnp
    from ursonet_tpu.ops import decode
    rng = np.random.RandomState(5)
    locs = np.stack([rng.uniform(-0.3, 0.3, 8), rng.uniform(-0.3, 0.3, 8),
                     rng.uniform(10, 30, 8)], axis=1)
    min_lim = np.array([-1.0, -0.75, 5.0])
    max_lim = np.array([1.0, 0.75, 40.0])
    encoded, H_map = encoders.encode_loc(locs, 16, 6.0, min_lim, max_lim)
    dec = np.asarray(decode.decode_loc_encoded(jnp.asarray(encoded), H_map))
    want_xyz = np.stack([locs[:, 0] * locs[:, 2], locs[:, 1] * locs[:, 2],
                         locs[:, 2]], axis=1)
    # First-moment decode has a quantization floor; loose tolerance.
    assert np.max(np.linalg.norm(dec - want_xyz, axis=1)) < 3.0


def test_stable_softmax():
    import jax.numpy as jnp
    from ursonet_tpu.ops import decode
    x = jnp.asarray([[1000.0, 1000.0, 1000.0], [0.0, 1.0, 2.0]])
    s = np.asarray(decode.stable_softmax(x))
    np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-6)
    np.testing.assert_allclose(s[0], [1 / 3] * 3, atol=1e-6)


def test_esa_score_and_errors():
    import jax.numpy as jnp
    from ursonet_tpu.ops import decode
    q = jnp.asarray([[0, 0, 0, 1.0]])
    q2 = jnp.asarray(se3.euler2quat(10.0, 0, 0), dtype=jnp.float32)[None]
    ang = np.asarray(decode.angular_error_deg(q, q2))
    np.testing.assert_allclose(ang, [10.0], atol=1e-4)
    loc_gt = jnp.asarray([[0.0, 0.0, 10.0]])
    loc_est = jnp.asarray([[0.0, 0.0, 11.0]])
    np.testing.assert_allclose(np.asarray(decode.location_error(loc_est, loc_gt)),
                               [1.0], atol=1e-6)
    score = np.asarray(decode.esa_score(loc_est, loc_gt, q2, q))
    np.testing.assert_allclose(score, [0.1 + np.deg2rad(10.0)], atol=1e-4)
