"""Golden tests for the SE(3) math library.

Checks (a) internal consistency (round trips, group properties),
(b) convention-exactness against closed forms independently derived from
the reference formulas (se3lib.py), and (c) numpy vs JAX implementation
agreement on random batches.
"""

import numpy as np
import pytest

from ursonet_tpu import se3


def random_quat(rng, n=None):
    q = rng.randn(4) if n is None else rng.randn(n, 4)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Convention golden values
# ---------------------------------------------------------------------------

def test_euler2quat_identity():
    q = se3.euler2quat(0.0, 0.0, 0.0)
    np.testing.assert_allclose(q, [0, 0, 0, 1], atol=1e-12)


def test_euler2quat_yaw90_convention():
    # From the reference closed form (se3lib.py:53-67) with pitch=roll=0,
    # yaw=90: q = [-sin45*? ...] -> q = [0, -sin(45deg), 0, cos(45deg)]
    q = se3.euler2quat(0.0, 90.0, 0.0)
    s, c = np.sin(np.pi / 4), np.cos(np.pi / 4)
    np.testing.assert_allclose(q, [0, -s, 0, c], atol=1e-12)


def test_euler2quat_matches_euler2SO3_left():
    # euler2quat and euler2SO3_left must represent the same rotation:
    # quat2SO3(euler2quat(e)) == euler2SO3_left(e)
    rng = np.random.RandomState(1)
    for _ in range(50):
        p, y, r = rng.uniform(-180, 180), rng.uniform(-89, 89), rng.uniform(-180, 180)
        R1 = se3.quat2SO3(se3.euler2quat(p, y, r))
        R2 = se3.euler2SO3_left(p, y, r)
        np.testing.assert_allclose(R1, R2, atol=1e-9)


def test_SO32quat_quat2SO3_roundtrip():
    rng = np.random.RandomState(2)
    for _ in range(100):
        q = random_quat(rng)
        q = q * np.sign(q[3] if q[3] != 0 else 1.0)
        R = se3.quat2SO3(q)
        q2 = se3.SO32quat(R)
        # Same rotation up to global sign
        assert min(np.linalg.norm(q - q2), np.linalg.norm(q + q2)) < 1e-8
        # R must be a proper rotation
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        assert np.linalg.det(R) > 0


def test_quat2euler_roundtrip():
    rng = np.random.RandomState(3)
    for _ in range(100):
        q = random_quat(rng)
        pyr = se3.quat2euler(q)
        q2 = se3.euler2quat(*pyr)
        err = se3.angle_between_quats(q, q2)
        assert err.item() < 1e-5


def test_quat_mult_group_property():
    # quat_mult must equal rotation-matrix composition:
    # quat2SO3(a ⊗ b) == quat2SO3(a) @ quat2SO3(b) for JPL convention.
    rng = np.random.RandomState(4)
    for _ in range(50):
        a, b = random_quat(rng), random_quat(rng)
        q_ab = se3.quat_mult(a, b)
        R_ab = se3.quat2SO3(q_ab)
        np.testing.assert_allclose(R_ab, se3.quat2SO3(a) @ se3.quat2SO3(b),
                                   atol=1e-9)


def test_quat_inv():
    rng = np.random.RandomState(5)
    q = random_quat(rng)
    qi = se3.quat_inv(q)
    prod = se3.quat_mult(q, qi)
    assert min(np.linalg.norm(prod - [0, 0, 0, 1]),
               np.linalg.norm(prod + [0, 0, 0, 1])) < 1e-9


def test_angleaxis_roundtrip():
    rng = np.random.RandomState(6)
    for _ in range(50):
        q = random_quat(rng)
        if q[3] < 0:
            q = -q
        v, theta = se3.quat2angleaxis(q)
        q2 = se3.angleaxis2quat(v, theta)
        np.testing.assert_allclose(q, q2, atol=1e-8)


def test_rodrigues_matches_quat():
    rng = np.random.RandomState(7)
    for _ in range(50):
        q = random_quat(rng)
        if q[3] < 0:
            q = -q
        v, theta = se3.quat2angleaxis(q)
        R1 = se3.rodrigues(np.asarray(v) * theta)
        # rodrigues builds a standard (right-handed) rotation; the JPL
        # quat2SO3 matrix is its transpose.
        R2 = se3.quat2SO3(q)
        np.testing.assert_allclose(R1, R2.T, atol=1e-8)


def test_rodrigues_small_angle():
    np.testing.assert_allclose(se3.rodrigues([0, 0, 0]), np.eye(3))


def test_angle_between_quats():
    q1 = np.array([0, 0, 0, 1.0])
    q2 = se3.euler2quat(10.0, 0.0, 0.0)
    err = se3.angle_between_quats(q1, q2)
    np.testing.assert_allclose(err.item(), 10.0, atol=1e-9)
    # sign-invariance
    err2 = se3.angle_between_quats(q1, -q2)
    np.testing.assert_allclose(err2.item(), 10.0, atol=1e-9)


def test_quat_weighted_avg_recovers_mode():
    rng = np.random.RandomState(8)
    q_true = random_quat(rng)
    # Cluster of nearby quaternions
    Q = np.stack([
        se3.quat_mult(se3.euler2quat(*rng.uniform(-2, 2, 3)), q_true)
        for _ in range(20)
    ])
    W = np.ones(20) / 20
    q_avg, H_inv = se3.quat_weighted_avg(Q, W)
    assert se3.angle_between_quats(q_avg, q_true).item() < 3.0
    assert H_inv.shape == (4, 4)


def test_SO32euler_consistency():
    rng = np.random.RandomState(9)
    for _ in range(50):
        p, y, r = rng.uniform(-170, 170), rng.uniform(-80, 80), rng.uniform(-170, 170)
        R = se3.euler2SO3_left(p, y, r)
        p2, y2, r2 = se3.SO32euler(R)
        R2 = se3.euler2SO3_left(p2, y2, r2)
        np.testing.assert_allclose(R, R2, atol=1e-8)


def test_pose_3Dto3D_recovers_pose():
    # The reference returns R such that R.T maps P1 to P2 (the eval decode
    # calls SO32quat(R.T), pose_estimator.py:369): for P2 = R_true P1 + t,
    # pose_3Dto3D returns R == R_true.T.
    rng = np.random.RandomState(10)
    q = random_quat(rng)
    R_true = se3.quat2SO3(q)
    t_true = rng.randn(3)
    P1 = rng.randn(3, 5)
    P2 = R_true @ P1 + t_true[:, None]
    t, R = se3.pose_3Dto3D(P1, P2)
    np.testing.assert_allclose(R, R_true.T, atol=1e-8)
    # t satisfies the definition t = C2 - R C1 (se3lib.py:296)
    C1 = P1.mean(axis=1)
    C2 = P2.mean(axis=1)
    np.testing.assert_allclose(t, C2 - R @ C1, atol=1e-8)


def test_composeSE3():
    R = se3.euler2SO3_left(10, 20, 30)
    T = se3.composeSE3(R, [1, 2, 3])
    np.testing.assert_allclose(T[:3, :3], R)
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3])
    np.testing.assert_allclose(T[3], [0, 0, 0, 1])


# ---------------------------------------------------------------------------
# numpy vs JAX agreement
# ---------------------------------------------------------------------------

class TestJaxParity:
    @pytest.fixture(autouse=True)
    def _setup(self):
        import jax
        jax.config.update("jax_enable_x64", True)
        from ursonet_tpu import se3jax
        self.sj = se3jax
        yield
        jax.config.update("jax_enable_x64", False)

    def test_euler2quat(self):
        rng = np.random.RandomState(11)
        p = rng.uniform(-180, 180, 64)
        y = rng.uniform(-90, 90, 64)
        r = rng.uniform(-180, 180, 64)
        got = np.asarray(self.sj.euler2quat(p, y, r))
        want = se3.euler2quat(p, y, r)
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_euler2SO3_left(self):
        rng = np.random.RandomState(12)
        p, y, r = rng.uniform(-180, 180, 3)
        got = np.asarray(self.sj.euler2SO3_left(p, y, r))
        np.testing.assert_allclose(got, se3.euler2SO3_left(p, y, r), atol=1e-9)

    def test_SO32quat_all_branches(self):
        rng = np.random.RandomState(13)
        # Random rotations hit the tr>0 branch; large-angle rotations around
        # each axis hit the other three.
        mats = [se3.quat2SO3(random_quat(rng)) for _ in range(50)]
        mats += [se3.quat2SO3(se3.angleaxis2quat(ax, np.pi * 0.999))
                 for ax in ([1, 0, 0], [0, 1, 0], [0, 0, 1])]
        for R in mats:
            got = np.asarray(self.sj.SO32quat(np.asarray(R)))
            want = se3.SO32quat(R)
            assert min(np.linalg.norm(got - want),
                       np.linalg.norm(got + want)) < 1e-7

    def test_quat_mult_batched(self):
        rng = np.random.RandomState(14)
        A, B = random_quat(rng, 32), random_quat(rng, 32)
        got = np.asarray(self.sj.quat_mult(A, B))
        want = np.stack([se3.quat_mult(a, b) for a, b in zip(A, B)])
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_quat2euler_batched(self):
        rng = np.random.RandomState(15)
        Q = random_quat(rng, 64)
        got = np.asarray(self.sj.quat2euler(Q))
        want = np.stack([se3.quat2euler(q) for q in Q])
        np.testing.assert_allclose(got, want, atol=1e-7)

    def test_quat2SO3_batched(self):
        rng = np.random.RandomState(16)
        Q = random_quat(rng, 16)
        got = np.asarray(self.sj.quat2SO3(Q))
        want = np.stack([se3.quat2SO3(q) for q in Q])
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_quat_weighted_avg(self):
        rng = np.random.RandomState(17)
        Q = random_quat(rng, 50)
        W = np.abs(rng.rand(50))
        W /= W.sum()
        got, _ = self.sj.quat_weighted_avg(Q, W)
        got = np.asarray(got)
        want, _ = se3.quat_weighted_avg(Q, W)
        assert min(np.linalg.norm(got - want),
                   np.linalg.norm(got + want)) < 1e-7

    def test_quat_weighted_avg_power_matches_eigh(self):
        rng = np.random.RandomState(18)
        # Batched: 8 peaked PMF-style weightings over a shared quaternion
        # map (the regime of real decode: softmax outputs concentrate mass
        # on a few bins, giving A a large eigen-gap).
        Q = np.broadcast_to(random_quat(rng, 64), (8, 64, 4))
        logits = 8.0 * rng.rand(8, 64)
        W = np.exp(logits - logits.max(axis=1, keepdims=True))
        W /= W.sum(axis=1, keepdims=True)
        got = np.asarray(self.sj.quat_weighted_avg_power(Q, W, iters=100))
        want, _ = self.sj.quat_weighted_avg(Q, W)
        want = np.asarray(want)
        for g, w in zip(got, want):
            assert min(np.linalg.norm(g - w), np.linalg.norm(g + w)) < 1e-4
