"""Pose-graph optimization tests: loop-closure correction of odometry drift."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from gridmap_slam_tpu.models import posegraph as PG


def _noisy_square(n_side=5, drift=0.03, seed=0):
    """Ground-truth square loop + drifted odometry estimates."""
    rng = np.random.RandomState(seed)
    gt = []
    pose = np.zeros(3)
    for leg in range(4):
        for _ in range(n_side):
            gt.append(pose.copy())
            pose[0] += 0.5 * math.cos(pose[2])
            pose[1] += 0.5 * math.sin(pose[2])
        pose[2] = PG.wrap_angle(pose[2] + math.pi / 2)
    gt = np.asarray(gt)

    # integrate noisy odometry to get drifted initial estimates
    est = [gt[0]]
    for k in range(1, len(gt)):
        z = PG._relative_np(gt[k - 1], gt[k])
        z = z + rng.normal(0, drift, 3) * [1, 1, 0.5]
        prev = est[-1]
        c, s = math.cos(prev[2]), math.sin(prev[2])
        est.append(np.asarray([
            prev[0] + c * z[0] - s * z[1],
            prev[1] + s * z[0] + c * z[1],
            float(PG.wrap_angle(prev[2] + z[2]))]))
    return gt, np.asarray(est)


def test_gauss_newton_converges_with_closure():
    gt, est = _noisy_square()
    k = len(gt)
    ei, ej, ez, ew = PG.odometry_edges(est)   # odometry chain (drifted)

    # loop closure: last node sees node 0 with the TRUE relative pose
    ci = np.concatenate([ei, [k - 1]]).astype(np.int32)
    cj = np.concatenate([ej, [0]]).astype(np.int32)
    cz = np.concatenate([ez, [PG._relative_np(gt[-1], gt[0])]]).astype(np.float32)
    cw = np.concatenate([ew, [[500.0, 500.0, 1000.0]]]).astype(np.float32)

    graph = PG.PoseGraph(nodes=jnp.asarray(est, jnp.float32),
                         edge_i=jnp.asarray(ci), edge_j=jnp.asarray(cj),
                         edge_z=jnp.asarray(cz), edge_w=jnp.asarray(cw))
    g2, chi2s = jax.jit(lambda g: PG.optimize(g, iterations=10))(graph)
    chi2s = np.asarray(chi2s)
    assert chi2s[-1] < chi2s[0] * 0.5
    # closure must be satisfied after optimization
    nodes = np.asarray(g2.nodes)
    rel = PG._relative_np(nodes[-1], nodes[0])
    want = PG._relative_np(gt[-1], gt[0])
    np.testing.assert_allclose(rel, want, atol=0.05)
    # anchor held
    np.testing.assert_allclose(nodes[0], est[0], atol=1e-3)


def test_zero_error_graph_stays_put():
    gt, _ = _noisy_square(drift=0.0)
    ei, ej, ez, ew = PG.odometry_edges(gt)
    graph = PG.PoseGraph(nodes=jnp.asarray(gt, jnp.float32),
                         edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
                         edge_z=jnp.asarray(ez), edge_w=jnp.asarray(ew))
    g2, chi2s = jax.jit(lambda g: PG.optimize(g, iterations=3))(graph)
    assert float(chi2s[-1]) < 1e-4
    np.testing.assert_allclose(np.asarray(g2.nodes), gt, atol=1e-3)


def test_padded_edges_are_inert():
    gt, est = _noisy_square()
    ei, ej, ez, ew = PG.odometry_edges(est)
    # pad with zero-information edges pointing at arbitrary nodes
    pad = 7
    ei2 = np.concatenate([ei, np.zeros(pad, np.int32)])
    ej2 = np.concatenate([ej, np.ones(pad, np.int32)])
    ez2 = np.concatenate([ez, np.full((pad, 3), 123.0, np.float32)])
    ew2 = np.concatenate([ew, np.zeros((pad, 3), np.float32)])

    def run(i, j, z, w):
        g = PG.PoseGraph(nodes=jnp.asarray(est, jnp.float32),
                         edge_i=jnp.asarray(i), edge_j=jnp.asarray(j),
                         edge_z=jnp.asarray(z), edge_w=jnp.asarray(w))
        g2, _ = PG.optimize(g, iterations=3)
        return g2.nodes

    run_j = jax.jit(run)
    np.testing.assert_allclose(np.asarray(run_j(ei, ej, ez, ew)),
                               np.asarray(run_j(ei2, ej2, ez2, ew2)),
                               atol=1e-4)


def test_propose_closures():
    gt, est = _noisy_square()
    props = PG.propose_closures(est, min_gap=8, max_dist=0.8)
    assert len(props.pairs) >= 1
    for i, j in props.pairs:
        assert j - i >= 8
        assert np.linalg.norm(est[i, :2] - est[j, :2]) < 0.8 + 0.3
