"""Distributed BA tests: psum-reduced normal equations == single-device GN."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from gridmap_slam_tpu.models import posegraph as PG
from gridmap_slam_tpu.parallel.ba import (make_distributed_optimizer,
                                          pad_edges, shard_graph)
from tests.test_posegraph import _noisy_square


def _loop_graph():
    gt, est = _noisy_square()
    k = len(gt)
    ei, ej, ez, ew = PG.odometry_edges(est)
    ci = np.concatenate([ei, [k - 1]]).astype(np.int32)
    cj = np.concatenate([ej, [0]]).astype(np.int32)
    cz = np.concatenate([ez, [PG._relative_np(gt[-1], gt[0])]]).astype(
        np.float32)
    cw = np.concatenate([ew, [[500.0, 500.0, 1000.0]]]).astype(np.float32)
    return est.astype(np.float32), ci, cj, cz, cw


def test_distributed_matches_single_device():
    nodes, ei, ej, ez, ew = _loop_graph()
    # single-device result
    g = PG.PoseGraph(nodes=jnp.asarray(nodes), edge_i=jnp.asarray(ei),
                     edge_j=jnp.asarray(ej), edge_z=jnp.asarray(ez),
                     edge_w=jnp.asarray(ew))
    g1, chi1 = jax.jit(lambda g: PG.optimize(g, iterations=8))(g)

    # distributed over 8 shards (edges padded to a multiple of 8)
    devs = np.asarray(jax.devices()).reshape(8, 1)
    mesh = Mesh(devs, ("p", "m"))
    pe = pad_edges(ei, ej, ez, ew, 8)
    gd = shard_graph((nodes,) + pe, mesh)
    opt = make_distributed_optimizer(mesh, iterations=8)
    g2, chi2 = opt(gd)

    np.testing.assert_allclose(np.asarray(chi2), np.asarray(chi1), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g2.nodes), np.asarray(g1.nodes),
                               atol=1e-3)


def test_distributed_closes_loop():
    nodes, ei, ej, ez, ew = _loop_graph()
    devs = np.asarray(jax.devices()).reshape(4, 2)
    mesh = Mesh(devs, ("p", "m"))
    pe = pad_edges(ei, ej, ez, ew, 4)
    gd = shard_graph((nodes,) + pe, mesh)
    opt = make_distributed_optimizer(mesh, iterations=10)
    g2, chi2 = opt(gd)
    out = np.asarray(g2.nodes)
    # chi2 decreased and the closure edge is satisfied (the measured
    # closure relative pose is the last padded-edge-set row's cz[-1-pad],
    # i.e. ez's final row before padding)
    assert float(chi2[-1]) < float(chi2[0]) * 0.5
    rel = PG._relative_np(out[-1], out[0])
    want = ez[len(ei) - 1]                 # the closure measurement
    np.testing.assert_allclose(rel, want, atol=0.06)
