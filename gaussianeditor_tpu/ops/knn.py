"""K-nearest-neighbor utilities.

TPU-native replacement surface for the reference's two KNN components:
`submodules/simple-knn/simple_knn.cu` (distCUDA2 — mean squared distance
to 3 nearest neighbors, used for point-cloud scale init) and
`gaussiansplatting/knn.py` (scipy KDTree helper used by
`get_near_gaussians_by_mask`). These run once at scene setup / edit setup
— not on the training hot path — so a host-side KDTree is the right tool;
a jittable brute-force variant is provided for on-device use inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mean_sq_dist_to_3nn(points: np.ndarray, prefer_native: bool = True) -> np.ndarray:
    """distCUDA2 equivalent: mean *squared* distance to each point's 3
    nearest neighbors (simple_knn.cu:185, used gaussian_model.py:288-292).

    Uses the threaded C++ Morton-window implementation
    (native/simple_knn.cpp — the host-native analog of the reference's
    CUDA extension) when the toolchain is available, else scipy KDTree.
    """
    points = np.asarray(points, dtype=np.float32)
    if prefer_native and len(points) > 4:
        from gaussianeditor_tpu.native import mean_sq_dist_3nn_native

        out = mean_sq_dist_3nn_native(points)
        if out is not None:
            return out

    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    # k=4: the first hit is the point itself at distance 0.
    dists, _ = tree.query(points, k=min(4, len(points)))
    d = dists[:, 1:]
    return np.mean(d * d, axis=1).astype(np.float32)


def k_nearest_neighbors(points: np.ndarray, queries: np.ndarray, k: int):
    """Distances+indices of the k nearest `points` for each query
    (reference knn.py:6-22). Host-side."""
    from scipy.spatial import cKDTree

    tree = cKDTree(np.asarray(points, np.float32))
    dists, idx = tree.query(np.asarray(queries, np.float32), k=k)
    if k == 1:
        dists, idx = dists[:, None], idx[:, None]
    return dists.astype(np.float32), idx.astype(np.int32)


def knn_dist_brute(points: jnp.ndarray, queries: jnp.ndarray, k: int,
                   valid: jnp.ndarray = None, chunk: int = 1024) -> jnp.ndarray:
    """Jittable brute-force distance to the k nearest `points` per query.

    O(Q*P) but fully dense — maps to MXU-friendly matmuls
    (|q-p|^2 = |q|^2 + |p|^2 - 2 q.p). `valid` masks out dead slots.
    Returns [Q, k] squared distances.
    """
    p_sq = jnp.sum(points * points, axis=-1)
    if valid is not None:
        p_sq = jnp.where(valid, p_sq, jnp.inf)

    def one_chunk(q):
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        d2 = q_sq + p_sq[None, :] - 2.0 * q @ points.T
        neg_top, _ = jax.lax.top_k(-d2, k)
        return jnp.maximum(-neg_top, 0.0)

    nq = queries.shape[0]
    pad = (-nq) % chunk
    qpad = jnp.pad(queries, ((0, pad), (0, 0)))
    chunks = qpad.reshape(-1, chunk, queries.shape[-1])
    out = jax.lax.map(one_chunk, chunks).reshape(-1, k)
    return out[:nq]
