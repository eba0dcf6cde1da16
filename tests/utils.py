"""Shared test helpers: random sparse data generation and the
coordinate-keyed alignment needed to compare active-site sets whose row
order differs (the reference does the same in ``test/test_all_algo.py:152``
— hash output coords to build an order-independent index map)."""

import numpy as np


def generate_sparse_data(
    shape,
    num_points,
    num_channels,
    batch_size=1,
    rng=None,
    dtype=np.float32,
):
    """Random unique voxel coords + features per batch element.

    Returns (features [N, C], indices [N, ndim+1] int32 batch-first).
    Mirrors ``spconv/test_utils.py:generate_sparse_data`` behavior.
    """
    rng = rng or np.random.RandomState(0)
    ndim = len(shape)
    all_coords = []
    all_feats = []
    vol = int(np.prod(shape))
    for b in range(batch_size):
        n = min(num_points, vol)
        flat = rng.choice(vol, size=n, replace=False)
        coords = np.stack(np.unravel_index(flat, shape), axis=-1)
        bcol = np.full((n, 1), b)
        all_coords.append(np.concatenate([bcol, coords], axis=-1))
        all_feats.append(rng.uniform(-1, 1, size=(n, num_channels)))
    indices = np.concatenate(all_coords, 0).astype(np.int32)
    feats = np.concatenate(all_feats, 0).astype(dtype)
    return feats, indices


def pad_sparse(features, indices, n_buf):
    """Pad to a static buffer with the framework's invalid-row convention."""
    n = features.shape[0]
    assert n <= n_buf, (n, n_buf)
    f = np.zeros((n_buf, features.shape[1]), features.dtype)
    i = np.full((n_buf, indices.shape[1]), -1, np.int32)
    f[:n] = features
    i[:n] = indices
    return f, i


def dense_from_sparse(features, indices, shape, batch_size):
    """Densify [N,C]+[N,ndim+1] to [B, C, *shape] numpy (invalid rows skipped)."""
    ndim = len(shape)
    c = features.shape[1]
    out = np.zeros((batch_size, *shape, c), features.dtype)
    valid = indices[:, 0] >= 0
    idx = indices[valid]
    out[tuple(idx[:, i] for i in range(ndim + 1))] = features[valid]
    return np.moveaxis(out, -1, 1)


def sparse_rows_by_coord(features, indices):
    """dict: coord tuple → feature row (valid rows only)."""
    valid = indices[:, 0] >= 0
    return {
        tuple(int(v) for v in indices[i]): features[i]
        for i in np.nonzero(valid)[0]
    }


def assert_sparse_allclose(f1, i1, f2, i2, atol=1e-5, rtol=1e-5):
    """Order-independent active-site comparison (coord-keyed)."""
    m1 = sparse_rows_by_coord(f1, i1)
    m2 = sparse_rows_by_coord(f2, i2)
    assert set(m1.keys()) == set(m2.keys()), (
        f"active-site sets differ: {len(m1)} vs {len(m2)}; "
        f"only-in-1: {list(set(m1) - set(m2))[:5]}, "
        f"only-in-2: {list(set(m2) - set(m1))[:5]}"
    )
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], atol=atol, rtol=rtol, err_msg=str(k))
