"""Op-level conv compute vs torch dense conv golden model (fwd + dgrad +
wgrad), mirroring the reference's ``test/test_conv.py`` methodology:
sparse result densified and compared to ``nn.Conv3d`` on the densified
input."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from spconv_tpu.ops.rulebook import build_subm_rulebook, build_conv_rulebook
from spconv_tpu.ops.gather_gemm import indice_conv
from utils import generate_sparse_data, pad_sparse, dense_from_sparse


def torch_conv_golden(feats, inds, shape, batch, weight_krsc, ksize, stride,
                      padding, dilation, transposed=False, subm=False):
    """Dense torch conv fwd + grads, with subm masking."""
    ndim = len(shape)
    x = torch.tensor(dense_from_sparse(feats, inds, shape, batch),
                     requires_grad=True)
    # KRSC [K, *ks, C] → torch conv weight [K, C, *ks]
    w = torch.tensor(
        np.moveaxis(weight_krsc, -1, 1).copy(), requires_grad=True)
    if subm:
        padding = [(k // 2) * d for k, d in zip(ksize, dilation)]
        stride = [1] * ndim
    if transposed:
        # torch transposed weight layout is [C_in, C_out, *ks]; kernel index
        # semantics match (o = i*stride - pad + k*dil), so no spatial flip.
        wt = torch.tensor(
            np.moveaxis(weight_krsc, [0, -1], [1, 0]).copy(),
            requires_grad=True)
        y = F.conv_transpose3d(x, wt, stride=stride, padding=padding,
                               dilation=dilation)
        w = wt
    else:
        y = F.conv3d(x, w, stride=stride, padding=padding, dilation=dilation)
    if subm:
        # zero non-active output sites (out coords == in coords)
        mask = torch.tensor(
            (dense_from_sparse(np.ones_like(feats[:, :1]), inds, shape,
                               batch) > 0).astype(np.float32))
        y = y * mask
    return x, w, y


def run_case(rng, ksize, stride, padding, dilation, subm=False,
             transposed=False, cin=7, cout=5, dtype=np.float32):
    shape = (9, 10, 11)
    batch = 2
    feats, inds = generate_sparse_data(shape, 120, cin, batch_size=batch,
                                       rng=rng, dtype=dtype)
    feats_p, inds_p = pad_sparse(feats, inds, 280)
    w = rng.uniform(-1, 1, size=(cout, *ksize, cin)).astype(dtype)
    kv = int(np.prod(ksize))

    if subm:
        data = build_subm_rulebook(jnp.asarray(inds_p), spatial_shape=shape,
                                   batch_size=batch, ksize=ksize,
                                   dilation=dilation)
    else:
        data = build_conv_rulebook(
            jnp.asarray(inds_p), spatial_shape=shape, batch_size=batch,
            ksize=ksize, stride=stride, padding=padding, dilation=dilation,
            transposed=transposed, out_bound=280 * min(kv, 27))

    def f(feats_j, w_j):
        out = indice_conv(feats_j, w_j, data.pair_fwd, data.pair_bwd,
                          is_subm=subm)
        # mask invalid output rows (module layer does this too)
        out = jnp.where((data.out_indices[:, 0] >= 0)[:, None], out, 0)
        return out

    out = f(jnp.asarray(feats_p), jnp.asarray(w))
    out_np = np.asarray(out)

    # golden
    x_t, w_t, y_t = torch_conv_golden(feats_p, inds_p, shape, batch, w, ksize,
                                      stride, padding, dilation, transposed,
                                      subm)
    oi = np.asarray(data.out_indices)
    y_np = y_t.detach().numpy()  # [B, K, *out_shape]
    valid = oi[:, 0] >= 0
    golden_rows = np.zeros_like(out_np)
    golden_rows[valid] = np.stack([
        y_np[r[0], :, r[1], r[2], r[3]] for r in oi[valid]
    ])
    np.testing.assert_allclose(out_np, golden_rows, atol=1e-4, rtol=1e-4)

    # grads: loss = sum(out * cot) over valid rows
    cot = rng.uniform(-1, 1, size=out_np.shape).astype(dtype)
    cot[~valid] = 0

    def loss(feats_j, w_j):
        return jnp.sum(f(feats_j, w_j) * jnp.asarray(cot))

    din, dw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(feats_p),
                                             jnp.asarray(w))
    # torch: same loss through the dense conv
    cot_dense = np.zeros_like(y_np)
    for r, c in zip(oi[valid], cot[valid]):
        cot_dense[r[0], :, r[1], r[2], r[3]] = c
    y_t.backward(torch.tensor(cot_dense))
    dx_dense = x_t.grad.numpy()  # [B, C, *shape]
    in_valid = inds_p[:, 0] >= 0
    din_golden = np.zeros_like(np.asarray(din))
    din_golden[in_valid] = np.stack([
        dx_dense[r[0], :, r[1], r[2], r[3]] for r in inds_p[in_valid]
    ])
    np.testing.assert_allclose(np.asarray(din), din_golden, atol=1e-4,
                               rtol=1e-4)
    dw_t = w_t.grad.numpy()
    if transposed:
        # undo layout: torch [C, K, *ks] ← KRSC
        dw_golden = np.moveaxis(dw_t, [1, 0], [0, -1])
    else:
        dw_golden = np.moveaxis(dw_t, 1, -1)  # [K, C, *ks] → [K, *ks, C]
    np.testing.assert_allclose(np.asarray(dw), dw_golden, atol=1e-4,
                               rtol=1e-4)


@pytest.mark.parametrize("ksize,dilation",
                         [((3, 3, 3), (1, 1, 1)), ((3, 1, 3), (1, 1, 1)),
                          ((3, 3, 3), (2, 1, 1))])
def test_subm_conv_vs_dense(rng, ksize, dilation):
    run_case(rng, ksize, (1, 1, 1), None, dilation, subm=True)


@pytest.mark.parametrize(
    "ksize,stride,padding,dilation",
    [((3, 3, 3), (2, 2, 2), (1, 1, 1), (1, 1, 1)),
     ((2, 2, 2), (2, 2, 2), (0, 0, 0), (1, 1, 1)),
     ((3, 3, 3), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
     ((3, 2, 3), (2, 1, 2), (1, 0, 1), (1, 1, 1))])
def test_regular_conv_vs_dense(rng, ksize, stride, padding, dilation):
    run_case(rng, ksize, stride, padding, dilation)


@pytest.mark.parametrize("ksize,stride,padding",
                         [((2, 2, 2), (2, 2, 2), (0, 0, 0)),
                          ((3, 3, 3), (2, 2, 2), (1, 1, 1))])
def test_transposed_conv_vs_dense(rng, ksize, stride, padding):
    run_case(rng, ksize, stride, padding, (1, 1, 1), transposed=True)


# ---------------------------------------------------------------------------
# Exhaustive-grid sweep (parity: test/test_all_algo.py's k/s/p/d ×
# subm/regular grid — every combination through fwd + dgrad + wgrad
# against the dense torch golden).
_GRID = []
for ks in [2, 3]:
    for st in [1, 2]:
        for pa in [0, 1]:
            for di in [1, 2]:
                if ks == 2 and di == 2:
                    continue  # degenerate: dilated 2-kernels rarely used
                _GRID.append(((ks,) * 3, (st,) * 3, (pa,) * 3, (di,) * 3))


@pytest.mark.parametrize("ksize,stride,padding,dilation", _GRID)
def test_regular_conv_grid(rng, ksize, stride, padding, dilation):
    run_case(rng, ksize, stride, padding, dilation)


@pytest.mark.parametrize("ksize,dilation",
                         [((3, 3, 3), (1, 1, 1)), ((5, 5, 5), (1, 1, 1)),
                          ((1, 3, 3), (1, 1, 1)), ((3, 3, 3), (2, 2, 2))])
def test_subm_conv_grid(rng, ksize, dilation):
    run_case(rng, ksize, (1, 1, 1), None, dilation, subm=True)


@pytest.mark.parametrize("cin,cout", [(1, 1), (16, 32), (24, 3)])
def test_conv_channel_extremes(rng, cin, cout):
    run_case(rng, (3, 3, 3), (2, 2, 2), (1, 1, 1), (1, 1, 1),
             cin=cin, cout=cout)
