"""Cross-algo deep-net equivalence (parity: ``test/test_multi_impl.py``
:224-343 — same weights through every algorithm, forward features, input
grads and per-layer weight grads compared).

Here the algorithms are: native (gather+einsum), sk (fused sorted-key
Pallas kernel, interpret mode on CPU) — run through a deep net with subm,
strided, and inverse conv layers.  Outputs are compared after asserting
coordinate order is identical (both paths keep builder row order, so no
coord-keyed realignment is needed; the assert guards that invariant).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spconv_tpu

from utils import generate_sparse_data


def _sorted_input(rng, shape, n, c, nbuf):
    feats, inds = generate_sparse_data(shape, n, c, batch_size=1, rng=rng)
    key = inds[:, 0].astype(np.int64)
    for a, s in enumerate(shape):
        key = key * s + inds[:, a + 1]
    order = np.argsort(key, kind="stable")
    inds, feats = inds[order], feats[order]
    fb = np.zeros((nbuf, c), np.float32)
    ib = np.full((nbuf, inds.shape[1]), -1, np.int32)
    fb[: len(inds)] = feats
    ib[: len(inds)] = inds
    return jnp.asarray(fb), jnp.asarray(ib)


class _Net(spconv_tpu.Module):
    """subm ×2 (shared key) → strided ↓2 → subm → inverse ↑2 → subm."""

    def __init__(self, c_in, algo, key):
        ks = jax.random.split(key, 8)
        a = algo
        self.c0 = spconv_tpu.SubMConv3d(
            c_in, 16, 3, bias=False, indice_key="s0", algo=a, key=ks[0])
        self.c1 = spconv_tpu.SubMConv3d(
            16, 16, 3, bias=True, indice_key="s0", algo=a, key=ks[1])
        self.down = spconv_tpu.SparseConv3d(
            16, 32, 3, stride=2, padding=1, indice_key="d0",
            algo=a, key=ks[2], out_bound_ratio=2.0)
        self.c2 = spconv_tpu.SubMConv3d(
            32, 32, 3, bias=False, indice_key="s1", algo=a, key=ks[3])
        self.up = spconv_tpu.SparseInverseConv3d(
            32, 16, 3, indice_key="d0", algo=a, key=ks[4])
        self.c3 = spconv_tpu.SubMConv3d(
            16, 8, 3, bias=True, indice_key="s0", algo=a, key=ks[5])
        self.layers = [self.c0, self.c1, self.down, self.c2, self.up,
                       self.c3]

    def __call__(self, x):
        for m in self.layers:
            x = m(x)
        return x


def _clone_weights(dst: _Net, src: _Net):
    for a, b in zip(dst.layers, src.layers):
        a.weight = b.weight
        if getattr(b, "bias", None) is not None:
            a.bias = b.bias


@pytest.mark.slow
@pytest.mark.parametrize("alt_algo", ["sk", "dg"])
def test_multi_impl_deep_net(rng, alt_algo):
    shape = (13, 21, 21)
    c_in = 8
    feats, inds = _sorted_input(rng, shape, 500, c_in, 640)
    x = spconv_tpu.SparseConvTensor(feats, inds, shape, 1,
                                    keys_sorted=True)

    net_nat = _Net(c_in, "native", jax.random.PRNGKey(7))
    net_sk = _Net(c_in, alt_algo, jax.random.PRNGKey(7))
    _clone_weights(net_sk, net_nat)

    y_nat = net_nat(x)
    y_sk = net_sk(x)

    # same coordinate order (both paths preserve builder row order)
    np.testing.assert_array_equal(np.asarray(y_nat.indices),
                                  np.asarray(y_sk.indices))
    np.testing.assert_allclose(
        np.asarray(y_nat.features), np.asarray(y_sk.features),
        rtol=2e-2, atol=2e-2,
    )

    # input grads + per-layer weight grads
    def loss(net, f):
        xx = spconv_tpu.SparseConvTensor(f, inds, shape, 1,
                                        keys_sorted=True)
        out = net(xx)
        return jnp.sum(out.features * out.features)

    g_nat = jax.grad(lambda f: loss(net_nat, f))(feats)
    g_sk = jax.grad(lambda f: loss(net_sk, f))(feats)
    np.testing.assert_allclose(np.asarray(g_nat), np.asarray(g_sk),
                               rtol=5e-2, atol=5e-2)

    def wloss(ws, net_proto, f):
        import copy

        net = copy.copy(net_proto)
        net.layers = list(net.layers)
        rebuilt = []
        for m, w in zip(net_proto.layers, ws):
            m2 = copy.copy(m)
            m2.weight = w
            rebuilt.append(m2)
        net.layers = rebuilt
        xx = spconv_tpu.SparseConvTensor(f, inds, shape, 1,
                                        keys_sorted=True)
        out = xx
        for m in rebuilt:
            out = m(out)
        return jnp.sum(out.features * out.features)

    ws_nat = [m.weight for m in net_nat.layers]
    gw_nat = jax.grad(lambda ws: wloss(ws, net_nat, feats))(ws_nat)
    gw_sk = jax.grad(lambda ws: wloss(ws, net_sk, feats))(ws_nat)
    for i, (a, b) in enumerate(zip(gw_nat, gw_sk)):
        scale = max(1e-3, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale,
            rtol=5e-2, atol=5e-2,
            err_msg=f"weight grad mismatch in layer {i}",
        )
