"""Sparse MNIST classifier (parity: ``example/mnist/`` — the reference's
minimal end-to-end training example, using SubMConv2d → SparseConv2d on
thresholded MNIST images).

Runs on synthetic MNIST-like data (no dataset download in this
environment); swap ``make_batch`` with a real loader for actual MNIST.

Usage: python examples/mnist_sparse.py [--steps 20]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import spconv_tpu
from spconv_tpu import SparseConvTensor
from spconv_tpu.models import SparseClassifier


def make_batch(rng, batch=8, nbuf=256):
    """Synthetic 28x28 'digit' images → sparse tensors (digit id = label)."""
    feats_list, inds_list, labels = [], [], []
    for b in range(batch):
        label = rng.randint(10)
        # blob pattern whose position encodes the label
        cy, cx = 4 + (label // 5) * 14, 2 + (label % 5) * 5
        ys, xs = np.mgrid[0:28, 0:28]
        mask = ((ys - cy) ** 2 + (xs - cx) ** 2) < 16
        ys, xs = np.nonzero(mask)
        n = len(ys)
        inds = np.stack([np.full(n, b), ys, xs], 1).astype(np.int32)
        feats = rng.uniform(0.5, 1.0, (n, 1)).astype(np.float32)
        feats_list.append(feats)
        inds_list.append(inds)
        labels.append(label)
    feats = np.concatenate(feats_list)
    inds = np.concatenate(inds_list)
    n = feats.shape[0]
    fp = np.zeros((nbuf * batch, 1), np.float32)
    ip = np.full((nbuf * batch, 3), -1, np.int32)
    fp[:n], ip[:n] = feats, inds
    x = SparseConvTensor(jnp.asarray(fp), jnp.asarray(ip), (28, 28), batch)
    return x, jnp.asarray(labels)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    net = SparseClassifier(ndim=2, in_channels=1, num_classes=10,
                           key=jax.random.PRNGKey(0))

    def loss_fn(m, x, y):
        logits = m(x)
        return jnp.mean(
            -jax.nn.log_softmax(logits)[jnp.arange(y.shape[0]), y])

    grad_fn = jax.jit(spconv_tpu.filter_value_and_grad(loss_fn))

    lr = 0.1
    for step in range(args.steps):
        x, y = make_batch(rng)
        loss, grads = grad_fn(net, x, y)
        dyn, sta = spconv_tpu.partition(
            net, lambda v: spconv_tpu.module._is_inexact(v))
        dyn = jax.tree_util.tree_map(
            lambda p, g: p - lr * g if g is not None else p, dyn, grads,
            is_leaf=lambda v: v is None)
        net = spconv_tpu.combine(dyn, sta)
        if step % 5 == 0 or step == args.steps - 1:
            logits = jax.jit(lambda m, t: m(t))(net, x)
            acc = float(jnp.mean((jnp.argmax(logits, -1) == y)))
            print(f"step {step}: loss {float(loss):.4f} acc {acc:.2f}")


if __name__ == "__main__":
    main()
