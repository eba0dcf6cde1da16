"""Whole-net QAT on the sparse MNIST-style classifier (parity:
``/root/reference/example/mnist`` — float pretrain → ``prepare_qat`` →
fake-quant fine-tune → ``convert`` → int8 inference, comparing int8
accuracy against observe-only PTQ).

Flow (all jitted, scale EMA + BN stats advance functionally inside the
training step — see ``spconv_tpu.quantization.qat``):

    net   = float encoder (SparseSequential) + fp head
    qnet  = prepare_qat(net)            # QATQuantStub + fused QATConvBnReLU
    qnet  = qat_observe(qnet, x)[0]     # scale EMA (inside the train step)
    ...train...
    int8  = convert_qat(qnet)           # deployable QuantizedSequential

Usage: python examples/mnist_qat.py [--steps 30]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
import optax

import spconv_tpu
from spconv_tpu import SparseConvTensor, SparseSequential
from spconv_tpu.quantization import convert_qat, prepare_qat, qat_observe

from mnist_sparse import make_batch  # synthetic MNIST-like sparse data


def build_net(key):
    ks = jax.random.split(key, 4)
    enc = SparseSequential(
        spconv_tpu.SubMConv2d(1, 32, 3, indice_key="s1", bias=False,
                              key=ks[0]),
        spconv_tpu.BatchNorm1d(32),
        spconv_tpu.SparseReLU(),
        spconv_tpu.SparseConv2d(32, 64, 3, stride=2, padding=1,
                                bias=False, key=ks[1]),
        spconv_tpu.BatchNorm1d(64),
        spconv_tpu.SparseReLU(),
    )
    pool = spconv_tpu.SparseGlobalAvgPool()
    bound = 1.0 / np.sqrt(64)
    head = (jax.random.uniform(ks[2], (64, 10), jnp.float32, -bound, bound),
            jnp.zeros((10,), jnp.float32))
    return enc, pool, head


def logits_of(enc, pool, head, x, training=False):
    out = enc(x, training=training)
    w, b = head
    return pool(out) @ w + b


def ce(logits, y):
    return jnp.mean(-jax.nn.log_softmax(logits)[jnp.arange(y.shape[0]), y])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()
    rng = np.random.RandomState(0)

    enc, pool, head = build_net(jax.random.PRNGKey(0))

    # ---- 1. float pretraining ----------------------------------------
    opt = optax.adam(3e-3)
    params = (enc, head)
    state = opt.init(spconv_tpu.partition(params)[0])

    def loss_fn(params, x, y):
        enc_, head_ = params
        return ce(logits_of(enc_, pool, head_, x, training=True), y)

    @jax.jit
    def train_step(params, state, x, y):
        loss, grads = spconv_tpu.filter_value_and_grad(loss_fn)(params, x, y)
        dyn, sta = spconv_tpu.partition(params)
        updates, state = opt.update(grads, state)
        return (spconv_tpu.combine(optax.apply_updates(dyn, updates), sta),
                state, loss)

    for step in range(args.steps):
        x, y = make_batch(rng)
        params, state, loss = train_step(params, state, x, y)
    enc, head = params
    print(f"float pretrain done: loss {float(loss):.4f}")

    # ---- 2. PTQ baseline: observe-only calibration --------------------
    qnet = prepare_qat(enc)
    observe = jax.jit(lambda net, x: qat_observe(net, x)[0])
    for _ in range(8):
        x, _ = make_batch(rng)
        qnet = observe(qnet, x)
    int8_ptq = convert_qat(qnet)

    # ---- 3. QAT fine-tune (scale EMA inside the jitted step) ----------
    qparams = (qnet, head)
    qopt = optax.adam(5e-4)
    qstate = qopt.init(spconv_tpu.partition(qparams)[0])

    def qat_loss(params, x, y):
        qnet_, head_ = params
        out = qnet_(x, training=True)
        w, b = head_
        return ce(pool(out) @ w + b, y)

    @jax.jit
    def qat_step(params, state, x, y):
        qnet_, head_ = params
        qnet_, _ = qat_observe(qnet_, x)
        params = (qnet_, head_)
        loss, grads = spconv_tpu.filter_value_and_grad(qat_loss)(
            params, x, y)
        dyn, sta = spconv_tpu.partition(params)
        updates, state = qopt.update(grads, state)
        return (spconv_tpu.combine(optax.apply_updates(dyn, updates), sta),
                state, loss)

    for step in range(args.steps):
        x, y = make_batch(rng)
        qparams, qstate, qloss = qat_step(qparams, qstate, x, y)
    qnet, qhead = qparams
    int8_qat = convert_qat(qnet)
    print(f"QAT fine-tune done: loss {float(qloss):.4f}")

    # ---- 4. evaluate float vs PTQ-int8 vs QAT-int8 --------------------
    def acc_float(enc_, head_):
        accs = []
        for _ in range(8):
            x, y = make_batch(rng)
            a = jnp.argmax(logits_of(enc_, pool, head_, x), -1)
            accs.append(float(jnp.mean(a == y)))
        return float(np.mean(accs))

    def acc_int8(net, head_):
        w, b = head_
        accs = []
        for _ in range(8):
            x, y = make_batch(rng)
            a = jnp.argmax(pool(net(x)) @ w + b, -1)
            accs.append(float(jnp.mean(a == y)))
        return float(np.mean(accs))

    print(f"accuracy: float {acc_float(enc, head):.3f} | "
          f"PTQ int8 {acc_int8(int8_ptq, head):.3f} | "
          f"QAT int8 {acc_int8(int8_qat, qhead):.3f}")


if __name__ == "__main__":
    main()
