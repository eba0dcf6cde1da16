#!/usr/bin/env python
"""Export a spconv_tpu encoder as a pure-PJRT deployment artifact.

The counterpart of the reference's ``example/libspconv`` model prep: the
whole sparse pipeline (rulebook build + convs + epilogues) exports as ONE
static-shape StableHLO program; the C++ loader (``pjrt_loader.cc``) runs
it through the PJRT C API with no Python anywhere (reference analog:
``example/libspconv/main.cu:177-436`` driving libspconv from C++).

Artifact layout (written to ``artifact/``):
  module.mlirbc        portable StableHLO bytecode (jax.export)
  compile_options.pb   serialized xla CompileOptionsProto
  manifest.txt         one line per tensor: "input|output dtype d0,d1 file"
  input_*.bin          raw little-endian row-major input buffers
  expected_*.bin       CPU-f32 golden outputs for the loader's check

Exports with ``algo="native"`` (pure StableHLO, no TPU-specific custom
calls) so the artifact compiles under ANY PJRT plugin — CPU, TPU, or the
axon tunnel plugin in this environment.
"""

import pickle
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import spconv_tpu
from spconv_tpu import SparseConvTensor

OUT = Path(__file__).resolve().parent / "artifact"
OUT.mkdir(exist_ok=True)

NBUF = 16384  # deployment budget (voxels); real scan subsampled to fit


def build_net():
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    return spconv_tpu.SparseSequential(
        spconv_tpu.SubMConv3d(3, 32, 3, indice_key="s0", algo="native",
                              act_type="relu", key=ks[0]),
        spconv_tpu.SparseConv3d(32, 64, 3, stride=2, padding=1,
                                algo="native", act_type="relu",
                                out_bound=NBUF, key=ks[1]),
        spconv_tpu.SubMConv3d(64, 64, 3, indice_key="s1", algo="native",
                              key=ks[2]),
    )


def load_input():
    voxels, coors, spatial_shape = pickle.load(
        open("/root/reference/test/data/test_spconv.pkl", "rb"))
    n = min(NBUF - 128, voxels.shape[0])
    step = max(1, voxels.shape[0] // n)
    voxels, coors = voxels[::step][:n], coors[::step][:n]
    n = voxels.shape[0]
    feats = np.zeros((NBUF, 3), np.float32)
    feats[:n] = voxels
    inds = np.full((NBUF, 4), -1, np.int32)
    inds[:n] = coors
    return feats, inds, tuple(int(s) for s in spatial_shape)


def main():
    net = build_net()
    feats, inds, shape = load_input()
    x = SparseConvTensor(jnp.asarray(feats), jnp.asarray(inds), shape, 1)
    x = x.sort_by_key()
    feats_s = np.asarray(x.features)
    inds_s = np.asarray(x.indices)

    def fwd(f, i):
        t = SparseConvTensor(f, i, shape, 1, keys_sorted=True)
        out = net(t)
        return out.features, out.indices

    from jax import export as jexport

    jitted = jax.jit(fwd)
    exported = jexport.export(jitted)(
        jax.ShapeDtypeStruct(feats_s.shape, jnp.float32),
        jax.ShapeDtypeStruct(inds_s.shape, jnp.int32),
    )
    (OUT / "module.mlirbc").write_bytes(exported.mlir_module_serialized)

    from jax._src import compiler

    opts = compiler.get_compile_options(num_replicas=1, num_partitions=1)
    (OUT / "compile_options.pb").write_bytes(opts.SerializeAsString())

    out_f, out_i = jitted(feats_s, inds_s)
    out_f, out_i = np.asarray(out_f), np.asarray(out_i)

    feats_s.tofile(OUT / "input_0.bin")
    inds_s.tofile(OUT / "input_1.bin")
    out_f.tofile(OUT / "expected_0.bin")
    out_i.tofile(OUT / "expected_1.bin")

    def line(kind, arr, fname):
        dt = {"float32": "f32", "int32": "s32"}[str(arr.dtype)]
        dims = ",".join(str(d) for d in arr.shape)
        return f"{kind} {dt} {dims} {fname}\n"

    with (OUT / "manifest.txt").open("w") as f:
        f.write(line("input", feats_s, "input_0.bin"))
        f.write(line("input", inds_s, "input_1.bin"))
        f.write(line("output", out_f, "expected_0.bin"))
        f.write(line("output", out_i, "expected_1.bin"))

    nact = int((out_i[:, 0] >= 0).sum())
    print(f"exported: {len(exported.mlir_module_serialized)} B stablehlo, "
          f"{NBUF} voxel budget, {nact} active output sites")


if __name__ == "__main__":
    main()
