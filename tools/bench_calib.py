#!/usr/bin/env python
"""Generate the bench's calibration artifacts on the CPU backend and
write them to ``.bench_calib.json`` at the repo root.

The calibration passes (deployment buffer sizing + int8 activation
scales) execute eagerly — one XLA dispatch per op.  Through the TPU
tunnel each dispatch costs ~40 ms, so a full-encoder eager pass takes
minutes; on the local CPU backend it takes seconds.  bench.py loads the
cached artifacts and never eager-calibrates on the device (parity: the
reference ships TensorRT calibration tables + recorded max_num_voxels
buffers the same way, docs/TENSORRT_INT8_GUIDE.md).

Run: JAX_PLATFORMS=cpu python tools/bench_calib.py
(bench.py shells out to this automatically when the cache is missing)
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # force: eager calibration must run
# at local CPU speed, never through a device tunnel

REPO = Path(__file__).resolve().parent.parent
os.environ["SPCONV_TPU_TUNE_CACHE"] = str(REPO / ".tune_cache")

sys.path.insert(0, str(REPO))

import jax  # noqa: E402

# the env var alone can be overridden by device-plugin site config —
# the config update is authoritative
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

OUT = REPO / ".bench_calib.json"


def cp_section(batch):
    from spconv_tpu.benchmark.centerpoint import (
        build_calibrated_encoder, load_centerpoint_input)
    from spconv_tpu.calibrate import export_out_bounds

    x, nv = load_centerpoint_input(dtype=jnp.float32, batch=batch)
    t0 = time.time()
    net = build_calibrated_encoder(x, dtype=jnp.float32)
    print(f"[calib] cp batch={batch}: {nv} voxels, "
          f"{time.time() - t0:.1f}s", flush=True)
    return export_out_bounds(net)


def bench_net_section(large):
    """Measure and cache the bench nets' deployment pool bounds."""
    from spconv_tpu.benchmark.basic import (
        load_basic_data, load_large_data, make_bench_input,
        measure_pool_bounds)

    tag = "large" if large else "basic"
    if large:
        voxels, coors, spatial_shape = load_large_data()
    else:
        voxels, coors, spatial_shape = load_basic_data()
    x = make_bench_input(voxels, coors, spatial_shape,
                         dtype=jnp.float32)
    bounds_file = REPO / (".bench_pool_bounds_large.json" if large
                          else ".bench_pool_bounds.json")
    if not bounds_file.exists():
        t0 = time.time()
        bounds_file.write_text(
            json.dumps(measure_pool_bounds(spatial_shape, x)))
        print(f"[calib] {tag} pool bounds: {time.time() - t0:.1f}s",
              flush=True)


def cpq_section():
    from spconv_tpu.benchmark.centerpoint import load_centerpoint_input
    from spconv_tpu.calibrate import calibrate_out_bounds, export_out_bounds
    from spconv_tpu.models import centerpoint_encoder
    from spconv_tpu.quantization import observe_encoder_scales

    x, nv = load_centerpoint_input(dtype=jnp.float32)
    net32 = centerpoint_encoder(in_channels=5, bn=False, dtype=jnp.float32)
    t0 = time.time()
    net32 = calibrate_out_bounds(net32, lambda m, t: m.bev(t), [x],
                                 margin=1.15, mult=512)
    bounds = export_out_bounds(net32)
    print(f"[calib] cpq bounds: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    scales = observe_encoder_scales(net32, [x])
    print(f"[calib] cpq scales: {time.time() - t0:.1f}s", flush=True)
    return bounds, scales


def _macs_from_record(record) -> int:
    """Exact conv MAC count from a benchmark=True eager pass: each conv
    layer records its (in,out) pair count; MACs = pairs × C_in × C_out."""
    total = 0
    for rec in record.values():
        np_ = rec.get("num_pairs")
        ci, co = rec.get("in_channels"), rec.get("out_channels")
        if np_ and ci and co:
            total += int(np_) * int(ci) * int(co)
    return total


def macs_section(art):
    """Count each bench net's useful conv MACs (one eager native-algo
    pass with ``benchmark=True``) so bench.py can print a crude MFU
    estimate next to every headline time."""
    import spconv_tpu  # noqa: F401
    from spconv_tpu.benchmark.basic import (
        BenchNet, load_basic_data, load_large_data, make_bench_input)

    for large in (False, True):
        tag = "large" if large else "basic"
        if f"macs_{tag}" in art:
            continue
        t0 = time.time()
        if large:
            voxels, coors, spatial_shape = load_large_data()
        else:
            voxels, coors, spatial_shape = load_basic_data()
        x = make_bench_input(voxels, coors, spatial_shape,
                             dtype=jnp.float32)
        x.benchmark = True
        bfile = REPO / (".bench_pool_bounds_large.json" if large
                        else ".bench_pool_bounds.json")
        bounds = json.loads(bfile.read_text()) if bfile.exists() else None
        net = BenchNet(spatial_shape, pool_bounds=bounds, algo="native")
        y = net(x)
        art[f"macs_{tag}"] = _macs_from_record(y.benchmark_record)
        print(f"[calib] macs_{tag} = {art[f'macs_{tag}']/1e9:.2f} GMAC "
              f"({time.time() - t0:.1f}s)", flush=True)

    if "macs_cp_b1" not in art and "cp_bounds_b1" in art:
        from spconv_tpu.benchmark.centerpoint import load_centerpoint_input
        from spconv_tpu.calibrate import apply_out_bounds
        from spconv_tpu.models import centerpoint_encoder

        t0 = time.time()
        x, _nv = load_centerpoint_input(dtype=jnp.float32)
        x.benchmark = True
        net = centerpoint_encoder(in_channels=5, bn=False,
                                  dtype=jnp.float32, algo="native")
        net = apply_out_bounds(net, art["cp_bounds_b1"])
        y = net(x)
        art["macs_cp_b1"] = _macs_from_record(y.benchmark_record)
        print(f"[calib] macs_cp_b1 = {art['macs_cp_b1']/1e9:.2f} GMAC "
              f"({time.time() - t0:.1f}s)", flush=True)
    return art


def main():
    art = {}
    if OUT.exists():
        try:
            art = json.loads(OUT.read_text())
        except Exception:
            art = {}
    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only in (None, "cp"):
        art["cp_bounds_b1"] = cp_section(1)
        art["cp_bounds_b4"] = cp_section(4)
        OUT.write_text(json.dumps(art))
    if only in (None, "cpq"):
        b, s = cpq_section()
        art["cpq_bounds"] = b
        art["cpq_scales"] = s
        OUT.write_text(json.dumps(art))
    if only in (None, "basic"):
        bench_net_section(False)
    if only in (None, "large"):
        bench_net_section(True)
    if only in (None, "macs"):
        art = macs_section(art)
        OUT.write_text(json.dumps(art))
    print(f"[calib] wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
