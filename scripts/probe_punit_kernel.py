"""Minimal on-TPU execution probes for the fused ShuffleUnit kernels.

The full smoke (smoke_shuffle_fused_tpu.py) wedges after logging the train
forward "ran" — on the axon remote backend block_until_ready can return
before execution, so the wedge may be the KERNEL program hanging on the
worker.  This probe forces a scalar readback (float()) directly after each
kernel dispatch, smallest program first:

  --what infer : single-pass inference kernel
  --what train : 4-pass training-mode kernel (fwd only)
  --what bwd   : custom_vjp backward

Run each in its own process (a wedged program can poison the worker).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from carla_driving_rl_agent_tpu.models.shufflenet import ShuffleUnit
from carla_driving_rl_agent_tpu.ops import shuffle_unit_pallas as sup


def log(msg):
    print(f"[probe {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=("infer", "train", "bwd"),
                    default="infer")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--hw", type=int, nargs=2, default=(12, 15))
    ap.add_argument("--c", type=int, default=96)
    args = ap.parse_args()
    N, (H, W), C = args.n, args.hw, args.c
    log(f"what={args.what} shape=({N},{H},{W},{C}) "
        f"backend={jax.default_backend()}")
    mode, rows_t, n_tiles, cp, hp, h_b = sup._layout(N, H, W, C)
    log(f"layout: mode={mode} rows_t={rows_t} n_tiles={n_tiles} h_b={h_b} "
        f"mxu_bf16={sup._default_mxu(False)}")

    kx, kp, kg = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (N, H, W, C), jnp.float32)
    unit = ShuffleUnit(num_channels=C, stride=1, leak=0.0)
    variables = unit.init(kp, x, training=False)
    params, stats = variables["params"], variables["batch_stats"]
    log("flax init done (host)")

    if args.what == "infer":
        fn = jax.jit(lambda p, xx: sup.shuffle_unit_infer(
            xx, p, stats, leak=0.0, interpret=False))
        t0 = time.perf_counter()
        out = fn(params, x)
        log(f"dispatched in {time.perf_counter() - t0:.1f}s; fetching probe")
        t0 = time.perf_counter()
        s = float(jnp.sum(out))
        log(f"INFER OK: sum={s:.4f} fetched in {time.perf_counter() - t0:.1f}s")
    elif args.what == "train":
        fn = jax.jit(lambda p, xx: sup.shuffle_unit_train(
            xx, p, leak=0.0, interpret=False))
        t0 = time.perf_counter()
        out, bstats = fn(params, x)
        log(f"dispatched in {time.perf_counter() - t0:.1f}s; fetching probe")
        t0 = time.perf_counter()
        s = float(jnp.sum(out))
        m = float(jnp.sum(bstats["BatchNorm_0"]["mean"]))
        log(f"TRAIN OK: sum={s:.4f} m0={m:.4f} "
            f"fetched in {time.perf_counter() - t0:.1f}s")
    else:
        kgw = jax.random.normal(kg, (N, H, W, C), jnp.float32)

        def loss(p, xx):
            out, _ = sup.shuffle_unit_train(xx, p, leak=0.0, interpret=False)
            return jnp.sum(out * kgw)

        fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t0 = time.perf_counter()
        gp, gx = fn(params, x)
        log(f"dispatched in {time.perf_counter() - t0:.1f}s; fetching probe")
        t0 = time.perf_counter()
        s = float(jnp.sum(gx))
        log(f"BWD OK: gx sum={s:.4f} fetched in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
