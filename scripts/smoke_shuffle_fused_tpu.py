"""First-compile smoke of the fused Pallas ShuffleUnit on REAL TPU.

The interpret-mode parity smoke (scripts/smoke_shuffle_fused.py) validates
numerics on CPU; Mosaic may still reject constructs the interpreter accepts
(CLAUDE.md round-4 notes).  This script compiles the train/infer/backward
kernels on the attached TPU at a backbone-realistic shape and checks
numerics against the flax unit ON THE SAME DEVICE — run this BEFORE paying
the 15-25 min full-train-program compile of the punit A/B variant.

Tolerances are unit-level (one unit, no BN-stack amplification): f32
forward/backward should agree to ~1e-4 absolute at these magnitudes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from carla_driving_rl_agent_tpu.models.shufflenet import ShuffleUnit
from carla_driving_rl_agent_tpu.ops import shuffle_unit_pallas as sup


def log(msg):
    print(f"[smoke-tpu {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    # backbone-realistic unit shape: batch 64 x T=4 time-distributed ->
    # N=256 rows of a mid-stage (12, 15, 96) feature map
    N, H, W, C = 256, 12, 15, 96
    LEAK = 0.0
    kx, kp, kg = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (N, H, W, C), jnp.float32)

    unit = ShuffleUnit(num_channels=C, stride=1, leak=LEAK)
    variables = unit.init(kp, x, training=False)
    params, stats = variables["params"], variables["batch_stats"]
    gw = jax.random.normal(kg, (N, H, W, C), jnp.float32)

    def flax_train(p, xx):
        # compare at f32 MXU precision: the fused kernel uses
        # preferred_element_type=f32 passes, while JAX's TPU default matmul
        # precision is bfloat16 — without this the "error" is the FLAX
        # path's bf16 truncation (measured 1.6e-2), not the kernel's
        with jax.default_matmul_precision("highest"):
            out, mut = unit.apply({"params": p, "batch_stats": stats}, xx,
                                  training=True, mutable=["batch_stats"])
            return out, mut["batch_stats"]

    def fused_train(p, xx):
        return sup.shuffle_unit_train(xx, p, leak=LEAK, interpret=False)

    # ---- forward (train) ----
    t0 = time.perf_counter()
    out_p, bstats_p = jax.jit(fused_train)(params, x)
    out_p.block_until_ready()
    log(f"fused train fwd compiled+ran in {time.perf_counter() - t0:.1f}s")
    out_f, _ = jax.jit(flax_train)(params, x)
    err = float(jnp.max(jnp.abs(out_f - out_p)))
    log(f"fwd train max|diff| = {err:.3e}")
    assert err < 5e-4, err

    # ---- forward (infer) ----
    t0 = time.perf_counter()
    out_pi = jax.jit(lambda p, xx: sup.shuffle_unit_infer(
        xx, p, stats, leak=LEAK, interpret=False))(params, x)
    out_pi.block_until_ready()
    log(f"fused infer compiled+ran in {time.perf_counter() - t0:.1f}s")
    with jax.default_matmul_precision("highest"):
        out_fi = unit.apply({"params": params, "batch_stats": stats}, x,
                            training=False)
    err = float(jnp.max(jnp.abs(out_fi - out_pi)))
    log(f"fwd infer max|diff| = {err:.3e}")
    assert err < 5e-4, err

    # ---- backward ----
    loss_f = lambda p, xx: jnp.sum(flax_train(p, xx)[0] * gw)
    loss_p = lambda p, xx: jnp.sum(fused_train(p, xx)[0] * gw)
    t0 = time.perf_counter()
    gpp, gxp = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(params, x)
    gxp.block_until_ready()
    log(f"fused bwd compiled+ran in {time.perf_counter() - t0:.1f}s")
    gpf, gxf = jax.jit(jax.grad(loss_f, argnums=(0, 1)))(params, x)
    err = float(jnp.max(jnp.abs(gxf - gxp)))
    log(f"grad x max|diff| = {err:.3e}")
    assert err < 2e-3, err
    worst = 0.0
    flat_p = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gpp)}
    for k, vf in jax.tree_util.tree_leaves_with_path(gpf):
        ks = jax.tree_util.keystr(k)
        e = float(jnp.max(jnp.abs(vf - flat_p[ks])))
        scale = float(jnp.max(jnp.abs(vf))) + 1e-8
        worst = max(worst, e / (1e-1 + scale))
    log(f"worst param-grad rel err = {worst:.3e}")
    assert worst < 5e-3, worst

    # ---- micro-bench: fused vs flax unit, fwd+bwd, steady state ----
    f_fused = jax.jit(jax.grad(loss_p, argnums=(0, 1)))
    f_flax = jax.jit(jax.grad(loss_f, argnums=(0, 1)))
    for name, fn in (("fused", f_fused), ("flax", f_flax)):
        gp, gx = fn(params, x)          # warm
        gx.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            gp, gx = fn(params, x)
        gx.block_until_ready()
        # probe fetch (axon block_until_ready can return early)
        float(jnp.sum(gx))
        dt = (time.perf_counter() - t0) / 20
        log(f"{name} unit fwd+bwd: {dt * 1e3:.3f} ms/call")

    log("TPU SMOKE OK")


if __name__ == "__main__":
    main()
