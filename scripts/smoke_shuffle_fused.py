"""Numerical parity smoke: fused Pallas ShuffleUnit vs the flax unit.

CPU, interpret mode, tiny shapes.  Checks forward (train + infer), batch
stats, and grads wrt x and every param vs jax.grad through the flax path.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from carla_driving_rl_agent_tpu.models.shufflenet import ShuffleUnit
from carla_driving_rl_agent_tpu.ops import shuffle_unit_pallas as sup

N, H, W, C = 4, 5, 6, 16
LEAK = 0.0
key = jax.random.PRNGKey(0)
kx, kp, kg = jax.random.split(key, 3)
x = jax.random.normal(kx, (N, H, W, C), jnp.float32)

unit = ShuffleUnit(num_channels=C, stride=1, leak=LEAK)
variables = unit.init(kp, x, training=False)
params, stats = variables["params"], variables["batch_stats"]
gw = jax.random.normal(kg, (N, H, W, C), jnp.float32)


def flax_train(p, xx):
    out, mut = unit.apply({"params": p, "batch_stats": stats}, xx,
                          training=True, mutable=["batch_stats"])
    return out, mut["batch_stats"]


def fused_train(p, xx):
    return sup.shuffle_unit_train(xx, p, leak=LEAK, interpret=True)


out_f, new_stats_f = flax_train(params, x)
out_p, bstats_p = fused_train(params, x)
err = float(jnp.max(jnp.abs(out_f - out_p)))
print("fwd train max|diff| =", err)
assert err < 2e-5, err

# batch stats -> running update parity
mom = 0.99
for i in range(3):
    bn = f"BatchNorm_{i}"
    ra_m = mom * stats[bn]["mean"] + (1 - mom) * bstats_p[bn]["mean"]
    ra_v = mom * stats[bn]["var"] + (1 - mom) * bstats_p[bn]["var"]
    em = float(jnp.max(jnp.abs(ra_m - new_stats_f[bn]["mean"])))
    ev = float(jnp.max(jnp.abs(ra_v - new_stats_f[bn]["var"])))
    print(f"{bn}: mean err {em:.2e} var err {ev:.2e}")
    assert em < 1e-5 and ev < 1e-5, (i, em, ev)

# inference parity (running stats)
out_fi = unit.apply({"params": params, "batch_stats": stats}, x,
                    training=False)
out_pi = sup.shuffle_unit_infer(x, params, stats, leak=LEAK, interpret=True)
err = float(jnp.max(jnp.abs(out_fi - out_pi)))
print("fwd infer max|diff| =", err)
assert err < 2e-5, err

# gradient parity
loss_f = lambda p, xx: jnp.sum(flax_train(p, xx)[0] * gw)
loss_p = lambda p, xx: jnp.sum(fused_train(p, xx)[0] * gw)
gpf, gxf = jax.grad(loss_f, argnums=(0, 1))(params, x)
gpp, gxp = jax.grad(loss_p, argnums=(0, 1))(params, x)
err = float(jnp.max(jnp.abs(gxf - gxp)))
print("grad x max|diff| =", err)
flat_f = jax.tree_util.tree_leaves_with_path(gpf)
flat_p = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(gpp)}
worst = 0.0
for k, vf in flat_f:
    ks = jax.tree_util.keystr(k)
    e = float(jnp.max(jnp.abs(vf - flat_p[ks])))
    scale = float(jnp.max(jnp.abs(vf))) + 1e-8
    print(f"grad {ks}: max|diff| {e:.2e} (scale {scale:.2e})")
    # combined abs+rel: BN-absorbed conv biases have true grad ~0
    worst = max(worst, e / (1e-1 + scale))
assert err < 5e-5, ("grad x", err)
assert worst < 1e-3, worst
print("PARITY OK")
