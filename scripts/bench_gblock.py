"""Grid-batch sweep for the render kernel: worlds per Pallas grid step.

G=8 recovered ~20% of kernel time vs per-world vmap (round-2); this probes
whether G=16/32/64 buys more at the 1024-world bench geometry.  Timing
protocol: dispatch all timed iterations, fetch one probe (axon rules).
"""
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from carla_driving_rl_agent_tpu.ops import rasterizer_pallas as RP

B = 1024
ITERS = 64


def main():
    key = jax.random.PRNGKey(0)
    geoms = jax.random.uniform(key, (B, RP.GEOM_PAD), jnp.float32,
                               minval=-50.0, maxval=50.0)

    # g >= 8: the (g, GEOM_PAD) SMEM block needs its sublane dim divisible
    # by 8 (Mosaic lowering constraint; g=4 fails)
    for g in (8, 16, 32, 64):
        fn = jax.jit(lambda gm, g=g: jnp.sum(
            RP.render_tiles_grid(gm, g_block=g, n_actors=2,
                                 with_depth=False)[:, 0, 0, 0]
            .astype(jnp.float32)))
        probe = fn(geoms)
        float(probe)                      # compile + one run
        t0 = time.perf_counter()
        for i in range(ITERS):
            probe = fn(geoms + jnp.float32(i))
        float(probe)
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({"g_block": g, "ms_per_render": round(dt * 1e3, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
