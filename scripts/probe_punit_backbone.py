"""Mid-scale repro probe for the round-5 halo-kernel in-program fault.

Every per-shape kernel probe passes standalone (logs/r5-punit-real.log),
but the REAL train program with halo stages crashes the TPU worker
(logs/r5-ab-bisect.log), and CDRL_PUNIT_NO_HALO isolates the halo
dimension.  This probe climbs the composition ladder between those two
points, one rung per flag combination:

  --what fwd    : full 13-unit ShuffleNetV2 forward (training) — many
                  halo+sample kernels chained in ONE program
  --what bwd    : + gradient through the whole backbone
  --what scan   : bwd inside a 3-iteration lax.scan (minibatch-loop shape)
  --n           : samples (train minibatch is 256 = batch 64 x T 4)

Run each in its own process; a wedged program can poison the worker.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from carla_driving_rl_agent_tpu.models.shufflenet import ShuffleNetV2


def log(msg):
    print(f"[probe {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=("fwd", "bwd", "scan"), default="fwd")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--hw", type=int, nargs=2, default=(90, 360))
    args = ap.parse_args()
    N, (H, W) = args.n, args.hw
    log(f"what={args.what} n={N} hw={H}x{W} backend={jax.default_backend()} "
        f"NO_HALO={os.environ.get('CDRL_PUNIT_NO_HALO')} "
        f"F32={os.environ.get('CDRL_PUNIT_F32')}")

    net = ShuffleNetV2(g=1.0, last_channels=768, fused_units=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (N, 1, H, W, 3), jnp.float32)
    v = net.init(jax.random.PRNGKey(1), x, training=False)
    log("init done (flax path)")

    def fwd(params, xx):
        y, _ = net.apply({"params": params, "batch_stats": v["batch_stats"]},
                         xx, training=True, mutable=["batch_stats"])
        return y

    if args.what == "fwd":
        fn = jax.jit(fwd)
        t0 = time.perf_counter()
        y = fn(v["params"], x)
        log(f"dispatched in {time.perf_counter() - t0:.1f}s")
        log(f"FWD OK: sum={float(jnp.sum(y)):.3f}")
    elif args.what == "bwd":
        fn = jax.jit(jax.grad(lambda p, xx: jnp.sum(jnp.tanh(fwd(p, xx)))))
        t0 = time.perf_counter()
        g = fn(v["params"], x)
        leaf = jax.tree_util.tree_leaves(g)[0]
        log(f"dispatched in {time.perf_counter() - t0:.1f}s")
        log(f"BWD OK: g0 sum={float(jnp.sum(leaf)):.6f}")
    else:
        def body(p, xx):
            g = jax.grad(lambda q: jnp.sum(jnp.tanh(fwd(q, xx))))(p)
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-6 * b, p, g), jnp.sum(jnp.tanh(fwd(p, xx)))

        def scan_fn(p, xs):
            return jax.lax.scan(lambda pp, xx: body(pp, xx), p, xs)

        xs = jnp.stack([x, x, x])
        fn = jax.jit(scan_fn)
        t0 = time.perf_counter()
        p2, ys = fn(v["params"], xs)
        log(f"dispatched in {time.perf_counter() - t0:.1f}s")
        log(f"SCAN OK: ys={[round(float(a), 3) for a in ys]}")


if __name__ == "__main__":
    main()
