"""Pin the analytic FLOP walk (utils/flops.py) against XLA's own cost
analysis on CPU, where `lowered.cost_analysis()` actually works (the
remote TPU backend returns 0.0 — the reason the analytic path exists)."""

import jax
import jax.numpy as jnp

from carla_driving_rl_agent_tpu.models.shufflenet import ShuffleNetV2
from carla_driving_rl_agent_tpu.utils import flops as fl


def _xla_flops(fn, *args):
    ca = jax.jit(fn).lower(*args).cost_analysis() or {}
    if isinstance(ca, (list, tuple)):
        ca = ca[0] or {}
    return float(ca.get("flops", 0.0))


def test_shufflenet_walk_matches_xla():
    """The conv-MAC walk must match XLA's count within elementwise noise
    (XLA also counts BN/act/pool flops — a few % on top of the convs)."""
    h, w = 48, 64
    model = ShuffleNetV2(g=0.5, last_channels=64)
    x = jnp.zeros((1, 1, h, w, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, training=False)
    xla = _xla_flops(
        lambda p, xx: model.apply(p, xx, training=False), v, x)
    analytic = fl.shufflenet_v2_flops(h, w, cin=3, g=0.5, last_channels=64)
    assert xla > 0
    ratio = analytic / xla
    assert 0.8 <= ratio <= 1.05, (analytic, xla, ratio)


def test_predict_and_chunk_flops_sane():
    p = fl.carla_predict_flops()
    # T=4 frames of (90,360) ShuffleNet dominate; the per-frame walk alone
    # bounds it from below
    per_frame = fl.shufflenet_v2_flops(90, 360)
    assert p > 4 * per_frame
    assert p < 4 * per_frame * 1.2          # heads/GRUs are a small tail
    # chunk: rollout fwd + sequential two-phase minibatch (each optimized
    # sample ~3x a forward, two phases at opt_steps=(1,1))
    chunk = fl.train_chunk_flops(3, 512, 32, opt_steps=(1, 1),
                                 fused_update=False, predict_flops=p)
    assert chunk == 3 * (512 * 32 * p) * (1 + 6)
    fused = fl.train_chunk_flops(3, 512, 32, opt_steps=(1, 1),
                                 fused_update=True, predict_flops=p)
    assert fused == 3 * (512 * 32 * p) * (1 + 3)
