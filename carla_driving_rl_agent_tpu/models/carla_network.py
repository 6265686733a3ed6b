"""The CARLA agent network: shared dynamics backbone + Beta policy + value.

Reference: `core/networks.py` (CARLANetwork, PolicyNetwork) and
`core/carla_agent.py:61-68` (DEFAULT_* architecture spec).

Three separate parameter trees mirror the reference's three keras Models —
`dynamics`, `policy` (+ `old_policy` copy), `value` — enabling the separate
optimizers/learning-rates (`core/carla_agent.py:108-124`) and the curriculum's
backbone-only checkpoint restore (`core/networks.py:302-310`).

Structure of the dynamics model (reference `core/networks.py:37-56`):
  image      -> ShuffleNetV2(g, last_channels) shared over T -> GRU(256)
  road       -> FeatureNet(16x2, relu6)                      -> GRU(32)
  vehicle    -> FeatureNet(16x2, relu6)                      -> GRU(32)
  navigation -> FeatureNet(16x2, relu6)                      -> GRU(32)
  concat -> BatchNorm -> Dense(512, linear)    ("dynamics" feature)

The `action` input exists for interface parity with the reference, which
declares it as a dynamics-model input (`core/networks.py:227-235`) but never
wires it into any layer (`dynamics_layers` uses only the 4 obs streams) — it
is passed through, unused, exactly as there.

Policy head (reference `core/networks.py:89-144`): ControlBranch(320x2,
swish6) -> Beta(alpha, beta) with softplus(x)+1.01 concentrations + auxiliary
speed (2*sigmoid) and similarity (tanh) regression heads.
Value head (reference `core/networks.py:247-275`): ControlBranch ->
(base=tanh, exp=exp_scale*sigmoid) so V = base * 10^exp, + the same aux heads.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from carla_driving_rl_agent_tpu.models.distributions import Beta
from carla_driving_rl_agent_tpu.models.layers import ControlBranch, FeatureNet, LinearCombination
from carla_driving_rl_agent_tpu.models.recurrent import GRU
from carla_driving_rl_agent_tpu.models.shufflenet import ShuffleNetV2

DEFAULT_CONTROL = dict(units=320, num_layers=2, activation="swish6")
DEFAULT_DYNAMICS = dict(
    road=dict(units=16, num_layers=2, activation="relu6"),
    vehicle=dict(units=16, num_layers=2, activation="relu6"),
    navigation=dict(units=16, num_layers=2, activation="relu6"),
    shufflenet=dict(g=1.0, last_channels=768),
    rnn=dict(image=256, road=32, vehicle=32, navigation=32),
    dynamics=dict(units=512),
)


class DynamicsModel(nn.Module):
    spec: Dict[str, Any]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs: Dict[str, jax.Array], training: bool = False):
        spec = dict(DEFAULT_DYNAMICS)
        spec.update(self.spec or {})
        rnn = spec["rnn"]

        image_seq = ShuffleNetV2(dtype=self.dtype, **spec["shufflenet"])(
            obs["state_image"], training)
        road_seq = FeatureNet(dtype=self.dtype, **spec["road"])(obs["state_road"], training)
        vehicle_seq = FeatureNet(dtype=self.dtype, **spec["vehicle"])(obs["state_vehicle"], training)
        nav_seq = FeatureNet(dtype=self.dtype, **spec["navigation"])(obs["state_navigation"], training)

        image_out = GRU(rnn["image"], dtype=self.dtype)(image_seq)
        road_out = GRU(rnn["road"], dtype=self.dtype)(road_seq)
        vehicle_out = GRU(rnn["vehicle"], dtype=self.dtype)(vehicle_seq)
        nav_out = GRU(rnn["navigation"], dtype=self.dtype)(nav_seq)

        dynamics_in = jnp.concatenate([image_out, road_out, vehicle_out, nav_out], axis=-1)
        out = LinearCombination(dtype=self.dtype, **spec["dynamics"])(dynamics_in, training)
        return out.astype(jnp.float32)


class PolicyHead(nn.Module):
    num_actions: int = 2
    spec: Dict[str, Any] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dynamics: jax.Array, training: bool = False):
        spec = dict(DEFAULT_CONTROL)
        spec.update(self.spec or {})
        # Saturation guard (TPU-new, off by default for reference parity):
        # the softplus(z)+1.01 concentration head has a gradient sink — an
        # entropy bonus pushes z toward -inf (alpha,beta -> the 1.01 floor =
        # max entropy) where sigmoid(z) ~ 0 kills ALL policy gradients and
        # freezes the policy at uniform (observed: trained stage-s5 ends at
        # alpha,beta ~ 1.01-1.13, ratio pinned at 1.0, kl = 0).  A leaky
        # floor on the pre-activation keeps z recoverable.
        preact_floor = spec.pop("preact_floor", None)
        x = ControlBranch(dtype=self.dtype, **spec)(dynamics, training)
        x = x.astype(jnp.float32)
        glorot = nn.initializers.glorot_uniform()
        za = nn.Dense(self.num_actions, kernel_init=glorot, name="alpha")(x)
        zb = nn.Dense(self.num_actions, kernel_init=glorot, name="beta")(x)
        if preact_floor is not None:
            f = float(preact_floor)
            za = jnp.where(za > f, za, f + 0.05 * (za - f))
            zb = jnp.where(zb > f, zb, f + 0.05 * (zb - f))
        alpha = jax.nn.softplus(za) + 1.01
        beta = jax.nn.softplus(zb) + 1.01
        similarity = jnp.tanh(nn.Dense(1, kernel_init=glorot, name="pi_similarity")(x))
        speed = 2.0 * jax.nn.sigmoid(nn.Dense(1, kernel_init=glorot, name="pi_speed")(x))
        return dict(dist=Beta(alpha=alpha, beta=beta), speed=speed, similarity=similarity)


class ValueHead(nn.Module):
    spec: Dict[str, Any] = None
    exp_scale: float = 6.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dynamics: jax.Array, training: bool = False):
        spec = dict(DEFAULT_CONTROL)
        spec.update(self.spec or {})
        x = ControlBranch(dtype=self.dtype, **spec)(dynamics, training)
        x = x.astype(jnp.float32)
        glorot = nn.initializers.glorot_uniform()
        base = jnp.tanh(nn.Dense(1, kernel_init=glorot, name="v_base")(x))
        exp = self.exp_scale * jax.nn.sigmoid(nn.Dense(1, kernel_init=glorot, name="v_exp")(x))
        value = jnp.concatenate([base, exp], axis=-1)
        speed = 2.0 * jax.nn.sigmoid(nn.Dense(1, kernel_init=glorot, name="v_speed")(x))
        similarity = jnp.tanh(nn.Dense(1, kernel_init=glorot, name="v_similarity")(x))
        return dict(value=value, speed=speed, similarity=similarity)


class CARLANetwork:
    """Parameter manager for the three model components.

    Variables layout (a plain pytree, checkpoint-friendly):
      params = {dynamics, policy, old_policy, value}
      stats  = {dynamics, policy, value}          (BatchNorm running stats)
    """

    def __init__(self, num_actions: int = 2,
                 control_policy: Optional[dict] = None,
                 control_value: Optional[dict] = None,
                 dynamics: Optional[dict] = None,
                 exp_scale: float = 6.0,
                 compute_dtype: jnp.dtype = jnp.float32,
                 fused_units: bool = False):
        self.num_actions = num_actions
        self.exp_scale = exp_scale
        dyn_spec = dict(dynamics or {})
        if fused_units:
            # deep-merge the flag into the shufflenet sub-spec (DynamicsModel
            # replaces whole sub-dicts on update, so preserve g/last_channels)
            sn = dict(DEFAULT_DYNAMICS["shufflenet"])
            sn.update(dyn_spec.get("shufflenet", {}))
            sn["fused_units"] = True
            dyn_spec["shufflenet"] = sn
        self.dynamics_model = DynamicsModel(spec=dyn_spec, dtype=compute_dtype)
        self.policy_model = PolicyHead(num_actions=num_actions, spec=control_policy or {},
                                       dtype=compute_dtype)
        self.value_model = ValueHead(spec=control_value or {}, exp_scale=exp_scale,
                                     dtype=compute_dtype)

    # ---- initialization ----
    def init(self, key: jax.Array, sample_obs: Dict[str, jax.Array]):
        kd, kp, kv = jax.random.split(key, 3)
        dvars = self.dynamics_model.init(kd, sample_obs, training=False)
        feat = self.dynamics_model.apply(dvars, sample_obs, training=False)
        pvars = self.policy_model.init(kp, feat, training=False)
        vvars = self.value_model.init(kv, feat, training=False)
        params = dict(dynamics=dvars["params"], policy=pvars["params"],
                      old_policy=jax.tree_util.tree_map(lambda x: x, pvars["params"]),
                      value=vvars["params"])
        stats = dict(dynamics=dvars.get("batch_stats", {}),
                     policy=pvars.get("batch_stats", {}),
                     value=vvars.get("batch_stats", {}))
        return params, stats

    # ---- forward passes ----
    def dynamics_apply(self, params, stats, obs, training: bool = False):
        variables = {"params": params["dynamics"], "batch_stats": stats["dynamics"]}
        if training:
            feat, mutated = self.dynamics_model.apply(
                variables, obs, training=True, mutable=["batch_stats"])
            return feat, mutated["batch_stats"]
        return self.dynamics_model.apply(variables, obs, training=False), stats["dynamics"]

    def policy_apply(self, params, stats, feat, training: bool = False, old: bool = False):
        which = "old_policy" if old else "policy"
        variables = {"params": params[which], "batch_stats": stats["policy"]}
        if training:
            out, mutated = self.policy_model.apply(
                variables, feat, training=True, mutable=["batch_stats"])
            return out, mutated["batch_stats"]
        return self.policy_model.apply(variables, feat, training=False), stats["policy"]

    def value_apply(self, params, stats, feat, training: bool = False):
        variables = {"params": params["value"], "batch_stats": stats["value"]}
        if training:
            out, mutated = self.value_model.apply(
                variables, feat, training=True, mutable=["batch_stats"])
            return out, mutated["batch_stats"]
        return self.value_model.apply(variables, feat, training=False), stats["value"]

    def predict(self, params, stats, obs, key: jax.Array,
                num_samples: int = None):
        """Rollout-time prediction (reference `core/networks.py:181-193`):
        dynamics -> old_policy sample + value, all in inference mode.
        Returns (action, mean, std, log_prob, value(base,exp), aux);
        with num_samples=n, action/log_prob have a leading (n,) axis."""
        feat, _ = self.dynamics_apply(params, stats, obs, training=False)
        pol, _ = self.policy_apply(params, stats, feat, training=False, old=True)
        val, _ = self.value_apply(params, stats, feat, training=False)
        dist: Beta = pol["dist"]
        if num_samples is None:
            action = dist.clip(dist.sample(key))
        else:
            # block rollout: the stacked observation is constant between
            # frame pushes (reference refreshes it every past_obs_freq=4
            # steps — core/carla_env.py:290-299 — and the per-step `action`
            # input is never wired into the reference's dynamics graph,
            # core/networks.py:38-56), so n iid draws from one forward pass
            # are distribution-exact vs. n per-step forward passes.
            action = dist.clip(dist.sample_n(key, num_samples))
        log_prob = dist.log_prob(action)
        return dict(action=action, mean=dist.mean(), std=dist.stddev(),
                    log_prob=log_prob, value=val["value"],
                    speed=pol["speed"], similarity=pol["similarity"])

    @staticmethod
    def update_old_policy(params, weights=None):
        """Copy policy -> old_policy (reference `core/networks.py:281-285`)."""
        src = weights if weights is not None else params["policy"]
        return dict(params, old_policy=jax.tree_util.tree_map(lambda x: x, src))
