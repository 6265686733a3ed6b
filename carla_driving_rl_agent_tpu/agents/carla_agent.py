"""CARLAgent: PPO with shared-dynamics backbone, auxiliary losses, and
curriculum-ready checkpointing — the flagship trainer.

Reference: `core/carla_agent.py` (CARLAgent) over `rl/agents/ppo.py`
(PPOAgent).  The entire train iteration — rollout over B vmapped worlds,
GAE/returns, and minibatch SGD over policy/value/dynamics — is ONE jitted
XLA program; nothing leaves the device between env stepping and learning.

Objectives (exact formulas, reference lines cited inline):
  * policy: PPO-clip with per-action-ratio mean, entropy bonus, and
    0.5*MSE speed + 0.5*MSE similarity auxiliary losses
    (`core/carla_agent.py:394-428`).  NOTE: like the reference, the new
    policy's log-prob is computed on a FRESH sample from the current policy
    (the reference's PolicyNetwork.call samples internally —
    `core/networks.py:96-110`); Beta sampling is reparameterized in JAX so
    gradients flow through the sample.
  * value: 0.25*MSE(base) + MSE(exp)/exp_scale^2, plus unscaled speed &
    similarity MSE, all scaled by 0.25 (`core/carla_agent.py:469-486`).
  * advantages: GAE -> sign-preserving max-norm * adv_scale
    (`rl/agents/ppo.py:714-727`); value targets: discounted rewards-to-go
    decomposed into (base, exp) (`rl/agents/ppo.py:699-712`).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from carla_driving_rl_agent_tpu.agents import rollout as rollout_mod
from carla_driving_rl_agent_tpu.envs.carla_env import CARLAEnv, EnvState
from carla_driving_rl_agent_tpu.models.carla_network import CARLANetwork
from carla_driving_rl_agent_tpu.models.distributions import Beta
from carla_driving_rl_agent_tpu.utils import math as um
from carla_driving_rl_agent_tpu.utils.optimizers import get_optimizer_by_name
from carla_driving_rl_agent_tpu.utils.schedules import DynamicParameter


@dataclass
class CARLAgentConfig:
    # parallel rollout geometry (TPU-new: the reference runs 1 env)
    num_envs: int = 64
    rollout_steps: int = 128
    # PPO hyper-parameters (reference defaults: rl/agents/ppo.py:26-61,
    # stage presets core/learning.py:311-498)
    batch_size: int = 64
    gamma: float = 0.9999
    lambda_: float = 0.999
    policy_lr: Any = 3e-4
    value_lr: Any = 3e-4
    dynamics_lr: Any = 3e-4
    clip_ratio: Any = 0.2
    entropy_regularization: Any = 0.1
    advantage_scale: Any = 2.0
    optimization_steps: Tuple[int, int] = (1, 1)
    clip_norm: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    polyak: float = 1.0
    update_dynamics: bool = True
    optimizer: str = "adam"
    repeat_action: int = 1
    # block rollout: one forward pass + one rendered frame per
    # past_obs_freq steps (distribution-exact vs per-step predicts; see
    # rollout.run_rollout_blocks). ~3-4x rollout speedup; set False for
    # strict per-episode push-phase parity.
    rollout_block: bool = False
    # zero the advantage of block-rollout sub-steps whose recorded obs
    # predate a mid-block auto-reset (Trajectory.post_reset): those
    # transitions pair the old episode's observation with the new episode's
    # reward, so they must not contribute policy gradient.  No-op for the
    # per-step path (post_reset is all-zero there).
    mask_post_reset: bool = True
    # fused policy+value update: ONE minibatch scan whose joint loss shares a
    # single ShuffleNet backbone pass between the policy and value
    # objectives, instead of the reference's two sequential phases that each
    # re-run the backbone (rl/agents/ppo.py:190-226).  Halves the dominant
    # per-sample cost (backbone fwd+bwd) and the minibatch gather/augment
    # work.  Deviations vs the sequential path (all documented here, parity
    # path unchanged by default): policy and value see the SAME permutation;
    # the dynamics gradient is the sum of both objectives' contributions,
    # clipped once; value updates see policy-phase dynamics params one
    # minibatch fresher.  optimization_steps[0] is the shared epoch count.
    fused_update: bool = False
    # shared-forward TWO-STEP update (VERDICT r4 item 5's semantics-
    # preserving fast path): like fused_update, ONE minibatch scan with a
    # single backbone forward per minibatch — but the stored linearization
    # is pulled back TWICE (policy objective's cotangent, then value's) and
    # the shared backbone gets TWO separately-clipped Adam steps in the
    # sequential phases' order.  This removes the diagnosed fused_update
    # failure mechanism (ONE summed-gradient Adam step lets the larger
    # value gradient dominate the backbone and starve the policy head —
    # logs/r4-fast-curriculum.log) while still saving the duplicated
    # forward and the second gather/augment pass.  Remaining deviations vs
    # sequential: policy and value share the minibatch permutation; both
    # gradients are evaluated at the SAME params (sequential's value phase
    # sees post-policy-phase params); one BN-stats fold per minibatch
    # instead of two.  Mutually exclusive with fused_update.
    two_step_update: bool = False
    # two_step_update with PER-PHASE backbone Adam states (the round-5
    # full-chain gate failure fix candidate): the shared backbone keeps two
    # independent optimizer states, one fed only by policy-phase gradients,
    # one only by value-phase gradients.  Rationale: two_step_update's
    # interleaved stream through ONE Adam state keeps the second moment at
    # value-grad scale, muting every policy step; the sequential reference
    # adapts its moments within each phase (256 consecutive same-kind
    # steps).  Split states reproduce that per-stream normalization
    # continuously; the remaining deviation from sequential is step order
    # (interleaved vs phased), which near-commutes for small normalized
    # steps.  Implies the two_step machinery; opt_state["dynamics"]
    # becomes a (policy_phase, value_phase) tuple.
    two_step_split_adam: bool = False
    # how many train updates run inside ONE jitted program (lax.scan over
    # per-update key/hyper/lr arrays — _build_train_chunk_fn).  Identical
    # numerics to per-update dispatch; amortizes the remote-attached
    # backend's per-call boundary cost (non-donated params/stats round-trip
    # the tunnel: measured ~10 s/update of boundary vs ~4.4 s device compute
    # at the bench geometry).  1 = the reference-shaped per-update loop.
    updates_per_dispatch: int = 8
    aug_intensity: float = 0.0
    aux: float = 1.0
    seed: int = 42
    # re-seed with a fresh random seed at every update (reference
    # rl/agents/ppo.py:44-52 re-seeds tf/np/random per episode/update)
    seed_regularization: bool = False
    # CARLA-reference quirk: its policy objective evaluates log-probs on a
    # FRESH sample from the current policy (core/networks.py:96-110 +
    # core/carla_agent.py:394-428) instead of the stored rollout action.
    # That gradient tunes policy confidence but cannot learn WHICH action was
    # good; measured on stage-s1 it fails to beat the untrained baseline.
    # Default follows the reference's own BASE objective (stored actions,
    # rl/agents/ppo.py:309-358); set True for strict CARLA-variant parity.
    resample_actions: bool = False
    # Device-resident imitation (TPU-native replacement for the reference's
    # collect-to-npz-then-imitate round trip, core/learning.py:196-227):
    # rollout actions come from the privileged expert (envs/expert.py) with
    # behaviours mixed across worlds, log-probs/values from the current
    # nets, and the SAME fused update consumes the trajectory — PPO-on-
    # expert-actions with real value baselines (the file-trace `imitate`
    # uses zeros).  No host transfer, no trace files.
    expert_rollout: bool = False
    expert_behaviour_mix: Tuple[str, ...] = ("cautious", "normal",
                                             "aggressive")
    # per-action importance-ratio ceiling (0 = off, reference-parity). Used
    # by the expert-rollout imitation path, where stored expert actions can
    # sit in the sharpened policy's far tail — see _policy_loss.
    ratio_clamp: float = 0.0
    # run each optimizer's moment/update math on ONE flattened vector
    # (optax.flatten) instead of one op per parameter tensor.  Numerically
    # identical (all registry optimizers are element-wise; pinned by
    # tests/test_utils_misc.TestFlatOptimizer).  MEASURED ZERO on chip
    # (scripts/bench_train_ab.py fused-bf16-flat 1207.3 vs -noflat 1207.4
    # steps/s): XLA already horizontal-fuses the per-leaf adam ops, so the
    # update phase is backbone-bound, not op-count-bound.  Default off —
    # flattening changes the opt_state.msgpack layout (old checkpoints'
    # opt_state silently re-initializes via utils/checkpoint.load_agent's
    # mismatch fallback) for no speed gain; kept as a probe knob.
    flat_optimizer: bool = False
    # network spec (reference core/carla_agent.py:61-68)
    network: Dict[str, Any] = field(default_factory=dict)
    compute_dtype: str = "float32"
    # dispatch the backbone's stride-1 ShuffleNet units to the fused Pallas
    # TPU kernel (ops/shuffle_unit_pallas.py): ~10 XLA ops -> 1 pallas_call
    # per unit, cutting the activation-bandwidth-bound minibatch phase's HBM
    # round-trips 4x.  Identical param/checkpoint layout; numerics pinned by
    # tests/test_models.py.  Off the TPU backend the kernel runs in Pallas
    # interpret mode (slow) — keep False for CPU work.
    fused_units: bool = False


class CARLAgent:
    """Owns network params, three optimizers, schedules, and the jitted
    train/eval programs. Host-side state is minimal (schedule steps)."""

    def __init__(self, env: CARLAEnv, config: CARLAgentConfig = None,
                 name: str = "carla", weights_dir: str = "weights",
                 mesh=None, log_mode: str = "summary"):
        self.env = env
        self.config = config or CARLAgentConfig()
        self.name = name
        self.base_path = os.path.join(weights_dir, name)
        self.mesh = mesh  # optional jax.sharding.Mesh: worlds sharded over chips
        from carla_driving_rl_agent_tpu.utils.summary import Summary
        self.summary = Summary(mode=log_mode, name=name)

        cfg = self.config
        assert not (cfg.fused_update and (cfg.two_step_update
                                          or cfg.two_step_split_adam)), \
            "fused_update and two_step_update/_split_adam are mutually exclusive"
        net_spec = dict(cfg.network or {})
        self.network = CARLANetwork(
            num_actions=env.config.num_actions,
            control_policy=net_spec.get("control_policy"),
            control_value=net_spec.get("control_value"),
            dynamics=net_spec.get("dynamics"),
            compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
            fused_units=cfg.fused_units,
        )

        # dynamic hyper-parameters (reference rl/agents/ppo.py:42-61,100-106)
        self.policy_lr = DynamicParameter.create(cfg.policy_lr)
        self.value_lr = DynamicParameter.create(cfg.value_lr)
        self.dynamics_lr = DynamicParameter.create(cfg.dynamics_lr)
        self.clip_ratio = DynamicParameter.create(cfg.clip_ratio)
        self.entropy_strength = DynamicParameter.create(cfg.entropy_regularization)
        self.adv_scale = DynamicParameter.create(cfg.advantage_scale)

        # init params from a sample observation
        key = jax.random.PRNGKey(cfg.seed)
        k_init, self._key = jax.random.split(key)
        sample = self._sample_net_input()
        self.params, self.stats = self.network.init(k_init, sample)

        self.policy_opt = get_optimizer_by_name(cfg.optimizer, self.policy_lr(),
                                                flat=cfg.flat_optimizer)
        self.value_opt = get_optimizer_by_name(cfg.optimizer, self.value_lr(),
                                               flat=cfg.flat_optimizer)
        self.dynamics_opt = get_optimizer_by_name(cfg.optimizer, self.dynamics_lr(),
                                                  flat=cfg.flat_optimizer)
        self.opt_state = dict(
            policy=self.policy_opt.init(self.params["policy"]),
            value=self.value_opt.init(self.params["value"]),
            dynamics=((self.dynamics_opt.init(self.params["dynamics"]),
                       self.dynamics_opt.init(self.params["dynamics"]))
                      if cfg.two_step_split_adam
                      else self.dynamics_opt.init(self.params["dynamics"])),
        )

        self.update_step = 0
        self._train_fn = None
        self._train_chunk_fns = {}
        self._eval_fn = None

    # ------------------------------------------------------------------
    def _sample_net_input(self, batch: int = 1) -> dict:
        from carla_driving_rl_agent_tpu.envs import world as world_mod
        T = self.env.config.time_horizon
        H, W, C = self.env.config.image_shape
        n = world_mod.nav_feature_dim(self.env.params)
        return dict(
            state_image=jnp.zeros((batch, T, H, W, C)),
            state_road=jnp.zeros((batch, T, 9)),
            state_vehicle=jnp.zeros((batch, T, 4)),
            state_navigation=jnp.zeros((batch, T, n)),
            action=jnp.zeros((batch, self.env.config.num_actions)),
        )

    def _predict_fn(self, params, stats):
        def predict(net_in, key):
            return self.network.predict(params, stats, net_in, key)
        return predict

    def _hyper(self) -> dict:
        """Current scheduled scalars, passed as traced args (no retraces)."""
        return dict(
            clip_ratio=jnp.float32(self.clip_ratio()),
            entropy=jnp.float32(self.entropy_strength()),
            adv_scale=jnp.float32(self.adv_scale()),
        )

    def _set_lrs(self):
        from carla_driving_rl_agent_tpu.utils.optimizers import set_learning_rate
        set_learning_rate(self.opt_state["policy"], self.policy_lr())
        set_learning_rate(self.opt_state["value"], self.value_lr())
        set_learning_rate(self.opt_state["dynamics"], self.dynamics_lr())

    # ------------------------------------------------------------------
    # losses (jit-traced)
    # ------------------------------------------------------------------
    def _policy_loss(self, p_params, d_params, stats, batch, hyper, key):
        params = dict(policy=p_params, dynamics=d_params)
        feat, d_stats = self.network.dynamics_apply(params, stats, batch["obs"],
                                                    training=True)
        total, aux_out = self._policy_objective(params, stats, feat, batch,
                                                hyper, key)
        aux_out["d_stats"] = d_stats
        return total, aux_out

    def _policy_objective(self, params, stats, feat, batch, hyper, key):
        """Policy head objective on precomputed dynamics features (the
        backbone pass is the caller's: _policy_loss runs it alone, the fused
        update shares one pass with the value objective)."""
        pol, p_stats = self.network.policy_apply(params, stats, feat, training=True)
        dist: Beta = pol["dist"]

        if self.config.resample_actions:
            # fresh sample from the current policy (reference quirk,
            # core/networks.py:96-110; see CARLAgentConfig.resample_actions)
            sample = dist.clip(dist.sample(key))
        else:
            # standard PPO: log-prob of the STORED rollout action
            # (reference base objective, rl/agents/ppo.py:322-325)
            sample = dist.clip(batch["obs"]["action"])
        log_prob = dist.log_prob(sample)
        entropy = jnp.mean(dist.entropy())

        adv = batch["advantages"]
        log_ratio = log_prob - batch["log_prob"]
        if self.config.ratio_clamp:
            # Off-policy importance truncation (IMPALA-style, TPU-new,
            # off by default): expert-rollout traces put stored actions deep
            # in the SHARPENED policy's tail (e.g. full-brake a=0 under a
            # concentrated cruise Beta), where exp(lp' - lp) overflows; with
            # negative advantage the loss hits +inf and the NaN-safe gradient
            # clip zeroes the whole minibatch — silently dropping exactly the
            # braking/slow-down lessons (observed: loss_policy=inf late in
            # imitation probes).  Clamping bounds the update instead.
            # The clamp must happen in LOG space: min(exp(x), c) first
            # overflows exp forward and then backpropagates 0 * inf = NaN
            # through the clamped branch.
            log_ratio = jnp.minimum(log_ratio, jnp.log(self.config.ratio_clamp))
        ratio = jnp.exp(log_ratio)
        ratio = jnp.mean(ratio, axis=1)                    # per-action-ratio mean
        clip_v = hyper["clip_ratio"]
        min_adv = jnp.where(adv > 0.0, (1.0 + clip_v) * adv, (1.0 - clip_v) * adv)
        policy_loss = -jnp.mean(jnp.minimum(ratio * adv, min_adv))
        entropy_penalty = hyper["entropy"] * entropy

        speed_loss = 0.5 * jnp.mean(jnp.square(batch["speed"] - pol["speed"][:, 0]))
        sim_loss = 0.5 * jnp.mean(jnp.square(batch["similarity"] - pol["similarity"][:, 0]))

        total = policy_loss - entropy_penalty + self.config.aux * (speed_loss + sim_loss)
        aux_out = dict(p_stats=p_stats, loss_policy=policy_loss,
                       entropy=entropy, ratio=jnp.mean(ratio),
                       kl=jnp.mean(um.kl_divergence(batch["log_prob"], log_prob)))
        return total, aux_out

    def _value_loss(self, v_params, d_params, stats, batch):
        params = dict(value=v_params, dynamics=d_params)
        feat, d_stats = self.network.dynamics_apply(params, stats, batch["obs"],
                                                    training=True)
        total, aux_out = self._value_objective(params, stats, feat, batch)
        aux_out["d_stats"] = d_stats
        return total, aux_out

    def _value_objective(self, params, stats, feat, batch):
        """Value head objective on precomputed dynamics features (see
        _policy_objective)."""
        val, v_stats = self.network.value_apply(params, stats, feat, training=True)
        values = val["value"]
        returns = batch["returns"]

        base_loss = jnp.mean(jnp.square(returns[:, 0] - values[:, 0]))
        exp_loss = jnp.mean(jnp.square(returns[:, 1] - values[:, 1]))
        value_loss = 0.25 * base_loss + exp_loss / (self.network.exp_scale ** 2)

        speed_loss = jnp.mean(jnp.square(batch["speed"] - val["speed"][:, 0]))
        sim_loss = jnp.mean(jnp.square(batch["similarity"] - val["similarity"][:, 0]))

        total = (value_loss + self.config.aux * (speed_loss + sim_loss)) * 0.25
        aux_out = dict(v_stats=v_stats, loss_value=value_loss)
        return total, aux_out

    # ------------------------------------------------------------------
    # one full train iteration: rollout + targets + minibatch SGD
    # ------------------------------------------------------------------
    def _make_train_iteration(self):
        """The pure per-update train function (rollout + GAE + minibatch
        SGD).  Jitted directly by _build_train_fn (updates_per_dispatch=1)
        or scanned over K per-update inputs by _build_train_chunk_fn."""
        cfg = self.config
        env = self.env
        net = self.network

        n_samples = cfg.rollout_steps * cfg.num_envs
        n_minibatches = max(1, n_samples // cfg.batch_size)

        def train_iteration(params, stats, opt_state, env_states, key, hyper, consts):
          # bind world-data arrays as traced args (not closure constants)
          with env.bind(consts):
            key, k_roll, k_shuffle_p, k_shuffle_v, k_mb = jax.random.split(key, 5)

            # ---- rollout (old policy inference; core/networks.py:181-193) ----
            if cfg.expert_rollout:
                # device-resident imitation: expert actions, old-policy
                # log-probs, value baselines — same Trajectory, same update
                from carla_driving_rl_agent_tpu.envs import expert as expert_mod
                order = ("cautious", "normal", "aggressive")
                mix = jnp.asarray([order.index(b)
                                   for b in cfg.expert_behaviour_mix])
                ids = mix[jnp.arange(cfg.num_envs) % mix.shape[0]]
                profiles = expert_mod.behaviour_profiles(ids)  # dict of (B,)

                def expert_fn(states):
                    return jax.vmap(
                        lambda w, sf, hd, bg, sd: expert_mod.expert_action(
                            w, env.params, env.town, env.routes,
                            ignore_traffic_light=True,
                            profile=dict(speed_factor=sf, hazard_distance=hd,
                                         brake_gain=bg, speed_decrease=sd))
                    )(states.world, profiles["speed_factor"],
                      profiles["hazard_distance"], profiles["brake_gain"],
                      profiles["speed_decrease"])

                def predict_lp(net_in, action01):
                    feat, _ = net.dynamics_apply(params, stats, net_in,
                                                 training=False)
                    pol, _ = net.policy_apply(params, stats, feat,
                                              training=False, old=True)
                    val, _ = net.value_apply(params, stats, feat,
                                             training=False)
                    return dict(log_prob=pol["dist"].log_prob(action01),
                                value=val["value"])

                env_states, traj, final_obs = rollout_mod.run_rollout(
                    env, predict_lp, env_states, k_roll, cfg.rollout_steps,
                    expert_fn=expert_fn)
            elif cfg.rollout_block:
                assert cfg.repeat_action == 1, \
                    "block rollout composes with repeat_action=1 only"

                def predict_n(net_in, k, n):
                    return net.predict(params, stats, net_in, k, num_samples=n)

                env_states, traj, final_obs = rollout_mod.run_rollout_blocks(
                    env, predict_n, env_states, k_roll, cfg.rollout_steps)
            else:
                def predict(net_in, k):
                    return net.predict(params, stats, net_in, k)

                env_states, traj, final_obs = rollout_mod.run_rollout(
                    env, predict, env_states, k_roll, cfg.rollout_steps,
                    repeat_action=cfg.repeat_action)

            # ---- targets ----
            values = um.compose_number(traj.value[..., 0], traj.value[..., 1])  # (S,B)
            final_in = {f"state_{k}": v for k, v in final_obs.items()}
            final_in["action"] = env_states.last_action
            feat, _ = net.dynamics_apply(params, stats, final_in, training=False)
            vlast, _ = net.value_apply(params, stats, feat, training=False)
            bootstrap = um.compose_number(vlast["value"][:, 0], vlast["value"][:, 1])

            done = jnp.clip(traj.terminated + traj.truncated, 0.0, 1.0)
            # truncation bootstraps from the current value estimate
            # (reference bootstraps V(s_T) at episode cutoff — ppo.py:540-542)
            rewards = traj.reward + cfg.gamma * traj.truncated * values

            adv_raw, _ = um.batched_gae(rewards, values, done, bootstrap,
                                        cfg.gamma, cfg.lambda_)
            advantages = um.sp_norm(adv_raw) * hyper["adv_scale"]
            if cfg.mask_post_reset:
                # block-rollout obs/reward mismatch mitigation (see
                # rollout.Trajectory.post_reset); masked AFTER sp_norm so the
                # normalization statistics stay deterministic w.r.t. GAE
                advantages = advantages * (1.0 - traj.post_reset)

            def returns_scan(carry, xs):
                r, d = xs
                ret = r + cfg.gamma * (1.0 - d) * carry
                return ret, ret

            _, returns_raw = jax.lax.scan(returns_scan, bootstrap,
                                          (rewards, done), reverse=True)
            ret_base, ret_exp = um.decompose_number(returns_raw)
            returns_be = jnp.stack([ret_base, ret_exp], axis=-1)      # (S, B, 2)

            # ---- flatten samples ----
            S, B = cfg.rollout_steps, cfg.num_envs
            flat_step = jnp.repeat(jnp.arange(S), B)
            flat_env = jnp.tile(jnp.arange(B), S)

            def flat(x):
                return x.reshape((S * B,) + x.shape[2:])

            data = dict(
                advantages=flat(advantages),
                returns=flat(returns_be),
                log_prob=flat(traj.log_prob),
                action=flat(traj.action),
                speed=flat(traj.speed) / 100.0,          # carla_agent.py:328
                similarity=flat(traj.similarity),
                road=flat(traj.road), vehicle=flat(traj.vehicle),
                navigation=flat(traj.navigation),
            )

            def gather_batch(idx, key=None):
                mb = {k: v[idx] for k, v in data.items()}
                img = rollout_mod.gather_image_stacks(traj, flat_step[idx], flat_env[idx])
                # frames are stored as half-res uint8 planes (envs/carla_env
                # EnvState); reconstruct the (mb, T, H, 3W, C) [0,1] network
                # input at minibatch-assembly time
                from carla_driving_rl_agent_tpu.envs.carla_env import (
                    planes_to_image)
                ry, rx = env.config.upsample
                img = planes_to_image(img, ry, rx).astype(jnp.float32) / 255.0
                if cfg.aug_intensity > 0.0 and key is not None:
                    # probability-gated augmentation pipeline applied to each
                    # sample's whole T-stack (reference core/carla_agent.py:527-579)
                    from carla_driving_rl_agent_tpu.augment.simclr import (
                        carla_augment_pipeline)
                    keys = jax.random.split(key, img.shape[0])
                    aug_one = jax.vmap(carla_augment_pipeline,
                                       in_axes=(None, 0, None))  # shared key over T
                    img = jax.vmap(aug_one, in_axes=(0, 0, None))(
                        keys, img, cfg.aug_intensity)
                obs = dict(state_image=img,
                           state_road=mb["road"], state_vehicle=mb["vehicle"],
                           state_navigation=mb["navigation"], action=mb["action"])
                mb["obs"] = obs
                return mb

            # ---- fused policy+value+dynamics updates (one backbone pass) ----
            if cfg.fused_update:
                perm = jax.random.permutation(k_shuffle_p, S * B)

                def fused_minibatch(carry, mb_idx):
                    params, stats, opt_state, key = carry
                    key, k_s, k_aug = jax.random.split(key, 3)
                    idx = jax.lax.dynamic_slice_in_dim(
                        perm, mb_idx * cfg.batch_size, cfg.batch_size)
                    batch = gather_batch(idx, k_aug)

                    def loss_fn(pvd):
                        feat, d_stats = net.dynamics_apply(
                            pvd, stats, batch["obs"], training=True)
                        p_total, p_aux = self._policy_objective(
                            pvd, stats, feat, batch, hyper, k_s)
                        v_total, v_aux = self._value_objective(
                            pvd, stats, feat, batch)
                        # report the TOTAL value objective as loss_value,
                        # matching the sequential phase's metric semantics
                        # (value_minibatch logs its full loss incl. the
                        # speed/similarity aux terms and the 0.25 scale)
                        aux = dict(p_aux, **v_aux)
                        aux.update(loss_value=v_total, d_stats=d_stats)
                        return p_total + v_total, aux

                    (loss, aux), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(
                        dict(policy=params["policy"], value=params["value"],
                             dynamics=params["dynamics"]))

                    g_pol = um.clip_gradients(grads["policy"], cfg.clip_norm[0])
                    g_val = um.clip_gradients(grads["value"], cfg.clip_norm[1])
                    g_dyn = um.clip_gradients(grads["dynamics"], cfg.clip_norm[2])

                    # old_policy <- policy BEFORE applying (ppo.py:238-252)
                    new_params = dict(params, old_policy=params["policy"])
                    up, opt_p = self.policy_opt.update(
                        g_pol, opt_state["policy"], params["policy"])
                    new_policy = optax.apply_updates(params["policy"], up)
                    uv, opt_v = self.value_opt.update(
                        g_val, opt_state["value"], params["value"])
                    new_value = optax.apply_updates(params["value"], uv)
                    if cfg.polyak < 1.0:
                        new_policy = um.polyak_average(
                            new_policy, params["policy"], cfg.polyak)
                        new_value = um.polyak_average(
                            new_value, params["value"], cfg.polyak)
                    new_params["policy"] = new_policy
                    new_params["value"] = new_value
                    opt_d = opt_state["dynamics"]
                    if cfg.update_dynamics:
                        ud, opt_d = self.dynamics_opt.update(
                            g_dyn, opt_state["dynamics"], params["dynamics"])
                        new_params["dynamics"] = optax.apply_updates(
                            params["dynamics"], ud)
                    new_stats = dict(stats, dynamics=aux["d_stats"],
                                     policy=aux["p_stats"], value=aux["v_stats"])
                    new_opt = dict(policy=opt_p, value=opt_v, dynamics=opt_d)
                    metrics = dict(loss_policy=aux["loss_policy"],
                                   entropy=aux["entropy"], ratio=aux["ratio"],
                                   kl=aux["kl"], loss_total=loss,
                                   loss_value=aux["loss_value"])
                    return (new_params, new_stats, new_opt, key), metrics

                mb_ids_f = jnp.tile(jnp.arange(n_minibatches),
                                    cfg.optimization_steps[0])
                (params, stats, opt_state, key), f_metrics = jax.lax.scan(
                    fused_minibatch, (params, stats, opt_state, key), mb_ids_f)
                p_metrics = f_metrics
                v_metrics = dict(loss_value=f_metrics["loss_value"])

                metrics = dict(
                    reward_mean=jnp.mean(traj.reward),
                    episode_done=jnp.sum(done),
                    collision_rate=jnp.sum(traj.terminated)
                    / jnp.maximum(jnp.sum(done), 1.0),
                    speed_mean=jnp.mean(traj.speed),
                    similarity_mean=jnp.mean(traj.similarity),
                    advantage_abs=jnp.mean(jnp.abs(advantages)),
                    returns_mean=jnp.mean(returns_raw),
                    value_mean=jnp.mean(values),
                    loss_policy=jnp.mean(p_metrics["loss_policy"]),
                    loss_value=jnp.mean(v_metrics["loss_value"]),
                    entropy=jnp.mean(p_metrics["entropy"]),
                    ratio=jnp.mean(p_metrics["ratio"]),
                    kl=jnp.mean(p_metrics["kl"]),
                )
                return params, stats, opt_state, env_states, key, metrics

            # ---- shared-forward two-step updates (see two_step_update /
            # two_step_split_adam) ----
            if cfg.two_step_update or cfg.two_step_split_adam:
                perm = jax.random.permutation(k_shuffle_p, S * B)

                def two_step_minibatch(carry, mb_idx):
                    params, stats, opt_state, key = carry
                    key, k_s, k_aug = jax.random.split(key, 3)
                    idx = jax.lax.dynamic_slice_in_dim(
                        perm, mb_idx * cfg.batch_size, cfg.batch_size)
                    batch = gather_batch(idx, k_aug)

                    def fwd(pvd):
                        feat, d_stats = net.dynamics_apply(
                            pvd, stats, batch["obs"], training=True)
                        p_total, p_aux = self._policy_objective(
                            pvd, stats, feat, batch, hyper, k_s)
                        v_total, v_aux = self._value_objective(
                            pvd, stats, feat, batch)
                        aux = dict(p_aux, **v_aux)
                        aux.update(loss_value=v_total, d_stats=d_stats)
                        return (p_total, v_total), aux

                    pvd = dict(policy=params["policy"], value=params["value"],
                               dynamics=params["dynamics"])
                    (p_total, v_total), pullback, aux = jax.vjp(
                        fwd, pvd, has_aux=True)
                    # ONE stored linearization pulled back twice: each
                    # objective gets its own INDEPENDENT gradient (the
                    # rejected fused_update summed them into one Adam step)
                    one, zero = jnp.ones(()), jnp.zeros(())
                    g_p = pullback((one, zero))[0]
                    g_v = pullback((zero, one))[0]

                    g_pol = um.clip_gradients(g_p["policy"], cfg.clip_norm[0])
                    g_dyn_p = um.clip_gradients(g_p["dynamics"], cfg.clip_norm[2])
                    g_val = um.clip_gradients(g_v["value"], cfg.clip_norm[1])
                    g_dyn_v = um.clip_gradients(g_v["dynamics"], cfg.clip_norm[2])

                    # old_policy <- policy BEFORE applying (ppo.py:238-252)
                    new_params = dict(params, old_policy=params["policy"])
                    up, opt_p = self.policy_opt.update(
                        g_pol, opt_state["policy"], params["policy"])
                    new_policy = optax.apply_updates(params["policy"], up)
                    uv, opt_v = self.value_opt.update(
                        g_val, opt_state["value"], params["value"])
                    new_value = optax.apply_updates(params["value"], uv)
                    if cfg.polyak < 1.0:
                        new_policy = um.polyak_average(
                            new_policy, params["policy"], cfg.polyak)
                        new_value = um.polyak_average(
                            new_value, params["value"], cfg.polyak)
                    new_params["policy"] = new_policy
                    new_params["value"] = new_value
                    opt_d = opt_state["dynamics"]
                    if cfg.update_dynamics and cfg.two_step_split_adam:
                        # per-phase Adam states: each gradient stream keeps
                        # its own moment estimates, reproducing the
                        # sequential phases' within-phase normalization
                        dyn = params["dynamics"]
                        opt_d_p, opt_d_v = opt_d
                        ud, opt_d_p = self.dynamics_opt.update(g_dyn_p,
                                                               opt_d_p, dyn)
                        dyn = optax.apply_updates(dyn, ud)
                        ud, opt_d_v = self.dynamics_opt.update(g_dyn_v,
                                                               opt_d_v, dyn)
                        new_params["dynamics"] = optax.apply_updates(dyn, ud)
                        opt_d = (opt_d_p, opt_d_v)
                    elif cfg.update_dynamics:
                        # TWO separately-clipped Adam steps on the shared
                        # backbone, in the sequential phases' order — the
                        # policy head keeps its own normalized step
                        dyn = params["dynamics"]
                        ud, opt_d = self.dynamics_opt.update(g_dyn_p, opt_d,
                                                             dyn)
                        dyn = optax.apply_updates(dyn, ud)
                        ud, opt_d = self.dynamics_opt.update(g_dyn_v, opt_d,
                                                             dyn)
                        new_params["dynamics"] = optax.apply_updates(dyn, ud)
                    new_stats = dict(stats, dynamics=aux["d_stats"],
                                     policy=aux["p_stats"], value=aux["v_stats"])
                    new_opt = dict(policy=opt_p, value=opt_v, dynamics=opt_d)
                    metrics = dict(loss_policy=aux["loss_policy"],
                                   entropy=aux["entropy"], ratio=aux["ratio"],
                                   kl=aux["kl"], loss_total=p_total + v_total,
                                   loss_value=aux["loss_value"])
                    return (new_params, new_stats, new_opt, key), metrics

                mb_ids_t = jnp.tile(jnp.arange(n_minibatches),
                                    cfg.optimization_steps[0])
                (params, stats, opt_state, key), t_metrics = jax.lax.scan(
                    two_step_minibatch, (params, stats, opt_state, key),
                    mb_ids_t)

                metrics = dict(
                    reward_mean=jnp.mean(traj.reward),
                    episode_done=jnp.sum(done),
                    collision_rate=jnp.sum(traj.terminated)
                    / jnp.maximum(jnp.sum(done), 1.0),
                    speed_mean=jnp.mean(traj.speed),
                    similarity_mean=jnp.mean(traj.similarity),
                    advantage_abs=jnp.mean(jnp.abs(advantages)),
                    returns_mean=jnp.mean(returns_raw),
                    value_mean=jnp.mean(values),
                    loss_policy=jnp.mean(t_metrics["loss_policy"]),
                    loss_value=jnp.mean(t_metrics["loss_value"]),
                    entropy=jnp.mean(t_metrics["entropy"]),
                    ratio=jnp.mean(t_metrics["ratio"]),
                    kl=jnp.mean(t_metrics["kl"]),
                )
                return params, stats, opt_state, env_states, key, metrics

            # ---- policy + dynamics updates ----
            perm_p = jax.random.permutation(k_shuffle_p, S * B)

            def policy_minibatch(carry, mb_idx):
                params, stats, opt_state, key = carry
                key, k_s, k_aug = jax.random.split(key, 3)
                idx = jax.lax.dynamic_slice_in_dim(perm_p, mb_idx * cfg.batch_size,
                                                   cfg.batch_size)
                batch = gather_batch(idx, k_aug)

                def loss_fn(pd):
                    return self._policy_loss(pd["policy"], pd["dynamics"], stats,
                                             batch, hyper, k_s)

                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    dict(policy=params["policy"], dynamics=params["dynamics"]))

                g_pol = um.clip_gradients(grads["policy"], cfg.clip_norm[0])
                g_dyn = um.clip_gradients(grads["dynamics"], cfg.clip_norm[2])

                # old_policy <- policy BEFORE applying (rl/agents/ppo.py:238-252)
                new_params = dict(params, old_policy=params["policy"])
                up, opt_p = self.policy_opt.update(g_pol, opt_state["policy"],
                                                   params["policy"])
                new_policy = optax.apply_updates(params["policy"], up)
                if cfg.polyak < 1.0:
                    new_policy = um.polyak_average(new_policy, params["policy"],
                                                   cfg.polyak)
                new_params["policy"] = new_policy
                opt_d = opt_state["dynamics"]
                if cfg.update_dynamics:
                    ud, opt_d = self.dynamics_opt.update(g_dyn, opt_state["dynamics"],
                                                         params["dynamics"])
                    new_params["dynamics"] = optax.apply_updates(params["dynamics"], ud)
                new_stats = dict(stats, dynamics=aux["d_stats"], policy=aux["p_stats"])
                new_opt = dict(opt_state, policy=opt_p, dynamics=opt_d)
                metrics = dict(loss_policy=aux["loss_policy"], entropy=aux["entropy"],
                               ratio=aux["ratio"], kl=aux["kl"], loss_total=loss)
                return (new_params, new_stats, new_opt, key), metrics

            mb_ids = jnp.tile(jnp.arange(n_minibatches), cfg.optimization_steps[0])
            (params, stats, opt_state, key), p_metrics = jax.lax.scan(
                policy_minibatch, (params, stats, opt_state, key), mb_ids)

            # ---- value + dynamics updates ----
            perm_v = jax.random.permutation(k_shuffle_v, S * B)

            def value_minibatch(carry, mb_idx):
                params, stats, opt_state, key = carry
                key, k_aug = jax.random.split(key)
                idx = jax.lax.dynamic_slice_in_dim(perm_v, mb_idx * cfg.batch_size,
                                                   cfg.batch_size)
                batch = gather_batch(idx, k_aug)

                def loss_fn(vd):
                    return self._value_loss(vd["value"], vd["dynamics"], stats, batch)

                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    dict(value=params["value"], dynamics=params["dynamics"]))

                g_val = um.clip_gradients(grads["value"], cfg.clip_norm[1])
                g_dyn = um.clip_gradients(grads["dynamics"], cfg.clip_norm[2])
                uv, opt_v = self.value_opt.update(g_val, opt_state["value"],
                                                  params["value"])
                new_value = optax.apply_updates(params["value"], uv)
                # the reference applies polyak to BOTH nets (rl/agents/ppo.py:264-275)
                if cfg.polyak < 1.0:
                    new_value = um.polyak_average(new_value, params["value"],
                                                  cfg.polyak)
                new_params = dict(params, value=new_value)
                opt_d = opt_state["dynamics"]
                if cfg.update_dynamics:
                    ud, opt_d = self.dynamics_opt.update(g_dyn, opt_state["dynamics"],
                                                         params["dynamics"])
                    new_params["dynamics"] = optax.apply_updates(params["dynamics"], ud)
                new_stats = dict(stats, dynamics=aux["d_stats"], value=aux["v_stats"])
                new_opt = dict(opt_state, value=opt_v, dynamics=opt_d)
                return (new_params, new_stats, new_opt, key), dict(loss_value=loss)

            mb_ids_v = jnp.tile(jnp.arange(n_minibatches), cfg.optimization_steps[1])
            (params, stats, opt_state, key), v_metrics = jax.lax.scan(
                value_minibatch, (params, stats, opt_state, key), mb_ids_v)

            metrics = dict(
                reward_mean=jnp.mean(traj.reward),
                episode_done=jnp.sum(done),
                collision_rate=jnp.sum(traj.terminated) / jnp.maximum(jnp.sum(done), 1.0),
                speed_mean=jnp.mean(traj.speed),
                similarity_mean=jnp.mean(traj.similarity),
                advantage_abs=jnp.mean(jnp.abs(advantages)),
                returns_mean=jnp.mean(returns_raw),
                value_mean=jnp.mean(values),
                loss_policy=jnp.mean(p_metrics["loss_policy"]),
                loss_value=jnp.mean(v_metrics["loss_value"]),
                entropy=jnp.mean(p_metrics["entropy"]),
                ratio=jnp.mean(p_metrics["ratio"]),
                kl=jnp.mean(p_metrics["kl"]),
            )
            return params, stats, opt_state, env_states, key, metrics

        return train_iteration

    def _build_train_fn(self):
        train_iteration = self._make_train_iteration()
        # NOTE: params can contain aliased buffers (old_policy == policy after
        # a copy), which XLA refuses to donate twice — donate only the
        # optimizer state and env states.
        if self.mesh is not None:
            from carla_driving_rl_agent_tpu.parallel.mesh import replicated, world_sharding
            repl = replicated(self.mesh)
            world = world_sharding(self.mesh)
            return jax.jit(train_iteration,
                           in_shardings=(repl, repl, repl, world, repl, repl, repl),
                           out_shardings=(repl, repl, repl, world, repl, repl),
                           donate_argnums=(2, 3))
        return jax.jit(train_iteration, donate_argnums=(2, 3))

    def _build_train_chunk_fn(self):
        """K train updates in ONE jitted program (`lax.scan` over updates).

        Numerics are IDENTICAL to the per-update path: the per-update rng
        keys, scheduled hyper-parameters, and injected learning rates are
        precomputed host-side as leading-(K,) arrays (learn() steps the
        schedules exactly as the per-update loop would).  What changes is
        dispatch economics on the remote-attached backend: consecutive
        jitted calls round-trip the non-donated params/stats through the
        tunnel and pay per-call scalar fetches — measured ~10 s/update of
        boundary cost at the bench geometry vs ~4.4 s of device compute
        (scripts/bench_train_parts.py).  One program per K updates pays the
        boundary once.
        """
        train_iteration = self._make_train_iteration()
        from carla_driving_rl_agent_tpu.utils.optimizers import with_learning_rate

        def train_chunk(params, stats, opt_state, env_states, keys, hypers,
                        lrs, consts):
            def body(carry, xs):
                params, stats, opt_state, env_states = carry
                key, hyper, lr = xs
                opt_state = {g: with_learning_rate(opt_state[g], lr[g])
                             for g in opt_state}
                params, stats, opt_state, env_states, _, metrics = \
                    train_iteration(params, stats, opt_state, env_states,
                                    key, hyper, consts)
                return (params, stats, opt_state, env_states), metrics

            (params, stats, opt_state, env_states), metrics = jax.lax.scan(
                body, (params, stats, opt_state, env_states),
                (keys, hypers, lrs))
            return params, stats, opt_state, env_states, metrics

        if self.mesh is not None:
            from carla_driving_rl_agent_tpu.parallel.mesh import replicated, world_sharding
            repl = replicated(self.mesh)
            world = world_sharding(self.mesh)
            return jax.jit(train_chunk,
                           in_shardings=(repl, repl, repl, world, repl, repl,
                                         repl, repl),
                           out_shardings=(repl, repl, repl, world, repl),
                           donate_argnums=(2, 3))
        return jax.jit(train_chunk, donate_argnums=(2, 3))

    # ------------------------------------------------------------------
    def learn(self, num_updates: int, env_states: Optional[EnvState] = None,
              callback=None):
        """Main training loop (reference `rl/agents/ppo.py:464-568`).

        One "update" = rollout_steps x num_envs env steps + a PPO update; the
        reference's (episodes, timesteps) map to (num_envs worlds, rollout
        horizon).  Returns (env_states, list of host metrics dicts).
        """
        if self._train_fn is None:
            self._train_fn = self._build_train_fn()
        if env_states is None:
            self._key, k = jax.random.split(self._key)
            env = self.env

            # jit the initial reset: eager reset produces weak-typed leaves
            # that force ONE full retrace of the train program on the second
            # call (and eager stepping is slow on remote-attached backends)
            def reset_all(key, consts):
                with env.bind(consts):
                    states, _ = env.reset_batch(key, self.config.num_envs)
                    return states

            env_states = jax.jit(reset_all)(k, env.consts)

        history = []
        import random as py_random

        def advance_one():
            """Read this update's (lr, hyper, key) then step the schedules —
            the exact order of the per-update loop (read before on_episode)."""
            lr = dict(policy=self.policy_lr(), value=self.value_lr(),
                      dynamics=self.dynamics_lr())
            hyper = {k: float(v) for k, v in self._hyper().items()}
            if self.config.seed_regularization:
                self._key = jax.random.PRNGKey(py_random.randint(0, 2 ** 32 - 1))
            self._key, k = jax.random.split(self._key)
            self.update_step += 1
            for p in (self.policy_lr, self.value_lr, self.dynamics_lr,
                      self.clip_ratio, self.entropy_strength, self.adv_scale):
                p.on_episode()
            return lr, hyper, k

        def emit(host_metrics, step):
            history.append(host_metrics)
            self.summary.log(**host_metrics)
            self.summary.write_summaries()
            if callback is not None:
                callback(step, host_metrics)

        chunk_max = max(1, int(self.config.updates_per_dispatch))
        remaining = num_updates
        while remaining > 0:
            c = min(chunk_max, remaining)
            if c == 1:
                # per-update dispatch (parity/debug path, and tail updates)
                self._set_lrs()
                _, hyper, k = advance_one()
                out = self._train_fn(self.params, self.stats, self.opt_state,
                                     env_states, k,
                                     {n: jnp.float32(v) for n, v in hyper.items()},
                                     self.env.consts)
                self.params, self.stats, self.opt_state, env_states, _, metrics = out
                emit({n: float(v) for n, v in metrics.items()}, self.update_step)
            else:
                # chunked dispatch: c updates inside one jitted scan (see
                # _build_train_chunk_fn); per-update inputs as (c,) arrays
                if self._train_chunk_fns.get(c) is None:
                    self._train_chunk_fns[c] = self._build_train_chunk_fn()
                lrs, hypers, keys = [], [], []
                for _ in range(c):
                    lr, hyper, k = advance_one()
                    lrs.append(lr)
                    hypers.append(hyper)
                    keys.append(k)
                lrs_arr = {g: jnp.asarray([l[g] for l in lrs], jnp.float32)
                           for g in lrs[0]}
                hyp_arr = {n: jnp.asarray([h[n] for h in hypers], jnp.float32)
                           for n in hypers[0]}
                keys_arr = jnp.stack(keys)
                out = self._train_chunk_fns[c](
                    self.params, self.stats, self.opt_state, env_states,
                    keys_arr, hyp_arr, lrs_arr, self.env.consts)
                self.params, self.stats, self.opt_state, env_states, metrics = out
                host = jax.device_get(metrics)       # dict of (c,) arrays
                base_step = self.update_step - c
                for j in range(c):
                    emit({n: float(v[j]) for n, v in host.items()},
                         base_step + 1 + j)
            remaining -= c
        return env_states, history

    # ------------------------------------------------------------------
    # evaluation (reference core/carla_agent.py:205-321)
    # ------------------------------------------------------------------
    def _build_eval_fn(self, num_worlds: int, timesteps: int):
        env = self.env
        net = self.network

        def eval_rollout(params, stats, key, consts):
            with env.bind(consts):
                k_reset, key = jax.random.split(key)
                # per-trial deterministic keys (fold_in by trial index)
                # mirror the reference's per-trial reseeding with
                # initial_seed + trial (core/carla_agent.py:239-240): trial i
                # draws the same town/weather/route for a given initial_seed
                # regardless of the batch size
                keys = jax.vmap(lambda i: jax.random.fold_in(k_reset, i))(
                    jnp.arange(num_worlds))
                states, _ = jax.vmap(env.reset)(
                    keys, jnp.zeros((num_worlds,), jnp.int32))
                acc = dict(
                    active=jnp.ones(num_worlds),
                    total_reward=jnp.zeros(num_worlds),
                    similarity=jnp.zeros(num_worlds),
                    speed=jnp.zeros(num_worlds),
                    waypoint_distance=jnp.zeros(num_worlds),
                    timesteps=jnp.zeros(num_worlds),
                    collision=jnp.zeros(num_worlds),
                )

                from carla_driving_rl_agent_tpu.envs.carla_env import convert_action

                def accumulate(acc, reward, term, trunc, info):
                    a = acc["active"]
                    done = (term | trunc).astype(jnp.float32)
                    return dict(
                        active=a * (1.0 - done),
                        total_reward=acc["total_reward"] + reward * a,
                        similarity=acc["similarity"] + info["similarity"] * a,
                        speed=acc["speed"] + info["speed"] * a,
                        waypoint_distance=acc["waypoint_distance"]
                        + info["distance_to_next_waypoint"] * a,
                        timesteps=acc["timesteps"] + a,
                        collision=jnp.maximum(
                            acc["collision"],
                            info["collision"].astype(jnp.float32) * a * done),
                    )

                def net_input(states):
                    obs = env.observe(states)
                    net_in = {f"state_{k2}": v for k2, v in obs.items()}
                    net_in["action"] = states.last_action
                    return net_in

                block = env.config.past_obs_freq
                if self.config.rollout_block and timesteps % block == 0:
                    def block_fn(carry, _):
                        states, key, acc = carry
                        key, k = jax.random.split(key)
                        pred = net.predict(params, stats, net_input(states),
                                           k, num_samples=block)

                        def sub(inner, i):
                            states, acc, was_reset = inner
                            states, reward, term, trunc, info, did_reset = \
                                env.step_physics_batch(
                                    states, convert_action(pred["action"][i]))
                            states = states._replace(
                                last_action=pred["action"][i])
                            acc = accumulate(acc, reward, term, trunc, info)
                            return (states, acc, was_reset | did_reset), None

                        (states, acc, was_reset), _ = jax.lax.scan(
                            sub, (states, acc,
                                  jnp.zeros((num_worlds,), bool)),
                            jnp.arange(block))
                        states = env.push_block_frame_batch(states, was_reset)
                        return (states, key, acc), None

                    (states, key, acc), _ = jax.lax.scan(
                        block_fn, (states, key, acc), None,
                        length=timesteps // block)
                    return acc

                def step_fn(carry, _):
                    states, key, acc = carry
                    key, k = jax.random.split(key)
                    pred = net.predict(params, stats, net_input(states), k)
                    states, _, reward, term, trunc, info = env.step_batch(
                        states, convert_action(pred["action"]))
                    acc = accumulate(acc, reward, term, trunc, info)
                    return (states, key, acc), None

                (states, key, acc), _ = jax.lax.scan(
                    step_fn, (states, key, acc), None, length=timesteps)
                return acc

        return jax.jit(eval_rollout)

    def evaluate(self, name: str, timesteps: int, trials: int,
                 seeds=None, initial_seed: Optional[int] = None,
                 evaluation_dir: Optional[str] = None) -> dict:
        """Run `trials` evaluation episodes and write the per-scenario JSON
        with the six metrics (reference `core/carla_agent.py:205-321`):
        collision_rate, similarity, waypoint_distance, speed, total_reward,
        timesteps.  Episodes shorter than 32 steps are discarded (accidental
        first-step collisions, reference `:284`); total_reward clips at -1000
        (`:286`).  Trials run as parallel worlds instead of sequentially."""
        if isinstance(initial_seed, int):
            self._key = jax.random.PRNGKey(initial_seed)

        # oversample worlds so >=trials valid episodes survive the t>32 filter
        num_worlds = max(trials + 8, int(trials * 1.25))
        if self._eval_fn is None or self._eval_fn[0] != (num_worlds, timesteps):
            self._eval_fn = ((num_worlds, timesteps),
                             self._build_eval_fn(num_worlds, timesteps))
        eval_fn = self._eval_fn[1]
        self._key, k = jax.random.split(self._key)
        acc = jax.device_get(eval_fn(self.params, self.stats, k, self.env.consts))

        steps = np.maximum(acc["timesteps"], 1.0)
        valid = acc["timesteps"] > 32
        if valid.sum() < trials:
            valid = acc["timesteps"] > 0  # degenerate config: keep everything
        idx = np.nonzero(valid)[0][:trials]

        results = dict(
            collision_rate=acc["collision"][idx].tolist(),
            similarity=(acc["similarity"][idx] / steps[idx]).tolist(),
            waypoint_distance=(acc["waypoint_distance"][idx] / steps[idx]).tolist(),
            speed=(acc["speed"][idx] / steps[idx]).tolist(),
            total_reward=np.maximum(acc["total_reward"][idx], -1000.0).tolist(),
            timesteps=acc["timesteps"][idx].tolist(),
        )
        record = {}
        for k2, v in results.items():
            record[k2] = v
            record[f"{k2}_mean"] = float(np.mean(v)) if len(v) else 0.0
            record[f"{k2}_std"] = float(np.std(v)) if len(v) else 0.0

        eval_dir = evaluation_dir or os.path.join(self.base_path, "evaluation")
        os.makedirs(eval_dir, exist_ok=True)
        with open(os.path.join(eval_dir, f"{name}.json"), "w") as f:
            json.dump(record, f, indent=2)
        return results

    # ------------------------------------------------------------------
    # trace collection + imitation (reference rl/agents/ppo.py:360-462)
    # ------------------------------------------------------------------
    def collect(self, episodes: int, timesteps: int,
                record_threshold: float = 0.0, traces_dir: str = "traces",
                seed: int = 42) -> int:
        """Collect network-driven traces (reference `PPOAgent.collect`,
        `rl/agents/ppo.py:360-413`): rollouts of the CURRENT policy serialized
        as npz with states/actions/rewards/log_probs/values."""
        env = self.env
        num_envs = min(self.config.num_envs, max(episodes, 1))
        net = self.network

        def run(params, stats, key, consts):
            with env.bind(consts):
                k_r, key = jax.random.split(key)
                states, _ = env.reset_batch(k_r, num_envs)

                def step_fn(carry, _):
                    states, key = carry
                    key, k = jax.random.split(key)
                    obs = env.observe(states)
                    net_in = {f"state_{k2}": v for k2, v in obs.items()}
                    net_in["action"] = states.last_action
                    pred = net.predict(params, stats, net_in, k)
                    from carla_driving_rl_agent_tpu.envs.carla_env import convert_action
                    states, _, reward, term, trunc, info = env.step_batch(
                        states, convert_action(pred["action"]))
                    rec = dict(
                        state_image=(obs["image"] * 255).astype(jnp.uint8),
                        state_road=obs["road"], state_vehicle=obs["vehicle"],
                        state_navigation=obs["navigation"],
                        action=pred["action"], log_prob=pred["log_prob"],
                        value=pred["value"], reward=reward,
                        done=(term | trunc).astype(jnp.float32),
                        speed=info["speed"], similarity=info["similarity"])
                    return (states, key), rec

                _, recs = jax.lax.scan(step_fn, (states, key), None,
                                       length=timesteps)
                return recs

        run_fn = jax.jit(run)
        os.makedirs(traces_dir, exist_ok=True)
        key = jax.random.PRNGKey(seed)
        written = 0
        import time as _time
        while written < episodes:
            key, k = jax.random.split(key)
            recs = jax.device_get(run_fn(self.params, self.stats, k, env.consts))
            for b in range(num_envs):
                if written >= episodes:
                    break
                done = recs["done"][:, b]
                end = int(np.argmax(done)) + 1 if done.any() else timesteps
                if float(recs["reward"][:end, b].sum()) < record_threshold:
                    continue
                trace = {k2: np.asarray(v[:end, b]) for k2, v in recs.items()}
                fname = f"trace-{written}-{_time.strftime('%Y%m%d-%H%M%S')}.npz"
                np.savez_compressed(os.path.join(traces_dir, fname), **trace)
                written += 1
        return written

    def imitate(self, epochs: int = 1, batch_size: Optional[int] = None,
                traces_dir: str = "traces", shuffle_data: bool = True,
                seed: Optional[int] = None) -> list:
        """Learn from recorded traces (reference `PPOAgent.imitate`,
        `rl/agents/ppo.py:415-462`): per trace batch, recompute
        returns/advantages from the stored rewards+values, then run the
        policy and value objectives.  Traces without log_prob/value (expert
        traces from CARLACollectWrapper) get them from the current network
        (behavior-cloning-flavoured PPO)."""
        from carla_driving_rl_agent_tpu.utils import traces as trace_io
        cfg = self.config
        batch_size = batch_size or cfg.batch_size
        losses = []

        @jax.jit
        def imitation_update(params, stats, opt_state, batch, hyper, key):
            def p_loss(pd):
                return self._policy_loss(pd["policy"], pd["dynamics"], stats,
                                         batch, hyper, key)
            (pl, paux), pg = jax.value_and_grad(p_loss, has_aux=True)(
                dict(policy=params["policy"], dynamics=params["dynamics"]))

            def v_loss(vd):
                return self._value_loss(vd["value"], vd["dynamics"], stats, batch)
            (vl, vaux), vg = jax.value_and_grad(v_loss, has_aux=True)(
                dict(value=params["value"], dynamics=params["dynamics"]))

            new_params = dict(params, old_policy=params["policy"])
            up, op = self.policy_opt.update(
                um.clip_gradients(pg["policy"], cfg.clip_norm[0]),
                opt_state["policy"], params["policy"])
            new_params["policy"] = optax.apply_updates(params["policy"], up)
            uv, ov = self.value_opt.update(
                um.clip_gradients(vg["value"], cfg.clip_norm[1]),
                opt_state["value"], params["value"])
            new_params["value"] = optax.apply_updates(params["value"], uv)
            g_dyn = jax.tree_util.tree_map(
                lambda a, b: a + b, pg["dynamics"], vg["dynamics"])
            ud, od = self.dynamics_opt.update(
                um.clip_gradients(g_dyn, cfg.clip_norm[2]),
                opt_state["dynamics"], params["dynamics"])
            new_params["dynamics"] = optax.apply_updates(params["dynamics"], ud)
            new_stats = dict(stats, dynamics=vaux["d_stats"],
                             policy=paux["p_stats"], value=vaux["v_stats"])
            new_opt = dict(policy=op, value=ov, dynamics=od)
            return new_params, new_stats, new_opt, pl, vl

        @jax.jit
        def expert_log_prob(params, stats, obs):
            # log-prob of the expert action under the current (old) policy;
            # jitted — an eager forward costs ~25 ms/op over the remote
            # tunnel, which would dominate the whole imitation run
            feat, _ = self.network.dynamics_apply(params, stats, obs,
                                                  training=False)
            pol, _ = self.network.policy_apply(params, stats, feat,
                                               training=False, old=True)
            a01 = (obs["action"] + 1.0) / 2.0
            return pol["dist"].log_prob(a01)

        rng = np.random.default_rng(seed)
        for epoch in range(epochs):
            for trace in trace_io.load_traces(traces_dir, shuffle=True, seed=seed):
                n = len(trace["reward"])
                if n < 4:
                    continue
                rewards = jnp.asarray(trace["reward"])
                if "value" in trace:
                    values = um.compose_number(jnp.asarray(trace["value"][:, 0]),
                                               jnp.asarray(trace["value"][:, 1]))
                else:
                    values = jnp.zeros(n)
                dones = jnp.asarray(trace.get("done", np.zeros(n)))
                adv, _ = um.batched_gae(rewards[:, None], values[:, None],
                                        dones[:, None], jnp.zeros(1),
                                        cfg.gamma, cfg.lambda_)
                adv = um.sp_norm(adv[:, 0]) * float(self.adv_scale())
                rets = um.discount_cumsum(rewards, cfg.gamma)
                rb, re = um.decompose_number(rets)
                returns_be = jnp.stack([rb, re], axis=-1)

                order = rng.permutation(n) if shuffle_data else np.arange(n)
                for i0 in range(0, n - batch_size + 1, batch_size):
                    idx = order[i0:i0 + batch_size]
                    obs = dict(
                        state_image=jnp.asarray(
                            trace["state_image"][idx], jnp.float32) / 255.0,
                        state_road=jnp.asarray(trace["state_road"][idx]),
                        state_vehicle=jnp.asarray(trace["state_vehicle"][idx]),
                        state_navigation=jnp.asarray(trace["state_navigation"][idx]),
                        action=jnp.asarray(trace["action"][idx]))
                    if "log_prob" in trace:
                        log_prob = jnp.asarray(trace["log_prob"][idx])
                    else:
                        log_prob = expert_log_prob(self.params, self.stats, obs)
                    speed = jnp.asarray(
                        trace.get("speed", np.zeros(n))[idx]) / 100.0
                    similarity = jnp.asarray(
                        trace.get("similarity", np.zeros(n))[idx])
                    batch = dict(obs=obs, advantages=adv[idx],
                                 returns=returns_be[idx], log_prob=log_prob,
                                 speed=speed, similarity=similarity)
                    self._key, k = jax.random.split(self._key)
                    out = imitation_update(self.params, self.stats,
                                           self.opt_state, batch,
                                           self._hyper(), k)
                    self.params, self.stats, self.opt_state, pl, vl = out
                    losses.append((float(pl), float(vl)))
        return losses

    # alias used by the Stage orchestrator (reference core/learning.py:180-181)
    imitation_learning = imitate

    # ------------------------------------------------------------------
    # checkpointing (reference core/networks.py:297-310, rl/agents/ppo.py:601-616)
    # ------------------------------------------------------------------
    def save(self, path: Optional[str] = None):
        from carla_driving_rl_agent_tpu.utils import checkpoint as ckpt
        path = path or self.base_path
        ckpt.save_agent(path, params=self.params, stats=self.stats,
                        opt_state=self.opt_state, config=self.serialize_config())

    def load(self, path: Optional[str] = None, full: bool = True):
        """full=False restores only the dynamics backbone — the curriculum's
        stage-transfer mechanism (reference `core/networks.py:302-310`)."""
        from carla_driving_rl_agent_tpu.utils import checkpoint as ckpt
        path = path or self.base_path
        loaded = ckpt.load_agent(path, params=self.params, stats=self.stats,
                                 opt_state=self.opt_state)
        if full:
            self.params = loaded["params"]
            self.params = self.network.update_old_policy(self.params)
            self.stats = loaded["stats"]
            if loaded.get("opt_state") is not None:
                self.opt_state = loaded["opt_state"]
        else:
            self.params = dict(self.params, dynamics=loaded["params"]["dynamics"])
            self.stats = dict(self.stats, dynamics=loaded["stats"]["dynamics"])
        cfg = loaded.get("config", {})
        self.load_config(cfg)

    def serialize_config(self) -> dict:
        return dict(policy_lr=self.policy_lr.serialize(),
                    value_lr=self.value_lr.serialize(),
                    dynamics_lr=self.dynamics_lr.serialize(),
                    adv_scale=self.adv_scale.serialize(),
                    entropy_strength=self.entropy_strength.serialize(),
                    clip_ratio=self.clip_ratio.serialize(),
                    update_step=self.update_step,
                    # structural: consumed at agent CONSTRUCTION by eval/load
                    # call sites (curriculum/stages._eval_stage), not by
                    # load_config — the network is already built by then
                    network=self.config.network or {})

    def load_config(self, config: dict):
        self.policy_lr.load(config.get("policy_lr", {}))
        self.value_lr.load(config.get("value_lr", {}))
        self.dynamics_lr.load(config.get("dynamics_lr", {}))
        self.adv_scale.load(config.get("adv_scale", {}))
        self.entropy_strength.load(config.get("entropy_strength", {}))
        self.clip_ratio.load(config.get("clip_ratio", {}))
        self.update_step = int(config.get("update_step", self.update_step))
