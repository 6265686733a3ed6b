"""Generic PPO agent for simple functional envs (flat Box/Discrete spaces).

Reference: `rl/agents/ppo.py` (PPOAgent): the algorithm the CARLA agent
specializes.  Differences from CARLAgent: single policy/value optimizer pair,
no shared dynamics backbone or aux losses, and the PPO objective computes the
new log-prob on the STORED rollout actions (reference `rl/agents/ppo.py:
309-358`; the CARLA variant resamples — see agents/carla_agent.py).

The rollout+update is one jitted program over vmapped envs (the TPU-new
capability replacing the reference's sequential single-env loop `:497`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from carla_driving_rl_agent_tpu.agents.base import Agent
from carla_driving_rl_agent_tpu.models.networks import PPONetwork
from carla_driving_rl_agent_tpu.utils import math as um
from carla_driving_rl_agent_tpu.utils.optimizers import get_optimizer_by_name, set_learning_rate
from carla_driving_rl_agent_tpu.utils.schedules import DynamicParameter
from carla_driving_rl_agent_tpu.envs import spaces


@dataclass
class PPOConfig:
    num_envs: int = 16
    rollout_steps: int = 128
    batch_size: int = 64
    gamma: float = 0.99
    lambda_: float = 0.95
    policy_lr: Any = 1e-3
    value_lr: Any = 3e-4
    clip_ratio: Any = 0.2
    entropy_regularization: Any = 0.0
    advantage_scale: Any = 2.0
    optimization_steps: Tuple[int, int] = (1, 1)
    clip_norm: Tuple[Optional[float], Optional[float]] = (1.0, 1.0)
    polyak: float = 1.0
    optimizer: str = "adam"
    repeat_action: int = 1
    seed: int = 42
    network: dict = field(default_factory=dict)


class PPOAgent(Agent):
    def __init__(self, env, config: PPOConfig = None, name: str = "ppo-agent",
                 **kwargs):
        cfg = config or PPOConfig()
        super().__init__(env, name=name, batch_size=cfg.batch_size,
                         seed=cfg.seed, **kwargs)
        self.config = cfg

        # action-space adapter (reference rl/agents/ppo.py:148-181)
        a_space = env.action_space
        if isinstance(a_space, spaces.Box):
            self.num_actions = int(np.prod(a_space.shape))
            if a_space.is_bounded():
                self.distribution = "beta"
                self._low = jnp.asarray(a_space.low)
                self._range = jnp.asarray(a_space.high - a_space.low)
            else:
                self.distribution = "gaussian"
            num_classes = 2
        elif isinstance(a_space, spaces.MultiDiscrete):
            self.distribution = "categorical"
            assert np.all(a_space.nvec == a_space.nvec[0])
            self.num_actions = int(a_space.nvec.shape[0])
            num_classes = int(a_space.nvec[0]) + 1
        else:
            self.distribution = "categorical"
            self.num_actions = 1
            num_classes = int(a_space.n)

        net_kwargs = dict(cfg.network or {})
        self.network = PPONetwork(num_actions=self.num_actions,
                                  distribution=self.distribution,
                                  num_classes=num_classes,
                                  policy=net_kwargs.get("policy"),
                                  value=net_kwargs.get("value"),
                                  exponent_scale=net_kwargs.get("exponent_scale", 6.0),
                                  components=net_kwargs.get("components", 1))

        self.policy_lr = DynamicParameter.create(cfg.policy_lr)
        self.value_lr = DynamicParameter.create(cfg.value_lr)
        self.clip_ratio = DynamicParameter.create(cfg.clip_ratio)
        self.entropy_strength = DynamicParameter.create(cfg.entropy_regularization)
        self.adv_scale = DynamicParameter.create(cfg.advantage_scale)

        obs_dim = int(np.prod(env.observation_space.shape))
        self.params = self.network.init(self.next_key(), jnp.zeros((1, obs_dim)))
        self.policy_opt = get_optimizer_by_name(cfg.optimizer, self.policy_lr())
        self.value_opt = get_optimizer_by_name(cfg.optimizer, self.value_lr())
        self.opt_state = dict(policy=self.policy_opt.init(self.params["policy"]),
                              value=self.value_opt.init(self.params["value"]))
        self._train_fn = None
        self.update_step = 0

    def convert_action(self, action01: jax.Array) -> jax.Array:
        """Rescale distribution samples into the env's range
        (reference `rl/agents/ppo.py:158-181`)."""
        if self.distribution == "beta":
            return action01 * self._range + self._low
        return action01

    # ------------------------------------------------------------------
    def _build_train_fn(self):
        cfg = self.config
        env = self.env
        net = self.network
        n_samples = cfg.rollout_steps * cfg.num_envs
        n_minibatches = max(1, n_samples // cfg.batch_size)

        def policy_objective(p_params, batch, hyper):
            """PPO-clip on stored actions (reference rl/agents/ppo.py:309-358)."""
            dist = net.policy_model.apply({"params": p_params}, batch["obs"])
            actions = dist.clip(batch["action"])
            new_log_prob = dist.log_prob(actions)
            if new_log_prob.ndim == 1:
                new_log_prob = new_log_prob[:, None]
            entropy = jnp.mean(dist.entropy())
            kl = jnp.mean(um.kl_divergence(batch["log_prob"], new_log_prob))
            ratio = jnp.mean(jnp.exp(new_log_prob - batch["log_prob"]), axis=1)
            adv = batch["advantages"]
            clip_v = hyper["clip_ratio"]
            min_adv = jnp.where(adv > 0, (1 + clip_v) * adv, (1 - clip_v) * adv)
            loss = -jnp.mean(jnp.minimum(ratio * adv, min_adv))
            total = loss - hyper["entropy"] * entropy
            return total, dict(entropy=entropy, kl=kl, ratio=jnp.mean(ratio))

        def value_objective(v_params, batch):
            """0.5 * (0.25*base MSE + exp MSE / exp_scale^2)
            (reference rl/agents/ppo.py:298-307)."""
            values = net.value_model.apply({"params": v_params}, batch["obs"])
            base_loss = jnp.mean(jnp.square(batch["returns"][:, 0] - values[:, 0]))
            exp_loss = jnp.mean(jnp.square(batch["returns"][:, 1] - values[:, 1]))
            return 0.5 * (0.25 * base_loss + exp_loss / (net.exp_scale ** 2))

        def train_iteration(params, opt_state, env_states, key, hyper):
            key, k_roll, k_perm = jax.random.split(key, 3)

            def rollout_step(carry, _):
                states, key = carry
                key, k = jax.random.split(key)
                # functional envs expose _obs(state) for rollout scans
                obs = jax.vmap(env._obs)(states)
                pred = net.predict(params, obs, k)
                action_env = self.convert_action(pred["action"])
                states, obs2, reward, term, trunc, info = jax.vmap(env.step)(
                    states, action_env)
                rec = dict(obs=obs, action=pred["action"], log_prob=pred["log_prob"],
                           value=pred["value"], reward=reward,
                           done=(term | trunc).astype(jnp.float32),
                           trunc=trunc.astype(jnp.float32))
                return (states, key), rec

            (env_states, _), traj = jax.lax.scan(
                rollout_step, (env_states, k_roll), None, length=cfg.rollout_steps)

            values = um.compose_number(traj["value"][..., 0], traj["value"][..., 1])
            final_obs = jax.vmap(env._obs)(env_states)
            vlast = net.value(params, final_obs)
            bootstrap = um.compose_number(vlast[:, 0], vlast[:, 1])
            rewards = traj["reward"] + cfg.gamma * traj["trunc"] * values
            adv, _ = um.batched_gae(rewards, values, traj["done"], bootstrap,
                                    cfg.gamma, cfg.lambda_)
            advantages = um.sp_norm(adv) * hyper["adv_scale"]

            def ret_scan(carry, xs):
                r, d = xs
                ret = r + cfg.gamma * (1 - d) * carry
                return ret, ret

            _, returns_raw = jax.lax.scan(ret_scan, bootstrap,
                                          (rewards, traj["done"]), reverse=True)
            rb, re = um.decompose_number(returns_raw)

            S, B = cfg.rollout_steps, cfg.num_envs
            flat = lambda x: x.reshape((S * B,) + x.shape[2:])
            data = dict(obs=flat(traj["obs"]), action=flat(traj["action"]),
                        log_prob=flat(traj["log_prob"]),
                        advantages=flat(advantages),
                        returns=flat(jnp.stack([rb, re], axis=-1)))
            perm = jax.random.permutation(k_perm, S * B)

            def policy_mb(carry, mb):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, mb * cfg.batch_size,
                                                   cfg.batch_size)
                batch = {k: v[idx] for k, v in data.items()}
                (loss, aux), g = jax.value_and_grad(policy_objective, has_aux=True)(
                    params["policy"], batch, hyper)
                if cfg.clip_norm[0]:
                    g = um.clip_gradients(g, cfg.clip_norm[0])
                new_params = dict(params, old_policy=params["policy"])
                up, op = self.policy_opt.update(g, opt_state["policy"],
                                                params["policy"])
                new_policy = optax.apply_updates(params["policy"], up)
                if cfg.polyak < 1.0:
                    new_policy = um.polyak_average(new_policy, params["policy"],
                                                   cfg.polyak)
                new_params["policy"] = new_policy
                return (new_params, dict(opt_state, policy=op)), dict(
                    loss_policy=loss, **aux)

            mb_ids = jnp.tile(jnp.arange(n_minibatches), cfg.optimization_steps[0])
            (params, opt_state), p_m = jax.lax.scan(policy_mb, (params, opt_state),
                                                    mb_ids)

            def value_mb(carry, mb):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, mb * cfg.batch_size,
                                                   cfg.batch_size)
                batch = {k: v[idx] for k, v in data.items()}
                loss, g = jax.value_and_grad(value_objective)(params["value"], batch)
                if cfg.clip_norm[1]:
                    g = um.clip_gradients(g, cfg.clip_norm[1])
                uv, ov = self.value_opt.update(g, opt_state["value"], params["value"])
                new_value = optax.apply_updates(params["value"], uv)
                # the reference applies polyak to BOTH nets (rl/agents/ppo.py:264-275)
                if cfg.polyak < 1.0:
                    new_value = um.polyak_average(new_value, params["value"],
                                                  cfg.polyak)
                new_params = dict(params, value=new_value)
                return (new_params, dict(opt_state, value=ov)), dict(loss_value=loss)

            (params, opt_state), v_m = jax.lax.scan(value_mb, (params, opt_state),
                                                    mb_ids)

            metrics = dict(reward_mean=jnp.mean(traj["reward"]),
                           episode_done=jnp.sum(traj["done"]),
                           loss_policy=jnp.mean(p_m["loss_policy"]),
                           loss_value=jnp.mean(v_m["loss_value"]),
                           entropy=jnp.mean(p_m["entropy"]),
                           kl=jnp.mean(p_m["kl"]),
                           ratio=jnp.mean(p_m["ratio"]))
            return params, opt_state, env_states, metrics

        return jax.jit(train_iteration, donate_argnums=(1, 2))

    def learn(self, num_updates: int = 10, env_states=None, callback=None):
        cfg = self.config
        if self._train_fn is None:
            self._train_fn = self._build_train_fn()
        if env_states is None:
            keys = jax.random.split(self.next_key(), cfg.num_envs)
            env_states, _ = jax.vmap(self.env.reset)(keys)
        history = []
        for _ in range(num_updates):
            set_learning_rate(self.opt_state["policy"], self.policy_lr())
            set_learning_rate(self.opt_state["value"], self.value_lr())
            hyper = dict(clip_ratio=jnp.float32(self.clip_ratio()),
                         entropy=jnp.float32(self.entropy_strength()),
                         adv_scale=jnp.float32(self.adv_scale()))
            self.params, self.opt_state, env_states, metrics = self._train_fn(
                self.params, self.opt_state, env_states, self.next_key(), hyper)
            self.update_step += 1
            for p in (self.policy_lr, self.value_lr, self.clip_ratio,
                      self.entropy_strength, self.adv_scale):
                p.on_episode()
            m = {k: float(v) for k, v in metrics.items()}
            self.log(**m)
            self.write_summaries()
            history.append(m)
            if callback:
                callback(self.update_step, m)
        return env_states, history

    def save(self):
        from carla_driving_rl_agent_tpu.utils import checkpoint as ckpt
        ckpt.save_agent(self.base_path, params=self.params, stats={},
                        opt_state=self.opt_state,
                        config=dict(policy_lr=self.policy_lr.serialize(),
                                    value_lr=self.value_lr.serialize(),
                                    clip_ratio=self.clip_ratio.serialize(),
                                    entropy_strength=self.entropy_strength.serialize(),
                                    adv_scale=self.adv_scale.serialize()))

    def load(self):
        from carla_driving_rl_agent_tpu.utils import checkpoint as ckpt
        loaded = ckpt.load_agent(self.base_path, self.params, {}, self.opt_state)
        self.params = loaded["params"]
        if loaded.get("opt_state") is not None:
            self.opt_state = loaded["opt_state"]
