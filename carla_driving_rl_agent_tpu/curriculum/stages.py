"""Curriculum learning stages s1..s5 and the Stage orchestrator.

Reference: `core/learning.py` — `Stage` (`:68-189`), stage factories
(`:311-498`), `define_agent`/`define_env` defaults (`:53-61`),
`sample_origins` (`:19-33`).

Stage progression (hyper-parameters preserved from the reference factories):
  s1: 10 seed-fixed origins, Town03, no traffic, reverse disabled   (:311-339)
  s2: 50 origins + 50 pedestrians, backbone loaded from s1          (:342-369)
  s3: + 50 vehicles + 7 random "light" weathers                     (:372-409)
  s4: + optional random towns + data augmentation                   (:412-450)
  s5: named town, traffic preset no/regular/dense                   (:453-498)

Parallelism mapping (TPU-new): the reference runs `episodes` sequential
512-step episodes on ONE env per epoch; here an epoch runs `episodes`
updates, each consuming a `timesteps`-step rollout from `num_envs` lock-step
worlds — strictly more data per update at equal wall-clock structure.
"""

from __future__ import annotations

import os
import random as py_random
from typing import List, Optional, Union

import numpy as np

from carla_driving_rl_agent_tpu.agents.carla_agent import CARLAgent, CARLAgentConfig
from carla_driving_rl_agent_tpu.envs.carla_env import CARLAEnv, CARLAEnvConfig
from carla_driving_rl_agent_tpu.envs.town import get_town
from carla_driving_rl_agent_tpu.envs.world import WorldParams
from carla_driving_rl_agent_tpu.envs.weather import (
    TRAIN_WEATHERS, TEST_WEATHERS, weather_ids)
from carla_driving_rl_agent_tpu.utils.checkpoint import copy_folder

DEFAULT_TOWN = "Town03"   # the reference trains on Town03 only (README.md:112)


def sample_origins(town: str = DEFAULT_TOWN, amount: int = 1, seed=None) -> List[int]:
    """Seed-fixed spawn-point indices (reference `core/learning.py:19-33`
    shuffles `map.get_spawn_points()` under a seed)."""
    assert amount > 0
    rng = py_random.Random(seed)
    n = len(get_town(town).spawn_wp)
    points = list(range(n))
    rng.shuffle(points)
    return points[:amount]


def define_agent(batch_size: int = 128, num_envs: int = 32, rollout_steps: int = 128,
                 **kwargs) -> dict:
    """Agent kwargs defaults (reference `core/learning.py:53-55`)."""
    return dict(batch_size=batch_size, num_envs=num_envs,
                rollout_steps=rollout_steps, **kwargs)


def define_env(image_shape=(90, 120, 3), town: Union[None, str] = DEFAULT_TOWN,
               **kwargs) -> dict:
    """Env kwargs defaults (reference `core/learning.py:58-61`; rendering/
    pygame window options have no TPU analogue)."""
    return dict(town=town or DEFAULT_TOWN, image_shape=image_shape, **kwargs)


def build_env(town: str = DEFAULT_TOWN, image_shape=(90, 120, 3),
              random_weathers: Optional[List[str]] = None,
              random_towns: Optional[List[str]] = None,
              spawn: Optional[dict] = None,
              origins: Optional[List[int]] = None,
              throttle_as_desired_speed: bool = True,
              disable_reverse: bool = True,
              time_horizon: int = 4, past_obs_freq: int = 4,
              max_timesteps: int = 512, num_routes: int = 128,
              render_mode: str = "pallas", stack_depth: bool = False,
              off_road_penalty_divisor: float = 100.0,
              reward_speed_cap: float = 150.0,
              speed_over_cap_penalty: float = 0.0,
              lateral_obs: bool = False,
              seed: int = 42, **_ignored) -> CARLAEnv:
    """Build a CARLAEnv from stage-style kwargs."""
    spawn = spawn or {}
    nv = int(spawn.get("vehicles", 0) or 0)
    np_ = int(spawn.get("pedestrians", 0) or 0)
    towns = tuple(random_towns) if random_towns else (town,)
    weathers = random_weathers or ["ClearNoon"]
    params = WorldParams(
        town_names=towns, random_towns=bool(random_towns),
        num_vehicles=nv, num_pedestrians=np_,
        v_max=max(nv, 1), p_max=max(np_, 1),
        weather_ids=tuple(int(i) for i in weather_ids(weathers)),
        throttle_as_desired_speed=throttle_as_desired_speed,
        disable_reverse=disable_reverse,
        max_timesteps=max_timesteps, num_routes=num_routes,
        origin_spawns=tuple(origins) if origins else None,
        off_road_penalty_divisor=off_road_penalty_divisor,
        reward_speed_cap=reward_speed_cap,
        speed_over_cap_penalty=speed_over_cap_penalty,
        lateral_obs=lateral_obs,
        seed=seed)
    return CARLAEnv(CARLAEnvConfig(
        world=params, image_height=image_shape[0], image_width=image_shape[1],
        stack_depth=stack_depth, render_mode=render_mode,
        time_horizon=time_horizon, past_obs_freq=past_obs_freq))


class Stage:
    """A curriculum learning stage (reference `core/learning.py:68-189`)."""

    def __init__(self, agent: dict, environment: dict, learning: dict,
                 representation: dict = None, collect: dict = None,
                 imitation: dict = None, name: str = "Stage"):
        assert isinstance(agent, dict) and isinstance(environment, dict)
        assert isinstance(learning, dict) and isinstance(learning.get("agent"), dict)
        self.agent_args = dict(agent)
        self.env_args = dict(environment)
        self.learn_args = dict(learning)
        self.repr_args = representation
        self.collect_args = collect
        self.imitation_args = imitation
        self.should_imitate = isinstance(imitation, dict)
        self.should_collect = isinstance(collect, dict)
        self.name = name
        self.agent: Optional[CARLAgent] = None
        self.env: Optional[CARLAEnv] = None
        self._env_states = None

    def init(self):
        if self.env is None:
            self.env = build_env(**self.env_args)
            args = dict(self.agent_args)
            name = args.pop("name", self.name)
            weights_dir = args.pop("weights_dir", "weights")
            load = args.pop("load", False)
            load_full = args.pop("load_full", True)
            seed = args.pop("seed", 42)
            mesh = args.pop("mesh", None)
            log_mode = args.pop("log_mode", "summary")
            cfg = CARLAgentConfig(seed=seed, **{
                k: v for k, v in args.items()
                if k in CARLAgentConfig.__dataclass_fields__})
            self.agent = CARLAgent(self.env, cfg, name=name,
                                   weights_dir=weights_dir, mesh=mesh,
                                   log_mode=log_mode)
            if load and os.path.exists(os.path.join(self.agent.base_path,
                                                    "params.msgpack")):
                self.agent.load(full=load_full)

    def run2(self, epochs: int, copy_weights: bool = True,
             epoch_offset: int = 0) -> "Stage":
        """(imitation ->) RL per epoch + per-epoch weight snapshot
        (reference `core/learning.py:144-161`)."""
        assert epochs > 0
        self.init()
        learn = self.learn_args["agent"]
        updates = int(learn.get("episodes", 5))
        for epoch in range(epochs):
            if self.should_imitate:
                self.imitation_learning()
            self._env_states, history = self.agent.learn(
                num_updates=updates, env_states=self._env_states)
            if learn.get("save_every"):
                self.agent.save()
            if copy_weights:
                self.agent.save()
                copy_folder(self.agent.base_path,
                            f"{self.agent.base_path}-{epoch + epoch_offset}")
        self.cleanup(close=False)
        return self

    def run(self, epochs: int, collect: Union[bool, int] = True,
            representation: bool = True) -> "Stage":
        """collect -> (representation) -> RL per epoch
        (reference `core/learning.py:119-142`; representation learning is a
        declared-but-unimplemented hook in the reference too)."""
        assert epochs > 0
        self.init()
        if (collect is False) or (not self.should_collect):
            collect_left = 0
        elif collect is True:
            collect_left = epochs + 1
        else:
            collect_left = int(collect)
        for _ in range(epochs):
            if collect_left > 0:
                self.collect()
                collect_left -= 1
            if self.repr_args and representation:
                self.representation_learning()
            self.reinforcement_learning()
        self.cleanup(close=False)
        return self

    def representation_learning(self):
        raise NotImplementedError(
            "representation learning is a hook in the reference as well "
            "(Stage.run calls agent.learn_representation, which CARLAgent "
            "never defines); use imitation_learning instead")

    def evaluate(self, **kwargs) -> "Stage":
        self.init()
        self.agent.evaluate(**kwargs)
        return self

    def record(self, **kwargs) -> "Stage":
        self.init()
        from carla_driving_rl_agent_tpu.envs.wrappers import record_episodes
        record_episodes(self.agent, **kwargs)
        return self

    def collect(self, **kwargs):
        self.init()
        from carla_driving_rl_agent_tpu.envs.wrappers import CARLACollectWrapper
        wrapper = CARLACollectWrapper(self.env, **(self.collect_args or {}))
        wrapper.collect(**self.learn_args.get("collect", kwargs))

    def imitation_learning(self):
        self.init()
        self.agent.imitation_learning(**(self.imitation_args or {}))

    def reinforcement_learning(self):
        self.init()
        learn = self.learn_args["agent"]
        self._env_states, _ = self.agent.learn(
            num_updates=int(learn.get("episodes", 5)),
            env_states=self._env_states)

    def cleanup(self, close: bool = True):
        if close:
            self.env = None
            self.agent = None
            self._env_states = None


# -------------------------------------------------------------------------
# Stage factories (hyper-parameters from reference core/learning.py:311-498)
# -------------------------------------------------------------------------

def _stage_common(kwargs: dict) -> dict:
    return dict(
        policy_lr=kwargs.pop("policy_lr", 3e-4),
        value_lr=kwargs.pop("value_lr", 3e-4),
        dynamics_lr=kwargs.pop("dynamics_lr", 3e-4),
        clip_ratio=kwargs.pop("clip_ratio", 0.2),
        entropy_regularization=kwargs.pop("entropy_regularization", 0.1),
        advantage_scale=2.0, clip_norm=(1.0, 1.0, 1.0), update_dynamics=True)


def stage_s1(episodes: int, timesteps: int, batch_size: int, save_every=None,
             seed: int = 42, stage_name: str = "stage-s1", num_envs: int = 32,
             town: str = DEFAULT_TOWN,
             env_overrides: Optional[dict] = None, **kwargs) -> Stage:
    """Stage-1: 10 seed-fixed origins, no dynamic objects
    (reference `core/learning.py:311-339`).
    `env_overrides`: extra define_env kwargs (e.g. the safety-shaping knobs
    of `main.py --safe`), same contract as stage_s5."""
    hp = _stage_common(kwargs)
    agent = define_agent(batch_size=batch_size, num_envs=num_envs,
                         rollout_steps=kwargs.pop("rollout_steps",
                                                 min(timesteps, 128)),
                         name=stage_name,
                         seed=seed, aug_intensity=kwargs.pop("aug_intensity", 0.0), **hp, **kwargs)
    env = define_env(town=town, origins=sample_origins(town, amount=10, seed=seed),
                     throttle_as_desired_speed=True, disable_reverse=True,
                     max_timesteps=timesteps, seed=seed,
                     **(env_overrides or {}))
    return Stage(agent=agent, environment=env, name=stage_name,
                 learning=dict(agent=dict(episodes=episodes, timesteps=timesteps,
                                          save_every=save_every)))


def stage_s2(episodes: int, timesteps: int, batch_size: int, save_every=None,
             seed: int = 42, stage_name: str = "stage-s2", num_envs: int = 32,
             town: str = DEFAULT_TOWN,
             env_overrides: Optional[dict] = None, **kwargs) -> Stage:
    """Stage-2: 50 random origins + 50 pedestrians, weights loaded
    (reference `core/learning.py:342-369`)."""
    hp = _stage_common(kwargs)
    agent = define_agent(batch_size=batch_size, num_envs=num_envs,
                         rollout_steps=kwargs.pop("rollout_steps",
                                                 min(timesteps, 128)),
                         name=stage_name,
                         seed=seed, load=True, load_full=True,
                         aug_intensity=kwargs.pop("aug_intensity", 0.0), **hp, **kwargs)
    env = define_env(town=town, origins=sample_origins(town, amount=50, seed=seed),
                     spawn=dict(vehicles=0, pedestrians=50),
                     throttle_as_desired_speed=True, disable_reverse=True,
                     max_timesteps=timesteps, seed=seed,
                     **(env_overrides or {}))
    return Stage(agent=agent, environment=env, name=stage_name,
                 learning=dict(agent=dict(episodes=episodes, timesteps=timesteps,
                                          save_every=save_every)))


def stage_s3(episodes: int, timesteps: int, batch_size: int, save_every=None,
             seed: int = 42, stage_name: str = "stage-s3", num_envs: int = 32,
             town: str = DEFAULT_TOWN,
             env_overrides: Optional[dict] = None, **kwargs) -> Stage:
    """Stage-3: + 50 vehicles + random light weather
    (reference `core/learning.py:372-409`)."""
    hp = _stage_common(kwargs)
    agent = define_agent(batch_size=batch_size, num_envs=num_envs,
                         rollout_steps=kwargs.pop("rollout_steps",
                                                 min(timesteps, 128)),
                         name=stage_name,
                         seed=seed, load=True, load_full=True,
                         aug_intensity=kwargs.pop("aug_intensity", 0.0), **hp, **kwargs)
    env = define_env(town=town, random_weathers=list(TRAIN_WEATHERS),
                     spawn=dict(vehicles=50, pedestrians=50),
                     throttle_as_desired_speed=True, disable_reverse=True,
                     max_timesteps=timesteps, seed=seed,
                     **(env_overrides or {}))
    return Stage(agent=agent, environment=env, name=stage_name,
                 learning=dict(agent=dict(episodes=episodes, timesteps=timesteps,
                                          save_every=save_every)))


def stage_s4(episodes: int, timesteps: int, batch_size: int, towns=None,
             save_every=None, seed: int = 42, stage_name: str = "stage-s4",
             num_envs: int = 32, town: str = DEFAULT_TOWN,
             env_overrides: Optional[dict] = None, **kwargs) -> Stage:
    """Stage-4: + optional random towns + data augmentation
    (reference `core/learning.py:412-450`)."""
    hp = _stage_common(kwargs)
    agent = define_agent(batch_size=batch_size, num_envs=num_envs,
                         rollout_steps=kwargs.pop("rollout_steps",
                                                 min(timesteps, 128)),
                         name=stage_name,
                         seed=seed, load=True, load_full=True,
                         aug_intensity=kwargs.pop("aug_intensity", 1.0), **hp, **kwargs)
    env = define_env(town=town, random_towns=towns,
                     random_weathers=list(TRAIN_WEATHERS),
                     spawn=dict(vehicles=50, pedestrians=50),
                     throttle_as_desired_speed=True, disable_reverse=True,
                     max_timesteps=timesteps, seed=seed,
                     **(env_overrides or {}))
    return Stage(agent=agent, environment=env, name=stage_name,
                 learning=dict(agent=dict(episodes=episodes, timesteps=timesteps,
                                          save_every=save_every)))


TRAFFIC_SPECS = dict(no=None,
                     regular=dict(vehicles=50, pedestrians=50),
                     dense=dict(vehicles=100, pedestrians=200))


def stage_s5(episodes: int, timesteps: int, batch_size: int, town: str,
             save_every=None, seed: int = 42, stage_name: str = "stage-s5",
             weather=None, traffic: str = "dense", num_envs: int = 32,
             env_overrides: Optional[dict] = None, **kwargs) -> Stage:
    """Stage-5: named town + traffic preset no/regular/dense
    (reference `core/learning.py:453-498`, spec at `:485-487`).
    `env_overrides` are extra define_env kwargs (e.g. the safety-shaping
    knobs of scripts/safety_finetune.py)."""
    assert traffic in TRAFFIC_SPECS
    hp = _stage_common(kwargs)
    aug = kwargs.pop("aug_intensity", 1.0)
    agent = define_agent(batch_size=batch_size, num_envs=num_envs,
                         rollout_steps=kwargs.pop("rollout_steps",
                                                 min(timesteps, 128)),
                         name=stage_name,
                         seed=seed, load=kwargs.pop("load", True), load_full=True,
                         aug_intensity=aug, **hp, **kwargs)
    env = define_env(town=town, random_weathers=weather or list(TRAIN_WEATHERS),
                     spawn=TRAFFIC_SPECS[traffic],
                     throttle_as_desired_speed=True, disable_reverse=True,
                     max_timesteps=timesteps, seed=seed,
                     **(env_overrides or {}))
    return Stage(agent=agent, environment=env, name=stage_name,
                 learning=dict(agent=dict(episodes=episodes, timesteps=timesteps,
                                          save_every=save_every)))


EVAL_TOWNS = ("Town01", "Town02", "Town03", "Town04", "Town05", "Town06",
              "Town07", "Town10")
_EVAL_STAGE_CACHE: dict = {}


def _eval_stage(mode: str, traffic: str, steps: int, trials: int,
                weights: str, num_envs: Optional[int],
                env_overrides: Optional[dict] = None) -> Stage:
    """One multi-town Stage per (mode, traffic) config: the env holds the
    full 8-town bank and the eval program compiles ONCE; scenarios pin the
    town via the traced `select_town` — instead of rebuilding env + program
    for each of the 48 scenarios.  `env_overrides` must match the env the
    checkpoint was TRAINED with when the override is structural (e.g.
    lateral_obs changes the navigation input dim)."""
    key = (mode, traffic, steps, trials, weights, num_envs,
           tuple(sorted((env_overrides or {}).items())))
    if key not in _EVAL_STAGE_CACHE:
        # keep at most one live eval stage: each holds device-resident town
        # banks + a compiled program, and stacking six of them pressures HBM
        for old in list(_EVAL_STAGE_CACHE):
            _EVAL_STAGE_CACHE.pop(old).cleanup()
        weather = list(TRAIN_WEATHERS) if mode == "train" else list(TEST_WEATHERS)
        hp = _stage_common({})
        # structural network spec (e.g. the Beta-head saturation guard) must
        # match the checkpoint it was trained with — read it back from the
        # saved config.json (CARLAgent.serialize_config)
        net_spec = {}
        # resolve against the repo root, not the cwd: a sharp-trained
        # checkpoint (preact_floor guard) evaluated from elsewhere must not
        # silently run the unguarded head (advisor round-1 finding)
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        cfg_path = os.path.join(repo_root, "weights", weights, "config.json")
        if not os.path.exists(cfg_path):
            cfg_path = os.path.join("weights", weights, "config.json")
        if os.path.exists(cfg_path):
            import json as _json
            with open(cfg_path) as f:
                net_spec = _json.load(f).get("network", {}) or {}
        else:
            import warnings
            warnings.warn(
                f"_eval_stage: no config.json under weights/{weights}; "
                f"evaluating with the default network spec — a checkpoint "
                f"trained with structural overrides (e.g. preact_floor) "
                f"would load into the wrong architecture.")
        agent = define_agent(batch_size=64, num_envs=num_envs or max(8, trials),
                             rollout_steps=8, name=weights, load=True,
                             load_full=True, seed=42, aug_intensity=0.0,
                             log_mode=None, network=net_spec, **hp)
        env = define_env(town=EVAL_TOWNS[0], random_towns=list(EVAL_TOWNS),
                         random_weathers=weather, spawn=TRAFFIC_SPECS[traffic],
                         throttle_as_desired_speed=True, disable_reverse=True,
                         max_timesteps=steps, seed=42,
                         **(env_overrides or {}))
        stage = Stage(agent=agent, environment=env, name=weights,
                      learning=dict(agent=dict(episodes=1, timesteps=steps)))
        stage.init()
        _EVAL_STAGE_CACHE[key] = stage
    return _EVAL_STAGE_CACHE[key]


def evaluate(mode: str, town: str, seeds: list, traffic: str, steps: int = 512,
             trials: int = 50, weights: str = "stage-s5",
             num_envs: Optional[int] = None,
             env_overrides: Optional[dict] = None) -> None:
    """The 48-scenario evaluation protocol driver
    (reference `core/learning.py:505-530`): train-mode uses the 7 light
    training weathers, test-mode the 7 held-out presets; per-seed scenario
    JSONs named `{weights}-{mode}-{steps}-{trials}-{town}-{traffic}-{seed}`.
    `env_overrides`: structural env flags the checkpoint was trained with
    (e.g. dict(lateral_obs=True))."""
    stage = _eval_stage(mode, traffic, steps, trials, weights, num_envs,
                        env_overrides)
    stage.env.select_town(town if town in stage.env.params.town_names else None)
    for i, seed in enumerate(seeds):
        stage.evaluate(
            name=f"{weights}-{mode}-{steps}-{trials}-{town}-{traffic}-{seed}",
            timesteps=steps, trials=trials, initial_seed=seed)
    stage.env.select_town(None)
