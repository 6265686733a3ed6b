"""Summary logging, incremental statistics, schedules, optimizers, traces,
and the evaluation aggregator."""

import json
import os

import numpy as np
import pytest

from carla_driving_rl_agent_tpu.utils.schedules import (
    ConstantParameter, DynamicParameter, ExponentialDecay, LinearDecay,
    PolynomialDecay, StepDecay)
from carla_driving_rl_agent_tpu.utils.summary import IncrementalStatistics, Summary


class TestSchedules:
    def test_constant(self):
        p = DynamicParameter.create(0.5)
        assert isinstance(p, ConstantParameter)
        assert p() == 0.5
        p.on_episode()
        assert p() == 0.5

    def test_exponential_decay(self):
        p = ExponentialDecay(initial_value=1.0, decay_steps=10, decay_rate=0.5)
        assert p() == 1.0
        for _ in range(10):
            p.on_episode()
        assert p() == pytest.approx(0.5)

    def test_step_decay_staircase(self):
        p = StepDecay(initial_value=1.0, decay_steps=10, decay_rate=0.1,
                      min_value=1e-6)
        for _ in range(9):
            p.on_episode()
        assert p() == pytest.approx(1.0)
        p.on_episode()
        assert p() == pytest.approx(0.1)

    def test_polynomial_decay(self):
        p = PolynomialDecay(initial_value=1.0, end_value=0.0, decay_steps=10)
        p.step = 5
        assert p() == pytest.approx(0.5)
        p.step = 100
        assert p() == pytest.approx(0.0, abs=1e-9)

    def test_serialize_roundtrip(self):
        p = LinearDecay(initial_value=1.0, end_value=0.1, decay_steps=100)
        for _ in range(7):
            p.on_episode()
        q = LinearDecay(initial_value=1.0, end_value=0.1, decay_steps=100)
        q.load(p.serialize())
        assert q.step == 7 and q() == p()


class TestSummary:
    def test_jsonl_flush(self, tmp_path):
        s = Summary(mode="summary", name="t", log_dir=str(tmp_path))
        s.log(loss=1.0, reward=[1.0, 2.0, 3.0])
        s.log(loss=3.0)
        s.write_summaries()
        lines = open(s._path).read().strip().split("\n")
        rec = json.loads(lines[0])
        assert rec["loss"] == 2.0
        assert rec["reward"] == 2.0

    def test_disabled_mode(self):
        s = Summary(mode=None)
        s.log(x=1)  # no-op
        s.write_summaries()

    def test_key_filter(self, tmp_path):
        s = Summary(mode="summary", name="t", log_dir=str(tmp_path),
                    summary_keys=["a"])
        s.log(a=1.0, b=2.0)
        assert "b" not in s.buffer and "a" in s.buffer


class TestIncrementalStatistics:
    def test_matches_numpy(self, rng):
        x = rng.normal(loc=3.0, scale=2.0, size=500)
        st = IncrementalStatistics()
        for chunk in np.split(x, 10):
            st.update(chunk)
        assert st.mean == pytest.approx(x.mean(), rel=1e-6)
        assert st.std == pytest.approx(x.std(), rel=1e-3)
        normed = st.normalize(x)
        assert abs(np.mean(normed)) < 1e-6


class TestAggregator:
    def test_aggregate_scenarios(self, tmp_path):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "aggregate", os.path.join(os.path.dirname(__file__), "..",
                                      "evaluation", "aggregate.py"))
        agg = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(agg)

        record = {m: [1.0, 2.0] for m in agg.METRICS}
        record["total_reward"] = [-2000.0, 500.0]
        for town in ["Town01", "Town02"]:
            fname = f"stage-s5-train-512-50-{town}-dense-42.json"
            with open(tmp_path / fname, "w") as f:
                json.dump(record, f)
        out = agg.aggregate(str(tmp_path))
        assert "dense-Town01-train" in out
        assert out["dense-Town01-train"]["total_reward"]["mean"] == -250.0  # clipped
        assert "__global__" in out

    def test_weights_filter_excludes_handoff_copies(self, tmp_path):
        """The curriculum hand-off clones whole stage dirs, including old
        evaluation JSONs of the previous stage; aggregate(weights=...) must
        ignore those foreign files."""
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "aggregate", os.path.join(os.path.dirname(__file__), "..",
                                      "evaluation", "aggregate.py"))
        agg = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(agg)

        own = {m: [4.0] for m in agg.METRICS}
        foreign = {m: [0.0] for m in agg.METRICS}
        with open(tmp_path / "stage-s5-train-512-50-Town01-no-42.json", "w") as f:
            json.dump(own, f)
        with open(tmp_path / "stage-s1-train-512-24-Town01-no-42.json", "w") as f:
            json.dump(foreign, f)
        out = agg.aggregate(str(tmp_path), weights="stage-s5")
        assert out["no-Town01-train"]["similarity"]["mean"] == 4.0
        unfiltered = agg.aggregate(str(tmp_path))
        assert unfiltered["no-Town01-train"]["similarity"]["mean"] == 2.0


class TestSummaryHistogramsImages:
    def test_histogram_and_image_routing(self, tmp_path):
        """'weight-'/'bias-' keys -> decile histograms; 'image_' keys -> PNG
        files (reference rl/utils.py:631-659 routing)."""
        import json
        import numpy as np
        from carla_driving_rl_agent_tpu.utils.summary import Summary
        s = Summary(mode="summary", name="t", log_dir=str(tmp_path))
        s.log(**{"weight-policy/w0": np.random.default_rng(0).normal(size=256)})
        s.log(image_obs=np.zeros((2, 8, 8, 3), np.uint8))
        s.log(loss=1.5)
        s.write_summaries()
        rec = json.loads(open(s._path).read().splitlines()[0])
        h = rec["weight-policy/w0_hist"]
        assert len(h["quantiles"]) == 7 and h["count"] == 256
        assert rec["loss"] == 1.5
        paths = rec["image_obs_images"]
        assert len(paths) == 2
        import os
        p = os.path.join(s.dir, paths[0])
        assert os.path.exists(p)
        assert open(p, "rb").read(8) == b"\x89PNG\r\n\x1a\n"

    def test_plot_helpers_write_files(self, tmp_path):
        import matplotlib
        matplotlib.use("Agg")
        import numpy as np
        from carla_driving_rl_agent_tpu.utils import summary as S
        S.plot_images([np.zeros((4, 4, 3), np.uint8)] * 3, show=False,
                      path=str(tmp_path / "imgs.png"))
        S.plot_summary({"a": [1, 2, 3], "b": [3, 2, 1]}, show=False,
                       path=str(tmp_path / "hist.png"))
        from carla_driving_rl_agent_tpu.utils.schedules import ExponentialDecay
        sched = ExponentialDecay(initial_value=1.0, decay_steps=10,
                                 decay_rate=0.5)
        S.plot_parameter(lambda step: 0.5 ** (step // 10), 25, show=False,
                         path=str(tmp_path / "sched.png"))
        assert (tmp_path / "imgs.png").exists()
        assert (tmp_path / "hist.png").exists()
        assert (tmp_path / "sched.png").exists()


class TestFlatOptimizer:
    """optax.flatten wrapping (utils/optimizers.get_optimizer_by_name
    flat=True): vector-space moment math must match the per-leaf path
    exactly, and the injected learning-rate leaf must stay reachable."""

    def _tree(self):
        import jax.numpy as jnp
        return {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3) / 7.0,
                "b": {"w": jnp.ones((4,), jnp.float32) * 0.3,
                      "v": jnp.full((3, 2), -0.5, jnp.float32)}}

    @pytest.mark.parametrize("name", ["adam", "sgd", "rmsprop", "ftrl"])
    def test_matches_per_leaf_path(self, name):
        import jax
        from carla_driving_rl_agent_tpu.utils.optimizers import (
            get_optimizer_by_name)

        params = self._tree()
        grads = jax.tree_util.tree_map(lambda p: 0.1 * p + 0.01, params)
        outs = {}
        for flat in (False, True):
            opt = get_optimizer_by_name(name, 1e-2, flat=flat)
            state = opt.init(params)
            p = params
            for _ in range(3):
                updates, state = opt.update(grads, state, p)
                p = jax.tree_util.tree_map(lambda x, u: x + u, p, updates)
            outs[flat] = p
        for (ka, va), (kb, vb) in zip(
                jax.tree_util.tree_leaves_with_path(outs[False]),
                jax.tree_util.tree_leaves_with_path(outs[True])):
            np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                       rtol=1e-6, atol=1e-7)

    def test_learning_rate_injection_survives_flatten(self):
        import jax
        import jax.numpy as jnp
        from carla_driving_rl_agent_tpu.utils.optimizers import (
            get_optimizer_by_name, set_learning_rate, with_learning_rate)

        params = self._tree()
        opt = get_optimizer_by_name("adam", 1e-3, flat=True)
        state = opt.init(params)
        assert hasattr(state, "hyperparams")
        set_learning_rate(state, 5e-4)
        assert float(state.hyperparams["learning_rate"]) == pytest.approx(5e-4)
        state2 = with_learning_rate(state, 1e-4)
        assert float(state2.hyperparams["learning_rate"]) == pytest.approx(1e-4)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = opt.update(grads, state2, params)
        assert jax.tree_util.tree_structure(updates) == \
            jax.tree_util.tree_structure(params)
