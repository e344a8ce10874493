"""Trainer-loop features: adaptive clip, dual LR / freezing, grad
accumulation, LR schedules, 8-bit AdamW (reference train.py:881-886,
1090-1251, 1504-1510, 2116-2137).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from easyanimate_tpu.training import (
    TrainConfig,
    adaptive_clip_by_global_norm,
    lr_multiplier_tree,
    make_lr_schedule,
    make_optimizer,
)


def _ref_linear_decay(initial, final, total, step):
    if step >= total:
        return final
    step = max(0, step)
    return initial + (final - initial) / total * step


def _ref_actual_clip(max_grad_norm, ratio, start, step, gnorm):
    """reference train.py:2116-2124."""
    mgn = _ref_linear_decay(max_grad_norm * ratio, max_grad_norm, start, step)
    if gnorm / mgn > 5 and step > start:
        return mgn / min(gnorm / mgn, 10)
    return mgn


class TestAdaptiveClip:
    def test_matches_reference_formula(self):
        max_gn, ratio, start = 0.05, 5.0, 10
        tx = adaptive_clip_by_global_norm(max_gn, ratio, start)
        g_mags = [0.1, 10.0, 0.01, 3.0, 0.1, 0.2, 50.0, 0.1, 0.1, 1.0,
                  0.1, 30.0, 0.02, 0.1]
        params = {"w": jnp.zeros((3,))}
        state = tx.init(params)
        for step, mag in enumerate(g_mags):
            g = {"w": jnp.full((3,), mag / np.sqrt(3.0))}
            gnorm = float(optax.global_norm(g))
            out, state = tx.update(g, state)
            expected = min(gnorm, _ref_actual_clip(max_gn, ratio, start,
                                                   step, gnorm))
            np.testing.assert_allclose(float(optax.global_norm(out)),
                                       expected, rtol=1e-5,
                                       err_msg=f"step {step} mag {mag}")


class TestDualLRFreeze:
    def _params(self):
        return {
            "blocks": {"attn1": {"kernel": jnp.ones((4, 4))},
                       "ff": {"kernel": jnp.ones((4, 4))}},
            "proj_out": {"kernel": jnp.ones((4, 4))},
        }

    def test_multiplier_tree(self):
        cfg = TrainConfig(trainable_modules=["attn1"],
                          trainable_modules_low_lr=["ff"])
        mult = lr_multiplier_tree(self._params(), cfg)
        assert mult["blocks"]["attn1"]["kernel"] == 1.0
        assert mult["blocks"]["ff"]["kernel"] == 0.5
        assert mult["proj_out"]["kernel"] == 0.0

    def test_frozen_params_do_not_move(self):
        params = self._params()
        cfg = TrainConfig(trainable_modules=["attn1"],
                          trainable_modules_low_lr=["ff"],
                          learning_rate=1e-2, weight_decay=1e-2)
        tx = make_optimizer(cfg, params)
        state = tx.init(params)
        g = jax.tree.map(lambda p: jnp.full_like(p, 0.5), params)
        for _ in range(3):
            upd, state = tx.update(g, state, params)
            params = optax.apply_updates(params, upd)
        np.testing.assert_array_equal(np.asarray(params["proj_out"]["kernel"]),
                                      np.ones((4, 4)))
        # high-lr step magnitude is ~2x the low-lr one (adam first steps
        # are ~sign(g)*lr before weight decay)
        d_high = float(jnp.abs(params["blocks"]["attn1"]["kernel"] - 1).mean())
        d_low = float(jnp.abs(params["blocks"]["ff"]["kernel"] - 1).mean())
        assert d_high > 0 and d_low > 0
        np.testing.assert_allclose(d_high / d_low, 2.0, rtol=0.05)

    def test_gnorm_excludes_frozen(self):
        # with a huge frozen gradient, the clip must not squash the
        # trainable update (frozen grads are zeroed before the global norm)
        params = self._params()
        cfg = TrainConfig(trainable_modules=["attn1"], learning_rate=1e-2,
                          max_grad_norm=1.0, weight_decay=0.0)
        tx = make_optimizer(cfg, params)
        state = tx.init(params)
        g = jax.tree.map(jnp.zeros_like, params)
        g["blocks"]["attn1"]["kernel"] = jnp.full((4, 4), 0.1)
        g["proj_out"]["kernel"] = jnp.full((4, 4), 1e6)  # frozen
        upd, _ = tx.update(g, state, params)
        assert float(jnp.abs(upd["blocks"]["attn1"]["kernel"]).max()) > 1e-3


class TestGradAccumulation:
    def test_multisteps_accumulates(self):
        params = {"w": jnp.ones((8,))}
        cfg_acc = TrainConfig(learning_rate=1e-2, weight_decay=0.0,
                              gradient_accumulation_steps=4)
        cfg_one = dataclasses.replace(cfg_acc, gradient_accumulation_steps=1)
        g = {"w": jnp.full((8,), 0.3)}

        tx_a = make_optimizer(cfg_acc)
        st_a = tx_a.init(params)
        p_a = params
        for _ in range(4):
            upd, st_a = tx_a.update(g, st_a, p_a)
            p_a = optax.apply_updates(p_a, upd)

        tx_o = make_optimizer(cfg_one)
        st_o = tx_o.init(params)
        upd, _ = tx_o.update(g, st_o, params)
        p_o = optax.apply_updates(params, upd)
        np.testing.assert_allclose(np.asarray(p_a["w"]), np.asarray(p_o["w"]),
                                   rtol=1e-6)


class TestLRSchedules:
    def test_warmup_then_constant(self):
        cfg = TrainConfig(learning_rate=1e-3, lr_scheduler="constant",
                          lr_warmup_steps=10)
        s = make_lr_schedule(cfg)
        assert float(s(0)) == 0.0
        np.testing.assert_allclose(float(s(5)), 5e-4)
        np.testing.assert_allclose(float(s(10)), 1e-3)
        np.testing.assert_allclose(float(s(1000)), 1e-3)

    def test_cosine_decays_to_zero(self):
        cfg = TrainConfig(learning_rate=1e-3, lr_scheduler="cosine",
                          lr_warmup_steps=5, max_train_steps=100)
        s = make_lr_schedule(cfg)
        np.testing.assert_allclose(float(s(5)), 1e-3, rtol=1e-6)
        assert float(s(100)) < 1e-8


class TestAdam8bit:
    def test_state_is_int8(self):
        from easyanimate_tpu.training.adam8bit import scale_by_adam8bit

        params = {"w": jnp.ones((100, 7)), "b": jnp.ones((5,))}
        tx = scale_by_adam8bit()
        st = tx.init(params)
        assert st.m_q["w"].dtype == jnp.int8
        assert st.v_q["b"].dtype == jnp.int8
        assert st.m_scale["w"].dtype == jnp.float32

    def test_quadratic_convergence_tracks_fp32_adam(self):
        target = jnp.asarray(np.random.RandomState(0).randn(64) * 2)

        def loss(w):
            return jnp.sum((w - target) ** 2)

        def run(tx):
            w = jnp.zeros((64,))
            st = tx.init(w)
            for _ in range(300):
                g = jax.grad(loss)(w)
                upd, st = tx.update(g, st, w)
                w = optax.apply_updates(w, upd)
            return w

        from easyanimate_tpu.training.adam8bit import adamw8bit

        w8 = run(adamw8bit(0.1, weight_decay=0.0, block_size=64))
        w32 = run(optax.adamw(0.1, weight_decay=0.0))
        # both should be close to the target; 8-bit within quantization slack
        assert float(jnp.abs(w32 - target).max()) < 0.05
        assert float(jnp.abs(w8 - target).max()) < 0.15

    def test_in_train_config(self):
        params = {"w": jnp.ones((16, 16))}
        cfg = TrainConfig(optimizer="adamw8bit", learning_rate=1e-2)
        tx = make_optimizer(cfg, params)
        st = tx.init(params)
        g = {"w": jnp.full((16, 16), 0.1)}
        upd, _ = tx.update(g, st, params)
        assert float(jnp.abs(upd["w"]).max()) > 0


class TestCAMEInChain:
    def test_updates_descend(self):
        params = {"w": jnp.ones((8, 8))}
        cfg = TrainConfig(optimizer="came", learning_rate=1e-2)
        tx = make_optimizer(cfg, params)
        st = tx.init(params)
        g = {"w": jnp.full((8, 8), 0.5)}  # positive grad -> w must decrease
        p = params
        for _ in range(3):
            upd, st = tx.update(g, st, p)
            p = optax.apply_updates(p, upd)
        assert float(p["w"].mean()) < 1.0


class TestZeroSpecInheritance:
    def test_tree_map_params_with_features(self):
        from jax.sharding import PartitionSpec as P

        params = {"blocks": {"attn1": {"kernel": jnp.ones((4, 4))},
                             "ff": {"kernel": jnp.ones((4, 4))}}}
        specs = {"blocks": {"attn1": {"kernel": P("tp")},
                            "ff": {"kernel": P()}}}
        cfg = TrainConfig(adaptive_grad_clip=True,
                          trainable_modules=["attn1"],
                          trainable_modules_low_lr=["ff"])
        tx = make_optimizer(cfg, params)
        st = tx.init(params)
        out = optax.tree_map_params(tx, lambda _, s: s, st, specs,
                                    transform_non_params=lambda _: P())
        flat = jax.tree.leaves(out, is_leaf=lambda x: isinstance(x, P))
        assert all(isinstance(x, P) for x in flat)
        # adam moments for the tp-sharded kernel carry the tp spec
        adam_state = [s for s in jax.tree.leaves(
            jax.tree.map(lambda x: x, out,
                         is_leaf=lambda x: isinstance(x, P)),
            is_leaf=lambda x: isinstance(x, P))]
        assert any(x == P("tp") for x in adam_state)


class TestMotionSubLoss:
    def test_formula_and_gating(self):
        import numpy as np

        from easyanimate_tpu.training.losses import (
            motion_sub_mse,
            with_motion_sub_loss,
        )

        rng = np.random.default_rng(0)
        pred = jnp.asarray(rng.standard_normal((2, 4, 5, 3, 3)), jnp.float32)
        target = jnp.asarray(rng.standard_normal((2, 4, 5, 3, 3)),
                             jnp.float32)
        base = jnp.float32(1.0)
        out = with_motion_sub_loss(base, pred, target, 0.25)
        dp = np.diff(np.asarray(pred), axis=2)
        dt = np.diff(np.asarray(target), axis=2)
        want = 1.0 * 0.75 + np.mean((dp - dt) ** 2) * 0.25
        np.testing.assert_allclose(float(out), want, rtol=1e-5)
        # reference gating: inactive at T <= 2 (train.py:2078)
        short = pred[:, :, :2]
        assert float(with_motion_sub_loss(base, short, short, 0.25)) == 1.0
        assert float(motion_sub_mse(pred, pred)) == 0.0

    def test_train_step_runs_with_motion_loss(self):
        import numpy as np

        from easyanimate_tpu.training.trainer import (
            TrainConfig,
            create_train_state,
            make_train_step,
        )

        class _Toy:
            def apply(self, variables, noisy, t, txt, *a, **kw):
                k = variables["params"]["k"]
                return noisy * k

        cfg = TrainConfig(motion_sub_loss=True, motion_sub_loss_ratio=0.5)
        params = {"params": {"k": jnp.ones(())}}
        state = create_train_state(params, cfg)
        step = make_train_step(_Toy(), cfg)
        batch = {"latents": jnp.ones((1, 4, 3, 8, 8)),
                 "text": jnp.zeros((1, 2, 8))}
        state2, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert float(jnp.abs(state2.params["params"]["k"] - 1.0)) > 0


def test_param_grad_norms_reporter():
    import numpy as np

    from easyanimate_tpu.training.trainer import (
        TrainConfig,
        make_param_grad_norms,
    )

    class _Toy:
        def apply(self, variables, noisy, t, txt, *a, **kw):
            return noisy * variables["params"]["a"]["k"] + \
                variables["params"]["b"]["k"]

    fn = make_param_grad_norms(_Toy(), TrainConfig())
    params = {"a": {"k": jnp.ones(())}, "b": {"k": jnp.zeros(())}}
    batch = {"latents": jnp.ones((1, 4, 3, 8, 8)),
             "text": jnp.zeros((1, 2, 8))}
    norms = fn(params, batch, jax.random.PRNGKey(0))
    assert set(norms) == {"a/k", "b/k"}
    assert all(np.isfinite(float(v)) for v in norms.values())
    assert float(norms["a/k"]) > 0
