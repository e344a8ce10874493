"""LoRA surgery + checkpoint manager tests."""
import jax
import jax.numpy as jnp
import numpy as np

from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D
from easyanimate_tpu.training import TrainConfig, create_train_state
from easyanimate_tpu.training.checkpoints import CheckpointManager
from easyanimate_tpu.training.lora import (
    LoRAConfig,
    load_lora,
    lora_init,
    make_lora_train_step,
    merge_lora,
    save_lora,
    unmerge_lora,
)


def _tiny():
    cfg = PRESETS["tiny"]
    model = EasyAnimateTransformer3D(cfg)
    lat = jnp.zeros((1, 4, 2, 8, 8))
    txt = jnp.zeros((1, 5, cfg.text_embed_dim))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt, None)
    return model, cfg, params, lat, txt


def test_lora_zero_init_is_identity():
    model, cfg, params, lat, txt = _tiny()
    lcfg = LoRAConfig(rank=4)
    lora = lora_init(params["params"], lcfg, jax.random.PRNGKey(1))
    assert len(lora) > 0
    merged = {"params": merge_lora(params["params"], lora, lcfg)}
    x = jax.random.normal(jax.random.PRNGKey(2), lat.shape)
    o1 = model.apply(params, x, jnp.array([5.0]), txt, None)
    o2 = model.apply(merged, x, jnp.array([5.0]), txt, None)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_lora_merge_unmerge_roundtrip():
    model, cfg, params, lat, txt = _tiny()
    lcfg = LoRAConfig(rank=4)
    lora = lora_init(params["params"], lcfg, jax.random.PRNGKey(1))
    # make up factors non-zero
    lora = jax.tree.map(lambda x: x + 0.1, lora)
    merged = merge_lora(params["params"], lora, lcfg)
    restored = unmerge_lora(merged, lora, lcfg)
    for a, b in zip(jax.tree.leaves(params["params"]), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_lora_train_step_only_updates_lora():
    model, cfg, params, lat, txt = _tiny()
    lcfg = LoRAConfig(rank=4)
    tcfg = TrainConfig(learning_rate=1e-3)
    init_fn, step_fn = make_lora_train_step(model, tcfg, lcfg, params)
    state = init_fn(jax.random.PRNGKey(1))
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(2), (1, 4, 2, 8, 8)),
        "text": jax.random.normal(jax.random.PRNGKey(3), (1, 5, cfg.text_embed_dim)),
    }
    state2, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    # up factors moved away from zero
    ups = [v["up"] for v in state2.params.values()]
    assert max(float(jnp.abs(u).max()) for u in ups) > 0


def test_lora_save_load_roundtrip(tmp_path):
    _, _, params, _, _ = _tiny()
    lcfg = LoRAConfig(rank=4)
    lora = lora_init(params["params"], lcfg, jax.random.PRNGKey(1))
    p = str(tmp_path / "lora.npz")
    save_lora(p, lora, lcfg)
    lora2, lcfg2 = load_lora(p)
    assert lcfg2.rank == 4
    for k in lora:
        np.testing.assert_allclose(np.asarray(lora[k]["down"]),
                                   np.asarray(lora2[k]["down"]))


def test_checkpoint_manager_rotation_and_resume(tmp_path):
    _, _, params, _, _ = _tiny()
    tcfg = TrainConfig()
    state = create_train_state(params, tcfg)
    mgr = CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2)
    for step in (10, 20, 30):
        st = state.replace(step=jnp.asarray(step, jnp.int32))
        mgr.save(step, st, sampler_state={"pos": step, "epoch": 0, "seed": 1})
    assert mgr.steps() == [20, 30]
    restored, sampler, step = mgr.restore_latest(state)
    assert step == 30 and sampler["pos"] == 30
    assert int(restored.step) == 30
