"""MPS reward: cross model structure, condition mask, converter mapping."""
import jax
import jax.numpy as jnp
import numpy as np

from easyanimate_tpu.reward.mps import (
    MPSCrossModel,
    convert_mps_cross_state_dict,
    mps_condition_mask,
    mps_score,
)


def test_cross_model_runs(rng):
    m = MPSCrossModel(dim=32, layer_num=2, heads=4)
    img = jnp.asarray(rng.standard_normal((2, 9, 32)).astype(np.float32))
    txt = jnp.asarray(rng.standard_normal((2, 7, 32)).astype(np.float32))
    mask = jnp.zeros((2, 9, 7))
    params = m.init(jax.random.PRNGKey(0), img, txt, mask)
    out = m.apply(params, img, txt, mask)
    assert out.shape == (2, 9, 32)
    assert np.isfinite(np.asarray(out)).all()
    # -inf mask on all but one text token: output independent of masked ones
    mask2 = jnp.full((2, 9, 7), -jnp.inf).at[:, :, 0].set(0.0)
    o1 = m.apply(params, img, txt, mask2)
    txt_perturbed = txt.at[:, 1:].add(5.0)
    o2 = m.apply(params, img, txt_perturbed, mask2)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_condition_mask_keeps_similar_tokens(rng):
    txt = jnp.asarray(rng.standard_normal((1, 5, 8)).astype(np.float32))
    cond = txt[:, :2]  # first two tokens match the condition exactly
    mask = mps_condition_mask(txt, cond)
    assert mask.shape == (1, 1, 5)
    m = np.asarray(mask)[0, 0]
    assert m[0] == 0.0 and m[1] == 0.0   # exact matches always kept


def test_mps_score_and_converter(rng):
    m = MPSCrossModel(dim=32, layer_num=4, heads=4)
    img = jnp.asarray(rng.standard_normal((1, 9, 32)).astype(np.float32))
    txt = jnp.asarray(rng.standard_normal((1, 7, 32)).astype(np.float32))
    eos = jnp.asarray(rng.standard_normal((1, 32)).astype(np.float32))
    cond = txt[:, :2]
    params = m.init(jax.random.PRNGKey(0), img, txt,
                    jnp.zeros((1, 9, 7)))
    r = mps_score(lambda i, t, k: m.apply(params, i, t, k),
                  img, txt, eos, cond)
    assert r.shape == (1,)
    assert -1.0001 <= float(r[0]) <= 1.0001

    # converter: synthesize a torch-style sd from the flax tree and round-trip
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"], sep="/")
    sd = {}
    names = {"to_q": "to_q.weight", "to_kv": "to_kv.weight",
             "to_out": "to_out.weight", "ff_in": "ff.0.weight",
             "ff_out": "ff.2.weight"}
    snames = {"fused_proj": "fused_attn_ff_proj.weight",
              "attn_out": "attn_out.weight", "ff_out": "ff_out.1.weight"}
    for k, v in flat.items():
        parts = k.split("/")
        i = parts[0][-1]
        if parts[0].startswith("cross"):
            if parts[1] == "norm":
                sd[f"layers.{i}.0.fn.norm.gamma"] = np.asarray(v)
            else:
                sd[f"layers.{i}.0.fn.{names[parts[1]]}"] = np.asarray(v).T
        else:
            if parts[1] == "norm":
                sd[f"layers.{i}.1.fn.norm.gamma"] = np.asarray(v)
            else:
                sd[f"layers.{i}.1.fn.{snames[parts[1]]}"] = np.asarray(v).T
    got = convert_mps_cross_state_dict(sd)
    got_flat = flax.traverse_util.flatten_dict(got["params"], sep="/")
    assert set(got_flat) == set(flat)
    for k in flat:
        np.testing.assert_allclose(np.asarray(got_flat[k]),
                                   np.asarray(flat[k]), err_msg=k)
