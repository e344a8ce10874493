"""examples/train.py end-to-end smoke: the documented CLI reaches step N on
a (virtual) mesh for sft, inpaint and camera-control modes, with the new
trainer-loop flags (grad accumulation, warmup, trainable filter)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_media(tmp_path, n_images=4, n_videos=2):
    from easyanimate_tpu.utils.media import save_videos_grid
    from PIL import Image

    entries = []
    rng = np.random.RandomState(0)
    for i in range(n_images):
        p = tmp_path / f"img{i}.png"
        Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)).save(p)
        entries.append({"file_path": p.name, "text": f"image {i}",
                        "type": "image"})
    for i in range(n_videos):
        p = tmp_path / f"vid{i}.mp4"
        # 5 frames at stride 4 need (5-1)*4+1 = 17 source frames
        video = rng.rand(1, 3, 20, 40, 40).astype(np.float32)
        save_videos_grid(video, str(p), fps=4)
        entries.append({"file_path": p.name, "text": f"video {i}",
                        "type": "video"})
    return entries


def _pose_file(tmp_path, frames=9):
    lines = ["https://example.com/synthetic"]
    for i in range(frames):
        # idx fx fy cx cy k1 k2 + 12 w2c entries (RealEstate10K layout)
        w2c = np.eye(4)[:3].copy()
        w2c[0, 3] = 0.01 * i
        vals = [i, 0.8, 1.2, 0.5, 0.5, 0.0, 0.0] + list(w2c.reshape(-1))
        lines.append(" ".join(str(float(v)) for v in vals))
    p = tmp_path / "camera.txt"
    p.write_text("\n".join(lines))
    return p


def _run(args, cwd):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["EASYANIMATE_FORCE_CPU"] = "1"
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');"
            "import runpy, sys;"
            f"sys.argv = ['train.py'] + {args!r};"
            f"runpy.run_path({os.path.join(REPO, 'examples', 'train.py')!r},"
            "run_name='__main__')")
    return subprocess.run([sys.executable, "-c", code], cwd=cwd, text=True,
                          capture_output=True, timeout=900)


@pytest.mark.parametrize("mode_args", [
    ["--train_mode", "sft", "--gradient_accumulation_steps", "2",
     "--lr_scheduler", "cosine", "--lr_warmup_steps", "2",
     "--trainable_modules", "attn1", "ff",
     "--trainable_modules_low_learning_rate", "txt_ff",
     "--train_batch_size", "2", "--mesh", "dp=2,sp=1,tp=1"],
    ["--train_mode", "sft", "--enable_inpaint", "--adaptive_grad_clip",
     "--mesh", "dp=1,sp=1,tp=1"],
])
def test_train_tiny_demo_modes(tmp_path, mode_args):
    entries = _write_media(tmp_path)
    meta = tmp_path / "train.json"
    meta.write_text(json.dumps(entries))
    r = _run(["--tiny_demo", "--train_data_meta", str(meta),
              "--train_data_dir", str(tmp_path),
              "--output_dir", str(tmp_path / "out"),
              "--max_train_steps", "3", "--checkpointing_steps", "100",
              "--dataloader_num_workers", "0"]
             + mode_args, cwd=str(tmp_path))
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-3000:]
    assert "step 0: loss=" in r.stdout


def test_train_control_camera_ref(tmp_path):
    entries = _write_media(tmp_path, n_images=0, n_videos=2)
    cam = _pose_file(tmp_path)
    for e in entries:
        e["camera_file_path"] = cam.name
    meta = tmp_path / "train.json"
    meta.write_text(json.dumps(entries))
    r = _run(["--tiny_demo", "--train_data_meta", str(meta),
              "--train_data_dir", str(tmp_path),
              "--output_dir", str(tmp_path / "out"),
              "--train_mode", "control_camera_ref",
              "--max_train_steps", "2", "--checkpointing_steps", "100",
              "--dataloader_num_workers", "0",
              "--mesh", "dp=1,sp=1,tp=1"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-3000:]
    assert "step 0: loss=" in r.stdout


def _load_train_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ea_train", os.path.join(REPO, "examples", "train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_inpaint_latents_minus_one_fill_and_t2v_flag():
    """Masked regions encode as -1-filled (reference train.py:1422) and
    fully-masked samples zero their inpaint latents with p=0.9
    (t2v_flag, reference train.py:1770-1779, applied at :1850)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from easyanimate_tpu.models.vae import (AutoencoderKLMagvit,
                                            MagvitVAEConfig, gaussian_mode,
                                            vae_encode)

    mod = _load_train_module()
    cfg = MagvitVAEConfig(
        latent_channels=4, block_out_channels=(8, 16),
        down_block_types=("SpatialTemporalDownBlock3D", "SpatialDownBlock3D"),
        up_block_types=("SpatialTemporalUpBlock3D", "SpatialUpBlock3D"),
        layers_per_block=1, norm_num_groups=4, mini_batch_encoder=2,
        mini_batch_decoder=1)
    vae = AutoencoderKLMagvit(cfg)
    vp = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 8, 8, 3)))
    enc_mode = lambda p, x: gaussian_mode(vae_encode(vae, p, x), axis=1)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1, 1),
                ("dp", "sp", "tp"))

    b, t, h, w = 4, 5, 16, 16
    pixels = jnp.asarray(np.random.RandomState(0).rand(
        b, 3, t, h, w).astype(np.float32) * 2 - 1)
    # sample 0: fully masked (pure T2V); samples 1-3: top half kept
    masks = np.zeros((b, 1, t, h, w), np.float32)
    masks[0] = 1.0
    masks[1:, :, :, h // 2:, :] = 1.0
    samples = {"mask": masks}
    latents = enc_mode(vp, pixels)
    tcfg = type("C", (), {"add_noise_in_inpaint_model": False})()

    with mesh:
        # rng=None path: no noise-aug, no t2v_flag -> deterministic
        out = np.asarray(mod._inpaint_latents(
            vae, vp, samples, pixels, latents, 1.0, tcfg, enc_mode, mesh,
            rng=None))
        # masked region got -1 fill: encode -1-filled pixels directly and
        # compare the masked-latent channels
        keep = (masks < 0.5).astype(np.float32)
        want = np.asarray(enc_mode(
            vp, jnp.asarray(pixels * keep - (1.0 - keep))))
        np.testing.assert_allclose(out[:, -want.shape[1]:], want, atol=1e-5)

        # with rng: fully-masked sample 0 is zeroed w.p. 0.9 -- over many
        # keys it must zero sometimes and keep sometimes; samples 1-3 never
        zeroed = kept = 0
        for s in range(20):
            o = np.asarray(mod._inpaint_latents(
                vae, vp, samples, pixels, latents, 1.0, tcfg, enc_mode,
                mesh, rng=jax.random.PRNGKey(s)))
            assert np.abs(o[1:]).max() > 0
            if np.abs(o[0]).max() == 0:
                zeroed += 1
            else:
                kept += 1
        assert zeroed > 10 and kept >= 1, (zeroed, kept)
