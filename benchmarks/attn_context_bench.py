"""Locate the in-model attention overhead: time the attention math with the
surrounding glue added layer by layer (model shapes: B=2 CFG, H=48, d=64,
13104 video + 256 text tokens, dim 3072).

  bare      : attention() on ready [B,H,S,D] tensors
  transpose : + [B,S,H*D] -> heads -> attention -> merge back
  concat    : + separate text/video streams concat/split
  rope      : + RoPE on the video q/k slice
  qknorm    : + fp32 per-head LN on q/k
  block     : full MMDiTBlock forward (adds LN-zero, QKV/out projs, FFN)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

B, H, D = 2, 48, 64
ST, SV = 256, 13104
DIM = H * D
DT = jnp.bfloat16


def timed(fn, *args, iters=10, warmup=8):
    # the tunneled runtime is slow for the first ~8 executions of a fresh
    # program; warm past that, then time (sync by scalar fetch -- see
    # CLAUDE.md, block_until_ready doesn't sync through the tunnel)
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(lambda x: float(x.reshape(-1)[0]), out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda x: float(x.reshape(-1)[0]), out)
    return (time.time() - t0) / iters


def main():
    from easyanimate_tpu.ops.attention import attention
    from easyanimate_tpu.ops.norms import fp32_layer_norm
    from easyanimate_tpu.ops.rope import apply_rotary_emb
    from easyanimate_tpu.pipeline.t2v import build_rope
    from easyanimate_tpu.models.mmdit import PRESETS

    S = ST + SV
    key = jax.random.PRNGKey(0)
    qkv_bhsd = [jax.random.normal(jax.random.PRNGKey(i), (B, H, S, D), DT)
                for i in range(3)]
    t = timed(jax.jit(lambda q, k, v: attention(q, k, v, impl="pallas")),
              *qkv_bhsd)
    print(f"bare       {t*1e3:8.2f} ms", flush=True)

    qkv_flat = [jax.random.normal(jax.random.PRNGKey(i), (B, S, DIM), DT)
                for i in range(3)]

    def with_transpose(q, k, v):
        heads = lambda a: a.reshape(B, S, H, D).transpose(0, 2, 1, 3)
        o = attention(heads(q), heads(k), heads(v), impl="pallas")
        return o.transpose(0, 2, 1, 3).reshape(B, S, DIM)

    t = timed(jax.jit(with_transpose), *qkv_flat)
    print(f"transpose  {t*1e3:8.2f} ms", flush=True)

    txt_parts = [jax.random.normal(jax.random.PRNGKey(10 + i), (B, ST, DIM), DT)
                 for i in range(3)]
    vid_parts = [jax.random.normal(jax.random.PRNGKey(20 + i), (B, SV, DIM), DT)
                 for i in range(3)]

    def heads_of(a, s):
        return a.reshape(B, s, H, D).transpose(0, 2, 1, 3)

    def with_concat(qt, kt, vt, qv, kv, vv):
        q = jnp.concatenate([heads_of(qt, ST), heads_of(qv, SV)], axis=2)
        k = jnp.concatenate([heads_of(kt, ST), heads_of(kv, SV)], axis=2)
        v = jnp.concatenate([heads_of(vt, ST), heads_of(vv, SV)], axis=2)
        o = attention(q, k, v, impl="pallas")
        o = o.transpose(0, 2, 1, 3).reshape(B, S, DIM)
        return o[:, :ST], o[:, ST:]

    t = timed(jax.jit(with_concat), *(txt_parts + vid_parts))
    print(f"concat     {t*1e3:8.2f} ms", flush=True)

    cfg = PRESETS["v5.1-12b"]
    cos, sin = build_rope(cfg, 384, 672, 13)

    def with_rope(qt, kt, vt, qv, kv, vv):
        qvh, kvh = heads_of(qv, SV), heads_of(kv, SV)
        qvh = apply_rotary_emb(qvh, cos, sin)
        kvh = apply_rotary_emb(kvh, cos, sin)
        q = jnp.concatenate([heads_of(qt, ST), qvh], axis=2)
        k = jnp.concatenate([heads_of(kt, ST), kvh], axis=2)
        v = jnp.concatenate([heads_of(vt, ST), heads_of(vv, SV)], axis=2)
        o = attention(q, k, v, impl="pallas")
        o = o.transpose(0, 2, 1, 3).reshape(B, S, DIM)
        return o[:, :ST], o[:, ST:]

    t = timed(jax.jit(with_rope), *(txt_parts + vid_parts))
    print(f"rope       {t*1e3:8.2f} ms", flush=True)

    w = jnp.ones((D,), jnp.float32)
    b = jnp.zeros((D,), jnp.float32)

    def with_qknorm(qt, kt, vt, qv, kv, vv):
        ln = lambda x: fp32_layer_norm(x, w, b, 1e-6)
        qvh, kvh = ln(heads_of(qv, SV)), ln(heads_of(kv, SV))
        qvh = apply_rotary_emb(qvh, cos, sin)
        kvh = apply_rotary_emb(kvh, cos, sin)
        q = jnp.concatenate([ln(heads_of(qt, ST)), qvh], axis=2)
        k = jnp.concatenate([ln(heads_of(kt, ST)), kvh], axis=2)
        v = jnp.concatenate([heads_of(vt, ST), heads_of(vv, SV)], axis=2)
        o = attention(q, k, v, impl="pallas")
        o = o.transpose(0, 2, 1, 3).reshape(B, S, DIM)
        return o[:, :ST], o[:, ST:]

    t = timed(jax.jit(with_qknorm), *(txt_parts + vid_parts))
    print(f"qknorm     {t*1e3:8.2f} ms", flush=True)

    # full block
    from easyanimate_tpu.models.blocks import MMDiTBlock

    blk = MMDiTBlock(dim=DIM, num_heads=H, head_dim=D, dtype=DT,
                     attn_impl="pallas")
    vid = jax.random.normal(jax.random.PRNGKey(30), (B, SV, DIM), DT)
    txt = jax.random.normal(jax.random.PRNGKey(31), (B, ST, DIM), DT)
    temb = jax.random.normal(jax.random.PRNGKey(32), (B, DIM), DT)
    params = jax.eval_shape(
        lambda: blk.init(jax.random.PRNGKey(1), vid, txt, temb, (cos, sin)))
    leaves, treedef = jax.tree.flatten(params)

    @jax.jit
    def mk():
        return [0.02 * jax.random.normal(jax.random.PRNGKey(i), l.shape,
                                         jnp.bfloat16).astype(l.dtype)
                for i, l in enumerate(leaves)]

    params = jax.tree.unflatten(treedef, mk())

    t = timed(jax.jit(lambda p, v_, t_, e: blk.apply(p, v_, t_, e,
                                                     (cos, sin))),
              params, vid, txt, temb)
    print(f"block      {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
