"""Sequence-parallel attention tests on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from easyanimate_tpu.ops.attention import attention
from easyanimate_tpu.parallel import MeshConfig, create_mesh
from easyanimate_tpu.parallel.context import make_sp_attention


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(MeshConfig(dp=1, sp=4, tp=2))


@pytest.mark.parametrize("mode", ["allgather", "ring"])
def test_sp_attention_matches_single_device(rng, mesh, mode):
    b, h, s, d = 1, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    want = attention(q, k, v, impl="xla")

    spec = NamedSharding(mesh, P("dp", "tp", "sp", None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    fn = make_sp_attention(mesh, mode=mode, impl="xla")
    got = jax.jit(fn)(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_allgather_mode_is_differentiable(rng, mesh):
    b, h, s, d = 1, 2, 32, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    spec = NamedSharding(mesh, P("dp", "tp", "sp", None))
    qs = jax.device_put(q, spec)
    fn = make_sp_attention(mesh, mode="allgather", impl="xla")

    def loss(q):
        return jnp.sum(fn(q, q, q) ** 2)

    g_sp = jax.jit(jax.grad(loss))(qs)

    def loss_ref(q):
        return jnp.sum(attention(q, q, q, impl="xla") ** 2)

    g_ref = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                               atol=2e-3, rtol=2e-3)
