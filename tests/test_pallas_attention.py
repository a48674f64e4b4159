"""Small-bucket fused attention kernel (ops/pallas_attention.py).

The kernel replaces the dense-bias einsum path for padding-only-mask
layers at non-lane-aligned lengths (where jax's flash cannot engage) —
stage-3's 96-token pair bucket is the motivating shape. Parity target
is the module path's math (softmax with key-validity bias)."""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from tristage_rag_tpu.ops.pallas_attention import (  # noqa: E402
    fused_attention_small,
)


def _dense_ref(q, k, v, mask, scale):
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k) * scale
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e30)
    p = jax.nn.softmax(logits + bias, axis=-1)
    return jnp.einsum("bhlm,bmhd->blhd", p, v)


class TestFusedAttentionSmall:
    @pytest.mark.parametrize(
        "b,l,h,hd", [(3, 16, 4, 32), (2, 96, 12, 32), (1, 24, 2, 64)]
    )
    def test_matches_dense_reference(self, b, l, h, hd):
        rng = np.random.default_rng(l)
        q = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
        mask = np.ones((b, l), np.int32)
        mask[0, l // 2:] = 0
        mask = jnp.asarray(mask)
        got = fused_attention_small(
            q, k, v, mask, scale=hd**-0.5, interpret=True
        )
        ref = _dense_ref(q, k, v, mask, scale=hd**-0.5)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5
        )

    def test_all_padded_row_is_uniform_average(self):
        # the dense path's all -1e30 softmax convention: padded query
        # rows attend uniformly; downstream consumers mask them out
        rng = np.random.default_rng(0)
        b, l, h, hd = 1, 8, 2, 32
        q = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
        mask = jnp.zeros((b, l), jnp.int32)
        got = fused_attention_small(
            q, k, v, mask, scale=1.0, interpret=True
        )
        ref = jnp.mean(v, axis=1, keepdims=True) * jnp.ones_like(v)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5
        )

    def test_bf16_inputs(self):
        rng = np.random.default_rng(1)
        b, l, h, hd = 2, 32, 4, 32
        q = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.bfloat16)
        mask = jnp.ones((b, l), jnp.int32)
        got = fused_attention_small(
            q, k, v, mask, scale=hd**-0.5, interpret=True
        )
        assert got.dtype == jnp.bfloat16
        ref = _dense_ref(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), mask, scale=hd**-0.5,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref), atol=3e-2
        )

    def test_shape_validation(self):
        z = jnp.zeros((1, 12, 2, 32), jnp.float32)  # L=12 not % 8
        with pytest.raises(ValueError, match="sublane-aligned"):
            fused_attention_small(
                z, z, z, jnp.ones((1, 12), jnp.int32), scale=1.0,
                interpret=True,
            )
        z8 = jnp.zeros((1, 16, 2, 32), jnp.float32)
        with pytest.raises(ValueError, match="mask"):
            fused_attention_small(
                z8, z8, z8, jnp.ones((2, 16), jnp.int32), scale=1.0,
                interpret=True,
            )


class TestEncoderEngagement:
    @pytest.mark.parametrize(
        "fam", ["bert", "gemma-aligned", "modernbert-aligned"]
    )
    def test_encoder_parity_and_engagement(self, fam):
        # fused_attention=True must (a) engage on global layers and
        # (b) keep valid-row outputs within tolerance of the dense path
        import tristage_rag_tpu.ops.pallas_attention as pa
        from tristage_rag_tpu.models.registry import encoder_config
        from tristage_rag_tpu.models.encoder import TextEncoder

        ids = np.array(
            [[1, 5, 9, 3, 2, 7, 4, 6] * 2, [2, 4, 6, 8] * 4], np.int32
        )
        mask = np.ones_like(ids)
        mask[1, 10:] = 0
        base = encoder_config(f"tiny-{fam}").replace(dtype="float32")
        ma = TextEncoder(base.replace(fused_attention=False))
        mb = TextEncoder(base.replace(fused_attention=True))
        pa_params = ma.init(jax.random.PRNGKey(0), ids, mask)["params"]
        calls = []
        orig = pa.fused_attention_small
        pa.fused_attention_small = lambda *a, **k: (
            calls.append(a[0].shape) or orig(*a, **k)
        )
        try:
            ob = mb.apply({"params": pa_params}, ids, mask)
        finally:
            pa.fused_attention_small = orig
        assert calls, "fused attention kernel never engaged"
        oa = ma.apply({"params": pa_params}, ids, mask)
        d = np.abs(
            (np.asarray(oa, np.float32) - np.asarray(ob, np.float32))
            * mask[..., None]
        ).max()
        assert d < 2e-5, d

    def test_local_layers_keep_dense_path(self):
        # ModernBERT's windowed layers must NOT take the kernel (its
        # mask scope is padding-only)
        import tristage_rag_tpu.ops.pallas_attention as pa
        from tristage_rag_tpu.models.registry import encoder_config
        from tristage_rag_tpu.models.encoder import TextEncoder

        cfg = encoder_config("tiny-modernbert-aligned").replace(
            dtype="float32", fused_attention=True
        )
        assert cfg.sliding_window > 0
        n_global = sum(
            cfg.is_global_layer(i) for i in range(cfg.num_layers)
        )
        assert 0 < n_global < cfg.num_layers
        ids = np.array([[1, 5, 9, 3] * 4], np.int32)
        mask = np.ones_like(ids)
        m = TextEncoder(cfg)
        params = m.init(jax.random.PRNGKey(0), ids, mask)["params"]
        calls = []
        orig = pa.fused_attention_small
        pa.fused_attention_small = lambda *a, **k: (
            calls.append(1) or orig(*a, **k)
        )
        try:
            m.apply({"params": params}, ids, mask)
        finally:
            pa.fused_attention_small = orig
        assert len(calls) == n_global


class TestFusedAttentionBlock:
    def test_matches_composition(self):
        # out = LN(x + attention(q,k,v) @ wo + bo), one kernel
        import jax.numpy as jnp
        from tristage_rag_tpu.ops.pallas_attention import (
            fused_attention_block,
        )

        rng = np.random.default_rng(7)
        b, l, h, hd, n = 3, 16, 4, 32, 128
        d = h * hd
        mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3,
                                    jnp.float32)
        q, k, v = mk(b, l, d), mk(b, l, d), mk(b, l, d)
        x = mk(b, l, n)
        wo = mk(d, n) * 0.3
        bo = mk(n) * 0.05
        lns = jnp.asarray(1.0 + rng.standard_normal(n) * 0.1, jnp.float32)
        lnb = mk(n) * 0.1
        mask = np.ones((b, l), np.int32)
        mask[1, 10:] = 0
        mask = jnp.asarray(mask)
        eps = 1e-12
        scale = hd**-0.5

        att = _dense_ref(
            q.reshape(b, l, h, hd), k.reshape(b, l, h, hd),
            v.reshape(b, l, h, hd), mask, scale,
        ).reshape(b, l, d)
        z = x + att @ wo + bo
        mu = z.mean(-1, keepdims=True)
        var = (z * z).mean(-1, keepdims=True) - mu * mu
        ref = (z - mu) * jax.lax.rsqrt(var + eps) * lns + lnb
        got = fused_attention_block(
            q, k, v, mask, x, wo, bo, lns, lnb,
            scale=scale, heads=h, ln_eps=eps, out_dtype=jnp.float32,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4
        )

    def test_shape_validation(self):
        import jax.numpy as jnp
        from tristage_rag_tpu.ops.pallas_attention import (
            fused_attention_block,
        )

        z = jnp.zeros((1, 16, 128), jnp.float32)
        m = jnp.ones((1, 16), jnp.int32)
        with pytest.raises(ValueError, match="D,N"):
            fused_attention_block(
                z[..., :64], z[..., :64], z[..., :64], m, z,
                jnp.zeros((64, 128)), None, jnp.ones(128), None,
                scale=1.0, heads=2, interpret=True,
            )

    def test_encoder_block_engagement_and_parity(self):
        # post-LN BERT with the full fused stack: the whole attention
        # block must run through fused_attention_block, outputs within
        # tolerance of the module path, param tree identical
        import tristage_rag_tpu.ops.pallas_attention as pa
        from tristage_rag_tpu.models.registry import encoder_config
        from tristage_rag_tpu.models.encoder import TextEncoder

        ids = np.array(
            [[1, 5, 9, 3, 2, 7, 4, 6] * 2, [2, 4, 6, 8] * 4], np.int32
        )
        mask = np.ones_like(ids)
        mask[1, 10:] = 0
        base = encoder_config("tiny-bert-aligned").replace(
            dtype="float32"
        )
        ma = TextEncoder(base)
        mb = TextEncoder(
            base.replace(fused_attention=True, fused_mlp=True)
        )
        pa_params = ma.init(jax.random.PRNGKey(0), ids, mask)["params"]
        pb_params = mb.init(jax.random.PRNGKey(0), ids, mask)["params"]
        assert jax.tree_util.tree_structure(pa_params) == (
            jax.tree_util.tree_structure(pb_params)
        )
        calls = []
        orig = pa.fused_attention_block
        pa.fused_attention_block = lambda *a, **k: (
            calls.append(a[0].shape) or orig(*a, **k)
        )
        try:
            ob = mb.apply({"params": pa_params}, ids, mask)
        finally:
            pa.fused_attention_block = orig
        cfg = base
        assert len(calls) == cfg.num_layers, calls
        oa = ma.apply({"params": pa_params}, ids, mask)
        d = np.abs(
            (np.asarray(oa, np.float32) - np.asarray(ob, np.float32))
            * mask[..., None]
        ).max()
        assert d < 5e-3, d
